"""In-place KV-cache row writer (Pallas, aliased buffers).

The decode loop appends one (L, B, Hkv, 1, D) column of K/V rows per step.
Expressed as ``jax.lax.dynamic_update_slice`` inside the while body, XLA
refuses to alias the buffer (the cache is also read by attention earlier in
the same iteration, defeating its aliasing analysis) and copies the ENTIRE
cache — 1.4 GB and ~4 ms per step at batch 32 on v5e, measured by xprof as
the single largest decode cost.

``input_output_aliases`` lets Pallas guarantee the in-place write.  HBM
tiling is (8, 128) on the trailing dims, so a single row cannot be DMA'd
directly; instead the kernel read-modify-writes the 8-row tile containing
the slot (per layer: fetch tile -> select the new row in -> store tile).
The neighbor rows are either already-written decode slots (rewritten
unchanged) or not-yet-attendable future slots (garbage in, garbage out) —
the decode region starts at a 256-aligned bucket boundary, so the tile
never crosses into the prompt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_rows(dtype) -> int:
    """Read-modify-write tile height along S for this cache dtype.

    8 rows for the f32/bf16 caches (the shipped, hardware-verified
    behavior); 32 for int8, whose native HBM tiling is (32, 128) — an
    8-row int8 slice would straddle sub-tile boundaries."""
    return 32 if jnp.dtype(dtype).itemsize == 1 else 8


def _kernel(slot_ref, rows_ref, cache_ref, out_ref, buf, sem, *, tile):
    # out_ref aliases cache_ref; grid iterates layers.
    layer = pl.program_id(0)
    slot = slot_ref[0]
    aligned = (slot // tile) * tile
    offset = slot - aligned

    tile_src = out_ref.at[layer, :, :, pl.ds(aligned, tile), :]
    fetch = pltpu.make_async_copy(tile_src, buf, sem)
    fetch.start()
    fetch.wait()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 2)  # (B,H,8,D)
    buf[...] = jnp.where(row_ids == offset, rows_ref[0], buf[...])

    store = pltpu.make_async_copy(buf, tile_src, sem)
    store.start()
    store.wait()


def _kernel_batch(slots_ref, rows_ref, cache_ref, out_ref, buf, sem, *, tile):
    # Per-sequence slots: grid is (L, B); each cell read-modify-writes the
    # 8-row tile containing that sequence's slot.  Tiles are per-(layer, b)
    # along S only, so no cross-sequence interference; the decode region
    # starts at a 256-aligned bucket boundary so the tile never crosses
    # into the prompt.
    layer = pl.program_id(0)
    b = pl.program_id(1)
    slot = slots_ref[b]
    aligned = (slot // tile) * tile
    offset = slot - aligned

    tile_src = out_ref.at[layer, b, :, pl.ds(aligned, tile), :]
    fetch = pltpu.make_async_copy(tile_src, buf, sem)
    fetch.start()
    fetch.wait()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 1)  # (H,8,D)
    buf[...] = jnp.where(row_ids == offset, rows_ref[0, 0], buf[...])

    store = pltpu.make_async_copy(buf, tile_src, sem)
    store.start()
    store.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_rows_batch(
    cache: jax.Array,   # (L, B, Hkv, S, D) — aliased, updated in place
    rows: jax.Array,    # (L, B, Hkv, 1, D)
    slots: jax.Array,   # (B,) int32, per-sequence write slot
    interpret: bool = False,
) -> jax.Array:
    """Per-sequence variant of :func:`kv_write_rows` for heterogeneous
    decode depths (continuous batching: sequences admitted mid-stream write
    their fresh K/V row at ``prompt_bucket + count - 1``, which differs per
    sequence)."""
    L, B, H, S, D = cache.shape
    tile = _tile_rows(cache.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B),
        in_specs=[
            pl.BlockSpec(
                (1, 1, H, 1, D), lambda l, b, *_: (l, b, 0, 0, 0)
            ),                                       # this (layer, b) row
            pl.BlockSpec(memory_space=pltpu.ANY),    # cache stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((H, tile, D), cache.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_batch, tile=tile),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},  # flat input 2 (prefetch, rows, cache)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(slots.astype(jnp.int32), rows.astype(cache.dtype), cache)


def _kernel_span(slots_ref, rows_ref, cache_ref, out_ref, buf, sem, *, tile, T, S):
    # Span variant for the speculative-verify pass: T contiguous rows per
    # (layer, b) starting at that sequence's slot.  The window is TWO
    # tiles tall because a T<=tile span can straddle one tile boundary;
    # rows that would land past S (draft overflow at the cache edge) fall
    # outside the window's row ids and are dropped — mirroring the XLA
    # fallback's scatter mode="drop".
    layer = pl.program_id(0)
    b = pl.program_id(1)
    slot = slots_ref[b]
    # Clamp in tile units and multiply LAST so Mosaic can prove the DMA
    # base is tile-aligned (an outer jnp.minimum defeats its divisibility
    # analysis — measured as a "tile index not divisible" compile error).
    aligned = jnp.minimum(slot // tile, S // tile - 2) * tile
    offset = slot - aligned

    tile_src = out_ref.at[layer, b, :, pl.ds(aligned, 2 * tile), :]
    fetch = pltpu.make_async_copy(tile_src, buf, sem)
    fetch.start()
    fetch.wait()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 1)  # (H,2t,D)
    for i in range(T):  # static unroll, T <= 8
        buf[...] = jnp.where(
            row_ids == offset + i, rows_ref[0, 0, :, i, :][:, None, :],
            buf[...],
        )

    store = pltpu.make_async_copy(buf, tile_src, sem)
    store.start()
    store.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_span_batch(
    cache: jax.Array,   # (L, B, Hkv, S, D) — aliased, updated in place
    rows: jax.Array,    # (L, B, Hkv, T, D)
    slots: jax.Array,   # (B,) int32, per-sequence first write slot
    interpret: bool = False,
) -> jax.Array:
    """Write each sequence's ``T`` fresh K/V rows at ``slots[b] ..
    slots[b] + T`` (the speculative-verify span); rows past the cache end
    are dropped."""
    L, B, H, S, D = cache.shape
    T = rows.shape[3]
    if T > 8:
        raise ValueError("span writer supports at most 8 rows")
    tile = _tile_rows(cache.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B),
        in_specs=[
            pl.BlockSpec(
                (1, 1, H, T, D), lambda l, b, *_: (l, b, 0, 0, 0)
            ),                                       # this (layer, b) span
            pl.BlockSpec(memory_space=pltpu.ANY),    # cache stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((H, 2 * tile, D), cache.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_span, tile=tile, T=T, S=S),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},  # flat input 2 (prefetch, rows, cache)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(slots.astype(jnp.int32), rows.astype(cache.dtype), cache)


def _kernel_paged(pages_ref, offs_ref, rows_ref, cache_ref, out_ref, buf, sem, *, tile):
    # Paged cache (L, n_pages, H, PS, D): grid (L, B); each cell
    # read-modify-writes the ``tile``-row tile of sequence b's current page.
    layer = pl.program_id(0)
    b = pl.program_id(1)
    page = pages_ref[b]
    off = offs_ref[b]
    aligned = (off // tile) * tile
    in_tile = off - aligned

    tile_src = out_ref.at[layer, page, :, pl.ds(aligned, tile), :]
    fetch = pltpu.make_async_copy(tile_src, buf, sem)
    fetch.start()
    fetch.wait()

    row_ids = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 1)  # (H,8,D)
    buf[...] = jnp.where(row_ids == in_tile, rows_ref[0, 0], buf[...])

    store = pltpu.make_async_copy(buf, tile_src, sem)
    store.start()
    store.wait()


@jax.jit
def kv_write_rows_paged(
    cache: jax.Array,   # (L, n_pages, Hkv, PS, D) — aliased, updated in place
    rows: jax.Array,    # (L, B, Hkv, 1, D)
    pages: jax.Array,   # (B,) int32 physical page per sequence
    offsets: jax.Array, # (B,) int32 row offset inside the page
) -> jax.Array:
    """Write each sequence's fresh K/V row into its page-table-resolved
    (page, offset) — the paged engine's decode-step writer."""
    L, n_pages, H, PS, D = cache.shape
    B = rows.shape[1]
    tile = _tile_rows(cache.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L, B),
        in_specs=[
            pl.BlockSpec(
                (1, 1, H, 1, D), lambda l, b, *_: (l, b, 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((H, tile, D), cache.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_paged, tile=tile),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},  # (pages, offs, rows, cache)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.clip(pages.astype(jnp.int32), 0, n_pages - 1),
        offsets.astype(jnp.int32),
        rows.astype(cache.dtype),
        cache,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_rows(
    cache: jax.Array,   # (L, B, Hkv, S, D) — aliased, updated in place
    rows: jax.Array,    # (L, B, Hkv, 1, D)
    slot: jax.Array,    # scalar int32
    interpret: bool = False,
) -> jax.Array:
    """Return ``cache`` with ``rows`` written at ``slot`` (no full copy)."""
    L, B, H, S, D = cache.shape
    tile = _tile_rows(cache.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(
                (1, B, H, 1, D), lambda l, *_: (l, 0, 0, 0, 0)
            ),                                       # this layer's rows
            pl.BlockSpec(memory_space=pltpu.ANY),    # cache stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((B, H, tile, D), cache.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, tile=tile),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},  # flat input 2 (prefetch, rows, cache)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(slot.reshape(1).astype(jnp.int32), rows.astype(cache.dtype), cache)
