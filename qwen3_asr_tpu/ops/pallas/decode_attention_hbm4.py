"""Flash-decode attention v5: dual-granularity pipelined (batch, block) stream.

v4 (decode_attention_hbm3) tiles the whole cache with ONE block size that
must divide both S and the prompt bucket, so a 512+256 cache forces 256-row
blocks and every step reads the full cache even when only ~60% of the rows
are valid.  Here the prompt region is tiled with the largest block that
divides the prompt bucket (up to 512 rows — fewer, bigger DMAs) and the
decode region with 128-row blocks (so early decode steps read at most 127
wasted rows instead of block_k-1), cutting HBM traffic by the
invalid-to-valid ratio.  Decode blocks are processed on a statically
sliced sub-buffer, so stale rows beyond the DMA are never read.

Same math as v4: two-interval mask over the stacked (L, B, Hkv, S, D)
cache, online softmax in f32, bf16 MXU inputs, fused fresh-token
self-term; per-core software-pipelined (batch element, block) walk with
_NBUF-1 DMAs always in flight.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_QPAD = 8
#: In-flight KV block buffers (prefetch depth _NBUF - 1).  Overridable for
#: A/B experiments; 4 measured best (see docs/PERFORMANCE.md).
_NBUF = int(os.environ.get("QWEN3_ASR_DECODE_NBUF", "4"))
_BLOCK_D = 128
#: Grid split over batch elements; 0 = auto (2 when B > 1).
_CORES = int(os.environ.get("QWEN3_ASR_DECODE_CORES", "0"))


def _kernel(
    layer_ref, prompt_len_ref, decode_end_ref, count_ref,
    q_ref,            # (1, BH, Hkv, QPAD, D) VMEM, f32 pre-scaled
    kall_ref,         # (L, B, Hkv, S, D) HBM (bf16, or int8 when quantized)
    vall_ref,
    *rest,
    block_p: int, prompt_bucket: int, per_core: int, b_pad: int,
    quantized: bool = False,
):
    # Quantized caches carry per-row f32 scales (L, B, Hkv, S) streamed
    # alongside the int8 tiles; scale math is folded into the score /
    # probability matrices (see ops/quant_kv.py docstring).
    if quantized:
        (ks_ref, vs_ref, knew_ref, vnew_ref, o_ref,
         k_buf, v_buf, ks_buf, vs_buf,
         k_sems, v_sems, ks_sems, vs_sems) = rest
    else:
        (knew_ref, vnew_ref, o_ref, k_buf, v_buf, k_sems, v_sems) = rest
        ks_ref = vs_ref = ks_buf = vs_buf = ks_sems = vs_sems = None
    core = pl.program_id(0)
    layer = layer_ref[0]
    my_count = count_ref[core]           # live batch elements on this core
    base = core * per_core

    def plen_of(bl):
        # Clamp: pipeline lookahead walks (bl, i) past the last live batch
        # element; the guarded prefetch never uses the result, but the SMEM
        # read itself must stay in bounds.
        return prompt_len_ref[jnp.minimum(base + bl, b_pad - 1)]

    def dend_of(bl):
        # Per-sequence decode end: sequences in a continuous batch sit at
        # heterogeneous decode depths (the engine admits mid-stream).
        return decode_end_ref[jnp.minimum(base + bl, b_pad - 1)]

    def n_prompt(bl):
        return pl.cdiv(plen_of(bl), block_p)

    def n_blocks(bl):
        return n_prompt(bl) + pl.cdiv(dend_of(bl) - prompt_bucket, _BLOCK_D)

    def coords(bl, i):
        """(is_prompt, row_offset) of block i of batch element bl."""
        np_b = n_prompt(bl)
        is_p = i < np_b
        off = jnp.where(
            is_p, i * block_p, prompt_bucket + (i - np_b) * _BLOCK_D
        )
        # Both branches are multiples of _BLOCK_D; the `where` hides that
        # from Mosaic's divisibility analysis, so restate it.
        return is_p, pl.multiple_of(off, _BLOCK_D)

    def _copies(bl, i, slot, width):
        """The (start-able, wait-able) async copies of block i at a width."""
        off = coords(bl, i)[1]
        sel = (slice(None),) if width == block_p else (
            slice(None), pl.ds(0, width),
        )
        copies = [
            pltpu.make_async_copy(
                kall_ref.at[layer, base + bl, :, pl.ds(off, width), :],
                k_buf.at[(slot, *sel, slice(None))], k_sems.at[slot],
            ),
            pltpu.make_async_copy(
                vall_ref.at[layer, base + bl, :, pl.ds(off, width), :],
                v_buf.at[(slot, *sel, slice(None))], v_sems.at[slot],
            ),
        ]
        if quantized:
            copies += [
                pltpu.make_async_copy(
                    ks_ref.at[layer, base + bl, :, pl.ds(off, width)],
                    ks_buf.at[(slot, *sel)], ks_sems.at[slot],
                ),
                pltpu.make_async_copy(
                    vs_ref.at[layer, base + bl, :, pl.ds(off, width)],
                    vs_buf.at[(slot, *sel)], vs_sems.at[slot],
                ),
            ]
        return copies

    def start(bl, i, slot):
        is_p, _ = coords(bl, i)

        @pl.when(is_p)
        def _():
            for c in _copies(bl, i, slot, block_p):
                c.start()

        @pl.when(jnp.logical_not(is_p))
        def _():
            for c in _copies(bl, i, slot, _BLOCK_D):
                c.start()

    def wait(bl, i, slot):
        is_p, _ = coords(bl, i)

        @pl.when(is_p)
        def _():
            for c in _copies(bl, i, slot, block_p):
                c.wait()

        @pl.when(jnp.logical_not(is_p))
        def _():
            for c in _copies(bl, i, slot, _BLOCK_D):
                c.wait()

    def next_coords(bl, i):
        last = i + 1 >= n_blocks(bl)
        return jnp.where(last, bl + 1, bl), jnp.where(last, 0, i + 1)

    # Warm up the pipeline: the first _NBUF-1 (bl, i) pairs.
    @pl.when(my_count > 0)
    def _warm():
        def w(n, c):
            bl, i = c
            @pl.when(bl < my_count)
            def _():
                start(bl, i, n)
            return next_coords(bl, i)
        jax.lax.fori_loop(0, _NBUF - 1, w, (0, 0))

    def b_loop(state):
        bl, slot = state
        plen = plen_of(bl)
        dend = dend_of(bl)
        total_b = n_blocks(bl)
        q = q_ref[0, bl].astype(jnp.bfloat16)             # (Hkv, QPAD, D)
        hkv, _, d = q.shape

        def tile_update(carry, k, v, off, width, ks=None, vs=None):
            """Online-softmax update over one (Hkv, width, D) tile.

            Quantized tiles carry per-row scales ``ks``/``vs``
            (Hkv, width): scores scale columnwise after the matmul
            (``(q·k8)·ks == q·(k8·ks)``) and value scales fold into the
            probability matrix (``(p·vs)·v8 == p·(v8·vs)``) — no D-wide
            dequantization anywhere.
            """
            m_prev, l_prev, acc = carry
            s = jax.lax.dot_general(
                q, k.astype(jnp.bfloat16),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                              # (Hkv, QPAD, width)
            if quantized:
                s = s * ks[:, None, :]
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + off
            valid = (cols < plen) | ((cols >= prompt_bucket) & (cols < dend))
            s = jnp.where(valid, s, _MASK_VALUE)

            m_tile = jnp.max(s, axis=2, keepdims=True)
            m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_tile, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :, :1])
            l_next = alpha * l_prev + jnp.broadcast_to(
                jnp.sum(p, axis=2, keepdims=True), l_prev.shape
            )
            pw = p * vs[:, None, :] if quantized else p
            pv = jax.lax.dot_general(
                pw.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return m_next, l_next, acc * alpha[:, :, :1] + pv

        def blk(i, carry):
            m_prev, l_prev, acc, slot = carry

            # Keep _NBUF-1 blocks in flight: start the one _NBUF-1 ahead.
            def ahead(_, c):
                return next_coords(*c)

            nb, ni = jax.lax.fori_loop(0, _NBUF - 1, ahead, (bl, i))

            @pl.when(nb < my_count)
            def _prefetch():
                start(nb, ni, jax.lax.rem(slot + _NBUF - 1, _NBUF))

            wait(bl, i, slot)
            is_p, off = coords(bl, i)

            def on_prompt(c):
                return tile_update(
                    c, k_buf[slot], v_buf[slot], off, block_p,
                    ks_buf[slot] if quantized else None,
                    vs_buf[slot] if quantized else None,
                )

            def on_decode(c):
                return tile_update(
                    c,
                    k_buf[slot, :, : _BLOCK_D, :],
                    v_buf[slot, :, : _BLOCK_D, :],
                    off,
                    _BLOCK_D,
                    ks_buf[slot, :, : _BLOCK_D] if quantized else None,
                    vs_buf[slot, :, : _BLOCK_D] if quantized else None,
                )

            m, l, acc = jax.lax.cond(
                is_p, on_prompt, on_decode, (m_prev, l_prev, acc)
            )
            return m, l, acc, jax.lax.rem(slot + 1, _NBUF)

        init = (
            jnp.full((hkv, _QPAD, 128), -jnp.inf, jnp.float32),
            jnp.zeros((hkv, _QPAD, 128), jnp.float32),
            jnp.zeros((hkv, _QPAD, d), jnp.float32),
            slot,
        )
        m, l, acc, slot = jax.lax.fori_loop(0, total_b, blk, init)

        # Fresh-token self term, then finalize this batch element.
        k_new = knew_ref[0, bl, :, 0].astype(jnp.bfloat16)
        s_self = jnp.sum(
            (q * k_new[:, None, :]).astype(jnp.float32), axis=2, keepdims=True
        )
        m_next = jnp.maximum(m, jnp.broadcast_to(s_self, m.shape))
        alpha = jnp.exp(m - m_next)
        p_self = jnp.exp(s_self - m_next[:, :, :1])
        l = alpha * l + jnp.broadcast_to(p_self, l.shape)
        v_new = vnew_ref[0, bl, :, 0].astype(jnp.float32)
        acc = acc * alpha[:, :, :1] + p_self * v_new[:, None, :]

        l_final = l[:, :, :1]
        l_final = jnp.where(l_final == 0.0, 1.0, l_final)
        o_ref[0, bl] = (acc / l_final).astype(o_ref.dtype)
        return bl + 1, slot

    jax.lax.while_loop(lambda st: st[0] < my_count, b_loop, (0, 0))


def _hbm4_call(
    q, kall, vall, ks, vs, k_new, v_new, layer, prompt_len, decode_end,
    prompt_bucket, scale, block_p, interpret,
):
    """Shared host-side wiring for the bf16 and int8 cache variants
    (``ks``/``vs`` are the per-row scale arrays, None for bf16)."""
    quantized = ks is not None
    B, hq, D = q.shape
    hkv, S = kall.shape[2], kall.shape[3]
    group = hq // hkv
    if scale is None:
        scale = D ** -0.5
    if block_p is None:
        block_p = next(
            bp for bp in (512, 256, 128) if prompt_bucket % bp == 0
        )
    if prompt_bucket % block_p:
        raise ValueError(f"prompt_bucket={prompt_bucket} not tileable by {block_p}")
    if (S - prompt_bucket) % _BLOCK_D:
        raise ValueError(
            f"decode region {S - prompt_bucket} not a multiple of {_BLOCK_D}"
        )

    cores = _CORES or (2 if B > 1 else 1)
    cores = min(cores, B)
    per_core = -(-B // cores)
    b_pad = cores * per_core
    counts = jnp.clip(
        jnp.asarray([B - c * per_core for c in range(cores)], jnp.int32),
        0, per_core,
    )

    qg = (q.astype(jnp.float32) * scale).reshape(B, hkv, group, D)
    qg = jnp.pad(
        qg, ((0, b_pad - B), (0, 0), (0, _QPAD - group), (0, 0))
    ).reshape(cores, per_core, hkv, _QPAD, D)
    knew_p = jnp.pad(k_new, ((0, b_pad - B), (0, 0), (0, 0), (0, 0))).reshape(
        cores, per_core, hkv, 1, D
    )
    vnew_p = jnp.pad(v_new, ((0, b_pad - B), (0, 0), (0, 0), (0, 0))).reshape(
        cores, per_core, hkv, 1, D
    )
    # Every live lane must own >= 1 block: the software pipeline's
    # producer walk (next_coords) always emits pair (bl, 0), so a lane
    # with zero blocks (plen == 0 and no decode rows — an idle slot in a
    # continuous batch) would desync DMA starts from waits and crash the
    # device.  Clamping plen to 1 makes such a lane read one (masked-
    # irrelevant, finite) row; its output is discarded by the caller.
    plen_p = jnp.pad(
        jnp.maximum(prompt_len.astype(jnp.int32), 1), (0, b_pad - B)
    )
    dend_p = jnp.pad(
        jnp.broadcast_to(jnp.asarray(decode_end, jnp.int32), (B,)),
        (0, b_pad - B),
        constant_values=prompt_bucket,  # padding lanes: zero decode blocks
    )

    in_specs = [
        pl.BlockSpec(
            (1, per_core, hkv, _QPAD, D), lambda c, *_: (c, 0, 0, 0, 0)
        ),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    operands = [kall, vall]
    scratch = [
        pltpu.VMEM((_NBUF, hkv, block_p, D), kall.dtype),
        pltpu.VMEM((_NBUF, hkv, block_p, D), vall.dtype),
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        operands += [ks, vs]
        scratch += [
            pltpu.VMEM((_NBUF, hkv, block_p), jnp.float32),
            pltpu.VMEM((_NBUF, hkv, block_p), jnp.float32),
        ]
    in_specs += [
        pl.BlockSpec(
            (1, per_core, hkv, 1, D), lambda c, *_: (c, 0, 0, 0, 0)
        ),
        pl.BlockSpec(
            (1, per_core, hkv, 1, D), lambda c, *_: (c, 0, 0, 0, 0)
        ),
    ]
    scratch += [pltpu.SemaphoreType.DMA((_NBUF,))] * (4 if quantized else 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(cores,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, per_core, hkv, _QPAD, D), lambda c, *_: (c, 0, 0, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            block_p=block_p,
            prompt_bucket=prompt_bucket,
            per_core=per_core,
            b_pad=b_pad,
            quantized=quantized,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (cores, per_core, hkv, _QPAD, D), jnp.float32
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        plen_p,
        dend_p,
        counts,
        qg,
        *operands,
        knew_p,
        vnew_p,
    )
    out = out.reshape(b_pad, hkv, _QPAD, D)[:B, :, :group, :]
    return out.reshape(B, hq, D).astype(q.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("prompt_bucket", "scale", "block_p", "interpret"),
)
def decode_attention_hbm4(
    q: jax.Array,            # (B, Hq, D)
    kall: jax.Array,         # (L, B, Hkv, S, D)
    vall: jax.Array,
    k_new: jax.Array,        # (B, Hkv, 1, D)
    v_new: jax.Array,
    layer: jax.Array,
    prompt_len: jax.Array,   # (B,)
    decode_end: jax.Array,   # scalar or (B,) — per-sequence decode depth
    prompt_bucket: int,
    scale: float | None = None,
    block_p: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Dual-granularity flash-decode over the stacked KV cache.

    Requires ``prompt_bucket % block_p == 0`` and a decode region
    (``S - prompt_bucket``) that is a multiple of 128.
    """
    return _hbm4_call(
        q, kall, vall, None, None, k_new, v_new, layer, prompt_len,
        decode_end, prompt_bucket, scale, block_p, interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("prompt_bucket", "scale", "block_p", "interpret"),
)
def decode_attention_hbm4_q8(
    q: jax.Array,            # (B, Hq, D)
    kall: dict,              # {"q": int8 (L, B, Hkv, S, D), "s": f32 (L, B, Hkv, S)}
    vall: dict,
    k_new: jax.Array,        # (B, Hkv, 1, D) — fresh rows stay bf16
    v_new: jax.Array,
    layer: jax.Array,
    prompt_len: jax.Array,
    decode_end: jax.Array,
    prompt_bucket: int,
    scale: float | None = None,
    block_p: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """int8-cache variant: streams half the KV bytes per step plus tiny
    per-row scale tiles; equals the bf16 kernel over the dequantized
    cache to bf16 tolerance (ops/quant_kv.py scale folding)."""
    return _hbm4_call(
        q, kall["q"], vall["q"], kall["s"], vall["s"], k_new, v_new,
        layer, prompt_len, decode_end, prompt_bucket, scale, block_p,
        interpret,
    )
