"""Flash-decode attention v6: lane-grouped DMA slabs.

v5 (decode_attention_hbm4) issues one K and one V async-copy per (batch
lane, block) — at B=64 that is ~256 copies per layer, and measurement
shows the kernel is bound by DMA *issue* overhead, not HBM bandwidth
(~1.14 ms/layer vs a ~0.2 ms stream bound; each copy moves only ~1 MB).

Here ``_GROUP`` lanes share every DMA: the (L, B, Hkv, S, D) cache layout
makes a G-lane slab ``kall[layer, g0:g0+G, :, off:off+rows, :]`` a single
strided copy of G×Hkv large chunks, so the per-copy setup cost is
amortized G-fold and the in-flight bytes per buffer grow G-fold with the
same pipeline depth.  Group geometry (prompt blocks / decode blocks) is
the max over the group's lanes; the per-lane two-interval mask keeps the
math exact, so mixed-depth groups only cost the bytes of their deepest
member.

Same math as v5: two-interval mask, online softmax in f32, bf16 MXU
inputs, fused fresh-token self-term, per-sequence ``decode_end``.
Cites: reference decode loop semantics at generate.py:289-315 (the loop
this kernel accelerates); no reference kernel counterpart (MLX sdpa).
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
_NBUF = 3   # in-flight slab buffers (prefetch depth _NBUF - 1)
_BLOCK_D = 128
#: Lanes per DMA slab.  4 keeps VMEM use at ~25 MB with block_p=512.
_GROUP = int(os.environ.get("QWEN3_ASR_DECODE_GROUP", "4"))


def _kernel(
    layer_ref, prompt_len_ref, decode_end_ref, gplen_ref, gdend_ref,
    q_ref,            # (1, per_core, Hkv, QPAD, D) VMEM, f32 pre-scaled
    kall_ref,         # (L, B, Hkv, S, D) HBM
    vall_ref,
    knew_ref,         # (1, per_core, Hkv, 1, D) VMEM
    vnew_ref,
    o_ref,            # (1, per_core, Hkv, QPAD, D) VMEM (f32)
    k_buf, v_buf,     # (NBUF, G, Hkv, block_p, D)
    k_sems, v_sems,
    *, block_p: int, prompt_bucket: int, per_core: int, n_groups: int,
    group: int,
):
    core = pl.program_id(0)
    layer = layer_ref[0]
    gbase = core * n_groups

    def gplen(g):
        # Group prompt length: max over the group's lanes (precomputed on
        # host into SMEM).  Clamped index: the pipeline lookahead walks
        # past the last group.
        return gplen_ref[jnp.minimum(gbase + g, gplen_ref.shape[0] - 1)]

    def gdend(g):
        return gdend_ref[jnp.minimum(gbase + g, gdend_ref.shape[0] - 1)]

    def n_prompt(g):
        return pl.cdiv(gplen(g), block_p)

    def n_blocks(g):
        return n_prompt(g) + pl.cdiv(gdend(g) - prompt_bucket, _BLOCK_D)

    def coords(g, i):
        np_b = n_prompt(g)
        is_p = i < np_b
        off = jnp.where(
            is_p, i * block_p, prompt_bucket + (i - np_b) * _BLOCK_D
        )
        return is_p, pl.multiple_of(off, _BLOCK_D)

    def lane0(g):
        return core * per_core + g * group

    def start(g, i, slot):
        is_p, off = coords(g, i)
        b0 = lane0(g)

        @pl.when(is_p)
        def _():
            pltpu.make_async_copy(
                kall_ref.at[layer, pl.ds(b0, group), :, pl.ds(off, block_p), :],
                k_buf.at[slot], k_sems.at[slot],
            ).start()
            pltpu.make_async_copy(
                vall_ref.at[layer, pl.ds(b0, group), :, pl.ds(off, block_p), :],
                v_buf.at[slot], v_sems.at[slot],
            ).start()

        @pl.when(jnp.logical_not(is_p))
        def _():
            pltpu.make_async_copy(
                kall_ref.at[layer, pl.ds(b0, group), :, pl.ds(off, _BLOCK_D), :],
                k_buf.at[slot, :, :, pl.ds(0, _BLOCK_D), :], k_sems.at[slot],
            ).start()
            pltpu.make_async_copy(
                vall_ref.at[layer, pl.ds(b0, group), :, pl.ds(off, _BLOCK_D), :],
                v_buf.at[slot, :, :, pl.ds(0, _BLOCK_D), :], v_sems.at[slot],
            ).start()

    def wait(g, i, slot):
        is_p, off = coords(g, i)
        b0 = lane0(g)

        @pl.when(is_p)
        def _():
            pltpu.make_async_copy(
                kall_ref.at[layer, pl.ds(b0, group), :, pl.ds(off, block_p), :],
                k_buf.at[slot], k_sems.at[slot],
            ).wait()
            pltpu.make_async_copy(
                vall_ref.at[layer, pl.ds(b0, group), :, pl.ds(off, block_p), :],
                v_buf.at[slot], v_sems.at[slot],
            ).wait()

        @pl.when(jnp.logical_not(is_p))
        def _():
            pltpu.make_async_copy(
                kall_ref.at[layer, pl.ds(b0, group), :, pl.ds(off, _BLOCK_D), :],
                k_buf.at[slot, :, :, pl.ds(0, _BLOCK_D), :], k_sems.at[slot],
            ).wait()
            pltpu.make_async_copy(
                vall_ref.at[layer, pl.ds(b0, group), :, pl.ds(off, _BLOCK_D), :],
                v_buf.at[slot, :, :, pl.ds(0, _BLOCK_D), :], v_sems.at[slot],
            ).wait()

    def next_coords(g, i):
        last = i + 1 >= n_blocks(g)
        return jnp.where(last, g + 1, g), jnp.where(last, 0, i + 1)

    # Pipeline warmup: first _NBUF-1 (group, block) pairs.
    def w(n, c):
        g, i = c
        @pl.when(g < n_groups)
        def _():
            start(g, i, n)
        return next_coords(g, i)

    jax.lax.fori_loop(0, _NBUF - 1, w, (0, 0))

    def g_loop(state):
        g, slot = state
        total_b = n_blocks(g)
        l0 = g * group
        lane_abs = core * per_core + l0
        # Per-lane queries/geometry (Mosaic has no multi-batch-dim matmul
        # and SMEM only does scalar loads, so the COMPUTE unrolls over the
        # group's lanes — the DMA stays grouped, which is the whole win).
        qs = [
            q_ref[0, pl.ds(l0 + j, 1)][0].astype(jnp.bfloat16)
            for j in range(group)
        ]                                             # each (Hkv, QPAD, D)
        plens = [prompt_len_ref[lane_abs + j] for j in range(group)]
        dends = [decode_end_ref[lane_abs + j] for j in range(group)]
        hkv, _, d = qs[0].shape

        def tile_update(j, carry, k, v, off, width):
            """Online softmax for lane j over one (Hkv, width, D) tile."""
            m_prev, l_prev, acc = carry
            s = jax.lax.dot_general(
                qs[j], k.astype(jnp.bfloat16),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                          # (Hkv, QPAD, width)
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + off
            valid = (cols < plens[j]) | (
                (cols >= prompt_bucket) & (cols < dends[j])
            )
            s = jnp.where(valid, s, _MASK_VALUE)

            m_tile = jnp.max(s, axis=2, keepdims=True)
            m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_tile, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :, :1])
            l_next = alpha * l_prev + jnp.broadcast_to(
                jnp.sum(p, axis=2, keepdims=True), l_prev.shape
            )
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return m_next, l_next, acc * alpha[:, :, :1] + pv

        def blk(i, carry):
            lanes, slot = carry

            def ahead(_, c):
                return next_coords(*c)

            ng, ni = jax.lax.fori_loop(0, _NBUF - 1, ahead, (g, i))

            @pl.when(ng < n_groups)
            def _prefetch():
                start(ng, ni, jax.lax.rem(slot + _NBUF - 1, _NBUF))

            wait(g, i, slot)
            is_p, off = coords(g, i)

            def on_prompt(ls):
                return tuple(
                    tile_update(j, ls[j], k_buf[slot, j], v_buf[slot, j],
                                off, block_p)
                    for j in range(group)
                )

            def on_decode(ls):
                return tuple(
                    tile_update(
                        j, ls[j],
                        k_buf[slot, j, :, :_BLOCK_D, :],
                        v_buf[slot, j, :, :_BLOCK_D, :],
                        off, _BLOCK_D,
                    )
                    for j in range(group)
                )

            lanes = jax.lax.cond(is_p, on_prompt, on_decode, lanes)
            return lanes, jax.lax.rem(slot + 1, _NBUF)

        lane_init = (
            jnp.full((hkv, _QPAD, 128), -jnp.inf, jnp.float32),
            jnp.zeros((hkv, _QPAD, 128), jnp.float32),
            jnp.zeros((hkv, _QPAD, d), jnp.float32),
        )
        lanes, slot = jax.lax.fori_loop(
            0, total_b, blk, (tuple(lane_init for _ in range(group)), slot)
        )

        # Fresh-token self term, then finalize each lane.
        for j in range(group):
            m, l, acc = lanes[j]
            k_new = knew_ref[0, pl.ds(l0 + j, 1)][0, :, 0].astype(jnp.bfloat16)
            s_self = jnp.sum(
                (qs[j] * k_new[:, None, :]).astype(jnp.float32),
                axis=2, keepdims=True,
            )
            m_next = jnp.maximum(m, jnp.broadcast_to(s_self, m.shape))
            alpha = jnp.exp(m - m_next)
            p_self = jnp.exp(s_self - m_next[:, :, :1])
            l = alpha * l + jnp.broadcast_to(p_self, l.shape)
            v_new = vnew_ref[0, pl.ds(l0 + j, 1)][0, :, 0].astype(jnp.float32)
            acc = acc * alpha[:, :, :1] + p_self * v_new[:, None, :]

            l_final = l[:, :, :1]
            l_final = jnp.where(l_final == 0.0, 1.0, l_final)
            o_ref[0, pl.ds(l0 + j, 1)] = (acc / l_final).astype(o_ref.dtype)[
                None
            ]
        return g + 1, slot

    jax.lax.while_loop(lambda st: st[0] < n_groups, g_loop, (0, 0))


@functools.partial(
    jax.jit,
    static_argnames=("prompt_bucket", "scale", "block_p", "interpret"),
)
def decode_attention_hbm5(
    q: jax.Array,            # (B, Hq, D)
    kall: jax.Array,         # (L, B, Hkv, S, D)
    vall: jax.Array,
    k_new: jax.Array,        # (B, Hkv, 1, D)
    v_new: jax.Array,
    layer: jax.Array,
    prompt_len: jax.Array,   # (B,)
    decode_end: jax.Array,   # scalar or (B,)
    prompt_bucket: int,
    scale: float | None = None,
    block_p: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Lane-grouped flash-decode over the stacked KV cache.

    Requires ``prompt_bucket % block_p == 0`` and a decode region that is
    a multiple of 128 (same contract as v5).
    """
    B, hq, D = q.shape
    hkv, S = kall.shape[2], kall.shape[3]
    group_q = hq // hkv
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

    G = max(1, min(_GROUP, B))
    cores = 2 if B > G else 1
    groups_per_core = -(-B // (cores * G))
    per_core = groups_per_core * G
    b_pad = cores * per_core
    n_groups_total = cores * groups_per_core

    qg = (q.astype(jnp.float32) * scale).reshape(B, hkv, group_q, D)
    qg = jnp.pad(
        qg, ((0, b_pad - B), (0, 0), (0, _QPAD - group_q), (0, 0))
    ).reshape(cores, per_core, hkv, _QPAD, D)
    knew_p = jnp.pad(k_new, ((0, b_pad - B), (0, 0), (0, 0), (0, 0))).reshape(
        cores, per_core, hkv, 1, D
    )
    vnew_p = jnp.pad(v_new, ((0, b_pad - B), (0, 0), (0, 0), (0, 0))).reshape(
        cores, per_core, hkv, 1, D
    )
    # Same liveness rule as v5: every lane owns >= 1 block so the
    # producer/consumer walks stay in sync; padding lanes read one masked
    # row and are discarded.  The cache must be padded to b_pad lanes by
    # the caller (decoder_forward pads the batch to the compiled width).
    plen_p = jnp.pad(
        jnp.maximum(prompt_len.astype(jnp.int32), 1), (0, b_pad - B),
        constant_values=1,
    )
    dend_p = jnp.pad(
        jnp.broadcast_to(jnp.asarray(decode_end, jnp.int32), (B,)),
        (0, b_pad - B),
        constant_values=prompt_bucket,
    )
    if b_pad > B:
        padb = ((0, 0), (0, b_pad - B), (0, 0), (0, 0), (0, 0))
        kall = jnp.pad(kall, padb)
        vall = jnp.pad(vall, padb)

    # Per-group geometry (max over lanes), precomputed host-side into SMEM.
    gl = plen_p.reshape(n_groups_total, G).max(axis=1)
    gd = dend_p.reshape(n_groups_total, G).max(axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(cores,),
        in_specs=[
            pl.BlockSpec(
                (1, per_core, hkv, _QPAD, D), lambda c, *_: (c, 0, 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, per_core, hkv, 1, D), lambda c, *_: (c, 0, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, per_core, hkv, 1, D), lambda c, *_: (c, 0, 0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, per_core, hkv, _QPAD, D), lambda c, *_: (c, 0, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, G, hkv, block_p, D), kall.dtype),
            pltpu.VMEM((_NBUF, G, hkv, block_p, D), vall.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            block_p=block_p,
            prompt_bucket=prompt_bucket,
            per_core=per_core,
            n_groups=groups_per_core,
            group=G,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (cores, per_core, hkv, _QPAD, D), jnp.float32
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # Slab buffers exceed the 16 MB default scoped-VMEM budget:
            # 2 (K,V) x NBUF x G x Hkv x block_p x D x 2B ~= 25 MB at the
            # default geometry (v5e VMEM is 128 MB).
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        plen_p,
        dend_p,
        gl,
        gd,
        qg,
        kall,
        vall,
        knew_p,
        vnew_p,
    )
    out = out.reshape(b_pad, hkv, _QPAD, D)[:B, :, :group_q, :]
    return out.reshape(B, hq, D).astype(q.dtype)
