"""Flash-decode attention v4: fully pipelined (batch, block) stream.

v3 (decode_attention_hbm2) serializes one grid cell per batch element, so
its fixed per-cell costs (DMA issue latency, small-op overhead) multiply by
B.  Here the grid is just the TensorCores; each core owns a contiguous half
of the batch and walks it in ONE software-pipelined loop over
(batch element, KV block) pairs with the next block's DMA always in flight
— including across batch-element boundaries, where v3 stalls.

Same math as v2/v3: two-interval mask over the stacked cache, online
softmax in f32, bf16 MXU inputs, fused fresh-token self-term.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_QPAD = 8
_NBUF = 4   # in-flight KV block buffers (prefetch depth _NBUF - 1)


def _kernel(
    layer_ref, prompt_len_ref, decode_end_ref, count_ref,
    q_ref,            # (1, BH, Hkv, QPAD, D) VMEM, f32 pre-scaled
    kall_ref,         # (L, B, Hkv, S, D) HBM
    vall_ref,
    knew_ref,         # (1, BH, Hkv, 1, D) VMEM
    vnew_ref,
    o_ref,            # (1, BH, Hkv, QPAD, D) VMEM (f32)
    k_buf, v_buf,     # (NBUF, Hkv, BK, D)
    k_sems, v_sems,
    *, block_k: int, prompt_bucket: int, per_core: int, b_pad: int,
):
    core = pl.program_id(0)
    layer = layer_ref[0]
    dend = decode_end_ref[0]
    my_count = count_ref[core]           # live batch elements on this core
    base = core * per_core
    first_decode = prompt_bucket // block_k
    n_decode = pl.cdiv(dend - prompt_bucket, block_k)

    def plen_of(bl):
        # Clamp: the pipeline lookahead walks (bl, i) past the last live
        # batch element; the guarded prefetch never uses the result, but
        # the SMEM read itself must stay in bounds.
        return prompt_len_ref[jnp.minimum(base + bl, b_pad - 1)]

    def n_blocks(bl):
        return pl.cdiv(plen_of(bl), block_k) + n_decode

    def block_index(bl, i):
        n_prompt = pl.cdiv(plen_of(bl), block_k)
        return jnp.where(i < n_prompt, i, first_decode + (i - n_prompt))

    def start(bl, i, slot):
        bi = block_index(bl, i)
        pltpu.make_async_copy(
            kall_ref.at[layer, base + bl, :, pl.ds(bi * block_k, block_k), :],
            k_buf.at[slot], k_sems.at[slot],
        ).start()
        pltpu.make_async_copy(
            vall_ref.at[layer, base + bl, :, pl.ds(bi * block_k, block_k), :],
            v_buf.at[slot], v_sems.at[slot],
        ).start()

    def wait(bl, i, slot):
        bi = block_index(bl, i)
        pltpu.make_async_copy(
            kall_ref.at[layer, base + bl, :, pl.ds(bi * block_k, block_k), :],
            k_buf.at[slot], k_sems.at[slot],
        ).wait()
        pltpu.make_async_copy(
            vall_ref.at[layer, base + bl, :, pl.ds(bi * block_k, block_k), :],
            v_buf.at[slot], v_sems.at[slot],
        ).wait()

    def next_coords(bl, i):
        last = i + 1 >= n_blocks(bl)
        return jnp.where(last, bl + 1, bl), jnp.where(last, 0, i + 1)

    # Warm up a deeper pipeline: the first _NBUF-1 (bl, i) pairs.
    @pl.when(my_count > 0)
    def _warm():
        def w(n, coords):
            bl, i = coords
            @pl.when(bl < my_count)
            def _():
                start(bl, i, n)
            return next_coords(bl, i)
        jax.lax.fori_loop(0, _NBUF - 1, w, (0, 0))

    def b_loop(state):
        bl, slot = state
        plen = prompt_len_ref[base + bl]
        total_b = n_blocks(bl)
        q = q_ref[0, bl].astype(jnp.bfloat16)             # (Hkv, QPAD, D)

        def blk(i, carry):
            m_prev, l_prev, acc, slot = carry

            # Keep _NBUF-1 blocks in flight: start the one _NBUF-1 ahead.
            def ahead(_, coords):
                return next_coords(*coords)

            nb, ni = jax.lax.fori_loop(0, _NBUF - 1, ahead, (bl, i))

            @pl.when(nb < my_count)
            def _prefetch():
                start(nb, ni, jax.lax.rem(slot + _NBUF - 1, _NBUF))

            wait(bl, i, slot)
            k = k_buf[slot]
            s = jax.lax.dot_general(
                q, k.astype(jnp.bfloat16),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                              # (Hkv, QPAD, BK)

            bi = block_index(bl, i)
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + bi * block_k
            valid = (cols < plen) | (
                (cols >= prompt_bucket) & (cols < dend)
            )
            s = jnp.where(valid, s, _MASK_VALUE)

            m_tile = jnp.max(s, axis=2, keepdims=True)
            m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_tile, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :, :1])
            l_next = alpha * l_prev + jnp.broadcast_to(
                jnp.sum(p, axis=2, keepdims=True), l_prev.shape
            )
            v = v_buf[slot]
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha[:, :, :1] + pv
            return m_next, l_next, acc, jax.lax.rem(slot + 1, _NBUF)

        hkv, _, d = q.shape
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


@functools.partial(
    jax.jit,
    static_argnames=("prompt_bucket", "scale", "block_k", "interpret"),
)
def decode_attention_hbm3(
    q: jax.Array,            # (B, Hq, D)
    kall: jax.Array,         # (L, B, Hkv, S, D)
    vall: jax.Array,
    k_new: jax.Array,        # (B, Hkv, 1, D)
    v_new: jax.Array,
    layer: jax.Array,
    prompt_len: jax.Array,   # (B,)
    decode_end: jax.Array,
    prompt_bucket: int,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """As v3 but with a per-core fully pipelined (batch, block) stream."""
    B, hq, D = q.shape
    hkv, S = kall.shape[2], kall.shape[3]
    group = hq // hkv
    if scale is None:
        scale = D ** -0.5
    block_k = min(block_k, S)
    while block_k > 128 and (S % block_k or prompt_bucket % block_k):
        block_k //= 2
    if S % block_k or prompt_bucket % block_k:
        raise ValueError(f"S={S}/Pb={prompt_bucket} not tileable by {block_k}")

    cores = 2 if B > 1 else 1
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
    plen_p = jnp.pad(prompt_len.astype(jnp.int32), (0, b_pad - B))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
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
            pltpu.VMEM((_NBUF, hkv, block_k, D), kall.dtype),
            pltpu.VMEM((_NBUF, hkv, block_k, D), vall.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            block_k=block_k,
            prompt_bucket=prompt_bucket,
            per_core=per_core,
            b_pad=b_pad,
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
        decode_end.reshape(1).astype(jnp.int32),
        counts,
        qg,
        kall,
        vall,
        knew_p,
        vnew_p,
    )
    out = out.reshape(b_pad, hkv, _QPAD, D)[:B, :, :group, :]
    return out.reshape(B, hq, D).astype(q.dtype)
