"""Flash-decode attention v3: whole-batch-element grid cells.

Same algorithm as ``decode_attention_hbm`` (manual double-buffered DMA over
the stacked cache, relevant-block skip, fused self-term) but each grid cell
processes ALL KV heads of one batch element: 8x fewer cells and 8x larger
DMA transfers (``(Hkv, BK, D)`` strided blocks), aimed at the short-context
regime where v2's per-(b, h) cells are overhead-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_QPAD = 8


def _kernel(
    layer_ref, prompt_len_ref, decode_end_ref,
    q_ref,            # (1, Hkv, QPAD, D) f32, pre-scaled
    kall_ref,         # (L, B, Hkv, S, D) HBM
    vall_ref,
    knew_ref,         # (1, Hkv, 1, D)
    vnew_ref,
    o_ref,            # (1, Hkv, QPAD, D) f32
    k_buf, v_buf,     # (2, Hkv, BK, D)
    k_sems, v_sems,
    *, block_k: int, prompt_bucket: int,
):
    b = pl.program_id(0)
    layer = layer_ref[0]
    plen = prompt_len_ref[b]
    dend = decode_end_ref[0]

    n_prompt = pl.cdiv(plen, block_k)
    first_decode = prompt_bucket // block_k
    n_decode = pl.cdiv(dend - prompt_bucket, block_k)
    total = n_prompt + n_decode

    def block_index(i):
        return jnp.where(i < n_prompt, i, first_decode + (i - n_prompt))

    def dma_pair(i, slot):
        bi = block_index(i)
        return (
            pltpu.make_async_copy(
                kall_ref.at[layer, b, :, pl.ds(bi * block_k, block_k), :],
                k_buf.at[slot], k_sems.at[slot],
            ),
            pltpu.make_async_copy(
                vall_ref.at[layer, b, :, pl.ds(bi * block_k, block_k), :],
                v_buf.at[slot], v_sems.at[slot],
            ),
        )

    kd, vd = dma_pair(0, 0)
    kd.start(); vd.start()
    # bf16 MXU inputs with f32 accumulation — the same contract as the XLA
    # einsum path (and no per-block f32 converts of the K/V tiles).
    q = q_ref[0].astype(jnp.bfloat16)                     # (Hkv, QPAD, D)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < total)
        def _prefetch():
            kd, vd = dma_pair(i + 1, jax.lax.rem(i + 1, 2))
            kd.start(); vd.start()

        kd, vd = dma_pair(i, slot)
        kd.wait(); vd.wait()
        k = k_buf[slot]                                   # (Hkv, BK, D)
        s = jax.lax.dot_general(
            q, k.astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),                 # batch over heads
            preferred_element_type=jnp.float32,
        )                                                  # (Hkv, QPAD, BK)

        bi = block_index(i)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + bi * block_k
        valid = (cols < plen) | ((cols >= prompt_bucket) & (cols < dend))
        s = jnp.where(valid, s, _MASK_VALUE)

        m_tile = jnp.max(s, axis=2, keepdims=True)         # (Hkv, QPAD, 1)
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
        )                                                  # (Hkv, QPAD, D)
        acc = acc * alpha[:, :, : 1] + pv
        return m_next, l_next, acc

    hkv, _, d = q.shape
    init = (
        jnp.full((hkv, _QPAD, 128), -jnp.inf, jnp.float32),
        jnp.zeros((hkv, _QPAD, 128), jnp.float32),
        jnp.zeros((hkv, _QPAD, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, total, body, init)

    k_new = knew_ref[0, :, 0].astype(jnp.bfloat16)         # (Hkv, D)
    s_self = jnp.sum(
        (q * k_new[:, None, :]).astype(jnp.float32), axis=2, keepdims=True
    )                                                      # (Hkv, QPAD, 1)
    m_next = jnp.maximum(m, jnp.broadcast_to(s_self, m.shape))
    alpha = jnp.exp(m - m_next)
    p_self = jnp.exp(s_self - m_next[:, :, :1])
    l = alpha * l + jnp.broadcast_to(p_self, l.shape)
    v_new = vnew_ref[0, :, 0].astype(jnp.float32)
    acc = acc * alpha[:, :, :1] + p_self * v_new[:, None, :]

    l_final = l[:, :, :1]
    l_final = jnp.where(l_final == 0.0, 1.0, l_final)
    o_ref[0] = (acc / l_final).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("prompt_bucket", "scale", "block_k", "interpret"),
)
def decode_attention_hbm2(
    q: jax.Array,            # (B, Hq, D)
    kall: jax.Array,         # (L, B, Hkv, S, D)
    vall: jax.Array,
    k_new: jax.Array,        # (B, Hkv, 1, D)
    v_new: jax.Array,
    layer: jax.Array,
    prompt_len: jax.Array,   # (B,)
    decode_end: jax.Array,   # scalar — slot being written this step
    prompt_bucket: int,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """As ``decode_attention_hbm`` with per-batch-element grid cells."""
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

    qg = (q.astype(jnp.float32) * scale).reshape(B, hkv, group, D)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, _QPAD - group), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, hkv, _QPAD, D), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, hkv, 1, D), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, hkv, 1, D), lambda b, *_: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hkv, _QPAD, D), lambda b, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, hkv, block_k, D), kall.dtype),
            pltpu.VMEM((2, hkv, block_k, D), vall.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, prompt_bucket=prompt_bucket),
        out_shape=jax.ShapeDtypeStruct((B, hkv, _QPAD, D), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        prompt_len.astype(jnp.int32),
        decode_end.reshape(1).astype(jnp.int32),
        qg,
        kall,
        vall,
        k_new,
        v_new,
    )
    return out[:, :, :group, :].reshape(B, hq, D).astype(q.dtype)
