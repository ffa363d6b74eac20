"""Flash-decode attention v2: manual DMA from the stacked HBM cache.

Differences from ``decode_attention.py`` (the BlockSpec-pipelined v1):

  * reads the FULL stacked cache (L, B, Hkv, S, D) via explicit async
    copies with a layer index — the XLA path and kernel v1 both force a
    per-layer (B, Hkv, S, D) slice copy through HBM first (~1.9 ms/step at
    B=16 on v5e);
  * only RELEVANT blocks are fetched: per (b, h) the loop enumerates the
    prompt prefix blocks and the live decode blocks and skips the padded
    prompt tail and the unwritten decode region entirely — at a 15-minute
    prompt bucket that is 20-40% of the cache, and the fraction grows with
    padding;
  * double buffering: block i+1's DMA is in flight while block i computes
    (guide: paged attention, sections 9-11);
  * the fresh token's K/V row (not yet written to the cache under the
    split-attention decode scheme) enters the online softmax as a final
    self-term, so the kernel composes with the single post-scan cache
    write.

Statistics in f32; mask value -0.7 * f32max.  Parity pinned against the
jnp oracle in tests/test_pallas.py (interpret mode).
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
    layer_ref,        # scalar prefetch: (1,)
    prompt_len_ref,   # scalar prefetch: (B,)
    decode_end_ref,   # scalar prefetch: (1,) — last attendable decode slot
    q_ref,            # (1, 1, QPAD, D) f32, pre-scaled
    kall_ref,         # (L, B, Hkv, S, D) in HBM/ANY
    vall_ref,         # (L, B, Hkv, S, D) in HBM/ANY
    knew_ref,         # (1, 1, 1, D) fresh key (VMEM)
    vnew_ref,         # (1, 1, 1, D) fresh value (VMEM)
    o_ref,            # (1, 1, QPAD, D) f32
    k_buf, v_buf,     # (2, BK, D) VMEM double buffers
    k_sems, v_sems,   # DMA semaphores (2,)
    *, block_k: int, prompt_bucket: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    layer = layer_ref[0]
    plen = prompt_len_ref[b]
    dend = decode_end_ref[0]

    # Relevant blocks: ceil(plen / BK) prompt blocks, then the blocks
    # covering the WRITTEN decode region [Pb, dend) — slot ``dend`` is the
    # row being produced this step and enters via the fused self-term.
    n_prompt = pl.cdiv(plen, block_k)
    first_decode = prompt_bucket // block_k
    n_decode = pl.cdiv(dend - prompt_bucket, block_k)
    total = n_prompt + n_decode

    def block_index(i):
        return jnp.where(i < n_prompt, i, first_decode + (i - n_prompt))

    def start_dma(i, slot):
        bi = block_index(i)
        k_dma = pltpu.make_async_copy(
            kall_ref.at[layer, b, h, pl.ds(bi * block_k, block_k), :],
            k_buf.at[slot],
            k_sems.at[slot],
        )
        v_dma = pltpu.make_async_copy(
            vall_ref.at[layer, b, h, pl.ds(bi * block_k, block_k), :],
            v_buf.at[slot],
            v_sems.at[slot],
        )
        k_dma.start()
        v_dma.start()

    def wait_dma(i, slot):
        bi = block_index(i)
        pltpu.make_async_copy(
            kall_ref.at[layer, b, h, pl.ds(bi * block_k, block_k), :],
            k_buf.at[slot],
            k_sems.at[slot],
        ).wait()
        pltpu.make_async_copy(
            vall_ref.at[layer, b, h, pl.ds(bi * block_k, block_k), :],
            v_buf.at[slot],
            v_sems.at[slot],
        ).wait()

    start_dma(0, 0)
    q = q_ref[0, 0].astype(jnp.float32)                      # (QPAD, D)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < total)
        def _prefetch():
            start_dma(i + 1, jax.lax.rem(i + 1, 2))

        wait_dma(i, slot)
        k = k_buf[slot]                                       # (BK, D)
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        bi = block_index(i)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + bi * block_k
        valid = (cols < plen) | ((cols >= prompt_bucket) & (cols < dend))
        s = jnp.where(valid, s, _MASK_VALUE)

        m_tile = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_tile, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        v = v_buf[slot]
        pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc = acc * alpha[:, : acc.shape[-1]] + pv
        return m_next, l_next, acc

    init = (
        jnp.full((_QPAD, 128), -jnp.inf, jnp.float32),
        jnp.zeros((_QPAD, 128), jnp.float32),
        jnp.zeros((_QPAD, q.shape[-1]), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, total, body, init)

    # Fresh-token self term (its K/V row is not in the cache yet).
    k_new = knew_ref[0, 0, 0].astype(jnp.float32)             # (D,)
    s_self = jnp.sum(q * k_new[None, :], axis=1, keepdims=True)  # (QPAD, 1)
    m_next = jnp.maximum(m, jnp.broadcast_to(s_self, m.shape))
    alpha = jnp.exp(m - m_next)
    p_self = jnp.exp(s_self - m_next[:, :1])                  # (QPAD, 1)
    l = alpha * l + jnp.broadcast_to(p_self, l.shape)
    v_new = vnew_ref[0, 0, 0].astype(jnp.float32)
    acc = acc * alpha[:, : acc.shape[-1]] + p_self * v_new[None, :]

    l_final = l[:, : acc.shape[-1]]
    l_final = jnp.where(l_final == 0.0, 1.0, l_final)
    o_ref[0, 0] = (acc / l_final).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("prompt_bucket", "scale", "block_k", "interpret"),
)
def decode_attention_hbm(
    q: jax.Array,            # (B, Hq, D) — one new token per sequence
    kall: jax.Array,         # (L, B, Hkv, S, D) stacked cache
    vall: jax.Array,         # (L, B, Hkv, S, D)
    k_new: jax.Array,        # (B, Hkv, 1, D) fresh keys (roped, normed)
    v_new: jax.Array,        # (B, Hkv, 1, D)
    layer: jax.Array,        # scalar int32
    prompt_len: jax.Array,   # (B,) int32
    decode_end: jax.Array,   # scalar int32 — current decode slot
    prompt_bucket: int,
    scale: float | None = None,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Two-interval masked GQA decode attention + fused self-term.

    Returns (B, Hq, D).  ``prompt_bucket`` must be a multiple of
    ``block_k`` (the runtime's 256-aligned prompt buckets guarantee it).
    """
    B, hq, D = q.shape
    hkv, S = kall.shape[2], kall.shape[3]
    group = hq // hkv
    if scale is None:
        scale = D ** -0.5
    block_k = min(block_k, S)
    if S % block_k or prompt_bucket % block_k:
        raise ValueError(
            f"cache length {S} / prompt bucket {prompt_bucket} not a "
            f"multiple of block_k {block_k}"
        )

    qg = (q.astype(jnp.float32) * scale).reshape(B, hkv, group, D)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, _QPAD - group), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, _QPAD, D), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, 1, D), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, D), lambda b, h, *_: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, _QPAD, D), lambda b, h, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, D), kall.dtype),
            pltpu.VMEM((2, block_k, D), vall.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, block_k=block_k, prompt_bucket=prompt_bucket
        ),
        out_shape=jax.ShapeDtypeStruct((B, hkv, _QPAD, D), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
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
