"""Fused single-token GQA decode attention over the KV cache (Pallas TPU).

The XLA path for decode attention (masked einsum -> f32 softmax -> einsum)
measures ~6x the KV-streaming speed-of-light on v5e: the (B, Hkv, G, 1, S)
score tensor round-trips through HBM and the tiny matvecs underutilize the
MXU.  This kernel streams each KV block through VMEM exactly once with an
online softmax, the flash-decode scheme specialized to this runtime's
cache layout:

  cache slots = [ prompt 0..Pb ) [ decode Pb..S )
  slot j is attendable iff  j < prompt_len[b]  or  Pb <= j <= Pb + step

Blocks that intersect neither interval are skipped (their DMA is still
pipelined by the BlockSpec machinery, but no FLOPs are spent).  Q rows are
zero-padded from the GQA group size (2) to a full 8-sublane tile.

Statistics are f32; the mask value is -0.7 * f32max (never -inf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_QPAD = 8  # q-group rows padded to one f32 sublane tile


def _kernel(
    prompt_len_ref,   # scalar prefetch: (B,) int32
    decode_end_ref,   # scalar prefetch: (1,) int32 — last attendable slot
    q_ref,            # (1, 1, QPAD, D) f32
    k_ref,            # (1, 1, BK, D)
    v_ref,            # (1, 1, BK, D)
    o_ref,            # (1, 1, QPAD, D) f32
    m_scr, l_scr, acc_scr,
    *, block_k: int, prompt_bucket: int, s_blocks: int,
):
    b = pl.program_id(0)
    si = pl.program_id(2)

    @pl.when(si == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    plen = prompt_len_ref[b]
    dend = decode_end_ref[0]
    s0 = si * block_k
    in_prompt = s0 < plen
    in_decode = (s0 + block_k > prompt_bucket) & (s0 <= dend)

    @pl.when(in_prompt | in_decode)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)          # (QPAD, D), pre-scaled
        k = k_ref[0, 0]                               # (BK, D)
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (QPAD, BK)

        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + s0
        valid = (cols < plen) | ((cols >= prompt_bucket) & (cols <= dend))
        s = jnp.where(valid, s, _MASK_VALUE)

        m_prev = m_scr[...]                           # (QPAD, 128)
        l_prev = l_scr[...]
        m_tile = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_tile, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next

        v = v_ref[0, 0]
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * alpha[:, : acc_scr.shape[-1]] + pv

    @pl.when(si == s_blocks - 1)
    def _finalize():
        l = l_scr[...][:, : acc_scr.shape[-1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("prompt_bucket", "scale", "block_k", "interpret"),
)
def decode_attention(
    q: jax.Array,            # (B, Hq, D) — one new token per sequence
    k: jax.Array,            # (B, Hkv, S, D)
    v: jax.Array,            # (B, Hkv, S, D)
    prompt_len: jax.Array,   # (B,) int32
    decode_end: jax.Array,   # scalar int32: last attendable decode slot
    prompt_bucket: int,
    scale: float | None = None,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Two-interval masked GQA decode attention; returns (B, Hq, D)."""
    B, hq, D = q.shape
    hkv, S = k.shape[1], k.shape[2]
    group = hq // hkv
    if scale is None:
        scale = D ** -0.5
    block_k = min(block_k, S)
    if S % block_k:
        raise ValueError(f"cache length {S} not a multiple of block_k {block_k}")
    s_blocks = S // block_k

    # (B, Hkv, group, D) -> zero-pad group rows to a full sublane tile.
    qg = (q.astype(jnp.float32) * scale).reshape(B, hkv, group, D)
    qg = jnp.pad(qg, ((0, 0), (0, 0), (0, _QPAD - group), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, hkv, s_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, _QPAD, D), lambda b, h, si, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, si, *_: (b, h, si, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, si, *_: (b, h, si, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, _QPAD, D), lambda b, h, si, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((_QPAD, 128), jnp.float32),
            pltpu.VMEM((_QPAD, 128), jnp.float32),
            pltpu.VMEM((_QPAD, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel,
        block_k=block_k,
        prompt_bucket=prompt_bucket,
        s_blocks=s_blocks,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, hkv, _QPAD, D), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(prompt_len.astype(jnp.int32), decode_end.reshape(1).astype(jnp.int32), qg, k, v)

    return out[:, :, :group, :].reshape(B, hq, D).astype(q.dtype)
