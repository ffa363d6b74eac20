"""Causal GQA flash attention (Pallas TPU kernel) for decoder prefill.

The prefill attention over a P-token prompt is O(P^2): at 20 minutes of
audio the prompt is ~15.6k tokens and the full score matrix would be
16 heads x 15.6k x 15.6k x 4 B ≈ 15 GB of HBM traffic.  This kernel tiles
Q x KV with an online softmax so scores never leave VMEM (flash attention
v2 scheme: unnormalized accumulator, single divide at the end).

Kernel features, tuned to Qwen3-ASR's decoder (16 Q / 8 KV heads, D=128):
  * grid (B, Hq, T/bq, T/bk) with the KV axis innermost ("arbitrary"
    semantics — it is the online-softmax reduction); batch/head/Q-tile axes
    are "parallel" for megacore distribution;
  * GQA by BlockSpec index mapping — Q head h reads KV head h // group, so
    KV tiles are fetched once per group from HBM's point of view (no
    repeated materialization);
  * causal tile skip: KV tiles fully above the diagonal are never loaded;
  * f32 softmax statistics, bf16 tensor data, mask value -0.7 * f32max
    (never -inf: exp(-inf - -inf) = NaN).

Numerical contract: equals ``ops.attention.sdpa`` with a causal mask to
bf16 precision; pinned by tests/test_pallas.py against the jnp oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _fa_kernel(
    q_ref, k_ref, v_ref, o_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_q: int, block_k: int, kv_tiles: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Skip KV tiles strictly above the diagonal (no query can see them).
    diag_reachable = ki * block_k <= (qi + 1) * block_q - 1

    @pl.when(diag_reachable)
    def _run():
        q = q_ref[0, 0]                     # (block_q, D)
        k = k_ref[0, 0]                     # (block_k, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                            # (block_q, block_k)

        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(cols <= rows, s, _MASK_VALUE)

        m_prev = m_scr[...]                  # (block_q, LANES) f32
        l_prev = l_scr[...]
        m_tile = jnp.max(s, axis=1, keepdims=True)            # (block_q, 1)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_tile, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)                      # (block_q, LANES)
        p = jnp.exp(s - m_next[:, :1])                        # (block_q, block_k)

        l_next = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0]                      # (block_k, D)
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )                                     # (block_q, D)
        acc_scr[...] = acc_scr[...] * alpha[:, : acc_scr.shape[-1]] + pv

    @pl.when(ki == kv_tiles - 1)
    def _finalize():
        l = l_scr[...][:, : acc_scr.shape[-1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def flash_attention_causal(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Causal self-attention, q (B, Hq, T, D) vs k/v (B, Hkv, T, D).

    T must be a multiple of the block sizes (the runtime's prompt buckets
    guarantee this); query i attends keys j <= i.
    """
    B, hq, T, D = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    if scale is None:
        scale = D ** -0.5
    # Short prompts (<= 1024 rows): ONE (T, T) tile per (batch, head).
    # Measured on v5e (tools/flash_sweep.py, B=32 bench shape): 0.73 ms
    # vs 1.91 ms for the tiled (256, 512) grid at T=512 — at these sizes
    # the grid's per-cell overhead dominates and the causal tile skip
    # saves nothing.  Also the only tiling for the 64-aligned trimmed
    # runs (RuntimeConfig.prefill_run_granularity), which are not
    # 256-divisible.  VMEM: the f32 score tile is T*T*4 B (4 MB at the
    # 1024 cap).  Explicit block_q/block_k arguments are honored.
    defaults = block_q == 256 and block_k == 512
    if defaults and T <= 1024 and T % 8 == 0:
        block_q = block_k = T
    # Adapt tile sizes downward until they divide T (prompt buckets are
    # multiples of 256, but not necessarily of the default 512 block_k).
    block_q = min(block_q, T)
    block_k = min(block_k, T)
    while block_q > 128 and T % block_q:
        block_q //= 2
    while block_k > 128 and T % block_k:
        block_k //= 2
    if T % block_q or T % block_k:
        # Only the DEFAULT blocks may silently fall back to one (T, T)
        # tile; explicitly requested non-dividing blocks raise so tuning
        # callers (tools/flash_sweep.py) never measure a different tiling
        # than they asked for.
        if defaults and T <= 1024 and T % 8 == 0:
            block_q = block_k = T
        else:
            raise ValueError(
                f"T={T} not a multiple of blocks ({block_q}, {block_k})"
            )
    kv_tiles = T // block_k

    grid = (B, hq, T // block_q, kv_tiles)
    kernel = functools.partial(
        _fa_kernel,
        scale=float(scale),
        block_q=block_q,
        block_k=block_k,
        kv_tiles=kv_tiles,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, D),
                lambda b, h, qi, ki, g=group: (b, h // g, ki, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, D),
                lambda b, h, qi, ki, g=group: (b, h // g, ki, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),   # running max
            pltpu.VMEM((block_q, _LANES), jnp.float32),   # running sum
            pltpu.VMEM((block_q, D), jnp.float32),        # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
