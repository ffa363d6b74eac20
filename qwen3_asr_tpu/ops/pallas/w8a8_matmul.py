"""Fused W8A8 matmul: in-kernel activation quantize + int8 MXU dot.

Round-5 xprof finding (tools/profile_capture.py --quant w8a8, B=64):
the XLA lowering of the W8A8 prefill path gets the 2x int8 dot-rate win
(dense 567 -> 304 ms) but hands half of it back in standalone
HBM-bound passes around each dot — convert_element_type 108 ms (the f32
activation copy + the int32 accumulator downcast), reduce_max 40 ms,
clip/round/sub ~35 ms.  XLA does not fuse a quantize prologue or a
two-sided scale epilogue into a dot.

This kernel does, in one pass over the tiles:

  * reads the bf16 activation tile, quantizes it in VMEM against the
    precomputed per-row scale (round-half-even, clip to +-127 — BITWISE
    the same rule as ops/quant.py:quantize_activations);
  * runs the int8 x int8 -> int32 dot on the MXU;
  * keeps the int32 accumulator in a VMEM scratch across the K grid
    walk, and applies BOTH scales (row x col) on the f32 accumulator at
    the last K tile, writing bf16 straight out.

No int8 activation copy, no int32 accumulator, and no f32 activation
copy ever land in HBM.  Only the per-row abs-max reduction stays
outside (it needs all of K before the first tile's quantize; one
bandwidth pass over x, done in bf16 where abs/max are exact).

No reference counterpart: the reference's prefill is plain bf16 MLX
matmuls (src/qwen3_asr_mlx/decoder.py:160).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w8a8_kernel(x_ref, sx_ref, w_ref, ws_ref, o_ref, acc_ref, *, k_tiles: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)            # (BM, BK)
    sx = sx_ref[...]                              # (BM, 1) f32 row scales
    xq = jnp.clip(jnp.round(x / sx), -127.0, 127.0).astype(jnp.int8)
    acc_ref[...] += jax.lax.dot(
        xq, w_ref[...], preferred_element_type=jnp.int32
    )

    @pl.when(ki == k_tiles - 1)
    def _finalize():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * sx_ref[...] * ws_ref[...]
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret"),
)
def w8a8_matmul(
    x: jax.Array,        # (M, K) bf16/f32 activations
    wq: jax.Array,       # (K, N) int8 weights
    ws: jax.Array,       # (N,) f32 per-output-channel weight scales
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Quantize-fused ``x @ dequant(wq, ws)`` returning (M, N).

    Numerics match ops/quant.py's jnp W8A8 path exactly: same per-row
    symmetric int8 activation rule, same int32 accumulation, same
    f32 (row x col) scale epilogue.
    """
    M, K = x.shape
    N = wq.shape[1]
    block_k = min(block_k, K)
    block_n = min(block_n, N)
    if K % block_k or N % block_n:
        raise ValueError(f"({K}, {N}) not tileable by ({block_k}, {block_n})")

    # Per-row abs-max in the input dtype (abs/max are exact); scales f32.
    amax = jnp.max(jnp.abs(x), axis=1).astype(jnp.float32)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)[:, None]    # (M, 1)

    block_m = min(block_m, max(8, -(-M // 8) * 8))
    m_pad = -(-M // block_m) * block_m
    if m_pad != M:
        x = jnp.pad(x, ((0, m_pad - M), (0, 0)))
        sx = jnp.pad(sx, ((0, m_pad - M), (0, 0)), constant_values=1.0)
    k_tiles = K // block_k

    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, k_tiles=k_tiles),
        out_shape=jax.ShapeDtypeStruct((m_pad, N), out_dtype),
        grid=(m_pad // block_m, N // block_n, k_tiles),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_m, 1), lambda m, n, k: (m, 0)),
            pl.BlockSpec((block_k, block_n), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, block_n), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, n, k: (m, n)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, sx, wq, ws.reshape(1, N).astype(jnp.float32))
    return out[:M]
