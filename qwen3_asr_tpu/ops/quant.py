"""Int8 weight-only quantization: representation, Pallas matmul, dispatch.

Decode throughput on TPU is bound by streaming the bf16 weights from HBM
(3.4 GB/step for the 1.7B decoder).  Symmetric per-output-channel int8
halves that traffic; dequantization happens on-chip inside a Pallas tiled
matmul (int8 tiles -> VMEM -> bf16 convert -> MXU, scales applied to the
f32 accumulator), so no bf16 weight copy ever exists in HBM.

This is an opt-in speed/accuracy trade (RuntimeConfig.quantization="int8");
the default bf16 path preserves the token-identical greedy contract vs the
reference.  No reference counterpart (SURVEY.md: bf16-only).
"""

from __future__ import annotations

import functools
from contextlib import contextmanager
from contextvars import ContextVar
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QuantizedWeight = dict[str, jax.Array]   # {"q": int8 (in, out), "s": f32 (out,)}

#: When set (an int), qlinear calls staged inside an :func:`act_quant_rows`
#: context whose flattened row count is >= this value ALSO quantize the
#: activations to int8 and run an int8 x int8 -> int32 MXU dot (W8A8).
#: The v5e MXU runs int8 dots at 2x the bf16 rate (tools/int8_mxu_probe.py:
#: 1.67-2.04x measured at the prefill shapes, ~354 TOPS = 90% of the 394
#: peak), so this halves the MXU-bound prefill dense time; weight-only
#: dequant (the default) runs the dot in bf16 and only saves HBM traffic.
#: Row-gated so the bandwidth-bound single-token decode (M = batch) keeps
#: the weight-only lowering, where activation quantization would only add
#: overhead.
_ACT_QUANT_MIN_ROWS: ContextVar[int | None] = ContextVar(
    "act_quant_min_rows", default=None
)


#: Mirrors models/decoder.py's SPMD flag (set by decoder.set_spmd): under
#: a GSPMD mesh the fused W8A8 Pallas kernel is skipped — pallas_call
#: cannot be auto-partitioned by GSPMD, and the jnp int8-dot form shards
#: with the same Megatron rules as every other dot.
_SPMD_ACTIVE = False


def set_spmd(on: bool) -> None:
    global _SPMD_ACTIVE
    _SPMD_ACTIVE = bool(on)


@contextmanager
def act_quant_rows(min_rows: int | None):
    """Enable dynamic int8 activation quantization for qlinear calls
    traced inside this context with >= ``min_rows`` flattened rows.

    Trace-time scoped (a ``with`` around the jitted impl body): the flag
    decides which ops are staged into the compiled program, so it has no
    runtime cost and cannot leak across programs traced outside the
    context.  ``None`` disables (identical to no context)."""
    tok = _ACT_QUANT_MIN_ROWS.set(min_rows)
    try:
        yield
    finally:
        _ACT_QUANT_MIN_ROWS.reset(tok)


def quantize_activations(x2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8: (M, K) -> (int8 (M, K), f32 scales (M,)).

    The abs-max reduction runs over x2 IN ITS OWN DTYPE and the f32
    convert lives only inside the quantize expression: a shared
    ``x2.astype(f32)`` temp consumed by both would be materialized by
    XLA as a full f32 activation copy in HBM — measured 108 ms/prefill
    at B=64, the single largest W8A8 overhead (round-5 xprof,
    docs/PERFORMANCE.md).  abs/max are exact in bf16, so the scales are
    bit-identical either way."""
    amax = jnp.max(jnp.abs(x2), axis=1).astype(jnp.float32)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(x2.astype(jnp.float32) / scale[:, None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_weight(w: jax.Array) -> QuantizedWeight:
    """Symmetric per-output-channel int8 over the LAST axis of (in, out)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def dequantize_weight(wq: QuantizedWeight, dtype=jnp.bfloat16) -> jax.Array:
    return (wq["q"].astype(jnp.float32) * wq["s"][None, :]).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


# ---------------------------------------------------------------------------
# Pallas kernel: (M, K) bf16 @ (K, N) int8 -> (M, N), scales on the way out
# ---------------------------------------------------------------------------

def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, k_tiles: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                 # (BM, BK) bf16
    w = w_ref[...].astype(jnp.bfloat16)            # (BK, BN) int8 -> bf16
    acc_ref[...] += jax.lax.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(ki == k_tiles - 1)
    def _finalize():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "out_dtype", "interpret")
)
def quantized_matmul(
    x: jax.Array,          # (M, K) — M may be tiny (decode batch)
    wq: jax.Array,         # (K, N) int8
    scale: jax.Array,      # (N,) f32
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Weight-only int8 matmul; returns (M, N) in ``out_dtype``."""
    M, K = x.shape
    N = wq.shape[1]
    block_k = min(block_k, K)
    block_n = min(block_n, N)
    if K % block_k or N % block_n:
        raise ValueError(f"({K}, {N}) not tileable by ({block_k}, {block_n})")
    # Tile M as well: decode uses one small tile, prefill (M = B * P) many.
    block_m = min(256, max(8, -(-M // 8) * 8))
    m_pad = -(-M // block_m) * block_m
    if m_pad != M:
        x = jnp.pad(x, ((0, m_pad - M), (0, 0)))
    k_tiles = K // block_k

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, k_tiles=k_tiles),
        out_shape=jax.ShapeDtypeStruct((m_pad, N), out_dtype),
        grid=(m_pad // block_m, N // block_n, k_tiles),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_k, block_n), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, block_n), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, n, k: (m, n)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, wq, scale.reshape(1, N).astype(jnp.float32))
    return out[:M]


#: Quantized-matmul lowering: "pallas" (tiled dequant-in-matmul kernel) or
#: "xla" (inline int8->bf16 convert + scale; XLA fuses the convert into the
#: dot's operand read, so no bf16 weight copy lands in HBM and there are
#: ZERO extra kernel launches inside the decode loop).
QLINEAR_IMPL = __import__("os").environ.get("QWEN3_ASR_QLINEAR", "xla")

#: Fused W8A8 Pallas kernel (ops/pallas/w8a8_matmul.py): "1" opts in,
#: default OFF — measured NEGATIVE end-to-end (round 5, B=96 prefill:
#: 1918 ms vs 1373 ms for the XLA lowering).  Fusing the quantize into
#: the matmul re-reads the bf16 activations once per N-tile (2 bytes),
#: while XLA's form quantizes once and re-reads the int8 copy (1 byte);
#: at the decoder's N/BN of 8-24 the doubled re-read stream swamps the
#: saved elementwise passes.  The kernel stays for its tests and as the
#: base for a future persistent-activation variant.
W8A8_KERNEL = __import__("os").environ.get("QWEN3_ASR_W8A8_KERNEL", "0")


def qlinear(x: jax.Array, w: Any, out_dtype=None) -> jax.Array:
    """``x @ w`` for plain or quantized weights, any leading batch dims.

    On TPU quantized weights route through the Pallas kernel or the
    XLA-fused inline dequant (QWEN3_ASR_QLINEAR); elsewhere they
    dequantize inline (XLA fuses the multiply into the matmul operand
    read on CPU, and tests stay fast).
    """
    if not is_quantized(w):
        y = x @ w
        return y.astype(out_dtype) if out_dtype is not None else y
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    N = w["q"].shape[1]
    min_rows = _ACT_QUANT_MIN_ROWS.get()
    if min_rows is not None and x2.shape[0] >= min_rows:
        # W8A8: dynamic per-row activation quant + int8 MXU dot.  On TPU
        # the quantize/dot/scale pipeline is ONE fused Pallas kernel —
        # XLA lowers the jnp form with standalone HBM passes for the f32
        # activation copy, the int8 copy, and the int32 accumulator
        # downcast, which hands back half the 2x dot-rate win (round-5
        # xprof, ops/pallas/w8a8_matmul.py docstring).  The jnp path
        # remains for CPU (tests) and non-tileable shapes.
        if (
            jax.default_backend() == "tpu"
            and not _SPMD_ACTIVE
            and W8A8_KERNEL != "0"
            and K % 128 == 0
            and N % 128 == 0
        ):
            from .pallas.w8a8_matmul import w8a8_matmul

            y = w8a8_matmul(
                x2, w["q"], w["s"],
                block_n=512 if N % 512 == 0 else 128,
                block_k=512 if K % 512 == 0 else 128,
                out_dtype=out_dtype,
            )
            return y.reshape(*lead, N)
        xq, sx = quantize_activations(x2)
        acc = jax.lax.dot_general(
            xq, w["q"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (
            acc.astype(jnp.float32) * sx[:, None] * w["s"][None, :]
        ).astype(out_dtype)
        return y.reshape(*lead, N)
    if (
        jax.default_backend() == "tpu"
        and QLINEAR_IMPL == "pallas"
        and K % 128 == 0
        and N % 128 == 0
    ):
        block_n = 512 if N % 512 == 0 else 128
        block_k = 512 if K % 512 == 0 else 128
        y = quantized_matmul(
            x2, w["q"], w["s"], block_n=block_n, block_k=block_k,
            out_dtype=out_dtype,
        )
    else:
        y = (x2 @ dequantize_weight(w, x.dtype)).astype(out_dtype)
    return y.reshape(*lead, N)


# ---------------------------------------------------------------------------
# Parameter-tree quantization
# ---------------------------------------------------------------------------

#: Decoder linear weights worth quantizing (the HBM-dominant reads);
#: covers both the canonical and the fused (wqkv/wgu) layouts.
DECODER_QUANT_KEYS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd", "wqkv", "wgu")


#: Encoder matmul weights quantized in the W8A8 prefill mode
#: (RuntimeConfig.act_quant="int8"): the transformer projections + MLP
#: (stacked (L, in, out)) and the top-level conv-flatten/projection-head
#: linears.  Weight-only int8 buys the encoder nothing — it is MXU-bound
#: (~54% MXU in the layers, docs/PERFORMANCE.md), which is exactly why
#: these are only quantized when the int8-dot activation path will use
#: them.  Conv kernels, biases, and norms stay full precision.
ENCODER_QUANT_KEYS = ("wq", "wk", "wv", "wo", "fc1_w", "fc2_w")
ENCODER_QUANT_TOP_KEYS = ("conv_out", "proj1_w", "proj2_w")


def quantize_encoder_params(params: dict) -> dict:
    """Quantize the encoder's matmul weights to int8 (W8A8 prefill mode).

    Only called when ``act_quant="int8"`` — encoder matmuls then run the
    int8 x int8 MXU dot via :func:`qlinear`'s activation-quant path
    (encoder_forward enters the context whenever its weights are
    quantized).  Biases/norms/PE/conv kernels stay full precision.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for key in ENCODER_QUANT_KEYS:
        if key in layers:
            layers[key] = jax.vmap(quantize_weight)(layers[key])
    out["layers"] = layers
    for key in ENCODER_QUANT_TOP_KEYS:
        if key in out:
            out[key] = quantize_weight(out[key])
    return out


def quantize_decoder_params(params: dict) -> dict:
    """Quantize the decoder's big matmuls + embedding to int8.

    Stacked (L, in, out) layer weights become {"q": int8, "s": f32} with
    per-(layer, out-channel) scales; the tied embedding is stored
    transposed ({"q": (H, V) int8, "s": (V,)}) so the lm head is a direct
    (M, H) @ (H, V) kernel call and row lookups gather columns.
    Norm weights stay in full precision.
    """
    layers = dict(params["layers"])
    for key in DECODER_QUANT_KEYS:
        if key in layers:
            layers[key] = jax.vmap(quantize_weight)(layers[key])
    emb_t = params["embedding"].T  # (H, V)
    return {
        "embedding": quantize_weight(emb_t),
        "layers": layers,
        "final_norm": params["final_norm"],
    }
