"""int8 KV-cache quantization (per-row symmetric absmax).

Decode on this model is HBM-bound and the KV cache is the largest read
stream: at B=96 each step reads ~7 GB of bf16 K/V against a 4.2 GB weight
stream (docs/PERFORMANCE.md).  Storing the cache as int8 with one f32
scale per (layer, batch, head, slot) row halves that stream (129 B/row vs
256 B/row) and halves cache memory — the difference between 640- and
1280-slot windows at the same budget.

Scheme: ``q = round(x / s)``, ``s = max|x| / 127`` per D-row (s = 1 for
all-zero rows).  Dequantization error is ≤ s/2 per element (~0.4% of the
row's dynamic range); scores are additionally computed in f32, so the
perturbation is comparable to bf16 rounding of the *weights*.  This is an
OPT-IN (``RuntimeConfig.kv_cache_dtype = "int8"``) — the default bf16
path keeps bit-exact parity with the reference semantics
(/root/reference/src/qwen3_asr_mlx/generate.py keeps fp16 KV).

The quantized cache is a pytree ``{"q": int8 (L,B,H,S,D),
"s": f32 (L,B,H,S)}`` so it rides jit carries / donation like the plain
array it replaces.  Scale folding keeps the kernel cheap: for scores,
``(q·k8) * ks`` equals attention over the dequantized keys; for values,
``(p * vs)·v8`` equals ``p·(v8*vs)`` — both fold the per-row scale into
the small score/probability matrix instead of rescaling D-wide tiles.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def is_quantized_kv(cache: Any) -> bool:
    """True for the {"q", "s"} quantized-cache pytree."""
    return isinstance(cache, dict) and "q" in cache and "s" in cache


def kv_seq_len(cache: Any) -> int:
    """Cache sequence length (S) for plain or quantized caches."""
    return (cache["q"] if is_quantized_kv(cache) else cache).shape[3]


def kv_spec(cache: Any):
    """Hashable (shape, dtype) summary used in compile-cache keys."""
    if is_quantized_kv(cache):
        return (
            tuple(cache["q"].shape), str(cache["q"].dtype),
            tuple(cache["s"].shape), str(cache["s"].dtype),
        )
    return (tuple(cache.shape), str(cache.dtype))


def quantize_kv(arr: jax.Array) -> dict:
    """(..., S, D) float -> {"q": int8, "s": f32 (..., S)} per-row absmax."""
    amax = jnp.max(jnp.abs(arr.astype(jnp.float32)), axis=-1)
    s = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(
        jnp.round(arr.astype(jnp.float32) / s[..., None]), -127, 127
    ).astype(jnp.int8)
    return {"q": q, "s": s}


def dequantize_kv(cache: dict, dtype=jnp.bfloat16) -> jax.Array:
    """{"q", "s"} -> dense (..., S, D) array."""
    return (
        cache["q"].astype(jnp.float32) * cache["s"][..., None]
    ).astype(dtype)


def quantize_kv_cache(
    kv: tuple[jax.Array, jax.Array]
) -> tuple[dict, dict]:
    """Quantize a freshly prefilled (keys, values) pair.

    One fused read-convert-write pass per tensor (~3 ms for a 2.4 GB
    batch-64 cache at HBM speed); jit with donated inputs so the bf16
    buffers free immediately.
    """
    keys, values = kv
    return quantize_kv(keys), quantize_kv(values)
