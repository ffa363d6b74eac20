"""Rotary position embeddings (non-interleaved "half-split" variant).

Qwen3-ASR uses plain 1-D RoPE with theta=1e6 and the non-traditional
layout: the head dim is split into two contiguous halves [x1 | x2] and
rotated as (x1*cos - x2*sin, x1*sin + x2*cos).  Parity with the reference's
``mlx.nn.RoPE(head_dim, traditional=False, base=rope_theta)``
(decoder.py:126, 151-153); positions are explicit here instead of an
``offset`` scalar so batched/paged decode can give every sequence its own
position vector.

Angles are computed in float32 (bf16 position*freq products lose whole
integer steps past position ~256).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def rope_frequencies(head_dim: int, theta: float) -> np.ndarray:
    """Inverse frequencies, shape (head_dim // 2,), float32."""
    exponents = np.arange(0, head_dim, 2, dtype=np.float64) / head_dim
    return (1.0 / (theta ** exponents)).astype(np.float32)


def rope_rotate(
    x: jax.Array,
    positions: jax.Array,
    theta: float = 1_000_000.0,
) -> jax.Array:
    """Apply non-interleaved RoPE.

    Parameters
    ----------
    x:
        ``(..., T, head_dim)`` — typically ``(B, heads, T, D)``.
    positions:
        Integer positions broadcastable to ``(..., T)`` — typically ``(T,)``
        or ``(B, 1, T)``.
    """
    head_dim = x.shape[-1]
    inv_freq = jnp.asarray(rope_frequencies(head_dim, float(theta)))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., T, D/2)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)

    x1 = x[..., : head_dim // 2].astype(jnp.float32)
    x2 = x[..., head_dim // 2 :].astype(jnp.float32)
    rotated = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return rotated.astype(x.dtype)
