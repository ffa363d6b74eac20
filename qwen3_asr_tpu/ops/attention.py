"""Scaled dot-product attention with native GQA broadcast.

XLA-first design: logits and softmax in float32, matmuls on the MXU with
``preferred_element_type=float32``, boolean masks (XLA fuses the select into
the softmax).  A Pallas flash-attention kernel can slot in behind the same
signatures (see ``qwen3_asr_tpu/ops/pallas``).

The reference delegates to ``mx.fast.scaled_dot_product_attention``
(encoder.py:82, decoder.py:160); this module is its first-party equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min) / 2


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Attention with grouped-query broadcast.

    Parameters
    ----------
    q:
        ``(B, Hq, Tq, D)``.
    k, v:
        ``(B, Hkv, Tk, D)`` where ``Hq % Hkv == 0``.
    mask:
        Optional boolean mask broadcastable to ``(B, 1, Tq, Tk)``;
        True = attend.
    scale:
        Defaults to ``D ** -0.5``.

    Returns ``(B, Hq, Tq, D)`` in q's dtype.
    """
    B, hq, tq, d = q.shape
    hkv = k.shape[1]
    groups = hq // hkv
    if scale is None:
        scale = d ** -0.5

    qg = q.reshape(B, hkv, groups, tq, d)
    logits = jnp.einsum(
        "bkgqd,bkld->bkgql", qg, k, preferred_element_type=jnp.float32
    ) * scale

    if mask is not None:
        # (B, 1, Tq, Tk) -> (B, 1, 1, Tq, Tk) to cover the group axis.
        m = jnp.expand_dims(mask, 2) if mask.ndim == 4 else mask
        logits = jnp.where(m, logits, _NEG_INF)

    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bkgql,bkld->bkgqd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, hq, tq, d).astype(q.dtype)


def windowed_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    window: int,
    valid_mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Block-diagonal windowed self-attention via reshape-to-batch.

    Instead of materializing a (T, T) additive mask (the reference's
    approach, encoder.py:209-229), the sequence is folded into
    ``(B * T/window, window)`` and dense attention runs per window — exactly
    equivalent for contiguous fixed-size blocks, O(T * window) compute, and
    embarrassingly parallel on the MXU.

    Parameters
    ----------
    q, k, v:
        ``(B, H, T, D)`` with ``T % window == 0``.
    valid_mask:
        Optional ``(B, T)`` boolean; False keys are masked out of every
        window (used for bucketed padding).
    """
    B, H, T, D = q.shape
    if T % window:
        raise ValueError(f"sequence length {T} not a multiple of window {window}")
    n_win = T // window

    def fold(x):
        # (B, H, T, D) -> (B * n_win, H, window, D)
        x = x.reshape(B, H, n_win, window, D)
        return x.transpose(0, 2, 1, 3, 4).reshape(B * n_win, H, window, D)

    mask = None
    if valid_mask is not None:
        key_valid = valid_mask.reshape(B * n_win, 1, 1, window)
        mask = key_valid  # broadcast over query axis

    out = sdpa(fold(q), fold(k), fold(v), mask=mask, scale=scale)
    out = out.reshape(B, n_win, H, window, D).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, H, T, D)
