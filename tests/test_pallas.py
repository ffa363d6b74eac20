"""Pallas kernel parity tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.ops.attention import sdpa
from qwen3_asr_tpu.ops.pallas.flash_attention import flash_attention_causal


def causal_oracle(q, k, v, scale=None):
    T = q.shape[2]
    ids = jnp.arange(T)
    mask = (ids[None, :] <= ids[:, None])[None, None]
    return sdpa(q, k, v, mask=mask, scale=scale)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2), (8, 2)])
def test_flash_matches_oracle_gqa(hq, hkv):
    B, T, D = 1, 256, 64
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, T, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, hkv, T, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, hkv, T, D), jnp.float32)

    out = flash_attention_causal(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = causal_oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_multiple_kv_tiles():
    """Online-softmax correction across >2 KV tiles."""
    B, H, T, D = 1, 2, 512, 64
    rng = jax.random.PRNGKey(3)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, H, T, D)) * 2.0
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, T, D)) * 2.0
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, T, D))

    out = flash_attention_causal(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = causal_oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_bf16_io():
    B, H, T, D = 1, 2, 256, 64
    rng = jax.random.PRNGKey(5)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, H, T, D)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, T, D)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, T, D)).astype(jnp.bfloat16)

    out = flash_attention_causal(q, k, v, block_q=128, block_k=128, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = causal_oracle(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2
    )


def test_flash_is_causal():
    """Future keys must not influence output."""
    B, H, T, D = 1, 2, 256, 64
    rng = jax.random.PRNGKey(7)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, H, T, D))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, T, D))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, T, D))

    out_a = flash_attention_causal(q, k, v, block_q=128, block_k=128, interpret=True)
    k2 = k.at[:, :, 200:].set(77.0)
    v2 = v.at[:, :, 200:].set(-77.0)
    out_b = flash_attention_causal(q, k2, v2, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_a[:, :, :200]), np.asarray(out_b[:, :, :200]), atol=1e-5
    )
