"""Decoder unit + tiny-model integration tests.

Mirrors the reference's key oracles (test_decoder.py): RMSNorm math vs
numpy, RoPE offset semantics, GQA shapes, tied lm_head, and the critical
cached-single-token vs full-context logit equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import TextDecoderConfig
from qwen3_asr_tpu.models.decoder import (
    decoder_forward,
    decoder_logits,
    embed_tokens,
    init_decoder_params,
    init_kv_cache,
)
from qwen3_asr_tpu.ops.norms import rms_norm
from qwen3_asr_tpu.ops.rope import rope_rotate

TINY = TextDecoderConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    intermediate_size=128,
    vocab_size=512,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)


# -- ops --------------------------------------------------------------------

def test_rms_norm_matches_numpy():
    x = np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal(8).astype(np.float32)
    eps = 1e-6
    expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + eps) * w
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_rope_preserves_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 5, 16))
    pos = jnp.arange(5)
    y = rope_rotate(x, pos)
    # Rotation preserves the L2 norm of each (pair-wise) vector.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        rtol=1e-5,
    )


def test_rope_position_zero_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 16))
    y = rope_rotate(x, jnp.zeros((1,), jnp.int32))
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_rope_offset_semantics():
    """Rotating position p directly == rotating as part of a longer run."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 6, 16))
    full = rope_rotate(x, jnp.arange(6))
    last = rope_rotate(x[:, :, 5:6], jnp.asarray([5]))
    np.testing.assert_allclose(np.asarray(full[:, :, 5:6]), np.asarray(last), atol=1e-5)


# -- forward shapes ---------------------------------------------------------

def test_forward_shapes(tiny_params):
    ids = jnp.asarray([[1, 2, 3, 4, 5]])
    h = embed_tokens(tiny_params, ids)
    assert h.shape == (1, 5, 64)
    positions = jnp.arange(5)[None]
    out, (k, v) = decoder_forward(tiny_params, TINY, h, positions)
    assert out.shape == (1, 5, 64)
    assert k.shape == (2, 1, 2, 5, 16)  # (L, B, kv_heads, S, D)
    logits = decoder_logits(tiny_params, TINY, out)
    assert logits.shape == (1, 5, 512)
    assert logits.dtype == jnp.float32


def test_tied_lm_head(tiny_params):
    """Logit of token t == hidden . embedding[t] (after final norm)."""
    h = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 64))
    logits = decoder_logits(tiny_params, TINY, h)
    normed = rms_norm(h, tiny_params["final_norm"], TINY.rms_norm_eps)
    expected = np.asarray(normed[0, 0]) @ np.asarray(tiny_params["embedding"]).T
    np.testing.assert_allclose(np.asarray(logits[0, 0]), expected, atol=1e-4)


def test_causality(tiny_params):
    """Changing a future token must not change past logits."""
    ids_a = jnp.asarray([[1, 2, 3, 4]])
    ids_b = jnp.asarray([[1, 2, 3, 400]])
    pos = jnp.arange(4)[None]
    out_a, _ = decoder_forward(tiny_params, TINY, embed_tokens(tiny_params, ids_a), pos)
    out_b, _ = decoder_forward(tiny_params, TINY, embed_tokens(tiny_params, ids_b), pos)
    np.testing.assert_allclose(
        np.asarray(out_a[:, :3]), np.asarray(out_b[:, :3]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out_a[:, 3]), np.asarray(out_b[:, 3]))


# -- the KV-cache equivalence oracle ---------------------------------------

def test_cached_decode_matches_full_context(tiny_params):
    """Incremental decode with the preallocated cache == full forward.

    This is the reference's key numerical oracle (test_decoder.py:285-312).
    """
    ids = jnp.asarray([[7, 42, 99, 3, 256, 17]])
    T = ids.shape[1]
    h = embed_tokens(tiny_params, ids)

    # Full-context pass.
    full_out, _ = decoder_forward(tiny_params, TINY, h, jnp.arange(T)[None])
    full_logits = decoder_logits(tiny_params, TINY, full_out)

    # Prefill first 3 tokens into an oversized cache, then decode one by one.
    S = 16
    kv = init_kv_cache(TINY, 1, S, jnp.float32)
    out, kv = decoder_forward(
        tiny_params, TINY, h[:, :3], jnp.arange(3)[None], kv,
        write_slots=jnp.zeros((1,), jnp.int32),
    )
    step_logits = [decoder_logits(tiny_params, TINY, out[:, i : i + 1]) for i in range(3)]
    for t in range(3, T):
        out, kv = decoder_forward(
            tiny_params, TINY, h[:, t : t + 1],
            jnp.asarray([[t]]), kv, write_slots=jnp.asarray([t]),
        )
        step_logits.append(decoder_logits(tiny_params, TINY, out))

    incremental = jnp.concatenate(step_logits, axis=1)
    # f32 matmul reassociation across the different cache shapes costs a few
    # 1e-3 on individual logits; the argmax-relevant structure must hold.
    np.testing.assert_allclose(
        np.asarray(incremental), np.asarray(full_logits), atol=6e-3
    )
    assert np.array_equal(
        np.argmax(np.asarray(incremental), -1), np.argmax(np.asarray(full_logits), -1)
    )


def test_right_padded_prefill_matches_unpadded(tiny_params):
    """Garbage in padded prompt slots must not leak into valid logits."""
    ids = jnp.asarray([[5, 6, 7]])
    h = embed_tokens(tiny_params, ids)
    out_ref, _ = decoder_forward(tiny_params, TINY, h, jnp.arange(3)[None])

    padded = jnp.concatenate([ids, jnp.asarray([[444, 333]])], axis=1)
    hp = embed_tokens(tiny_params, padded)
    S = 8
    kv = init_kv_cache(TINY, 1, S, jnp.float32)
    out_pad, kv = decoder_forward(tiny_params, TINY, hp, jnp.arange(5)[None], kv)
    np.testing.assert_allclose(
        np.asarray(out_pad[:, :3]), np.asarray(out_ref), atol=1e-5
    )

    # Continue decoding from slot 3: overwrites the padded garbage and must
    # match the unpadded incremental path.
    nxt = embed_tokens(tiny_params, jnp.asarray([[9]]))
    out_a, _ = decoder_forward(
        tiny_params, TINY, nxt, jnp.asarray([[3]]), kv, write_slots=jnp.asarray([3])
    )
    kv_clean = init_kv_cache(TINY, 1, S, jnp.float32)
    _, kv_clean = decoder_forward(tiny_params, TINY, h, jnp.arange(3)[None], kv_clean)
    out_b, _ = decoder_forward(
        tiny_params, TINY, nxt, jnp.asarray([[3]]), kv_clean,
        write_slots=jnp.asarray([3]),
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_batched_forward_matches_single(tiny_params):
    """Batch-2 forward == two batch-1 forwards (batch-first design check)."""
    ids = jnp.asarray([[1, 2, 3, 4], [10, 20, 30, 40]])
    pos = jnp.broadcast_to(jnp.arange(4)[None], (2, 4))
    h = embed_tokens(tiny_params, ids)
    out, _ = decoder_forward(tiny_params, TINY, h, pos)
    for b in range(2):
        single, _ = decoder_forward(
            tiny_params, TINY, h[b : b + 1], pos[b : b + 1]
        )
        np.testing.assert_allclose(
            np.asarray(out[b : b + 1]), np.asarray(single), atol=1e-5
        )


def test_fused_params_match_unfused(tiny_params):
    """wqkv/wgu fusion is a pure re-layout: identical logits."""
    from qwen3_asr_tpu.models.decoder import fuse_decoder_params

    fused = fuse_decoder_params(tiny_params)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]

    ids = jnp.asarray([[3, 1, 4, 1, 5]])
    pos = jnp.arange(5)[None]
    h = embed_tokens(tiny_params, ids)
    out_a, _ = decoder_forward(tiny_params, TINY, h, pos)
    out_b, _ = decoder_forward(fused, TINY, h, pos)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
