"""Encoder tests: conv geometry, masking equivalence, windowed attention.

Mirrors the reference's shape oracles (test_encoder.py: 100 frames -> 13
tokens, 250 -> 33) and adds the padding-invariance oracle that replaces the
reference's strip-vs-mask distinction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import AudioEncoderConfig
from qwen3_asr_tpu.models.encoder import (
    encoder_forward,
    init_encoder_params,
    sinusoidal_positions,
    valid_token_count,
)
from qwen3_asr_tpu.ops.attention import sdpa, windowed_self_attention

TINY = AudioEncoderConfig(
    d_model=32,
    encoder_layers=2,
    encoder_attention_heads=4,
    encoder_ffn_dim=64,
    num_mel_bins=128,
    output_dim=48,
    downsample_hidden_size=16,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_encoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)


def rand_mel(frames, valid=None, seed=0):
    rng = np.random.default_rng(seed)
    mel = np.zeros((1, 128, frames), np.float32)
    v = valid if valid is not None else frames
    mel[:, :, :v] = rng.standard_normal((1, 128, v)).astype(np.float32) * 0.1
    return jnp.asarray(mel), jnp.asarray([v], jnp.int32)


# -- token-count algebra (reference oracles) --------------------------------

def test_valid_token_count_oracles():
    cfg = AudioEncoderConfig()
    f = lambda n: int(valid_token_count(cfg, jnp.asarray(n)))
    assert f(100) == 13           # 1 full chunk
    assert f(200) == 26
    assert f(250) == 13 + 13 + 7  # reference test_encoder.py: 250 -> 33
    assert f(0) == 0
    assert f(1) == 1
    assert f(800) == 104          # exactly one attention window


def test_sinusoidal_positions_layout():
    pe = sinusoidal_positions(1500, 32)
    assert pe.shape == (1500, 32)
    np.testing.assert_allclose(pe[0, :16], 0.0, atol=1e-7)   # sin(0)
    np.testing.assert_allclose(pe[0, 16:], 1.0, atol=1e-7)   # cos(0)
    # Deterministic / prefix-stable.
    pe2 = sinusoidal_positions(1500, 32)
    assert pe is pe2  # cached


# -- forward shapes ---------------------------------------------------------

def test_forward_shapes(tiny_params):
    mel, nvf = rand_mel(800)
    feats, n_tok = encoder_forward(tiny_params, TINY, mel, nvf)
    assert feats.shape == (1, 104, 48)
    assert int(n_tok[0]) == 104


def test_invalid_tail_zeroed(tiny_params):
    mel, nvf = rand_mel(800, valid=250)
    feats, n_tok = encoder_forward(tiny_params, TINY, mel, nvf)
    assert int(n_tok[0]) == 33
    tail = np.asarray(feats[0, 33:])
    assert np.all(tail == 0.0)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_padding_invariance(tiny_params):
    """Valid features must be identical whether the clip fills the bucket
    or is zero-padded into a larger one — the masking equivalent of the
    reference's token stripping (encoder.py:288-293)."""
    mel_small, nvf = rand_mel(800, valid=250, seed=3)
    feats_small, _ = encoder_forward(tiny_params, TINY, mel_small, nvf)

    mel_big = jnp.concatenate(
        [mel_small, jnp.zeros((1, 128, 800), jnp.float32)], axis=2
    )
    feats_big, n_tok = encoder_forward(tiny_params, TINY, mel_big, nvf)
    assert int(n_tok[0]) == 33
    np.testing.assert_allclose(
        np.asarray(feats_small[0, :33]), np.asarray(feats_big[0, :33]), atol=2e-4
    )


def test_batched_matches_single(tiny_params):
    mel_a, _ = rand_mel(800, valid=800, seed=1)
    mel_b, _ = rand_mel(800, valid=500, seed=2)
    batch = jnp.concatenate([mel_a, mel_b], axis=0)
    nvf = jnp.asarray([800, 500], jnp.int32)
    feats, n_tok = encoder_forward(tiny_params, TINY, batch, nvf)
    fa, _ = encoder_forward(tiny_params, TINY, mel_a, jnp.asarray([800]))
    fb, _ = encoder_forward(tiny_params, TINY, mel_b, jnp.asarray([500]))
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(fa[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(feats[1]), np.asarray(fb[0]), atol=1e-5)


# -- windowed attention == block-diagonal masked attention ------------------

def test_windowed_attention_equals_block_mask():
    B, H, T, D, W = 1, 2, 12, 8, 4
    rng = jax.random.PRNGKey(7)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), (B, H, T, D)) for i in range(3))

    out_win = windowed_self_attention(q, k, v, window=W)

    # Dense attention with an explicit block-diagonal boolean mask.
    blocks = jnp.arange(T) // W
    mask = (blocks[:, None] == blocks[None, :])[None, None]
    out_dense = sdpa(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out_win), np.asarray(out_dense), atol=1e-5)


def test_windowed_attention_key_validity():
    """Masked (invalid) keys must not influence valid queries."""
    B, H, T, D, W = 1, 1, 8, 4, 4
    rng = jax.random.PRNGKey(9)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), (B, H, T, D)) for i in range(3))
    valid = jnp.asarray([[True, True, True, False] + [False] * 4])

    out_a = windowed_self_attention(q, k, v, window=W, valid_mask=valid)
    # Perturb the invalid key/value rows wildly.
    k2 = k.at[:, :, 3].set(99.0)
    v2 = v.at[:, :, 3].set(-99.0)
    out_b = windowed_self_attention(q, k2, v2, window=W, valid_mask=valid)
    np.testing.assert_allclose(
        np.asarray(out_a[:, :, :3]), np.asarray(out_b[:, :, :3]), atol=1e-5
    )


def test_gqa_broadcast_matches_repeated_heads():
    """GQA sdpa == dense sdpa with kv heads explicitly repeated."""
    B, Hq, Hkv, T, D = 1, 4, 2, 6, 8
    rng = jax.random.PRNGKey(11)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, Hq, T, D))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, Hkv, T, D))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, Hkv, T, D))

    out = sdpa(q, k, v)
    k_rep = jnp.repeat(k, Hq // Hkv, axis=1)
    v_rep = jnp.repeat(v, Hq // Hkv, axis=1)
    out_rep = sdpa(q, k_rep, v_rep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_rep), atol=1e-5)


def test_conv_stem_taps_matches_conv():
    """The taps lowering (9 shifted matmuls per stride-2 conv) must equal
    lax.conv to f32 accumulation-order tolerance, including odd spatial
    sizes (W=25 -> 13)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from qwen3_asr_tpu.models.encoder import _conv2d_s2_taps

    rng = np.random.default_rng(0)
    for H, W, C, O in ((64, 50, 12, 8), (32, 25, 8, 12), (7, 9, 4, 4)):
        x = jnp.asarray(rng.standard_normal((3, H, W, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.1, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = _conv2d_s2_taps(x, w)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4,
            err_msg=f"H={H} W={W}",
        )


def test_encoder_forward_taps_mode_matches(monkeypatch):
    """QWEN3_ASR_CONV_STEM=taps end-to-end equivalence on the tiny config."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from qwen3_asr_tpu.models import encoder as enc

    cfg = TINY
    params = enc.init_encoder_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.num_mel_bins, 800)) * 0.3, jnp.float32
    )
    nv = jnp.asarray([800, 350], jnp.int32)
    ref, _ = enc.encoder_forward(params, cfg, mel, nv)
    monkeypatch.setattr(enc, "CONV_STEM_MODE", "taps")
    out, _ = enc.encoder_forward(params, cfg, mel, nv)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("mode", ["merged", "c512", "merged512"])
def test_encoder_forward_stem_modes_match(monkeypatch, mode):
    """Round-4 stem rewrites must be end-to-end equivalent to the
    per-chunk lax.conv stem: "merged" (guard-band merged-time images),
    "c512" (lane-aligned zero-padded channels), and their composition.
    Multi-chunk batch with a partial final chunk exercises the guard
    bands and the junk-position slicing."""
    from qwen3_asr_tpu.models import encoder as enc

    cfg = TINY
    params = enc.init_encoder_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(
        rng.standard_normal((2, cfg.num_mel_bins, 1600)) * 0.3, jnp.float32
    )
    nv = jnp.asarray([1600, 430], jnp.int32)
    ref, ref_n = enc.encoder_forward(params, cfg, mel, nv)
    monkeypatch.setattr(enc, "CONV_STEM_MODE", mode)
    out, out_n = enc.encoder_forward(params, cfg, mel, nv)
    np.testing.assert_array_equal(np.asarray(ref_n), np.asarray(out_n))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_conv_stem_merged_no_cross_chunk_leakage(monkeypatch):
    """Changing chunk c's mel must not change any OTHER chunk's stem
    output (the guard bands isolate chunks exactly).  Tested at the stem
    level — the transformer's windowed attention mixes chunks by design."""
    from qwen3_asr_tpu.models import encoder as enc

    cfg = TINY
    params = enc.init_encoder_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    rng = np.random.default_rng(3)
    monkeypatch.setattr(enc, "CONV_STEM_MODE", "merged")

    chunk = cfg.chunk_frames
    M = 8
    chunks = jnp.asarray(
        rng.standard_normal((M, cfg.num_mel_bins, chunk, 1)) * 0.3,
        jnp.float32,
    )
    base = np.asarray(enc.conv_stem(params, chunks, M))      # (M, tpc, d)

    poked = chunks.at[3].add(1.0)                            # chunk 3 only
    out = np.asarray(enc.conv_stem(params, poked, M))

    changed = np.abs(out - base).max(axis=(1, 2))            # per chunk
    assert changed[3] > 1e-6, "poked chunk did not change"
    others = np.delete(changed, 3)
    assert others.max() == 0.0, f"leak into other chunks: {others}"
