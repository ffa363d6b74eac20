"""Checkpoint save/load round-trip tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.config import AudioEncoderConfig, ModelConfig, TextDecoderConfig
from qwen3_asr_tpu.models.decoder import init_decoder_params
from qwen3_asr_tpu.models.encoder import init_encoder_params
from qwen3_asr_tpu.models.params import load_checkpoint, save_checkpoint

TINY = ModelConfig(
    audio_encoder=AudioEncoderConfig(
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=64,
        output_dim=48,
        downsample_hidden_size=16,
    ),
    text_decoder=TextDecoderConfig(
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=12,
        intermediate_size=96,
        vocab_size=128,
    ),
)


def test_save_load_roundtrip(tmp_path):
    rng = jax.random.PRNGKey(0)
    enc = init_encoder_params(TINY.audio_encoder, rng, dtype=jnp.float32)
    dec = init_decoder_params(TINY.text_decoder, rng, dtype=jnp.float32)

    out = save_checkpoint(tmp_path, enc, dec)
    assert out.is_file()

    enc2, dec2 = load_checkpoint(tmp_path, TINY, dtype=jnp.float32)

    for a, b in zip(jax.tree_util.tree_leaves(enc), jax.tree_util.tree_leaves(enc2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(dec), jax.tree_util.tree_leaves(dec2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_layout_conv_sniffing(tmp_path):
    """PyTorch-layout conv weights (O,I,KH,KW) load to the same HWIO."""
    import safetensors.flax as stf

    rng = jax.random.PRNGKey(1)
    enc = init_encoder_params(TINY.audio_encoder, rng, dtype=jnp.float32)
    dec = init_decoder_params(TINY.text_decoder, rng, dtype=jnp.float32)
    save_checkpoint(tmp_path, enc, dec)

    # Rewrite conv tensors from MLX (O,H,W,I) into torch (O,I,H,W) layout.
    raw = dict(stf.load_file(str(tmp_path / "model.safetensors")))
    for key in list(raw):
        if "conv2d" in key and key.endswith("weight"):
            raw[key] = jnp.transpose(raw[key], (0, 3, 1, 2))
    stf.save_file(raw, str(tmp_path / "model.safetensors"))

    enc2, _ = load_checkpoint(tmp_path, TINY, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(enc["conv1_w"]), np.asarray(enc2["conv1_w"]))
    np.testing.assert_array_equal(np.asarray(enc["conv3_w"]), np.asarray(enc2["conv3_w"]))
