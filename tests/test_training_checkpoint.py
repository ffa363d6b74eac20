"""Orbax train-state checkpoint/resume tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qwen3_asr_tpu.config import AudioEncoderConfig, ModelConfig, TextDecoderConfig
from qwen3_asr_tpu.models.decoder import init_decoder_params
from qwen3_asr_tpu.models.encoder import init_encoder_params
from qwen3_asr_tpu.training.checkpoint import (
    latest_step,
    restore_train_state,
    save_train_state,
)
from qwen3_asr_tpu.training.train import init_train_state

CFG = ModelConfig(
    audio_encoder=AudioEncoderConfig(
        d_model=32,
        encoder_layers=1,
        encoder_attention_heads=4,
        encoder_ffn_dim=64,
        output_dim=64,
        downsample_hidden_size=8,
    ),
    text_decoder=TextDecoderConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=128,
        vocab_size=512,
    ),
)


def _state(seed=0):
    rng = jax.random.PRNGKey(seed)
    opt = optax.adam(1e-3)
    return init_train_state(
        CFG,
        opt,
        init_encoder_params(CFG.audio_encoder, rng, jnp.float32),
        init_decoder_params(CFG.text_decoder, rng, jnp.float32),
    )


def test_roundtrip(tmp_path):
    st = _state()
    save_train_state(tmp_path, st)
    assert latest_step(tmp_path) == 0
    st2 = restore_train_state(tmp_path, _state(seed=1))
    for a, b in zip(
        jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(st2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_picks_max(tmp_path):
    st = _state()
    save_train_state(tmp_path, st, step=3)
    save_train_state(tmp_path, st, step=11)
    assert latest_step(tmp_path) == 11


def test_latest_step_empty(tmp_path):
    assert latest_step(tmp_path) is None
    assert latest_step(tmp_path / "nope") is None
