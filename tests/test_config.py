"""Config parsing tests (mirror of the reference's test_config.py coverage)."""

import json

from qwen3_asr_tpu.config import (
    AudioEncoderConfig,
    ModelConfig,
    RuntimeConfig,
    TextDecoderConfig,
    conv_output_length,
)

SAMPLE_CONFIG = {
    "audio_encoder_config": {
        "d_model": 1024,
        "encoder_layers": 24,
        "encoder_attention_heads": 16,
        "encoder_ffn_dim": 4096,
        "num_mel_bins": 128,
        "max_source_positions": 1500,
        "output_dim": 2048,
        "n_window": 50,
        "n_window_infer": 800,
    },
    "hidden_size": 2048,
    "num_hidden_layers": 28,
    "num_attention_heads": 16,
    "num_key_value_heads": 8,
    "head_dim": 128,
    "intermediate_size": 6144,
    "vocab_size": 151936,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "audio_token_id": 151676,
}


def test_defaults_match_17b():
    cfg = ModelConfig()
    assert cfg.audio_encoder.d_model == 1024
    assert cfg.audio_encoder.encoder_layers == 24
    assert cfg.text_decoder.hidden_size == 2048
    assert cfg.text_decoder.num_hidden_layers == 28
    assert cfg.text_decoder.num_attention_heads == 16
    assert cfg.text_decoder.num_key_value_heads == 8
    assert cfg.text_decoder.head_dim == 128
    assert cfg.text_decoder.vocab_size == 151936
    assert cfg.text_decoder.rope_theta == 1_000_000.0


def test_from_dict_full():
    cfg = ModelConfig.from_dict(SAMPLE_CONFIG)
    assert cfg.audio_encoder.output_dim == 2048
    assert cfg.text_decoder.intermediate_size == 6144
    assert cfg.audio_token_id == 151676


def test_from_dict_nested_encoder_fallbacks():
    cfg = AudioEncoderConfig.from_dict({"num_hidden_layers": 2})
    assert cfg.encoder_layers == 2


def test_unused_fields_still_parsed():
    # Fidelity trap from the reference (config.py:76-77): parsed, not used.
    cfg = TextDecoderConfig.from_dict({"mrope_section": [1, 2, 3]})
    assert cfg.mrope_section == [1, 2, 3]
    assert cfg.rope_interleaved is True


def test_from_pretrained_local(tmp_path):
    (tmp_path / "config.json").write_text(json.dumps(SAMPLE_CONFIG))
    cfg = ModelConfig.from_pretrained(tmp_path)
    assert cfg.text_decoder.hidden_size == 2048


def test_conv_output_length():
    # Reference oracle: 100 frames -> 13 tokens, 50 -> 7 (encoder.py:197-207).
    assert conv_output_length(100) == 13
    assert conv_output_length(50) == 7
    assert conv_output_length(1) == 1


def test_derived_encoder_geometry():
    cfg = AudioEncoderConfig()
    assert cfg.chunk_frames == 100
    assert cfg.freq_after_conv == 16
    assert cfg.tokens_per_chunk == 13
    assert cfg.window_tokens == 104


def test_runtime_buckets():
    rt = RuntimeConfig()
    assert rt.pick_bucket(100, rt.frame_buckets) == 800
    assert rt.pick_bucket(801, rt.frame_buckets) == 1600
    assert rt.pick_bucket(10**9, rt.frame_buckets) == rt.frame_buckets[-1]
    for b in rt.frame_buckets:
        assert b % 800 == 0, "frame buckets must hold whole attention windows"
