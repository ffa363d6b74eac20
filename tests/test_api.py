"""End-to-end API tests with a tiny model (reference test_model.py tier 2).

Uses a stub tokenizer so no tokenizer.json is needed; ids are remapped into
the tiny vocab while preserving the prompt structure (audio pads at 9..).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.api import LANGUAGE_MAP, Qwen3ASR, TranscriptionResult
from qwen3_asr_tpu.config import (
    AudioEncoderConfig,
    ModelConfig,
    RuntimeConfig,
    TextDecoderConfig,
)
from qwen3_asr_tpu.tokenizer import build_prompt

TINY_CFG = ModelConfig(
    audio_encoder=AudioEncoderConfig(
        d_model=32,
        encoder_layers=2,
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

RT = RuntimeConfig(frame_buckets=(800, 1600, 3200), token_buckets=(16, 256))


class StubTokenizer:
    """Structure-preserving tokenizer over the tiny vocab."""

    def encode(self, text):
        return [sum(map(ord, text)) % 509 + 1]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{t}" for t in ids)

    def build_prompt(self, n_audio_tokens, language="English"):
        from qwen3_asr_tpu.tokenizer import build_detect_prompt

        if language is None:
            ids = build_detect_prompt(n_audio_tokens)
        else:
            ids = build_prompt(n_audio_tokens, self.encode(f" {language}"))
        return [t % 512 for t in ids]

    def parse_output(self, text):
        return text


@pytest.fixture(scope="module")
def model():
    return Qwen3ASR.from_random(TINY_CFG, tokenizer=StubTokenizer(), runtime=RT, dtype=jnp.float32)


def sine(duration_s, freq=440.0):
    t = np.arange(int(duration_s * 16000)) / 16000
    return (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_language_map_contents():
    assert len(LANGUAGE_MAP) == 67
    assert LANGUAGE_MAP["en"] == "English"
    assert LANGUAGE_MAP["zh"] == "Chinese"
    assert LANGUAGE_MAP["tl"] == "Filipino"


def test_empty_audio_short_circuits(model):
    res = model.transcribe(np.zeros(0, dtype=np.float32))
    assert res == TranscriptionResult(text="", language="Unknown", duration=0.0)


def test_non_mono_rejected(model):
    with pytest.raises(ValueError):
        model.transcribe(np.zeros((2, 100), dtype=np.float32))


def test_language_resolution(model):
    assert model._resolve_language(None) == "English"
    assert model._resolve_language("auto") == "English"
    assert model._resolve_language("") == "English"
    assert model._resolve_language("de") == "German"
    assert model._resolve_language("DE") == "German"
    assert model._resolve_language("Klingon") == "Klingon"


def test_transcribe_end_to_end(model):
    res = model.transcribe(sine(1.0), max_tokens=5)
    assert isinstance(res, TranscriptionResult)
    assert res.duration == pytest.approx(1.0)
    assert res.language == "English"
    assert isinstance(res.text, str)


def test_transcribe_greedy_deterministic(model):
    a = model.transcribe(sine(1.0, 330.0), max_tokens=8)
    b = model.transcribe(sine(1.0, 330.0), max_tokens=8)
    assert a.text == b.text


def test_transcribe_from_wav_file(model, tmp_path):
    import struct

    audio = sine(0.5)
    payload = audio.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    data = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data += b"data" + struct.pack("<I", len(payload)) + payload
    p = tmp_path / "clip.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data)

    res = model.transcribe(p, max_tokens=5)
    assert res.duration == pytest.approx(0.5, abs=0.01)


def test_max_tokens_formula():
    # max(256, duration * 50) — reference model.py:309-311.
    assert max(256, int(3.0 * 50)) == 256
    assert max(256, int(30.0 * 50)) == 1500


def test_context_manager_close():
    m = Qwen3ASR.from_random(TINY_CFG, tokenizer=StubTokenizer(), runtime=RT, dtype=jnp.float32)
    with m as ctx:
        assert ctx is m
    assert m._decoder_params is None


def test_warm_up(model):
    model.warm_up()  # 0.5 s of silence through the full pipeline


def test_chunked_long_audio(model):
    """duration > chunk_duration triggers the split-and-stitch path."""
    audio = sine(5.0)
    audio[2 * 16000 : 2 * 16000 + 2000] = 0.0  # silence pocket for the split
    res = model.transcribe(audio, chunk_duration=2.0, max_tokens=4)
    assert res.duration == pytest.approx(5.0)
    assert isinstance(res.text, str)


def test_language_detect_mode(model):
    """language="detect" runs the unprimed prompt and parses model output."""
    res = model.transcribe(sine(1.0), language="detect", max_tokens=6)
    assert isinstance(res.text, str)
    # Tiny random model won't emit the chat format; parser falls back.
    assert isinstance(res.language, str) and res.language


def test_no_nans_through_pipeline(model):
    """Sanitizer mode: the whole pipeline must be NaN-free under
    jax_debug_nans (the CI analog of a race/sanitizer job, SURVEY.md §5)."""
    import jax

    jax.config.update("jax_debug_nans", True)
    try:
        res = model.transcribe(sine(1.0, 220.0), max_tokens=4)
        assert isinstance(res.text, str)
    finally:
        jax.config.update("jax_debug_nans", False)


def test_int16_transport_matches_float32(model):
    """int16 PCM input must produce the same transcript as its exact
    float32 counterpart (device scales x/32768 — transport parity)."""
    f32 = sine(1.0, 350.0)
    pcm = np.clip(np.round(f32 * 32768.0), -32768, 32767).astype(np.int16)
    exact_f32 = pcm.astype(np.float32) / 32768.0
    r_pcm = model.transcribe(pcm, max_tokens=6)
    r_f32 = model.transcribe(exact_f32, max_tokens=6)
    assert r_pcm.text == r_f32.text
    assert r_pcm.duration == r_f32.duration


def test_int16_batch_and_mixed_batch(model):
    f32 = sine(1.0, 220.0)
    pcm = np.clip(np.round(f32 * 32768.0), -32768, 32767).astype(np.int16)
    exact = pcm.astype(np.float32) / 32768.0
    all_pcm = model.transcribe_batch([pcm, pcm], max_tokens=6)
    mixed = model.transcribe_batch([pcm, exact], max_tokens=6)
    ref = model.transcribe_batch([exact, exact], max_tokens=6)
    assert [r.text for r in all_pcm] == [r.text for r in ref]
    assert [r.text for r in mixed] == [r.text for r in ref]


def test_grouped_prefill_matches_single_program():
    """Sub-group pipelined prefill (transfer/compute overlap) must be
    numerically identical to the one-program prefill."""
    rt_grouped = RuntimeConfig(
        frame_buckets=(800,), token_buckets=(16,), prefill_group_size=2
    )
    rt_single = RuntimeConfig(
        frame_buckets=(800,), token_buckets=(16,), prefill_group_size=0
    )
    m1 = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt_grouped, dtype=jnp.float32
    )
    m2 = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt_single, dtype=jnp.float32
    )
    clips = [sine(1.0, 200.0 + 60 * i) for i in range(5)]  # 3 groups: 2+2+1
    r1 = m1.transcribe_batch(clips, max_tokens=6)
    r2 = m2.transcribe_batch(clips, max_tokens=6)
    assert [r.text for r in r1] == [r.text for r in r2]


def test_transcribe_batch_chunks_long_form(model):
    """Batch long-form parity (reference model.py:382-447 semantics,
    VERDICT r4 item 5): a clip beyond chunk_duration inside a batch takes
    the SAME split-and-stitch path as transcribe(), while the short clips
    in the batch still run as one device program with unchanged output."""
    long_clip = sine(5.0)
    long_clip[2 * 16000 : 2 * 16000 + 2000] = 0.0  # silence pocket
    shorts = [sine(1.0, 220.0), sine(1.0, 330.0)]

    got = model.transcribe_batch(
        [shorts[0], long_clip, shorts[1]], chunk_duration=2.0, max_tokens=4
    )
    ref_long = model.transcribe(long_clip, chunk_duration=2.0, max_tokens=4)
    ref_shorts = model.transcribe_batch(shorts, max_tokens=4)

    assert got[1].text == ref_long.text
    assert got[1].duration == pytest.approx(5.0)
    assert [got[0].text, got[2].text] == [r.text for r in ref_shorts]


def test_transcribe_batch_over_bucket_clip_chunks(model):
    """A clip within chunk_duration but beyond the largest frame bucket
    must chunk (with the bucket-slack clamp) instead of overflowing the
    planner — the pre-round-5 behavior was an opaque ValueError."""
    clip = sine(33.0)  # > RT's largest bucket (3200 frames = 32 s)
    res = model.transcribe_batch([clip], max_tokens=4)
    assert res[0].duration == pytest.approx(33.0)
    assert isinstance(res[0].text, str)


def test_warm_up_deployment_grid(model, caplog):
    import logging

    with caplog.at_level(logging.INFO, logger="qwen3_asr_tpu"):
        model.warm_up(deployment={
            "durations": (0.5, 1.0),
            "batch_sizes": (1, 2),
            "max_tokens": (2,),
        })
    assert "warm_up 4/4" in caplog.text
    assert "warm_up complete: 4 program shapes" in caplog.text


def test_transcribe_batch_bucketing_pads_and_slices(model):
    """A batch of 3 pads to the 4-wide program but returns exactly 3
    results, identical to the unbucketed path."""
    clips = [sine(1.0, 440.0), sine(1.0, 330.0), sine(0.5, 550.0)]
    res = model.transcribe_batch(clips, max_tokens=4)
    assert len(res) == 3
    solo = [model.transcribe(c, max_tokens=4) for c in clips]
    assert [r.text for r in res] == [s.text for s in solo]
    assert model._batch_bucket(3) == 4
    assert model._batch_bucket(13) == 16
    assert model._batch_bucket(48) == 48
    assert model._batch_bucket(1) == 1


def test_from_pretrained_background_warm(tmp_path, monkeypatch):
    """from_pretrained(warm="background"): programs compile on a
    zero-init stand-in while the checkpoint loads, then the real weights
    swap in — the result must transcribe identically to a plain load."""
    import dataclasses
    import json

    from qwen3_asr_tpu import api as api_mod
    from qwen3_asr_tpu.models.decoder import init_decoder_params
    from qwen3_asr_tpu.models.encoder import init_encoder_params
    from qwen3_asr_tpu.models.params import save_checkpoint

    rng = jax.random.PRNGKey(3)
    enc = init_encoder_params(TINY_CFG.audio_encoder, rng, dtype=jnp.float32)
    dec = init_decoder_params(TINY_CFG.text_decoder, rng, dtype=jnp.float32)
    save_checkpoint(tmp_path, enc, dec)
    # HF schema: decoder fields top-level, encoder nested (config.py).
    (tmp_path / "config.json").write_text(json.dumps({
        **dataclasses.asdict(TINY_CFG.text_decoder),
        "audio_encoder_config": dataclasses.asdict(TINY_CFG.audio_encoder),
    }))
    monkeypatch.setattr(api_mod, "Tokenizer", lambda path: StubTokenizer())

    def rt():
        return RuntimeConfig(frame_buckets=(800, 1600), token_buckets=(16, 32))

    m_bg = Qwen3ASR.from_pretrained(
        tmp_path, runtime=rt(), dtype=jnp.float32, warm="background",
        warm_deployment={
            "durations": (0.5,), "batch_sizes": (1,), "max_tokens": (4,),
        },
    )
    assert m_bg.wait_warm(timeout=180)
    m_off = Qwen3ASR.from_pretrained(tmp_path, runtime=rt(), dtype=jnp.float32)

    clip = sine(1.0, 440.0)
    a = m_bg.transcribe(clip, max_tokens=8)
    b = m_off.transcribe(clip, max_tokens=8)
    assert a.text == b.text

    with pytest.raises(ValueError, match="warm"):
        Qwen3ASR.from_pretrained(
            tmp_path, runtime=rt(), dtype=jnp.float32, warm="nonsense"
        )


def test_chunk_slack_covers_both_snapped_boundaries(model):
    """BOTH ends of an interior chunk snap independently within the 5 s
    low-energy window, so a chunk can run chunk_duration + 10 s — the
    clamp must reserve 10 s (not 5) or adversarial silence placement
    overflows the largest compiled frame bucket."""
    cd = model._clamp_chunk_duration(1200.0)
    max_bucket_s = RT.frame_buckets[-1] * 160 / 16000  # 32 s
    assert cd == pytest.approx(max_bucket_s - 10.0)  # 22 s

    # 70 s clip, loud everywhere except deep pockets near 17 s (= 22-5)
    # and 48.9 s (just inside the 44+5 window): the middle chunk spans
    # ~31.9 s — within the 32 s bucket only because the clamp reserves
    # the full 10 s.  With the old 5 s slack (cd 27) this overflowed.
    audio = sine(70.0)
    for pocket_s in (17.0, 48.9):
        i = int(pocket_s * 16000)
        audio[i : i + 3200] = 0.0
    chunks = model._split_long_chunks(audio, cd)
    max_bucket_samples = RT.frame_buckets[-1] * 160
    assert all(len(c) <= max_bucket_samples for c in chunks)
    # Both boundaries snapped outward: the chunk exceeds cd + one window,
    # i.e. the old single-window slack was insufficient.
    assert max(len(c) for c in chunks) > int((cd + 5.0) * 16000)
    res = model.transcribe(audio, max_tokens=2)
    assert res.duration == pytest.approx(70.0)


def test_chunk_search_window_shrinks_for_small_bucket_tables():
    """A bucket table too small for the full 10 s slack halves the
    bucket instead, and the split search window shrinks to the slack
    the clamped duration leaves — chunks always fit the bucket."""
    m = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(),
        runtime=RuntimeConfig(frame_buckets=(800,), token_buckets=(16,)),
        dtype=jnp.float32,
    )
    cd = m._clamp_chunk_duration(20.0)  # bucket 8 s -> slack 4 -> cd 4
    assert cd == pytest.approx(4.0)
    audio = sine(12.0)
    audio[int(3.0 * 16000) : int(3.0 * 16000) + 3200] = 0.0
    chunks = m._split_long_chunks(audio, cd)
    assert all(len(c) <= 800 * 160 for c in chunks)
    res = m.transcribe(audio, chunk_duration=20.0, max_tokens=2)
    assert res.duration == pytest.approx(12.0)
