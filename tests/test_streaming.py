"""Streaming (incremental) transcription session tests (CPU, tiny model)."""

import numpy as np
import pytest

import jax.numpy as jnp

from qwen3_asr_tpu import StreamingTranscriber
from qwen3_asr_tpu.api import Qwen3ASR
from qwen3_asr_tpu.audio.io import SAMPLE_RATE
from qwen3_asr_tpu.config import RuntimeConfig
from tests.test_api import TINY_CFG, StubTokenizer, sine

RT = RuntimeConfig(frame_buckets=(800,), token_buckets=(16,))


@pytest.fixture(scope="module")
def model():
    return Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=RT, dtype=jnp.float32
    )


def tone_with_gaps(total_sec, gap_every=2.0, gap_len=0.3):
    """Sine with periodic silences so low-energy splits land in gaps."""
    out = sine(total_sec, 440.0).copy()
    gap = int(gap_len * SAMPLE_RATE)
    step = int(gap_every * SAMPLE_RATE)
    for start in range(step, len(out), step):
        out[start : start + gap] = 0.0
    return out


def test_progressive_finalization(model):
    """Segments finalize as audio arrives, before the stream ends."""
    audio = tone_with_gaps(7.0)
    s = StreamingTranscriber(
        model, segment_duration=2.0, search_duration=0.5, max_tokens=4
    )
    early = []
    piece = SAMPLE_RATE  # 1 s at a time
    for i in range(0, len(audio), piece):
        early += s.feed(audio[i : i + piece])
    assert len(early) >= 2, "no segment finalized before end of stream"
    final = s.flush()
    segs = s.segments
    assert segs == early + final
    assert all(g.final for g in segs)
    # Spans tile the stream exactly.
    assert segs[0].start == 0.0
    for a, b in zip(segs, segs[1:]):
        assert abs(a.end - b.start) < 1e-6
    assert abs(segs[-1].end - len(audio) / SAMPLE_RATE) < 1e-6
    assert s.text == " ".join(g.text for g in segs if g.text).strip()


def test_matches_offline_per_segment_transcription(model):
    """Each finalized segment's text == offline transcribe of that span
    (the session adds segmentation, not new model behavior)."""
    audio = tone_with_gaps(5.0)
    s = StreamingTranscriber(
        model, segment_duration=2.0, search_duration=0.5, max_tokens=4
    )
    s.feed(audio)
    s.flush()
    for seg in s.segments:
        lo = int(round(seg.start * SAMPLE_RATE))
        hi = int(round(seg.end * SAMPLE_RATE))
        ref = model.transcribe(audio[lo:hi], max_tokens=4)
        assert seg.text == ref.text


def test_split_lands_in_silence(model):
    """The boundary snaps to the low-energy gap (reference argmin rule)."""
    audio = tone_with_gaps(4.0, gap_every=2.1, gap_len=0.3)
    s = StreamingTranscriber(
        model, segment_duration=2.0, search_duration=0.5, max_tokens=4
    )
    s.feed(audio)
    seg = s.segments[0]
    boundary = int(seg.end * SAMPLE_RATE)
    gap_start = int(2.1 * SAMPLE_RATE)
    assert gap_start - 480 <= boundary <= gap_start + int(0.3 * SAMPLE_RATE) + 480


def test_partial_preview_and_close(model):
    audio = tone_with_gaps(3.0)
    with StreamingTranscriber(
        model, segment_duration=2.0, search_duration=0.5, max_tokens=4
    ) as s:
        s.feed(audio[: SAMPLE_RATE])
        p = s.partial()
        assert not p.final
        assert p.end > p.start
        n_before = len(s.segments)
        s.partial()  # previews never mutate session state
        assert len(s.segments) == n_before
        s.feed(audio[SAMPLE_RATE:])
    assert s._closed
    assert s.segments[-1].final
    with pytest.raises(RuntimeError):
        s.feed(audio[:100])


def test_int16_feed(model):
    audio = (tone_with_gaps(2.0) * 32767).astype(np.int16)
    s = StreamingTranscriber(
        model, segment_duration=3.0, search_duration=0.5, max_tokens=4
    )
    s.feed(audio)
    out = s.flush()
    assert len(out) == 1 and out[0].final


def test_segment_must_fit_bucket(model):
    """segment+search beyond the largest frame bucket is rejected up
    front (it could otherwise produce an un-compilable chunk)."""
    with pytest.raises(ValueError, match="largest frame bucket"):
        StreamingTranscriber(model, segment_duration=7.5, search_duration=1.5)


def test_split_clamped_to_bucket(model):
    """Monotonically decreasing energy pulls the argmin to the window's
    far edge; the resulting chunk must still fit the 8 s bucket."""
    t = np.arange(16000 * 12) / 16000
    audio = (
        np.sin(2 * np.pi * 440 * t) * np.linspace(1.0, 0.01, len(t))
    ).astype(np.float32)
    s = StreamingTranscriber(
        model, segment_duration=6.0, search_duration=1.5, max_tokens=4
    )
    s.feed(audio)
    s.flush()
    for seg in s.segments:
        assert seg.end - seg.start <= 8.0 + 1e-6
