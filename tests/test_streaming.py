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


def test_server_backed_session_matches_model_path(model):
    """A server= session must produce the same segments as the default
    (model-lock) path — engine decode is token-identical (oracle tests)."""
    from qwen3_asr_tpu.serving.server import ContinuousTranscriptionServer

    audio = tone_with_gaps(5.0)
    ref = StreamingTranscriber(
        model, segment_duration=2.0, search_duration=0.5, max_tokens=4
    )
    ref_segs = ref.feed(audio) + ref.flush()

    with ContinuousTranscriptionServer(
        model, n_slots=4, max_duration=3.0, max_new_tokens=16, chunk_steps=2
    ) as srv:
        s = StreamingTranscriber(
            model, segment_duration=2.0, search_duration=0.5,
            server=srv, max_tokens=4,
        )
        segs = s.feed(audio) + s.flush()
    assert [(g.text, g.start, g.end) for g in segs] == [
        (g.text, g.start, g.end) for g in ref_segs
    ]


def test_concurrent_streams_share_engine(model):
    """Two live sessions + batch traffic on ONE continuous server: all
    sessions make progress concurrently (feed_nowait pipelining) and
    every segment's text matches the offline transcription of its span."""
    from qwen3_asr_tpu.serving.server import ContinuousTranscriptionServer

    audio_a = tone_with_gaps(5.0)
    audio_b = tone_with_gaps(5.0, gap_every=1.7)

    with ContinuousTranscriptionServer(
        model, n_slots=4, max_duration=3.0, max_new_tokens=16, chunk_steps=2
    ) as srv:
        sa = StreamingTranscriber(
            model, segment_duration=2.0, search_duration=0.5,
            server=srv, max_tokens=4,
        )
        sb = StreamingTranscriber(
            model, segment_duration=2.0, search_duration=0.5,
            server=srv, max_tokens=4,
        )
        futs_a, futs_b = [], []
        piece = SAMPLE_RATE
        # Interleave feeds from one thread; segments decode in-flight.
        for i in range(0, max(len(audio_a), len(audio_b)), piece):
            futs_a += sa.feed_nowait(audio_a[i : i + piece])
            futs_b += sb.feed_nowait(audio_b[i : i + piece])
        # Batch traffic rides the same engine mid-stream.
        extra = srv.submit(sine(1.0, 520.0), max_tokens=4)
        futs_a += sa.flush_nowait()
        futs_b += sb.flush_nowait()
        segs_a = [f.result(timeout=300) for f in futs_a]
        segs_b = [f.result(timeout=300) for f in futs_b]
        assert extra.result(timeout=300).text

    for audio, segs, sess in ((audio_a, segs_a, sa), (audio_b, segs_b, sb)):
        assert len(segs) >= 2
        assert segs[-1].end * SAMPLE_RATE == pytest.approx(len(audio), abs=1)
        for g in segs:
            lo, hi = int(g.start * SAMPLE_RATE), int(g.end * SAMPLE_RATE)
            off = model.transcribe(audio[lo:hi], max_tokens=4)
            assert g.text == off.text
        # The placeholders in .segments resolved in place.
        assert [g.text for g in sess.segments] == [g.text for g in segs]


def test_feed_nowait_requires_server(model):
    s = StreamingTranscriber(model, segment_duration=2.0, search_duration=0.5)
    with pytest.raises(RuntimeError, match="server"):
        s.feed_nowait(np.zeros(100, np.float32))


def test_session_rejects_segment_beyond_server_budget(model):
    class FakeServer:
        _max_duration = 1.0

        def submit(self, *a, **k):
            raise AssertionError("should not submit")

    with pytest.raises(ValueError, match="max_duration"):
        StreamingTranscriber(
            model, segment_duration=2.0, search_duration=0.5,
            server=FakeServer(),
        )
