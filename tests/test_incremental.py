"""Incremental streaming sessions (incremental.py).

The exactness contract: at ANY point in a live stream, ``preview()``
must be token-identical to ``model.transcribe`` of the same audio
prefix — including the mel clamp's global coupling (a louder later
window lifts the clamp floor and retroactively changes earlier quiet
windows; the session re-encodes/re-advances exactly those).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from qwen3_asr_tpu.api import Qwen3ASR
from qwen3_asr_tpu.config import RuntimeConfig
from qwen3_asr_tpu.incremental import WINDOW_SAMPLES
from tests.test_api import TINY_CFG, StubTokenizer

RT = RuntimeConfig(frame_buckets=(800, 1600, 3200), token_buckets=(32, 64))


@pytest.fixture(scope="module")
def model():
    return Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=RT, dtype=jnp.float32
    )


def _speech_like(seconds, seed=0, amp=0.05):
    rng = np.random.default_rng(seed)
    n = int(seconds * 16_000)
    t = np.arange(n) / 16_000
    sig = np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    return (amp * (sig + 0.1 * rng.standard_normal(n))).astype(np.float32)


def test_preview_matches_offline_at_many_points(model):
    """Feed irregular pieces; preview == offline transcribe(prefix) at
    prefix lengths below, at, and beyond window boundaries."""
    audio = _speech_like(21.0, seed=1)
    sess = model.incremental_session(max_tokens=6, language="English")
    cuts = [
        int(3.2 * 16_000), WINDOW_SAMPLES + 40, int(9.7 * 16_000),
        2 * WINDOW_SAMPLES + 40, int(21.0 * 16_000),
    ]
    fed = 0
    for cut in cuts:
        sess.feed(audio[fed:cut])
        fed = cut
        got = sess.preview()
        ref = model.transcribe(audio[:cut], max_tokens=6, language="English")
        assert got.text == ref.text, f"prefix {cut / 16_000:.2f}s"
    # Committed windows were encoded incrementally, not re-run per call.
    assert sess._committed == 2


def test_preview_handles_clamp_floor_rise(model):
    """A near-silent first window followed by loud audio: the rising
    global clamp floor must retroactively re-encode the quiet window
    (min_raw < new floor), keeping offline identity."""
    quiet = _speech_like(9.0, seed=2, amp=1e-4)
    loud = _speech_like(8.0, seed=3, amp=0.5)
    audio = np.concatenate([quiet, loud])
    sess = model.incremental_session(max_tokens=6, language="English")
    sess.feed(quiet)
    first = sess.preview()
    ref_q = model.transcribe(quiet, max_tokens=6, language="English")
    assert first.text == ref_q.text
    floor_before = list(sess._win_floor)

    sess.feed(loud)
    got = sess.preview()
    ref = model.transcribe(audio, max_tokens=6, language="English")
    assert got.text == ref.text
    # The quiet window really was re-advanced under the lifted floor.
    assert sess._win_floor[0] > floor_before[0]


def test_preview_restores_cache_after_decode(model):
    """Back-to-back previews on unchanged audio are identical (the decode
    must not corrupt the committed prefix rows it shares a buffer with)."""
    sess = model.incremental_session(max_tokens=6, language="English")
    sess.feed(_speech_like(10.0, seed=4))
    a = sess.preview()
    b = sess.preview()
    assert a.text == b.text


def test_empty_and_reset(model):
    sess = model.incremental_session(max_tokens=6)
    assert sess.preview().text == ""
    sess.feed(_speech_like(2.0, seed=5))
    assert sess.preview().text != "" or True  # tiny model may emit EOS
    sess.reset()
    assert sess.duration == 0.0
    assert sess.preview().text == ""


def test_incremental_session_rejects_int8():
    rt = RuntimeConfig(
        frame_buckets=(800, 1600, 3200), token_buckets=(32, 64),
        kv_cache_dtype="int8",
    )
    m = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt, dtype=jnp.float32
    )
    with pytest.raises(ValueError):
        m.incremental_session()


def test_streaming_partial_uses_incremental_and_matches(model):
    """StreamingTranscriber.partial(): incremental and non-incremental
    sessions produce identical previews and identical finalized segments."""
    from qwen3_asr_tpu.streaming import StreamingTranscriber

    audio = _speech_like(26.0, seed=6)
    inc = StreamingTranscriber(
        model, segment_duration=10.0, search_duration=2.0,
        max_tokens=6, language="English",
    )
    ref = StreamingTranscriber(
        model, segment_duration=10.0, search_duration=2.0,
        max_tokens=6, language="English", incremental=False,
    )
    assert inc._inc is not None
    step = int(4.0 * 16_000)
    for lo in range(0, len(audio), step):
        piece = audio[lo : lo + step]
        segs_a = inc.feed(piece)
        segs_b = ref.feed(piece)
        assert [s.text for s in segs_a] == [s.text for s in segs_b]
        assert inc.partial().text == ref.partial().text
    assert [s.text for s in inc.flush()] == [s.text for s in ref.flush()]
    assert inc.text == ref.text


def test_preview_detect_mode_matches_offline(model):
    """language="detect": the session builds the unprimed suffix and
    parses the model-emitted language, matching the offline path."""
    audio = _speech_like(5.0, seed=7)
    sess = model.incremental_session(max_tokens=8, language="detect")
    sess.feed(audio)
    got = sess.preview()
    ref = model.transcribe(audio, max_tokens=8, language="detect")
    assert (got.text, got.language) == (ref.text, ref.language)


def test_preview_tiny_prefix_matches_offline(model):
    """Sub-200-sample streams hit the offline multi-wrap reflection rule."""
    audio = _speech_like(0.011, seed=8)       # 176 samples, 1 mel frame
    sess = model.incremental_session(max_tokens=4, language="English")
    sess.feed(audio)
    got = sess.preview()
    ref = model.transcribe(audio, max_tokens=4, language="English")
    assert got.text == ref.text


def test_preview_201_sample_stream_matches_offline(model):
    """Exactly N_FFT//2 + 1 = 201 samples: the right-reflect tail covers
    the full pad and tail_len == n - 1 — the old negative-step slice was
    empty there and preview() raised ValueError."""
    audio = _speech_like(201 / 16_000, seed=9)[:201]
    assert len(audio) == 201
    sess = model.incremental_session(max_tokens=4, language="English")
    sess.feed(audio)
    got = sess.preview()
    ref = model.transcribe(audio, max_tokens=4, language="English")
    assert got.text == ref.text


def test_failed_preview_invalidates_session(model, monkeypatch):
    """A failure inside preview() (where the cache may have been donated
    away) poisons the session with a clear error; reset() rebuilds it."""
    audio = _speech_like(3.0, seed=10)
    sess = model.incremental_session(max_tokens=4, language="English")
    sess.feed(audio)
    baseline = sess.preview().text

    boom = RuntimeError("injected advance failure")

    def exploding_advance(*a, **k):
        raise boom

    monkeypatch.setattr(sess._gen, "advance", exploding_advance)
    with pytest.raises(RuntimeError, match="injected"):
        sess.preview()
    monkeypatch.undo()

    # Poisoned: both entry points refuse with a clear message.
    with pytest.raises(RuntimeError, match="reset"):
        sess.preview()
    with pytest.raises(RuntimeError, match="reset"):
        sess.feed(audio)

    # reset() rebuilds the prefix cache and the session works again.
    sess.reset()
    sess.feed(audio)
    assert sess.preview().text == baseline
