"""Real-checkpoint tests (tier 3, reference test strategy SURVEY.md §4).

Gated on a local checkpoint directory via the ``QWEN3_ASR_CHECKPOINT``
environment variable (no network in CI).  Mirrors the reference's
loose-property assertions: finite outputs, valid ids, greedy determinism —
never exact transcripts.
"""

import os
from pathlib import Path

import numpy as np
import pytest

CKPT = os.environ.get("QWEN3_ASR_CHECKPOINT", "")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (CKPT and Path(CKPT).is_dir()),
        reason="set QWEN3_ASR_CHECKPOINT to a local Qwen3-ASR checkpoint dir",
    ),
]


@pytest.fixture(scope="module")
def model():
    from qwen3_asr_tpu.api import Qwen3ASR

    return Qwen3ASR.from_pretrained(CKPT)


def sine(duration_s, freq=440.0):
    t = np.arange(int(duration_s * 16000)) / 16000
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_loads_and_transcribes(model):
    res = model.transcribe(sine(2.0), max_tokens=64)
    assert isinstance(res.text, str)
    assert res.language == "English"
    assert res.duration == pytest.approx(2.0)


def test_greedy_deterministic(model):
    a = model.transcribe(sine(1.0), max_tokens=32)
    b = model.transcribe(sine(1.0), max_tokens=32)
    assert a.text == b.text


def test_language_hint(model):
    res = model.transcribe(sine(1.0), language="de", max_tokens=32)
    assert res.language == "German"


def test_batch_matches_single(model):
    clips = [sine(1.0, 440.0), sine(1.0, 330.0)]
    batch = model.transcribe_batch(clips, max_tokens=32)
    singles = [model.transcribe(c, max_tokens=32) for c in clips]
    assert [r.text for r in batch] == [r.text for r in singles]


def test_silence_produces_short_output(model):
    res = model.transcribe(np.zeros(16000, np.float32), max_tokens=64)
    assert isinstance(res.text, str)
