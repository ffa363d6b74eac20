"""Batched transcription + continuous-batching server tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from qwen3_asr_tpu.api import Qwen3ASR, TranscriptionResult
from qwen3_asr_tpu.config import RuntimeConfig
from qwen3_asr_tpu.serving.server import TranscriptionServer
from tests.test_api import RT, TINY_CFG, StubTokenizer, sine


@pytest.fixture(scope="module")
def model():
    return Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=RT, dtype=jnp.float32
    )


def test_transcribe_batch_matches_single(model):
    """Batched greedy output must equal per-clip greedy output."""
    clips = [sine(1.0, 440.0), sine(1.0, 330.0)]
    batch = model.transcribe_batch(clips, max_tokens=6)
    singles = [model.transcribe(c, max_tokens=6) for c in clips]
    assert [r.text for r in batch] == [r.text for r in singles]
    assert [r.duration for r in batch] == [r.duration for r in singles]


def test_transcribe_batch_mixed_lengths(model):
    clips = [sine(0.5), sine(2.0)]
    out = model.transcribe_batch(clips, max_tokens=4)
    assert out[0].duration == pytest.approx(0.5)
    assert out[1].duration == pytest.approx(2.0)


def test_transcribe_batch_empty_clip_isolated(model):
    out = model.transcribe_batch(
        [sine(0.5), np.zeros(0, np.float32)], max_tokens=4
    )
    assert out[0].text is not None
    assert out[1] == TranscriptionResult(text="", language="Unknown", duration=0.0)


def test_server_basic(model):
    with TranscriptionServer(model, max_batch_size=4, batch_window_ms=30) as srv:
        futs = [srv.submit(sine(0.5, 300.0 + 50 * i), max_tokens=4) for i in range(4)]
        results = [f.result(timeout=120) for f in futs]
    assert all(isinstance(r, TranscriptionResult) for r in results)
    assert srv.stats.requests == 4
    assert srv.stats.batches >= 1
    assert srv.stats.mean_batch_size >= 1.0


def test_server_matches_direct_call(model):
    clip = sine(1.0, 275.0)
    direct = model.transcribe(clip, max_tokens=5)
    with TranscriptionServer(model) as srv:
        served = srv.transcribe(clip, max_tokens=5)
    assert served.text == direct.text


def test_server_bad_clip_isolated(model):
    """A malformed clip fails its own future, not its batchmates'."""
    with TranscriptionServer(model, max_batch_size=2, batch_window_ms=50) as srv:
        good = srv.submit(sine(0.5), max_tokens=4)
        bad = srv.submit(np.zeros((2, 10), np.float32), max_tokens=4)
        assert isinstance(good.result(timeout=120), TranscriptionResult)
        with pytest.raises(ValueError):
            bad.result(timeout=120)
    assert srv.stats.failures == 1


def test_server_groups_by_length_bucket(model):
    """Short and long clips land in separate batches (no cross-padding)."""
    with TranscriptionServer(model, max_batch_size=4, batch_window_ms=60) as srv:
        futs = [
            srv.submit(sine(0.5), max_tokens=4),
            srv.submit(sine(20.0), max_tokens=4),   # different frame bucket
            srv.submit(sine(0.6), max_tokens=4),
        ]
        for f in futs:
            assert isinstance(f.result(timeout=180), TranscriptionResult)
    assert srv.stats.batches >= 2  # at least one split by bucket


def test_replicated_server_spreads_over_devices():
    """dp scale-out: 8 virtual devices, one tiny replica each, shared
    queue; results identical to a solo model."""
    import jax
    import jax.numpy as jnp

    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import RuntimeConfig
    from qwen3_asr_tpu.serving.server import ReplicatedTranscriptionServer
    from tests.test_api import TINY_CFG, StubTokenizer, sine

    rt = RuntimeConfig(frame_buckets=(800,), token_buckets=(16,))

    def factory():
        return Qwen3ASR.from_random(
            TINY_CFG, tokenizer=StubTokenizer(), runtime=rt, dtype=jnp.float32
        )

    solo = factory()
    clips = [sine(0.5 + 0.1 * (i % 4), 300.0 + 20 * i) for i in range(12)]
    expected = [solo.transcribe(c, max_tokens=4).text for c in clips]

    devices = jax.devices()[:4]
    with ReplicatedTranscriptionServer(
        factory, devices=devices, max_batch_size=2, batch_window_ms=40.0
    ) as srv:
        assert srv.n_replicas == 4
        futs = [srv.submit(c, max_tokens=4) for c in clips]
        results = [f.result(timeout=600).text for f in futs]
    assert results == expected
    assert srv.stats.requests == 12
    assert srv.stats.batches >= 2  # work actually spread across workers


def test_continuous_first_token_done_resolves_promptly(model):
    """A request whose budget is exhausted at admission (max_tokens=1)
    must resolve without waiting for another request to arrive."""
    from qwen3_asr_tpu.serving.server import ContinuousTranscriptionServer
    from tests.test_api import sine

    with ContinuousTranscriptionServer(
        model, n_slots=2, max_duration=4.0, max_new_tokens=64,
        chunk_steps=4,
    ) as srv:
        res = srv.submit(sine(0.5, 440.0), max_tokens=1).result(timeout=120)
    assert isinstance(res.text, str)


def test_continuous_future_carries_ttft(model):
    """Admitted requests get ``future.ttft_s`` stamped at prefill
    completion (the load-study hook, tools/serving_bench.py --arrival
    poisson): positive and no larger than total completion latency."""
    import time as _time

    from qwen3_asr_tpu.serving.server import ContinuousTranscriptionServer
    from tests.test_api import sine

    with ContinuousTranscriptionServer(
        model, n_slots=2, max_duration=4.0, max_new_tokens=16,
        chunk_steps=4,
    ) as srv:
        t0 = _time.time()
        fut = srv.submit(sine(0.5, 440.0), max_tokens=4)
        fut.result(timeout=120)
        total = _time.time() - t0
    assert 0.0 < fut.ttft_s <= total + 0.05


def test_poisson_workload_smoke(model):
    """The open-loop Poisson load harness (tools/serving_bench.py) runs
    against the tiny continuous engine: all requests complete, TTFT is
    stamped for every one, and TTFT never exceeds completion latency."""
    import numpy as np

    from qwen3_asr_tpu.serving.server import ContinuousTranscriptionServer
    from tools.serving_bench import run_poisson

    with ContinuousTranscriptionServer(
        model, n_slots=2, max_duration=4.0, max_new_tokens=16,
        chunk_steps=4, warm=(0.5,),
    ) as srv:
        wall, ttft, lat = run_poisson(
            srv, clip_sec=0.5, n_requests=5, rate=20.0, budget=4, seed=3
        )
    assert len(ttft) == len(lat) == 5
    assert np.isfinite(ttft).all() and (ttft > 0).all()
    assert (ttft <= lat + 0.05).all()
    assert wall > 0


def test_cancelled_future_does_not_kill_worker(model):
    """A client cancelling its Future must not crash the worker thread."""
    from qwen3_asr_tpu.serving.server import TranscriptionServer
    from tests.test_api import sine

    with TranscriptionServer(model, max_batch_size=2) as srv:
        f1 = srv.submit(sine(0.5, 440.0), max_tokens=4)
        f1.cancel()
        f2 = srv.submit(sine(0.5, 330.0), max_tokens=4)
        res = f2.result(timeout=120)
    assert res.text is not None


def test_engine_page_size_validated():
    import pytest as _pytest

    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import RuntimeConfig
    from tests.test_api import TINY_CFG, StubTokenizer

    import jax.numpy as jnp

    m = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(),
        runtime=RuntimeConfig(frame_buckets=(800,), token_buckets=(16, 128)),
        dtype=jnp.float32,
    )
    with _pytest.raises(ValueError, match="page_size"):
        m.make_engine(
            n_slots=2, max_duration=4.0, max_new_tokens=128, paged=True,
            page_size=384,
        )


def test_warm_up_respects_admit_batch(model, monkeypatch):
    """A server with admit_batch < n_slots must never warm (or run) a
    prefill group wider than the cap — the padded full-width warm prefill
    is what OOMs a 48-slot bf16 server on 16 GiB HBM — while STILL
    compiling the full-width decode chunk via accumulated admissions."""
    from qwen3_asr_tpu.serving.server import ContinuousTranscriptionServer

    widths = []
    real = model.prefill_group

    def recording(samples_list, lang_names):
        widths.append(len(samples_list))
        return real(samples_list, lang_names)

    monkeypatch.setattr(model, "prefill_group", recording)
    with ContinuousTranscriptionServer(
        model, n_slots=4, admit_batch=2, max_duration=2.0,
        max_new_tokens=8, chunk_steps=4, warm=(0.5,),
    ) as srv:
        warm_widths = list(widths)
        futs = [srv.submit(sine(0.5, 300.0 + 40 * i), max_tokens=4)
                for i in range(4)]
        results = [f.result(timeout=120) for f in futs]
    assert max(warm_widths) == 2, warm_widths
    # Full-width chunk warm pass filled all 4 slots through capped groups.
    assert sum(warm_widths) >= 4 + 2  # 1+2 size cells, then 2+2 fill
    assert max(widths) <= 2, widths
    assert all(isinstance(r, TranscriptionResult) for r in results)


def test_warm_up_full_width_pass_skipped_when_uncapped(model):
    """admit_batch defaulting to n_slots keeps the original warm shape:
    one cell per group size, no extra fill pass."""
    from qwen3_asr_tpu.serving.server import ContinuousTranscriptionServer

    with ContinuousTranscriptionServer(
        model, n_slots=2, max_duration=2.0, max_new_tokens=8,
        chunk_steps=4, warm=(0.5,),
    ) as srv:
        fut = srv.submit(sine(0.5, 310.0), max_tokens=4)
        assert isinstance(fut.result(timeout=120), TranscriptionResult)


def test_admit_caps_group_at_admit_batch(model, monkeypatch):
    """The deferred-retry path hands _admit deferred + fresh requests in
    one list; _admit must cap the prefill group at admit_batch (not just
    at the free-slot count) or it compiles widths warm-up never saw."""
    import time
    from concurrent.futures import Future

    from qwen3_asr_tpu.serving.server import (
        ContinuousTranscriptionServer,
        _Request,
    )

    widths = []
    real = model.prefill_group

    def recording(samples_list, lang_names):
        widths.append(len(samples_list))
        return real(samples_list, lang_names)

    monkeypatch.setattr(model, "prefill_group", recording)
    with ContinuousTranscriptionServer(
        model, n_slots=4, admit_batch=2, max_duration=2.0,
        max_new_tokens=8, chunk_steps=4,
    ) as srv:
        reqs = [
            _Request(sine(0.5, 300.0 + 10 * i), {"max_tokens": 4},
                     Future(), time.time())
            for i in range(4)
        ]
        overflow = srv._admit(reqs)
        assert len(overflow) == 2           # capped at admit_batch=2
        assert widths and max(widths) <= 2  # prefill never wider
        # close() drains the two admitted slots via the shutdown path.
    for r in reqs[:2]:
        assert r.future.result(timeout=120).text is not None


def test_batch_long_clips_share_groups(model, monkeypatch):
    """Two long clips' chunks pool into SHARED device groups (one
    _run_pipeline_batch walk over all 4 chunks) with output identical to
    transcribing each long clip alone."""
    calls = []
    real = model._run_pipeline_batch

    def recording(batch, *a, **k):
        calls.append(len(batch))
        return real(batch, *a, **k)

    long1 = sine(5.0, 250.0)
    long2 = sine(5.0, 350.0)
    for c in (long1, long2):
        c[2 * 16000 : 2 * 16000 + 2000] = 0.0  # silence pocket
    refs = [model.transcribe(c, chunk_duration=2.0, max_tokens=4) for c in (long1, long2)]

    monkeypatch.setattr(model, "_run_pipeline_batch", recording)
    got = model.transcribe_batch([long1, long2], chunk_duration=2.0, max_tokens=4)
    assert [r.text for r in got] == [r.text for r in refs]
    assert [r.duration for r in got] == [5.0, 5.0]
    # All chunks from both clips ran as pooled groups: no group narrower
    # than the pool allows (6 chunks -> ceil(6/group_size) calls).
    assert len(calls) < 6 and max(calls) > 3, calls
