"""Fused cold-pipeline tests (RuntimeConfig.cold_fused_first_call).

On the axon backend every DISTINCT program pays a server-side compile
round at its first per-process execution, so the first transcription per
shape runs mel->encoder->prefill->fixed-length-scan-decode as ONE fused
program.  Pinned here: exact token identity with the standard
prefill + while-loop path (greedy and stochastic), the routing contract
(cold serves until the while program is warm, then hands over), and the
exclusion gates (int8 cache, speculative, oversized budgets).
"""

import jax.numpy as jnp
import pytest

from qwen3_asr_tpu.api import Qwen3ASR
from qwen3_asr_tpu.config import RuntimeConfig
from tests.test_api import TINY_CFG, StubTokenizer, sine


def _model(**kw):
    defaults = dict(
        frame_buckets=(800, 1600, 3200), token_buckets=(32, 64),
        progressive_decode="on",
    )
    defaults.update(kw)
    return Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(),
        runtime=RuntimeConfig(**defaults), dtype=jnp.float32,
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(max_tokens=8),
        dict(max_tokens=8, temperature=0.8, top_k=16, seed=7),
        dict(max_tokens=8, repetition_penalty=1.3),
    ],
)
def test_cold_pipeline_token_identity(kw):
    cold = _model()
    plain = _model(progressive_decode="off", cold_fused_first_call=False)
    clip = sine(1.2, 440.0)
    a = cold.transcribe(clip, **kw)
    assert "cold_pipeline" in cold.last_stats.stages, "cold program not used"
    b = plain.transcribe(clip, **kw)
    assert a.text == b.text


def test_cold_serves_until_while_ready_then_hands_over():
    model = _model()
    clip = sine(1.0, 330.0)
    r1 = model.transcribe(clip, max_tokens=6)
    assert "cold_pipeline" in model.last_stats.stages
    # Second call: still cold (while program not yet warm), spawns the
    # background warm (hits >= 2).
    r2 = model.transcribe(clip, max_tokens=6)
    assert "cold_pipeline" in model.last_stats.stages
    assert r2.text == r1.text
    model.wait_ready()
    r3 = model.transcribe(clip, max_tokens=6)
    assert "cold_pipeline" not in model.last_stats.stages
    assert "decode" in model.last_stats.stages
    assert r3.text == r1.text


def test_cold_excluded_for_int8_included_for_speculative():
    gen_int8 = _model(kv_cache_dtype="int8")._generator
    assert gen_int8.cold_plan(1, 96, 32, 0.0, 0, 1.2, 100) is None
    # Speculative greedy COLD-STARTS on the fused plain-scan program
    # (token-identical) under a spec-suffixed key, so the background
    # warm targets the spec while program (round-4 wiring).
    gen_spec = _model(speculative="ngram")._generator
    plan = gen_spec.cold_plan(1, 96, 32, 0.0, 0, 1.2, 100)
    assert plan is not None and plan[0][-3:] == ("spec", 3, 3)
    gen = _model()._generator
    assert gen.cold_plan(1, 96, 32, 0.0, 0, 1.2, 100) is not None
    # Budget beyond the fixed-scan cap -> standard path.
    assert gen.cold_plan(
        1, 96, gen.runtime.cold_scan_max_steps * 2, 0.0, 0, 1.2, 100
    ) is None


def test_cold_pipeline_serves_spec_then_hands_to_spec_while():
    """speculative="ngram" first calls ride the fused cold program
    (plain-scan decode — token-identical to spec greedy); once warm, the
    handoff lands on the SPEC while program, still token-identical."""
    model = _model(speculative="ngram")
    plain = _model(progressive_decode="off", cold_fused_first_call=False)
    gen = model._generator
    clip = sine(1.1, 440.0)
    kw = dict(max_tokens=8, repetition_penalty=1.2)
    ref = plain.transcribe(clip, **kw)

    r1 = model.transcribe(clip, **kw)
    assert "cold_pipeline" in model.last_stats.stages
    assert r1.text == ref.text
    r2 = model.transcribe(clip, **kw)          # hits >= 2: warm spawns
    assert "cold_pipeline" in model.last_stats.stages
    assert r2.text == ref.text
    assert model.wait_ready(timeout=120)
    with gen._compile_lock:
        assert any(
            isinstance(k, tuple) and "spec" in k for k in gen._compiled_keys
        )
    spy = {"n": 0}
    orig = gen._spec_decode
    gen._spec_decode = lambda *a, **k: (
        spy.__setitem__("n", spy["n"] + 1), orig(*a, **k)
    )[1]
    r3 = model.transcribe(clip, **kw)
    assert "cold_pipeline" not in model.last_stats.stages
    assert spy["n"] == 1 and r3.text == ref.text


def test_cold_pipeline_batch_identity():
    """Batched first call (single prefill group) through the cold program
    matches the standard batched path, including the batch-bucket pad."""
    cold = _model()
    plain = _model(progressive_decode="off", cold_fused_first_call=False)
    clips = [sine(1.0, 440.0), sine(2.0, 330.0), sine(0.5, 550.0)]
    a = cold.transcribe_batch(clips, max_tokens=6)
    assert "cold_pipeline" in cold.last_stats.stages
    b = plain.transcribe_batch(clips, max_tokens=6)
    assert [r.text for r in a] == [r.text for r in b]
