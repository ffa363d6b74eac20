"""Prefill run-length trimming (RuntimeConfig.prefill_run_granularity).

The prefill forward runs only a 64-aligned length covering the real
prompts while the KV cache keeps its 256-aligned bucket geometry.
Padded prompt rows never influence valid outputs (causal attention:
row i < plen attends only rows <= i, all real), so trimming must be
exactly output-invariant — pinned here against the untrimmed path.
"""

import jax.numpy as jnp
import pytest

from qwen3_asr_tpu.api import Qwen3ASR
from qwen3_asr_tpu.config import RuntimeConfig
from tests.test_api import TINY_CFG, StubTokenizer, sine


def _model(granularity):
    rt = RuntimeConfig(
        frame_buckets=(800, 1600, 3200), token_buckets=(32, 64),
        prefill_run_granularity=granularity,
    )
    return Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt, dtype=jnp.float32
    )


def test_plan_prefill_run():
    rt = RuntimeConfig()
    assert rt.plan_prefill_run(408, 512) == 448
    assert rt.plan_prefill_run(512, 512) == 512
    assert rt.plan_prefill_run(1, 256) == 64
    # Above 1024 the run stays 256-aligned.
    assert rt.plan_prefill_run(1100, 2048) == 1280
    # Disabled -> full bucket.
    assert RuntimeConfig(prefill_run_granularity=0).plan_prefill_run(
        408, 512
    ) == 512


@pytest.mark.parametrize("temperature", [0.0, 0.8])
def test_trimmed_prefill_matches_full(temperature):
    clips = [sine(1.0, 440.0), sine(2.3, 330.0)]
    trimmed = _model(64)
    full = _model(0)
    for clip in clips:
        a = trimmed.transcribe(
            clip, max_tokens=8, temperature=temperature, seed=5
        )
        b = full.transcribe(clip, max_tokens=8, temperature=temperature, seed=5)
        assert a.text == b.text

    batch_a = trimmed.transcribe_batch(clips, max_tokens=8)
    batch_b = full.transcribe_batch(clips, max_tokens=8)
    assert [r.text for r in batch_a] == [r.text for r in batch_b]


def test_trimmed_prefill_group_matches_direct():
    """Engine admissions prefill with trimmed runs too; token identity
    with the direct path holds."""
    from qwen3_asr_tpu.runtime.engine import SlotRequest

    model = _model(64)
    clips = [sine(1.0, 440.0), sine(0.5, 550.0)]
    direct = [model.transcribe(c, max_tokens=6) for c in clips]

    engine = model.make_engine(n_slots=4, max_duration=8.0, max_new_tokens=64)
    kv, logits, prompts = model.prefill_group(clips, ["English"] * 2)
    reqs = [
        SlotRequest(samples=c, prompt=p, max_new=6, meta=i)
        for i, (c, p) in enumerate(zip(clips, prompts))
    ]
    engine.admit(kv, logits, engine.free_slots(), reqs)
    results = {}
    for _ in range(40):
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == 2:
            break
    for i, r in enumerate(direct):
        assert model._finalize_output(results[i], "English")[0] == r.text
