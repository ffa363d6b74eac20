"""int8 KV cache in the continuous-batching engine (flat + paged).

Round-3 roadmap item: the engine's persistent cache was bf16-only while
the monolithic Generator already supported ``kv_cache_dtype="int8"``.
Covers: the paged q8 Pallas kernel (interpret) against the bf16 kernel on
the dequantized pool, flat/paged int8 engines reproducing the direct
transcribe path's tokens on the tiny model (whose logit gaps dwarf the
~0.4% quantization noise), and a guard that the engine cache is actually
a {"q", "s"} pytree rather than a silent bf16 fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.api import Qwen3ASR
from qwen3_asr_tpu.config import RuntimeConfig
from qwen3_asr_tpu.ops.quant_kv import dequantize_kv, is_quantized_kv, quantize_kv
from qwen3_asr_tpu.runtime.engine import SlotRequest
from tests.test_api import TINY_CFG, StubTokenizer, sine

RT_INT8 = RuntimeConfig(
    frame_buckets=(800, 1600, 3200), token_buckets=(128, 256),
    kv_cache_dtype="int8",
)


@pytest.fixture(scope="module")
def model_int8():
    return Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=RT_INT8,
        dtype=jnp.float32,
    )


def test_paged_q8_kernel_interpret_matches_dequant_oracle():
    """decode_attention_paged_q8 (interpret) vs the bf16 paged kernel on
    the dequantized pool — identical math modulo bf16 rounding."""
    from qwen3_asr_tpu.ops.pallas.decode_attention_paged import (
        decode_attention_paged,
        decode_attention_paged_q8,
    )

    L, B, hq, hkv, D = 2, 3, 4, 2, 128
    PS, n_pages, maxp = 256, 7, 3
    rng = jax.random.PRNGKey(7)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (B, hq, D), jnp.float32)
    kall = jax.random.normal(
        jax.random.fold_in(rng, 1), (L, n_pages, hkv, PS, D), jnp.float32
    )
    vall = jax.random.normal(
        jax.random.fold_in(rng, 2), (L, n_pages, hkv, PS, D), jnp.float32
    )
    k_new = jax.random.normal(jax.random.fold_in(rng, 3), (B, hkv, 1, D))
    v_new = jax.random.normal(jax.random.fold_in(rng, 4), (B, hkv, 1, D))
    table = jnp.asarray([[1, 2, 0], [3, 4, 5], [6, 0, 0]], jnp.int32)
    plen = jnp.asarray([300, 256, 100], jnp.int32)
    dcount = jnp.asarray([37, 130, 0], jnp.int32)
    kq, vq = quantize_kv(kall), quantize_kv(vall)

    out = decode_attention_paged_q8(
        q, kq, vq, k_new, v_new, jnp.int32(1), table, plen, dcount,
        interpret=True,
    )
    ref = decode_attention_paged(
        q, dequantize_kv(kq, jnp.float32), dequantize_kv(vq, jnp.float32),
        k_new, v_new, jnp.int32(1), table, plen, dcount, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def _run_engine(model, engine, clips, max_new):
    kv, logits, prompts = model.prefill_group(clips, ["English"] * len(clips))
    reqs = [
        SlotRequest(samples=c, prompt=p, max_new=max_new, meta=i)
        for i, (c, p) in enumerate(zip(clips, prompts))
    ]
    rejected = engine.admit(kv, logits, engine.free_slots(), reqs)
    assert not rejected
    results = {}
    for _ in range(80):
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == len(clips):
            break
    assert len(results) == len(clips)
    return results


@pytest.mark.parametrize("paged", [False, True])
def test_engine_int8_matches_direct(model_int8, paged):
    """int8 engine (flat and paged) output == the direct transcribe path
    (itself running the int8 monolithic decode)."""
    clips = [sine(1.0, 440.0), sine(2.0, 330.0), sine(0.5, 550.0)]
    direct = [model_int8.transcribe(c, max_tokens=6) for c in clips]

    engine = model_int8.make_engine(
        n_slots=4, max_duration=8.0, max_new_tokens=128, paged=paged
    )
    # Guard: the persistent cache is actually quantized.
    assert is_quantized_kv(engine._keys) and is_quantized_kv(engine._values)
    results = _run_engine(model_int8, engine, clips, max_new=6)
    for i, r in enumerate(direct):
        text = model_int8._finalize_output(results[i], "English")[0]
        assert text == r.text, f"clip {i}: int8 engine (paged={paged}) != direct"


def test_engine_int8_mid_decode_admission(model_int8):
    """Heterogeneous-depth decode over the quantized paged pool: a second
    clip admitted mid-decode still matches its direct transcription."""
    clip_a, clip_b = sine(1.0, 440.0), sine(1.5, 260.0)
    direct_a = model_int8.transcribe(clip_a, max_tokens=12)
    direct_b = model_int8.transcribe(clip_b, max_tokens=5)

    engine = model_int8.make_engine(
        n_slots=4, max_duration=8.0, max_new_tokens=128, chunk_steps=4,
        paged=True,
    )
    kv, logits, prompts = model_int8.prefill_group([clip_a], ["English"])
    engine.admit(
        kv, logits, engine.free_slots(),
        [SlotRequest(samples=clip_a, prompt=prompts[0], max_new=12, meta="a")],
    )
    engine.step()
    assert engine.n_active() == 1

    kv, logits, prompts = model_int8.prefill_group([clip_b], ["English"])
    engine.admit(
        kv, logits, engine.free_slots(),
        [SlotRequest(samples=clip_b, prompt=prompts[0], max_new=5, meta="b")],
    )

    results = {}
    for _ in range(30):
        engine.step()
        for req, toks in engine.retire():
            results[req.meta] = toks
        if len(results) == 2:
            break
    assert model_int8._finalize_output(results["a"], "English")[0] == direct_a.text
    assert model_int8._finalize_output(results["b"], "English")[0] == direct_b.text


def test_engine_w8a8_matches_direct():
    """W8A8 model (int8 weights + act-quant prefill, forced on at tiny
    shapes) serving through the continuous engine == its own direct
    transcribe path: the engine's admission prefill (prefill_group ->
    fused prefill) stages the SAME int8-dot graph as the monolithic
    path, so tokens must be identical between the two."""
    rt = RuntimeConfig(
        frame_buckets=(800, 1600, 3200), token_buckets=(128, 256),
        quantization="int8", act_quant="int8", act_quant_min_rows=1,
    )
    m = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=rt, dtype=jnp.float32
    )
    clips = [sine(1.0, 440.0), sine(0.5, 550.0)]
    direct = [m.transcribe(c, max_tokens=6) for c in clips]

    engine = m.make_engine(
        n_slots=2, max_duration=8.0, max_new_tokens=128, paged=True
    )
    results = _run_engine(m, engine, clips, max_new=6)
    for i, r in enumerate(direct):
        text = m._finalize_output(results[i], "English")[0]
        assert text == r.text, f"clip {i}: w8a8 engine != direct"
