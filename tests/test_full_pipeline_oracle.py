"""End-to-end fidelity: JAX stack vs the independent numpy pipeline oracle.

``tests/numpy_pipeline_oracle.py`` reimplements the REFERENCE semantics
(strip-not-mask encoder, full-context no-cache decoder, Python greedy loop)
in pure numpy.  Token-for-token agreement with ``Qwen3ASR.transcribe``
checks the whole cross-module wiring — mel normalization, conv/PE geometry,
mask-vs-strip equivalence, injection offsets, RoPE positions, KV-cache
correctness, penalty ordering — against code that shares nothing with the
stack under test.  This is the no-checkpoint stand-in for the BASELINE.md
token-identity target (real-weights parity: tools/verify_parity.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.api import Qwen3ASR
from qwen3_asr_tpu.audio.mel import log_mel_spectrogram_np
from qwen3_asr_tpu.tokenizer import EOS_TOKEN_IDS
from tests.numpy_pipeline_oracle import encoder_np, greedy_np
from tests.test_api import RT, TINY_CFG, StubTokenizer, sine


@pytest.fixture(scope="module")
def model():
    return Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(), runtime=RT, dtype=jnp.float32
    )


def np_params(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), tree)


def run_oracle(model, samples, max_tokens, **kw):
    enc_p = np_params(model._encoder_params)
    dec_p = np_params(model._decoder_params)
    cfg = model._config
    mel = log_mel_spectrogram_np(samples.astype(np.float32))
    feats = encoder_np(enc_p, cfg.audio_encoder, mel)
    prompt = model._tokenizer.build_prompt(feats.shape[0], "English")
    return greedy_np(
        dec_p, cfg.text_decoder, prompt, feats, EOS_TOKEN_IDS, max_tokens, **kw
    )


@pytest.mark.parametrize(
    "duration,freq",
    [(0.45, 440.0), (1.3, 330.0)],  # partial chunk + multi-chunk clips
)
def test_transcribe_matches_numpy_oracle(model, duration, freq):
    clip = sine(duration, freq)
    res = model.transcribe(clip, max_tokens=8, repetition_penalty=1.0)
    oracle = run_oracle(model, clip, max_tokens=8)
    got = [int(t) % 512 for t in oracle]
    assert res.text == model._decode_output(got), (
        f"JAX stack diverged from numpy reference oracle: {res.text!r} vs "
        f"{model._decode_output(got)!r}"
    )


def test_transcribe_matches_oracle_with_penalty(model):
    """Repetition penalty ordering (skip first token, divide/multiply split,
    generated-tokens-only window) must match the reference semantics."""
    clip = sine(0.8, 520.0)
    res = model.transcribe(
        clip, max_tokens=10, repetition_penalty=1.5, repetition_context_size=4
    )
    oracle = run_oracle(
        model, clip, max_tokens=10,
        repetition_penalty=1.5, repetition_context_size=4,
    )
    got = [int(t) % 512 for t in oracle]
    assert res.text == model._decode_output(got)


def test_large_repetition_context_matches_oracle(model):
    """A repetition_context_size beyond the default 128-slot compiled
    window must still match the reference semantics token-for-token
    (VERDICT r2 weak #4: the old clamp silently forgot tokens older than
    128 steps).  150+ generated tokens with context 300 exercises the
    256-slot bucket path."""
    clip = sine(0.8, 520.0)
    res = model.transcribe(
        clip, max_tokens=150, repetition_penalty=1.3,
        repetition_context_size=300,
    )
    oracle = run_oracle(
        model, clip, max_tokens=150,
        repetition_penalty=1.3, repetition_context_size=300,
    )
    got = [int(t) % 512 for t in oracle]
    assert res.text == model._decode_output(got)


def test_oracle_is_reference_shaped(model):
    """The oracle's token count follows the reference's strip semantics."""
    clip = sine(1.3)
    mel = log_mel_spectrogram_np(clip.astype(np.float32))
    feats = encoder_np(
        np_params(model._encoder_params), model._config.audio_encoder, mel
    )
    # 130 frames -> 100 + 30: 13 + conv_len(30)=4 -> 17 tokens.
    assert mel.shape[1] == 130
    assert feats.shape[0] == 17


def test_batched_and_engine_paths_match_oracle(model):
    """Every serving-side execution path — batched monolithic decode AND
    the continuous engine — reproduces the numpy reference oracle token
    stream for each clip (heterogeneous lengths in one batch)."""
    from qwen3_asr_tpu.serving.server import ContinuousTranscriptionServer

    clips = [sine(0.45, 440.0), sine(1.3, 330.0), sine(0.8, 520.0)]
    expected = [
        model._decode_output(
            [int(t) % 512 for t in run_oracle(model, c, max_tokens=6)]
        )
        for c in clips
    ]

    batched = model.transcribe_batch(
        clips, max_tokens=6, repetition_penalty=1.0
    )
    assert [r.text for r in batched] == expected

    with ContinuousTranscriptionServer(
        model, n_slots=4, max_duration=4.0, max_new_tokens=64, chunk_steps=2,
    ) as srv:
        futs = [
            srv.submit(c, max_tokens=6, repetition_penalty=1.0) for c in clips
        ]
        engine_texts = [f.result(timeout=300).text for f in futs]
    assert engine_texts == expected
