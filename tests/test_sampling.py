"""Sampling op tests (reference semantics: generate.py:88-215)."""

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.ops.sampling import (
    RECENT_PAD_ID,
    apply_repetition_penalty,
    sample_logits,
    top_k_mask,
    top_p_mask,
)

KEY = jax.random.PRNGKey(0)
NO_RECENT = jnp.full((4,), RECENT_PAD_ID, jnp.int32)


def test_greedy_is_argmax():
    logits = jnp.asarray([0.1, 5.0, -2.0, 3.0])
    tok = sample_logits(KEY, logits, 0.0, 0, 1.0, 1.0, NO_RECENT)
    assert int(tok) == 1


def test_repetition_penalty_positive_divides():
    logits = jnp.asarray([2.0, 4.0, -2.0])
    out = apply_repetition_penalty(logits, jnp.asarray([1, 2]), 2.0)
    np.testing.assert_allclose(np.asarray(out), [2.0, 2.0, -4.0])


def test_repetition_penalty_sentinel_ignored():
    logits = jnp.asarray([2.0, 4.0])
    out = apply_repetition_penalty(logits, NO_RECENT, 2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits))


def test_repetition_penalty_disabled_at_one():
    logits = jnp.asarray([2.0, 4.0])
    out = apply_repetition_penalty(logits, jnp.asarray([0]), 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits))


def test_repetition_penalty_flips_greedy_choice():
    logits = jnp.asarray([3.0, 2.9, 0.0])
    tok = sample_logits(KEY, logits, 0.0, 0, 1.0, 1.5, jnp.asarray([0, RECENT_PAD_ID]))
    assert int(tok) == 1  # 3.0/1.5 = 2.0 < 2.9


def test_top_k_keeps_k_and_ties():
    logits = jnp.asarray([1.0, 3.0, 2.0, 3.0, -1.0])
    out = np.asarray(top_k_mask(logits, 2))
    # Threshold is the 2nd largest (3.0); both 3.0s survive, rest -> -inf.
    assert out[1] == 3.0 and out[3] == 3.0
    assert np.isinf(out[0]) and np.isinf(out[2]) and np.isinf(out[4])


def test_top_k_zero_disables():
    logits = jnp.asarray([1.0, 2.0])
    np.testing.assert_allclose(np.asarray(top_k_mask(logits, 0)), np.asarray(logits))


def test_top_p_keeps_nucleus():
    # probs ~ [0.643, 0.236, 0.087, 0.032]; with p=0.7 the rule keeps tokens
    # whose exclusive cumsum < 0.7 -> first two.
    logits = jnp.asarray([4.0, 3.0, 2.0, 1.0])
    out = np.asarray(top_p_mask(logits, 0.7))
    assert out[0] == 4.0 and out[1] == 3.0
    assert np.isinf(out[2]) and np.isinf(out[3])


def test_top_p_one_disables():
    logits = jnp.asarray([1.0, 2.0])
    np.testing.assert_allclose(np.asarray(top_p_mask(logits, 1.0)), np.asarray(logits))


def test_top_p_always_keeps_best_token():
    logits = jnp.asarray([10.0, 0.0, 0.0])
    out = np.asarray(top_p_mask(logits, 0.01))
    assert out[0] == 10.0


def test_stochastic_sampling_respects_filter():
    logits = jnp.asarray([5.0, 4.9, -100.0, -100.0])
    for i in range(10):
        tok = sample_logits(
            jax.random.PRNGKey(i), logits, 1.0, 2, 1.0, 1.0, NO_RECENT
        )
        assert int(tok) in (0, 1)


def test_temperature_zero_ignores_rng():
    logits = jnp.asarray([0.0, 1.0])
    a = sample_logits(jax.random.PRNGKey(1), logits, 0.0, 0, 1.0, 1.0, NO_RECENT)
    b = sample_logits(jax.random.PRNGKey(2), logits, 0.0, 0, 1.0, 1.0, NO_RECENT)
    assert int(a) == int(b) == 1


def test_sampling_traced_params_no_retrace():
    """One compiled program must serve all sampling configurations."""
    traces = 0

    @jax.jit
    def run(key, logits, t, k, p, pen, recent):
        nonlocal traces
        traces += 1
        return sample_logits(key, logits, t, k, p, pen, recent)

    logits = jnp.asarray([1.0, 2.0, 3.0])
    recent = jnp.full((4,), RECENT_PAD_ID, jnp.int32)
    for t, k, p, pen in [(0.0, 0, 1.0, 1.0), (0.7, 2, 0.9, 1.2), (1.0, 1, 0.5, 1.1)]:
        run(KEY, logits, jnp.float32(t), jnp.int32(k), jnp.float32(p), jnp.float32(pen), recent)
    assert traces == 1
