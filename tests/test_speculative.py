"""Speculative greedy decoding tests.

The contract is absolute: speculation is a pure execution strategy —
``RuntimeConfig(speculative="ngram")`` must produce the EXACT token
stream of the plain greedy loop for every request (drafts are accepted
only when they equal the model's own argmax).  Covers: the n-gram draft
op, the decoder's multi-token verify-split forward against sequential
single-token steps, the Pallas span writer (interpret mode), and
end-to-end token identity on the tiny model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_tpu.config import RuntimeConfig
from qwen3_asr_tpu.models.decoder import (
    decoder_forward,
    init_decoder_params,
)
from qwen3_asr_tpu.ops.speculative import ngram_draft
from qwen3_asr_tpu.runtime.generate import Generator
from tests.test_quant_kv import TINY, _tiny_features, _tiny_prompt


def _draft(history, count, n=2, gamma=3, tb=16):
    tokens = np.zeros((1, tb), np.int32)
    tokens[0, : len(history)] = history
    d, v = ngram_draft(
        jnp.asarray(tokens), jnp.asarray([count], jnp.int32), n=n, gamma=gamma
    )
    return np.asarray(d)[0], np.asarray(v)[0]


def test_ngram_draft_finds_continuation():
    # history ...5,6,7... and current tail (5,6): propose 7, then the
    # tokens after it.
    d, v = _draft([5, 6, 7, 5, 6], count=5)
    assert v.tolist() == [True, True, True]
    assert d.tolist() == [7, 5, 6]


def test_ngram_draft_most_recent_match_wins():
    d, v = _draft([1, 2, 9, 1, 2, 8, 1, 2], count=8)
    assert v.tolist() == [True, True, True]
    assert d.tolist() == [8, 1, 2]  # continuation of the j=3 match


def test_ngram_draft_no_match():
    d, v = _draft([1, 2, 3, 4], count=4)
    assert not v.any()


def test_ngram_draft_short_history():
    _, v = _draft([5, 5], count=2)  # needs n+1 tokens of history
    assert not v.any()


def test_ngram_draft_partial_validity():
    # Match found but fewer than gamma continuation tokens emitted yet.
    d, v = _draft([3, 4, 9, 3, 4], count=5, gamma=3)
    # j=0 match; continuations at idx 2 (=9), idx 3 (=3), idx 4 (=4) —
    # all emitted (count=5), so fully valid here...
    assert v.tolist() == [True, True, True]
    # ...but with count=4 (tail at 3,4 ends at idx 3): context is (4,9)?
    # No — recompute: history [3,4,9,3], tail (9,3) has no earlier match.
    _, v2 = _draft([3, 4, 9, 3], count=4)
    assert not v2.any()


def test_ngram_draft_multi_order_prefers_longer_context():
    """n=3 tries the trigram first: its match wins over the (different,
    more recent) bigram continuation."""
    hist = [1, 2, 3, 7, 9, 2, 3, 8, 1, 2, 3]
    # trigram tail (1,2,3) matched at j=0 -> continuation 7,9,2;
    # bigram tail (2,3) most recently at j=5 -> continuation 8,1,2.
    d, v = _draft(hist, count=11, n=3)
    assert v.tolist() == [True, True, True]
    assert d.tolist() == [7, 9, 2]
    # Single-order n=2 on the same stream picks the bigram continuation.
    d2, v2 = _draft(hist, count=11, n=2)
    assert v2.tolist() == [True, True, True]
    assert d2.tolist() == [8, 1, 2]


def test_ngram_draft_multi_order_falls_back():
    """No trigram match: order 2 serves the draft."""
    hist = [5, 6, 7, 0, 5, 6]
    d, v = _draft(hist, count=6, n=3)
    assert v.tolist() == [True, True, True]
    assert d.tolist() == [7, 0, 5]


def test_verify_split_matches_sequential_steps():
    """decoder_forward with T=4 + decode_ctx (the verify pass) must equal
    four sequential T=1 decode steps feeding the same tokens — same
    hidden outputs, same cache rows."""
    B, Pb, tb = 2, 8, 8
    S = Pb + tb
    cfg = TINY
    params = init_decoder_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(7)
    shape = (cfg.num_hidden_layers, B, cfg.num_key_value_heads, S, cfg.head_dim)
    keys0 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    values0 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    plen = jnp.asarray([5, 3], jnp.int32)
    counts = jnp.asarray([2, 4], jnp.int32)  # heterogeneous depths
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 4)), jnp.int32)

    from qwen3_asr_tpu.models.decoder import embed_tokens

    # Sequential single-token steps.
    kv = (keys0, values0)
    hs = []
    for t in range(4):
        pos = (plen + counts - 1 + t)[:, None]
        ws = Pb + counts - 1 + t
        h, kv = decoder_forward(
            params, cfg, embed_tokens(params, ids[:, t])[:, None, :],
            pos, kv, write_slots=ws, uniform_write=False,
            decode_ctx=(plen, ws, Pb),
        )
        hs.append(h[:, 0])
    seq_hidden = jnp.stack(hs, axis=1)  # (B, 4, H)

    # One verify-split pass.
    ws0 = Pb + counts - 1
    pos = (plen + counts - 1)[:, None] + jnp.arange(4)[None, :]
    ver_hidden, kv_ver = decoder_forward(
        params, cfg, embed_tokens(params, ids), pos, (keys0, values0),
        write_slots=ws0, uniform_write=False,
        decode_ctx=(plen, ws0, Pb),
    )
    np.testing.assert_allclose(
        np.asarray(ver_hidden), np.asarray(seq_hidden), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(kv_ver[0]), np.asarray(kv[0]), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(kv_ver[1]), np.asarray(kv[1]), atol=1e-5, rtol=1e-5
    )


def test_span_writer_interpret_matches_scatter():
    from qwen3_asr_tpu.ops.pallas.kv_write import kv_write_span_batch

    L, B, H, S, D, T = 2, 3, 2, 256, 128, 4
    rng = np.random.default_rng(3)
    cache = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.float32)
    rows = jnp.asarray(rng.standard_normal((L, B, H, T, D)), jnp.float32)
    # Include a slot whose span crosses a tile boundary and one at the
    # cache edge (overflow rows must be dropped).
    slots = jnp.asarray([5, 130, S - 2], jnp.int32)

    got = kv_write_span_batch(cache, rows, slots, interpret=True)

    t_idx = np.asarray(slots)[:, None] + np.arange(T)[None, :]
    want = np.asarray(cache).copy()
    for b in range(B):
        for t in range(T):
            if t_idx[b, t] < S:
                want[:, b, :, t_idx[b, t], :] = np.asarray(rows)[:, b, :, t, :]
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("rep_pen", [1.0, 1.2])
def test_spec_decode_matches_plain_greedy(rep_pen):
    """End-to-end: speculative="ngram" emits the identical token stream."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    feats = _tiny_features(4)
    ids = _tiny_prompt(4)
    outs = {}
    for spec in ("off", "ngram"):
        rt = RuntimeConfig(token_buckets=(32, 64), speculative=spec)
        gen = Generator(params, TINY, rt, eos_ids=frozenset({500}))
        outs[spec] = gen.generate(
            feats, 4, ids, max_tokens=24, repetition_penalty=rep_pen,
        )
    assert outs["off"] == outs["ngram"]


def test_spec_decode_batched_matches_plain():
    """Batched lanes with different budgets finish token-identically."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(2), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, n_audio = 3, 4
    feats = jnp.asarray(
        np.concatenate(
            [np.asarray(_tiny_features(n_audio, seed=s)) for s in (1, 2, 3)]
        )
    )
    ids = [_tiny_prompt(n_audio)] * B
    budgets = [4, 17, 24]
    outs = {}
    for spec in ("off", "ngram"):
        rt = RuntimeConfig(token_buckets=(32, 64), speculative=spec)
        gen = Generator(params, TINY, rt, eos_ids=frozenset({500}))
        outs[spec] = gen.generate_batch(
            feats, [n_audio] * B, ids, max_tokens=budgets,
            repetition_penalty=1.1,
        )
    assert outs["off"] == outs["ngram"]
    for b, toks in enumerate(outs["ngram"]):
        assert len(toks) <= budgets[b]


def test_spec_decode_accepts_drafts_on_repetitive_stream():
    """On a looping output the speculative loop must finish in fewer
    forwards than tokens (i.e. drafts are genuinely accepted)."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(token_buckets=(64, 128), speculative="ngram")
    gen = Generator(params, TINY, rt, eos_ids=frozenset({500}))

    iters = {}
    orig = gen._spec_decode

    def spy(*a, **k):
        out = orig(*a, **k)
        iters["n"] = int(np.asarray(out[2]))
        iters["tokens"] = int(np.asarray(out[1]).sum())
        return out

    gen._spec_decode = spy
    toks = gen.generate(
        _tiny_features(4), 4, _tiny_prompt(4), max_tokens=48,
        repetition_penalty=1.0,   # un-penalized tiny models loop hard
    )
    assert iters["tokens"] == len(toks)
    # +1 for the prefill-sampled first token: iterations cover the rest.
    assert iters["n"] < iters["tokens"] - 1, (
        f"no drafts accepted: {iters['tokens']} tokens in {iters['n']} "
        "verify forwards"
    )


def test_spec_ignored_for_sampled_requests():
    """temperature > 0 must take the standard loop (spec is greedy-only)."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    outs = {}
    for spec in ("off", "ngram"):
        rt = RuntimeConfig(token_buckets=(32, 64), speculative=spec)
        gen = Generator(params, TINY, rt, eos_ids=frozenset({500}))
        outs[spec] = gen.generate(
            _tiny_features(4), 4, _tiny_prompt(4), max_tokens=12,
            temperature=0.8, seed=9, top_k=8,
        )
    assert outs["off"] == outs["ngram"]


def test_spec_bridge_matches_while_program():
    """progressive_decode="on" + speculative="ngram": the spec scan
    bridge serves the first calls token-identically to the spec while
    program (and to plain greedy), including mid-chunk finishes and
    budget exhaustion with chunk overshoot."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    feats = _tiny_features(4)
    ids = _tiny_prompt(4)

    rt_plain = RuntimeConfig(token_buckets=(32, 64), progressive_decode="off")
    g_plain = Generator(params, TINY, rt_plain, eos_ids=frozenset({500}))

    rt_on = RuntimeConfig(
        token_buckets=(32, 64), speculative="ngram",
        progressive_decode="on", bridge_steps=3,
    )
    g_on = Generator(params, TINY, rt_on, eos_ids=frozenset({500}))
    calls = {"start": 0, "resume": 0, "while": 0}
    orig_start, orig_resume = g_on._spec_start, g_on._spec_resume
    orig_while = g_on._spec_decode
    g_on._spec_start = lambda *a, **k: (
        calls.__setitem__("start", calls["start"] + 1), orig_start(*a, **k)
    )[1]
    g_on._spec_resume = lambda *a, **k: (
        calls.__setitem__("resume", calls["resume"] + 1), orig_resume(*a, **k)
    )[1]
    g_on._spec_decode = lambda *a, **k: (
        calls.__setitem__("while", calls["while"] + 1), orig_while(*a, **k)
    )[1]

    for kw in (
        dict(max_tokens=24, repetition_penalty=1.2),
        dict(max_tokens=5),                       # budget < one chunk span
        dict(max_tokens=30),
    ):
        a = g_plain.generate(feats, 4, ids, **kw)
        b = g_on.generate(feats, 4, ids, **kw)
        assert a == b, (kw, a, b)
    # The first two requests definitely rode the bridge (the warm spawn
    # needs hits >= 2, so nothing could have been compiled before call
    # 2 finished its first chunk); later calls may race the background
    # warm either way.
    assert calls["start"] >= 2

    # Force the spec while program warm; the next call must route direct.
    assert g_on.wait_background_compiles(timeout=120)
    with g_on._compile_lock:
        assert any(
            isinstance(k, tuple) and "spec" in k for k in g_on._compiled_keys
        )
    # (the warm thread's dummy max_new=1 run also goes through the spied
    # _spec_decode — count the DELTA from the foreground call only)
    warm_calls = calls["while"]
    c = g_on.generate(feats, 4, ids, max_tokens=24, repetition_penalty=1.2)
    assert c == g_plain.generate(feats, 4, ids, max_tokens=24,
                                 repetition_penalty=1.2)
    assert calls["while"] == warm_calls + 1


def test_spec_bridge_batched_heterogeneous_budgets():
    """Bridged speculative batch: lanes finishing at different chunk
    offsets keep their exact plain-greedy outputs."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(2), dtype=jnp.float32)
    B, n_audio = 3, 4
    feats = jnp.concatenate(
        [_tiny_features(n_audio, seed=s) for s in (1, 2, 3)], axis=0
    )
    ids = [_tiny_prompt(n_audio)] * B
    budgets = [4, 17, 24]
    rt_off = RuntimeConfig(token_buckets=(32,), progressive_decode="off")
    rt_on = RuntimeConfig(
        token_buckets=(32,), speculative="ngram",
        progressive_decode="on", bridge_steps=2,
    )
    a = Generator(params, TINY, rt_off, eos_ids=frozenset({500})).generate_batch(
        feats, [n_audio] * B, ids, max_tokens=budgets, repetition_penalty=1.1
    )
    b = Generator(params, TINY, rt_on, eos_ids=frozenset({500})).generate_batch(
        feats, [n_audio] * B, ids, max_tokens=budgets, repetition_penalty=1.1
    )
    assert a == b


def test_spec_composes_with_int8_weights():
    """int8 WEIGHT quantization + speculative decode: the verify forward
    dispatches through qlinear, so the pairing must emit the identical
    stream of the plain int8 greedy loop (int8 weights change the
    argmaxes vs bf16 — the identity contract is int8-vs-int8)."""
    from qwen3_asr_tpu.ops.quant import quantize_decoder_params

    params = quantize_decoder_params(
        init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    )
    feats = _tiny_features(4)
    ids = _tiny_prompt(4)
    outs = {}
    for spec in ("off", "ngram"):
        rt = RuntimeConfig(token_buckets=(32, 64), speculative=spec)
        gen = Generator(params, TINY, rt, eos_ids=frozenset({500}))
        outs[spec] = gen.generate(
            feats, 4, ids, max_tokens=24, repetition_penalty=1.1
        )
    assert outs["off"] == outs["ngram"]


def test_spec_auto_default_gates_on_batch():
    """speculative="auto" (the default): greedy requests up to the
    measured-profitable batch ceiling (8 — spec wins even near the
    zero-acceptance floor, tools/spec_bench.py sweep) route speculative;
    larger batches and sampled requests take the plain loop."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    gen = Generator(params, TINY, RuntimeConfig(), eos_ids=frozenset({500}))
    assert gen.runtime.speculative == "auto"
    assert gen._plan_spec("greedy", 1) == (3, 3)
    assert gen._plan_spec("greedy", 8) == (3, 3)
    assert gen._plan_spec("greedy", 9) is None
    assert gen._plan_spec("sample", 1) is None
    gen.runtime.spec_auto_max_batch = 4
    assert gen._plan_spec("greedy", 4) == (3, 3)
    assert gen._plan_spec("greedy", 5) is None
    gen.runtime.speculative = "ngram"
    assert gen._plan_spec("greedy", 64) == (3, 3)
    gen.runtime.speculative = "off"
    assert gen._plan_spec("greedy", 1) is None

    # End-to-end: the auto default at B=1 emits the plain-greedy stream
    # through the spec path.
    rt_off = RuntimeConfig(token_buckets=(32, 64), speculative="off")
    g_auto = Generator(
        params, TINY, RuntimeConfig(token_buckets=(32, 64)),
        eos_ids=frozenset({500}),
    )
    g_off = Generator(params, TINY, rt_off, eos_ids=frozenset({500}))
    spy = {"n": 0}
    orig = g_auto._spec_decode
    g_auto._spec_decode = lambda *a, **k: (
        spy.__setitem__("n", spy["n"] + 1), orig(*a, **k)
    )[1]
    feats, ids = _tiny_features(4), _tiny_prompt(4)
    a = g_auto.generate(feats, 4, ids, max_tokens=16, repetition_penalty=1.1)
    b = g_off.generate(feats, 4, ids, max_tokens=16, repetition_penalty=1.1)
    assert a == b and spy["n"] == 1


def test_spec_forwards_surfaced_per_request():
    """Realized acceptance is observable: the generator records verify
    forwards per call and the API copies them into RequestStats."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(token_buckets=(64, 128), speculative="ngram")
    gen = Generator(params, TINY, rt, eos_ids=frozenset({500}))
    toks = gen.generate(
        _tiny_features(4), 4, _tiny_prompt(4), max_tokens=48,
        repetition_penalty=1.0,
    )
    assert gen.last_spec_forwards > 0
    # Looping tiny-model output accepts drafts: fewer forwards than tokens.
    assert gen.last_spec_forwards < len(toks)

    # Plain loop resets the counter.
    gen_off = Generator(
        params, TINY,
        RuntimeConfig(token_buckets=(64, 128), speculative="off"),
        eos_ids=frozenset({500}),
    )
    gen_off.generate(_tiny_features(4), 4, _tiny_prompt(4), max_tokens=8)
    assert gen_off.last_spec_forwards == 0

    # API level: RequestStats carries the count and the derived
    # tokens-per-forward shows up in as_dict.
    from qwen3_asr_tpu.api import Qwen3ASR
    from tests.test_api import TINY_CFG, StubTokenizer, sine

    model = Qwen3ASR.from_random(
        TINY_CFG, tokenizer=StubTokenizer(),
        runtime=RuntimeConfig(
            frame_buckets=(800, 1600), token_buckets=(32, 64),
            speculative="ngram", progressive_decode="off",
            cold_fused_first_call=False,
        ),
        dtype=jnp.float32,
    )
    model.transcribe(sine(1.0), max_tokens=24)
    stats = model.last_stats
    assert stats.n_spec_forwards > 0
    d = stats.as_dict()
    assert d["n_spec_forwards"] == stats.n_spec_forwards
    assert d["spec_tokens_per_forward"] >= 1.0


# ---------------------------------------------------------------------------
# Speculative SAMPLING (rejection-sampling verification, opt-in)
# ---------------------------------------------------------------------------


def _plain_sample_dist(logits, recent, penalty, temperature, top_k, top_p):
    """Numpy reference: the exact distribution sample_logits draws from."""
    logits = np.asarray(logits, np.float64).copy()
    hit = np.zeros(logits.shape, bool)
    for t in np.asarray(recent).ravel():
        if 0 <= t < logits.shape[0]:
            hit[t] = True
    if penalty != 1.0:
        pen = np.where(logits > 0, logits / penalty, logits * penalty)
        logits = np.where(hit, pen, logits)
    scaled = logits / max(temperature, 1e-6)
    keep = np.ones_like(scaled, bool)
    if top_k > 0:
        kth = np.sort(scaled)[::-1][min(top_k, len(scaled)) - 1]
        keep &= scaled >= kth
    if top_p < 1.0:
        probs = np.exp(scaled - scaled.max())
        probs /= probs.sum()
        order = np.argsort(-probs, kind="stable")
        exclusive = np.cumsum(probs[order]) - probs[order]
        keep_sorted = exclusive < top_p
        keep_p = np.zeros_like(keep)
        keep_p[order] = keep_sorted
        keep &= keep_p
    masked = np.where(keep, scaled, -np.inf)
    p = np.exp(masked - masked.max())
    return p / p.sum()


@pytest.mark.parametrize(
    "draft_case", ["in_nucleus", "filtered_out", "no_proposal"]
)
def test_spec_verify_sample_distribution(draft_case):
    """The emitted token of spec_verify_sample is an exact draw from the
    plain sampler's distribution, for any point-mass draft — including a
    draft the filters removed (always rejected) and no draft at all."""
    from qwen3_asr_tpu.ops.sampling import RECENT_PAD_ID, spec_verify_sample

    vocab = 16
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal(vocab) * 2.0, jnp.float32)
    recent = jnp.asarray([1, 2, RECENT_PAD_ID, RECENT_PAD_ID], jnp.int32)
    penalty, temperature, top_k, top_p = 1.3, 0.8, 6, 0.9

    p = _plain_sample_dist(logits, [1, 2], penalty, temperature, top_k, top_p)
    if draft_case == "in_nucleus":
        draft = int(np.argmax(p))          # certainly kept by the filters
    elif draft_case == "filtered_out":
        draft = int(np.argmin(p + (p > 0)))  # a zero-mass (filtered) token
        assert p[draft] == 0.0
    else:
        draft = -1

    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    accept, token = jax.jit(
        jax.vmap(
            lambda k: spec_verify_sample(
                k, logits, draft, temperature, top_k, top_p, penalty, recent
            )
        )
    )(keys)
    accept, token = np.asarray(accept), np.asarray(token)

    emp = np.bincount(token, minlength=vocab) / n
    np.testing.assert_allclose(emp, p, atol=0.02)
    if draft_case == "in_nucleus":
        # Acceptance rate == p(draft).
        np.testing.assert_allclose(accept.mean(), p[draft], atol=0.02)
        # Accepted positions emit the draft; rejected ones never do
        # (residual excludes it).
        assert (token[accept] == draft).all()
        assert (token[~accept] != draft).all()
    else:
        assert not accept.any()


def test_spec_verify_sample_chi_square():
    """Formal goodness-of-fit: chi-squared test of the spec-verify
    emitted-token counts against the EXACT plain-sampler distribution
    (the per-token distribution-identity claim of
    ops/sampling.py:spec_verify_sample, pinned by CI with a p-value
    rather than a tolerance).  20k draws, alpha = 1e-3 — a correct
    sampler fails with probability 0.1%; a biased accept/residual rule
    (e.g. forgetting to remove the draft's mass from the residual)
    shifts the statistic by orders of magnitude."""
    from scipy.stats import chi2

    from qwen3_asr_tpu.ops.sampling import RECENT_PAD_ID, spec_verify_sample

    vocab = 16
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.standard_normal(vocab) * 2.0, jnp.float32)
    recent = jnp.asarray([3, 5, RECENT_PAD_ID, RECENT_PAD_ID], jnp.int32)
    penalty, temperature, top_k, top_p = 1.2, 0.9, 8, 0.92
    p = _plain_sample_dist(logits, [3, 5], penalty, temperature, top_k, top_p)

    # Draft = the second-most-likely surviving token: accepted often but
    # not always, so both the accept and the residual branch contribute.
    draft = int(np.argsort(-p)[1])
    assert 0 < p[draft] < 1

    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(11), n)
    _, token = jax.jit(
        jax.vmap(
            lambda k: spec_verify_sample(
                k, logits, draft, temperature, top_k, top_p, penalty, recent
            )
        )
    )(keys)
    counts = np.bincount(np.asarray(token), minlength=vocab).astype(np.float64)

    support = p > 0
    assert counts[~support].sum() == 0, "token with zero plain-sampler mass emitted"
    expected = n * p[support]
    stat = ((counts[support] - expected) ** 2 / expected).sum()
    dof = int(support.sum()) - 1
    threshold = chi2.ppf(1 - 1e-3, dof)
    assert stat < threshold, f"chi2 {stat:.1f} >= {threshold:.1f} (dof {dof})"


def test_spec_verify_sample_greedy_temperature_zero():
    """temperature == 0 inside the sampled program reduces to the greedy
    accept rule (argmax check)."""
    from qwen3_asr_tpu.ops.sampling import RECENT_PAD_ID, spec_verify_sample

    logits = jnp.asarray([0.1, 3.0, -1.0, 0.5], jnp.float32)
    recent = jnp.full((4,), RECENT_PAD_ID, jnp.int32)
    key = jax.random.PRNGKey(0)
    acc, tok = spec_verify_sample(key, logits, 1, 0.0, 0, 1.0, 1.0, recent)
    assert bool(acc) and int(tok) == 1
    acc, tok = spec_verify_sample(key, logits, 2, 0.0, 0, 1.0, 1.0, recent)
    assert not bool(acc) and int(tok) == 1


def test_spec_sampling_topk1_matches_plain_exactly():
    """top_k=1 makes sampling deterministic, so the spec-sampled stream
    must equal the plain sampled stream token for token."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    feats, ids = _tiny_features(4), _tiny_prompt(4)
    outs = {}
    for spec_sampling in (False, True):
        rt = RuntimeConfig(
            token_buckets=(32, 64), spec_sampling=spec_sampling
        )
        gen = Generator(params, TINY, rt, eos_ids=frozenset({500}))
        outs[spec_sampling] = gen.generate(
            feats, 4, ids, max_tokens=20, temperature=0.7, top_k=1, seed=5,
        )
    assert outs[False] == outs[True]


def test_spec_sampling_uses_spec_program_and_emits_valid_tokens():
    params = init_decoder_params(TINY, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(token_buckets=(32, 64), spec_sampling=True)
    gen = Generator(params, TINY, rt, eos_ids=frozenset({500}))
    called = {}
    orig = gen._spec_decode

    def spy(*a, **k):
        called["mode"] = k.get("mode") or a[12]
        return orig(*a, **k)

    gen._spec_decode = spy
    toks = gen.generate(
        _tiny_features(4), 4, _tiny_prompt(4), max_tokens=16,
        temperature=0.8, top_k=8, top_p=0.95, repetition_penalty=1.1,
        seed=3,
    )
    assert called.get("mode") == "sample"
    assert 0 < len(toks) <= 16
    assert all(0 <= t < TINY.vocab_size for t in toks)


def test_spec_sampling_preserves_marginal_distribution():
    """Across many seeds and lanes, the spec-sampled second token's
    empirical distribution matches the plain sampler's (the rejection-
    sampling guarantee, end to end through the real decode programs).

    Self-calibrating power: the acceptance threshold is set from a NULL
    comparison (two disjoint halves of the plain sampler's own draws),
    so the test cannot be fooled by its own sampling noise floor.
    Deterministic given the fixed seed list."""
    params = init_decoder_params(TINY, jax.random.PRNGKey(1), dtype=jnp.float32)
    B, n_audio = 16, 4
    feats = jnp.concatenate([_tiny_features(n_audio)] * B)
    ids = [_tiny_prompt(n_audio)] * B
    gens = {}
    for spec_sampling in (False, True):
        rt = RuntimeConfig(
            token_buckets=(32, 64), spec_sampling=spec_sampling,
            spec_auto_max_batch=16,
        )
        gens[spec_sampling] = Generator(
            params, TINY, rt, eos_ids=frozenset({500})
        )
    n_seeds = 30
    draws = {False: [], True: []}
    for spec_sampling, gen in gens.items():
        for seed in range(n_seeds):
            outs = gen.generate_batch(
                feats, [n_audio] * B, ids, max_tokens=2, temperature=0.6,
                top_k=8, seed=seed,
            )
            draws[spec_sampling] += [o[1] for o in outs if len(o) >= 2]

    def tv(a, b):
        support = set(a) | set(b)
        na, nb = len(a), len(b)
        return 0.5 * sum(
            abs(a.count(t) / na - b.count(t) / nb) for t in support
        )

    half = len(draws[False]) // 2
    null_tv = tv(draws[False][:half], draws[False][half:])
    got_tv = tv(draws[False], draws[True])
    # The null halves have N/2 samples each, so their TV overestimates
    # the full-N noise floor by ~sqrt(2); 2x the null is generous
    # headroom for a correct sampler and far below what a biased
    # residual/accept rule produces.
    assert got_tv < max(0.1, 2.0 * null_tv), (
        f"spec-vs-plain TV {got_tv:.3f} vs null {null_tv:.3f}"
    )
