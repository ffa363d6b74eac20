"""On-device sampling: repetition penalty, top-k, top-p, categorical/greedy.

Semantics parity with /root/reference/src/qwen3_asr_mlx/generate.py:88-215:
  * repetition penalty divides positive / multiplies negative logits for
    tokens present in the recent window (and is applied even on the greedy
    path — the reference defaults to penalty 1.2 with temperature 0);
  * top-k thresholds at the k-th largest logit, keeping ties;
  * top-p drops tokens where (cumsum - own prob) >= p over the descending
    sort;
  * temperature 0 = argmax, otherwise categorical over filtered logits.

TPU-first difference: everything here is traceable and runs *inside* the
jitted decode loop, so sampling costs zero host<->device round trips — the
reference pays two per token (generate.py:297, 204).  The recent-token
window arrives as a fixed-size int32 vector where unused slots hold an
out-of-vocabulary sentinel (scattered with mode='drop').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Sentinel for empty slots of the recent-tokens window (any id >= vocab).
RECENT_PAD_ID = 2**30


def apply_repetition_penalty(
    logits: jax.Array,
    recent_tokens: jax.Array,
    penalty: jax.Array | float,
) -> jax.Array:
    """Penalize tokens present in ``recent_tokens`` (sentinel slots ignored)."""
    vocab = logits.shape[-1]
    hit = (
        jnp.zeros((vocab,), dtype=jnp.bool_)
        .at[recent_tokens]
        .set(True, mode="drop")
    )
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    out = jnp.where(hit, penalized, logits)
    return jnp.where(jnp.asarray(penalty) == 1.0, logits, out)


def top_k_mask(logits: jax.Array, k: jax.Array | int) -> jax.Array:
    """Keep logits >= the k-th largest (ties kept); k <= 0 disables."""
    k = jnp.asarray(k, dtype=jnp.int32)
    sorted_desc = jnp.sort(logits)[::-1]
    idx = jnp.clip(k - 1, 0, logits.shape[-1] - 1)
    threshold = jax.lax.dynamic_index_in_dim(sorted_desc, idx, keepdims=False)
    masked = jnp.where(logits >= threshold, logits, -jnp.inf)
    return jnp.where(k > 0, masked, logits)


def top_p_mask(logits: jax.Array, p: jax.Array | float) -> jax.Array:
    """Nucleus filter: drop tokens whose exclusive cumulative prob >= p."""
    p = jnp.asarray(p, dtype=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    order = jnp.argsort(-probs)
    sorted_probs = probs[order]
    exclusive_cumsum = jnp.cumsum(sorted_probs) - sorted_probs
    keep_sorted = exclusive_cumsum < p
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    masked = jnp.where(keep, logits, -jnp.inf)
    return jnp.where(p < 1.0, masked, logits)


#: Default size of the stochastic candidate pool: sampling restricts to
#: this many highest logits (one ``lax.top_k`` instead of full-vocab
#: sorts, which are pathologically slow to compile and run at a 152k
#: vocab).  Exact for top_k <= the subset; runtimes widen the subset
#: (``k_subset`` below, bucketed by RuntimeConfig.top_k_subset_buckets)
#: when a request asks for a larger top_k, so arbitrary top_k values up
#: to the largest bucket are honored exactly — matching the reference
#: sampler (generate.py:134-141).  Top-p nuclei wider than the subset
#: are truncated (their tail mass is negligible at any practical
#: temperature).
TOP_K_SUBSET = 1024


def recent_token_window(
    tokens: jax.Array,        # (B, token_bucket) generated ids
    counts: jax.Array,        # (B,) tokens generated so far
    rep_ctx: jax.Array,       # (B,) or scalar live repetition_context_size
    rep_window: int,          # static gather width (bucketed per request)
    token_bucket: int,
) -> jax.Array:
    """Last ``rep_window`` generated ids per sequence, sentinel elsewhere.

    Shared by the monolithic decode loop and the continuous engine so the
    repetition-context semantics live in exactly one place.  Slots outside
    the live ``repetition_context_size`` hold :data:`RECENT_PAD_ID`; the
    reference walks the full Python list instead
    (generate.py:289-315) — bucketing ``rep_window`` from the request
    reproduces that for any context size up to the largest bucket.
    """
    rep_ctx_c = jnp.minimum(
        jnp.broadcast_to(jnp.asarray(rep_ctx, jnp.int32), counts.shape),
        rep_window,
    )
    idx = counts[:, None] - rep_window + jnp.arange(rep_window)[None, :]
    in_ctx = (idx >= 0) & (idx >= (counts - rep_ctx_c)[:, None])
    vals = jnp.take_along_axis(
        tokens, jnp.clip(idx, 0, token_bucket - 1), axis=1
    )
    return jnp.where(in_ctx & (rep_ctx_c[:, None] > 0), vals, RECENT_PAD_ID)


def sample_logits(
    rng: jax.Array,
    logits: jax.Array,
    temperature: jax.Array | float,
    top_k: jax.Array | int,
    top_p: jax.Array | float,
    repetition_penalty: jax.Array | float,
    recent_tokens: jax.Array,
    k_subset: int = TOP_K_SUBSET,
) -> jax.Array:
    """Sample one token id (int32 scalar) from a ``(vocab,)`` logit vector.

    All parameters except the static ``k_subset`` may be traced scalars,
    so one compiled decode program serves every sampling configuration.
    """
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, recent_tokens, repetition_penalty)
    temperature = jnp.asarray(temperature, dtype=jnp.float32)

    def greedy(_):
        return jnp.argmax(logits).astype(jnp.int32)

    def stochastic(_):
        scaled = logits / jnp.maximum(temperature, 1e-6)
        k_sub = min(k_subset, scaled.shape[-1])
        vals, idx = jax.lax.top_k(scaled, k_sub)       # descending

        # top-k: threshold at the k-th largest, keep ties (>= threshold).
        k = jnp.asarray(top_k, jnp.int32)
        kth = jax.lax.dynamic_index_in_dim(
            vals, jnp.clip(k - 1, 0, k_sub - 1), keepdims=False
        )
        keep_k = jnp.where(k > 0, vals >= kth, True)

        # top-p over exact full-vocab probabilities: the softmax denominator
        # comes from a logsumexp over ALL logits (no sort needed), and the
        # descending order inside the subset matches the global order.
        denom = jax.scipy.special.logsumexp(scaled)
        probs = jnp.exp(vals - denom)
        exclusive = jnp.cumsum(probs) - probs
        p = jnp.asarray(top_p, jnp.float32)
        keep_p = jnp.where(p < 1.0, exclusive < p, True)

        masked = jnp.where(keep_k & keep_p, vals, -jnp.inf)
        choice = jax.random.categorical(rng, masked)
        return idx[choice].astype(jnp.int32)

    return jax.lax.cond(temperature == 0.0, greedy, stochastic, None)


def spec_verify_sample(
    rng: jax.Array,
    logits: jax.Array,
    draft_id: jax.Array,
    temperature: jax.Array | float,
    top_k: jax.Array | int,
    top_p: jax.Array | float,
    repetition_penalty: jax.Array | float,
    recent_tokens: jax.Array,
    k_subset: int = TOP_K_SUBSET,
) -> tuple[jax.Array, jax.Array]:
    """One speculative-SAMPLING verify position against a point-mass
    (deterministic n-gram) draft.  Returns ``(accept: bool, token: int32)``.

    Standard rejection-sampling recovery (speculative decoding,
    Leviathan et al. 2022 / Chen et al. 2023) specialised to a
    deterministic proposal q = one-hot(draft): accept the draft with
    probability p(draft) under the FULL sampling transform — repetition
    penalty -> temperature -> top-k (ties kept) -> top-p (exclusive
    cumsum) -> renormalise, i.e. exactly the distribution
    :func:`sample_logits` draws from — and on rejection draw from the
    residual max(p - q, 0)/Z, which for a one-hot q is p with the
    draft's mass removed and renormalised.  The emitted token is an
    exact draw from p (the classic telescoping argument:
    P[emit = x] = p(d)·1[x=d] + (1 - p(d))·p(x)(1 - 1[x=d])/(1 - p(d))
    = p(x)).  The guarantee is per-token DISTRIBUTION identity with the
    plain sampler, not per-seed stream identity — the RNG is consumed
    differently (one accept draw + one categorical per position).

    ``draft_id < 0`` means "no proposal" (invalid draft slot, or the
    bonus position after the last draft): no vocab index matches, so
    p(draft) = 0, ``accept`` is False and the draw falls through to the
    full filtered distribution — a plain sample.
    """
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, recent_tokens, repetition_penalty)
    temperature = jnp.asarray(temperature, dtype=jnp.float32)
    draft_id = jnp.asarray(draft_id, jnp.int32)

    def greedy(_):
        tok = jnp.argmax(logits).astype(jnp.int32)
        return tok == draft_id, tok

    def stochastic(_):
        scaled = logits / jnp.maximum(temperature, 1e-6)
        k_sub = min(k_subset, scaled.shape[-1])
        vals, idx = jax.lax.top_k(scaled, k_sub)       # descending

        k = jnp.asarray(top_k, jnp.int32)
        kth = jax.lax.dynamic_index_in_dim(
            vals, jnp.clip(k - 1, 0, k_sub - 1), keepdims=False
        )
        keep_k = jnp.where(k > 0, vals >= kth, True)

        denom = jax.scipy.special.logsumexp(scaled)
        probs = jnp.exp(vals - denom)
        exclusive = jnp.cumsum(probs) - probs
        p = jnp.asarray(top_p, jnp.float32)
        keep_p = jnp.where(p < 1.0, exclusive < p, True)

        masked = jnp.where(keep_k & keep_p, vals, -jnp.inf)
        norm = jax.scipy.special.logsumexp(masked)
        is_draft = idx == draft_id
        draft_val = jnp.max(jnp.where(is_draft, masked, -jnp.inf))
        p_draft = jnp.exp(draft_val - norm)            # 0 if filtered/absent
        r_u, r_draw = jax.random.split(rng)
        accept = jax.random.uniform(r_u) < p_draft
        residual = jnp.where(is_draft, -jnp.inf, masked)
        residual_ok = jnp.any(residual > -jnp.inf)
        choice = jax.random.categorical(
            r_draw, jnp.where(residual_ok, residual, masked)
        )
        alt = idx[choice].astype(jnp.int32)
        # Degenerate residual — the draft holds ALL surviving mass (e.g.
        # top_k == 1 hitting the draft): rejection can only be a float
        # rounding artifact of p_draft ~ 1; keep the draft and count it
        # accepted so the chain semantics stay exact.
        token = jnp.where(accept | ~residual_ok, draft_id, alt)
        return accept | ~residual_ok, token

    return jax.lax.cond(temperature == 0.0, greedy, stochastic, None)
