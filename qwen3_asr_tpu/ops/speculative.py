"""N-gram draft proposal for speculative greedy decoding.

Speculative decoding needs a cheap draft source.  The reference has no
speculation at all (one forward per token, generate.py:289-315 drives the
loop from Python); serving frameworks typically ship an "n-gram" /
"prompt-lookup" speculator that proposes the tokens which FOLLOWED the
most recent occurrence of the current n-gram in the already-generated
stream.  That draft is free (no model call) and pairs perfectly with the
TPU decode economics: at small batch the decode step is bound by
streaming the 1.7B weights, so verifying ``gamma + 1`` positions in one
forward costs barely more than verifying one — every accepted draft
token is nearly-free throughput.

TPU-first shape discipline: the lookup runs INSIDE the compiled decode
loop (a host round-trip per step would cost a ~26 ms tunnel RPC — more
than the step itself), entirely as static-shaped vector ops over the
``(B, token_bucket)`` token buffer: shifted equality sweeps, a
masked-max to pick the most recent match, and ``gamma`` clipped gathers.
No sorting, no dynamic shapes, no data-dependent control flow.

The draft is MULTI-ORDER (prompt-lookup convention): orders
``n, n-1, ..., 2`` are tried highest-first per lane, because a longer
context match predicts its continuation with higher precision.  Each
extra order costs one more static equality sweep over the token buffer —
vector ops, noise next to the verify forward.  Greedy exactness never
depends on draft quality: the verifier accepts a draft token only when
it equals the model's own argmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _order_draft(
    tokens: jax.Array,   # (B, token_bucket) int32
    counts: jax.Array,   # (B,) int32
    n: int,
    gamma: int,
) -> tuple[jax.Array, jax.Array]:
    """Single-order lookup: the most recent prior occurrence of the last
    ``n`` emitted tokens; returns ``(draft (B, gamma), valid (B, gamma))``
    with ``valid[:, 0] == (a match exists)``."""
    B, tb = tokens.shape
    idx = jnp.arange(tb, dtype=jnp.int32)

    # match[b, j] = tokens[b, j : j + n] == tokens[b, counts - n : counts]
    match = jnp.ones((B, tb), bool)
    for i in range(n):
        ctx_i = jnp.take_along_axis(
            tokens, jnp.clip(counts - n + i, 0, tb - 1)[:, None], axis=1
        )                                           # (B, 1)
        # shifted[b, j] = tokens[b, j + i]  (static shift, zero-padded)
        shifted = jnp.pad(tokens[:, i:], ((0, 0), (0, i)))
        match &= shifted == ctx_i
    # The continuation token tokens[j + n] must already be emitted
    # (index <= counts - 1).  This also excludes the degenerate match of
    # the context against itself at j = counts - n.
    match &= (idx[None, :] + n) <= (counts[:, None] - 1)
    # Need a full n-gram of real history to look up at all.
    has_ctx = counts >= (n + 1)

    # Two-tier pick: prefer the most recent match whose FULL gamma-token
    # continuation is already emitted (a too-recent match's continuation
    # runs off the end of history and can seed only one draft token —
    # e.g. a constant stream's most recent bigram sits 2 from the end),
    # falling back to the most recent partial match.
    full = match & ((idx[None, :] + n + gamma - 1) <= (counts[:, None] - 1))
    any_full = jnp.any(full, axis=1)
    pick = jnp.where(any_full[:, None], full, match)
    found = jnp.any(match, axis=1) & has_ctx                  # (B,)
    j_star = jnp.max(jnp.where(pick, idx[None, :], -1), axis=1)   # (B,)
    j_star = jnp.maximum(j_star, 0)

    offs = jnp.arange(gamma, dtype=jnp.int32)                  # (gamma,)
    src = j_star[:, None] + n + offs[None, :]                  # (B, gamma)
    valid = found[:, None] & (src <= (counts[:, None] - 1))
    draft = jnp.take_along_axis(tokens, jnp.clip(src, 0, tb - 1), axis=1)
    return draft.astype(jnp.int32), valid


def ngram_draft(
    tokens: jax.Array,   # (B, token_bucket) int32 generated-token buffer
    counts: jax.Array,   # (B,) int32 — tokens[:counts] are emitted
    n: int = 2,
    gamma: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """Propose ``gamma`` draft tokens per sequence by n-gram lookup.

    ``n`` is the HIGHEST order tried: per lane, the draft comes from the
    most recent prior occurrence of the longest matching context among
    orders ``n, n-1, ..., 2`` (orders below 2 are never used — a
    unigram match is noise).  Returns ``(draft, valid)``:

    * ``draft`` — ``(B, gamma)`` int32 proposals (unspecified where
      ``valid`` is False);
    * ``valid`` — ``(B, gamma)`` bool; ``valid[b, i]`` means the
      proposal is a real continuation (match found at some order, and
      the continuation token was itself already emitted).  Invalid
      positions must be auto-rejected by the verifier.

    Greedy-exactness does not depend on draft quality: the verifier
    accepts a draft token only when it equals the model's own argmax, so
    a bad (or absent) draft costs only wasted verify positions.
    """
    counts = counts.astype(jnp.int32)
    draft, valid = _order_draft(tokens, counts, n, gamma)
    for order in range(n - 1, 1, -1):
        d_lo, v_lo = _order_draft(tokens, counts, order, gamma)
        keep_hi = valid[:, :1]          # a higher-order match exists
        draft = jnp.where(keep_hi, draft, d_lo)
        valid = jnp.where(keep_hi, valid, v_lo)
    return draft, valid
