"""Attribute the decode step's ~1.4 ms/step epilogue (docs/ROADMAP.md #2).

Times the non-matmul tail of one decode iteration — recent-token window
gather, repetition penalty, argmax/sample, token scatter, EOS check, rng
split — standalone with rep-count differencing (the only timing method
that works through the axon tunnel; see docs/PERFORMANCE.md).  Each
variant is a jitted ``lax.scan`` of K in-program repetitions; device time
per rep = (t_N - t_M) / (N - M).

Run on the TPU env:  python tools/epilogue_probe.py [B ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.ops.sampling import (
    apply_repetition_penalty,
    recent_token_window,
)

VOCAB = 151_936
TOKEN_BUCKET = 128
REP_WINDOW = 128


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def rep_diff(make_scan, n_hi=256, n_lo=64, iters=6):
    """Device seconds per rep via (t_hi - t_lo) / (n_hi - n_lo)."""
    f_hi, args = make_scan(n_hi)
    f_lo, _ = make_scan(n_lo)
    _force(f_hi(*args)); _force(f_lo(*args))  # compile both
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter(); _force(f_hi(*args)); t_hi = time.perf_counter() - t0
        t0 = time.perf_counter(); _force(f_lo(*args)); t_lo = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best


def probe(B: int):
    rng = np.random.default_rng(0)
    logits0 = jnp.asarray(rng.standard_normal((B, VOCAB)), jnp.float32)
    eos = jnp.asarray([151_643, 151_645], jnp.int32)

    def full_body(carry, _):
        """Everything after `logits` in Generator's decode body (greedy)."""
        tokens, counts, done, cur, key, logits = carry
        recent = recent_token_window(
            tokens, counts, jnp.int32(100), REP_WINDOW, TOKEN_BUCKET
        )
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, B)

        def one(k, l, r):
            pen = apply_repetition_penalty(l, r, jnp.float32(1.2))
            return jnp.argmax(pen).astype(jnp.int32)

        nxt = jax.vmap(one)(keys, logits, recent)
        slot = jnp.clip(counts, 0, TOKEN_BUCKET - 1)
        write = jnp.where(
            done, jnp.take_along_axis(tokens, slot[:, None], 1)[:, 0], nxt
        )
        tokens = tokens.at[jnp.arange(B), slot].set(write)
        counts = counts + (~done)
        done = done | jnp.any(nxt[:, None] == eos[None], -1)
        cur = jnp.where(done, cur, nxt)
        # Rotate logits so the scan body isn't constant-folded.
        return (tokens, counts, done, cur, key, logits + 1e-6), None

    def scatter_penalty(carry, _):
        """Candidate: penalize via 128-gather + 128-scatter on the logits
        instead of a full-vocab hit mask + three selects."""
        tokens, counts, done, cur, key, logits = carry
        recent = recent_token_window(
            tokens, counts, jnp.int32(100), REP_WINDOW, TOKEN_BUCKET
        )
        key, sub = jax.random.split(key)
        pen = jnp.float32(1.2)

        def one(l, r):
            safe = jnp.clip(r, 0, VOCAB - 1)
            g = l[safe]
            newv = jnp.where(g > 0, g / pen, g * pen)
            p = l.at[r].set(newv, mode="drop")
            return jnp.argmax(p).astype(jnp.int32)

        nxt = jax.vmap(one)(logits, recent)
        slot = jnp.clip(counts, 0, TOKEN_BUCKET - 1)
        write = jnp.where(
            done, jnp.take_along_axis(tokens, slot[:, None], 1)[:, 0], nxt
        )
        tokens = tokens.at[jnp.arange(B), slot].set(write)
        counts = counts + (~done)
        done = done | jnp.any(nxt[:, None] == eos[None], -1)
        cur = jnp.where(done, cur, nxt)
        return (tokens, counts, done, cur, key, logits + 1e-6), None

    def no_penalty(carry, _):
        tokens, counts, done, cur, key, logits = carry
        key, sub = jax.random.split(key)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        slot = jnp.clip(counts, 0, TOKEN_BUCKET - 1)
        tokens = tokens.at[jnp.arange(B), slot].set(nxt)
        counts = counts + (~done)
        done = done | jnp.any(nxt[:, None] == eos[None], -1)
        cur = jnp.where(done, cur, nxt)
        return (tokens, counts, done, cur, key, logits + 1e-6), None

    def argmax_only(carry, _):
        tokens, counts, done, cur, key, logits = carry
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (tokens, counts, done, nxt, key, logits + 1e-6), None

    def touch_only(carry, _):
        """Floor: one elementwise pass over the logits buffer."""
        tokens, counts, done, cur, key, logits = carry
        return (tokens, counts, done, cur, key, logits + 1e-6), None

    variants = {
        "full greedy epilogue": full_body,
        "scatter-penalty     ": scatter_penalty,
        "  - penalty/window  ": no_penalty,
        "argmax only         ": argmax_only,
        "touch logits only   ": touch_only,
    }

    def make(body):
        def mk(n):
            def run(tokens, counts, done, cur, key, logits):
                c, _ = jax.lax.scan(
                    body, (tokens, counts, done, cur, key, logits),
                    None, length=n,
                )
                return c[0], c[1]
            args = (
                jnp.zeros((B, TOKEN_BUCKET), jnp.int32),
                jnp.ones((B,), jnp.int32),
                jnp.zeros((B,), bool),
                jnp.zeros((B,), jnp.int32),
                jax.random.PRNGKey(0),
                logits0,
            )
            return jax.jit(run), args
        return mk

    print(f"== B={B} (vocab {VOCAB}, f32 logits {B*VOCAB*4/2**20:.0f} MB) ==")
    for name, body in variants.items():
        t = rep_diff(make(body))
        print(f"  {name}: {t*1e3:7.3f} ms/rep")


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [64, 96]
    for b in sizes:
        probe(b)
