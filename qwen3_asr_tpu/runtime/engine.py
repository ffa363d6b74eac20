"""Slot-based continuous-batching decode engine.

The reference serializes every request behind one lock (model.py:145,
239-250); round-1's server batched at admission only — a running decode
blocked the queue (head-of-line blocking).  This engine keeps ONE
persistent KV cache of ``n_slots`` sequence slots on device and interleaves
three operations at **step-chunk boundaries**:

  * ``admit``  — prefill new clips and write their prompt K/V into free
    slots *while other slots are mid-decode*;
  * ``step``   — run up to ``chunk_steps`` decode iterations for every
    live slot in ONE compiled ``lax.while_loop`` (sequences sit at
    heterogeneous decode depths: per-sequence RoPE positions, per-sequence
    KV write slots, per-sequence attention intervals — all supported
    natively by the v5 flash-decode kernel's per-sequence ``decode_end``);
  * ``retire`` — harvest finished sequences and free their slots without
    stopping the batch.

All-greedy chunks on narrow engines additionally run SPECULATIVE verify
iterations (RuntimeConfig.spec_engine, default "auto"): an in-program
n-gram draft plus one multi-token verify forward per iteration emits
1..gamma+1 tokens for the cost of ~one step when decode is weight-stream
bound — token-identical to plain greedy.  Flat bf16 engines take the
XLA verify split (``_step_chunk_impl``'s ``spec`` branch); paged engines
(bf16 AND int8 pools) run the paged verify kernel, whose T x group query
rows ride in the sublane pad a single-token step wastes
(``_step_chunk_paged_impl``'s ``spec`` branch).

TPU-first design: the device programs are fully static-shaped (``n_slots``
is the compiled batch), control state lives in tiny host arrays uploaded
per chunk (a few hundred bytes), and the cache + token buffers are donated
through every call so nothing is ever copied.  Chunked host control costs
one dispatch per ``chunk_steps`` decode steps and is what makes mid-decode
admission possible at all — a single monolithic while_loop (the
``Generator`` fast path, still used by ``transcribe_batch``) cannot accept
new work until it drains.

No reference counterpart (single device, batch-1: encoder.py:249-250);
blueprint: BASELINE.json north-star config 5.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TextDecoderConfig
from ..models.decoder import (
    decoder_forward,
    decoder_logits,
    embed_tokens,
    init_kv_cache,
)
from ..ops.quant_kv import is_quantized_kv, quantize_kv
from ..ops.sampling import (
    RECENT_PAD_ID,
    apply_repetition_penalty,
    recent_token_window,
    sample_logits,
)


def _spec_accept_chain(
    logits, draft, dvalid, tokens, counts, done, cur, live,
    recent_window, rep_pen, max_new, token_bucket, is_eos, gamma,
):
    """Shared greedy accept chain for spec verify chunks (flat AND paged
    bodies; the Generator's _spec_machinery mirrors the same logic with
    scalar penalty closures).

    Emits 1..gamma+1 tokens per live lane: position ``t``'s argmax is
    used only when every earlier draft token matched the argmax at its
    own position, with the penalty window recomputed after each accepted
    token — so the emitted stream is exactly the sequential greedy
    stream.  Returns updated (tokens, counts, done, cur)."""
    B = tokens.shape[0]
    chain = live & ~done
    for t in range(gamma + 1):
        win = recent_window(tokens, counts)
        pen = jax.vmap(apply_repetition_penalty)(
            logits[:, t].astype(jnp.float32), win, rep_pen
        )
        out_t = jnp.argmax(pen, axis=-1).astype(jnp.int32)
        emit = chain
        slot = jnp.clip(counts, 0, token_bucket - 1)
        keep = jnp.take_along_axis(tokens, slot[:, None], axis=1)[:, 0]
        tokens = tokens.at[jnp.arange(B), slot].set(
            jnp.where(emit, out_t, keep)
        )
        counts = counts + emit
        newly_done = emit & (is_eos(out_t) | (counts >= max_new))
        done = done | newly_done
        cur = jnp.where(emit & ~done, out_t, cur)
        if t < gamma:
            chain = (
                emit & ~newly_done & dvalid[:, t] & (out_t == draft[:, t])
            )
    return tokens, counts, done, cur


@dataclass
class SlotRequest:
    """One admitted clip's bookkeeping (host side)."""

    samples: np.ndarray
    prompt: list[int]
    max_new: int
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    repetition_penalty: float = 1.2
    repetition_context_size: int = 100
    seed: int = 0
    meta: Any = None  # opaque caller payload (e.g. a Future)


@dataclass
class EngineStats:
    """Continuous-batching counters."""

    admitted: int = 0
    retired: int = 0
    chunks: int = 0
    steps: int = 0
    mid_decode_admissions: int = 0
    occupancy_sum: float = 0.0
    # Speculative chunk accounting: lane-steps = verify forwards a lane
    # actually paid (counted ON DEVICE while the lane was live and not
    # done — scan-shaped chunks pad with no-op iterations that must not
    # dilute the ratio); lane-tokens = tokens those lanes emitted.  Their
    # ratio is the measured tokens-per-forward (1.0 = nothing accepted,
    # gamma + 1 = every draft accepted).
    spec_chunks: int = 0
    spec_lane_steps: int = 0
    spec_lane_tokens: int = 0

    @property
    def mean_occupancy(self) -> float:
        return self.occupancy_sum / self.chunks if self.chunks else 0.0

    @property
    def spec_tokens_per_forward(self) -> float:
        return (
            self.spec_lane_tokens / self.spec_lane_steps
            if self.spec_lane_steps
            else 0.0
        )


class DecodeEngine:
    """Persistent multi-slot decode engine over one decoder parameter set.

    Parameters
    ----------
    generator:
        The model's :class:`~qwen3_asr_tpu.runtime.generate.Generator`
        (provides params, config, planning).
    prompt_bucket / token_bucket:
        Static cache geometry: prompt region rows per slot and decode
        region rows per slot.  ``prompt_bucket`` must be a multiple of 256
        (flash-prefill tiling) and the decode region a multiple of 128
        (v5 kernel block granularity).
    n_slots:
        Compiled batch width — the maximum number of concurrently decoding
        sequences.
    chunk_steps:
        Decode steps per compiled chunk; admission/retirement happen at
        chunk boundaries, so this bounds added queueing latency at
        ``chunk_steps * per-step-time``.
    """

    def __init__(
        self,
        generator,
        prompt_bucket: int,
        token_bucket: int,
        n_slots: int = 8,
        chunk_steps: int = 32,
        paged: bool = False,
        page_size: int = 256,
        n_pages: int | None = None,
        chunk_program: str | None = None,
    ) -> None:
        if prompt_bucket % 256:
            raise ValueError("prompt_bucket must be a multiple of 256")
        if token_bucket % 128:
            raise ValueError("token_bucket must be a multiple of 128")
        self.gen = generator
        self.cfg: TextDecoderConfig = generator.cfg
        self.prompt_bucket = prompt_bucket
        self.token_bucket = token_bucket
        self.cache_len = prompt_bucket + token_bucket
        self.n_slots = n_slots
        self.chunk_steps = chunk_steps
        # Chunk-body program shape: "scan" (canonical) runs each chunk as
        # a fixed-``k_steps`` ``lax.scan`` — token-identical to the while
        # version for greedy slots, and (unlike pallas-in-while programs
        # on the axon backend, docs/PERFORMANCE.md cold-start section) it
        # serializes AND reloads from the persistent compile cache, so a
        # server restart re-warms every chunk program in seconds instead
        # of one 60-990 s compile each.  The only semantic difference:
        # once every live lane in a chunk finishes, the remaining
        # fixed-length iterations still advance the per-slot rngs, so a
        # page-PAUSED slot resuming later may see a different (equally
        # valid) sample stream than the early-exiting "while" shape.
        # ``QWEN3_ASR_ENGINE_CHUNK=while`` restores the old behavior.
        self.chunk_program = chunk_program or os.environ.get(
            "QWEN3_ASR_ENGINE_CHUNK", "scan"
        )
        if self.chunk_program not in ("scan", "while"):
            raise ValueError("chunk_program must be 'scan' or 'while'")
        self.stats = EngineStats()
        self._eos_ids = generator._eos_ids

        dtype = jnp.result_type(generator.params["final_norm"])
        # RuntimeConfig.kv_cache_dtype = "int8": the persistent slot cache
        # stores int8 rows + per-row f32 scales ({"q", "s"} pytrees,
        # ops/quant_kv.py) — the dominant decode-time read stream halves
        # and the same KV budget holds twice the slots.  Prompt K/V is
        # quantized once at admission; fresh rows quantize on write.
        self.kv_dtype = getattr(generator.runtime, "kv_cache_dtype", "bf16")

        def alloc_cache(shape):
            if self.kv_dtype == "int8":
                return {
                    "q": jnp.zeros(shape, jnp.int8),
                    "s": jnp.ones(shape[:-1], jnp.float32),
                }
            return jnp.zeros(shape, dtype)

        self.paged = paged
        if paged:
            # Page-pool cache: each slot owns only the pages its prompt +
            # generated tokens occupy.  ``n_pages`` bounds total KV memory
            # independently of the worst-case slot size — mixed workloads
            # oversubscribe.  Physical page 0 is a reserved trash page
            # (inactive lanes' writes land there; no table entry points
            # to it).
            if page_size not in (128, 256):
                # Admission groups arrive with prompt buckets that are
                # multiples of 256; pages must tile every such group.
                raise ValueError("page_size must be 128 or 256")
            self.page_size = page_size
            self.max_pages = (
                -(-prompt_bucket // page_size) - (-token_bucket // page_size)
            )
            if n_pages is None:
                n_pages = 1 + n_slots * self.max_pages
            self.n_pages = n_pages
            L = self.cfg.num_hidden_layers
            shape = (
                L, n_pages, self.cfg.num_key_value_heads,
                page_size, self.cfg.head_dim,
            )
            self._keys = alloc_cache(shape)
            self._values = alloc_cache(shape)
            self._page_table = np.zeros((n_slots, self.max_pages), np.int32)
            self._free_pages: list[int] = list(range(n_pages - 1, 0, -1))
            self._pp = np.zeros(n_slots, np.int32)        # prompt pages
            self._dp_alloc = np.zeros(n_slots, np.int32)  # decode pages
            self._paused = np.zeros(n_slots, bool)        # out-of-pages
        else:
            if self.kv_dtype == "int8":
                shape = (
                    self.cfg.num_hidden_layers, n_slots,
                    self.cfg.num_key_value_heads, self.cache_len,
                    self.cfg.head_dim,
                )
                self._keys = alloc_cache(shape)
                self._values = alloc_cache(shape)
            else:
                self._keys, self._values = init_kv_cache(
                    self.cfg, n_slots, self.cache_len, dtype
                )
        self._tokens = jnp.zeros((n_slots, token_bucket), jnp.int32)

        # Control state lives in TWO places:
        #   * device arrays (``*_d``) — the truth the compiled chunk reads;
        #     dynamic state (counts/done/cur/rngs) is donated through every
        #     chunk and admission, per-slot parameters are re-uploaded only
        #     when an admission/retirement/page event dirties them;
        #   * numpy mirrors — what the host scheduler reads (free_slots,
        #     n_active, retire, page planning), refreshed from ONE packed
        #     (2, B) status fetch per chunk.
        # Steady state is therefore 1 dispatch + 1 small fetch per chunk —
        # this matters because each transfer is a round-trip on tunneled
        # deployments and the round-1 design paid ~18 of them per chunk.
        n = n_slots
        self._live = np.zeros(n, bool)
        self._done = np.ones(n, bool)
        self._counts = np.ones(n, np.int32)
        self._prompt_len = np.zeros(n, np.int32)
        self._max_new = np.ones(n, np.int32)
        self._cur = np.zeros(n, np.int32)
        self._temp = np.zeros(n, np.float32)
        self._top_k = np.zeros(n, np.int32)
        self._top_p = np.ones(n, np.float32)
        self._rep_pen = np.ones(n, np.float32)
        self._rep_ctx = np.zeros(n, np.int32)
        self._meta: list[Optional[SlotRequest]] = [None] * n

        self._counts_d = jnp.ones(n, jnp.int32)
        self._done_d = jnp.ones(n, bool)
        self._cur_d = jnp.zeros(n, jnp.int32)
        self._rngs_d = jnp.zeros((n, 2), jnp.uint32)
        self._ctl_d: tuple = ()
        self._ctl_dirty = True

        donate_steps = tuple(range(1, 8))  # keys..rngs
        self._step_chunk_jit = jax.jit(
            self._step_chunk_paged_impl if paged else self._step_chunk_impl,
            static_argnames=(
                "k_steps", "greedy", "width", "rep_window", "k_subset", "spec",
            ),
            donate_argnums=donate_steps,
        )
        self._admit_jit = jax.jit(
            self._admit_paged_impl if paged else self._admit_impl,
            donate_argnums=(0, 1, 2, 3, 4, 5, 6),
        )
        self._first_jit = jax.jit(
            self._first_impl, static_argnames=("k_subset",)
        )
        self._move_jit = jax.jit(
            self._move_impl, donate_argnums=(0, 1, 2, 3, 4)
        )
        # Compiled step widths (paged mode): powers of two up to n_slots.
        self._widths = sorted(
            {min(1 << i, n_slots) for i in range((n_slots - 1).bit_length() + 1)}
        ) or [n_slots]

    # -- device programs ---------------------------------------------------

    def _step_chunk_impl(
        self, params, keys, values, tokens, counts, done, cur, rngs,
        live, prompt_len, max_new, temp, top_k, top_p, rep_pen, rep_ctx,
        k_steps, greedy, width=None, rep_window=128, k_subset=1024,
        spec=None,
    ):
        """Up to ``k_steps`` decode iterations over all live slots.

        ``width`` is ignored here: the flat cache carries the batch
        dimension, so slicing it would copy gigabytes — width bucketing
        is a paged-mode feature (the page pool has no batch dim).

        ``spec`` = (gamma, ngram_n) switches the chunk body to a
        speculative verify iteration (all-greedy chunks only): an n-gram
        draft lookup plus ONE multi-token forward over ``gamma + 1``
        positions per iteration, emitting 1..gamma+1 tokens — the same
        static accept chain as the Generator's monolithic spec loop
        (generate.py _spec_machinery), so the emitted stream is exactly
        the plain greedy stream.  Slots sit at heterogeneous depths the
        same way the plain body supports: per-slot positions, write
        slots, and decode windows."""
        cfg = self.cfg
        B = self.n_slots
        pbucket = self.prompt_bucket
        token_bucket = self.token_bucket
        eos = jnp.asarray(self._eos_ids)

        def is_eos(tok):
            return jnp.any(tok[..., None] == eos[None, :], axis=-1)

        def recent_window(tokens, counts):
            # Shared impl (ops/sampling.py); rep_window is a per-chunk
            # static covering the widest live repetition_context_size.
            return recent_token_window(
                tokens, counts, rep_ctx, rep_window, token_bucket
            )

        def cond(state):
            _, _, _, _, done, _, _, step = state
            return jnp.any(live & ~done) & (step < k_steps)

        if spec is not None:
            # Speculative verify body (greedy only — step() never plans
            # spec for mixed chunks).  Token-identity with the plain body
            # holds by construction: position t's argmax is used only when
            # every earlier draft token matched the argmax at its own
            # position (penalty window recomputed after every accepted
            # token, same order as the sequential loop).  KV rows written
            # for rejected positions sit past the lane's new write slot
            # and are overwritten before they can be attended; writes past
            # the cache end drop (decoder write mode="drop").
            from ..ops.speculative import ngram_draft

            gamma, ngram_n = spec
            T = gamma + 1

            def spec_cond(state):
                done, step = state[4], state[8]
                return jnp.any(live & ~done) & (step < k_steps)

            def spec_body(state):
                (keys, values, tokens, counts, done, cur, rngs, fwd,
                 step) = state
                # Honest per-lane verify-forward count: a lane pays a
                # forward only while it is live and not yet done (the
                # scan shape still runs post-done no-op iterations, but
                # they must not dilute tokens-per-forward).
                fwd = fwd + (live & ~done)
                draft, dvalid = ngram_draft(
                    tokens, counts, n=ngram_n, gamma=gamma
                )
                ids = jnp.concatenate([cur[:, None], draft], axis=1)  # (B,T)
                pos = (prompt_len + counts - 1)[:, None] + jnp.arange(T)[None]
                ws = pbucket + jnp.maximum(counts - 1, 0)
                embeds = embed_tokens(params, ids)
                hidden, (keys, values) = decoder_forward(
                    params, cfg, embeds, pos, (keys, values),
                    write_slots=ws, uniform_write=False,
                    decode_ctx=(prompt_len, ws, pbucket),
                )
                logits = decoder_logits(params, cfg, hidden)  # (B, T, V)

                tokens, counts, done, cur = _spec_accept_chain(
                    logits, draft, dvalid, tokens, counts, done, cur,
                    live, recent_window, rep_pen, max_new, token_bucket,
                    is_eos, gamma,
                )
                return (keys, values, tokens, counts, done, cur, rngs, fwd,
                        step + 1)

            keys, values, tokens, counts, done, cur, rngs, fwd = (
                self._run_chunk_loop(
                    spec_cond, spec_body,
                    (keys, values, tokens, counts, done, cur, rngs,
                     jnp.zeros((B,), jnp.int32)),
                    k_steps,
                )
            )
            status = jnp.stack([counts, done.astype(jnp.int32), fwd])
            return keys, values, tokens, counts, done, cur, rngs, status

        def body(state):
            keys, values, tokens, counts, done, cur, rngs, step = state
            # Per-sequence geometry: each slot is at its own decode depth.
            pos = prompt_len + counts - 1
            write_slots = pbucket + jnp.maximum(counts - 1, 0)
            embeds = embed_tokens(params, cur)[:, None, :]
            hidden, (keys, values) = decoder_forward(
                params, cfg, embeds, pos[:, None], (keys, values),
                write_slots=write_slots,
                uniform_write=False,
                decode_ctx=(prompt_len, write_slots, pbucket),
            )
            logits = decoder_logits(params, cfg, hidden)[:, 0]

            if greedy:
                # All-greedy chunk (static): penalty + argmax only.  Under
                # vmap, lax.cond runs BOTH branches, so the mixed program
                # pays top_k(152k)+logsumexp even when every slot is
                # temperature 0 — the common ASR case gets its own program
                # (mirrors the Generator's greedy/sample split).
                pen = jax.vmap(apply_repetition_penalty)(
                    logits.astype(jnp.float32),
                    recent_window(tokens, counts),
                    rep_pen,
                )
                nxt = jnp.argmax(pen, axis=-1).astype(jnp.int32)
            else:
                split = jax.vmap(jax.random.split)(rngs)
                use, rngs = split[:, 0], split[:, 1]
                nxt = jax.vmap(
                    lambda k, l, t, tk, tp, rp, r: sample_logits(
                        k, l, t, tk, tp, rp, r, k_subset=k_subset
                    )
                )(
                    use, logits, temp, top_k, top_p, rep_pen,
                    recent_window(tokens, counts),
                )

            active = live & ~done
            slot = jnp.clip(counts, 0, token_bucket - 1)
            keep = jnp.take_along_axis(tokens, slot[:, None], axis=1)[:, 0]
            tokens = tokens.at[jnp.arange(B), slot].set(
                jnp.where(active, nxt, keep)
            )
            counts = counts + active
            # Only genuine completion sets done: folding ~live in would
            # mark page-PAUSED slots (masked out of `live` for this chunk)
            # as finished, and retire() would harvest them truncated.
            done = done | (active & (is_eos(nxt) | (counts >= max_new)))
            cur = jnp.where(active & ~done, nxt, cur)
            return keys, values, tokens, counts, done, cur, rngs, step + 1

        keys, values, tokens, counts, done, cur, rngs = self._run_chunk_loop(
            cond, body, (keys, values, tokens, counts, done, cur, rngs),
            k_steps,
        )
        status = jnp.stack([counts, done.astype(jnp.int32)])
        return keys, values, tokens, counts, done, cur, rngs, status

    def _run_chunk_loop(self, cond, body, state, k_steps):
        """Run the chunk body ``k_steps`` times in the configured loop shape.

        "scan": fixed-length ``lax.scan`` — the body already no-ops
        finished lanes (``active = live & ~done`` gates every state
        update, and a done lane's KV re-write is idempotent: same row,
        same inputs), so trailing iterations only cost device time.  What
        it buys: scan-shaped pallas programs serialize into the
        persistent XLA compile cache on the axon backend while
        while-shaped ones never reload (docs/PERFORMANCE.md cold-start
        section), so a server restart re-warms in seconds instead of
        one 60-990 s compile per chunk program.
        "while": early-exits once every live lane finishes — cheaper
        tails, cold compile every process.
        """
        init = (*state, jnp.int32(0))
        if self.chunk_program == "scan":
            def scan_body(s, _):
                return body(s), None

            out, _ = jax.lax.scan(scan_body, init, None, length=k_steps)
        else:
            out = jax.lax.while_loop(cond, body, init)
        return out[:-1]

    def _admit_impl(
        self, keys, values, tokens, counts, done, cur, rngs,
        kg, vg, slots, first_tokens, rngs_new, done_new,
    ):
        """Write a prefill group's prompt K/V + first token into its slots."""
        pb_g = kg.shape[3]

        def put(cache, grp):
            if is_quantized_kv(cache):
                qg = quantize_kv(grp)
                return {
                    "q": cache["q"].at[:, slots, :, :pb_g, :].set(qg["q"]),
                    "s": cache["s"].at[:, slots, :, :pb_g].set(qg["s"]),
                }
            return cache.at[:, slots, :, :pb_g, :].set(grp.astype(cache.dtype))

        keys = put(keys, kg)
        values = put(values, vg)
        tokens = tokens.at[slots, :].set(0)
        tokens = tokens.at[slots, 0].set(first_tokens)
        counts = counts.at[slots].set(1)
        done = done.at[slots].set(done_new)
        cur = cur.at[slots].set(first_tokens)
        rngs = rngs.at[slots].set(rngs_new)
        return keys, values, tokens, counts, done, cur, rngs

    def _first_impl(self, logits, rngs, temp, top_k, top_p, k_subset=1024):
        """First token per admitted sequence — NO repetition penalty
        (reference passes recent_tokens=None, generate.py:278-285)."""
        bg = logits.shape[0]
        no_recent = jnp.full((bg, 1), RECENT_PAD_ID, jnp.int32)
        split = jax.vmap(jax.random.split)(rngs)
        use, nxt = split[:, 0], split[:, 1]
        toks = jax.vmap(
            lambda k, l, t, tk, tp, r: sample_logits(
                k, l, t, tk, tp, 1.0, r, k_subset=k_subset
            )
        )(use, logits, temp, top_k, top_p, no_recent)
        return toks, nxt

    # -- paged device programs ---------------------------------------------

    def _step_chunk_paged_impl(
        self, params, keys, values, tokens, counts, done, cur, rngs,
        table, live, prompt_len, max_new, temp, top_k, top_p, rep_pen,
        rep_ctx, k_steps, greedy, width=None, rep_window=128, k_subset=1024,
        spec=None,
    ):
        """Paged variant: KV rows resolve through the per-slot page table.

        ``spec`` = (gamma, ngram_n) switches the body to a speculative
        verify iteration over the page pool (all-greedy chunks only):
        same accept chain as the flat spec body, with the T = gamma+1
        fresh positions scored by the paged verify kernel in ONE page
        walk (decode_attention_paged_verify — the T x group query rows
        fill the sublane pad a single-token step wastes).  Tentative
        rows land at per-position (page, offset); rejected rows are
        overwritten next iteration, and rows past the slot's allocation
        resolve through zero page-table entries onto the reserved trash
        page 0 (never owned by a sequence).  Works for bf16 AND int8
        pools (the per-row paged writer re-quantizes fresh rows).

        ``table`` is chunk-invariant (the host pre-allocates decode pages
        covering this chunk's steps — k_steps x (gamma+1) rows for spec
        chunks — before dispatch; slots that could not get pages are
        excluded from ``live``).

        ``width`` (static) runs the chunk over only the first ``width``
        slots: retirement compacts live slots into a prefix, so a
        low-occupancy engine steps at a narrower compiled width and skips
        the idle slots' attention/logits work entirely.  The page-pool
        cache has no batch dimension, so narrowing costs nothing; the
        (tiny) per-slot state is sliced in and written back in place."""
        from ..models.decoder import decoder_paged_step

        B = width or self.n_slots
        f_tokens, f_counts, f_done, f_cur, f_rngs = (
            tokens, counts, done, cur, rngs
        )
        if B < self.n_slots:
            tokens, counts, done, cur, rngs = (
                tokens[:B], counts[:B], done[:B], cur[:B], rngs[:B]
            )
            table, live, prompt_len, max_new = (
                table[:B], live[:B], prompt_len[:B], max_new[:B]
            )
            temp, top_k, top_p, rep_pen, rep_ctx = (
                temp[:B], top_k[:B], top_p[:B], rep_pen[:B], rep_ctx[:B]
            )

        cfg = self.cfg
        PS = self.page_size
        maxp = self.max_pages
        token_bucket = self.token_bucket
        eos = jnp.asarray(self._eos_ids)
        pp = (prompt_len + PS - 1) // PS

        def is_eos(tok):
            return jnp.any(tok[..., None] == eos[None, :], axis=-1)

        def recent_window(tokens, counts):
            # Shared impl (ops/sampling.py); rep_window is a per-chunk
            # static covering the widest live repetition_context_size.
            return recent_token_window(
                tokens, counts, rep_ctx, rep_window, token_bucket
            )

        def cond(state):
            _, _, _, _, done, _, _, step = state
            return jnp.any(live & ~done) & (step < k_steps)

        if spec is not None:
            # Speculative verify body over the page pool (greedy only —
            # step() never plans spec for mixed chunks).  Token-identity
            # with the plain body holds exactly as in the flat spec body:
            # position t's argmax is used only when every earlier draft
            # matched its own position's argmax, with the penalty window
            # recomputed after each accepted token.
            from ..models.decoder import decoder_paged_verify
            from ..ops.speculative import ngram_draft

            gamma, ngram_n = spec
            T = gamma + 1

            def spec_cond(state):
                done, step = state[4], state[8]
                return jnp.any(live & ~done) & (step < k_steps)

            def spec_body(state):
                (keys, values, tokens, counts, done, cur, rngs, fwd,
                 step) = state
                # Honest per-lane verify-forward count (see the flat spec
                # body): post-done no-op iterations must not dilute
                # tokens-per-forward.
                fwd = fwd + (live & ~done)
                draft, dvalid = ngram_draft(
                    tokens, counts, n=ngram_n, gamma=gamma
                )
                ids = jnp.concatenate([cur[:, None], draft], axis=1)  # (B,T)
                pos = (prompt_len + counts - 1)[:, None] + jnp.arange(T)[None]
                wrow = (
                    jnp.maximum(counts - 1, 0)[:, None] + jnp.arange(T)[None]
                )                                                     # (B,T)
                raw = pp[:, None] + wrow // PS                        # (B,T)
                pages = table[
                    jnp.arange(B)[:, None], jnp.clip(raw, 0, maxp - 1)
                ]
                # Tentative rows whose page index walks OFF the table must
                # go to the reserved trash page 0 explicitly: clipping the
                # index would redirect them onto the slot's LAST entry —
                # a real allocated page when the table is exactly full —
                # overwriting accepted decode history at offset wrow % PS
                # and breaking token identity for budgets that end on a
                # page boundary.  (In-table rows past the allocation
                # already resolve to 0 via zero table entries; rows past
                # max_new but inside the table write garbage only at
                # offsets no read ever covers, since dcount < max_new.)
                pages = jnp.where(raw >= maxp, 0, pages)
                offs = wrow % PS
                embeds = embed_tokens(params, ids)
                hidden, (keys, values) = decoder_paged_verify(
                    params, cfg, embeds, pos, (keys, values), table,
                    prompt_len, jnp.maximum(counts - 1, 0), pages, offs,
                )
                logits = decoder_logits(params, cfg, hidden)  # (B, T, V)

                tokens, counts, done, cur = _spec_accept_chain(
                    logits, draft, dvalid, tokens, counts, done, cur,
                    live, recent_window, rep_pen, max_new, token_bucket,
                    is_eos, gamma,
                )
                return (keys, values, tokens, counts, done, cur, rngs, fwd,
                        step + 1)

            keys, values, tokens, counts, done, cur, rngs, fwd = (
                self._run_chunk_loop(
                    spec_cond, spec_body,
                    (keys, values, tokens, counts, done, cur, rngs,
                     jnp.zeros((B,), jnp.int32)),
                    k_steps,
                )
            )
            if B < self.n_slots:
                tokens = f_tokens.at[:B].set(tokens)
                counts = f_counts.at[:B].set(counts)
                done = f_done.at[:B].set(done)
                cur = f_cur.at[:B].set(cur)
                rngs = f_rngs.at[:B].set(rngs)
                fwd = jnp.zeros((self.n_slots,), jnp.int32).at[:B].set(fwd)
            status = jnp.stack([counts, done.astype(jnp.int32), fwd])
            return keys, values, tokens, counts, done, cur, rngs, status

        def body(state):
            keys, values, tokens, counts, done, cur, rngs, step = state
            pos = prompt_len + counts - 1
            wrow = jnp.maximum(counts - 1, 0)   # decode row being written
            idx = jnp.clip(pp + wrow // PS, 0, maxp - 1)
            page = table[jnp.arange(B), idx]
            off = wrow % PS
            embeds = embed_tokens(params, cur)[:, None, :]
            hidden, (keys, values) = decoder_paged_step(
                params, cfg, embeds, pos[:, None], (keys, values),
                table, prompt_len, wrow, page, off,
            )
            logits = decoder_logits(params, cfg, hidden)[:, 0]

            if greedy:
                # All-greedy chunk (static): penalty + argmax only.  Under
                # vmap, lax.cond runs BOTH branches, so the mixed program
                # pays top_k(152k)+logsumexp even when every slot is
                # temperature 0 — the common ASR case gets its own program
                # (mirrors the Generator's greedy/sample split).
                pen = jax.vmap(apply_repetition_penalty)(
                    logits.astype(jnp.float32),
                    recent_window(tokens, counts),
                    rep_pen,
                )
                nxt = jnp.argmax(pen, axis=-1).astype(jnp.int32)
            else:
                split = jax.vmap(jax.random.split)(rngs)
                use, rngs = split[:, 0], split[:, 1]
                nxt = jax.vmap(
                    lambda k, l, t, tk, tp, rp, r: sample_logits(
                        k, l, t, tk, tp, rp, r, k_subset=k_subset
                    )
                )(
                    use, logits, temp, top_k, top_p, rep_pen,
                    recent_window(tokens, counts),
                )

            active = live & ~done
            slot = jnp.clip(counts, 0, token_bucket - 1)
            keep = jnp.take_along_axis(tokens, slot[:, None], axis=1)[:, 0]
            tokens = tokens.at[jnp.arange(B), slot].set(
                jnp.where(active, nxt, keep)
            )
            counts = counts + active
            # Only genuine completion sets done: folding ~live in would
            # mark page-PAUSED slots (masked out of `live` for this chunk)
            # as finished, and retire() would harvest them truncated.
            done = done | (active & (is_eos(nxt) | (counts >= max_new)))
            cur = jnp.where(active & ~done, nxt, cur)
            return keys, values, tokens, counts, done, cur, rngs, step + 1

        keys, values, tokens, counts, done, cur, rngs = self._run_chunk_loop(
            cond, body, (keys, values, tokens, counts, done, cur, rngs),
            k_steps,
        )
        if B < self.n_slots:
            tokens = f_tokens.at[:B].set(tokens)
            counts = f_counts.at[:B].set(counts)
            done = f_done.at[:B].set(done)
            cur = f_cur.at[:B].set(cur)
            rngs = f_rngs.at[:B].set(rngs)
        status = jnp.stack([counts, done.astype(jnp.int32)])
        return keys, values, tokens, counts, done, cur, rngs, status

    def _admit_paged_impl(
        self, keys, values, tokens, counts, done, cur, rngs,
        kg, vg, dst_pages, slots, first_tokens, rngs_new, done_new,
    ):
        """Scatter a prefill group's prompt rows into allocated pages.

        ``dst_pages`` is ``(B_g * Pb_g/PS,)``: each sequence's prompt pages
        in order, padded with the trash page (0) for pages beyond its
        prompt length — right-padded prefill garbage never claims memory.
        """
        L, Bg, H, pb_g, D = kg.shape
        PS = self.page_size
        npg = pb_g // PS

        def put(pool, grp):
            if is_quantized_kv(pool):
                qg = quantize_kv(grp)
                src_q = qg["q"].reshape(L, Bg, H, npg, PS, D).transpose(
                    0, 1, 3, 2, 4, 5
                ).reshape(L, Bg * npg, H, PS, D)
                src_s = qg["s"].reshape(L, Bg, H, npg, PS).transpose(
                    0, 1, 3, 2, 4
                ).reshape(L, Bg * npg, H, PS)
                return {
                    "q": pool["q"].at[:, dst_pages].set(src_q),
                    "s": pool["s"].at[:, dst_pages].set(src_s),
                }
            src = grp.reshape(L, Bg, H, npg, PS, D).transpose(
                0, 1, 3, 2, 4, 5
            ).reshape(L, Bg * npg, H, PS, D)
            return pool.at[:, dst_pages].set(src.astype(pool.dtype))

        keys = put(keys, kg)
        values = put(values, vg)
        tokens = tokens.at[slots, :].set(0)
        tokens = tokens.at[slots, 0].set(first_tokens)
        counts = counts.at[slots].set(1)
        done = done.at[slots].set(done_new)
        cur = cur.at[slots].set(first_tokens)
        rngs = rngs.at[slots].set(rngs_new)
        return keys, values, tokens, counts, done, cur, rngs

    def _move_impl(self, tokens, counts, done, cur, rngs, src, dst):
        """Copy slot ``src``'s dynamic state over slot ``dst`` (slot
        compaction after retirement; the paged cache itself never moves —
        only the host-side page-table row follows the slot)."""
        tokens = tokens.at[dst].set(tokens[src])
        counts = counts.at[dst].set(counts[src])
        done = done.at[dst].set(done[src])
        cur = cur.at[dst].set(cur[src])
        rngs = rngs.at[dst].set(rngs[src])
        return tokens, counts, done, cur, rngs

    # -- host control ------------------------------------------------------

    def free_slots(self) -> list[int]:
        return [i for i in range(self.n_slots) if not self._live[i]]

    def n_active(self) -> int:
        return int((self._live & ~self._done).sum())

    def n_live(self) -> int:
        """Slots holding a request (decoding OR finished-but-unharvested)."""
        return int(self._live.sum())

    def admit(
        self, kv_group, first_logits, slots: list[int], reqs: list[SlotRequest]
    ) -> list[SlotRequest]:
        """Place a prefilled group into ``slots`` (one entry per request).

        ``kv_group`` is the prefill's ``(keys, values)`` with cache length
        <= ``prompt_bucket``; ``first_logits`` the last-prompt-position
        logits ``(B_g, vocab)``.  Returns requests that could NOT be
        admitted (paged mode only: page pool exhausted) — the caller
        should retry them after retirements free pages.
        """
        if len(reqs) > len(slots):
            raise ValueError(
                f"admission group of {len(reqs)} exceeds the {len(slots)} "
                "provided slots — cap groups at free_slots() before "
                "prefilling (the server does this automatically)"
            )
        rejected: list[SlotRequest] = []
        pages_per_req: list[list[int]] = []
        if self.paged:
            ps = self.page_size
            admitted_idx = []
            for j, r in enumerate(reqs):
                pp = -(-len(r.prompt) // ps)
                if pp <= len(self._free_pages):
                    pages_per_req.append(
                        [self._free_pages.pop() for _ in range(pp)]
                    )
                    admitted_idx.append(j)
                else:
                    rejected.append(r)
            if not admitted_idx:
                return rejected
            if len(admitted_idx) < len(reqs):
                sel = jnp.asarray(admitted_idx)
                kv_group = (
                    jnp.take(kv_group[0], sel, axis=1),
                    jnp.take(kv_group[1], sel, axis=1),
                )
                first_logits = jnp.take(first_logits, sel, axis=0)
                reqs = [reqs[j] for j in admitted_idx]
        if self.n_active() > 0:
            self.stats.mid_decode_admissions += len(reqs)
        bg = len(reqs)
        slots_np = np.asarray(slots[:bg], np.int32)
        rngs = np.stack(
            [np.asarray(jax.random.PRNGKey(r.seed), np.uint32) for r in reqs]
        )
        temp = np.asarray([r.temperature for r in reqs], np.float32)
        top_k = np.asarray([r.top_k for r in reqs], np.int32)
        top_p = np.asarray([r.top_p for r in reqs], np.float32)

        ks_first = 1024
        if len(reqs) and int(top_k.max()) > 1024 and (temp != 0).any():
            ks_first = self.gen.runtime.pick_top_k_subset(
                int(top_k.max()), self.cfg.vocab_size
            )
        first, rngs_next = self._first_jit(
            first_logits, jax.device_put(rngs), temp, top_k, top_p,
            k_subset=ks_first,
        )
        first_np = np.asarray(first)
        budgets = np.asarray(
            [min(r.max_new, self.token_bucket) for r in reqs], np.int32
        )
        done_new = np.array(
            [
                bool(first_np[j] in self._eos_ids or budgets[j] <= 1)
                for j in range(bg)
            ]
        )
        dyn = (self._counts_d, self._done_d, self._cur_d, self._rngs_d)
        if self.paged:
            ps = self.page_size
            npg = kv_group[0].shape[3] // ps
            dst = np.zeros(bg * npg, np.int32)  # unused entries -> trash page
            for i, pages in enumerate(pages_per_req):
                dst[i * npg : i * npg + len(pages)] = pages
                s = slots_np[i]
                self._page_table[s, :] = 0
                self._page_table[s, : len(pages)] = pages
                self._pp[s] = len(pages)
                self._dp_alloc[s] = 0
                self._paused[s] = False
            out = self._admit_jit(
                self._keys, self._values, self._tokens, *dyn,
                kv_group[0], kv_group[1], jax.device_put(dst), slots_np,
                first, rngs_next, done_new,
            )
        else:
            out = self._admit_jit(
                self._keys, self._values, self._tokens, *dyn,
                kv_group[0], kv_group[1], slots_np,
                first, rngs_next, done_new,
            )
        (
            self._keys, self._values, self._tokens,
            self._counts_d, self._done_d, self._cur_d, self._rngs_d,
        ) = out

        for j, (s, r) in enumerate(zip(slots_np, reqs)):
            self._live[s] = True
            self._counts[s] = 1
            self._prompt_len[s] = len(r.prompt)
            self._max_new[s] = int(budgets[j])
            self._cur[s] = first_np[j]
            self._temp[s] = r.temperature
            self._top_k[s] = r.top_k
            self._top_p[s] = r.top_p
            self._rep_pen[s] = r.repetition_penalty
            self._rep_ctx[s] = r.repetition_context_size
            self._meta[s] = r
            self._done[s] = bool(done_new[j])
        self._ctl_dirty = True
        self.stats.admitted += bg
        return rejected

    def _ensure_decode_pages(
        self, k: int, allow_force_finish: bool = True
    ) -> np.ndarray:
        """Lazily grow each live slot's decode pages to cover ``k`` more
        tokens this chunk.

        Returns the runnable mask.  A slot that cannot get enough pages is
        PAUSED (keeps its state; resumes when retirements free pages).  If
        nothing can run and nothing is retirable, the deepest sequence is
        force-finished (truncated, logged) so the pool always drains —
        unless ``allow_force_finish`` is False (used for the provisional
        spec-sized planning pass, whose failure downgrades the chunk to
        plain instead of truncating anything).
        """
        from ..utils.telemetry import logger

        ps = self.page_size
        max_dp = -(-self.token_bucket // ps)
        want = np.nonzero(self._live & ~self._done)[0]
        for s in want:
            rows = int(min(self._counts[s] + k - 1, self._max_new[s] - 1))
            dp_need = min(-(-max(rows, 1) // ps), max_dp)
            while self._dp_alloc[s] < dp_need and self._free_pages:
                page = self._free_pages.pop()
                self._page_table[s, self._pp[s] + self._dp_alloc[s]] = page
                self._dp_alloc[s] += 1
                self._ctl_dirty = True
            paused = self._dp_alloc[s] < dp_need
            if paused != self._paused[s]:
                self._ctl_dirty = True
            self._paused[s] = paused
        runnable = self._live & ~self._done & ~self._paused
        if allow_force_finish and not runnable.any() and len(want) and not (
            self._live & self._done
        ).any():
            deepest = want[np.argmax(self._counts[want])]
            logger.warning(
                "page pool exhausted with no retirable work: force-"
                "finishing slot %d at %d tokens (transcript truncated); "
                "grow n_pages=%d", deepest, self._counts[deepest], self.n_pages,
            )
            self._done[deepest] = True
            self._ctl_dirty = True
        return self._live & ~self._done & ~self._paused

    def _refresh_ctl(self) -> None:
        """Re-upload the per-slot parameter block (admission/retirement/page
        events only — NOT per chunk)."""
        # Fold host ``done`` into the mask: it is a superset of device
        # ``done`` (force-finished slots are marked done host-side only).
        mask = self._live & ~self._done
        if self.paged:
            mask &= ~self._paused
        small = (
            mask, self._prompt_len, self._max_new, self._temp,
            self._top_k, self._top_p, self._rep_pen, self._rep_ctx,
        )
        if self.paged:
            self._ctl_d = (
                jax.device_put(self._page_table),
                *map(jax.device_put, small),
            )
        else:
            self._ctl_d = tuple(map(jax.device_put, small))
        self._ctl_dirty = False

    def _plan_chunk_spec(self, greedy: bool):
        """(gamma, ngram_n) when this chunk should run speculative verify
        iterations, else None.  Requires: all-greedy chunk; flat engines
        must be bf16 KV (the flat verify path's span writer has no int8
        variant), paged engines take bf16 AND int8 pools (per-row writers
        re-quantize) but need the T x group verify rows to fit the
        kernel's QPAD sublane pad; and — under "auto" — an engine within
        its mode's measured-profitable width (flat: n_slots <=
        spec_engine_max_slots, where the XLA verify split stays
        weight-stream bound; paged: <= spec_engine_max_slots_paged, a
        higher ceiling because the verify kernel rides the sublane pad —
        1.90x measured at n_slots=16, docs/PERFORMANCE.md)."""
        if not greedy:
            return None
        rt = self.gen.runtime
        if self.paged:
            from ..ops.pallas.decode_attention_paged import _QPAD

            group = (
                self.cfg.num_attention_heads // self.cfg.num_key_value_heads
            )
            if (rt.spec_gamma + 1) * group > _QPAD:
                return None
            limit = getattr(rt, "spec_engine_max_slots_paged", 32)
        elif self.kv_dtype == "int8":
            return None
        else:
            limit = rt.spec_engine_max_slots
        mode = getattr(rt, "spec_engine", "off")
        if mode == "on" or (mode == "auto" and self.n_slots <= limit):
            return (rt.spec_gamma, rt.spec_ngram)
        return None

    def step(self, k_steps: int | None = None) -> None:
        """Run one compiled decode chunk over every live slot.

        Steady state is ONE dispatch plus ONE packed (2, n_slots) status
        fetch; all other state stays resident on the device."""
        k = k_steps or self.chunk_steps
        if self.paged:
            # Spec chunks advance up to gamma+1 tokens per iteration, so
            # page planning must cover the full potential emission.  The
            # spec-sized pass is PROVISIONAL (no force-finish): if the
            # bigger demand pauses any slot a plain chunk could run, the
            # chunk downgrades to plain-sized planning instead of
            # pausing — or worse, truncating — work the smaller demand
            # satisfies.
            pre_mask = self._live & ~self._done
            pre_greedy = bool((self._temp[pre_mask] == 0).all())
            pre_spec = self._plan_chunk_spec(pre_greedy)
            if pre_spec is not None:
                runnable = self._ensure_decode_pages(
                    k * (pre_spec[0] + 1), allow_force_finish=False
                )
                if self._paused.any():
                    pre_spec = None
            if pre_spec is None:
                runnable = self._ensure_decode_pages(k)
            if not runnable.any():
                return
        if self._ctl_dirty:
            self._refresh_ctl()
        if self.paged and self._live.any():
            # Retirement compacts live slots into a prefix, so the chunk
            # can run at the narrowest compiled width covering them.
            hi = int(np.nonzero(self._live)[0][-1]) + 1
            width = next(w for w in self._widths if w >= hi)
        else:
            width = self.n_slots
        # Per-chunk static sizing (mirrors Generator.decode): the window /
        # candidate-subset buckets covering the widest live request, so
        # arbitrary repetition_context_size / top_k are honored exactly up
        # to the largest configured bucket.  Bucketing keeps the compiled-
        # program count bounded; the serving warm-up covers the defaults
        # and rarer buckets compile on first use.
        mask = self._live & ~self._done
        greedy = bool((self._temp[mask] == 0).all())
        runtime = self.gen.runtime
        rep_window = runtime.rep_window
        if mask.any() and (self._rep_pen[mask] != 1.0).any():
            rep_window = runtime.pick_rep_window(
                int(self._rep_ctx[mask].max()), self.token_bucket
            )
        k_subset = 1024
        if not greedy and mask.any():
            top_k_max = int(self._top_k[mask].max())
            k_subset = runtime.pick_top_k_subset(
                top_k_max if top_k_max > 0 else 1024, self.cfg.vocab_size
            )
        spec = self._plan_chunk_spec(greedy)
        if self.paged and spec is not None and pre_spec is None:
            # A force-finish inside _ensure_decode_pages flipped the chunk
            # to all-greedy AFTER pages were planned for plain steps; run
            # this chunk plain so accepted rows never outrun allocation.
            spec = None
        out = self._step_chunk_jit(
            self.gen.params,
            self._keys, self._values, self._tokens,
            self._counts_d, self._done_d, self._cur_d, self._rngs_d,
            *self._ctl_d,
            k_steps=k,
            greedy=greedy,
            width=width,
            rep_window=rep_window,
            k_subset=k_subset,
            spec=spec,
        )
        (
            self._keys, self._values, self._tokens,
            self._counts_d, self._done_d, self._cur_d, self._rngs_d,
            status,
        ) = out
        counts_before = self._counts
        active_before = mask
        st = np.asarray(status)
        self._counts = st[0].copy()
        self._done = st[1].astype(bool)
        self.stats.chunks += 1
        self.stats.steps += int((self._counts - counts_before).max(initial=0))
        if spec is not None:
            self.stats.spec_chunks += 1
            # st[2] is the spec bodies' per-lane verify-forward counter:
            # iterations a lane was live and not done — the honest
            # denominator (the scan shape pads with no-op iterations).
            self.stats.spec_lane_steps += int(st[2].sum())
            self.stats.spec_lane_tokens += int(
                (self._counts - counts_before)[active_before].sum()
            )
        self.stats.occupancy_sum += self.n_active() + int(
            (self._live & self._done).sum()
        )

    def retire(self) -> list[tuple[SlotRequest, list[int]]]:
        """Harvest finished sequences; free their slots; return token lists."""
        finished = np.nonzero(self._live & self._done)[0]
        if len(finished) == 0:
            return []
        rows = np.asarray(self._tokens[jnp.asarray(finished)])
        out = []
        for row, s in zip(rows, finished):
            req = self._meta[s]
            toks = row[: self._counts[s]].tolist()
            out.append((req, toks))
            self._live[s] = False
            self._done[s] = True
            self._counts[s] = 1
            self._prompt_len[s] = 0
            self._cur[s] = 0
            self._meta[s] = None
            if self.paged:
                n_owned = int(self._pp[s] + self._dp_alloc[s])
                self._free_pages.extend(
                    int(p) for p in self._page_table[s, :n_owned] if p != 0
                )
                self._page_table[s, :] = 0
                self._pp[s] = 0
                self._dp_alloc[s] = 0
                self._paused[s] = False
        self._ctl_dirty = True
        if self.paged:
            self._compact()
        self.stats.retired += len(out)
        return out

    def _compact(self) -> None:
        """Move the highest live slot down into each freed hole so live
        slots always occupy a prefix — the next chunk then runs at the
        narrowest compiled width that covers them.  Paged mode only: the
        cache is page-indirected, so a slot move is a page-table row swap
        plus a few small device rows, never a KV copy."""
        while True:
            live_idx = np.nonzero(self._live)[0]
            if len(live_idx) == 0:
                return
            hi = int(live_idx[-1])
            holes = np.nonzero(~self._live[:hi])[0]
            if len(holes) == 0:
                return
            dst, src = int(holes[0]), hi
            for a in (
                self._live, self._done, self._counts, self._prompt_len,
                self._max_new, self._cur, self._temp, self._top_k,
                self._top_p, self._rep_pen, self._rep_ctx,
                self._pp, self._dp_alloc, self._paused,
            ):
                a[dst] = a[src]
            self._meta[dst] = self._meta[src]
            self._page_table[dst, :] = self._page_table[src, :]
            self._live[src] = False
            self._done[src] = True
            self._meta[src] = None
            self._page_table[src, :] = 0
            self._pp[src] = 0
            self._dp_alloc[src] = 0
            self._paused[src] = False
            (
                self._tokens, self._counts_d, self._done_d,
                self._cur_d, self._rngs_d,
            ) = self._move_jit(
                self._tokens, self._counts_d, self._done_d,
                self._cur_d, self._rngs_d,
                jnp.int32(src), jnp.int32(dst),
            )
            self._ctl_dirty = True
