"""Autoregressive generation runtime: jitted prefill + on-device decode loop.

The reference drives decoding from Python with two host<->device syncs per
token (generate.py:289-315: ``mx.eval`` + ``.item()``) and a KV cache that
reallocates every step.  Here the whole decode — embedding, 28 layers,
lm head, repetition penalty, top-k/top-p, sampling, EOS detection — is ONE
compiled ``lax.while_loop``; the host syncs once per *transcription* to
fetch the finished token buffer.

Shape discipline: audio-token count, prompt length and token budget are
bucketed; each (audio_bucket, token_bucket) pair compiles once and is
cached by ``jax.jit``.  Sampling parameters are traced scalars, so changing
temperature/top-k/etc. does NOT recompile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RuntimeConfig, TextDecoderConfig
from ..models.decoder import (
    decoder_forward,
    decoder_logits,
    embed_tokens,
    init_kv_cache,
)
from ..ops.quant_kv import is_quantized_kv, kv_seq_len, kv_spec, quantize_kv_cache
from ..ops.sampling import (
    RECENT_PAD_ID,
    recent_token_window,
    sample_logits,
)
from ..tokenizer import EOS_TOKEN_IDS, PROMPT_PREFIX

#: Default static size of the repetition-penalty gather window; requests
#: with a larger ``repetition_context_size`` select a covering bucket from
#: ``RuntimeConfig.rep_window_buckets`` (one compile per bucket ever hit).
REP_WINDOW = 128

_AUDIO_OFFSET = len(PROMPT_PREFIX)  # audio features start at slot 9


class Generator:
    """Compiled prefill/decode programs for one decoder parameter set."""

    def __init__(
        self,
        params,
        cfg: TextDecoderConfig,
        runtime: RuntimeConfig | None = None,
        eos_ids: frozenset[int] = EOS_TOKEN_IDS,
    ) -> None:
        self.params = params
        self.cfg = cfg
        self.runtime = runtime or RuntimeConfig()
        self._eos_ids = np.array(sorted(eos_ids), dtype=np.int32)
        self._prefill = jax.jit(
            self._prefill_impl, static_argnames=("cache_len",)
        )
        # The KV cache (arg 1) is donated: the decode loop reuses the
        # prefill's buffer in place instead of holding input + carry copies
        # (2 x 2.8 GB at the 20-minute bucket — the difference between
        # fitting and OOM on a 16 GB chip).  QWEN3_ASR_DONATE=0 disables
        # (first-execution stall diagnosis, docs/PERFORMANCE.md).
        import os as _os

        donate_ok = _os.environ.get("QWEN3_ASR_DONATE", "1") != "0"
        donate = (1,) if donate_ok and jax.default_backend() == "tpu" else ()
        self._decode = jax.jit(
            self._decode_impl,
            static_argnames=("token_bucket", "mode", "rep_window", "k_subset"),
            donate_argnums=donate,
        )
        # Progressive decode (cold-start bridge): a fixed-K lax.scan
        # program token-identical to the while_loop.  Measured on the
        # axon backend (docs/PERFORMANCE.md round-3 cold start): programs
        # with Pallas calls inside lax.while_loop never RELOAD from the
        # persistent compile cache and their compiles are high-variance
        # (60-990 s), while scan-only programs (the prefill) reload in
        # <1 s.  The first transcription per (shape, mode) therefore runs
        # on the scan bridge while the while-loop program compiles in a
        # background thread; once ready, the steady-state path takes
        # over (the bridge pays a few extra launch round-trips).
        self._decode_start = jax.jit(
            self._decode_start_impl,
            static_argnames=(
                "token_bucket", "mode", "rep_window", "k_subset",
                "bridge_steps",
            ),
            donate_argnums=donate,
        )
        self._decode_resume = jax.jit(
            self._decode_resume_impl,
            static_argnames=(
                "token_bucket", "mode", "rep_window", "k_subset",
                "bridge_steps",
            ),
            donate_argnums=(
                tuple(range(1, 8)) if donate else ()
            ),
        )
        # Speculative decode (RuntimeConfig.speculative; greedy argmax
        # verification by default, rejection-sampling verification for
        # sampled requests when RuntimeConfig.spec_sampling is on).
        self._spec_decode = jax.jit(
            self._spec_decode_impl,
            static_argnames=(
                "token_bucket", "mode", "rep_window", "k_subset",
                "gamma", "ngram_n",
            ),
            donate_argnums=donate,
        )
        # Spec scan-bridge programs (round-4): the speculative while
        # program is pallas-in-while like the plain one, so its first
        # per-shape call used to eat an unmitigated 60-500 s backend
        # compile round.  These fixed-K scans of the SAME spec body are
        # token-identical, compile fast, reload from the persistent
        # cache, and serve while the while program warms in a thread —
        # the same progressive-compile scheme as _decode_start/_resume.
        self._spec_start = jax.jit(
            self._spec_start_impl,
            static_argnames=(
                "token_bucket", "mode", "rep_window", "k_subset",
                "gamma", "ngram_n", "bridge_steps",
            ),
            donate_argnums=donate,
        )
        self._spec_resume = jax.jit(
            self._spec_resume_impl,
            static_argnames=(
                "token_bucket", "mode", "rep_window", "k_subset",
                "gamma", "ngram_n", "bridge_steps",
            ),
            donate_argnums=(
                tuple(range(1, 8)) if donate else ()
            ),
        )
        # Post-prefill int8 cache conversion (RuntimeConfig.kv_cache_dtype
        # = "int8"): one fused read-convert-write pass; the bf16 buffers
        # are donated so peak memory never holds both copies.
        self._quantize_cache = jax.jit(
            quantize_kv_cache,
            donate_argnums=((0,) if donate else ()),
        )
        import threading

        self._compiled_keys: set = set()
        self._compiling_keys: set = set()
        self._bridge_seen: dict = {}   # key -> (kv_specs, B, statics, hits, extra_warm)
        self._compile_lock = threading.Lock()

    # -- incremental prompt advance (streaming sessions) -------------------

    def advance(self, kv, embeds, positions, write_slot, last_index):
        """Append ``T`` prompt tokens to an existing cache (multi-token
        cached forward): K/V rows land at slots ``[write_slot,
        write_slot + T)`` and the returned logits are taken at
        ``last_index`` within the new span.  Used by incremental
        streaming sessions (incremental.py) to extend the decoder prefix
        one encoder window at a time instead of re-prefilling the whole
        tail; the monolithic paths never call this."""
        if not hasattr(self, "_advance_jit"):
            # The cache is donated (on TPU) so the append aliases the
            # session's buffer instead of materializing a second full
            # copy per advance.
            self._advance_jit = jax.jit(
                self._advance_impl,
                donate_argnums=(
                    (1,) if jax.default_backend() == "tpu" else ()
                ),
            )
        return self._advance_jit(
            self.params, kv, embeds,
            jnp.asarray(positions, jnp.int32),
            jnp.int32(write_slot), jnp.int32(last_index),
        )

    def _advance_impl(self, params, kv, embeds, positions, write_slot, last_index):
        B = embeds.shape[0]
        with self._act_quant_ctx():
            hidden, kv = decoder_forward(
                params, self.cfg, embeds, positions, kv,
                write_slots=jnp.broadcast_to(write_slot, (B,)),
                uniform_write=True,
                attn_impl="cache",
            )
            last = hidden[jnp.arange(B), last_index]
            logits = decoder_logits(params, self.cfg, last[:, None, :])[:, 0]
        return kv, logits

    def _act_quant_ctx(self):
        """Trace-time context enabling W8A8 prefill matmuls.

        Active only when BOTH ``quantization="int8"`` (weights are already
        int8) and ``act_quant="int8"`` are set; the row gate inside
        qlinear keeps single-token decode on the weight-only path.  See
        RuntimeConfig.act_quant / ops/quant.py."""
        import contextlib

        from ..ops.quant import act_quant_rows

        if (
            self.runtime.act_quant == "int8"
            and self.runtime.quantization == "int8"
        ):
            return act_quant_rows(self.runtime.act_quant_min_rows)
        return contextlib.nullcontext()

    def embed_ids(self, ids):
        """Embedded token ids (B, T, H) — tiny compiled helper for the
        incremental sessions' prefix/suffix spans."""
        if not hasattr(self, "_embed_jit"):
            self._embed_jit = jax.jit(embed_tokens)
        return self._embed_jit(self.params, jnp.asarray(ids, jnp.int32))

    # -- prefill ----------------------------------------------------------

    def _prefill_impl(self, params, features, ids, n_audio, prompt_len, cache_len):
        """Embed prompt, inject audio features, run the full-prompt forward.

        features: (B, Ta, H) encoder output, valid prefix ``n_audio``;
        ids: (B, Pb) right-padded prompt ids; prompt_len: (B,) true lengths.
        Audio features sit at slots [9, 9 + n_audio) — the chat-template
        prefix is constant, so injection is a slice update + select rather
        than the reference's per-token Python scatter (generate.py:70-74).
        """
        cfg = self.cfg
        B, Pb = ids.shape
        embeds = embed_tokens(params, ids)
        injected = jnp.zeros_like(embeds)
        injected = jax.lax.dynamic_update_slice(
            injected,
            features[:, : Pb - _AUDIO_OFFSET].astype(embeds.dtype),
            (0, _AUDIO_OFFSET, 0),
        )
        slot = jax.lax.broadcasted_iota(jnp.int32, (B, Pb), 1)
        is_audio = (slot >= _AUDIO_OFFSET) & (slot < _AUDIO_OFFSET + n_audio[:, None])
        embeds = jnp.where(is_audio[:, :, None], injected, embeds)

        kv = init_kv_cache(cfg, B, cache_len, embeds.dtype)
        positions = slot
        with self._act_quant_ctx():
            hidden, kv = decoder_forward(params, cfg, embeds, positions, kv)
        last = hidden[jnp.arange(B), prompt_len - 1]
        logits = decoder_logits(params, cfg, last[:, None, :])[:, 0]
        return kv, logits

    # -- decode loop ------------------------------------------------------

    def _decode_impl(
        self,
        params,
        kv,
        first_logits,
        prompt_len,
        max_new,
        seed,
        temperature,
        top_k,
        top_p,
        repetition_penalty,
        repetition_context,
        token_bucket,
        mode="sample",
        rep_window=REP_WINDOW,
        k_subset=1024,
    ):
        """Sample + autoregress until every sequence hits EOS or its budget.

        ``mode`` is static: "greedy" compiles a lean program (penalized
        argmax — no top-k/top-p vocab sorts in the graph at all, matching
        temperature == 0 semantics exactly); "sample" compiles the full
        sampling pipeline with traced temperature/top-k/top-p.

        Returns (tokens (B, token_bucket), counts (B,)).
        """
        state, body, cond = self._decode_setup(
            params, kv, first_logits, prompt_len, max_new, seed,
            temperature, top_k, top_p, repetition_penalty,
            repetition_context, token_bucket, mode, rep_window, k_subset,
        )
        kv, tokens, counts, done, cur, rng, _ = jax.lax.while_loop(
            cond, body, state
        )
        # kv is returned solely so the donated input buffer can alias an
        # output (donation is inert without a matching output) — the caller
        # drops it and the buffer frees immediately.
        return tokens, counts, kv

    def _decode_setup(
        self, params, kv, first_logits, prompt_len, max_new, seed,
        temperature, top_k, top_p, repetition_penalty, repetition_context,
        token_bucket, mode, rep_window, k_subset,
    ):
        """Initial decode state (first token sampled) + body/cond closures.

        Shared by the while_loop program, the fixed-K bridge programs and
        any future chunked variants — ONE definition of the step
        semantics (state: kv, tokens, counts, done, cur, rng, step).
        """
        B = first_logits.shape[0]
        rng = jax.random.PRNGKey(seed)
        is_eos, batch_sample, one_sample, body, cond = self._decode_machinery(
            params, B, kv_seq_len(kv[0]), prompt_len, max_new, temperature,
            top_k, top_p, repetition_penalty, repetition_context,
            token_bucket, mode, rep_window, k_subset,
        )
        # First token: sampled from prefill logits with NO repetition
        # penalty (reference passes recent_tokens=None, generate.py:278-285).
        no_recent = jnp.full((B, 1), RECENT_PAD_ID, jnp.int32)
        rng, sub = jax.random.split(rng)
        keys = jax.random.split(sub, B)
        first = jax.vmap(
            lambda k, l: one_sample(k, l, no_recent[0], 1.0)
        )(keys, first_logits)

        tokens = jnp.zeros((B, token_bucket), jnp.int32)
        tokens = tokens.at[:, 0].set(first)
        counts = jnp.ones((B,), jnp.int32)
        done = is_eos(first) | (counts >= max_new)
        state = (kv, tokens, counts, done, first, rng, jnp.int32(0))
        return state, body, cond

    def _decode_machinery(
        self, params, B, S, prompt_len, max_new, temperature, top_k,
        top_p, repetition_penalty, repetition_context, token_bucket,
        mode, rep_window, k_subset,
    ):
        cfg = self.cfg
        eos = jnp.asarray(self._eos_ids)

        def is_eos(tok):
            return jnp.any(tok[..., None] == eos[None, :], axis=-1)

        rep_ctx = jnp.asarray(repetition_context, jnp.int32)

        def one_sample(key, logits, recent, penalty):
            if mode == "greedy":
                from ..ops.sampling import apply_repetition_penalty

                penalized = apply_repetition_penalty(
                    logits.astype(jnp.float32), recent, penalty
                )
                return jnp.argmax(penalized).astype(jnp.int32)
            return sample_logits(
                key, logits, temperature, top_k, top_p, penalty, recent,
                k_subset=k_subset,
            )

        def batch_sample(rng, logits, recent):
            keys = jax.random.split(rng, B)
            return jax.vmap(
                lambda k, l, r: one_sample(k, l, r, repetition_penalty)
            )(keys, logits, recent)

        def recent_window(tokens, counts):
            # Last rep_window generated ids, sentinel outside the active
            # repetition_context slice (shared impl: ops/sampling.py).
            return recent_token_window(
                tokens, counts, rep_ctx, rep_window, token_bucket
            )

        # Cache layout: [prompt slots 0..Pb) | decode slots Pb..S).  Every
        # live sequence writes the SAME decode slot (Pb + step) each
        # iteration — a dynamic_update_slice, not a per-sequence scatter —
        # while RoPE positions stay per-sequence (prompt_len + count - 1).
        prompt_bucket = S - token_bucket

        def cond(state):
            done = state[3]
            return jnp.any(~done)

        def body(state):
            kv, tokens, counts, done, cur, rng, step = state
            pos = prompt_len + counts - 1  # position of the token being fed
            embeds = embed_tokens(params, cur)[:, None, :]
            # Clamp the write slot / decode end into the cache: the
            # fixed-K bridge programs may run a few iterations past
            # all-done (writes there are dead — tokens/counts are
            # done-masked and the caller drops kv), and those extra
            # steps must not index past S.  A no-op for the while
            # program (it exits the moment every lane is done).
            slot_step = jnp.minimum(prompt_bucket + step, S - 1)
            dend = jnp.minimum(prompt_bucket + step, S)
            hidden, kv_new = decoder_forward(
                params, cfg, embeds, pos[:, None], kv,
                write_slots=jnp.full((B,), slot_step, jnp.int32),
                uniform_write=True,
                decode_ctx=(prompt_len, dend, prompt_bucket),
                unroll_layers=self.runtime.unroll_decode_layers,
            )
            logits = decoder_logits(params, cfg, hidden)[:, 0]

            rng, sub = jax.random.split(rng)
            nxt = batch_sample(sub, logits, recent_window(tokens, counts))

            slot = jnp.clip(counts, 0, token_bucket - 1)
            write = jnp.where(
                done, jnp.take_along_axis(tokens, slot[:, None], axis=1)[:, 0], nxt
            )
            tokens = tokens.at[jnp.arange(B), slot].set(write)
            counts = counts + (~done)
            done = done | is_eos(nxt) | (counts >= max_new)
            cur = jnp.where(done, cur, nxt)
            return kv_new, tokens, counts, done, cur, rng, step + 1

        return is_eos, batch_sample, one_sample, body, cond

    # -- speculative greedy decode ----------------------------------------

    def _spec_machinery(
        self, params, B, S, prompt_len, max_new, temperature, top_k,
        top_p, repetition_penalty, repetition_context, token_bucket,
        mode, rep_window, k_subset, gamma, ngram_n,
    ):
        """body/cond for the speculative loop (greedy or sampled).

        Each iteration: n-gram draft lookup -> ONE verify forward over
        ``gamma + 1`` positions (the decoder's verify-split path) -> a
        static accept chain that emits 1..gamma+1 tokens.

        ``mode == "greedy"``: token-identity with plain greedy holds by
        construction — position ``t``'s argmax is used only when every
        earlier draft token matched the argmax at its own position, so
        the emitted stream is exactly the sequential greedy stream
        (repetition penalty included — the penalty window is recomputed
        after every accepted token, matching the reference order
        /root/reference/src/qwen3_asr_mlx/generate.py:289-315).

        ``mode == "sample"``: rejection-sampling verification
        (ops/sampling.py:spec_verify_sample) — each emitted token is an
        exact draw from the plain sampler's distribution (penalty /
        temperature / top-k / top-p all honored); the chain survives a
        position only when the draft was ACCEPTED there.  Guarantee is
        per-token distribution identity, not per-seed stream identity
        (see RuntimeConfig.spec_sampling).
        """
        from ..ops.sampling import apply_repetition_penalty, spec_verify_sample
        from ..ops.speculative import ngram_draft

        cfg = self.cfg
        eos = jnp.asarray(self._eos_ids)
        T = gamma + 1
        prompt_bucket = S - token_bucket
        rep_ctx = jnp.asarray(repetition_context, jnp.int32)

        def is_eos(tok):
            return jnp.any(tok[..., None] == eos[None, :], axis=-1)

        def recent_window(tokens, counts):
            return recent_token_window(
                tokens, counts, rep_ctx, rep_window, token_bucket
            )

        def cond(state):
            return jnp.any(~state[3])

        def body(state):
            kv, tokens, counts, done, cur, rng, step = state
            draft, dvalid = ngram_draft(
                tokens, counts, n=ngram_n, gamma=gamma
            )
            ids = jnp.concatenate([cur[:, None], draft], axis=1)   # (B, T)
            pos = (prompt_len + counts - 1)[:, None] + jnp.arange(T)[None, :]
            ws = prompt_bucket + counts - 1                        # (B,)
            embeds = embed_tokens(params, ids)
            hidden, kv = decoder_forward(
                params, cfg, embeds, pos, kv,
                write_slots=ws, uniform_write=False,
                decode_ctx=(prompt_len, ws, prompt_bucket),
            )
            logits = decoder_logits(params, cfg, hidden)           # (B,T,V)

            if mode == "sample":
                # Per-(iteration, position, lane) keys, assigned before
                # any outcome is known — the draw at position t is
                # independent of the accept pattern, as the rejection-
                # sampling correctness argument requires.
                rng, sub = jax.random.split(rng)
                pos_keys = jax.random.split(sub, T * B).reshape(T, B, -1)

            # Static accept chain.  ``chain`` marks lanes still emitting at
            # this verify position; it survives position t only when the
            # draft token fed at t+1 equals this position's argmax (greedy)
            # / was accepted by the rejection sampler (sample) — and the
            # lane neither finished nor exhausted its budget.  Draft rows
            # written for rejected positions sit past the lane's new write
            # slot and are overwritten before they can be attended.
            chain = ~done
            for t in range(T):
                win = recent_window(tokens, counts)
                if mode == "greedy":
                    pen = jax.vmap(
                        lambda l, r: apply_repetition_penalty(
                            l, r, repetition_penalty
                        )
                    )(logits[:, t].astype(jnp.float32), win)
                    out_t = jnp.argmax(pen, axis=-1).astype(jnp.int32)
                    acc_t = None
                else:
                    d_t = (
                        jnp.where(dvalid[:, t], draft[:, t], -1)
                        if t < gamma
                        else jnp.full((B,), -1, jnp.int32)
                    )
                    acc_t, out_t = jax.vmap(
                        lambda k, l, r, d: spec_verify_sample(
                            k, l, d, temperature, top_k, top_p,
                            repetition_penalty, r, k_subset=k_subset,
                        )
                    )(pos_keys[t], logits[:, t].astype(jnp.float32), win, d_t)
                emit = chain
                slot = jnp.clip(counts, 0, token_bucket - 1)
                keep = jnp.take_along_axis(
                    tokens, slot[:, None], axis=1
                )[:, 0]
                tokens = tokens.at[jnp.arange(B), slot].set(
                    jnp.where(emit, out_t, keep)
                )
                counts = counts + emit
                newly_done = emit & (is_eos(out_t) | (counts >= max_new))
                done = done | newly_done
                cur = jnp.where(emit & ~done, out_t, cur)
                if t < gamma:
                    if mode == "greedy":
                        chain = (
                            emit & ~newly_done
                            & dvalid[:, t] & (out_t == draft[:, t])
                        )
                    else:
                        chain = emit & ~newly_done & acc_t
            return kv, tokens, counts, done, cur, rng, step + 1

        return body, cond

    def _spec_decode_impl(
        self, params, kv, first_logits, prompt_len, max_new, seed,
        temperature, top_k, top_p, repetition_penalty, repetition_context,
        token_bucket, mode="greedy", rep_window=REP_WINDOW, k_subset=1024,
        gamma=3, ngram_n=2,
    ):
        """Speculative decode: one compiled while_loop whose body verifies
        ``gamma`` drafted tokens per model forward (greedy argmax check or
        rejection sampling per the static ``mode``).  Returns
        ``(tokens, counts, iterations, kv)`` — iterations / counts give
        the measured acceptance rate."""
        state, _, _ = self._decode_setup(
            params, kv, first_logits, prompt_len, max_new, seed,
            temperature, top_k, top_p,
            repetition_penalty, repetition_context, token_bucket,
            mode, rep_window, k_subset,
        )
        body, cond = self._spec_machinery(
            params, first_logits.shape[0], kv_seq_len(kv[0]), prompt_len,
            max_new, temperature, top_k, top_p, repetition_penalty,
            repetition_context, token_bucket, mode, rep_window, k_subset,
            gamma, ngram_n,
        )
        kv, tokens, counts, done, cur, rng, step = jax.lax.while_loop(
            cond, body, state
        )
        return tokens, counts, step, kv

    def _spec_start_impl(
        self, params, kv, first_logits, prompt_len, max_new, seed,
        temperature, top_k, top_p, repetition_penalty, repetition_context,
        token_bucket, mode="greedy", rep_window=REP_WINDOW, k_subset=1024,
        gamma=3, ngram_n=2, bridge_steps=16,
    ):
        """First token + ``bridge_steps`` fixed speculative iterations.

        lax.scan of the spec body instead of lax.while_loop: post-done
        iterations are no-ops on the visible state (``chain = ~done`` is
        all-False, every token/count write is emit-masked, and the kv
        rows rewritten at the frozen write slot recompute identically
        from the unchanged ``cur``/cache prefix), so the emitted stream
        is exactly the while program's.  (In sample mode the post-done
        iterations still advance ``rng``, exactly as the while program
        would not — but by then every lane is done, so no emission can
        observe the difference.)  Returns the resumable state."""
        state, _, _ = self._decode_setup(
            params, kv, first_logits, prompt_len, max_new, seed,
            temperature, top_k, top_p,
            repetition_penalty, repetition_context, token_bucket,
            mode, rep_window, k_subset,
        )
        body, _ = self._spec_machinery(
            params, first_logits.shape[0], kv_seq_len(kv[0]), prompt_len,
            max_new, temperature, top_k, top_p, repetition_penalty,
            repetition_context, token_bucket, mode, rep_window, k_subset,
            gamma, ngram_n,
        )
        state, _ = jax.lax.scan(
            lambda c, _: (body(c), None), state, None, length=bridge_steps
        )
        return state

    def _spec_resume_impl(
        self, params, kv, tokens, counts, done, cur, rng, step,
        prompt_len, max_new, temperature, top_k, top_p,
        repetition_penalty, repetition_context,
        token_bucket, mode="greedy", rep_window=REP_WINDOW, k_subset=1024,
        gamma=3, ngram_n=2, bridge_steps=16,
    ):
        """``bridge_steps`` more speculative iterations from a state."""
        body, _ = self._spec_machinery(
            params, tokens.shape[0], kv_seq_len(kv[0]), prompt_len,
            max_new, temperature, top_k, top_p, repetition_penalty,
            repetition_context, token_bucket, mode, rep_window, k_subset,
            gamma, ngram_n,
        )
        state = (kv, tokens, counts, done, cur, rng, step)
        state, _ = jax.lax.scan(
            lambda c, _: (body(c), None), state, None, length=bridge_steps
        )
        return state

    # -- bridge (progressive-compile) decode programs ---------------------

    def _decode_start_impl(
        self, params, kv, first_logits, prompt_len, max_new, seed,
        temperature, top_k, top_p, repetition_penalty, repetition_context,
        token_bucket, mode="sample", rep_window=REP_WINDOW, k_subset=1024,
        bridge_steps=16,
    ):
        """First token + ``bridge_steps`` fixed decode iterations.

        lax.scan instead of lax.while_loop: extra iterations after
        all-done are no-ops on the visible state (writes are done-masked),
        so the token stream is identical to the while program — but the
        program serializes AND reloads from the persistent compile cache
        (pallas-in-while programs never reload; docs/PERFORMANCE.md).
        Returns the full resumable state.
        """
        state, body, _ = self._decode_setup(
            params, kv, first_logits, prompt_len, max_new, seed,
            temperature, top_k, top_p, repetition_penalty,
            repetition_context, token_bucket, mode, rep_window, k_subset,
        )
        state, _ = jax.lax.scan(
            lambda c, _: (body(c), None), state, None, length=bridge_steps
        )
        return state

    def _decode_resume_impl(
        self, params, kv, tokens, counts, done, cur, rng, step,
        prompt_len, max_new, temperature, top_k, top_p,
        repetition_penalty, repetition_context,
        token_bucket, mode="sample", rep_window=REP_WINDOW, k_subset=1024,
        bridge_steps=16,
    ):
        """``bridge_steps`` more decode iterations from a carried state."""
        *_, body, _cond = self._decode_machinery(
            params, tokens.shape[0], kv_seq_len(kv[0]), prompt_len, max_new,
            temperature, top_k, top_p, repetition_penalty,
            repetition_context, token_bucket, mode, rep_window, k_subset,
        )
        state = (kv, tokens, counts, done, cur, rng, step)
        state, _ = jax.lax.scan(
            lambda c, _: (body(c), None), state, None, length=bridge_steps
        )
        return state

    # -- progressive-compile routing --------------------------------------

    def _use_bridge(self, kv, B: int, statics, spec=None):
        """The (shape, statics) key when the while-loop program is not
        yet compiled and the bridge should serve this request, else
        None.  ``spec`` = (gamma, ngram_n) keys the SPECULATIVE while
        program separately from the plain one.  The background warm
        compile is spawned LATER by :meth:`_decode_bridged` — only after
        the bridge program itself has compiled and produced its first
        chunk, because compiles can serialize on the backend's compile
        service and spawning first would queue the fast bridge compile
        behind the slow while-loop one (measured: exactly inverted
        cold-start behavior)."""
        prog = self.runtime.progressive_decode
        enabled = prog == "on" or (
            prog == "auto" and jax.default_backend() == "tpu"
        )
        if not enabled:
            return None
        key = (B, kv_spec(kv[0]), *statics)
        if spec is not None:
            key = (*key, "spec", *spec)
        with self._compile_lock:
            if key in self._compiled_keys:
                return None
        return key

    def _plan_spec(self, mode: str, batch: int):
        """(gamma, ngram_n) when this request decodes speculatively,
        else None.  "ngram" = every greedy request; "auto" (default) =
        greedy requests at batch <= spec_auto_max_batch — measured
        near-free at B=1 (-5.4% at the zero-acceptance floor, +3.6x at
        the ceiling, tools/spec_bench.py) while large batches are
        attention/FLOP-bound and keep the single-token loop.  Sampled
        requests additionally require the opt-in
        ``RuntimeConfig.spec_sampling`` (rejection-sampling verification
        preserves the sampling distribution but consumes the RNG stream
        differently from the plain sampler — see the config note)."""
        if mode == "sample" and not self.runtime.spec_sampling:
            return None
        if mode not in ("greedy", "sample"):
            return None
        spec = self.runtime.speculative
        if spec == "ngram" or (
            spec == "auto" and batch <= self.runtime.spec_auto_max_batch
        ):
            return (self.runtime.spec_gamma, self.runtime.spec_ngram)
        return None

    def _spawn_warm_compile(
        self, key, kv_specs, B: int, statics, extra_warm=None, spec=None
    ) -> None:
        """Compile the steady-state while program in a daemon thread (a
        dummy max_new=1 run seeds the jit cache — AOT lower().compile()
        does not).  One thread per key.  ``extra_warm`` (optional
        callable) runs afterwards in the same thread — used by the cold
        pipeline to warm the standalone fused prefill too.  ``spec`` =
        (gamma, ngram_n) warms the speculative while program instead."""
        import threading

        with self._compile_lock:
            if key in self._compiled_keys or key in self._compiling_keys:
                return
            self._compiling_keys.add(key)
        vocab = self.cfg.vocab_size

        def warm():
            from ..utils.telemetry import logger

            try:
                specs, treedef = kv_specs
                dummy_kv = jax.tree_util.tree_unflatten(
                    treedef, [jnp.zeros(s, d) for s, d in specs]
                )
                if spec is not None:
                    out = self._spec_decode(
                        self.params, dummy_kv,
                        jnp.zeros((B, vocab), jnp.float32),
                        jnp.zeros((B,), jnp.int32),
                        jnp.ones((B,), jnp.int32),  # max_new=1: 0 trips
                        jnp.uint32(0), jnp.float32(0.0), jnp.int32(0),
                        jnp.float32(1.0), jnp.float32(1.0), jnp.int32(0),
                        *statics, spec[0], spec[1],
                    )
                else:
                    out = self._decode(
                        self.params, dummy_kv,
                        jnp.zeros((B, vocab), jnp.float32),
                        jnp.zeros((B,), jnp.int32),
                        jnp.ones((B,), jnp.int32),   # max_new=1: 0 loop trips
                        jnp.uint32(0), jnp.float32(0.0), jnp.int32(0),
                        jnp.float32(1.0), jnp.float32(1.0), jnp.int32(0),
                        *statics,
                    )
                np.asarray(out[1])  # force the run through the tunnel
                with self._compile_lock:
                    self._compiled_keys.add(key)
                logger.info("decode while-program ready for %s", key[:2])
                if extra_warm is not None:
                    extra_warm()
            except Exception as exc:  # noqa: BLE001 — bridge keeps serving
                logger.warning("background decode compile failed: %s", exc)
            finally:
                with self._compile_lock:
                    self._compiling_keys.discard(key)

        threading.Thread(target=warm, daemon=True).start()

    def wait_background_compiles(self, timeout: float | None = None) -> bool:
        """Force-compile every bridged-but-uncompiled while program and
        block until done (benchmarks / latency-critical serving call
        this after their first request so steady-state runs never race a
        bridge).  Returns False on timeout."""
        import time

        with self._compile_lock:
            pending = [
                (k, v) for k, v in self._bridge_seen.items()
                if k not in self._compiled_keys
            ]
        for key, (kv_specs, B, statics, _, extra_warm, spec) in pending:
            self._spawn_warm_compile(
                key, kv_specs, B, statics, extra_warm=extra_warm, spec=spec
            )
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            with self._compile_lock:
                if not self._compiling_keys:
                    return True
            if deadline is not None and time.monotonic() > deadline:
                return False
            time.sleep(0.25)

    def _decode_bridged(self, kv, first_logits, dyn, statics, key):
        """Serve one decode on the fixed-K scan bridge (host-checked
        early exit between launches).  Token-identical to the while
        program; pays ~(token_bucket / K) launch round-trips.  The
        steady-state while program's background compile is kicked off
        only AFTER the first bridge chunk lands (compiles serialize on
        the backend service — spawning earlier queues the bridge behind
        the slow compile and re-creates the cold start)."""
        token_bucket = statics[0]
        B = first_logits.shape[0]
        leaves, treedef = jax.tree_util.tree_flatten(kv)
        kv_specs = ([(a.shape, a.dtype) for a in leaves], treedef)
        K = max(1, min(self.runtime.bridge_steps, token_bucket))
        state = self._decode_start(
            self.params, kv, first_logits, *dyn, *statics, bridge_steps=K
        )
        done_host = np.asarray(state[3])       # sync: start compiled & ran
        dyn_resume = dyn[:2] + dyn[3:]  # resume takes no seed (rng carried)
        steps = K
        spawned = False
        # The slow while-program compile enters the backend's
        # (serializing, orphanable) compile queue only once BOTH bridge
        # programs have run AND this process has shown it is long-lived
        # (>= 2 decodes on this key): a one-shot CLI process exiting
        # mid-background-compile leaves an orphaned server-side compile
        # that blocks the NEXT process for its full duration (measured:
        # a 1500 s stall).  wait_ready() force-spawns for servers/benches.
        with self._compile_lock:
            prev = self._bridge_seen.get(key, (None, None, None, 0, None, None))
            hits = prev[3] + 1
            # Keep a cold-pipeline-seeded extra_warm (standalone prefill
            # warm) if the same key is later served by the bridge.
            self._bridge_seen[key] = (kv_specs, B, statics, hits, prev[4], None)
        may_spawn = hits >= 2
        while steps < token_bucket - 1 and not bool(done_host.all()):
            state = self._decode_resume(
                self.params, *state, *dyn_resume, *statics, bridge_steps=K
            )
            steps += K
            done_host = np.asarray(state[3])   # sync every chunk (cheap)
            if may_spawn and not spawned:
                self._spawn_warm_compile(
                    key, kv_specs, B, statics, extra_warm=prev[4]
                )
                spawned = True
        if may_spawn and not spawned:
            self._spawn_warm_compile(
                key, kv_specs, B, statics, extra_warm=prev[4]
            )
        return state[1], state[2]

    def _spec_bridged(self, kv, first_logits, dyn, statics, key, spec):
        """Serve one SPECULATIVE decode on the fixed-K scan bridge while
        the spec while program compiles in the background (same
        progressive-compile scheme and hits-counting as
        :meth:`_decode_bridged`).  Token-identical to the spec while
        program; every live lane emits at least one token per iteration,
        so ``ceil(token_bucket / K)`` chunks always suffice."""
        token_bucket = statics[0]
        gamma, ngram_n = spec
        B = first_logits.shape[0]
        leaves, treedef = jax.tree_util.tree_flatten(kv)
        kv_specs = ([(a.shape, a.dtype) for a in leaves], treedef)
        K = max(1, min(self.runtime.bridge_steps, token_bucket))
        spec_statics = (*statics, gamma, ngram_n)
        state = self._spec_start(
            self.params, kv, first_logits, *dyn,
            *spec_statics, bridge_steps=K,
        )
        done_host = np.asarray(state[3])       # sync: start compiled & ran
        chunks = 1
        spawned = False
        with self._compile_lock:
            prev = self._bridge_seen.get(key, (None, None, None, 0, None, None))
            hits = prev[3] + 1
            self._bridge_seen[key] = (
                kv_specs, B, statics, hits, prev[4], spec
            )
        may_spawn = hits >= 2
        max_chunks = -(-token_bucket // K)
        while chunks < max_chunks and not bool(done_host.all()):
            state = self._spec_resume(
                self.params, *state, dyn[0], dyn[1], dyn[3], dyn[4],
                dyn[5], dyn[6], dyn[7],
                *spec_statics, bridge_steps=K,
            )
            chunks += 1
            done_host = np.asarray(state[3])
            if may_spawn and not spawned:
                self._spawn_warm_compile(
                    key, kv_specs, B, statics, extra_warm=prev[4], spec=spec
                )
                spawned = True
        if may_spawn and not spawned:
            self._spawn_warm_compile(
                key, kv_specs, B, statics, extra_warm=prev[4], spec=spec
            )
        # Physical verify forwards (the fixed-K chunks run post-done
        # no-op iterations, which are real forwards — so this may read
        # above the while program's count for the same request).
        self.last_spec_forwards = int(np.asarray(state[6]))
        return state[1], state[2]

    # -- fused cold pipeline routing ---------------------------------------

    def cold_plan(
        self, B: int, cache_len: int, token_bucket: int,
        temperature: float, top_k: int, repetition_penalty: float,
        repetition_context_size: int,
    ):
        """(key, statics, kv_shape, kv_dtype) when the api's fused
        cold-pipeline program should serve this request, else None.

        Round-3 cold-start finding (docs/PERFORMANCE.md): on the axon
        backend every DISTINCT program pays a server-side compile round
        at its first per-process execution — 60-500 s of shared-service
        variance that the client's persistent cache cannot avoid.  TTFT
        is therefore ~(service rounds on the first-call path); fusing
        mel->encoder->prefill->fixed-length-scan-decode into ONE program
        halves it.  The cold program keeps serving until the
        steady-state while program is warm (spawned via note_cold),
        so repeat calls never stall on a bridge compile either.
        """
        rt = self.runtime
        prog = rt.progressive_decode
        enabled = prog == "on" or (
            prog == "auto" and jax.default_backend() == "tpu"
        )
        if not (enabled and rt.cold_fused_first_call):
            return None
        if rt.kv_cache_dtype != "bf16":
            return None
        if rt.dp * rt.tp > 1:
            return None
        if token_bucket - 1 > rt.cold_scan_max_steps:
            return None
        mode, rep_window, k_subset = self.plan_statics(
            token_bucket, temperature, top_k, repetition_penalty,
            repetition_context_size,
        )
        statics = (token_bucket, mode, rep_window, k_subset)
        kv_dtype = jnp.result_type(self.params["final_norm"])
        kv_shape = (
            self.cfg.num_hidden_layers, B, self.cfg.num_key_value_heads,
            cache_len, self.cfg.head_dim,
        )
        key = (B, (tuple(kv_shape), str(jnp.dtype(kv_dtype))), *statics)
        # Speculative greedy requests cold-start on the SAME fused plain-
        # scan program (spec greedy is token-identical to plain greedy by
        # construction) but key — and background-warm — the SPEC while
        # program, so the steady-state handoff lands on the fast path.
        spec = self._plan_spec(mode, B)
        if spec is not None and mode != "greedy":
            # Sampled spec requests skip the fused cold pipeline: the
            # plain-scan cold program consumes the RNG stream differently
            # from the rejection-sampling verifier, so serving the first
            # call on it would make a request's token stream depend on
            # warm-up state.  They ride the spec scan bridge instead
            # (same progressive-compile guarantees).
            return None
        if spec is not None:
            key = (*key, "spec", *spec)
        with self._compile_lock:
            if key in self._compiled_keys:
                return None
        return key, statics, kv_shape, kv_dtype

    def note_cold(
        self, key, B: int, statics, kv_shape, kv_dtype, extra_warm=None,
    ) -> None:
        """Bookkeeping after a cold-pipeline-served request: same
        hits-counting as the bridge (the background while-program warm is
        spawned only once the process has shown it is long-lived — a
        one-shot CLI exiting mid-compile orphans a server-side compile
        that blocks the NEXT process).  ``extra_warm`` runs in the warm
        thread after the while program lands (the api passes a dummy
        fused-prefill run so the steady-state path is fully warm before
        any foreground call needs it)."""
        treedef = jax.tree_util.tree_structure((0, 0))
        kv_specs = (
            [(kv_shape, kv_dtype), (kv_shape, kv_dtype)], treedef
        )
        # Spec-keyed cold requests warm the SPEC while program (the key
        # carries the ("spec", gamma, ngram) suffix from cold_plan).
        spec = self._plan_spec(statics[1], B)
        with self._compile_lock:
            hits = self._bridge_seen.get(key, (None, None, None, 0, None, None))[3] + 1
            self._bridge_seen[key] = (
                kv_specs, B, statics, hits, extra_warm, spec
            )
        if hits >= 2:
            self._spawn_warm_compile(
                key, kv_specs, B, statics, extra_warm=extra_warm, spec=spec
            )

    # -- public API -------------------------------------------------------

    def generate(
        self,
        features: jax.Array,
        n_audio_tokens: int,
        input_ids: list[int],
        max_tokens: int = 8192,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
        repetition_context_size: int = 100,
        seed: int = 0,
    ) -> list[int]:
        """Generate transcription token ids for one clip.

        ``features`` is ``(1, Ta, hidden)`` encoder output (padded bucket);
        ``input_ids`` the full prompt from ``build_prompt``.  Returns
        generated ids including the trailing EOS (reference contract:
        generate.py:289-315).
        """
        return self.generate_batch(
            features,
            [n_audio_tokens],
            [input_ids],
            max_tokens=[max_tokens],
            temperature=temperature,
            top_p=top_p,
            top_k=top_k,
            repetition_penalty=repetition_penalty,
            repetition_context_size=repetition_context_size,
            seed=seed,
        )[0]

    def generate_batch(
        self,
        features: jax.Array,
        n_audio_tokens: list[int],
        input_ids: list[list[int]],
        max_tokens: list[int] | int = 8192,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
        repetition_context_size: int = 100,
        seed: int = 0,
    ) -> list[list[int]]:
        """Decode B clips together in one prefill + one decode program.

        Every sequence carries its own prompt length, token budget and EOS
        state; the decode loop runs until all sequences finish.  This is
        the serving fast path — per-step cost is amortized across the
        batch, and the reference has no counterpart (batch-1 only,
        encoder.py:249-250).
        """
        B = features.shape[0]
        if isinstance(max_tokens, int):
            max_tokens = [max_tokens] * B
        if not (len(input_ids) == len(n_audio_tokens) == len(max_tokens) == B):
            raise ValueError("batch size mismatch between features and prompts")

        prompt_lens = [len(ids) for ids in input_ids]
        prompt_bucket, token_bucket, cache_len = self.plan(
            features.shape[1], max(prompt_lens), max(max_tokens)
        )
        # The prefill forward covers only the trimmed 64-aligned run; the
        # cache itself keeps the 256-aligned bucket geometry (padded by
        # the fresh-prefill path).
        run_len = self.runtime.plan_prefill_run(max(prompt_lens), prompt_bucket)
        ids = self.pack_prompts(input_ids, run_len)

        kv, first_logits = self._prefill(
            self.params,
            features,
            jax.device_put(ids),
            jax.device_put(np.asarray(n_audio_tokens, np.int32)),
            jax.device_put(np.asarray(prompt_lens, np.int32)),
            cache_len,
        )
        return self.decode(
            kv, first_logits, prompt_lens, max_tokens, token_bucket,
            temperature=temperature, top_p=top_p, top_k=top_k,
            repetition_penalty=repetition_penalty,
            repetition_context_size=repetition_context_size, seed=seed,
        )

    # -- planning / decode helpers (shared with the fused API pipeline) ----

    def plan(
        self,
        audio_token_bucket: int,
        max_prompt_len: int,
        max_new_tokens: int,
        batch: int = 1,
    ) -> tuple[int, int, int]:
        """(prompt_bucket, token_bucket, cache_len) for the given shapes.

        The prompt bucket is rounded to a multiple of 256 so prefill can
        use the Pallas flash kernel's tiling (the padded tail is causally
        masked either way).

        The decode region is capped **memory-aware**: the flat
        ``max_decode_slots`` floor is RAISED whenever the KV budget
        (``kv_cache_budget_gb``) allows more slots at this batch size, so
        a token-dense single 20-minute chunk can emit its full
        ``50 * seconds`` reference budget (model.py:311 — ~60k tokens →
        a 32k-slot region fits one chip alongside the prompt) instead of
        being silently truncated at 4096.  Sequences that still exhaust
        the region get the logged warning in :meth:`decode`.
        """
        prompt_bucket = -(-(audio_token_bucket + 32) // 256) * 256
        if max_prompt_len > prompt_bucket:
            raise ValueError(
                f"prompt length {max_prompt_len} exceeds bucket {prompt_bucket}"
            )
        cfg = self.cfg
        # Sized for bf16 rows even under kv_cache_dtype="int8": prefill
        # materializes the full bf16 cache before the one-shot
        # quantization pass, so the bf16 footprint is still the peak.
        # (int8 then runs in half the planned budget — the headroom shows
        # up as more concurrent batches, not more slots per sequence.)
        row_bytes = (
            cfg.num_hidden_layers * cfg.num_key_value_heads
            * cfg.head_dim * 2 * 2
        )
        budget = int(self.runtime.kv_cache_budget_gb * 2**30)
        allowed_mem = budget // (row_bytes * max(batch, 1)) - prompt_bucket
        cap = max(self.runtime.max_decode_slots, allowed_mem)
        want = min(max_new_tokens, cap)
        token_bucket = self.runtime.pick_bucket(want, self.runtime.token_buckets)
        if token_bucket > cap:
            # Bucket rounding must not blow past the memory allowance:
            # take the largest bucket that fits instead.
            fitting = [b for b in self.runtime.token_buckets if b <= cap]
            token_bucket = max(fitting) if fitting else self.runtime.token_buckets[0]
        return prompt_bucket, token_bucket, prompt_bucket + token_bucket

    @staticmethod
    def pack_prompts(input_ids: list[list[int]], prompt_bucket: int) -> np.ndarray:
        ids = np.zeros((len(input_ids), prompt_bucket), dtype=np.int32)
        for b, seq in enumerate(input_ids):
            ids[b, : len(seq)] = seq
        return ids

    def plan_statics(
        self, token_bucket: int, temperature: float, top_k: int,
        repetition_penalty: float, repetition_context_size: int,
    ) -> tuple[str, int, int]:
        """(mode, rep_window, k_subset) — the per-request static sizing.

        The smallest compiled window/subset bucket covering the request
        (one compile per bucket ever hit).  Parity: the reference honors
        arbitrary repetition_context_size and top_k (generate.py:88-141);
        only values beyond the largest configured bucket still clamp,
        with a logged warning.
        """
        from ..utils.telemetry import logger

        rep_window = self.runtime.rep_window
        if repetition_penalty != 1.0:
            rep_window = self.runtime.pick_rep_window(
                repetition_context_size, token_bucket
            )
            if rep_window < min(repetition_context_size, token_bucket):
                logger.warning(
                    "repetition_context_size=%d exceeds the largest "
                    "rep_window bucket (%d) and is clamped; extend "
                    "RuntimeConfig.rep_window_buckets to honor it",
                    repetition_context_size, rep_window,
                )
        k_subset = 1024
        if temperature != 0.0:
            vocab = self.cfg.vocab_size
            want = top_k if top_k > 0 else 1024
            k_subset = self.runtime.pick_top_k_subset(want, vocab)
            if top_k > 0 and k_subset < min(want, vocab):
                logger.warning(
                    "top_k=%d exceeds the largest top_k_subset bucket (%d) "
                    "and is effectively clamped (ops/sampling.py)",
                    top_k, k_subset,
                )
        mode = "greedy" if temperature == 0.0 else "sample"
        return mode, rep_window, k_subset

    def harvest(
        self, tokens, counts, n: int, max_tokens: list[int],
        token_bucket: int,
    ) -> list[list[int]]:
        """Fetch per-sequence token lists + budget-exhaustion warning."""
        from ..utils.telemetry import logger

        tokens_host = np.asarray(tokens)
        counts_host = np.asarray(counts)
        out = [tokens_host[b, : counts_host[b]].tolist() for b in range(n)]
        # A sequence that used every slot without emitting EOS was
        # silently truncated (possible for token-dense audio when
        # max_tokens was clamped by max_decode_slots).
        for b, toks in enumerate(out):
            budget = min(max_tokens[b], token_bucket)
            if (
                len(toks) >= budget
                and toks
                and toks[-1] not in self._eos_ids
                and max_tokens[b] > token_bucket
            ):
                logger.warning(
                    "sequence %d exhausted its %d-token decode budget without "
                    "EOS (requested max_tokens=%d was clamped by "
                    "max_decode_slots=%d); transcript may be truncated",
                    b, budget, max_tokens[b], self.runtime.max_decode_slots,
                )
        return out

    def decode(
        self,
        kv,
        first_logits,
        prompt_lens: list[int],
        max_tokens: list[int],
        token_bucket: int,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
        repetition_context_size: int = 100,
        seed: int = 0,
    ) -> list[list[int]]:
        """Run the compiled decode loop and fetch per-sequence token lists."""
        from ..utils.telemetry import logger

        # Per-call speculative accounting, read by the API layer right
        # after this returns (the model lock serializes callers): verify
        # forwards executed, 0 when the plain loop served the request.
        self.last_spec_forwards = 0

        # Opt-in int8 cache (ops/quant_kv.py): quantize the freshly
        # prefilled bf16 cache once; the decode programs then stream half
        # the KV bytes per step and write fresh rows quantized.
        if self.runtime.kv_cache_dtype == "int8" and not is_quantized_kv(kv[0]):
            kv = self._quantize_cache(kv)

        mode, rep_window, k_subset = self.plan_statics(
            token_bucket, temperature, top_k, repetition_penalty,
            repetition_context_size,
        )
        dyn = (
            jax.device_put(np.asarray(prompt_lens, np.int32)),
            jax.device_put(
                np.asarray([min(m, token_bucket) for m in max_tokens], np.int32)
            ),
            jnp.uint32(seed),
            jnp.float32(temperature),
            jnp.int32(top_k),
            jnp.float32(top_p),
            jnp.float32(repetition_penalty),
            jnp.int32(repetition_context_size),
        )
        statics = (token_bucket, mode, rep_window, k_subset)
        # Speculative decode: greedy requests by default ("auto"), sampled
        # requests too when RuntimeConfig.spec_sampling is on.  Not
        # composable with the int8 CACHE (the verify forward is a
        # multi-token pass; the q8 kernel is single-token).  int8
        # WEIGHTS compose fine — the verify forward dispatches through
        # qlinear like every other path (tools/spec_bench.py --quant
        # measures the pairing).  First calls per shape ride the spec
        # scan bridge while the spec while program warms in the
        # background — same progressive-compile scheme as plain decode.
        spec = self._plan_spec(mode, first_logits.shape[0])
        if spec is not None and not is_quantized_kv(kv[0]):
            key = self._use_bridge(kv, first_logits.shape[0], statics, spec)
            if key is not None:
                tokens, counts = self._spec_bridged(
                    kv, first_logits, dyn, statics, key, spec
                )
                return self.harvest(
                    tokens, counts, len(prompt_lens), max_tokens,
                    token_bucket,
                )
            tokens, counts, iters, _ = self._spec_decode(
                self.params, kv, first_logits, *dyn,
                token_bucket, mode, rep_window, k_subset,
                spec[0], spec[1],
            )
            counts_host = np.asarray(counts)
            self.last_spec_forwards = int(iters)
            B_spec = counts_host.shape[0]
            logger.debug(
                "speculative decode: %d tokens in %d verify iterations "
                "x %d lanes (%.2f tokens/lane-forward)",
                int(counts_host.sum()), int(iters), B_spec,
                float(counts_host.sum()) / max(int(iters) * B_spec, 1),
            )
            tokens_host = np.asarray(tokens)
            return [
                tokens_host[b, : counts_host[b]].tolist()
                for b in range(len(prompt_lens))
            ]
        bridge_key = self._use_bridge(kv, first_logits.shape[0], statics)
        if bridge_key is not None:
            tokens, counts = self._decode_bridged(
                kv, first_logits, dyn, statics, bridge_key
            )
        else:
            tokens, counts, _ = self._decode(
                self.params, kv, first_logits, *dyn, *statics
            )
        return self.harvest(
            tokens, counts, len(prompt_lens), max_tokens, token_bucket
        )
