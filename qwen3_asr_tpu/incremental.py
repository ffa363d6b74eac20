"""Incremental prefix encoding for live streams (true streaming ASR).

``StreamingTranscriber.partial()`` originally re-ran the ENTIRE
un-finalized tail through mel -> encoder -> prefill on every call.  The
model's structure makes that unnecessary (ROADMAP round-3 feature):

  * the encoder's attention is block-diagonal over 104-token windows of
    800 mel frames (8 s), so a completed window's features are final the
    moment its frames exist (reference windowing: encoder.py:209-229);
  * the decoder is causal, so the K/V rows of already-encoded audio
    tokens never change when more audio arrives — the decoder prefix
    advances one window at a time with a multi-token cached forward.

One exactness trap: the mel dynamic-range clamp is GLOBAL per clip
(``max(log_mel, clip_max - 8)``, reference audio.py:274-276) — a louder
sound later in the stream lifts the clamp floor and retroactively
changes earlier frames' sub-floor bins.  The session therefore caches
each window's UNCLAMPED log-mel plus its min/max, tracks the running
clip max, and re-encodes (and re-advances the decoder from) any window
whose cached features the new floor would actually change
(``min_raw < floor``).  With that reconciliation each ``preview()`` is
token-identical to ``model.transcribe`` of the same audio prefix
(pinned by tests/test_incremental.py on the f32 tiny model; on TPU the
cached-advance einsum path vs the prefill flash kernel differ within
bf16 rounding).

Per-preview device work is therefore: mel+encode of the ONE incomplete
tail window, a <=104-token cached advance, a ~16-token suffix advance,
and the decode loop — instead of a full prefill over the whole tail.

No reference counterpart (strictly batch transcription, model.py:194).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .audio.mel import (
    HOP_LENGTH,
    N_FFT,
    N_MELS,
    SAMPLE_RATE,
    _mel_finalize,
    _mel_raw,
)

#: Encoder attention window: 800 mel frames = 8 s = 104 audio tokens.
WINDOW_FRAMES = 800
WINDOW_SAMPLES = WINDOW_FRAMES * HOP_LENGTH
#: Static suffix-advance length (covers the chat-template suffix + any
#: language name's tokens; asserted per session).
SUFFIX_PAD = 16
#: Static prefix length bucket (the chat prefix is 9 ids).
PREFIX_PAD = 16


@partial(jax.jit, static_argnames=("n_frames",))
def _mel_window_raw(padded, n_valid, n_frames):
    """UNCLAMPED log-mel of one window + masked max/min over valid frames.

    ``padded`` is the exact-context sample buffer (length
    ``(n_frames - 1) * hop + n_fft``): real neighboring samples where the
    stream has them, the reference's reflect padding at the stream edges
    — so every valid frame is bit-identical to the offline pipeline's.
    Raw stage shared with the offline path (audio.mel._mel_raw).
    """
    raw = _mel_raw(padded, N_FFT, HOP_LENGTH, N_MELS)
    frame_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_frames), 1)
    valid = frame_idx < n_valid
    vmax = jnp.max(jnp.where(valid, raw, -jnp.inf))
    vmin = jnp.min(jnp.where(valid, raw, jnp.inf))
    return raw, vmax, vmin


@jax.jit
def _normalize_window(raw, n_valid, global_max):
    """Clip-global clamp + normalization of one cached raw window
    (shared finalize stage: audio.mel._mel_finalize)."""
    return _mel_finalize(raw, n_valid, global_max)


class IncrementalSession:
    """Decoder-prefix-cached live transcription over a growing stream.

    ``feed`` buffers samples and commits completed 8 s encoder windows
    (mel -> encode -> decoder K/V advance, each exactly once barring
    clamp-floor invalidation); ``preview`` encodes only the incomplete
    tail window, advances the prompt suffix, and decodes — returning the
    transcript of everything fed so far.

    Restrictions (falls back are the caller's job): bf16 KV cache,
    non-speculative, single chip, audio up to ``max_duration``.
    """

    def __init__(
        self,
        model,
        max_duration: float = 30.0,
        language=None,
        max_tokens: int | None = None,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.2,
        repetition_context_size: int = 100,
        seed: int = 0,
    ) -> None:
        gen = model._generator
        rt = gen.runtime
        if rt.kv_cache_dtype != "bf16" or rt.speculative == "ngram":
            raise ValueError(
                "incremental sessions require the bf16 cache and "
                "non-speculative decoding"
            )
        if rt.dp * rt.tp > 1:
            raise ValueError(
                "incremental sessions are single-chip (the per-session "
                "prefix cache is unsharded); use the continuous server "
                "on meshes"
            )
        self._model = model
        self._gen = gen
        self._cfg = model._config
        want_frames = int(max_duration * SAMPLE_RATE) // HOP_LENGTH
        bucket = model._mel.bucket_for(int(max_duration * SAMPLE_RATE))
        if want_frames > bucket:
            # bucket_for clamps to the largest bucket; failing here beats
            # a surprise ValueError from feed() mid-stream.
            raise ValueError(
                f"max_duration {max_duration:.0f}s exceeds the largest "
                f"frame bucket ({bucket / 100:.0f}s)"
            )
        if bucket % WINDOW_FRAMES:
            raise ValueError("frame buckets must be multiples of 800")
        self._max_frames = bucket
        enc = self._cfg.audio_encoder
        #: audio tokens per full 800-frame window (104 for the real model).
        self._wtok = (
            WINDOW_FRAMES // enc.chunk_frames * enc.tokens_per_chunk
        )
        atb = (
            bucket // self._cfg.audio_encoder.chunk_frames
            * self._cfg.audio_encoder.tokens_per_chunk
        )
        plan_budget = max_tokens if max_tokens is not None else max(
            256, int(max_duration * 50)
        )
        self._prompt_bucket, self._token_bucket, self._cache_len = gen.plan(
            atb, atb + 2 * SUFFIX_PAD, plan_budget
        )
        self._max_tokens = max_tokens
        self._opts = dict(
            temperature=temperature, top_p=top_p, top_k=top_k,
            repetition_penalty=repetition_penalty,
            repetition_context_size=repetition_context_size, seed=seed,
        )
        lang_name = model._resolve_language(language)
        full = model._tokenizer.build_prompt(0, lang_name)
        self._prefix_ids = full[:9]
        self._suffix_ids = full[9:]
        self._lang_name = lang_name
        if len(self._suffix_ids) > SUFFIX_PAD:
            raise ValueError("prompt suffix exceeds the advance bucket")

        from .models.decoder import init_kv_cache

        dtype = jnp.result_type(gen.params["final_norm"])
        self._kv = init_kv_cache(
            gen.cfg, 1, self._cache_len, dtype
        )
        # Prefix advance: 9 real ids padded to a static 16-token span
        # (rows 9..15 are scratch — the first window/tail advance at slot
        # 9 overwrites them before anything can attend them).
        ids = np.zeros((1, PREFIX_PAD), np.int32)
        ids[0, :9] = self._prefix_ids
        emb = gen.embed_ids(ids)
        self._kv, _ = gen.advance(
            self._kv, emb, np.arange(PREFIX_PAD)[None], 0, 8
        )

        self._samples = np.zeros(0, np.float32)
        # Per committed window: device raw mel, min over valid bins, the
        # clamp floor its features/K-V were last built with.
        self._win_raw: list = []
        self._win_min: list[float] = []
        self._win_floor: list[float] = []
        self._global_max = -np.inf
        self._committed = 0          # committed windows advanced into kv
        self._invalid = False        # poisoned by a mid-preview failure

    def _check_valid(self) -> None:
        if self._invalid:
            raise RuntimeError(
                "session invalidated by a failed preview (the donated KV "
                "cache may be gone); call reset() to start over"
            )

    # -- audio ingestion ----------------------------------------------------

    def feed(self, samples: np.ndarray) -> None:
        self._check_valid()
        samples = np.asarray(samples)
        if samples.dtype == np.int16:
            samples = samples.astype(np.float32) / 32768.0
        if samples.ndim != 1:
            raise ValueError("audio must be 1-D mono")
        self._samples = np.concatenate(
            [self._samples, samples.astype(np.float32)]
        )
        if len(self._samples) // HOP_LENGTH > self._max_frames:
            raise ValueError(
                "session audio exceeds max_duration; finalize and reset"
            )
        # Commit every completed window whose last frame has its full
        # 400-sample STFT context in real samples (frame i spans
        # [i*hop - 200, i*hop + 200)): window w is final once
        # (w+1)*WINDOW_SAMPLES + 40 samples exist.
        while (
            len(self._samples)
            >= (len(self._win_raw) + 1) * WINDOW_SAMPLES + (N_FFT // 2 - HOP_LENGTH)
        ):
            self._ingest_window(len(self._win_raw), WINDOW_FRAMES)

    def _window_buffer(self, w: int) -> np.ndarray:
        """Exact-context sample buffer for window ``w``'s 800 frames.

        buffer[j] = reflect_padded_signal[w*WINDOW_SAMPLES + j] — real
        samples inside the stream, the offline reflect at its edges,
        zeros past the reflection (only read by invalid frames).  Built
        from a LOCAL slice (plus up to 200 reflected edge samples), not
        by reflect-padding the whole history — previews/commits stay
        O(window), not O(stream).
        """
        pad = N_FFT // 2
        buf_len = (WINDOW_FRAMES - 1) * HOP_LENGTH + N_FFT
        sig = self._samples
        n = len(sig)
        lo = w * WINDOW_SAMPLES - pad          # signal coords of buf[0]
        buf = np.zeros(buf_len, np.float32)
        # Real samples.
        s0, s1 = max(lo, 0), min(lo + buf_len, n)
        if s1 > s0:
            buf[s0 - lo : s1 - lo] = sig[s0:s1]
        # Left reflect (first window only): signal[-i] = signal[i].
        if lo < 0 and n >= 2:
            k = -lo                             # samples needed before 0
            if n <= pad:
                # Tiny stream: the offline rule wraps the reflection
                # multiple times (np.pad semantics; audio.mel._host_pad).
                refl = np.pad(sig, pad, mode="reflect")
                m = min(buf_len, len(refl))
                buf[:m] = refl[:m]
                return buf
            take = min(k, n - 1)
            buf[k - take : k] = sig[1 : take + 1][::-1]
        # Right reflect: up to ``pad`` mirrored samples past the end, then
        # zeros (the exact offline rule, audio.mel._host_pad).
        t0 = n - lo
        if n >= 2 and 0 <= t0 < buf_len:
            tail_len = min(buf_len - t0, n - 1, pad)
            if tail_len > 0:
                # Forward slice + reverse: the negative-step form is empty
                # when tail_len == n - 1 (stop == -1 means "end" to numpy)
                # — streams of exactly pad + 1 = 201 samples hit it.
                buf[t0 : t0 + tail_len] = sig[n - 1 - tail_len : n - 1][::-1]
        return buf

    def _ingest_window(self, w: int, n_frames: int) -> None:
        raw, vmax, vmin = _mel_window_raw(
            jnp.asarray(self._window_buffer(w)),
            jnp.int32(n_frames), WINDOW_FRAMES,
        )
        self._win_raw.append(raw)
        self._win_min.append(float(vmin))
        self._win_floor.append(np.nan)       # not yet advanced
        self._global_max = max(self._global_max, float(vmax))

    # -- decoder prefix maintenance ------------------------------------------

    def _advance_window(self, w: int, floor: float) -> None:
        mel = _normalize_window(
            self._win_raw[w], jnp.int32(WINDOW_FRAMES),
            jnp.float32(floor + 8.0),
        )
        feats, _ = self._model._encode(
            self._model._encoder_params, mel[None], jnp.asarray([WINDOW_FRAMES])
        )
        slot = 9 + w * self._wtok
        self._kv, _ = self._gen.advance(
            self._kv, feats.astype(jnp.result_type(self._kv[0])),
            (slot + np.arange(self._wtok))[None], slot, self._wtok - 1,
        )
        self._win_floor[w] = floor

    def _reconcile(self, floor: float) -> None:
        """Commit new windows and re-advance any whose cached features the
        current clamp floor changes (min_raw < floor and floor rose)."""
        start = self._committed
        for w in range(self._committed):
            stale = self._win_min[w] < floor and floor > self._win_floor[w] + 1e-12
            if stale:
                start = w
                break
        for w in range(start, len(self._win_raw)):
            self._advance_window(w, floor)
        self._committed = len(self._win_raw)

    # -- transcription --------------------------------------------------------

    def preview(self):
        """Transcript of all audio fed so far (session state preserved;
        token-identical to ``model.transcribe`` of the same prefix)."""
        from .api import TranscriptionResult

        self._check_valid()
        n_total_frames = len(self._samples) // HOP_LENGTH
        if n_total_frames == 0:
            return TranscriptionResult(
                text="", language="Unknown",
                duration=len(self._samples) / SAMPLE_RATE,
            )
        try:
            return self._preview_impl(n_total_frames)
        except Exception:
            # The advance/decode programs DONATE the session cache on
            # TPU: a failure mid-preview (OOM, interrupt, compile error)
            # may leave self._kv aliasing a deleted buffer and the
            # window floors half-updated.  Poison the session so later
            # calls fail with a clear message instead of an opaque
            # deleted-array error; reset() rebuilds the cache.
            self._invalid = True
            raise

    def _preview_impl(self, n_total_frames: int):
        from .api import TranscriptionResult

        W = len(self._win_raw)
        tail_frames = n_total_frames - W * WINDOW_FRAMES
        gmax = self._global_max
        tail_raw = None
        if tail_frames > 0:
            tail_raw, tmax, _ = _mel_window_raw(
                jnp.asarray(self._window_buffer(W)),
                jnp.int32(tail_frames), WINDOW_FRAMES,
            )
            gmax = max(gmax, float(tmax))
        floor = gmax - 8.0
        self._reconcile(floor)

        n_audio = W * self._wtok
        gen = self._gen
        if tail_raw is not None:
            mel = _normalize_window(
                tail_raw, jnp.int32(tail_frames), jnp.float32(gmax)
            )
            feats, _ = self._model._encode(
                self._model._encoder_params, mel[None],
                jnp.asarray([tail_frames]),
            )
            tail_tokens = self._model._n_audio_tokens(tail_frames)
            slot = 9 + n_audio
            kv, _ = gen.advance(
                self._kv, feats.astype(jnp.result_type(self._kv[0])),
                (slot + np.arange(self._wtok))[None], slot, self._wtok - 1,
            )
            # Reassign immediately: advance donated the old buffer, and
            # the new one still holds the committed prefix (the advance
            # wrote only scratch rows past it).
            self._kv = kv
            n_audio += tail_tokens

        # Suffix advance (scratch rows beyond the suffix stay invisible:
        # they sit at slots >= prompt_len).
        sfx = np.zeros((1, SUFFIX_PAD), np.int32)
        sfx[0, : len(self._suffix_ids)] = self._suffix_ids
        slot = 9 + n_audio
        pos = (slot + np.arange(SUFFIX_PAD))[None]
        kv, first_logits = gen.advance(
            self._kv, gen.embed_ids(sfx), pos, slot,
            len(self._suffix_ids) - 1,
        )
        self._kv = kv
        prompt_len = slot + len(self._suffix_ids)

        o = self._opts
        mode, rep_window, k_subset = gen.plan_statics(
            self._token_bucket, o["temperature"], o["top_k"],
            o["repetition_penalty"], o["repetition_context_size"],
        )
        duration = len(self._samples) / SAMPLE_RATE
        # Reference budget rule per prefix length (model.py:311).
        want = (
            self._max_tokens
            if self._max_tokens is not None
            else max(256, int(duration * 50))
        )
        budget = min(want, self._token_bucket)
        tokens, counts, kv = gen._decode(
            gen.params, self._kv, first_logits,
            jnp.asarray([prompt_len], jnp.int32),
            jnp.asarray([budget], jnp.int32),
            jnp.uint32(o["seed"]), jnp.float32(o["temperature"]),
            jnp.int32(o["top_k"]), jnp.float32(o["top_p"]),
            jnp.float32(o["repetition_penalty"]),
            jnp.int32(o["repetition_context_size"]),
            self._token_bucket, mode, rep_window, k_subset,
        )
        # The decode wrote only decode-region rows (and the donated
        # buffer aliases the output), so the returned cache still holds
        # the committed prefix — keep it for the next preview.
        self._kv = kv
        out = gen.harvest(tokens, counts, 1, [budget], self._token_bucket)
        text, language = self._model._finalize_output(out[0], self._lang_name)
        return TranscriptionResult(
            text=text, language=language, duration=duration
        )

    @property
    def duration(self) -> float:
        return len(self._samples) / SAMPLE_RATE

    def reset(self) -> None:
        """Drop all audio and cached state (the KV buffer is reused,
        unless a failed preview invalidated it — then it is rebuilt)."""
        self._samples = np.zeros(0, np.float32)
        self._win_raw.clear()
        self._win_min.clear()
        self._win_floor.clear()
        self._global_max = -np.inf
        self._committed = 0
        if self._invalid:
            from .models.decoder import init_kv_cache

            gen = self._gen
            dtype = jnp.result_type(gen.params["final_norm"])
            self._kv = init_kv_cache(gen.cfg, 1, self._cache_len, dtype)
            ids = np.zeros((1, PREFIX_PAD), np.int32)
            ids[0, :9] = self._prefix_ids
            self._kv, _ = gen.advance(
                self._kv, gen.embed_ids(ids), np.arange(PREFIX_PAD)[None],
                0, 8,
            )
            self._invalid = False
