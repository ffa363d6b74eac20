"""Public API: ``Qwen3ASR`` — load, transcribe, warm up, close.

Surface parity with /root/reference/src/qwen3_asr_mlx/model.py:121-447:
``from_pretrained`` / ``transcribe(audio, language, temperature, top_p,
top_k, repetition_penalty, max_tokens, repetition_context_size,
chunk_duration)`` / ``warm_up`` / ``close`` / context manager /
``TranscriptionResult`` / ``LANGUAGE_MAP``, including the long-form
low-energy chunked path and the ``max(256, 50 * seconds)`` token budget.

TPU differences: ``warm_up`` ahead-of-time compiles the bucketed programs
(the analog of MLX lazy-graph warming, model.py:252-259), and the pipeline
keeps data on device between mel -> encoder -> prefill -> decode with a
single host sync per transcription.
"""

from __future__ import annotations

import gc
import threading
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .audio.io import SAMPLE_RATE, find_split_points, load_audio
from .audio.mel import (
    HOP_LENGTH,
    N_FFT,
    MelFrontend,
    _mel_core,
    host_pad_batch,
)
from .config import ModelConfig, RuntimeConfig
from .models.decoder import init_decoder_params
from .models.encoder import encoder_forward, init_encoder_params
from .models.params import load_checkpoint
from .runtime.generate import Generator
from .tokenizer import EOS_TOKEN_IDS, Tokenizer
from .utils.telemetry import RequestStats, logger, stage_timer

# ISO 639-1 -> full language name (data parity: model.py:28-96).
LANGUAGE_MAP: dict[str, str] = {
    "af": "Afrikaans", "ar": "Arabic", "az": "Azerbaijani", "be": "Belarusian",
    "bg": "Bulgarian", "bn": "Bengali", "bs": "Bosnian", "ca": "Catalan",
    "cs": "Czech", "cy": "Welsh", "da": "Danish", "de": "German",
    "el": "Greek", "en": "English", "es": "Spanish", "et": "Estonian",
    "fa": "Persian", "fi": "Finnish", "fr": "French", "gl": "Galician",
    "gu": "Gujarati", "he": "Hebrew", "hi": "Hindi", "hr": "Croatian",
    "hu": "Hungarian", "hy": "Armenian", "id": "Indonesian", "is": "Icelandic",
    "it": "Italian", "ja": "Japanese", "ka": "Georgian", "kk": "Kazakh",
    "kn": "Kannada", "ko": "Korean", "lt": "Lithuanian", "lv": "Latvian",
    "mk": "Macedonian", "ml": "Malayalam", "mn": "Mongolian", "mr": "Marathi",
    "ms": "Malay", "my": "Burmese", "ne": "Nepali", "nl": "Dutch",
    "no": "Norwegian", "pa": "Punjabi", "pl": "Polish", "pt": "Portuguese",
    "ro": "Romanian", "ru": "Russian", "si": "Sinhala", "sk": "Slovak",
    "sl": "Slovenian", "sq": "Albanian", "sr": "Serbian", "sv": "Swedish",
    "sw": "Swahili", "ta": "Tamil", "te": "Telugu", "th": "Thai",
    "tl": "Filipino", "tr": "Turkish", "uk": "Ukrainian", "ur": "Urdu",
    "uz": "Uzbek", "vi": "Vietnamese", "zh": "Chinese",
}


@dataclass
class TranscriptionResult:
    """Result of a transcription call."""

    text: str
    language: str
    duration: float


def _enable_compile_cache(cache_dir: str) -> None:
    """Point JAX's persistent compile cache at ``cache_dir`` (expanded)
    unless disabled ("") or one is already configured.

    Round-3 cold-start finding (tools/coldstart_probe.py): the fused
    prefill program costs 38-45 s of XLA compile per process but reloads
    from the serialized cache in ~0.2 s; decode programs serialize too.
    The reference's analog is ``warm_up`` (model.py:252-259) — MLX has
    no cross-process compile cost at all, so matching its seconds-scale
    cold start on XLA requires persistence.
    """
    if not cache_dir:
        return
    try:
        import os

        current = jax.config.jax_compilation_cache_dir
        if not current:
            jax.config.update(
                "jax_compilation_cache_dir", os.path.expanduser(cache_dir)
            )
    except Exception as exc:  # noqa: BLE001 — cache is best-effort
        logger.debug("compile cache unavailable: %s", exc)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("lo",))
def _write_cache_slice(full, part, lo: int):
    """In-place (donated) batch-slice write into the full KV buffer."""
    return jax.lax.dynamic_update_slice(full, part, (0, lo, 0, 0, 0))


def _validate_samples(audio) -> np.ndarray:
    """1-D mono samples: float32, or int16 PCM (kept as int16 so the
    host->device transfer ships half the bytes; the device applies the
    exact reference scaling x/32768 — audio.py:147)."""
    arr = np.asarray(audio)
    if arr.dtype != np.int16:
        arr = arr.astype(np.float32)
    if arr.ndim != 1:
        raise ValueError(
            f"Audio array must be 1-D (mono), got shape {arr.shape}"
        )
    return arr


class Qwen3ASR:
    """Qwen3-ASR speech-to-text on TPU.

    Examples
    --------
    >>> model = Qwen3ASR.from_pretrained("/path/to/Qwen3-ASR-1.7B")
    >>> print(model.transcribe("audio.wav").text)
    """

    def __init__(
        self,
        config: ModelConfig,
        encoder_params,
        decoder_params,
        tokenizer: Tokenizer,
        runtime: RuntimeConfig | None = None,
    ) -> None:
        self._config = config
        self._runtime = runtime or RuntimeConfig()
        _enable_compile_cache(self._runtime.compile_cache_dir)
        if self._runtime.dp * self._runtime.tp > 1:
            from .models.decoder import set_spmd
            from .parallel.mesh import make_mesh

            self._mesh = make_mesh(self._runtime.dp, self._runtime.tp)
            # Mesh execution: decode attention + KV writers run the Pallas
            # kernels per-shard via shard_map (decoder._hbm4_shard_map);
            # everything else shards through GSPMD.
            set_spmd(True, self._mesh)
        else:
            self._mesh = None
        encoder_params, decoder_params = self._transform_params(
            encoder_params, decoder_params
        )
        self._encoder_params = encoder_params
        self._decoder_params = decoder_params
        self._tokenizer = tokenizer
        self._lock = threading.Lock()
        #: Per-request timing/throughput record of the most recent
        #: transcription (observability extension; reference has none).
        self.last_stats: RequestStats | None = None
        self._mel = MelFrontend(self._runtime.frame_buckets)
        self._encode = jax.jit(
            lambda p, mel, nvf: encoder_forward(p, config.audio_encoder, mel, nvf)
        )
        self._generator = Generator(
            decoder_params, config.text_decoder, self._runtime
        )
        self._fused_prefill = jax.jit(
            self._fused_prefill_impl, static_argnames=("n_frames", "cache_len")
        )
        self._cold_pipeline = jax.jit(
            self._cold_pipeline_impl,
            static_argnames=(
                "n_frames", "cache_len", "token_bucket", "mode",
                "rep_window", "k_subset",
            ),
        )

    def _transform_params(self, encoder_params, decoder_params):
        """Storage-layout transforms applied to freshly loaded params:
        QKV/MLP fusion, optional int8 weight quantization, SPMD
        sharding over ``self._mesh``.  Shared by ``__init__`` and
        :meth:`_install_weights` (background-warm loading) so a
        later weight install reproduces the construction layout
        exactly — same pytree, same shapes, same shardings — and every
        already-compiled program stays valid."""
        if self._runtime.fuse_qkv and self._runtime.tp == 1:
            from .models.decoder import fuse_decoder_params

            if "wq" in decoder_params["layers"]:
                decoder_params = fuse_decoder_params(decoder_params)
        if self._runtime.quantization == "int8":
            from .ops.quant import is_quantized, quantize_decoder_params

            if not is_quantized(decoder_params["embedding"]):
                decoder_params = quantize_decoder_params(decoder_params)
            if self._runtime.act_quant == "int8" and not is_quantized(
                encoder_params["layers"]["wq"]
            ):
                # W8A8 prefill mode: the encoder is MXU-bound, so its
                # weights are quantized ONLY when the int8-dot
                # activation path will use them (weight-only int8 is
                # prefill-neutral — measured, docs/PERFORMANCE.md).
                from .ops.quant import quantize_encoder_params

                encoder_params = quantize_encoder_params(encoder_params)
        if self._mesh is not None:
            # SPMD inference: shard parameters over the (dp, tp) mesh;
            # GSPMD propagates shardings through every jitted program and
            # inserts the tp collectives over ICI.  Quantized {"q","s"}
            # trees shard with the same Megatron rules
            # (parallel/sharding.py:_quant_specs).
            from .parallel.sharding import (
                decoder_param_sharding,
                encoder_param_sharding,
                shard_params,
            )

            decoder_params = shard_params(
                decoder_params, decoder_param_sharding(decoder_params, self._mesh)
            )
            encoder_params = shard_params(
                encoder_params, encoder_param_sharding(encoder_params, self._mesh)
            )
        return encoder_params, decoder_params

    def _install_weights(self, encoder_params, decoder_params) -> None:
        """Swap freshly loaded checkpoint weights into a live model.

        Used by ``from_pretrained(warm="background")``: the model is
        constructed zero-initialized (same shapes/dtypes as the
        checkpoint) so program compilation can start immediately, the
        checkpoint load overlaps it, and this swap retargets every
        compiled program at the real weights — jit caches key on
        shape/dtype, not buffer identity, so nothing recompiles."""
        encoder_params, decoder_params = self._transform_params(
            encoder_params, decoder_params
        )
        # No lock: before from_pretrained returns, the only in-flight
        # calls are the warm thread's own (outputs discarded), so a
        # mid-call swap can at worst mix zero/real params in a warm run.
        # Taking the model lock here would instead serialize the install
        # behind the warm call's full client compile — the exact wait
        # background warming exists to remove.
        self._encoder_params = encoder_params
        self._decoder_params = decoder_params
        self._generator.params = decoder_params

    def _fused_prefill_impl(
        self, enc_params, dec_params, padded, n_valid_frames, ids,
        n_audio, prompt_len, n_frames, cache_len,
    ):
        """ONE device program: mel -> encoder -> injection -> prefill.

        The prompt is host-derivable from the audio length alone, so the
        entire prompt-side pipeline fuses into a single XLA launch — one
        RPC/launch per request instead of three, and XLA overlaps the
        stages.  ``padded`` is the (B, L) pre-reflected signal buffer from
        the mel frontend's host pad.
        """
        n_mels = self._config.audio_encoder.num_mel_bins
        mel = jax.vmap(
            lambda p, v: _mel_core(p, v, n_frames, N_FFT, HOP_LENGTH, n_mels)
        )(padded, n_valid_frames)
        features, _ = encoder_forward(
            enc_params, self._config.audio_encoder, mel, n_valid_frames
        )
        return self._generator._prefill_impl(
            dec_params, features, ids, n_audio, prompt_len, cache_len
        )

    def _cold_pipeline_impl(
        self, enc_params, dec_params, padded, n_valid_frames, ids,
        n_audio, prompt_len, max_new, seed, temperature, top_k, top_p,
        repetition_penalty, repetition_context,
        n_frames, cache_len, token_bucket, mode, rep_window, k_subset,
    ):
        """The ENTIRE first transcription as one device program: fused
        prefill + first token + a fixed-``token_bucket - 1``-step scan
        decode (token-identical to the while program — post-done
        iterations are write-masked, same body closure).

        Why one program: on the axon backend each distinct program's
        first per-process execution pays a server-side compile round with
        60-500 s shared-service variance that the client's persistent
        cache cannot avoid (measured in docs/PERFORMANCE.md round-3 cold
        start) — TTFT is the number of rounds on the first-call path
        times that variance, so prefill + decode fused into one program
        halves it.  Returns (tokens, counts).
        """
        kv, first_logits = self._fused_prefill_impl(
            enc_params, dec_params, padded, n_valid_frames, ids,
            n_audio, prompt_len, n_frames, cache_len,
        )
        gen = self._generator
        state, body, _ = gen._decode_setup(
            dec_params, kv, first_logits, prompt_len, max_new, seed,
            temperature, top_k, top_p, repetition_penalty,
            repetition_context, token_bucket, mode, rep_window, k_subset,
        )
        state, _ = jax.lax.scan(
            lambda c, _: (body(c), None), state, None,
            length=token_bucket - 1,
        )
        return state[1], state[2]

    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_id_or_path: str | Path,
        runtime: RuntimeConfig | None = None,
        dtype=jnp.bfloat16,
        warm: str = "off",
        warm_deployment: dict | None = None,
        **kwargs,
    ) -> "Qwen3ASR":
        """Load from a local directory or a HuggingFace Hub repo id.

        ``warm="background"`` takes the client-side program compile off
        the cold-start critical path: the model is constructed
        zero-initialized (checkpoint shapes are known from the config
        alone), a daemon thread immediately starts :meth:`warm_up` for
        ``warm_deployment`` (default: one 30 s clip, batch 1, 128
        tokens), and the checkpoint read/upload overlaps that compile;
        the real weights are swapped in when the load finishes (jit
        caches key on shape/dtype, so nothing recompiles).  TTFT then
        ≈ max(compile, load) + one backend round instead of their sum —
        and with a pre-seeded persistent compile cache
        (tools/seed_compile_cache.py) the compile term collapses to a
        seconds-scale cache reload, leaving ≈ load + one backend round.
        The reference's analog is its seconds-scale ``warm_up``
        (model.py:252-259); on this backend the compile round is the
        cold-start cost, so overlap is the lever.
        """
        if warm not in ("off", "background"):
            raise ValueError(f"warm must be 'off' or 'background', got {warm!r}")
        path = Path(model_id_or_path)
        if not path.is_dir():
            from huggingface_hub import snapshot_download

            path = Path(snapshot_download(repo_id=str(model_id_or_path), **kwargs))

        config = ModelConfig.from_pretrained(path)
        tokenizer = Tokenizer(path)
        if warm == "background":
            model = cls.from_random(
                config, tokenizer=tokenizer, runtime=runtime, dtype=dtype,
                seed=None,
            )
            dep = warm_deployment or {
                "durations": (30.0,), "batch_sizes": (1,),
                "max_tokens": (128,),
            }

            def _warm() -> None:
                try:
                    model.warm_up(deployment=dep)
                except Exception as exc:  # noqa: BLE001 — warm is advisory
                    logger.warning("background warm_up failed: %s", exc)

            t = threading.Thread(
                target=_warm, name="qwen3-asr-warm", daemon=True
            )
            t.start()
            model._warm_thread = t
            # The checkpoint read + device upload overlaps the compile.
            enc, dec = load_checkpoint(path, config, dtype=dtype)
            model._install_weights(enc, dec)
            return model
        enc, dec = load_checkpoint(path, config, dtype=dtype)
        return cls(config, enc, dec, tokenizer, runtime)

    @classmethod
    def from_random(
        cls,
        config: ModelConfig | None = None,
        tokenizer: Tokenizer | None = None,
        runtime: RuntimeConfig | None = None,
        dtype=jnp.bfloat16,
        seed: int | None = 0,
    ) -> "Qwen3ASR":
        """Randomly initialized model (benchmarks / tests without weights).

        ``seed=None`` zero-initializes instead — much faster to materialize
        (no per-shape RNG programs) and timing-equivalent for benchmarks.
        """
        config = config or ModelConfig()
        rng = None if seed is None else jax.random.PRNGKey(seed)
        enc = init_encoder_params(config.audio_encoder, rng, dtype)
        dec = init_decoder_params(config.text_decoder, rng, dtype)
        return cls(config, enc, dec, tokenizer, runtime)

    # ------------------------------------------------------------------

    def transcribe(
        self,
        audio: str | Path | np.ndarray,
        language: Optional[str] = None,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.2,
        max_tokens: Optional[int] = None,
        repetition_context_size: int = 100,
        chunk_duration: float = 1200.0,
        seed: int = 0,
    ) -> TranscriptionResult:
        """Transcribe audio to text.

        ``audio`` is a file path or a 1-D float32 numpy array at 16 kHz.
        Parameter semantics match the reference (model.py:194-238); ``seed``
        additionally pins the sampling PRNG (greedy decoding ignores it).
        """
        with self._lock:
            return self._transcribe_impl(
                audio, language, temperature, top_p, top_k,
                repetition_penalty, max_tokens, repetition_context_size,
                chunk_duration, seed,
            )

    def transcribe_batch(
        self,
        audios: list,
        language: Optional[str] = None,
        temperature: float = 0.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.2,
        max_tokens: Optional[int] = None,
        repetition_context_size: int = 100,
        chunk_duration: float = 1200.0,
        seed: int = 0,
    ) -> list[TranscriptionResult]:
        """Transcribe several clips in ONE batched device program.

        Shared mel frontend, batched encoder, batched prefill and a single
        multi-sequence decode loop (per-clip EOS + token budgets).  No
        reference counterpart — the reference serializes batch work behind
        a lock (model.py:145, 239).

        Clips longer than ``chunk_duration`` seconds take the same
        long-form path as :meth:`transcribe` (low-energy splits, chunk
        groups, stitched text — model.py:382-447 parity); the rest of the
        batch still runs as one device program.
        """
        with self._lock:
            return self._transcribe_batch_impl(
                audios, language, temperature, top_p, top_k,
                repetition_penalty, max_tokens, repetition_context_size,
                chunk_duration, seed,
            )

    def _transcribe_batch_impl(
        self, audios, language, temperature, top_p, top_k,
        repetition_penalty, max_tokens, repetition_context_size,
        chunk_duration, seed,
    ) -> list[TranscriptionResult]:
        lang_name = self._resolve_language(language)

        samples_list: list[np.ndarray] = []
        for audio in audios:
            if isinstance(audio, (str, Path)):
                samples_list.append(load_audio(audio))
            else:
                samples_list.append(_validate_samples(audio))

        live = [i for i, s in enumerate(samples_list) if len(s) > 0]
        results: list[TranscriptionResult] = [
            TranscriptionResult(text="", language="Unknown", duration=0.0)
            for _ in samples_list
        ]
        if not live:
            return results

        # Long-form parity with transcribe(): clips beyond chunk_duration
        # split at low-energy boundaries and run through the shared
        # grouped-chunk path; everything else stays in ONE batched
        # program (the throughput path is untouched when no long clip is
        # present).
        chunk_duration = self._clamp_chunk_duration(chunk_duration)
        chunk_samples = int(chunk_duration * SAMPLE_RATE)
        short_live = [i for i in live if len(samples_list[i]) <= chunk_samples]
        long_live = [i for i in live if len(samples_list[i]) > chunk_samples]

        if short_live:
            batch = [samples_list[i] for i in short_live]
            durations = [len(s) / SAMPLE_RATE for s in batch]
            budgets = [
                max_tokens if max_tokens is not None else max(256, int(d * 50))
                for d in durations
            ]
            token_lists, self.last_stats = self._run_pipeline_batch(
                batch, lang_name, temperature, top_p, top_k,
                repetition_penalty, budgets, repetition_context_size, seed,
            )
            for i, toks, dur in zip(short_live, token_lists, durations):
                text, out_lang = self._finalize_output(toks, lang_name)
                results[i] = TranscriptionResult(
                    text=text, language=out_lang, duration=dur
                )

        if long_live:
            # Pool every long clip's chunks into SHARED groups: two long
            # clips with 3 chunks each on a group-size-8 engine run one
            # device program of 6 sequences, not two of 3.  Per-chunk
            # outputs are order-preserved, so ownership is positional.
            all_chunks: list = []
            owners: list[int] = []
            for i in long_live:
                cs = self._split_long_chunks(samples_list[i], chunk_duration)
                all_chunks.extend(cs)
                owners.extend([i] * len(cs))
            texts, detected = self._run_chunks_grouped(
                all_chunks, lang_name, temperature, top_p, top_k,
                repetition_penalty, repetition_context_size, seed,
            )
            per: dict[int, list[tuple[str, str]]] = {i: [] for i in long_live}
            for own, text, lang in zip(owners, texts, detected):
                if text:
                    per[own].append((text, lang))
            for i in long_live:
                keep = per[i]
                language_out = lang_name if lang_name is not None else (
                    keep[0][1] if keep else "Unknown"
                )
                results[i] = TranscriptionResult(
                    text=" ".join(t for t, _ in keep),
                    language=language_out,
                    duration=len(samples_list[i]) / SAMPLE_RATE,
                )
        return results

    def warm_up(
        self,
        durations: tuple[float, ...] = (0.5,),
        batch_sizes: tuple[int, ...] = (1,),
        max_tokens: int | tuple[int, ...] = 2,
        deployment: dict | None = None,
    ) -> None:
        """AOT-compile shape buckets ahead of serving.

        The default warms the smallest bucket (the reference's semantics:
        one short silent clip, model.py:252-259).  Pass the durations,
        batch sizes and token budgets your deployment will see to pre-pay
        every compile — either directly or as one ``deployment`` dict:

            model.warm_up(deployment={
                "durations": (10.0, 30.0),
                "batch_sizes": (1, 8, 48),
                "max_tokens": (128, 1024),
            })

        Every (duration-bucket, batch, token-bucket) cell compiles its
        mel->encoder->prefill program and decode loop; progress is logged
        per cell so slow first compiles are visible.  With real weights
        silence hits EOS almost immediately, so warming large token
        buckets is cheap (the compile happens regardless of how many
        steps actually run).
        """
        if deployment is not None:
            durations = tuple(deployment.get("durations", durations))
            batch_sizes = tuple(deployment.get("batch_sizes", batch_sizes))
            max_tokens = deployment.get("max_tokens", max_tokens)
        budgets = (
            (max_tokens,) if isinstance(max_tokens, int) else tuple(max_tokens)
        )
        cells = [
            (b, d, m) for b in batch_sizes for d in durations for m in budgets
        ]
        for i, (b, d, m) in enumerate(cells):
            logger.info(
                "warm_up %d/%d: batch=%d duration=%.1fs max_tokens=%d",
                i + 1, len(cells), b, d, m,
            )
            clips = [
                np.zeros(max(1, int(d * SAMPLE_RATE)), dtype=np.float32)
            ] * b
            self.transcribe_batch(clips, max_tokens=m)
        # Under progressive decode the calls above may have been served
        # by the bridge; a warm-up's contract is steady-state readiness.
        self.wait_ready()
        logger.info("warm_up complete: %d program shapes compiled", len(cells))

    def wait_warm(self, timeout: float | None = None) -> bool:
        """Block until a ``from_pretrained(warm="background")`` warm-up
        thread finishes (no-op when not background-warmed).  Returns
        False on timeout."""
        t = getattr(self, "_warm_thread", None)
        if t is None:
            return True
        t.join(timeout)
        return not t.is_alive()

    def wait_ready(self, timeout: float | None = None) -> bool:
        """Block until background decode-program compiles finish
        (progressive decode: the first call per shape runs on the scan
        bridge while the while-loop program compiles in a thread).
        Returns False on timeout."""
        if self._generator is None:
            return True
        return self._generator.wait_background_compiles(timeout)

    def close(self) -> None:
        """Release parameters and device buffers."""
        self._encoder_params = None
        self._decoder_params = None
        if self._generator is not None:
            self._generator.params = None
        self._generator = None
        gc.collect()

    def __enter__(self) -> "Qwen3ASR":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------------

    def _transcribe_impl(
        self, audio, language, temperature, top_p, top_k,
        repetition_penalty, max_tokens, repetition_context_size,
        chunk_duration, seed,
    ) -> TranscriptionResult:
        if isinstance(audio, (str, Path)):
            samples = load_audio(audio)
        else:
            samples = _validate_samples(audio)

        if len(samples) == 0:
            return TranscriptionResult(text="", language="Unknown", duration=0.0)

        duration = len(samples) / SAMPLE_RATE
        if max_tokens is None:
            max_tokens = max(256, int(duration * 50))

        chunk_duration = self._clamp_chunk_duration(chunk_duration)
        if duration > chunk_duration:
            return self._transcribe_chunked(
                samples, duration, language, temperature, top_p, top_k,
                repetition_penalty, repetition_context_size, chunk_duration,
                seed,
            )

        lang_name = self._resolve_language(language)
        text, out_lang = self._run_pipeline(
            samples, lang_name, temperature, top_p, top_k,
            repetition_penalty, max_tokens, repetition_context_size, seed,
        )
        return TranscriptionResult(text=text, language=out_lang, duration=duration)

    def _run_pipeline(
        self, samples, lang_name, temperature, top_p, top_k,
        repetition_penalty, max_tokens, repetition_context_size, seed,
    ) -> str:
        """Fused mel->encoder->prefill program + decode loop for one clip."""
        token_lists, stats_list = self._run_pipeline_batch(
            [samples], lang_name, temperature, top_p, top_k,
            repetition_penalty, [max_tokens], repetition_context_size, seed,
        )
        self.last_stats = stats_list
        return self._finalize_output(token_lists[0], lang_name)

    def _run_pipeline_batch(
        self, samples_list, lang_name, temperature, top_p, top_k,
        repetition_penalty, max_tokens_list, repetition_context_size, seed,
    ):
        """Shared batched core: (token lists, RequestStats for the batch)."""
        gen = self._generator
        B = len(samples_list)
        stats = RequestStats(
            audio_seconds=sum(len(s) for s in samples_list) / SAMPLE_RATE
        )
        # Batch-dim bucketing (RuntimeConfig.batch_bucketing): pad the
        # batch to a bounded set of widths so servers with arrival-driven
        # batch sizes never hit a fresh decode-program compile
        # mid-traffic.  Padding rows are 1-token-budget silence — they
        # finish on the first decode step, so the only cost is lane width.
        B_pad = self._batch_bucket(B)
        if B_pad > B:
            pad_dtype = (
                np.int16
                if all(s.dtype == np.int16 for s in samples_list)
                else np.float32
            )
            samples_list = list(samples_list) + [
                np.zeros(N_FFT, pad_dtype)
            ] * (B_pad - B)
            max_tokens_list = list(max_tokens_list) + [1] * (B_pad - B)
        n_real, B = B, B_pad

        with stage_timer(stats, "prepare"):
            # Transport dtype: when every clip is int16 PCM the batch ships
            # as int16 (half the bytes; device converts with the exact
            # reference scaling).  Mixed batches upcast losslessly.
            if all(s.dtype == np.int16 for s in samples_list):
                transport = samples_list
            else:
                transport = [
                    s.astype(np.float32) / 32768.0
                    if s.dtype == np.int16
                    else s
                    for s in samples_list
                ]
            bucket = max(self._mel.bucket_for(len(s)) for s in samples_list)
            n_valid = [len(s) // HOP_LENGTH for s in samples_list]
            n_audio = [self._n_audio_tokens(v) for v in n_valid]
            prompts = [self._tokenizer.build_prompt(n, lang_name) for n in n_audio]
            prompt_lens = [len(p) for p in prompts]
            stats.n_prompt_tokens = sum(prompt_lens)
            audio_token_bucket = bucket // self._config.audio_encoder.chunk_frames * \
                self._config.audio_encoder.tokens_per_chunk
            prompt_bucket, token_bucket, cache_len = gen.plan(
                audio_token_bucket, max(prompt_lens), max(max_tokens_list),
                batch=B,
            )
            # Prefill runs only the 64-aligned length covering the real
            # prompts; the cache keeps the 256-aligned bucket geometry
            # (the fresh-prefill path pads the built cache to cache_len).
            run_len = self._runtime.plan_prefill_run(
                max(prompt_lens), prompt_bucket
            )
            ids = gen.pack_prompts(prompts, run_len)

        # Fused cold pipeline: while the steady-state decode program is
        # not yet warm, single-group requests run the ENTIRE pipeline as
        # one program — one backend compile round instead of two
        # (prefill + decode); see Generator.cold_plan.
        gs_cold = self._runtime.prefill_group_size or B
        cold = None
        if gs_cold >= B:
            cold = gen.cold_plan(
                B, cache_len, token_bucket, temperature, top_k,
                repetition_penalty, repetition_context_size,
            )
        if cold is not None:
            key, statics, kv_shape, kv_dtype = cold
            with stage_timer(stats, "cold_pipeline"):
                padded = host_pad_batch(transport, bucket, N_FFT, HOP_LENGTH)
                n_valid_np = np.asarray(n_valid, np.int32)
                tokens, counts = self._cold_pipeline(
                    self._encoder_params,
                    self._decoder_params,
                    jax.device_put(padded),
                    jax.device_put(n_valid_np),
                    jax.device_put(ids),
                    jax.device_put(np.asarray(n_audio, np.int32)),
                    jax.device_put(np.asarray(prompt_lens, np.int32)),
                    jax.device_put(
                        np.asarray(
                            [min(m, token_bucket) for m in max_tokens_list],
                            np.int32,
                        )
                    ),
                    jnp.uint32(seed),
                    jnp.float32(temperature),
                    jnp.int32(top_k),
                    jnp.float32(top_p),
                    jnp.float32(repetition_penalty),
                    jnp.int32(repetition_context_size),
                    n_frames=bucket,
                    cache_len=cache_len,
                    token_bucket=statics[0],
                    mode=statics[1],
                    rep_window=statics[2],
                    k_subset=statics[3],
                )
                token_lists = gen.harvest(
                    tokens, counts, B, list(max_tokens_list), token_bucket
                )

            # When the background warm spawns (2nd cold-served call), it
            # also warms the standalone fused prefill this request shape
            # needs once the while program takes over.
            pad_shape, pad_dtype = padded.shape, padded.dtype
            ids_arr = ids

            def _warm_prefill():
                out = self._fused_prefill(
                    self._encoder_params,
                    self._decoder_params,
                    jnp.zeros(pad_shape, pad_dtype),
                    jnp.ones((B,), jnp.int32),
                    jax.device_put(ids_arr),
                    jnp.ones((B,), jnp.int32),
                    jnp.full((B,), max(prompt_lens), jnp.int32),
                    bucket,
                    cache_len,
                )
                np.asarray(out[1])
                logger.info("standalone fused prefill warm for B=%d", B)

            gen.note_cold(
                key, B, statics, kv_shape, kv_dtype,
                extra_warm=_warm_prefill,
            )
            token_lists = token_lists[:n_real]
            stats.n_generated_tokens = sum(len(t) for t in token_lists)
            logger.debug(
                "transcribe stats (batch=%d, cold): %s", B, stats.as_dict()
            )
            return token_lists, stats

        with stage_timer(stats, "prefill"):
            # The prefill runs in sub-groups dispatched back-to-back WITHOUT
            # host syncs: the runtime then overlaps group g+1's host->device
            # audio transfer with group g's device compute (the dev tunnel
            # moves ~40 MB/s, so an un-overlapped batch-32 transfer costs
            # more than the entire prefill).  Explicit device_put keeps the
            # transfer off the backend's slow synchronous argument path
            # (measured 1.5 s for 65 MB vs 42 ms).
            gs = self._runtime.prefill_group_size or B
            groups = [(lo, min(lo + gs, B)) for lo in range(0, B, gs)]
            n_valid_np = np.asarray(n_valid, np.int32)
            n_audio_np = np.asarray(n_audio, np.int32)
            prompt_lens_np = np.asarray(prompt_lens, np.int32)
            keys_full = values_full = None
            logit_parts = []
            for lo, hi in groups:
                # Host padding is done per group AFTER dispatching the
                # previous one, so it overlaps device transfer/compute
                # instead of serializing ahead of the whole batch.
                padded_g = host_pad_batch(
                    transport[lo:hi], bucket, N_FFT, HOP_LENGTH
                )
                kv_g, logits_g = self._fused_prefill(
                    self._encoder_params,
                    self._decoder_params,
                    jax.device_put(padded_g),
                    jax.device_put(n_valid_np[lo:hi]),
                    jax.device_put(ids[lo:hi]),
                    jax.device_put(n_audio_np[lo:hi]),
                    jax.device_put(prompt_lens_np[lo:hi]),
                    bucket,
                    cache_len,
                )
                logit_parts.append(logits_g)
                if len(groups) == 1:
                    keys_full, values_full = kv_g
                elif keys_full is None:
                    # Grow the first part to full batch width; later parts
                    # land via donated in-place slice writes, so peak extra
                    # memory is ONE group's cache (a concatenate would
                    # transiently hold a second full-batch copy and OOMs
                    # at batch >= 96).
                    pad = ((0, 0), (0, B - kv_g[0].shape[1]), (0, 0), (0, 0), (0, 0))
                    keys_full = jnp.pad(kv_g[0], pad)
                    values_full = jnp.pad(kv_g[1], pad)
                else:
                    keys_full = _write_cache_slice(keys_full, kv_g[0], lo)
                    values_full = _write_cache_slice(values_full, kv_g[1], lo)
                del kv_g
            kv = (keys_full, values_full)
            first_logits = (
                logit_parts[0]
                if len(groups) == 1
                else jnp.concatenate(logit_parts, axis=0)
            )
        with stage_timer(stats, "decode"):
            token_lists = gen.decode(
                kv, first_logits, prompt_lens, list(max_tokens_list),
                token_bucket,
                temperature=temperature, top_p=top_p, top_k=top_k,
                repetition_penalty=repetition_penalty,
                repetition_context_size=repetition_context_size, seed=seed,
            )
        token_lists = token_lists[:n_real]
        stats.n_generated_tokens = sum(len(t) for t in token_lists)
        # Lane-forwards, not loop iterations: the while program runs the
        # whole batch in lockstep, so every iteration physically computes
        # one verify row per lane — without the x n_real the batched
        # ratio would read up to B x (gamma+1), breaking the documented
        # gamma+1 ceiling (spec_auto_max_batch now covers B <= 8).
        stats.n_spec_forwards = (
            getattr(gen, "last_spec_forwards", 0) * n_real
        )
        logger.debug("transcribe stats (batch=%d): %s", B, stats.as_dict())
        return token_lists, stats

    # -- continuous-batching engine hooks ------------------------------

    def incremental_session(self, **kwargs):
        """Open an :class:`~qwen3_asr_tpu.incremental.IncrementalSession`:
        live-stream transcription where completed 8 s encoder windows are
        encoded and advanced into a persistent decoder-prefix KV cache
        exactly once, so ``preview()`` costs one tail-window encode + a
        short cached advance + the decode loop instead of a full
        re-prefill of the whole tail.  See incremental.py for the
        exactness contract (token-identical to ``transcribe`` of the
        same prefix, including the global mel-clamp reconciliation)."""
        from .incremental import IncrementalSession

        return IncrementalSession(self, **kwargs)

    def make_engine(
        self,
        n_slots: int = 8,
        max_duration: float = 30.0,
        max_new_tokens: int = 512,
        chunk_steps: int = 32,
        paged: bool = False,
        page_size: int = 256,
        kv_pool_gb: float | None = None,
        chunk_program: str | None = None,
    ):
        """Build a :class:`~qwen3_asr_tpu.runtime.engine.DecodeEngine`
        sized for clips up to ``max_duration`` seconds and transcripts up
        to ``max_new_tokens`` tokens (both rounded up to compile buckets).

        ``paged=True`` backs the engine with a page-pool KV cache sized by
        ``kv_pool_gb`` (default: the runtime's ``kv_cache_budget_gb``) —
        slots then share memory proportional to their ACTUAL prompt and
        transcript lengths, so short clips can run beside long ones
        without paying the worst-case slot.
        """
        from .runtime.engine import DecodeEngine

        gen = self._generator
        bucket = self._mel.bucket_for(int(max_duration * SAMPLE_RATE))
        atb = bucket // self._config.audio_encoder.chunk_frames * \
            self._config.audio_encoder.tokens_per_chunk
        prompt_bucket, token_bucket, _ = gen.plan(atb, atb + 20, max_new_tokens)
        token_bucket = max(128, token_bucket)
        n_pages = None
        if paged:
            tc = self._config.text_decoder
            # Bytes per cached row: bf16 = 2*D; int8 = D + 4 (f32 scale).
            row_bytes = (
                tc.head_dim + 4
                if self._runtime.kv_cache_dtype == "int8"
                else tc.head_dim * 2
            )
            page_bytes = (
                tc.num_hidden_layers * tc.num_key_value_heads
                * page_size * row_bytes * 2
            )
            budget_gb = (
                kv_pool_gb
                if kv_pool_gb is not None
                else self._runtime.kv_cache_budget_gb
            )
            n_pages = max(4, int(budget_gb * 2**30) // page_bytes)
            # No point holding more pages than full slots could ever use.
            full = 1 + n_slots * (
                -(-prompt_bucket // page_size) - (-token_bucket // page_size)
            )
            n_pages = min(n_pages, full)
        return DecodeEngine(
            gen, prompt_bucket, token_bucket,
            n_slots=n_slots, chunk_steps=chunk_steps,
            paged=paged, page_size=page_size, n_pages=n_pages,
            chunk_program=chunk_program,
        )

    def prefill_group(self, samples_list, lang_names):
        """Prefill an admission group for the continuous engine.

        Returns ``(kv, first_logits, prompts)`` where ``kv`` covers ONLY
        the prompt region (cache length = the group's prompt bucket) — the
        engine copies it into its persistent cache and owns the decode
        region.  ``lang_names`` are resolved full names (or None for
        detect mode), one per clip.

        The group's batch dimension is padded to a power-of-two bucket
        before the fused prefill and sliced back after: admission-group
        sizes depend on request ARRIVAL TIMING relative to chunk
        boundaries, so without bucketing a production server keeps
        hitting never-seen batch shapes and pays a full XLA compile
        mid-traffic (measured: two stray shapes cost ~130 s of a 7 s
        workload).
        """
        gen = self._generator
        n_real = len(samples_list)
        bg_pad = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
        if all(s.dtype == np.int16 for s in samples_list):
            transport = list(samples_list)
            pad_clip = np.zeros(N_FFT, np.int16)
        else:
            transport = [
                s.astype(np.float32) / 32768.0 if s.dtype == np.int16 else s
                for s in samples_list
            ]
            pad_clip = np.zeros(N_FFT, np.float32)
        transport += [pad_clip] * (bg_pad - n_real)
        bucket = max(self._mel.bucket_for(len(s)) for s in samples_list)
        n_valid = [len(s) // HOP_LENGTH for s in transport]
        n_audio = [self._n_audio_tokens(v) for v in n_valid]
        prompts = [
            self._tokenizer.build_prompt(n, lang)
            for n, lang in zip(n_audio, lang_names)
        ] + [
            self._tokenizer.build_prompt(n, "English")
            for n in n_audio[n_real:]
        ]
        prompt_lens = [len(p) for p in prompts]
        atb = bucket // self._config.audio_encoder.chunk_frames * \
            self._config.audio_encoder.tokens_per_chunk
        pb_g = gen.plan(atb, max(prompt_lens), 1)[0]
        run_g = self._runtime.plan_prefill_run(max(prompt_lens), pb_g)
        ids = gen.pack_prompts(prompts, run_g)
        padded = host_pad_batch(transport, bucket, N_FFT, HOP_LENGTH)
        kv, first_logits = self._fused_prefill(
            self._encoder_params,
            self._decoder_params,
            jax.device_put(padded),
            jax.device_put(np.asarray(n_valid, np.int32)),
            jax.device_put(ids),
            jax.device_put(np.asarray(n_audio, np.int32)),
            jax.device_put(np.asarray(prompt_lens, np.int32)),
            bucket,
            pb_g,
        )
        if bg_pad > n_real:
            kv = (kv[0][:, :n_real], kv[1][:, :n_real])
            first_logits = first_logits[:n_real]
        return kv, first_logits, prompts[:n_real]

    def _batch_bucket(self, B: int) -> int:
        """Bucketed batch width: powers of two below 8, multiples of 8
        above (so common fixed deployment sizes like 16/32/48 stay
        exact); identity when bucketing is disabled."""
        if not self._runtime.batch_bucketing or B % 8 == 0:
            return B
        if B < 8:
            return 1 << (B - 1).bit_length()
        return -(-B // 8) * 8

    def _n_audio_tokens(self, n_valid_frames: int) -> int:
        """Host-side audio-token count (mirror of valid_token_count)."""
        cfg = self._config.audio_encoder
        chunk = cfg.chunk_frames
        full, rem = divmod(n_valid_frames, chunk)
        rem_tokens = rem
        for _ in range(3):
            rem_tokens = (rem_tokens - 1) // 2 + 1 if rem_tokens > 0 else 0
        return full * cfg.tokens_per_chunk + rem_tokens

    def _resolve_language(self, language: Optional[str]) -> Optional[str]:
        """Hint -> full name; "detect" -> None (true model-side detection,
        a capability the reference claims but does not implement —
        README vs model.py:328,357)."""
        if language is not None and language.lower() == "detect":
            return None
        if language is None or language.lower() in ("auto", ""):
            return "English"
        return LANGUAGE_MAP.get(language.lower(), language)

    def _decode_output(self, tokens: list[int]) -> str:
        while tokens and tokens[-1] in EOS_TOKEN_IDS:
            tokens = tokens[:-1]
        return self._tokenizer.decode(tokens, skip_special_tokens=True).strip()

    def _finalize_output(
        self, tokens: list[int], lang_name: Optional[str]
    ) -> tuple[str, str]:
        """(text, language) from generated ids.

        Primed prompt: output is transcription-only.  Detect mode
        (lang_name None): output is ``language X<asr_text>transcript`` —
        parsed with the chat-format parser.
        """
        if lang_name is not None:
            return self._decode_output(tokens), lang_name
        from .tokenizer import parse_language, parse_output

        while tokens and tokens[-1] in EOS_TOKEN_IDS:
            tokens = tokens[:-1]
        raw = self._tokenizer.decode(tokens, skip_special_tokens=False)
        return parse_output(raw), parse_language(raw) or "Unknown"

    def _clamp_chunk_duration(self, chunk_duration: float) -> float:
        """Cap chunk_duration so every long-form chunk fits a compiled
        frame bucket.  BOTH boundaries of an interior chunk snap
        independently within the low-energy search window
        (audio/io.py:find_split_points), so a chunk can exceed a
        chunk_duration multiple by up to 2x the 5 s window — the
        effective ceiling is the largest bucket MINUS 10 s of slack;
        with the default table (121,600 frames = 1216 s) the default
        1200 s passes through unchanged.  Bucket tables too small to
        afford the full slack reserve half the bucket instead, and
        ``_split_long_chunks`` shrinks the search window to whatever
        slack the clamped duration actually leaves."""
        max_bucket_s = (
            self._runtime.frame_buckets[-1] * HOP_LENGTH / SAMPLE_RATE
        )
        slack = min(10.0, max_bucket_s / 2)
        return max(min(chunk_duration, max_bucket_s - slack), 1.0)

    def _split_long_chunks(self, samples, chunk_duration: float) -> list:
        """Slice a long clip at low-energy boundaries (shared by
        ``_transcribe_chunked`` and the batch long-clip path).  The
        search window is 5 s when the bucket table affords it, else
        half the remaining slack — keeping every chunk
        (<= chunk_duration + 2x window) within the largest compiled
        frame bucket."""
        max_bucket_s = (
            self._runtime.frame_buckets[-1] * HOP_LENGTH / SAMPLE_RATE
        )
        search_s = max(0.0, min(5.0, (max_bucket_s - chunk_duration) / 2))
        chunk_samples = int(chunk_duration * SAMPLE_RATE)
        split_points = find_split_points(
            samples, chunk_samples, int(search_s * SAMPLE_RATE)
        )
        chunks, prev = [], 0
        for sp in split_points + [len(samples)]:
            if sp > prev:
                chunks.append(samples[prev:sp])
            prev = sp
        return chunks

    def _transcribe_chunked(
        self, samples, duration, language, temperature, top_p, top_k,
        repetition_penalty, repetition_context_size, chunk_duration, seed,
    ) -> TranscriptionResult:
        """Long-form path: split at low-energy boundaries, stitch texts."""
        lang_name = self._resolve_language(language)
        chunks = self._split_long_chunks(samples, chunk_duration)
        texts, detected = self._run_chunks_grouped(
            chunks, lang_name, temperature, top_p, top_k,
            repetition_penalty, repetition_context_size, seed,
        )
        keep = [(t, lg) for t, lg in zip(texts, detected) if t]
        language_out = lang_name if lang_name is not None else (
            keep[0][1] if keep else "Unknown"
        )
        return TranscriptionResult(
            text=" ".join(t for t, _ in keep),
            language=language_out, duration=duration,
        )

    def _run_chunks_grouped(
        self, chunks, lang_name, temperature, top_p, top_k,
        repetition_penalty, repetition_context_size, seed,
    ) -> tuple[list[str], list[str]]:
        """Transcribe long-form chunks; returns PER-CHUNK texts and
        detected languages, in order, one entry per input chunk (empty
        texts included — callers filter, so the batch path can regroup
        pooled chunks back to their owning clips positionally).

        Chunks are transcribed in BATCHES of max_batch_size — the
        reference runs them strictly sequentially (model.py:409-441).
        Group size is additionally bounded by the KV-cache HBM budget
        (a 20-min chunk needs a ~24k-slot cache ≈ 2.8 GB per sequence).
        Shared by :meth:`transcribe` and :meth:`transcribe_batch`'s
        long-clip path.  Per-chunk token budgets always come from the
        duration formula (reference parity: the chunked path ignores the
        caller's max_tokens, model.py:409-441)."""
        group_size = max(1, self._runtime.max_batch_size)
        if chunks:
            tc = self._config.text_decoder
            longest = max(len(c) for c in chunks)
            frames_bucket = self._mel.bucket_for(longest)
            slots = (
                frames_bucket // self._config.audio_encoder.chunk_frames
                * self._config.audio_encoder.tokens_per_chunk
                + 32
                + self._runtime.max_decode_slots
            )
            per_seq_bytes = (
                tc.num_hidden_layers * tc.num_key_value_heads
                * slots * tc.head_dim * 2 * 2
            )
            budget = int(self._runtime.kv_cache_budget_gb * 2**30)
            group_size = max(1, min(group_size, budget // max(per_seq_bytes, 1)))
        texts: list[str] = []
        detected: list[str] = []
        for start in range(0, len(chunks), group_size):
            group = chunks[start : start + group_size]
            budgets = [max(256, int(len(c) / SAMPLE_RATE * 50)) for c in group]
            token_lists, self.last_stats = self._run_pipeline_batch(
                group, lang_name, temperature, top_p, top_k,
                repetition_penalty, budgets, repetition_context_size, seed,
            )
            for toks in token_lists:
                text, out_lang = self._finalize_output(toks, lang_name)
                texts.append(text)
                detected.append(out_lang)
        return texts, detected
