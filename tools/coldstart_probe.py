"""Decompose the single-stream cold start (bench.py's 500 s mystery).

bench.py round 2: B=1 compile+first-run = 500.9 s, yet the LARGER batch-64
programs compile in 8.6 s right after.  This probe separates, for the B=1
shapes: param materialization, trace+lower vs backend-compile vs
first-execution for the fused prefill and the decode program, then a warm
transcription — so the 500 s can be attributed and attacked.

Run on the TPU env:  python tools/coldstart_probe.py
Optionally set QWEN3_PROBE_CACHE=/path to test the persistent-compile-
cache hypothesis (run twice; compare).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"[probe] {label:45s} {dt:8.2f}s", flush=True)
    return out


def main() -> None:
    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.audio.mel import HOP_LENGTH, N_FFT, host_pad_batch
    from qwen3_asr_tpu.config import ModelConfig, RuntimeConfig

    cache = os.environ.get("QWEN3_PROBE_CACHE")
    if cache:
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            print(f"[probe] compile cache dir: {cache}")
        except Exception as exc:  # noqa: BLE001
            print(f"[probe] compile cache unavailable: {exc}")

    print("[probe] devices:", jax.devices(), flush=True)

    class Tok:
        def build_prompt(self, n, language="English"):
            from qwen3_asr_tpu.tokenizer import build_prompt

            return build_prompt(n, language_name_tokens=[6364])

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(map(str, ids))

    model = t(
        "from_random (param materialization)",
        lambda: Qwen3ASR.from_random(
            ModelConfig(), tokenizer=Tok(), runtime=RuntimeConfig(), seed=None
        ),
    )

    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(int(30.0 * 16_000)) * 0.05).astype(np.float32)

    # -- replicate transcribe()'s B=1 staging exactly (api.py:485-574) ----
    gen = model._generator
    bucket = model._mel.bucket_for(len(clip))
    n_valid = [len(clip) // HOP_LENGTH]
    n_audio = [model._n_audio_tokens(v) for v in n_valid]
    prompts = [model._tokenizer.build_prompt(n_audio[0], "English")]
    prompt_lens = [len(p) for p in prompts]
    atb = (
        bucket
        // model._config.audio_encoder.chunk_frames
        * model._config.audio_encoder.tokens_per_chunk
    )
    prompt_bucket, token_bucket, cache_len = gen.plan(
        atb, prompt_lens[0], 128, batch=1
    )
    print(
        f"[probe] shapes: frames {bucket}, audio tokens {n_audio[0]}/{atb}, "
        f"prompt {prompt_lens[0]}/{prompt_bucket}, decode {token_bucket}, "
        f"cache {cache_len}",
        flush=True,
    )
    ids = gen.pack_prompts(prompts, prompt_bucket)
    padded = host_pad_batch([clip], bucket, N_FFT, HOP_LENGTH)

    args = (
        model._encoder_params,
        model._decoder_params,
        jax.device_put(padded),
        jax.device_put(np.asarray(n_valid, np.int32)),
        jax.device_put(ids),
        jax.device_put(np.asarray(n_audio, np.int32)),
        jax.device_put(np.asarray(prompt_lens, np.int32)),
    )
    lowered = t(
        "prefill trace+lower",
        lambda: model._fused_prefill.lower(
            *args, n_frames=bucket, cache_len=cache_len
        ),
    )
    compiled = t("prefill backend compile", lowered.compile)
    kv, logits = t(
        "prefill first run", lambda: jax.block_until_ready(compiled(*args))
    )

    dec_dyn = (
        gen.params, kv, logits,
        jax.device_put(np.asarray(prompt_lens, np.int32)),
        jax.device_put(np.asarray([128], np.int32)),
        jnp.uint32(0), jnp.float32(0.0), jnp.int32(0), jnp.float32(1.0),
        jnp.float32(1.2), jnp.int32(100),
    )
    dec_lowered = t(
        "decode trace+lower",
        lambda: gen._decode.lower(
            *dec_dyn, token_bucket=token_bucket, mode="greedy",
            rep_window=128, k_subset=1024,
        ),
    )
    dec_compiled = t("decode backend compile", dec_lowered.compile)
    t(
        "decode first run",
        lambda: jax.block_until_ready(dec_compiled(*dec_dyn)),
    )

    # Everything the public path needs should now be warm... except that
    # AOT .lower().compile() does NOT seed jax.jit's call cache, so the
    # public path recompiles unless the persistent cache catches it.
    t("transcribe #1 (public path)", lambda: model.transcribe(clip, max_tokens=128))
    print(f"[probe]   stage stats #1: {model.last_stats.as_dict()}", flush=True)
    t("transcribe #2 (fully warm)", lambda: model.transcribe(clip, max_tokens=128))
    print(f"[probe]   stage stats #2: {model.last_stats.as_dict()}", flush=True)


if __name__ == "__main__":
    main()
