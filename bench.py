"""Benchmark: end-to-end greedy transcription throughput on one chip.

Measures the full pipeline (fused mel->encoder->prefill program + decode
loop + host fetch) with the flagship 1.7B configuration (zero-init weights
— checkpoints are unavailable here; bf16 matmul timing is data-independent)
on 30 s clips with a 128-token decode budget:

  * single-stream latency / RTFx (1 clip, plain greedy + speculative),
  * batched serving throughput / RTFx at batch 96 in bf16 (the
    token-identical-contract default), and
  * the same batch in W8A8 (int8 weights + dynamic int8 prefill
    activations) — the recommended throughput-serving config, with a
    measured fidelity bound (tools/verify_vs_hf.py --quant w8a8),

and prints ONE JSON line with the W8A8 batched RTFx as the headline
metric (bf16 and device-side companions included; device_rtfx is the
tunnel-independent primary anchor).  vs_baseline is measured RTFx / 500
(BASELINE.md north star; the reference itself publishes no numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache: first bench invocation pays the compiles,
# every later one (including the driver's) reuses them from disk.  The env
# var is not reliably honored by this jax build, so bench sets the config
# flag explicitly (see main()).
_COMPILE_CACHE = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_qwen3_asr")
)

AUDIO_SECONDS = 30.0
DECODE_TOKENS = 128
#: Serving batch for the headline metric.  Round-3 device-time accounting
#: (docs/PERFORMANCE.md): decode weights amortize with batch while
#: attention scales linearly, so throughput keeps climbing past 64 —
#: measured 685 @ 64, 754 @ 96, 765 @ 128 RTFx; 96 is the sweet spot
#: before the audio-transfer tail and KV memory dominate.  Override with
#: QWEN3_BENCH_BATCH.
BATCH = int(os.environ.get("QWEN3_BENCH_BATCH", "96"))
REPEATS = 8


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def device_side_rtfx(model, clips, batch: int) -> dict:
    """Tunnel-independent device-compute RTFx via rep-diff timing.

    The wall-clock headline moves 40% run-to-run with the dev tunnel's
    audio-transfer weather (docs/PERFORMANCE.md round-3 caveat), so the
    official bench also emits a device-side number built from two
    differential measurements that cancel launch/transfer constants:

      * prefill: the fused mel->encoder->prefill body scanned 1x vs 4x
        IN-PROGRAM over device-resident inputs (an index-dependent
        perturbation per rep defeats loop hoisting) — the wall
        difference / 3 is pure device compute;
      * decode: the already-compiled steady-state decode program run at
        max_new=16 vs max_new=128 — identical launch/fetch/transfer, so
        the difference / 112 is per-step device time.

    Returns {"device_rtfx", "prefill_ms", "step_ms"}.
    """
    import jax
    import jax.numpy as jnp

    from qwen3_asr_tpu.audio.mel import HOP_LENGTH, N_FFT, host_pad_batch
    from qwen3_asr_tpu.models.decoder import init_kv_cache

    gen = model._generator
    cfg = model._config
    enc_p, dec_p = model._encoder_params, model._decoder_params

    bucket = model._mel.bucket_for(len(clips[0]))
    n_valid = [len(c) // HOP_LENGTH for c in clips[:batch]]
    n_audio = [model._n_audio_tokens(v) for v in n_valid]
    prompts = [
        model._tokenizer.build_prompt(n, "English") for n in n_audio
    ]
    plens = [len(p) for p in prompts]
    atb = (
        bucket // cfg.audio_encoder.chunk_frames
        * cfg.audio_encoder.tokens_per_chunk
    )
    pbucket, tbucket, cache_len = gen.plan(
        atb, max(plens), DECODE_TOKENS, batch=batch
    )
    run_len = model._runtime.plan_prefill_run(max(plens), pbucket)

    padded = jax.device_put(
        host_pad_batch(clips[:batch], bucket, N_FFT, HOP_LENGTH)
    )
    nv = jax.device_put(np.asarray(n_valid, np.int32))
    na = jax.device_put(np.asarray(n_audio, np.int32))
    pl_ = jax.device_put(np.asarray(plens, np.int32))
    ids = jax.device_put(gen.pack_prompts(prompts, run_len))

    def prefill_body(ep, dp, x):
        kv, logits = model._fused_prefill_impl(
            ep, dp, x, nv, ids, na, pl_, bucket, cache_len
        )
        return logits.astype(jnp.float32).ravel()[0]

    def rep(n):
        # Everything big is an ARGUMENT, not a closure capture: captured
        # device arrays lower as baked-in constants — the audio input
        # gets constant-folded (measured trap — see tools/micro_bench.py)
        # and the 3.4 GB of params get shipped inside the executable
        # (measured trap round 4: a 4.08 GB captured-constants lowering
        # that stalled the backend compile for >15 min).
        def body(c, ep, dp, xi):
            x, i = xi
            return c + prefill_body(ep, dp, x + jnp.asarray(i, x.dtype))

        return jax.jit(
            lambda ep, dp, x: jax.lax.scan(
                lambda c, i: (body(c, ep, dp, (x, i)), None),
                jnp.float32(0),
                jnp.arange(n),
            )[0]
        )

    lo_f, hi_f = rep(1), rep(4)
    float(lo_f(enc_p, dec_p, padded))                 # compile both
    float(hi_f(enc_p, dec_p, padded))
    t_lo = min(
        _bench_once(lambda: float(lo_f(enc_p, dec_p, padded)))
        for _ in range(4)
    )
    t_hi = min(
        _bench_once(lambda: float(hi_f(enc_p, dec_p, padded)))
        for _ in range(4)
    )
    prefill_dev = (t_hi - t_lo) / 3

    # Decode per-step device time on the SAME compiled steady-state
    # program the headline repeats use (identical statics: greedy,
    # repetition_penalty=1.2/ctx=100 -> rep_window bucket, k_subset).
    rng = np.random.default_rng(1)
    logits0 = jnp.asarray(
        rng.standard_normal((batch, cfg.text_decoder.vocab_size)) * 0.01,
        jnp.float32,
    )

    def run_decode(max_new):
        kv = init_kv_cache(
            cfg.text_decoder, batch, cache_len, jnp.bfloat16
        )
        return gen.decode(
            kv, logits0, plens, [max_new] * batch, tbucket,
            repetition_penalty=1.2, repetition_context_size=100,
        )

    run_decode(16); run_decode(DECODE_TOKENS)          # compile both
    lo = min(_bench_once(lambda: run_decode(16)) for _ in range(4))
    hi = min(
        _bench_once(lambda: run_decode(DECODE_TOKENS)) for _ in range(4)
    )
    step_ms = (hi - lo) / (DECODE_TOKENS - 16) * 1e3

    dev_total = prefill_dev + step_ms * 1e-3 * (DECODE_TOKENS - 1)
    return {
        "device_rtfx": AUDIO_SECONDS * batch / dev_total,
        "prefill_ms": prefill_dev * 1e3,
        "step_ms": step_ms,
    }


def _bench_once(fn) -> float:
    import time as _time

    t0 = _time.perf_counter()
    fn()
    return _time.perf_counter() - t0


class _BenchTokenizer:
    """Prompt-protocol-only tokenizer (no vocab files needed)."""

    def build_prompt(self, n_audio_tokens: int, language: str = "English"):
        from qwen3_asr_tpu.tokenizer import build_prompt

        return build_prompt(n_audio_tokens, language_name_tokens=[6364])

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(t) for t in ids)


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _COMPILE_CACHE)
    except Exception as exc:  # noqa: BLE001 — cache is best-effort
        log(f"compile cache unavailable: {exc}")

    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import ModelConfig, RuntimeConfig

    log(f"devices: {jax.devices()}")
    rt = RuntimeConfig()
    t0 = time.perf_counter()
    model = Qwen3ASR.from_random(
        ModelConfig(), tokenizer=_BenchTokenizer(), runtime=rt, seed=None
    )
    log(f"1.7B params materialized in {time.perf_counter() - t0:.1f}s")

    sr = 16_000
    rng = np.random.default_rng(0)
    # PCM16 clips — the wire format of real speech audio (WAV/telephony);
    # the int16 transport path ships half the bytes of float32 with
    # bit-identical mel numerics (device scales x/32768 exactly).
    clips = [
        np.clip(
            rng.standard_normal(int(AUDIO_SECONDS * sr)) * 0.05 * 32768.0,
            -32768,
            32767,
        ).astype(np.int16)
        for _ in range(BATCH)
    ]

    def run(batch_size: int) -> float:
        t0 = time.perf_counter()
        results = model.transcribe_batch(
            clips[:batch_size], max_tokens=DECODE_TOKENS, temperature=0.0
        )
        assert all(r.duration > 0 for r in results)
        return time.perf_counter() - t0

    # Single-stream is measured BOTH ways: plain greedy (data-independent
    # device time — the number comparable run-to-run on zero-init
    # weights) and the default speculative path (token-identical; its
    # n-gram acceptance is data-dependent, and zero-init output streams
    # accept maximally, so the spec number is an UPPER bound until real
    # weights exist — tools/spec_bench.py measures the floor at -5.4%).
    gen = model._generator
    gen.runtime.speculative = "off"
    t_compile = run(1)
    log(f"single-stream compile+first run: {t_compile:.1f}s")
    # Progressive decode may have served the first run on the cold/bridge
    # program; the timed repeats measure the steady-state while-loop
    # path, so block until its background compile lands.  Bounded: the
    # backend compile service has high-variance rounds (docs/PERFORMANCE
    # cold start) — on timeout the repeats run the (token-identical,
    # slightly slower) cold path rather than hanging the bench.
    if not model.wait_ready(timeout=1800):
        log("wait_ready timed out; continuing on the first-flight path")
    singles = [run(1) for _ in range(REPEATS)]
    single_best = min(singles)
    log(
        f"single-stream best: {single_best:.3f}s "
        f"(RTFx {AUDIO_SECONDS / single_best:.1f}) stats={model.last_stats.as_dict()}"
    )

    gen.runtime.speculative = "ngram"
    t_compile_s = run(1)
    log(f"single-stream spec compile+first run: {t_compile_s:.1f}s")
    if not model.wait_ready(timeout=1800):
        log("wait_ready timed out; continuing on the spec bridge path")
    spec_singles = [run(1) for _ in range(REPEATS)]
    single_spec_best = min(spec_singles)
    log(
        f"single-stream spec best: {single_spec_best:.3f}s "
        f"(RTFx {AUDIO_SECONDS / single_spec_best:.1f}, acceptance-UB on "
        f"zero-init)"
    )
    gen.runtime.speculative = "off"   # headline batch stays plain greedy

    t_compile_b = run(BATCH)
    log(f"batch-{BATCH} compile+first run: {t_compile_b:.1f}s")
    if not model.wait_ready(timeout=1800):
        log("wait_ready timed out; continuing on the first-flight path")
    batched = [run(BATCH) for _ in range(REPEATS)]
    batch_best = min(batched)
    rtfx = AUDIO_SECONDS * BATCH / batch_best
    log(
        f"batch-{BATCH} best: {batch_best:.3f}s (RTFx {rtfx:.1f}) "
        f"stats={model.last_stats.as_dict()}"
    )

    try:
        dev = device_side_rtfx(model, clips, BATCH)
        log(
            f"device-side: prefill {dev['prefill_ms']:.1f} ms, "
            f"step {dev['step_ms']:.3f} ms, RTFx {dev['device_rtfx']:.1f}"
        )
    except Exception as exc:  # noqa: BLE001 — headline must still print
        log(f"device-side metric failed: {exc}")
        dev = {"device_rtfx": 0.0}

    # --- W8A8 serving arm: int8 weights + dynamic int8 prefill
    # activations.  This is the recommended throughput-serving config
    # (docs/PERFORMANCE.md round-5 A/B: device-side 940 vs 844 bf16).
    # Fidelity bound (tools/verify_vs_hf.py --quant w8a8 at real 1.7B
    # dims): logit perturbation at the quant noise scale, argmax flips
    # confined to near-tie oracle margins; token-level validation on
    # trained weights stays on the checkpoint watch.  The bf16 numbers
    # above remain the token-identical-contract reference point.
    model.close()
    del model
    t0 = time.perf_counter()
    model = Qwen3ASR.from_random(
        ModelConfig(),
        tokenizer=_BenchTokenizer(),
        runtime=RuntimeConfig(
            speculative="off", quantization="int8", act_quant="int8"
        ),
        seed=None,
    )
    log(f"w8a8 params materialized in {time.perf_counter() - t0:.1f}s")
    t_compile_q = run(BATCH)
    log(f"w8a8 batch-{BATCH} compile+first run: {t_compile_q:.1f}s")
    if not model.wait_ready(timeout=1800):
        log("w8a8 wait_ready timed out; continuing on the first-flight path")
    batched_q = [run(BATCH) for _ in range(REPEATS)]
    batch_best_q = min(batched_q)
    rtfx_q = AUDIO_SECONDS * BATCH / batch_best_q
    log(
        f"w8a8 batch-{BATCH} best: {batch_best_q:.3f}s (RTFx {rtfx_q:.1f}) "
        f"stats={model.last_stats.as_dict()}"
    )
    try:
        dev_q = device_side_rtfx(model, clips, BATCH)
        log(
            f"w8a8 device-side: prefill {dev_q['prefill_ms']:.1f} ms, "
            f"step {dev_q['step_ms']:.3f} ms, RTFx {dev_q['device_rtfx']:.1f}"
        )
    except Exception as exc:  # noqa: BLE001
        log(f"w8a8 device-side metric failed: {exc}")
        dev_q = {"device_rtfx": 0.0}

    print(
        json.dumps(
            {
                # Headline = the recommended throughput-serving config
                # (W8A8); bf16 (the token-identical-contract default) is
                # reported alongside for cross-round comparability with
                # BENCH_r01-r04 (whose headline was bf16-only).
                "metric": f"RTFx_batch{BATCH}_30s_greedy_{DECODE_TOKENS}tok_1chip_w8a8",
                "value": round(rtfx_q, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtfx_q / 500.0, 3),
                # Tunnel-independent companion numbers (see
                # device_side_rtfx): wall headlines swing with dev-tunnel
                # transfer weather; device_rtfx does not and is the
                # primary cross-round anchor (BASELINE.md precedence
                # note).
                "device_rtfx": round(dev_q["device_rtfx"], 2),
                "bf16_rtfx": round(rtfx, 2),
                "bf16_device_rtfx": round(dev["device_rtfx"], 2),
                "single_stream_rtfx": round(AUDIO_SECONDS / single_best, 2),
                # Speculative single-stream: token-identical path, but
                # zero-init streams accept maximally — read as the
                # acceptance UPPER bound (floor = plain - 5.4%).
                "single_stream_spec_rtfx": round(
                    AUDIO_SECONDS / single_spec_best, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
