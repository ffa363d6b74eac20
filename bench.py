"""Benchmark: end-to-end greedy transcription throughput on one chip.

Measures the full pipeline (fused mel->encoder->prefill program + decode
loop + host fetch) with the flagship 1.7B configuration (zero-init weights
— checkpoints are unavailable here; bf16 matmul timing is data-independent)
on 30 s clips with a 128-token decode budget:

  * single-stream latency / RTFx (1 clip), and
  * batched serving throughput / RTFx (batch of 8 clips),

and prints ONE JSON line with the batched RTFx as the headline metric.
vs_baseline is measured RTFx / 500 (BASELINE.md north star; the reference
itself publishes no numbers).
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

    print(
        json.dumps(
            {
                "metric": f"RTFx_batch{BATCH}_30s_greedy_{DECODE_TOKENS}tok_1chip",
                "value": round(rtfx, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtfx / 500.0, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
