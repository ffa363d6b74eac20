"""Benchmark: end-to-end greedy transcription throughput on one chip.

Measures the full pipeline (mel -> encoder -> prefill -> 128-token decode
loop -> host fetch) on a 30 s synthetic clip with the flagship 1.7B
configuration (random weights — checkpoints are not available in this
environment; compute cost is identical).  Prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is measured RTFx / 500 (the BASELINE.md north-star target of
>= 500x real-time per chip; the reference itself publishes no numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache: first bench invocation pays the compiles,
# every later one (including the driver's) reuses them from disk.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_qwen3_asr"))


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

AUDIO_SECONDS = 30.0
DECODE_TOKENS = 128
REPEATS = 3


def main() -> None:
    import jax

    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import ModelConfig, RuntimeConfig

    log(f"devices: {jax.devices()}")
    rt = RuntimeConfig()
    t0 = time.perf_counter()
    model = Qwen3ASR.from_random(ModelConfig(), tokenizer=None, runtime=rt, seed=None)
    log(f"1.7B params materialized in {time.perf_counter() - t0:.1f}s")

    sr = 16_000
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(AUDIO_SECONDS * sr)) * 0.05).astype(np.float32)

    verbose = os.environ.get("BENCH_VERBOSE", "0") == "1"

    def run() -> float:
        t0 = time.perf_counter()
        # Tokenizer-free inner pipeline: mel -> encode -> prompt -> generate.
        import jax.numpy as jnp

        def tick(name, x=None):
            if verbose:
                if x is not None:
                    x.block_until_ready()
                log(f"  {name}: {time.perf_counter() - t0:.1f}s")

        mel, n_valid = model._mel(audio)
        tick("mel", mel)
        feats, _ = model._encode(
            model._encoder_params, mel[None], jnp.full((1,), n_valid, jnp.int32)
        )
        tick("encode", feats)
        n_audio = model._n_audio_tokens(n_valid)
        from qwen3_asr_tpu.tokenizer import build_prompt

        ids = build_prompt(n_audio, language_name_tokens=[6364])
        tokens = model._generator.generate(
            feats, n_audio, ids,
            max_tokens=DECODE_TOKENS, temperature=0.0, repetition_penalty=1.2,
        )
        tick("decode")
        assert len(tokens) >= 1
        return time.perf_counter() - t0

    t_compile = run()  # warm-up: compile all programs
    log(f"compile+first run: {t_compile:.1f}s")
    times = []
    for i in range(REPEATS):
        times.append(run())
        log(f"run {i}: {times[-1]:.3f}s (stats: {model.last_stats.as_dict()})")
    best = min(times)
    rtfx = AUDIO_SECONDS / best

    print(
        json.dumps(
            {
                "metric": f"RTFx_30s_greedy_{DECODE_TOKENS}tok_1chip",
                "value": round(rtfx, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtfx / 500.0, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
