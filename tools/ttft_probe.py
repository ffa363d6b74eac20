"""Public-API time-to-first-transcription (TTFT) probe.

coldstart_probe.py decomposes the INTERNAL stages (param materialization,
fused-prefill compile, decode-program compile), but the public
``transcribe`` path measured far slower than the sum of those parts in
round 3 (173 s vs ~56 s attributed — ROADMAP #1).  This probe measures
exactly what a user sees and attributes it per compiled program:

  * ``jax_log_compiles`` prints one line per XLA compilation with its
    wall time — the difference between the sum of those lines and the
    stage timers is host/tunnel overhead, not compile;
  * stage timers (prepare/prefill/decode) from the API's own telemetry;
  * a second call separates steady-state from first-touch.

Run on the TPU env:   python tools/ttft_probe.py [--cache DIR] [--keep]
Default uses a FRESH temp compile-cache dir (true first-ever cold start);
``--cache`` points at a persistent dir to measure the warm-cache restart.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default=None, help="compile cache dir")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--no-progressive", action="store_true")
    ap.add_argument("--quiet-compiles", action="store_true")
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    import jax

    cache = args.cache or tempfile.mkdtemp(prefix="qwen3_ttft_cache_")
    jax.config.update("jax_compilation_cache_dir", cache)
    if not args.quiet_compiles:
        jax.config.update("jax_log_compiles", True)
    print(f"[ttft] compile cache: {cache}", flush=True)
    print(f"[ttft] devices: {jax.devices()}", flush=True)

    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import ModelConfig, RuntimeConfig

    class Tok:
        def build_prompt(self, n, language="English"):
            from qwen3_asr_tpu.tokenizer import build_prompt

            return build_prompt(n, language_name_tokens=[6364])

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(map(str, ids))

    rt = RuntimeConfig()
    if args.no_progressive:
        rt = RuntimeConfig(progressive_decode=False)

    t0 = time.perf_counter()
    model = Qwen3ASR.from_random(
        ModelConfig(), tokenizer=Tok(), runtime=rt, seed=None
    )
    t_load = time.perf_counter() - t0
    print(f"[ttft] from_random (load): {t_load:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(int(args.seconds * 16_000)) * 0.05).astype(
        np.float32
    )

    t0 = time.perf_counter()
    res = model.transcribe(clip, max_tokens=args.tokens, temperature=0.0)
    ttft = time.perf_counter() - t0
    st = model.last_stats.as_dict() if model.last_stats else {}
    print(f"[ttft] FIRST transcribe: {ttft:.1f}s stats={st}", flush=True)
    print(f"[ttft] tokens: {len(res.text.split())}", flush=True)

    t0 = time.perf_counter()
    model.transcribe(clip, max_tokens=args.tokens, temperature=0.0)
    t2 = time.perf_counter() - t0
    print(f"[ttft] second transcribe (pre-ready): {t2:.2f}s", flush=True)

    t0 = time.perf_counter()
    model.wait_ready()
    print(f"[ttft] wait_ready: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    model.transcribe(clip, max_tokens=args.tokens, temperature=0.0)
    t3 = time.perf_counter() - t0
    print(f"[ttft] steady-state transcribe: {t3:.2f}s", flush=True)
    print(
        f"[ttft] SUMMARY load={t_load:.1f}s ttft={ttft:.1f}s "
        f"second={t2:.2f}s steady={t3:.2f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
