"""Seed a persistent XLA compile cache for deployment shipping.

The owned part of cold-start TTFT is the client-side compile of the
fused cold program (~2 minutes for the 30 s/128-token shape, measured in
docs/PERFORMANCE.md).  That compile serializes into
``RuntimeConfig.compile_cache_dir`` and reloads in seconds — so a
deployment can pre-pay it ONCE at image-build time and ship the cache
directory alongside the weights:

    # at image build (or any machine with the same jax version + chip):
    python tools/seed_compile_cache.py --cache /opt/qwen3/xla_cache \
        --durations 30 --batch-sizes 1 --max-tokens 128

    # at serve time:
    model = Qwen3ASR.from_pretrained(
        path,
        runtime=RuntimeConfig(compile_cache_dir="/opt/qwen3/xla_cache"),
        warm="background",          # overlap the cache reload with load
    )

Fresh-process TTFT is then ≈ checkpoint load + one backend service
round: the client compile is off the critical path entirely.

The cache key includes the jax/XLA version and the device kind; seed on
the same software image you deploy.  Without real weights the script
seeds with zero-init parameters — compiled programs depend only on
shapes/dtypes, so the cache entries are identical.

Usage: python tools/seed_compile_cache.py [--cache DIR] [--model PATH]
           [--durations 30 ...] [--batch-sizes 1 ...] [--max-tokens 128 ...]
           [--serve-slots N [--serve-flat]]

``--serve-slots N`` additionally seeds a continuous server's engine
programs (prefill groups at every admission size, admit/first-token,
and the scan-shaped chunk bodies including spec verify) — scan chunks
serialize into the cache, so a warmed server image restarts in seconds
instead of paying one backend compile per chunk program.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cache", default=os.path.expanduser("~/.cache/qwen3_asr_tpu/xla")
    )
    ap.add_argument(
        "--model", default=None,
        help="checkpoint dir (optional: zero-init params compile the "
        "same programs when absent)",
    )
    ap.add_argument("--durations", type=float, nargs="+", default=[30.0])
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1])
    ap.add_argument("--max-tokens", type=int, nargs="+", default=[128])
    ap.add_argument(
        "--steady", action="store_true",
        help="also wait for the background while-program compiles "
        "(steady-state programs; adds the backend's slow compile rounds)",
    )
    ap.add_argument(
        "--serve-slots", type=int, default=0,
        help="also seed a continuous server's engine programs at this "
        "slot count (prefill groups, admit, scan-shaped chunk bodies "
        "incl. spec verify — scan chunks DO serialize into the cache, "
        "unlike while programs)",
    )
    ap.add_argument(
        "--serve-flat", action="store_true",
        help="seed a flat-KV engine instead of the default paged one",
    )
    args = ap.parse_args()

    import jax

    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import ModelConfig, RuntimeConfig

    rt = RuntimeConfig(compile_cache_dir=args.cache)
    print(f"[seed] cache dir: {args.cache}", flush=True)
    print(f"[seed] devices: {jax.devices()}", flush=True)

    t0 = time.perf_counter()
    if args.model:
        model = Qwen3ASR.from_pretrained(args.model, runtime=rt)
    else:

        class Tok:
            def build_prompt(self, n, language="English"):
                from qwen3_asr_tpu.tokenizer import build_prompt

                return build_prompt(n, language_name_tokens=[6364])

            def decode(self, ids, skip_special_tokens=True):
                return " ".join(str(t) for t in ids)

        model = Qwen3ASR.from_random(
            ModelConfig(), tokenizer=Tok(), runtime=rt, seed=None
        )
    print(f"[seed] model ready in {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    if args.steady:
        model.warm_up(deployment={
            "durations": tuple(args.durations),
            "batch_sizes": tuple(args.batch_sizes),
            "max_tokens": tuple(args.max_tokens),
        })
    else:
        _warm_no_wait(model, args)
    print(
        f"[seed] programs compiled + serialized in "
        f"{time.perf_counter() - t0:.1f}s", flush=True,
    )

    if args.serve_slots:
        from qwen3_asr_tpu.serving.server import (
            ContinuousTranscriptionServer,
        )

        t0 = time.perf_counter()
        print(
            f"[seed] serving engine: n_slots={args.serve_slots} "
            f"paged={not args.serve_flat}", flush=True,
        )
        with ContinuousTranscriptionServer(
            model,
            n_slots=args.serve_slots,
            max_duration=max(args.durations),
            paged=not args.serve_flat,
            warm=tuple(args.durations),
        ):
            pass
        print(
            f"[seed] engine programs compiled + serialized in "
            f"{time.perf_counter() - t0:.1f}s", flush=True,
        )

    n = sum(len(fs) for _, _, fs in os.walk(args.cache))
    print(f"[seed] cache entries: {n} — ship {args.cache}", flush=True)


def _warm_no_wait(model, args) -> None:
    """warm_up's compile cells WITHOUT the steady-state wait_ready: the
    cold/bridge programs are what the first foreground call needs; the
    while programs compile server-side and aren't client-cacheable
    anyway (pallas-in-while programs never reload — docs/PERFORMANCE)."""
    import numpy as np

    from qwen3_asr_tpu.audio.mel import SAMPLE_RATE

    budgets = tuple(args.max_tokens)
    for b in args.batch_sizes:
        for d in args.durations:
            for m in budgets:
                print(
                    f"[seed] cell batch={b} duration={d:.1f}s "
                    f"max_tokens={m}", flush=True,
                )
                clips = [
                    np.zeros(max(1, int(d * SAMPLE_RATE)), np.float32)
                ] * b
                model.transcribe_batch(clips, max_tokens=m)


if __name__ == "__main__":
    main()
