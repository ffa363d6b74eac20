"""Serving A/B: batch-then-drain vs in-flight continuous batching.

Workload (the VERDICT round-1 item-3 scenario): one long-budget request
arrives first and starts decoding; short requests then arrive in WAVES
while it runs — a streaming open-loop arrival pattern, not a single burst
(a one-shot burst is the drain server's best case: it forms one optimal
batch and continuous batching can only add overhead; under sustained
arrivals the drain server's head-of-line blocking serializes each wave
behind the long decode, while the ``DecodeEngine``-backed continuous
server admits every wave at the next chunk boundary).

Run on the TPU (zero-init 1.7B weights — timing is data-independent):

    python tools/serving_bench.py [--paged] [--n-short 12] [--wave-size 4]

Prints one JSON line with aggregate wall, per-class latencies and RTFx.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qwen3_asr_tpu.api import Qwen3ASR  # noqa: E402
from qwen3_asr_tpu.config import ModelConfig, RuntimeConfig  # noqa: E402
from qwen3_asr_tpu.serving.server import (  # noqa: E402
    ContinuousTranscriptionServer,
    TranscriptionServer,
)


class StubTok:
    def encode(self, text):
        return [sum(map(ord, text)) % 150000 + 1]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(map(str, ids))

    def build_prompt(self, n_audio_tokens, language="English"):
        from qwen3_asr_tpu.tokenizer import build_prompt

        return build_prompt(n_audio_tokens, self.encode(f" {language}"))


def clip(sec: float, f: float = 440.0) -> np.ndarray:
    t = np.arange(int(sec * 16000)) / 16000
    return (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def run_workload(
    server, long_clip, short_clips, long_budget, short_budget,
    wave_size=4, wave_interval=0.5,
):
    """Submit long, then shorts in timed waves while it decodes."""
    t0 = time.time()
    f_long = server.submit(long_clip, max_tokens=long_budget)
    time.sleep(0.05)
    pending = []  # (future, submit_time)
    for w0 in range(0, len(short_clips), wave_size):
        for c in short_clips[w0 : w0 + wave_size]:
            pending.append(
                (server.submit(c, max_tokens=short_budget), time.time())
            )
        time.sleep(wave_interval)
    short_lat = []
    for f, t_sub in pending:
        f.result(timeout=1200)
        short_lat.append(time.time() - t_sub)
    f_long.result(timeout=1200)
    wall = time.time() - t0
    return wall, short_lat


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--paged", action="store_true", default=True,
        help="paged KV engine (default; the measured winner)",
    )
    ap.add_argument(
        "--flat", dest="paged", action="store_false",
        help="flat contiguous-cache engine (A/B comparison)",
    )
    ap.add_argument("--n-short", type=int, default=12)
    ap.add_argument("--long-sec", type=float, default=30.0)
    ap.add_argument("--short-sec", type=float, default=30.0)
    ap.add_argument("--long-budget", type=int, default=512)
    ap.add_argument("--short-budget", type=int, default=64)
    ap.add_argument("--n-slots", type=int, default=16)
    ap.add_argument("--chunk-steps", type=int, default=32)
    ap.add_argument("--wave-size", type=int, default=4)
    ap.add_argument("--wave-interval", type=float, default=0.5)
    ap.add_argument(
        "--kv-dtype", choices=("bf16", "int8"), default="bf16",
        help="engine KV-cache storage (int8 halves the decode read stream)",
    )
    ap.add_argument(
        "--spec", choices=("auto", "on", "off"), default="auto",
        help="engine speculative verify chunks (all-greedy chunks; flat "
        "engines need bf16 KV, paged engines take bf16 and int8 pools; "
        "zero-init weights emit a constant stream, so acceptance — and "
        "the win — reads at its UPPER bound here)",
    )
    args = ap.parse_args()

    print("[serving-bench] loading 1.7B zero-init", file=sys.stderr, flush=True)
    model = Qwen3ASR.from_random(
        ModelConfig(), tokenizer=StubTok(),
        runtime=RuntimeConfig(
            kv_cache_dtype=args.kv_dtype, spec_engine=args.spec
        ),
        seed=None,
    )
    long_c = clip(args.long_sec, 220.0)
    shorts = [clip(args.short_sec, 300.0 + 20 * i) for i in range(args.n_short)]
    audio_total = args.long_sec + args.n_short * args.short_sec

    results = {}
    for name in ("batch_drain", "continuous"):
        if name == "batch_drain":
            srv = TranscriptionServer(model, max_batch_size=args.n_slots)
        else:
            srv = ContinuousTranscriptionServer(
                model,
                n_slots=args.n_slots,
                max_duration=max(args.long_sec, args.short_sec) + 1,
                max_new_tokens=args.long_budget,
                chunk_steps=args.chunk_steps,
                paged=args.paged,
                warm=(args.long_sec, args.short_sec)
                if args.long_sec != args.short_sec
                else (args.long_sec,),
            )
        with srv:
            # Warm: run the EXACT workload once so every program shape
            # (admission group sizes, batch widths, token buckets) is
            # compiled before the measured pass.
            run_workload(
                srv, long_c, shorts, args.long_budget, args.short_budget,
                args.wave_size, args.wave_interval,
            )
            wall, short_lat = run_workload(
                srv, long_c, shorts, args.long_budget, args.short_budget,
                args.wave_size, args.wave_interval,
            )
        results[name] = {
            "wall_s": round(wall, 3),
            "rtfx": round(audio_total / wall, 1),
            "short_p50_s": round(float(np.median(short_lat)), 3),
            "short_p95_s": round(float(np.percentile(short_lat, 95)), 3),
        }
        if name == "continuous":
            st = srv._engine.stats
            if st.spec_chunks:
                results[name]["spec_tokens_per_forward"] = round(
                    st.spec_tokens_per_forward, 2
                )
        print(f"[serving-bench] {name}: {results[name]}", file=sys.stderr, flush=True)

    speedup = results["batch_drain"]["wall_s"] / results["continuous"]["wall_s"]
    out = {
        "metric": "serving_mixed_workload",
        "paged": args.paged,
        "spec": args.spec,
        "audio_seconds": audio_total,
        **{f"{k}_{m}": v for k, r in results.items() for m, v in r.items()},
        "continuous_speedup": round(speedup, 2),
        "short_latency_ratio": round(
            results["batch_drain"]["short_p50_s"]
            / max(results["continuous"]["short_p50_s"], 1e-9), 2,
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
