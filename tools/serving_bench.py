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


def run_poisson(server, clip_sec, n_requests, rate, budget, seed=0):
    """Open-loop Poisson arrivals at ``rate`` req/s against ``server``.

    Returns (wall_s, ttfts, latencies) over the completed requests.
    Open-loop means submission timing ignores server backpressure — the
    realistic production regime (VERDICT r4 item 6) where queueing shows
    up as TTFT growth rather than throttled offered load.
    """
    import threading

    rng = np.random.default_rng(seed)
    gaps = rng.exponential(1.0 / rate, n_requests)
    c = clip(clip_sec, 260.0)
    recs = []
    lock = threading.Lock()
    all_done = threading.Event()
    futs = []
    t_start = time.time()
    for i in range(n_requests):
        time.sleep(gaps[i])
        t0 = time.time()
        fut = server.submit(c, max_tokens=budget)

        def _done(f, t0=t0):
            tdone = time.time()
            with lock:
                recs.append((t0, tdone, getattr(f, "ttft_s", float("nan"))))
                if len(recs) == n_requests:
                    all_done.set()

        fut.add_done_callback(_done)
        futs.append(fut)
    for f in futs:
        f.result()
    # Future.result() returns once the waiter is notified, which happens
    # BEFORE done-callbacks run — wait for the last callback's record.
    all_done.wait(timeout=60)
    wall = time.time() - t_start
    lat = np.array([td - t0 for t0, td, _ in recs])
    ttft = np.array([t for *_, t in recs])
    return wall, ttft, lat


def poisson_study(args) -> int:
    """Sustained-load study on the continuous paged engine: p50/p99 TTFT
    and completion latency at each offered load (audio-seconds submitted
    per wall second = rate x clip_sec; offered < achieved-capacity keeps
    queues bounded, beyond it TTFT diverges)."""
    print("[serving-bench] loading 1.7B zero-init", file=sys.stderr, flush=True)
    model = Qwen3ASR.from_random(
        ModelConfig(), tokenizer=StubTok(),
        runtime=RuntimeConfig(
            kv_cache_dtype=args.kv_dtype, spec_engine=args.spec
        ),
        seed=None,
    )
    rows = []
    srv = ContinuousTranscriptionServer(
        model,
        n_slots=args.n_slots,
        max_duration=args.short_sec + 1,
        max_new_tokens=args.short_budget,
        chunk_steps=args.chunk_steps,
        admit_batch=args.admit_batch,
        paged=args.paged,
        warm=(args.short_sec,),
    )
    with srv:
        # Warm every power-of-two admission width (prefill_group pads the
        # group batch to 2^k) plus the steady decode widths with one
        # saturating burst, so the measured passes hit compiled programs
        # only.
        warm_futs = [
            srv.submit(clip(args.short_sec, 300.0), max_tokens=args.short_budget)
            for _ in range(max(8, args.n_slots))
        ]
        for f in warm_futs:
            f.result()
        for rate in args.rates:
            wall, ttft, lat = run_poisson(
                srv, args.short_sec, args.n_requests, rate,
                args.short_budget, seed=1,
            )
            row = {
                "rate_rps": rate,
                "offered_rtfx": round(rate * args.short_sec, 1),
                "achieved_rtfx": round(args.n_requests * args.short_sec / wall, 1),
                "n_requests": args.n_requests,
                "ttft_p50_s": round(float(np.nanpercentile(ttft, 50)), 3),
                "ttft_p99_s": round(float(np.nanpercentile(ttft, 99)), 3),
                "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
                "latency_p99_s": round(float(np.percentile(lat, 99)), 3),
            }
            st = srv._engine.stats
            if st.spec_chunks:
                row["spec_tokens_per_forward"] = round(
                    st.spec_tokens_per_forward, 2
                )
            rows.append(row)
            print(f"[serving-bench] poisson {row}", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "serving_poisson_load",
        "paged": args.paged,
        "spec": args.spec,
        "n_slots": args.n_slots,
        "clip_sec": args.short_sec,
        "budget": args.short_budget,
        "points": rows,
    }))
    return 0


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
    ap.add_argument(
        "--admit-batch", type=int, default=0,
        help="cap admission-group width (0 = n_slots); at 48 slots on a "
        "16 GiB v5e the full-width padded prefill OOMs next to the page "
        "pool — cap at 32 to fit",
    )
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
    ap.add_argument(
        "--arrival", choices=("burst", "poisson"), default="burst",
        help="burst = the long+waves A/B workload (default); poisson = "
        "open-loop sustained-load study on the continuous engine "
        "(p50/p99 TTFT + latency at each --rates point)",
    )
    ap.add_argument(
        "--rates", type=float, nargs="+", default=[2.0, 5.0, 10.0],
        help="poisson offered loads in requests/s (x clip_sec = offered "
        "RTFx)",
    )
    ap.add_argument("--n-requests", type=int, default=48)
    args = ap.parse_args()

    if args.arrival == "poisson":
        return poisson_study(args)

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
                admit_batch=args.admit_batch,
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
