"""Capture an xprof device trace of the bench hot programs and print a
per-op breakdown.

Targets the two programs the official bench times (bench.py
device_side_rtfx): the fused mel->encoder->prefill body (scanned 4x
in-program) and the steady-state decode program, at the bench shapes
(default B=96, 30 s clips, 128 tokens).  The parsed per-op self-time
table is the ground truth for where prefill's device time goes — the
rep-diff totals say prefill runs at ~60% of its FLOP bound but not why.

Run on the real chip (exclusive — don't share with another bench):

    python tools/profile_capture.py [--batch 96] [--out /tmp/xprof]

Prints the top ops by self time for each program region and writes the
raw tool JSON next to the trace for deeper digging.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    # Default batch 64: the profiler's trace buffers pushed the full
    # B=96 bench shapes (weights + 96-slot cache + prefill intermediates)
    # over HBM (measured RESOURCE_EXHAUSTED); 64 keeps the same kernels.
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--out", default="/tmp/xprof_capture")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument(
        "--no-decode", action="store_true",
        help="profile only the prefill program (smaller footprint)",
    )
    ap.add_argument(
        "--quant", choices=("none", "int8", "w8a8"), default="none",
        help="profile the quantized configs (w8a8 = int8 weights + "
        "dynamic int8 prefill activations)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.audio.mel import HOP_LENGTH, N_FFT, host_pad_batch
    from qwen3_asr_tpu.config import ModelConfig, RuntimeConfig
    from qwen3_asr_tpu.models.decoder import init_kv_cache

    t0 = time.time()
    print(f"[profile] backend={jax.default_backend()}", flush=True)
    quant_kw = {
        "none": {},
        "int8": {"quantization": "int8"},
        "w8a8": {"quantization": "int8", "act_quant": "int8"},
    }[args.quant]
    model = Qwen3ASR.from_random(
        ModelConfig(), tokenizer=bench._BenchTokenizer(),
        runtime=RuntimeConfig(**quant_kw), dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    clips = [
        (0.1 * rng.standard_normal(int(args.seconds * 16000))).astype(
            np.float32
        )
        for _ in range(args.batch)
    ]
    print(f"[profile] model+clips ready at {time.time() - t0:.1f}s", flush=True)

    # -- mirror bench.device_side_rtfx's program construction -------------
    gen = model._generator
    cfg = model._config
    enc_p, dec_p = model._encoder_params, model._decoder_params
    batch = args.batch
    bucket = model._mel.bucket_for(len(clips[0]))
    n_valid = [len(c) // HOP_LENGTH for c in clips[:batch]]
    n_audio = [model._n_audio_tokens(v) for v in n_valid]
    prompts = [model._tokenizer.build_prompt(n, "English") for n in n_audio]
    plens = [len(p) for p in prompts]
    atb = (
        bucket // cfg.audio_encoder.chunk_frames
        * cfg.audio_encoder.tokens_per_chunk
    )
    pbucket, tbucket, cache_len = gen.plan(
        atb, max(plens), bench.DECODE_TOKENS, batch=batch
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

    reps = 4
    prefill_rep = jax.jit(
        lambda ep, dp, x: jax.lax.scan(
            lambda c, i: (
                c + prefill_body(ep, dp, x + jnp.asarray(i, x.dtype)),
                None,
            ),
            jnp.float32(0),
            jnp.arange(reps),
        )[0]
    )

    logits0 = jnp.asarray(
        rng.standard_normal((batch, cfg.text_decoder.vocab_size)) * 0.01,
        jnp.float32,
    )

    def run_decode(max_new):
        kv = init_kv_cache(cfg.text_decoder, batch, cache_len, jnp.bfloat16)
        return gen.decode(
            kv, logits0, plens, [max_new] * batch, tbucket,
            repetition_penalty=1.2, repetition_context_size=100,
        )

    print("[profile] compiling (first run is slow)...", flush=True)
    float(prefill_rep(enc_p, dec_p, padded))
    if not args.no_decode:
        run_decode(bench.DECODE_TOKENS)
    print(f"[profile] compiled at {time.time() - t0:.1f}s", flush=True)

    out_dir = args.out
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        with jax.profiler.TraceAnnotation("bench_prefill_x4"):
            float(prefill_rep(enc_p, dec_p, padded))
        if not args.no_decode:
            with jax.profiler.TraceAnnotation("bench_decode_128"):
                run_decode(bench.DECODE_TOKENS)
    print(f"[profile] trace captured at {time.time() - t0:.1f}s", flush=True)

    xplanes = sorted(glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True))
    if not xplanes:
        print("[profile] ERROR: no xplane.pb found under", out_dir)
        return 1
    xplane = xplanes[-1]
    print(f"[profile] parsing {xplane}", flush=True)

    from xprof.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xplane], tool, {}
            )
        except Exception as e:  # tool coverage varies by version
            print(f"[profile] {tool} unavailable: {e}")
            continue
        raw_path = Path(out_dir) / f"{tool}.json"
        blob = data if isinstance(data, (str, bytes)) else json.dumps(data)
        raw_path.write_bytes(
            blob.encode() if isinstance(blob, str) else blob
        )
        print(f"[profile] {tool} -> {raw_path}")

    # Human summary from framework_op_stats (a DataTable-style JSON).
    stats_path = Path(out_dir) / "framework_op_stats.json"
    if stats_path.exists():
        try:
            tbl = json.loads(stats_path.read_text())
            tables = tbl if isinstance(tbl, list) else [tbl]
            for t in tables:
                cols = [c.get("label") or c.get("id") for c in t.get("cols", [])]
                if not cols:
                    continue
                rows = [
                    [c.get("v") for c in r.get("c", [])]
                    for r in t.get("rows", [])
                ]
                try:
                    hd_i = next(
                        (i for i, c in enumerate(cols)
                         if c and "device" in str(c).lower()
                         and "host" in str(c).lower()), None
                    )
                    if hd_i is not None:
                        rows = [
                            r for r in rows
                            if str(r[hd_i]).lower() == "device"
                        ]
                    self_i = next(
                        i for i, c in enumerate(cols)
                        if c and "self" in str(c).lower()
                        and "time" in str(c).lower()
                    )
                except StopIteration:
                    continue
                rows.sort(
                    key=lambda r: (r[self_i] or 0), reverse=True
                )
                print("[profile] top ops by self time:")
                name_i = next(
                    (i for i, c in enumerate(cols)
                     if c and "name" in str(c).lower()), 0
                )
                for r in rows[: args.top]:
                    print(f"    {r[self_i]:>14} us  {r[name_i]}")
                break
        except Exception as e:
            print(f"[profile] summary parse failed ({e}); raw JSON kept")
    print(f"[profile] done in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
