"""A/B the decode loop: bf16 vs int8 weights (pallas vs xla lowering).

Round-1 negative result: the per-projection Pallas dequant matmuls were
10-20% SLOWER than bf16 (~113 kernel launches/step ate the HBM saving).
Round-2 candidates measured here:
  * xla    — inline int8->f32 dequant; XLA fuses the convert into the dot's
             operand read (zero extra launches inside the while_loop);
  * pallas — the round-1 tiled kernel, for comparison.

Usage:  QWEN3_ASR_QLINEAR=xla python tools/quant_bench.py [--batch 1 48]

Round-3 addition: ``--kv int8`` stores the KV cache quantized
(ops/quant_kv.py — the q8 decode-attention kernel streams half the
bytes), composable with int8 weights: ``--modes bf16 int8 --kv bf16
int8`` sweeps the full grid.

Prints one JSON line per (mode, kv, batch): ms/step and decode tok/s.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from qwen3_asr_tpu.config import RuntimeConfig, TextDecoderConfig  # noqa: E402
from qwen3_asr_tpu.models.decoder import (  # noqa: E402
    fuse_decoder_params,
    init_decoder_params,
)
from qwen3_asr_tpu.runtime.generate import Generator  # noqa: E402


def time_decode(gen, B, steps=128, audio_tokens=416):
    """(true ms/decode-step via max_new differencing, decode tok/s).

    A single wall / steps is contaminated by the async prefill dispatch
    landing in the decode wait (docs/PERFORMANCE.md); running the SAME
    compiled program at two token budgets and differencing cancels
    prefill, transfer and launch costs.
    """
    feats = jnp.zeros((B, audio_tokens, gen.cfg.hidden_size), jnp.bfloat16)
    prompts = [list(range(10)) + [151676] * audio_tokens + [7] * 5] * B

    def run(n):
        t0 = time.time()
        gen.generate_batch(
            feats, [audio_tokens] * B, prompts,
            max_tokens=[n] * B, temperature=0.0,
        )
        return time.time() - t0

    lo = max(8, steps // 4)
    # compile + warm; under progressive decode the first call may run on
    # the scan bridge — block until the steady-state while program is in,
    # so the timed passes measure the production path.
    run(steps)
    gen.wait_background_compiles()
    run(steps), run(lo)
    per_step = min(
        (run(steps) - run(lo)) / (steps - lo) for _ in range(4)
    )
    return per_step * 1000, B / per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 48])
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--modes", nargs="+", default=["bf16", "int8"])
    ap.add_argument("--kv", nargs="+", default=["bf16"],
                    help="KV-cache dtypes to sweep (bf16, int8)")
    args = ap.parse_args()

    import qwen3_asr_tpu.ops.quant as quant_mod

    cfg = TextDecoderConfig()
    params = fuse_decoder_params(init_decoder_params(cfg, None, jnp.bfloat16))
    rt = RuntimeConfig()

    for mode in args.modes:
        if mode == "bf16":
            p = params
        else:
            from qwen3_asr_tpu.ops.quant import quantize_decoder_params

            p = quantize_decoder_params(params)
        for kv_dtype in args.kv:
            rt_kv = RuntimeConfig(kv_cache_dtype=kv_dtype)
            gen = Generator(p, cfg, rt_kv)
            for B in args.batch:
                ms, tps = time_decode(gen, B, steps=args.steps)
                print(json.dumps({
                    "mode": mode,
                    "kv": kv_dtype,
                    "qlinear": quant_mod.QLINEAR_IMPL if mode == "int8" else "-",
                    "batch": B,
                    "ms_per_step": round(ms, 3),
                    "decode_tok_s": round(tps, 1),
                }), flush=True)
            del gen
        del p


if __name__ == "__main__":
    main()
