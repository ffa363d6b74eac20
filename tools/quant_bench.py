"""A/B the decode loop: bf16 vs int8 weights (pallas vs xla lowering).

Round-1 negative result: the per-projection Pallas dequant matmuls were
10-20% SLOWER than bf16 (~113 kernel launches/step ate the HBM saving).
Round-2 candidates measured here:
  * xla    — inline int8->f32 dequant; XLA fuses the convert into the dot's
             operand read (zero extra launches inside the while_loop);
  * pallas — the round-1 tiled kernel, for comparison.

Usage:  QWEN3_ASR_QLINEAR=xla python tools/quant_bench.py [--batch 1 48]

Prints one JSON line per (mode, batch): ms/step and decode tok/s.
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
    feats = jnp.zeros((B, audio_tokens, gen.cfg.hidden_size), jnp.bfloat16)
    prompts = [list(range(10)) + [151676] * audio_tokens + [7] * 5] * B
    kw = dict(max_tokens=[steps] * B, temperature=0.0)
    # compile + warm
    gen.generate_batch(feats, [audio_tokens] * B, prompts, **kw)
    t0 = time.time()
    out = gen.generate_batch(feats, [audio_tokens] * B, prompts, **kw)
    dt = time.time() - t0
    n_steps = max(len(t) for t in out)
    return dt / n_steps * 1000, n_steps * B / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 48])
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--modes", nargs="+", default=["bf16", "int8"])
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
        gen = Generator(p, cfg, rt)
        for B in args.batch:
            ms, tps = time_decode(gen, B, steps=args.steps)
            print(json.dumps({
                "mode": mode,
                "qlinear": quant_mod.QLINEAR_IMPL if mode == "int8" else "-",
                "batch": B,
                "ms_per_step": round(ms, 3),
                "decode_tok_s": round(tps, 1),
            }), flush=True)
        del gen, p


if __name__ == "__main__":
    main()
