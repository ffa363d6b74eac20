"""A/B the B=1 decode loop: plain greedy vs speculative (n-gram draft).

The speculative win factorizes into two measurable pieces:
  * mechanism overhead — ms per verify FORWARD (gamma+1 positions) vs ms
    per plain step.  At B=1 the step is weight-stream bound, so this
    ratio should be close to 1.0; it is a hardware fact independent of
    the workload.
  * acceptance — tokens emitted per forward.  Depends entirely on how
    repetitive the output stream is; random-init models loop hard, so
    the tok/s printed here is an UPPER bound until real weights exist.

Usage:  python tools/spec_bench.py [--steps 192] [--gamma 3]
Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qwen3_asr_tpu.config import RuntimeConfig, TextDecoderConfig  # noqa: E402
from qwen3_asr_tpu.models.decoder import (  # noqa: E402
    fuse_decoder_params,
    init_decoder_params,
)
from qwen3_asr_tpu.runtime.generate import Generator  # noqa: E402


def run_one(gen, B, n, audio_tokens=416, temperature=0.0):
    feats = jnp.zeros((B, audio_tokens, gen.cfg.hidden_size), jnp.bfloat16)
    prompts = [list(range(10)) + [151676] * audio_tokens + [7] * 5] * B
    t0 = time.time()
    out = gen.generate_batch(
        feats, [audio_tokens] * B, prompts,
        max_tokens=[n] * B, temperature=temperature,
        repetition_penalty=1.0, top_k=0, top_p=1.0,
    )
    return time.time() - t0, sum(len(t) for t in out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=192)
    ap.add_argument("--gamma", type=int, default=3)
    ap.add_argument(
        "--ngram", type=int, default=None,
        help="highest draft order (default: RuntimeConfig.spec_ngram; "
        "orders fall back to 2 — set 2 to A/B the single-order draft)",
    )
    ap.add_argument(
        "--init", choices=("random", "zero"), default="random",
        help="zero-init makes every argmax identical, so every draft "
        "accepts — the full-acceptance UPPER BOUND; random-init barely "
        "repeats — near the no-acceptance floor",
    )
    ap.add_argument(
        "--temperature", type=float, default=0.0,
        help="temperature > 0 A/Bs the SAMPLED loop: plain stochastic "
        "decode vs speculative sampling (rejection-sampling "
        "verification, RuntimeConfig.spec_sampling) — same floor/"
        "ceiling logic via --init",
    )
    ap.add_argument(
        "--quant", choices=("none", "int8"), default="none",
        help="int8 weight-only quantization (composes with spec: the "
        "verify forward dispatches through qlinear) — run with/without "
        "to fill the bf16/int8 x plain/spec matrix",
    )
    args = ap.parse_args()

    cfg = TextDecoderConfig()
    params = fuse_decoder_params(
        init_decoder_params(
            cfg,
            None if args.init == "zero" else jax.random.PRNGKey(0),
            jnp.bfloat16,
        )
    )
    if args.quant == "int8":
        from qwen3_asr_tpu.ops.quant import quantize_decoder_params

        params = quantize_decoder_params(params)
    B, steps = args.batch, args.steps
    lo = max(8, steps // 4)

    for spec in ("off", "ngram"):
        rt_kw = {} if args.ngram is None else {"spec_ngram": args.ngram}
        if args.temperature > 0:
            rt_kw["spec_sampling"] = spec == "ngram"
        rt = RuntimeConfig(
            speculative=spec, spec_gamma=args.gamma, quantization=args.quant,
            **rt_kw,
        )
        gen = Generator(params, cfg, rt)
        iters = {"n": 0}
        if spec == "ngram":
            orig = gen._spec_decode

            def spy(*a, **k):
                out = orig(*a, **k)
                iters["n"] = int(np.asarray(out[2]))
                return out

            gen._spec_decode = spy
        T = args.temperature
        run_one(gen, B, steps, temperature=T)          # compile + warm
        gen.wait_background_compiles()
        run_one(gen, B, steps, temperature=T)
        run_one(gen, B, lo, temperature=T)
        per_tok = min(
            (run_one(gen, B, steps, temperature=T)[0]
             - run_one(gen, B, lo, temperature=T)[0])
            / (steps - lo)
            for _ in range(4)
        )
        _, n_tok = run_one(gen, B, steps, temperature=T)
        fwd = iters["n"] if spec == "ngram" else steps
        print(json.dumps({
            "mode": spec,
            "temperature": args.temperature,
            "quant": args.quant,
            "batch": B,
            "gamma": args.gamma if spec == "ngram" else 0,
            "ms_per_token": round(per_tok * 1000, 3),
            "decode_tok_s": round(B / per_tok, 1),
            "tokens_per_forward": round(n_tok / B / max(fwd + 1, 1), 2),
        }), flush=True)
        del gen


if __name__ == "__main__":
    main()
