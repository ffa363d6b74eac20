"""End-to-end A/B of the quantization matrix at the headline bench shape.

VERDICT r4 item 1: the W8A8 int8-MXU prefill was wired in round 4 but
never measured end-to-end.  This tool runs the FULL pipeline (the same
``transcribe_batch`` + device-side rep-diff instrumentation as bench.py)
at the headline batch-96 / 30 s / 128-token shape for each quantization
config:

  * bf16  — the default (token-identical greedy contract);
  * int8  — weight-only int8 decoder (halves the decode weight stream);
  * w8a8  — int8 weights + dynamic int8 activations on the prefill-side
            matmuls (encoder + decoder prompt pass run int8 x int8 MXU
            dots at 2x the bf16 rate; single-token decode stays
            weight-only via the row gate).

Prints one JSON line per config: wall RTFx (best of repeats), device
RTFx, device prefill ms, decode step ms.  Fidelity companion:
``tools/verify_vs_hf.py --quant w8a8`` bounds the accuracy cost at real
dims.  Usage (on the TPU machine):

    python tools/w8a8_bench.py [--configs bf16 w8a8] [--batch 96]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_COMPILE_CACHE = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_qwen3_asr")
)

AUDIO_SECONDS = 30.0
DECODE_TOKENS = 128

CONFIG_KW = {
    "bf16": {},
    "int8": {"quantization": "int8"},
    "w8a8": {"quantization": "int8", "act_quant": "int8"},
}


def log(msg: str) -> None:
    print(f"[w8a8_bench] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["bf16", "w8a8"],
                    choices=list(CONFIG_KW))
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--repeats", type=int, default=6)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _COMPILE_CACHE)
    except Exception as exc:  # noqa: BLE001
        log(f"compile cache unavailable: {exc}")

    from bench import _BenchTokenizer, device_side_rtfx

    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import ModelConfig, RuntimeConfig

    log(f"devices: {jax.devices()}")
    sr = 16_000
    rng = np.random.default_rng(0)
    clips = [
        np.clip(
            rng.standard_normal(int(AUDIO_SECONDS * sr)) * 0.05 * 32768.0,
            -32768, 32767,
        ).astype(np.int16)
        for _ in range(args.batch)
    ]

    for name in args.configs:
        rt = RuntimeConfig(speculative="off", **CONFIG_KW[name])
        t0 = time.perf_counter()
        model = Qwen3ASR.from_random(
            ModelConfig(), tokenizer=_BenchTokenizer(), runtime=rt, seed=None
        )
        log(f"[{name}] params ready in {time.perf_counter() - t0:.1f}s")

        def run() -> float:
            t0 = time.perf_counter()
            results = model.transcribe_batch(
                clips, max_tokens=DECODE_TOKENS, temperature=0.0
            )
            assert all(r.duration > 0 for r in results)
            return time.perf_counter() - t0

        t_compile = run()
        log(f"[{name}] batch-{args.batch} compile+first: {t_compile:.1f}s")
        if not model.wait_ready(timeout=1800):
            log(f"[{name}] wait_ready timed out; using first-flight path")
        walls = [run() for _ in range(args.repeats)]
        wall = min(walls)
        stats = model.last_stats.as_dict()
        log(f"[{name}] wall best {wall:.3f}s stats={stats}")

        try:
            dev = device_side_rtfx(model, clips, args.batch)
        except Exception as exc:  # noqa: BLE001
            log(f"[{name}] device-side failed: {exc}")
            dev = {"device_rtfx": 0.0, "prefill_ms": 0.0, "step_ms": 0.0}

        print(json.dumps({
            "config": name,
            "batch": args.batch,
            "wall_rtfx": round(AUDIO_SECONDS * args.batch / wall, 2),
            "wall_s": round(wall, 4),
            "stage_prefill_s": stats.get("stage_prefill_seconds"),
            "stage_decode_s": stats.get("stage_decode_seconds"),
            "device_rtfx": round(dev["device_rtfx"], 2),
            "device_prefill_ms": round(dev["prefill_ms"], 1),
            "device_step_ms": round(dev["step_ms"], 3),
        }), flush=True)

        model.close()
        del model


if __name__ == "__main__":
    sys.exit(main())
