"""End-to-end batch-size sweep: find the throughput ceiling (VERDICT #6).

Round 1 measured a cliff at batch 64 (9.55 s vs batch 32's 1.98 s) with
the old v3/v4 kernels and contiguous per-batch caches.  This sweeps the
current default stack (v5 decode kernel, in-place cache assembly, int16
PCM transport) over batch sizes and prints one JSON line per point:
wall, RTFx, and ms per decode step, so the ceiling — and whether
throughput is monotone up to it — is measured, not guessed.

Run on the TPU:  python tools/batch_sweep.py [--batches 8 16 32 48 64]
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

AUDIO_SECONDS = 30.0
DECODE_TOKENS = 128


class StubTok:
    def build_prompt(self, n_audio_tokens, language="English"):
        from qwen3_asr_tpu.tokenizer import build_prompt

        return build_prompt(n_audio_tokens, language_name_tokens=[6364])

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(map(str, ids))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--batches", type=int, nargs="+", default=[8, 16, 32, 48, 64]
    )
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    print("[sweep] loading 1.7B zero-init", file=sys.stderr, flush=True)
    model = Qwen3ASR.from_random(
        ModelConfig(), tokenizer=StubTok(), runtime=RuntimeConfig(), seed=None
    )
    rng = np.random.default_rng(0)
    for B in args.batches:
        clips = [
            (0.1 * rng.standard_normal(int(AUDIO_SECONDS * 16000))).astype(
                np.float32
            )
            for _ in range(B)
        ]
        model.transcribe_batch(clips, max_tokens=DECODE_TOKENS)  # compile
        walls = []
        for _ in range(args.repeats):
            t0 = time.time()
            model.transcribe_batch(clips, max_tokens=DECODE_TOKENS)
            walls.append(time.time() - t0)
        wall = min(walls)
        print(
            json.dumps(
                {
                    "batch": B,
                    "wall_s": round(wall, 3),
                    "rtfx": round(B * AUDIO_SECONDS / wall, 1),
                    "ms_per_step": round(wall / DECODE_TOKENS * 1000, 2),
                    "walls": [round(w, 3) for w in walls],
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
