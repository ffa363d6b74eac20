"""Incremental-session preview latency vs full-tail re-transcription.

Feeds a 30 s clip in 1 s pieces, timing ``IncrementalSession.preview()``
at several prefix lengths against ``model.transcribe`` of the same
prefix (what StreamingTranscriber.partial() used to run).  Also checks
the transcripts agree at every point (on-hardware bf16: the cached-
advance einsum path vs the prefill flash kernel may differ within
rounding; mismatches are reported, not asserted).

Run on the TPU env:  python tools/incremental_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main() -> None:
    from qwen3_asr_tpu.api import Qwen3ASR
    from qwen3_asr_tpu.config import ModelConfig, RuntimeConfig

    class Tok:
        def build_prompt(self, n, language="English"):
            from qwen3_asr_tpu.tokenizer import build_prompt

            return build_prompt(n, language_name_tokens=[6364])

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(map(str, ids))

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_qwen3_asr"),
        )
    except Exception:  # noqa: BLE001
        pass
    print("[inc-bench] devices:", jax.devices(), flush=True)
    model = Qwen3ASR.from_random(
        ModelConfig(), tokenizer=Tok(), runtime=RuntimeConfig(), seed=None
    )
    rng = np.random.default_rng(0)
    t = np.arange(int(30.0 * 16_000)) / 16_000
    audio = (
        0.1 * np.sin(2 * np.pi * 220 * t)
        * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
        + 0.005 * rng.standard_normal(len(t))
    ).astype(np.float32)

    sess = model.incremental_session(
        max_duration=30.0, language="English", max_tokens=128
    )
    piece = 16_000
    checkpoints = (5, 10, 15, 20, 25, 30)
    fed = 0
    for sec in checkpoints:
        while fed < sec * 16_000:
            sess.feed(audio[fed : fed + piece])
            fed += piece
        t0 = time.perf_counter()
        p = sess.preview()
        t_prev = time.perf_counter() - t0
        t0 = time.perf_counter()
        ref = model.transcribe(
            audio[:fed], max_tokens=128, language="English"
        )
        t_full = time.perf_counter() - t0
        match = "==" if p.text == ref.text else "!= (bf16 rounding)"
        print(
            f"[inc-bench] {sec:3d}s  preview {t_prev:6.2f}s  "
            f"full {t_full:6.2f}s  ({t_full / max(t_prev, 1e-9):4.1f}x)  "
            f"texts {match}",
            flush=True,
        )


if __name__ == "__main__":
    main()
