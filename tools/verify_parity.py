"""Greedy-transcript parity harness vs the MLX reference.

Usage (on a machine with a checkpoint; optionally with qwen3-asr-mlx
installed for a live A/B):

    python tools/verify_parity.py --model /path/to/Qwen3-ASR-1.7B \
        --audio clips/*.wav [--reference-json ref_transcripts.json]

Modes:
  * live A/B — if the ``qwen3_asr_mlx`` package is importable, transcribe
    every clip with both stacks and diff the token-level outputs;
  * recorded — compare against a JSON file {clip_path: transcript} captured
    earlier from the reference (e.g. on an Apple-Silicon machine).

The BASELINE.md fidelity target is token-identical greedy output; any
mismatch is printed with a character-level diff.
"""

from __future__ import annotations

import argparse
import difflib
import json
import sys
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--audio", nargs="+", required=True)
    ap.add_argument("--reference-json", default=None)
    ap.add_argument("--language", default=None)
    ap.add_argument("--max-tokens", type=int, default=None)
    ap.add_argument("--save-json", default=None,
                    help="write our transcripts to JSON (for later diffs)")
    args = ap.parse_args()

    from qwen3_asr_tpu import Qwen3ASR

    model = Qwen3ASR.from_pretrained(args.model)

    reference: dict[str, str] = {}
    if args.reference_json:
        reference = json.loads(Path(args.reference_json).read_text())

    ref_model = None
    if not reference:
        try:
            import qwen3_asr_mlx  # type: ignore

            ref_model = qwen3_asr_mlx.Qwen3ASR.from_pretrained(args.model)
            print("live A/B against qwen3_asr_mlx", file=sys.stderr)
        except ImportError:
            print(
                "no reference transcripts and qwen3_asr_mlx not importable: "
                "producing transcripts only (use --save-json)",
                file=sys.stderr,
            )

    ours: dict[str, str] = {}
    mismatches = 0
    for clip in args.audio:
        res = model.transcribe(
            clip, language=args.language, temperature=0.0,
            max_tokens=args.max_tokens,
        )
        ours[clip] = res.text
        expected = None
        if clip in reference:
            expected = reference[clip]
        elif ref_model is not None:
            expected = ref_model.transcribe(
                clip, language=args.language, temperature=0.0,
                max_tokens=args.max_tokens,
            ).text

        if expected is None:
            print(f"{clip}: {res.text}")
            continue
        if res.text == expected:
            print(f"{clip}: MATCH")
        else:
            mismatches += 1
            print(f"{clip}: MISMATCH")
            for line in difflib.unified_diff(
                [expected], [res.text], "reference", "qwen3_asr_tpu", lineterm=""
            ):
                print(f"  {line}")

    if args.save_json:
        Path(args.save_json).write_text(json.dumps(ours, indent=2))
    print(f"\n{len(args.audio)} clips, {mismatches} mismatches", file=sys.stderr)
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
