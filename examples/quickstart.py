"""Quickstart: transcribe files with Qwen3-ASR on TPU.

    python examples/quickstart.py /path/to/Qwen3-ASR-1.7B clip1.wav clip2.wav
"""

import sys

from qwen3_asr_tpu import Qwen3ASR

model_path, *clips = sys.argv[1:]
model = Qwen3ASR.from_pretrained(model_path)
model.warm_up()

# Single clips (greedy + the reference's default repetition penalty):
for clip in clips:
    result = model.transcribe(clip)
    print(f"{clip} [{result.language}, {result.duration:.1f}s]: {result.text}")
    print(f"  stats: {model.last_stats.as_dict()}")

# Or all clips in one batched device program:
if len(clips) > 1:
    for clip, result in zip(clips, model.transcribe_batch(clips)):
        print(f"batched {clip}: {result.text}")
