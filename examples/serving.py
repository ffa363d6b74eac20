"""Continuous-batching server: concurrent callers share device batches.

    python examples/serving.py /path/to/Qwen3-ASR-1.7B *.wav
"""

import sys

from qwen3_asr_tpu import Qwen3ASR, TranscriptionServer

model_path, *clips = sys.argv[1:]
model = Qwen3ASR.from_pretrained(model_path)
model.warm_up()

with TranscriptionServer(model, max_batch_size=8, batch_window_ms=20) as server:
    futures = [server.submit(clip) for clip in clips]
    for clip, fut in zip(clips, futures):
        print(f"{clip}: {fut.result().text}")
    print(f"served {server.stats.requests} requests in {server.stats.batches} "
          f"batches (mean batch {server.stats.mean_batch_size:.1f})")
