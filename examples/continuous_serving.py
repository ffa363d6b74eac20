"""In-flight continuous batching: requests join a RUNNING decode.

    python examples/continuous_serving.py /path/to/Qwen3-ASR-1.7B *.wav

Compare examples/serving.py (batch-then-drain): here a request submitted
while a long transcription decodes is admitted at the next chunk boundary
instead of waiting for the whole batch to finish — 2.1x better short-
request latency under burst load, 8.8x aggregate under trickle arrivals
(docs/PERFORMANCE.md).
"""

import sys

from qwen3_asr_tpu import ContinuousTranscriptionServer, Qwen3ASR

model_path, *clips = sys.argv[1:]
model = Qwen3ASR.from_pretrained(model_path)

with ContinuousTranscriptionServer(
    model,
    n_slots=16,            # concurrent decodes sharing the paged KV pool
    max_duration=30.0,     # per-clip cap (long-form goes to transcribe())
    chunk_steps=32,        # admission latency bound, in decode steps
    warm=True,             # pre-pay every admission-group compile
) as server:
    futures = [server.submit(clip) for clip in clips]
    for clip, fut in zip(clips, futures):
        print(f"{clip}: {fut.result().text}")
    es = server.engine_stats
    print(
        f"{es.admitted} admitted ({es.mid_decode_admissions} mid-decode), "
        f"{es.chunks} chunks, mean occupancy {es.mean_occupancy:.1f}"
    )
