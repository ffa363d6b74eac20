"""Continuous-batching transcription server.

The reference serializes concurrent callers behind one lock
(model.py:145, 239-250) — throughput equals single-stream latency.  Here
concurrent requests are coalesced into batched device programs:

  caller threads --submit()--> queue --worker--> transcribe_batch -> futures

Batching policy: the worker drains the queue up to ``max_batch_size``,
waiting at most ``batch_window_ms`` after the first request to let a batch
form.  Requests are only batched with others that share the same sampling
configuration (language, temperature, ...) so per-request semantics are
identical to solo calls.

Failure isolation (SURVEY.md §5): if a batch run raises, every request is
retried individually so one malformed clip cannot poison its batchmates;
per-request errors surface on that request's future only.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field


@dataclass
class _Request:
    audio: object
    options: dict
    future: Future

    def batch_key(self) -> tuple:
        """Requests batch together only with the same sampling options AND
        a comparable audio length (same mel frame bucket) — batching a 1 s
        clip with a 10-minute clip would pad the short one to the long
        bucket and waste encoder/prefill compute."""
        try:
            import numpy as np

            from ..config import DEFAULT_FRAME_BUCKETS

            n = len(self.audio) if not isinstance(self.audio, (str,)) else -1
            if n >= 0:
                frames = int(n) // 160
                bucket = next(
                    (b for b in DEFAULT_FRAME_BUCKETS if frames <= b),
                    DEFAULT_FRAME_BUCKETS[-1],
                )
            else:
                bucket = -1  # file paths: length unknown without decoding
        except Exception:  # noqa: BLE001
            bucket = -1
        return (bucket, tuple(sorted(self.options.items())))


@dataclass
class ServerStats:
    """Aggregate serving counters (in-process observability)."""

    requests: int = 0
    batches: int = 0
    failures: int = 0
    batch_sizes: list[int] = field(default_factory=list)

    @property
    def mean_batch_size(self) -> float:
        return sum(self.batch_sizes) / len(self.batch_sizes) if self.batch_sizes else 0.0


class TranscriptionServer:
    """Multi-stream serving wrapper around a :class:`Qwen3ASR` model."""

    def __init__(
        self,
        model,
        max_batch_size: int = 8,
        batch_window_ms: float = 15.0,
    ) -> None:
        self._model = model
        self._max_batch = max_batch_size
        self._window_s = batch_window_ms / 1000.0
        self._queue: queue.Queue[_Request | None] = queue.Queue()
        self.stats = ServerStats()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client API --------------------------------------------------------

    def submit(self, audio, **options) -> Future:
        """Enqueue one clip; returns a Future[TranscriptionResult]."""
        if self._closed:
            raise RuntimeError("server is closed")
        fut: Future = Future()
        self._queue.put(_Request(audio, options, fut))
        self.stats.requests += 1
        return fut

    def transcribe(self, audio, **options):
        """Blocking convenience wrapper over :meth:`submit`."""
        return self.submit(audio, **options).result()

    def close(self) -> None:
        """Drain and stop the worker."""
        if self._closed:
            return
        self._closed = True
        self._queue.put(None)
        self._worker.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker ------------------------------------------------------------

    def _collect_batch(self) -> list[_Request] | None:
        first = self._queue.get()
        if first is None:
            return None
        batch = [first]
        key = first.batch_key()
        deferred: list[_Request] = []
        deadline = threading.Event()
        timer = threading.Timer(self._window_s, deadline.set)
        timer.start()
        try:
            while len(batch) < self._max_batch and not deadline.is_set():
                try:
                    req = self._queue.get(timeout=self._window_s / 4)
                except queue.Empty:
                    continue
                if req is None:
                    self._queue.put(None)  # re-post shutdown sentinel
                    break
                if req.batch_key() == key:
                    batch.append(req)
                else:
                    deferred.append(req)
        finally:
            timer.cancel()
        for req in deferred:  # different options -> next batch
            self._queue.put(req)
        return batch

    def _run(self) -> None:
        while True:
            batch = self._collect_batch()
            if batch is None:
                return
            self.stats.batches += 1
            self.stats.batch_sizes.append(len(batch))
            options = batch[0].options
            try:
                results = self._model.transcribe_batch(
                    [r.audio for r in batch], **options
                )
                for req, res in zip(batch, results):
                    req.future.set_result(res)
            except Exception:
                # Isolate: retry each clip alone; report per-request errors.
                for req in batch:
                    try:
                        req.future.set_result(
                            self._model.transcribe(req.audio, **req.options)
                        )
                    except Exception as exc:  # noqa: BLE001
                        self.stats.failures += 1
                        req.future.set_exception(exc)
