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
import time
from concurrent.futures import Future
from dataclasses import dataclass


@dataclass
class _Request:
    audio: object
    options: dict
    future: Future
    #: Client-side enqueue timestamp (time.time()); used to stamp
    #: ``future.ttft_s`` when the request's prefill completes.
    submit_ts: float = 0.0

    def batch_key(self, frame_buckets=None) -> tuple:
        """Requests batch together only with the same sampling options AND
        a comparable audio length (same mel frame bucket) — batching a 1 s
        clip with a 10-minute clip would pad the short one to the long
        bucket and waste encoder/prefill compute.  ``frame_buckets`` is
        the SERVING MODEL's configured bucket table (falls back to the
        defaults) — keying by the wrong table would split/merge batches
        across real compiled-shape boundaries."""
        try:
            from ..config import DEFAULT_FRAME_BUCKETS

            buckets = frame_buckets or DEFAULT_FRAME_BUCKETS
            n = len(self.audio) if not isinstance(self.audio, (str,)) else -1
            if n >= 0:
                frames = int(n) // 160
                bucket = next(
                    (b for b in buckets if frames <= b), buckets[-1]
                )
            else:
                bucket = -1  # file paths: length unknown without decoding
        except Exception:  # noqa: BLE001
            bucket = -1
        return (bucket, tuple(sorted(self.options.items())))


@dataclass
class ServerStats:
    """Aggregate serving counters (in-process observability).

    Mutations go through :meth:`bump` — counters are updated from both the
    submitting threads and the worker, so unsynchronized ``+=`` would lose
    increments under contention.
    """

    requests: int = 0
    batches: int = 0
    failures: int = 0
    batched_requests: int = 0  # running sum (bounded; no per-batch list)

    def __post_init__(self) -> None:
        self._lock = threading.Lock()

    def bump(self, field_name: str, by: int = 1) -> None:
        with self._lock:
            setattr(self, field_name, getattr(self, field_name) + by)

    def record_batch(self, size: int) -> None:
        with self._lock:
            self.batches += 1
            self.batched_requests += size

    @property
    def mean_batch_size(self) -> float:
        with self._lock:
            if not self.batches:
                return 0.0
            return self.batched_requests / self.batches


def _deliver(fut: Future, result=None, exc=None) -> None:
    """Resolve a future, tolerating client-side cancellation: a caller
    that cancelled its Future must not be able to kill the worker thread
    (set_result/set_exception raise InvalidStateError on a CANCELLED
    future)."""
    try:
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)
    except Exception:  # noqa: BLE001 — cancelled/already-resolved future
        pass


def _collect_batch(
    q: "queue.Queue[_Request | None]", max_batch: int, window_s: float,
    frame_buckets=None,
) -> "list[_Request] | None":
    """Drain up to ``max_batch`` same-key requests, waiting at most
    ``window_s`` after the first; ``None`` = shutdown sentinel (re-posted
    if seen mid-batch so sibling workers also stop)."""
    import time

    first = q.get()
    if first is None:
        return None
    batch = [first]
    key = first.batch_key(frame_buckets)
    deferred: list[_Request] = []
    saw_sentinel = False
    deadline = time.monotonic() + window_s
    while len(batch) < max_batch:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        try:
            req = q.get(timeout=remaining)
        except queue.Empty:
            break
        if req is None:
            saw_sentinel = True
            break
        if req.batch_key(frame_buckets) == key:
            batch.append(req)
        else:
            deferred.append(req)
    for req in deferred:  # different options -> next batch
        q.put(req)
    if saw_sentinel:
        # Re-post AFTER the deferred requests so they are still served.
        q.put(None)
    return batch


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
        self._queue.put(_Request(audio, options, fut, time.time()))
        self.stats.bump("requests")
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
        return _collect_batch(
            self._queue, self._max_batch, self._window_s,
            self._model._runtime.frame_buckets,
        )

    def _run(self) -> None:
        while True:
            batch = self._collect_batch()
            if batch is None:
                return
            self.stats.record_batch(len(batch))
            options = batch[0].options
            try:
                results = self._model.transcribe_batch(
                    [r.audio for r in batch], **options
                )
                for req, res in zip(batch, results):
                    _deliver(req.future, res)
            except Exception:
                # Isolate: retry each clip alone; report per-request errors.
                for req in batch:
                    try:
                        _deliver(
                            req.future,
                            self._model.transcribe(req.audio, **req.options),
                        )
                    except Exception as exc:  # noqa: BLE001
                        self.stats.bump("failures")
                        _deliver(req.future, exc=exc)


class ContinuousTranscriptionServer:
    """In-flight continuous batching: requests join a RUNNING decode.

    :class:`TranscriptionServer` batches at admission only — once a batch's
    decode loop launches, later requests wait for it to drain (head-of-line
    blocking).  This server drives a persistent
    :class:`~qwen3_asr_tpu.runtime.engine.DecodeEngine`: the worker
    alternates short compiled decode chunks with admission and retirement,
    so a request submitted mid-decode starts after at most ``chunk_steps``
    decode steps and finished sequences free their slots without stopping
    the batch (BASELINE.json north-star config 5; no reference
    counterpart — model.py:145 serializes everything).

    Clips longer than ``max_duration`` are rejected with a clear error
    (use ``model.transcribe`` — its chunked path handles long-form).
    """

    def __init__(
        self,
        model,
        n_slots: int = 8,
        max_duration: float = 30.0,
        max_new_tokens: int = 512,
        chunk_steps: int = 32,
        admit_batch: int = 0,
        paged: bool = True,
        page_size: int = 256,
        kv_pool_gb: float | None = None,
        warm: bool | tuple[float, ...] = False,
    ) -> None:
        self._model = model
        self._engine = model.make_engine(
            n_slots=n_slots,
            max_duration=max_duration,
            max_new_tokens=max_new_tokens,
            chunk_steps=chunk_steps,
            paged=paged,
            page_size=page_size,
            kv_pool_gb=kv_pool_gb,
        )
        self._max_duration = max_duration
        self._admit_batch = admit_batch or n_slots
        self._queue: queue.Queue[_Request | None] = queue.Queue()
        self.stats = ServerStats()
        self._closed = False
        if warm:
            self._warm_up(
                warm if isinstance(warm, (tuple, list)) else (max_duration,)
            )
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _warm_up(self, durations: tuple[float, ...]) -> None:
        """Pre-pay every compile the serving path can hit, BEFORE the
        worker starts: one prefill + admit + chunk + retire cycle at each
        power-of-two admission-group size up to the admission cap.  Group
        sizes depend on request arrival timing, so without this a
        production server hits never-seen shapes mid-traffic and stalls
        the whole batch for the duration of an XLA compile (~tens of
        seconds)."""
        import numpy as np

        from ..audio.io import SAMPLE_RATE
        from ..runtime.engine import SlotRequest
        from ..utils.telemetry import logger

        # Every group size 1..min(n_slots, admit_batch): ``_run`` caps
        # real admission groups at ``admit_batch``, so wider warm cells
        # would compile (and transiently allocate — the fused prefill
        # pads its batch dim to a power of two) programs that can never
        # run.  At 48 slots on a 16 GiB v5e the phantom padded-64 warm
        # prefill alone OOMs next to the resident page pool; capping
        # admission at 32 keeps the same steady-state width the engine
        # was measured at and fits.
        sizes = list(range(1, min(self._engine.n_slots, self._admit_batch) + 1))
        cells = [(d, bg) for d in durations for bg in sizes]
        for i, (dur, bg) in enumerate(cells):
            logger.info(
                "continuous-server warm_up %d/%d: %.0fs group size %d",
                i + 1, len(cells), dur, bg,
            )
            clip = np.zeros(int(dur * SAMPLE_RATE), np.float32)
            try:
                kv, first_logits, prompts = self._model.prefill_group(
                    [clip] * bg, ["English"] * bg
                )
            except Exception as exc:
                if "RESOURCE_EXHAUSTED" not in str(exc):
                    raise
                raise RuntimeError(
                    f"continuous-server warm_up ran out of device memory at "
                    f"admission-group size {bg} (padded prefill width "
                    f"{1 << (bg - 1).bit_length() if bg > 1 else 1}) with "
                    f"n_slots={self._engine.n_slots}.  The KV page pool plus "
                    f"the widest admission prefill must fit HBM together; "
                    f"options: lower admit_batch= (caps prefill width without "
                    f"reducing slots), RuntimeConfig(kv_cache_dtype='int8') "
                    f"(halves the pool), kv_pool_gb= (bounds the pool and "
                    f"oversubscribes), or fewer n_slots."
                ) from exc
            reqs = [
                SlotRequest(
                    samples=clip, prompt=p, max_new=2, temperature=0.0,
                    top_k=0, top_p=1.0, repetition_penalty=1.2,
                    repetition_context_size=100, seed=0, meta=None,
                )
                for p in prompts
            ]
            self._engine.admit(kv, first_logits, self._engine.free_slots(), reqs)
            self._engine.step()
            self._engine.retire()
        if self._admit_batch < self._engine.n_slots:
            # Chunk programs are width-bucketed up to n_slots, so a full
            # engine still decodes at widths the capped admission loop
            # above never stepped.  Fill every slot through repeated
            # capped admissions (each prefill shape is already compiled),
            # then run ONE chunk at full width — compiling the widest
            # chunk program without ever materializing a wide prefill.
            logger.info(
                "continuous-server warm_up: full-width chunk (%d slots, "
                "admissions capped at %d)",
                self._engine.n_slots, self._admit_batch,
            )
            for dur in durations:
                clip = np.zeros(int(dur * SAMPLE_RATE), np.float32)
                while True:
                    free = self._engine.free_slots()
                    if len(free) == 0:
                        break
                    bg = min(len(free), self._admit_batch)
                    kv, first_logits, prompts = self._model.prefill_group(
                        [clip] * bg, ["English"] * bg
                    )
                    reqs = [
                        SlotRequest(
                            samples=clip, prompt=p, max_new=2,
                            temperature=0.0, top_k=0, top_p=1.0,
                            repetition_penalty=1.2,
                            repetition_context_size=100, seed=0, meta=None,
                        )
                        for p in prompts
                    ]
                    rejected = self._engine.admit(
                        kv, first_logits, free[:bg], reqs
                    )
                    if rejected:
                        # Page pool can't hold every slot at this clip
                        # length (oversubscribed kv_pool_gb) — the widest
                        # reachable width is whatever fit; warm that and
                        # move on rather than spin on a pool that will
                        # never free (nothing retires during this fill).
                        logger.info(
                            "continuous-server warm_up: page pool holds "
                            "only %d slots at %.0fs — full-width pass "
                            "warms the reachable width",
                            self._engine.n_live(), dur,
                        )
                        break
                self._engine.step()
                while self._engine.n_live() > 0:
                    self._engine.retire()
                    if self._engine.n_live() > 0:
                        self._engine.step()
        logger.info("continuous-server warm_up done (%d cells)", len(cells))

    @property
    def engine_stats(self):
        return self._engine.stats

    # -- client API --------------------------------------------------------

    def submit(self, audio, **options) -> Future:
        if self._closed:
            raise RuntimeError("server is closed")
        fut: Future = Future()
        self._queue.put(_Request(audio, options, fut, time.time()))
        self.stats.bump("requests")
        return fut

    def transcribe(self, audio, **options):
        return self.submit(audio, **options).result()

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self._queue.put(None)
        self._worker.join(timeout=60)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker ------------------------------------------------------------

    def _drain_new(self, block: bool) -> list[_Request] | None:
        """Pending requests up to the free-slot count.  ``None`` = shutdown."""
        free = len(self._engine.free_slots())
        out: list[_Request] = []
        want = min(free, self._admit_batch)
        while len(out) < want:
            try:
                req = self._queue.get(block=block and not out, timeout=None)
            except queue.Empty:
                break
            if req is None:
                self._queue.put(None)
                return out or None
            out.append(req)
            block = False
        return out

    def _admit(self, reqs: list[_Request]) -> list[_Request]:
        """Admit up to the engine's capacity; returns DEFERRED requests
        (paged mode: page pool exhausted) to retry after retirements."""
        from ..api import TranscriptionResult
        from ..audio.io import SAMPLE_RATE, load_audio
        from ..runtime.engine import SlotRequest

        # Never prefill more requests than there are free slots:
        # engine.admit truncates its slot list to the group size, so an
        # oversized group would index past the free slots and crash —
        # failing every batched future with a spurious internal error.
        # Also honor admit_batch here, not just in _drain_new: the
        # deferred-retry path concatenates deferred + fresh requests, and
        # an uncapped group would prefill at a width warm-up never
        # compiled (mid-traffic XLA stall, or the very padded-width OOM
        # the cap exists to prevent).
        cap = min(len(self._engine.free_slots()), self._admit_batch)
        reqs, overflow = reqs[:cap], reqs[cap:]
        ready: list[tuple[_Request, "object", str, float]] = []
        for req in reqs:
            try:
                if isinstance(req.audio, (str,)) or hasattr(req.audio, "__fspath__"):
                    samples = load_audio(req.audio)
                else:
                    from ..api import _validate_samples

                    samples = _validate_samples(req.audio)
                duration = len(samples) / SAMPLE_RATE
                if len(samples) == 0:
                    _deliver(
                        req.future,
                        TranscriptionResult(
                            text="", language="Unknown", duration=0.0
                        ),
                    )
                    continue
                if duration > self._max_duration:
                    raise ValueError(
                        f"clip of {duration:.0f}s exceeds this server's "
                        f"max_duration={self._max_duration:.0f}s; use "
                        "model.transcribe() for long-form audio"
                    )
                lang = self._model._resolve_language(req.options.get("language"))
                ready.append((req, samples, lang, duration))
            except Exception as exc:  # noqa: BLE001
                self.stats.bump("failures")
                _deliver(req.future, exc=exc)
        if not ready:
            return overflow
        try:
            kv, first_logits, prompts = self._model.prefill_group(
                [r[1] for r in ready], [r[2] for r in ready]
            )
            slot_reqs = []
            for (req, samples, lang, duration), prompt in zip(ready, prompts):
                opts = req.options
                budget = opts.get("max_tokens") or max(256, int(duration * 50))
                slot_reqs.append(
                    SlotRequest(
                        samples=samples,
                        prompt=prompt,
                        max_new=budget,
                        temperature=opts.get("temperature", 0.0),
                        top_k=opts.get("top_k", 0),
                        top_p=opts.get("top_p", 1.0),
                        repetition_penalty=opts.get("repetition_penalty", 1.2),
                        repetition_context_size=opts.get(
                            "repetition_context_size", 100
                        ),
                        seed=opts.get("seed", 0),
                        meta=(req.future, lang, duration),
                    )
                )
            by_slotreq = {id(sr): r[0] for sr, r in zip(slot_reqs, ready)}
            rejected = self._engine.admit(
                kv, first_logits, self._engine.free_slots(), slot_reqs
            )
            admitted = len(slot_reqs) - len(rejected or [])
            if admitted:
                self.stats.record_batch(admitted)
                # TTFT stamp: an admitted request's prefill is done and
                # its first logits are on device — the first token exists
                # as of now.  Exposed as ``future.ttft_s`` for load
                # studies (tools/serving_bench.py --arrival poisson).
                now = time.time()
                rejected_ids = {id(sr) for sr in (rejected or [])}
                for sr in slot_reqs:
                    if id(sr) not in rejected_ids:
                        req = by_slotreq[id(sr)]
                        req.future.ttft_s = now - req.submit_ts
            return [
                by_slotreq[id(sr)] for sr in (rejected or [])
            ] + overflow
        except Exception as exc:  # noqa: BLE001
            for req, *_ in ready:
                self.stats.bump("failures")
                _deliver(req.future, exc=exc)
        return overflow

    def _retire(self) -> int:
        from ..api import TranscriptionResult

        retired = 0
        for slot_req, toks in self._engine.retire():
            retired += 1
            future, lang, duration = slot_req.meta
            try:
                text, out_lang = self._model._finalize_output(toks, lang)
                _deliver(
                    future,
                    TranscriptionResult(
                        text=text, language=out_lang, duration=duration
                    ),
                )
            except Exception as exc:  # noqa: BLE001
                self.stats.bump("failures")
                _deliver(future, exc=exc)
        return retired

    def _run(self) -> None:
        deferred: list[_Request] = []
        retry_deferred = True
        while True:
            # Idle only when no slot holds a request (n_live counts
            # finished-but-unharvested slots too — a request whose FIRST
            # token was EOS is live&done with n_active()==0 and must be
            # retired promptly, not when the next request happens by).
            idle = self._engine.n_live() == 0 and not deferred
            reqs = self._drain_new(block=idle)
            if reqs is None:
                # Shutdown: drain in-flight work before exiting.
                while self._engine.n_live() > 0 or deferred:
                    if deferred:
                        deferred = self._admit(deferred)
                    self._engine.step()
                    if self._retire():
                        retry_deferred = True
                    if self._engine.n_active() == 0 and deferred:
                        self._fail_deferred(deferred)
                        deferred = []
                return
            todo = (deferred if retry_deferred else []) + (reqs or [])
            if todo:
                if retry_deferred:
                    deferred = []
                still = self._admit(todo)
                if still and self._engine.n_active() == 0:
                    # Engine is empty yet admission failed: the request can
                    # never fit this pool — fail it rather than spin.
                    self._fail_deferred(still)
                    still = []
                deferred.extend(still)
                retry_deferred = not deferred
                # Requests that finished AT admission (first token EOS or
                # budget <= 1) never enter a decode chunk: harvest now.
                if self._retire():
                    retry_deferred = True
            if self._engine.n_active() > 0:
                self._engine.step()
                if self._retire():
                    retry_deferred = True
            elif self._engine.n_live() > 0:
                # Nothing decoding but finished slots await harvest
                # (belt-and-braces: guarantees loop progress).
                if self._retire():
                    retry_deferred = True

    def _fail_deferred(self, reqs: list[_Request]) -> None:
        for req in reqs:
            self.stats.bump("failures")
            _deliver(
                req.future,
                exc=RuntimeError(
                    "request cannot be admitted: its prompt alone exceeds "
                    "the engine's KV page pool; raise kv_pool_gb"
                ),
            )


class ReplicatedTranscriptionServer:
    """dp scale-out serving: one full model replica per device.

    At 1.7B the entire parameter set fits a single chip, so throughput
    scales embarrassingly: an independent replica runs on every device
    and R workers drain ONE shared queue — the BASELINE config-5
    deployment shape (v5e-8).  No collectives cross replicas (ICI stays
    free for intra-replica tp if the factory's RuntimeConfig asks for
    it); ``jax.default_device`` pins each replica's construction and
    every batch it serves to its own device, so host-side transfers and
    compiled programs never touch a sibling's chip.

    ``model_factory`` is called once per device (under that device's
    default-device scope) — pass a closure over ``from_pretrained`` /
    ``from_random``.  Work-stealing comes free from the shared queue: a
    replica busy with a long batch simply doesn't poll while its
    siblings keep draining.

    No reference counterpart (single device, model.py:145).
    """

    def __init__(
        self,
        model_factory,
        devices=None,
        max_batch_size: int = 8,
        batch_window_ms: float = 15.0,
    ) -> None:
        import jax

        self._devices = list(
            devices if devices is not None else jax.local_devices()
        )
        if not self._devices:
            raise ValueError("no devices for replicas")
        self._max_batch = max_batch_size
        self._window_s = batch_window_ms / 1000.0
        self._queue: queue.Queue[_Request | None] = queue.Queue()
        self.stats = ServerStats()
        self._closed = False
        self._models = []
        for d in self._devices:
            with jax.default_device(d):
                self._models.append(model_factory())
        self._workers = [
            threading.Thread(
                target=self._run_replica, args=(m, d), daemon=True
            )
            for m, d in zip(self._models, self._devices)
        ]
        for w in self._workers:
            w.start()

    @property
    def n_replicas(self) -> int:
        return len(self._models)

    # -- client API --------------------------------------------------------

    def submit(self, audio, **options) -> Future:
        if self._closed:
            raise RuntimeError("server is closed")
        fut: Future = Future()
        self._queue.put(_Request(audio, options, fut, time.time()))
        self.stats.bump("requests")
        return fut

    def transcribe(self, audio, **options):
        return self.submit(audio, **options).result()

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        for _ in self._workers:
            self._queue.put(None)
        for w in self._workers:
            w.join(timeout=60)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- workers -----------------------------------------------------------

    def _run_replica(self, model, device) -> None:
        import jax

        while True:
            batch = _collect_batch(
                self._queue, self._max_batch, self._window_s,
                model._runtime.frame_buckets,
            )
            if batch is None:
                return
            self.stats.record_batch(len(batch))
            options = batch[0].options
            with jax.default_device(device):
                try:
                    results = model.transcribe_batch(
                        [r.audio for r in batch], **options
                    )
                    for req, res in zip(batch, results):
                        _deliver(req.future, res)
                except Exception:
                    for req in batch:
                        try:
                            _deliver(
                                req.future,
                                model.transcribe(req.audio, **req.options),
                            )
                        except Exception as exc:  # noqa: BLE001
                            self.stats.bump("failures")
                            _deliver(req.future, exc=exc)
