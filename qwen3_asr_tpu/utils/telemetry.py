"""Tracing, metrics and structured logging.

The reference has no observability at all (SURVEY.md §5: no timers, no
logging, by-design no telemetry — SECURITY.md).  This module adds the
TPU-native equivalents while preserving the no-network property: everything
stays in-process unless the caller reads it.

  * ``stage_timer`` — wall-clock spans around pipeline stages (mel, encode,
    prefill, decode, detokenize), accumulated per request.
  * ``trace_annotation`` — ``jax.profiler.TraceAnnotation`` wrapper so the
    same spans show up on TPU profiler timelines (XPlane) when a trace is
    being captured with ``start_trace``.
  * ``RequestStats`` — per-transcription record: durations, token counts,
    RTFx; exported as a plain dict for structured logging.
  * ``logger`` — standard ``logging`` channel ("qwen3_asr_tpu"), silent
    unless the application configures handlers.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

import jax

logger = logging.getLogger("qwen3_asr_tpu")


@dataclass
class RequestStats:
    """Timing/throughput record for one transcription request."""

    audio_seconds: float = 0.0
    n_prompt_tokens: int = 0
    n_generated_tokens: int = 0
    #: Verify LANE-forwards the speculative decode loop ran (0 = plain
    #: decode): loop iterations x real lanes — the while program runs the
    #: batch in lockstep, so each iteration physically computes one
    #: verify row per lane.  tokens / forwards is the measured
    #: tokens-per-lane-forward (1.0-ish = little accepted, gamma+1 =
    #: ceiling).  EngineStats counts live lane-forwards instead (its
    #: scan chunks pad with no-op iterations); both respect the gamma+1
    #: ceiling.
    n_spec_forwards: int = 0
    stages: dict[str, float] = field(default_factory=dict)

    @property
    def total_seconds(self) -> float:
        return sum(self.stages.values())

    @property
    def rtfx(self) -> float:
        """Real-time factor: audio seconds processed per wall second."""
        t = self.total_seconds
        return self.audio_seconds / t if t > 0 else 0.0

    @property
    def decode_tokens_per_second(self) -> float:
        t = self.stages.get("decode", 0.0)
        return self.n_generated_tokens / t if t > 0 else 0.0

    @property
    def spec_tokens_per_forward(self) -> float:
        """Realized speculative acceptance (tokens per verify forward)."""
        return (
            self.n_generated_tokens / self.n_spec_forwards
            if self.n_spec_forwards
            else 0.0
        )

    def as_dict(self) -> dict:
        out = {
            "audio_seconds": round(self.audio_seconds, 4),
            "n_prompt_tokens": self.n_prompt_tokens,
            "n_generated_tokens": self.n_generated_tokens,
            "total_seconds": round(self.total_seconds, 4),
            "rtfx": round(self.rtfx, 2),
            "decode_tokens_per_second": round(self.decode_tokens_per_second, 1),
            **{f"stage_{k}_seconds": round(v, 4) for k, v in self.stages.items()},
        }
        if self.n_spec_forwards:
            out["n_spec_forwards"] = self.n_spec_forwards
            out["spec_tokens_per_forward"] = round(self.spec_tokens_per_forward, 2)
        return out


@contextlib.contextmanager
def stage_timer(stats: RequestStats | None, name: str):
    """Accumulate wall time for a named stage + profiler annotation."""
    with jax.profiler.TraceAnnotation(f"qwen3_asr/{name}"):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if stats is not None:
                stats.stages[name] = stats.stages.get(name, 0.0) + (
                    time.perf_counter() - t0
                )


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a TPU/XLA profiler trace for the enclosed block.

    View with TensorBoard's profile plugin or xprof.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
