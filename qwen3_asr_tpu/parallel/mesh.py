"""Device-mesh construction for SPMD execution.

The reference is strictly single-device (SURVEY.md §2.3: no DP/TP/PP/SP of
any kind); this module is the greenfield TPU-native distribution layer.
Mesh axes:

  * ``dp`` — data parallel: replicates parameters, shards the request batch.
    Collectives: none at inference; gradient psum in training.
  * ``tp`` — tensor parallel: shards attention heads (16Q/8KV divide 2/4/8
    ways) and FFN columns.  Collectives: all-reduce on attention/MLP
    outputs, inserted automatically by GSPMD from the sharding annotations
    and carried over ICI.

Pipeline parallelism is deliberately absent: the 1.7B decoder fits a single
chip in bf16 (~3.4 GB), so PP would only add bubble overhead; the
encoder/decoder split is the natural seam if a larger model family ever
needs it.  Expert parallelism is n/a (dense SwiGLU MLP).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh over the given (default: all) devices.

    ``tp`` should divide the KV head count (8 for Qwen3-ASR 1.7B) so that
    head sharding never splits a head.
    """
    if devices is None:
        devices = jax.devices()[: dp * tp]
    devices = np.asarray(devices)
    if devices.size != dp * tp:
        raise ValueError(
            f"need dp*tp = {dp * tp} devices, have {devices.size}"
        )
    return Mesh(devices.reshape(dp, tp), axis_names=("dp", "tp"))


def local_mesh() -> Mesh:
    """Single-device mesh (dp=1, tp=1) — the no-distribution fast path."""
    return make_mesh(1, 1, devices=jax.devices()[:1])
