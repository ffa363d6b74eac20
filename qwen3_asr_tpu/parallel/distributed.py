"""Multi-host runtime initialization.

The reference has no communication backend of any kind (SURVEY.md §2.3);
on TPU the backend is XLA's collectives over ICI/DCN, set up once per
process via ``jax.distributed.initialize``.  This wrapper makes that an
explicit, idempotent framework call and exposes the process topology.
"""

from __future__ import annotations

import dataclasses

import jax

_initialized = False


@dataclasses.dataclass(frozen=True)
class Topology:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> Topology:
    """Initialize the multi-host runtime (no-op on a single host).

    On Cloud TPU pods the arguments are auto-detected from the metadata
    environment; pass them explicitly elsewhere.  Safe to call repeatedly.
    """
    global _initialized
    if not _initialized and (
        coordinator_address is not None or jax.process_count() == 1
    ):
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        _initialized = True
    return topology()


def topology() -> Topology:
    return Topology(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
    )
