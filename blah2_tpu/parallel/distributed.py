"""Multi-host (multi-process) bootstrap for the sharded pipeline.

The reference is a single-process pipeline; SURVEY §2.5/§5 mandates CPI
sharding "across hosts" for the TPU build. This module wires the standard
JAX multi-controller model: every host runs the same program, calls
:func:`maybe_initialize` once at startup, and `jax.devices()` then spans
the whole job — `make_radar_mesh` and `ShardedCpiPipeline` work unchanged,
with XLA routing collectives over ICI within a slice and DCN across hosts.

Configuration comes from explicit arguments, ``BLAH2_*`` environment
variables, or the standard cloud-TPU auto-detection baked into
`jax.distributed.initialize` (on a real TPU pod slice, calling it with no
arguments works).
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize `jax.distributed` when multi-process operation is
    configured; return True iff initialized.

    Sources, in priority order: explicit arguments; environment variables
    ``BLAH2_COORDINATOR`` (host:port), ``BLAH2_NUM_PROCESSES``,
    ``BLAH2_PROCESS_ID``. When none are present this is a no-op (single
    process) — except under cloud-TPU auto-detectable environments where
    the caller may pass ``coordinator="auto"`` to delegate entirely to
    JAX's own detection.
    """
    import jax

    if coordinator == "auto":
        jax.distributed.initialize()
        return True
    coordinator = coordinator or os.environ.get("BLAH2_COORDINATOR")
    if num_processes is None:
        env = os.environ.get("BLAH2_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("BLAH2_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator is None:
        return False
    if num_processes is None or process_id is None:
        raise ValueError(
            "multi-process init needs num_processes and process_id "
            "(flags or BLAH2_NUM_PROCESSES / BLAH2_PROCESS_ID) alongside "
            f"coordinator {coordinator!r}")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1
