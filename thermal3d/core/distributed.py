"""Multi-host data parallelism entry point (SURVEY.md §2.3).

The reference is strictly single-process/single-GPU (train_thermal_dustr.py:60
picks `"cuda" if available`; no torch.distributed anywhere). Here multi-host
scale-out is first-class and TPU-native: `jax.distributed.initialize` wires N
host processes into ONE JAX runtime, after which `jax.devices()` is the
GLOBAL device list, the training mesh spans hosts, and the DP gradient
all-reduce rides ICI within a slice and DCN across slices — inserted by XLA
from the shardings exactly like the single-host path (no custom comm code;
`core/mesh.py::shard_batch_multihost` assembles the logically-global batch
from per-process local shards).

Determinism contract: every process computes the SAME global shuffle order
(same seed), and process p loads rows [p·B/P, (p+1)·B/P) of each global batch
(`BatchLoader(process_id=, process_count=)`), so the per-step global batch is
bit-identical to what a single process would assemble — verified by
tests/test_multihost.py, which runs a real 2-process train step on CPU and
compares the loss against the 1-process result.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join this process into a multi-host JAX runtime.

    Arguments fall back to the environment (the usual launcher pattern —
    one env block per host in the job spec):

      THERMAL3D_COORDINATOR    e.g. "10.0.0.1:8476"
      THERMAL3D_NUM_PROCESSES  total host processes in the job
      THERMAL3D_PROCESS_ID     this host's rank, 0-based

    On Cloud TPU VMs all three may be omitted entirely — jax.distributed
    autodetects the slice topology from the TPU metadata server.

    Must run BEFORE any other jax call in the process (backend init binds the
    runtime). Returns (process_index, process_count).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "THERMAL3D_COORDINATOR")
    if num_processes is None and "THERMAL3D_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["THERMAL3D_NUM_PROCESSES"])
    if process_id is None and "THERMAL3D_PROCESS_ID" in os.environ:
        process_id = int(os.environ["THERMAL3D_PROCESS_ID"])

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) — (0, 1) when not distributed."""
    import jax

    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    """True on the process that should own logging/checkpoint-side effects."""
    import jax

    return jax.process_index() == 0
