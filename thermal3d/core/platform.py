"""Trace-time platform discovery for impl auto-dispatch.

Kernels with both an XLA and a Pallas implementation (attention, percentile
enhancement) pick per-platform at trace time; this helper is the single
source of truth for "where will this op actually run".
"""

from __future__ import annotations

import jax


def default_compute_platform() -> str:
    """Platform that ops will actually run on: respects jax_default_device
    (used by tests to pin CPU on hosts where a TPU plugin is force-registered
    but broken — see tests/conftest.py)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()
