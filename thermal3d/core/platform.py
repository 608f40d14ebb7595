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
    but broken — see tests/conftest.py). Plugin platforms that expose TPU
    hardware under another name (e.g. a tunneled-TPU plugin registering as
    'axon') are classified by device kind so the TPU kernel dispatch still
    fires."""
    dev = jax.config.jax_default_device
    plat = dev.platform if dev is not None else jax.default_backend()
    if plat not in ("cpu", "gpu", "tpu"):
        try:
            kind = (dev or jax.devices()[0]).device_kind.lower()
        except Exception:
            return plat
        if "tpu" in kind:
            return "tpu"
    return plat
