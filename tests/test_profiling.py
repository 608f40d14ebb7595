"""Profiling utilities (tracing, stage timers, nan guard)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from thermal3d.core.profiling import StageTimer, annotate, nan_guard, trace


def test_stage_timer():
    t = StageTimer()
    x = jnp.ones((64, 64))
    for _ in range(3):
        with t.stage("mm", x):
            x = x @ x
    s = t.summary()
    assert s["mm"]["count"] == 3
    assert s["mm"]["total_s"] >= 0
    assert "mm" in t.report()


def test_trace_writes_files(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        with annotate("matmul"):
            _ = (jnp.ones((32, 32)) @ jnp.ones((32, 32))).block_until_ready()
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found  # trace artifacts exist


def test_nan_guard_raises():
    with pytest.raises(FloatingPointError):
        with nan_guard():
            _ = jnp.asarray(0.0) / jnp.asarray(0.0)
