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


def test_compile_cache_keyed_by_machine_tag(tmp_path, monkeypatch):
    """The XLA compile cache dir must be keyed per host ISA: XLA:CPU AOT
    artifacts embed the compile host's CPU features and can SIGILL on a
    weaker machine (VERDICT r4 — a repo-local .jax_cache shared across
    heterogeneous hosts spewed cpu_aot_loader SIGILL warnings)."""
    import platform

    from thermal3d.core.cache import _machine_tag, enable_compilation_cache

    import jax

    tag = _machine_tag()
    assert tag == _machine_tag()  # deterministic
    assert tag.startswith(platform.machine() + "-")
    # restore whatever cache dir the session was using (conftest enabled it
    # at session start, possibly from a pinned THERMAL3D_COMPILE_CACHE) —
    # restoring the env var alone would leave jax pointed at this test's dir
    before = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("THERMAL3D_COMPILE_CACHE", str(tmp_path / "c"))
        path = enable_compilation_cache()
        assert os.path.basename(path) == tag
        assert os.path.isdir(path)
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
