"""Driver entry points stay healthy: entry() compiles, dryrun runs on CPUs."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.heavy
def test_dryrun_multichip_on_cpu_mesh():
    """The FULL dryrun content (train step + zero1-vs-DP + sharded serving +
    pseudo-GT + catmlpdpt) — the driver runs exactly this every round, so the
    default suite covers only the re-exec contract below."""
    import __graft_entry__ as g

    g.dryrun_multichip(4)  # virtual CPU devices (conftest pins cpu platform)


def test_dryrun_multichip_survives_initialized_parent_backend():
    """Simulate the driver: the parent process initializes a default jax
    backend FIRST (here: a 1-device CPU — in the real driver, a TPU with a
    mismatched libtpu), then calls dryrun_multichip(8). In-process config
    re-pinning cannot work at that point; the call must take the subprocess
    path and still succeed. Guards against the rounds-1/2 red MULTICHIP
    artifacts (VERDICT.md round 2, item 1)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "_THERMAL3D_DRYRUN_CHILD")}
    env["JAX_PLATFORMS"] = "cpu"  # but only ONE device: fast path must bail
    # quick mode: this test proves the subprocess RE-EXEC contract (backend
    # pinning + rc/output propagation), not the dryrun content — the full
    # content runs in test_dryrun_multichip_on_cpu_mesh (RUN_HEAVY tier) and
    # in the driver itself every round
    env["_THERMAL3D_DRYRUN_QUICK"] = "1"
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "assert len(jax.devices()) == 1  # backend now initialized, too small\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(8) OK" in proc.stdout


@pytest.mark.heavy
def test_entry_shapes():
    import __graft_entry__ as g

    fn, args = g.entry()
    params, img1, img2 = args
    assert img1.shape == (1, 224, 224, 3)
    # don't run the full ViT-L on CPU — just check abstract evaluation
    out_shapes = jax.eval_shape(fn, params, img1, img2)
    pts3d, conf, pts3d_other = out_shapes
    assert pts3d.shape == (1, 224, 224, 3)
    assert conf.shape == (1, 224, 224)
    assert pts3d_other.shape == (1, 224, 224, 3)
