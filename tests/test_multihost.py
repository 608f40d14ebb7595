"""Multi-host data parallelism (SURVEY.md §2.3 plan row; VERDICT r2 item 5).

Launches TWO real OS processes joined via jax.distributed.initialize on the
CPU backend (2 local devices each → a 4-device global mesh spanning both),
runs one sharded train step on the tiny model with each process feeding its
local slice of the same deterministic global batch, and asserts the loss
matches a 1-process run of the identical step body bit-for-bit-close.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import tests._multihost_worker as worker

REPO = worker.REPO


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(coordinator: str, pid: int, pcount: int,
            extra_args: tuple = ()) -> subprocess.Popen:
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "_multihost_worker.py"),
         coordinator, str(pid), str(pcount), *extra_args],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _parse_loss(out: str) -> float:
    for line in out.splitlines():
        if line.startswith("MULTIHOST_LOSS"):
            return float(line.split()[1])
    raise AssertionError(f"no MULTIHOST_LOSS line in output:\n{out}")


@pytest.mark.heavy
def test_two_process_dp_matches_single_process():
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [_launch(coordinator, pid, 2) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)
    losses = [_parse_loss(o) for o in outs]
    assert losses[0] == losses[1]  # replicated output, identical on both ranks

    # 1-process reference: same step body, same global batch, in THIS process
    # (conftest: 8 virtual CPU devices → 8-way DP over the same global batch;
    # the loss is a batch mean, invariant to the data-axis layout up to f32
    # reduction order)
    ref = worker.run_one_step()
    np.testing.assert_allclose(losses[0], ref, rtol=2e-5)


def test_initialize_multihost_env_fallback(monkeypatch):
    """THERMAL3D_* env vars feed jax.distributed.initialize when flags are
    omitted (the per-host job-spec launch pattern)."""
    import jax

    import thermal3d.core.distributed as dist

    calls = {}
    monkeypatch.setenv("THERMAL3D_COORDINATOR", "10.0.0.1:8476")
    monkeypatch.setenv("THERMAL3D_NUM_PROCESSES", "4")
    monkeypatch.setenv("THERMAL3D_PROCESS_ID", "2")
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.update(kw))
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    pid, pcount = dist.initialize_multihost()
    assert calls == {"coordinator_address": "10.0.0.1:8476",
                     "num_processes": 4, "process_id": 2}
    assert (pid, pcount) == (2, 4)


def test_batchloader_rejects_bad_process_args():
    import pytest as _pytest

    from thermal3d.data.pipeline import BatchLoader

    class DS:
        def __len__(self):
            return 8

    with _pytest.raises(ValueError, match="divisible"):
        BatchLoader(DS(), batch_size=3, process_id=0, process_count=2)
    with _pytest.raises(ValueError, match="out of range"):
        BatchLoader(DS(), batch_size=4, process_id=2, process_count=2)


def test_batchloader_process_slicing_reassembles_global_stream():
    """Union of per-process loader outputs == the single-process batch stream."""

    class ToyDataset:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.full((2,), float(i), np.float32)}

    from thermal3d.data.pipeline import BatchLoader

    ds = ToyDataset()
    full = list(BatchLoader(ds, batch_size=8, shuffle=True, seed=3))
    p0 = list(BatchLoader(ds, batch_size=8, shuffle=True, seed=3,
                          process_id=0, process_count=2))
    p1 = list(BatchLoader(ds, batch_size=8, shuffle=True, seed=3,
                          process_id=1, process_count=2))
    assert len(full) == len(p0) == len(p1) == 4
    for fb, a, b in zip(full, p0, p1):
        np.testing.assert_array_equal(fb["x"],
                                      np.concatenate([a["x"], b["x"]]))


def test_batchloader_pads_partial_final_batch_across_processes():
    """drop_last=False + multihost: the final partial global batch must still
    yield a FULL-shape batch on every process (even a rank owning zero rows),
    so collective eval steps stay in lockstep; local_real_count exposes how
    many leading rows are real."""

    class ToyDataset:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2,), float(i), np.float32)}

    from thermal3d.data.pipeline import BatchLoader

    ds = ToyDataset()
    loaders = [BatchLoader(ds, batch_size=8, shuffle=False, drop_last=False,
                           process_id=p, process_count=2) for p in range(2)]
    batches = [list(ld) for ld in loaders]
    # both ranks yield the same number of batches, all full local shape
    assert [len(b) for b in batches] == [2, 2]
    for rank in range(2):
        for b in batches[rank]:
            assert b["x"].shape == (4, 2)
    # final global batch holds rows 8,9: rank0 owns both (2 real + 2 pad),
    # rank1 owns none (4 pad rows, duplicated from a valid index)
    assert loaders[0].local_real_count(0) == 4
    assert loaders[1].local_real_count(0) == 4
    assert loaders[0].local_real_count(1) == 2
    assert loaders[1].local_real_count(1) == 0
    np.testing.assert_array_equal(batches[0][1]["x"][:2, 0], [8.0, 9.0])


@pytest.mark.heavy
def test_two_process_zero1_matches_single_process():
    """Multi-host ZeRO-1: the AdamW moments shard over the GLOBAL data axis
    (2 processes x 2 devices), each process assembling its addressable
    moment shards by global index (the train/loop.py multi-host --zero1
    path). The step loss must match the 1-process zero1 run — the
    cross-process reduce-scatter is the real thing here, not virtual."""
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [_launch(coordinator, pid, 2, ("--zero1",)) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)
    losses = [_parse_loss(o) for o in outs]
    assert losses[0] == losses[1]
    ref = worker.run_one_step(zero1=True)
    np.testing.assert_allclose(losses[0], ref, rtol=2e-5)


@pytest.mark.heavy
def test_two_process_full_loop_zero1_with_resume(tmp_path):
    """train_and_evaluate itself across 2 real processes: zero1 moments
    sharded over the process boundary, process-sliced BatchLoaders,
    all-gathered val loss, COLLECTIVE orbax checkpointing, and a resumed
    continuation (epochs 2 -> 3) — the full multi-host production driver,
    not just one step."""
    coordinator = f"127.0.0.1:{_free_port()}"
    ckpt_dir = str(tmp_path / "mh_ck")
    procs = [_launch(coordinator, pid, 2, ("--loop", ckpt_dir))
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-5000:]}"
        outs.append(out)
    rows = []
    for out in outs:
        line = [ln for ln in out.splitlines()
                if ln.startswith("MULTIHOST_LOOP")][0].split()
        rows.append((float(line[1]), int(line[2]), float(line[3]),
                     int(line[4]), int(line[5])))
    # both ranks observed identical global results
    assert rows[0] == rows[1]
    val1, epochs1, val2, epochs2, final_step = rows[0]
    assert np.isfinite(val1) and np.isfinite(val2)
    assert epochs1 == 2
    assert epochs2 == 3          # resumed: ran only epoch 3
    assert final_step > 0
