"""Worker + shared step body for the 2-process multi-host DP test.

Run as a script it joins a jax.distributed job (CPU backend) and executes one
sharded train step over the GLOBAL mesh, printing the loss; imported by
tests/test_multihost.py it provides the same step body for the 1-process
reference value, so the comparison exercises identical code.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np

GLOBAL_BATCH = 8
TINY_KW = dict(img_size=(32, 32), enc_embed_dim=64, enc_depth=2,
               enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2)


def make_global_batch():
    rng = np.random.default_rng(0)
    b = GLOBAL_BATCH
    return {
        "thermal1": rng.uniform(21000, 26000, (b, 32, 32, 3)).astype(np.float32),
        "thermal2": rng.uniform(21000, 26000, (b, 32, 32, 3)).astype(np.float32),
        "pointmap1": rng.uniform(0.1, 5, (b, 16, 16, 3)).astype(np.float32),
        "pointmap2": rng.uniform(0.1, 5, (b, 16, 16, 3)).astype(np.float32),
        "confidence1": np.ones((b, 16, 16), np.float32),
        "confidence2": np.ones((b, 16, 16), np.float32),
    }


def run_one_step(zero1: bool = False) -> float:
    """One sharded train step on the tiny model over ALL global devices.

    Works identically in 1-process and N-process runs: each process feeds its
    local slice of the same deterministic global batch. zero1=True
    additionally shards the AdamW moments over the GLOBAL 'data' axis
    (spanning both processes in the 2-process test) — each process assembles
    the global moment arrays from the identical host-computed init by global
    index, the same path train/loop.py uses for multi-host --zero1."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from thermal3d.core.cache import enable_compilation_cache
    from thermal3d.core.config import DustrModelConfig, TrainConfig
    from thermal3d.core.mesh import make_mesh, shard_batch_multihost, state_sharding
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.train.state import create_train_state
    from thermal3d.train.step import make_train_step

    enable_compilation_cache()
    n = len(jax.devices())
    mesh = make_mesh((n,), ("data",))
    model = AsymmetricCroCo3DStereo(DustrModelConfig(**TINY_KW))
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    cfg = TrainConfig(batch_size=GLOBAL_BATCH)
    state = create_train_state(model, params, cfg, steps_per_epoch=10)
    state_shardings = None
    if zero1:
        state_shardings = state_sharding(mesh, state, zero1=True)

        def _globalize(x, sh):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh,
                                                lambda idx: x[idx])

        state = jax.tree_util.tree_map(_globalize, state, state_shardings)
    else:
        # host-local state → global replicated arrays (required for jit
        # inputs in multi-process runs; harmless in single-process)
        repl = NamedSharding(mesh, P())
        state = jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                repl, np.asarray(x)),
            state)

    pid, pcount = jax.process_index(), jax.process_count()
    gb = make_global_batch()
    local_bs = GLOBAL_BATCH // pcount
    local = {k: v[pid * local_bs:(pid + 1) * local_bs] for k, v in gb.items()}
    batch = shard_batch_multihost(mesh, local)

    step = make_train_step(model, cfg, mesh,
                           state_shardings=state_shardings)
    if jax.process_count() > 1:
        # Compile is host-local and can take minutes on a loaded 1-core CI
        # host; Gloo's first-collective rendezvous times out at a hardcoded
        # 30 s. AOT-compile first, then line both processes up at a
        # coordination-service barrier (long timeout) so the Gloo context
        # init only ever sees millisecond execution skew.
        compiled = step.lower(state, batch).compile()
        try:
            # private API (no public coordination-service barrier exists);
            # guarded so a jax upgrade degrades to the collective fallback
            # instead of breaking the test silently
            from jax._src.distributed import global_state

            global_state.client.wait_at_barrier(
                "t3d_multihost_compiled", timeout_in_ms=600_000)
        except (ImportError, AttributeError):
            # public fallback: a tiny device collective as the barrier. This
            # reintroduces the Gloo 30 s window for the (already compiled)
            # sync itself, but both processes reach it with only millisecond
            # skew since their own step compiles are done.
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("t3d_multihost_compiled")
        state, metrics = compiled(state, batch)
    else:
        state, metrics = step(state, batch)
    return float(metrics["loss"])


class _SyntheticPairDataset:
    """Deterministic in-memory dataset (identical on every process)."""

    def __init__(self, n=24):
        rng = np.random.default_rng(42)
        self.samples = []
        for _ in range(n):
            b = {k: v[0] for k, v in make_global_batch().items()}
            b = {k: (v * rng.uniform(0.9, 1.1)).astype(np.float32)
                 for k, v in b.items()}
            self.samples.append(b)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def run_loop(ckpt_dir: str, zero1: bool = True) -> dict:
    """The FULL training driver across processes: train_and_evaluate with
    mesh over all global devices, zero1 moments sharded across the process
    boundary, collective orbax checkpointing, all-gathered val loss — then
    a RESUMED continuation (epochs 2 → 3) through the same entry point.
    This is the loop-level integration the per-step test above can't see."""
    import jax

    from thermal3d.core.cache import enable_compilation_cache
    from thermal3d.core.config import DustrModelConfig, TrainConfig
    from thermal3d.core.mesh import make_mesh
    from thermal3d.models.dustr import AsymmetricCroCo3DStereo
    from thermal3d.train.loop import train_and_evaluate

    enable_compilation_cache()
    n = len(jax.devices())
    mesh = make_mesh((n,), ("data",))
    model = AsymmetricCroCo3DStereo(DustrModelConfig(**TINY_KW))
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    params2 = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    ds = _SyntheticPairDataset()

    cfg1 = TrainConfig(epochs=2, batch_size=GLOBAL_BATCH, lr=1e-4,
                       zero1=zero1, log_interval=0)
    s1 = train_and_evaluate(model, params, ds, cfg1, checkpoint_dir=ckpt_dir,
                            mesh=mesh)
    cfg2 = TrainConfig(epochs=3, batch_size=GLOBAL_BATCH, lr=1e-4,
                       zero1=zero1, log_interval=0)
    s2 = train_and_evaluate(model, params2, ds, cfg2, checkpoint_dir=ckpt_dir,
                            mesh=mesh, resume=True)
    return {"run1": s1, "run2": s2}


def main():
    coordinator, pid, pcount = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # this harness force-registers a TPU plugin that overrides the
    # JAX_PLATFORMS env var — config-pin cpu before any backend init
    # (same as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from thermal3d.core.distributed import initialize_multihost

    got_pid, got_pcount = initialize_multihost(coordinator, pcount, pid)
    assert (got_pid, got_pcount) == (pid, pcount), (
        f"expected ({pid}, {pcount}), got ({got_pid}, {got_pcount})")
    if len(sys.argv) > 4 and sys.argv[4] == "--loop":
        out = run_loop(sys.argv[5])
        print(f"MULTIHOST_LOOP {out['run1']['best_val_loss']:.10f} "
              f"{out['run1']['epochs_run']} {out['run2']['best_val_loss']:.10f} "
              f"{out['run2']['epochs_run']} {out['run2']['final_step']}",
              flush=True)
        return
    zero1 = len(sys.argv) > 4 and sys.argv[4] == "--zero1"
    loss = run_one_step(zero1=zero1)
    print(f"MULTIHOST_LOSS {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
