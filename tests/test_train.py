"""Training: LR schedule parity vs torch, sharded train step, full loop."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thermal3d.core.config import LossConfig, TrainConfig
from thermal3d.core.mesh import data_sharding, make_mesh, shard_batch
from thermal3d.models.dustr import AsymmetricCroCo3DStereo
from thermal3d.train.state import create_train_state, make_lr_schedule
from thermal3d.train.step import make_eval_step, make_train_step


def torch_lr_oracle(epochs, base_lr, warmup_frac=0.1, start_factor=0.1, eta_min=1e-7):
    """Per-epoch LRs from the actual torch scheduler chain (train:99-118)."""
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    warmup_epochs = int(epochs * warmup_frac)
    warm = torch.optim.lr_scheduler.LinearLR(
        opt, start_factor=start_factor, end_factor=1.0, total_iters=warmup_epochs)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=epochs - warmup_epochs, eta_min=eta_min)
    sched = torch.optim.lr_scheduler.SequentialLR(
        opt, schedulers=[warm, cos], milestones=[warmup_epochs])
    lrs = []
    for _ in range(epochs):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(lrs)


@pytest.mark.parametrize("epochs", [10, 50])
def test_lr_schedule_matches_torch(epochs):
    cfg = TrainConfig(epochs=epochs, lr=5e-4)
    steps_per_epoch = 7
    sched = make_lr_schedule(cfg, steps_per_epoch)
    ours = np.array([float(sched(e * steps_per_epoch)) for e in range(epochs)])
    oracle = torch_lr_oracle(epochs, 5e-4)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def _tiny_batch(rng, b=8, hw=32, ghw=16):
    return {
        "thermal1": rng.uniform(21000, 26000, (b, hw, hw, 3)).astype(np.float32),
        "thermal2": rng.uniform(21000, 26000, (b, hw, hw, 3)).astype(np.float32),
        "pointmap1": rng.uniform(0.1, 5, (b, ghw, ghw, 3)).astype(np.float32),
        "pointmap2": rng.uniform(0.1, 5, (b, ghw, ghw, 3)).astype(np.float32),
        "confidence1": np.ones((b, ghw, ghw), np.float32),
        "confidence2": np.ones((b, ghw, ghw), np.float32),
    }


def test_sharded_train_step_runs_and_improves(tiny_config, rng, cpu_devices):
    """Full DP train step on the 8-device CPU mesh: loss decreases, params
    stay replicated, GT is device-resized 16→32."""
    mesh = make_mesh((-1,), ("data",), devices=cpu_devices)
    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    cfg = TrainConfig(lr=1e-3, epochs=2, use_enhanced_loss=True,
                      loss=LossConfig(multi_scale=True))
    state = create_train_state(model, params, cfg, steps_per_epoch=10)
    step = make_train_step(model, cfg, mesh)

    batch = shard_batch(mesh, _tiny_batch(rng))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # optimizing the same batch must improve
    assert float(metrics["grad_norm"]) > 0
    # components logged
    assert {"basic_loss", "edge_loss", "smoothness_loss", "detail_loss"} <= set(metrics)


def test_eval_step_plain_l1(tiny_config, rng, cpu_devices):
    mesh = make_mesh((-1,), ("data",), devices=cpu_devices)
    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    cfg = TrainConfig()
    ev = make_eval_step(model, cfg, mesh)
    per_sample = np.asarray(ev(params, shard_batch(mesh, _tiny_batch(rng))))
    assert per_sample.shape == (8,)
    assert np.all(np.isfinite(per_sample)) and np.all(per_sample > 0)


def test_basic_loss_mode(tiny_config, rng, cpu_devices):
    mesh = make_mesh((-1,), ("data",), devices=cpu_devices)
    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    cfg = TrainConfig(use_enhanced_loss=False)
    state = create_train_state(model, params, cfg, steps_per_epoch=10)
    step = make_train_step(model, cfg, mesh)
    state, metrics = step(state, shard_batch(mesh, _tiny_batch(rng)))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.heavy
def test_flatten_optimizer_matches_per_leaf(tiny_config, rng, cpu_devices):
    """flatten_optimizer=True (one flat-vector AdamW) must track the
    per-leaf update: identical math up to f32 reduction order in the
    global-norm clip."""
    mesh = make_mesh((-1,), ("data",), devices=cpu_devices)
    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    batch = shard_batch(mesh, _tiny_batch(rng))
    losses = {}
    for flat in (False, True):
        cfg = TrainConfig(lr=1e-3, flatten_optimizer=flat)
        # fresh copies: the jitted step donates the state, which would
        # delete the shared init arrays between configs
        p = jax.tree_util.tree_map(jnp.array, params)
        state = create_train_state(model, p, cfg, steps_per_epoch=10)
        step = make_train_step(model, cfg, mesh)
        for _ in range(3):
            state, metrics = step(state, batch)
        losses[flat] = float(metrics["loss"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


@pytest.mark.heavy
def test_mu_bf16_optimizer_tracks_f32(tiny_config, rng, cpu_devices):
    """mu_dtype='bfloat16' (AdamW first moment stored bf16) must track the
    f32-moment run closely over a few steps, and actually store m in bf16."""
    mesh = make_mesh((-1,), ("data",), devices=cpu_devices)
    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    batch = shard_batch(mesh, _tiny_batch(rng))
    losses = {}
    for mu in (None, "bfloat16"):
        cfg = TrainConfig(lr=1e-3, mu_dtype=mu)
        p = jax.tree_util.tree_map(jnp.array, params)
        state = create_train_state(model, p, cfg, steps_per_epoch=10)
        if mu == "bfloat16":
            mus = jax.tree_util.tree_leaves(state.opt_state[1][0].mu)
            assert all(m.dtype == jnp.bfloat16 for m in mus)
        step = make_train_step(model, cfg, mesh)
        for _ in range(3):
            state, metrics = step(state, batch)
        losses[mu] = float(metrics["loss"])
    # bf16 m rounds each update's momentum; after 3 steps the losses must
    # agree to bf16-ish relative precision (drift compounds slowly)
    np.testing.assert_allclose(losses["bfloat16"], losses[None], rtol=2e-2)


def test_grad_accumulation(tiny_config, rng):
    """accumulation_steps>1 is real here (dead flag in the reference)."""
    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    cfg = TrainConfig(accumulation_steps=2)
    state = create_train_state(model, params, cfg, steps_per_epoch=10)
    step = make_train_step(model, cfg, mesh=None)
    batch = _tiny_batch(rng, b=2)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, _ = step(state, batch)  # accumulate only — no update yet
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state, _ = step(state, batch)  # second micro-step applies the update
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))


def test_train_loop_end_to_end(tiny_config, rng, tmp_path, cpu_devices):
    """Full train_and_evaluate on an in-memory dataset with checkpointing."""
    from thermal3d.train.loop import train_and_evaluate

    class SyntheticDataset:
        def __init__(self, n):
            self.samples = [
                {k: v[0] for k, v in _tiny_batch(rng, b=1).items()} for _ in range(n)
            ]

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    mesh = make_mesh((-1,), ("data",), devices=cpu_devices)
    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    cfg = TrainConfig(epochs=2, batch_size=8, max_batches=2, lr=1e-4)
    summary = train_and_evaluate(
        model, params, SyntheticDataset(24), cfg,
        checkpoint_dir=str(tmp_path / "ckpt"), mesh=mesh,
    )
    assert summary["epochs_run"] == 2
    assert np.isfinite(summary["best_val_loss"])
    import os
    assert os.path.isdir(tmp_path / "ckpt")


def test_remat_training(tiny_config, rng):
    """remat=True trains with identical loss values (FLOPs-for-memory only)."""
    import dataclasses

    from thermal3d.core.config import TrainConfig as TC

    cfg_r = dataclasses.replace(tiny_config, remat=True)
    model_r = AsymmetricCroCo3DStereo(cfg_r)
    model_n = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model_n.init(jax.random.key(0), img, img)["params"]
    tcfg = TC(lr=1e-3)
    batch = _tiny_batch(rng, b=2)
    # deep-copy: the train step donates its state, and both states would
    # otherwise alias the same param buffers
    params2 = jax.tree_util.tree_map(lambda x: jnp.array(x), params)
    s_r = create_train_state(model_r, params, tcfg, 10)
    s_n = create_train_state(model_n, params2, tcfg, 10)
    _, m_r = make_train_step(model_r, tcfg)(s_r, batch)
    _, m_n = make_train_step(model_n, tcfg)(s_n, batch)
    np.testing.assert_allclose(float(m_r["loss"]), float(m_n["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_r["grad_norm"]), float(m_n["grad_norm"]), rtol=1e-4)


@pytest.mark.heavy
def test_checkpoint_resume(tiny_config, rng, tmp_path, cpu_devices):
    """True mid-run resume: second invocation continues from the saved epoch
    with full optimizer state (the reference saves but never reloads it —
    SURVEY §5 checkpoint/resume)."""
    from thermal3d.train.loop import train_and_evaluate

    class DS:
        def __init__(self, n):
            self.samples = [
                {k: v[0] for k, v in _tiny_batch(rng, b=1).items()} for _ in range(n)
            ]

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    mesh = make_mesh((-1,), ("data",), devices=cpu_devices)
    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    ds = DS(24)
    ckpt_dir = str(tmp_path / "ck")

    # copy before the first run — the train step donates its state buffers
    params2 = jax.tree_util.tree_map(lambda x: jnp.array(x), params)

    cfg1 = TrainConfig(epochs=1, batch_size=8, max_batches=2, lr=1e-4)
    s1 = train_and_evaluate(model, params, ds, cfg1, checkpoint_dir=ckpt_dir, mesh=mesh)
    assert s1["epochs_run"] == 1

    cfg2 = TrainConfig(epochs=2, batch_size=8, max_batches=2, lr=1e-4)
    s2 = train_and_evaluate(model, params2, ds, cfg2, checkpoint_dir=ckpt_dir,
                            mesh=mesh, resume=True)
    # resumed from epoch 1 → ran only epoch 2
    assert s2["epochs_run"] == 2
    assert s2["final_step"] > s1["final_step"]


def test_zero1_resume(tiny_config, rng, tmp_path, cpu_devices):
    """--zero1 --resume regression (ADVICE r4): ckpt.restore returns committed
    SingleDeviceSharding arrays, and jit rejects committed inputs that
    mismatch the zero1 in_shardings — the loop must re-place the restored
    state onto the mesh before the first step."""
    from thermal3d.train.loop import train_and_evaluate

    class DS:
        def __init__(self, n):
            self.samples = [
                {k: v[0] for k, v in _tiny_batch(rng, b=1).items()} for _ in range(n)
            ]

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    mesh = make_mesh((-1,), ("data",), devices=cpu_devices)
    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    params2 = jax.tree_util.tree_map(lambda x: jnp.array(x), params)
    ds = DS(24)
    ckpt_dir = str(tmp_path / "ck_z")

    cfg1 = TrainConfig(epochs=1, batch_size=8, max_batches=2, lr=1e-4,
                       zero1=True)
    s1 = train_and_evaluate(model, params, ds, cfg1, checkpoint_dir=ckpt_dir,
                            mesh=mesh)
    assert s1["epochs_run"] == 1

    cfg2 = TrainConfig(epochs=2, batch_size=8, max_batches=2, lr=1e-4,
                       zero1=True)
    s2 = train_and_evaluate(model, params2, ds, cfg2, checkpoint_dir=ckpt_dir,
                            mesh=mesh, resume=True)
    assert s2["epochs_run"] == 2
    assert s2["final_step"] > s1["final_step"]


@pytest.mark.heavy
def test_resume_after_non_best_epoch(tiny_config, rng, tmp_path, cpu_devices):
    """Exact resume: a rolling LAST checkpoint is written every epoch, so
    resume continues from the true last epoch even when it didn't improve
    val (the reference replays up to `patience` epochs — VERDICT r1 weak 7)."""
    from thermal3d.train.loop import train_and_evaluate

    class DS:
        def __init__(self, n):
            self.samples = [
                {k: v[0] for k, v in _tiny_batch(rng, b=1).items()} for _ in range(n)
            ]

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    mesh = make_mesh((-1,), ("data",), devices=cpu_devices)
    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    params2 = jax.tree_util.tree_map(lambda x: jnp.array(x), params)
    ds = DS(24)
    ckpt_dir = str(tmp_path / "ck")

    # lr huge → epoch 2 val is worse than epoch 1 (epoch 1 is always "best"
    # from inf), so epoch 2 exists only as a LAST checkpoint
    cfg1 = TrainConfig(epochs=2, batch_size=8, max_batches=2, lr=5.0)
    s1 = train_and_evaluate(model, params, ds, cfg1, checkpoint_dir=ckpt_dir, mesh=mesh)
    assert s1["epochs_run"] == 2
    assert s1["final_step"] == 4  # 2 epochs × 2 steps

    from thermal3d.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 2   # last = epoch 2 (non-best)
    # diverged training: epoch 2 is never the best (may be None if even
    # epoch 1's val was non-finite) — either way epoch 2 exists only as LAST
    assert mgr.best_step() in (None, 1)
    mgr.close()

    cfg2 = TrainConfig(epochs=3, batch_size=8, max_batches=2, lr=5.0)
    s2 = train_and_evaluate(model, params2, ds, cfg2, checkpoint_dir=ckpt_dir,
                            mesh=mesh, resume=True)
    # exactly ONE more epoch ran (epoch 3): no replay of epoch 2
    assert s2["epochs_run"] == 3
    assert s2["final_step"] == 6


def test_tensor_parallel_train_step_matches_dp(tiny_config, rng, cpu_devices):
    """dp4 x tp2 mesh: Megatron-style param shardings (qkv/fc1 column, out
    proj/fc2 row over the 'model' axis) produce the same step as pure DP —
    XLA inserts the per-sublayer all-reduces from the specs alone."""
    from thermal3d.core.mesh import param_partition_spec, shard_state, state_sharding

    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    cfg = TrainConfig(lr=1e-3, epochs=2, use_enhanced_loss=True)
    batch_host = _tiny_batch(rng)

    # pure-DP reference (donate_argnums frees its state buffers, so the TP
    # state gets an independent copy of the params)
    params_tp = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), params)
    mesh_dp = make_mesh((-1,), ("data",), devices=cpu_devices)
    state = create_train_state(model, params, cfg, steps_per_epoch=10)
    step_dp = make_train_step(model, cfg, mesh_dp)
    _, m_dp = step_dp(state, shard_batch(mesh_dp, batch_host))

    # dp x tp
    mesh = make_mesh((-1, 2), ("data", "model"), devices=cpu_devices)
    state2 = create_train_state(model, params_tp, cfg, steps_per_epoch=10)
    shardings = state_sharding(mesh, state2)
    state2 = shard_state(mesh, state2)
    # qkv kernels are actually split over 'model'
    qkv = state2.params["enc_blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    assert len(qkv.addressable_shards) == 8
    assert qkv.addressable_shards[0].data.shape[1] == qkv.shape[1] // 2

    step_tp = make_train_step(model, cfg, mesh, state_shardings=shardings)
    new_state, m_tp = step_tp(state2, shard_batch(mesh, batch_host))
    assert np.isfinite(float(m_tp["loss"]))
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_tp["grad_norm"]),
                               float(m_dp["grad_norm"]), rtol=1e-3)
    # updated params keep their tensor-parallel placement
    qkv2 = new_state.params["enc_blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv2.sharding.spec == jax.sharding.PartitionSpec(None, "model")


def test_zero1_optimizer_sharding_matches_dp(tiny_config, rng, cpu_devices):
    """ZeRO-1 (mu/nu sharded over 'data') is numerically equivalent to the
    replicated optimizer UP TO FLOAT REDUCTION ORDER, and the moment buffers
    actually live 1/n-per-device with params replicated.

    Measured divergence mechanism (round-5 diagnosis, fresh compile cache):
      * step 1: losses agree to ~7e-8 rel; mu differs by <=1.3e-9 ABSOLUTE —
        pure f32 reduce-scatter-vs-all-reduce summation reordering (a genuine
        mis-sharding — wrong mean scaling, missing reduce — would show up
        here at O(|grad|) ~ 1e-1, seven orders larger);
      * Adam's g/(sqrt(nu)+eps) normalization amplifies those ~1e-9 grad
        deltas on small-|g| coordinates into ~4.5e-5 absolute param deltas
        after the first update (update magnitude is lr = 1e-3);
      * step-2 grads through the nonlinear network then differ at ~1e-3 rel,
        which mu inherits (measured max 3.3e-5 abs / 4.2e-3 rel) while the
        losses still agree at ~8e-8 rel.
    Hence: tight ABSOLUTE gate right after step 1 (catches real sharding
    bugs), loss-level parity every step, and a 2e-4 absolute envelope (4-6x
    measured headroom, still <20% of one lr-sized update) after two steps."""
    from jax.sharding import PartitionSpec as P

    from thermal3d.core.mesh import state_sharding

    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    cfg = TrainConfig(lr=1e-3, epochs=2, use_enhanced_loss=True)
    batches = [_tiny_batch(rng), _tiny_batch(rng)]

    params_z = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), params)
    mesh = make_mesh((-1,), ("data",), devices=cpu_devices)

    state = create_train_state(model, params, cfg, steps_per_epoch=10)
    step_dp = make_train_step(model, cfg, mesh)
    state_z = create_train_state(model, params_z, cfg, steps_per_epoch=10)
    shardings = state_sharding(mesh, state_z, zero1=True)
    step_z = make_train_step(model, cfg, mesh, state_shardings=shardings)

    def _mu(s):
        return s.opt_state[1][0].mu["enc_blocks_0"]["mlp"]["fc1"]["kernel"]

    for i, batch in enumerate(batches):
        placed = shard_batch(mesh, batch)
        state, m_dp = step_dp(state, placed)
        state_z, m_z = step_z(state_z, placed)
        np.testing.assert_allclose(float(m_z["loss"]), float(m_dp["loss"]),
                                   rtol=1e-5)
        if i == 0:
            # after ONE update the only divergence source is grad-reduction
            # order: mu must agree absolutely to well under 1e-7 (measured
            # 1.3e-9). A real mis-sharding fails this by ~7 orders.
            np.testing.assert_allclose(np.asarray(_mu(state_z)),
                                       np.asarray(_mu(state)),
                                       rtol=0, atol=1e-7)

    # the Adam moments are physically sharded: 8 distinct 1/8-size shards
    mu = _mu(state_z)
    assert "data" in tuple(mu.sharding.spec)
    shard = mu.addressable_shards[0]
    assert np.prod(shard.data.shape) == mu.size // 8
    # params remain replicated
    qkv = state_z.params["enc_blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P()
    # after two steps: reduction-order noise Adam-amplified through one
    # nonlinear fwd/bwd — measured 3.3e-5 (mu) / 4.5e-5 (params) absolute;
    # gate at 2e-4 (<20% of a single lr=1e-3-sized update)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(_mu(state)),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(qkv),
        np.asarray(state.params["enc_blocks_0"]["attn"]["qkv"]["kernel"]),
        rtol=0, atol=2e-4)


def test_zero1_composes_with_tensor_parallel(tiny_config, cpu_devices):
    """dp4 x tp2: a TP-sharded moment leaf picks up 'data' on its remaining
    free axis; non-divisible / scalar leaves replicate (correct fallback)."""
    from jax.sharding import PartitionSpec as P

    from thermal3d.core.mesh import state_sharding

    model = AsymmetricCroCo3DStereo(tiny_config)
    img = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.key(0), img, img)["params"]
    cfg = TrainConfig()
    mesh = make_mesh((-1, 2), ("data", "model"), devices=cpu_devices)
    state = create_train_state(model, params, cfg, steps_per_epoch=10)
    sh = state_sharding(mesh, state, zero1=True)

    adam = sh.opt_state[1][0]
    # fc1 kernel: TP on the output axis, ZeRO-1 'data' on the input axis
    assert adam.mu["enc_blocks_0"]["mlp"]["fc1"]["kernel"].spec == P("data", "model")
    # count scalar stays replicated; params keep pure TP specs (no 'data')
    assert adam.count.spec == P()
    assert sh.params["enc_blocks_0"]["attn"]["qkv"]["kernel"].spec == P(None, "model")


def test_param_partition_spec_rules(cpu_devices):
    from jax.sharding import PartitionSpec as P

    from thermal3d.core.mesh import make_mesh, param_partition_spec

    mesh = make_mesh((-1, 2), ("data", "model"), devices=cpu_devices)
    cases = [
        (["params", "enc_blocks_0", "attn", "qkv", "kernel"], 2, P(None, "model")),
        (["params", "enc_blocks_0", "attn", "qkv", "bias"], 1, P("model")),
        (["params", "enc_blocks_0", "attn", "proj", "kernel"], 2, P("model", None)),
        (["params", "enc_blocks_0", "attn", "proj", "bias"], 1, P()),
        (["params", "dec_blocks_1", "cross_attn", "projk", "kernel"], 2, P(None, "model")),
        (["params", "dec_blocks_1", "cross_attn", "proj", "kernel"], 2, P("model", None)),
        (["params", "enc_blocks_0", "mlp", "fc1", "kernel"], 2, P(None, "model")),
        (["params", "enc_blocks_0", "mlp", "fc2", "kernel"], 2, P("model", None)),
        (["params", "enc_blocks_0", "norm1", "scale"], 1, P()),
        (["params", "patch_embed", "proj", "kernel"], 4, P()),
        (["params", "downstream_head1", "proj", "kernel"], 2, P()),
        (["step"], 0, P()),
    ]
    for names, ndim, want in cases:
        assert param_partition_spec(names, ndim, mesh) == want, names

    mesh_dp = make_mesh((-1,), ("data",), devices=cpu_devices)
    assert param_partition_spec(
        ["params", "enc_blocks_0", "attn", "qkv", "kernel"], 2, mesh_dp) == P()


def test_checkpoint_legacy_flat_layout_resume(tmp_path):
    """A pre-best/last-layout dir (checkpoints directly under <dir>) still
    resumes instead of silently restarting from scratch."""
    import orbax.checkpoint as ocp

    from thermal3d.train.checkpoint import CheckpointManager

    ckpt_dir = str(tmp_path / "legacy")
    state = {"params": {"w": np.arange(4, dtype=np.float32)}, "step": 7}
    legacy = ocp.CheckpointManager(ckpt_dir)
    legacy.save(7, args=ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        meta=ocp.args.JsonSave({"val_loss": 0.5})))
    legacy.wait_until_finished()
    legacy.close()

    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 7
    restored, meta = mgr.restore(state)
    assert restored["step"] == 7
    assert meta["val_loss"] == 0.5
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"])
    mgr.close()


def test_checkpoint_restore_explicit_step_in_best_only(tmp_path):
    """restore(step=N) finds N in whichever sub-manager holds it — best/ and
    last/ hold disjoint step sets on plateaus (max_to_keep=1 for last)."""
    from thermal3d.train.checkpoint import CheckpointManager

    ckpt_dir = str(tmp_path / "ck")
    mgr = CheckpointManager(ckpt_dir)

    def st(step):
        return {"params": {"w": np.full(3, float(step), np.float32)},
                "step": step}

    mgr.save_best(1, st(1), val_loss=0.1)
    mgr.save_last(1, st(1), val_loss=0.1)
    mgr.save_last(2, st(2), val_loss=0.4)  # worse: only in last/
    mgr.save_last(3, st(3), val_loss=0.3)  # rolling last keeps only step 3

    restored, _ = mgr.restore(st(0), step=1)  # lives only in best/
    assert restored["step"] == 1
    restored, _ = mgr.restore(st(0), step=3)  # lives only in last/
    assert restored["step"] == 3
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        mgr.restore(st(0), step=2)  # evicted from last/, never best
    mgr.close()
