"""Device mesh and sharding helpers.

The reference is single-device (train_thermal_dustr.py:60: `"cuda" if
available`). Here parallelism is first-class: a 1-D data mesh by default, with
named axes so tensor axes can be added later without touching call sites.
Collectives (grad all-reduce) are inserted by XLA from the shardings and ride
ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over all (or given) devices.

    A single -1 in mesh_shape absorbs the remaining device count, mirroring
    numpy reshape semantics.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch axis over the 'data' mesh axis, replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Tensor parallelism (Megatron-style): shard each transformer block's first
# GEMM column-wise and second GEMM row-wise over the 'model' mesh axis, so a
# block needs ONE all-reduce per sublayer (inserted by XLA from the param
# shardings — the scaling-book recipe, not hand-written collectives).
# ---------------------------------------------------------------------------

# Caveat (packed self-attn qkv): its kernel packs the output axis as
# [3, heads, head_dim] flattened to 3C (checkpoint layout parity), so a
# contiguous column shard crosses the q/k/v (and head) boundaries for most
# 'model' sizes — e.g. model=2 puts all of q plus half of k on device 0.
# GSPMD keeps this CORRECT, but the later [B,S,3,H,hd] reshape can force
# resharding collectives beyond the one all-reduce per sublayer that true
# head-group-aligned (Megatron) sharding would need. Treat the qkv entry as
# a memory/layout hint, not a comm-optimal spec; the separate projq/k/v
# projections (cross-attn) ARE head-aligned whenever model divides num_heads.
_COL_SHARDED = ("qkv", "projq", "projk", "projv", "fc1")  # out-dim sharded
_ROW_SHARDED = ("fc2",)  # in-dim sharded; attn out-proj handled by context


def param_partition_spec(path_names: Sequence[str], ndim: int, mesh: Mesh) -> P:
    """PartitionSpec for one parameter leaf, given its pytree path names.

    Rules (only when the mesh has a 'model' axis):
      * attn/cross-attn input projections + mlp.fc1 kernels: split the OUTPUT
        features over 'model' (their biases follow);
      * attn/cross-attn output proj + mlp.fc2 kernels: split the INPUT
        features over 'model' (bias replicated — it adds after the reduce);
      * patch embed, norms, heads, scalars: replicated.
    """
    if "model" not in mesh.axis_names:
        return P()
    names = list(path_names)
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if any("downstream_head" in n or "patch_embed" in n for n in names):
        return P()
    if parent in _COL_SHARDED:
        if leaf == "kernel" and ndim == 2:
            return P(None, "model")
        if leaf == "bias" and ndim == 1:
            return P("model")
        return P()
    if leaf == "kernel" and ndim == 2 and (
            parent in _ROW_SHARDED
            or (parent == "proj" and any(
                n in ("attn", "cross_attn") for n in names))):
        return P("model", None)
    return P()


def _path_names(path) -> list:
    out = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "name", None)
        if key is None:
            key = getattr(p, "idx", None)
        out.append(str(key))
    return out


# ZeRO-1 (optimizer-state sharding over the 'data' axis): AdamW's f32
# mu/nu buffers are 2× the params (~2.4 GB at ViT-L) and, unlike params,
# are never read by the forward/backward — only by the elementwise update.
# Sharding them over 'data' cuts per-chip optimizer HBM by n_data with the
# standard GSPMD recipe (annotate the state leaves; XLA turns the grad
# all-reduce + sharded update + replicated-param write into
# reduce-scatter → update shard → all-gather). The reference is
# single-GPU PyTorch with no equivalent (train_thermal_dustr.py:91).
_OPT_SLOT_NAMES = frozenset({"mu", "nu", "acc_grads"})


def _zero1_extend(spec: P, shape, n_data: int) -> P:
    """Add 'data' to a leaf spec on the largest free, divisible axis."""
    dims = list(spec) + [None] * (len(shape) - len(spec))
    best, best_dim = None, 0
    for i, (s, d) in enumerate(zip(dims, shape)):
        if s is None and d % n_data == 0 and d > best_dim:
            best, best_dim = i, int(d)
    if best is None:  # no divisible axis — replicate (correct, just no win)
        return spec
    dims[best] = "data"
    return P(*dims)


def state_sharding(mesh: Mesh, state, zero1: bool = False) -> "jax.tree_util.PyTreeDef":
    """NamedSharding pytree for a TrainState (params + mirrored optimizer
    moments pick up the tensor-parallel specs; scalars replicate).

    zero1: additionally shard optimizer slots (mu/nu/acc_grads) over the
    'data' mesh axis — composes with tensor parallelism (a TP-sharded
    moment gets 'data' on a remaining free axis)."""
    n_data = int(mesh.shape.get("data", 1))

    def spec_for(path, leaf):
        import numpy as _np

        ndim = getattr(leaf, "ndim", _np.ndim(leaf))
        names = _path_names(path)
        spec = param_partition_spec(names, ndim, mesh)
        if (zero1 and n_data > 1 and ndim >= 1
                and _OPT_SLOT_NAMES.intersection(names)):
            spec = _zero1_extend(spec, _np.shape(leaf), n_data)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_state(mesh: Mesh, state, zero1: bool = False):
    """Place a TrainState onto the mesh with tensor-parallel param shardings
    (and ZeRO-1 optimizer-slot shardings when zero1)."""
    shardings = state_sharding(mesh, state, zero1=zero1)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-sharded on axis 0."""
    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_put, batch)


def shard_batch_multihost(mesh: Mesh, batch):
    """Multi-host variant: each process supplies its LOCAL shard of the global
    batch; jax assembles the logically-global arrays across hosts over DCN
    (SURVEY.md §2.3 — jax.make_array_from_process_local_data). On a single
    host this is equivalent to shard_batch."""
    def _put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, x.ndim), x)

    return jax.tree_util.tree_map(_put, batch)


def local_batch_size(mesh: Mesh, global_batch_size: int) -> int:
    n = mesh.shape.get("data", 1)
    if global_batch_size % n:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by data-parallel size {n}"
        )
    return global_batch_size // n
