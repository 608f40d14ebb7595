"""AOT serving artifacts via jax.export — the deployment story.

The reference deploys by shipping the full Python source tree plus a .pth
and re-running `thermal_dustr_inference.py` (README.md run instructions);
model code, preprocessing code, and weights must all be importable and
version-matched on the serving host. Here the WHOLE serving program —
normalize → resize → percentile-enhance → thermal head → model → depth
extraction, exactly the `InferenceEngine.infer` pipeline — is exported as
serialized StableHLO (`jax.export`, versioned with jax's cross-release
compatibility guarantees) together with the weights in ONE `.npz` file:

* **model-code-free serving**: `ServingArtifact.load(path).infer(raw)` needs
  jax + numpy only — no thermal3d model definitions, no flax, no checkpoint
  converter on the serving host (`load` imports nothing from thermal3d).
* **cross-platform lowering**: export with `platforms=("cpu", "tpu")` and
  the same artifact runs on both — a CPU dev box can produce the TPU
  fleet's artifact and vice versa. A multi-platform export automatically
  uses the PORTABLE program variant: attention pinned to the XLA path
  (identical to what 'auto' resolves to at the flagship S=196) and the
  exact sort-percentile enhance instead of the TPU Pallas histogram kernel
  (Pallas lowers only for its own backend). A single-platform export
  (`platforms=None` → the current backend) keeps the engine's exact native
  program, Pallas kernels included — use that for the last ~3% of TPU
  serving throughput and for the S >= 512 models where the fused Pallas
  attention is the measured win (docs/PERF.md).
* **fixed shapes by design**: one program per batch size (the M=7056 tiling
  optimum is per-shape anyway — docs/PERF.md); `infer` pads a short batch to
  the smallest exported size and slices the outputs.

int8 engines export transparently: the quant collection (int8 kernels +
scales, incl. static activation scales) rides in the same weight list.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_FORMAT = "thermal3d-serving-v1"
# Output keys in the order the exported program returns them (a dict pytree
# is serialized with its structure, but we record them for artifact readers).
_OUTPUTS = ("confidence1", "confidence2", "depth", "pointmap1", "pointmap2")


def _weights_pytree(engine):
    """Flatten (params, quant, thermal_head_params) into leaves + treedef.
    None subtrees (no quant / no thermal head) are captured by the treedef."""
    import jax

    tree = (engine.params, engine.quant,
            engine.thermal_head_params if engine.use_thermal_head else None)
    return jax.tree_util.tree_flatten(tree)


def _make_serving_fn(engine, treedef, stereo: bool, portable: bool):
    """The full serving program as one jittable function over the FLAT weight
    list — mirrors InferenceEngine.infer (engine.py:188-205): jit preprocess
    then jit forward, fused here into a single dispatch.

    portable=True (multi-platform export) swaps the two backend-specific
    kernels for their portable exact equivalents: the sort-percentile
    enhance (the Pallas histogram kernel is the approximation) and the XLA
    attention path ('auto' resolves there anyway at S=196; at S >= 512 this
    forgoes the fused Pallas win — export single-platform for that)."""
    import dataclasses

    import jax

    from thermal3d.preprocess.enhance import enhance_thermal_contrast
    from thermal3d.preprocess.resize import resize_bilinear_hw

    model, config = engine.model, engine.config
    if portable and (config.attention_impl == "auto"
                     or config.attention_impl.startswith("pallas")):
        from thermal3d.models.dustr import AsymmetricCroCo3DStereo

        config = dataclasses.replace(config, attention_impl="xla")
        model = AsymmetricCroCo3DStereo(config)
    enhance_impl = "sort" if portable else "auto"
    head, use_head = engine._thermal_head, engine.use_thermal_head

    def prep(raw, head_params):
        x = enhance_thermal_contrast(
            resize_bilinear_hw(raw, config.img_size), impl=enhance_impl)
        if use_head:
            x = head.apply({"params": head_params}, x)
        return x

    if stereo:
        def fn(weights, raw1, raw2):
            params, quant, head_params = jax.tree_util.tree_unflatten(
                treedef, weights)
            variables = {"params": params}
            if quant is not None:
                variables["quant"] = quant
            pred1, pred2 = model.apply(
                variables, prep(raw1, head_params), prep(raw2, head_params))
            return _outputs(pred1, pred2)
    else:
        def fn(weights, raw1):
            params, quant, head_params = jax.tree_util.tree_unflatten(
                treedef, weights)
            variables = {"params": params}
            if quant is not None:
                variables["quant"] = quant
            pred1, pred2 = model.apply(variables, prep(raw1, head_params),
                                       None)
            return _outputs(pred1, pred2)

    return fn


def _outputs(pred1, pred2):
    # same surface as InferenceEngine._forward_impl (engine.py:159-165)
    return {
        "pointmap1": pred1["pts3d"],
        "pointmap2": pred2["pts3d_in_other_view"],
        "confidence1": pred1["conf"],
        "confidence2": pred2["conf"],
        "depth": pred1["pts3d"][..., 2],
    }


def save_serving_artifact(
    path: str,
    engine,
    batch_sizes: Sequence[int] = (36,),
    input_hw: Optional[Tuple[int, int]] = None,
    platforms: Optional[Sequence[str]] = ("cpu", "tpu"),
    stereo: bool = False,
) -> Dict:
    """Export `engine`'s serving pipeline for each batch size and write the
    self-contained artifact npz. Returns the metadata dict.

    input_hw: raw grayscale frame shape fed to the program (pre-decode
    resolution; resized to the model's img_size inside). Defaults to the
    model's native img_size.

    platforms: lowering targets. None → the current backend only, keeping
    the engine's exact native program (Pallas kernels included). Any other
    set exports the portable program variant (see _make_serving_fn).
    """
    import jax
    from jax import export as jax_export

    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] <= 0:
        raise ValueError(f"batch_sizes must be positive: {batch_sizes}")
    if input_hw is None:
        input_hw = engine.config.img_size
    h, w = int(input_hw[0]), int(input_hw[1])

    if platforms is None:
        platforms = (jax.default_backend(),)
    portable = set(platforms) != {jax.default_backend()}
    leaves, treedef = _weights_pytree(engine)
    fn = jax.jit(_make_serving_fn(engine, treedef, stereo, portable))
    w_specs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves]

    blobs: Dict[str, np.ndarray] = {}
    for b in batch_sizes:
        raw = jax.ShapeDtypeStruct((b, h, w), np.float32)
        args = (w_specs, raw, raw) if stereo else (w_specs, raw)
        exp = jax_export.export(fn, platforms=tuple(platforms))(*args)
        blobs[f"mlir_{b}"] = np.frombuffer(exp.serialize(), dtype=np.uint8)

    weights_meta = []
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        blobs[f"w_{i:05d}"] = np.frombuffer(arr.tobytes(), dtype=np.uint8)
        weights_meta.append({"shape": list(arr.shape),
                             "dtype": str(arr.dtype)})

    meta = {
        "format": _FORMAT,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batch_sizes": batch_sizes,
        "input_hw": [h, w],
        "img_size": list(engine.config.img_size),
        "stereo": bool(stereo),
        "portable_program": bool(portable),
        "outputs": list(_OUTPUTS),
        "num_weights": len(leaves),
        "weights": weights_meta,
        "int8": engine.quant is not None,
        "model": {
            "head_type": engine.config.head.head_type,
            "compute_dtype": engine.config.compute_dtype,
            "enc_depth": engine.config.enc_depth,
            "dec_depth": engine.config.dec_depth,
        },
    }
    blobs["meta"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **blobs)
    return meta


def _np_dtype(name: str):
    """Resolve a dtype name, including the ml_dtypes families numpy alone
    doesn't know (bfloat16, float8_*)."""
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


class ServingArtifact:
    """Loads and runs a serving artifact. Deployment-side class: `load` and
    `infer` import only jax/numpy (+ml_dtypes for bf16 weights) — no
    thermal3d model code, flax, or converter needed on the serving host."""

    def __init__(self, fns: Dict[int, "object"], weights: List,
                 meta: Dict):
        self._fns = fns  # batch size -> jitted Exported.call
        self._weights = weights
        self.meta = meta
        self.batch_sizes = sorted(fns)
        self.stereo = bool(meta["stereo"])
        self.input_hw = tuple(meta["input_hw"])

    @classmethod
    def load(cls, path: str) -> "ServingArtifact":
        import jax
        from jax import export as jax_export

        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode("utf-8"))
            if meta.get("format") != _FORMAT:
                raise ValueError(
                    f"{path}: not a {_FORMAT} artifact "
                    f"(format={meta.get('format')!r})")
            weights = []
            for i, wm in enumerate(meta["weights"]):
                buf = z[f"w_{i:05d}"].tobytes()
                arr = np.frombuffer(buf, dtype=_np_dtype(wm["dtype"])
                                    ).reshape(wm["shape"])
                weights.append(jax.numpy.asarray(arr))
            fns = {}
            for b in meta["batch_sizes"]:
                exp = jax_export.deserialize(bytearray(z[f"mlir_{b}"].tobytes()))
                fns[int(b)] = jax.jit(exp.call)
        return cls(fns, weights, meta)

    def _pick_batch(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        raise ValueError(
            f"batch of {n} exceeds the largest exported batch size "
            f"{self.batch_sizes[-1]} — split the batch or re-export")

    def infer(self, raw1: np.ndarray, raw2: Optional[np.ndarray] = None
              ) -> Dict[str, np.ndarray]:
        """raw*: [n, h, w] raw grayscale frames (any scale — the percentile
        enhance is scale-invariant) at the exported input_hw. Pads n up to
        the smallest exported batch size and slices the outputs back."""
        if self.stereo != (raw2 is not None):
            raise ValueError("artifact was exported "
                             + ("with" if self.stereo else "without")
                             + " a second view")
        raw1 = np.asarray(raw1, np.float32)
        if raw1.ndim != 3 or raw1.shape[1:] != self.input_hw:
            raise ValueError(
                f"expected [n, {self.input_hw[0]}, {self.input_hw[1]}] raw "
                f"frames, got {raw1.shape}")
        n = raw1.shape[0]
        if n == 0:
            raise ValueError("empty batch: need at least one frame")
        b = self._pick_batch(n)
        views = [raw1] if raw2 is None else [raw1,
                                             np.asarray(raw2, np.float32)]
        padded = []
        for v in views:
            if v.shape[0] != n:
                raise ValueError("view batch sizes differ")
            if n < b:
                v = np.concatenate([v, np.repeat(v[-1:], b - n, axis=0)])
            padded.append(v)
        out = self._fns[b](self._weights, *padded)
        return {k: np.asarray(v)[:n] for k, v in out.items()}
