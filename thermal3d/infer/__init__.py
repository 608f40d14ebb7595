"""Inference: batched jit engine + AOT serving artifacts.

Re-exports are lazy so that `thermal3d.infer.export` (the model-code-free
serving loader, which needs jax+numpy only) can be imported on a host
without flax installed — an eager `from .engine import InferenceEngine`
here would pull the full model stack into every serving-host import.
"""

_EXPORTS = {
    "InferenceEngine": ("thermal3d.infer.engine", "InferenceEngine"),
    "ServingArtifact": ("thermal3d.infer.export", "ServingArtifact"),
    "save_serving_artifact": ("thermal3d.infer.export", "save_serving_artifact"),
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    try:
        module_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module 'thermal3d.infer' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(module_name), attr)
