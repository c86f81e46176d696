"""AOT model export for serving (jax.export / StableHLO).

Packages a trained pose estimator as a single self-contained artifact:
weights baked into a serialized StableHLO program with a fixed batch
shape. A serving process loads and calls it without the model code,
config system, or checkpoint machinery -- the deployment-side counterpart
of the reference's `torch.save`'d model files, done the XLA way.

    # training side
    export_predictor("/models/pose.rppe", cfg, ckpt_dir=...)

    # serving side
    serve = load_predictor("/models/pose.rppe")
    pos, quat = serve({"images": {...}, "proprio": ...})   # batch <= max_batch
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np
from jax import export as jexport

from rgb_proprioceptive_pose_estimator_tpu.config import Config

_MAGIC = "rppe-predictor-v1"


def _quantize_params(params):
    """Weight-only symmetric int8 per-output-channel quantization of all
    >=2-D 'kernel' leaves (dense + conv, output axis last); small leaves
    (biases, BN affine) stay float32. Returns a tree whose quantized
    leaves are dicts {"q": int8, "scale": float32}."""

    def visit(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k == "kernel" and hasattr(v, "ndim") and v.ndim >= 2):
                    w = np.asarray(v, np.float32)
                    axes = tuple(range(w.ndim - 1))
                    scale = np.max(np.abs(w), axis=axes) / 127.0
                    scale = np.maximum(scale, 1e-12).astype(np.float32)
                    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
                    out[k] = {"q": q, "scale": scale}
                else:
                    out[k] = visit(v)
            return out
        return node

    return visit(params)


def _dequantize_params(qparams):
    def visit(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"q", "scale"}:
                return node["q"].astype(jnp_float32()) * node["scale"]
            return {k: visit(v) for k, v in node.items()}
        return node

    return visit(qparams)


def jnp_float32():
    import jax.numpy as jnp

    return jnp.float32


def export_predictor(path: str, cfg: Config, state=None,
                     ckpt_dir: Optional[str] = None,
                     step=None,
                     max_batch: int = 8,
                     quantize: str = "none") -> str:
    """Export a checkpointed (or given) TrainState as a serving artifact.

    quantize="int8": weight-only per-channel int8 for kernels (~4x smaller
    artifact); dequantization compiles into the exported program. The
    quantization error is verified in tests/test_export.py."""
    from rgb_proprioceptive_pose_estimator_tpu.api import _restore
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model,
        example_batch,
    )

    if quantize not in ("none", "int8"):
        raise ValueError(f"quantize must be 'none' or 'int8', got {quantize!r}")
    if state is None:
        model, state, _ = _restore(cfg, ckpt_dir, step)
    else:
        model = None
    if model is None:
        model = build_model(cfg.model)

    # eval_variables: exports serve the EMA weights when train.ema_decay
    # was on (same weights evaluate()/Predictor apply)
    variables = jax.device_get(state.eval_variables())

    qparams = None
    if quantize == "int8":
        # quantized weights are passed as ARGUMENTS (stored as npz in the
        # artifact) -- baking them as closure constants lets the exporter
        # constant-fold the dequantize back into f32 weights
        qparams = _quantize_params(variables["params"])
        batch_stats = variables.get("batch_stats", {})

        def fwd(qp, batch):
            p = _dequantize_params(qp)
            return model.apply({"params": p, "batch_stats": batch_stats},
                               batch, train=False)
    else:
        def fwd(batch):
            return model.apply(variables, batch, train=False)

    batch = example_batch(cfg.model, batch_size=max_batch)
    batch.pop("target_pos", None)
    batch.pop("target_quat", None)
    if qparams is not None:
        exported = jexport.export(jax.jit(fwd))(qparams, batch)
    else:
        exported = jexport.export(jax.jit(fwd))(batch)

    meta = {
        "magic": _MAGIC,
        "max_batch": max_batch,
        "quantize": quantize,
        "config": cfg.to_dict(),
        "input_tree": {
            k: (sorted(v.keys()) if isinstance(v, dict) else None)
            for k, v in batch.items()
        },
        # exported input dtypes (same tree structure as the batch) so the
        # serving wrapper can cast lists / float64 robot-stack inputs
        "dtypes": jax.tree.map(lambda x: str(np.asarray(x).dtype), batch),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=2))
        z.writestr("model.stablehlo", exported.serialize())
        if qparams is not None:
            buf = io.BytesIO()
            np.savez(buf, **_tree_to_flat(qparams))
            z.writestr("qparams.npz", buf.getvalue())
    return path


def _tree_to_flat(tree, prefix="") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_tree_to_flat(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _flat_to_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_predictor(path: str) -> Callable[[Dict[str, Any]],
                                          Tuple[np.ndarray, np.ndarray]]:
    """Load an exported artifact; returns `fn(batch) -> (pos, quat)`.

    The batch may be any size up to the exported max_batch; inputs are
    padded to the fixed compiled shape and outputs trimmed."""
    with zipfile.ZipFile(path, "r") as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("magic") != _MAGIC:
            raise ValueError(f"{path} is not an rppe predictor artifact")
        exported = jexport.deserialize(z.read("model.stablehlo"))
        qparams = None
        if "qparams.npz" in z.namelist():
            npz = np.load(io.BytesIO(z.read("qparams.npz")))
            qparams = _flat_to_tree({k: npz[k] for k in npz.files})
    max_batch = int(meta["max_batch"])

    dtypes = meta.get("dtypes", {})

    def _cast(b, d):
        # recursive dict walk (not jax.tree.map: Python-list inputs must be
        # treated as arrays, not as pytrees of scalars); casts to the
        # exported dtype so lists / float64 robot-stack inputs just work
        if isinstance(b, dict):
            return {k: _cast(v, d.get(k) if isinstance(d, dict) else None)
                    for k, v in b.items()}
        return np.asarray(b, dtype=np.dtype(d) if isinstance(d, str) else None)

    def fn(batch: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray]:
        arrs = _cast(batch, dtypes)
        n = jax.tree.leaves(arrs)[0].shape[0]
        if n > max_batch:
            raise ValueError(f"batch {n} > exported max_batch {max_batch}")

        def pad(x):
            if x.shape[0] == max_batch:
                return x
            reps = np.repeat(x[-1:], max_batch - x.shape[0], axis=0)
            return np.concatenate([x, reps], axis=0)

        padded = jax.tree.map(pad, arrs)
        if qparams is not None:
            pos, quat = exported.call(qparams, padded)
        else:
            pos, quat = exported.call(padded)
        return (np.asarray(pos)[:n], np.asarray(quat)[:n])

    fn.meta = meta  # type: ignore[attr-defined]
    return fn
