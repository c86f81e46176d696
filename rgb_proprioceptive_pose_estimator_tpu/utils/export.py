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


def export_predictor(path: str, cfg: Config, state=None,
                     ckpt_dir: Optional[str] = None,
                     step: Optional[int] = None,
                     max_batch: int = 8) -> str:
    """Export a checkpointed (or given) TrainState as a serving artifact."""
    from rgb_proprioceptive_pose_estimator_tpu.api import _restore
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model,
        example_batch,
    )

    if state is None:
        model, state, _ = _restore(cfg, ckpt_dir, step)
    else:
        model = None
    if model is None:
        model = build_model(cfg.model)

    variables = jax.device_get(state.variables())

    def fwd(batch):
        return model.apply(variables, batch, train=False)

    batch = example_batch(cfg.model, batch_size=max_batch)
    batch.pop("target_pos", None)
    batch.pop("target_quat", None)
    exported = jexport.export(jax.jit(fwd))(batch)

    meta = {
        "magic": _MAGIC,
        "max_batch": max_batch,
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
    return path


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

        pos, quat = exported.call(jax.tree.map(pad, arrs))
        return (np.asarray(pos)[:n], np.asarray(quat)[:n])

    fn.meta = meta  # type: ignore[attr-defined]
    return fn
