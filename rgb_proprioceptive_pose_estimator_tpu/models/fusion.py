"""Late-fusion pose estimator: per-camera CNN encoders + proprio MLP,
concatenated into a shared pose-regression head (C5/C10/C11,
BASELINE.json:5,11).

Input batch dict convention (produced by `data/`):
    batch["images"][camera] : uint8 (B, H, W, C) or (B, T, H, W, C)
    batch["proprio"]        : float32 (B, D) or (B, T, D)
    batch["target_pos"]     : float32 (B, 3)      [training/eval only]
    batch["target_quat"]    : float32 (B, 4)      [training/eval only]
    batch["camera_mask"]    : float32 (B, n_cameras), optional; 0 = that
                              camera is dead (its features zero out --
                              see config.py model.camera_dropout)

A camera may also be STRUCTURALLY absent from batch["images"] (a key
simply missing): same zeroed-feature semantics as a zero mask column,
but static per compiled signature, so the dead camera's encoder is
skipped entirely -- the serving path for a failed sensor (api.Predictor,
api.evaluate(drop_cameras=)).

Output: (pos (B, 3) float32, quat (B, 4) float32 unit-normalized).

Temporal stacking (BASELINE.json:11): T frames stack along channels
((B,T,H,W,C) -> (B,H,W,T*C)) before the encoder; proprio flattens to T*D.
This keeps everything in-replica (SURVEY.md section 6.7 -- no sequence
parallelism needed).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rgb_proprioceptive_pose_estimator_tpu.config import ModelConfig
from rgb_proprioceptive_pose_estimator_tpu.models.cnn_small import CNNSmall
from rgb_proprioceptive_pose_estimator_tpu.models.proprio_mlp import ProprioMLP
from rgb_proprioceptive_pose_estimator_tpu.models.resnet import (
    ResNet18,
    ResNet34,
    ResNet50,
)
from rgb_proprioceptive_pose_estimator_tpu.ops.image_device import normalize_images
from rgb_proprioceptive_pose_estimator_tpu.ops.pose_math import (
    quat_normalize,
    rot6d_to_quat,
)


def compute_dtype(cfg: ModelConfig):
    """The single source of truth for cfg.dtype -> jnp dtype (values are
    validated in ModelConfig.__post_init__)."""
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _stack_temporal(img: jax.Array) -> jax.Array:
    """(B, T, H, W, C) -> (B, H, W, T*C)."""
    if img.ndim == 4:
        return img
    b, t, h, w, c = img.shape
    return jnp.transpose(img, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)


class PoseEstimator(nn.Module):
    cfg: ModelConfig

    def _encoder(self, name: str):
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        if cfg.backbone == "cnn_small":
            return CNNSmall(features=cfg.image_features, dtype=dtype,
                            use_pallas=cfg.use_pallas,
                            bn_stats=cfg.bn_stats, name=name)
        if cfg.backbone == "resnet18":
            return ResNet18(features=cfg.image_features, dtype=dtype,
                            use_pallas=cfg.use_pallas, bn_stats=cfg.bn_stats,
                            stem_s2d=cfg.stem_s2d, remat=cfg.remat, name=name)
        if cfg.backbone == "resnet34":
            return ResNet34(features=cfg.image_features, dtype=dtype,
                            use_pallas=cfg.use_pallas, bn_stats=cfg.bn_stats,
                            stem_s2d=cfg.stem_s2d, remat=cfg.remat, name=name)
        if cfg.backbone == "resnet50":
            return ResNet50(features=cfg.image_features, dtype=dtype,
                            use_pallas=cfg.use_pallas, bn_stats=cfg.bn_stats,
                            stem_s2d=cfg.stem_s2d, remat=cfg.remat, name=name)
        if cfg.backbone == "vit":
            from rgb_proprioceptive_pose_estimator_tpu.models.vit import ViT
            return ViT(features=cfg.image_features, patch=cfg.vit_patch,
                       dim=cfg.vit_dim, depth=cfg.vit_depth,
                       heads=cfg.vit_heads, mlp_ratio=cfg.vit_mlp_ratio,
                       pool=cfg.vit_pool, dtype=dtype, remat=cfg.remat,
                       name=name)
        raise ValueError(f"unknown backbone {self.cfg.backbone!r}")

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        feats = []

        if cfg.backbone != "none":
            images = batch["images"]
            lstm = cfg.temporal_frames > 1 and cfg.temporal_mode == "lstm"
            n_cam = len(cfg.cameras)
            # a camera may be STRUCTURALLY absent from batch["images"]
            # (dead sensor at serving/eval time, api.py): its contribution
            # is the all-zero feature vector cfg.camera_dropout trains the
            # head for, and its encoder is skipped entirely -- no
            # placeholder-pixel FLOPs. Static per compiled signature.
            present = [c for c in cfg.cameras if c in images]
            if not present and not cfg.use_proprio:
                raise ValueError(
                    f"batch['images'] supplies none of the model's cameras "
                    f"{list(cfg.cameras)} and the model has no proprio "
                    "branch")
            b = (images[present[0]].shape[0] if present
                 else batch["proprio"].shape[0])
            # optional (B, n_cameras) mask, 0 = camera dead: a dead
            # camera's features zero out, the representation the head was
            # trained for under cfg.camera_dropout (config.py). Absent
            # mask = all cameras live (the common path adds no work).
            cam_mask = batch.get("camera_mask")
            if train and cfg.camera_dropout > 0:
                # modality dropout, NO 1/(1-p) rescale (ModDrop-style):
                # inference with a dead camera presents exactly the
                # zeroed features training sampled here. Reuses the
                # "dropout" rng the train step always provides.
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - cfg.camera_dropout,
                    (b, n_cam)).astype(jnp.float32)
                # cameras live BEFORE dropout: an incoming batch mask and
                # structural absence both bound what dropout may resurrect
                live_in = jnp.asarray(
                    [1.0 if c in images else 0.0 for c in cfg.cameras])
                if cam_mask is not None:
                    live_in = live_in * cam_mask
                live_in = jnp.broadcast_to(live_in, (b, n_cam))
                combined = keep * live_in
                if not cfg.use_proprio:
                    # independent drops can kill EVERY camera of a sample
                    # (p^n per sample); without a proprio branch that
                    # sample carries zero information and its raw head
                    # output is exactly 0. Force one camera back on for
                    # such rows, chosen uniformly among the cameras that
                    # were live BEFORE dropout (forcing one the incoming
                    # mask killed would defeat the guard). Rows with no
                    # live camera at all stay all-dead -- the caller asked
                    # for that. (With proprio, the all-cameras-dead sample
                    # is a VALID training case.)
                    forced = jax.nn.one_hot(
                        jax.random.categorical(
                            self.make_rng("dropout"),
                            jnp.where(live_in > 0, 0.0, -1e9)),
                        n_cam, dtype=jnp.float32)
                    dead = jnp.logical_and(
                        jnp.sum(combined, axis=-1, keepdims=True) == 0,
                        jnp.sum(live_in, axis=-1, keepdims=True) > 0,
                    ).astype(jnp.float32)
                    combined = combined + dead * forced
                cam_mask = combined
            # one encoder per camera (C10, BASELINE.json:11)
            for ci, cam in enumerate(cfg.cameras):
                img = images.get(cam)
                if img is None:
                    # dead sensor: exactly the zeroed-feature vector the
                    # mask path produces (bitwise -- encoder(x) * 0 == 0),
                    # minus the encoder forward
                    feats.append(jnp.zeros((b, cfg.image_features), dtype))
                    continue
                if lstm:
                    # temporally-dependent variant (SURVEY.md 1.3): encode
                    # each frame, run an LSTM over the feature sequence
                    b, t = img.shape[:2]
                    x = img.reshape((b * t,) + img.shape[2:])
                    x = normalize_images(x, cfg.image_mean, cfg.image_std,
                                         dtype=dtype,
                                         use_pallas=cfg.use_pallas)
                    f = self._encoder(f"encoder_{cam}")(x, train)
                    f = f.reshape(b, t, -1)
                    f = nn.RNN(
                        nn.OptimizedLSTMCell(
                            cfg.image_features, dtype=dtype,
                            param_dtype=jnp.float32,
                            name=f"lstm_{cam}"))(f)
                    f = f[:, -1]
                else:
                    x = _stack_temporal(img)
                    x = normalize_images(x, cfg.image_mean, cfg.image_std,
                                         dtype=dtype,
                                         use_pallas=cfg.use_pallas)
                    f = self._encoder(f"encoder_{cam}")(x, train)
                if cam_mask is not None:
                    f = f * cam_mask[:, ci:ci + 1].astype(f.dtype)
                feats.append(f)

        if cfg.use_proprio:
            pf = ProprioMLP(hidden=cfg.proprio_hidden,
                            features=cfg.proprio_features, dtype=dtype,
                            normalize=cfg.proprio_normalize,
                            name="proprio")(batch["proprio"])
            if cfg.proprio_dropout > 0:
                # regularize the proprio branch (cfg.proprio_dropout doc);
                # rng provided by the train step as rngs={"dropout": ...}
                pf = nn.Dropout(rate=cfg.proprio_dropout,
                                deterministic=not train)(pf)
            feats.append(pf)

        if not feats:
            raise ValueError("model has neither image nor proprio inputs")

        # late fusion by concat (C5, BASELINE.json:5)
        h = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
        for i, hd in enumerate(cfg.head_hidden):
            h = nn.Dense(hd, dtype=dtype, param_dtype=jnp.float32,
                         name=f"head{i}")(h)
            h = nn.relu(h)
        # head output width: 3 (pos) + rotation parameterization
        # (cfg.rot_rep): 4 raw-quat values or 6 for the continuous rot6d
        # representation, converted back to a quaternion in-graph so every
        # downstream consumer stays quaternion-typed
        rot_dim = 6 if cfg.rot_rep == "rot6d" else 4
        out = nn.Dense(3 + rot_dim, dtype=jnp.float32,
                       param_dtype=jnp.float32,
                       name="pose_out")(h.astype(jnp.float32))
        pos = out[..., :3]
        if cfg.rot_rep == "rot6d":
            quat = rot6d_to_quat(out[..., 3:])
        else:
            quat = quat_normalize(out[..., 3:])
        return pos, quat


def build_model(cfg: ModelConfig) -> PoseEstimator:
    return PoseEstimator(cfg=cfg)


def example_batch(cfg: ModelConfig, batch_size: int = 2,
                  rng: int = 0) -> Dict[str, Any]:
    """A host-side example batch with the model's input structure
    (used for init, compile checks, and the graft entry)."""
    import numpy as np

    rs = np.random.RandomState(rng)
    batch: Dict[str, Any] = {}
    if cfg.backbone != "none":
        t = cfg.temporal_frames
        hw = cfg.image_size
        shape = (batch_size, hw, hw, 3) if t == 1 else (batch_size, t, hw, hw, 3)
        batch["images"] = {
            cam: rs.randint(0, 256, size=shape, dtype=np.uint8)
            for cam in cfg.cameras
        }
    if cfg.use_proprio:
        t = cfg.temporal_frames
        shape = (batch_size, cfg.proprio_dim) if t == 1 else (
            batch_size, t, cfg.proprio_dim)
        batch["proprio"] = rs.randn(*shape).astype(np.float32)
    batch["target_pos"] = rs.randn(batch_size, 3).astype(np.float32)
    q = rs.randn(batch_size, 4).astype(np.float32)
    batch["target_quat"] = (q / np.linalg.norm(q, axis=-1, keepdims=True))
    return batch
