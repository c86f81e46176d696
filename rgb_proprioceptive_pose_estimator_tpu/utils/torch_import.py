"""Import torchvision-style ResNet / ViT weights into the flax param tree.

The reference loaded pretrained torchvision backbones (`[RECALL]` SURVEY.md
section 1.3). This environment has no network, so instead of bundling
weights the framework provides the converter: give it a torchvision
resnet18/resnet50 `state_dict()` (torch tensors or numpy arrays; e.g. from
a file a user ships) and it returns the (params, batch_stats) trees for
`models/resnet.py`, ready to merge into a PoseEstimator's camera encoder.

Layout mapping (torch OIHW conv -> flax HWIO; BN weight/bias ->
scale/bias; running stats -> batch_stats):

    conv1.weight                  -> stem.conv.kernel
    bn1.*                         -> stem.bn.*
    layer{L}.{B}.conv{K}.weight   -> stage{L}_block{B}.conv{K}.conv.kernel
    layer{L}.{B}.bn{K}.*          -> stage{L}_block{B}.conv{K}.bn.*
    layer{L}.{B}.downsample.0/1.* -> stage{L}_block{B}.downsample.conv/bn.*
    fc.*                          -> dropped (the head is replaced by the
                                     pose projection, as in the reference)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

_STAGES = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
           "resnet50": (3, 4, 6, 3)}
_CONVS = {"resnet18": 2, "resnet34": 2, "resnet50": 3}


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Read a backbone state_dict from disk for train.init_from_torch.

    Two formats:
      - ``.npz``: a numpy archive whose entry names are the torch
        state_dict keys (``np.savez(path, **{k: v.numpy() ...})``) --
        torch-free, the recommended interchange format.
      - anything else (``.pt``/``.pth``/``.bin``/``.ckpt``): a
        torch-pickled state_dict, loaded via
        ``torch.load(weights_only=True)``. torch is imported lazily here
        only -- the product compute path stays torch-free (SURVEY.md
        section 8 env note). An unrecognized extension warns and still
        attempts the torch load (published checkpoints use many suffixes;
        a hard whitelist was an ADVICE-r4-flagged behavior regression) --
        weights_only=True keeps the attempt pickle-safe either way.
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if not path.endswith((".pt", ".pth", ".bin", ".ckpt")):
        import warnings

        warnings.warn(
            f"{path}: unrecognized state_dict extension; attempting "
            "torch.load(weights_only=True) anyway. Expected .npz (numpy "
            "archive) or a torch-pickled .pt/.pth/.bin/.ckpt.",
            stacklevel=2)
    try:
        import torch
    except ImportError as e:
        raise ImportError(
            f"{path}: torch-pickled state_dicts need torch installed to "
            "read; convert once to .npz instead (np.savez(out, **{k: "
            "v.numpy() for k, v in sd.items()}))") from e
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and isinstance(sd.get("state_dict"), dict):
        # container-style checkpoint (Lightning et al.: the weights live
        # UNDER a "state_dict" key next to epoch/optimizer entries) -- the
        # dominant layout for published .ckpt files; without the unwrap the
        # importer returns the wrapper dict and fails later with an opaque
        # KeyError('conv1.weight')
        sd = sd["state_dict"]
    return {k: _np(v) for k, v in sd.items()}


def _conv_kernel(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 1, 0)).astype(np.float32)  # OIHW->HWIO


def _bn(sd: Mapping[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    params = {
        "scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]).astype(np.float32),
        "var": _np(sd[f"{prefix}.running_var"]).astype(np.float32),
    }
    return params, stats


def _conv_bn(sd: Mapping[str, Any], conv_key: str, bn_key: str
             ) -> Tuple[Dict, Dict]:
    bn_p, bn_s = _bn(sd, bn_key)
    return ({"conv": {"kernel": _conv_kernel(sd[f"{conv_key}.weight"])},
             "bn": bn_p},
            {"bn": bn_s})


def import_torch_resnet(state_dict: Mapping[str, Any], arch: str
                        ) -> Tuple[Dict, Dict]:
    """torchvision resnet state_dict -> (params, batch_stats) for ResNet.

    The returned trees cover the backbone only; the `proj` head keeps its
    fresh initialization (merge handles that)."""
    if arch not in _STAGES:
        raise ValueError(f"arch must be one of {sorted(_STAGES)}, got {arch!r}")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem"], stats["stem"] = _conv_bn(state_dict, "conv1", "bn1")

    n_convs = _CONVS[arch]
    for stage, n_blocks in enumerate(_STAGES[arch], start=1):
        for b in range(n_blocks):
            name = f"stage{stage}_block{b}"
            tprefix = f"layer{stage}.{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for k in range(1, n_convs + 1):
                bp[f"conv{k}"], bs[f"conv{k}"] = _conv_bn(
                    state_dict, f"{tprefix}.conv{k}", f"{tprefix}.bn{k}")
            if f"{tprefix}.downsample.0.weight" in state_dict:
                bp["downsample"], bs["downsample"] = _conv_bn(
                    state_dict, f"{tprefix}.downsample.0",
                    f"{tprefix}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return params, stats


def _ln(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
            "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32)}


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T.astype(np.float32),
            "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32)}


def import_torch_vit(state_dict: Mapping[str, Any], depth: int,
                     heads: int) -> Dict[str, Any]:
    """torchvision VisionTransformer (vit_b_16-style) state_dict ->
    params for models/vit.ViT with pool="cls".

    Key mapping (torch packed qkv -> flax per-head kernels):

        conv_proj.{weight,bias}              -> patch_embed
        class_token                          -> cls_token
        encoder.pos_embedding                -> pos_embed (CLS slot first)
        encoder.layers.encoder_layer_i.ln_1  -> block{i}.ln1
          .self_attention.in_proj_{weight,bias}  -> block{i}.attn.{query,key,value}
          .self_attention.out_proj.*             -> block{i}.attn.out
          .ln_2 / .mlp.0 / .mlp.3                -> block{i}.{ln2,mlp1,mlp2}
        encoder.ln                           -> ln_out
        heads.*                              -> dropped (pose projection
                                                replaces the classifier)

    The heads split: torch in_proj_weight is (3E, E) rows [q; k; v],
    applied as w @ x; flax stores per-head kernels (E, H, E/H) applied as
    x @ kernel, so each (E, E) slice transposes then reshapes."""
    dim = _np(state_dict["class_token"]).shape[-1]
    hd = dim // heads
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv_kernel(state_dict["conv_proj.weight"]),
            "bias": _np(state_dict["conv_proj.bias"]).astype(np.float32),
        },
        "cls_token": _np(state_dict["class_token"]).astype(np.float32),
        "pos_embed": _np(
            state_dict["encoder.pos_embedding"]).astype(np.float32),
        "ln_out": _ln(state_dict, "encoder.ln"),
    }
    for i in range(depth):
        t = f"encoder.layers.encoder_layer_{i}"
        w = _np(state_dict[f"{t}.self_attention.in_proj_weight"])
        b = _np(state_dict[f"{t}.self_attention.in_proj_bias"])
        qkv = {}
        for j, name in enumerate(("query", "key", "value")):
            qkv[name] = {
                "kernel": w[j * dim:(j + 1) * dim].T.reshape(
                    dim, heads, hd).astype(np.float32),
                "bias": b[j * dim:(j + 1) * dim].reshape(
                    heads, hd).astype(np.float32),
            }
        qkv["out"] = {
            "kernel": _np(state_dict[f"{t}.self_attention.out_proj.weight"]
                          ).T.reshape(heads, hd, dim).astype(np.float32),
            "bias": _np(state_dict[f"{t}.self_attention.out_proj.bias"]
                        ).astype(np.float32),
        }
        params[f"block{i}"] = {
            "ln1": _ln(state_dict, f"{t}.ln_1"),
            "attn": qkv,
            "ln2": _ln(state_dict, f"{t}.ln_2"),
            "mlp1": _linear(state_dict, f"{t}.mlp.0"),
            "mlp2": _linear(state_dict, f"{t}.mlp.3"),
        }
    return params


def load_pretrained_backbone(variables: Dict[str, Any], camera: str,
                             state_dict: Mapping[str, Any], arch: str,
                             depth: int = 12, heads: int = 12
                             ) -> Dict[str, Any]:
    """Merge torchvision weights into a PoseEstimator variables tree for
    one camera encoder (`encoder_<camera>`); returns a new tree.
    `arch`: resnet18/34/50, or "vit" (torchvision VisionTransformer
    layout; pass the encoder's `depth`/`heads`, model must use
    vit_pool="cls")."""
    import jax

    enc = f"encoder_{camera}"
    if enc not in variables["params"]:
        raise KeyError(f"no encoder {enc!r}; have "
                       f"{sorted(variables['params'])}")
    if arch == "vit":
        bp, bs = import_torch_vit(state_dict, depth, heads), {}
        enc_blocks = {k for k in variables["params"][enc]
                      if k.startswith("block")}
        missing = sorted(enc_blocks - set(bp))
        if missing:
            # the merge loop only overwrites keys the import provides; a
            # depth smaller than the model's vit_depth would otherwise
            # leave the deeper blocks silently at random init
            raise ValueError(
                f"imported ViT covers {len(bp) - 4} blocks but {enc} has "
                f"{len(enc_blocks)}; blocks left uninitialized: {missing} "
                "(pass the encoder's actual depth)")
    else:
        bp, bs = import_torch_resnet(state_dict, arch)

    params = dict(variables["params"])
    enc_params = dict(params[enc])
    batch_stats = dict(variables.get("batch_stats", {}))
    enc_stats = dict(batch_stats.get(enc, {}))

    for k, v in bp.items():
        if k not in enc_params:
            raise KeyError(f"backbone key {k!r} missing in {enc} params "
                           "(arch mismatch?)")
        old_shapes = jax.tree.map(lambda x: x.shape, enc_params[k])
        new_shapes = jax.tree.map(lambda x: x.shape, v)
        if old_shapes != new_shapes:
            raise ValueError(
                f"shape mismatch at {enc}.{k}: {old_shapes} vs {new_shapes}")
        enc_params[k] = v
    for k, v in bs.items():
        enc_stats[k] = v

    params[enc] = enc_params
    out = dict(variables)
    out["params"] = params
    # Only write the batch_stats entry when there are stats to merge or the
    # model already had one (BN-free encoders like ViT must not gain an
    # empty-dict node: it would be saved into every checkpoint and then
    # mismatch the fresh create_state template on resume, making the run
    # unresumable after preemption).
    if enc_stats or enc in variables.get("batch_stats", {}):
        batch_stats[enc] = enc_stats
    if batch_stats or "batch_stats" in variables:
        out["batch_stats"] = batch_stats
    return out
