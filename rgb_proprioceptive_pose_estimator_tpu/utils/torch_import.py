"""Import torchvision-style ResNet weights into the flax param tree.

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


def load_pretrained_backbone(variables: Dict[str, Any], camera: str,
                             state_dict: Mapping[str, Any], arch: str
                             ) -> Dict[str, Any]:
    """Merge torchvision weights into a PoseEstimator variables tree for
    one camera encoder (`encoder_<camera>`); returns a new tree."""
    import jax

    enc = f"encoder_{camera}"
    if enc not in variables["params"]:
        raise KeyError(f"no encoder {enc!r}; have "
                       f"{sorted(variables['params'])}")
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
    batch_stats[enc] = enc_stats
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = batch_stats
    return out
