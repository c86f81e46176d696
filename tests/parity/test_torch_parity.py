"""Torch-parity golden tests (SURVEY.md section 5.2).

With the reference mount empty, torch-CPU twins of each block are the
numerical oracle for "torch semantics" (BN momentum/eps/unbiased-running-var,
conv padding, pooling): weights are copied torch -> flax and forward (and
BN-stat updates) must agree to tolerance. torch is test-only -- no torch in
the product code path (SURVEY.md section 7 env facts)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rgb_proprioceptive_pose_estimator_tpu.models.blocks import (  # noqa: E402
    BatchNormAct,
    ConvBNReLU,
)
from rgb_proprioceptive_pose_estimator_tpu.models.resnet import (  # noqa: E402
    BasicBlock,
    Bottleneck,
)
from rgb_proprioceptive_pose_estimator_tpu.ops import pose_math as pm  # noqa: E402

torch.manual_seed(0)


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _copy_conv(tconv: tnn.Conv2d):
    """torch OIHW -> flax HWIO."""
    w = tconv.weight.detach().numpy()          # (O, I, kh, kw)
    return np.transpose(w, (2, 3, 1, 0))       # (kh, kw, I, O)


def _copy_bn(tbn: tnn.BatchNorm2d):
    # .copy(): torch mutates running stats in place on the next train-mode
    # forward, and .numpy() returns views
    return {
        "scale": tbn.weight.detach().numpy().copy(),
        "bias": tbn.bias.detach().numpy().copy(),
    }, {
        "mean": tbn.running_mean.detach().numpy().copy(),
        "var": tbn.running_var.detach().numpy().copy(),
    }


def test_batchnorm_train_and_eval_match_torch():
    """BN forward (train + eval) and running-stat updates vs torch
    (SURVEY.md section 8 hard-part 2: momentum/eps/unbiased conventions)."""
    n, h, w, c = 4, 6, 6, 8
    rs = np.random.RandomState(0)
    x = rs.randn(n, h, w, c).astype(np.float32) * 2 + 0.5

    tbn = tnn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(c) + 0.5)
        tbn.bias.copy_(torch.randn(c) * 0.1)
        tbn.running_mean.copy_(torch.randn(c) * 0.1)
        tbn.running_var.copy_(torch.rand(c) + 0.5)

    params, stats = _copy_bn(tbn)
    fbn = BatchNormAct(momentum=0.9, eps=1e-5, act=False)
    variables = {"params": params, "batch_stats": stats}

    # train mode: outputs + updated running stats
    tbn.train()
    ty = tbn(_nchw(x))
    (fy, mut) = fbn.apply(variables, jnp.asarray(x), train=True,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(fy), _to_nhwc(ty),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               tbn.running_mean.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               tbn.running_var.detach().numpy(),
                               rtol=1e-5, atol=1e-6)

    # eval mode with the updated stats
    tbn.eval()
    ty_e = tbn(_nchw(x))
    variables2 = {"params": params, "batch_stats": mut["batch_stats"]}
    fy_e = fbn.apply(variables2, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(fy_e), _to_nhwc(ty_e),
                               rtol=1e-4, atol=1e-5)


def _make_torch_convbn(cin, cout, k, stride, pad):
    conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=pad, bias=False)
    bn = tnn.BatchNorm2d(cout)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(cout) + 0.5)
        bn.bias.copy_(torch.randn(cout) * 0.1)
        bn.running_mean.copy_(torch.randn(cout) * 0.1)
        bn.running_var.copy_(torch.rand(cout) + 0.5)
    return conv, bn


def test_conv_bn_relu_block_matches_torch():
    cin, cout = 3, 16
    rs = np.random.RandomState(1)
    x = rs.randn(2, 16, 16, cin).astype(np.float32)

    conv, bn = _make_torch_convbn(cin, cout, 3, 2, 1)
    ty = torch.relu(bn(conv(_nchw(x))))  # train-mode BN

    block = ConvBNReLU(cout, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
    variables = {
        "params": {
            "conv": {"kernel": _copy_conv(conv)},
            "bn": _copy_bn(bn)[0],
        },
        "batch_stats": {"bn": _copy_bn(bn)[1]},
    }
    fy, _ = block.apply(variables, jnp.asarray(x), train=True,
                        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(fy), _to_nhwc(ty),
                               rtol=1e-4, atol=1e-4)


class _TorchBasicBlock(tnn.Module):
    """Hand-built twin of torchvision BasicBlock (torchvision is not in the
    image): conv3x3-BN-ReLU-conv3x3-BN + identity -> ReLU."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + x)


class _TorchBottleneck(tnn.Module):
    """Twin of torchvision Bottleneck: 1x1 -> 3x3 -> 1x1(x4) + identity."""

    def __init__(self, inplanes, planes):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + x)


def _randomize_bn(bn):
    with torch.no_grad():
        bn.weight.copy_(torch.rand_like(bn.weight) + 0.5)
        bn.bias.copy_(torch.randn_like(bn.bias) * 0.1)
        bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
        bn.running_var.copy_(torch.rand_like(bn.running_var) + 0.5)


def test_resnet_basic_block_matches_torch():
    cin = cout = 16
    rs = np.random.RandomState(2)
    x = rs.randn(2, 8, 8, cin).astype(np.float32)

    tb = _TorchBasicBlock(cin, cout)
    _randomize_bn(tb.bn1)
    _randomize_bn(tb.bn2)
    tb.eval()
    ty = tb(_nchw(x))

    fb = BasicBlock(cout, (1, 1))
    p1, s1 = _copy_bn(tb.bn1)
    p2, s2 = _copy_bn(tb.bn2)
    variables = {
        "params": {
            "conv1": {"conv": {"kernel": _copy_conv(tb.conv1)}, "bn": p1},
            "conv2": {"conv": {"kernel": _copy_conv(tb.conv2)}, "bn": p2},
        },
        "batch_stats": {
            "conv1": {"bn": s1},
            "conv2": {"bn": s2},
        },
    }
    fy = fb.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(fy), _to_nhwc(ty),
                               rtol=1e-4, atol=1e-4)


def test_resnet_bottleneck_matches_torch():
    rs = np.random.RandomState(3)
    inplanes, planes = 64, 16
    x = rs.randn(2, 8, 8, inplanes).astype(np.float32)

    tb = _TorchBottleneck(inplanes, planes)  # out = planes*4 = 64 = inplanes
    for bn in (tb.bn1, tb.bn2, tb.bn3):
        _randomize_bn(bn)
    tb.eval()
    ty = tb(_nchw(x))

    fb = Bottleneck(planes, (1, 1))
    variables = {"params": {}, "batch_stats": {}}
    for i, (tc, tbn) in enumerate(
            [(tb.conv1, tb.bn1), (tb.conv2, tb.bn2), (tb.conv3, tb.bn3)], 1):
        p, s = _copy_bn(tbn)
        variables["params"][f"conv{i}"] = {
            "conv": {"kernel": _copy_conv(tc)}, "bn": p}
        variables["batch_stats"][f"conv{i}"] = {"bn": s}
    fy = fb.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(fy), _to_nhwc(ty),
                               rtol=1e-4, atol=1e-4)


def test_maxpool_stem_matches_torch():
    """7x7/2 conv + 3x3/2 maxpool stem padding parity."""
    import flax.linen as nn

    rs = np.random.RandomState(4)
    x = rs.randn(1, 32, 32, 3).astype(np.float32)

    tconv = tnn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    tpool = tnn.MaxPool2d(3, stride=2, padding=1)
    ty = tpool(tconv(_nchw(x)))

    conv = nn.Conv(8, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                   use_bias=False)
    variables = {"params": {"kernel": _copy_conv(tconv)}}
    fy = conv.apply(variables, jnp.asarray(x))
    fy = nn.max_pool(fy, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    np.testing.assert_allclose(np.asarray(fy), _to_nhwc(ty),
                               rtol=1e-4, atol=1e-4)


def test_geodesic_loss_matches_torch_reference():
    """Quaternion geodesic distance vs an independent torch implementation."""
    rs = np.random.RandomState(5)
    q1 = rs.randn(32, 4).astype(np.float32)
    q2 = rs.randn(32, 4).astype(np.float32)
    q1 /= np.linalg.norm(q1, axis=-1, keepdims=True)
    q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)

    t1, t2 = torch.from_numpy(q1), torch.from_numpy(q2)
    tdot = torch.abs((t1 * t2).sum(-1)).clamp(max=1.0 - 1e-6)
    t_angle = 2.0 * torch.acos(tdot)

    f_angle = pm.quat_geodesic_angle(jnp.asarray(q1), jnp.asarray(q2))
    np.testing.assert_allclose(np.asarray(f_angle), t_angle.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mlp_matches_torch():
    from rgb_proprioceptive_pose_estimator_tpu.models.proprio_mlp import (
        ProprioMLP,
    )

    rs = np.random.RandomState(6)
    x = rs.randn(4, 12).astype(np.float32)

    tm = tnn.Sequential(
        tnn.Linear(12, 32), tnn.ReLU(),
        tnn.Linear(32, 16), tnn.ReLU())
    ty = tm(torch.from_numpy(x))

    fm = ProprioMLP(hidden=(32,), features=16)
    variables = {"params": {
        "dense0": {"kernel": tm[0].weight.detach().numpy().T,
                   "bias": tm[0].bias.detach().numpy()},
        "proj": {"kernel": tm[2].weight.detach().numpy().T,
                 "bias": tm[2].bias.detach().numpy()},
    }}
    fy = fm.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(fy), ty.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
