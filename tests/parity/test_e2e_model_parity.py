"""End-to-end torch-twin parity for the flagship pr3 model.

With the reference unreadable, this is the accuracy-parity oracle
(BASELINE.json:5 "within 1% pose MAE"; SURVEY.md section 5.2): a complete
torch twin of the ResNet-18 RGB + proprio late-fusion estimator --
uint8 normalize, backbone, proprio MLP, concat head, quat normalize --
with weights copied torch -> flax, asserting the full forward (pos, quat)
agrees to f32 tolerance. Any BN-semantics, padding, pooling, or fusion
drift shows up here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rgb_proprioceptive_pose_estimator_tpu.config import ModelConfig  # noqa: E402
from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (  # noqa: E402
    build_model,
)
from rgb_proprioceptive_pose_estimator_tpu.utils.torch_import import (  # noqa: E402
    load_pretrained_backbone,
)

torch.manual_seed(0)

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# torch twin of the full pr3 model (hand-built; torchvision not available)
# ---------------------------------------------------------------------------


class TorchBasic(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TorchResNet18(tnn.Module):
    """torchvision-resnet18-shaped backbone with the FC replaced by a
    feature projection (as the reference did)."""

    def __init__(self, features):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        cin = 64
        for stage, width in enumerate([64, 128, 256, 512]):
            blocks = []
            for i in range(2):
                stride = 2 if (i == 0 and stage > 0) else 1
                blocks.append(TorchBasic(cin, width, stride))
                cin = width
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        self.proj = tnn.Linear(512, features)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = x.mean(dim=(2, 3))
        return torch.relu(self.proj(x))

    def state_dict_torchvision_names(self):
        """Rename to the torchvision convention consumed by torch_import."""
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace("down.0", "downsample.0").replace(
                "down.1", "downsample.1")
            sd[k] = v
        return sd


class TorchPoseModel(tnn.Module):
    def __init__(self, image_features=64, proprio_dim=16,
                 proprio_hidden=(32,), proprio_features=16,
                 head_hidden=(32,)):
        super().__init__()
        self.backbone = TorchResNet18(image_features)
        pl = []
        d = proprio_dim
        for h in proprio_hidden:
            pl += [tnn.Linear(d, h), tnn.ReLU()]
            d = h
        pl += [tnn.Linear(d, proprio_features), tnn.ReLU()]
        self.proprio = tnn.Sequential(*pl)
        hl = []
        d = image_features + proprio_features
        for h in head_hidden:
            hl += [tnn.Linear(d, h), tnn.ReLU()]
            d = h
        self.head = tnn.Sequential(*hl)
        self.pose_out = tnn.Linear(d, 7)

    def forward(self, img_u8_nhwc, proprio):
        mean = torch.tensor(MEAN).view(1, 3, 1, 1)
        std = torch.tensor(STD).view(1, 3, 1, 1)
        x = img_u8_nhwc.permute(0, 3, 1, 2).float() / 255.0
        x = (x - mean) / std
        f_img = self.backbone(x)
        f_pro = self.proprio(proprio)
        h = self.head(torch.cat([f_img, f_pro], dim=-1))
        out = self.pose_out(h)
        pos = out[:, :3]
        quat = out[:, 3:]
        quat = quat / quat.norm(dim=-1, keepdim=True).clamp_min(1e-8)
        return pos, quat


def _copy_linear(tl: tnn.Linear):
    return {"kernel": tl.weight.detach().numpy().T.copy(),
            "bias": tl.bias.detach().numpy().copy()}


def test_full_pr3_model_forward_parity():
    cfg = ModelConfig(backbone="resnet18", cameras=("agentview",),
                      image_size=64, use_proprio=True, proprio_dim=16,
                      proprio_hidden=(32,), proprio_features=16,
                      image_features=64, head_hidden=(32,),
                      image_mean=MEAN, image_std=STD)
    fmodel = build_model(cfg)

    tm = TorchPoseModel()
    # randomize BN stats so eval-mode normalization is non-trivial
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.05)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    tm.eval()

    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (4, 64, 64, 3), np.uint8)
    pro = rs.randn(4, 16).astype(np.float32)

    with torch.no_grad():
        tpos, tquat = tm(torch.from_numpy(img), torch.from_numpy(pro))

    # build flax variables from the torch twin
    batch = {"images": {"agentview": img}, "proprio": pro}
    variables = fmodel.init(jax.random.PRNGKey(0), batch, train=False)
    variables = jax.device_get(variables)
    variables = load_pretrained_backbone(
        variables, "agentview", tm.backbone.state_dict_torchvision_names(),
        "resnet18")
    p = variables["params"]
    p["encoder_agentview"]["proj"] = _copy_linear(tm.backbone.proj)
    p["proprio"]["dense0"] = _copy_linear(tm.proprio[0])
    p["proprio"]["proj"] = _copy_linear(tm.proprio[2])
    p["head0"] = _copy_linear(tm.head[0])
    p["pose_out"] = _copy_linear(tm.pose_out)

    fpos, fquat = fmodel.apply(variables, batch, train=False)

    np.testing.assert_allclose(np.asarray(fpos), tpos.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fquat), tquat.numpy(),
                               rtol=1e-3, atol=1e-4)
    # and the quat is unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(fquat), axis=-1), 1.0, atol=1e-5)
