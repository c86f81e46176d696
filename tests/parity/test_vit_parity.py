"""ViT forward parity: models/vit.ViT (pool="cls") against a hand-built
torch twin that implements torchvision's VisionTransformer encoder math
(conv patch embed -> CLS token -> pos embedding -> pre-LN blocks with
nn.MultiheadAttention + exact-GELU MLP -> final LN -> CLS readout), with
weights exported under torchvision's state_dict naming and imported via
utils/torch_import.import_torch_vit. Torchvision itself is not in this
image, so the twin IS the layout oracle (same approach as the ResNet
twins in test_e2e_model_parity.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rgb_proprioceptive_pose_estimator_tpu.models.vit import ViT  # noqa: E402
from rgb_proprioceptive_pose_estimator_tpu.utils.torch_import import (  # noqa: E402
    import_torch_vit,
)

IMG, PATCH, DIM, DEPTH, HEADS = 32, 8, 48, 2, 4


class TorchViTTwin(tnn.Module):
    """torchvision VisionTransformer encoder forward (eval mode, no
    dropout), returning the post-LN CLS token representation."""

    def __init__(self):
        super().__init__()
        n = (IMG // PATCH) ** 2
        self.conv_proj = tnn.Conv2d(3, DIM, PATCH, PATCH)
        self.class_token = tnn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        self.pos_embedding = tnn.Parameter(torch.randn(1, n + 1, DIM) * 0.02)
        self.ln_1 = tnn.ModuleList(
            [tnn.LayerNorm(DIM, eps=1e-6) for _ in range(DEPTH)])
        self.attn = tnn.ModuleList(
            [tnn.MultiheadAttention(DIM, HEADS, batch_first=True)
             for _ in range(DEPTH)])
        self.ln_2 = tnn.ModuleList(
            [tnn.LayerNorm(DIM, eps=1e-6) for _ in range(DEPTH)])
        self.mlp1 = tnn.ModuleList(
            [tnn.Linear(DIM, DIM * 4) for _ in range(DEPTH)])
        self.mlp2 = tnn.ModuleList(
            [tnn.Linear(DIM * 4, DIM) for _ in range(DEPTH)])
        self.ln = tnn.LayerNorm(DIM, eps=1e-6)

    def forward(self, x):                      # x: (B, 3, H, W)
        b = x.shape[0]
        x = self.conv_proj(x).flatten(2).transpose(1, 2)   # (B, N, E)
        x = torch.cat([self.class_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embedding
        for i in range(DEPTH):
            h = self.ln_1[i](x)
            a, _ = self.attn[i](h, h, h, need_weights=False)
            x = x + a
            h = self.ln_2[i](x)
            x = x + self.mlp2[i](torch.nn.functional.gelu(self.mlp1[i](h)))
        return self.ln(x)[:, 0]

    def torchvision_state_dict(self):
        """Export under torchvision VisionTransformer key names."""
        sd = {
            "conv_proj.weight": self.conv_proj.weight,
            "conv_proj.bias": self.conv_proj.bias,
            "class_token": self.class_token,
            "encoder.pos_embedding": self.pos_embedding,
            "encoder.ln.weight": self.ln.weight,
            "encoder.ln.bias": self.ln.bias,
        }
        for i in range(DEPTH):
            t = f"encoder.layers.encoder_layer_{i}"
            sd[f"{t}.ln_1.weight"] = self.ln_1[i].weight
            sd[f"{t}.ln_1.bias"] = self.ln_1[i].bias
            sd[f"{t}.self_attention.in_proj_weight"] = \
                self.attn[i].in_proj_weight
            sd[f"{t}.self_attention.in_proj_bias"] = self.attn[i].in_proj_bias
            sd[f"{t}.self_attention.out_proj.weight"] = \
                self.attn[i].out_proj.weight
            sd[f"{t}.self_attention.out_proj.bias"] = \
                self.attn[i].out_proj.bias
            sd[f"{t}.ln_2.weight"] = self.ln_2[i].weight
            sd[f"{t}.ln_2.bias"] = self.ln_2[i].bias
            sd[f"{t}.mlp.0.weight"] = self.mlp1[i].weight
            sd[f"{t}.mlp.0.bias"] = self.mlp1[i].bias
            sd[f"{t}.mlp.3.weight"] = self.mlp2[i].weight
            sd[f"{t}.mlp.3.bias"] = self.mlp2[i].bias
        return sd


def test_vit_forward_matches_torch_twin():
    torch.manual_seed(11)
    tm = TorchViTTwin().eval()

    x = np.random.RandomState(5).randn(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = ViT(features=DIM, patch=PATCH, dim=DIM, depth=DEPTH,
                heads=HEADS, pool="cls")
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    imported = import_torch_vit(tm.torchvision_state_dict(), DEPTH, HEADS)
    for k, v in imported.items():
        want_shapes = jax.tree.map(lambda a: a.shape, params[k])
        got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, v)
        assert want_shapes == got_shapes, (k, want_shapes, got_shapes)
        params[k] = v
    # identity projection: compare the CLS representation itself
    params["proj"] = {"kernel": np.eye(DIM, dtype=np.float32),
                      "bias": np.zeros(DIM, np.float32)}

    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
