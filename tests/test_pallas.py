"""Pallas fused kernels vs the XLA reference path (SURVEY.md section 3.1).

On CPU these run through the Pallas interpreter -- same kernel code that
compiles on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgb_proprioceptive_pose_estimator_tpu.ops.image_device import normalize_images
from rgb_proprioceptive_pose_estimator_tpu.ops.pallas_fused import (
    pallas_normalize_u8,
    scale_bias_relu,
)

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


@pytest.mark.parametrize("shape", [(2, 64, 64, 3), (2, 3, 64, 64, 3)])
def test_pallas_normalize_matches_xla(shape):
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, shape, np.uint8)
    ref = normalize_images(jnp.asarray(img), MEAN, STD, jnp.float32,
                           use_pallas=False)
    out = pallas_normalize_u8(jnp.asarray(img), MEAN, STD, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_normalize_bf16_output():
    img = jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (1, 128, 128, 3), np.uint8))
    out = pallas_normalize_u8(img, MEAN, STD, jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    ref = normalize_images(img, MEAN, STD, jnp.float32)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=2e-2)


def test_scale_bias_relu_forward():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(4, 8, 8, 64).astype(np.float32))
    scale = jnp.asarray(rs.randn(64).astype(np.float32))
    bias = jnp.asarray(rs.randn(64).astype(np.float32))
    out = scale_bias_relu(x, scale, bias)
    ref = jnp.maximum(x * scale + bias, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_scale_bias_relu_grad_matches_xla():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 4, 4, 32).astype(np.float32))
    scale = jnp.asarray(rs.rand(32).astype(np.float32) + 0.5)
    bias = jnp.asarray(rs.randn(32).astype(np.float32) * 0.1)

    def f_pallas(x, s, b):
        return jnp.sum(jnp.square(scale_bias_relu(x, s, b)))

    def f_ref(x, s, b):
        return jnp.sum(jnp.square(jnp.maximum(x * s + b, 0.0)))

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_model_path_matches_xla_path():
    """A full cnn_small forward with use_pallas=True equals the XLA path."""
    from rgb_proprioceptive_pose_estimator_tpu.config import ModelConfig
    from rgb_proprioceptive_pose_estimator_tpu.models.fusion import (
        build_model,
        example_batch,
    )

    kw = dict(backbone="cnn_small", image_size=64, use_proprio=False,
              image_features=64, head_hidden=(32,))
    cfg_x = ModelConfig(use_pallas=False, **kw)
    cfg_p = ModelConfig(use_pallas=True, **kw)
    batch = example_batch(cfg_x, batch_size=2)
    mx = build_model(cfg_x)
    mp = build_model(cfg_p)
    variables = mx.init(jax.random.PRNGKey(0), batch, train=False)
    px, qx = mx.apply(variables, batch, train=False)
    pp, qp = mp.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(px), np.asarray(pp),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qx), np.asarray(qp),
                               rtol=1e-4, atol=1e-5)
