"""MXU-routed fused BatchNorm (ops/fused_bn.py, ops/bn_stats.py) and the
space-to-depth stem (models/resnet._S2DStemConv) -- VERDICT r1 next-1/2.

All variants must match the reference reduce path: values, gradients,
batch statistics, and the running-stat update; plus SPMD safety on the
virtual 8-device mesh (see tests/test_distributed.py for the engine-level
assertion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgb_proprioceptive_pose_estimator_tpu.models.blocks import BatchNormAct
from rgb_proprioceptive_pose_estimator_tpu.models.resnet import ResNet18
from rgb_proprioceptive_pose_estimator_tpu.ops.bn_stats import (
    channel_mean_meansq_matmul,
    channel_sum_sumsq_matmul,
)
from rgb_proprioceptive_pose_estimator_tpu.ops.fused_bn import bn_train
from rgb_proprioceptive_pose_estimator_tpu.ops.pallas_fused import (
    channel_stats,
    channel_stats_supported,
)


def _ref_bn(x, gamma, beta, eps=1e-5):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=axes) - mean**2, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return ((xf - mean) * inv * gamma + beta).astype(x.dtype)


@pytest.mark.parametrize("shape", [(16, 8, 8, 64), (8, 4, 4, 128),
                                   (4, 4, 4, 256), (2, 2, 2, 512),
                                   (32, 96)])
def test_stats_impls_agree(shape):
    c = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(1), shape,
                          jnp.float32).astype(jnp.bfloat16)
    xf = np.asarray(x, np.float32).reshape(-1, c)
    s, ss = channel_sum_sumsq_matmul(x)
    np.testing.assert_allclose(np.asarray(s), xf.sum(0), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ss), (xf**2).sum(0),
                               rtol=1e-4, atol=1e-3)
    m, msq = channel_mean_meansq_matmul(x)
    np.testing.assert_allclose(np.asarray(m), xf.mean(0), rtol=1e-4,
                               atol=1e-5)
    if channel_stats_supported(shape):
        ps, pss = channel_stats(x)
        np.testing.assert_allclose(np.asarray(ps), xf.sum(0),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pss), (xf**2).sum(0),
                                   rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("impl", ["matmul", "pallas"])
def test_bn_train_matches_autodiff_reference(dtype, impl):
    """Fused BN values, input/param grads, and batch stats == the reduce
    path differentiated by autodiff."""
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 6, 6, 64),
                          jnp.float32).astype(dtype)
    gamma = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (64,))) + 0.5
    beta = jax.random.normal(jax.random.PRNGKey(4), (64,))
    tgt = jax.random.normal(jax.random.PRNGKey(5), x.shape, jnp.float32)

    def loss_fused(x, g, b):
        y, m, v = bn_train(x, g, b, 1e-5, impl)
        return jnp.mean((y.astype(jnp.float32) - tgt) ** 2), (m, v)

    def loss_ref(x, g, b):
        y = _ref_bn(x, g, b)
        return jnp.mean((y.astype(jnp.float32) - tgt) ** 2)

    (lf, (m, v)), gf = jax.value_and_grad(
        loss_fused, argnums=(0, 1, 2), has_aux=True)(x, gamma, beta)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(lf, lr, rtol=tol)
    for a, b2, n in zip(gf, gr, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b2, np.float32),
                                   rtol=tol, atol=tol, err_msg=n)
    xf = np.asarray(x, np.float32).reshape(-1, 64)
    np.testing.assert_allclose(np.asarray(m), xf.mean(0), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), xf.var(0), rtol=1e-2,
                               atol=1e-4)


@pytest.mark.parametrize("impl", ["matmul", "pallas"])
def test_batchnormact_stats_impl_matches_reduce(impl):
    """BatchNormAct module: identical outputs AND running-stat updates
    across stats_impl values, train and eval."""
    x = jax.random.normal(jax.random.PRNGKey(6), (8, 4, 4, 64), jnp.float32)
    ref = BatchNormAct(stats_impl="reduce")
    alt = BatchNormAct(stats_impl=impl)
    v = ref.init(jax.random.PRNGKey(7), x, train=True)
    y0, mut0 = ref.apply(v, x, train=True, mutable=["batch_stats"])
    y1, mut1 = alt.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut0["batch_stats"][k]),
            np.asarray(mut1["batch_stats"][k]), rtol=1e-5, atol=1e-6)
    # eval ignores stats_impl entirely (shared running-stat path)
    e0 = ref.apply(v, x, train=False)
    e1 = alt.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=0,
                               atol=0)


def test_s2d_stem_equivalence():
    """stem_s2d=True is the same function: same param tree, same forward,
    same stem-kernel gradient (up to f32 summation order through BN)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
    m0 = ResNet18(features=64)
    m1 = ResNet18(features=64, stem_s2d=True)
    v0 = m0.init(jax.random.PRNGKey(1), x, train=False)
    v1 = m1.init(jax.random.PRNGKey(1), x, train=False)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    y0 = m0.apply(v0, x, train=False)
    y1 = m1.apply(v0, x, train=False)     # plain-stem params, s2d apply
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)

    def loss(m, p):
        y, _ = m.apply({"params": p, "batch_stats": v0["batch_stats"]},
                       x, train=True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(v0["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v0["params"])
    np.testing.assert_allclose(
        np.asarray(g0["stem"]["conv"]["kernel"]),
        np.asarray(g1["stem"]["conv"]["kernel"]), rtol=2e-2, atol=1e-3)


def test_bn_train_matmul_spmd_grads_match_single_device():
    """Op-level SPMD check: bn_train('matmul') with the batch sharded over
    8 devices produces the same stats and gradients as one device (the
    dot_general contractions over the sharded dim psum to global stats)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 64),
                          jnp.float32)
    gamma = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (64,))) + 0.5
    beta = jax.random.normal(jax.random.PRNGKey(2), (64,))
    g_out = jax.random.normal(jax.random.PRNGKey(3), x.shape, jnp.float32)

    def loss(x, gamma, beta):
        y, m, v = bn_train(x, gamma, beta, 1e-5, "matmul")
        return jnp.sum(y * g_out), (m, v)

    results = {}
    for n in (1, 8):
        mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
        xd = jax.device_put(x, NamedSharding(mesh, P("data")))
        gd = jax.device_put(gamma, NamedSharding(mesh, P()))
        bd = jax.device_put(beta, NamedSharding(mesh, P()))
        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2),
                                       has_aux=True))
        (l, (m, v)), grads = f(xd, gd, bd)
        results[n] = (float(l), np.asarray(m), np.asarray(v),
                      [np.asarray(g) for g in grads])
    l1, m1, v1, g1 = results[1]
    l8, m8, v8, g8 = results[8]
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    np.testing.assert_allclose(m1, m8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(v1, v8, rtol=1e-4, atol=1e-6)
    for name, a, b in zip(("dx", "dgamma", "dbeta"), g1, g8):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                   err_msg=name)
