import jax
import jax.numpy as jnp
import numpy as np

from rgb_proprioceptive_pose_estimator_tpu.losses.pose import pose_loss, pose_metrics
from rgb_proprioceptive_pose_estimator_tpu.ops import pose_math as pm


def _mk(n=8, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return (jax.random.normal(k1, (n, 3)), pm.random_quaternion(k2, (n,)),
            jax.random.normal(k3, (n, 3)), pm.random_quaternion(k4, (n,)))


def test_zero_at_perfect_prediction():
    pos, quat, _, _ = _mk()
    loss, aux = pose_loss(pos, quat, pos, quat)
    assert float(loss) < 1e-5
    m = pose_metrics(pos, quat, pos, quat)
    assert float(m["pos_mae_cm"]) < 1e-3
    assert float(m["rot_mae_deg"]) < 0.2  # clamped arccos resolution


def test_antipodal_sign_invariance():
    pos, quat, tpos, tquat = _mk()
    l1, _ = pose_loss(pos, quat, tpos, tquat)
    l2, _ = pose_loss(pos, -quat, tpos, tquat)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_weights_and_components():
    pos, quat, tpos, tquat = _mk()
    loss, aux = pose_loss(pos, quat, tpos, tquat, pos_weight=2.0,
                          rot_weight=0.5)
    np.testing.assert_allclose(
        float(loss), 2.0 * float(aux["pos_loss"]) + 0.5 * float(aux["rot_loss"]),
        rtol=1e-6)


def test_metrics_units():
    """1 cm position error and a 10-degree rotation -> exactly those MAEs."""
    pos = jnp.zeros((4, 3))
    tpos = pos.at[:, 0].set(0.01)  # 1 cm in meters
    ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1))
    q10 = pm.quat_from_axis_angle(
        jnp.tile(jnp.array([0.0, 0, 1.0]), (4, 1)),
        jnp.full((4,), np.deg2rad(10)))
    m = pose_metrics(pos, q10, tpos, ident)
    np.testing.assert_allclose(float(m["pos_mae_cm"]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(m["rot_mae_deg"]), 10.0, rtol=1e-4)


def test_loss_grad_finite_bf16_inputs():
    pos, quat, tpos, tquat = _mk()

    def f(p, q):
        l, _ = pose_loss(p.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
                         tpos, tquat)
        return l

    gp, gq = jax.grad(f, argnums=(0, 1))(pos, quat)
    assert np.all(np.isfinite(np.asarray(gp, dtype=np.float32)))
    assert np.all(np.isfinite(np.asarray(gq, dtype=np.float32)))


def test_huber_pos_loss_torch_parity():
    """pos_loss='huber' matches torch nn.HuberLoss(delta) elementwise-mean
    semantics, reduces to 0.5*MSE for tiny residuals, and its gradient
    saturates at delta (the outlier-capping property it exists for)."""
    import torch

    pos, quat, tpos, tquat = _mk(n=16, seed=3)
    delta = 0.7

    _, aux = pose_loss(pos, quat, tpos, tquat, pos_loss="huber",
                       huber_delta=delta)
    ref = torch.nn.HuberLoss(reduction="mean", delta=delta)(
        torch.from_numpy(np.array(pos)),
        torch.from_numpy(np.array(tpos)))
    np.testing.assert_allclose(float(aux["pos_loss"]), float(ref), rtol=1e-6)

    # quadratic zone: huber == 0.5 * mse when every |e| <= delta
    small = tpos + 0.01 * (pos - tpos) / jnp.abs(pos - tpos).max()
    _, h = pose_loss(small, quat, tpos, tquat, pos_loss="huber",
                     huber_delta=delta)
    _, m = pose_loss(small, quat, tpos, tquat, pos_loss="mse")
    np.testing.assert_allclose(float(h["pos_loss"]),
                               0.5 * float(m["pos_loss"]), rtol=1e-5)

    # linear zone: d(loss)/d(pred) is bounded by delta / n_elements
    far = tpos + 100.0
    g = jax.grad(lambda p: pose_loss(p, quat, tpos, tquat, rot_weight=0.0,
                                     pos_loss="huber",
                                     huber_delta=delta)[0])(far)
    np.testing.assert_allclose(np.asarray(g), delta / far.size, rtol=1e-5)
