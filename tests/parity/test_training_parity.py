"""Training-dynamics parity: N optimizer steps of the jax stack vs a torch
twin from identical init, data, loss, and Adam hyperparameters.

This is the strongest behavioral-parity evidence available with the
reference mount empty (SURVEY.md section 0): if loss trajectories and
final parameters agree step for step, the framework's loss semantics,
gradients, and optimizer all match torch's training dynamics -- the
foundation of the 'within 1% pose MAE' target."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from rgb_proprioceptive_pose_estimator_tpu.losses.pose import pose_loss  # noqa: E402

torch.manual_seed(0)

D, H, N, STEPS, LR = 16, 32, 64, 15, 1e-3


class TorchTwin(tnn.Module):
    def __init__(self):
        super().__init__()
        self.l1 = tnn.Linear(D, H)
        self.l2 = tnn.Linear(H, 7)

    def forward(self, s):
        out = self.l2(torch.relu(self.l1(s)))
        pos, quat = out[:, :3], out[:, 3:]
        quat = quat / quat.norm(dim=-1, keepdim=True).clamp_min(1e-8)
        return pos, quat


def _torch_loss(pos, quat, tpos, tquat):
    pos_l = torch.mean((pos - tpos) ** 2)
    dot = (quat * tquat).sum(-1)
    rot_l = torch.mean(1.0 - dot ** 2)
    return pos_l + rot_l


def test_adam_training_trajectory_matches_torch():
    rs = np.random.RandomState(1)
    s = rs.randn(N, D).astype(np.float32)
    tpos = rs.randn(N, 3).astype(np.float32) * 0.3
    tq = rs.randn(N, 4).astype(np.float32)
    tq /= np.linalg.norm(tq, axis=-1, keepdims=True)

    tm = TorchTwin()
    opt = torch.optim.Adam(tm.parameters(), lr=LR, eps=1e-8)

    # identical init for the jax side
    params = {
        "l1": {"kernel": jnp.asarray(tm.l1.weight.detach().numpy().T.copy()),
               "bias": jnp.asarray(tm.l1.bias.detach().numpy().copy())},
        "l2": {"kernel": jnp.asarray(tm.l2.weight.detach().numpy().T.copy()),
               "bias": jnp.asarray(tm.l2.bias.detach().numpy().copy())},
    }
    tx = optax.adam(LR, eps=1e-8, eps_root=0.0)
    opt_state = tx.init(params)

    def fwd(p, s):
        h = jnp.maximum(s @ p["l1"]["kernel"] + p["l1"]["bias"], 0.0)
        out = h @ p["l2"]["kernel"] + p["l2"]["bias"]
        return out[:, :3], out[:, 3:]

    def loss_fn(p):
        pos, quat = fwd(p, jnp.asarray(s))
        l, _ = pose_loss(pos, quat, jnp.asarray(tpos), jnp.asarray(tq))
        return l

    jax_losses, torch_losses = [], []
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(STEPS):
        # torch step
        opt.zero_grad()
        pos_t, quat_t = tm(torch.from_numpy(s))
        lt = _torch_loss(pos_t, quat_t, torch.from_numpy(tpos),
                         torch.from_numpy(tq))
        lt.backward()
        opt.step()
        torch_losses.append(float(lt))

        # jax step
        lj, grads = grad_fn(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        jax_losses.append(float(lj))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4,
                               atol=1e-6)
    # final params agree too
    np.testing.assert_allclose(
        np.asarray(params["l1"]["kernel"]),
        tm.l1.weight.detach().numpy().T, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["l2"]["bias"]),
        tm.l2.bias.detach().numpy(), rtol=1e-3, atol=1e-5)
    # and training actually progressed
    assert jax_losses[-1] < jax_losses[0] * 0.9


def test_multistep_lr_trajectory_matches_torch():
    """train.lr_schedule='multistep' vs torch MultiStepLR: SGD+momentum
    trajectories with lr decays at steps 5 and 10 agree step for step
    (inclusive-milestone semantics match, including through the momentum
    buffer)."""
    from rgb_proprioceptive_pose_estimator_tpu.config import TrainConfig
    from rgb_proprioceptive_pose_estimator_tpu.engine.train_step import (
        make_optimizer,
    )

    rs = np.random.RandomState(2)
    s = rs.randn(N, D).astype(np.float32)
    tpos = rs.randn(N, 3).astype(np.float32) * 0.3
    tq = rs.randn(N, 4).astype(np.float32)
    tq /= np.linalg.norm(tq, axis=-1, keepdims=True)

    torch.manual_seed(3)
    tm = TorchTwin()
    opt = torch.optim.SGD(tm.parameters(), lr=1e-2, momentum=0.9)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[5, 10], gamma=0.1)

    params = {
        "l1": {"kernel": jnp.asarray(tm.l1.weight.detach().numpy().T.copy()),
               "bias": jnp.asarray(tm.l1.bias.detach().numpy().copy())},
        "l2": {"kernel": jnp.asarray(tm.l2.weight.detach().numpy().T.copy()),
               "bias": jnp.asarray(tm.l2.bias.detach().numpy().copy())},
    }
    tx = make_optimizer(TrainConfig(
        optimizer="sgd", lr=1e-2, lr_schedule="multistep",
        lr_decay_steps=(5, 10), lr_decay_rate=0.1))
    opt_state = tx.init(params)

    def fwd(p, s):
        h = jnp.maximum(s @ p["l1"]["kernel"] + p["l1"]["bias"], 0.0)
        out = h @ p["l2"]["kernel"] + p["l2"]["bias"]
        return out[:, :3], out[:, 3:]

    def loss_fn(p):
        pos, quat = fwd(p, jnp.asarray(s))
        l, _ = pose_loss(pos, quat, jnp.asarray(tpos), jnp.asarray(tq))
        return l

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    jax_losses, torch_losses = [], []
    for _ in range(15):
        opt.zero_grad()
        pos_t, quat_t = tm(torch.from_numpy(s))
        lt = _torch_loss(pos_t, quat_t, torch.from_numpy(tpos),
                         torch.from_numpy(tq))
        lt.backward()
        opt.step()
        sched.step()
        torch_losses.append(float(lt))

        lj, grads = grad_fn(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        jax_losses.append(float(lj))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["l1"]["kernel"]),
        tm.l1.weight.detach().numpy().T, rtol=1e-3, atol=1e-5)
