"""Pose-loss math vs closed-form cases (SURVEY.md section 5.2 unit tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgb_proprioceptive_pose_estimator_tpu.ops import pose_math as pm


def test_quat_normalize_unit_and_zero_safe():
    q = jnp.array([[2.0, 0, 0, 0], [0, 0, 0, 0]])
    out = pm.quat_normalize(q)
    np.testing.assert_allclose(out[0], [1, 0, 0, 0], atol=1e-6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_quat_multiply_identity_and_inverse():
    key = jax.random.PRNGKey(0)
    q = pm.random_quaternion(key, (16,))
    ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (16, 1))
    np.testing.assert_allclose(pm.quat_multiply(q, ident), q, atol=1e-6)
    qq = pm.quat_multiply(q, pm.quat_conjugate(q))
    np.testing.assert_allclose(qq, ident, atol=1e-5)


def test_quat_rotate_matches_axis_angle():
    # 90 deg about z maps x-axis to y-axis
    q = pm.quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.array(np.pi / 2))
    v = jnp.array([1.0, 0, 0])
    np.testing.assert_allclose(pm.quat_rotate(q, v), [0, 1, 0], atol=1e-6)


def test_geodesic_closed_form():
    ident = jnp.array([1.0, 0, 0, 0])
    # identical quats -> ~0
    assert float(pm.quat_geodesic_angle(ident, ident)) < 1e-2
    # antipodal pair (same rotation) -> ~0 (sign invariance)
    assert float(pm.quat_geodesic_angle(ident, -ident)) < 1e-2
    # 180-degree rotation about z
    q180 = jnp.array([0.0, 0, 0, 1])
    np.testing.assert_allclose(
        float(pm.quat_geodesic_angle(ident, q180)), np.pi, atol=1e-4)
    # 90-degree rotation
    q90 = pm.quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.array(np.pi / 2))
    np.testing.assert_allclose(
        float(pm.quat_geodesic_angle(ident, q90)), np.pi / 2, atol=1e-4)


def test_chordal_monotone_in_angle():
    ident = jnp.array([1.0, 0, 0, 0])
    angles = jnp.linspace(0.0, np.pi, 16)
    qs = pm.quat_from_axis_angle(
        jnp.tile(jnp.array([0.0, 0, 1]), (16, 1)), angles)
    d = pm.quat_chordal_distance(jnp.tile(ident, (16, 1)), qs)
    assert np.all(np.diff(np.asarray(d)) >= -1e-7)
    np.testing.assert_allclose(float(d[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(d[-1]), 1.0, atol=1e-6)


def test_geodesic_gradient_finite_at_boundary():
    """arccos gradient blow-up at |dot|=1 must be clamped
    (SURVEY.md section 8 hard-part 3)."""
    ident = jnp.array([1.0, 0, 0, 0])

    def f(q):
        return pm.quat_geodesic_angle(pm.quat_normalize(q), ident)

    for q in [jnp.array([1.0, 0, 0, 0]), jnp.array([-1.0, 0, 0, 0]),
              jnp.array([0.0, 0, 0, 1.0])]:
        g = jax.grad(f)(q)
        assert np.all(np.isfinite(np.asarray(g))), q


def test_chordal_gradient_finite_everywhere():
    key = jax.random.PRNGKey(1)
    qs = pm.random_quaternion(key, (64,))

    def f(q):
        return jnp.sum(pm.quat_chordal_distance(q, qs))

    g = jax.grad(f)(qs)
    assert np.all(np.isfinite(np.asarray(g)))


def test_random_quaternion_uniform_unit():
    q = pm.random_quaternion(jax.random.PRNGKey(2), (1000,))
    norms = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # mean should be near zero for a uniform distribution on S^3
    assert np.abs(np.asarray(q).mean(0)).max() < 0.1
