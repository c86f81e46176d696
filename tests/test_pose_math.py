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


def test_mirror_pose_involution_and_rotation_conjugation():
    """mirror_pose is its own inverse, preserves unit norm, and its
    quaternion equals the reflection-conjugated rotation:
    R(q') v == M R(q) (M v) for the reflection M across the mirror plane."""
    key = jax.random.PRNGKey(7)
    q = pm.random_quaternion(key, (32,))
    pos = jax.random.normal(jax.random.PRNGKey(8), (32, 3))
    v = jax.random.normal(jax.random.PRNGKey(9), (32, 3))

    for axis in (0, 1, 2):
        center = 0.3
        mpos, mquat = pm.mirror_pose(pos, q, axis=axis, center=center)
        # involution
        p2, q2 = pm.mirror_pose(mpos, mquat, axis=axis, center=center)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(pos), atol=1e-6)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-6)
        # unit norm preserved
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(mquat), axis=-1), 1.0, atol=1e-5)
        # position reflects about the plane
        np.testing.assert_allclose(
            np.asarray(mpos[:, axis]), 2 * center - np.asarray(pos[:, axis]),
            atol=1e-6)
        # rotation conjugation: R(q') v == M R(q) (M v)
        m = np.ones(3, np.float32)
        m[axis] = -1.0
        lhs = np.asarray(pm.quat_rotate(mquat, v))
        rhs = m * np.asarray(pm.quat_rotate(q, jnp.asarray(m) * v))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_mirror_pose_angle_preserved_for_symmetric_pairs():
    """Mirroring both prediction and target preserves the geodesic angle
    (the metric is invariant under a common frame reflection)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    qa = pm.random_quaternion(k1, (16,))
    qb = pm.random_quaternion(k2, (16,))
    ang = pm.quat_geodesic_angle(qa, qb, grad_safe=False)
    _, ma = pm.mirror_pose(jnp.zeros((16, 3)), qa, axis=1)
    _, mb = pm.mirror_pose(jnp.zeros((16, 3)), qb, axis=1)
    ang_m = pm.quat_geodesic_angle(ma, mb, grad_safe=False)
    np.testing.assert_allclose(np.asarray(ang), np.asarray(ang_m), atol=1e-5)


def test_quat_matrix_round_trip():
    """quat -> matrix -> quat recovers the rotation (up to antipodal sign)
    for a large random sample plus the four argmax branches' worst cases
    (identity and the three 180-degree axis rotations)."""
    q = pm.random_quaternion(jax.random.PRNGKey(11), (256,))
    edge = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0],
                      [0, 0, 1.0, 0], [0, 0, 0, 1.0]])
    q = jnp.concatenate([q, edge])
    m = pm.quat_to_matrix(q)
    # valid rotation matrices: orthonormal, det +1
    eye = jnp.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(
        np.asarray(eye), np.tile(np.eye(3), (q.shape[0], 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(m)), 1.0, atol=1e-5)
    q2 = pm.matrix_to_quat(m)
    np.testing.assert_allclose(
        np.asarray(pm.quat_abs_dot(q, q2)), 1.0, atol=1e-5)


def test_matrix_to_quat_rotation_equivalent():
    """The recovered quaternion rotates vectors exactly like the matrix."""
    q = pm.random_quaternion(jax.random.PRNGKey(12), (64,))
    v = jax.random.normal(jax.random.PRNGKey(13), (64, 3))
    m = pm.quat_to_matrix(q)
    q2 = pm.matrix_to_quat(m)
    lhs = np.einsum("bij,bj->bi", np.asarray(m), np.asarray(v))
    np.testing.assert_allclose(
        np.asarray(pm.quat_rotate(q2, v)), lhs, atol=1e-5)


def test_rot6d_round_trip_and_validity():
    """matrix -> rot6d -> matrix is the identity on SO(3); arbitrary
    (non-orthonormal) 6D inputs still produce valid rotations."""
    q = pm.random_quaternion(jax.random.PRNGKey(14), (128,))
    m = pm.quat_to_matrix(q)
    np.testing.assert_allclose(
        np.asarray(pm.rot6d_to_matrix(pm.matrix_to_rot6d(m))),
        np.asarray(m), atol=1e-5)
    # raw network-style outputs: any 6-vector maps onto SO(3)
    x = jax.random.normal(jax.random.PRNGKey(15), (128, 6)) * 3.0
    r = pm.rot6d_to_matrix(x)
    eye = jnp.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(
        np.asarray(eye), np.tile(np.eye(3), (128, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)


def test_rot6d_to_quat_gradient_finite_everywhere():
    """The head path rot6d -> matrix -> quat must be gradient-safe at every
    argmax branch of matrix_to_quat (the double-where construction): probe
    random 6D inputs plus encodings of the identity and 180-degree
    rotations, where the non-selected candidates' denominators vanish."""
    edge_q = jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0],
                        [0, 0, 1.0, 0], [0, 0, 0, 1.0]])
    edge6 = pm.matrix_to_rot6d(pm.quat_to_matrix(edge_q))
    x = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(16), (32, 6)), edge6])
    target = pm.random_quaternion(jax.random.PRNGKey(17), (x.shape[0],))

    def f(x6):
        return jnp.sum(pm.quat_chordal_distance(pm.rot6d_to_quat(x6), target))

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_rot6d_gradient_descent_reaches_target():
    """Direct optimization sanity: gradient steps on the 6D parameters
    drive the chordal loss to a target rotation (the continuity property
    the representation exists for)."""
    target = pm.random_quaternion(jax.random.PRNGKey(18), (8,))
    x = jax.random.normal(jax.random.PRNGKey(19), (8, 6)) * 0.1

    loss = jax.jit(jax.value_and_grad(
        lambda p: jnp.mean(
            pm.quat_chordal_distance(pm.rot6d_to_quat(p), target))))
    for _ in range(300):
        val, g = loss(x)
        x = x - 0.5 * g
    ang = pm.quat_geodesic_angle(pm.rot6d_to_quat(x), target,
                                 grad_safe=False)
    assert float(jnp.max(ang)) < 0.05, float(jnp.max(ang))


def test_quat_normalize_gradient_finite_at_zero():
    """The soft-norm quat_normalize must have a finite gradient at q == 0
    (the max(|q|, eps) form leaked NaN through the untaken branch; hit in
    training when model.camera_dropout zeroes a sample's every feature and
    the raw head output is exactly 0)."""
    g = jax.grad(lambda q: jnp.sum(pm.quat_normalize(q)))(jnp.zeros(4))
    assert bool(jnp.isfinite(g).all())
    # and values away from zero are unchanged vs the plain norm
    q = jnp.asarray([0.3, -1.2, 0.5, 2.0])
    np.testing.assert_allclose(np.asarray(pm.quat_normalize(q)),
                               np.asarray(q / jnp.linalg.norm(q)),
                               rtol=1e-7, atol=0)


def test_rot6d_gradient_finite_at_zero():
    """Same NaN-gradient-at-zero class as quat_normalize, through the
    FULL rot6d head path (rot6d -> Gram-Schmidt -> matrix -> quat): the
    raw head output is exactly 0 when camera_dropout zeroes a sample's
    every feature, and rot_rep='rot6d' + camera_dropout is a permitted
    config. Also degenerate-but-nonzero inputs (a1 parallel to a2, where
    the Gram-Schmidt residual vanishes)."""
    for x0 in (jnp.zeros(6),
               jnp.asarray([1.0, 0.0, 0.0, 2.0, 0.0, 0.0]),   # a1 ∥ a2
               jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])):  # a1 == 0
        g = jax.grad(lambda x: jnp.sum(pm.rot6d_to_quat(x)))(x0)
        assert bool(jnp.isfinite(g).all()), (x0, g)
    # and a healthy input still round-trips exactly
    q = pm.quat_normalize(jnp.asarray([0.4, -0.3, 0.8, 0.2]))
    x = pm.matrix_to_rot6d(pm.quat_to_matrix(q))
    np.testing.assert_allclose(np.asarray(pm.quat_abs_dot(
        pm.rot6d_to_quat(x), q)), 1.0, atol=1e-6)
