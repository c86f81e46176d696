"""Quaternion / pose math, pure jax.numpy.

Quaternions are unit 4-vectors. All distance functions used for losses and
metrics depend only on the inner product <q, q'> and are therefore invariant
to the (w,x,y,z) vs (x,y,z,w) storage convention as long as predictions and
targets are consistent, and to the antipodal sign ambiguity q ~ -q
(SURVEY.md section 8 hard-part 3). Capability grounding: C6 (BASELINE.json:2,5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Keep a margin from |dot| == 1 so arccos' gradient (which blows up like
# 1/sqrt(1-x^2)) stays finite (SURVEY.md section 8 hard-part 3).
_ACOS_CLIP = 1.0 - 1e-6


def _soft_normalize(v: jax.Array, eps: float) -> jax.Array:
    """v / sqrt(|v|^2 + eps^2): unit-normalize, value- AND gradient-safe
    at v == 0. The usual v / max(|v|, eps) has a fine VALUE at 0 but a NaN
    gradient there (the |v| branch differentiates to v/|v| = 0/0, and the
    chain rule leaks the NaN through max's untaken branch -- hit for real
    when model.camera_dropout zeroes every feature of a sample and the raw
    head output is exactly 0). The soft form's gradient at 0 is a finite
    1/eps. Accuracy note: eps^2 sits below f32 resolution of |v|^2 for any
    non-degenerate |v| (>= ~1e-4 at eps=1e-8), so outputs there agree with
    the exact norm to f32 precision; only as |v| approaches eps does the
    output smoothly shrink below unit length (consumers that care
    renormalize -- loss/metric paths here all do)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / jnp.sqrt(sq + eps * eps)


def quat_normalize(q: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Normalize to a unit quaternion; gradient-safe at q == 0 (soft norm,
    see _soft_normalize -- the raw pose head can emit exactly 0 when
    model.camera_dropout zeroes a sample's every input feature)."""
    return _soft_normalize(q, eps)


def quat_conjugate(q: jax.Array) -> jax.Array:
    """(w, x, y, z) -> (w, -x, -y, -z)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, (w, x, y, z) convention, broadcasting over batch."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate 3-vectors v by unit quaternions q ((w,x,y,z) convention)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit quaternion (w,x,y,z) for rotation of `angle` radians about `axis`."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-8)
    half = angle[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def random_quaternion(key: jax.Array, shape=()) -> jax.Array:
    """Uniform random unit quaternions (Shoemake's subgroup algorithm)."""
    u1, u2, u3 = jax.random.uniform(key, (3,) + tuple(shape))
    a = jnp.sqrt(1.0 - u1)
    b = jnp.sqrt(u1)
    return jnp.stack(
        [
            a * jnp.sin(2 * jnp.pi * u2),
            a * jnp.cos(2 * jnp.pi * u2),
            b * jnp.sin(2 * jnp.pi * u3),
            b * jnp.cos(2 * jnp.pi * u3),
        ],
        axis=-1,
    )


def mirror_pose(pos: jax.Array, quat: jax.Array, axis: int = 0,
                center: float = 0.0):
    """Reflect a pose across the plane {x_axis = center} (normal along
    `axis`): the label transform matching a horizontal image flip when that
    world/target-frame axis maps (up to sign) onto the image x direction
    (VERDICT r1 missing-2).

    Position: component `axis` reflects about `center`. Orientation: the
    reflected rotation M.R has det -1; composing with the same body-frame
    reflection restores a proper rotation R' = M.R.M, whose quaternion
    keeps (w, v_axis) and negates the other two vector components. Exact
    for objects mirror-symmetric about that body plane; for asymmetric
    objects it is the standard closest proper rotation. Works for numpy or
    jax inputs; (w,x,y,z) and (x,y,z,w) conventions both supported via
    `axis` indexing on the vector part assuming (w,x,y,z) -- pass targets
    in the same convention used for the loss (convention-consistency is
    all the loss needs, see module docstring).
    """
    pos_sign = jnp.ones((3,), dtype=pos.dtype).at[axis].set(-1.0)
    pos_off = jnp.zeros((3,), dtype=pos.dtype).at[axis].set(2.0 * center)
    new_pos = pos * pos_sign + pos_off
    quat_sign = -jnp.ones((4,), dtype=quat.dtype)
    quat_sign = quat_sign.at[0].set(1.0).at[1 + axis].set(1.0)
    return new_pos, quat * quat_sign


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (w,x,y,z) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (w,x,y,z).

    Branchless (jit-safe) four-candidate form: the four values
    t_i in {4w^2, 4x^2, 4y^2, 4z^2} sum to 4, so max(t) >= 1; selecting the
    candidate built from the largest t keeps every sqrt and division
    well-conditioned. Gradient safety uses the double-where trick: the three
    NON-selected candidates are computed with their t replaced by 1, so no
    lane ever divides by ~0 (a plain where would still propagate NaN
    cotangents from the dead branches).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    t = jnp.stack(
        [
            1.0 + m00 + m11 + m22,   # 4w^2
            1.0 + m00 - m11 - m22,   # 4x^2
            1.0 - m00 + m11 - m22,   # 4y^2
            1.0 - m00 - m11 + m22,   # 4z^2
        ],
        axis=-1,
    )
    sel = jnp.argmax(t, axis=-1)

    def safe(i):
        ti = jnp.where(sel == i, t[..., i], 1.0)
        s = jnp.sqrt(jnp.maximum(ti, 1e-12))       # = 2*|comp_i|
        inv = 0.5 / s
        return s, inv

    s0, i0 = safe(0)
    cand0 = jnp.stack([0.5 * s0, (m21 - m12) * i0,
                       (m02 - m20) * i0, (m10 - m01) * i0], axis=-1)
    s1, i1 = safe(1)
    cand1 = jnp.stack([(m21 - m12) * i1, 0.5 * s1,
                       (m01 + m10) * i1, (m02 + m20) * i1], axis=-1)
    s2, i2 = safe(2)
    cand2 = jnp.stack([(m02 - m20) * i2, (m01 + m10) * i2,
                       0.5 * s2, (m12 + m21) * i2], axis=-1)
    s3, i3 = safe(3)
    cand3 = jnp.stack([(m10 - m01) * i3, (m02 + m20) * i3,
                       (m12 + m21) * i3, 0.5 * s3], axis=-1)
    cands = jnp.stack([cand0, cand1, cand2, cand3], axis=-2)  # (..., 4, 4)
    onehot = jax.nn.one_hot(sel, 4, dtype=m.dtype)[..., None]
    q = jnp.sum(cands * onehot, axis=-2)
    return quat_normalize(q)


def rot6d_to_matrix(x: jax.Array) -> jax.Array:
    """Continuous 6D rotation representation (Zhou et al., CVPR 2019) ->
    rotation matrix. `x` (..., 6) holds the first two COLUMNS of R;
    Gram-Schmidt orthonormalizes them and the third column is the cross
    product. Smooth and surjective onto SO(3) -- unlike quaternions there
    is no antipodal double cover, which is why it trains better as a raw
    network output (model.rot_rep="rot6d").

    Both normalizations use the soft norm (_soft_normalize): the raw head
    output can be exactly 0 under model.camera_dropout (config.py), and
    the max-based norm's gradient NaNs there -- same bug class as
    quat_normalize, fixed at the same depth."""
    a1, a2 = x[..., :3], x[..., 3:6]
    b1 = _soft_normalize(a1, 1e-8)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _soft_normalize(a2, 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)   # columns


def matrix_to_rot6d(m: jax.Array) -> jax.Array:
    """Rotation matrix -> its canonical 6D encoding (first two columns)."""
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


def rot6d_to_quat(x: jax.Array) -> jax.Array:
    """6D representation -> unit quaternion (w,x,y,z); the model-head path
    for model.rot_rep="rot6d" (the public API stays quaternion-typed)."""
    return matrix_to_quat(rot6d_to_matrix(x))


def quat_abs_dot(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """|<q1, q2>| -- antipodal-invariant alignment in [0, 1]."""
    return jnp.abs(jnp.sum(q1 * q2, axis=-1))


def quat_geodesic_angle(q1: jax.Array, q2: jax.Array,
                        grad_safe: bool = True) -> jax.Array:
    """Geodesic rotation angle in radians: 2*arccos(|<q1,q2>|) in [0, pi].

    Inputs must be unit quaternions. With grad_safe (the default, for use
    in losses) the dot is clipped away from 1 so arccos' gradient stays
    finite (SURVEY.md section 8 hard-part 3) -- this floors the angle at
    ~2.8e-3 rad (0.16 deg). Metrics, which take no gradient, should pass
    grad_safe=False to report true zeros.
    """
    hi = _ACOS_CLIP if grad_safe else 1.0
    d = jnp.clip(quat_abs_dot(q1, q2), 0.0, hi)
    return 2.0 * jnp.arccos(d)


def quat_chordal_distance(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Smooth antipodal-safe surrogate 1 - <q1,q2>^2 in [0, 1].

    Equals (1 - cos(theta)^2)/... precisely: 1 - dot^2 = sin^2(theta/2)* (1+cos...)
    -- monotone in geodesic angle on [0, pi], gradient-friendly everywhere.
    This is the training-loss form recommended in SURVEY.md section 8.
    """
    d = jnp.sum(q1 * q2, axis=-1)
    return 1.0 - jnp.square(d)
