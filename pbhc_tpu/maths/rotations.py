"""Quaternion / rotation math for TPU (pure jax.numpy, jit/vmap-safe).

Conventions match the reference framework's `isaac_utils.rotations`
(reference: humanoidverse/isaac_utils/isaac_utils/rotations.py): quaternions are
**XYZW** unless a function name says otherwise; all functions broadcast over
leading batch dimensions and never use data-dependent Python control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# basics
# ---------------------------------------------------------------------------

def normalize(v: jax.Array, eps: float = 1e-9) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def quat_unit(q: jax.Array) -> jax.Array:
    return normalize(q)


def quat_identity(shape=()) -> jax.Array:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_conjugate(q: jax.Array) -> jax.Array:
    """XYZW conjugate (= inverse for unit quats)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


quat_inverse = quat_conjugate


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, XYZW (reference rotations.py:414)."""
    x1, y1, z1, w1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    x2, y2, z2, w2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return jnp.stack([x, y, z, w], axis=-1)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q (XYZW)."""
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conjugate(q), v)


# alias used throughout the reference code
my_quat_rotate = quat_rotate
quat_apply = quat_rotate


def quat_pos(q: jax.Array) -> jax.Array:
    """Flip sign so that w >= 0."""
    return jnp.where(q[..., 3:4] < 0, -q, q)


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """XYZW quat from (angle, unit axis)."""
    half = angle * 0.5
    xyz = normalize(axis) * jnp.sin(half)[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([xyz, w], axis=-1)


def quat_to_angle_axis(q: jax.Array, eps: float = 1e-5):
    """XYZW quat -> (angle in [-pi,pi], unit axis)."""
    q = quat_pos(q)
    sin_half = jnp.linalg.norm(q[..., :3], axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, q[..., 3])
    safe = sin_half > eps
    axis = jnp.where(
        safe[..., None],
        q[..., :3] / jnp.maximum(sin_half, eps)[..., None],
        jnp.zeros_like(q[..., :3]).at[..., 2].set(1.0),
    )
    angle = jnp.where(safe, angle, 0.0)
    return angle, axis


def quat_to_exp_map(q: jax.Array) -> jax.Array:
    angle, axis = quat_to_angle_axis(q)
    return angle[..., None] * axis


def exp_map_to_quat(e: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Axis-angle vector (angle*axis) -> XYZW quat. Taylor-safe near zero."""
    angle = jnp.linalg.norm(e, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-4
    # sin(a/2)/a with series fallback
    k = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.maximum(angle, eps))
    xyz = e * k
    w = jnp.cos(half)
    return jnp.concatenate([xyz, w], axis=-1)


axis_angle_to_quat = exp_map_to_quat


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """XYZW quat -> 3x3 rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> XYZW quat (branch-free, numerically stable)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-18))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], axis=-1) / (4.0 * qw0[..., None])

    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1) / (4.0 * qx1[..., None])

    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], axis=-1) / (4.0 * qy2[..., None])

    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], axis=-1) / (4.0 * qz3[..., None])

    # pick the numerically best branch
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32).repeat(4, axis=-1), axis=-2)[..., 0, :]
    return quat_unit(quat_pos(q))


def wxyz_to_xyzw(q: jax.Array) -> jax.Array:
    return q[..., (1, 2, 3, 0)]


def xyzw_to_wxyz(q: jax.Array) -> jax.Array:
    return q[..., (3, 0, 1, 2)]


# ---------------------------------------------------------------------------
# euler / heading
# ---------------------------------------------------------------------------

def get_euler_xyz(q: jax.Array) -> jax.Array:
    """XYZW quat -> stacked (roll, pitch, yaw) (reference rotations.py:368)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(jnp.abs(sinp) >= 1, jnp.sign(sinp) * jnp.pi / 2.0, jnp.arcsin(jnp.clip(sinp, -1, 1)))
    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_from_euler_xyz(rpy: jax.Array) -> jax.Array:
    """(roll, pitch, yaw) -> XYZW quat, extrinsic xyz (matches Isaac)."""
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    qw = cr * cp * cy + sr * sp * sy
    qx = sr * cp * cy - cr * sp * sy
    qy = cr * sp * cy + sr * cp * sy
    qz = cr * cp * sy - sr * sp * cy
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def calc_heading(q: jax.Array) -> jax.Array:
    """Heading angle = yaw of the rotated x-axis (reference rotations.py:257)."""
    ref = jnp.zeros_like(q[..., :3]).at[..., 0].set(1.0)
    rot = quat_rotate(q, ref)
    return jnp.arctan2(rot[..., 1], rot[..., 0])


def calc_heading_quat(q: jax.Array) -> jax.Array:
    h = calc_heading(q)
    axis = jnp.zeros_like(q[..., :3]).at[..., 2].set(1.0)
    return quat_from_angle_axis(h, axis)


def calc_heading_quat_inv(q: jax.Array) -> jax.Array:
    h = calc_heading(q)
    axis = jnp.zeros_like(q[..., :3]).at[..., 2].set(1.0)
    return quat_from_angle_axis(-h, axis)


def calc_yaw_heading_quat_inv(yaw: jax.Array) -> jax.Array:
    """yaw [...,1] -> inverse yaw quat (reference rotations.py:309)."""
    half = yaw[..., 0] * 0.5
    z = jnp.zeros_like(half)
    return jnp.stack([z, z, -jnp.sin(half), jnp.cos(half)], axis=-1)


def wrap_to_pi(a: jax.Array) -> jax.Array:
    a = jnp.mod(a, 2 * jnp.pi)
    return a - 2 * jnp.pi * (a > jnp.pi)


# ---------------------------------------------------------------------------
# interpolation / integration
# ---------------------------------------------------------------------------

def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical lerp; t broadcasts with trailing dim 1 (reference rotations.py:209)."""
    cos_half = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where((cos_half < 0)[..., None], -q1, q1)
    cos_half = jnp.abs(cos_half)[..., None]
    half = jnp.arccos(jnp.clip(cos_half, -1.0, 1.0))
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))
    safe_sin = jnp.maximum(sin_half, 1e-6)
    ratio_a = jnp.sin((1 - t) * half) / safe_sin
    ratio_b = jnp.sin(t * half) / safe_sin
    out = ratio_a * q0 + ratio_b * q1
    out = jnp.where(sin_half < 0.001, (1 - t) * q0 + t * q1, out)
    out = jnp.where(cos_half >= 1, q0, out)
    return out


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate world-frame angular velocity: q' = exp(omega*dt/2) * q."""
    dq = exp_map_to_quat(omega * dt)
    return quat_unit(quat_mul(dq, q))


def small_random_quat(key: jax.Array, shape, max_angle) -> jax.Array:
    """Random small rotation (reference motion_tracking.py:511-522)."""
    k1, k2 = jax.random.split(key)
    axis = normalize(jax.random.normal(k1, shape + (3,)))
    ang = max_angle * jax.random.uniform(k2, shape + (1,))
    return jnp.concatenate([jnp.sin(ang / 2) * axis, jnp.cos(ang / 2)], axis=-1)


def skew(v: jax.Array) -> jax.Array:
    """Cross-product matrix: skew(v) @ u == cross(v, u)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))
