"""Rotation math correctness vs scipy ground truth."""
import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sRot

from pbhc_tpu.maths import rotations as rot


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_vs_scipy():
    a, b = rand_quats(64, 1), rand_quats(64, 2)
    got = np.asarray(rot.quat_mul(jnp.array(a), jnp.array(b)))
    want = (sRot.from_quat(a) * sRot.from_quat(b)).as_quat()
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_quat_rotate_vs_scipy():
    q = rand_quats(64, 3)
    v = np.random.default_rng(4).normal(size=(64, 3))
    got = np.asarray(rot.quat_rotate(jnp.array(q), jnp.array(v)))
    np.testing.assert_allclose(got, sRot.from_quat(q).apply(v), atol=1e-5)
    got_inv = np.asarray(rot.quat_rotate_inverse(jnp.array(q), jnp.array(v)))
    np.testing.assert_allclose(got_inv, sRot.from_quat(q).apply(v, inverse=True), atol=1e-5)


def test_matrix_roundtrip():
    q = rand_quats(128, 5)
    m = np.asarray(rot.quat_to_matrix(jnp.array(q)))
    np.testing.assert_allclose(m, sRot.from_quat(q).as_matrix(), atol=1e-5)
    q2 = np.asarray(rot.matrix_to_quat(jnp.array(m)))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2, q * sign, atol=1e-5)


def test_exp_map_roundtrip():
    rng = np.random.default_rng(6)
    e = rng.normal(size=(64, 3))
    q = np.asarray(rot.exp_map_to_quat(jnp.array(e)))
    np.testing.assert_allclose(q, sRot.from_rotvec(e).as_quat(), atol=1e-5)
    e2 = np.asarray(rot.quat_to_exp_map(jnp.array(q)))
    np.testing.assert_allclose(e2, sRot.from_quat(q).as_rotvec(), atol=1e-4)
    # tiny angles
    e_small = rng.normal(size=(8, 3)) * 1e-6
    q_small = np.asarray(rot.exp_map_to_quat(jnp.array(e_small)))
    np.testing.assert_allclose(q_small, sRot.from_rotvec(e_small).as_quat(), atol=1e-7)


def test_euler_and_heading():
    q = rand_quats(64, 7)
    rpy = np.asarray(rot.get_euler_xyz(jnp.array(q)))
    want = sRot.from_quat(q).as_euler("xyz")  # extrinsic xyz == roll/pitch/yaw
    np.testing.assert_allclose(rpy, want, atol=1e-4)
    # quat_from_euler_xyz roundtrip
    q2 = np.asarray(rot.quat_from_euler_xyz(jnp.array(rpy)))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2, q * sign, atol=1e-4)
    # heading removes yaw of x axis
    hq = np.asarray(rot.calc_heading_quat_inv(jnp.array(q)))
    x_rot = sRot.from_quat(hq) * sRot.from_quat(q)
    fwd = x_rot.apply(np.array([1.0, 0, 0]))
    np.testing.assert_allclose(fwd[:, 1], 0.0, atol=1e-5)


def test_slerp_endpoints_and_mid():
    q0, q1 = rand_quats(32, 8), rand_quats(32, 9)
    t0 = np.asarray(rot.slerp(jnp.array(q0), jnp.array(q1), jnp.zeros((32, 1))))
    np.testing.assert_allclose(t0, q0, atol=1e-5)
    t1 = np.asarray(rot.slerp(jnp.array(q0), jnp.array(q1), jnp.ones((32, 1))))
    sign = np.sign(np.sum(t1 * q1, axis=-1, keepdims=True))
    np.testing.assert_allclose(t1, q1 * sign, atol=1e-4)
    # midpoint is unit and equidistant
    tm = np.asarray(rot.slerp(jnp.array(q0), jnp.array(q1), jnp.full((32, 1), 0.5)))
    np.testing.assert_allclose(np.linalg.norm(tm, axis=-1), 1.0, atol=1e-4)


def test_quat_integrate():
    q = rand_quats(16, 10)
    w = np.random.default_rng(11).normal(size=(16, 3))
    dt = 0.005
    got = np.asarray(rot.quat_integrate(jnp.array(q), jnp.array(w), dt))
    want = (sRot.from_rotvec(w * dt) * sRot.from_quat(q)).as_quat()
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)
