"""Skeleton (poselib-equivalent) tests: local<->global round trips, FK parity
with the device kinematics, T-pose retargeting (reference
smpl_retarget/poselib/poselib/skeleton/tests/test_skeleton.py)."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sRot

from pbhc_tpu.model.g1 import load_g1_sim_model
from pbhc_tpu.model.kinematics import fk_root_dof, joint_rotations_from_dof
from pbhc_tpu.maths import rotations as rot
from pbhc_tpu.motion.skeleton import SkeletonTree, SkeletonState, SkeletonMotion


def _g1_state(T=4, seed=0):
    model = load_g1_sim_model()
    tree = SkeletonTree.from_robot_model(model)
    rng = np.random.default_rng(seed)
    dof = rng.uniform(-0.4, 0.4, (T, model.num_dof)).astype(np.float32)
    root_q = sRot.from_euler("xyz", rng.uniform(-0.3, 0.3, (T, 3))).as_quat().astype(np.float32)
    root_p = rng.normal(0, 0.2, (T, 3)).astype(np.float32)
    # per-body local joint rotations from the hinge angles
    local = np.zeros((T, model.num_bodies, 4), dtype=np.float32)
    for t in range(T):
        Rj = np.asarray(joint_rotations_from_dof(model, jnp.asarray(dof[t])))
        local[t] = np.asarray(rot.matrix_to_quat(jnp.asarray(Rj)))
    local[:, 0] = root_q
    return model, tree, SkeletonState(tree, local, root_p), dof, root_p, root_q


def test_fk_parity_with_device_kinematics():
    model, tree, state, dof, root_p, root_q = _g1_state()
    gp = state.global_translation
    gq = state.global_rotation
    for t in range(len(dof)):
        p_dev, q_dev, _ = fk_root_dof(model, jnp.asarray(root_p[t]),
                                      jnp.asarray(root_q[t]), jnp.asarray(dof[t]))
        np.testing.assert_allclose(gp[t], np.asarray(p_dev), atol=2e-5)
        dots = np.abs((gq[t] * np.asarray(q_dev)).sum(-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_local_global_roundtrip():
    _, tree, state, *_ = _g1_state(seed=1)
    back = SkeletonState.from_global_rotation(tree, state.global_rotation,
                                              state.root_translation)
    dots = np.abs((back.local_rotation * state.local_rotation).sum(-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_retarget_identity_roundtrip():
    """Retargeting onto the same skeleton with the same T-pose reproduces the
    motion exactly."""
    _, tree, state, *_ = _g1_state(seed=2)
    tpose = SkeletonState.zero_pose(tree)
    mapping = {n: n for n in tree.node_names}
    out = state.retarget_to(mapping, tpose, tpose, 1.0)
    np.testing.assert_allclose(out.global_translation, state.global_translation, atol=2e-5)
    dots = np.abs((out.global_rotation * state.global_rotation).sum(-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_skeleton_motion_velocities():
    _, tree, state, *_ = _g1_state(T=8, seed=3)
    motion = SkeletonMotion.from_state(state, fps=30)
    v = motion.global_velocity
    w = motion.global_angular_velocity
    assert v.shape == state.global_translation.shape
    assert np.isfinite(v).all() and np.isfinite(w).all()
    # finite-difference consistency on the root
    dp = (state.global_translation[1] - state.global_translation[0]) * 30
    np.testing.assert_allclose(v[0, 0], dp[0], rtol=0.6, atol=0.3)
