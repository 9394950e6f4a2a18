"""Batched forward kinematics over the robot tree (jit/vmap-safe).

Two parametrizations, matching the reference:
  * `fk_pose_aa`   — per-body axis-angle + root translation, the motion-data
    parametrization (reference torch_humanoid_batch.py:168-269 `fk_batch`).
  * `fk_root_dof`  — root pose + hinge angles, the simulator parametrization.

Bodies are processed level-by-level down the tree so each level is one fused
batched matmul instead of a 24-step sequential chain.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pbhc_tpu.maths import rotations as rot
from pbhc_tpu.model.mjcf import RobotModel


def _fk_levels(model: RobotModel, R_root, p_root, R_joint):
    """Core level-wise FK for one sample.

    R_root [3,3], p_root [3], R_joint [B,3,3] (per-body joint rotation in the
    body's local frame; root row is ignored — reference semantics: the root's
    MJCF local pos/quat are NOT applied, root pose comes in directly,
    torch_humanoid_batch.py:249-251).
    Returns world (p [B,3], R [B,3,3]).
    """
    B = model.num_bodies
    R_local = jnp.asarray(rot.quat_to_matrix(jnp.asarray(model.local_quat, dtype=jnp.float32)))
    local_pos = jnp.asarray(model.local_pos, dtype=jnp.float32)

    R_w = jnp.zeros((B, 3, 3), dtype=jnp.float32).at[0].set(R_root)
    p_w = jnp.zeros((B, 3), dtype=jnp.float32).at[0].set(p_root)
    for idx in model.levels:
        pidx = model.parent[idx]
        Rp = R_w[pidx]                          # [L,3,3]
        p_new = jnp.einsum("lij,lj->li", Rp, local_pos[idx]) + p_w[pidx]
        R_new = Rp @ R_local[idx] @ R_joint[idx]
        R_w = R_w.at[idx].set(R_new)
        p_w = p_w.at[idx].set(p_new)
    return p_w, R_w


def fk_pose_aa(model: RobotModel, pose_aa, trans):
    """Reference-style FK for one frame.

    pose_aa [J,3] (J >= num_bodies entries are ignored; index 0 is the root
    global orientation as axis-angle), trans [3] root position.
    Returns (body_pos [B,3], body_quat_xyzw [B,4]).
    """
    pose_aa = pose_aa[: model.num_bodies]
    q = rot.exp_map_to_quat(pose_aa)
    R_pose = rot.quat_to_matrix(q)
    p_w, R_w = _fk_levels(model, R_pose[0], trans, R_pose)
    return p_w, rot.matrix_to_quat(R_w)


def joint_rotations_from_dof(model: RobotModel, dof_pos):
    """Per-body joint rotation matrices from hinge angles. dof_pos [nd]."""
    B = model.num_bodies
    axis = jnp.asarray(model.dof_axis, dtype=jnp.float32)          # [nd,3]
    q = rot.quat_from_angle_axis(dof_pos, axis)                    # [nd,4]
    R = rot.quat_to_matrix(q)                                      # [nd,3,3]
    R_joint = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1))
    return R_joint.at[jnp.asarray(model.dof_body)].set(R)


def fk_root_dof(model: RobotModel, root_pos, root_quat, dof_pos):
    """Simulator-style FK for one env.

    root_pos [3], root_quat [4] xyzw, dof_pos [nd].
    Returns (body_pos [B,3], body_quat_xyzw [B,4], body_R [B,3,3]).
    """
    R_joint = joint_rotations_from_dof(model, dof_pos)
    R_root = rot.quat_to_matrix(root_quat)
    p_w, R_w = _fk_levels(model, R_root, root_pos, R_joint)
    return p_w, rot.matrix_to_quat(R_w), R_w


def fk_velocities(model: RobotModel, body_pos, body_R, root_lin_vel, root_ang_vel, dof_vel):
    """Propagate world-frame body velocities down the tree (one env).

    body velocities are taken at each body's frame origin, matching Isaac Gym's
    rigid-body state layout (reference isaacgym.py:608-618).
    Returns (lin_vel [B,3], ang_vel [B,3]).
    """
    B = model.num_bodies
    v = jnp.zeros((B, 3), dtype=jnp.float32).at[0].set(root_lin_vel)
    w = jnp.zeros((B, 3), dtype=jnp.float32).at[0].set(root_ang_vel)
    # world-frame joint axes
    axis_w = jnp.zeros((B, 3), dtype=jnp.float32)
    dof_body = jnp.asarray(model.dof_body)
    axis_local = jnp.asarray(model.dof_axis, dtype=jnp.float32)
    axis_w = axis_w.at[dof_body].set(jnp.einsum("dij,dj->di", body_R[dof_body], axis_local))
    qd_full = jnp.zeros((B,), dtype=jnp.float32).at[dof_body].set(dof_vel)

    for idx in model.levels:
        pidx = model.parent[idx]
        w_new = w[pidx] + axis_w[idx] * qd_full[idx][..., None]
        v_new = v[pidx] + jnp.cross(w[pidx], body_pos[idx] - body_pos[pidx])
        w = w.at[idx].set(w_new)
        v = v.at[idx].set(v_new)
    return v, w


def dof_from_pose_aa(model: RobotModel, pose_aa):
    """Recover hinge angles from per-body axis-angle (reference fk_batch:216-221).

    Valid because every G1 joint is 1-DoF: pose_aa[body] = angle * axis and the
    axes are signed unit basis vectors, so angle = sum(pose_aa * axis_sign).
    pose_aa [..., J, 3] -> [..., nd].
    """
    ax = np.asarray(model.dof_axis)  # entries in {-1,0,1}
    sgn = jnp.asarray(ax.sum(-1), dtype=jnp.float32)  # +-1
    per_body = pose_aa[..., np.asarray(model.dof_body), :].sum(-1)
    return per_body * sgn
