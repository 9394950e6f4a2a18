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


def _level_order(model: RobotModel):
    """Static level-sorted traversal: (order, inv_order, parent_pos_per_level).

    Bodies are processed root-first, level by level; parents are addressed by
    their POSITION in the level-sorted concatenation so the FK loop is pure
    gather+concat — no scatters, which are slow on TPU.
    """
    order = [0] + [int(i) for lv in model.levels for i in lv]
    pos = np.zeros(model.num_bodies, dtype=np.int64)
    for p, b in enumerate(order):
        pos[b] = p
    parent_pos = [pos[model.parent[lv]] for lv in model.levels]
    return np.asarray(order), pos, parent_pos


def _fk_levels(model: RobotModel, R_root, p_root, R_joint):
    """Core level-wise FK for one sample (gather-only, see _level_order).

    R_root [3,3], p_root [3], R_joint [B,3,3] (per-body joint rotation in the
    body's local frame; root row is ignored — reference semantics: the root's
    MJCF local pos/quat are NOT applied, root pose comes in directly,
    torch_humanoid_batch.py:249-251).
    Returns world (p [B,3], R [B,3,3]).
    """
    R_local = jnp.asarray(rot.quat_to_matrix(jnp.asarray(model.local_quat, dtype=jnp.float32)))
    local_pos = jnp.asarray(model.local_pos, dtype=jnp.float32)
    _, pos, parent_pos = _level_order(model)

    R_acc = R_root[None]                         # level-sorted accumulation
    p_acc = p_root[None]
    for lv, ppos in zip(model.levels, parent_pos):
        Rp = R_acc[ppos]                         # [L,3,3] gather
        p_new = jnp.einsum("lij,lj->li", Rp, local_pos[lv]) + p_acc[ppos]
        R_new = Rp @ R_local[lv] @ R_joint[lv]
        R_acc = jnp.concatenate([R_acc, R_new], axis=0)
        p_acc = jnp.concatenate([p_acc, p_new], axis=0)
    return p_acc[pos], R_acc[pos]


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
    """Per-body joint rotation matrices from hinge angles. dof_pos [nd].

    Gather-based: concat joint rotations with an identity row, then index by a
    static body->slot map (identity slot for jointless bodies)."""
    axis = jnp.asarray(model.dof_axis, dtype=jnp.float32)          # [nd,3]
    q = rot.quat_from_angle_axis(dof_pos, axis)                    # [nd,4]
    R = rot.quat_to_matrix(q)                                      # [nd,3,3]
    nd = model.num_dof
    slot = np.full(model.num_bodies, nd, dtype=np.int64)
    slot[np.asarray(model.dof_body)] = np.arange(nd)
    R_all = jnp.concatenate([R, jnp.eye(3, dtype=jnp.float32)[None]], axis=0)
    return R_all[slot]


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
    nd = model.num_dof
    dof_body = np.asarray(model.dof_body)
    axis_local = jnp.asarray(model.dof_axis, dtype=jnp.float32)
    # per-body joint twist contribution (0 for jointless bodies), gather-based
    slot = np.full(model.num_bodies, nd, dtype=np.int64)
    slot[dof_body] = np.arange(nd)
    axis_w_d = jnp.einsum("dij,dj->di", body_R[dof_body], axis_local) * dof_vel[:, None]
    twist = jnp.concatenate([axis_w_d, jnp.zeros((1, 3))], axis=0)[slot]  # [B,3]

    _, pos, parent_pos = _level_order(model)
    v_acc = root_lin_vel[None]
    w_acc = root_ang_vel[None]
    for lv, ppos in zip(model.levels, parent_pos):
        wp = w_acc[ppos]
        w_new = wp + twist[lv]
        v_new = v_acc[ppos] + jnp.cross(wp, body_pos[lv] - body_pos[model.parent[lv]])
        w_acc = jnp.concatenate([w_acc, w_new], axis=0)
        v_acc = jnp.concatenate([v_acc, v_new], axis=0)
    return v_acc[pos], w_acc[pos]


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
