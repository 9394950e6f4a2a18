"""SMPL-joints -> G1 retargeting via differentiable JAX IK.

Replaces the reference's CPU retargeting stacks (reference
smpl_retarget/mink_retarget — QP IK over MuJoCo — and smpl_retarget/
phc_retarget/fit_smpl_motion.py — torch gradient descent) with a single
jitted Adam fit over the WHOLE motion at once: optimize (root_pos[T,3],
root_rot6d[T], dof[T,nd]) so that mapped G1 body positions match the SMPL
joint targets, with joint-limit and temporal-smoothness penalties. Every FK
call is the framework's own batched kinematics, so the entire fit runs on
the accelerator.

Input: SMPL joints [T, 24, 3] (e.g. GVHMR output or the `smpl_joints` field
of reference pkls). Output: a training-ready clip dict.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pbhc_tpu.maths import rotations as rot
from pbhc_tpu.model.kinematics import fk_root_dof

# SMPL joint index -> G1 body name (reference phc_g1_23dof.yaml joint_matches)
SMPL_JOINT_MATCHES = [
    (0, "pelvis"),
    (1, "left_hip_pitch_link"), (4, "left_knee_link"), (7, "left_ankle_roll_link"),
    (2, "right_hip_pitch_link"), (5, "right_knee_link"), (8, "right_ankle_roll_link"),
    (16, "left_shoulder_roll_link"), (18, "left_elbow_link"), (20, "left_hand_link"),
    (17, "right_shoulder_roll_link"), (19, "right_elbow_link"), (21, "right_hand_link"),
    (15, "head_link"),
]


def _rot6d_to_quat(r6):
    a = r6[..., :3]
    b = r6[..., 3:]
    x = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-6)
    b = b - (b * x).sum(-1, keepdims=True) * x
    y = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-6)
    z = jnp.cross(x, y)
    m = jnp.stack([x, y, z], axis=-1)
    return rot.matrix_to_quat(m)


def retarget_smpl_joints(model, smpl_joints, fps=30, iters=600, lr=0.02,
                         w_match=1.0, w_smooth=0.5, w_limit=10.0, w_ground=1.0,
                         verbose=False):
    """Fit G1 (root pose + dof) to SMPL joint positions. Returns a clip dict."""
    T = smpl_joints.shape[0]
    nd = model.num_dof
    body_ids = jnp.asarray([model.body_names.index(n) for _, n in SMPL_JOINT_MATCHES])
    smpl_ids = jnp.asarray([i for i, _ in SMPL_JOINT_MATCHES])
    targets = jnp.asarray(smpl_joints)[:, smpl_ids]          # [T,M,3]
    lo = jnp.asarray(model.dof_limits[:, 0], dtype=jnp.float32)
    hi = jnp.asarray(model.dof_limits[:, 1], dtype=jnp.float32)

    params = {
        "root_pos": targets[:, 0],                            # init at pelvis target
        "root_r6": jnp.tile(jnp.asarray([1.0, 0, 0, 0, 1.0, 0]), (T, 1)),
        "dof": jnp.zeros((T, nd)),
        # per-match-point constant offset in the body local frame: the shape-fit
        # equivalent (reference fit_smpl_shape.py) absorbing the systematic
        # SMPL-joint vs G1-link-origin skeleton mismatch
        "offsets": jnp.zeros((len(SMPL_JOINT_MATCHES), 3)),
    }

    fk = jax.vmap(fk_root_dof, in_axes=(None, 0, 0, 0))

    def loss_fn(p):
        quat = _rot6d_to_quat(p["root_r6"])
        body_pos, body_quat, _ = fk(model, p["root_pos"], quat, p["dof"])
        off = jnp.clip(p["offsets"], -0.25, 0.25)
        match_pos = body_pos[:, body_ids] + rot.quat_rotate(body_quat[:, body_ids], off[None])
        match = ((match_pos - targets) ** 2).sum(-1).mean()
        smooth = ((p["dof"][1:] - p["dof"][:-1]) ** 2).mean() \
            + ((p["root_pos"][1:] - p["root_pos"][:-1]) ** 2).mean() * 10
        limit = (jnp.clip(lo - p["dof"], 0, None) ** 2 + jnp.clip(p["dof"] - hi, 0, None) ** 2).mean()
        ground = (jnp.clip(-body_pos[..., 2] + 0.0, 0, None) ** 2).mean()  # keep above ground
        # pin the root<->offsets gauge freedom: a rigid translation of the
        # whole fit is invisible to `match` when the offsets absorb it, so an
        # unregularized fit can drift anywhere inside the offset clip box
        # (observed: +0.26 m float). Small L2 makes offsets minimal.
        offreg = (p["offsets"] ** 2).sum(-1).mean()
        return (w_match * match + w_smooth * smooth + w_limit * limit
                + w_ground * ground + 0.1 * offreg)

    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    for i in range(iters):
        params, opt, loss = step(params, opt)
        if verbose and i % 100 == 0:
            print(f"[retarget] iter {i}: loss={float(loss):.5f}")

    quat = _rot6d_to_quat(params["root_r6"])
    dof = jnp.clip(params["dof"], lo, hi)
    axes = jnp.asarray(model.dof_axis, dtype=jnp.float32)
    n_extend = model.num_bodies - model.num_real_bodies
    from scipy.spatial.transform import Rotation as sRot

    root_aa = sRot.from_quat(np.asarray(quat)).as_rotvec()
    pose_aa = np.concatenate([
        root_aa[:, None, :],
        np.asarray(dof)[:, :, None] * np.asarray(axes)[None],
        np.zeros((T, n_extend, 3)),
    ], axis=1)
    # final match error for reporting (with the fitted skeleton offsets)
    body_pos, body_quat, _ = fk(model, params["root_pos"], quat, dof)
    off = jnp.clip(params["offsets"], -0.25, 0.25)
    match_pos = body_pos[:, body_ids] + rot.quat_rotate(body_quat[:, body_ids], off[None])
    err = float(jnp.linalg.norm(match_pos - targets, axis=-1).mean())
    return {
        "root_trans_offset": np.asarray(params["root_pos"], dtype=np.float32),
        "root_rot": np.asarray(quat, dtype=np.float32),
        "dof": np.asarray(dof, dtype=np.float32),
        "pose_aa": pose_aa.astype(np.float32),
        "fps": int(fps),
        "retarget_mean_error_m": err,
    }
