"""General motion-tracking env (KungfuBot2), TPU-native.

Reimplements the reference multi-motion teacher-student env (reference
humanoidverse/envs/motion_tracking/general_tracking.py) on top of
MotionTrackingEnv:

* quaternion-product body-rotation diffs (general_tracking.py:643-647);
* root-frame diffs: local root velocity, root rot quat diff, root height;
* anchor-frame observations (beyondmimic-style, general_tracking.py:739-805):
  local key-body pos/rot relative to the robot's anchor body, anchor->ref
  relative pose (6D rotation obs);
* future motion targets: `future_num_steps` reference frames spanning
  `future_max_steps` control steps (general_tracking.py:500-565);
* key-body / anchor reward set (general_tracking.py:1109-1290);
* optional ref_pos_z / ref_ori terminations (general_tracking.py:244-249).

Layout deviation from the reference (deliberate): future-target and history
groups are flattened STEP-MAJOR ([N, T, D] -> [N, T*D]) so the Conv1d encoders
see a consistent temporal structure; the reference concatenates per-key
flattenings, which scrambles the step axis (general_tracking.py:547-553 vs
encoder_modules.py:103-107).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pbhc_tpu.maths import rotations as rot
from pbhc_tpu.envs.tracking_env import EnvState, MotionTrackingEnv
from pbhc_tpu.motion.motion_lib import get_motion_state


class GeneralTrackingEnv(MotionTrackingEnv):
    def __init__(self, config, num_envs, key, **kw):
        super().__init__(config, num_envs, key, **kw)
        rcfg = config.robot
        names_ext = list(self.sim_model.body_names) + [e["joint_name"] for e in rcfg.motion.extend_config]
        self.key_body_id = np.asarray([names_ext.index(n) for n in rcfg.key_bodies])
        anchor_link = rcfg.motion.get("anchor_link", "pelvis")
        self.anchor_index = names_ext.index(anchor_link)
        self.future_num_steps = int(config.obs.get("future_num_steps", 20))
        self.future_max_steps = int(config.obs.get("future_max_steps", 95))
        self.tar_obs_steps = np.linspace(1, self.future_max_steps, self.future_num_steps).astype(np.int32)

    # ------------------------------------------------------------------ diffs
    def _compute_diffs(self, sim, mres, body_pos, body_quat, body_vel, body_ang_vel):
        d = super()._compute_diffs(sim, mres, body_pos, body_quat, body_vel, body_ang_vel)
        # quat-product rotation diff (general_tracking.py:643-647)
        d["dif_body_rot_quat"] = rot.quat_mul(mres["rg_rot_t"], rot.quat_conjugate(body_quat))
        # root-frame diffs (general_tracking.py:656-666)
        ref_root_vel_local = rot.quat_rotate_inverse(mres["root_rot"], mres["root_vel"])
        base_lin_vel = rot.quat_rotate_inverse(sim.root_quat, sim.root_lin_vel)
        d["dif_root_velocity"] = ref_root_vel_local - base_lin_vel
        d["dif_root_rot"] = rot.quat_mul(mres["root_rot"], rot.quat_conjugate(sim.root_quat))
        d["dif_root_height"] = mres["root_pos"][:, 2:3] - sim.root_pos[:, 2:3]
        # anchor diffs (general_tracking.py:797-805)
        ai = self.anchor_index
        d["dif_anchor_body_pos"] = d["dif_body_pos"][:, ai]
        d["dif_anchor_pos_z"] = mres["rg_pos_t"][:, ai, 2] - body_pos[:, ai, 2]
        g = jnp.asarray([0.0, 0.0, -1.0])
        d["dif_anchor_ori"] = (
            rot.quat_rotate_inverse(mres["rg_rot_t"][:, ai], jnp.broadcast_to(g, (self.num_envs, 3)))[:, 2]
            - rot.quat_rotate_inverse(body_quat[:, ai], jnp.broadcast_to(g, (self.num_envs, 3)))[:, 2])
        # beyondmimic local (anchor-yaw-aligned) targets (general_tracking.py:739-770)
        anchor_pos_ref = mres["rg_pos_t"][:, ai][:, None]
        anchor_quat_ref = mres["rg_rot_t"][:, ai][:, None]
        robot_anchor_pos = body_pos[:, ai][:, None]
        robot_anchor_quat = body_quat[:, ai][:, None]
        delta_pos = robot_anchor_pos.at[..., 2].set(anchor_pos_ref[..., 2])
        delta_ori = _yaw_quat(rot.quat_mul(robot_anchor_quat, rot.quat_conjugate(anchor_quat_ref)))
        body_pos_relative = delta_pos + rot.quat_rotate(
            jnp.broadcast_to(delta_ori, mres["rg_pos_t"].shape[:-1] + (4,)),
            mres["rg_pos_t"] - anchor_pos_ref)
        body_quat_relative = rot.quat_mul(
            jnp.broadcast_to(delta_ori, mres["rg_rot_t"].shape[:-1] + (4,)), mres["rg_rot_t"])
        d["dif_local_body_pos"] = body_pos_relative - body_pos
        d["dif_local_body_rot_quat"] = rot.quat_mul(body_quat_relative, rot.quat_conjugate(body_quat))
        return d

    # ------------------------------------------------------------ termination
    def _extra_terminations(self, term, diffs, state):
        tcfg = self.ecfg.termination
        tscl = self.ecfg.termination_scales
        if tcfg.get("terminate_by_ref_pos_z", False):
            term["ref_pos_z"] = jnp.abs(diffs["dif_anchor_pos_z"]) > float(tscl.termination_ref_pos_z_threshold)
        if tcfg.get("terminate_by_ref_ori", False):
            term["ref_ori"] = jnp.abs(diffs["dif_anchor_ori"]) > float(tscl.termination_ref_ori_threshold)
        return term

    # ---------------------------------------------------------------- rewards
    def _reward_terms(self, state, rs):
        rews, errors, feet_air_time = super()._reward_terms(state, rs)
        sig = {t: state.sigma_values[i] for i, t in enumerate(self.sigma_terms)}
        d = rs["diffs"]

        def track(err, term):
            errors[term] = err
            return jnp.exp(-err / sig[term])

        kid = self.key_body_id
        # general_tracking.py:1109-1290
        if "teleop_key_body_pos" in sig:
            rews["teleop_key_body_position"] = track(
                (d["dif_body_pos"][:, kid] ** 2).mean(-1).mean(-1), "teleop_key_body_pos")
        if "teleop_anchor_body_pos" in sig:
            rews["teleop_anchor_body_position"] = track(
                (d["dif_anchor_body_pos"] ** 2).mean(-1), "teleop_anchor_body_pos")
        if "teleop_anchor_body_rot" in sig:
            ang, _ = rot.quat_to_angle_axis(d["dif_body_rot_quat"][:, self.anchor_index])
            rews["teleop_anchor_body_rotation"] = track(ang**2, "teleop_anchor_body_rot")
        if "local_key_body_pos" in sig:
            rews["local_key_body_position"] = track(
                (d["dif_local_body_pos"][:, kid] ** 2).mean(-1).mean(-1), "local_key_body_pos")
        if "local_key_body_rot" in sig:
            ang, _ = rot.quat_to_angle_axis(d["dif_local_body_rot_quat"][:, kid])
            rews["local_key_body_rotation"] = track((ang**2).mean(-1), "local_key_body_rot")
        if "key_body_vel" in sig:
            rews["key_body_velocity"] = track(
                (d["dif_body_vel"][:, kid] ** 2).mean(-1).mean(-1), "key_body_vel")
        if "key_body_ang_vel" in sig:
            rews["key_body_ang_velocity"] = track(
                (d["dif_body_ang_vel"][:, kid] ** 2).mean(-1).mean(-1), "key_body_ang_vel")
        if "teleop_root_vel" in sig:
            rews["teleop_root_vel"] = track((d["dif_root_velocity"] ** 2).mean(-1), "teleop_root_vel")
        if "teleop_root_pose" in sig:
            ang, _ = rot.quat_to_angle_axis(d["dif_root_rot"])
            err = ang**2 + (d["dif_root_height"] ** 2).mean(-1)
            rews["teleop_root_pose"] = track(err, "teleop_root_pose")
        return rews, errors, feet_air_time

    # -------------------------------------------------------------------- obs
    def _obs_getters(self, state: EnvState, key):
        getters = super()._obs_getters(state, key)
        sim = state.sim
        N = self.num_envs
        rpy = rot.get_euler_xyz(sim.root_quat)
        getters["roll_pitch"] = rpy[:, :2]
        getters["root_height"] = sim.root_pos[:, 2:3]
        getters["contact_mask"] = state.contacts_filt
        # dr_base_mass comes from the base env's dr_obs (added-mass DR)

        body_pos, body_quat, _, _ = self._extend_body_states(sim)
        ai = self.anchor_index
        anchor_pos = body_pos[:, ai][:, None]
        anchor_quat = body_quat[:, ai][:, None]
        anchor_quat_inv = rot.quat_conjugate(anchor_quat)

        # local key body pos/rot in the robot anchor frame (general_tracking.py:770-790)
        local_body_pos = rot.quat_rotate(
            jnp.broadcast_to(anchor_quat_inv, body_pos.shape[:-1] + (4,)), body_pos - anchor_pos)
        local_body_rot = rot.quat_to_matrix(rot.quat_mul(
            jnp.broadcast_to(anchor_quat_inv, body_quat.shape), body_quat))[..., :2]  # first 2 cols
        getters["local_key_body_pos"] = local_body_pos[:, self.key_body_id].reshape(N, -1)
        getters["local_key_body_rot"] = local_body_rot[:, self.key_body_id].reshape(N, -1)

        # anchor -> reference anchor relative pose (general_tracking.py:785-796)
        mres, motion_times = self._motion_state_at(state, 1)
        ref_anchor_pos = mres["rg_pos_t"][:, ai]
        ref_anchor_quat = mres["rg_rot_t"][:, ai]
        aq_inv = rot.quat_conjugate(body_quat[:, ai])
        getters["anchor_ref_pos"] = rot.quat_rotate(aq_inv, ref_anchor_pos - body_pos[:, ai])
        getters["anchor_ref_rot"] = rot.quat_to_matrix(
            rot.quat_mul(aq_inv, ref_anchor_quat))[..., :2].reshape(N, -1)

        # ---- future motion targets (general_tracking.py:500-565), step-major
        steps = jnp.asarray(self.tar_obs_steps)                      # [S]
        t = state.episode_length.astype(jnp.float32)[:, None] * self.dt + state.motion_start_times[:, None] \
            + steps[None].astype(jnp.float32) * self.dt             # [N,S]
        ids = jnp.broadcast_to(state.motion_ids[:, None], t.shape)
        off = state.origin_shift[:, None] if self.terrain is not None else None
        fm = get_motion_state(self.motion_lib.data, ids, t, offset=off)
        S = self.future_num_steps
        froot_rot = fm["root_rot"]
        frpy = rot.get_euler_xyz(froot_rot)
        froot_vel = rot.quat_rotate_inverse(froot_rot, fm["root_vel"])
        froot_ang = rot.quat_rotate_inverse(froot_rot, fm["root_ang_vel"])
        f_anchor_pos = fm["rg_pos_t"][..., ai, :][..., None, :]
        f_anchor_quat = fm["rg_rot_t"][..., ai, :][..., None, :]
        f_local_key = rot.quat_rotate(
            jnp.broadcast_to(rot.quat_conjugate(f_anchor_quat), fm["rg_pos_t"].shape[:-1] + (4,)),
            fm["rg_pos_t"] - f_anchor_pos)[..., self.key_body_id, :]   # [N,S,K,3]

        getters["future_motion_root_height"] = fm["root_pos"][..., 2:3].reshape(N, -1)
        getters["future_motion_roll_pitch"] = frpy[..., :2].reshape(N, -1)
        getters["future_motion_base_lin_vel"] = froot_vel.reshape(N, -1)
        getters["future_motion_base_yaw_vel"] = froot_ang[..., 2:3].reshape(N, -1)
        getters["future_motion_base_ang_vel"] = froot_ang.reshape(N, -1)
        getters["future_motion_dof_pos"] = fm["dof_pos"].reshape(N, -1)
        getters["future_motion_local_ref_key_body_pos"] = f_local_key.reshape(N, -1)
        # next-step compact mimic target (general_tracking.py:555-565)
        getters["next_step_ref_motion"] = jnp.concatenate([
            fm["root_pos"][:, 0, 2:3], frpy[:, 0, :2], froot_vel[:, 0],
            froot_ang[:, 0, 2:3], fm["dof_pos"][:, 0], f_local_key[:, 0].reshape(N, -1),
        ], axis=-1)
        return getters


def _yaw_quat(q):
    """Yaw component of a quaternion (xyzw)."""
    yaw = rot.calc_heading(q)
    axis = jnp.zeros_like(q[..., :3]).at[..., 2].set(1.0)
    return rot.quat_from_angle_axis(yaw, axis)
