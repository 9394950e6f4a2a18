"""Motion-tracking RL environment (KungfuBot v1 semantics), TPU-native.

Reimplements the reference env stack — LeggedRobotBase
(reference humanoidverse/envs/legged_base_task/legged_robot_base.py) +
LeggedRobotMotionTracking (reference humanoidverse/envs/motion_tracking/
motion_tracking.py) — as ONE pure jitted function over a batched pytree state:
dynamics, reference lookup, obs, rewards, terminations, masked resets,
episodic DR, and curricula all execute on-device; nothing leaves HBM during a
rollout.

Key structural translations:
* python-side buffers -> `EnvState` pytree fields, vmapped over envs;
* `need_to_refresh_envs` + state setters -> `jnp.where` masked replacement;
* python-float curricula -> traced scalars updated with masked ops;
* config-driven obs assembly (reference helpers.py:128-152) -> static
  dispatch at trace time compiled to fixed gathers/concats.

One deliberate improvement over the reference: observations are computed
AFTER reset replacement, so freshly reset envs see self-consistent obs (the
reference mixes pre-reset buffers with post-reset sim state on reset steps).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pbhc_tpu.maths import rotations as rot
from pbhc_tpu.model.g1 import load_g1_motion_model, load_g1_sim_model
from pbhc_tpu.motion.motion_lib import MotionLib, get_motion_state, sample_time
from pbhc_tpu.sim.engine import Engine, EngineOptions, SimParams, SimState, _pytree_dataclass


@_pytree_dataclass
class EnvState:
    """Batched env state (all arrays lead with the env axis N)."""

    sim: SimState
    rng: jax.Array

    episode_length: jax.Array       # [N] int32
    actions: jax.Array              # [N,nd]
    last_actions: jax.Array         # [N,nd]
    actions_after_delay: jax.Array  # [N,nd]
    last_dof_vel: jax.Array         # [N,nd]
    torques: jax.Array              # [N,nd] (last applied)
    action_queue: jax.Array         # [N,Q,nd]
    action_delay_idx: jax.Array     # [N] int32

    contacts: jax.Array             # [N,2]
    contacts_filt: jax.Array        # [N,2]
    last_contacts: jax.Array        # [N,2]
    last_contacts_filt: jax.Array   # [N,2]
    feet_air_time: jax.Array        # [N,2]

    motion_ids: jax.Array           # [N] int32
    motion_start_times: jax.Array   # [N]
    motion_len: jax.Array           # [N]
    motion_fail_ema: jax.Array      # [M] per-motion failure-rate EMA

    # terrain curriculum (reference base_task.py:111-142; realized level
    # up/down — the reference docstring's dormant _update_terrain_curriculum)
    terrain_level: jax.Array        # [N] int32 difficulty row
    origin_shift: jax.Array         # [N,3] added to every motion-ref fetch

    # episodic DR (reference legged_robot_base.py:599-635)
    kp_scale: jax.Array             # [N,nd]
    kd_scale: jax.Array             # [N,nd]
    rfi_lim_scale: jax.Array        # [N,nd]
    rao_scale: jax.Array            # [N,nd]
    default_dof_pos: jax.Array      # [N,nd]
    push_counter: jax.Array         # [N] int32
    push_interval: jax.Array        # [N] int32

    # curricula (traced scalars; reference keeps python floats)
    average_episode_length: jax.Array
    reward_penalty_scale: jax.Array
    motion_far_threshold: jax.Array
    dof_far_threshold: jax.Array
    soft_dof_pos_limit: jax.Array
    soft_dof_vel_limit: jax.Array
    soft_torque_limit: jax.Array
    sdc_alpha: jax.Array            # soft dynamic correction strength
    noise_curriculum_value: jax.Array  # obs-noise curriculum multiplier
    noise_ou: jax.Array             # [N,6] OU process state for IMU obs noise
    # adaptive tracking sigma (reference motion_tracking.py:1018-1052)
    sigma_values: jax.Array         # [S] current sigmas (term order static)
    sigma_ema: jax.Array            # [S] error EMAs

    history: Dict[str, jax.Array]   # key -> [N, len, dim]

    # derived per-step caches used by rewards/obs (filled in step)
    last_episode_length: jax.Array  # [N]


class MotionTrackingEnv:
    """Static env: config-derived constants + pure step/reset functions."""

    def __init__(self, config, num_envs: int, key, motion_model=None, sim_model=None):
        self.config = config
        self.num_envs = num_envs
        rcfg = config.robot

        robot_type = rcfg.robot_type
        # reference g1_23dof_lock_wrist.yaml:173 enables G1 self-collision
        self_coll = bool(rcfg.get("self_collision", True))
        self.sim_model = sim_model or load_g1_sim_model(robot_type,
                                                        self_collision=self_coll)
        extend_cfg = [dict(e) for e in rcfg.motion.extend_config]
        self.motion_model = motion_model or load_g1_motion_model(robot_type, extend_cfg)

        # per-joint armature override (reference g1_23dof_general.yaml
        # dof_armature: the sysID'd values replace the MJCF's)
        arm_cfg = rcfg.get("asset", {}).get("dof_armature")
        if arm_cfg:
            arm = np.asarray([float(arm_cfg[n]) for n in self.sim_model.dof_names])
            self.sim_model = dataclasses.replace(self.sim_model, dof_armature=arm)

        sim_cfg = config.simulator.config
        self.decimation = int(sim_cfg.sim.control_decimation)
        self.sim_dt = 1.0 / float(sim_cfg.sim.fps)
        self.dt = self.decimation * self.sim_dt
        self.engine = Engine(
            self.sim_model,
            EngineOptions(dt=self.sim_dt, solver=sim_cfg.get("solver", "apgd"),
                          solver_iters=int(sim_cfg.get("solver_iters", 32)),
                          lanes_contact_kernel=str(sim_cfg.get("lanes_contact_kernel", "auto")),
                          self_collision=self_coll,
                          contact_cap=int(sim_cfg.get("contact_cap", 0)),
                          pair_cap=int(sim_cfg.get("pair_cap", 4)),
                          warm_start=bool(sim_cfg.get("warm_start", True)),
                          pos_iters=int(sim_cfg.get("pos_iters", 8)),
                          contact_matvec_dtype=str(
                              sim_cfg.get("contact_matvec_dtype", "float32"))),
        )
        if self.engine.opt.solver == "lanes":
            from pbhc_tpu.sim.engine_lanes import LanesEngine

            self.lanes_engine = LanesEngine(self.engine)
        else:
            self.lanes_engine = None

        # terrain group (reference config/terrain/*, envs/env_utils/terrain.py):
        # heightfield installs into the engine; plane (default) leaves it flat
        ter = config.get("terrain")
        if ter is not None and str(ter.get("mesh_type", "plane")) in ("heightfield", "trimesh"):
            from pbhc_tpu.envs.terrain import Terrain, TerrainConfig

            self.terrain = Terrain(TerrainConfig(
                horizontal_scale=float(ter.get("horizontal_scale", 0.1)),
                num_rows=int(ter.get("num_rows", 10)),
                num_cols=int(ter.get("num_cols", 20)),
                terrain_length=float(ter.get("terrain_length", 8.0)),
                terrain_width=float(ter.get("terrain_width", 8.0)),
                border_size=float(ter.get("border_size", 25.0)),
                terrain_proportions=tuple(ter.get("terrain_proportions",
                                                  (0.1, 0.1, 0.35, 0.25, 0.2))),
            ))
            self.engine.set_terrain(self.terrain.height_field,
                                    self.terrain.cfg.horizontal_scale)
            # per-env origins over the curriculum grid (reference
            # base_task.py:117-129): column fixed per env, row = difficulty
            self.terrain_origins = jnp.asarray(self.terrain.env_origins)
            nc = self.terrain.cfg.num_cols
            self.terrain_types = (jnp.arange(num_envs) * nc // num_envs
                                  ).astype(jnp.int32)
            self.terrain_curriculum = bool(ter.get("curriculum", False))
            self.max_init_terrain_level = int(ter.get("max_init_terrain_level",
                                                      self.terrain.cfg.num_rows - 1))
            if not self.terrain_curriculum:
                self.max_init_terrain_level = self.terrain.cfg.num_rows - 1
        else:
            self.terrain = None

        # teleop hook (reference motion_tracking.py:112-118,137-138): gated
        # marker buffer fed by a UDP listener instead of a ROS2 subscriber
        if bool(config.env.config.get("use_teleop_control", False)):
            from pbhc_tpu.deploy.teleop import TeleopSource

            self.teleop_source = TeleopSource().start()
            self.teleop_marker_coords = np.zeros((num_envs, 3, 3))
        else:
            self.teleop_source = None
        self.nd = self.engine.nd
        self.nb = self.engine.nb
        self.num_extend = len(extend_cfg)
        self.nb_ext = self.nb + self.num_extend

        # ---- index bookkeeping (reference base_task.py:172-209)
        names = self.sim_model.body_names
        names_ext = list(names) + [e["joint_name"] for e in extend_cfg]
        self.feet_indices = np.asarray([names.index(n) for n in names if rcfg.foot_name in n])
        self.penalised_contact_indices = np.asarray(
            [i for i, n in enumerate(names) if any(p in n for p in rcfg.penalize_contacts_on)])
        self.termination_contact_indices = np.asarray(
            [i for i, n in enumerate(names) if any(p in n for p in rcfg.terminate_after_contacts_on)])
        self.upper_body_id = np.asarray([names_ext.index(n) for n in rcfg.motion.upper_body_link])
        self.lower_body_id = np.asarray([names_ext.index(n) for n in rcfg.motion.lower_body_link])
        self.motion_tracking_id = np.asarray([names_ext.index(n) for n in rcfg.motion.motion_tracking_link])

        # extend body attach info (reference motion_tracking.py:218-242)
        self.extend_parent_ids = np.asarray([names.index(e["parent_name"]) for e in extend_cfg])
        self.extend_pos = jnp.asarray([e["pos"] for e in extend_cfg], dtype=jnp.float32)
        rot_wxyz = np.asarray([e["rot"] for e in extend_cfg], dtype=np.float32)
        self.extend_rot_xyzw = jnp.asarray(rot_wxyz[:, [1, 2, 3, 0]])

        # ---- PD / limits (reference legged_robot_base.py:89-108)
        default_angles = rcfg.init_state.default_joint_angles
        q0, kp, kd, ascale = [], [], [], []
        for n in self.sim_model.dof_names:
            q0.append(float(default_angles[n]))
            got = None
            for pat, v in rcfg.control.stiffness.items():
                if pat in n:
                    got = (float(v), float(rcfg.control.damping[pat]))
            assert got is not None, f"no PD gain for {n}"
            kp.append(got[0])
            kd.append(got[1])
            a = rcfg.control.action_scale
            if isinstance(a, dict):
                # matched by substring like PD gains (reference legged_robot_base.py:99-100)
                val = None
                for pat, v in a.items():
                    if pat in n:
                        val = float(v)
                assert val is not None, f"no action_scale for {n}"
                ascale.append(val)
            else:
                ascale.append(float(a))
        self.raw_default_dof_pos = jnp.asarray(q0)
        self.p_gains = jnp.asarray(kp)
        self.d_gains = jnp.asarray(kd)
        self.action_scales = jnp.asarray(ascale)
        self.torque_limits = jnp.asarray(rcfg.dof_effort_limit_list, dtype=jnp.float32)
        self.dof_vel_limits = jnp.asarray(rcfg.dof_vel_limit_list, dtype=jnp.float32)
        self.dof_pos_limits = jnp.asarray(self.sim_model.dof_limits, dtype=jnp.float32)
        self.action_clip = float(rcfg.control.action_clip_value)
        self.clip_obs = float(config.get_path("normalization.clip_observations", 100.0))

        # leg-only actuation (reference robot/g1/g1_only_leg.yaml:9 +
        # motion_tracking.py:757-758): the policy drives the first
        # `actions_dim` dofs; the rest PD-track the reference motion pose.
        # (The reference's torch.cat there is dormant/mis-bracketed; this is
        # its documented intent.)
        self.num_actions = int(rcfg.get("actions_dim", self.nd))
        self.only_track_leg = bool(rcfg.get("only_track_leg", False))
        if not self.only_track_leg:
            assert self.num_actions == self.nd, \
                f"actions_dim={self.num_actions} != num_dof={self.nd} requires only_track_leg"

        # ---- motion library
        self.motion_lib = MotionLib(rcfg.motion.motion_file, self.motion_model, num_envs, self.dt,
                                    fix_height=str(rcfg.motion.get("fix_height", "no_fix")))

        # ---- build-time DR -> per-env SimParams (reference isaacgym.py:299-549)
        dr = config.domain_rand
        self.dr = dr
        key, sub = jax.random.split(key)
        self.sim_params, self.dr_obs = self._sample_sim_params(sub)

        # ---- rewards (reference legged_robot_base.py:167-233)
        scales = {k: float(v) for k, v in config.rewards.reward_scales.items() if float(v) != 0.0}
        self.termination_scale = scales.pop("termination", 0.0) * self.dt
        self.reward_names = list(scales.keys())
        self.reward_scales = jnp.asarray([scales[k] * self.dt for k in self.reward_names])
        self.penalty_mask = jnp.asarray(
            [1.0 if k in list(config.rewards.reward_penalty_reward_names) else 0.0 for k in self.reward_names])
        self.use_vec_reward = bool(config.env.config.get("use_vec_reward", True))
        # +1 termination head in vec mode (reference legged_robot_base.py:230-233)
        self.num_rew_fn = (len(self.reward_names) + 1) if self.use_vec_reward else 1
        self.sigma_terms = list(config.rewards.reward_tracking_sigma.keys())
        self.sigma_init = jnp.asarray([float(config.rewards.reward_tracking_sigma[t]) for t in self.sigma_terms])

        # ---- obs spec
        self.obs_dims = {k: int(v) for k, v in config.obs.obs_dims.items()}
        self.history_spec = {
            group: {k: int(v) for k, v in sorted(dict(spec).items())}
            for group, spec in config.obs.obs_auxiliary.items()
        }
        self.max_episode_length_s = float(config.env.config.max_episode_length_s)
        self.max_episode_length = int(np.ceil(self.max_episode_length_s / self.dt))

        self.ecfg = config.env.config
        # init yaw of the reference motion (reference motion_tracking.py:186-187)
        st0 = get_motion_state(self.motion_lib.data, jnp.zeros(1, jnp.int32), jnp.zeros(1))
        self.ref_init_rpy = rot.get_euler_xyz(st0["root_rot"])  # [1,3]

    # ------------------------------------------------------------------ DR
    def _sample_sim_params(self, key):
        """Build-time DR: friction, base CoM bias, link mass/inertia scales."""
        N = self.num_envs
        m = self.sim_model
        dr = self.dr
        base = self.engine.default_params()
        ks = jax.random.split(key, 6)

        mass = jnp.broadcast_to(base.mass, (N, self.nb)).copy()
        inertia = jnp.broadcast_to(base.inertia, (N, self.nb, 3, 3)).copy()
        com = jnp.broadcast_to(base.com, (N, self.nb, 3)).copy()

        rand_names = list(dr.get("randomize_link_body_names", []))
        rand_idx = np.asarray([m.body_names.index(n) for n in rand_names if n in m.body_names], dtype=np.int64)

        link_mass_scale = jnp.ones((N, max(len(rand_idx), 1)))
        if dr.get("randomize_link_mass", False) and len(rand_idx):
            lo, hi = dr.link_mass_range
            link_mass_scale = jax.random.uniform(ks[0], (N, len(rand_idx)), minval=lo, maxval=hi)
            mass = mass.at[:, rand_idx].multiply(link_mass_scale)
            inertia = inertia.at[:, rand_idx].multiply(link_mass_scale[..., None, None])
        if dr.get("randomize_link_inertia", False) and len(rand_idx):
            lo, hi = dr.link_inertia_range
            iscale = jax.random.uniform(ks[1], (N, len(rand_idx)), minval=lo, maxval=hi)
            inertia = inertia.at[:, rand_idx].multiply(iscale[..., None, None])

        # heavy_upper: fixed mass+inertia ratio on the upper-body links
        # (reference isaacgym.py:519-534)
        hu = dr.get("heavy_upper", {})
        if hu and bool(hu.get("enable", False)):
            ratio = float(hu.get("ratio", 1.1))
            hu_idx = np.asarray([m.body_names.index(n) for n in hu.get("body_names", [])
                                 if n in m.body_names], dtype=np.int64)
            if len(hu_idx):
                mass = mass.at[:, hu_idx].multiply(ratio)
                inertia = inertia.at[:, hu_idx].multiply(ratio)

        # base added mass (reference isaacgym.py:538-549: uniform additive on
        # the pelvis, inertia left unchanged)
        base_added_mass = jnp.zeros((N,))
        if dr.get("randomize_base_mass", False):
            lo, hi = dr.added_mass_range
            base_idx = m.body_names.index("pelvis") if "pelvis" in m.body_names \
                else m.body_names.index("torso_link")
            base_added_mass = jax.random.uniform(ks[4], (N,), minval=lo, maxval=hi)
            mass = mass.at[:, base_idx].add(base_added_mass)

        base_com_bias = jnp.zeros((N, 3))
        if dr.get("randomize_base_com", False):
            r = dr.base_com_range
            lo = jnp.asarray([r.x[0], r.y[0], r.z[0]])
            hi = jnp.asarray([r.x[1], r.y[1], r.z[1]])
            base_com_bias = jax.random.uniform(ks[2], (N, 3), minval=lo, maxval=hi)
            com = com.at[:, 0].add(base_com_bias)

        friction = jnp.ones((N,))
        if dr.get("randomize_friction", False):
            lo, hi = dr.friction_range
            friction = jax.random.uniform(ks[3], (N,), minval=lo, maxval=hi)

        # per-env restitution (reference isaacgym.py:325-332; default off, 0.0)
        restitution = jnp.full((N,), float(
            (self.config.get("terrain") or {}).get("restitution", 0.0)))
        if dr.get("randomize_restitution", False):
            lo, hi = dr.restitution_range
            restitution = jax.random.uniform(ks[5], (N,), minval=lo, maxval=hi)

        params = SimParams(
            mass=mass,
            com=com,
            inertia=inertia,
            friction=friction,
            restitution=restitution,
            armature=jnp.broadcast_to(base.armature, (N, self.nd)),
            dof_damping=jnp.broadcast_to(base.dof_damping, (N, self.nd)),
            dof_frictionloss=jnp.broadcast_to(base.dof_frictionloss, (N, self.nd)),
        )
        dr_obs = {
            "base_com": base_com_bias,
            "base_mass": base_added_mass[:, None],
            "link_mass": link_mass_scale,
            "friction": friction[:, None],
        }
        return params, dr_obs

    # ------------------------------------------------------- MPPI snapshots
    @staticmethod
    def get_mppi_buffers(state: EnvState, env_ids):
        """Snapshot per-env state for MPPI-style branching rollouts
        (reference legged_robot_base.py:688-713). EnvState is a pure pytree,
        so the snapshot is one gather over the env axis."""
        n = state.episode_length.shape[0]

        def take(x):
            return x[env_ids] if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n else x

        return jax.tree.map(take, state)

    @staticmethod
    def set_mppi_buffers(state: EnvState, snapshot, env_ids):
        """Restore a snapshot into the given env slots (scatter over env axis;
        reference legged_robot_base.py:715-740 `set_mppi_buffers`)."""
        n = state.episode_length.shape[0]

        def put(full, snap):
            if hasattr(full, "ndim") and full.ndim >= 1 and full.shape[0] == n:
                return full.at[env_ids].set(snap)
            return full

        return jax.tree.map(put, state, snapshot)

    # --------------------------------------------------------------- helpers
    def _episodic_dr(self, key, n_shape):
        """Sample episodic DR fields (kp/kd/rfi/rao scales, delay, default pos).

        reference legged_robot_base.py:599-635."""
        dr = self.dr
        N = n_shape
        ks = jax.random.split(key, 8)
        one = jnp.ones((N, self.nd))
        kp_scale = jax.random.uniform(ks[0], (N, self.nd), minval=dr.kp_range[0], maxval=dr.kp_range[1]) \
            if dr.get("randomize_pd_gain", False) else one
        kd_scale = jax.random.uniform(ks[1], (N, self.nd), minval=dr.kd_range[0], maxval=dr.kd_range[1]) \
            if dr.get("randomize_pd_gain", False) else one
        # parallel/serial PD mismatch: multiplicative ratio on selected joints,
        # composed with randomize_pd_gain (reference legged_robot_base.py:607-615)
        pspd = dr.get("parallel_serial_pd", {})
        if pspd and bool(pspd.get("enable", False)):
            jidx = np.asarray(list(pspd.joint_idx), dtype=np.int64)
            lo, hi = pspd.ratio
            ratio = jax.random.uniform(ks[6], (N, len(jidx)), minval=lo, maxval=hi)
            ratio_d = jax.random.uniform(ks[7], (N, len(jidx)), minval=lo, maxval=hi)
            kp_scale = kp_scale.at[:, jidx].multiply(ratio)
            kd_scale = kd_scale.at[:, jidx].multiply(ratio_d)
        rfi = jax.random.uniform(ks[2], (N, self.nd), minval=dr.rfi_lim_range[0], maxval=dr.rfi_lim_range[1]) \
            if dr.get("randomize_rfi_lim", False) else one
        rao = jax.random.uniform(ks[3], (N, self.nd), minval=-dr.rao_lim, maxval=dr.rao_lim) \
            if dr.get("use_rao", False) else jnp.zeros((N, self.nd))
        pstau = dr.get("parallel_serial_tau", {})
        if pstau and bool(pstau.get("enable", False)):
            # gaussian actuation-offset bump on the parallel-mechanism joints
            # (reference legged_robot_base.py:621-623)
            tidx = np.asarray(list(pstau.joint_idx), dtype=np.int64)
            g = jax.random.normal(jax.random.fold_in(ks[3], 7), (N, len(tidx)))
            rao = rao.at[:, tidx].add(float(pstau.rao_lim) * g)
        delay_idx = jax.random.randint(ks[4], (N,), dr.ctrl_delay_step_range[0], dr.ctrl_delay_step_range[1] + 1) \
            if dr.get("randomize_ctrl_delay", False) else jnp.zeros((N,), jnp.int32)
        default_dof = jnp.broadcast_to(self.raw_default_dof_pos, (N, self.nd))
        if dr.get("randomize_default_dof_pos", False):
            lo, hi = dr.dof_pos_range
            default_dof = default_dof + jax.random.uniform(ks[5], (N, self.nd), minval=lo, maxval=hi)
        return kp_scale, kd_scale, rfi, rao, delay_idx.astype(jnp.int32), default_dof

    def _extend_body_states(self, sim: SimState):
        """FK the virtual hand/head bodies from their parents.

        reference motion_tracking.py:619-643."""
        pid = self.extend_parent_ids
        pq = sim.body_quat[:, pid]                                  # [N,E,4]
        pp = sim.body_pos[:, pid]
        pos = rot.quat_rotate(pq, jnp.broadcast_to(self.extend_pos, pq.shape[:-1] + (3,))) + pp
        quat = rot.quat_mul(pq, jnp.broadcast_to(self.extend_rot_xyzw, pq.shape))
        ang_vel = sim.body_ang_vel[:, pid]
        lin_vel = sim.body_lin_vel[:, pid] + jnp.cross(ang_vel, pos - pp)
        body_pos = jnp.concatenate([sim.body_pos, pos], axis=1)      # [N,B+E,3]
        body_quat = jnp.concatenate([sim.body_quat, quat], axis=1)
        body_vel = jnp.concatenate([sim.body_lin_vel, lin_vel], axis=1)
        body_ang_vel = jnp.concatenate([sim.body_ang_vel, ang_vel], axis=1)
        return body_pos, body_quat, body_vel, body_ang_vel

    def _motion_state_at(self, state: EnvState, step_offset=1):
        t = (state.episode_length + step_offset).astype(jnp.float32) * self.dt + state.motion_start_times
        off = state.origin_shift if self.terrain is not None else None
        return get_motion_state(self.motion_lib.data, state.motion_ids, t, offset=off), t

    def _compute_diffs(self, sim, mres, body_pos, body_quat, body_vel, body_ang_vel):
        """Reference-vs-sim difference tensors (reference motion_tracking.py:645-665;
        general_tracking overrides the rotation diff with a quaternion product)."""
        return {
            "dif_body_pos": mres["rg_pos_t"] - body_pos,            # [N,BE,3]
            "dif_body_rot": mres["rg_rot_t"] - body_quat,
            "dif_body_vel": mres["body_vel_t"] - body_vel,
            "dif_body_ang_vel": mres["body_ang_vel_t"] - body_ang_vel,
            "dif_joint_pos": mres["dof_pos"] - sim.dof_pos,
            "dif_joint_vel": mres["dof_vel"] - sim.dof_vel,
        }

    def _extra_terminations(self, term, rs, state):
        """Subclass hook for additional termination conditions."""
        return term

    # ------------------------------------------------------------------ reset
    def init_state(self, key) -> EnvState:
        N = self.num_envs
        k1, k2, k3, k4, krest = jax.random.split(key, 5)
        sim0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape),
                            self.engine.default_state())
        kp_s, kd_s, rfi, rao, delay, ddof = self._episodic_dr(k1, N)
        Q = int(self.dr.get("ctrl_delay_step_range", [0, 2])[1]) + 1
        # per-key ring buffers sized to the max length across aux groups
        key_len: Dict[str, int] = {}
        for spec in self.history_spec.values():
            for k, l in spec.items():
                key_len[k] = max(key_len.get(k, 0), l)
        hist = {k: jnp.zeros((N, l, self.obs_dims[k])) for k, l in key_len.items()}

        zero = jnp.zeros((N, self.nd))
        state = EnvState(
            sim=sim0,
            rng=krest,
            episode_length=jnp.zeros((N,), jnp.int32),
            actions=zero, last_actions=zero, actions_after_delay=zero,
            last_dof_vel=zero, torques=zero,
            action_queue=jnp.zeros((N, Q, self.nd)),
            action_delay_idx=delay,
            contacts=jnp.zeros((N, 2)), contacts_filt=jnp.zeros((N, 2)),
            last_contacts=jnp.zeros((N, 2)), last_contacts_filt=jnp.zeros((N, 2)),
            feet_air_time=jnp.zeros((N, 2)),
            motion_ids=jnp.zeros((N,), jnp.int32),
            motion_start_times=jnp.zeros((N,)),
            motion_len=jnp.broadcast_to(self.motion_lib.data.lengths[0], (N,)),
            motion_fail_ema=jnp.zeros((self.motion_lib.num_unique,), jnp.float32),
            terrain_level=(jax.random.randint(
                k4, (N,), 0, self.max_init_terrain_level + 1)
                if self.terrain is not None else jnp.zeros((N,), jnp.int32)),
            origin_shift=jnp.zeros((N, 3)),
            kp_scale=kp_s, kd_scale=kd_s, rfi_lim_scale=rfi, rao_scale=rao,
            default_dof_pos=ddof,
            push_counter=jnp.zeros((N,), jnp.int32),
            push_interval=self._sample_push_interval(k2, N),
            # NOTE: explicit dtype => strong typing, so the stepped state's
            # avals match the initial state's (weak scalars silently retrace)
            average_episode_length=jnp.asarray(0.0, dtype=jnp.float32),
            reward_penalty_scale=jnp.asarray(
                float(self.config.rewards.reward_initial_penalty_scale), dtype=jnp.float32),
            motion_far_threshold=jnp.asarray(
                float(self.ecfg.termination_curriculum.terminate_when_motion_far_initial_threshold)
                if self.ecfg.termination_curriculum.terminate_when_motion_far_curriculum
                else float(self.ecfg.termination_scales.termination_motion_far_threshold),
                dtype=jnp.float32),
            dof_far_threshold=jnp.asarray(
                float(self.ecfg.termination_curriculum.terminate_when_dof_far_curriculum.init),
                dtype=jnp.float32),
            soft_dof_pos_limit=jnp.asarray(
                float(self.config.rewards.reward_limit.reward_limits_curriculum.soft_dof_pos_initial_limit),
                dtype=jnp.float32),
            soft_dof_vel_limit=jnp.asarray(
                float(self.config.rewards.reward_limit.reward_limits_curriculum.soft_dof_vel_initial_limit),
                dtype=jnp.float32),
            soft_torque_limit=jnp.asarray(
                float(self.config.rewards.reward_limit.reward_limits_curriculum.soft_torque_initial_limit),
                dtype=jnp.float32),
            sdc_alpha=jnp.asarray(
                float(self.ecfg.soft_dynamic_correction.get("alpha", 0.0)), dtype=jnp.float32),
            noise_curriculum_value=jnp.asarray(
                float(self.config.obs.noise_initial_value)
                if bool(self.config.obs.get("add_noise_currculum", False)) else 1.0,
                dtype=jnp.float32),
            sigma_values=self.sigma_init,
            sigma_ema=self.sigma_init,
            noise_ou=jnp.zeros((N, 6)),
            history=hist,
            last_episode_length=jnp.zeros((N,), jnp.int32),
        )
        # reset every env to a motion-sampled state
        state = self._reset_envs(state, jnp.ones((N,), bool), k3)
        return state

    def _sample_push_interval(self, key, N):
        lo, hi = self.dr.get("push_interval_s", [5, 10])
        secs = jax.random.randint(key, (N,), int(lo), int(hi))
        return (secs.astype(jnp.float32) / self.dt).astype(jnp.int32)

    def reset_to_start(self, state: EnvState, key) -> EnvState:
        """Deterministic evaluation reset: every env to motion t=0 with its
        current motion id (reference eval_agent forces num_envs=1 episodes
        that play the clip from the beginning, eval_agent.py:151)."""
        mask = jnp.ones((self.num_envs,), bool)
        return self._reset_envs(state, mask, key,
                                force_start_times=jnp.zeros((self.num_envs,)),
                                resample_ids=False)

    def _reset_envs(self, state: EnvState, mask, key,
                    force_start_times=None, resample_ids=True) -> EnvState:
        """Masked reset: motion-time resample + state init from reference pose.

        reference motion_tracking.py:369-383,445-543 + legged base reset chain."""
        N = self.num_envs
        ks = jax.random.split(key, 10)
        ecfg = self.ecfg

        # resample the motion id per reset env (multi-motion libraries keep all
        # clips on device, so per-reset resampling subsumes the reference's
        # periodic resample_motion(), motion_tracking.py:385-389)
        if self.motion_lib.num_unique > 1 and resample_ids:
            probs = self.motion_lib.data.sampling_prob
            asc = self.ecfg.get("adaptive_motion_sampling")
            if asc and bool(asc.get("enabled", False)):
                # hard-motion oversampling: mix uniform with per-motion
                # failure-rate EMA (a working realization of the reference's
                # dormant _termination_history/_sampling_prob machinery,
                # motion_lib_base.py:113-118)
                umix = float(asc.get("uniform_mix", 0.5))
                w = state.motion_fail_ema + 1e-3
                probs = umix * probs + (1.0 - umix) * w / w.sum()
            new_ids = jax.random.categorical(
                ks[8], jnp.log(probs), shape=(N,)).astype(jnp.int32)
            motion_ids = jnp.where(mask, new_ids, state.motion_ids)
        else:
            motion_ids = state.motion_ids
        state = dataclasses.replace(state, motion_ids=motion_ids)

        # resample start times (uniform phase; reference sample_time) unless
        # the caller pins them (deterministic eval resets)
        new_start = (sample_time(self.motion_lib.data, ks[0], state.motion_ids)
                     if force_start_times is None else force_start_times)
        motion_start = jnp.where(mask, new_start, state.motion_start_times)
        # masked: non-reset envs keep their episode's length even though their
        # ids are unchanged today (guards the id/len update-order coupling)
        motion_len = jnp.where(
            mask, self.motion_lib.data.lengths[state.motion_ids], state.motion_len)

        # episode bufs
        episode_length = jnp.where(mask, 0, state.episode_length)

        # fetch reference state at (epl+1)*dt + start for the NEW times
        t = (episode_length + 1).astype(jnp.float32) * self.dt + motion_start
        mres = get_motion_state(self.motion_lib.data, state.motion_ids, t)

        # terrain curriculum + per-env origins (reference base_task.py:111-142
        # assigns origins over the difficulty grid; the level up/down rule
        # realizes the reference docstring's dormant _update_terrain_curriculum:
        # near-complete episodes move a row up, early failures a row down)
        terrain_level, origin_shift = state.terrain_level, state.origin_shift
        if self.terrain is not None:
            if self.terrain_curriculum:
                horizon = jnp.minimum(state.motion_len, self.max_episode_length_s)
                ratio = state.last_episode_length.astype(jnp.float32) * self.dt \
                    / jnp.maximum(horizon, self.dt)
                lvl = terrain_level + (ratio >= 0.8).astype(jnp.int32) \
                    - (ratio < 0.4).astype(jnp.int32)
                lvl = jnp.clip(lvl, 0, self.terrain.cfg.num_rows - 1)
                # envs that never ran an episode (init reset) keep their level
                terrain_level = jnp.where(
                    mask & (state.last_episode_length > 0), lvl, terrain_level)
            origin = self.terrain_origins[terrain_level, self.terrain_types]
            shift = jnp.stack([origin[:, 0] - mres["root_pos"][:, 0],
                               origin[:, 1] - mres["root_pos"][:, 1],
                               origin[:, 2]], axis=-1)
            origin_shift = jnp.where(mask[:, None], shift, origin_shift)
            # translate the reference fetch onto the assigned tile; subsequent
            # per-step fetches apply the same state.origin_shift
            mres["root_pos"] = mres["root_pos"] + origin_shift
            mres["rg_pos"] = mres["rg_pos"] + origin_shift[:, None, :]

        nl = float(ecfg.noise_to_initial_level)
        ins = ecfg.init_noise_scale
        root_pos = mres["root_pos"] + jax.random.normal(ks[1], (N, 3)) * float(ins.root_pos) * nl
        rq_noise = rot.small_random_quat(ks[2], (N,), float(ins.root_rot) * 3.14 / 180 * nl)
        root_quat = rot.quat_mul(rq_noise, mres["root_rot"])
        root_vel = mres["root_vel"] + jax.random.normal(ks[3], (N, 3)) * float(ins.root_vel) * nl
        root_ang = mres["root_ang_vel"] + jax.random.normal(ks[4], (N, 3)) * float(ins.root_ang_vel) * nl
        dof_pos = mres["dof_pos"] + jax.random.normal(ks[5], (N, self.nd)) * float(ins.dof_pos) * nl
        dof_vel = mres["dof_vel"] + jax.random.normal(ks[6], (N, self.nd)) * float(ins.dof_vel) * nl

        m1 = mask[:, None]
        sim = dataclasses.replace(
            state.sim,
            root_pos=jnp.where(m1, root_pos, state.sim.root_pos),
            root_quat=jnp.where(m1, root_quat, state.sim.root_quat),
            root_lin_vel=jnp.where(m1, root_vel, state.sim.root_lin_vel),
            root_ang_vel=jnp.where(m1, root_ang, state.sim.root_ang_vel),
            dof_pos=jnp.where(m1, dof_pos, state.sim.dof_pos),
            dof_vel=jnp.where(m1, dof_vel, state.sim.dof_vel),
        )
        # refresh derived body-state caches. With zero init noise the reset
        # state IS the reference state, so the pre-FK'd motion-library body
        # states are exact — a masked gather replaces what was a full per-env
        # FK + matrix->quat for ALL envs every step (measured ~400 MB HBM and
        # a third of the non-physics step cost). Non-reset envs keep their
        # post-physics derived state untouched.
        if nl == 0.0:
            nb = self.engine.nb
            m3 = mask[:, None, None]
            sim = dataclasses.replace(
                sim,
                body_pos=jnp.where(m3, mres["rg_pos"][:, :nb], state.sim.body_pos),
                body_quat=jnp.where(m3, mres["rb_rot"][:, :nb], state.sim.body_quat),
                body_lin_vel=jnp.where(m3, mres["body_vel"][:, :nb], state.sim.body_lin_vel),
                body_ang_vel=jnp.where(m3, mres["body_ang_vel"][:, :nb], state.sim.body_ang_vel),
            )
        else:
            sim = jax.vmap(self.engine.derived_state)(self.sim_params, sim)

        # episodic DR resample for reset envs
        kp_s, kd_s, rfi, rao, delay, ddof = self._episodic_dr(ks[7], N)
        w2 = lambda new, old: jnp.where(m1, new, old)
        hist = {k: jnp.where(mask[:, None, None], 0.0, v) for k, v in state.history.items()}

        zero = jnp.zeros((self.num_envs, self.nd))
        return dataclasses.replace(
            state,
            sim=sim,
            episode_length=episode_length,
            motion_start_times=motion_start,
            motion_len=motion_len,
            terrain_level=terrain_level,
            origin_shift=origin_shift,
            actions=w2(zero, state.actions),
            last_actions=w2(zero, state.last_actions),
            actions_after_delay=w2(zero, state.actions_after_delay),
            last_dof_vel=w2(zero, state.last_dof_vel),
            action_queue=jnp.where(mask[:, None, None], 0.0, state.action_queue),
            action_delay_idx=jnp.where(mask, delay, state.action_delay_idx),
            kp_scale=w2(kp_s, state.kp_scale),
            kd_scale=w2(kd_s, state.kd_scale),
            rfi_lim_scale=w2(rfi, state.rfi_lim_scale),
            rao_scale=w2(rao, state.rao_scale),
            default_dof_pos=w2(ddof, state.default_dof_pos),
            contacts=jnp.where(m1, 0.0, state.contacts),
            contacts_filt=jnp.where(m1, 0.0, state.contacts_filt),
            last_contacts=jnp.where(m1, 0.0, state.last_contacts),
            last_contacts_filt=jnp.where(m1, 0.0, state.last_contacts_filt),
            feet_air_time=jnp.where(m1, 0.0, state.feet_air_time),
            history=hist,
        )

    # ------------------------------------------------------------------- step
    def step(self, state: EnvState, actions):
        """One control step. Returns (state, obs_dict, rew [N,R], done, info)."""
        ecfg = self.ecfg
        N = self.num_envs
        key, k_step, k_push, k_reset, k_obs, k_term = jax.random.split(state.rng, 6)

        # ---- pre-physics (reference legged_robot_base.py:267-285)
        if self.only_track_leg:
            # expand [N, actions_dim] policy actions to the full dof vector:
            # non-policy dofs get the action whose PD target equals the
            # reference pose (reference motion_tracking.py:757-758 intent)
            mres_leg, _ = self._motion_state_at(state, 1)
            na = self.num_actions
            rest = (mres_leg["dof_pos"][:, na:] - state.default_dof_pos[:, na:]) \
                / self.action_scales[na:]
            actions = jnp.concatenate([actions, rest], axis=-1)
        actions = jnp.clip(actions, -self.action_clip, self.action_clip)
        if self.dr.get("randomize_ctrl_delay", False):
            queue = jnp.concatenate([actions[:, None], state.action_queue[:, :-1]], axis=1)
            after_delay = jnp.take_along_axis(
                queue, state.action_delay_idx[:, None, None].astype(jnp.int32).repeat(self.nd, -1), axis=1
            )[:, 0]
        else:
            queue = state.action_queue
            after_delay = actions

        # ---- push robots (reference legged_robot_base.py:382-388,1090-1104)
        sim = state.sim
        push_counter = state.push_counter + 1
        push_interval = state.push_interval
        if self.dr.get("push_robots", False):
            do_push = push_counter >= push_interval
            kpv, kpi = jax.random.split(k_push)
            max_vel = float(self.dr.max_push_vel_xy)
            push_vel = jax.random.uniform(kpv, (N, 2), minval=-max_vel, maxval=max_vel)
            vel_xy = sim.root_lin_vel[:, :2]
            new_xy = vel_xy + push_vel if self.dr.get("_push_fixed", False) else push_vel
            sim = dataclasses.replace(
                sim, root_lin_vel=jnp.where(do_push[:, None],
                                            jnp.concatenate([new_xy, sim.root_lin_vel[:, 2:]], -1),
                                            sim.root_lin_vel))
            push_counter = jnp.where(do_push, 0, push_counter)
            push_interval = jnp.where(do_push, self._sample_push_interval(kpi, N), push_interval)

        # ---- physics (reference legged_robot_base.py:287-295 + _compute_torques:795-838)
        kp_eff = state.kp_scale * self.p_gains
        kd_eff = state.kd_scale * self.d_gains
        target = after_delay * self.action_scales + state.default_dof_pos

        pstau = self.dr.get("parallel_serial_tau", {})
        use_pstau = bool(pstau and pstau.get("enable", False))
        if use_pstau:
            pst_idx = np.asarray(list(pstau.joint_idx), dtype=np.int64)

        def torque_fn(st, key, kp_eff=None, kd_eff=None, target=None, rfi=None, rao=None):
            tau = kp_eff * (target - st.dof_pos) - kd_eff * st.dof_vel
            if self.dr.get("randomize_torque_rfi", False):
                noise = jax.random.uniform(key, tau.shape, minval=-1.0, maxval=1.0)
                tau = tau + noise * float(self.dr.rfi_lim) * rfi * self.torque_limits
            if use_pstau:
                # gaussian torque injection on the parallel-mechanism joints
                # (reference legged_robot_base.py:821-827)
                g = jax.random.normal(jax.random.fold_in(key, 1), tau[..., pst_idx].shape)
                tau = tau.at[..., pst_idx].add(
                    float(pstau.rfi_lim) * self.torque_limits[pst_idx] * g)
            if self.dr.get("use_rao", False):
                tau = tau + rao * self.torque_limits
            return jnp.clip(tau, -self.torque_limits, self.torque_limits)

        sub_keys = jax.random.split(k_step, N * self.decimation).reshape(N, self.decimation, 2)

        # soft dynamic correction (reference motion_tracking.py:772-853): each
        # substep the state is pulled toward the reference pose by a fraction
        # such that the whole control step applies `sdc_alpha` total
        sdc_cfg = self.ecfg.soft_dynamic_correction
        use_sdc = bool(sdc_cfg.get("enable", False))
        if use_sdc:
            st_next = dataclasses.replace(state, sim=sim)
            sdc_res, _ = self._motion_state_at(st_next, 1)
            substep_alpha = 1.0 - (1.0 - state.sdc_alpha) ** (1.0 / self.decimation)
            k_sdc, _ = jax.random.split(k_push)
            if str(sdc_cfg.get("type", "deter")) == "prob":
                gate = (jax.random.uniform(k_sdc, (N,)) < jnp.sqrt(state.sdc_alpha)).astype(jnp.float32)
            else:
                gate = jnp.ones((N,))
            gate = gate * (state.sdc_alpha >= 0.005).astype(jnp.float32)
            alpha_env = substep_alpha * gate                          # [N]

            def make_pre_fn(a, tgt_pos, tgt_quat, tgt_vel, tgt_ang, tgt_dof, tgt_dofv):
                def pre(st):
                    return dataclasses.replace(
                        st,
                        root_pos=st.root_pos + a * (tgt_pos - st.root_pos),
                        root_quat=rot.slerp(st.root_quat, tgt_quat, a[None]),
                        root_lin_vel=st.root_lin_vel + a * (tgt_vel - st.root_lin_vel),
                        root_ang_vel=st.root_ang_vel + a * (tgt_ang - st.root_ang_vel),
                        dof_pos=st.dof_pos + a * (tgt_dof - st.dof_pos),
                        dof_vel=st.dof_vel + a * (tgt_dofv - st.dof_vel),
                    )
                return pre

            if self.engine.opt.solver == "lanes":
                # batched SDC pre-fn for the env-in-lanes engine path
                a2 = alpha_env[:, None]

                def pre_b(st):
                    return dataclasses.replace(
                        st,
                        root_pos=st.root_pos + a2 * (sdc_res["root_pos"] - st.root_pos),
                        root_quat=rot.slerp(st.root_quat, sdc_res["root_rot"], a2),
                        root_lin_vel=st.root_lin_vel + a2 * (sdc_res["root_vel"] - st.root_lin_vel),
                        root_ang_vel=st.root_ang_vel + a2 * (sdc_res["root_ang_vel"] - st.root_ang_vel),
                        dof_pos=st.dof_pos + a2 * (sdc_res["dof_pos"] - st.dof_pos),
                        dof_vel=st.dof_vel + a2 * (sdc_res["dof_vel"] - st.dof_vel),
                    )

                def torque_fn_sdc(st, key):
                    tau = kp_eff * (target - st.dof_pos) - kd_eff * st.dof_vel
                    if self.dr.get("randomize_torque_rfi", False):
                        noise = jax.random.uniform(key, tau.shape, minval=-1.0, maxval=1.0)
                        tau = tau + noise * float(self.dr.rfi_lim) * state.rfi_lim_scale * self.torque_limits
                    if self.dr.get("use_rao", False):
                        tau = tau + state.rao_scale * self.torque_limits
                    return jnp.clip(tau, -self.torque_limits, self.torque_limits)

                sim, torques = self.lanes_engine.control_step_batched(
                    self.sim_params, sim, torque_fn_sdc, self.decimation,
                    jax.random.split(k_step, self.decimation), pre_substep_fn=pre_b)
            else:
                def env_physics(params, st, kp_e, kd_e, tg, rfi, rao, keys, a,
                                tp, tq, tv, ta, td, tdv):
                    fn = lambda s, k: torque_fn(s, k, kp_e, kd_e, tg, rfi, rao)
                    pre = make_pre_fn(a, tp, tq, tv, ta, td, tdv)
                    return self.engine.control_step(params, st, fn, self.decimation, keys, pre_substep_fn=pre)

                sim, torques = jax.vmap(env_physics)(
                    self.sim_params, sim, kp_eff, kd_eff, target, state.rfi_lim_scale,
                    state.rao_scale, sub_keys, alpha_env,
                    sdc_res["root_pos"], sdc_res["root_rot"], sdc_res["root_vel"],
                    sdc_res["root_ang_vel"], sdc_res["dof_pos"], sdc_res["dof_vel"])
        elif self.engine.opt.solver == "lanes":
            keys_b = jax.random.split(k_step, self.decimation)

            def torque_fn_l(st, key):
                tau = kp_eff * (target - st.dof_pos) - kd_eff * st.dof_vel
                if self.dr.get("randomize_torque_rfi", False):
                    noise = jax.random.uniform(key, tau.shape, minval=-1.0, maxval=1.0)
                    tau = tau + noise * float(self.dr.rfi_lim) * state.rfi_lim_scale * self.torque_limits
                if self.dr.get("use_rao", False):
                    tau = tau + state.rao_scale * self.torque_limits
                return jnp.clip(tau, -self.torque_limits, self.torque_limits)

            sim, torques = self.lanes_engine.control_step_batched(
                self.sim_params, sim, torque_fn_l, self.decimation, keys_b)
        elif self.engine.opt.solver == "pallas" and N % 128 == 0:
            # batched path: the contact solve runs as ONE Pallas kernel over
            # the env batch instead of vmapped per-env solves
            keys_b = jax.random.split(k_step, self.decimation)

            def torque_fn_b(st, key):
                tau = kp_eff * (target - st.dof_pos) - kd_eff * st.dof_vel
                if self.dr.get("randomize_torque_rfi", False):
                    noise = jax.random.uniform(key, tau.shape, minval=-1.0, maxval=1.0)
                    tau = tau + noise * float(self.dr.rfi_lim) * state.rfi_lim_scale * self.torque_limits
                if self.dr.get("use_rao", False):
                    tau = tau + state.rao_scale * self.torque_limits
                return jnp.clip(tau, -self.torque_limits, self.torque_limits)

            sim, torques = self.engine.control_step_batched(
                self.sim_params, sim, torque_fn_b, self.decimation, keys_b)
        else:
            def env_physics(params, st, kp_e, kd_e, tg, rfi, rao, keys):
                fn = lambda s, k: torque_fn(s, k, kp_e, kd_e, tg, rfi, rao)
                return self.engine.control_step(params, st, fn, self.decimation, keys)

            sim, torques = jax.vmap(env_physics)(
                self.sim_params, sim, kp_eff, kd_eff, target, state.rfi_lim_scale, state.rao_scale, sub_keys)

        episode_length = state.episode_length + 1

        # ---- post-physics quantities (reference legged_robot_base.py:346-380)
        base_quat = sim.root_quat
        projected_gravity = rot.quat_rotate_inverse(base_quat, jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (N, 3)))
        base_lin_vel = rot.quat_rotate_inverse(base_quat, sim.root_lin_vel)
        base_ang_vel = rot.quat_rotate_inverse(base_quat, sim.root_ang_vel)
        feet_cf = sim.contact_forces[:, self.feet_indices]
        contacts = (jnp.linalg.norm(feet_cf, axis=-1) > 1.0).astype(jnp.float32)
        contacts_filt = jnp.logical_or(contacts > 0, state.last_contacts > 0).astype(jnp.float32)

        # ---- reference motion + extend bodies + diffs. The reference tracks
        # the NEXT frame: motion_times = (episode_length+1)*dt after the
        # counter increment ("next frames so +1", motion_tracking.py:554)
        st_tmp = dataclasses.replace(state, episode_length=episode_length, sim=sim)
        mres, motion_times = self._motion_state_at(st_tmp, 1)
        body_pos, body_quat, body_vel, body_ang_vel = self._extend_body_states(sim)

        diffs = self._compute_diffs(sim, mres, body_pos, body_quat, body_vel, body_ang_vel)
        dif_body_pos = diffs["dif_body_pos"]
        dif_body_rot = diffs["dif_body_rot"]
        dif_body_vel = diffs["dif_body_vel"]
        dif_body_ang_vel = diffs["dif_body_ang_vel"]
        dif_joint_pos = diffs["dif_joint_pos"]
        dif_joint_vel = diffs["dif_joint_vel"]

        # ---- termination (reference legged_robot_base.py:408-489 + motion_tracking.py:330-357)
        term = {}
        tcfg = ecfg.termination
        tscl = ecfg.termination_scales
        reset_buf = jnp.zeros((N,), bool)
        if tcfg.terminate_by_contact:
            term["contact"] = jnp.any(
                jnp.linalg.norm(sim.contact_forces[:, self.termination_contact_indices], axis=-1) > 1.0, axis=1)
        if tcfg.terminate_by_gravity:
            term["gravity"] = jnp.linalg.norm(projected_gravity[:, :2], axis=-1) > float(tscl.termination_gravity)
        if tcfg.terminate_by_low_height:
            term["low_height"] = sim.root_pos[:, 2] < float(tscl.termination_min_base_height)
        if tcfg.terminate_when_motion_far:
            term["motion_far"] = jnp.any(
                jnp.linalg.norm(dif_body_pos, axis=-1) > state.motion_far_threshold, axis=-1)
        if tcfg.terminate_when_dof_far:
            term["dof_far"] = jnp.linalg.norm(dif_joint_pos, axis=-1) > state.dof_far_threshold
        # probabilistic close-to-limit terminations: one Bernoulli gate per
        # step shared across envs (reference legged_robot_base.py:449-477)
        tprob = ecfg.termination_probality
        kt = jax.random.split(k_term, 3)
        if tcfg.get("terminate_when_close_to_dof_pos_limit", False):
            m = (self.dof_pos_limits[:, 0] + self.dof_pos_limits[:, 1]) / 2
            r = self.dof_pos_limits[:, 1] - self.dof_pos_limits[:, 0]
            s = float(tscl.termination_close_to_dof_pos_limit)
            out = (-jnp.clip(sim.dof_pos - (m - 0.5 * r * s), None, 0.0)
                   + jnp.clip(sim.dof_pos - (m + 0.5 * r * s), 0.0, None)).sum(-1)
            gate = jax.random.uniform(kt[0], ()) < float(tprob.terminate_when_close_to_dof_pos_limit)
            term["dof_pos_limit"] = (out > 0) & gate
        if tcfg.get("terminate_when_close_to_dof_vel_limit", False):
            out = jnp.clip(jnp.abs(sim.dof_vel) - self.dof_vel_limits
                           * float(tscl.termination_close_to_dof_vel_limit), 0.0, 1.0).sum(-1)
            gate = jax.random.uniform(kt[1], ()) < float(tprob.terminate_when_close_to_dof_vel_limit)
            term["dof_vel_limit"] = (out > 0) & gate
        if tcfg.get("terminate_when_close_to_torque_limit", False):
            out = jnp.clip(jnp.abs(torques) - self.torque_limits
                           * float(tscl.termination_close_to_torque_limit), 0.0, 1.0).sum(-1)
            gate = jax.random.uniform(kt[2], ()) < float(tprob.terminate_when_close_to_torque_limit)
            term["torque_limit"] = (out > 0) & gate
        term = self._extra_terminations(term, diffs, state)
        # non-finite state guard: NaN/Inf fails every comparison above, so a
        # blown-up env would otherwise NEVER terminate and poison the batch
        # until timeout (the reference instead hard-asserts on NaN,
        # motion_tracking.py:64-66; resetting the env is the jit-safe analog)
        term["nonfinite"] = ~(
            jnp.isfinite(sim.dof_pos).all(-1)
            & jnp.isfinite(sim.dof_vel).all(-1)
            & jnp.isfinite(sim.root_pos).all(-1)
            & jnp.isfinite(sim.root_quat).all(-1))
        for v in term.values():
            reset_buf = reset_buf | v

        time_out = episode_length > self.max_episode_length
        if tcfg.terminate_when_motion_end:
            # reference uses the CURRENT time here, not the +1 target time
            # (motion_tracking.py:355)
            current_time = episode_length.astype(jnp.float32) * self.dt + state.motion_start_times
            motion_end = current_time > state.motion_len
            term["motion_end"] = motion_end
            time_out = time_out | motion_end
        term["time_out"] = time_out
        reset_buf = reset_buf | time_out

        # ---- rewards (vectorized; reference order = config order)
        rew_state = dict(
            sim=sim, torques=torques, actions=actions, last_actions=state.last_actions,
            last_dof_vel=state.last_dof_vel, projected_gravity=projected_gravity,
            contacts=contacts, contacts_filt=contacts_filt,
            last_contacts=state.last_contacts, last_contacts_filt=state.last_contacts_filt,
            feet_air_time=state.feet_air_time,
            dif_body_pos=dif_body_pos, dif_body_rot=dif_body_rot,
            dif_body_vel=dif_body_vel, dif_body_ang_vel=dif_body_ang_vel,
            dif_joint_pos=dif_joint_pos, dif_joint_vel=dif_joint_vel,
            body_vel=body_vel, ref_contact_mask=mres["contact_mask"],
            reset_buf=reset_buf, time_out=time_out,
            base_lin_vel=base_lin_vel, mres=mres, diffs=diffs,
            body_pos=body_pos, body_quat=body_quat, body_ang_vel=body_ang_vel,
        )
        rew_vec, sigma_values, sigma_ema, feet_air_time, errors = self._compute_rewards(state, rew_state)

        # ---- masked reset + curricula
        n_reset = reset_buf.sum()
        avg_epl = self._update_avg_episode_length(state, episode_length, reset_buf, n_reset)
        # per-motion failure-rate EMA (feeds adaptive_motion_sampling; a
        # failure = termination not caused by motion end / timeout)
        motion_fail_ema = state.motion_fail_ema
        asc = self.ecfg.get("adaptive_motion_sampling")
        if self.motion_lib.num_unique > 1 and asc and bool(asc.get("enabled", False)):
            M = self.motion_lib.num_unique
            g = float(asc.get("gamma", 0.1))
            resets = jax.ops.segment_sum(reset_buf.astype(jnp.float32), state.motion_ids, M)
            fails = jax.ops.segment_sum((reset_buf & ~time_out).astype(jnp.float32),
                                        state.motion_ids, M)
            rate = fails / jnp.maximum(resets, 1.0)
            motion_fail_ema = jnp.where(resets > 0,
                                        (1.0 - g) * motion_fail_ema + g * rate,
                                        motion_fail_ema)
        state2 = dataclasses.replace(
            state, sim=sim, episode_length=episode_length,
            feet_air_time=feet_air_time,
            average_episode_length=avg_epl,
            motion_fail_ema=motion_fail_ema,
            sigma_values=sigma_values, sigma_ema=sigma_ema,
            push_counter=push_counter, push_interval=push_interval,
            action_queue=queue, actions=actions, actions_after_delay=after_delay,
            torques=torques,
            last_episode_length=episode_length,
        )
        state2 = self._update_curricula(state2, n_reset)
        state2 = self._reset_envs(state2, reset_buf, k_reset)

        # ---- post-reset obs (recompute quantities for consistency)
        np_cfg = self.config.obs.get("noise_process")
        if np_cfg and bool(np_cfg.get("enable", False)):
            from pbhc_tpu.utils.noise_tool import ou_step

            kw = dict(np_cfg.get("kwargs", {}))
            noise_ou, _ = ou_step(state2.noise_ou, k_obs, self.dt,
                                  theta=float(kw.get("theta", 1.0)),
                                  sigma=float(kw.get("sigma", 1.0)))
            noise_ou = jnp.where(reset_buf[:, None], 0.0, noise_ou)
            state2 = dataclasses.replace(state2, noise_ou=noise_ou)
        obs_dict, hist = self._compute_observations(state2, k_obs)
        state3 = dataclasses.replace(
            state2, rng=key, history=hist,
            last_actions=state2.actions,
            last_dof_vel=state2.sim.dof_vel,
            last_contacts=jnp.where(reset_buf[:, None], 0.0, contacts),
            last_contacts_filt=jnp.where(reset_buf[:, None], 0.0, contacts_filt),
            contacts=jnp.where(reset_buf[:, None], 0.0, contacts),
            contacts_filt=jnp.where(reset_buf[:, None], 0.0, contacts_filt),
        )

        info = {
            "time_outs": time_out,
            "log": self._build_log(term, reset_buf, rew_vec, errors, state3),
        }
        if not self.use_vec_reward:
            rew_vec = rew_vec.sum(-1, keepdims=True)
        return state3, obs_dict, rew_vec, reset_buf, info

    # ---------------------------------------------------------------- rewards
    def _compute_rewards(self, state: EnvState, rs):
        """Reward vector assembly: terms (possibly subclass-extended) ->
        config-ordered [N,R] with scales*dt + penalty curriculum + adaptive sigma."""
        rews, errors, feet_air_time = self._reward_terms(state, rs)

        cols = []
        for i, name in enumerate(self.reward_names):
            rew = rews[name] * self.reward_scales[i]
            rew = jnp.where(self.penalty_mask[i] > 0, rew * state.reward_penalty_scale, rew) \
                if bool(self.config.rewards.reward_penalty_curriculum) else rew
            cols.append(rew)
        # termination head (reference legged_robot_base.py:740-747,944-946)
        cols.append((rs["reset_buf"] & ~rs["time_out"]).astype(jnp.float32) * self.termination_scale)
        # one non-finite reward (terminal step of a blown-up env) would NaN
        # the GAE/update for the whole batch; the env resets next step anyway
        rew_vec = jnp.nan_to_num(jnp.stack(cols, axis=-1), nan=0.0, posinf=0.0, neginf=0.0)

        # adaptive tracking sigma (reference motion_tracking.py:1030-1052)
        sigma_values, sigma_ema = state.sigma_values, state.sigma_ema
        if bool(self.config.rewards.adaptive_tracking_sigma.enable):
            alpha = float(self.config.rewards.adaptive_tracking_sigma.alpha)
            adptype = str(self.config.rewards.adaptive_tracking_sigma.get("type", "origin"))
            new_emas, new_sigs = [], []
            for i, t in enumerate(self.sigma_terms):
                if t in errors:
                    ema = sigma_ema[i] * (1 - alpha) + errors[t].mean() * alpha
                    if adptype == "mean":
                        sig_new = (jnp.minimum(ema, sigma_values[i]) + ema) / 2
                    else:  # origin
                        sig_new = jnp.minimum(ema, sigma_values[i])
                else:
                    ema, sig_new = sigma_ema[i], sigma_values[i]
                new_emas.append(ema)
                new_sigs.append(sig_new)
            sigma_ema = jnp.stack(new_emas)
            sigma_values = jnp.stack(new_sigs)

        return rew_vec, sigma_values, sigma_ema, feet_air_time, errors

    def _reward_terms(self, state: EnvState, rs):
        """All reward terms as a name->[N] dict (reference formulas cited inline)."""
        sim: SimState = rs["sim"]
        N = self.num_envs
        sig = {t: state.sigma_values[i] for i, t in enumerate(self.sigma_terms)}
        rcfg = self.config.rewards
        errors = {}

        def track(err, term):
            errors[term] = err
            return jnp.exp(-err / sig[term])

        rews = {}
        # --- tracking rewards, guarded by configured sigmas
        # (reference motion_tracking.py:1154-1292)
        if "teleop_upper_body_pos" in sig:
            upper = rs["dif_body_pos"][:, self.upper_body_id]
            lower = rs["dif_body_pos"][:, self.lower_body_id]
            r_up = track((upper**2).mean(-1).mean(-1), "teleop_upper_body_pos")
            r_lo = track((lower**2).mean(-1).mean(-1), "teleop_lower_body_pos")
            rews["teleop_body_position_extend"] = (
                r_lo * float(rcfg.teleop_body_pos_lowerbody_weight)
                + r_up * float(rcfg.teleop_body_pos_upperbody_weight))
        if "teleop_vr_3point_pos" in sig:
            vr = rs["dif_body_pos"][:, self.motion_tracking_id]
            rews["teleop_vr_3point"] = track((vr**2).mean(-1).mean(-1), "teleop_vr_3point_pos")
        if "teleop_feet_pos" in sig:
            feet = rs["dif_body_pos"][:, self.feet_indices]
            rews["teleop_body_position_feet"] = track((feet**2).mean(-1).mean(-1), "teleop_feet_pos")
        if "teleop_body_rot" in sig:
            rews["teleop_body_rotation_extend"] = track((rs["dif_body_rot"]**2).mean(-1).mean(-1), "teleop_body_rot")
        if "teleop_body_vel" in sig:
            rews["teleop_body_velocity_extend"] = track((rs["dif_body_vel"]**2).mean(-1).mean(-1), "teleop_body_vel")
        if "teleop_body_ang_vel" in sig:
            rews["teleop_body_ang_velocity_extend"] = track((rs["dif_body_ang_vel"]**2).mean(-1).mean(-1), "teleop_body_ang_vel")
        if "teleop_joint_pos" in sig:
            rews["teleop_joint_position"] = track((rs["dif_joint_pos"]**2).mean(-1), "teleop_joint_pos")
        if "teleop_joint_vel" in sig:
            rews["teleop_joint_velocity"] = track((rs["dif_joint_vel"]**2).mean(-1), "teleop_joint_vel")
        if "teleop_max_joint_pos" in sig:
            rews["teleop_max_joint_position"] = track(jnp.abs(rs["dif_joint_pos"]).max(-1), "teleop_max_joint_pos")
        err_cm = jnp.abs(rs["contacts_filt"] - rs["ref_contact_mask"]).mean(-1)
        rews["teleop_contact_mask"] = 1.0 - err_cm
        rews["teleop_contact_mask_v2"] = 0.5 - err_cm

        # --- penalties (reference legged_robot_base.py:941-1087)
        rews["penalty_torques"] = (rs["torques"]**2).sum(-1)
        rews["penalty_dof_vel"] = (sim.dof_vel**2).sum(-1)
        rews["penalty_dof_acc"] = (((rs["last_dof_vel"] - sim.dof_vel) / self.dt)**2).sum(-1)
        rews["penalty_action_rate"] = ((rs["last_actions"] - rs["actions"])**2).sum(-1)
        rews["penalty_orientation"] = (rs["projected_gravity"][:, :2]**2).sum(-1)

        feet_cf = sim.contact_forces[:, self.feet_indices]
        feet_vel = sim.body_lin_vel[:, self.feet_indices]
        in_contact = jnp.linalg.norm(feet_cf, axis=-1) > 1.0
        rews["penalty_slippage"] = (jnp.linalg.norm(feet_vel, axis=-1) * in_contact).sum(-1)
        rews["penalty_feet_contact_forces"] = jnp.clip(
            jnp.linalg.norm(feet_cf, axis=-1) - float(rcfg.locomotion_max_contact_force), 0.0, None).sum(-1)
        rews["penalty_stumble"] = jnp.any(
            jnp.linalg.norm(feet_cf[..., :2], axis=-1) > 5.0 * jnp.abs(feet_cf[..., 2]), axis=-1).astype(jnp.float32)
        rews["collision"] = (jnp.linalg.norm(
            sim.contact_forces[:, self.penalised_contact_indices], axis=-1) > 0.1).astype(jnp.float32).sum(-1)

        # feet air time (reference motion_tracking.py:1307-1319)
        contact_z = feet_cf[..., 2] > 1.0
        contact_filt_z = jnp.logical_or(contact_z, rs["last_contacts"] > 0)
        first_contact = (rs["feet_air_time"] > 0) & contact_filt_z
        feet_air_time = rs["feet_air_time"] + self.dt
        rews["feet_air_time"] = ((feet_air_time - float(rcfg.desired_feet_air_time)) * first_contact).sum(-1)
        feet_air_time = feet_air_time * (~contact_filt_z)

        # --- limits (reference legged_robot_base.py:974-1002)
        m = (self.dof_pos_limits[:, 0] + self.dof_pos_limits[:, 1]) / 2
        r = self.dof_pos_limits[:, 1] - self.dof_pos_limits[:, 0]
        lo_soft = m - 0.5 * r * state.soft_dof_pos_limit
        hi_soft = m + 0.5 * r * state.soft_dof_pos_limit
        out = jnp.clip(lo_soft - sim.dof_pos, 0.0, None) + jnp.clip(sim.dof_pos - hi_soft, 0.0, None)
        rews["limits_dof_pos"] = out.sum(-1)
        rews["limits_dof_vel"] = jnp.clip(
            jnp.abs(sim.dof_vel) - self.dof_vel_limits * state.soft_dof_vel_limit, 0.0, 1.0).sum(-1)
        rews["limits_torque"] = jnp.clip(
            jnp.abs(rs["torques"]) - self.torque_limits * state.soft_torque_limit, 0.0, 1.0).sum(-1)

        # foot slip penalty (reference legged_robot_base.py:1012-1017)
        rews["foot_slip_penalty"] = (
            in_contact * jnp.linalg.norm(feet_vel[..., :2], axis=-1)).sum(-1)

        return rews, errors, feet_air_time

    # ---------------------------------------------------------------- curricula
    def _update_avg_episode_length(self, state, episode_length, reset_buf, n_reset):
        """EMA weighted by reset count (reference legged_robot_base.py:875-879)."""
        n0 = float(self.config.rewards.num_compute_average_epl)
        n = n_reset.astype(jnp.float32)
        cur = jnp.where(n > 0, (episode_length * reset_buf).sum() / jnp.maximum(n, 1), 0.0)
        new = state.average_episode_length * (1 - n / n0) + cur * (n / n0)
        return jnp.where(n > 0, new, state.average_episode_length)

    def _update_curricula(self, state: EnvState, n_reset):
        """Penalty / termination threshold curricula (reference :882-939, motion_tracking.py:289-317)."""
        rcfg = self.config.rewards
        ecfg = self.ecfg
        apply = n_reset > 0
        epl = state.average_episode_length

        def ramp(value, down_thr, up_thr, degree, vmin, vmax, up_shrinks):
            up = 1.0 - degree if up_shrinks else 1.0 + degree
            down = 1.0 + degree if up_shrinks else 1.0 - degree
            new = jnp.where(epl < down_thr, value * down, jnp.where(epl > up_thr, value * up, value))
            return jnp.where(apply, jnp.clip(new, vmin, vmax), value)

        out = {}
        if bool(rcfg.reward_penalty_curriculum):
            out["reward_penalty_scale"] = ramp(
                state.reward_penalty_scale,
                float(rcfg.reward_penalty_level_down_threshold), float(rcfg.reward_penalty_level_up_threshold),
                float(rcfg.reward_penalty_degree),
                float(rcfg.reward_min_penalty_scale), float(rcfg.reward_max_penalty_scale),
                up_shrinks=False)
        tc = ecfg.termination_curriculum
        if bool(ecfg.termination.terminate_when_motion_far) and bool(tc.terminate_when_motion_far_curriculum):
            out["motion_far_threshold"] = ramp(
                state.motion_far_threshold,
                float(tc.terminate_when_motion_far_curriculum_level_down_threshold),
                float(tc.terminate_when_motion_far_curriculum_level_up_threshold),
                float(tc.terminate_when_motion_far_curriculum_degree),
                float(tc.terminate_when_motion_far_threshold_min),
                float(tc.terminate_when_motion_far_threshold_max),
                up_shrinks=True)
        if bool(ecfg.termination.terminate_when_dof_far) and bool(tc.terminate_when_dof_far_curriculum.enable):
            dc = tc.terminate_when_dof_far_curriculum
            out["dof_far_threshold"] = ramp(
                state.dof_far_threshold, float(dc.level_down_threshold), float(dc.level_up_threshold),
                float(dc.degree), float(dc.min), float(dc.max), up_shrinks=True)
        lc = rcfg.reward_limit.reward_limits_curriculum
        if bool(lc.soft_dof_pos_curriculum):
            out["soft_dof_pos_limit"] = ramp(
                state.soft_dof_pos_limit,
                float(lc.soft_dof_pos_curriculum_level_down_threshold),
                float(lc.soft_dof_pos_curriculum_level_up_threshold),
                float(lc.soft_dof_pos_curriculum_degree),
                float(lc.soft_dof_pos_min_limit), float(lc.soft_dof_pos_max_limit), up_shrinks=True)
        if bool(lc.soft_dof_vel_curriculum):
            out["soft_dof_vel_limit"] = ramp(
                state.soft_dof_vel_limit,
                float(lc.soft_dof_vel_curriculum_level_down_threshold),
                float(lc.soft_dof_vel_curriculum_level_up_threshold),
                float(lc.soft_dof_vel_curriculum_degree),
                float(lc.soft_dof_vel_min_limit), float(lc.soft_dof_vel_max_limit), up_shrinks=True)
        if bool(lc.soft_torque_curriculum):
            out["soft_torque_limit"] = ramp(
                state.soft_torque_limit,
                float(lc.soft_torque_curriculum_level_down_threshold),
                float(lc.soft_torque_curriculum_level_up_threshold),
                float(lc.soft_torque_curriculum_degree),
                float(lc.soft_torque_min_limit), float(lc.soft_torque_max_limit), up_shrinks=True)
        ocfg = self.config.obs
        if bool(ocfg.get("add_noise_currculum", False)):
            # obs-noise curriculum (reference legged_robot_base.py:637-645)
            out["noise_curriculum_value"] = ramp(
                state.noise_curriculum_value,
                float(ocfg.soft_dof_pos_curriculum_level_down_threshold),
                float(rcfg.reward_penalty_level_up_threshold),
                float(ocfg.soft_dof_pos_curriculum_degree),
                float(ocfg.noise_value_min), float(ocfg.noise_value_max), up_shrinks=False)
        sdc = ecfg.soft_dynamic_correction
        if bool(sdc.get("enable", False)) and bool(sdc.curriculum.get("enable", False)):
            # reference motion_tracking.py:289-296: alpha grows when struggling,
            # shrinks when succeeding
            out["sdc_alpha"] = ramp(
                state.sdc_alpha,
                float(sdc.curriculum.level_down_threshold), float(sdc.curriculum.level_up_threshold),
                float(sdc.curriculum.degree),
                float(sdc.curriculum.min_alpha), float(sdc.curriculum.max_alpha), up_shrinks=True)
        return dataclasses.replace(state, **out)

    # ------------------------------------------------------------------- obs
    def _obs_getters(self, state: EnvState, key):
        """All `_get_obs_*` primitives (reference legged_robot_base.py:1114-1215
        + motion_tracking.py:944-1015), computed from post-reset state."""
        sim = state.sim
        N = self.num_envs
        base_quat = sim.root_quat
        projected_gravity = rot.quat_rotate_inverse(base_quat, jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (N, 3)))
        base_lin_vel = rot.quat_rotate_inverse(base_quat, sim.root_lin_vel)
        base_ang_vel = rot.quat_rotate_inverse(base_quat, sim.root_ang_vel)

        mres, motion_times = self._motion_state_at(state, 1)
        body_pos, body_quat, _, _ = self._extend_body_states(sim)
        ref_pos = mres["rg_pos_t"]

        heading_inv = rot.calc_heading_quat_inv(base_quat)           # [N,4]
        hi = heading_inv[:, None, :]

        dif_global = ref_pos - body_pos
        dif_local = rot.quat_rotate(jnp.broadcast_to(hi, dif_global.shape[:-1] + (4,)), dif_global)
        ref_rel = ref_pos - sim.root_pos[:, None, :]
        local_ref = rot.quat_rotate(jnp.broadcast_to(hi, ref_rel.shape[:-1] + (4,)), ref_rel)

        phase = jnp.clip(motion_times / state.motion_len, 0.0, 1.05)[:, None]

        # noise-process-corrupted IMU variants (reference legged_robot_base.py:357-380):
        # OU noise perturbs rpy and world angular velocity; quantities are
        # recomputed from the noised attitude
        np_cfg = self.config.obs.get("noise_process")
        if np_cfg and bool(np_cfg.get("enable", False)):
            scale = np_cfg.get("scale", {})
            rpy = rot.get_euler_xyz(base_quat)
            rpy_noise = rpy + state.noise_ou[:, :3] * float(scale.get("rpy", 1.0)) * (jnp.pi / 180.0)
            quat_noise = rot.quat_from_euler_xyz(rpy_noise)
            ang_w_noise = sim.root_ang_vel + state.noise_ou[:, 3:6] * float(scale.get("base_ang_vel", 0.1))
            base_ang_vel_noise = rot.quat_rotate_inverse(quat_noise, ang_w_noise)
            projected_gravity_noise = rot.quat_rotate_inverse(
                quat_noise, jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (N, 3)))
        else:
            base_ang_vel_noise = base_ang_vel
            projected_gravity_noise = projected_gravity

        getters = {
            "base_pos_z": sim.root_pos[:, 2:3],
            "base_lin_vel": base_lin_vel,
            "base_ang_vel": base_ang_vel,
            "projected_gravity": projected_gravity,
            "base_ang_vel_noise": base_ang_vel_noise,
            "projected_gravity_noise": projected_gravity_noise,
            "dof_pos_noise": sim.dof_pos - state.default_dof_pos,
            "dof_vel_noise": sim.dof_vel,
            "dof_pos": sim.dof_pos - state.default_dof_pos,
            "dof_vel": sim.dof_vel,
            # full dof-width action vector even under only_track_leg (the obs
            # dim is ${robot.dof_obs_size}, reference obs/motion_tracking/main.yaml:115)
            "actions": state.actions,
            "ref_motion_phase": phase,
            "dif_local_rigid_body_pos": dif_local.reshape(N, -1),
            "local_ref_rigid_body_pos": local_ref.reshape(N, -1),
            "dr_base_com": self.dr_obs["base_com"],
            "dr_base_mass": self.dr_obs["base_mass"],
            "dr_link_mass": self.dr_obs["link_mass"],
            "dr_friction": self.dr_obs["friction"],
            "dr_kp": state.kp_scale,
            "dr_kd": state.kd_scale,
            "dr_ctrl_delay": state.action_delay_idx[:, None].astype(jnp.float32),
        }
        return getters

    def _compute_observations(self, state: EnvState, key):
        """Config-driven obs assembly (reference helpers.py:128-152):
        obs = (raw + U(-1,1)*noise_scale) * obs_scale; groups concat sorted keys."""
        cfgo = self.config.obs
        getters = self._obs_getters(state, key)
        N = self.num_envs

        noise_mult = state.noise_curriculum_value \
            if bool(cfgo.get("add_noise_currculum", False)) else 1.0

        def noisy(name, k):
            raw = getters[name]
            nscale = float(cfgo.noise_scales.get(name, 0.0))
            if nscale > 0:
                raw = raw + jax.random.uniform(k, raw.shape, minval=-1.0, maxval=1.0) * nscale * noise_mult
            return raw * float(cfgo.obs_scales.get(name, 1.0))

        # history ring buffers first (so groups can reference them)
        hist_keys = sorted(state.history.keys())
        keys = jax.random.split(key, len(hist_keys) + 64)
        new_hist = {}
        for i, hk in enumerate(hist_keys):
            val = noisy(hk, keys[i])
            buf = state.history[hk]
            new_hist[hk] = jnp.concatenate([val[:, None, :], buf[:, :-1]], axis=1)

        def history_group(group):
            spec = self.history_spec[group]
            parts = [state.history[k][:, : spec[k]].reshape(N, -1) for k in sorted(spec.keys())]
            return jnp.concatenate(parts, axis=-1)

        obs_dict = {}
        ki = len(hist_keys)
        for group, names in cfgo.obs_dict.items():
            parts = []
            for name in sorted(names):
                if name in self.history_spec:
                    parts.append(history_group(name))
                else:
                    parts.append(noisy(name, keys[ki]))
                    ki += 1
            # nan_to_num: clip() passes NaN through, and one non-finite obs
            # row (a blown-up env in its terminal step) would NaN the policy
            # gradients for the whole minibatch
            obs_dict[group] = jnp.nan_to_num(
                jnp.clip(jnp.concatenate(parts, axis=-1), -self.clip_obs, self.clip_obs),
                nan=0.0, posinf=self.clip_obs, neginf=-self.clip_obs)
        return obs_dict, new_hist

    def obs_dim(self, group):
        """Static obs dim per group (reference helpers.py:47-80)."""
        return sum(end - start for _, (start, end) in self.obs_key_slices(group).items())

    def obs_key_slices(self, group):
        """Per-subkey (start, end) slice map within a concatenated obs group
        (reference helpers.py:16-44, used e.g. by phase-aware networks)."""
        slices = {}
        off = 0
        for name in sorted(self.config.obs.obs_dict[group]):
            if name in self.history_spec:
                d = sum(self.obs_dims[k] * l for k, l in self.history_spec[name].items())
            else:
                d = self.obs_dims[name]
            slices[name] = (off, off + d)
            off += d
        return slices

    # ------------------------------------------------------------------- logs
    def _build_log(self, term, reset_buf, rew_vec, errors, state):
        log = {}
        denom = reset_buf.astype(jnp.float32).mean() + 1e-15
        for k, v in term.items():
            log[f"terminate_by_{k}"] = v.astype(jnp.float32).mean() / denom
        for i, name in enumerate(self.reward_names):
            log[f"rew_{name}"] = rew_vec[:, i].mean()
        log["rew_termination"] = rew_vec[:, -1].mean()
        log["average_episode_length"] = state.average_episode_length
        log["penalty_scale"] = state.reward_penalty_scale
        log["motion_far_threshold"] = state.motion_far_threshold
        log["episode_length_mean"] = state.episode_length.astype(jnp.float32).mean()
        if self.motion_lib.num_unique > 1:
            log["motion_fail_ema_mean"] = state.motion_fail_ema.mean()
            log["motion_fail_ema_max"] = state.motion_fail_ema.max()
        for i, t in enumerate(self.sigma_terms):
            log[f"adp_sigma_{t}"] = state.sigma_values[i]
        if self.terrain is not None:
            # curriculum evidence: the level distribution moving up rows
            # (reference legged_robot_base.py terrain-curriculum telemetry)
            lvl = state.terrain_level.astype(jnp.float32)
            log["terrain_level_mean"] = lvl.mean()
            log["terrain_level_max"] = lvl.max()
        return log
