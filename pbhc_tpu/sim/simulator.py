"""BaseSimulator facade — the reference's backend-swap seam.

The reference envs talk to simulators through an abstract tensor contract
(reference humanoidverse/simulator/base_simulator/base_simulator.py:39-171):
`dof_pos/dof_vel [N,nd]`, `robot_root_states [N,13]` (pos3 + quat4 xyzw +
linvel3 + angvel3, layout reference isaacgym.py:608-618), per-body
`_rigid_body_{pos,rot,vel,ang_vel}` and `contact_forces`, plus
`apply_torques_at_dof` / `simulate_at_each_physics_step` / state setters.

The TPU-native env uses the pure functional engine directly (that's the fast
path); this module provides the SAME contract for two backends so reference
code ports verbatim and cross-engine (lock-step) testing is possible:

* `TpuSimulator` — stateful wrapper around `pbhc_tpu.sim.engine.Engine`;
* `MujocoSimulator` — CPU oracle (single env), mirroring the reference's
  MuJoCo fidelity backend (reference deploy/mujoco.py, genesis_mjdebug idiom).
"""
from __future__ import annotations

import dataclasses

import numpy as np


class BaseSimulator:
    """Reference tensor contract (subset used by envs)."""

    # populated by subclasses:
    dof_pos: np.ndarray
    dof_vel: np.ndarray
    robot_root_states: np.ndarray
    contact_forces: np.ndarray
    _rigid_body_pos: np.ndarray
    _rigid_body_rot: np.ndarray
    _rigid_body_vel: np.ndarray
    _rigid_body_ang_vel: np.ndarray

    def apply_torques_at_dof(self, torques):
        raise NotImplementedError

    def simulate_at_each_physics_step(self):
        raise NotImplementedError

    def refresh_sim_tensors(self):
        raise NotImplementedError

    def set_actor_root_state_tensor(self, env_ids, root_states):
        raise NotImplementedError

    def set_dof_state_tensor(self, env_ids, dof_pos, dof_vel):
        raise NotImplementedError


class TpuSimulator(BaseSimulator):
    """Stateful facade over the functional TPU engine (batched)."""

    def __init__(self, engine, num_envs, params=None):
        import jax
        import jax.numpy as jnp

        self._jax = jax
        self._jnp = jnp
        self.engine = engine
        self.num_envs = num_envs
        self.params = params if params is not None else jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), engine.default_params())
        st = engine.default_state()
        self.state = jax.tree.map(lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), st)
        self._torques = jnp.zeros((num_envs, engine.nd))
        self._substep = jax.jit(jax.vmap(engine.substep))
        self._derive = jax.jit(jax.vmap(engine.derived_state))
        self.refresh_sim_tensors()

    @property
    def _body_list(self):
        return list(self.engine.model.body_names)

    def find_rigid_body_indice(self, name):
        return self._body_list.index(name)

    def apply_torques_at_dof(self, torques):
        self._torques = self._jnp.asarray(torques)

    def simulate_at_each_physics_step(self):
        self.state, lam = self._substep(self.params, self.state, self._torques)
        self._lam = lam

    def refresh_sim_tensors(self):
        self.state = self._derive(self.params, self.state)
        st = self.state
        jnp = self._jnp
        self.dof_pos = st.dof_pos
        self.dof_vel = st.dof_vel
        self.robot_root_states = jnp.concatenate(
            [st.root_pos, st.root_quat, st.root_lin_vel, st.root_ang_vel], axis=-1)
        self.base_quat = st.root_quat
        self._rigid_body_pos = st.body_pos
        self._rigid_body_rot = st.body_quat
        self._rigid_body_vel = st.body_lin_vel
        self._rigid_body_ang_vel = st.body_ang_vel
        self.contact_forces = st.contact_forces

    def set_actor_root_state_tensor(self, env_ids, root_states):
        jnp = self._jnp
        root_states = jnp.asarray(root_states)
        mask = jnp.zeros((self.num_envs,), bool).at[jnp.asarray(env_ids)].set(True)[:, None]
        self.state = dataclasses.replace(
            self.state,
            root_pos=jnp.where(mask, root_states[:, 0:3], self.state.root_pos),
            root_quat=jnp.where(mask, root_states[:, 3:7], self.state.root_quat),
            root_lin_vel=jnp.where(mask, root_states[:, 7:10], self.state.root_lin_vel),
            root_ang_vel=jnp.where(mask, root_states[:, 10:13], self.state.root_ang_vel),
        )

    def set_dof_state_tensor(self, env_ids, dof_pos, dof_vel):
        jnp = self._jnp
        mask = jnp.zeros((self.num_envs,), bool).at[jnp.asarray(env_ids)].set(True)[:, None]
        self.state = dataclasses.replace(
            self.state,
            dof_pos=jnp.where(mask, jnp.asarray(dof_pos), self.state.dof_pos),
            dof_vel=jnp.where(mask, jnp.asarray(dof_vel), self.state.dof_vel),
        )


class MujocoSimulator(BaseSimulator):
    """Single-env MuJoCo backend with the same contract (the CPU oracle)."""

    def __init__(self, xml_path, sim_fps=200):
        import mujoco

        self._mujoco = mujoco
        self.m = mujoco.MjModel.from_xml_path(str(xml_path))
        self.m.opt.timestep = 1.0 / sim_fps
        self.d = mujoco.MjData(self.m)
        self.num_envs = 1
        self.nd = self.m.nv - 6
        self._torques = np.zeros(self.nd)
        self.refresh_sim_tensors()

    @property
    def _body_list(self):
        return [self._mujoco.mj_id2name(self.m, self._mujoco.mjtObj.mjOBJ_BODY, i)
                for i in range(1, self.m.nbody)]

    def apply_torques_at_dof(self, torques):
        self._torques = np.asarray(torques).reshape(-1)

    def simulate_at_each_physics_step(self):
        self.d.qfrc_applied[:] = 0
        self.d.qfrc_applied[6:] = self._torques
        self._mujoco.mj_step(self.m, self.d)

    def refresh_sim_tensors(self):
        from scipy.spatial.transform import Rotation as sRot

        d = self.d
        self.dof_pos = d.qpos[7:].copy()[None]
        self.dof_vel = d.qvel[6:].copy()[None]
        quat = d.qpos[3:7][[1, 2, 3, 0]]
        ang_world = sRot.from_quat(quat).apply(d.qvel[3:6])  # body->world
        self.robot_root_states = np.concatenate(
            [d.qpos[:3], quat, d.qvel[:3], ang_world])[None]
        self.base_quat = quat[None]
        self._rigid_body_pos = d.xpos[1:].copy()[None]
        self._rigid_body_rot = d.xquat[1:][:, [1, 2, 3, 0]].copy()[None]
        vels = np.zeros((self.m.nbody - 1, 6))
        for i in range(1, self.m.nbody):
            self._mujoco.mj_objectVelocity(self.m, d, self._mujoco.mjtObj.mjOBJ_BODY, i, vels[i - 1], 0)
        self._rigid_body_ang_vel = vels[None, :, :3]
        self._rigid_body_vel = vels[None, :, 3:]
        cf = np.zeros((self.m.nbody - 1, 3))
        for ci in range(d.ncon):
            c = d.contact[ci]
            force = np.zeros(6)
            self._mujoco.mj_contactForce(self.m, d, ci, force)
            frame = c.frame.reshape(3, 3)
            f_world = frame.T @ force[:3]
            for g in (c.geom1, c.geom2):
                b = self.m.geom_bodyid[g]
                if b > 0:
                    cf[b - 1] += f_world
        self.contact_forces = cf[None]

    def set_actor_root_state_tensor(self, env_ids, root_states):
        rs = np.asarray(root_states).reshape(-1)
        self.d.qpos[:3] = rs[0:3]
        self.d.qpos[3:7] = rs[3:7][[3, 0, 1, 2]]
        self.d.qvel[:3] = rs[7:10]
        from scipy.spatial.transform import Rotation as sRot

        self.d.qvel[3:6] = sRot.from_quat(rs[3:7]).apply(rs[10:13], inverse=True)
        self._mujoco.mj_forward(self.m, self.d)

    def set_dof_state_tensor(self, env_ids, dof_pos, dof_vel):
        self.d.qpos[7:] = np.asarray(dof_pos).reshape(-1)
        self.d.qvel[6:] = np.asarray(dof_vel).reshape(-1)
        self._mujoco.mj_forward(self.m, self.d)
