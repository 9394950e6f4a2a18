"""Env-in-lanes engine: parity with the env-first engine + env integration."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbhc_tpu.config.loader import compose

CFG_DIR = "/root/repo/pbhc_tpu/config"
MOTION = "/root/repo/assets/motions/Horse-stance_pose.pkl"


@pytest.fixture(scope="module")
def engines():
    from pbhc_tpu.model.g1 import load_g1_sim_model
    from pbhc_tpu.sim.engine import Engine, EngineOptions
    from pbhc_tpu.sim.engine_lanes import LanesEngine

    eng = Engine(load_g1_sim_model("g1_23dof_lock_wrist"), EngineOptions())
    return eng, LanesEngine(eng)


def _batched_setup(eng, N=4, z=0.755):
    from pbhc_tpu.sim.engine import SimParams

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    p0 = eng.default_params()
    params = SimParams(
        mass=p0.mass[None] * jax.random.uniform(ks[0], (N, eng.nb), minval=0.9, maxval=1.1),
        com=p0.com[None] + jax.random.normal(ks[1], (N, eng.nb, 3)) * 0.002,
        inertia=jnp.broadcast_to(p0.inertia, (N, eng.nb, 3, 3)),
        friction=jax.random.uniform(ks[2], (N,), minval=0.5, maxval=1.2),
        restitution=jnp.zeros((N,)),
        armature=jnp.broadcast_to(p0.armature, (N, eng.nd)),
        dof_damping=jnp.broadcast_to(p0.dof_damping, (N, eng.nd)),
        dof_frictionloss=jnp.broadcast_to(p0.dof_frictionloss, (N, eng.nd)),
    )
    st0 = eng.default_state(root_pos=(0.0, 0.0, z))
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), st0)
    states = dataclasses.replace(
        states,
        dof_pos=jax.random.normal(ks[3], (N, eng.nd)) * 0.02,
        dof_vel=jax.random.normal(ks[4], (N, eng.nd)) * 0.05,
    )
    return params, jax.vmap(eng.derived_state)(params, states)


@pytest.mark.slow
def test_lanes_parity_with_contact(engines):
    """25 control steps of PD settling: lanes == vmap(env-first) to f32 noise."""
    eng, lanes = engines
    N = 4
    params, states = _batched_setup(eng, N)
    kp = jnp.full((eng.nd,), 100.0)
    kd = jnp.full((eng.nd,), 2.0)

    def env_physics(p, st, keys):
        return eng.control_step(p, st, lambda s, k: kp * (-s.dof_pos) - kd * s.dof_vel, 4, keys)

    def torque_b(st, key):
        return kp * (0.0 - st.dof_pos) - kd * st.dof_vel

    keys1 = jnp.zeros((N, 4, 2), dtype=jnp.uint32)
    jref = jax.jit(jax.vmap(env_physics))
    jlan = jax.jit(lambda p, s: lanes.control_step_batched(p, s, torque_b, 4))
    rs, ls = states, states
    for _ in range(25):
        rs, _ = jref(params, rs, keys1)
        ls, _ = jlan(params, ls)

    for f in ["root_pos", "root_quat", "dof_pos", "dof_vel", "contact_forces", "body_pos"]:
        a, b = np.asarray(getattr(rs, f)), np.asarray(getattr(ls, f))
        scale = max(1.0, np.abs(a).max())
        # the energy-consistent projection multiplies the whole velocity by
        # a shared scale, so tiny f32 formulation differences between the two
        # engines are amplified over the 100 contact substeps; 1e-2 relative
        # still pins the same physics (divergent solves land orders beyond it)
        assert np.abs(a - b).max() / scale < 1e-2, f
    # standing under PD: total normal force ~ robot weight
    fz = np.asarray(ls.contact_forces[..., 2]).sum(1)
    assert (np.abs(fz - 311.0) < 40).all()


def test_lanes_env_step(tmp_path):
    """MotionTrackingEnv with solver=lanes matches solver=apgd (DR off)."""
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    outs = {}
    for solver in ["apgd", "lanes"]:
        cfg = compose(
            CFG_DIR,
            ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
             "rewards=motion_tracking", "domain_rand=off", "simulator=tpu"],
            ["num_envs=4", f"robot.motion.motion_file={MOTION}",
             f"simulator.config.solver={solver}",
             "env.config.noise_to_initial_level=0"],
        )
        env = MotionTrackingEnv(cfg, 4, jax.random.PRNGKey(0))
        state = env.init_state(jax.random.PRNGKey(1))
        step = jax.jit(env.step)
        acts = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (4, env.nd))
        for _ in range(3):
            state, obs, rew, done, info = step(state, acts)
        outs[solver] = (np.asarray(state.sim.dof_pos), np.asarray(rew),
                        np.asarray(obs["actor_obs"]))

    for a, b in zip(outs["apgd"], outs["lanes"]):
        # f32 solver-formulation drift amplified over 12 contact substeps;
        # a true divergence shows up orders of magnitude beyond this
        assert np.allclose(a, b, atol=2e-2), (np.abs(a - b).max())


@pytest.mark.slow
def test_lanes_env_step_sdc():
    """SDC-enabled lanes path runs and stays finite."""
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=4", f"robot.motion.motion_file={MOTION}",
         "simulator.config.solver=lanes",
         "env.config.soft_dynamic_correction.enable=true",
         "env.config.soft_dynamic_correction.alpha=0.5"],
    )
    env = MotionTrackingEnv(cfg, 4, jax.random.PRNGKey(0))
    state = env.init_state(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for i in range(3):
        state, obs, rew, done, info = step(state, jnp.zeros((4, env.nd)))
    assert bool(jnp.isfinite(state.sim.dof_pos).all())
    assert bool(jnp.isfinite(rew).all())
