"""MjFleet conventions round-trip: the engine<->MuJoCo state bridge must be
lossless in the conventions that have historically bitten (xyzw vs wxyz
quaternions; MuJoCo free-joint angular velocity is BODY-frame while the
engine stores WORLD-frame — reference deploy/mujoco.py:336,383)."""
import dataclasses
import pathlib

import jax
import numpy as np
import pytest

CFG_DIR = str(pathlib.Path(__file__).resolve().parents[1] / "pbhc_tpu" / "config")
MOTION = str(pathlib.Path(__file__).resolve().parents[1]
             / "assets" / "motions" / "Horse-stance_pose.pkl")

DR_OFF = ["domain_rand.randomize_friction=false", "domain_rand.randomize_base_mass=false",
          "domain_rand.randomize_link_mass=false", "domain_rand.randomize_pd_gain=false",
          "domain_rand.push_robots=false", "domain_rand.randomize_ctrl_delay=false",
          "domain_rand.randomize_rfi_lim=false", "domain_rand.use_rao=false",
          "domain_rand.randomize_default_dof_pos=false",
          "domain_rand.randomize_base_com=false", "domain_rand.randomize_link_inertia=false",
          "env.config.noise_to_initial_level=0"]


@pytest.fixture(scope="module")
def env():
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=2", f"robot.motion.motion_file={MOTION}"] + DR_OFF,
    )
    return MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))


def test_state_roundtrip(env):
    """set_from -> read_batch reproduces the SimState root/dof fields,
    including a NON-trivial orientation and angular velocity."""
    import jax.numpy as jnp

    from pbhc_tpu.deploy.mj_mirror import MjFleet
    from pbhc_tpu.maths.rotations import quat_from_euler_xyz

    state = env.init_state(jax.random.PRNGKey(1))
    state = env.reset_to_start(state, jax.random.PRNGKey(2))
    # twist the root so frame conventions actually matter
    q = np.asarray(quat_from_euler_xyz(jnp.asarray([0.3, -0.2, 0.9])))
    sim = dataclasses.replace(
        state.sim,
        root_quat=jnp.asarray(np.stack([q, q]), jnp.float32),
        root_ang_vel=jnp.asarray([[0.5, -0.3, 0.8], [0.1, 0.2, -0.4]], jnp.float32),
        root_lin_vel=jnp.asarray([[0.4, 0.1, -0.2], [0.0, -0.3, 0.1]], jnp.float32))

    fleet = MjFleet(env, 2)
    for i in range(2):
        fleet.set_from(sim, i)
    P, Q, LV, AV, QQ, DQ = fleet.read_batch()

    np.testing.assert_allclose(P, np.asarray(sim.root_pos), atol=1e-6)
    # quaternion double cover: compare up to sign
    for i in range(2):
        qi, ri = Q[i], np.asarray(sim.root_quat[i])
        assert min(np.abs(qi - ri).max(), np.abs(qi + ri).max()) < 1e-6
    np.testing.assert_allclose(LV, np.asarray(sim.root_lin_vel), atol=1e-6)
    np.testing.assert_allclose(AV, np.asarray(sim.root_ang_vel), atol=1e-5)
    np.testing.assert_allclose(QQ, np.asarray(sim.dof_pos), atol=1e-6)
    np.testing.assert_allclose(DQ, np.asarray(sim.dof_vel), atol=1e-6)


def test_inject_and_derived_state(env):
    """inject() + engine derived_state refresh yields body kinematics
    consistent with the injected root (body 0 == root pose)."""
    from pbhc_tpu.deploy.mj_mirror import MjFleet

    state = env.init_state(jax.random.PRNGKey(1))
    state = env.reset_to_start(state, jax.random.PRNGKey(2))
    fleet = MjFleet(env, 2)
    for i in range(2):
        fleet.set_from(state.sim, i)
    # a few physics steps so MuJoCo diverges from the initial state
    fleet.step(np.zeros((2, env.nd), np.float32))
    sim = fleet.inject(state.sim)
    sim = jax.vmap(env.engine.derived_state)(env.sim_params, sim)
    np.testing.assert_allclose(np.asarray(sim.body_pos[:, 0]),
                               np.asarray(sim.root_pos), atol=1e-5)
    assert np.isfinite(np.asarray(sim.body_quat)).all()
    # gravity acted for 0.2 s of settling: root moved, still upright-ish
    assert float(np.asarray(sim.root_pos)[:, 2].min()) > 0.3
