"""Motion-tracking env + MHPPO integration tests (tiny sizes, CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbhc_tpu.config.loader import compose

CFG_DIR = "/root/repo/pbhc_tpu/config"
MOTION = "/root/repo/assets/motions/Horse-stance_pose.pkl"


@pytest.fixture(scope="module")
def env():
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=4", f"robot.motion.motion_file={MOTION}"],
    )
    return MotionTrackingEnv(cfg, 4, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def stepped(env):
    state = env.init_state(jax.random.PRNGKey(1))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
    state = dataclasses.replace(state, history=hist)
    step = jax.jit(env.step)
    for i in range(5):
        acts = 0.1 * jax.random.normal(jax.random.PRNGKey(i), (4, env.nd))
        state, obs, rew, done, info = step(state, acts)
    return state, obs, rew, done, info


def test_obs_layout_matches_reference(env):
    # reference: 76-dim proprio + 4-step history -> 380 actor obs
    assert env.obs_dim("actor_obs") == 380
    assert env.obs_dim("critic_obs") == 630
    assert env.num_rew_fn == 21


def test_step_shapes_and_finiteness(env, stepped):
    state, obs, rew, done, info = stepped
    assert obs["actor_obs"].shape == (4, 380)
    assert obs["critic_obs"].shape == (4, 630)
    assert rew.shape == (4, env.num_rew_fn)
    assert bool(jnp.isfinite(obs["actor_obs"]).all())
    assert bool(jnp.isfinite(obs["critic_obs"]).all())
    assert bool(jnp.isfinite(rew).all())
    # tracking rewards (exp family) must be in (0, scale*dt]
    names = env.reward_names
    i = names.index("teleop_joint_position")
    assert float(rew[:, i].min()) > 0


def test_reset_on_motion_far(env):
    """Teleporting the robot far from the reference must trigger a reset."""
    state = env.init_state(jax.random.PRNGKey(3))
    sim = dataclasses.replace(state.sim, root_pos=state.sim.root_pos + jnp.asarray([50.0, 0, 0]))
    state = dataclasses.replace(state, sim=sim)
    state2, obs, rew, done, info = jax.jit(env.step)(state, jnp.zeros((4, env.nd)))
    assert bool(done.all())
    # after reset the envs are back near the reference motion
    assert float(jnp.abs(state2.sim.root_pos[:, 0]).max()) < 5.0
    # episode clock restarted
    assert int(state2.episode_length.max()) == 0


def test_motion_phase_progresses(env):
    state = env.init_state(jax.random.PRNGKey(4))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(5))
    state = dataclasses.replace(state, history=hist)
    step = jax.jit(env.step)
    getters0 = env._obs_getters(state, jax.random.PRNGKey(0))
    p0 = np.asarray(getters0["ref_motion_phase"])
    state, *_ = step(state, jnp.zeros((4, env.nd)))
    getters1 = env._obs_getters(state, jax.random.PRNGKey(0))
    p1 = np.asarray(getters1["ref_motion_phase"])
    assert (p1 >= p0 - 1e-6).all()


@pytest.mark.slow
def test_ppo_iteration_runs_and_learns_something():
    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=4", f"robot.motion.motion_file={MOTION}",
         "algo.config.num_steps_per_env=4", "algo.config.num_mini_batches=2",
         "algo.config.num_learning_epochs=2"],
    )
    env = MotionTrackingEnv(cfg, 4, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    ts = algo.init_train_state(jax.random.PRNGKey(1))
    p_before = jax.tree.map(lambda x: x.copy(), ts.actor_params)
    ts, log = algo.train_iteration(ts)
    ts, log = algo.train_iteration(ts)
    assert np.isfinite(float(log["Train/mean_step_reward"]))
    assert np.isfinite(float(log["Loss/kl"]))
    # parameters actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p_before, ts.actor_params)
    assert max(jax.tree.leaves(diff)) > 0
    assert int(ts.iteration) == 2


def test_nonfinite_state_terminates_and_sanitizes():
    """A blown-up (NaN) env terminates via the nonfinite guard and emits
    finite obs/rewards so the batch is not poisoned (the reference instead
    hard-asserts on NaN, motion_tracking.py:64-66)."""
    import dataclasses

    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=4", f"robot.motion.motion_file={MOTION}"],
    )
    env = MotionTrackingEnv(cfg, 4, jax.random.PRNGKey(0))
    state = env.init_state(jax.random.PRNGKey(1))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
    state = dataclasses.replace(state, history=hist)
    bad_dof = state.sim.dof_pos.at[1].set(jnp.nan)
    state = dataclasses.replace(state, sim=dataclasses.replace(state.sim, dof_pos=bad_dof))
    state, obs, rew, done, info = jax.jit(env.step)(state, jnp.zeros((4, env.nd)))
    assert bool(done[1])
    assert bool(jnp.isfinite(rew).all())
    for k, v in obs.items():
        assert bool(jnp.isfinite(v).all()), k
    # the reset replaced the poisoned env's state with a fresh motion frame
    assert bool(jnp.isfinite(state.sim.dof_pos).all())


@pytest.mark.slow
def test_ppo_l2c2_iteration():
    """L2C2 smoothness regularizer path compiles and trains (reference
    mh_ppo.py:488-507); interpolation noise is drawn per minibatch."""
    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=4", f"robot.motion.motion_file={MOTION}",
         "algo.config.num_steps_per_env=4", "algo.config.num_mini_batches=2",
         "algo.config.num_learning_epochs=1",
         "algo.config.l2c2.enable=true"],
    )
    env = MotionTrackingEnv(cfg, 4, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    ts = algo.init_train_state(jax.random.PRNGKey(1))
    ts, log = algo.train_iteration(ts)
    assert np.isfinite(float(log["Loss/surrogate"]))
    assert int(ts.iteration) == 1


def test_close_to_limit_terminations():
    """Probabilistic limit terminations fire under extreme joint velocities
    (reference legged_robot_base.py:449-477)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=off", "simulator=tpu"],
        ["num_envs=4",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl",
         "env.config.termination.terminate_when_close_to_dof_vel_limit=true",
         "env.config.termination_probality.terminate_when_close_to_dof_vel_limit=1.0"],
    )
    env = MotionTrackingEnv(cfg, 4, jax.random.PRNGKey(0))
    state = env.init_state(jax.random.PRNGKey(1))
    state = dataclasses.replace(
        state, sim=dataclasses.replace(state.sim, dof_vel=jnp.full((4, env.nd), 80.0)))
    state, obs, rew, done, info = jax.jit(env.step)(state, jnp.zeros((4, env.nd)))
    assert bool(done.all()), "dof-vel-limit termination did not fire"
    assert float(info["log"]["terminate_by_dof_vel_limit"]) > 0


@pytest.mark.slow
def test_heavy_upper_added_mass_parallel_pd_dr():
    """heavy_upper (reference isaacgym.py:519-534), base added mass (:538-549),
    parallel_serial_pd (legged_robot_base.py:607-615) and parallel_serial_tau
    (:621-627) feed the per-env sim params / episodic DR."""
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=4", f"robot.motion.motion_file={MOTION}",
         "domain_rand.heavy_upper.enable=true",
         "domain_rand.randomize_base_mass=true",
         "domain_rand.parallel_serial_pd.enable=true",
         "domain_rand.parallel_serial_tau.enable=true"],
    )
    env = MotionTrackingEnv(cfg, 4, jax.random.PRNGKey(0))
    base = env.engine.default_params()

    torso = env.sim_model.body_names.index("torso_link")
    pelvis = env.sim_model.body_names.index("pelvis")
    m = np.asarray(env.sim_params.mass)
    # torso mass carries the 1.1 heavy_upper ratio on top of link-mass DR [0.9,1.1]
    ratio_torso = m[:, torso] / float(base.mass[torso])
    assert (ratio_torso > 0.9 * 1.1 - 1e-5).all() and (ratio_torso < 1.1 * 1.1 + 1e-5).all()
    # pelvis got additive mass within added_mass_range on top of its mass DR
    add = np.asarray(env.dr_obs["base_mass"])[:, 0]
    lo, hi = cfg.domain_rand.added_mass_range
    assert (add >= lo).all() and (add <= hi).all() and np.std(add) > 0

    # parallel_serial_pd widens the kp scale beyond kp_range on those joints
    state = env.init_state(jax.random.PRNGKey(3))
    kp = np.asarray(state.kp_scale)
    jidx = list(cfg.domain_rand.parallel_serial_pd.joint_idx)
    inner = [i for i in range(env.nd) if i not in jidx]
    assert kp[:, inner].max() <= 1.1 + 1e-6
    assert kp[:, jidx].min() >= 0.9 * 0.8 - 1e-6 and kp[:, jidx].max() <= 1.1 * 1.2 + 1e-6
    # parallel_serial_tau: rao on those joints is gaussian-bumped (unbounded by rao_lim)
    rao = np.asarray(state.rao_scale)
    tidx = list(cfg.domain_rand.parallel_serial_tau.joint_idx)
    assert np.abs(rao[:, tidx]).max() > 0

    # and the env still steps finite
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
    state = dataclasses.replace(state, history=hist)
    state, obs, rew, done, info = jax.jit(env.step)(state, jnp.zeros((4, env.nd)))
    assert bool(jnp.isfinite(rew).all())


def test_mppi_snapshot_roundtrip(env):
    """get/set_mppi_buffers (reference legged_robot_base.py:688-740): branch
    the env state, step the branch, restore — the restored state reproduces
    the original rollout exactly (deterministic replay)."""
    state = env.init_state(jax.random.PRNGKey(5))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(6))
    state = dataclasses.replace(state, history=hist)
    ids = jnp.arange(env.num_envs)
    snap = env.get_mppi_buffers(state, ids)

    step = jax.jit(env.step)
    a = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (env.num_envs, env.nd))
    s1, o1, r1, d1, _ = step(state, a)
    # diverge: different action from the same snapshot
    s2, *_ = step(state, -a)
    restored = env.set_mppi_buffers(s2, snap, ids)
    # RNG key and adaptive-sigma EMAs are shared, not env-axis buffers (the
    # reference's MPPI buffers exclude its python-float curricula too); pin
    # them for exact replay
    restored = dataclasses.replace(restored, rng=state.rng,
                                   sigma_values=state.sigma_values,
                                   sigma_ema=state.sigma_ema)
    s1b, o1b, r1b, d1b, _ = step(restored, a)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r1b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.sim.dof_pos), np.asarray(s1b.sim.dof_pos), atol=1e-6)


@pytest.mark.slow
def test_robot_variant_g1_23dof_general():
    """The sysID'd "general" variant: 9 key bodies, per-joint action scales,
    per-joint armature override (reference robot/g1/g1_23dof_general.yaml)."""
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=motion_tracking", "robot=g1_23dof_general", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=2", f"robot.motion.motion_file={MOTION}"],
    )
    env = MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))
    assert len(cfg.robot.key_bodies) == 9
    # per-joint action scale: hip_roll differs from elbow
    a = np.asarray(env.action_scales)
    assert not np.allclose(a.min(), a.max())
    # armature override: hip_roll (0.0251) vs elbow (0.0036), not the MJCF's
    arm = np.asarray(env.sim_model.dof_armature)
    names = env.sim_model.dof_names
    assert abs(arm[names.index("left_hip_roll_joint")] - 0.025101925) < 1e-9
    assert abs(arm[names.index("left_elbow_joint")] - 0.003609725) < 1e-9
    state = env.init_state(jax.random.PRNGKey(1))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
    state = dataclasses.replace(state, history=hist)
    state, obs, rew, done, info = jax.jit(env.step)(state, jnp.zeros((2, 23)))
    assert bool(jnp.isfinite(obs["actor_obs"]).all())


@pytest.mark.slow
def test_robot_variant_g1_only_leg():
    """Leg-only actuation: 12-dim policy actions; waist/arm dofs PD-track the
    reference motion (reference robot/g1/g1_only_leg.yaml only_track_leg +
    motion_tracking.py:757-758)."""
    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=motion_tracking", "robot=g1_only_leg", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=2", f"robot.motion.motion_file={MOTION}",
         "algo.config.num_steps_per_env=2", "algo.config.num_mini_batches=1",
         "algo.config.num_learning_epochs=1"],
    )
    env = MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))
    assert env.num_actions == 12 and env.only_track_leg
    state = env.init_state(jax.random.PRNGKey(1))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
    state = dataclasses.replace(state, history=hist)
    step = jax.jit(env.step)
    state, obs, rew, done, info = step(state, jnp.zeros((2, 12)))
    # the expanded action vector PD-targets the reference pose on upper dofs:
    # stored actions are full dof width and the upper block is non-trivial
    assert state.actions.shape == (2, 23)
    assert bool(jnp.isfinite(obs["actor_obs"]).all())
    # upper-dof targets = ref pose: action*scale+default == ref dof pos
    tgt = np.asarray(state.actions * env.action_scales + state.default_dof_pos)
    mres, _ = env._motion_state_at(state, 0)
    # (offset differs by one step; just require the upper block to be close)
    assert np.abs(tgt[:, 12:] - np.asarray(mres["dof_pos"])[:, 12:]).max() < 0.2
    # the agent trains with 12-dim actions end to end
    algo = MHPPO(cfg, env)
    assert algo.num_act == 12
    ts = algo.init_train_state(jax.random.PRNGKey(3))
    ts, log = algo.train_iteration(ts)
    assert np.isfinite(float(jax.device_get(log["Train/mean_step_reward"])))
