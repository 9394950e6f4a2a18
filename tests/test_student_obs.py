"""Deploy-side StudentObsBuilder must reproduce the training env's obs
bit-for-bit (the 3-input contract the exported student ONNX was trained on).

Parity target: GeneralTrackingEnv._compute_observations with the student obs
config and zero noise vs pbhc_tpu.deploy.student_obs.StudentObsBuilder on the
same robot state (reference deploy_real.py:820-905 plays this role against
general_tracking.py).
"""
import dataclasses

import jax
import numpy as np
import pytest

from pbhc_tpu.config.loader import compose

CFG_DIR = "/root/repo/pbhc_tpu/config"
MOTION = ("/root/repo/assets/motions/"
          "g1_rig_Skeleton_Sequence_converted_processed_g1_29dof_rev_1_0.pkl")

NOISE_OFF = [f"obs.noise_scales.{k}=0.0" for k in
             ("base_ang_vel", "dof_pos", "dof_vel", "roll_pitch")]


@pytest.fixture(scope="module")
def env():
    from pbhc_tpu.envs.general_tracking_env import GeneralTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=general_tracking", "robot=g1_29dof", "obs=general_tracking_student",
         "rewards=general_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=1", f"robot.motion.motion_file={MOTION}",
         "env.config.noise_to_initial_level=0"] + NOISE_OFF,
    )
    return GeneralTrackingEnv(cfg, 1, jax.random.PRNGKey(0)), cfg


class FakeRobot:
    """Adapter: env sim state -> the controller surface the builder reads."""

    def __init__(self, sim, actions):
        from pbhc_tpu.deploy.student_obs import quat_rotate_inverse

        self.q = np.asarray(sim.dof_pos[0])
        self.dq = np.asarray(sim.dof_vel[0])
        self.quat_xyzw = np.asarray(sim.root_quat[0])
        self.base_ang_vel_local = quat_rotate_inverse(
            self.quat_xyzw, np.asarray(sim.root_ang_vel[0]))
        self.last_action = np.asarray(actions[0])


def test_student_obs_parity(env):
    from pbhc_tpu.deploy.export import student_meta
    from pbhc_tpu.deploy.student_obs import MotionHost, StudentObsBuilder

    env, cfg = env
    state = env.init_state(jax.random.PRNGKey(3))
    t = float(state.episode_length[0]) * env.dt + float(state.motion_start_times[0])

    builder = StudentObsBuilder(student_meta(env), MotionHost(env.motion_lib),
                                compensate_offsets=False)

    # tick 1: fresh histories on both sides
    obs_env, hist1 = env._compute_observations(state, jax.random.PRNGKey(7))
    got = builder.build(FakeRobot(state.sim, state.actions), t)
    for k in ("actor_obs", "future_motion_targets", "prop_history"):
        a, b = np.asarray(obs_env[k][0]), got[k][0]
        assert a.shape == b.shape, (k, a.shape, b.shape)
        assert np.allclose(a, b, atol=2e-4), (
            k, float(np.abs(a - b).max()), int(np.abs(a - b).argmax()))

    # tick 2 on the same state: histories must roll identically
    state2 = dataclasses.replace(state, history=hist1)
    obs_env2, _ = env._compute_observations(state2, jax.random.PRNGKey(8))
    got2 = builder.build(FakeRobot(state.sim, state.actions), t)
    for k in ("actor_obs", "prop_history"):
        a, b = np.asarray(obs_env2[k][0]), got2[k][0]
        assert np.allclose(a, b, atol=2e-4), (k, float(np.abs(a - b).max()))


def test_student_obs_offsets():
    """Offset compensation: with captured init offsets, a tilted/shifted start
    produces the same dof_pos/roll_pitch obs as a perfect start (reference
    deploy_real.py:654-662,696-699)."""
    import json

    from pbhc_tpu.deploy.student_obs import MotionHost, StudentObsBuilder

    class _M:  # minimal motion stub: identity pose, 2 bodies
        length, dt, num_frames = 2.0, 0.02, 101

        def state(self, t):
            t = np.asarray(t, dtype=np.float64)
            sh = t.shape
            return dict(
                body_pos=np.zeros(sh + (2, 3), np.float32) + np.asarray([0, 0, 0.79], np.float32),
                body_rot=np.broadcast_to(np.asarray([0, 0, 0, 1], np.float32), sh + (2, 4)).copy(),
                body_vel=np.zeros(sh + (2, 3), np.float32),
                body_ang_vel=np.zeros(sh + (2, 3), np.float32),
                dof_pos=np.zeros(sh + (3,), np.float32),
                dof_vel=np.zeros(sh + (3,), np.float32))

    meta = {
        "obs_dims": {"actions": 3, "base_ang_vel": 3, "dof_pos": 3, "dof_vel": 3,
                     "roll_pitch": 2},
        "obs_scales": {}, "default_dof_pos": [0.1, -0.2, 0.3], "clip_obs": 100.0,
        "dt": 0.02, "key_body_ids": [1], "anchor_index": 0,
        "future_num_steps": 4, "future_max_steps": 8, "history_length": 3,
    }

    class _R:
        def __init__(self, q, quat):
            self.q = np.asarray(q, np.float32)
            self.dq = np.zeros(3, np.float32)
            self.quat_xyzw = np.asarray(quat, np.float32)
            self.base_ang_vel_local = np.zeros(3, np.float32)
            self.last_action = np.zeros(3, np.float32)

    perfect = _R(meta["default_dof_pos"], [0, 0, 0, 1])
    # 0.05 rad dof error + 3 deg roll tilt at start
    a = np.sin(0.026), np.cos(0.026)
    tilted = _R(np.asarray(meta["default_dof_pos"]) + 0.05, [a[0], 0, 0, a[1]])

    b1 = StudentObsBuilder(dict(meta), _M(), compensate_offsets=True)
    b2 = StudentObsBuilder(dict(meta), _M(), compensate_offsets=True)
    o1 = b1.build(perfect, 0.0)
    o2 = b2.build(tilted, 0.0)
    for k in o1:
        assert np.allclose(o1[k], o2[k], atol=1e-5), (k, np.abs(o1[k] - o2[k]).max())
