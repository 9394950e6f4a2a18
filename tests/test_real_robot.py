"""Real-robot controller state machine against the loopback (MuJoCo) transport."""
import numpy as np
import jax
import jax.numpy as jnp


def test_controller_state_machine(tmp_path):
    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.deploy.export import export_policy
    from pbhc_tpu.deploy.mujoco_runtime import MujocoDeployRobot
    from pbhc_tpu.deploy.real_robot import LoopbackTransport, RealRobotController

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=2",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl"],
    )
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    env = MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    params = algo.actor.init(jax.random.PRNGKey(1), jnp.zeros((1, algo.actor_dim)))
    npz = export_policy(params, env, tmp_path / "p.npz",
                        meta_extra={"motion_file": str(cfg.robot.motion.motion_file)})

    sim = MujocoDeployRobot(npz, str(cfg.robot.motion.motion_file))
    sim.reset()
    ctrl = RealRobotController(npz, LoopbackTransport(sim))

    assert ctrl.mode == ctrl.ZERO_TORQUE
    for _ in range(3):
        ctrl.step()
    ctrl.request_policy()
    assert ctrl.mode == ctrl.MOVE_TO_DEFAULT
    for _ in range(ctrl.move_steps + 1):
        ctrl.step()
    assert ctrl.mode == ctrl.DEFAULT_POSE
    # robot should be near the default pose after the move phase
    err = np.abs(sim.d.qpos[7:] - ctrl.default_dof).max()
    assert err < 0.5, err
    ctrl.request_policy()
    assert ctrl.mode == ctrl.POLICY
    for _ in range(5):
        ctrl.step()
    assert len(ctrl.obs_log) == 5
    assert np.isfinite(sim.d.qpos).all()
