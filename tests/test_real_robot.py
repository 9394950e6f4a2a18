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


def test_remote_controller_decode():
    """Wireless-remote blob decode (reference common/remote_controller.py)."""
    import struct

    from pbhc_tpu.deploy.real_robot import KeyMap, RemoteController

    blob = bytearray(40)
    keys = (1 << KeyMap.start) | (1 << KeyMap.A)
    blob[2:4] = struct.pack("<H", keys)
    blob[4:8] = struct.pack("<f", 0.25)
    blob[8:12] = struct.pack("<f", -0.5)
    blob[12:16] = struct.pack("<f", 0.75)
    blob[20:24] = struct.pack("<f", -1.0)
    rc = RemoteController()
    rc.set(blob)
    assert rc.button[KeyMap.start] == 1 and rc.button[KeyMap.A] == 1
    assert rc.button[KeyMap.B] == 0
    assert (rc.lx, rc.rx, rc.ry, rc.ly) == (0.25, -0.5, 0.75, -1.0)


def test_deploy_map_covers_bus():
    """The 23 policy DoFs + 6 held wrists tile the 29-motor bus exactly
    (reference deploy_real/configs/g1_23.yaml index maps)."""
    from pbhc_tpu.deploy.real_robot import G1DeployMap

    m = G1DeployMap()
    used = set(m.policy2motor) | set(m.held_motor_idx)
    assert len(m.policy2motor) == 23 and len(m.held_motor_idx) == 6
    assert used == set(range(m.num_motors))


def test_kb1_offset_compensation(tmp_path):
    """Captured init dof offsets are APPLIED to the dof obs: a start-pose
    error shifts raw q but leaves the policy's dof_pos obs unchanged
    (reference deploy_real.py:654-662,696-699)."""
    import jax.numpy as jnp

    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.deploy.export import export_policy
    from pbhc_tpu.deploy.real_robot import LowState, RealRobotController, Transport
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=2",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl"],
    )
    env = MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    params = algo.actor.init(jax.random.PRNGKey(1), jnp.zeros((1, algo.actor_dim)))
    npz = export_policy(params, env, tmp_path / "p.npz",
                        meta_extra={"motion_file": str(cfg.robot.motion.motion_file)})

    class FrozenTransport(Transport):
        """Holds the robot at a fixed pose; records commands."""

        def __init__(self, q):
            self.q = np.asarray(q, dtype=np.float32)
            self.cmds = []

        def read_state(self):
            return LowState(q=self.q.copy(), dq=np.zeros_like(self.q),
                            quat_xyzw=np.array([0, 0, 0, 1.0], np.float32),
                            ang_vel_body=np.zeros(3, np.float32))

        def send_command(self, q_target, kp, kd):
            self.cmds.append(np.asarray(q_target).copy())

    def first_policy_obs(start_q):
        ctrl = RealRobotController(npz, FrozenTransport(start_q))
        ctrl.mode = ctrl.POLICY
        ctrl.step()
        return ctrl.obs_log[0]

    default = np.asarray(
        RealRobotController(npz, FrozenTransport(np.zeros(23))).default_dof)
    obs_perfect = first_policy_obs(default)
    obs_shifted = first_policy_obs(default + 0.07)
    np.testing.assert_allclose(obs_perfect, obs_shifted, atol=1e-6)
