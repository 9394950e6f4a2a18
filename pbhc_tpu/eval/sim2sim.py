"""Sim2sim metric rollout: exported policy -> MuJoCo -> E_*/L2 metric suite.

The reference's validation idiom (reference README.md:104: train in Isaac ->
replay in MuJoCo via urci.py -> measure with measure_traj.py) as one call,
shared by eval_agent's sim2sim check, tools/golden_metrics.py, and
tools/transfer_track.py. Runs on CPU (MuJoCo + numpy policy executor).
"""
from __future__ import annotations

import numpy as np


def rollout_metrics(policy_path, motion_file, robot_type="g1_23dof_lock_wrist",
                    fix_height="no_fix"):
    """Roll `policy_path` (.npz export or reference .onnx) through the MuJoCo
    deploy runtime for one motion length and score it against the reference
    motion. Returns {"accuracy", "smoothness", "steps", "final_z"}."""
    import jax
    import jax.numpy as jnp

    from pbhc_tpu.deploy.urci import URCIRobot
    from pbhc_tpu.eval.metrics import eval_accuracy, eval_smoothness
    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.model.kinematics import fk_root_dof
    from pbhc_tpu.motion.motion_lib import MotionLib, get_motion_state

    robot = URCIRobot([str(policy_path)], motion_file=str(motion_file))
    n_steps = int(robot.motion.data.num_frames[0] / robot.motion.data.fps[0] / robot.ctrl_dt)
    traj = robot.routing(total_steps=n_steps, loop=False)

    model = load_g1_motion_model(robot_type)
    T = len(traj["dof_pos"])
    fk = jax.jit(jax.vmap(fk_root_dof, in_axes=(None, 0, 0, 0)), static_argnums=0)
    body_pos, body_rot, _ = fk(model, jnp.asarray(np.stack(traj["root_pos"])),
                               jnp.asarray(np.stack(traj["root_rot"])),
                               jnp.asarray(np.stack(traj["dof_pos"])))
    traj_d = {
        "body_pos": np.asarray(body_pos), "body_rot": np.asarray(body_rot),
        "dof_pos": np.stack(traj["dof_pos"]), "root_pos": np.stack(traj["root_pos"]),
        "root_vel": np.stack(traj["root_lin_vel"]),
    }

    # thread the training run's fix_height so metrics are scored against the
    # same (possibly height-shifted) reference the policy was trained on
    ml = MotionLib(str(motion_file), model, num_envs=1, step_dt=robot.ctrl_dt,
                   fix_height=str(fix_height))
    times = jnp.asarray(np.arange(T) * robot.ctrl_dt)
    mres = get_motion_state(ml.data, jnp.zeros(T, jnp.int32), times)
    ref_d = {
        "body_pos": np.asarray(mres["rg_pos_t"]), "body_rot": np.asarray(mres["rg_rot_t"]),
        "dof_pos": np.asarray(mres["dof_pos"]), "root_pos": np.asarray(mres["root_pos"]),
        "root_vel": np.asarray(mres["root_vel"]),
        "contact_mask": np.asarray(mres["contact_mask"]),
    }
    B = traj_d["body_pos"].shape[1]  # FK'd traj has no extended bodies
    ref_d["body_pos"] = ref_d["body_pos"][:, :B]
    ref_d["body_rot"] = ref_d["body_rot"][:, :B]

    return {
        "accuracy": eval_accuracy(traj_d, ref_d, robot.ctrl_dt),
        "smoothness": eval_smoothness(traj_d, robot.ctrl_dt, ref=ref_d),
        "steps": T,
        "final_z": float(traj_d["root_pos"][-1, 2]),
    }


def student_rollout_metrics(onnx_path, motion_file=None,
                            robot_type=None, fix_height="no_fix"):
    """Sim2sim for the deployable 3-input student ONNX: drive the REAL-ROBOT
    controller pathway (StudentPolicy + StudentObsBuilder, 50 Hz) through the
    MuJoCo loopback transport and score the resulting trajectory with the same
    E_*/L2 suite (reference: deploy_real student path validated via
    deploy/mujoco.py sim2sim before hardware runs)."""
    import jax
    import jax.numpy as jnp

    from pbhc_tpu.deploy.export import StudentPolicy
    from pbhc_tpu.deploy.mujoco_runtime import MujocoDeployRobot
    from pbhc_tpu.deploy.real_robot import LoopbackTransport, RealRobotController
    from pbhc_tpu.eval.metrics import eval_accuracy, eval_smoothness
    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.model.kinematics import fk_root_dof
    from pbhc_tpu.motion.motion_lib import MotionLib, get_motion_state

    policy = StudentPolicy(onnx_path)
    mf = str(motion_file or policy.meta["motion_file"])
    robot_type = robot_type or policy.meta.get("robot_type", "g1_29dof_rev_1_0")
    sim = MujocoDeployRobot(policy, mf, robot_type=robot_type)
    sim.reset()
    # compensate_offsets=False = the training/sim2sim obs idiom (full anchor
    # quat, no init offsets); True is the hardware idiom (see StudentObsBuilder)
    ctrl = RealRobotController(str(onnx_path), LoopbackTransport(sim), motion_file=mf,
                               compensate_offsets=False)
    assert ctrl.is_student, "policy is not a 3-input student export"
    ctrl.mode = ctrl.POLICY

    n_steps = int(float(sim.motion.data.lengths[0]) / ctrl.ctrl_dt)
    traj = {"root_pos": [], "root_rot": [], "dof_pos": []}
    for _ in range(n_steps):
        ctrl.step()
        traj["root_pos"].append(sim.d.qpos[:3].copy())
        traj["root_rot"].append(sim.base_quat_xyzw)
        traj["dof_pos"].append(sim.q)

    model = load_g1_motion_model(robot_type)
    T = n_steps
    fk = jax.jit(jax.vmap(fk_root_dof, in_axes=(None, 0, 0, 0)), static_argnums=0)
    body_pos, body_rot, _ = fk(model, jnp.asarray(np.stack(traj["root_pos"])),
                               jnp.asarray(np.stack(traj["root_rot"])),
                               jnp.asarray(np.stack(traj["dof_pos"])))
    traj_d = {
        "body_pos": np.asarray(body_pos), "body_rot": np.asarray(body_rot),
        "dof_pos": np.stack(traj["dof_pos"]), "root_pos": np.stack(traj["root_pos"]),
        "root_vel": np.gradient(np.stack(traj["root_pos"]), ctrl.ctrl_dt, axis=0),
    }
    ml = MotionLib(mf, model, num_envs=1, step_dt=ctrl.ctrl_dt, fix_height=str(fix_height))
    times = jnp.asarray(np.arange(T) * ctrl.ctrl_dt)
    mres = get_motion_state(ml.data, jnp.zeros(T, jnp.int32), times)
    ref_d = {
        "body_pos": np.asarray(mres["rg_pos_t"]), "body_rot": np.asarray(mres["rg_rot_t"]),
        "dof_pos": np.asarray(mres["dof_pos"]), "root_pos": np.asarray(mres["root_pos"]),
        "root_vel": np.asarray(mres["root_vel"]),
        "contact_mask": np.asarray(mres["contact_mask"]),
    }
    B = traj_d["body_pos"].shape[1]
    ref_d["body_pos"] = ref_d["body_pos"][:, :B]
    ref_d["body_rot"] = ref_d["body_rot"][:, :B]
    return {
        "accuracy": eval_accuracy(traj_d, ref_d, ctrl.ctrl_dt),
        "smoothness": eval_smoothness(traj_d, ctrl.ctrl_dt, ref=ref_d),
        "steps": T,
        "final_z": float(traj_d["root_pos"][-1, 2]),
    }
