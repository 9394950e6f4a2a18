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
        "smoothness": eval_smoothness(traj_d, robot.ctrl_dt),
        "steps": T,
        "final_z": float(traj_d["root_pos"][-1, 2]),
    }
