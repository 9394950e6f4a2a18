"""Reference-policy metric anchors.

Rolls the reference's shipped pretrained ONNX policies (the golden artifacts,
reference example/pretrained_horse_stance_pose*/exported/*.onnx) through OUR
MuJoCo sim2sim runtime and computes the E_*/L2 metric families against the
reference motions — producing the "reference reward/metric" anchor our trained
policies are compared to (the reference's own validation idiom: train ->
replay in MuJoCo -> measure, reference README.md:104 + measure_traj.py).

Usage: python tools/golden_metrics.py [out.json]
Runs on CPU (MuJoCo + numpy ONNX executor; no TPU needed).
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REF = "/root/reference/example"
CASES = [
    ("horse_stance_pose", f"{REF}/pretrained_horse_stance_pose",
     "model_50000.onnx", f"{REF}/motion_data/Horse-stance_pose.pkl"),
    ("horse_stance_pose_2", f"{REF}/pretrained_horse_stance_pose_2",
     "model_119000.onnx", f"{REF}/motion_data/Horse-stance_pose.pkl"),
    ("horse_stance_punch", f"{REF}/pretrained_horse_stance_punch",
     "model_33000.onnx", f"{REF}/motion_data/Horse-stance_punch.pkl"),
]


def run_case(ckpt_dir, onnx, motion_file):
    import jax.numpy as jnp

    from pbhc_tpu.deploy.urci import URCIRobot
    from pbhc_tpu.eval.metrics import eval_accuracy, eval_smoothness
    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.model.kinematics import fk_root_dof
    from pbhc_tpu.motion.motion_lib import MotionLib, get_motion_state

    robot = URCIRobot([f"{ckpt_dir}/exported/{onnx}"], motion_file=motion_file)
    n_steps = int(robot.motion.data.num_frames[0] / robot.motion.data.fps[0] / robot.ctrl_dt)
    traj = robot.routing(total_steps=n_steps, loop=False)

    model = load_g1_motion_model()
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

    ml = MotionLib(motion_file, model, num_envs=1, step_dt=robot.ctrl_dt)
    times = jnp.asarray(np.arange(T) * robot.ctrl_dt)
    mres = get_motion_state(ml.data, jnp.zeros(T, jnp.int32), times)
    ref_d = {
        "body_pos": np.asarray(mres["rg_pos_t"]), "body_rot": np.asarray(mres["rg_rot_t"]),
        "dof_pos": np.asarray(mres["dof_pos"]), "root_pos": np.asarray(mres["root_pos"]),
        "root_vel": np.asarray(mres["root_vel"]),
        "contact_mask": np.asarray(mres["contact_mask"]),
    }
    # FK'd traj has no extended bodies; truncate ref to the sim body set
    B = traj_d["body_pos"].shape[1]
    ref_d["body_pos"] = ref_d["body_pos"][:, :B]
    ref_d["body_rot"] = ref_d["body_rot"][:, :B]

    acc = eval_accuracy(traj_d, ref_d, robot.ctrl_dt)
    smooth = eval_smoothness(traj_d, robot.ctrl_dt)
    final_z = float(traj_d["root_pos"][-1, 2])
    return {"accuracy": acc, "smoothness": smooth, "steps": T, "final_z": final_z}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/GOLDEN_METRICS.json"
    results = {}
    for name, ckpt_dir, onnx, motion in CASES:
        import os

        if not os.path.exists(f"{ckpt_dir}/exported/{onnx}"):
            print(f"[golden] skip {name}: missing {onnx}")
            continue
        print(f"[golden] {name} ...")
        results[name] = run_case(ckpt_dir, onnx, motion)
        print(json.dumps(results[name]["accuracy"], indent=1))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[golden] wrote {out_path}")


if __name__ == "__main__":
    main()
