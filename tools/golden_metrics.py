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
    from pbhc_tpu.eval.sim2sim import rollout_metrics

    return rollout_metrics(f"{ckpt_dir}/exported/{onnx}", motion_file)


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
