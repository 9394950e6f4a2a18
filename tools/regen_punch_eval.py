"""Regenerate docs/punch_final_eval.json from the tracked punch policy npz.

Reproduces the original eval_agent flow (in-engine deterministic rollout +
MuJoCo sim2sim, reference README.md:102-104 idiom) for the committed
docs/punch_final_policy.npz, so the documented numbers track the current
metric formulas (reference-harness convention, measure_traj.py:145-287 via
ratio_eps.py:69-70). CPU-only.

Usage: python tools/regen_punch_eval.py [out.json]
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

NPZ = os.path.join(REPO, "docs/punch_final_policy.npz")
MOTION = os.path.join(REPO, "assets/motions/Horse-stance_punch.pkl")


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/punch_final_eval.json"

    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.deploy.export import NumpyPolicy
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv
    from pbhc_tpu.eval.metrics import eval_accuracy, eval_smoothness
    from pbhc_tpu.eval.sim2sim import rollout_metrics
    from pbhc_tpu.eval_agent import rollout_jax

    pol = NumpyPolicy(NPZ)
    cfg = compose(
        os.path.join(REPO, "pbhc_tpu/config"),
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=1", f"robot.motion.motion_file={MOTION}"],
    )
    env = MotionTrackingEnv(cfg, 1, jax.random.PRNGKey(0))
    layers = [(jnp.asarray(w), jnp.asarray(b)) for w, b in pol.layers]

    class _Actor:
        @staticmethod
        def apply(params, obs):
            x = obs
            for i, (w, b) in enumerate(layers):
                x = x @ w + b
                if i < len(layers) - 1:
                    x = jax.nn.elu(x)
            return x, None

    # int() truncation, NOT ceil — must match eval_agent.py:164 exactly so the
    # regenerated numbers are bit-comparable to an eval_agent run
    num_steps = int(float(env.motion_lib.data.lengths[0]) / env.dt)
    traj, ref, dones = rollout_jax(env, _Actor(), None, num_steps,
                                   jax.random.PRNGKey(1))
    results = {
        "accuracy": eval_accuracy(traj, ref, env.dt),
        "smoothness": eval_smoothness(traj, env.dt, ref=ref),
        "completion_ratio": len(traj["dof_pos"]) / num_steps,
    }
    s2s = rollout_metrics(NPZ, MOTION, robot_type=str(cfg.robot.robot_type),
                          fix_height=str(cfg.robot.motion.get("fix_height", "no_fix")))
    results["sim2sim_final_z"] = s2s["final_z"]
    results["sim2sim"] = s2s
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[regen] wrote {out_path}")
    print(json.dumps({"in_engine_E_mpjpe": results["accuracy"]["E_mpjpe"],
                      "sim2sim_E_mpjpe": s2s["accuracy"]["E_mpjpe"],
                      "completion": results["completion_ratio"],
                      "final_z": s2s["final_z"]}))


if __name__ == "__main__":
    main()
