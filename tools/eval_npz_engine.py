"""In-engine eval of an EXPORTED policy (.npz) under configurable solver knobs.

Used to validate that contact-solver knob changes (contact_cap / solver_iters /
pos_iters, see docs/RESULTS.md sweep) do not change the dynamics a trained
policy experiences: roll the same exported policy deterministically from t=0
and compare completion + E_mpjpe across knob settings (reference idiom:
eval_agent.py num_envs=1 deterministic eval + measure_traj metrics).

    python tools/eval_npz_engine.py docs/punch_final_policy.npz \
        [simulator.config.contact_cap=16 simulator.config.solver_iters=32 ...]
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    npz_path = sys.argv[1]
    overrides = sys.argv[2:]

    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.deploy.export import NumpyPolicy
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv
    from pbhc_tpu.eval.metrics import eval_accuracy
    from pbhc_tpu.eval_agent import rollout_jax

    pol = NumpyPolicy(npz_path)
    motion = pol.meta.get("motion_file", "")
    if motion.startswith("/root/reference"):
        motion = "/root/repo/assets/motions/" + motion.rsplit("/", 1)[1]

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=1", f"robot.motion.motion_file={motion}"] + list(overrides),
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

    # int() truncation to match eval_agent.py:164 (comparable step counts)
    num_steps = int(float(env.motion_lib.data.lengths[0]) / env.dt)
    traj, ref, dones = rollout_jax(env, _Actor(), None, num_steps,
                                   jax.random.PRNGKey(1))
    acc = eval_accuracy(traj, ref, env.dt)
    # rollout_jax breaks at the first done; surviving all steps = completion 1.0
    ratio = len(dones) / num_steps
    print(json.dumps({"overrides": overrides, "steps": num_steps,
                      "completion_ratio": ratio,
                      "E_mpjpe": round(acc["E_mpjpe"], 1),
                      "E_gmpbpe": round(acc["E_gmpbpe"], 1),
                      "final_root_z": round(float(traj["root_pos"][-1][2]), 3)}))


if __name__ == "__main__":
    main()
