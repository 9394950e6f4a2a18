"""Benchmark suite matching BASELINE.md's five configurations.

1. deploy:  exported-policy MuJoCo rollout, single env, CPU (the reference
   benchmarks its pretrained ONNX policies this way; onnxruntime is absent so
   the NumpyPolicy export path is measured)
2. walk64:  G1 23-DoF walk tracking (g1_walk_45cms_23dof.pkl), env @64
3. punch4096: horse-stance-punch @4096 envs (the headline; same as bench.py)
4. kb2:     KungfuBot2 general tracking over a multi-motion library (29-DoF)
5. dr29:    29-DoF + full DR + sim2sim eval path

Each prints one JSON line {"config", "metric", "value", "unit"}.

    python -m pbhc_tpu.eval.benchmarks [1|2|3|4|5|all]
"""
from __future__ import annotations

import json
import sys
import time

WALK = "/root/repo/assets/motions/g1_walk_45cms_23dof.pkl"
PUNCH = "/root/repo/assets/motions/Horse-stance_punch.pkl"
POSE = "/root/repo/assets/motions/Horse-stance_pose.pkl"
KICK = "/root/repo/assets/motions/Side_kick.pkl"
WALK29 = "/root/repo/assets/motions/g1_rig_Skeleton_Sequence_converted_processed_g1_29dof_rev_1_0.pkl"


def _env_throughput(selections, overrides, num_envs, steps=30):
    import jax
    import jax.numpy as jnp

    from pbhc_tpu.config.loader import compose
    import importlib

    cfg = compose("/root/repo/pbhc_tpu/config", selections, overrides + [f"num_envs={num_envs}"])
    mod, cls = cfg.env.target.rsplit(".", 1)
    env = getattr(importlib.import_module(mod), cls)(cfg, num_envs, jax.random.PRNGKey(0))
    state = env.init_state(jax.random.PRNGKey(1))
    actions = jnp.zeros((num_envs, env.nd))

    @jax.jit
    def rollout(state):
        def body(st, _):
            st, obs, rew, done, info = env.step(st, actions)
            return st, rew.sum()

        state, rews = jax.lax.scan(body, state, None, length=steps)
        return state, rews.sum()

    state, _ = rollout(state)
    jax.block_until_ready(state)
    t0 = time.time()
    state, acc = rollout(state)
    jax.block_until_ready(acc)
    return steps * num_envs / (time.time() - t0)


def bench_deploy():
    """Config 1: MuJoCo deploy rollout rate (single env, CPU)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.deploy.export import export_policy
    from pbhc_tpu.deploy.mujoco_runtime import MujocoDeployRobot
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose("/root/repo/pbhc_tpu/config",
                  ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
                   "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
                  ["num_envs=2", f"robot.motion.motion_file={POSE}"])
    env = MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    params = algo.actor.init(jax.random.PRNGKey(1), jnp.zeros((1, algo.actor_dim)))
    with tempfile.TemporaryDirectory() as d:
        npz = export_policy(params, env, f"{d}/p.npz", meta_extra={"motion_file": POSE})
        robot = MujocoDeployRobot(npz, POSE)
        robot.reset()
        for _ in range(10):
            robot.control_step()
        t0 = time.time()
        n = 100
        for _ in range(n):
            robot.control_step()
        rate = n / (time.time() - t0)
    return {"config": "1-deploy-mujoco", "metric": "control_steps_per_sec",
            "value": round(rate, 1), "unit": "50Hz-steps/s (realtime x{:.1f})".format(rate / 50)}


def bench_walk64():
    eps = _env_throughput(
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        [f"robot.motion.motion_file={WALK}"], 64)
    return {"config": "2-walk-64env", "metric": "env_steps_per_sec", "value": round(eps, 1), "unit": "steps/s"}


def bench_punch4096():
    eps = _env_throughput(
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        [f"robot.motion.motion_file={PUNCH}"], 4096)
    return {"config": "3-punch-4096env", "metric": "env_steps_per_sec", "value": round(eps, 1), "unit": "steps/s"}


def bench_kb2():
    import tempfile

    from pbhc_tpu.motion.package import merge

    with tempfile.TemporaryDirectory() as d:
        lib = f"{d}/lib.pkl"
        merge(lib, [POSE, PUNCH, KICK])
        eps = _env_throughput(
            ["exp=general_tracking", "robot=g1_29dof", "obs=general_tracking_teacher",
             "rewards=general_tracking", "domain_rand=main", "simulator=tpu"],
            [f"robot.motion.motion_file={lib}"], 2048)
    return {"config": "4-kb2-multimotion-2048env", "metric": "env_steps_per_sec",
            "value": round(eps, 1), "unit": "steps/s"}


def bench_dr29():
    eps = _env_throughput(
        ["exp=general_tracking", "robot=g1_29dof", "obs=general_tracking_teacher",
         "rewards=general_tracking", "domain_rand=main", "simulator=tpu"],
        [f"robot.motion.motion_file={WALK29}"], 1024)
    return {"config": "5-29dof-fullDR-1024env", "metric": "env_steps_per_sec",
            "value": round(eps, 1), "unit": "steps/s"}


BENCHES = {"1": bench_deploy, "2": bench_walk64, "3": bench_punch4096,
           "4": bench_kb2, "5": bench_dr29}


def main(argv=None):
    argv = argv or sys.argv[1:]
    which = argv[0] if argv else "all"
    keys = list(BENCHES) if which == "all" else [which]
    out = []
    for k in keys:
        res = BENCHES[k]()
        print(json.dumps(res), flush=True)
        out.append(res)
    return out


if __name__ == "__main__":
    main()
