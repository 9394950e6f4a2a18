"""Benchmark: FULL train-iteration throughput on the available accelerator.

Measures the honest training number — a complete MHPPO iteration (24-step
scanned rollout + minibatched update, the same jitted graph train.py runs) at
4096 G1 23-DoF envs with full domain randomization, reported as env-steps/s
(reference telemetry definition: fps = num_steps_per_env * num_envs /
iteration_time, reference agents/ppo/ppo.py:492,581-588).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline anchor: typical published Isaac Gym legged-gym throughput on an
RTX 4090-class GPU at 4096 envs is ~50k env-steps/s (see BASELINE.md) — the
reference repo itself publishes no numbers.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

# persistent compile cache: the full train iteration is a big graph (fresh
# remote compile can take >10 min); cached reruns start in seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = 20

    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        [f"num_envs={num_envs}",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_punch.pkl"],
    )
    env = MotionTrackingEnv(cfg, num_envs, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    ts = algo.init_train_state(jax.random.PRNGKey(1))
    ts, _ = algo.train_iteration(ts)   # compile 1 (init avals)
    ts, _ = algo.train_iteration(ts)   # compile 2 (steady avals)
    jax.block_until_ready(jax.tree.leaves(ts)[0])

    t0 = time.time()
    for _ in range(iters):
        ts, log = algo.train_iteration(ts)
    jax.block_until_ready(jax.tree.leaves(ts)[0])
    dt = time.time() - t0
    eps = algo.num_steps * num_envs * iters / dt

    baseline = 50_000.0  # published legged-gym-class Isaac Gym numbers @4096 envs
    print(json.dumps({
        "metric": "train_env_steps_per_sec",
        "value": round(eps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(eps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
