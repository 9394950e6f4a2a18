"""Benchmark: motion-tracking env throughput on the available accelerator.

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
import jax.numpy as jnp

# persistent compile cache: the full env-step scan is a big graph (fresh
# remote compile can take >10 min); cached reruns start in seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = 30

    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        [f"num_envs={num_envs}",
         "robot.motion.motion_file=/root/reference/example/motion_data/Horse-stance_punch.pkl"],
    )
    env = MotionTrackingEnv(cfg, num_envs, jax.random.PRNGKey(0))
    state = env.init_state(jax.random.PRNGKey(1))
    actions = jnp.zeros((num_envs, env.nd))

    # measure the shape training uses: a scanned rollout inside one jit
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
    dt = time.time() - t0
    eps = steps * num_envs / dt

    baseline = 50_000.0  # published legged-gym-class Isaac Gym numbers @4096 envs
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(eps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(eps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
