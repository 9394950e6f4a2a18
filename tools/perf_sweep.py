"""Single-chip perf sweep for the motion-tracking training stack.

Measures (a) pure env-step throughput across env counts, and (b) full
train-iteration fps (rollout+update in one jit) for storage f32 vs bf16.
Run on a FREE TPU (exclusive tunnel). Results print one JSON line per config.

    python tools/perf_sweep.py [envs|train|all]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

MOTION = "/root/repo/assets/motions/Horse-stance_punch.pkl"
SELS = ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
        "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"]


def env_throughput(num_envs, steps=30):
    import jax.numpy as jnp

    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose("/root/repo/pbhc_tpu/config", SELS,
                  [f"num_envs={num_envs}", f"robot.motion.motion_file={MOTION}"])
    env = MotionTrackingEnv(cfg, num_envs, jax.random.PRNGKey(0))
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
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.time()
    state, acc = rollout(state)
    jax.block_until_ready(acc)
    dt = time.time() - t0
    return steps * num_envs / dt


def train_fps(num_envs, storage_dtype, iters=30):
    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose("/root/repo/pbhc_tpu/config", SELS,
                  [f"num_envs={num_envs}", f"robot.motion.motion_file={MOTION}",
                   f"algo.config.storage_dtype={storage_dtype}"])
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
    return algo.num_steps * num_envs * iters / dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("envs", "all"):
        for n in (2048, 4096, 8192):
            eps = env_throughput(n)
            print(json.dumps({"config": f"env_step_{n}", "env_steps_per_sec": round(eps)}))
    if which in ("train", "all"):
        for dtype in ("float32", "bfloat16"):
            fps = train_fps(4096, dtype)
            print(json.dumps({"config": f"train_4096_{dtype}", "env_steps_per_sec": round(fps)}))


if __name__ == "__main__":
    main()
