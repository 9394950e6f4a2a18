"""Full-train-iteration throughput sweep over engine solver knobs.

Each config re-measures the SAME graph bench.py reports (MHPPO iteration at
4096 envs, full DR), varying one knob at a time. Run on a FREE TPU (exclusive
tunnel); one JSON line per config.

    python tools/sweep_knobs.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MOTION = "/root/repo/assets/motions/Horse-stance_punch.pkl"
SELS = ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
        "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"]


def train_fps(num_envs, extra, iters=20):
    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose("/root/repo/pbhc_tpu/config", SELS,
                  [f"num_envs={num_envs}", f"robot.motion.motion_file={MOTION}"]
                  + list(extra))
    env = MotionTrackingEnv(cfg, num_envs, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    ts = algo.init_train_state(jax.random.PRNGKey(1))
    ts, _ = algo.train_iteration(ts)
    ts, _ = algo.train_iteration(ts)
    jax.block_until_ready(jax.tree.leaves(ts)[0])
    t0 = time.time()
    for _ in range(iters):
        ts, log = algo.train_iteration(ts)
    jax.block_until_ready(jax.tree.leaves(ts)[0])
    rew = float(jax.device_get(log["Train/mean_step_reward"]))
    return algo.num_steps * num_envs * iters / (time.time() - t0), rew


CONFIGS = [
    ("baseline_4096", 4096, []),
    ("envs_8192", 8192, []),
    ("envs_6144", 6144, []),
    ("iters_24", 4096, ["simulator.config.solver_iters=24"]),
    ("iters_16", 4096, ["simulator.config.solver_iters=16"]),
    ("cap_12", 4096, ["simulator.config.contact_cap=12"]),
    ("pos_iters_4", 4096, ["simulator.config.pos_iters=4"]),
    ("mv_bf16", 4096, ["simulator.config.contact_matvec_dtype=bfloat16"]),
    ("pallas", 4096, ["simulator.config.lanes_contact_kernel=pallas"]),
    ("combo", 4096, ["simulator.config.solver_iters=24",
                     "simulator.config.pos_iters=4",
                     "simulator.config.contact_matvec_dtype=bfloat16"]),
    ("combo_8192", 8192, ["simulator.config.solver_iters=24",
                          "simulator.config.pos_iters=4",
                          "simulator.config.contact_matvec_dtype=bfloat16"]),
    ("c12_i16", 4096, ["simulator.config.contact_cap=12",
                       "simulator.config.solver_iters=16"]),
    ("c12_i16_p4", 4096, ["simulator.config.contact_cap=12",
                          "simulator.config.solver_iters=16",
                          "simulator.config.pos_iters=4"]),
    ("c10_i16_p4", 4096, ["simulator.config.contact_cap=10",
                          "simulator.config.solver_iters=16",
                          "simulator.config.pos_iters=4"]),
    ("c8_i16_p4", 4096, ["simulator.config.contact_cap=8",
                         "simulator.config.solver_iters=16",
                         "simulator.config.pos_iters=4"]),
    # round-3 class-aware pair budgets (shipped default = pair4)
    ("pair4", 4096, []),
    ("pair3", 4096, ["simulator.config.pair_cap=3"]),
    ("pair2", 4096, ["simulator.config.pair_cap=2"]),
    ("pair0_global_top8", 4096, ["simulator.config.pair_cap=0"]),
    ("pair4_bf16", 4096, ["simulator.config.contact_matvec_dtype=bfloat16"]),
    ("pair4_pallas", 4096, ["simulator.config.lanes_contact_kernel=pallas"]),
]


def main():
    only = sys.argv[1:] or None
    for name, n, extra in CONFIGS:
        if only and name not in only:
            continue
        fps, rew = train_fps(n, extra)
        print(json.dumps({"config": name, "env_steps_per_sec": round(fps),
                          "rew_per_step_it22": round(rew, 4)}), flush=True)


if __name__ == "__main__":
    main()
