"""Single-chip perf ceiling estimate (VERDICT r4 weak #3): what fraction of
the TPU's achievable FLOP/s does the measured training throughput represent?

Method: XLA's own cost analysis of the EXACT jitted graph train.py runs
(MHPPO train_iteration at 4096 envs, full DR) gives flops + HBM bytes per
iteration; combined with the measured env-steps/s (BENCH_r*.json) this yields
achieved FLOP/s and bandwidth, compared against v5e (TPU v5 lite) peaks:
~197 TFLOP/s bf16 MXU, ~1/4 of that for f32 (the engine solves in f32 —
contact math is ill-conditioned in bf16, see docs/RESULTS.md sweeps), and
~819 GB/s HBM. The graph is lowered on the CPU backend — HLO-level flop
counts are backend-independent; only the peaks are TPU-specific.

Usage: python tools/mfu_model.py [num_envs=4096] [fps=<measured env-steps/s>]
Prints one JSON line; paste the numbers into docs/RESULTS.md.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    num_envs = int(kv.get("num_envs", 4096))
    fps = float(kv.get("fps", 194379.7))   # BENCH_r04 measured env-steps/s

    from pbhc_tpu.utils.cpu_cache import setup_cpu_cache

    setup_cpu_cache(min_compile_secs=1.0)

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
    compiled = jax.jit(algo.train_iteration).lower(ts).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    steps = algo.num_steps * num_envs          # env-steps per iteration
    it_per_s = fps / steps
    achieved_tflops = flops * it_per_s / 1e12
    achieved_gbs = bytes_acc * it_per_s / 1e9
    out = {
        "num_envs": num_envs,
        "flops_per_iter": flops,
        "hbm_bytes_per_iter": bytes_acc,
        "measured_env_steps_per_sec": fps,
        "iters_per_sec": round(it_per_s, 3),
        "achieved_tflops": round(achieved_tflops, 3),
        "achieved_hbm_gbs": round(achieved_gbs, 1),
        "mfu_vs_v5e_f32_49tflops": round(achieved_tflops / 49.0, 4),
        "mfu_vs_v5e_bf16_197tflops": round(achieved_tflops / 197.0, 4),
        "hbm_fraction_vs_819gbs": round(achieved_gbs / 819.0, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
