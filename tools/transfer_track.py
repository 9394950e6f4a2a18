"""Track sim2sim transfer across checkpoints of a training run.

For each ckpt/model_N.pkl in the run dir (optionally filtered by a minimum
iteration), runs the standard eval (in-engine metrics + MuJoCo sim2sim replay,
reference eval_agent.py + urci.py idiom) on CPU and appends one JSON line per
checkpoint to <run_dir>/transfer_track.jsonl.

    python tools/transfer_track.py <run_dir> [min_iter] [max_iter]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    run_dir = Path(sys.argv[1])
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 10**9
    out = run_dir / "transfer_track.jsonl"
    done = set()
    if out.exists():
        done = {json.loads(l)["iter"] for l in out.read_text().splitlines() if l.strip()}

    from pbhc_tpu.eval_agent import main as eval_main

    ckpts = sorted(run_dir.glob("ckpt/model_*"),
                   key=lambda p: int(p.stem.split("_")[1]))
    for ck in ckpts:
        it = int(ck.stem.split("_")[1])
        if it in done or not (lo <= it <= hi):
            continue
        print(f"[track] evaluating {ck}")
        res = eval_main([f"checkpoint={ck}", "sim2sim=true"])
        rec = {"iter": it,
               "completion_ratio": res["completion_ratio"],
               "E_mpjpe": res["accuracy"]["E_mpjpe"],
               "L2_dof_jerk": res["smoothness"]["L2_dof_jerk"],
               "sim2sim_final_z": res.get("sim2sim_final_z")}
        if "sim2sim" in res:
            rec["sim2sim_E_mpjpe"] = res["sim2sim"]["accuracy"]["E_mpjpe"]
            rec["sim2sim_L2_dof_jerk"] = res["sim2sim"]["smoothness"]["L2_dof_jerk"]
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[track] {rec}")


if __name__ == "__main__":
    main()
