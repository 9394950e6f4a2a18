"""Terrain end-to-end demo: replay a terrain-trained policy in MuJoCo ON the
training heightfield (the hfield export path) at a chosen curriculum tile.

The training env translates the reference motion onto each env's terrain tile
(tracking_env origin_shift); this tool does the same for the sim2sim oracle:
rebuild the (deterministic, seed-0) terrain from the run config, shift the
motion onto the requested tile, export the policy, and roll it through the
URCI MuJoCo runtime with the terrain hfield installed.

Usage:
    python tools/terrain_demo.py checkpoint=<ckpt> [row=3] [col=0] [out=...]
        [policy=<npz|onnx>]   # replay a DIFFERENT deployable policy on the
                              # checkpoint's terrain (e.g. the sim2sim-DAgger
                              # KB2 student on the terrain-run heightfield)

(reference parity: PhysX heightfield training, isaacgym.py:89-150; the
reference has no MuJoCo terrain twin — this closes that gap.)
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import yaml


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    ckpt = Path(kv["checkpoint"])
    row, col = int(kv.get("row", 3)), int(kv.get("col", 0))

    cfg = yaml.safe_load((ckpt.parent.parent / "config.yaml").read_text())
    tcfg = cfg["terrain"]
    assert tcfg["mesh_type"] == "heightfield", "checkpoint was not terrain-trained"

    from pbhc_tpu.envs.terrain import Terrain

    terrain = Terrain.from_run_config(tcfg)
    origin = terrain.env_origins[row, col]
    print(f"[terrain_demo] tile ({row},{col}) origin {origin}")

    # shift the motion onto the tile (the env's origin_shift idiom). With
    # policy=, the motion must be the POLICY's clip (its export meta), not the
    # terrain run's — a punch policy replayed against walk references would
    # only measure obs mismatch, not the hfield path.
    import joblib

    mf = Path(cfg["robot"]["motion"]["motion_file"])
    if "policy" in kv:
        pp = Path(kv["policy"])
        meta = {}
        if pp.suffix == ".npz":
            z = np.load(pp, allow_pickle=True)
            if "meta" in z:
                meta = json.loads(str(z["meta"]))
        elif Path(str(pp) + ".meta.json").exists():
            meta = json.loads(Path(str(pp) + ".meta.json").read_text())
        mf = Path(meta.get("motion_file", mf))
    data = joblib.load(mf)
    shifted = {}
    for name, m in data.items():
        m = dict(m)
        rt = np.asarray(m["root_trans_offset"], dtype=np.float32).copy()
        rt[:, 0] += float(origin[0]) - rt[0, 0]
        rt[:, 1] += float(origin[1]) - rt[0, 1]
        rt[:, 2] += float(origin[2])
        m["root_trans_offset"] = rt
        shifted[name] = m
    smf = Path("/tmp") / f"terrain_shifted_{mf.name}"
    joblib.dump(shifted, smf)

    # policy export (reuse eval_agent's if present); policy= overrides with
    # any deployable artifact (npz or onnx) to replay on this terrain
    if "policy" in kv:
        npz = Path(kv["policy"])
        assert npz.exists(), npz
    else:
        npz = ckpt.parent.parent / "exported" / f"{ckpt.name.replace('.pkl','')}.npz"
    if not npz.exists():
        from pbhc_tpu.eval.batch_eval import _load
        from pbhc_tpu.deploy.export import export_policy

        env, algo, payload = _load(ckpt, 1)
        params = payload.get("actor_params") or payload.get("params")
        npz = export_policy(params, env, npz,
                            meta_extra={"motion_file": str(mf)}, actor=algo.actor)
    print(f"[terrain_demo] policy {npz}")

    if str(npz).endswith(".onnx") and Path(str(npz) + ".meta.json").exists():
        # 3-input student export: drive the REAL-ROBOT controller pathway on
        # the terrain hfield (same loop as eval/sim2sim.student_rollout_metrics)
        from pbhc_tpu.deploy.export import StudentPolicy
        from pbhc_tpu.deploy.mujoco_runtime import MujocoDeployRobot
        from pbhc_tpu.deploy.real_robot import LoopbackTransport, RealRobotController

        policy = StudentPolicy(npz)
        rt = policy.meta.get("robot_type", "g1_23dof_lock_wrist")
        sim = MujocoDeployRobot(policy, str(smf), robot_type=rt, terrain=terrain)
        sim.reset()
        ctrl = RealRobotController(str(npz), LoopbackTransport(sim),
                                   motion_file=str(smf), compensate_offsets=False)
        assert ctrl.is_student
        ctrl.mode = ctrl.POLICY
        n = int(float(sim.motion.data.lengths[0]) / ctrl.ctrl_dt)
        traj = {"root_pos": [], "root_rot": []}
        for _ in range(n):
            ctrl.step()
            traj["root_pos"].append(sim.d.qpos[:3].copy())
            traj["root_rot"].append(sim.base_quat_xyzw)
    else:
        from pbhc_tpu.deploy.urci import URCIRobot

        robot = URCIRobot([str(npz)], motion_file=str(smf), terrain=terrain)
        n = int(robot.motion.data.num_frames[0] / robot.motion.data.fps[0] / robot.ctrl_dt)
        traj = robot.routing(total_steps=n, loop=False)
    rp = np.stack(traj["root_pos"])
    # height above the LOCAL terrain under the root (bilinear lookup), not the
    # tile-center height — on sloped cells the latter misreads progress as a
    # fall (URCI runs in untranslated terrain world coordinates)
    rel_z = rp[:, 2] - terrain.height_at(rp[:, :2])
    quat = np.stack(traj["root_rot"])
    roll = np.arctan2(2 * (quat[:, 3] * quat[:, 0] + quat[:, 1] * quat[:, 2]),
                      1 - 2 * (quat[:, 0] ** 2 + quat[:, 1] ** 2))
    fall = next((t for t in range(len(rel_z)) if rel_z[t] < 0.35), None)
    res = {
        "tile": [row, col], "steps": int(len(rp)), "clip_steps": int(n),
        "completed": fall is None, "first_fall_tick": fall,
        "final_rel_z": float(rel_z[-1]), "min_rel_z": float(rel_z.min()),
        "max_abs_roll": float(np.abs(roll).max()),
    }
    print(json.dumps(res, indent=1))
    out = kv.get("out")
    if out:
        Path(out).write_text(json.dumps(res, indent=1))
    return 0 if res["completed"] else 1


if __name__ == "__main__":
    sys.exit(main())
