"""Evaluation CLI (reference humanoidverse/eval_agent.py + sample_eps.py).

Usage:
    python -m pbhc_tpu.eval_agent checkpoint=<ckpt.pkl> [sim2sim=true] [num_envs=1]

Loads the training config snapshot next to the checkpoint, rolls the
deterministic policy in the TPU env, computes the E_*/L2 metric families
against the reference motion, exports the deploy policy (.npz), and optionally
replays it in the MuJoCo sim2sim runtime for the cross-engine fidelity check.
"""
from __future__ import annotations

import json
import pickle
import sys
from pathlib import Path

import numpy as np
import yaml


def rollout_jax(env, actor, actor_params, num_steps, key, dashboard=None, callbacks=None):
    """Deterministic rollout in the TPU env; returns trajectory + ref dicts."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    state = env.init_state(key)
    # evaluation: start every env at t=0 (reference eval_agent forces this).
    # A REAL reset to the t=0 reference pose — merely zeroing the clock would
    # leave the randomly-sampled start pose in the sim state, which is metres
    # from ref(0) for locomotion clips (in-place clips masked this).
    state = env.reset_to_start(state, key)
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(0))
    state = dataclasses.replace(state, history=hist)

    step = jax.jit(env.step)

    @jax.jit
    def act(obs):
        mean, _ = actor.apply(actor_params, obs["actor_obs"])
        return mean

    traj = {"root_pos": [], "root_rot": [], "dof_pos": [], "body_pos": [], "body_rot": [],
            "contact_mask": [], "dof_vel": [], "root_lin_vel": [], "root_ang_vel": [],
            "action": []}
    ref = {"root_pos": [], "root_rot": [], "dof_pos": [], "body_pos": [], "body_rot": [],
           "contact_mask": []}
    from pbhc_tpu.motion.motion_lib import get_motion_state

    callbacks = callbacks or []
    for cb in callbacks:
        cb.on_pre_evaluate_policy()
    dones = []
    for step_i in range(num_steps):
        actions = act(obs)
        actor_state = {"step": step_i, "obs": obs, "actions": actions, "env_state": state}
        for cb in callbacks:
            actor_state = cb.on_pre_eval_env_step(actor_state)
        actions = jnp.asarray(actor_state["actions"])
        state, obs, rew, done, info = step(state, actions)
        actor_state["env_state"] = state
        for cb in callbacks:
            actor_state = cb.on_post_eval_env_step(actor_state)
        sim = state.sim
        body_pos, body_quat, _, _ = env._extend_body_states(sim)
        t = state.episode_length.astype(jnp.float32) * env.dt + state.motion_start_times
        mres = get_motion_state(env.motion_lib.data, state.motion_ids, t)
        traj["root_pos"].append(np.asarray(sim.root_pos[0]))
        traj["root_rot"].append(np.asarray(sim.root_quat[0]))
        traj["dof_pos"].append(np.asarray(sim.dof_pos[0]))
        traj["body_pos"].append(np.asarray(body_pos[0]))
        traj["body_rot"].append(np.asarray(body_quat[0]))
        traj["contact_mask"].append(np.asarray(state.contacts_filt[0]))
        traj["dof_vel"].append(np.asarray(sim.dof_vel[0]))
        traj["root_lin_vel"].append(np.asarray(sim.root_lin_vel[0]))
        traj["root_ang_vel"].append(np.asarray(sim.root_ang_vel[0]))
        traj["action"].append(np.asarray(actions[0]))
        ref["root_pos"].append(np.asarray(mres["root_pos"][0]))
        ref["root_rot"].append(np.asarray(mres["root_rot"][0]))
        ref["dof_pos"].append(np.asarray(mres["dof_pos"][0]))
        ref["body_pos"].append(np.asarray(mres["rg_pos_t"][0]))
        ref["body_rot"].append(np.asarray(mres["rg_rot_t"][0]))
        ref["contact_mask"].append(np.asarray(mres["contact_mask"][0]))
        if dashboard is not None:
            scal = {k: float(v) for k, v in jax.device_get(info["log"]).items()
                    if k.startswith("rew_") or "diff_norm" in k or "sigma" in k}
            scal["root_z"] = float(sim.root_pos[0, 2])
            scal["dof_err"] = float(jnp.abs(mres["dof_pos"][0] - sim.dof_pos[0]).mean())
            dashboard.log_step(scal)
        dones.append(bool(done[0]))
        if dones[-1]:
            break
    for cb in callbacks:
        cb.on_post_evaluate_policy()
    return ({k: np.stack(v) for k, v in traj.items()},
            {k: np.stack(v) for k, v in ref.items()}, dones)


def main(argv=None):
    import jax

    argv = argv if argv is not None else sys.argv[1:]
    from pbhc_tpu.config.loader import compose, parse_cli

    kv = dict(a.split("=", 1) for a in argv)
    ckpt_path = Path(kv.pop("checkpoint"))
    sim2sim = kv.pop("sim2sim", "false").lower() == "true"
    dashboard_flag = kv.pop("dashboard", "false").lower() == "true"
    callback_names = kv.pop("callbacks", "")  # e.g. callbacks=plot,force,openloop
    save_motion_arg = kv.pop("save_motion", None)
    num_envs = int(kv.pop("num_envs", 1))

    cfg_file = ckpt_path.parent.parent / "config.yaml"
    raw = yaml.safe_load(cfg_file.read_text())
    # opt=record at train time snapshots save_motion into the config
    save_motion = (save_motion_arg.lower() == "true" if save_motion_arg is not None
                   else bool(raw.get("save_motion", False)))
    from pbhc_tpu.config.loader import Cfg

    cfg = Cfg.wrap(raw)
    cfg["num_envs"] = num_envs
    for k, v in kv.items():
        from pbhc_tpu.config.loader import set_dotted, _parse_scalar

        set_dotted(cfg, k, _parse_scalar(v))

    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    env = MotionTrackingEnv(cfg, num_envs, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    from pbhc_tpu.utils.checkpoint import load_checkpoint_payload

    payload = load_checkpoint_payload(ckpt_path)
    actor_params = payload["actor_params"]

    # --- export deploy policy
    from pbhc_tpu.deploy.export import export_policy

    export_dir = ckpt_path.parent.parent / "exported"
    npz_path = export_policy(actor_params, env, export_dir / f"{ckpt_path.stem}.npz",
                             meta_extra={"motion_file": str(cfg.robot.motion.motion_file)},
                             actor=algo.actor)
    print(f"[eval] exported policy -> {npz_path}")

    # --- TPU-env rollout + metrics
    from pbhc_tpu.eval.metrics import episode_length_ratio, eval_accuracy, eval_smoothness

    dash = None
    if dashboard_flag:
        from pbhc_tpu.eval.dashboard import DashboardLogger

        dash = DashboardLogger()
        print(f"[eval] live dashboard at {dash.start()}")

    callbacks = []
    if callback_names:
        from pbhc_tpu.eval.callbacks import build_callbacks

        callbacks = build_callbacks(callback_names.split(","), cfg, env, dashboard=dash)

    num_steps = int(float(env.motion_lib.data.lengths[0]) / env.dt)
    traj, ref, dones = rollout_jax(env, algo.actor, actor_params, num_steps, jax.random.PRNGKey(1),
                                   dashboard=dash, callbacks=callbacks)
    acc = eval_accuracy(traj, ref, env.dt)
    smooth = eval_smoothness(traj, env.dt, ref=ref)
    ratio = len(traj["dof_pos"]) / num_steps
    print(f"[eval] episode completed {len(traj['dof_pos'])}/{num_steps} steps (ratio {ratio:.3f})")
    print("[eval] accuracy:", json.dumps({k: round(v, 4) for k, v in acc.items()}))
    print("[eval] smoothness:", json.dumps({k: round(v, 4) for k, v in smooth.items()}))

    results = {"accuracy": acc, "smoothness": smooth, "completion_ratio": ratio}

    # --- optional MuJoCo sim2sim replay, scored with the full metric suite
    # (reference idiom: urci.py replay + measure_traj.py metrics)
    if sim2sim:
        from pbhc_tpu.eval.sim2sim import rollout_metrics

        s2s = rollout_metrics(npz_path, cfg.robot.motion.motion_file,
                              robot_type=str(cfg.robot.robot_type),
                              fix_height=str(cfg.robot.motion.get("fix_height", "no_fix")))
        print(f"[eval] sim2sim replay: {s2s['steps']} steps, "
              f"final root z={s2s['final_z']:.3f}, "
              f"E_mpjpe={s2s['accuracy']['E_mpjpe']:.1f}")
        results["sim2sim_final_z"] = s2s["final_z"]
        results["sim2sim"] = s2s

    # --- optional motion dump in the training-data schema
    # (reference motion_tracking.py:140-169,860-940 `save_motion`)
    if save_motion:
        save_rollout_motion(env, traj, ckpt_path.parent.parent / f"motion_{ckpt_path.stem}.pkl")

    out = ckpt_path.parent.parent / f"eval_{ckpt_path.stem}.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"[eval] wrote {out}")
    return results


def save_rollout_motion(env, traj, path):
    """Dump a rollout as a training-format motion pkl
    (schema per reference motion_lib_base.py:421-441 + rollout extras)."""
    import joblib
    from scipy.spatial.transform import Rotation as sRot

    T = len(traj["dof_pos"])
    axes = np.asarray(env.motion_model.dof_axis)
    n_extend = env.num_extend
    root_aa = sRot.from_quat(traj["root_rot"]).as_rotvec()
    pose_aa = np.concatenate([
        root_aa[:, None, :],
        traj["dof_pos"][:, :, None] * axes[None],
        np.zeros((T, n_extend, 3)),
    ], axis=1).astype(np.float32)
    clip = {
        "root_trans_offset": traj["root_pos"].astype(np.float32),
        "root_rot": traj["root_rot"].astype(np.float32),
        "dof": traj["dof_pos"].astype(np.float32),
        "pose_aa": pose_aa,
        "fps": int(round(1.0 / env.dt)),
        "contact_mask": traj["contact_mask"].astype(np.float64),
        "dof_vel": traj["dof_vel"].astype(np.float32),
        "root_lin_vel": traj["root_lin_vel"].astype(np.float32),
        "root_ang_vel": traj["root_ang_vel"].astype(np.float32),
        "action": traj["action"].astype(np.float32),
    }
    joblib.dump({"rollout": clip}, path, compress=3)
    print(f"[eval] saved rollout motion -> {path}")
    return path


if __name__ == "__main__":
    main()
