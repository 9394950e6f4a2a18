"""Batch evaluation harnesses (reference sample_eps.py / ratio_eps.py).

* `sample_episodes`: roll N episodes with early termination DISABLED, dump
  trajectories, compute per-episode accuracy/smoothness metrics and aggregate
  mean/std (reference sample_eps.py:22-260).
* `episode_ratio`: early termination ON; mean episode length and
  length/motion-length ratio (reference ratio_eps.py:27-266).

CLI:
    python -m pbhc_tpu.eval.batch_eval checkpoint=<ckpt.pkl> mode=sample num_envs=16
    python -m pbhc_tpu.eval.batch_eval checkpoint=<ckpt.pkl> mode=ratio num_envs=64
"""
from __future__ import annotations

import json
import pickle
import sys
from pathlib import Path

import numpy as np
import yaml


def _load(ckpt_path, num_envs, overrides=()):
    import jax

    from pbhc_tpu.config.loader import Cfg, set_dotted, _parse_scalar

    ckpt_path = Path(ckpt_path)
    cfg = Cfg.wrap(yaml.safe_load((ckpt_path.parent.parent / "config.yaml").read_text()))
    cfg["num_envs"] = num_envs
    for ov in overrides:
        k, v = ov.split("=", 1)
        set_dotted(cfg, k, _parse_scalar(v))

    import importlib

    def resolve(t):
        mod, cls = t.rsplit(".", 1)
        return getattr(importlib.import_module(mod), cls)

    env = resolve(cfg.env.target)(cfg, num_envs, jax.random.PRNGKey(0))
    algo = resolve(cfg.algo.target)(cfg, env)
    from pbhc_tpu.utils.checkpoint import load_checkpoint_payload

    payload = load_checkpoint_payload(ckpt_path)
    return env, algo, payload


def episode_ratio(ckpt_path, num_envs=64, episodes=128, overrides=()):
    """Early termination ON, every env playing the clip FROM t=0: mean
    first-termination step and its ratio to the clip length (reference
    ratio_eps.py:243-256 `calculate_average_first_one`; the reference eval env
    zeroes motion_start_times, motion_tracking.py:258)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    env, algo, payload = _load(ckpt_path, num_envs, overrides)
    actor_params = payload.get("actor_params") or payload.get("params")

    state = env.init_state(jax.random.PRNGKey(1))
    state = env.reset_to_start(state, jax.random.PRNGKey(1))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
    state = dataclasses.replace(state, history=hist)
    step = jax.jit(env.step)

    if hasattr(algo, "actor"):
        @jax.jit
        def act(obs):
            mean, _ = algo.actor.apply(actor_params, obs["actor_obs"])
            return mean
    else:
        from pbhc_tpu.agents.mimic_networks import MimicActorCritic

        @jax.jit
        def act(obs):
            mean, _ = algo.net.apply(actor_params, obs, True, method=MimicActorCritic.act)
            return mean

    # one clip-length rollout; per env, record the FIRST termination step
    # (timeout at motion end counts as completion = M, exactly the reference's
    # argmax-over-terminate-matrix with all-zero rows set to M)
    Mi = np.ceil(np.asarray(state.motion_len) / env.dt).astype(np.int64)  # per env
    M = int(Mi.max())
    first = np.full((num_envs,), M, np.int64)
    for i in range(M):
        state, obs, rew, done, info = step(state, act(obs))
        d = np.asarray(done) & ~np.asarray(info["time_outs"]).astype(bool)
        first = np.where((first == M) & d, i, first)
    per_env = np.minimum(first, Mi) / Mi
    out = {
        "mean_first_termination_step": float(np.minimum(first, Mi).mean()),
        "episode_steps": M,
        "ratio": float(per_env.mean()),
        "ratio_std": float(per_env.std()),
        "completed_frac": float((first >= Mi).mean()),
        "episodes": int(num_envs),
    }
    return out


def sample_episodes(ckpt_path, num_envs=4, episodes=8, overrides=()):
    """Early termination OFF: accuracy/smoothness over full clips
    (reference sample_eps.py)."""
    from pbhc_tpu.eval.metrics import eval_accuracy, eval_smoothness
    from pbhc_tpu.eval_agent import rollout_jax

    import jax

    ovs = list(overrides) + [
        "env.config.termination.terminate_when_motion_far=false",
        "env.config.termination.terminate_by_gravity=false",
        "env.config.termination.terminate_when_dof_far=false",
    ]
    env, algo, payload = _load(ckpt_path, num_envs, ovs)
    actor_params = payload.get("actor_params") or payload.get("params")
    num_steps = int(float(env.motion_lib.data.lengths[0]) / env.dt)

    accs, smooths = [], []
    for ep in range(max(1, episodes // num_envs)):
        traj, ref, dones = rollout_jax(env, algo.actor, actor_params, num_steps,
                                       jax.random.PRNGKey(100 + ep))
        accs.append(eval_accuracy(traj, ref, env.dt))
        smooths.append(eval_smoothness(traj, env.dt, ref=ref))
    agg = {}
    for k in accs[0]:
        vals = [a[k] for a in accs]
        agg[k] = {"mean": float(np.mean(vals)), "std": float(np.std(vals))}
    for k in smooths[0]:
        vals = [s[k] for s in smooths]
        agg[k] = {"mean": float(np.mean(vals)), "std": float(np.std(vals))}
    return agg


def main(argv=None):
    argv = argv or sys.argv[1:]
    kv = dict(a.split("=", 1) for a in argv)
    ckpt = kv.pop("checkpoint")
    mode = kv.pop("mode", "ratio")
    num_envs = int(kv.pop("num_envs", 16))
    overrides = [f"{k}={v}" for k, v in kv.items()]
    if mode == "ratio":
        out = episode_ratio(ckpt, num_envs, overrides=overrides)
    else:
        out = sample_episodes(ckpt, num_envs, overrides=overrides)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
