"""Training CLI (reference humanoidverse/train_agent.py).

Usage:
    python -m pbhc_tpu.train exp=motion_tracking robot=g1_23dof \\
        obs=motion_tracking rewards=motion_tracking domain_rand=main simulator=tpu \\
        robot.motion.motion_file=<pkl> num_envs=4096 experiment_name=my_run \\
        algo.config.num_learning_iterations=2000

Composes YAML config groups (pbhc_tpu/config/), instantiates the env + MHPPO,
and runs jitted train iterations with TensorBoard logging and Orbax
checkpointing (model + optimizer + LR + iteration, reference
train_agent.py:102-104 semantics; `auto_load_latest=true` resumes from the
newest checkpoint of the same experiment, reference config/base.yaml:16).
"""
from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time
from pathlib import Path

import jax
import numpy as np
import yaml

# persistent compile cache: the fused rollout+update graph is large (fresh
# remote compile can take >10 min); cached relaunches resume in seconds
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class _Watchdog:
    """Hung-device failsafe (SURVEY §5.3 failure detection).

    The remote-TPU (axon) tunnel can wedge mid-run: the main thread blocks
    forever inside an RPC with no error and the run silently stops making
    progress (observed twice on 2026-08-17, ~30-50 min into healthy runs).
    A daemon thread watches a heartbeat the train loop beats at every log
    sync; if it goes stale the process hard-exits with code 3 so a wrapper
    (tools/train_retry.sh) can resume from the last checkpoint via
    auto_load_latest. Armed only after the first successful log sync —
    fresh compiles legitimately take >10 min.
    """

    EXIT_CODE = 3

    def __init__(self, timeout_s=300.0):
        import threading

        self.timeout_s = float(timeout_s)
        self._last = None  # armed on first beat
        self._t = threading.Thread(target=self._watch, daemon=True)
        self._t.start()

    def beat(self):
        self._last = time.time()

    def stop(self):
        """Disarm permanently — REQUIRED when main() returns inside a larger
        process (tests import train_main; a live watchdog would os._exit the
        host process minutes after the training call finished)."""
        self._stopped = True
        self._last = None

    def _watch(self):
        import os

        while not getattr(self, "_stopped", False):
            time.sleep(10.0)
            if getattr(self, "_stopped", False):
                return
            if self._last is not None and time.time() - self._last > self.timeout_s:
                print(f"[watchdog] no progress for {self.timeout_s:.0f}s — "
                      "device wedged; exiting 3 for resume", flush=True)
                sys.stdout.flush()
                sys.stderr.flush()
                os._exit(self.EXIT_CODE)


class _Tee:
    """Mirror a stream into a per-run logfile (reference utils/logging.py)."""

    def __init__(self, stream, path):
        self._stream = stream
        self._f = open(path, "a", buffering=1)

    def write(self, s):
        self._stream.write(s)
        self._f.write(s)
        return len(s)

    def flush(self):
        self._stream.flush()
        self._f.flush()

    def __getattr__(self, name):
        return getattr(self._stream, name)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    from pbhc_tpu.config.loader import compose, parse_cli

    sels, ovs = parse_cli(argv)
    cfg_dir = Path(__file__).parent / "config"
    cfg = compose(cfg_dir, sels, ovs)

    timestamp = time.strftime("%Y%m%d_%H%M%S")
    exp_dir = Path(cfg.base_dir) / cfg.project_name / f"{timestamp}-{cfg.experiment_name}-{cfg.get('log_task_name','task')}"
    exp_dir.mkdir(parents=True, exist_ok=True)
    (exp_dir / "config.yaml").write_text(yaml.safe_dump(json.loads(json.dumps(cfg))))
    # per-run logfile capture (reference utils/logging.py:7-32 bridges loguru
    # into hydra's run-dir logs; here: tee stdout/stderr into train.log)
    sys.stdout = _Tee(sys.stdout, exp_dir / "train.log")
    sys.stderr = _Tee(sys.stderr, exp_dir / "train.log")
    print(f"[train] experiment dir: {exp_dir}")
    print(f"[train] devices: {jax.devices()}")

    # boot-phase watchdog: the tunnel can wedge during env init / checkpoint
    # load too (observed 2026-08-20: resume after a mid-run wedge hung in env
    # init with 4 s CPU over 8 min — before the loop watchdog even existed).
    # Armed immediately with a compile-generous timeout; replaced by the
    # 300 s loop watchdog below. Skipped under pytest: an init exception in a
    # test host would otherwise leave an armed os._exit timer behind.
    boot_dog = None
    if not os.environ.get("PYTEST_CURRENT_TEST"):
        boot_dog = _Watchdog(float(cfg.get("watchdog_boot_timeout_s", 900.0)))
        boot_dog.beat()

    import importlib

    def resolve(target):
        mod, cls = target.rsplit(".", 1)
        return getattr(importlib.import_module(mod), cls)

    env_cls = resolve(cfg.env.target)
    algo_cls = resolve(cfg.algo.target)

    # distill mode: make the student env ALSO compute the teacher's obs groups
    # (reference ppo_mimic.py:121-145 _preprocess_teacher_config injects
    # teacher_actor_obs / teacher_future_motion_targets into the env obs dict)
    teacher_path = cfg.algo.config.get("teacher_model_path")
    teacher_cfg = None
    if teacher_path:
        teacher_cfg = load_teacher_config(teacher_path)
        cfg.obs.obs_dict["teacher_actor_obs"] = list(teacher_cfg.obs.obs_dict["actor_obs"])
        cfg.obs.obs_dict["teacher_future_motion_targets"] = \
            list(teacher_cfg.obs.obs_dict["future_motion_targets"])

    key = jax.random.PRNGKey(int(cfg.seed))
    k_env, k_algo = jax.random.split(key)
    env = env_cls(cfg, int(cfg.num_envs), k_env)
    algo_kwargs = {}
    if teacher_path:
        algo_kwargs["teacher"] = load_teacher(teacher_path, teacher_cfg, env)
    algo = algo_cls(cfg, env, **algo_kwargs)
    ts = algo.init_train_state(k_algo)

    # resume (reference ppo.py:145-173: restores params + optimizer + iter + LR;
    # auto_load_latest picks the newest ckpt of this experiment, base.yaml:16)
    # tracked artifact mirror (see save_artifact): commit-able disaster
    # recovery for runs whose logs/ tree dies with the VM
    art_dir = resolve_artifact_dir(cfg)
    # self-contained mirror: eval tools resolve the run config ckpt-adjacent
    # (<dir>/../config.yaml for logs, <dir>/config.yaml for mirrors — see
    # utils.checkpoint/load-side lookups), so snapshot it here too
    (art_dir / "ckpt").mkdir(parents=True, exist_ok=True)
    (art_dir / "config.yaml").write_text((exp_dir / "config.yaml").read_text())

    ckpt_path = cfg.get("checkpoint")
    if not ckpt_path and bool(cfg.get("auto_load_latest", False)):
        from pbhc_tpu.utils.checkpoint import latest_checkpoint

        ckpt_path = latest_checkpoint(Path(cfg.base_dir) / cfg.project_name,
                                      experiment_name=str(cfg.experiment_name))
        if not ckpt_path:
            # logs/ gone (fresh VM): fall back to the tracked params-only
            # mirror — warm restart with a fresh optimizer
            ckpt_path = latest_checkpoint(art_dir)
        if ckpt_path:
            print(f"[train] auto_load_latest -> {ckpt_path}")
    if ckpt_path:
        import dataclasses

        import jax.numpy as jnp

        from pbhc_tpu.utils.checkpoint import load_checkpoint_payload

        target = {k: jax.device_get(getattr(ts, k))
                  for k in ("actor_params", "critic_params", "actor_opt",
                            "critic_opt", "params", "opt", "hist_opt")
                  if hasattr(ts, k)}
        payload = load_checkpoint_payload(ckpt_path, target=target)
        updates = {k: payload[k] for k in payload
                   if hasattr(ts, k) and k not in ("iteration", "lr")}
        if not bool(cfg.algo.config.get("load_optimizer", True)):
            updates = {k: v for k, v in updates.items() if "opt" not in k}
        ts = dataclasses.replace(
            ts, **updates,
            iteration=jnp.asarray(payload.get("iteration", 0), jnp.int32),
            lr=jnp.asarray(payload.get("lr", float(ts.lr))))
        print(f"[train] resumed from {ckpt_path} at iteration {payload.get('iteration', 0)}")

    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(log_dir=str(exp_dir))
    except Exception:
        writer = None

    # wandb opt-in (reference train_agent.py:71-83 with sync_tensorboard);
    # degrades to TB-only when the package is absent (zero-egress images)
    wandb_run = None
    if bool(cfg.get("use_wandb", False)):
        try:
            import wandb

            wcfg = dict(cfg.get("wandb", {}))
            wandb_run = wandb.init(
                project=wcfg.get("wandb_project", "PBHC_TPU"),
                group=wcfg.get("wandb_group"), entity=wcfg.get("wandb_entity"),
                id=wcfg.get("wandb_id"), dir=str(exp_dir),
                sync_tensorboard=True, config=dict(cfg))
        except Exception as e:  # pragma: no cover - wandb not in test images
            print(f"[train] use_wandb=true but wandb unavailable ({e}); TB only")

    # env-axis data parallelism when multiple devices are visible
    # (pbhc_tpu/parallel/mesh.py; single-chip runs are unaffected)
    if jax.device_count() > 1 and bool(cfg.get("multichip", True)):
        from pbhc_tpu.parallel.mesh import make_mesh, shard_train_state

        mesh = make_mesh()
        assert int(cfg.num_envs) % jax.device_count() == 0, \
            "device count must divide num_envs"
        ts = shard_train_state(ts, mesh, int(cfg.num_envs))
        print(f"[train] sharded over {jax.device_count()} devices (env-axis DP)")

    num_iters = int(cfg.algo.config.num_learning_iterations)
    # `total_iterations` makes the target cumulative across resumes: run only
    # the remainder (the retry wrapper tools/train_retry.sh leans on this to
    # survive wedged-device exits; see _Watchdog)
    total_iters = cfg.get("total_iterations")
    if total_iters:
        num_iters = max(0, int(total_iters) - int(jax.device_get(ts.iteration)))
        print(f"[train] total_iterations={total_iters}: {num_iters} remaining")
    save_interval = int(cfg.algo.config.save_interval)
    log_interval = max(1, int(cfg.algo.config.get("logging_interval", 25)) // 5)
    steps_per_iter = env.num_envs * algo.num_steps

    ckpt_dir = exp_dir / "ckpt"
    if boot_dog is not None:
        boot_dog.stop()
    watchdog = _Watchdog(float(cfg.get("watchdog_timeout_s", 300.0)))
    t_start = time.time()
    last_log_t, last_log_it = t_start, 0
    try:
        for it in range(num_iters):
            t0 = time.time()
            if it == 2:
                # exclude compile time (iterations 0 AND 1 trace: the initial
                # state's avals differ from the stepped state's) from fps windows
                last_log_t, last_log_it = t0, 2
            ts, log = algo.train_iteration(ts)
            if it == 0:
                jax.block_until_ready(jax.tree.leaves(ts)[0])
                print(f"[train] first iteration (incl. compile): {time.time()-t0:.1f}s")
            if (it + 1) % log_interval == 0 or it == 0:
                log = jax.device_get(log)
                jax.block_until_ready(jax.tree.leaves(ts)[0])
                # iterations dispatch asynchronously: this sync waits for the
                # WHOLE window since the last log, so fps must be window-based
                # (timing just the last iteration underreports by log_interval x)
                now = time.time()
                window_iters = 1 if it == 0 else (it + 1 - last_log_it)
                fps = steps_per_iter * window_iters / (now - last_log_t)
                last_log_t, last_log_it = now, it + 1
                watchdog.beat()   # a completed device sync = real progress
                terr = (f" terrain_level_mean={log['Env/terrain_level_mean']:.2f}"
                        f"/max={log['Env/terrain_level_max']:.0f}"
                        if "Env/terrain_level_mean" in log else "")
                print(f"[it {it+1}/{num_iters}] rew/step={log['Train/mean_step_reward']:.4f} "
                      f"epl={log['Env/episode_length_mean']:.1f} kl={log['Loss/kl']:.4f} "
                      f"lr={log['Loss/lr']:.2e} fps={fps:,.0f}{terr}")
                if writer:
                    for k, v in log.items():
                        writer.add_scalar(k, float(v), it + 1)
                    writer.add_scalar("Perf/total_fps", fps, it + 1)
            if (it + 1) % save_interval == 0 or it + 1 == num_iters:
                # cumulative name: keeps model_<it> monotonic across resumed
                # runs so auto_load_latest picks the true newest
                cur_it = int(jax.device_get(ts.iteration))
                save_checkpoint(ckpt_dir, cur_it, ts)
                save_artifact(art_dir, cur_it, ts)
    finally:
        watchdog.stop()
    if wandb_run is not None:
        wandb_run.finish()
    print(f"[train] done in {time.time()-t_start:.0f}s")
    save_checkpoint(ckpt_dir, int(jax.device_get(ts.iteration)), ts)
    save_artifact(art_dir, int(jax.device_get(ts.iteration)), ts)
    return ts


def load_teacher_config(ckpt_path):
    """Load the teacher run's config snapshot (ckpt-adjacent, like eval)."""
    from pbhc_tpu.config.loader import Cfg

    cfg_file = Path(ckpt_path).parent.parent / "config.yaml"
    return Cfg.wrap(yaml.safe_load(cfg_file.read_text()))


def load_teacher(ckpt_path, teacher_cfg, env):
    """Frozen teacher for distill mode (reference ppo_mimic.py:121-161).

    The teacher net is built from the TEACHER's own config (its obs layout
    differs from the student's) and fed the teacher-side obs groups the
    student env was extended with; returns (apply_fn, params) acting
    deterministically through the teacher's own HISTORY latent (reference
    ppo_mimic.py:346,590-591: teacher_actor_act_step(hist_encoding=True) —
    the teacher's hist encoder was trained by its learn_RL DAgger interleave
    and is also what the student inherits, see PPOMimic.init_train_state).
    """
    from pbhc_tpu.agents.mimic_networks import MimicActorCritic
    from pbhc_tpu.agents.ppo_mimic import build_mimic_net
    from pbhc_tpu.utils.checkpoint import load_checkpoint_payload

    payload = load_checkpoint_payload(ckpt_path)
    t_params = payload["params"] if "params" in payload else payload["actor_params"]

    # the history encoder is sized from the STUDENT env's prop_history width
    # but the TEACHER's history_length; a mismatch would mis-size the net far
    # from the cause (or silently load garbage geometry)
    s_hist = int(env.config.obs.history_length)
    t_hist = int(teacher_cfg.obs.history_length)
    assert t_hist == s_hist, (
        f"teacher history_length={t_hist} != student history_length={s_hist}; "
        "distillation requires matching prop_history windows")
    net = build_mimic_net(
        teacher_cfg.algo.config, env.nd,
        env.obs_dim("teacher_future_motion_targets"),
        int(teacher_cfg.obs.future_num_steps),
        env.obs_dim("prop_history"),
        t_hist)

    def apply_fn(params, obs):
        tobs = {
            "actor_obs": obs["teacher_actor_obs"],
            "future_motion_targets": obs["teacher_future_motion_targets"],
            "priv_obs": obs["priv_obs"],
            "prop_history": obs["prop_history"],
        }
        mean, _ = net.apply(params, tobs, True, method=MimicActorCritic.act)
        return mean

    return apply_fn, t_params


def save_checkpoint(ckpt_dir, it, ts):
    from pbhc_tpu.utils.checkpoint import save_checkpoint_payload

    payload = {"iteration": int(ts.iteration), "lr": float(ts.lr)}
    for field in ("actor_params", "critic_params", "actor_opt", "critic_opt",
                  "params", "opt", "hist_opt"):
        if hasattr(ts, field):
            payload[field] = jax.device_get(getattr(ts, field))
    path = save_checkpoint_payload(Path(ckpt_dir) / f"model_{it}", payload)
    print(f"[train] saved {path}")


def resolve_artifact_dir(cfg):
    """Where this run's tracked checkpoint mirror lives (see save_artifact).

    Under pytest, a run that did NOT explicitly set artifact_dir is redirected
    to the system tmpdir — never let a test sweep its mirror into the tracked
    artifacts/ tree (a round-3 test predating the per-test artifact_dir
    override left a 12 MB pickle committed). Tests that assert on mirrors pass
    artifact_dir=tmp_path explicitly.
    """
    art_dir = Path(cfg.get("artifact_dir",
                           Path(__file__).parent.parent / "artifacts"))
    if os.environ.get("PYTEST_CURRENT_TEST") and "artifact_dir" not in cfg:
        art_dir = Path(tempfile.gettempdir()) / "pbhc_pytest_artifacts"
    return art_dir / str(cfg.experiment_name)


def save_artifact(art_dir, it, ts, keep=2):
    """Disaster-recovery mirror of the newest checkpoint in a TRACKED path.

    Full Orbax checkpoints live under the untracked `logs/` tree, which does
    not survive a build-VM recycle (a completed 24k-iteration run was lost to
    exactly this once). Every save also drops a small params-only pickle into
    `artifacts/<experiment>/` — git-committable (~few MB, no optimizer state)
    and loadable by the normal resume path (`load_checkpoint_payload` reads
    legacy .pkl; missing optimizer keys mean a fresh-optimizer warm restart).
    Only the newest `keep` mirrors are retained. Mirrors live in
    `<art_dir>/ckpt/` with the run config snapshot at `<art_dir>/config.yaml`
    so eval tools (batch_eval/_load, eval_agent) can load a mirror directly —
    they resolve the config ckpt-adjacent, like the reference
    (reference eval_agent.py:73-91 ckpt-side config.yaml lookup)."""
    import pickle

    art_dir = Path(art_dir) / "ckpt"
    art_dir.mkdir(parents=True, exist_ok=True)
    payload = {"iteration": int(ts.iteration), "lr": float(ts.lr)}
    for field in ("actor_params", "critic_params", "params"):
        if hasattr(ts, field):
            payload[field] = jax.device_get(getattr(ts, field))
    tmp = art_dir / ".model_tmp.pkl"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    path = art_dir / f"model_{it}.pkl"
    tmp.rename(path)
    old = sorted(art_dir.glob("model_*.pkl"),
                 key=lambda p: int(re.match(r"model_(\d+)", p.name).group(1)))
    for p in old[:-keep]:
        p.unlink()
    return path


if __name__ == "__main__":
    main()
