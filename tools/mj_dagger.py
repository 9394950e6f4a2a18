"""Sim2sim DAgger: fine-tune a distilled student on MuJoCo-state teacher labels.

Round-4 root cause of the KB2 student's MuJoCo fall (tools/mj_closed_loop.py):
the TEACHER's feedback policy survives MuJoCo (privileged obs are computable
in sim), but the DAgger-only student — BC-matched to the teacher on the JAX
ENGINE's state distribution — compounds errors on the slightly different
states MuJoCo visits at foot strikes (tools/lockstep_policy.py localizes the
per-tick twin gap to ankle pitch/roll) and falls at ~1.5 s. The fix the
framework makes cheap: run the SAME DAgger recipe with MuJoCo as the dynamics.
Each control tick, K parallel MuJoCo sims step under the executed action; the
training env's obs pipeline runs on the MuJoCo states (history ring buffers,
future targets, teacher obs groups — train.py's distill-mode env extension);
the frozen teacher labels every visited state; the student BC-updates exactly
like PPOMimic.distill_iteration (L2 action loss, grafted history encoder
frozen).

Round 0 drives with the teacher (BC on the teacher's MuJoCo distribution);
later rounds drive with the student (classic DAgger correction data).

This has no reference analog — the reference trains/distills in IsaacGym only
and hopes the PhysX->MuJoCo gap is small (reference README.md:102-104); here
the MuJoCo backend is a first-class training-data source.

Usage:
    python tools/mj_dagger.py checkpoint=<student_ckpt> [rounds=5] [k=8]
        [lr=3e-5] [epochs=4] [out=docs/kb2_r3/mjdagger]
        [teacher=<ckpt>]            # override the snapshot's logs/ path
        [terrain_run=<run dir>]     # DAgger ON the training hfield
        [tiles=0,1;0,0]             # tile per round (cycled), center at origin
"""
import dataclasses
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

DR_OFF = ["domain_rand.randomize_friction=false", "domain_rand.randomize_base_mass=false",
          "domain_rand.randomize_link_mass=false", "domain_rand.randomize_pd_gain=false",
          "domain_rand.push_robots=false", "domain_rand.ctrl_delay_step_range=[0,0]",
          "domain_rand.randomize_ctrl_delay=false",
          "domain_rand.randomize_rfi_lim=false", "domain_rand.use_rao=false",
          "domain_rand.randomize_default_dof_pos=false",
          "domain_rand.randomize_base_com=false", "domain_rand.randomize_link_inertia=false",
          "env.config.noise_to_initial_level=0"] + [
    f"obs.noise_scales.{k}=0.0" for k in
    ("base_ang_vel", "dof_pos", "dof_vel", "roll_pitch")]

OBS_KEYS = ("actor_obs", "future_motion_targets", "prop_history")


def _build(ckpt_path, k_envs, teacher_override=None):
    """_load() clone that re-injects the distill-mode teacher obs groups
    (train.py:131-141) — the run config snapshot predates that mutation."""
    import importlib

    import yaml

    from pbhc_tpu.config.loader import Cfg, _parse_scalar, set_dotted
    from pbhc_tpu.train import load_teacher, load_teacher_config

    cfg = Cfg.wrap(yaml.safe_load(
        open(os.path.join(os.path.dirname(os.path.dirname(ckpt_path)), "config.yaml"))))
    cfg["num_envs"] = k_envs
    for ov in DR_OFF:
        k, v = ov.split("=", 1)
        set_dotted(cfg, k, _parse_scalar(v))
    # teacher= override: run snapshots point at logs/ paths that do not
    # survive a VM recycle; the committed artifacts/ mirror does
    teacher_path = teacher_override or cfg.algo.config.teacher_model_path
    tcfg = load_teacher_config(teacher_path)
    cfg.obs.obs_dict["teacher_actor_obs"] = list(tcfg.obs.obs_dict["actor_obs"])
    cfg.obs.obs_dict["teacher_future_motion_targets"] = \
        list(tcfg.obs.obs_dict["future_motion_targets"])

    def resolve(t):
        mod, cls = t.rsplit(".", 1)
        return getattr(importlib.import_module(mod), cls)

    env = resolve(cfg.env.target)(cfg, k_envs, jax.random.PRNGKey(0))
    algo = resolve(cfg.algo.target)(cfg, env)
    teacher = load_teacher(teacher_path, tcfg, env)

    from pbhc_tpu.utils.checkpoint import load_checkpoint_payload

    payload = load_checkpoint_payload(ckpt_path)
    return env, algo, teacher, payload


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    ckpt = kv["checkpoint"]
    rounds = int(kv.get("rounds", 5))
    K = int(kv.get("k", 8))
    lr = float(kv.get("lr", 3e-5))
    epochs = int(kv.get("epochs", 4))
    noise = float(kv.get("noise", 0.02))   # exec-action exploration sigma
    mix_engine = int(kv.get("mix_engine", 0))  # also collect engine-driven rounds
    out_dir = kv.get("out", "docs/kb2_r3/mjdagger")
    os.makedirs(out_dir, exist_ok=True)

    # terrain_run=<run dir with a heightfield config.yaml> puts the MuJoCo
    # fleet ON the training hfield; tiles="0,1;0,0" cycles the tile whose
    # center is placed at the origin, one tile per DAgger round (the motion
    # and env stay unshifted — see MjFleet terrain handling)
    terrain, tiles = None, [(0, 0)]
    if "terrain_run" in kv:
        import yaml as _yaml

        from pbhc_tpu.envs.terrain import Terrain

        tcfg = _yaml.safe_load(
            open(os.path.join(kv["terrain_run"], "config.yaml")))["terrain"]
        terrain = Terrain.from_run_config(tcfg)
        tiles = [tuple(int(x) for x in t.split(","))
                 for t in kv.get("tiles", "0,0").split(";")]

    import optax

    from pbhc_tpu.agents.mimic_networks import MimicActorCritic
    from pbhc_tpu.deploy.mj_mirror import MjFleet

    env, algo, (t_apply, t_params), payload = _build(
        ckpt, K, teacher_override=kv.get("teacher"))
    params = payload["params"] if "params" in payload else payload["actor_params"]

    act_student = jax.jit(lambda p, o: algo.net.apply(
        p, {k: o[k] for k in (*OBS_KEYS, "priv_obs")}, True,
        method=MimicActorCritic.act)[0])
    act_teacher = jax.jit(lambda o: t_apply(t_params, o))
    refresh = jax.jit(lambda sim: jax.vmap(env.engine.derived_state)(env.sim_params, sim))
    compute_obs = jax.jit(env._compute_observations)

    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def bc_update(params, opt, batch):
        def loss_fn(p):
            obs_b = {k: batch[k] for k in OBS_KEYS}
            obs_b["priv_obs"] = jnp.zeros_like(batch["priv_obs"])
            student = algo.net.apply(p, obs_b, True, method=MimicActorCritic.act)[0]
            return jnp.linalg.norm(
                jax.lax.stop_gradient(batch["teacher_actions"]) - student, axis=-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # the grafted history encoder stays frozen, mirroring
        # PPOMimic.distill_iteration (reference ppo_mimic.py:177-178)
        grads = jax.tree_util.tree_map_with_path(
            lambda path, g: jnp.zeros_like(g)
            if any("history_encoder" in str(k) for k in path) else g, grads)
        updates, opt2 = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt2, loss

    n_ticks = int(float(env.motion_lib.data.lengths[0]) / env.dt)
    rng = np.random.default_rng(0)

    def rollout(params, driver, tile=(0, 0)):
        """One DAgger round of data: K parallel MuJoCo episodes from t=0.

        driver='teacher' -> teacher executes (round 0, BC on its stable
        distribution); 'student' -> student executes (correction data)."""
        state = env.init_state(jax.random.PRNGKey(1))
        state = env.reset_to_start(state, jax.random.PRNGKey(3))
        obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
        state = dataclasses.replace(state, history=hist)
        fleet = MjFleet(env, K, terrain=terrain, tile=tile)
        for i in range(K):
            fleet.set_from(state.sim, i)
        alive = np.ones(K, bool)
        fall_tick = np.full(K, -1)
        data = {k: [] for k in (*OBS_KEYS, "priv_obs", "teacher_actions")}
        keys = jax.random.split(jax.random.PRNGKey(11), n_ticks)
        for t in range(n_ticks):
            a_t = np.asarray(act_teacher(obs))
            a_s = np.asarray(act_student(params, obs))
            exec_a = a_t if driver == "teacher" else a_s
            exec_a = np.clip(exec_a + rng.normal(0, noise, exec_a.shape).astype(np.float32),
                             -env.action_clip, env.action_clip)
            # label every ALIVE state with the teacher
            for k in OBS_KEYS:
                data[k].append(np.asarray(obs[k])[alive])
            data["priv_obs"].append(np.asarray(obs["priv_obs"])[alive])
            data["teacher_actions"].append(a_t[alive])

            fleet.step(exec_a, alive)
            sim = refresh(fleet.inject(state.sim))
            P = np.asarray(sim.root_pos)
            state = dataclasses.replace(
                state, sim=sim,
                episode_length=state.episode_length + 1,
                last_actions=state.actions,
                actions=jnp.asarray(exec_a, jnp.float32),
                last_dof_vel=state.sim.dof_vel)
            obs, hist = compute_obs(state, keys[t])
            state = dataclasses.replace(state, history=hist)
            # height-relative fall check: on sloped/obstacle cells away from
            # the tile center, absolute z misreads healthy downhill walking
            # as a fall (and vice versa uphill)
            gz = fleet.ground_height(P[:, :2])
            newly_down = (P[:, 2] - gz < 0.35) & alive
            fall_tick[newly_down] = t
            alive &= ~newly_down
            if not alive.any():
                break
        flat = {k: np.concatenate(v, 0).astype(np.float32) for k, v in data.items()}
        return flat, fall_tick, alive

    step_env = jax.jit(env.step)

    def rollout_engine(params):
        """Engine-driven student round: same (obs_S, teacher label) pairs but
        with the JAX engine as the dynamics — anchors the BC update on the
        training distribution so MuJoCo rounds don't erode in-engine skill."""
        state = env.init_state(jax.random.PRNGKey(21))
        state = env.reset_to_start(state, jax.random.PRNGKey(23))
        obs, hist = env._compute_observations(state, jax.random.PRNGKey(22))
        state = dataclasses.replace(state, history=hist)
        data = {k: [] for k in (*OBS_KEYS, "priv_obs", "teacher_actions")}
        for t in range(n_ticks):
            a_t = np.asarray(act_teacher(obs))
            a_s = np.asarray(act_student(params, obs))
            exec_a = np.clip(a_s + rng.normal(0, noise, a_s.shape).astype(np.float32),
                             -env.action_clip, env.action_clip)
            for k in OBS_KEYS:
                data[k].append(np.asarray(obs[k]))
            data["priv_obs"].append(np.asarray(obs["priv_obs"]))
            data["teacher_actions"].append(a_t)
            state, obs, rew, done, info = step_env(state, jnp.asarray(exec_a))
        return {k: np.concatenate(v, 0).astype(np.float32) for k, v in data.items()}

    buffer = None
    for rnd in range(rounds):
        driver = "teacher" if rnd == 0 else "student"
        tile = tiles[rnd % len(tiles)]
        flat, falls, alive = rollout(params, driver, tile)
        n_survive = int(alive.sum())
        print(f"[round {rnd}] driver={driver} tile={tile} "
              f"samples={len(flat['teacher_actions'])} "
              f"survived {n_survive}/{K} fall_ticks={sorted(falls.tolist())}", flush=True)
        buffer = flat if buffer is None else {
            k: np.concatenate([buffer[k], flat[k]], 0) for k in flat}
        if mix_engine:
            eng = rollout_engine(params)
            print(f"  + engine anchor round: {len(eng['teacher_actions'])} samples", flush=True)
            buffer = {k: np.concatenate([buffer[k], eng[k]], 0) for k in buffer}
        n = len(buffer["teacher_actions"])
        idx = np.arange(n)
        for ep in range(epochs):
            rng.shuffle(idx)
            losses = []
            for s in range(0, n - 511, 512):
                batch = {k: jnp.asarray(buffer[k][idx[s:s + 512]]) for k in buffer}
                params, opt, loss = bc_update(params, opt, batch)
                losses.append(float(loss))
            print(f"  epoch {ep}: bc_loss {np.mean(losses):.4f}", flush=True)

    # final student-only eval episode (no label collection needed)
    for tile in tiles:
        _, falls, alive = rollout(params, "student", tile)
        print(f"[final] student-driven tile={tile}: "
              f"survived {int(alive.sum())}/{K} "
              f"fall_ticks={sorted(falls.tolist())}", flush=True)

    out_pkl = os.path.join(out_dir, "model_mjdagger.pkl")
    with open(out_pkl, "wb") as f:
        pickle.dump({"params": jax.device_get(params), "iteration": rounds}, f)
    print(f"[mj_dagger] wrote {out_pkl}")


if __name__ == "__main__":
    main()
