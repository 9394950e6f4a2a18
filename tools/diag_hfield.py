"""Decompose the hfield transfer gap: scene (plane vs hfield) x foot geometry
(mesh vs sphere soles), TEACHER-driven closed loop.

Round-5 finding that motivated this tool: the privileged KB2 teacher — which
completes the full UE-walk clip in plane-MuJoCo — fell at ~2 s on a FLAT
hfield tile with sphere soles (mj_dagger round 0, survived 0/8). A teacher
that cannot survive the target scene makes DAgger labels worthless, so the
scene dynamics must be fixed first; this grid localizes which half of the
scene change (hfield contact pair vs foot collision geometry) breaks it.

Usage:
    python tools/diag_hfield.py checkpoint=<student_ckpt> \
        teacher=<teacher_ckpt> terrain_run=<run dir> [k=4] [ticks=400]
        [driver=teacher|student]
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    K = int(kv.get("k", 4))
    ticks = int(kv.get("ticks", 400))
    driver = kv.get("driver", "teacher")

    import yaml

    from pbhc_tpu.deploy.mj_mirror import MjFleet
    from pbhc_tpu.envs.terrain import Terrain
    from tools.mj_dagger import OBS_KEYS, _build

    env, algo, (t_apply, t_params), payload = _build(
        kv["checkpoint"], K, teacher_override=kv.get("teacher"))
    params = payload["params"] if "params" in payload else payload["actor_params"]
    from pbhc_tpu.agents.mimic_networks import MimicActorCritic

    act_student = jax.jit(lambda p, o: algo.net.apply(
        p, {k: o[k] for k in (*OBS_KEYS, "priv_obs")}, True,
        method=MimicActorCritic.act)[0])
    act_teacher = jax.jit(lambda o: t_apply(t_params, o))
    refresh = jax.jit(lambda sim: jax.vmap(env.engine.derived_state)(env.sim_params, sim))
    compute_obs = jax.jit(env._compute_observations)

    terrain = None
    if "terrain_run" in kv:
        tcfg = yaml.safe_load(
            open(os.path.join(kv["terrain_run"], "config.yaml")))["terrain"]
        terrain = Terrain.from_run_config(tcfg)

    tile = tuple(int(x) for x in kv.get("tile", "0,1").split(","))
    scenarios = [("plane+mesh", None, False), ("plane+sphere", None, True)]
    if terrain is not None:
        scenarios += [("hfield+mesh", terrain, False),
                      ("hfield+sphere", terrain, True)]

    for name, terr, spheres in scenarios:
        state = env.init_state(jax.random.PRNGKey(1))
        state = env.reset_to_start(state, jax.random.PRNGKey(3))
        obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
        state = dataclasses.replace(state, history=hist)
        fleet = MjFleet(env, K, terrain=terr, tile=tile, sphere_feet=spheres)
        for i in range(K):
            fleet.set_from(state.sim, i)
        alive = np.ones(K, bool)
        fall_tick = np.full(K, -1)
        keys = jax.random.split(jax.random.PRNGKey(11), ticks)
        for t in range(ticks):
            a = np.asarray(act_teacher(obs) if driver == "teacher"
                           else act_student(params, obs))
            fleet.step(a, alive)
            sim = refresh(fleet.inject(state.sim))
            P = np.asarray(sim.root_pos)
            state = dataclasses.replace(
                state, sim=sim,
                episode_length=state.episode_length + 1,
                last_actions=state.actions,
                actions=jnp.asarray(a, jnp.float32),
                last_dof_vel=state.sim.dof_vel)
            obs, hist = compute_obs(state, keys[t])
            state = dataclasses.replace(state, history=hist)
            gz = fleet.ground_height(P[:, :2])
            newly_down = (P[:, 2] - gz < 0.35) & alive
            fall_tick[newly_down] = t
            alive &= ~newly_down
            if not alive.any():
                break
        print(f"[{name:13s}] driver={driver} tile={tile} "
              f"survived {int(alive.sum())}/{K} over {ticks} ticks "
              f"fall_ticks={sorted(fall_tick[fall_tick >= 0].tolist())}",
              flush=True)


if __name__ == "__main__":
    main()
