"""Closed-loop MuJoCo rollout of a FLAX checkpoint with env-computed obs.

Unlike the ONNX deploy path (diag_sim2sim_fall.py), this drives the SAME
policy network the trainer produced, with observations assembled by the
training env itself — but with MuJoCo as the dynamics: each control tick the
env's sim state is overwritten from MuJoCo (root pose/vels + dof), derived
body kinematics are refreshed through the engine FK, and the env's obs
pipeline (incl. history ring buffers and future motion targets) runs on that
state. This answers "can the TEACHER survive MuJoCo?" — privileged/teacher
observations are computable in sim even though they are not on a real robot.

If the teacher stands here, a MuJoCo-state DAgger pass can close the student
sim2sim gap without touching the TPU; if it falls, the gap is the gait itself
(engine contact fidelity) and retraining under a higher-fidelity engine is
the fix. (reference analog: deploy/mujoco.py's sim2sim loop, reference
deploy/mujoco.py:212-528, applied to a non-exported checkpoint)

Usage:
    python tools/mj_closed_loop.py checkpoint=<ckpt> [steps=400]
        [sim_fps=500] [decimation=10]
"""
import dataclasses
import sys

sys.path.insert(0, "/root/repo")

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


def _roll_pitch(quat_xyzw):
    x, y, z, w = quat_xyzw
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    return roll, pitch


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    ckpt = kv["checkpoint"]
    steps = int(kv.get("steps", 400))
    sim_fps = int(kv.get("sim_fps", 500))
    decimation = int(kv.get("decimation", 10))

    from pbhc_tpu.deploy.mj_mirror import MjFleet
    from pbhc_tpu.eval.batch_eval import _load
    from pbhc_tpu.motion.motion_lib import get_motion_state

    env, algo, payload = _load(ckpt, 1, DR_OFF)
    params = payload.get("actor_params") or payload.get("params")

    if hasattr(algo, "actor"):
        @jax.jit
        def act(obs):
            mean, _ = algo.actor.apply(params, obs["actor_obs"])
            return mean
    else:
        from pbhc_tpu.agents.mimic_networks import MimicActorCritic

        @jax.jit
        def act(obs):
            mean, _ = algo.net.apply(params, obs, True, method=MimicActorCritic.act)
            return mean

    state = env.init_state(jax.random.PRNGKey(1))
    state = env.reset_to_start(state, jax.random.PRNGKey(3))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
    state = dataclasses.replace(state, history=hist)

    # MuJoCo twin, initialized to the env's reset state
    fleet = MjFleet(env, 1, sim_fps=sim_fps, decimation=decimation)
    fleet.set_from(state.sim, 0)

    refresh = jax.jit(lambda sim: jax.vmap(env.engine.derived_state)(env.sim_params, sim))
    compute_obs = jax.jit(env._compute_observations)

    n_ref = int(float(env.motion_lib.data.lengths[0]) / env.dt)
    times = jnp.asarray(np.arange(min(steps, n_ref)) * env.dt)
    mres = get_motion_state(env.motion_lib.data, jnp.zeros(len(times), jnp.int32), times)
    ref_dof = np.asarray(mres["dof_pos"]).reshape(len(times), -1)

    keys = jax.random.split(jax.random.PRNGKey(7), steps)
    rows = []
    for t in range(min(steps, n_ref)):
        a = np.clip(np.asarray(act(obs))[0], -env.action_clip, env.action_clip)
        fleet.step(a[None])
        sim = refresh(fleet.inject(state.sim))
        a_j = jnp.asarray(a[None], jnp.float32)
        state = dataclasses.replace(
            state, sim=sim,
            episode_length=state.episode_length + 1,
            last_actions=state.actions, actions=a_j,
            last_dof_vel=state.sim.dof_vel)
        obs, hist = compute_obs(state, keys[t])
        state = dataclasses.replace(state, history=hist)

        quat_xyzw = np.asarray(sim.root_quat[0])
        roll, pitch = _roll_pitch(quat_xyzw)
        rows.append((t, float(sim.root_pos[0][2]), roll, pitch,
                     float(np.abs(np.asarray(sim.dof_pos[0]) - ref_dof[t]).max())))

    print(f"--- mujoco closed loop (flax policy, env obs) fps={sim_fps} "
          f"decim={decimation} ---")
    for t, z, roll, pitch, dq in rows:
        if (t < 120 and t % 8 == 0) or (t >= 120 and t % 50 == 0):
            print(f"t={t:4d} ({t * env.dt:5.2f}s) z={z:.3f} roll={roll:+.3f} "
                  f"pitch={pitch:+.3f} max|dq-ref|={dq:.3f}")
    fall = next((t for t, z, *_ in rows if z < 0.35), None)
    print(f"first z<0.35 tick: {fall}" + (f" ({fall * env.dt:.2f}s)" if fall else ""))
    dqs = np.array([r[4] for r in rows])
    print(f"max|dq-ref| mean {dqs.mean():.3f}  p90 {np.percentile(dqs, 90):.3f}")


if __name__ == "__main__":
    main()
