"""One-step engine-vs-MuJoCo lockstep along a POLICY trajectory.

Rolls a checkpoint's policy closed-loop in the TPU engine (DR and obs noise
off, episode from motion t=0). At every control tick, teleports MuJoCo to the
engine's pre-step state, applies the same action through the deploy PD loop,
and reports the one-control-step divergence. Unlike tools/lockstep_mj.py
(accumulating divergence from one initial state), per-tick teleporting
localizes WHERE the twin dynamics disagree — e.g. the round-2 walking sim2sim
gap showed up here as ankle pitch/roll error spikes at foot-strike ticks,
root-caused to the engine's foot support polygon (see model/g1.py
G1_FOOT_SOLE_SPHERES).

Usage:
    python tools/lockstep_policy.py checkpoint=<ckpt> [steps=250]

(reference analog: humanoidverse/simulator/genesis/genesis_mjdebug.py's
lock-step debug backend, applied along a policy rollout)
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


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    ckpt = kv["checkpoint"]
    steps = int(kv.get("steps", 250))

    import mujoco

    from pbhc_tpu.deploy.student_obs import quat_rotate_inverse
    from pbhc_tpu.eval.batch_eval import _load

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
    step = jax.jit(env.step)

    # MuJoCo twin with the training robot's deploy constants
    from pbhc_tpu.model.g1 import g1_asset_root

    robot_type = str(env.config.robot.robot_type)
    m = mujoco.MjModel.from_xml_path(str(g1_asset_root() / f"{robot_type}.xml"))
    m.opt.timestep = 1.0 / 500.0
    if float(np.max(m.dof_armature[6:])) == 0.0:
        m.dof_armature[6:] = 0.01
    if float(np.max(m.dof_damping[6:])) == 0.0:
        m.dof_damping[6:] = 0.001
    d = mujoco.MjData(m)
    decimation = 10
    kp = np.asarray(env.p_gains)
    kd = np.asarray(env.d_gains)
    tl = np.asarray(env.torque_limits)
    asc = np.asarray(env.action_scales)
    ds = np.asarray(env.raw_default_dof_pos)

    def set_mj(s):
        d.qpos[:3] = np.asarray(s.root_pos[0])
        d.qpos[3:7] = np.asarray(s.root_quat[0])[[3, 0, 1, 2]]
        d.qpos[7:] = np.asarray(s.dof_pos[0])
        d.qvel[:3] = np.asarray(s.root_lin_vel[0])
        d.qvel[3:6] = quat_rotate_inverse(
            np.asarray(s.root_quat[0]), np.asarray(s.root_ang_vel[0]))
        d.qvel[6:] = np.asarray(s.dof_vel[0])
        mujoco.mj_forward(m, d)

    names = list(env.sim_model.dof_names)
    errs = []
    for i in range(steps):
        a = np.clip(np.asarray(act(obs))[0], -env.action_clip, env.action_clip)
        set_mj(state.sim)
        target = a * asc + ds
        for _ in range(decimation):
            tau = kp * (target - d.qpos[7:]) - kd * d.qvel[6:]
            d.qfrc_applied[:] = 0
            d.qfrc_applied[6:] = np.clip(tau, -tl, tl)
            mujoco.mj_step(m, d)
        state, obs, rew, done, info = step(state, jnp.asarray(a[None]))
        dq = np.abs(d.qpos[7:] - np.asarray(state.sim.dof_pos[0]))
        errs.append((float(np.linalg.norm(d.qpos[:3] - np.asarray(state.sim.root_pos[0]))),
                     float(dq.max()), int(dq.argmax())))

    errs_a = np.asarray([(a, b) for a, b, _ in errs])
    print(f"per-tick one-step error over {steps} ticks:")
    print(f"  droot  mean {errs_a[:, 0].mean():.5f} m   max {errs_a[:, 0].max():.5f} m")
    print(f"  maxdq  mean {errs_a[:, 1].mean():.5f} rad max {errs_a[:, 1].max():.5f} rad")
    hist_j = {}
    for _, _, j in errs:
        hist_j[names[j]] = hist_j.get(names[j], 0) + 1
    print("  argmax-dq joint histogram:",
          dict(sorted(hist_j.items(), key=lambda kv_: -kv_[1])[:8]))


if __name__ == "__main__":
    main()
