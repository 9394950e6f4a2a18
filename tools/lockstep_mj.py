"""Lock-step TPU-engine vs MuJoCo debugging (the reference's cross-engine
debug idiom, reference humanoidverse/simulator/genesis/genesis_mjdebug.py:
step two engines from the same state with the same controller and print the
per-step state divergence).

Usage:
    python tools/lockstep_mj.py [steps=100] [z0=0.755] [kp=100] [solver=lanes]

Prints per-control-step max |Δdof_pos|, |Δroot_pos|, |Δroot_quat| and contact
force totals. Divergence grows with contact chaos; the first few steps are the
diagnostic signal (see CLAUDE.md gotchas: free-joint armature is zeroed, and
MuJoCo's free-joint angular velocity is body-frame).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

MJCF = "/root/repo/assets/robots/g1/g1_23dof_lock_wrist.xml"


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    steps = int(kv.get("steps", 100))
    z0 = float(kv.get("z0", 0.755))
    kp_val = float(kv.get("kp", 100.0))
    solver = kv.get("solver", "lanes")

    import dataclasses

    import mujoco

    from pbhc_tpu.model.g1 import load_g1_sim_model
    from pbhc_tpu.sim.engine import Engine, EngineOptions
    from pbhc_tpu.sim.engine_lanes import LanesEngine

    model = load_g1_sim_model("g1_23dof_lock_wrist")
    eng = Engine(model, EngineOptions(solver="apgd" if solver == "lanes" else solver))
    params = eng.default_params()
    st = eng.default_state(root_pos=(0.0, 0.0, z0))
    st = eng.derived_state(params, st)

    m = mujoco.MjModel.from_xml_path(MJCF)
    m.opt.timestep = eng.opt.dt
    m.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    m.dof_armature[:6] = 0.0  # the shipped XML's <default> wrongly arms the free joint
    d = mujoco.MjData(m)
    d.qpos[:3] = np.asarray(st.root_pos)
    d.qpos[3:7] = np.asarray(st.root_quat)[[3, 0, 1, 2]]  # wxyz
    d.qpos[7:] = np.asarray(st.dof_pos)

    kp = jnp.full((eng.nd,), kp_val)
    kd = jnp.full((eng.nd,), 2.0)

    if solver == "lanes":
        lanes = LanesEngine(eng)
        paramsB = jax.tree.map(lambda x: x[None], params)
        stB = jax.tree.map(lambda x: x[None], st)

        @jax.jit
        def ctrl(paramsB, stB):
            return lanes.control_step_batched(
                paramsB, stB, lambda s, k: kp * (-s.dof_pos) - kd * s.dof_vel, 1)

        def step_ours(stB):
            stB, _ = ctrl(paramsB, stB)
            return stB
        get = lambda stB: jax.tree.map(lambda x: np.asarray(x[0]), stB)
        st_run = stB
    else:
        @jax.jit
        def ctrl1(params, st):
            return eng.control_step(
                params, st, lambda s, k: kp * (-s.dof_pos) - kd * s.dof_vel, 1)

        def step_ours(st):
            st, _ = ctrl1(params, st)
            return st
        get = lambda st: jax.tree.map(np.asarray, st)
        st_run = st

    print(f"{'step':>5s} {'|ddof|':>10s} {'|droot|':>10s} {'|dquat|':>10s} "
          f"{'Fz_ours':>9s} {'Fz_mj':>9s}")
    for i in range(steps):
        st_run = step_ours(st_run)
        # mujoco: same PD controller at the same rate
        tau = kp_val * (0.0 - d.qpos[7:]) - 2.0 * d.qvel[6:]
        d.ctrl[:] = 0.0
        d.qfrc_applied[6:] = tau
        mujoco.mj_step(m, d)

        s = get(st_run)
        ddof = np.abs(s.dof_pos - d.qpos[7:]).max()
        droot = np.abs(s.root_pos - d.qpos[:3]).max()
        q_mj = d.qpos[3:7][[1, 2, 3, 0]]
        dquat = min(np.abs(s.root_quat - q_mj).max(), np.abs(s.root_quat + q_mj).max())
        fz_ours = float(s.contact_forces[:, 2].sum())
        # vertical constraint force on the free joint ~ total ground normal
        fz_mj = float(d.qfrc_constraint[2])
        if i < 10 or (i + 1) % 10 == 0:
            print(f"{i+1:5d} {ddof:10.5f} {droot:10.5f} {dquat:10.5f} "
                  f"{fz_ours:9.1f} {fz_mj:9.1f}")


if __name__ == "__main__":
    main()
