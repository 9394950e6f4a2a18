"""In-situ lanes-substep ablation + option sweep: times a 4-substep
control-step scan (the shape the env actually runs).

`dynamics-only` replicates the substep minus all contact machinery, isolating
the FK/spatial/CRBA/M-inverse/bias assembly cost in-situ.

Usage: python tools/sweep_substep.py [num_envs]
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pbhc_tpu.model.g1 import load_g1_sim_model  # noqa: E402
from pbhc_tpu.sim.engine import Engine, EngineOptions  # noqa: E402
from pbhc_tpu.sim.engine_lanes import LanesEngine  # noqa: E402

MODEL = load_g1_sim_model()


def setup(N, **kw):
    kw.setdefault("contact_cap", 16)
    opts = EngineOptions(solver="lanes", **kw)
    eng = Engine(MODEL, opts)
    lanes = LanesEngine(eng)
    params = jax.vmap(lambda _: eng.default_params())(jnp.arange(N))
    states = jax.vmap(lambda i: eng.default_state(
        root_pos=(0.0, 0.0, 0.793)))(jnp.arange(N))
    default_q = states.dof_pos

    def torque_fn(st, key):
        # joint PD to the default pose: keeps the batch in a realistic
        # standing-contact regime for the full window
        return 60.0 * (default_q - st.dof_pos) - 2.0 * st.dof_vel

    return eng, lanes, params, states, torque_fn


def timeit(step, s, iters=20):
    s2 = step(s)
    jax.block_until_ready(s2.root_pos if hasattr(s2, "root_pos") else s2)
    t0 = time.time()
    for _ in range(iters):
        s2 = step(s2)
    jax.block_until_ready(s2.root_pos if hasattr(s2, "root_pos") else s2)
    return (time.time() - t0) / iters * 1e3, s2


def bench_full(N, tag, **kw):
    eng, lanes, params, states, torque_fn = setup(N, **kw)
    step = jax.jit(lambda s: lanes.control_step_batched(params, s, torque_fn, 4)[0])
    ms, s2 = timeit(step, states)
    print(f"{tag:44s} {ms:7.2f} ms/ctrl-step   z={float(s2.root_pos[:,2].mean()):.3f}")
    return ms


def bench_dynamics_only(N, hoist, tag):
    """Substep without contacts; `hoist` computes spatial/M/M_inv once per
    control step instead of per substep."""
    eng, lanes, params, states, torque_fn = setup(N)
    opt = lanes.opt

    def control(s):
        paramsT = dict(
            mass=params.mass.T, com=jnp.moveaxis(jnp.moveaxis(params.com, 0, -1), 1, 0),
            inertia=jnp.moveaxis(jnp.moveaxis(jnp.moveaxis(params.inertia, 0, -1), 2, 0), 2, 1),
            friction=params.friction, restitution=params.restitution,
            armature=params.armature.T, dof_damping=params.dof_damping.T,
            dof_frictionloss=params.dof_frictionloss.T)
        stT = lanes._to_lanes(s)

        if hoist:
            p_w, R_w = lanes._fk(stT["q"], stT["rq"], stT["rp"])
            I_o, Phi_d, p_rel, _ = lanes._spatial_quantities(paramsT, p_w, R_w)
            M = lanes._mass_matrix(paramsT, I_o, Phi_d)
            M_inv = lanes._m_inverse(M)

        def body(stT, _):
            if not hoist:
                p_w, R_w = lanes._fk(stT["q"], stT["rq"], stT["rp"])
                I_o_, Phi_d_, _, _ = lanes._spatial_quantities(paramsT, p_w, R_w)
                M_ = lanes._mass_matrix(paramsT, I_o_, Phi_d_)
                M_inv_ = lanes._m_inverse(M_)
            else:
                I_o_, Phi_d_, M_inv_ = I_o, Phi_d, M_inv
            bias = lanes._bias_forces(stT, I_o_, Phi_d_)
            qd0 = stT["qd"]
            tau = torque_fn(
                dataclasses.replace(s, dof_pos=stT["q"].T, dof_vel=qd0.T), None).T
            tau_passive = (-paramsT["dof_damping"] * qd0
                           - paramsT["dof_frictionloss"] * jnp.tanh(qd0 / 0.05))
            N_ = qd0.shape[-1]
            tau_full = jnp.concatenate([jnp.zeros((6, N_)), tau + tau_passive], axis=0)
            u = jnp.concatenate([stT["rv"], stT["rw"], qd0], axis=0)
            u_plus = u + opt.dt * jnp.sum(M_inv_ * (tau_full - bias)[None], axis=1)
            return lanes._integrate(stT, u_plus), None

        stT, _ = jax.lax.scan(body, stT, None, length=4)
        return dataclasses.replace(
            s, root_pos=stT["rp"].T, root_quat=stT["rq"].T, root_lin_vel=stT["rv"].T,
            root_ang_vel=stT["rw"].T, dof_pos=stT["q"].T, dof_vel=stT["qd"].T)

    step = jax.jit(control)
    ms, s2 = timeit(step, states)
    print(f"{tag:44s} {ms:7.2f} ms/ctrl-step   z={float(s2.root_pos[:,2].mean()):.3f}")
    return ms


def main(N=4096):
    bench_full(N, "FULL baseline (32it, pos8, cap16, f32)")
    bench_dynamics_only(N, False, "dynamics-only (no contacts)")
    bench_dynamics_only(N, True, "dynamics-only, spatial/M/Minv hoisted")
    bench_full(N, "solver_iters=12", solver_iters=12)
    bench_full(N, "cap=8", contact_cap=8)
    bench_full(N, "cap=12", contact_cap=12)
    bench_full(N, "12it+pos4+cap12", solver_iters=12, pos_iters=4, contact_cap=12)


if __name__ == "__main__" and "--no-derived" not in sys.argv:
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)


def bench_no_derived(N, tag):
    """Full control step minus the trailing env-first derived_state vmap."""
    eng, lanes, params, states, torque_fn = setup(N)
    import pbhc_tpu.sim.engine_lanes as el

    orig = eng.derived_state

    def control(s):
        import dataclasses as dc
        stT = lanes._to_lanes(s)
        paramsT = dict(
            mass=params.mass.T, com=jnp.moveaxis(jnp.moveaxis(params.com, 0, -1), 1, 0),
            inertia=jnp.moveaxis(jnp.moveaxis(jnp.moveaxis(params.inertia, 0, -1), 2, 0), 2, 1),
            friction=params.friction, restitution=params.restitution,
            armature=params.armature.T, dof_damping=params.dof_damping.T,
            dof_frictionloss=params.dof_frictionloss.T)

        def body(carry, _):
            stT, lam = carry
            tau = torque_fn(dc.replace(s, dof_pos=stT["q"].T, dof_vel=stT["qd"].T), None).T
            stT, lam = lanes._substep(paramsT, stT, tau, lam)
            return (stT, lam), None

        (stT, _), _ = jax.lax.scan(body, (stT, jnp.zeros((lanes.KT, 3, N))), None, length=4)
        return dc.replace(s, root_pos=stT["rp"].T, root_quat=stT["rq"].T,
                          root_lin_vel=stT["rv"].T, root_ang_vel=stT["rw"].T,
                          dof_pos=stT["q"].T, dof_vel=stT["qd"].T)

    step = jax.jit(control)
    ms, s2 = timeit(step, states)
    print(f"{tag:44s} {ms:7.2f} ms/ctrl-step   z={float(s2.root_pos[:,2].mean()):.3f}")


def main2(N=4096):
    bench_full(N, "FULL baseline")
    bench_no_derived(N, "FULL minus trailing derived_state")


if __name__ == "__main__" and "--no-derived" in sys.argv:
    main2(4096)
