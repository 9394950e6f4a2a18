"""Prefix-truncation profiling of the lanes substep (fusion-aware).

Times jitted prefixes of the real substep pipeline; successive differences
are the true marginal cost of each phase inside the fused graph.

Usage: python tools/profile_prefix.py [num_envs]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pbhc_tpu.model.g1 import load_g1_sim_model  # noqa: E402
from pbhc_tpu.sim.engine import Engine, EngineOptions  # noqa: E402
from pbhc_tpu.sim.engine_lanes import LanesEngine  # noqa: E402
from pbhc_tpu.utils.profiling import timeit  # noqa: E402
from tools.profile_substep2 import paramsT_of  # noqa: E402


def main(num_envs=4096):
    N = num_envs
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    eng = Engine(load_g1_sim_model(), EngineOptions(solver="lanes", contact_cap=16))
    lanes = LanesEngine(eng)
    nd, nv, K, KT = eng.nd, eng.nv, eng.K, eng.KT
    pt = paramsT_of(eng, N)
    stateT = dict(
        rp=jnp.zeros((3, N)).at[2].set(0.755),
        rq=jnp.zeros((4, N)).at[3].set(1.0),
        rv=jax.random.normal(ks[0], (3, N)) * 0.1,
        rw=jax.random.normal(ks[1], (3, N)) * 0.1,
        q=jax.random.normal(ks[2], (nd, N)) * 0.05,
        qd=jax.random.normal(ks[3], (nd, N)) * 0.1,
    )
    tauT = jax.random.normal(ks[4], (nd, N)) * 5.0
    lam0 = jnp.zeros((KT, 3, N))
    opt = lanes.opt
    cap = opt.contact_cap

    def prefix(stop):
        def fn(stT, lam_prev):
            p_w, R_w = lanes._fk(stT["q"], stT["rq"], stT["rp"])
            if stop == "fk":
                return p_w
            I_o, Phi_d, p_rel, _ = lanes._spatial_quantities(pt, p_w, R_w)
            if stop == "spatial":
                return I_o
            M = lanes._mass_matrix(pt, I_o, Phi_d)
            bias = lanes._bias_forces(stT, I_o, Phi_d)
            if stop == "crba+bias":
                return M[0, 0] + bias[0]
            M_inv = lanes._m_inverse(M)
            if stop == "m_inverse":
                return M_inv[0, 0]
            qd0 = stT["qd"]
            tau_passive = (-pt["dof_damping"] * qd0
                           - pt["dof_frictionloss"] * jnp.tanh(qd0 / 0.05))
            tau_full = jnp.concatenate([jnp.zeros((6, N)), tauT + tau_passive], axis=0)
            u = jnp.concatenate([stT["rv"], stT["rw"], qd0], axis=0)
            u_plus = u + opt.dt * jnp.sum(M_inv * (tau_full - bias)[None], axis=1)
            if stop == "u_plus":
                return u_plus
            Jf, x = lanes._contact_jacobian(p_w, R_w, Phi_d, p_rel)
            anc = jnp.concatenate(
                [jnp.ones((K, 6)), lanes._contact_anc], axis=1)
            anc = jnp.repeat(anc, 3, axis=0)[:, :, None]
            Jf = Jf * anc
            phi = x[2] - lanes._contact_radius - lanes._ground_height(x[:2])
            if stop == "contact_jac":
                return Jf[0, 0] + phi[0]
            Jp, phi_p, C = lanes._pair_rows(Jf.reshape(K, 3, nv, N), x)
            Jf2 = jnp.concatenate([Jf, Jp], axis=0)
            phi2 = jnp.concatenate([phi, phi_p], axis=0)
            if stop == "pair_rows":
                return Jf2[0, 0] + phi2[0]
            _, idx = jax.lax.top_k(-phi2.T, cap)
            idxT = idx.T
            J4 = Jf2.reshape(KT, 3, nv, N)
            Jc = jnp.take_along_axis(
                J4, idxT[:, None, None, :], axis=0).reshape(cap * 3, nv, N)
            phic = jnp.take_along_axis(phi2, idxT, axis=0)
            if stop == "select":
                return Jc[0, 0] + phic[0]
            Jb, Mb = jax.lax.optimization_barrier((Jc, M_inv))
            JM = jnp.einsum("avn,vwn->awn", Jb, Mb)
            A = jnp.einsum("awn,bwn->abn", JM, Jb)
            A = jax.lax.optimization_barrier(A)
            if stop == "delassus":
                return A[0, 0]
            active = (phic < opt.contact_margin).astype(jnp.float32)
            v0 = jnp.sum(Jc * u_plus[None], axis=1).reshape(cap, 3, N)
            b = v0.at[:, 2].add(pt["restitution"][None]
                                * jnp.minimum(v0[:, 2], 0.0)).reshape(cap * 3, N)
            lam = lanes._apgd(A, b, pt["friction"], active)
            if stop == "apgd":
                return lam[0]
            return lam[0] + A[0, 0]

        return fn

    base = None
    for stop in ["fk", "spatial", "crba+bias", "m_inverse", "u_plus",
                 "contact_jac", "pair_rows", "select", "delassus", "apgd"]:
        fn = jax.jit(prefix(stop))
        fn(stateT, lam0)
        dt = timeit(fn, stateT, lam0, reps=20, warmup=3)
        marg = 0.0 if base is None else (dt - base) * 1e3
        print(f"{stop:16s} {dt*1e3:8.3f} ms   (+{marg:6.3f})", flush=True)
        base = dt

    full = jax.jit(lambda s, l: lanes._substep(pt, s, tauT, l)[0]["rp"])
    full(stateT, lam0)
    dt = timeit(full, stateT, lam0, reps=20, warmup=3)
    print(f"{'FULL substep':16s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
