"""Per-stage timings of the lanes substep at scale (TPU).

Each stage is jitted standalone with realistic inputs; boundaries are
approximate (XLA fuses differently in-situ) but rank the costs.

Usage: python tools/profile_stages.py [num_envs]
"""
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

    # ---- stage inputs (computed once)
    fk = jax.jit(lambda s: lanes._fk(s["q"], s["rq"], s["rp"]))
    p_w, R_w = fk(stateT)
    spat = jax.jit(lambda: lanes._spatial_quantities(pt, p_w, R_w))
    I_o, Phi_d, p_rel, _cw = spat()
    crba = jax.jit(lambda: lanes._mass_matrix(pt, I_o, Phi_d))
    M = crba()
    biasf = jax.jit(lambda: lanes._bias_forces(stateT, I_o, Phi_d))
    bias = biasf()
    minv = jax.jit(lambda M: lanes._m_inverse(M))
    M_inv = minv(M)
    cjac = jax.jit(lambda: lanes._contact_jacobian(p_w, R_w, Phi_d, p_rel))
    Jf, x = cjac()
    pair = jax.jit(lambda: lanes._pair_rows(Jf.reshape(K, 3, nv, N), x))
    Jp, phi_p, C = pair()

    JfT = jnp.concatenate([Jf, Jp], axis=0)
    phi = jnp.concatenate([x[2] - lanes._contact_radius
                           - lanes._ground_height(x[:2]), phi_p], axis=0)
    cap = eng.opt.contact_cap

    def select():
        _, idx = jax.lax.top_k(-phi.T, cap)
        idxT = idx.T
        J4 = JfT.reshape(KT, 3, nv, N)
        Jc = jnp.take_along_axis(J4, idxT[:, None, None, :], axis=0).reshape(cap * 3, nv, N)
        return Jc, jnp.take_along_axis(phi, idxT, axis=0), idxT

    Jc, phic, idxT = jax.jit(select)()

    def delassus(Jc, M_inv):
        JM = jnp.einsum("avn,vwn->awn", Jc, M_inv)
        return jnp.einsum("awn,bwn->abn", JM, Jc)

    A = jax.jit(delassus)(Jc, M_inv)
    active = (phic < eng.opt.contact_margin).astype(jnp.float32)
    b = jax.random.normal(ks[5], (cap * 3, N)) * 0.1
    apgd = jax.jit(lambda A, b: lanes._apgd(A, b, pt["friction"], active))
    full = jax.jit(lambda s, l: lanes._substep(pt, s, tauT, l)[0]["rp"])
    lam0 = jnp.zeros((KT, 3, N))
    full(stateT, lam0)

    stages = [
        ("fk", lambda: fk(stateT)[0]),
        ("spatial", lambda: spat()[0]),
        ("crba M", lambda: crba()),
        ("bias", lambda: biasf()),
        ("m_inverse", lambda: minv(M)),
        ("contact_jac", lambda: cjac()[0]),
        ("pair_rows", lambda: pair()[0]),
        ("select(topk+gather)", lambda: jax.jit(select)()[0]),
        ("delassus", lambda: jax.jit(delassus)(Jc, M_inv)),
        ("apgd32", lambda: apgd(A, b)),
        ("FULL substep", lambda: full(stateT, lam0)),
    ]
    for name, fn in stages:
        dt = timeit(lambda _x: fn(), jnp.zeros(()), reps=20, warmup=3)
        print(f"{name:24s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
