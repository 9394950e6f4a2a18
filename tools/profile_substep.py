"""Stage-level timing of the lanes substep on the available accelerator.

Each stage is jitted separately and timed on representative shapes. Fusion
effects across stages are lost, so treat results as a rough cost map (the
full-substep number is the ground truth).

Usage: python tools/profile_substep.py [num_envs]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pbhc_tpu.model.g1 import load_g1_sim_model  # noqa: E402
from pbhc_tpu.sim.engine import Engine, EngineOptions  # noqa: E402
from pbhc_tpu.sim.engine_lanes import LanesEngine, _spd_inverse_lanes  # noqa: E402
from pbhc_tpu.utils.profiling import timeit  # noqa: E402


def main(num_envs=4096):
    eng = Engine(load_g1_sim_model("g1_23dof_lock_wrist"), EngineOptions(solver="lanes"))
    lanes = LanesEngine(eng)
    N = num_envs
    nd, nv, K = eng.nd, eng.nv, eng.K
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)

    params = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), eng.default_params())
    paramsT = dict(
        mass=params.mass.T,
        com=jnp.moveaxis(jnp.moveaxis(params.com, 0, -1), 1, 0),
        inertia=jnp.moveaxis(jnp.moveaxis(jnp.moveaxis(params.inertia, 0, -1), 2, 0), 2, 1),
        friction=params.friction,
        restitution=params.restitution,
        armature=params.armature.T,
        dof_damping=params.dof_damping.T,
        dof_frictionloss=params.dof_frictionloss.T,
    )
    stateT = dict(
        rp=jnp.zeros((3, N)).at[2].set(0.755),
        rq=jnp.zeros((4, N)).at[3].set(1.0),
        rv=jax.random.normal(ks[0], (3, N)) * 0.1,
        rw=jax.random.normal(ks[1], (3, N)) * 0.1,
        q=jax.random.normal(ks[2], (nd, N)) * 0.05,
        qd=jax.random.normal(ks[3], (nd, N)) * 0.1,
    )
    tauT = jax.random.normal(ks[4], (nd, N)) * 5.0

    # stage closures -------------------------------------------------------
    fk = jax.jit(lambda s: lanes._fk(s["q"], s["rq"], s["rp"]))
    p_w, R_w = fk(stateT)

    spatial = jax.jit(lambda pw, Rw: lanes._spatial_quantities(paramsT, pw, Rw))
    I_o, Phi_d, p_rel, _ = spatial(p_w, R_w)

    crba = jax.jit(lambda io, ph: lanes._mass_matrix(paramsT, io, ph))
    M = crba(I_o, Phi_d)

    bias = jax.jit(lambda s, io, ph: lanes._bias_forces(s, io, ph))
    _ = bias(stateT, I_o, Phi_d)

    inv = jax.jit(_spd_inverse_lanes)
    M_inv = inv(M)

    cjac = jax.jit(lambda pw, Rw, ph, pr: lanes._contact_jacobian(pw, Rw, ph, pr))
    Jf, x = cjac(p_w, R_w, Phi_d, p_rel)

    def delassus(Jf, M_inv):
        JM = jnp.einsum("avn,vwn->awn", Jf, M_inv)
        return jnp.einsum("awn,bwn->abn", JM, Jf)
    delassus = jax.jit(delassus)
    A = delassus(Jf, M_inv)

    bvec = jax.random.normal(ks[5], (3 * K, N))
    active = jnp.ones((K, N))
    apgd = jax.jit(lambda A, b: lanes._apgd(A, b, paramsT["friction"], active))
    _ = apgd(A, bvec)

    full = jax.jit(lambda s: lanes._substep(paramsT, s, tauT))
    _ = full(stateT)

    stages = [
        ("fk", fk, (stateT,)),
        ("spatial", spatial, (p_w, R_w)),
        ("crba", crba, (I_o, Phi_d)),
        ("bias", bias, (stateT, I_o, Phi_d)),
        ("spd_inverse", inv, (M,)),
        ("contact_jac", cjac, (p_w, R_w, Phi_d, p_rel)),
        ("delassus", delassus, (Jf, M_inv)),
        ("apgd", apgd, (A, bvec)),
        ("FULL_substep", full, (stateT,)),
    ]
    for name, fn, args in stages:
        dt = timeit(fn, *args, reps=20, warmup=2)
        print(f"{name:14s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
