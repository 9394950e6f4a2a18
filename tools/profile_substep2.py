"""Isolated timings of the NEW lanes substep pieces at scale.

Usage: python tools/profile_substep2.py [num_envs]
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


def paramsT_of(eng, N):
    params = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), eng.default_params())
    pt = dict(
        mass=params.mass.T,
        com=jnp.moveaxis(jnp.moveaxis(params.com, 0, -1), 1, 0),
        inertia=jnp.moveaxis(jnp.moveaxis(jnp.moveaxis(params.inertia, 0, -1), 2, 0), 2, 1),
        friction=params.friction,
        restitution=params.restitution,
        armature=params.armature.T,
        dof_damping=params.dof_damping.T,
        dof_frictionloss=params.dof_frictionloss.T,
    )
    return pt


def main(num_envs=4096):
    N = num_envs
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)

    for label, opt in [
        ("cap16+all", EngineOptions(solver="lanes", contact_cap=16)),
        ("cap0+all", EngineOptions(solver="lanes")),
        ("cap16 noproj", EngineOptions(solver="lanes", contact_cap=16, energy_projection=False)),
        ("cap16 pos0", EngineOptions(solver="lanes", contact_cap=16, pos_iters=0)),
        ("cap16 it16", EngineOptions(solver="lanes", contact_cap=16, solver_iters=16)),
        ("nopairs cap0 noproj pos0 (≈r1)", None),
    ]:
        if opt is None:
            eng = Engine(load_g1_sim_model(self_collision=False),
                         EngineOptions(solver="lanes", energy_projection=False, pos_iters=0))
        else:
            eng = Engine(load_g1_sim_model(), opt)
        lanes = LanesEngine(eng)
        nd = eng.nd
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
        lam0 = jnp.zeros((eng.KT, 3, N))
        full = jax.jit(lambda s, l: lanes._substep(pt, s, tauT, l))
        out = full(stateT, lam0)
        dt = timeit(lambda s, l: full(s, l)[0]["rp"], stateT, lam0, reps=20, warmup=3)
        print(f"{label:32s} {dt*1e3:8.3f} ms/substep", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
