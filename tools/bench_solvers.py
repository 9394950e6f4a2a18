"""Compare physics/solver layouts on the available accelerator.

Usage: python tools/bench_solvers.py [num_envs] [sim|env]

  sim  — raw control_step throughput (PD standing, no env logic)
  env  — full MotionTrackingEnv.step in a scanned rollout (bench.py shape)

Prints ms/control-step and env-steps/s per configuration.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from pbhc_tpu.utils.profiling import timeit  # noqa: E402

MOTION = "/root/repo/assets/motions/Horse-stance_punch.pkl"


def bench_sim(num_envs):
    import dataclasses

    from pbhc_tpu.model.g1 import load_g1_sim_model
    from pbhc_tpu.sim.engine import Engine, EngineOptions
    from pbhc_tpu.sim.engine_lanes import LanesEngine

    model = load_g1_sim_model("g1_23dof_lock_wrist")
    results = {}
    for mode in ["vmap_apgd", "pallas", "lanes"]:
        solver = {"vmap_apgd": "apgd", "pallas": "pallas", "lanes": "lanes"}[mode]
        eng = Engine(model, EngineOptions(solver=solver))
        params = jax.tree.map(lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape),
                              eng.default_params())
        st0 = eng.default_state(root_pos=(0.0, 0.0, 0.755))
        states = jax.tree.map(lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), st0)
        states = jax.vmap(eng.derived_state)(params, states)
        kp = jnp.full((eng.nd,), 100.0)
        kd = jnp.full((eng.nd,), 2.0)

        if mode == "vmap_apgd":
            def fn(p, s):
                def one(p1, s1):
                    return eng.control_step(
                        p1, s1, lambda st, k: kp * (-st.dof_pos) - kd * st.dof_vel, 4)[0]
                return jax.vmap(one)(p, s)
        elif mode == "pallas":
            def fn(p, s):
                return eng.control_step_batched(
                    p, s, lambda st, k: kp * (-st.dof_pos) - kd * st.dof_vel, 4)[0]
        else:
            lanes = LanesEngine(eng)

            def fn(p, s):
                return lanes.control_step_batched(
                    p, s, lambda st, k: kp * (-st.dof_pos) - kd * st.dof_vel, 4)[0]

        # scan 8 control steps inside one jit (training shape)
        @jax.jit
        def rollout(p, s):
            def body(st, _):
                return fn(p, st), None
            s, _ = jax.lax.scan(body, s, None, length=8)
            return s

        try:
            t0 = time.time()
            out = rollout(params, states)
            jax.block_until_ready(out)
            compile_s = time.time() - t0
            dt = timeit(rollout, params, states, reps=10) / 8
            results[mode] = dt
            print(f"{mode:10s} compile={compile_s:6.1f}s  {dt*1e3:8.3f} ms/ctrl-step  "
                  f"{num_envs/dt:12.0f} env-steps/s", flush=True)
        except Exception as e:  # keep comparing the other modes
            print(f"{mode:10s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    return results


def bench_env(num_envs, solver):
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        [f"num_envs={num_envs}", f"robot.motion.motion_file={MOTION}",
         f"simulator.config.solver={solver}"],
    )
    env = MotionTrackingEnv(cfg, num_envs, jax.random.PRNGKey(0))
    state = env.init_state(jax.random.PRNGKey(1))
    actions = jnp.zeros((num_envs, env.nd))

    @jax.jit
    def rollout(state):
        def body(st, _):
            st, obs, rew, done, info = env.step(st, actions)
            return st, rew.sum()
        state, rews = jax.lax.scan(body, state, None, length=24)
        return state, rews.sum()

    t0 = time.time()
    out = rollout(state)
    jax.block_until_ready(out)
    print(f"env[{solver}] compile={time.time()-t0:.1f}s", flush=True)
    dt = timeit(rollout, state, reps=5) / 24
    print(f"env[{solver}] {dt*1e3:8.3f} ms/step  {num_envs/dt:12.0f} env-steps/s", flush=True)
    return dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    what = sys.argv[2] if len(sys.argv) > 2 else "sim"
    if what == "sim":
        bench_sim(n)
    else:
        for solver in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["apgd", "lanes"]):
            bench_env(n, solver)
