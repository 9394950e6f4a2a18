"""Pallas env-in-lanes APGD contact kernel (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import pbhc_tpu.sim.pallas_contact as pc

    orig = pc.solve_contacts_pallas

    def patched(A, b, mu, active, iters=32, interpret=False):
        return orig(A, b, mu, active, iters=iters, interpret=True)

    monkeypatch.setattr(pc, "solve_contacts_pallas", patched)


def test_kernel_matches_xla_apgd():
    from pbhc_tpu.model.g1 import load_g1_sim_model
    from pbhc_tpu.sim.engine import Engine, EngineOptions

    e = Engine(load_g1_sim_model(), EngineOptions(solver="pallas"))
    N = 128
    params = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), e.default_params())
    st = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape),
                      e.default_state(root_pos=(0.0, 0.0, 0.793)))
    tau = jnp.zeros((N, e.nd))
    st_b, lam_b = jax.jit(lambda s, t: e.substep_batched(params, s, t))(st, tau)
    st_v, lam_v = jax.jit(jax.vmap(e.substep))(params, st, tau)
    for name in ["root_pos", "root_quat", "root_lin_vel", "root_ang_vel", "dof_pos", "dof_vel"]:
        np.testing.assert_allclose(np.asarray(getattr(st_b, name)),
                                   np.asarray(getattr(st_v, name)), atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(lam_b), np.asarray(lam_v), atol=1e-4)


def test_env_step_with_pallas_solver():
    import dataclasses

    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=128", "simulator.config.solver=pallas",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl"],
    )
    env = MotionTrackingEnv(cfg, 128, jax.random.PRNGKey(0))
    assert env.engine.opt.solver == "pallas"
    state = env.init_state(jax.random.PRNGKey(1))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
    state = dataclasses.replace(state, history=hist)
    state, obs, rew, done, info = jax.jit(env.step)(state, jnp.zeros((128, env.nd)))
    assert bool(jnp.isfinite(rew).all())
    assert bool(jnp.isfinite(obs["actor_obs"]).all())


def test_lanes_kernel_matches_xla_apgd():
    """solve_contacts_pallas_lanes (interpret) == LanesEngine._apgd (XLA)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbhc_tpu.model.g1 import load_g1_sim_model
    from pbhc_tpu.sim.engine import Engine, EngineOptions
    from pbhc_tpu.sim.engine_lanes import LanesEngine
    from pbhc_tpu.sim.pallas_contact import solve_contacts_pallas_lanes

    eng = Engine(load_g1_sim_model("g1_23dof_lock_wrist"), EngineOptions())
    lanes = LanesEngine(eng)
    K = eng.K
    N = 128
    key = jax.random.PRNGKey(0)
    J = jax.random.normal(key, (3 * K, 40, N)) * 0.3
    A = jnp.einsum("ivn,jvn->ijn", J, J) + 1e-2 * jnp.eye(3 * K)[:, :, None]
    b = jax.random.normal(jax.random.PRNGKey(1), (3 * K, N))
    mu = jnp.full((N,), 0.7)
    active = (jax.random.uniform(jax.random.PRNGKey(2), (K, N)) > 0.3).astype(jnp.float32)

    ref = lanes._apgd(A, b, mu, active)
    out = solve_contacts_pallas_lanes(A, b, mu, active, iters=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_restitution_parity_across_solvers():
    """All four contact paths (apgd / pgs / batched-pallas / lanes) must apply
    the same restitution bias on a bouncing state (VERDICT r1: the batched
    path silently dropped the term; default-restitution tests can't see it)."""
    import dataclasses

    from pbhc_tpu.model.g1 import load_g1_sim_model
    from pbhc_tpu.sim.engine import Engine, EngineOptions
    from pbhc_tpu.sim.engine_lanes import LanesEngine

    model = load_g1_sim_model()
    N = 128
    rest = 0.5

    def batched(e):
        params = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape),
                              e.default_params())
        params = dataclasses.replace(
            params, restitution=jnp.full((N,), rest, jnp.float32))
        st = e.default_state(root_pos=(0.0, 0.0, 0.76))  # feet penetrating
        st = dataclasses.replace(st, root_lin_vel=jnp.asarray([0.0, 0.0, -1.0]))
        st = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), st)
        return params, st

    e_apgd = Engine(model, EngineOptions(solver="apgd"))
    params, st = batched(e_apgd)
    tau = jnp.zeros((N, e_apgd.nd))
    st_apgd, lam_apgd = jax.jit(jax.vmap(e_apgd.substep))(params, st, tau)

    # PGS converges slower on hard bounces; give it more sweeps
    e_pgs = Engine(model, EngineOptions(solver="pgs", solver_iters=128))
    st_pgs, lam_pgs = jax.jit(jax.vmap(e_pgs.substep))(params, st, tau)

    e_pal = Engine(model, EngineOptions(solver="pallas"))
    st_pal, lam_pal = jax.jit(
        lambda p, s, t: e_pal.substep_batched(p, s, t))(params, st, tau)

    lanes = LanesEngine(e_apgd)
    st_lanes = lanes.control_step_batched(
        params, jax.vmap(e_apgd.derived_state)(params, st),
        lambda s, k: tau, decimation=1)[0]

    # restitution must produce an upward bounce (post-impulse +z root vel) in
    # EVERY path; a dropped restitution term shifts the bounce by ~0.5 m/s
    for name, other in [("apgd", st_apgd), ("pgs", st_pgs),
                        ("pallas", st_pal), ("lanes", st_lanes)]:
        assert float(jnp.mean(other.root_lin_vel[:, 2])) > 0.05, name
    # apgd vs batched-pallas share the identical formulation: tight parity
    np.testing.assert_allclose(
        np.asarray(st_pal.root_lin_vel), np.asarray(st_apgd.root_lin_vel),
        atol=5e-3, err_msg="pallas root_lin_vel")
    # impulse distribution over redundant colinear contacts is non-unique;
    # velocities above are the physical quantity, impulses get a looser bound
    # (rtol covers f32 convergence drift on the ~8.5 N*s normal impulses; a
    # dropped restitution term would be ~6% relative, far beyond 1%)
    np.testing.assert_allclose(np.asarray(lam_pal), np.asarray(lam_apgd),
                               rtol=1e-2, atol=2e-2)
    # pgs (sequential sweeps) and lanes converge along different paths: the
    # bounce magnitude must still agree to ~0.15 m/s (vs ~0.5 m/s if the
    # restitution term were missing)
    for name, other in [("pgs", st_pgs), ("lanes", st_lanes)]:
        np.testing.assert_allclose(
            np.asarray(other.root_lin_vel), np.asarray(st_apgd.root_lin_vel),
            atol=0.2, err_msg=f"{name} root_lin_vel")
