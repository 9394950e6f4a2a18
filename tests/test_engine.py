"""Dynamics engine correctness.

The decisive check is free-flight parity vs MuJoCo on the identical MJCF:
matching trajectories validate the mass matrix, bias forces, and integrator
end-to-end. Contact behavior is validated by invariants (no deep penetration,
standing stability under PD) — mirroring the reference's own cross-engine
validation idiom (genesis_mjdebug.py).
"""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbhc_tpu.model.mjcf import load_mjcf
from pbhc_tpu.sim.engine import Engine, EngineOptions
from pbhc_tpu.maths import rotations as rot

MJCF = "/root/repo/assets/robots/g1/g1_23dof_lock_wrist_fitmotionONLY.xml"
MJCF_SIM = "/root/repo/assets/robots/g1/g1_23dof_lock_wrist.xml"


@pytest.fixture(scope="module")
def engine():
    from pbhc_tpu.model.g1 import load_g1_sim_model

    return Engine(load_g1_sim_model(), EngineOptions())


def _substep_n(engine, params, state, tau, n):
    def body(carry, _):
        st = carry
        st, lam = engine.substep(params, st, tau)
        return st, None

    f = jax.jit(lambda st: jax.lax.scan(body, st, None, length=n)[0])
    return f(state)


def test_free_fall_ballistic(engine):
    params = engine.default_params()
    state = engine.default_state(root_pos=(0.0, 0.0, 10.0))
    n = 40
    out = _substep_n(engine, params, state, jnp.zeros(engine.nd), n)
    t = n * engine.opt.dt
    # semi-implicit Euler ballistic: z(t) = z0 - g*dt^2*(1+2+...+n) = z0 - g dt^2 n(n+1)/2
    want_z = 10.0 - 9.81 * engine.opt.dt**2 * n * (n + 1) / 2
    assert abs(float(out.root_pos[2]) - want_z) < 1e-3
    assert abs(float(out.root_lin_vel[2]) + 9.81 * t) < 1e-3
    # no spin picked up
    assert float(jnp.abs(out.root_ang_vel).max()) < 1e-3


def test_mujoco_qacc_parity(engine):
    """Forward dynamics parity: qacc must match MuJoCo at random states.

    This is the strict check of M and bias — trajectory comparisons are
    chaotic (free-spinning light joints) and only get a loose bound below.
    """
    import dataclasses as dc

    import mujoco

    m = mujoco.MjModel.from_xml_path(MJCF_SIM)
    m.dof_damping[:] = 0.0
    m.dof_frictionloss[:] = 0.0
    m.dof_armature[:6] = 0.0  # the MJCF default wrongly puts armature on the free joint
    m.jnt_limited[:] = 0
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT | mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
    d = mujoco.MjData(m)
    rng = np.random.default_rng(7)
    params = dc.replace(engine.default_params(),
                        dof_damping=jnp.zeros(engine.nd), dof_frictionloss=jnp.zeros(engine.nd))

    from scipy.spatial.transform import Rotation as sRot

    for trial in range(5):
        lo, hi = engine.model.dof_limits[:, 0], engine.model.dof_limits[:, 1]
        dof0 = (lo + (hi - lo) * rng.uniform(0, 1, engine.nd)).astype(np.float32)
        dofv0 = rng.uniform(-3, 3, engine.nd).astype(np.float32)
        tau = rng.uniform(-20, 20, engine.nd).astype(np.float32)
        q = rng.normal(size=4).astype(np.float32)
        q /= np.linalg.norm(q)
        lin = rng.uniform(-1, 1, 3).astype(np.float32)
        ang = rng.uniform(-2, 2, 3).astype(np.float32)
        R0 = sRot.from_quat(q).as_matrix()

        d.qpos[:3] = [0, 0, 5.0]
        d.qpos[3:7] = q[[3, 0, 1, 2]]
        d.qpos[7:] = dof0
        d.qvel[:3] = lin
        d.qvel[3:6] = R0.T @ ang
        d.qvel[6:] = dofv0
        d.qfrc_applied[:] = 0
        d.qfrc_applied[6:] = tau
        mujoco.mj_forward(m, d)

        st = dc.replace(
            engine.default_state(),
            root_pos=jnp.asarray([0.0, 0.0, 5.0]),
            root_quat=jnp.asarray(q),
            root_lin_vel=jnp.asarray(lin),
            root_ang_vel=jnp.asarray(ang),
            dof_pos=jnp.asarray(dof0),
            dof_vel=jnp.asarray(dofv0),
        )
        p_w, R_w = engine._fk(st)
        I_o, Phi_d, Phi_root, _ = engine._spatial_quantities(params, p_w, R_w)
        M = np.asarray(engine.mass_matrix(params, I_o, Phi_d, Phi_root))
        bias = np.asarray(engine.bias_forces(st, I_o, Phi_d, Phi_root))

        # mujoco's M/bias in its coordinates ([lin world; ang local; dofs])
        Mmj = np.zeros((engine.nv, engine.nv))
        mujoco.mj_fullM(m, d, Mmj)
        T = np.eye(engine.nv)
        T[3:6, 3:6] = R0
        np.testing.assert_allclose(T.T @ M @ T, Mmj, atol=0.02)
        bias_mj_frame = T.T @ bias
        np.testing.assert_allclose(bias_mj_frame, d.qfrc_bias, atol=5e-3)

        # acceleration parity, normalized by the overall acc scale (f32 M with
        # cond ~3e3 leaves ~1% noise on small components; MuJoCo solves in f64)
        tau_full = np.concatenate([np.zeros(6), tau])
        acc = np.linalg.solve(M.astype(np.float64), (tau_full - bias).astype(np.float64))
        acc_mj = d.qacc.copy()
        acc_mj[3:6] = R0 @ acc_mj[3:6]  # exact: d/dt(R w_l) = R dw_l + w x w = R dw_l
        scale = max(np.abs(acc_mj).max(), 1.0)
        rel = np.abs(acc - acc_mj) / scale
        assert rel.max() < 0.02, (trial, rel.max(), np.argmax(rel))


def test_mujoco_free_flight_parity():
    """Identical initial state + torques, no contact: q(t) must match MuJoCo."""
    import mujoco

    engine = Engine(load_mjcf(MJCF_SIM), EngineOptions(joint_limits=False))
    m = mujoco.MjModel.from_xml_path(MJCF_SIM)
    # keep armature (it dominates the light ankle/arm joints); strip the
    # passive terms whose solver semantics differ, and joint limits
    m.dof_damping[:] = 0.0
    m.dof_frictionloss[:] = 0.0
    m.dof_armature[:6] = 0.0  # the MJCF default wrongly puts armature on the free joint
    m.jnt_limited[:] = 0
    m.opt.timestep = engine.opt.dt
    m.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    d = mujoco.MjData(m)

    rng = np.random.default_rng(3)
    lo, hi = engine.model.dof_limits[:, 0], engine.model.dof_limits[:, 1]
    dof0 = (lo + (hi - lo) * rng.uniform(0.3, 0.7, engine.nd)).astype(np.float32)
    dofv0 = rng.uniform(-1.0, 1.0, engine.nd).astype(np.float32)
    # physically sane torques: 10% of each joint's effort limit
    import yaml

    rcfg = yaml.safe_load(open("/root/repo/pbhc_tpu/config/robot/g1_23dof.yaml"))["robot"]
    effort = np.asarray(rcfg["dof_effort_limit_list"], dtype=np.float32)
    tau = (0.1 * effort * rng.uniform(-1.0, 1.0, engine.nd)).astype(np.float32)
    quat0_xyzw = np.array([0.1, -0.2, 0.3, 0.95], dtype=np.float32)
    quat0_xyzw /= np.linalg.norm(quat0_xyzw)
    lin0 = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    ang0 = np.array([0.5, 0.7, -0.4], dtype=np.float32)

    # --- mujoco joint order must match ours
    mj_joints = [mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_JOINT, i) for i in range(1, m.njnt)]
    assert mj_joints == engine.model.dof_names

    d.qpos[:3] = [0, 0, 10.0]
    d.qpos[3:7] = quat0_xyzw[[3, 0, 1, 2]]  # mujoco wxyz
    d.qpos[7:] = dof0
    d.qvel[:3] = lin0
    # mujoco free-joint angular velocity is BODY-frame in qvel[3:6]
    from scipy.spatial.transform import Rotation as sRot

    R0 = sRot.from_quat(quat0_xyzw).as_matrix()
    d.qvel[3:6] = R0.T @ ang0
    d.qvel[6:] = dofv0
    n = 20
    for _ in range(n):
        d.ctrl[:] = 0
        d.qfrc_applied[6:] = tau
        mujoco.mj_step(m, d)

    params = dataclasses.replace(
        engine.default_params(),
        dof_damping=jnp.zeros(engine.nd),
        dof_frictionloss=jnp.zeros(engine.nd),
    )
    state = engine.default_state()
    state = dataclasses.replace(
        state,
        root_pos=jnp.asarray([0.0, 0.0, 10.0]),
        root_quat=jnp.asarray(quat0_xyzw),
        root_lin_vel=jnp.asarray(lin0),
        root_ang_vel=jnp.asarray(ang0),
        dof_pos=jnp.asarray(dof0),
        dof_vel=jnp.asarray(dofv0),
    )
    out = _substep_n(engine, params, state, jnp.asarray(tau), n)

    # loose bounds: free-spinning light joints make long trajectories chaotic,
    # the strict dynamics check is test_mujoco_qacc_parity
    np.testing.assert_allclose(np.asarray(out.root_pos), d.qpos[:3], atol=1e-2)
    np.testing.assert_allclose(np.asarray(out.dof_pos), d.qpos[7:], atol=0.1)
    got_q = np.asarray(out.root_quat)
    want_q = d.qpos[3:7][[1, 2, 3, 0]]
    assert abs(float(np.abs(np.sum(got_q * want_q)))) > 1 - 1e-3


def test_drop_and_settle_no_penetration(engine):
    """Zero-torque ragdoll drop: collapses to a resting heap, no sink-through,
    no energy explosion (the brutal case RL training produces constantly)."""
    params = engine.default_params()
    state = engine.default_state(root_pos=(0.0, 0.0, 0.85))
    out = _substep_n(engine, params, state, jnp.zeros(engine.nd), 600)  # 3s
    out = engine.derived_state(params, out)  # raw substeps don't refresh caches
    assert np.isfinite(np.asarray(out.root_pos)).all()
    p = out.body_pos[engine.contact_body] + jnp.einsum(
        "kij,kj->ki", rot.quat_to_matrix(out.body_quat[engine.contact_body]), engine.contact_pos
    )
    phi = np.asarray(p[:, 2] - engine.contact_radius)
    assert phi.min() > -0.03, phi.min()
    # resting on the ground, neither sunk through nor catapulted
    assert 0.02 < float(out.root_pos[2]) < 0.5, float(out.root_pos[2])
    assert float(jnp.linalg.norm(out.root_lin_vel)) < 2.0


def test_pd_contact_behavior_matches_mujoco(engine):
    """Joint-PD on the default pose WITH ground contact vs MuJoCo.

    Pure joint PD is genuinely unstable for the G1 (it pitches over in ~1.5 s in
    MuJoCo too), so the check is cross-engine parity of the fall trajectory —
    the reference's own validation idiom (train Isaac -> replay MuJoCo).
    """
    import mujoco
    import yaml
    from scipy.spatial.transform import Rotation as sRot

    cfg = yaml.safe_load(open("/root/repo/pbhc_tpu/config/robot/g1_23dof.yaml"))
    rcfg = cfg["robot"]
    kp = np.zeros(engine.nd, dtype=np.float32)
    kd = np.zeros(engine.nd, dtype=np.float32)
    q0 = np.zeros(engine.nd, dtype=np.float32)
    for i, name in enumerate(engine.model.dof_names):
        q0[i] = rcfg["init_state"]["default_joint_angles"][name]
        for pat, v in rcfg["control"]["stiffness"].items():
            if pat in name:
                kp[i] = v
                kd[i] = rcfg["control"]["damping"][pat]
    taulim = np.asarray(rcfg["dof_effort_limit_list"], dtype=np.float32)

    # --- mujoco rollout
    m = mujoco.MjModel.from_xml_path(MJCF_SIM)
    m.opt.timestep = engine.opt.dt
    d = mujoco.MjData(m)
    d.qpos[:3] = [0, 0, 0.793]
    d.qpos[3:7] = [1, 0, 0, 0]
    d.qpos[7:] = q0
    traj_mj = []
    for i in range(200):  # 1 s
        tau = np.clip(kp * (q0 - d.qpos[7:]) - kd * d.qvel[6:], -taulim, taulim)
        d.qfrc_applied[:] = 0
        d.qfrc_applied[6:] = tau
        mujoco.mj_step(m, d)
        if i % 40 == 39:
            pitch = sRot.from_quat(d.qpos[3:7][[1, 2, 3, 0]]).as_euler("xyz")[1]
            traj_mj.append((d.qpos[2], pitch))

    # --- our rollout
    params = engine.default_params()
    state = dataclasses.replace(engine.default_state(root_pos=(0.0, 0.0, 0.793)), dof_pos=jnp.asarray(q0))
    kpj, kdj, q0j, tlj = jnp.asarray(kp), jnp.asarray(kd), jnp.asarray(q0), jnp.asarray(taulim)

    def body(st, _):
        tau = jnp.clip(kpj * (q0j - st.dof_pos) - kdj * st.dof_vel, -tlj, tlj)
        st, _lam = engine.substep(params, st, tau)
        return st, (st.root_pos[2], st.root_quat)

    f = jax.jit(lambda st: jax.lax.scan(body, st, None, length=200))
    _, (zs, quats) = f(state)
    for k, (z_mj, pitch_mj) in enumerate(traj_mj):
        i = 40 * k + 39
        z = float(zs[i])
        pitch = float(rot.get_euler_xyz(quats[i][None])[0, 1])
        assert abs(z - z_mj) < 0.08, (k, z, z_mj)
        assert abs(pitch - pitch_mj) < 0.25, (k, pitch, pitch_mj)




def test_restitution_bounce(engine):
    """Per-env restitution (reference isaacgym.py:325-332): an elastic drop
    rebounds, an inelastic one stays down."""
    import dataclasses as dc

    def drop(e):
        params = dc.replace(engine.default_params(),
                            restitution=jnp.asarray(e, jnp.float32))
        state = engine.default_state(root_pos=(0.0, 0.0, 1.0))

        def body(st, _):
            st, _lam = engine.substep(params, st, jnp.zeros(engine.nd))
            return st, st.root_pos[2]

        _, zs = jax.jit(lambda s: jax.lax.scan(body, s, None, length=400))(state)
        return np.asarray(zs)

    zs0 = drop(0.0)
    zs9 = drop(0.9)
    # both reach the ground; the elastic one rebounds visibly higher after
    # the first impact
    t_impact = int(np.argmin(zs9))
    assert zs9[t_impact] < 0.6
    rebound9 = zs9[t_impact:].max() - zs9[t_impact]
    rebound0 = zs0[int(np.argmin(zs0)):].max() - zs0.min()
    assert rebound9 > rebound0 + 0.05, (rebound9, rebound0)
    assert np.isfinite(zs9).all()


def test_29dof_ragdoll_stable():
    """The official 29-DoF MJCF has no joint armature/damping defaults; the
    builder must floor them or the tiny-inertia wrist joints explode under
    contact at 200 Hz (regression: wrists oscillated to the velocity clamp
    and launched the robot)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbhc_tpu.model.g1 import load_g1_sim_model
    from pbhc_tpu.sim.engine import Engine, EngineOptions

    m = load_g1_sim_model("g1_29dof_rev_1_0")
    assert float(np.min(m.dof_armature)) > 0.0
    eng = Engine(m, EngineOptions())
    params = eng.default_params()
    st = eng.default_state(root_pos=(0.0, 0.0, 0.793))

    def body(carry, _):
        s, lam_prev = carry
        # warm-started, like the control loop (cold raw substeps under-converge
        # during the violent collapse transient and momentarily hit the caps)
        s, lam = eng.substep(params, s, jnp.zeros((29,)), lam_warm=lam_prev)
        return (s, lam), jnp.abs(s.dof_vel).max()

    (st, _), vmax = jax.lax.scan(
        jax.jit(body), (st, jnp.zeros((eng.KT, 3))), None, length=400)
    assert bool(jnp.isfinite(vmax).all())
    # transient collapse flail may brush the cap; SUSTAINED clamp-saturating
    # oscillation (the armature regression) shows as high velocity at the end
    assert float(vmax[-50:].max()) < 20.0
    assert 0.02 < float(st.root_pos[2]) < 0.5  # settled on the ground


def test_foot_sole_matches_mujoco_mesh():
    """The engine's foot contact polygon must match the deploy XML's ankle
    mesh sole — the surface MuJoCo (and the real foot) stands on. A mismatch
    shifts heel-strike/toe-off lever arms and shows up as ankle-dominated
    engine<->MuJoCo lockstep error on walking gaits (round-2 sim2sim gap)."""
    import mujoco
    import numpy as np

    from pbhc_tpu.model.g1 import g1_asset_root, load_g1_sim_model

    m = mujoco.MjModel.from_xml_path(str(g1_asset_root() / "g1_23dof_lock_wrist.xml"))
    d = mujoco.MjData(m)
    d.qpos[2] = 0.793
    d.qpos[3] = 1.0
    mujoco.mj_forward(m, d)
    mesh = {}
    for gi in range(m.ngeom):
        b = m.geom_bodyid[gi]
        bn = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, b)
        if not (bn and bn.endswith("ankle_roll_link") and m.geom_contype[gi]):
            continue
        mi = m.geom_dataid[gi]
        V = m.mesh_vert[m.mesh_vertadr[mi]:m.mesh_vertadr[mi] + m.mesh_vertnum[mi]]
        W = V @ d.geom_xmat[gi].reshape(3, 3).T + d.geom_xpos[gi]
        B = (W - d.xpos[b]) @ d.xmat[b].reshape(3, 3)   # into the body frame
        sole = B[B[:, 2] < B[:, 2].min() + 0.003]
        mesh[bn] = dict(x=(sole[:, 0].min(), sole[:, 0].max()),
                        y=(sole[:, 1].min(), sole[:, 1].max()),
                        z=B[:, 2].min())

    model = load_g1_sim_model()
    feet = {n: [] for n in mesh}
    for b, p, r in zip(model.contact_body, model.contact_pos, model.contact_radius):
        if model.body_names[b] in mesh:
            feet[model.body_names[b]].append((np.asarray(p), float(r)))
    for bn, spheres in feet.items():
        assert len(spheres) >= 4, bn
        P = np.stack([p for p, _ in spheres])
        rs = np.asarray([r for _, r in spheres])
        ms = mesh[bn]
        # sole bottom height within 1 mm of the mesh sole plane
        assert abs(float((P[:, 2] - rs).min()) - float(ms["z"])) < 1e-3, bn
        # support polygon within 8 mm of the mesh sole extents at every edge
        for axis, key in ((0, "x"), (1, "y")):
            assert abs(P[:, axis].min() - ms[key][0]) < 8e-3, (bn, key, "min")
            assert abs(P[:, axis].max() - ms[key][1]) < 8e-3, (bn, key, "max")
