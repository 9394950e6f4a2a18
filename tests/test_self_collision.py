"""Self-collision sphere pairs: crossing-arms must be blocked by the torso.

The reference enables PhysX self-collision for the G1 (reference
humanoidverse/config/robot/g1/g1_23dof_lock_wrist.yaml:173,
simulator/isaacgym/isaacgym.py:272); our engine solves a curated
sphere-sphere pair list (model/g1.py G1_SELF_COLLISION_PAIRS) inside the same
contact QP. Validation idiom: drive the arms INTO the torso with strong PD
(a crossing-arms motion) and check penetration is blocked; the negative
control (pairs disabled) must interpenetrate, and MuJoCo with the equivalent
sphere pairs must agree behaviorally.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbhc_tpu.model.g1 import G1_SELF_COLLISION_PAIRS, load_g1_sim_model
from pbhc_tpu.sim.engine import Engine, EngineOptions


def _crossing_arm_targets(engine):
    """Joint targets that fold both forearms into the chest."""
    q0 = np.zeros(engine.nd, dtype=np.float32)
    names = engine.model.dof_names
    targets = {
        "left_shoulder_pitch_joint": 0.3,
        "right_shoulder_pitch_joint": 0.3,
        "left_shoulder_roll_joint": -0.4,   # adduct toward the chest
        "right_shoulder_roll_joint": 0.4,
        "left_elbow_joint": 1.4,            # fold forearm up/in
        "right_elbow_joint": 1.4,
        "left_shoulder_yaw_joint": 0.8,
        "right_shoulder_yaw_joint": -0.8,
    }
    for i, n in enumerate(names):
        q0[i] = targets.get(n, 0.0)
    return jnp.asarray(q0)


def _run_cross(engine, steps=300):
    """PD the arms into the torso from a high standing pose; return the
    minimum hand/elbow-vs-torso pair gap seen in the second half."""
    p = engine.default_params()
    st = engine.derived_state(p, engine.default_state(root_pos=(0.0, 0.0, 2.0)))
    # pin the root by zeroing gravity effects? simpler: short horizon, high z
    qt = _crossing_arm_targets(engine)
    kp, kd = 120.0, 4.0

    def tq(s, k):
        return jnp.clip(kp * (qt - s.dof_pos) - kd * s.dof_vel, -88.0, 88.0)

    def body(carry, _):
        s, lam = carry
        s2, lam2 = engine.substep(p, s, tq(s, None), lam_warm=lam)
        # pair gaps from fresh FK
        p_w, R_w = engine._fk(s2)
        x = p_w[engine.contact_body] + jnp.einsum(
            "kij,kj->ki", R_w[engine.contact_body], engine.contact_pos)
        if engine.P:
            d = jnp.linalg.norm(x[engine.pair_i] - x[engine.pair_j], axis=-1)
            gap = d - engine.pair_rsum
        else:
            # pairs disabled: compute the gaps the paired engine would see
            d = jnp.linalg.norm(x[_PAIR_I] - x[_PAIR_J], axis=-1)
            gap = d - _PAIR_RSUM
        return (s2, lam2), gap

    lam0 = jnp.zeros((engine.KT, 3))
    (stf, _), gaps = jax.lax.scan(jax.jit(body), (st, lam0), None, length=steps)
    return np.asarray(gaps[steps // 2:]), stf


_m_pairs = load_g1_sim_model(self_collision=True)
_e_tmp = Engine(_m_pairs, EngineOptions())
_PAIR_I, _PAIR_J, _PAIR_RSUM = _e_tmp.pair_i, _e_tmp.pair_j, _e_tmp.pair_rsum


def test_pairs_block_arm_torso_penetration():
    eng = Engine(_m_pairs, EngineOptions())
    gaps, stf = _run_cross(eng)
    assert np.isfinite(np.asarray(stf.dof_pos)).all()
    # hand/elbow-vs-torso pairs: penetration bounded near the slop scale
    assert gaps.min() > -0.02, gaps.min()


def test_no_pairs_interpenetrates():
    """Negative control: without pair rows the forearm passes into the torso."""
    eng = Engine(load_g1_sim_model(self_collision=False), EngineOptions())
    gaps, _ = _run_cross(eng)
    assert gaps.min() < -0.04, gaps.min()


def test_mujoco_agrees_crossing_arms():
    """MuJoCo with the equivalent sphere geoms + explicit pairs also blocks the
    crossing-arm penetration (cross-engine behavioral parity, the reference's
    own validation idiom)."""
    import mujoco

    from pbhc_tpu.model.g1 import G1_BODY_SPHERES, g1_asset_root

    eng = Engine(_m_pairs, EngineOptions())
    xml_path = str(g1_asset_root() / "g1_23dof_lock_wrist.xml")
    spec = mujoco.MjSpec.from_file(xml_path) if hasattr(mujoco, "MjSpec") else None
    if spec is None:
        pytest.skip("mujoco.MjSpec unavailable")

    # add our spheres as named geoms (contype/conaffinity 0: pair-only contacts)
    cb = np.asarray(eng.contact_body)
    cp = np.asarray(eng.contact_pos)
    cr = np.asarray(eng.contact_radius)
    names = {}
    for k in set(np.asarray(eng.pair_i)).union(set(np.asarray(eng.pair_j))):
        body_name = eng.model.body_names[cb[k]]
        b = spec.body(body_name) if hasattr(spec, "body") else spec.find_body(body_name)
        g = b.add_geom()
        g.name = f"selfcol_{k}"
        g.type = mujoco.mjtGeom.mjGEOM_SPHERE
        g.size = [float(cr[k]), 0, 0]
        g.pos = cp[k].tolist()
        g.contype = 0
        g.conaffinity = 0
        names[int(k)] = g.name
    for i, j in np.asarray(eng.model.contact_pairs):
        pr = spec.add_pair()
        pr.geomname1 = names[int(i)]
        pr.geomname2 = names[int(j)]
        pr.friction = [1.0, 1.0, 0.005, 0.0001, 0.0001]
    m = spec.compile()
    d = mujoco.MjData(m)

    # float high, same crossing PD
    d.qpos[:3] = [0, 0, 2.0]
    d.qpos[3:7] = [1, 0, 0, 0]
    qt = np.asarray(_crossing_arm_targets(eng))
    mujoco.mj_forward(m, d)
    for _ in range(300):
        tau = np.clip(120.0 * (qt - d.qpos[7:]) - 4.0 * d.qvel[6:], -88, 88)
        d.qfrc_applied[6:] = tau
        mujoco.mj_step(m, d)

    # measure the same pair gaps in mujoco
    gaps = []
    for i, j in np.asarray(eng.model.contact_pairs):
        gi = d.geom(names[int(i)]).xpos
        gj = d.geom(names[int(j)]).xpos
        gaps.append(np.linalg.norm(gi - gj) - (cr[i] + cr[j]))
    gaps = np.asarray(gaps)
    assert gaps.min() > -0.02, gaps.min()

    # behavioral parity: our steady-state elbow/shoulder-roll angles are in the
    # same blocked regime as mujoco's (loose bound; solvers differ)
    _, stf = _run_cross(eng)
    ours = np.asarray(stf.dof_pos)
    mjq = d.qpos[7:]
    idx = [eng.model.dof_names.index(n) for n in
           ["left_elbow_joint", "right_elbow_joint"]]
    assert np.abs(ours[idx] - mjq[idx]).max() < 0.4, (ours[idx], mjq[idx])
