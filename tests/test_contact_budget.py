"""Class-aware contact-row budgeting under the TRAINING-DEFAULT knobs.

The shipped config prunes the contact solve to the contact_cap=8 deepest
ground rows + pair_cap=4 deepest self-collision rows
(pbhc_tpu/config/simulator/tpu.yaml; engine.active_set_indices). Nominal
double stance uses exactly 8 foot-sole spheres, so WITHOUT the separate pair
budget a same-substep self-contact would have to evict a foot row (the
round-2 global top-k did exactly that). The reference enables full PhysX
self-collision unconditionally (reference
humanoidverse/config/robot/g1/g1_23dof_lock_wrist.yaml:173); this guards the
equivalent behavior surviving our pruning: double stance + crossing arms must
keep BOTH feet planted AND pair penetration blocked.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pbhc_tpu.model.g1 import load_g1_sim_model
from pbhc_tpu.sim.engine import Engine, EngineOptions, active_set_indices

# the knobs training runs with (config/simulator/tpu.yaml)
TRAIN_OPTS = dict(contact_cap=8, pair_cap=4, solver_iters=16, pos_iters=4,
                  warm_start=True)

_MODEL = load_g1_sim_model(self_collision=True)


def test_active_set_reserves_foot_rows():
    """Deep pair rows must NOT evict ground (foot) rows from the active set."""
    eng = Engine(_MODEL, EngineOptions(**TRAIN_OPTS))
    K, P = eng.K, eng.P
    phi = np.full(K + P, 1.0, dtype=np.float32)     # everything separated...
    phi[:8] = -0.003                                # ...8 sole rows in contact
    phi[K:K + 6] = -0.01                            # 6 pair rows DEEPER
    idx = np.asarray(active_set_indices(eng.opt, K, P, jnp.asarray(phi)))
    assert set(range(8)) <= set(idx.tolist()), idx  # every foot row kept
    pair_rows = [i for i in idx.tolist() if i >= K]
    assert len(pair_rows) == 4                       # pair budget honored

    # regression: the pre-class-aware global top-k (pair_cap=0) evicts feet
    opt_old = EngineOptions(**{**TRAIN_OPTS, "pair_cap": 0})
    idx_old = np.asarray(active_set_indices(opt_old, K, P, jnp.asarray(phi)))
    assert not set(range(8)) <= set(idx_old.tolist())


def test_active_set_batched_axis():
    """Same selection semantics along the last axis of a batched phi."""
    eng = Engine(_MODEL, EngineOptions(**TRAIN_OPTS))
    K, P = eng.K, eng.P
    phi = np.full((3, K + P), 1.0, dtype=np.float32)
    phi[:, :8] = -0.003
    phi[1, K:K + 6] = -0.01
    idx = np.asarray(active_set_indices(eng.opt, K, P, jnp.asarray(phi)))
    assert idx.shape == (3, 12)
    for n in range(3):
        assert set(range(8)) <= set(idx[n].tolist())


def _crossing_arm_targets(engine):
    """Joint targets that fold both forearms into the chest (legs at default)."""
    q0 = np.zeros(engine.nd, dtype=np.float32)
    targets = {
        "left_shoulder_pitch_joint": 0.3,
        "right_shoulder_pitch_joint": 0.3,
        "left_shoulder_roll_joint": -0.4,
        "right_shoulder_roll_joint": 0.4,
        "left_elbow_joint": 1.4,
        "right_elbow_joint": 1.4,
        "left_shoulder_yaw_joint": 0.8,
        "right_shoulder_yaw_joint": -0.8,
    }
    for i, n in enumerate(engine.model.dof_names):
        q0[i] = targets.get(n, 0.0)
    return jnp.asarray(q0)


def _stand_and_cross(engine, steps):
    """Double stance on the ground + arms PD'd into the torso; per-substep
    (min foot-sole gap per foot, min pair gap, root z)."""
    p = engine.default_params()
    st = engine.derived_state(p, engine.default_state(root_pos=(0.0, 0.0, 0.793)))
    qt = _crossing_arm_targets(engine)
    kp, kd = 150.0, 5.0

    sole = np.asarray(engine.contact_body)
    feet_bodies = sorted({int(b) for i, b in enumerate(sole) if i < 8})
    left_rows = jnp.asarray([i for i in range(8) if int(sole[i]) == feet_bodies[0]])
    right_rows = jnp.asarray([i for i in range(8) if int(sole[i]) == feet_bodies[1]])

    def body(carry, _):
        s, lam = carry
        tau = jnp.clip(kp * (qt - s.dof_pos) - kd * s.dof_vel, -88.0, 88.0)
        s2, lam2 = engine.substep(p, s, tau, lam_warm=lam)
        p_w, R_w = engine._fk(s2)
        x = p_w[engine.contact_body] + jnp.einsum(
            "kij,kj->ki", R_w[engine.contact_body], engine.contact_pos)
        phi_g = x[:, 2] - engine.contact_radius
        d = jnp.linalg.norm(x[engine.pair_i] - x[engine.pair_j], axis=-1)
        gap_p = d - engine.pair_rsum
        out = (jnp.min(phi_g[left_rows]), jnp.min(phi_g[right_rows]),
               jnp.min(gap_p), s2.root_pos[2])
        return (s2, lam2), out

    lam0 = jnp.zeros((engine.KT, 3))
    (_, _), traj = jax.lax.scan(jax.jit(body), (st, lam0), None, length=steps)
    return tuple(np.asarray(t) for t in traj)


def test_double_stance_crossing_arms_training_knobs():
    """Under the shipped cap=8/pair_cap=4 knobs: feet stay planted while the
    crossing arms are simultaneously blocked by the torso (1.25 s, 200 Hz)."""
    eng = Engine(_MODEL, EngineOptions(**TRAIN_OPTS))
    steps = 250
    lz, rz, pair_gap, root_z = _stand_and_cross(eng, steps)
    assert np.isfinite(root_z).all()
    # settled window: skip the first 0.25 s of initial drop/arm swing
    w = slice(50, steps)
    # planted: every substep keeps both feet within 1 cm of the ground
    assert lz[w].max() < 0.01, lz[w].max()
    assert rz[w].max() < 0.01, rz[w].max()
    # no deep foot penetration either (position pass working with 12 rows)
    assert lz[w].min() > -0.02 and rz[w].min() > -0.02
    # self-collision blocked at the same time (arms reach the torso ~0.4 s in)
    assert pair_gap[w].min() > -0.02, pair_gap[w].min()
    assert pair_gap[w].min() < 0.05  # ...and the pairs actually engaged
    # robot still standing
    assert root_z[w].min() > 0.65, root_z[w].min()


def test_double_stance_crossing_arms_lanes():
    """Same scenario through the lanes engine (the actual training path)."""
    from pbhc_tpu.sim.engine_lanes import LanesEngine

    eng = Engine(_MODEL, EngineOptions(solver="lanes", **TRAIN_OPTS))
    lanes = LanesEngine(eng)
    N, steps, decim = 2, 12, 20  # 240 substeps via 12 control steps
    p0 = eng.default_params()
    params = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), p0)
    st0 = eng.derived_state(p0, eng.default_state(root_pos=(0.0, 0.0, 0.793)))
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), st0)
    qt = _crossing_arm_targets(eng)

    def torque_fn(s, k):
        return jnp.clip(150.0 * (qt[None] - s.dof_pos) - 5.0 * s.dof_vel,
                        -88.0, 88.0)

    step = jax.jit(lambda p, s, keys: lanes.control_step_batched(
        p, s, torque_fn, decim, keys))
    zs, gaps = [], []
    for t in range(steps):
        keys = jax.random.split(jax.random.PRNGKey(t), decim)
        states, _ = step(params, states, keys)
        p_w, R_w = jax.vmap(eng._fk)(states)
        x = (jnp.take(p_w, eng.contact_body, axis=1)
             + jnp.einsum("nkij,kj->nki",
                          jnp.take(R_w, eng.contact_body, axis=1),
                          eng.contact_pos))
        d = jnp.linalg.norm(x[:, eng.pair_i] - x[:, eng.pair_j], axis=-1)
        gaps.append(np.asarray(jnp.min(d - eng.pair_rsum)))
        zs.append(np.asarray(states.root_pos[:, 2]))
    zs, gaps = np.asarray(zs), np.asarray(gaps)
    assert np.isfinite(zs).all()
    assert zs[4:].min() > 0.65, zs.min()       # standing throughout
    assert gaps[4:].min() > -0.02, gaps.min()  # pairs blocked
    assert gaps.min() < 0.05                   # pairs engaged
