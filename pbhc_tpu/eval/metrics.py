"""Tracking accuracy + smoothness metrics.

Reimplements the reference metric library (reference humanoidverse/
measure_traj.py:145-287): the E_* accuracy family compares a policy rollout
against the reference motion; the L2 smoothness family uses finite-difference
vel/acc/jerk. All functions are plain numpy over [T, ...] trajectories.
"""
from __future__ import annotations

import numpy as np


def _fd(x, dt, order=1):
    for _ in range(order):
        x = np.diff(x, axis=0) / dt
    return x


def eval_accuracy(traj: dict, ref: dict, dt: float) -> dict:
    """Accuracy metrics (mm / mm/frame conventions follow measure_traj.py:208-221).

    traj/ref: dicts with body_pos [T,B,3], body_rot [T,B,4], dof_pos [T,nd],
    root_pos [T,3], root_vel [T,3], optional contact_mask [T,C].
    """
    out = {}
    bp, bq = traj["body_pos"], traj["body_rot"]
    rbp, rbq = ref["body_pos"], ref["body_rot"]
    T = min(len(bp), len(rbp))
    bp, bq, rbp, rbq = bp[:T], bq[:T], rbp[:T], rbq[:T]

    # global mean per-body position error (mm)
    out["E_gmpbpe"] = float(np.linalg.norm(bp - rbp, axis=-1).mean() * 1000)
    # root-relative mean per-body position error
    rel = (bp - bp[:, :1]) - (rbp - rbp[:, :1])
    out["E_mpbpe"] = float(np.linalg.norm(rel, axis=-1).mean() * 1000)
    # joint angle errors
    dof, rdof = traj["dof_pos"][:T], ref["dof_pos"][:T]
    out["E_mpjpe"] = float(np.abs(dof - rdof).mean() * 1000)  # mrad
    out["E_mpjve"] = float(np.abs(_fd(dof, dt) - _fd(rdof, dt)).mean())
    # body velocity / acceleration errors
    bv, rbv = _fd(bp, dt), _fd(rbp, dt)
    out["E_pbve"] = float(np.linalg.norm(bv - rbv, axis=-1).mean())
    ba, rba = _fd(bp, dt, 2), _fd(rbp, dt, 2)
    out["E_pbae"] = float(np.linalg.norm(ba - rba, axis=-1).mean())
    # root velocity / acceleration errors
    rv, rrv = _fd(traj["root_pos"][:T], dt), _fd(ref["root_pos"][:T], dt)
    out["E_root_vel"] = float(np.linalg.norm(rv - rrv, axis=-1).mean())
    ra, rra = _fd(traj["root_pos"][:T], dt, 2), _fd(ref["root_pos"][:T], dt, 2)
    out["E_root_acc"] = float(np.linalg.norm(ra - rra, axis=-1).mean())
    if "contact_mask" in traj and "contact_mask" in ref:
        out["E_contact_acc"] = float(
            (np.round(traj["contact_mask"][:T]) == np.round(ref["contact_mask"][:T])).mean())
    return out


def eval_smoothness(traj: dict, dt: float) -> dict:
    """Jerk-family smoothness metrics (measure_traj.py:224-287)."""
    out = {}
    bp = traj["body_pos"]
    out["L2_vel"] = float(np.linalg.norm(_fd(bp, dt), axis=-1).mean())
    out["L2_acc"] = float(np.linalg.norm(_fd(bp, dt, 2), axis=-1).mean())
    out["L2_jerk"] = float(np.linalg.norm(_fd(bp, dt, 3), axis=-1).mean())
    dof = traj["dof_pos"]
    out["L2_dof_vel"] = float(np.abs(_fd(dof, dt)).mean())
    out["L2_dof_acc"] = float(np.abs(_fd(dof, dt, 2)).mean())
    out["L2_dof_jerk"] = float(np.abs(_fd(dof, dt, 3)).mean())
    return out


def episode_length_ratio(episode_lengths, motion_lengths, dt):
    """Mean episode length / motion length (reference ratio_eps.py)."""
    el = np.asarray(episode_lengths, dtype=np.float64) * dt
    ml = np.asarray(motion_lengths, dtype=np.float64)
    return float((el / ml).mean())
