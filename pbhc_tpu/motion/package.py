"""Motion packaging utilities (reference motion_source/motion_package.py).

Merge single-clip pkls into one multi-motion library file, list/inspect clips,
and compute contact masks from foot height+velocity thresholds (reference
motion_source/count_pkl_contact_mask.py).

CLI:
    python -m pbhc_tpu.motion.package merge out.pkl a.pkl b.pkl ...
    python -m pbhc_tpu.motion.package info lib.pkl
"""
from __future__ import annotations

import sys
from pathlib import Path

import joblib
import numpy as np


def merge(out_path, in_paths):
    lib = {}
    for p in in_paths:
        data = joblib.load(p)
        for k, v in data.items():
            key = f"{Path(p).stem}__{Path(str(k)).name}" if k in lib else k
            lib[key] = v
    joblib.dump(lib, out_path, compress=3)
    return out_path


def info(path):
    data = joblib.load(path)
    rows = []
    for k, v in data.items():
        T = v["pose_aa"].shape[0]
        fps = v.get("fps", 30)
        rows.append((k, T, fps, T / fps, "contact_mask" in v))
    return rows


def compute_contact_mask(body_pos, foot_indices, fps, height_thr=0.08, vel_thr=0.4):
    """Height+velocity foot contact detection (reference convert_fit_motion.foot_detect)."""
    feet = body_pos[:, foot_indices]                    # [T,2,3]
    vel = np.zeros_like(feet)
    vel[1:] = (feet[1:] - feet[:-1]) * fps
    speed = np.linalg.norm(vel, axis=-1)
    low = feet[..., 2] < height_thr
    slow = speed < vel_thr
    return (low & slow).astype(np.float64)


def main(argv=None):
    argv = argv or sys.argv[1:]
    cmd = argv[0]
    if cmd == "merge":
        out = merge(argv[1], argv[2:])
        print(f"wrote {out} ({len(joblib.load(out))} clips)")
    elif cmd == "info":
        for k, T, fps, secs, has_cm in info(argv[1]):
            print(f"{k}: {T} frames @ {fps} fps = {secs:.2f}s contact_mask={has_cm}")
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
