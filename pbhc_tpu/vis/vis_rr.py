"""Rerun-based interactive motion viewer (reference robot_motion_process/
vis_rr.py): streams the FK'd skeleton of a motion pkl to a rerun viewer.

rerun is an optional dependency (not in the zero-egress image); the module
degrades to a clear error and the matplotlib renderer
(pbhc_tpu.vis.vis_motion) covers the headless path.

Usage: python -m pbhc_tpu.vis.vis_rr motion.pkl [robot_type=...] [fps=30]
"""
from __future__ import annotations

import sys

import numpy as np


def stream_motion(motion_file, robot_type="g1_23dof_lock_wrist", fps=30, rr=None):
    if rr is None:
        try:
            import rerun as rr  # noqa: F811
        except ImportError as e:
            raise SystemExit(
                "rerun is not installed in this image; use "
                "`python -m pbhc_tpu.vis.vis_motion <pkl> <gif>` instead") from e

    import jax

    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.motion.motion_lib import MotionLib
    from pbhc_tpu.vis.vis_motion import skeleton_segments

    model = load_g1_motion_model(robot_type)
    ml = MotionLib(motion_file, model, num_envs=1, step_dt=1.0 / fps)
    gts = np.asarray(ml.data.gts)                        # [F,B,3]

    rr.init("pbhc_tpu_motion", spawn=True)
    for t in range(gts.shape[0]):
        rr.set_time_sequence("frame", t)
        segs = skeleton_segments(model, gts[t])
        rr.log("skeleton", rr.LineStrips3D([np.asarray(s) for s in segs]))
        rr.log("bodies", rr.Points3D(gts[t]))
    return gts.shape[0]


def main(argv=None):
    argv = argv or sys.argv[1:]
    kv = dict(a.split("=", 1) for a in argv[1:])
    n = stream_motion(argv[0], robot_type=kv.get("robot_type", "g1_23dof_lock_wrist"),
                      fps=int(kv.get("fps", 30)))
    print(f"streamed {n} frames")


if __name__ == "__main__":
    main()
