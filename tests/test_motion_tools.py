"""Offline motion pipeline: interpolation, dof conversion, JAX retargeting, vis."""
import joblib
import numpy as np
import pytest


@pytest.fixture(scope="module")
def clip(ref_motion_path):
    return next(iter(joblib.load(ref_motion_path).values()))


def test_interpolate_default_pose(clip):
    from pbhc_tpu.motion.tools import interpolate_default_pose

    new = interpolate_default_pose(clip, np.zeros(23), lead_in_s=0.3, lead_out_s=0.3)
    n = int(0.3 * clip["fps"])
    assert new["dof"].shape[0] == clip["dof"].shape[0] + 2 * n
    assert new["pose_aa"].shape[0] == new["dof"].shape[0]
    # lead-in starts near the default pose and blends toward frame 0
    assert np.abs(new["dof"][0]).max() < np.abs(clip["dof"][0]).max() + 0.2
    np.testing.assert_allclose(new["dof"][n], clip["dof"][0], atol=0.15)


def test_convert_29dof_to_23dof(clip):
    from pbhc_tpu.motion.tools import convert_29dof_to_23dof

    fake29 = dict(clip)
    T = clip["dof"].shape[0]
    fake29["dof"] = np.zeros((T, 29), dtype=np.float32)
    fake29["pose_aa"] = np.zeros((T, 33, 3), dtype=np.float32)
    out = convert_29dof_to_23dof(fake29)
    assert out["dof"].shape == (T, 23)
    assert out["pose_aa"].shape == (T, 27, 3)


def test_retarget_smpl_joints(clip):
    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.motion.retarget import retarget_smpl_joints

    model = load_g1_motion_model()
    out = retarget_smpl_joints(model, np.asarray(clip["smpl_joints"][:30]), iters=500)
    assert out["retarget_mean_error_m"] < 0.08
    assert out["dof"].shape == (30, 23)
    assert np.isfinite(out["pose_aa"]).all()


def test_vis_motion_gif(ref_motion_path, tmp_path):
    from pbhc_tpu.vis.vis_motion import render_motion

    out = render_motion(ref_motion_path, tmp_path / "m.gif", stride=16, max_frames=8)
    import os

    assert os.path.getsize(out) > 10000


def test_compute_contact_mask(clip):
    from pbhc_tpu.motion.tools import compute_contact_mask

    out = compute_contact_mask(clip)
    cm = out["contact_mask"]
    assert cm.shape == (clip["dof"].shape[0], 2)
    assert (cm[0] == 1).all()                       # frame 0 forced contact
    assert set(np.unique(cm)).issubset({0.0, 1.0})
    # horse stance keeps both feet mostly planted; broad agreement with the
    # (hand-edited) shipped mask
    ref = np.asarray(clip["contact_mask"])
    assert (cm == ref).mean() > 0.6


def test_lafan_to_pkl(tmp_path):
    from pbhc_tpu.motion.tools import lafan_to_pkl

    T = 12
    rows = np.zeros((T, 36), np.float32)
    rows[:, 6] = 1.0                                # unit quat (xyzw w-last)
    rows[:, 2] = 0.79
    rows[:, 7] = np.linspace(0, 0.5, T)             # first dof ramps
    csv = tmp_path / "walk.csv"
    np.savetxt(csv, rows, delimiter=",")
    clip = lafan_to_pkl(str(csv))
    assert clip["dof"].shape == (T, 23)
    assert clip["pose_aa"].shape == (T, 27, 3)
    assert clip["root_rot"].shape == (T, 4)
    assert clip["fps"] == 30
    np.testing.assert_allclose(clip["dof"][:, 0], rows[:, 7], atol=1e-6)


def test_convert_ue_to_23dof(tmp_path):
    """UE walk converter (reference convert_ue_walk_to_23dof.py): loose key
    names, 29->23 wrist drop, pose_aa rebuilt from MJCF joint axes."""
    from scipy.spatial.transform import Rotation as sRot
    from pbhc_tpu.motion.tools import convert_ue_to_23dof

    T = 12
    rng = np.random.default_rng(0)
    quat = sRot.from_euler("z", rng.uniform(-1, 1, (T, 1))).as_quat().astype(np.float32)
    raw = {"g1_ue_walk": {
        "dof_pos": rng.normal(0, 0.2, (T, 29)).astype(np.float32),
        "root_pos": rng.normal(0, 0.1, (T, 3)).astype(np.float32),
        "root_rot": quat,
        "fps": 50,
    }}
    out = convert_ue_to_23dof(raw)
    assert out["dof"].shape == (T, 23)
    assert out["pose_aa"].shape == (T, 27, 3)
    assert out["fps"] == 50
    # wrist dofs 19:22 and 26:29 dropped
    np.testing.assert_allclose(out["dof"][:, :19], raw["g1_ue_walk"]["dof_pos"][:, :19])
    np.testing.assert_allclose(out["dof"][:, 19:], raw["g1_ue_walk"]["dof_pos"][:, 22:26])
    # pose_aa root block is the root rotvec
    np.testing.assert_allclose(out["pose_aa"][:, 0], sRot.from_quat(quat).as_rotvec(),
                               atol=1e-5)
    # it loads through the MotionLib
    import joblib, jax
    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.motion.motion_lib import MotionLib

    mf = str(tmp_path / "ue.pkl")
    joblib.dump({"g1_ue_walk": out}, mf)
    ml = MotionLib(mf, load_g1_motion_model(), 1, 0.02)
    assert int(ml.data.num_frames[0]) == T


def test_vis_rr_streams_with_stub(ref_motion_path):
    """vis_rr viewer (reference robot_motion_process/vis_rr.py) drives any
    rerun-compatible sink; exercised with a stub backend (rerun isn't in the
    image)."""
    from pbhc_tpu.vis.vis_rr import stream_motion

    calls = []

    class StubRR:
        @staticmethod
        def init(name, spawn=False):
            calls.append(("init", name))

        @staticmethod
        def set_time_sequence(name, t):
            pass

        @staticmethod
        def log(path, obj):
            calls.append(("log", path))

        @staticmethod
        def LineStrips3D(x):
            return x

        @staticmethod
        def Points3D(x):
            return x

    n = stream_motion(ref_motion_path, rr=StubRR)
    assert n > 100
    assert sum(1 for c in calls if c == ("log", "bodies")) == n


def test_convert_23dof_to_29dof(ref_motion_path, tmp_path):
    """23->29 up-convert: wrist dofs zero, other dofs preserved, pose_aa on
    the 29-dof axes, loads through the 29-dof MotionLib."""
    import joblib
    from pbhc_tpu.motion.tools import convert_23dof_to_29dof

    raw = joblib.load(ref_motion_path)
    k0 = next(iter(raw.keys()))
    out = convert_23dof_to_29dof(raw[k0])
    dof23 = np.asarray(raw[k0]["dof"])
    assert out["dof"].shape == (len(dof23), 29)
    np.testing.assert_allclose(out["dof"][:, :19], dof23[:, :19])
    np.testing.assert_allclose(out["dof"][:, 22:26], dof23[:, 19:23])
    assert (out["dof"][:, 19:22] == 0).all() and (out["dof"][:, 26:] == 0).all()

    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.motion.motion_lib import MotionLib

    mf = str(tmp_path / "m29.pkl")
    joblib.dump({k0: out}, mf)
    ml = MotionLib(mf, load_g1_motion_model("g1_29dof_rev_1_0"), 1, 0.02)
    assert int(ml.data.num_frames[0]) == len(dof23)


def test_edit_contact_mask_cli(ref_motion_path, tmp_path):
    """edit_contact CLI sets mask ranges per foot and leaves the rest alone."""
    import joblib
    import subprocess
    import sys

    out = str(tmp_path / "edited.pkl")
    r = subprocess.run(
        [sys.executable, "-m", "pbhc_tpu.motion.tools", "edit_contact",
         ref_motion_path, out, "set=L:10:20:0", "set=R:0:5:1"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    orig = joblib.load(ref_motion_path)
    new = joblib.load(out)
    k = next(iter(orig))
    cm0 = np.asarray(orig[k]["contact_mask"], np.float32)
    cm1 = np.asarray(new[k]["contact_mask"], np.float32)
    assert (cm1[10:20, 0] == 0).all() and (cm1[0:5, 1] == 1).all()
    cm0[10:20, 0] = 0
    cm0[0:5, 1] = 1
    np.testing.assert_allclose(cm1, cm0)
