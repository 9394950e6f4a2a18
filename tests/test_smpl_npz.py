"""SMPL npz contract tests: the video->SMPL stage's output schema
(reference motion_source/demo.py:203-215 save_npz) round-trips through our
loader/FK/retarget into a MotionLib-loadable pkl."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sRot

from pbhc_tpu.motion.smpl_npz import (
    SMPL_NEUTRAL_OFFSETS, SMPL_PARENTS, load_smpl_npz, npz_to_joints, smpl_fk)

# GVHMR's z-up world transform (reference demo.py:208): canonical SMPL (y-up)
# body stood upright in a z-up world.
UPRIGHT = sRot.from_euler("xyz", [np.pi / 2, 0, np.pi])


def _write_npz(path, T=12, fps=30.0, poses=None, trans=None):
    if poses is None:
        poses = np.zeros((T, 72))
        poses[:, :3] = UPRIGHT.as_rotvec()
    if trans is None:
        trans = np.stack([np.linspace(0, 1.0, T), np.zeros(T),
                          np.full(T, 0.9)], axis=1)
    np.savez(path, betas=np.zeros(10), gender="neutral", poses=poses,
             trans=trans, mocap_framerate=fps)
    return poses, trans


def test_load_schema_and_shapes(tmp_path):
    p = tmp_path / "smpl.npz"
    _write_npz(p, T=7, fps=25.0)
    d = load_smpl_npz(p)
    assert d["poses"].shape == (7, 24, 3)
    assert d["trans"].shape == (7, 3)
    assert d["fps"] == 25.0 and d["gender"] == "neutral"
    assert d["betas"].shape == (10,)


def test_load_rejects_bad_schema(tmp_path):
    p = tmp_path / "bad.npz"
    np.savez(p, poses=np.zeros((5, 72)))          # missing trans
    with pytest.raises(ValueError, match="trans"):
        load_smpl_npz(p)
    p2 = tmp_path / "bad2.npz"
    np.savez(p2, poses=np.zeros((5, 10)), trans=np.zeros((5, 3)))
    with pytest.raises(ValueError, match="pose dims"):
        load_smpl_npz(p2)


def test_load_accepts_smplh_extra_dims(tmp_path):
    # AMASS SMPL-H archives carry 156 pose dims; body = first 72
    p = tmp_path / "amass.npz"
    poses = np.zeros((4, 156))
    poses[:, :3] = UPRIGHT.as_rotvec()
    np.savez(p, poses=poses, trans=np.zeros((4, 3)), mocap_framerate=120.0,
             betas=np.zeros(16))
    d = load_smpl_npz(p)
    assert d["poses"].shape == (4, 24, 3)
    assert d["fps"] == 120.0


def test_fk_upright_rest_pose(tmp_path):
    p = tmp_path / "smpl.npz"
    _, trans = _write_npz(p)
    joints, fps = npz_to_joints(p)
    T = trans.shape[0]
    assert joints.shape == (T, 24, 3) and fps == 30.0
    # pelvis rides the translation exactly
    np.testing.assert_allclose(joints[:, 0], trans, atol=1e-12)
    # upright rest pose: head is the highest joint, ankles the lowest
    assert np.all(joints[:, 15, 2] > joints[:, 0, 2] + 0.4)
    assert np.all(joints[:, [7, 8], 2].min(axis=1) < joints[:, 0, 2] - 0.8)
    # left/right symmetry about the pelvis in the lateral axis (world x after
    # GVHMR's z-up transform: canonical left (+x) -> -x, forward -> +y)
    lat_l = joints[:, [1, 4, 7, 16, 18, 20], 0] - trans[:, None, 0]
    lat_r = joints[:, [2, 5, 8, 17, 19, 21], 0] - trans[:, None, 0]
    np.testing.assert_allclose(lat_l, -lat_r, atol=1e-9)
    # feet point forward (+y), not sideways
    fwd = joints[:, 10, 1] - joints[:, 7, 1]
    assert np.all(fwd > 0.08)


def test_fk_bone_lengths_invariant_under_motion():
    rng = np.random.default_rng(0)
    T = 16
    poses = rng.normal(scale=0.3, size=(T, 24, 3))
    trans = rng.normal(size=(T, 3))
    joints = smpl_fk(poses, trans)
    lens = np.linalg.norm(
        joints[:, 1:] - joints[:, SMPL_PARENTS[1:]], axis=-1)   # [T,23]
    expect = np.linalg.norm(SMPL_NEUTRAL_OFFSETS[1:], axis=-1)
    np.testing.assert_allclose(lens, np.broadcast_to(expect, lens.shape),
                               atol=1e-9)


def test_fk_root_rotation_spins_world():
    # rotating the root 180deg about world z mirrors x/y of every joint
    T = 3
    base = np.zeros((T, 24, 3))
    base[:, 0] = UPRIGHT.as_rotvec()
    spun = base.copy()
    spun[:, 0] = (sRot.from_euler("z", np.pi) * UPRIGHT).as_rotvec()
    j0 = smpl_fk(base, np.zeros((T, 3)))
    j1 = smpl_fk(spun, np.zeros((T, 3)))
    np.testing.assert_allclose(j1[..., :2], -j0[..., :2], atol=1e-9)
    np.testing.assert_allclose(j1[..., 2], j0[..., 2], atol=1e-9)


@pytest.mark.slow
def test_npz_to_pkl_roundtrip(tmp_path):
    """Full pkl-level contract: npz -> retarget -> pkl -> MotionLib load."""
    import joblib

    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.motion.motion_lib import MotionLib
    from pbhc_tpu.motion.smpl_npz import npz_to_clip

    p = tmp_path / "smpl.npz"
    _write_npz(p, T=6)
    model = load_g1_motion_model()
    clip = npz_to_clip(p, model=model, iters=120)
    for k, shape in [("root_trans_offset", (6, 3)), ("root_rot", (6, 4)),
                     ("dof", (6, 23))]:
        assert clip[k].shape == shape, k
    assert clip["pose_aa"].shape[0] == 6
    assert clip["retarget_mean_error_m"] < 0.25   # coarse fit at 120 iters
    pkl = tmp_path / "motion.pkl"
    joblib.dump({"walk": clip}, pkl, compress=3)
    ml = MotionLib(str(pkl), model, 1, 0.02)
    assert float(ml.data.lengths[0]) == pytest.approx(5 / 30.0, rel=1e-6)


def test_vis_smpl_gif(tmp_path):
    from pbhc_tpu.vis.vis_smpl import render_smpl_npz

    p = tmp_path / "smpl.npz"
    _write_npz(p, T=4)
    out = render_smpl_npz(p, str(tmp_path / "smpl.gif"), stride=2)
    import os
    assert os.path.getsize(out) > 1000
