"""SMPL body model (user-supplied file) — LBS forward + mesh vis gating.

Covers the tier the reference gets from the ``smplx`` package + licensed
model files (reference smpl_vis/utils/body_model_smpl.py, smpl_render.py):
load (official chumpy pkl layout and plain npz), shape blendshapes, LBS
rigidity properties, regressed rest offsets, and the vis_smpl mesh path.
"""
import pickle
import sys
import types

import numpy as np
import pytest

from pbhc_tpu.motion.smpl_model import (
    find_model_file,
    load_smpl_model,
    rest_offsets_from_model,
    rest_joints,
    smpl_lbs,
)


def _toy_model(J=4, with_shapedirs=True):
    """A tiny 'limb chain' body: J joints along +y, a ring of verts at each
    joint, every vert rigidly bound to its joint (one-hot weights)."""
    rng = np.random.RandomState(0)
    per = 3
    V = J * per
    joints = np.stack([np.zeros(J), np.arange(J) * 0.3, np.zeros(J)], 1)
    v = np.repeat(joints, per, axis=0)
    v[:, 0] += np.tile([0.05, -0.05, 0.0], J)
    v[:, 2] += np.tile([0.0, 0.02, 0.06], J)
    weights = np.zeros((V, J))
    weights[np.arange(V), np.repeat(np.arange(J), per)] = 1.0
    # regressor that exactly recovers each joint from its own ring:
    # joint j = mean of ring minus the known local offsets
    reg = np.zeros((J, V))
    for j in range(J):
        reg[j, j * per : (j + 1) * per] = 1.0 / per
    # subtract the ring-centroid offset so reg @ v == joints exactly
    centroid_off = v[:per].mean(0) - joints[0]
    v_adj = v.copy()
    model = {
        "v_template": v_adj,
        "J_regressor": reg,
        "weights": weights,
        "f": np.array([[i, i + 1, i + 2] for i in range(V - 2)]),
        "kintree_table": np.stack(
            [np.concatenate([[2**32 - 1], np.arange(J - 1)]), np.arange(J)]
        ),
    }
    # make the regressor exact: shift template so ring centroids hit joints
    model["v_template"] = v - centroid_off
    if with_shapedirs:
        model["shapedirs"] = rng.randn(V, 3, 10) * 0.01
    return model


def _save_npz(model, path):
    np.savez(path, **model)
    return str(path)


def test_load_npz_and_rest(tmp_path):
    m = _toy_model()
    path = _save_npz(m, tmp_path / "smpl.npz")
    model = load_smpl_model(path)
    assert model["parents"][0] == -1
    jr = rest_joints(model)
    expect = model["J_regressor"] @ model["v_template"]
    np.testing.assert_allclose(jr, expect, atol=1e-12)
    off = rest_offsets_from_model(model)
    # offsets chain back to absolute joints
    rebuilt = np.zeros_like(jr)
    rebuilt[0] = jr[0] + off[0]
    for j in range(1, len(off)):
        rebuilt[j] = rebuilt[model["parents"][j]] + off[j]
    np.testing.assert_allclose(rebuilt, jr, atol=1e-12)


def test_identity_pose_is_template(tmp_path):
    model = load_smpl_model(_save_npz(_toy_model(), tmp_path / "m.npz"))
    J = model["parents"].shape[0]
    poses = np.zeros((2, J * 3))
    trans = np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
    verts, joints = smpl_lbs(model, poses, trans=trans)
    np.testing.assert_allclose(verts[0], model["v_template"], atol=1e-10)
    np.testing.assert_allclose(
        verts[1], model["v_template"] + trans[1], atol=1e-10
    )
    np.testing.assert_allclose(joints[0], rest_joints(model), atol=1e-10)


def test_betas_shift_template(tmp_path):
    model = load_smpl_model(_save_npz(_toy_model(), tmp_path / "m.npz"))
    J = model["parents"].shape[0]
    betas = np.linspace(-1, 1, 10)
    verts, _ = smpl_lbs(model, np.zeros((1, J * 3)), betas=betas)
    expect = model["v_template"] + model["shapedirs"] @ betas
    np.testing.assert_allclose(verts[0], expect, atol=1e-10)


def test_root_rotation_is_rigid(tmp_path):
    model = load_smpl_model(_save_npz(_toy_model(), tmp_path / "m.npz"))
    J = model["parents"].shape[0]
    poses = np.zeros((1, J, 3))
    poses[0, 0, 2] = np.pi / 2  # 90 deg about z at the root
    verts, joints = smpl_lbs(model, poses)
    Rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    root = rest_joints(model)[0]
    expect = (model["v_template"] - root) @ Rz.T + root
    np.testing.assert_allclose(verts[0], expect, atol=1e-9)
    expect_j = (rest_joints(model) - root) @ Rz.T + root
    np.testing.assert_allclose(joints[0], expect_j, atol=1e-9)


def test_child_joint_rotation_moves_only_descendants(tmp_path):
    model = load_smpl_model(_save_npz(_toy_model(J=4), tmp_path / "m.npz"))
    poses = np.zeros((1, 4, 3))
    poses[0, 2, 0] = np.pi / 2  # bend joint 2 about x
    verts, joints = smpl_lbs(model, poses)
    # verts bound to joints 0 and 1 are untouched
    np.testing.assert_allclose(verts[0, :6], model["v_template"][:6], atol=1e-10)
    # joint 2 itself stays, joint 3 moves rigidly about joint 2
    jr = rest_joints(model)
    np.testing.assert_allclose(joints[0, 2], jr[2], atol=1e-10)
    Rx = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    np.testing.assert_allclose(joints[0, 3], Rx @ (jr[3] - jr[2]) + jr[2],
                               atol=1e-9)
    # verts of joint 3's ring transform with the same rigid map
    expect = (model["v_template"][9:] - jr[2]) @ Rx.T + jr[2]
    np.testing.assert_allclose(verts[0, 9:], expect, atol=1e-9)


def test_posedirs_applied(tmp_path):
    m = _toy_model(J=4)
    rng = np.random.RandomState(1)
    m["posedirs"] = rng.randn(12, 3, 9 * 3) * 0.001
    model = load_smpl_model(_save_npz(m, tmp_path / "m.npz"))
    poses = np.zeros((1, 4, 3))
    poses[0, 1, 1] = 0.3
    verts_np, _ = smpl_lbs(model, poses)
    del model["posedirs"]
    verts_no, _ = smpl_lbs(model, poses)
    assert np.abs(verts_np - verts_no).max() > 1e-6  # correctives engaged


def test_official_pkl_layout_chumpy_and_sparse(tmp_path):
    """Official SMPL pkls: py2 pickle, chumpy arrays, scipy-sparse regressor."""
    import scipy.sparse as sp

    m = _toy_model()

    # fake chumpy module so pickling records module='chumpy.ch'
    ch = types.ModuleType("chumpy")
    ch_ch = types.ModuleType("chumpy.ch")

    class Ch:  # noqa: D401 - minimal stand-in
        def __init__(self, x):
            self.x = x

    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    ch_ch.Ch = Ch
    ch.ch = ch_ch
    sys.modules["chumpy"] = ch
    sys.modules["chumpy.ch"] = ch_ch
    try:
        raw = {
            "v_template": Ch(m["v_template"]),
            "shapedirs": Ch(m["shapedirs"]),
            "J_regressor": sp.csr_matrix(m["J_regressor"]),
            "weights": Ch(m["weights"]),
            "f": m["f"],
            "kintree_table": m["kintree_table"],
        }
        path = tmp_path / "SMPL_NEUTRAL.pkl"
        with open(path, "wb") as f:
            pickle.dump(raw, f, protocol=2)
    finally:
        del sys.modules["chumpy"], sys.modules["chumpy.ch"]

    model = load_smpl_model(path)  # must load WITHOUT chumpy importable
    np.testing.assert_allclose(model["v_template"], m["v_template"])
    np.testing.assert_allclose(model["J_regressor"], m["J_regressor"])
    J = model["parents"].shape[0]
    verts, _ = smpl_lbs(model, np.zeros((1, J * 3)))
    np.testing.assert_allclose(verts[0], m["v_template"], atol=1e-10)


def test_find_model_file_env_and_absent(tmp_path, monkeypatch):
    monkeypatch.delenv("SMPL_MODEL_PATH", raising=False)
    # an EXPLICITLY requested path that is absent raises (silent fallback to
    # the mean-shape skeleton is the approximation the arg exists to avoid)
    with pytest.raises(FileNotFoundError):
        find_model_file("/nonexistent/x.pkl")
    assert find_model_file(None) is None
    p = _save_npz(_toy_model(), tmp_path / "m.npz")
    assert find_model_file(p) == p
    monkeypatch.setenv("SMPL_MODEL_PATH", p)
    assert find_model_file(None) == p


def _toy_model_24(tmp_path):
    """24-joint toy body on the real SMPL tree (for FK integration)."""
    from pbhc_tpu.motion.smpl_npz import SMPL_NEUTRAL_OFFSETS, SMPL_PARENTS

    J, per = 24, 2
    joints = np.zeros((J, 3))
    for j in range(1, J):
        joints[j] = joints[SMPL_PARENTS[j]] + SMPL_NEUTRAL_OFFSETS[j]
    v = np.repeat(joints, per, axis=0)
    v[0::2, 0] += 0.04
    v[1::2, 0] -= 0.04
    reg = np.zeros((J, J * per))
    reg[np.arange(J), np.arange(J) * per] = 0.5
    reg[np.arange(J), np.arange(J) * per + 1] = 0.5
    weights = np.zeros((J * per, J))
    weights[np.arange(J * per), np.repeat(np.arange(J), per)] = 1.0
    rng = np.random.RandomState(3)
    model = {
        "v_template": v,
        "J_regressor": reg,
        "weights": weights,
        "f": np.array([[0, 1, 2]]),
        "shapedirs": rng.randn(J * per, 3, 10) * 0.01,
        "kintree_table": np.stack(
            [SMPL_PARENTS.astype(np.int64) % 2**32, np.arange(J)]
        ),
    }
    path = tmp_path / "model24.npz"
    np.savez(path, **model)
    return str(path), model


def test_npz_to_joints_uses_body_model(tmp_path, monkeypatch):
    """Dropping in a body model makes FK respect the archive's betas
    (reference shape-fit stage, smpl_retarget/phc_retarget/fit_smpl_shape.py)."""
    from pbhc_tpu.motion.smpl_npz import npz_to_joints, smpl_fk

    monkeypatch.delenv("SMPL_MODEL_PATH", raising=False)
    model_path, m = _toy_model_24(tmp_path)
    T = 3
    rng = np.random.RandomState(5)
    poses = rng.randn(T, 72) * 0.1
    trans = rng.randn(T, 3) * 0.2
    betas = np.linspace(-0.5, 0.5, 10)
    mot = tmp_path / "mot.npz"
    np.savez(mot, poses=poses, trans=trans, betas=betas,
             mocap_framerate=25.0, gender="neutral")

    j_default, fps = npz_to_joints(mot)
    j_model, _ = npz_to_joints(mot, smpl_model=model_path)
    assert fps == 25.0
    assert np.abs(j_model - j_default).max() > 1e-4  # betas engaged

    model = load_smpl_model(model_path)
    off = rest_offsets_from_model(model, betas)
    expect = smpl_fk(poses.reshape(T, 24, 3), trans, offsets=off)
    np.testing.assert_allclose(j_model, expect, atol=1e-9)
    # the FK skeleton agrees with full-LBS joint positions frame by frame
    _, joints_lbs = smpl_lbs(model, poses, betas=betas, trans=trans)
    root_shift = joints_lbs[:, :1] - j_model[:, :1]  # smpl_fk roots at trans
    np.testing.assert_allclose(j_model + root_shift, joints_lbs, atol=1e-8)


def test_vis_smpl_mesh_path(tmp_path, monkeypatch):
    """End-to-end: npz motion + user model file -> mesh GIF frames."""
    from pbhc_tpu.vis.vis_smpl import render_smpl_npz

    monkeypatch.delenv("SMPL_MODEL_PATH", raising=False)
    model_path = _save_npz(_toy_model(), tmp_path / "model.npz")
    T = 4
    poses = np.zeros((T, 72))
    poses[:, 5] = np.linspace(0, 0.5, T)  # root z spin
    np.savez(tmp_path / "motion.npz", poses=poses,
             trans=np.zeros((T, 3)), betas=np.zeros(10),
             mocap_framerate=30.0, gender="neutral")
    out = render_smpl_npz(tmp_path / "motion.npz", tmp_path / "out.gif",
                          stride=1, smpl_model=model_path)
    assert (tmp_path / "out.gif").stat().st_size > 0
    # and without a model it falls back to the skeleton tier
    out2 = render_smpl_npz(tmp_path / "motion.npz", tmp_path / "skel.gif",
                           stride=2)
    assert (tmp_path / "skel.gif").stat().st_size > 0
