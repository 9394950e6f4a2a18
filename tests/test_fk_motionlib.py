"""FK + motion library parity against the reference motion data.

The example pkls carry both `pose_aa` (FK input) and `dof`/`root_rot`
(independent ground truth), so dof recovery, root conventions, and foot-ground
consistency validate the whole kinematic convention chain.
"""
import numpy as np
import jax
import jax.numpy as jnp
import joblib
import pytest

from pbhc_tpu.model.mjcf import load_mjcf
from pbhc_tpu.model.kinematics import fk_pose_aa, fk_root_dof, dof_from_pose_aa, fk_velocities
from pbhc_tpu.motion.motion_lib import MotionLib, get_motion_state, sample_time

MJCF = "/root/repo/assets/robots/g1/g1_23dof_lock_wrist_fitmotionONLY.xml"
EXTEND = [
    {"joint_name": "left_hand_link", "parent_name": "left_elbow_link", "pos": [0.25, 0.0, 0.0], "rot": [1.0, 0, 0, 0]},
    {"joint_name": "right_hand_link", "parent_name": "right_elbow_link", "pos": [0.25, 0.0, 0.0], "rot": [1.0, 0, 0, 0]},
    {"joint_name": "head_link", "parent_name": "torso_link", "pos": [0.0, 0.0, 0.42], "rot": [1.0, 0, 0, 0]},
]


@pytest.fixture(scope="module")
def model():
    return load_mjcf(MJCF).extend(EXTEND)


@pytest.fixture(scope="module")
def clip(ref_motion_path):
    d = joblib.load(ref_motion_path)
    return next(iter(d.values()))


def test_model_structure(model):
    assert model.num_dof == 23
    assert model.num_real_bodies == 24
    assert model.num_bodies == 27
    assert model.body_names[0] == "pelvis"
    assert model.body_names[-1] == "head_link"
    # feet contact spheres parsed (4 per foot)
    import numpy as np
    la = model.body_names.index("left_ankle_roll_link")
    ra = model.body_names.index("right_ankle_roll_link")
    assert (model.contact_body == la).sum() >= 4
    assert (model.contact_body == ra).sum() >= 4


def test_dof_recovery_matches_pkl(model, clip):
    dof = np.asarray(dof_from_pose_aa(model, jnp.asarray(clip["pose_aa"])))
    np.testing.assert_allclose(dof, clip["dof"], atol=2e-3)


def test_fk_root_conventions(model, clip):
    pose_aa = jnp.asarray(clip["pose_aa"][:16])
    trans = jnp.asarray(clip["root_trans_offset"][:16])
    p, q = jax.jit(jax.vmap(fk_pose_aa, in_axes=(None, 0, 0)), static_argnums=0)(model, pose_aa, trans)
    p, q = np.asarray(p), np.asarray(q)
    np.testing.assert_allclose(p[:, 0], clip["root_trans_offset"][:16], atol=1e-5)
    want = clip["root_rot"][:16]
    sign = np.sign(np.sum(q[:, 0] * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(q[:, 0], want * sign, atol=2e-3)


def test_fk_feet_on_ground_when_contact(model, clip):
    T = clip["pose_aa"].shape[0]
    p, _ = jax.jit(jax.vmap(fk_pose_aa, in_axes=(None, 0, 0)), static_argnums=0)(
        model, jnp.asarray(clip["pose_aa"]), jnp.asarray(clip["root_trans_offset"])
    )
    p = np.asarray(p)
    la = model.body_names.index("left_ankle_roll_link")
    ra = model.body_names.index("right_ankle_roll_link")
    cm = np.asarray(clip["contact_mask"])
    lz = p[:, la, 2][cm[:, 0] > 0.5]
    rz = p[:, ra, 2][cm[:, 1] > 0.5]
    # ankle origin sits ~3.5cm above the sole; generous bounds catch convention bugs
    assert lz.min() > -0.02 and lz.max() < 0.15, (lz.min(), lz.max())
    assert rz.min() > -0.02 and rz.max() < 0.15, (rz.min(), rz.max())


def test_fk_root_dof_matches_pose_aa_fk(model, clip):
    """Simulator FK (root pose + hinge angles) must agree with motion FK."""
    t = 42
    pose_aa = jnp.asarray(clip["pose_aa"][t])
    trans = jnp.asarray(clip["root_trans_offset"][t])
    p_ref, q_ref = fk_pose_aa(model, pose_aa, trans)
    dof = dof_from_pose_aa(model, pose_aa)
    p_sim, q_sim, _ = fk_root_dof(model, trans, jnp.asarray(clip["root_rot"][t]), dof)
    # extended-body FK only matches on real bodies: pose_aa has extra hand/head
    # rotations the sim treats as welded, but positions of real bodies agree
    nb = model.num_real_bodies
    np.testing.assert_allclose(np.asarray(p_sim[:nb]), np.asarray(p_ref[:nb]), atol=1e-4)
    dots = np.abs(np.sum(np.asarray(q_sim[:nb]) * np.asarray(q_ref[:nb]), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_fk_velocities_finite_difference(model, clip):
    """Analytic body velocities ≈ finite-difference of FK positions."""
    t = 50
    dt = 1e-4
    dof0 = dof_from_pose_aa(model, jnp.asarray(clip["pose_aa"][t]))
    root_pos = jnp.asarray(clip["root_trans_offset"][t])
    root_quat = jnp.asarray(clip["root_rot"][t])
    rng = np.random.default_rng(0)
    dof_vel = jnp.asarray(rng.normal(size=23).astype(np.float32))
    lin = jnp.asarray(rng.normal(size=3).astype(np.float32))
    ang = jnp.asarray(rng.normal(size=3).astype(np.float32))

    p0, _, R0 = fk_root_dof(model, root_pos, root_quat, dof0)
    from pbhc_tpu.maths import rotations as rot
    q1 = rot.quat_integrate(root_quat, ang, dt)
    p1, _, _ = fk_root_dof(model, root_pos + lin * dt, q1, dof0 + dof_vel * dt)
    v_fd = (np.asarray(p1) - np.asarray(p0)) / dt
    v, w = fk_velocities(model, p0, R0, lin, ang, dof_vel)
    # float32 positions + dt=1e-4 FD => ~1e-3 cancellation noise; analytic is exact
    np.testing.assert_allclose(np.asarray(v), v_fd, atol=5e-3)


def test_motion_lib_get_state(model, ref_motion_path):
    lib = MotionLib(ref_motion_path, model, num_envs=4, step_dt=0.02)
    data = lib.data
    ids = jnp.zeros(4, dtype=jnp.int32)
    # exact frame time returns the frame
    dt0 = float(data.dt[0])
    times = jnp.asarray([0.0, dt0 * 10, dt0 * 10.5, float(data.lengths[0])])
    st = get_motion_state(data, ids, times)
    np.testing.assert_allclose(np.asarray(st["dof_pos"][0]), np.asarray(data.dof_pos[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st["dof_pos"][1]), np.asarray(data.dof_pos[10]), atol=1e-4)
    mid = 0.5 * (np.asarray(data.dof_pos[10]) + np.asarray(data.dof_pos[11]))
    np.testing.assert_allclose(np.asarray(st["dof_pos"][2]), mid, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st["dof_pos"][3]), np.asarray(data.dof_pos[-1]), atol=1e-4)
    # beyond-the-end times clamp
    st2 = get_motion_state(data, ids, times + 1000.0)
    np.testing.assert_allclose(np.asarray(st2["dof_pos"][0]), np.asarray(data.dof_pos[-1]), atol=1e-4)
    # shapes
    assert st["rg_pos_t"].shape == (4, model.num_bodies, 3)
    assert st["root_rot"].shape == (4, 4)
    assert st["contact_mask"].shape == (4, 2)
    # sample_time in range
    t = sample_time(data, jax.random.PRNGKey(0), ids)
    assert float(t.min()) >= 0 and float(t.max()) <= float(data.lengths[0])


def test_fix_height_modes(ref_motion_path):
    """reference motion_lib_base.py:393-401 (FixHeightMode): full/ankle fix
    shift the clip so the lowest first-frame collision-sphere point touches
    the ground; no_fix leaves the clip untouched."""
    import jax.numpy as jnp
    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.motion.motion_lib import MotionLib, get_motion_state

    mm = load_g1_motion_model()
    z = {}
    for mode in ("no_fix", "full_fix", "ankle_fix"):
        ml = MotionLib(ref_motion_path, mm, 1, 0.02, fix_height=mode)
        st = get_motion_state(ml.data, jnp.zeros(1, jnp.int32), jnp.zeros(1))
        z[mode] = float(st["root_pos"][0, 2])
        # lowest sphere-surface point of frame 0 must touch z=0 after fixing
        if mode != "no_fix":
            diff = ml._fix_height_diff(
                np.asarray(ml.data.gts[:1]), np.asarray(ml.data.grs[:1]))
            assert abs(diff) < 1e-5, diff
    assert z["no_fix"] != z["full_fix"]


def test_motion_lib_cache_roundtrip(tmp_path, monkeypatch):
    """Second load of the same (file, model, fix_height) hits the post-FK
    cache and reproduces the flat arrays exactly; a different fix_height
    misses it."""
    import dataclasses
    import os

    import numpy as np

    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.motion.motion_lib import MotionData, MotionLib

    monkeypatch.setenv("PBHC_MOTION_CACHE", str(tmp_path / "cache"))
    mf = "/root/repo/assets/motions/Horse-stance_pose.pkl"
    model = load_g1_motion_model()
    ml1 = MotionLib(mf, model, 2, 0.02)
    files = list((tmp_path / "cache").glob("mlib_*.npz"))
    assert len(files) == 1
    ml2 = MotionLib(mf, model, 2, 0.02)
    for f in (fld.name for fld in dataclasses.fields(MotionData)):
        np.testing.assert_array_equal(np.asarray(getattr(ml1.data, f)),
                                      np.asarray(getattr(ml2.data, f)), err_msg=f)
    assert ml2.has_contact_mask == ml1.has_contact_mask
    # fix_height variants cache separately
    MotionLib(mf, model, 2, 0.02, fix_height="full_fix")
    assert len(list((tmp_path / "cache").glob("mlib_*.npz"))) == 2
    # cache off
    monkeypatch.setenv("PBHC_MOTION_CACHE", "0")
    MotionLib(mf, model, 2, 0.02)
    assert len(list((tmp_path / "cache").glob("mlib_*.npz"))) == 2


def test_motion_lib_directory_library(tmp_path, monkeypatch):
    """motion_file may be a DIRECTORY of pkls (the reference's multi-motion
    idiom: scripts/train/test.sh points motion_file at example/motion_data).
    Members merge in sorted order; key collisions get the file-stem prefix;
    the post-FK cache keys on the member files' identity."""
    import pathlib
    import shutil

    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.motion.motion_lib import MotionLib, load_motion_dict

    assets = pathlib.Path(__file__).resolve().parents[1] / "assets" / "motions"
    lib = tmp_path / "motions"
    lib.mkdir()
    shutil.copy(assets / "Horse-stance_pose.pkl", lib / "a.pkl")
    shutil.copy(assets / "Hooks_punch.pkl", lib / "b.pkl")
    shutil.copy(assets / "Horse-stance_pose.pkl", lib / "c.pkl")

    raw = load_motion_dict(str(lib))
    assert len(raw) == 3  # duplicate key from c.pkl got the stem prefix
    assert any(k.startswith("c/") for k in raw)

    monkeypatch.setenv("PBHC_MOTION_CACHE", str(tmp_path / "cache"))
    model = load_g1_motion_model()
    ml = MotionLib(str(lib), model, 2, 0.02)
    assert ml.num_unique == 3
    assert len(list((tmp_path / "cache").glob("mlib_*.npz"))) == 1
    # adding a member invalidates the cache key
    shutil.copy(assets / "Hooks_punch.pkl", lib / "d.pkl")
    ml2 = MotionLib(str(lib), model, 2, 0.02)
    assert ml2.num_unique == 4
    assert len(list((tmp_path / "cache").glob("mlib_*.npz"))) == 2
