"""TPU-native motion library: reference-pose oracle for motion imitation.

Loads retargeted robot motion pkls ({root_trans_offset, pose_aa, fps, [dof],
[contact_mask], [action]} per clip — schema per reference
motion_lib_base.py:421-441), forward-kinematizes every frame once at load time,
and serves time-indexed interpolated reference states as a pure jit-safe
gather + lerp/slerp (`get_motion_state`, reference motion_lib_base.py:123-259).

All frames of all loaded motions are flat-concatenated on device with
`length_starts` offsets (reference motion_lib_base.py:380-383); clips are tiny
(<100 MB) so the library is replicated per device.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import joblib
import numpy as np
from scipy.ndimage import gaussian_filter1d

from pbhc_tpu.maths import rotations as rot
from pbhc_tpu.model.kinematics import dof_from_pose_aa, fk_pose_aa
from pbhc_tpu.model.mjcf import RobotModel


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MotionData:
    """Flat-concatenated per-frame reference data (device arrays)."""

    gts: jax.Array          # [F, B_ext, 3] global translations (incl. extended bodies)
    grs: jax.Array          # [F, B_ext, 4] global rotations xyzw
    gvs: jax.Array          # [F, B_ext, 3] global linear velocities
    gavs: jax.Array         # [F, B_ext, 3] global angular velocities
    dof_pos: jax.Array      # [F, nd]
    dof_vel: jax.Array      # [F, nd]
    contact_mask: jax.Array  # [F, C] (zeros if absent)
    lengths: jax.Array      # [M] seconds
    fps: jax.Array          # [M]
    dt: jax.Array           # [M]
    num_frames: jax.Array   # [M] int
    length_starts: jax.Array  # [M] int
    sampling_prob: jax.Array  # [M]

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        return tuple(getattr(self, f.name) for f in fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _compute_linear_velocity(p: np.ndarray, dt: float) -> np.ndarray:
    """np.gradient over time + gaussian smoothing (reference fk_batch:271-279)."""
    v = np.gradient(p, axis=0) / dt
    return gaussian_filter1d(v, 2, axis=0, mode="nearest")


def _compute_angular_velocity(q_xyzw: np.ndarray, dt: float) -> np.ndarray:
    """Forward-difference quat rate -> axis*angle/dt, smoothed (reference fk_batch:281-290)."""
    from scipy.spatial.transform import Rotation as sRot

    T = q_xyzw.shape[0]
    flat0 = q_xyzw[:-1].reshape(-1, 4)
    flat1 = q_xyzw[1:].reshape(-1, 4)
    dq = (sRot.from_quat(flat1) * sRot.from_quat(flat0).inv()).as_rotvec()
    w = np.zeros_like(q_xyzw[..., :3])
    w[:-1] = dq.reshape(T - 1, -1, 3) / dt
    return gaussian_filter1d(w, 2, axis=0, mode="nearest")


def load_motion_dict(motion_file) -> dict:
    """Load a motion library: a single pkl, or a DIRECTORY of pkls.

    The reference points motion_file at a folder for multi-motion training
    (reference scripts/train/test.sh ``motion_file=.../example/motion_data``;
    motion_lib_base.py loads every pkl inside). Directory members are merged
    in sorted-filename order; a clip key that collides across files is
    disambiguated with the source file's stem."""
    import os

    if not os.path.isdir(motion_file):
        return joblib.load(motion_file)
    names = sorted(f for f in os.listdir(motion_file) if f.endswith(".pkl"))
    if not names:
        raise ValueError(f"{motion_file}: directory contains no .pkl motions")
    raw = {}
    for name in names:
        part = joblib.load(os.path.join(motion_file, name))
        stem = name[: -len(".pkl")]
        for k, v in part.items():
            raw[f"{stem}/{k}" if k in raw else k] = v
    return raw


class MotionLib:
    """Holds clips and serves get_motion_state. `num_envs` motions are assigned
    per env (with replacement when the library is smaller)."""

    def __init__(self, motion_file: str, model: RobotModel, num_envs: int, step_dt: float,
                 fix_height: str = "no_fix"):
        if motion_file is None:
            raise ValueError(
                "robot.motion.motion_file is not set — pass e.g. "
                "robot.motion.motion_file=/path/to/motion.pkl on the CLI")
        assert fix_height in ("no_fix", "full_fix", "ankle_fix"), fix_height
        self.model = model  # extended model (with virtual hands/head)
        self.num_envs = num_envs
        self.step_dt = step_dt
        self.fix_height = fix_height
        self._load(motion_file)

    def _fix_height_diff(self, p_w, q_w):
        """Height offset putting the first frame's lowest collision-sphere
        surface point on the ground (reference motion_lib_base.py:393-401 uses
        mesh-FK min vertex z; the sphere set is our collision geometry).
        ankle_fix restricts to the foot spheres (FixHeightMode.ankle_fix)."""
        from scipy.spatial.transform import Rotation as sRot

        m = self.model
        bidx = np.asarray(m.contact_body)
        if bidx.size == 0:
            return float(p_w[0, :, 2].min())
        offs = np.asarray(m.contact_pos)
        rad = np.asarray(m.contact_radius)
        if self.fix_height == "ankle_fix":
            keep = np.asarray(["ankle" in m.body_names[b] or "foot" in m.body_names[b]
                               for b in bidx])
            if keep.any():
                bidx, offs, rad = bidx[keep], offs[keep], rad[keep]
        centers = p_w[0, bidx] + sRot.from_quat(q_w[0, bidx]).apply(offs)
        return float((centers[:, 2] - rad).min())

    # ----------------------------------------------------------------- cache
    def _cache_path(self, motion_file):
        """Post-FK flat-array cache: the per-frame FK of a multi-clip library
        costs minutes per process launch; keyed on (file identity, model
        skeleton, fix_height). Disable with PBHC_MOTION_CACHE=0."""
        import hashlib
        import os
        from pathlib import Path

        root = os.environ.get("PBHC_MOTION_CACHE", "/tmp/pbhc_motion_cache")
        if root in ("0", ""):
            return None
        try:
            if os.path.isdir(motion_file):
                # directory library: key on every member file's identity
                ident = tuple(
                    (f, os.stat(os.path.join(motion_file, f)).st_size,
                     int(os.stat(os.path.join(motion_file, f)).st_mtime))
                    for f in sorted(os.listdir(motion_file))
                    if f.endswith(".pkl"))
            else:
                st = os.stat(motion_file)
                ident = (st.st_size, int(st.st_mtime))
        except OSError:
            return None
        m = self.model
        sig = repr((os.path.abspath(motion_file), ident,
                    self.fix_height, tuple(m.body_names), tuple(m.dof_names),
                    len(np.asarray(m.contact_body))))
        h = hashlib.sha1(sig.encode()).hexdigest()[:16]
        d = Path(root)
        d.mkdir(parents=True, exist_ok=True)
        return d / f"mlib_{h}.npz"

    # ------------------------------------------------------------------ load
    def _load(self, motion_file):
        raw = load_motion_dict(motion_file)
        self._keys = list(raw.keys())
        self.num_unique = len(self._keys)

        cache = self._cache_path(motion_file)
        fields = [f.name for f in dataclasses.fields(MotionData)]
        if cache is not None and cache.exists():
            z = np.load(cache)
            self.has_contact_mask = bool(z["has_contact_mask"])
            self.data = MotionData(**{f: jnp.asarray(z[f]) for f in fields})
            return

        gts, grs, gvs, gavs, dofs, dvels, cmasks = [], [], [], [], [], [], []
        lengths, fps_l, nframes = [], [], []
        self.has_contact_mask = False
        fk_jit = jax.jit(jax.vmap(fk_pose_aa, in_axes=(None, 0, 0)), static_argnums=0)

        for k in self._keys:
            clip = raw[k]
            pose_aa = np.asarray(clip["pose_aa"], dtype=np.float32)   # [T,J,3]
            trans = np.asarray(clip["root_trans_offset"], dtype=np.float32)  # [T,3]
            fps = float(clip["fps"])
            dt = 1.0 / fps
            T = pose_aa.shape[0]

            p_w, q_w = fk_jit(self.model, jnp.asarray(pose_aa), jnp.asarray(trans))
            p_w = np.asarray(p_w)
            q_w = np.asarray(q_w)
            if self.fix_height != "no_fix":
                diff = self._fix_height_diff(p_w, q_w)
                trans = trans.copy()
                trans[:, 2] -= diff
                p_w = p_w.copy()
                p_w[..., 2] -= diff

            dof = np.asarray(dof_from_pose_aa(self.model, jnp.asarray(pose_aa)))
            dvel = np.diff(dof, axis=0) / dt
            dvel = np.concatenate([dvel, dvel[-1:]], axis=0)

            gts.append(p_w)
            grs.append(q_w)
            gvs.append(_compute_linear_velocity(p_w, dt))
            gavs.append(_compute_angular_velocity(q_w, dt))
            dofs.append(dof)
            dvels.append(dvel)
            if "contact_mask" in clip:
                self.has_contact_mask = True
                cmasks.append(np.asarray(clip["contact_mask"], dtype=np.float32))
            else:
                cmasks.append(np.zeros((T, 2), dtype=np.float32))
            lengths.append(dt * (T - 1))
            fps_l.append(fps)
            nframes.append(T)

        nf = np.asarray(nframes, dtype=np.int32)
        starts = np.concatenate([[0], np.cumsum(nf)[:-1]]).astype(np.int32)
        self.data = MotionData(
            gts=jnp.asarray(np.concatenate(gts), dtype=jnp.float32),
            grs=jnp.asarray(np.concatenate(grs), dtype=jnp.float32),
            gvs=jnp.asarray(np.concatenate(gvs), dtype=jnp.float32),
            gavs=jnp.asarray(np.concatenate(gavs), dtype=jnp.float32),
            dof_pos=jnp.asarray(np.concatenate(dofs), dtype=jnp.float32),
            dof_vel=jnp.asarray(np.concatenate(dvels), dtype=jnp.float32),
            contact_mask=jnp.asarray(np.concatenate(cmasks), dtype=jnp.float32),
            lengths=jnp.asarray(lengths, dtype=jnp.float32),
            fps=jnp.asarray(fps_l, dtype=jnp.float32),
            dt=jnp.asarray(1.0 / np.asarray(fps_l), dtype=jnp.float32),
            num_frames=jnp.asarray(nf),
            length_starts=jnp.asarray(starts),
            sampling_prob=jnp.full((self.num_unique,), 1.0 / self.num_unique, dtype=jnp.float32),
        )
        if cache is not None:
            tmp = cache.with_suffix(".tmp.npz")
            np.savez(tmp, has_contact_mask=self.has_contact_mask,
                     **{f: np.asarray(getattr(self.data, f)) for f in fields})
            tmp.replace(cache)   # atomic: concurrent loaders see whole files

    # -------------------------------------------------------------- sampling
    def sample_motion_ids(self, key, n=None, random_sample=True, start_idx=0):
        n = n or self.num_envs
        if random_sample:
            return jax.random.categorical(key, jnp.log(self.data.sampling_prob), shape=(n,))
        return (jnp.arange(n) + start_idx) % self.num_unique


# ---------------------------------------------------------------- pure fns

def sample_time(data: MotionData, key, motion_ids, truncate_time=None):
    """Uniform phase sample (reference motion_lib_base.py:486-495)."""
    phase = jax.random.uniform(key, motion_ids.shape)
    length = data.lengths[motion_ids]
    if truncate_time is not None:
        length = length - truncate_time
    return phase * length


def motion_length(data: MotionData, motion_ids):
    return data.lengths[motion_ids]


def _calc_frame_blend(time, length, num_frames, dt):
    """reference motion_lib_base.py:503-513."""
    phase = jnp.clip(time / length, 0.0, 1.0)
    time = jnp.maximum(time, 0.0)
    f0 = (phase * (num_frames - 1)).astype(jnp.int32)
    f1 = jnp.minimum(f0 + 1, num_frames - 1)
    blend = jnp.clip((time - f0 * dt) / dt, 0.0, 1.0)
    return f0, f1, blend


def get_motion_state(data: MotionData, motion_ids, motion_times, offset=None):
    """Interpolated reference state (reference motion_lib_base.py:123-259).

    Returns a dict with the same keys the envs consume. `rg_pos_t`-family
    includes extended bodies; `rg_pos`-family is identical here because the
    extended bodies live at the tail of the body axis (consumers slice).
    """
    length = data.lengths[motion_ids]
    nf = data.num_frames[motion_ids]
    dt = data.dt[motion_ids]
    f0, f1, blend = _calc_frame_blend(motion_times, length, nf, dt)
    f0l = f0 + data.length_starts[motion_ids]
    f1l = f1 + data.length_starts[motion_ids]

    b = blend[..., None]
    be = blend[..., None, None]

    rg_pos = (1 - be) * data.gts[f0l] + be * data.gts[f1l]
    if offset is not None:
        rg_pos = rg_pos + offset[..., None, :]
    body_vel = (1 - be) * data.gvs[f0l] + be * data.gvs[f1l]
    body_ang_vel = (1 - be) * data.gavs[f0l] + be * data.gavs[f1l]
    rb_rot = rot.slerp(data.grs[f0l], data.grs[f1l], be)
    dof_pos = (1 - b) * data.dof_pos[f0l] + b * data.dof_pos[f1l]
    dof_vel = (1 - b) * data.dof_vel[f0l] + b * data.dof_vel[f1l]
    contact = (1 - b) * data.contact_mask[f0l] + b * data.contact_mask[f1l]

    return {
        "root_pos": rg_pos[..., 0, :],
        "root_rot": rb_rot[..., 0, :],
        "dof_pos": dof_pos,
        "root_vel": body_vel[..., 0, :],
        "root_ang_vel": body_ang_vel[..., 0, :],
        "dof_vel": dof_vel,
        "rg_pos": rg_pos,
        "rb_rot": rb_rot,
        "body_vel": body_vel,
        "body_ang_vel": body_ang_vel,
        "rg_pos_t": rg_pos,
        "rg_rot_t": rb_rot,
        "body_vel_t": body_vel,
        "body_ang_vel_t": body_ang_vel,
        "contact_mask": contact,
    }
