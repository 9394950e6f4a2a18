"""Env-in-lanes dynamics: the whole physics substep with the ENV axis LAST.

The stock `Engine` math is written per-env and vmapped, which leaves tiny
matrix dims (3, 6, nv) in the TPU tile minor positions — a [N,24,6,6] tensor
uses 6x128 lanes out of every 8x128 tile (~4% utilization). This module
re-expresses the identical math with the env axis in the LANES (last) position
and the largest structured dim in the sublanes, so every elementwise op and
every unrolled contraction runs over full 8x128 tiles.

Semantics are bit-for-bit the formulas of `engine.Engine` (reference
humanoidverse/simulator/isaacgym/isaacgym.py is the behavioral target; see
engine.py docstrings for the derivation): CRBA mass matrix and RNEA bias in
root-anchored world-axis spatial coordinates, Gauss-Jordan SPD inverse, APGD
friction-cone contact solve (optionally the Pallas env-in-lanes kernel —
whose [3K,3K,L] layout this module produces natively, no transposes).

`LanesEngine.control_step_batched` is a drop-in for
`Engine.control_step_batched` (env-first pytrees at the boundary).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pbhc_tpu.maths import rotations as rot
from pbhc_tpu.model.kinematics import _level_order
from pbhc_tpu.sim.engine import (GRAVITY, Engine, SimParams, SimState,
                                 active_set_indices)


# --------------------------------------------------------------------- helpers
# All helpers take component-LEADING arrays ([3,...,N], [3,3,...,N], [4,N]).

def _mm33(A, B):
    """[3,3,...] @ [3,3,...] with broadcasting over trailing dims."""
    rows = []
    for i in range(3):
        rows.append([sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)])
    return jnp.stack([jnp.stack(r) for r in rows])


def _mm33_t(A, B):
    """A @ B^T on [3,3,...]."""
    rows = []
    for i in range(3):
        rows.append([sum(A[i][k] * B[j][k] for k in range(3)) for j in range(3)])
    return jnp.stack([jnp.stack(r) for r in rows])


def _mv3(A, v):
    """[3,3,...] @ [3,...]."""
    return jnp.stack([sum(A[i][k] * v[k] for k in range(3)) for i in range(3)])


def _cross3(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def _quat_to_matrix_lanes(q):
    """q [4,...] xyzw -> R [3,3,...] (same formula as rotations.quat_to_matrix)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)]),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)]),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]),
    ])


def _quat_integrate_lanes(q, omega, dt):
    """Lanes twin of rotations.quat_integrate (exp map, Taylor-safe)."""
    e = omega * dt
    angle = jnp.sqrt(e[0] ** 2 + e[1] ** 2 + e[2] ** 2)
    half = 0.5 * angle
    small = angle < 1e-4
    k = jnp.where(small, 0.5 - angle * angle / 48.0,
                  jnp.sin(half) / jnp.maximum(angle, 1e-8))
    dx, dy, dz, dw = e[0] * k, e[1] * k, e[2] * k, jnp.cos(half)
    x2, y2, z2, w2 = q[0], q[1], q[2], q[3]
    out = jnp.stack([
        dw * x2 + dx * w2 + dy * z2 - dz * y2,
        dw * y2 - dx * z2 + dy * w2 + dz * x2,
        dw * z2 + dx * y2 - dy * x2 + dz * w2,
        dw * w2 - dx * x2 - dy * y2 - dz * z2,
    ])
    return out / jnp.sqrt(jnp.sum(out * out, axis=0, keepdims=True))


def _spd_inverse_lanes(M):
    """Unrolled Cholesky SPD inverse on [n,n,N].

    Fully scalarized over the tiny matrix dims: every intermediate is one
    [N] lane vector, so XLA fuses the whole inverse into a handful of
    elementwise kernels. The array-level Gauss-Jordan this replaces rewrote
    the [n,2n,N] augmented matrix n times (measured 2.9 GB HBM traffic /
    4.9 ms per substep at n=29-equivalent blocks, 4096 envs — the single
    most expensive op in the engine)."""
    n = M.shape[0]
    a = [[M[i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_diag[j] = 1.0 / d
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_diag[j]
    # forward-substitute L @ Li = I (Li lower triangular)
    Li = [[None] * n for _ in range(n)]
    for j in range(n):
        Li[j][j] = inv_diag[j]
        for i in range(j + 1, n):
            s = L[i][j] * Li[j][j]
            for k in range(j + 1, i):
                s = s + L[i][k] * Li[k][j]
            Li[i][j] = -s * inv_diag[i]
    # M^-1 = Li^T @ Li
    rows = []
    for i in range(n):
        row = []
        for j in range(i, n):
            s = Li[n - 1][i] * Li[n - 1][j] if n - 1 >= j else None
            for k in range(max(i, j), n - 1):
                t = Li[k][i] * Li[k][j]
                s = t if s is None else s + t
            row.append(s)
        rows.append(row)
    # rows[i] holds columns i..n-1; symmetric fill
    full = [[rows[i][j - i] if j >= i else rows[j][i - j] for j in range(n)]
            for i in range(n)]
    return jnp.stack([jnp.stack(r) for r in full])


class LanesEngine:
    """Env-axis-last twin of `Engine` (shares its static model data/options)."""

    def __init__(self, engine: Engine):
        self.e = engine
        self.opt = engine.opt
        model = engine.model
        self.nb, self.nd, self.nv, self.K = engine.nb, engine.nd, engine.nv, engine.K

        # Rodrigues constants per dof: R(θ) = cI + sK + (1-c) aaᵀ, as [3,3,nd]
        axis = np.asarray(model.dof_axis, dtype=np.float32)    # [nd,3]
        K_sk = np.zeros((self.nd, 3, 3), np.float32)
        K_sk[:, 0, 1], K_sk[:, 0, 2] = -axis[:, 2], axis[:, 1]
        K_sk[:, 1, 0], K_sk[:, 1, 2] = axis[:, 2], -axis[:, 0]
        K_sk[:, 2, 0], K_sk[:, 2, 1] = -axis[:, 1], axis[:, 0]
        P = np.einsum("di,dj->dij", axis, axis)
        self._K = jnp.asarray(np.moveaxis(K_sk, 0, -1))        # [3,3,nd]
        self._P = jnp.asarray(np.moveaxis(P, 0, -1))           # [3,3,nd]
        self._axis = jnp.asarray(axis.T)                       # [3,nd]

        R_local = np.asarray(
            rot.quat_to_matrix(jnp.asarray(model.local_quat, dtype=jnp.float32)))
        self._R_local = jnp.asarray(np.moveaxis(R_local, 0, -1))   # [3,3,B]
        self._local_pos = jnp.asarray(
            np.asarray(model.local_pos, dtype=np.float32).T)       # [3,B]

        _, pos, parent_pos = _level_order(model)
        self._levels = [np.asarray(lv) for lv in model.levels]
        self._parent_pos = [np.asarray(p) for p in parent_pos]
        self._pos = np.asarray(pos)
        self._joint_slot = np.asarray(engine.joint_slot)
        self._dof_body = np.asarray(model.dof_body)
        self._parent = np.asarray(model.parent[: self.nb])

        self._subtree = engine.subtree                         # [B,B] static 0/1
        self._dof_anc_mask = engine.dof_anc[:, :, None]        # [nd,nd,1]
        self._contact_anc = engine.contact_anc                 # [K,nd]
        self._contact_body = np.asarray(engine.contact_body)
        self._contact_pos = jnp.asarray(np.asarray(engine.contact_pos).T)  # [3,K]
        self._contact_radius = engine.contact_radius[:, None]  # [K,1]
        self._dof_limits = engine.dof_limits                   # [nd,2]
        # self-collision pair rows (see Engine.__init__ / Engine._pair_rows)
        self.P, self.KT = engine.P, engine.KT
        self._pair_i = np.asarray(engine.pair_i, dtype=np.int64)
        self._pair_j = np.asarray(engine.pair_j, dtype=np.int64)
        if self.P:
            self._pair_rsum = engine.pair_rsum[:, None]        # [P,1]

        # Branch sparsity of M_dd for the block-Schur inverse: dofs couple
        # only along ancestor chains, so the dof-dof block is block-diagonal
        # by the subtree hanging off the root (left leg / right leg /
        # waist+arms for the G1). Grouping is derived from the ancestry mask.
        anc = np.asarray(engine.dof_anc) + np.asarray(engine.dof_anc).T
        groups, seen = [], set()
        for d in range(self.nd):
            if d in seen:
                continue
            comp, stack = set(), [d]
            while stack:
                i = stack.pop()
                if i in comp:
                    continue
                comp.add(i)
                stack.extend(int(j) for j in np.nonzero(anc[i] > 0)[0] if j not in comp)
            seen |= comp
            groups.append(np.asarray(sorted(comp), dtype=np.int64))
        self._dof_groups = groups
        for g in groups:  # _m_inverse assumes contiguous slices
            assert g[-1] - g[0] + 1 == len(g), f"non-contiguous dof group {g}"

    # ------------------------------------------------------------------ FK
    def _fk(self, dof_pos, root_quat, root_pos):
        """dof_pos [nd,N], root_quat [4,N], root_pos [3,N]
        -> p_w [3,B,N], R_w [3,3,B,N] (body order, world frame)."""
        N = dof_pos.shape[-1]
        c, s = jnp.cos(dof_pos), jnp.sin(dof_pos)              # [nd,N]
        Rj = (jnp.eye(3)[:, :, None, None] * c
              + self._K[:, :, :, None] * s
              + self._P[:, :, :, None] * (1.0 - c))            # [3,3,nd,N]
        ident = jnp.broadcast_to(jnp.eye(3)[:, :, None, None], (3, 3, 1, N))
        Rj_all = jnp.concatenate([Rj, ident], axis=2)[:, :, self._joint_slot]  # [3,3,B,N]

        R_acc = _quat_to_matrix_lanes(root_quat)[:, :, None]   # [3,3,1,N]
        p_acc = root_pos[:, None]                              # [3,1,N]
        for lv, ppos in zip(self._levels, self._parent_pos):
            Rp = R_acc[:, :, ppos]                             # [3,3,L,N]
            Rl = self._R_local[:, :, lv][..., None]            # [3,3,L,1]
            lp = self._local_pos[:, lv][:, :, None]            # [3,L,1]
            A = _mm33(Rp, Rl)
            R_new = _mm33(A, Rj_all[:, :, lv])
            p_new = _mv3(Rp, lp) + p_acc[:, ppos]
            R_acc = jnp.concatenate([R_acc, R_new], axis=2)
            p_acc = jnp.concatenate([p_acc, p_new], axis=1)
        return p_acc[:, self._pos], R_acc[:, :, self._pos]

    # ------------------------------------------------------------- derived
    def derived_state_lanes(self, stT, states_env_first, contact_forces=None):
        """Lanes-layout twin of Engine.derived_state: refresh the body
        pose/velocity caches without leaving the env-last layout. The vmapped
        env-first refresh at the end of the control step measured 9 ms at
        4096 envs (a third of the whole physics cost); this form fuses with
        the final substep."""
        N = stT["q"].shape[-1]
        p_w, R_w = self._fk(stT["q"], stT["rq"], stT["rp"])    # [3,B,N],[3,3,B,N]

        # per-body joint twist: world axis (R_w @ local axis) * qd, zero row
        # for jointless bodies (kinematics.fk_velocities semantics)
        ax_b = jnp.concatenate([self._axis, jnp.zeros((3, 1))], axis=1)[
            :, self._joint_slot]                               # [3,B]
        qd_b = jnp.concatenate([stT["qd"], jnp.zeros((1, N))], axis=0)[
            self._joint_slot]                                  # [B,N]
        twist = _mv3(R_w, ax_b[:, :, None]) * qd_b[None]       # [3,B,N]

        v_acc = stT["rv"][:, None]                             # [3,1,N]
        w_acc = stT["rw"][:, None]
        for lv, ppos in zip(self._levels, self._parent_pos):
            wp = w_acc[:, ppos]
            w_new = wp + twist[:, lv]
            v_new = v_acc[:, ppos] + _cross3(wp, p_w[:, lv] - p_w[:, self._parent[lv]])
            w_acc = jnp.concatenate([w_acc, w_new], axis=1)
            v_acc = jnp.concatenate([v_acc, v_new], axis=1)
        v, w = v_acc[:, self._pos], w_acc[:, self._pos]

        # [row,col,B,N] -> [N,B,row,col]; [3,B,N] -> [N,B,3]
        quat = rot.matrix_to_quat(jnp.transpose(R_w, (3, 2, 0, 1)))
        out = dataclasses.replace(
            states_env_first,
            body_pos=jnp.transpose(p_w, (2, 1, 0)),
            body_quat=quat,
            body_lin_vel=jnp.transpose(v, (2, 1, 0)),
            body_ang_vel=jnp.transpose(w, (2, 1, 0)),
        )
        if contact_forces is not None:
            out = dataclasses.replace(out, contact_forces=contact_forces)
        return out

    # --------------------------------------------------------- spatial algebra
    def _spatial_quantities(self, paramsT, p_w, R_w):
        """I_o [6,6,B,N], Phi_d [6,nd,N] about the root body origin
        (see engine._spatial_quantities for the derivation)."""
        massT, comT, inertiaT = paramsT["mass"], paramsT["com"], paramsT["inertia"]
        p_rel = p_w - p_w[:, :1]                               # [3,B,N]
        c_w = p_rel + _mv3(R_w, comT)                          # [3,B,N]
        I_c = _mm33_t(_mm33(R_w, inertiaT), R_w)               # [3,3,B,N]

        zero = jnp.zeros_like(c_w[0])
        ch = jnp.stack([
            jnp.stack([zero, -c_w[2], c_w[1]]),
            jnp.stack([c_w[2], zero, -c_w[0]]),
            jnp.stack([-c_w[1], c_w[0], zero]),
        ])                                                     # [3,3,B,N]
        m = massT[None, None]                                  # [1,1,B,N]
        I_ang = I_c + m * _mm33_t(ch, ch)
        m_ch = m * ch
        m_eye = m * jnp.eye(3)[:, :, None, None]
        top = jnp.concatenate([I_ang, m_ch], axis=1)           # [3,6,B,N]
        bot = jnp.concatenate([-m_ch, m_eye], axis=1)          # skew(c)ᵀ = -skew(c)
        I_o = jnp.concatenate([top, bot], axis=0)              # [6,6,B,N]

        R_d = R_w[:, :, self._dof_body]                        # [3,3,nd,N]
        axis_w = _mv3(R_d, self._axis[:, :, None])             # [3,nd,N]
        anchor = p_rel[:, self._dof_body]                      # [3,nd,N]
        Phi_d = jnp.concatenate([axis_w, _cross3(anchor, axis_w)], axis=0)  # [6,nd,N]
        return I_o, Phi_d, p_rel, c_w

    @staticmethod
    def _swap6(x):
        """Apply Phi_root = [[0,I],[I,0]] (root anchored at itself): swap the
        first and last 3 rows of a [6,...] spatial array."""
        return jnp.concatenate([x[3:], x[:3]], axis=0)

    def _mass_matrix(self, paramsT, I_o, Phi_d):
        """CRBA -> M [nv,nv,N] (engine.mass_matrix, lanes layout)."""
        nd = self.nd
        # composite inertia: contraction over child bodies (static 0/1 mask)
        I_comp = jnp.einsum("bc,ijcn->ijbn", self._subtree, I_o)   # [6,6,B,N]
        I_comp_d = I_comp[:, :, self._dof_body]                    # [6,6,nd,N]
        F = sum(I_comp_d[:, j] * Phi_d[j][None] for j in range(6))  # [6,nd,N]

        M_dd_full = sum(Phi_d[a][:, None] * F[a][None] for a in range(6))  # [nd,nd,N]
        M_dd = jnp.where(self._dof_anc_mask > 0, M_dd_full, 0.0)
        M_dd = M_dd + jnp.swapaxes(M_dd, 0, 1) \
            - M_dd * jnp.eye(nd)[:, :, None]
        M_dd = M_dd + jnp.eye(nd)[:, :, None] * paramsT["armature"][None]

        M_rd = self._swap6(F)                                      # [6,nd,N]
        I0 = I_comp[:, :, 0]                                       # [6,6,N]
        M_rr = self._swap6(jnp.swapaxes(self._swap6(I0), 0, 1))    # S I0 S
        top = jnp.concatenate([M_rr, M_rd], axis=1)                # [6,nv,N]
        bot = jnp.concatenate([jnp.swapaxes(M_rd, 0, 1), M_dd], axis=1)
        return jnp.concatenate([top, bot], axis=0)                 # [nv,nv,N]

    @staticmethod
    def _cross_motion(a, b):
        w = _cross3(a[:3], b[:3])
        v = _cross3(a[:3], b[3:]) + _cross3(a[3:], b[:3])
        return jnp.concatenate([w, v], axis=0)

    @staticmethod
    def _cross_force(a, f):
        n = _cross3(a[:3], f[:3]) + _cross3(a[3:], f[3:])
        fo = _cross3(a[:3], f[3:])
        return jnp.concatenate([n, fo], axis=0)

    def _bias_forces(self, stateT, I_o, Phi_d):
        """RNEA with qdd=0 -> bias [nv,N] (engine.bias_forces, lanes layout)."""
        N = stateT["qd"].shape[-1]
        v_root = jnp.concatenate([stateT["rw"], stateT["rv"]], axis=0)   # [w;v_o]
        g_acc = jnp.concatenate(
            [jnp.zeros((3, N)),
             _cross3(stateT["rv"], stateT["rw"])
             + jnp.asarray([0.0, 0.0, GRAVITY])[:, None]], axis=0)       # [6,N]

        twist_d = Phi_d * stateT["qd"][None]                             # [6,nd,N]
        twist = jnp.concatenate([twist_d, jnp.zeros((6, 1, N))], axis=1)[:, self._joint_slot]

        v_acc = v_root[:, None]                                          # [6,1,N]
        a_acc = g_acc[:, None]
        for lv, ppos in zip(self._levels, self._parent_pos):
            vj = twist[:, lv]
            v_new = v_acc[:, ppos] + vj
            a_new = a_acc[:, ppos] + self._cross_motion(v_new, vj)
            v_acc = jnp.concatenate([v_acc, v_new], axis=1)
            a_acc = jnp.concatenate([a_acc, a_new], axis=1)
        v = v_acc[:, self._pos]                                          # [6,B,N]
        a = a_acc[:, self._pos]

        Iv = sum(I_o[:, j] * v[j][None] for j in range(6))               # [6,B,N]
        Ia = sum(I_o[:, j] * a[j][None] for j in range(6))
        f = Ia + self._cross_force(v, Iv)                                # [6,B,N]
        f_sub = jnp.einsum("bc,icn->ibn", self._subtree, f)              # [6,B,N]
        bias_d = jnp.sum(Phi_d * f_sub[:, self._dof_body], axis=0)       # [nd,N]
        bias_root = self._swap6(f_sub[:, 0])                             # [6,N]
        return jnp.concatenate([bias_root, bias_d], axis=0)              # [nv,N]

    def _m_inverse(self, M):
        """Branch-sparse SPD inverse of the mass matrix [nv,nv,N].

        M_dd is block-diagonal over the subtrees hanging off the root (legs /
        waist+arms), so invert the small blocks independently and recover the
        dense inverse via the 6x6 root Schur complement — ~10x less HBM
        traffic than dense Gauss-Jordan on [nv,2nv,N] (the former top cost of
        the whole substep)."""
        nd, N = self.nd, M.shape[-1]
        R = M[:6, :6]                                          # [6,6,N]
        B = M[6:, :6]                                          # [nd,6,N]
        # groups are contiguous dof ranges (asserted at init): static slices
        # in, block-diagonal assembly via zero-pad + concat (no scatters)
        rows = []
        for g in self._dof_groups:
            a, b = int(g[0]), int(g[-1]) + 1
            inv = _spd_inverse_lanes(M[6 + a:6 + b, 6 + a:6 + b])
            rows.append(jnp.concatenate(
                [jnp.zeros((b - a, a, N), M.dtype), inv,
                 jnp.zeros((b - a, nd - b, N), M.dtype)], axis=1))
        D_inv = jnp.concatenate(rows, axis=0)                  # [nd,nd,N]
        E = jnp.einsum("ijn,jkn->ikn", D_inv, B)               # [nd,6,N]
        S = R - jnp.einsum("jin,jkn->ikn", B, E)               # [6,6,N]
        S_inv = _spd_inverse_lanes(S)
        TR = -jnp.einsum("ijn,kjn->ikn", S_inv, E)             # [6,nd,N]
        BR = D_inv - jnp.einsum("ijn,jkn->ikn", E, TR)         # [nd,nd,N]
        top = jnp.concatenate([S_inv, TR], axis=1)             # [6,nv,N]
        bot = jnp.concatenate([jnp.swapaxes(TR, 0, 1), BR], axis=1)
        return jnp.concatenate([top, bot], axis=0)             # [nv,nv,N]

    def _gravity_forces(self, I_o, Phi_d):
        """Generalized gravity force [nv,N] (engine.gravity_forces, lanes)."""
        f = I_o[:, 5] * GRAVITY                                    # [6,B,N]
        f_sub = jnp.einsum("bc,icn->ibn", self._subtree, f)
        G_d = jnp.sum(Phi_d * f_sub[:, self._dof_body], axis=0)
        G_root = self._swap6(f_sub[:, 0])
        return jnp.concatenate([G_root, G_d], axis=0)

    # ------------------------------------------------------------------ contact
    def _contact_jacobian(self, p_w, R_w, Phi_d, p_rel):
        """Jf [3K? -> [K3, nv, N] flat rows (k-major), x [3,K,N] absolute."""
        K, nv, nd = self.K, self.nv, self.nd
        N = p_w.shape[-1]
        Rk = R_w[:, :, self._contact_body]                         # [3,3,K,N]
        x = p_w[:, self._contact_body] + _mv3(Rk, self._contact_pos[:, :, None])
        x_rel = x - p_w[:, :1]                                     # [3,K,N]

        # dof columns: Phi_v + Phi_w x x_rel -> [3,K,nd,N]; the ancestry mask
        # is applied on the flattened Jacobian by the caller
        w_part = Phi_d[:3][:, None]                                # [3,1,nd,N]
        v_part = Phi_d[3:][:, None]
        xk = x_rel[:, :, None]                                     # [3,K,1,N]
        Jd = v_part + _cross3(w_part, xk)

        # root columns: v cols = identity; w cols = e_c x x_rel
        eye = jnp.eye(3)
        Jr_v = jnp.broadcast_to(eye[:, None, :, None], (3, K, 3, N))        # [3,K,3,N]
        e_cols = jnp.broadcast_to(eye[:, None, :, None], (3, 1, 3, 1))
        Jr_w = _cross3(e_cols, x_rel[:, :, None])                            # [3,K,3,N]
        J = jnp.concatenate([Jr_v, Jr_w, Jd], axis=2)              # [3,K,nv,N]
        Jf = jnp.moveaxis(J, 0, 1).reshape(K * 3, nv, N)           # rows (k,comp)
        return Jf, x

    def _pair_rows(self, J3, x):
        """Self-collision rows, env-last (see Engine._pair_rows).

        J3 [K,3,nv,N] point Jacobians, x [3,K,N] sphere centers ->
        (Jp [P*3,nv,N] contact-frame rows, phi_p [P,N], C [3,3,P,N] with
        C[a,b] = component b of basis row a (t1,t2,n))."""
        d = x[:, self._pair_i] - x[:, self._pair_j]                # [3,P,N]
        dist = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)         # [P,N]
        n = d / jnp.maximum(dist, 1e-9)[None]
        phi_p = dist - self._pair_rsum
        use_z = jnp.abs(n[2]) < 0.9
        ref = jnp.stack([jnp.where(use_z, 0.0, 1.0),
                         jnp.zeros_like(dist),
                         jnp.where(use_z, 1.0, 0.0)])              # [3,P,N]
        t1 = _cross3(ref, n)
        t1 = t1 / jnp.maximum(
            jnp.sqrt(jnp.sum(t1 * t1, axis=0, keepdims=True)), 1e-9)
        t2 = _cross3(n, t1)
        C = jnp.stack([t1, t2, n], axis=0)                         # [3,3,P,N]
        Jrel = J3[self._pair_i] - J3[self._pair_j]                 # [P,3,nv,N]
        # explicit 3x3 loop (house style): einsum over the tiny basis dims
        # lowers to relayout-heavy dot_generals (measured 2.7 ms standalone)
        Jp = jnp.stack(
            [sum(C[a][b][:, None] * Jrel[:, b] for b in range(3)) for a in range(3)],
            axis=1)                                                # [P,3,nv,N]
        return Jp.reshape(-1, J3.shape[2], J3.shape[3]), phi_p, C

    def _ground_height(self, xy):
        """xy [2,K,N] -> [K,N] (bilinear heightfield or flat plane)."""
        e = self.e
        if e.terrain_hf is None:
            return jnp.zeros(xy.shape[1:])
        hf = e.terrain_hf
        i = jnp.clip(xy[0] / e.terrain_hscale, 0.0, hf.shape[0] - 1.001)
        j = jnp.clip(xy[1] / e.terrain_hscale, 0.0, hf.shape[1] - 1.001)
        i0, j0 = jnp.floor(i).astype(jnp.int32), jnp.floor(j).astype(jnp.int32)
        fi, fj = i - i0, j - j0
        return (hf[i0, j0] * (1 - fi) * (1 - fj) + hf[i0, j0 + 1] * (1 - fi) * fj
                + hf[i0 + 1, j0] * fi * (1 - fj) + hf[i0 + 1, j0 + 1] * fi * fj)

    # ------------------------------------------------------------------ substep
    def _substep(self, paramsT, stateT, tauT, lam_prev=None):
        """One physics step, all arrays env-last.

        Returns (stateT, lam [KT,3,N] WORLD-frame impulses: K ground rows then
        P pair rows). `lam_prev` (same layout) warm-starts the APGD solve.
        """
        opt = self.opt
        nv, K = self.nv, self.K
        N = tauT.shape[-1]

        p_w, R_w = self._fk(stateT["q"], stateT["rq"], stateT["rp"])
        I_o, Phi_d, p_rel, _ = self._spatial_quantities(paramsT, p_w, R_w)
        M = self._mass_matrix(paramsT, I_o, Phi_d)
        bias = self._bias_forces(stateT, I_o, Phi_d)

        qd0 = stateT["qd"]
        tau_passive = (-paramsT["dof_damping"] * qd0
                       - paramsT["dof_frictionloss"] * jnp.tanh(qd0 / 0.05))
        tau_full = jnp.concatenate([jnp.zeros((6, N)), tauT + tau_passive], axis=0)

        M_inv = self._m_inverse(M)                                 # [nv,nv,N]
        u = jnp.concatenate([stateT["rv"], stateT["rw"], qd0], axis=0)  # [nv,N]
        rhs = tau_full - bias
        u_plus = u + opt.dt * jnp.sum(M_inv * rhs[None], axis=1)

        # energy-consistent projection of the explicit Coriolis integration
        # (see engine._pre_contact for the derivation)
        if opt.energy_projection:
            G = self._gravity_forces(I_o, Phi_d)                   # [nv,N]
            ke0 = 0.5 * jnp.sum(u * jnp.sum(M * u[None], axis=1), axis=0)
            ke_plus = 0.5 * jnp.sum(u_plus * jnp.sum(M * u_plus[None], axis=1), axis=0)
            p_ext = 0.5 * jnp.sum((u + u_plus) * (tau_full - G), axis=0)
            target = jnp.maximum(ke0 + opt.dt * p_ext, 0.0)
            s = jnp.minimum(jnp.sqrt(target / jnp.maximum(ke_plus, 1e-12)), 1.0)
            u_plus = u_plus * s[None]

        Jf, x = self._contact_jacobian(p_w, R_w, Phi_d, p_rel)
        # re-apply ancestry mask at the flat level (see note in _contact_jacobian)
        anc = jnp.concatenate(
            [jnp.ones((K, 6)), self._contact_anc], axis=1)         # [K,nv]
        anc = jnp.repeat(anc, 3, axis=0)[:, :, None]               # [K3,nv,1]
        Jf = Jf * anc
        phi = x[2] - self._contact_radius - self._ground_height(x[:2])  # [K,N]

        # self-collision pair rows appended after the ground rows
        KT = self.KT
        C = None
        if self.P:
            Jp, phi_p, C = self._pair_rows(Jf.reshape(K, 3, nv, N), x)
            Jf = jnp.concatenate([Jf, Jp], axis=0)                 # [KT3,nv,N]
            phi = jnp.concatenate([phi, phi_p], axis=0)            # [KT,N]

        # warm start: world -> contact frame for pair rows
        if lam_prev is None:
            lam_cf = jnp.zeros((KT, 3, N))
        elif self.P:
            lam_cf = jnp.concatenate(
                [lam_prev[:K],
                 jnp.stack([sum(C[a][b] * lam_prev[K:, b] for b in range(3))
                            for a in range(3)], axis=1)], axis=0)
        else:
            lam_cf = lam_prev

        # active-set pruning: solve only the class-budgeted closest rows
        # (engine.active_set_indices: contact_cap ground + pair_cap pair).
        # Selection is a one-hot contraction, NOT take_along_axis — a traced
        # row gather along the major axis of [KT,3,nv,N] lowers
        # catastrophically (measured 4.0 GB HBM / 3.2 ms standalone vs
        # ~0.1 GB for the matmul form).
        idx = active_set_indices(opt, self.K, self.P, phi.T)       # [N,R]|None
        idxT = None
        if idx is not None:
            cap = idx.shape[-1]
            idxT = idx.T                                           # [cap,N]
            onehot = (idxT[:, None, :] == jnp.arange(KT)[None, :, None]
                      ).astype(Jf.dtype)                           # [cap,KT,N]
            Jf = jnp.einsum("pkn,kfn->pfn", onehot,
                            Jf.reshape(KT, 3 * nv, N)).reshape(cap * 3, nv, N)
            phi = jnp.sum(onehot * phi[None], axis=1)              # [cap,N]
            lam_cf = jnp.einsum("pkn,kcn->pcn", onehot, lam_cf)    # [cap,3,N]
        R = phi.shape[0]                                           # solver rows

        # Delassus and contact solve (APGD; see engine._solve_contacts)
        Jf_b, M_inv_b = jax.lax.optimization_barrier((Jf, M_inv))
        JM = jnp.einsum("avn,vwn->awn", Jf_b, M_inv_b)             # [R3,nv,N]
        A = jnp.einsum("awn,bwn->abn", JM, Jf_b)                   # [R3,R3,N]
        A = jax.lax.optimization_barrier(A)

        active = (phi < opt.contact_margin).astype(jnp.float32)    # [R,N]
        v0 = jnp.sum(Jf * u_plus[None], axis=1).reshape(R, 3, N)   # [R,3,N]
        # PURE velocity solve (restitution bias only); penetration is handled
        # by the split-impulse position pass below (see engine._solve_contacts)
        b = v0.at[:, 2].add(paramsT["restitution"][None]
                            * jnp.minimum(v0[:, 2], 0.0)).reshape(R * 3, N)

        kernel = self.opt.lanes_contact_kernel
        if N % 128 == 0 and (kernel == "pallas" or
                             (kernel == "auto" and jax.default_backend() != "cpu")):
            from pbhc_tpu.sim.pallas_contact import solve_contacts_pallas_lanes

            lam = solve_contacts_pallas_lanes(
                A, b, paramsT["friction"], active, iters=self.opt.solver_iters,
                x0=lam_cf.reshape(R * 3, N))
        else:
            lam = self._apgd(A, b, paramsT["friction"], active,
                             x0=lam_cf.reshape(R * 3, N))          # [R3,N]

        # energy safeguard: rescale so the QP objective (= post-impulse KE
        # change for b = v0) is non-positive (see engine._solve_contacts)
        qv = jnp.sum(A * lam[None], axis=1)                        # [R3,N]
        lAl = jnp.sum(lam * qv, axis=0)                            # [N]
        t = jnp.clip(-jnp.sum(b * lam, axis=0) / jnp.maximum(lAl, 1e-12), 0.0, 1.0)
        t = jnp.where(lAl > 1e-12, t, 1.0)
        lam = lam * t[None]

        imp = jnp.sum(Jf * lam[:, None], axis=0)                   # [nv,N]
        u_new = u_plus + jnp.sum(M_inv * imp[None], axis=1)

        # split-impulse position pass (normal-only projected gradient)
        b_err = -opt.baumgarte / opt.dt * jnp.minimum(phi + opt.penetration_slop, 0.0)
        b_err = jnp.minimum(b_err, opt.max_depenetration_velocity) # [R,N]
        act3 = jnp.repeat(active, 3, axis=0)                       # [R3,N]
        Lp = jnp.max(act3 * jnp.sum(jnp.abs(A) * act3[None], axis=1), axis=0)
        inv_Lp = 1.0 / jnp.maximum(Lp, 1e-6)                       # [N]
        cp = (jnp.zeros((R, 3, N)).at[:, 2].set(b_err * active)).reshape(R * 3, N)

        mv_dtype = jnp.dtype(opt.contact_matvec_dtype)
        A_mv = A.astype(mv_dtype)

        def pos_body(x, _):
            g = jnp.sum((A_mv * x.astype(mv_dtype)[None])
                        .astype(jnp.float32), axis=1) - cp
            x3 = (x - inv_Lp[None] * g).reshape(R, 3, N)
            x = (jnp.zeros_like(x3).at[:, 2]
                 .set(jnp.maximum(x3[:, 2], 0.0) * active)).reshape(R * 3, N)
            return x, None

        lam_p, _ = jax.lax.scan(pos_body, jnp.zeros((R * 3, N)), None,
                                length=opt.pos_iters)
        dpos = opt.dt * jnp.sum(
            M_inv * jnp.sum(Jf * lam_p[:, None], axis=0)[None], axis=1)

        lam3 = lam.reshape(R, 3, N)
        if idxT is not None:
            onehot = (idxT[:, None, :] == jnp.arange(KT)[None, :, None]
                      ).astype(lam3.dtype)                         # [cap,KT,N]
            lam3 = jnp.stack([jnp.sum(onehot * lam3[:, a][:, None], axis=0)
                              for a in range(3)], axis=1)         # [KT,3,N]
        if self.P:  # pair rows: contact frame -> world
            lam3 = jnp.concatenate(
                [lam3[:K],
                 jnp.stack([sum(C[a][b] * lam3[K:, a] for a in range(3))
                            for b in range(3)], axis=1)], axis=0)
        return self._integrate(stateT, u_new, dpos), lam3

    def _apgd(self, A, b, mu, active, x0=None):
        """Accelerated projected gradient on the contact QP, env-last.
        A [R3,R3,N], b [R3,N], mu [N], active [R,N] -> lam [R3,N].
        `x0` warm-starts the iteration (zeros otherwise)."""
        opt = self.opt
        K = active.shape[0]
        # Lipschitz bound over ACTIVE rows only (see engine._solve_contacts)
        act3 = jnp.repeat(active, 3, axis=0)                       # [R3,N]
        L_const = jnp.max(
            act3 * jnp.sum(jnp.abs(A) * act3[None], axis=1), axis=0)
        inv_L = 1.0 / jnp.maximum(L_const, 1e-6)                   # [N]

        def project(lam):
            lam3 = lam.reshape(K, 3, -1)
            ln = jnp.maximum(lam3[:, 2], 0.0)
            tn = jnp.sqrt(lam3[:, 0] ** 2 + lam3[:, 1] ** 2)
            scale = jnp.minimum(1.0, mu[None] * ln / jnp.maximum(tn, 1e-9))
            out = jnp.stack([lam3[:, 0] * scale, lam3[:, 1] * scale, ln], axis=1)
            return (out * active[:, None]).reshape(K * 3, -1)

        # optionally run the per-iteration matvec in bf16: the scan re-reads A
        # every iteration, so halving A's width halves the dominant HBM
        # traffic of the whole solve; products upcast to f32 in-register
        mv_dtype = jnp.dtype(opt.contact_matvec_dtype)
        A_mv = A.astype(mv_dtype)

        def body(carry, _):
            x, x_prev, theta = carry
            theta_new = 0.5 * (jnp.sqrt(theta**4 + 4 * theta**2) - theta**2)
            beta = theta * (1.0 - theta) / (theta**2 + theta_new)
            y = x + beta * (x - x_prev)
            g = jnp.sum((A_mv * y.astype(mv_dtype)[None])
                        .astype(jnp.float32), axis=1) + b
            x_new = project(y - inv_L[None] * g)
            return (x_new, x, theta_new), None

        start = project(x0) if x0 is not None else jnp.zeros_like(b)
        init = (start, start, jnp.asarray(1.0, b.dtype))
        (lam, _, _), _ = jax.lax.scan(body, init, None, length=opt.solver_iters)
        return lam

    def _integrate(self, stateT, u_new, dpos=None):
        """Semi-implicit Euler + caps + hard joint limits (engine._integrate).
        `dpos` [nv,N] = split-impulse position correction (positions only)."""
        opt = self.opt
        v_r = jnp.clip(u_new[:3], -opt.max_root_lin_vel, opt.max_root_lin_vel)
        w_r = jnp.clip(u_new[3:6], -opt.max_root_ang_vel, opt.max_root_ang_vel)
        qd = jnp.clip(u_new[6:], -opt.max_dof_vel, opt.max_dof_vel)
        dp6 = 0.0 if dpos is None else dpos[6:]
        dof_pos = stateT["q"] + qd * opt.dt + dp6
        if opt.joint_limits:
            lo = self._dof_limits[:, 0][:, None]
            hi = self._dof_limits[:, 1][:, None]
            below, above = dof_pos < lo, dof_pos > hi
            dof_pos = jnp.clip(dof_pos, lo, hi)
            qd = jnp.where(below & (qd < 0), 0.0, qd)
            qd = jnp.where(above & (qd > 0), 0.0, qd)
        rq = _quat_integrate_lanes(stateT["rq"], w_r, opt.dt)
        rp = stateT["rp"] + v_r * opt.dt
        if dpos is not None:
            rp = rp + dpos[:3]
            rq = _quat_integrate_lanes(rq, dpos[3:6], 1.0)
        return dict(rp=rp, rq=rq, rv=v_r, rw=w_r, q=dof_pos, qd=qd)

    # ------------------------------------------------------------- control step
    @staticmethod
    def _to_lanes(states: SimState):
        return dict(
            rp=states.root_pos.T, rq=states.root_quat.T,
            rv=states.root_lin_vel.T, rw=states.root_ang_vel.T,
            q=states.dof_pos.T, qd=states.dof_vel.T,
        )

    def control_step_batched(self, params: SimParams, states: SimState, torque_fn,
                             decimation: int, keys=None, pre_substep_fn=None):
        """Drop-in for Engine.control_step_batched (env-first boundary).

        torque_fn(states_env_first, key) -> [N,nd]; pre_substep_fn optional
        (soft dynamic correction hook, reference motion_tracking.py:772-853).
        """
        e = self.e
        N = states.root_pos.shape[0]
        if keys is None:
            keys = jnp.zeros((decimation, 2), dtype=jnp.uint32)

        paramsT = dict(
            mass=params.mass.T,
            com=jnp.moveaxis(params.com, 0, -1),                  # [N,B,3]->[B,3,N]
            inertia=jnp.moveaxis(params.inertia, 0, -1),          # [N,B,3,3]->[B,3,3,N]
            friction=params.friction,                             # [N]
            restitution=params.restitution,                       # [N]
            armature=params.armature.T,                           # [nd,N]
            dof_damping=params.dof_damping.T,
            dof_frictionloss=params.dof_frictionloss.T,
        )
        # component-leading rearrangement for com/inertia: want [3,B,N]/[3,3,B,N]
        paramsT["com"] = jnp.moveaxis(paramsT["com"], 1, 0)       # [3,B,N]
        paramsT["inertia"] = jnp.moveaxis(
            jnp.moveaxis(paramsT["inertia"], 2, 0), 2, 1)         # [3,3,B,N]

        def view(stT):
            """env-first SimState view for the torque/pre callbacks (body
            caches are the stale pre-step ones, matching Engine semantics)."""
            return dataclasses.replace(
                states,
                root_pos=stT["rp"].T, root_quat=stT["rq"].T,
                root_lin_vel=stT["rv"].T, root_ang_vel=stT["rw"].T,
                dof_pos=stT["q"].T, dof_vel=stT["qd"].T,
            )

        def body(carry, key):
            stT, lam_prev = carry
            if pre_substep_fn is not None:
                st = pre_substep_fn(view(stT))
                stT = self._to_lanes(st)
            tau = torque_fn(view(stT), key)                        # [N,nd]
            warm = lam_prev if self.opt.warm_start else None
            stT, lam = self._substep(paramsT, stT, tau.T, warm)
            return (stT, lam), (lam, tau)

        init = (self._to_lanes(states), jnp.zeros((self.KT, 3, N)))
        (stT, _), (lams, taus) = jax.lax.scan(body, init, keys)
        lam_acc = jnp.moveaxis(lams.sum(axis=0), -1, 0)            # [N,KT,3]
        f = lam_acc / (self.opt.dt * decimation)
        cf = jnp.zeros((N, self.nb, 3)).at[:, self._contact_body].add(f[:, : self.K])
        if self.P:
            cf = cf.at[:, self._contact_body[self._pair_i]].add(f[:, self.K:])
            cf = cf.at[:, self._contact_body[self._pair_j]].add(-f[:, self.K:])
        out = self.derived_state_lanes(stT, view(stT), contact_forces=cf)
        return out, taus[-1]
