"""Quantify the support-foot yaw-pivot contact gap (round-5 named bug).

side_kick's sim2sim fall was root-caused (tools/lockstep_policy.py) to the
torsional response of a planted foot's contact patch: during fast yaw
rotation over the stance foot, the engine's 4-point APGD friction patch and
MuJoCo's contact patch resist the twist differently, and the policy rides
that difference into a fall. This tool measures that difference directly
with a controlled, policy-free experiment (the reference's lock-step debug
idiom, reference humanoidverse/simulator/genesis/genesis_mjdebug.py):

  stand at the default pose -> settle -> PD-swing waist_yaw (the side_kick
  mechanism: upper-body angular momentum reacts through the stance feet)
  -> record ROOT YAW in both engines stepping independently from the same
  state under the same PD targets.

If the contact patches transmitted torsion identically, the root-yaw traces
would match; the gap curve is the quantitative size of the pivot bug.

Usage:
    python tools/diag_pivot.py [amp=1.2] [kp=100] [out=docs/sweeps/r5_pivot_diag.json]
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

MJCF = "/root/repo/assets/robots/g1/g1_23dof_lock_wrist.xml"
WAIST_YAW = 12  # dof index (left leg 0-5, right leg 6-11, waist yaw/roll/pitch 12-14)


def yaw_of_xyzw(q):
    x, y, z, w = q
    return float(np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z)))


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    amp = float(kv.get("amp", 1.2))
    kp_val = float(kv.get("kp", 100.0))
    out = kv.get("out", "docs/sweeps/r5_pivot_diag.json")
    iters = int(kv.get("iters", 32))
    reg = float(kv.get("reg", 1e-3))

    import mujoco

    from pbhc_tpu.model.g1 import load_g1_sim_model
    from pbhc_tpu.sim.engine import Engine, EngineOptions

    model = load_g1_sim_model("g1_23dof_lock_wrist")
    eng = Engine(model, EngineOptions(solver="apgd", solver_iters=iters,
                                      contact_reg=reg))
    params = eng.default_params()
    st = eng.default_state(root_pos=(0.0, 0.0, 0.755))
    st = eng.derived_state(params, st)
    q_default = np.asarray(st.dof_pos).copy()

    m = mujoco.MjModel.from_xml_path(MJCF)
    m.opt.timestep = eng.opt.dt
    m.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    m.dof_armature[:6] = 0.0  # shipped XML wrongly arms the free joint
    d = mujoco.MjData(m)
    d.qpos[:3] = np.asarray(st.root_pos)
    d.qpos[3:7] = np.asarray(st.root_quat)[[3, 0, 1, 2]]  # xyzw -> wxyz
    d.qpos[7:] = q_default

    kd_val = float(kv.get("kd", 2.0))
    kp = jnp.full((eng.nd,), kp_val)
    kd = jnp.full((eng.nd,), kd_val)

    # waist_yaw target trajectory @200 Hz: settle 150, ramp `ramp`, hold 40,
    # return `ramp`, settle 100  (the default swing mirrors side_kick's
    # ~0.4 s torso rotation, lockstep argmax window)
    T_RAMP = int(kv.get("ramp", 80))
    T_SETTLE, T_HOLD, T_RET, T_END = 150, 40, T_RAMP, 100
    T = T_SETTLE + T_RAMP + T_HOLD + T_RET + T_END
    wy = np.zeros(T)
    t0 = T_SETTLE
    wy[t0:t0 + T_RAMP] = amp * np.linspace(0, 1, T_RAMP)
    wy[t0 + T_RAMP:t0 + T_RAMP + T_HOLD] = amp
    wy[t0 + T_RAMP + T_HOLD:t0 + T_RAMP + T_HOLD + T_RET] = amp * np.linspace(1, 0, T_RET)

    targets = np.tile(q_default, (T, 1))
    targets[:, WAIST_YAW] += wy

    tgt_dev = jnp.asarray(targets)

    @jax.jit
    def step(params, st, i):
        return eng.control_step(
            params, st,
            lambda s, k: kp * (tgt_dev[i] - s.dof_pos) - kd * s.dof_vel, 1)

    rows = []
    for i in range(T):
        st, _ = step(params, st, i)
        tau = kp_val * (targets[i] - d.qpos[7:]) - kd_val * d.qvel[6:]
        d.ctrl[:] = 0.0
        d.qfrc_applied[6:] = tau
        mujoco.mj_step(m, d)

        q_ours = np.asarray(st.root_quat)
        yaw_ours = yaw_of_xyzw(q_ours)
        yaw_mj = yaw_of_xyzw(d.qpos[3:7][[1, 2, 3, 0]])
        rows.append({"t": i, "target_wy": float(wy[i]),
                     "yaw_engine": yaw_ours, "yaw_mj": yaw_mj,
                     "wz_engine": float(np.asarray(st.root_ang_vel)[2]),
                     "wz_mj": float(d.qvel[5]),
                     "z_engine": float(np.asarray(st.root_pos)[2]),
                     "z_mj": float(d.qpos[2]),
                     "nc_engine": int((np.asarray(st.contact_forces)[:, 2] > 1.0).sum()),
                     "nc_mj": int(d.ncon)})
        if i % 50 == 49:
            r = rows[-1]
            print(f"t={i+1:4d} wy={r['target_wy']:+.2f} "
                  f"yaw eng={r['yaw_engine']:+.4f} mj={r['yaw_mj']:+.4f} "
                  f"gap={r['yaw_engine']-r['yaw_mj']:+.4f}")

    gaps = [abs(r["yaw_engine"] - r["yaw_mj"]) for r in rows]
    swing = rows[T_SETTLE:T_SETTLE + T_RAMP + T_HOLD + T_RET]
    peak_eng = max(abs(r["yaw_engine"]) for r in swing)
    peak_mj = max(abs(r["yaw_mj"]) for r in swing)
    settle = rows[T_SETTLE - 50:T_SETTLE]
    summary = {
        "amp": amp, "kp": kp_val, "solver_iters": iters, "contact_reg": reg,
        "mean_contacts_engine": float(np.mean([r["nc_engine"] for r in swing])),
        "mean_contacts_mj": float(np.mean([r["nc_mj"] for r in swing])),
        "settle_contacts_engine": float(np.mean([r["nc_engine"] for r in settle])),
        "settle_contacts_mj": float(np.mean([r["nc_mj"] for r in settle])),
        "settle_gap": max(gaps[:T_SETTLE]),
        "peak_root_yaw_engine": peak_eng,
        "peak_root_yaw_mj": peak_mj,
        "yaw_gap_max": max(gaps),
        "yaw_gap_final": gaps[-1],
        "final_z_engine": rows[-1]["z_engine"], "final_z_mj": rows[-1]["z_mj"],
        "trace": rows,
    }
    with open(out, "w") as f:
        json.dump(summary, f)
    print(f"\npeak |root yaw| during swing: engine {peak_eng:.4f} rad, "
          f"MuJoCo {peak_mj:.4f} rad "
          f"(ratio {peak_eng / max(peak_mj, 1e-9):.2f}x)")
    print(f"max yaw gap {max(gaps):.4f} rad; settle-phase gap "
          f"{summary['settle_gap']:.5f} rad; wrote {out}")


if __name__ == "__main__":
    main()
