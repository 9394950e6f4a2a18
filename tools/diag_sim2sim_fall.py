"""Closed-loop fall diagnosis for a distilled student policy: roll the SAME
policy through (a) the MuJoCo deploy pathway (3-input ONNX, 50 Hz loopback
controller) and (b) the TPU engine (flax checkpoint, env step), and print a
per-tick timeline of root z / roll / pitch / max joint-tracking error plus a
per-joint error ranking.

Localizes sim2sim transfer failures: if (b) completes while (a) falls, the gap
is dynamics (see tools/lockstep_policy.py to localize WHICH dynamics); if both
show the same drift, the policy itself is undertrained.

Usage:
    python tools/diag_sim2sim_fall.py checkpoint=<ckpt> onnx=<student.onnx>
    python tools/diag_sim2sim_fall.py checkpoint=<ckpt>          # engine only

(reference analog: the mujoco.py sim2sim validation loop + genesis_mjdebug's
cross-engine comparison idiom, reference deploy/mujoco.py:480-528)
"""
import dataclasses
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def _roll_pitch(quat_xyzw):
    x, y, z, w = quat_xyzw
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    return roll, pitch


def _print_timeline(name, rows):
    print(f"--- {name} ---")
    for t, z, roll, pitch, dq in rows:
        if (t < 120 and t % 8 == 0) or (t >= 120 and t % 50 == 0):
            print(f"t={t:4d} ({t * 0.02:5.2f}s) z={z:.3f} roll={roll:+.3f} "
                  f"pitch={pitch:+.3f} max|dq-ref|={dq:.3f}")
    fall = next((t for t, z, *_ in rows if z < 0.35), None)
    print(f"first z<0.35 tick: {fall}" + (f" ({fall * 0.02:.2f}s)" if fall else ""))
    dqs = np.array([r[4] for r in rows])
    print(f"max|dq-ref| mean {dqs.mean():.3f}  p90 {np.percentile(dqs, 90):.3f}")


def engine_rollout(ckpt):
    from pbhc_tpu.eval.batch_eval import _load
    from pbhc_tpu.motion.motion_lib import get_motion_state

    env, algo, payload = _load(ckpt, 1, ())
    actor_params = payload.get("actor_params") or payload.get("params")
    state = env.init_state(jax.random.PRNGKey(1))
    state = env.reset_to_start(state, jax.random.PRNGKey(1))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
    state = dataclasses.replace(state, history=hist)
    step = jax.jit(env.step)

    if hasattr(algo, "actor"):
        act = jax.jit(lambda o: algo.actor.apply(actor_params, o["actor_obs"])[0])
    else:
        from pbhc_tpu.agents.mimic_networks import MimicActorCritic

        act = jax.jit(lambda o: algo.net.apply(actor_params, o, True,
                                               method=MimicActorCritic.act)[0])

    n = int(float(env.motion_lib.data.lengths[0]) / env.dt)
    times = jnp.asarray(np.arange(n) * env.dt)
    mres = get_motion_state(env.motion_lib.data, jnp.zeros(n, jnp.int32), times)
    ref_dof = np.asarray(mres["dof_pos"]).reshape(n, -1)

    rows, dq_all = [], []
    for t in range(n):
        state, obs, rew, done, info = step(state, act(obs))
        rq = np.asarray(state.sim.root_quat)[0]
        q = np.asarray(state.sim.dof_pos)[0]
        roll, pitch = _roll_pitch(rq)
        dq = np.abs(q - ref_dof[t])
        rows.append((t, float(np.asarray(state.sim.root_pos)[0][2]), roll, pitch,
                     float(dq.max())))
        dq_all.append(dq)
    _print_timeline("engine (flax policy, DR+noise per run config)", rows)
    names = env.sim_model.dof_names
    per_joint = np.stack(dq_all).mean(0)
    for i in np.argsort(per_joint)[::-1][:6]:
        print(f"  {names[i]:32s} mean|dq-ref| {per_joint[i]:.3f}")


def mujoco_rollout(onnx):
    from pbhc_tpu.deploy.export import StudentPolicy
    from pbhc_tpu.deploy.mujoco_runtime import MujocoDeployRobot
    from pbhc_tpu.deploy.real_robot import LoopbackTransport, RealRobotController
    from pbhc_tpu.model.g1 import load_g1_motion_model
    from pbhc_tpu.motion.motion_lib import MotionLib, get_motion_state

    policy = StudentPolicy(onnx)
    mf = policy.meta["motion_file"]
    rt = policy.meta.get("robot_type", "g1_23dof_lock_wrist")
    sim = MujocoDeployRobot(policy, mf, robot_type=rt)
    sim.reset()
    ctrl = RealRobotController(onnx, LoopbackTransport(sim), motion_file=mf,
                               compensate_offsets=False)
    ctrl.mode = ctrl.POLICY

    model = load_g1_motion_model(rt)
    ml = MotionLib(mf, model, num_envs=1, step_dt=ctrl.ctrl_dt)
    n = int(float(sim.motion.data.lengths[0]) / ctrl.ctrl_dt)
    times = jnp.asarray(np.arange(n) * ctrl.ctrl_dt)
    mres = get_motion_state(ml.data, jnp.zeros(n, jnp.int32), times)
    ref_dof = np.asarray(mres["dof_pos"]).reshape(n, -1)

    rows = []
    for t in range(n):
        ctrl.step()
        roll, pitch = _roll_pitch(sim.base_quat_xyzw)
        rows.append((t, float(sim.d.qpos[2]), roll, pitch,
                     float(np.abs(sim.q - ref_dof[t]).max())))
    _print_timeline("mujoco (ONNX student, deploy controller)", rows)


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    if "onnx" in kv:
        mujoco_rollout(kv["onnx"])
    engine_rollout(kv["checkpoint"])


if __name__ == "__main__":
    main()
