"""Metrics library + policy export + MuJoCo deploy runtime tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbhc_tpu.eval.metrics import eval_accuracy, eval_smoothness, episode_length_ratio


def test_metrics_zero_error_on_identical_traj():
    T, B, nd = 50, 27, 23
    rng = np.random.default_rng(0)
    traj = {
        "body_pos": rng.normal(size=(T, B, 3)),
        "body_rot": rng.normal(size=(T, B, 4)),
        "dof_pos": rng.normal(size=(T, nd)),
        "root_pos": rng.normal(size=(T, 3)),
        "contact_mask": rng.integers(0, 2, size=(T, 2)).astype(float),
    }
    acc = eval_accuracy(traj, traj, 0.02)
    for k, v in acc.items():
        # every accuracy metric (incl. E_contact_acc, a mean-abs ERROR per
        # reference measure_traj.py:194-195) is 0 on an identical trajectory
        assert abs(v) < 1e-6, (k, v)
    sm = eval_smoothness(traj, 0.02, ref=traj)
    assert all(np.isfinite(v) for v in sm.values())
    # ref anchors of an identical traj equal the policy values
    for key in ("vel", "acc", "jerk", "dof_vel", "dof_acc", "dof_jerk"):
        assert sm[f"L2_{key}"] == pytest.approx(sm[f"L2_ref_{key}"])
    assert episode_length_ratio([50, 100], [2.0, 2.0], 0.02) == pytest.approx(0.75)


def test_metrics_known_offset():
    T, B = 10, 5
    traj = {"body_pos": np.zeros((T, B, 3)), "body_rot": np.zeros((T, B, 4)),
            "dof_pos": np.zeros((T, 3)), "root_pos": np.zeros((T, 3))}
    ref = {k: v + 0.01 for k, v in traj.items()}
    acc = eval_accuracy(traj, ref, 0.02)
    assert acc["E_gmpbpe"] == pytest.approx(0.01 * np.sqrt(3) * 1000, rel=1e-5)
    assert acc["E_mpbpe"] == pytest.approx(0.0, abs=1e-6)  # offset cancels root-relative


def test_metrics_match_reference_harness_formulas():
    """Hand-computed reference semantics (measure_traj.py:145-222 called as
    ratio_eps.py:69 does: delta_per_frame=True then x1e3): dof families use
    the L2 norm over the WHOLE dof vector then mean over time; finite
    differences are per-frame (no dt scaling); everything x1e3."""
    rng = np.random.default_rng(7)
    T, B, nd = 12, 4, 5
    traj = {"body_pos": rng.normal(size=(T, B, 3)), "dof_pos": rng.normal(size=(T, nd)),
            "contact_mask": rng.uniform(size=(T, 2))}
    ref = {"body_pos": rng.normal(size=(T, B, 3)), "dof_pos": rng.normal(size=(T, nd)),
           "contact_mask": rng.uniform(size=(T, 2))}
    acc = eval_accuracy(traj, ref, dt=0.02)  # dt must be ignored per-frame

    dof_err = np.linalg.norm(traj["dof_pos"] - ref["dof_pos"], axis=-1).mean() * 1e3
    assert acc["E_mpjpe"] == pytest.approx(dof_err, rel=1e-6)

    dv = np.diff(traj["dof_pos"], axis=0) - np.diff(ref["dof_pos"], axis=0)
    assert acc["E_mpjve"] == pytest.approx(
        np.linalg.norm(dv, axis=-1).mean() * 1e3, rel=1e-6)
    da = (np.diff(traj["dof_pos"], 2, axis=0) - np.diff(ref["dof_pos"], 2, axis=0))
    assert acc["E_mpjae"] == pytest.approx(
        np.linalg.norm(da, axis=-1).mean() * 1e3, rel=1e-6)

    bv = np.diff(traj["body_pos"], axis=0) - np.diff(ref["body_pos"], axis=0)
    assert acc["E_pbve"] == pytest.approx(
        np.linalg.norm(bv, axis=-1).mean() * 1e3, rel=1e-6)
    assert acc["E_root_vel"] == pytest.approx(
        np.linalg.norm(bv[:, 0], axis=-1).mean() * 1e3, rel=1e-6)
    assert acc["E_contact_acc"] == pytest.approx(
        np.abs(traj["contact_mask"] - ref["contact_mask"]).mean() * 1e3, rel=1e-6)

    sm = eval_smoothness(traj, dt=0.02)
    assert sm["L2_dof_jerk"] == pytest.approx(
        np.linalg.norm(np.diff(traj["dof_pos"], 3, axis=0), axis=-1).mean() * 1e3,
        rel=1e-6)


@pytest.fixture(scope="module")
def exported_policy(tmp_path_factory):
    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.deploy.export import export_policy
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=2",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl"],
    )
    env = MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    params = algo.actor.init(jax.random.PRNGKey(1), jnp.zeros((1, algo.actor_dim)))
    path = tmp_path_factory.mktemp("export") / "policy.npz"
    export_policy(params, env, path)
    return path, env, algo, params


def test_numpy_policy_matches_flax(exported_policy):
    from pbhc_tpu.deploy.export import NumpyPolicy

    path, env, algo, params = exported_policy
    pol = NumpyPolicy(path)
    obs = np.random.default_rng(2).normal(size=(380,)).astype(np.float32)
    mean, _ = algo.actor.apply(params, jnp.asarray(obs))
    got = pol(obs)
    np.testing.assert_allclose(got, np.asarray(mean), atol=1e-4)
    assert pol.meta["num_actions"] == 23
    assert pol.meta["obs_dim"] == 380


def test_mujoco_deploy_runtime(exported_policy):
    from pbhc_tpu.deploy.mujoco_runtime import MujocoDeployRobot

    path, env, algo, params = exported_policy
    robot = MujocoDeployRobot(path, "/root/repo/assets/motions/Horse-stance_pose.pkl")
    robot.reset()
    z0 = robot.d.qpos[2]
    assert 0.3 < z0 < 1.2  # reset pose comes from the motion first frame
    for _ in range(10):  # 0.2 s with an untrained policy: should not explode
        robot.control_step()
    assert np.isfinite(robot.d.qpos).all()
    assert robot.t == pytest.approx(10 * robot.ctrl_dt)
    # obs builder layout: full actor obs dim
    obs = robot.obs_builder.build(robot)
    assert obs.shape == (380,)


def test_teleop_source_roundtrip():
    import time

    import numpy as np

    from pbhc_tpu.deploy.teleop import TeleopSource

    src = TeleopSource(port=19871).start()
    try:
        coords = np.arange(9, dtype=np.float64).reshape(3, 3)
        for _ in range(20):
            TeleopSource.send(coords, port=19871)
            time.sleep(0.05)
            if np.allclose(src.coords, coords):
                break
        assert np.allclose(src.coords, coords)
    finally:
        src.stop()


def test_eval_callbacks(tmp_path, ref_motion_path):
    """RLEvalCallback hook interface (reference base_callback.py:4-20):
    plot/force callbacks stream to a logger; open-loop replay overrides the
    policy actions with the clip's recorded ones."""
    import joblib
    import jax
    import jax.numpy as jnp
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv
    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.eval.callbacks import (
        AnalysisPlotCallback, ForcePlotCallback, OpenLoopReplayCallback)
    from pbhc_tpu.eval_agent import rollout_jax

    # clip with recorded actions (reference rollout-dump schema)
    raw = joblib.load(ref_motion_path)
    key0 = next(iter(raw.keys()))
    clip = dict(raw[key0])
    clip["action"] = 0.05 * np.ones((clip["pose_aa"].shape[0], 23), np.float32)
    mf = str(tmp_path / "with_actions.pkl")
    joblib.dump({key0: clip}, mf)

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=off", "simulator=tpu"],
        ["num_envs=2", f"robot.motion.motion_file={mf}"],
    )
    env = MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    params = algo.actor.init(jax.random.PRNGKey(0), jnp.zeros((1, algo.actor_dim)))

    class StubDash:
        def __init__(self):
            self.rows = []

        def log_step(self, scalars):
            self.rows.append(scalars)

    dash = StubDash()
    cbs = [AnalysisPlotCallback(cfg, env, dash),
           ForcePlotCallback(cfg, env, dash),
           OpenLoopReplayCallback(cfg, env, motion_file=mf)]
    traj, ref, dones = rollout_jax(env, algo.actor, params, 3,
                                   jax.random.PRNGKey(1), callbacks=cbs)
    # open-loop: recorded actions (0.05) drove the env, not the random policy
    np.testing.assert_allclose(traj["action"], 0.05, atol=1e-6)
    # both logging callbacks fired each step
    assert len(dash.rows) == 2 * len(traj["action"])
    # analysis channels carry real per-step values (reference
    # analysis_plot_motion_tracking.py:25-313 dof/torque/root streams)
    plot_rows = [r for r in dash.rows if "root_z" in r]
    assert len(plot_rows) == len(traj["action"])
    for ch in ("root_z", "dof_pos_0", "action_0", "torque_norm"):
        vals = [r[ch] for r in plot_rows]
        assert all(np.isfinite(v) for v in vals), ch
    assert all(0.0 < r["root_z"] < 2.0 for r in plot_rows)          # standing-ish
    np.testing.assert_allclose([r["action_0"] for r in plot_rows], 0.05, atol=1e-6)
    # force channels: finite, and fz roughly supports the ~35 kg robot when in
    # contact (sum over bodies, single env)
    force_rows = [r for r in dash.rows if "contact_fz_total" in r]
    assert len(force_rows) == len(traj["action"])
    assert all(np.isfinite(r["contact_fz_total"]) and r["contact_f_max"] >= 0.0
               for r in force_rows)
    assert max(r["contact_fz_total"] for r in force_rows) > 50.0


def test_dashboard_http_roundtrip():
    """DashboardLogger serves the logged channels over HTTP (reference
    analysis_plot_motion_tracking.py Flask `/data` + page endpoints)."""
    import json
    import urllib.request

    from pbhc_tpu.eval.dashboard import DashboardLogger

    dash = DashboardLogger(port=18973)
    for t in range(5):
        dash.log_step({"rew/tracking": 0.1 * t, "err/joint": 1.0 - 0.1 * t})
    url = dash.start()
    try:
        data = json.loads(urllib.request.urlopen(url + "/data", timeout=5).read())
        assert data["rew/tracking"] == [0.0, 0.1, 0.2, 0.30000000000000004, 0.4]
        assert len(data["err/joint"]) == 5
        page = urllib.request.urlopen(url, timeout=5).read().decode()
        assert "canvas" in page and "/data" in page
        # history ring: capped at `history` samples
        small = DashboardLogger(port=18974, history=3)
        for t in range(10):
            small.log_step({"x": float(t)})
        assert small.snapshot()["x"] == [7.0, 8.0, 9.0]
    finally:
        dash.stop()
