"""KungfuBot2 stack: general-tracking env + PPOMimic (29-DoF, multi-motion)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbhc_tpu.config.loader import compose

CFG_DIR = "/root/repo/pbhc_tpu/config"


@pytest.fixture(scope="module")
def multi_motion(tmp_path_factory):
    from pbhc_tpu.motion.package import merge

    out = tmp_path_factory.mktemp("motions") / "multi.pkl"
    merge(out, ["/root/repo/assets/motions/Horse-stance_pose.pkl",
                "/root/repo/assets/motions/Hooks_punch.pkl"])
    return str(out)


@pytest.fixture(scope="module")
def env(multi_motion):
    from pbhc_tpu.envs.general_tracking_env import GeneralTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=general_tracking", "robot=g1_29dof", "obs=general_tracking_teacher",
         "rewards=general_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=4", f"robot.motion.motion_file={multi_motion}",
         "algo.config.num_steps_per_env=4", "algo.config.num_mini_batches=2",
         "algo.config.num_learning_epochs=1"],
    )
    return GeneralTrackingEnv(cfg, 4, jax.random.PRNGKey(0)), cfg


def test_obs_dims(env):
    env, cfg = env
    # 20 future steps x (1+2+3+1+29+33) = 1380; 10 hist steps x 92 = 920
    assert env.obs_dim("future_motion_targets") == 1380
    assert env.obs_dim("prop_history") == 920
    assert env.obs_dim("priv_obs") == 66
    assert env.motion_lib.num_unique == 2
    assert env.nd == 29


def test_step_and_future_targets(env):
    env, cfg = env
    state = env.init_state(jax.random.PRNGKey(1))
    obs, hist = env._compute_observations(state, jax.random.PRNGKey(2))
    state = dataclasses.replace(state, history=hist)
    step = jax.jit(env.step)
    for i in range(3):
        state, obs, rew, done, info = step(state, 0.05 * jax.random.normal(jax.random.PRNGKey(i), (4, 29)))
    assert rew.shape == (4, 1)  # use_vec_reward: false -> scalar reward
    for k, v in obs.items():
        assert bool(jnp.isfinite(v).all()), k
    # future targets step-major: first step's dof block should be close to the
    # near-future reference (sanity: finite and bounded)
    assert obs["future_motion_targets"].shape == (4, 1380)


def test_multi_motion_resampling(env):
    env, cfg = env
    state = env.init_state(jax.random.PRNGKey(3))
    # force everyone to reset many times; ids should cover both motions
    ids = []
    key = jax.random.PRNGKey(4)
    for i in range(6):
        key, k = jax.random.split(key)
        state = env._reset_envs(state, jnp.ones(4, bool), k)
        ids.append(np.asarray(state.motion_ids))
    ids = np.concatenate(ids)
    assert set(ids.tolist()) == {0, 1}


@pytest.mark.slow
def test_ppo_mimic_modes(env):
    env, cfg = env
    from pbhc_tpu.agents.ppo_mimic import PPOMimic

    algo = PPOMimic(cfg, env)
    ts = algo.init_train_state(jax.random.PRNGKey(5))
    # it=0 is a hist_encoding iteration (reference learn_RL: it % freq == 0):
    # RL update + DAgger pass on the same rollout
    ts, log = algo.train_iteration(ts)
    assert np.isfinite(float(log["Loss/priv_reg"]))
    assert np.isfinite(float(log["Loss/hist_latent"]))
    # it=1 is plain RL: no DAgger pass
    ts, log = algo.train_iteration(ts)
    assert "Loss/hist_latent" not in log
    # the standalone DAgger iteration only moves history-encoder params
    import flax

    p_before = jax.device_get(ts.params)
    ts, log = algo.dagger_iteration(ts)
    assert np.isfinite(float(log["Loss/hist_latent"]))
    flat_b = flax.traverse_util.flatten_dict(p_before)
    flat_a = flax.traverse_util.flatten_dict(jax.device_get(ts.params))
    for k in flat_b:
        moved = np.abs(flat_a[k] - flat_b[k]).max() > 0
        is_hist = any("history_encoder" in str(p) for p in k)
        if moved:
            assert is_hist, k


def test_moe_backbone_unit():
    from pbhc_tpu.agents.networks import MoEMLP

    net = MoEMLP((16, 16), 5, num_experts=3, top_k=2, activation="ELU")
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 7))
    params = net.init(jax.random.PRNGKey(1), x)
    y, inter = net.apply(params, x, mutable=["intermediates"])
    assert y.shape == (32, 5)
    (lb,) = jax.tree_util.tree_leaves(inter)
    # Switch load-balance loss: 1.0 at perfect balance, <= num_experts
    assert 0.9 <= float(lb) <= 3.0
    # sow into a non-mutable collection must be a silent no-op (rollout path)
    y2 = net.apply(params, x)
    assert bool(jnp.allclose(y, y2))


@pytest.mark.slow
def test_moe_ppo_mimic(env, multi_motion):
    from pbhc_tpu.agents.ppo_mimic import PPOMimic

    env_obj, _ = env
    cfg = compose(
        CFG_DIR,
        ["exp=general_tracking", "robot=g1_29dof", "obs=general_tracking_teacher",
         "rewards=general_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=4", f"robot.motion.motion_file={multi_motion}",
         "algo.config.num_steps_per_env=4", "algo.config.num_mini_batches=2",
         "algo.config.num_learning_epochs=1",
         "algo.config.module_dict.actor.layer_config.type=MoEMLP",
         "algo.config.module_dict.actor.layer_config.num_experts=3",
         "algo.config.module_dict.actor.layer_config.top_k=2",
         "algo.config.module_dict.critic.layer_config.type=MoEMLP"],
    )
    algo = PPOMimic(cfg, env_obj)
    assert algo.use_moe and algo.actor_type == "MoEMLP"
    ts = algo.init_train_state(jax.random.PRNGKey(7))
    ts, log = algo.train_iteration(ts)
    assert np.isfinite(float(log["Loss/surrogate"]))
    assert np.isfinite(float(log["Loss/value"]))


def test_adaptive_motion_sampling(multi_motion):
    from pbhc_tpu.envs.general_tracking_env import GeneralTrackingEnv

    cfg = compose(
        CFG_DIR,
        ["exp=general_tracking", "robot=g1_29dof", "obs=general_tracking_teacher",
         "rewards=general_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=4", f"robot.motion.motion_file={multi_motion}",
         "env.config.adaptive_motion_sampling.enabled=true",
         "env.config.adaptive_motion_sampling.gamma=0.5"],
    )
    env = GeneralTrackingEnv(cfg, 4, jax.random.PRNGKey(0))
    state = env.init_state(jax.random.PRNGKey(1))
    assert state.motion_fail_ema.shape == (2,)
    step = jax.jit(env.step)
    # drive hard into failure: large constant actions topple the robot
    saw_fail = False
    for i in range(40):
        state, obs, rew, done, info = step(state, jnp.full((4, 29), 5.0))
        if float(state.motion_fail_ema.max()) > 0:
            saw_fail = True
            break
    assert saw_fail, "failure EMA never updated despite forced terminations"
    ema = np.asarray(state.motion_fail_ema)
    assert (ema >= 0).all() and (ema <= 1).all()
    # resampling still covers both motions (uniform_mix floor)
    ids = []
    key = jax.random.PRNGKey(2)
    for _ in range(6):
        key, k = jax.random.split(key)
        state = env._reset_envs(state, jnp.ones(4, bool), k)
        ids.append(np.asarray(state.motion_ids))
    assert set(np.concatenate(ids).tolist()) == {0, 1}


@pytest.mark.slow
def test_distill_mode(env):
    env, cfg = env
    from pbhc_tpu.agents.ppo_mimic import PPOMimic
    from pbhc_tpu.agents.mimic_networks import MimicActorCritic

    # frozen "teacher" = another randomly-initialized net acting deterministically
    teacher_algo = PPOMimic(cfg, env)
    t_params = teacher_algo.net.init(jax.random.PRNGKey(9), teacher_algo._dummy_obs())

    def teacher_apply(params, obs):
        mean, _ = teacher_algo.net.apply(params, obs, False, method=MimicActorCritic.act)
        return mean

    algo = PPOMimic(cfg, env, teacher=(teacher_apply, t_params))
    algo.dagger_only = True
    ts = algo.init_train_state(jax.random.PRNGKey(6))

    # the student inherits the teacher's history encoder at init (reference
    # ppo_mimic.py:176) ...
    import flax

    def hist_subtree(p):
        return {k: v for k, v in flax.traverse_util.flatten_dict(jax.device_get(p)).items()
                if any("history_encoder" in str(x) for x in k)}

    t_hist = hist_subtree(t_params)
    s_hist = hist_subtree(ts.params)
    assert t_hist and all(np.array_equal(s_hist[k], t_hist[k]) for k in t_hist)

    ts, log = algo.train_iteration(ts)
    bc0 = float(log["Loss/bc"])
    for _ in range(3):
        ts, log = algo.train_iteration(ts)
    assert float(log["Loss/bc"]) < bc0  # student moves toward the teacher
    # ... and it stays FROZEN through BC updates (ppo_mimic.py:177-178)
    s_hist_after = hist_subtree(ts.params)
    assert all(np.array_equal(s_hist_after[k], t_hist[k]) for k in t_hist)


@pytest.mark.slow
def test_distill_teacher_obs_remap(multi_motion, tmp_path):
    """Student training with a teacher whose obs layout DIFFERS: the student
    env gains teacher_actor_obs / teacher_future_motion_targets groups and the
    teacher net is built from the teacher's own config (reference
    ppo_mimic.py:121-161 _preprocess_teacher_config)."""
    import json
    import pickle

    import yaml

    from pbhc_tpu.agents.ppo_mimic import PPOMimic, build_mimic_net
    from pbhc_tpu.envs.general_tracking_env import GeneralTrackingEnv

    common = ["exp=general_tracking", "robot=g1_29dof",
              "rewards=general_tracking", "domain_rand=main", "simulator=tpu"]
    tiny = ["num_envs=2", f"robot.motion.motion_file={multi_motion}",
            "algo.config.num_steps_per_env=2", "algo.config.num_mini_batches=1",
            "algo.config.num_learning_epochs=1"]

    # fabricate a teacher run dir: random-init params + config snapshot
    t_cfg = compose(CFG_DIR, common + ["obs=general_tracking_teacher"], tiny)
    t_env = GeneralTrackingEnv(t_cfg, 2, jax.random.PRNGKey(0))
    t_algo = PPOMimic(t_cfg, t_env)
    t_params = t_algo.net.init(jax.random.PRNGKey(9), t_algo._dummy_obs())
    run = tmp_path / "teacher_run"
    (run / "ckpt").mkdir(parents=True)
    with open(run / "ckpt" / "model_1.pkl", "wb") as f:
        pickle.dump({"params": t_params, "iteration": 1, "lr": 1e-3}, f)
    (run / "config.yaml").write_text(yaml.safe_dump(json.loads(json.dumps(t_cfg))))

    # student env has a different actor_obs / future-target layout
    from pbhc_tpu.train import main as train_main

    ts = train_main(common + ["obs=general_tracking_student"] + tiny + [
        f"algo.config.teacher_model_path={run / 'ckpt' / 'model_1.pkl'}",
        "algo.config.dagger_only=true",
        "algo.config.num_learning_iterations=1",
        "algo.config.save_interval=10",
        f"base_dir={tmp_path / 'logs'}",
        f"artifact_dir={tmp_path / 'artifacts'}",
        "multichip=false",
        "experiment_name=distill_remap"])
    assert int(ts.iteration) == 1
