"""Orbax checkpoint round-trip + auto_load_latest (reference
train_agent.py:102-104, config/base.yaml:16)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def test_roundtrip_optax_structure(tmp_path):
    from pbhc_tpu.utils.checkpoint import (load_checkpoint_payload,
                                           save_checkpoint_payload)

    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros(2)}
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.inject_hyperparams(optax.adam)(learning_rate=1e-3))
    opt = tx.init(params)
    payload = {"iteration": 7, "lr": 2e-3,
               "params": jax.device_get(params), "opt": jax.device_get(opt)}
    p = save_checkpoint_payload(tmp_path / "model_7", payload)

    r = load_checkpoint_payload(p, target={"params": params, "opt": opt})
    assert r["iteration"] == 7 and r["lr"] == pytest.approx(2e-3)
    np.testing.assert_array_equal(r["params"]["w"], np.ones((3, 2)))
    # restored optimizer state must be structurally valid for tx.update
    grads = jax.tree.map(jnp.zeros_like, params)
    tx.update(grads, jax.tree.map(jnp.asarray, r["opt"]), params)


def test_legacy_pickle_load(tmp_path):
    import pickle

    from pbhc_tpu.utils.checkpoint import load_checkpoint_payload

    p = tmp_path / "model_3.pkl"
    with open(p, "wb") as f:
        pickle.dump({"iteration": 3, "params": {"w": np.ones(2)}}, f)
    r = load_checkpoint_payload(p)
    assert r["iteration"] == 3


@pytest.mark.slow
def test_artifact_mirror_disaster_recovery(tmp_path):
    """The round-2 failure mode: a finished run's logs/ tree dies with the
    VM. Training must mirror params into the tracked artifact dir (with the
    run config), and auto_load_latest must resume from the mirror when logs/
    is gone (warm restart, fresh optimizer)."""
    import shutil

    from pbhc_tpu.train import main as train_main

    args = ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
            "rewards=motion_tracking", "domain_rand=off", "simulator=tpu",
            "num_envs=2", "multichip=false",
            "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl",
            "algo.config.num_steps_per_env=2", "algo.config.num_mini_batches=1",
            "algo.config.num_learning_epochs=1", "algo.config.save_interval=10",
            f"base_dir={tmp_path / 'logs'}",
            f"artifact_dir={tmp_path / 'artifacts'}",
            "experiment_name=dr_smoke", "seed=0"]
    train_main(args + ["algo.config.num_learning_iterations=2"])
    art = tmp_path / "artifacts" / "dr_smoke"
    assert (art / "ckpt" / "model_2.pkl").exists()
    assert (art / "config.yaml").exists()

    shutil.rmtree(tmp_path / "logs")  # the VM recycle
    ts = train_main(args + ["auto_load_latest=true", "total_iterations=3",
                            "algo.config.num_learning_iterations=3"])
    # resumed from the mirror (iteration carried over), ran only the remainder
    assert int(ts.iteration) == 3


def test_latest_checkpoint(tmp_path):
    from pbhc_tpu.utils.checkpoint import (latest_checkpoint,
                                           save_checkpoint_payload)

    for run, its in [("20260101-expA-task", [100, 300]),
                     ("20260102-expB-task", [200])]:
        for it in its:
            save_checkpoint_payload(
                tmp_path / run / "ckpt" / f"model_{it}", {"iteration": it})
    assert latest_checkpoint(tmp_path).name == "model_300"
    assert latest_checkpoint(tmp_path, experiment_name="expB").name == "model_200"
    assert latest_checkpoint(tmp_path / "nothing" ) is None


def test_pytest_runs_never_mirror_into_tracked_artifacts():
    """Regression (round-3 repo pollution): a training run launched from a
    test without an explicit artifact_dir must mirror to the system tmpdir,
    not the tracked artifacts/ tree."""
    import tempfile
    from pathlib import Path

    from pbhc_tpu.config.loader import Cfg
    from pbhc_tpu.train import resolve_artifact_dir

    got = resolve_artifact_dir(Cfg({"experiment_name": "exp_x"}))
    assert got == Path(tempfile.gettempdir()) / "pbhc_pytest_artifacts" / "exp_x"

    # an explicit artifact_dir (what tests that assert on mirrors pass) wins
    got = resolve_artifact_dir(
        Cfg({"experiment_name": "exp_x", "artifact_dir": "/tmp/somewhere"}))
    assert got == Path("/tmp/somewhere/exp_x")
