"""Native (C++) deploy inference core vs the numpy policy executor."""
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def npz_policy(tmp_path_factory):
    from pbhc_tpu.agents.networks import GaussianActor
    from pbhc_tpu.deploy.export import NumpyPolicy
    import json

    obs_dim, num_act = 380, 23
    actor = GaussianActor((512, 256, 128), num_act, 0.8, "ELU")
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    p = params["params"]["MLP_0"]
    arrays, i = {}, 0
    while f"Dense_{i}" in p:
        arrays[f"w{i}"] = np.asarray(p[f"Dense_{i}"]["kernel"])
        arrays[f"b{i}"] = np.asarray(p[f"Dense_{i}"]["bias"])
        i += 1
    meta = {"n_layers": i, "activation": "ELU", "num_actions": num_act, "obs_dim": obs_dim}
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    path = tmp_path_factory.mktemp("native") / "p.npz"
    np.savez(path, **arrays)
    return path, NumpyPolicy(path)


def test_native_matches_numpy(npz_policy):
    path, ref = npz_policy
    native = pytest.importorskip("pbhc_tpu.deploy.native").NativePolicy(path)
    rng = np.random.default_rng(0)
    obs = rng.normal(0, 1, (16, ref.meta["obs_dim"])).astype(np.float32)
    np.testing.assert_allclose(native(obs), ref(obs), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(native(obs[0]), ref(obs[0]), rtol=1e-5, atol=1e-5)


def test_native_latency_budget(npz_policy):
    """One 50 Hz control tick has a 20 ms budget; the native forward must be
    far under it (deterministic-latency requirement of the real-robot loop)."""
    path, ref = npz_policy
    native = pytest.importorskip("pbhc_tpu.deploy.native").NativePolicy(path)
    obs = np.zeros(ref.meta["obs_dim"], dtype=np.float32)
    native(obs)
    t0 = time.perf_counter()
    n = 200
    for _ in range(n):
        native(obs)
    per_call = (time.perf_counter() - t0) / n
    assert per_call < 2e-3, f"native inference too slow: {per_call*1e3:.2f} ms"


@pytest.fixture(scope="module")
def student_onnx(tmp_path_factory):
    """Tiny 3-input student export (Conv encoders + LayerNorm + SiLU + Concat)
    through the in-repo ONNX writer — the full deployable op set."""
    from pbhc_tpu.agents.mimic_networks import MimicActorCritic
    from pbhc_tpu.deploy.onnx_export import export_mimic_onnx

    dims = dict(obs=40, future_steps=20, future_per_step=6,
                history_steps=10, history_per_step=8)
    net = MimicActorCritic(
        actor_hidden=(64, 32), critic_hidden=(64,), num_actions=5, num_values=3,
        future_steps=dims["future_steps"], future_per_step=dims["future_per_step"],
        history_steps=dims["history_steps"], history_per_step=dims["history_per_step"])
    obs_dict = {
        "actor_obs": jnp.zeros((1, dims["obs"])),
        "future_motion_targets": jnp.zeros((1, dims["future_steps"] * dims["future_per_step"])),
        "prop_history": jnp.zeros((1, dims["history_steps"] * dims["history_per_step"])),
        "priv_obs": jnp.zeros((1, 11)),
    }
    params = net.init(jax.random.PRNGKey(0), obs_dict)
    path = export_mimic_onnx(net, params,
                             tmp_path_factory.mktemp("nx") / "student.onnx",
                             obs_dim=dims["obs"])
    return path, net, params, dims


def test_native_onnx_student_matches_flax(student_onnx):
    """The native strided-tensor VM (onnx_exec.cpp) runs the student graph
    bit-comparably to both the numpy executor and the flax net."""
    from pbhc_tpu.agents.mimic_networks import MimicActorCritic
    from pbhc_tpu.deploy.native.onnx_exec import NativeOnnxPolicy
    from pbhc_tpu.deploy.onnx_numpy import OnnxPolicy

    path, net, params, dims = student_onnx
    nat = NativeOnnxPolicy(path)        # plan-time self-check runs here too
    ref = OnnxPolicy(path)
    k = jax.random.PRNGKey(3)
    feeds = {
        "actor_obs": np.asarray(jax.random.normal(k, (1, dims["obs"]))),
        "future_motion_targets": np.asarray(jax.random.normal(
            k, (1, dims["future_steps"] * dims["future_per_step"]))),
        "prop_history": np.asarray(jax.random.normal(
            k, (1, dims["history_steps"] * dims["history_per_step"]))),
    }
    out_nat = nat.run(feeds)[0]
    out_np = ref.run(feeds)[0]
    np.testing.assert_allclose(out_nat, out_np, rtol=2e-5, atol=2e-5)
    mean, _ = net.apply(params, {**{k_: jnp.asarray(v) for k_, v in feeds.items()},
                                 "priv_obs": jnp.zeros((1, 11))},
                        True, method=MimicActorCritic.act)
    np.testing.assert_allclose(out_nat, np.asarray(mean), rtol=2e-4, atol=2e-5)


def test_native_onnx_actor_and_latency(student_onnx):
    """Actor-only ONNX runs natively; a student tick stays far inside the
    50 Hz budget."""
    from pbhc_tpu.agents.networks import GaussianActor
    from pbhc_tpu.deploy.native.onnx_exec import NativeOnnxPolicy
    from pbhc_tpu.deploy.onnx_export import export_actor_onnx
    from pbhc_tpu.deploy.onnx_numpy import OnnxPolicy

    path, _, _, dims = student_onnx
    nat = NativeOnnxPolicy(path)
    feeds = {
        "actor_obs": np.zeros((1, dims["obs"]), np.float32),
        "future_motion_targets": np.zeros(
            (1, dims["future_steps"] * dims["future_per_step"]), np.float32),
        "prop_history": np.zeros(
            (1, dims["history_steps"] * dims["history_per_step"]), np.float32),
    }
    nat.run(feeds)
    t0 = time.perf_counter()
    for _ in range(100):
        nat.run(feeds)
    per_tick = (time.perf_counter() - t0) / 100
    assert per_tick < 5e-3, f"native student tick too slow: {per_tick*1e3:.2f} ms"

    import tempfile
    actor = GaussianActor((32, 16), 4, 0.8, "ELU")
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, 12)))
    with tempfile.TemporaryDirectory() as d:
        p = export_actor_onnx(actor, params, 12, f"{d}/a.onnx")
        n2, r2 = NativeOnnxPolicy(p), OnnxPolicy(p)
        obs = np.random.default_rng(0).standard_normal(12).astype(np.float32)
        np.testing.assert_allclose(n2(obs), r2(obs), rtol=2e-5, atol=2e-5)
