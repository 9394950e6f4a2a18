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
