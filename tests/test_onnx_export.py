"""Round-trip tests: ONNX export (protobuf writer) -> in-repo ONNX decoder.

Mirrors the reference's export surface (reference humanoidverse/utils/
inference_helpers.py:13-138): actor-only export and the 3-input
actor+encoder export used by the real-robot controller.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbhc_tpu.agents.networks import GaussianActor, PhaseAwareActor
from pbhc_tpu.agents.mimic_networks import MimicActorCritic
from pbhc_tpu.deploy.onnx_export import export_actor_onnx, export_mimic_onnx
from pbhc_tpu.deploy.onnx_numpy import OnnxPolicy


def test_actor_onnx_roundtrip(tmp_path):
    obs_dim, num_act = 33, 7
    actor = GaussianActor((64, 32), num_act, 0.8, "ELU")
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    path = export_actor_onnx(actor, params, obs_dim, tmp_path / "actor.onnx")

    pol = OnnxPolicy(path)
    assert pol.inputs == ["actor_obs"]
    obs = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (5, obs_dim)))
    mean, _ = actor.apply(params, jnp.asarray(obs))
    np.testing.assert_allclose(pol(obs), np.asarray(mean), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("embed_type", ["Sinusoidal", "Learnable"])
def test_phase_aware_actor_onnx(tmp_path, embed_type):
    obs_dim, num_act, pos = 21, 4, 9
    actor = PhaseAwareActor((32, 16), num_act, phase_pos=pos, activation="ELU",
                            embed_type=embed_type, embed_dim=8)
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    path = export_actor_onnx(actor, params, obs_dim, tmp_path / "pa.onnx")

    pol = OnnxPolicy(path)
    obs = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (3, obs_dim)))
    mean, _ = actor.apply(params, jnp.asarray(obs))
    np.testing.assert_allclose(pol(obs), np.asarray(mean), rtol=1e-5, atol=1e-5)


def test_mimic_student_onnx_roundtrip(tmp_path):
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
    path = export_mimic_onnx(net, params, tmp_path / "student.onnx", obs_dim=dims["obs"])

    pol = OnnxPolicy(path)
    assert pol.inputs == ["actor_obs", "future_motion_targets", "prop_history"]

    k = jax.random.PRNGKey(2)
    feeds = {
        "actor_obs": jax.random.normal(k, (4, dims["obs"])),
        "future_motion_targets": jax.random.normal(
            k, (4, dims["future_steps"] * dims["future_per_step"])),
        "prop_history": jax.random.normal(
            k, (4, dims["history_steps"] * dims["history_per_step"])),
    }
    # deployable path: actor mean with the history-encoder latent
    mean, _ = net.apply(params, {**feeds, "priv_obs": jnp.zeros((4, 11))},
                        True, method=MimicActorCritic.act)
    out = pol.run({k_: np.asarray(v) for k_, v in feeds.items()})[0]
    np.testing.assert_allclose(out, np.asarray(mean), rtol=2e-4, atol=2e-5)
