"""Teacher-student (KungfuBot2) network modules.

Flax twins of the reference modules (reference humanoidverse/agents/modules/
agent_modules.py + encoder_modules.py): Conv1d temporal encoders over the
future-target window (20 steps) and proprioceptive history (10 steps), a priv
MLP encoder, an MLP actor consuming [obs, motion_latent, hist-or-priv latent],
and an MLP critic on [obs, priv_obs, motion_latent]. Sigma is a clamped global
learnable (reference agent_modules.py:104-151).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pbhc_tpu.agents.networks import MLP, MoEMLP


def _make_backbone(kind: str, hidden_dims, out_dim, activation,
                   num_experts: int = 4, top_k: int = 2):
    """Backbone factory matching the reference's actor_type/critic_type seam
    (reference ppo_mimic.py:657-672 gates on "MoEMLP")."""
    if kind == "MoEMLP":
        return MoEMLP(tuple(hidden_dims), out_dim, num_experts, top_k, activation)
    assert kind == "MLP", f"unknown backbone type {kind!r}"
    return MLP(tuple(hidden_dims), out_dim, activation)

_CONV_PLANS = {  # reference encoder_modules.py:62-77
    5: dict(out_channels=[20, 10], kernels=[2, 2], strides=[1, 1]),
    10: dict(out_channels=[20, 10], kernels=[4, 2], strides=[2, 1]),
    20: dict(out_channels=[40, 20], kernels=[6, 4], strides=[2, 2]),
}


class ConvEncoder(nn.Module):
    """Per-step Linear -> Conv1d stack over time -> Linear head.

    Input is [N, tsteps * per_step_dim], STEP-MAJOR (our layout deviation from
    the reference's per-key flattening — see general_tracking_env docstring).
    """

    tsteps: int
    per_step_dim: int
    hidden_dim: int
    output_dim: int
    activation: str = "SiLU"

    @nn.compact
    def __call__(self, x):
        plan = _CONV_PLANS[self.tsteps]
        act = {"SiLU": nn.silu, "ELU": nn.elu, "ReLU": nn.relu}[self.activation]
        N = x.shape[0]
        x = x.reshape(N, self.tsteps, self.per_step_dim)
        x = nn.relu(nn.Dense(self.hidden_dim)(x))                   # per-step embed
        for ch, k, s in zip(plan["out_channels"], plan["kernels"], plan["strides"]):
            x = act(nn.Conv(ch, kernel_size=(k,), strides=(s,), padding="VALID")(x))
        x = x.reshape(N, -1)
        return nn.Dense(self.output_dim)(x)


class MimicActor(nn.Module):
    hidden_dims: Sequence[int]
    num_actions: int
    future_steps: int
    future_per_step: int
    history_steps: int
    history_per_step: int
    motion_latent: int = 128
    hist_latent: int = 64
    motion_hidden: int = 60
    history_hidden: int = 30
    priv_hidden: Sequence[int] = (64,)
    activation: str = "SiLU"
    use_layernorm: bool = True
    backbone_type: str = "MLP"
    num_experts: int = 4
    top_k: int = 2

    def setup(self):
        self.motion_encoder = ConvEncoder(self.future_steps, self.future_per_step,
                                          self.motion_hidden, self.motion_latent, self.activation)
        self.history_encoder = ConvEncoder(self.history_steps, self.history_per_step,
                                           self.history_hidden, self.hist_latent, self.activation)
        self.priv_encoder = MLP(tuple(self.priv_hidden), self.hist_latent, self.activation)
        self.backbone = _make_backbone(self.backbone_type, self.hidden_dims,
                                       self.num_actions, self.activation,
                                       self.num_experts, self.top_k)
        if self.use_layernorm:
            self.ln = nn.LayerNorm()

    def motion_encoding(self, future_targets):
        return self.motion_encoder(future_targets)

    def history_encoding(self, prop_history):
        return self.history_encoder(prop_history)

    def priv_encoding(self, priv_obs):
        return self.priv_encoder(priv_obs)

    def __call__(self, obs_dict, hist_encoding: bool):
        motion = self.motion_encoding(obs_dict["future_motion_targets"])
        latent = (self.history_encoding(obs_dict["prop_history"]) if hist_encoding
                  else self.priv_encoding(obs_dict["priv_obs"]))
        x = jnp.concatenate([obs_dict["actor_obs"], motion, latent], axis=-1)
        if self.use_layernorm:
            x = self.ln(x)
        return self.backbone(x)


class MimicActorCritic(nn.Module):
    """Actor + critic + clamped global sigma (reference ActorCritic)."""

    actor_hidden: Sequence[int]
    critic_hidden: Sequence[int]
    num_actions: int
    num_values: int
    future_steps: int
    future_per_step: int
    history_steps: int
    history_per_step: int
    init_noise_std: float = 1.0
    min_sigma: float = 0.2
    max_sigma: float = 1.2
    activation: str = "SiLU"
    actor_type: str = "MLP"
    critic_type: str = "MLP"
    num_experts: int = 4
    top_k: int = 2

    def setup(self):
        self.actor = MimicActor(self.actor_hidden, self.num_actions,
                                self.future_steps, self.future_per_step,
                                self.history_steps, self.history_per_step,
                                activation=self.activation,
                                backbone_type=self.actor_type,
                                num_experts=self.num_experts, top_k=self.top_k)
        self.critic = _make_backbone(self.critic_type, self.critic_hidden,
                                     self.num_values, self.activation,
                                     self.num_experts, self.top_k)
        self.critic_ln = nn.LayerNorm()
        self.std_param = self.param("std", lambda k: jnp.full((self.num_actions,), self.init_noise_std, dtype=jnp.float32))  # strong dtype: weak-typed params force a retrace of iteration 2

    def act(self, obs_dict, hist_encoding=False):
        mean = self.actor(obs_dict, hist_encoding)
        std = jnp.clip(jnp.abs(self.std_param), self.min_sigma, self.max_sigma)
        return mean, jnp.broadcast_to(std, mean.shape)

    def evaluate(self, obs_dict):
        motion = self.actor.motion_encoding(obs_dict["future_motion_targets"])
        x = jnp.concatenate([obs_dict["actor_obs"], obs_dict["priv_obs"], motion], axis=-1)
        return self.critic(self.critic_ln(x))

    def priv_latent(self, priv_obs):
        return self.actor.priv_encoding(priv_obs)

    def hist_latent(self, prop_history):
        return self.actor.history_encoding(prop_history)

    def __call__(self, obs_dict):
        # init path: touch every submodule
        mean, std = self.act(obs_dict, hist_encoding=False)
        _ = self.act(obs_dict, hist_encoding=True)
        v = self.evaluate(obs_dict)
        return mean, std, v
