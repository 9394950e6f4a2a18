"""Actor/critic networks (flax.linen).

Mirrors the reference modules (reference humanoidverse/agents/modules/
ppo_modules.py): MLP actor with a global learnable log-std Gaussian head, MLP
critic with one value head per reward term (multi-head, reference mh_ppo.py:108).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACT = {"ELU": nn.elu, "ReLU": nn.relu, "Tanh": nn.tanh, "SiLU": nn.silu, "GELU": nn.gelu}


class MLP(nn.Module):
    hidden_dims: Sequence[int]
    out_dim: int
    activation: str = "ELU"

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for h in self.hidden_dims:
            x = act(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class MoEMLP(nn.Module):
    """Dense-gated mixture-of-experts MLP.

    The reference gates on `actor_type/critic_type == "MoEMLP"` and calls
    `compute_load_balancing_loss()` (reference humanoidverse/agents/ppo/
    ppo_mimic.py:657-672) but ships no MoE module — this is the TPU-native
    realization. All experts evaluate as ONE stacked computation (expert axis
    lifted with nn.vmap → [E,in,h] weight tensors → a single batched einsum per
    layer), which keeps the MXU busy and avoids gather/scatter token routing —
    the right trade at PPO batch sizes where experts are tiny MLPs. Top-k
    softmax gating mixes expert outputs; the Switch-style load-balance aux loss
    E·Σ_e f_e·P_e is sown under `intermediates/load_balancing_loss` (collect
    with `mutable=["intermediates"]`).
    """

    hidden_dims: Sequence[int]
    out_dim: int
    num_experts: int = 4
    top_k: int = 2
    activation: str = "ELU"

    @nn.compact
    def __call__(self, x):
        E, K = self.num_experts, self.top_k
        Experts = nn.vmap(
            MLP, in_axes=None, out_axes=1, axis_size=E,
            variable_axes={"params": 0}, split_rngs={"params": True},
        )
        expert_out = Experts(tuple(self.hidden_dims), self.out_dim,
                             self.activation, name="experts")(x)      # [N,E,out]
        logits = nn.Dense(E, name="gate")(x)                          # [N,E]
        probs = jax.nn.softmax(logits, axis=-1)
        top_vals, top_idx = jax.lax.top_k(probs, K)
        weights = top_vals / (top_vals.sum(-1, keepdims=True) + 1e-9)
        dispatch = jax.nn.one_hot(top_idx, E, dtype=probs.dtype)      # [N,K,E]
        combine = (weights[..., None] * dispatch).sum(1)              # [N,E]
        out = jnp.einsum("ne,neo->no", combine, expert_out)
        # Switch load-balance: fraction dispatched per expert × mean gate prob
        f = dispatch.sum(1).mean(0) / K                               # [E]
        p = probs.mean(0)                                             # [E]
        self.sow("intermediates", "load_balancing_loss", E * jnp.sum(f * p))
        return out


class GaussianActor(nn.Module):
    """MLP mean + state-independent learnable std (reference ppo_modules.py:11-80)."""

    hidden_dims: Sequence[int]
    num_actions: int
    init_noise_std: float = 0.8
    activation: str = "ELU"

    @nn.compact
    def __call__(self, obs):
        mean = MLP(self.hidden_dims, self.num_actions, self.activation)(obs)
        std = self.param("std", lambda key: jnp.full((self.num_actions,), self.init_noise_std, dtype=jnp.float32))  # strong dtype: weak-typed params force a retrace of iteration 2
        return mean, jnp.broadcast_to(jnp.abs(std) + 1e-8, mean.shape)


class Critic(nn.Module):
    hidden_dims: Sequence[int]
    num_values: int
    activation: str = "ELU"

    @nn.compact
    def __call__(self, obs):
        return MLP(self.hidden_dims, self.num_values, self.activation)(obs)


class PhaseEmbed(nn.Module):
    """Embedding of the DeepMimic phase scalar (reference config
    algo.config.phase_embed; the reference's PhaseAware modules are referenced
    from mh_ppo.py:131-143 but not shipped — this defines the behavior).

    sinusoidal: [sin(2^k pi p), cos(2^k pi p)]_k; learnable: Dense(p)."""

    embed_type: str = "Sinusoidal"   # Sinusoidal | Learnable
    dim: int = 16

    @nn.compact
    def __call__(self, phase):       # [..., 1]
        if self.embed_type == "Learnable":
            return nn.Dense(self.dim)(phase)
        k = jnp.arange(self.dim // 2)
        ang = phase * (2.0**k) * jnp.pi
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class PhaseAwareActor(nn.Module):
    """GaussianActor that replaces the raw phase scalar with an embedding."""

    hidden_dims: Sequence[int]
    num_actions: int
    phase_pos: int
    init_noise_std: float = 0.8
    activation: str = "ELU"
    embed_type: str = "Sinusoidal"
    embed_dim: int = 16

    @nn.compact
    def __call__(self, obs):
        phase = obs[..., self.phase_pos:self.phase_pos + 1]
        emb = PhaseEmbed(self.embed_type, self.embed_dim)(phase)
        x = jnp.concatenate([obs, emb], axis=-1)
        mean = MLP(self.hidden_dims, self.num_actions, self.activation)(x)
        std = self.param("std", lambda key: jnp.full((self.num_actions,), self.init_noise_std, dtype=jnp.float32))  # strong dtype: weak-typed params force a retrace of iteration 2
        return mean, jnp.broadcast_to(jnp.abs(std) + 1e-8, mean.shape)


class PhaseAwareCritic(nn.Module):
    hidden_dims: Sequence[int]
    num_values: int
    phase_pos: int
    activation: str = "ELU"
    embed_type: str = "Sinusoidal"
    embed_dim: int = 16

    @nn.compact
    def __call__(self, obs):
        phase = obs[..., self.phase_pos:self.phase_pos + 1]
        emb = PhaseEmbed(self.embed_type, self.embed_dim)(phase)
        return MLP(self.hidden_dims, self.num_values, self.activation)(
            jnp.concatenate([obs, emb], axis=-1))


class Estimator(nn.Module):
    """State estimator: MLP from proprioceptive obs history to a privileged
    estimate (e.g. base linear velocity), deployable on the real robot
    (reference encoder_modules.py:10-19)."""

    hidden_dims: Sequence[int]
    out_dim: int
    activation: str = "ELU"

    @nn.compact
    def __call__(self, obs_history):
        return MLP(self.hidden_dims, self.out_dim, self.activation)(obs_history)


def gaussian_log_prob(mean, std, actions):
    var = std**2
    return (-0.5 * ((actions - mean) ** 2) / var - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)


def gaussian_entropy(std):
    return (0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std)).sum(-1)
