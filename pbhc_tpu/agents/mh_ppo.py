"""Multi-head PPO (MHPPO), TPU-native.

Reimplements the reference algorithm (reference humanoidverse/agents/mh_ppo/
mh_ppo.py) with the rollout as one `lax.scan` over the jitted env step and the
update as pure jitted minibatch sweeps — one `train_iteration` call per PPO
iteration, everything stays on device.

Semantics preserved from the reference:
* vec rewards: critic has one head per reward term; per-head GAE, advantages
  summed across heads THEN normalized (mh_ppo.py:391-395);
* timeout bootstrapping: rew += gamma * V * time_out (ppo.py:267-268);
* adaptive-KL learning rate x/÷1.5 within [1e-5, 1e-2] (mh_ppo.py:469-483);
* clipped surrogate + clipped value loss (summed over heads) + entropy bonus;
* separate actor/critic Adam optimizers, grad-norm clip (ppo.py:456-457);
* optional L2C2 smoothness regularizer on interpolated obs (mh_ppo.py:488-507).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pbhc_tpu.agents.networks import Critic, GaussianActor, gaussian_entropy, gaussian_log_prob
from pbhc_tpu.sim.engine import _pytree_dataclass


@_pytree_dataclass
class TrainState:
    actor_params: dict
    critic_params: dict
    actor_opt: tuple
    critic_opt: tuple
    lr: jax.Array                 # adaptive LR scalar (shared actor/critic schedule)
    env_state: object
    obs: Dict[str, jax.Array]
    rng: jax.Array
    iteration: jax.Array


class MHPPO:
    def __init__(self, config, env):
        self.config = config.algo.config
        self.full_config = config
        self.env = env
        c = self.config
        self.gamma = float(c.gamma)
        self.lam = float(c.lam)
        self.clip = float(c.clip_param)
        self.entropy_coef = float(c.entropy_coef)
        self.value_loss_coef = float(c.value_loss_coef)
        self.desired_kl = float(c.desired_kl)
        self.max_grad_norm = float(c.max_grad_norm)
        self.num_steps = int(c.num_steps_per_env)
        self.num_epochs = int(c.num_learning_epochs)
        self.num_minibatches = int(c.num_mini_batches)
        self.num_act = int(getattr(env, "num_actions", env.nd))
        self.num_rew = env.num_rew_fn
        # rollout-storage dtype for the big obs arrays; bfloat16 halves the
        # update phase's HBM traffic (losses still run in f32)
        self.storage_dtype = jnp.bfloat16 if str(c.get("storage_dtype", "float32")) == "bfloat16" else jnp.float32

        a_cfg = c.module_dict.actor.layer_config
        cr_cfg = c.module_dict.critic.layer_config
        phase_type = str(c.get("phase_embed", {}).get("type", "Original"))
        if phase_type != "Original":
            # phase-aware nets (reference mh_ppo.py:119-143 + phase_embed config)
            from pbhc_tpu.agents.networks import PhaseAwareActor, PhaseAwareCritic

            dim = int(c.phase_embed.get("dim", 16))
            self.actor = PhaseAwareActor(
                tuple(a_cfg.hidden_dims), self.num_act,
                phase_pos=env.obs_key_slices("actor_obs")["ref_motion_phase"][0],
                init_noise_std=float(c.init_noise_std), activation=a_cfg.activation,
                embed_type=phase_type, embed_dim=dim)
            self.critic = PhaseAwareCritic(
                tuple(cr_cfg.hidden_dims), self.num_rew,
                phase_pos=env.obs_key_slices("critic_obs")["ref_motion_phase"][0],
                activation=cr_cfg.activation, embed_type=phase_type, embed_dim=dim)
        else:
            self.actor = GaussianActor(tuple(a_cfg.hidden_dims), self.num_act,
                                       float(c.init_noise_std), a_cfg.activation)
            self.critic = Critic(tuple(cr_cfg.hidden_dims), self.num_rew, cr_cfg.activation)
        self.actor_dim = env.obs_dim("actor_obs")
        self.critic_dim = env.obs_dim("critic_obs")

        self.tx = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=float(c.actor_learning_rate)),
        )

    # ------------------------------------------------------------------ setup
    def init_train_state(self, key) -> TrainState:
        k_env, k_a, k_c, k_r = jax.random.split(key, 4)
        env_state = self.env.init_state(k_env)
        obs, hist = self.env._compute_observations(env_state, k_r)
        env_state = dataclasses.replace(env_state, history=hist)
        actor_params = self.actor.init(k_a, jnp.zeros((1, self.actor_dim)))
        critic_params = self.critic.init(k_c, jnp.zeros((1, self.critic_dim)))
        return TrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt=self.tx.init(actor_params),
            critic_opt=self.tx.init(critic_params),
            lr=jnp.asarray(float(self.config.actor_learning_rate)),
            env_state=env_state,
            obs=obs,
            rng=k_r,
            iteration=jnp.asarray(0, jnp.int32),
        )

    # ---------------------------------------------------------------- rollout
    def _rollout(self, ts: TrainState):
        def step(carry, _):
            env_state, obs, rng = carry
            rng, k_act, k_env = jax.random.split(rng, 3)
            mean, std = self.actor.apply(ts.actor_params, obs["actor_obs"])
            actions = mean + std * jax.random.normal(k_act, mean.shape)
            logp = gaussian_log_prob(mean, std, actions)
            values = self.critic.apply(ts.critic_params, obs["critic_obs"])

            env_state, next_obs, rew, done, info = self.env.step(env_state, actions)
            # timeout bootstrapping per head (reference ppo.py:267-268)
            rew_stored = rew + self.gamma * values * info["time_outs"][:, None]
            sd = self.storage_dtype
            data = dict(
                actor_obs=obs["actor_obs"].astype(sd), critic_obs=obs["critic_obs"].astype(sd),
                actions=actions, logp=logp, mean=mean, std=std,
                values=values, rewards=rew_stored, dones=done,
            )
            if bool(self.config.l2c2.enable):
                # next_* obs are only consumed by the L2C2 smoothness terms;
                # storing them otherwise doubles rollout-storage traffic
                data["next_actor_obs"] = next_obs["actor_obs"].astype(sd)
                data["next_critic_obs"] = next_obs["critic_obs"].astype(sd)
            return (env_state, next_obs, rng), (data, info["log"])

        (env_state, obs, rng), (traj, logs) = jax.lax.scan(
            step, (ts.env_state, ts.obs, ts.rng), None, length=self.num_steps)
        return env_state, obs, rng, traj, logs

    def _gae(self, traj, last_values):
        """Per-head GAE; advantages summed over heads then normalized
        (reference mh_ppo.py:348-395)."""
        values, rewards, dones = traj["values"], traj["rewards"], traj["dones"]

        def back(carry, xs):
            adv_next, v_next = carry
            v, r, d = xs
            not_term = 1.0 - d[:, None].astype(jnp.float32)
            delta = r + not_term * self.gamma * v_next - v
            adv = delta + not_term * self.gamma * self.lam * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(
            back, (jnp.zeros_like(last_values), last_values),
            (values, rewards, dones), reverse=True)
        returns = advs + values                                     # [T,N,R]
        tot_adv = (returns - values).sum(-1)                        # [T,N]
        adv_norm = (tot_adv - tot_adv.mean()) / (tot_adv.std() + 1e-8)
        return returns, adv_norm

    # ----------------------------------------------------------------- update
    def _minibatch_update(self, carry, batch):
        actor_params, critic_params, actor_opt, critic_opt, lr = carry

        def actor_loss_fn(ap):
            aobs = batch["actor_obs"].astype(jnp.float32)
            mean, std = self.actor.apply(ap, aobs)
            logp = gaussian_log_prob(mean, std, batch["actions"])
            ratio = jnp.exp(logp - batch["logp"])
            adv = batch["advantages"]
            surr = -adv * ratio
            surr_clipped = -adv * jnp.clip(ratio, 1 - self.clip, 1 + self.clip)
            surrogate = jnp.maximum(surr, surr_clipped).mean()
            entropy = gaussian_entropy(std).mean()
            loss = surrogate - self.entropy_coef * entropy
            if bool(self.config.l2c2.enable):
                u = jax.random.uniform(jax.random.fold_in(batch["_key"], 0),
                                       aobs.shape[:-1] + (1,)) * 2 - 1
                u_obs = aobs + u * (batch["next_actor_obs"].astype(jnp.float32) - aobs)
                u_mean, _ = self.actor.apply(ap, u_obs)
                loss = loss + float(self.config.l2c2.lambda_policy) * ((batch["actions"] - u_mean) ** 2).mean()
            # KL for adaptive LR (reference mh_ppo.py:469-483)
            kl = jnp.sum(
                jnp.log(std / batch["std"] + 1e-5)
                + (batch["std"] ** 2 + (batch["mean"] - mean) ** 2) / (2.0 * std**2) - 0.5, axis=-1).mean()
            return loss, (surrogate, entropy, kl)

        def critic_loss_fn(cp):
            cobs = batch["critic_obs"].astype(jnp.float32)
            value = self.critic.apply(cp, cobs)
            target_v, returns = batch["values"], batch["returns"]
            if bool(self.config.use_clipped_value_loss):
                v_clipped = target_v + jnp.clip(value - target_v, -self.clip, self.clip)
                vloss = jnp.maximum((value - returns) ** 2, (v_clipped - returns) ** 2).sum(-1).mean()
            else:
                vloss = ((returns - value) ** 2).sum(-1).mean()
            loss = self.value_loss_coef * vloss
            if bool(self.config.l2c2.enable):
                u = jax.random.uniform(jax.random.fold_in(batch["_key"], 1),
                                       cobs.shape[:-1] + (1,)) * 2 - 1
                u_obs = cobs + u * (batch["next_critic_obs"].astype(jnp.float32) - cobs)
                u_val = self.critic.apply(cp, u_obs)
                loss = loss + float(self.config.l2c2.lambda_value) * ((value - u_val) ** 2).mean()
            return loss, vloss

        (a_loss, (surrogate, entropy, kl)), a_grads = jax.value_and_grad(actor_loss_fn, has_aux=True)(actor_params)
        (c_loss, vloss), c_grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(critic_params)

        # adaptive-KL LR (applied to next minibatch, like the reference)
        lr = jnp.where(kl > self.desired_kl * 2.0, jnp.maximum(1e-5, lr / 1.5),
                       jnp.where((kl < self.desired_kl / 2.0) & (kl > 0.0),
                                 jnp.minimum(1e-2, lr * 1.5), lr))
        actor_opt = _set_lr(actor_opt, lr)
        critic_opt = _set_lr(critic_opt, lr)

        a_updates, actor_opt = self.tx.update(a_grads, actor_opt, actor_params)
        actor_params = optax.apply_updates(actor_params, a_updates)
        c_updates, critic_opt = self.tx.update(c_grads, critic_opt, critic_params)
        critic_params = optax.apply_updates(critic_params, c_updates)

        metrics = dict(surrogate=surrogate, value_loss=vloss, entropy=entropy, kl=kl)
        return (actor_params, critic_params, actor_opt, critic_opt, lr), metrics

    # -------------------------------------------------------------- iteration
    @partial(jax.jit, static_argnums=0)
    def train_iteration(self, ts: TrainState):
        env_state, obs, rng, traj, env_logs = self._rollout(ts)
        last_values = self.critic.apply(ts.critic_params, obs["critic_obs"])
        returns, advantages = self._gae(traj, last_values)

        T, N = self.num_steps, self.env.num_envs
        flat = {k: v.reshape(T * N, *v.shape[2:]) for k, v in traj.items()}
        flat["returns"] = returns.reshape(T * N, -1)
        flat["advantages"] = advantages.reshape(T * N)

        mb_size = T * N // self.num_minibatches
        carry = (ts.actor_params, ts.critic_params, ts.actor_opt, ts.critic_opt, ts.lr)
        metrics_acc = None
        rng, k_perm = jax.random.split(rng)

        def epoch_body(carry_rng, _):
            carry, rng = carry_rng
            rng, kp = jax.random.split(rng)
            perm = jax.random.permutation(kp, T * N)
            shuf = {k: v[perm] for k, v in flat.items()}
            batches = {k: v.reshape(self.num_minibatches, mb_size, *v.shape[1:]) for k, v in shuf.items()}
            # fresh L2C2 interpolation noise per minibatch (the reference
            # draws torch randoms each update step)
            batches["_key"] = jax.random.split(jax.random.fold_in(rng, 7), self.num_minibatches)
            carry, metrics = jax.lax.scan(self._minibatch_update, carry, batches)
            return (carry, rng), metrics

        (carry, rng), metrics = jax.lax.scan(epoch_body, (carry, rng), None, length=self.num_epochs)
        actor_params, critic_params, actor_opt, critic_opt, lr = carry

        mean_rew = traj["rewards"].sum(-1).mean()
        log = {f"Env/{k}": v.mean() for k, v in env_logs.items()}
        log.update({
            "Train/mean_step_reward": mean_rew,
            "Loss/surrogate": metrics["surrogate"].mean(),
            "Loss/value": metrics["value_loss"].mean(),
            "Loss/entropy": metrics["entropy"].mean(),
            "Loss/kl": metrics["kl"].mean(),
            "Loss/lr": lr,
        })
        ts = TrainState(
            actor_params=actor_params, critic_params=critic_params,
            actor_opt=actor_opt, critic_opt=critic_opt, lr=lr,
            env_state=env_state, obs=obs, rng=rng,
            iteration=ts.iteration + 1,
        )
        return ts, log


def _set_lr(opt_state, lr):
    """Update the lr hyperparam inside an optax.inject_hyperparams chain state."""
    outer = opt_state
    inject_state = outer[1]
    hp = dict(inject_state.hyperparams)
    hp["learning_rate"] = lr
    new_inject = inject_state._replace(hyperparams=hp)
    return (outer[0], new_inject)
