"""Teacher-student PPO (KungfuBot2), TPU-native.

Reimplements the reference algorithm (reference humanoidverse/agents/ppo/
ppo_mimic.py):

* RL mode: PPO with a privileged-encoder latent feeding the actor, plus a
  `priv_reg` loss pulling the priv latent toward the (frozen) history latent
  with the staged coefficient schedule (ppo_mimic.py:613-621);
* periodic DAgger iterations (every `dagger_update_freq`) that regress the
  history encoder onto the (frozen) priv latent over fresh rollouts
  (ppo_mimic.py:693-709);
* distill mode (`dagger_only`): frozen teacher policy supervises the student
  with an L2 behavior-cloning loss while the student drives the env with its
  own deployable (history) latent (ppo_mimic.py:711-724);
* single optimizer over all params with adaptive-KL LR; a separate optimizer
  drives the history encoder during DAgger.
"""
from __future__ import annotations

import dataclasses
import pickle
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pbhc_tpu.agents.mimic_networks import MimicActorCritic
from pbhc_tpu.agents.networks import gaussian_entropy, gaussian_log_prob
from pbhc_tpu.sim.engine import _pytree_dataclass


def _graft_history_encoder(params, teacher_params):
    """Copy the teacher's actor/history_encoder subtree into freshly-initialized
    student params (reference ppo_mimic.py:176 — the student's deployable
    latent path starts from the teacher's DAgger-trained encoder)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    tflat = traverse_util.flatten_dict(teacher_params)
    n = 0
    for k in flat:
        if any("history_encoder" in str(p) for p in k):
            assert flat[k].shape == tflat[k].shape, (
                f"teacher/student history_encoder shape mismatch at {k}: "
                f"{tflat[k].shape} vs {flat[k].shape}")
            flat[k] = jnp.asarray(tflat[k], flat[k].dtype)
            n += 1
    assert n > 0, "no history_encoder params found to graft"
    return traverse_util.unflatten_dict(flat)


def build_mimic_net(algo_cfg, num_act, future_dim, future_steps,
                    history_dim, history_steps) -> MimicActorCritic:
    """Construct the actor-critic net from an algo config subtree — shared by
    PPOMimic and the frozen-teacher loader (which must build the net from the
    TEACHER's config, not the student's; reference ppo_mimic.py:147-161)."""
    a_cfg = algo_cfg.module_dict.actor
    v_cfg = algo_cfg.module_dict.critic
    return MimicActorCritic(
        actor_hidden=tuple(a_cfg.layer_config.hidden_dims),
        critic_hidden=tuple(v_cfg.layer_config.hidden_dims),
        num_actions=num_act,
        num_values=1,
        future_steps=future_steps,
        future_per_step=future_dim // future_steps,
        history_steps=history_steps,
        history_per_step=history_dim // history_steps,
        init_noise_std=float(algo_cfg.init_noise_std),
        min_sigma=float(a_cfg.get("min_sigma", 0.2)),
        max_sigma=float(a_cfg.get("max_sigma", 1.2)),
        activation=a_cfg.layer_config.activation,
        actor_type=str(a_cfg.layer_config.get("type", "MLP")),
        critic_type=str(v_cfg.layer_config.get("type", "MLP")),
        num_experts=int(a_cfg.layer_config.get("num_experts", 4)),
        top_k=int(a_cfg.layer_config.get("top_k", 2)),
    )


@_pytree_dataclass
class MimicTrainState:
    params: dict
    opt: tuple
    hist_opt: tuple
    lr: jax.Array
    env_state: object
    obs: Dict[str, jax.Array]
    rng: jax.Array
    iteration: jax.Array


class PPOMimic:
    OBS_KEYS = ("actor_obs", "priv_obs", "future_motion_targets", "prop_history")

    def __init__(self, config, env, teacher=None):
        self.config = config.algo.config
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
        self.dagger_update_freq = int(c.get("dagger_update_freq", 20))
        self.dagger_only = bool(c.get("dagger_only", False))
        self.priv_reg_schedule = [float(x) for x in c.priv_reg_coef_schedual]
        self.num_act = int(getattr(env, "num_actions", env.nd))
        self.teacher = teacher  # (apply_fn, params) for distill mode

        obs_cfg = config.obs
        fsteps = int(obs_cfg.future_num_steps)
        hsteps = int(obs_cfg.history_length)
        self.future_dim = env.obs_dim("future_motion_targets")
        self.history_dim = env.obs_dim("prop_history")
        assert self.future_dim % fsteps == 0 and self.history_dim % hsteps == 0

        a_cfg = c.module_dict.actor
        v_cfg = c.module_dict.critic
        # MoE backbones: reference ppo_mimic.py:657-672 gates a load-balancing
        # aux loss on actor_type/critic_type == "MoEMLP"
        self.actor_type = str(a_cfg.layer_config.get("type", "MLP"))
        self.critic_type = str(v_cfg.layer_config.get("type", "MLP"))
        self.use_moe = "MoEMLP" in (self.actor_type, self.critic_type)
        self.lb_alpha = float(c.get("load_balancing_loss_alpha", 1e-2))
        self.net = build_mimic_net(c, self.num_act, self.future_dim, fsteps,
                                   self.history_dim, hsteps)
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=float(c.learning_rate)),
        )
        self.hist_tx = optax.chain(
            optax.clip_by_global_norm(self.max_grad_norm),
            optax.adam(float(c.learning_rate)),
        )

    # ------------------------------------------------------------------ setup
    def _dummy_obs(self):
        return {
            "actor_obs": jnp.zeros((1, self.env.obs_dim("actor_obs"))),
            "priv_obs": jnp.zeros((1, self.env.obs_dim("priv_obs"))),
            "future_motion_targets": jnp.zeros((1, self.future_dim)),
            "prop_history": jnp.zeros((1, self.history_dim)),
        }

    def init_train_state(self, key) -> MimicTrainState:
        k_env, k_net, k_r = jax.random.split(key, 3)
        env_state = self.env.init_state(k_env)
        obs, hist = self.env._compute_observations(env_state, k_r)
        env_state = dataclasses.replace(env_state, history=hist)
        params = self.net.init(k_net, self._dummy_obs())
        if self.teacher is not None and self.dagger_only:
            # distill init: the student inherits the teacher's trained history
            # encoder, which then stays FROZEN during BC (reference
            # ppo_mimic.py:176-178 load_state_dict + requires_grad_(False));
            # the grad mask lives in distill_iteration
            params = _graft_history_encoder(params, self.teacher[1])
        return MimicTrainState(
            params=params,
            opt=self.tx.init(params),
            hist_opt=self.hist_tx.init(params),
            lr=jnp.asarray(float(self.config.learning_rate)),
            env_state=env_state,
            obs=obs,
            rng=k_r,
            iteration=jnp.asarray(0, jnp.int32),
        )

    # ---------------------------------------------------------------- rollout
    def _rollout(self, ts: MimicTrainState, hist_encoding: bool):
        def step(carry, _):
            env_state, obs, rng = carry
            rng, k_act = jax.random.split(rng)
            mean, std = self.net.apply(ts.params, obs, hist_encoding, method=MimicActorCritic.act)
            if self.dagger_only:
                # distill rollouts are deterministic: the student drives the
                # env with its mean action (reference ppo_mimic.py:347-351
                # act_inference in the dagger_only branch)
                actions = mean
            else:
                actions = mean + std * jax.random.normal(k_act, mean.shape)
            logp = gaussian_log_prob(mean, std, actions)
            values = self.net.apply(ts.params, obs, method=MimicActorCritic.evaluate)
            data = {k: obs[k] for k in self.OBS_KEYS}
            env_state, next_obs, rew, done, info = self.env.step(env_state, actions)
            rew_stored = rew + self.gamma * values * info["time_outs"][:, None]
            data.update(actions=actions, logp=logp, mean=mean, std=std,
                        values=values, rewards=rew_stored, dones=done)
            if self.teacher is not None:
                t_apply, t_params = self.teacher
                data["teacher_actions"] = t_apply(t_params, obs)
            return (env_state, next_obs, rng), (data, info["log"])

        (env_state, obs, rng), (traj, logs) = jax.lax.scan(
            step, (ts.env_state, ts.obs, ts.rng), None, length=self.num_steps)
        return env_state, obs, rng, traj, logs

    def _gae(self, traj, last_values):
        values, rewards, dones = traj["values"], traj["rewards"], traj["dones"]

        def back(carry, xs):
            adv_next, v_next = carry
            v, r, d = xs
            not_term = 1.0 - d[:, None].astype(jnp.float32)
            delta = r + not_term * self.gamma * v_next - v
            adv = delta + not_term * self.gamma * self.lam * adv_next
            return (adv, v), adv

        (_, _), advs = jax.lax.scan(back, (jnp.zeros_like(last_values), last_values),
                                    (values, rewards, dones), reverse=True)
        returns = advs + values
        tot = (returns - values).sum(-1)
        return returns, (tot - tot.mean()) / (tot.std() + 1e-8)

    # ------------------------------------------------------------------ RL it
    def _priv_reg_coef(self, iteration):
        s = self.priv_reg_schedule
        stage = jnp.clip((iteration.astype(jnp.float32) - s[2]) / s[3], 0.0, 1.0)
        return stage * (s[1] - s[0]) + s[0]

    def _apply_lb(self, p, *args, method):
        """net.apply that also returns the summed MoE load-balancing aux loss
        (0 for plain-MLP backbones). Reference ppo_mimic.py:657-672."""
        if not self.use_moe:
            return self.net.apply(p, *args, method=method), jnp.float32(0.0)
        out, vs = self.net.apply(p, *args, method=method, mutable=["intermediates"])
        lb = sum((jnp.sum(x) for x in jax.tree_util.tree_leaves(vs)), jnp.float32(0.0))
        return out, lb

    def _update_rl(self, carry, batch):
        params, opt, lr, it = carry

        def loss_fn(p):
            obs = {k: batch[k] for k in self.OBS_KEYS}
            (mean, std), lb_a = self._apply_lb(p, obs, False, method=MimicActorCritic.act)
            logp = gaussian_log_prob(mean, std, batch["actions"])
            ratio = jnp.exp(logp - batch["logp"])
            adv = batch["advantages"]
            surr = jnp.maximum(-adv * ratio,
                               -adv * jnp.clip(ratio, 1 - self.clip, 1 + self.clip)).mean()
            entropy = gaussian_entropy(std).mean()
            value, lb_v = self._apply_lb(p, obs, method=MimicActorCritic.evaluate)
            tv, ret = batch["values"], batch["returns"]
            v_clip = tv + jnp.clip(value - tv, -self.clip, self.clip)
            vloss = jnp.maximum((value - ret) ** 2, (v_clip - ret) ** 2).sum(-1).mean()
            # priv reg: pull priv latent toward frozen hist latent (ppo_mimic.py:613-621)
            priv_lat = self.net.apply(p, batch["priv_obs"], method=MimicActorCritic.priv_latent)
            hist_lat = jax.lax.stop_gradient(
                self.net.apply(p, batch["prop_history"], method=MimicActorCritic.hist_latent))
            priv_reg = jnp.linalg.norm(priv_lat - hist_lat, axis=-1).mean()
            coef = self._priv_reg_coef(it)
            # reference kl: log(sigma/old_sigma + 1e-5) (ppo.py:408-424 idiom)
            kl = jnp.sum(jnp.log(std / batch["std"] + 1e-5)
                         + (batch["std"] ** 2 + (batch["mean"] - mean) ** 2) / (2 * std**2) - 0.5,
                         axis=-1).mean()
            loss = (surr - self.entropy_coef * entropy + self.value_loss_coef * vloss
                    + coef * priv_reg + self.lb_alpha * (lb_a + lb_v))
            return loss, (surr, vloss, entropy, kl, priv_reg)

        (loss, (surr, vloss, entropy, kl, priv_reg)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        lr = jnp.where(kl > self.desired_kl * 2.0, jnp.maximum(1e-5, lr / 1.5),
                       jnp.where((kl < self.desired_kl / 2.0) & (kl > 0.0),
                                 jnp.minimum(1e-2, lr * 1.5), lr))
        opt_inner = opt[1]._replace(hyperparams={**opt[1].hyperparams, "learning_rate": lr})
        opt = (opt[0], opt_inner)
        updates, opt = self.tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return (params, opt, lr, it), dict(surrogate=surr, value_loss=vloss,
                                           entropy=entropy, kl=kl, priv_reg=priv_reg)

    @partial(jax.jit, static_argnums=(0, 2))
    def rl_iteration(self, ts: MimicTrainState, hist_encoding: bool = False):
        """One PPO iteration; with `hist_encoding` the rollout runs through the
        deployable history-latent path AND the history encoder is regressed
        onto the priv latent over the same data — the reference's learn_RL
        schedule sets hist_encoding every dagger_update_freq iterations and
        runs BOTH the RL update and the DAgger update that iteration
        (reference ppo_mimic.py:267-275)."""
        env_state, obs, rng, traj, env_logs = self._rollout(ts, hist_encoding=hist_encoding)
        last_values = self.net.apply(ts.params, obs, method=MimicActorCritic.evaluate)
        returns, advantages = self._gae(traj, last_values)
        T, N = self.num_steps, self.env.num_envs
        flat = {k: v.reshape(T * N, *v.shape[2:]) for k, v in traj.items()}
        flat["returns"] = returns.reshape(T * N, -1)
        flat["advantages"] = advantages.reshape(T * N)
        mb = T * N // self.num_minibatches

        def epoch(carry_rng, _):
            carry, rng = carry_rng
            rng, kp = jax.random.split(rng)
            perm = jax.random.permutation(kp, T * N)
            batches = {k: v[perm].reshape(self.num_minibatches, mb, *v.shape[1:]) for k, v in flat.items()}
            carry, m = jax.lax.scan(self._update_rl, carry, batches)
            return (carry, rng), m

        carry = (ts.params, ts.opt, ts.lr, ts.iteration)
        (carry, rng), metrics = jax.lax.scan(epoch, (carry, rng), None, length=self.num_epochs)
        params, opt, lr, _ = carry
        log = {f"Env/{k}": v.mean() for k, v in env_logs.items()}
        log.update({"Train/mean_step_reward": traj["rewards"].sum(-1).mean(),
                    "Loss/surrogate": metrics["surrogate"].mean(),
                    "Loss/value": metrics["value_loss"].mean(),
                    "Loss/kl": metrics["kl"].mean(),
                    "Loss/priv_reg": metrics["priv_reg"].mean(),
                    "Loss/lr": lr})
        hist_opt = ts.hist_opt
        if hist_encoding:
            # DAgger pass on the same rollout with the post-RL params
            # (reference _training_step_dagger, ppo_mimic.py:693-709)
            batches = (flat["priv_obs"].reshape(self.num_minibatches, mb, -1),
                       flat["prop_history"].reshape(self.num_minibatches, mb, -1))
            (params, hist_opt), dg_losses = jax.lax.scan(
                self._update_dagger, (params, hist_opt), batches)
            log["Loss/hist_latent"] = dg_losses.mean()
        return MimicTrainState(params=params, opt=opt, hist_opt=hist_opt, lr=lr,
                               env_state=env_state, obs=obs, rng=rng,
                               iteration=ts.iteration + 1), log

    # ---------------------------------------------------------------- DAgger
    def _update_dagger(self, carry, batch):
        """One hist-encoder minibatch: regress hist latent -> frozen priv
        latent; only history_encoder params move (ppo_mimic.py:693-709)."""
        params, hist_opt = carry
        pv, hs = batch

        def loss_fn(p):
            target = jax.lax.stop_gradient(
                self.net.apply(p, pv, method=MimicActorCritic.priv_latent))
            pred = self.net.apply(p, hs, method=MimicActorCritic.hist_latent)
            return jnp.linalg.norm(pred - target, axis=-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        mask = jax.tree_util.tree_map_with_path(
            lambda path, g: g if any("history_encoder" in str(k) for k in path) else jnp.zeros_like(g),
            grads)
        updates, hist_opt = self.hist_tx.update(mask, hist_opt, params)
        params = optax.apply_updates(params, updates)
        return (params, hist_opt), loss

    @partial(jax.jit, static_argnums=0)
    def dagger_iteration(self, ts: MimicTrainState):
        """Standalone DAgger iteration (hist-encoder fine-tune, no RL)."""
        env_state, obs, rng, traj, env_logs = self._rollout(ts, hist_encoding=True)
        T, N = self.num_steps, self.env.num_envs
        priv = traj["priv_obs"].reshape(T * N, -1)
        hist = traj["prop_history"].reshape(T * N, -1)
        mb = T * N // self.num_minibatches

        batches = (priv.reshape(self.num_minibatches, mb, -1), hist.reshape(self.num_minibatches, mb, -1))
        (params, hist_opt), losses = jax.lax.scan(self._update_dagger, (ts.params, ts.hist_opt), batches)
        log = {f"Env/{k}": v.mean() for k, v in env_logs.items()}
        log.update({"Loss/hist_latent": losses.mean(),
                    "Train/mean_step_reward": traj["rewards"].sum(-1).mean(),
                    "Loss/kl": jnp.asarray(0.0), "Loss/lr": ts.lr})
        return MimicTrainState(params=params, opt=ts.opt, hist_opt=hist_opt, lr=ts.lr,
                               env_state=env_state, obs=obs, rng=rng,
                               iteration=ts.iteration + 1), log

    # ---------------------------------------------------------------- distill
    @partial(jax.jit, static_argnums=0)
    def distill_iteration(self, ts: MimicTrainState):
        """Student BC from a frozen teacher (ppo_mimic.py:711-724)."""
        assert self.teacher is not None
        env_state, obs, rng, traj, env_logs = self._rollout(ts, hist_encoding=True)
        T, N = self.num_steps, self.env.num_envs
        flat = {k: traj[k].reshape(T * N, *traj[k].shape[2:])
                for k in (*self.OBS_KEYS, "teacher_actions")}
        mb = T * N // self.num_minibatches

        def update(carry, batch):
            params, opt = carry

            def loss_fn(p):
                obs_b = {k: batch[k] for k in self.OBS_KEYS}
                student = self.net.apply(p, obs_b, True, method=MimicActorCritic.act)[0]
                return jnp.linalg.norm(jax.lax.stop_gradient(batch["teacher_actions"]) - student,
                                       axis=-1).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            # the inherited history encoder stays frozen during BC (reference
            # ppo_mimic.py:177-178 requires_grad_(False)); everything else moves
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g: jnp.zeros_like(g)
                if any("history_encoder" in str(k) for k in path) else g,
                grads)
            updates, opt = self.tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, opt), loss

        batches = {k: v.reshape(self.num_minibatches, mb, *v.shape[1:]) for k, v in flat.items()}
        (params, opt), losses = jax.lax.scan(update, (ts.params, ts.opt), batches)
        log = {f"Env/{k}": v.mean() for k, v in env_logs.items()}
        log.update({"Loss/bc": losses.mean(),
                    "Train/mean_step_reward": traj["rewards"].sum(-1).mean(),
                    "Loss/kl": jnp.asarray(0.0), "Loss/lr": ts.lr})
        return MimicTrainState(params=params, opt=opt, hist_opt=ts.hist_opt, lr=ts.lr,
                               env_state=env_state, obs=obs, rng=rng,
                               iteration=ts.iteration + 1), log

    # ------------------------------------------------------------------ drive
    def train_iteration(self, ts: MimicTrainState):
        """Host-side mode dispatch (reference learn_RL / learn_distill)."""
        it = int(ts.iteration)
        if self.dagger_only:
            return self.distill_iteration(ts)
        # reference learn_RL: hist_encoding iterations roll out through the
        # deployable history path and run RL + DAgger on the same data
        # (ppo_mimic.py:267-275)
        hist_enc = self.dagger_update_freq > 0 and it % self.dagger_update_freq == 0
        return self.rl_iteration(ts, hist_enc)
