"""Sharded PPO learner colocated with the simulator.

The reference has no learner — it exports ECS columns to PyTorch and leaves
training to the user (SURVEY.md §2.8).  The TPU-native design goes further
(BASELINE.json north star): worlds shard over chips/hosts via the mesh, the
policy replicates, and the entire act -> step -> observe -> learn loop is
one jit program — rollouts never leave the device, and gradient reduction
is the only cross-chip traffic (an ICI all-reduce XLA inserts from the
sharding annotations; no NCCL analog to manage).

Env adapter protocol (duck-typed):
  obs_fn(state)              -> obs [W, obs_dim]
  inject_fn(state, actions)  -> state with actions written (pure)
  reward_fn(prev_state, state) -> reward [W]
  step_fn(state)             -> state (the taskgraph step)
  done_fn(state)             -> done [W] bool (optional; pairs naturally
                                with TaskGraphBuilder.reset_node so
                                episodes terminate on-device)

Training features (standard PPO, all inside the one jit program):
  * GAE with episode-boundary masking (done_fn)
  * running observation normalization (parallel-Welford update per rollout;
    stats frozen during each rollout so actions/logp stay consistent)
  * minibatched multi-epoch clipped updates (permutation reshuffle per
    epoch, lax.scan over minibatches)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PPOConfig:
    obs_dim: int = 0
    act_dim: int = 0
    hidden: int = 128
    rollout_len: int = 16
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    epochs: int = 1
    num_minibatches: int = 1
    normalize_obs: bool = False
    obs_clip: float = 10.0


def init_params(cfg: PPOConfig, key) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s1 = 1.0 / jnp.sqrt(cfg.obs_dim)
    s2 = 1.0 / jnp.sqrt(cfg.hidden)
    return {
        "w1": jax.random.normal(k1, (cfg.obs_dim, cfg.hidden)) * s1,
        "b1": jnp.zeros(cfg.hidden),
        "w2": jax.random.normal(k2, (cfg.hidden, cfg.hidden)) * s2,
        "b2": jnp.zeros(cfg.hidden),
        "w_mu": jax.random.normal(k3, (cfg.hidden, cfg.act_dim)) * s2 * 0.01,
        "b_mu": jnp.zeros(cfg.act_dim),
        "log_std": jnp.zeros(cfg.act_dim) - 0.5,
        "w_v": jax.random.normal(k4, (cfg.hidden, 1)) * s2,
        "b_v": jnp.zeros(1),
    }


def policy_apply(params, obs):
    """MLP trunk -> (mu, log_std, value).  bf16 matmuls with f32 accumulate
    (MXU-friendly) — the policy is where the FLOPs are."""
    x = obs.astype(jnp.bfloat16)
    h = jax.nn.tanh(
        jax.lax.dot_general(
            x, params["w1"].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + params["b1"])
    h = jax.nn.tanh(
        jax.lax.dot_general(
            h.astype(jnp.bfloat16), params["w2"].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + params["b2"])
    mu = h @ params["w_mu"] + params["b_mu"]
    value = (h @ params["w_v"] + params["b_v"])[..., 0]
    return mu, params["log_std"], value


def sample_action(params, obs, key):
    mu, log_std, value = policy_apply(params, obs)
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape)
    act = mu + std * eps
    logp = jnp.sum(
        -0.5 * ((act - mu) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1)
    return act, logp, value


def gae(rewards, values, dones, last_value, gamma, lam):
    """rewards/values/dones [T, W]; returns (advantages, returns) [T, W].
    dones mask bootstrapping across episode boundaries (auto-reset worlds:
    the value after a reset belongs to the next episode)."""

    def body(carry, x):
        adv_next, v_next = carry
        r, v, d = x
        nonterm = 1.0 - d
        delta = r + gamma * v_next * nonterm - v
        adv = delta + gamma * lam * adv_next * nonterm
        return (adv, v), adv

    (_, _), advs = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones), reverse=True)
    return advs, advs + values


def normalize_obs(obs, norm, clip):
    return jnp.clip((obs - norm["mean"]) / jnp.sqrt(norm["var"] + 1e-8),
                    -clip, clip)


def update_norm(norm, batch_obs):
    """Parallel-Welford merge of a [N, obs_dim] batch into running stats."""
    n_b = jnp.float32(batch_obs.shape[0])
    mean_b = jnp.mean(batch_obs, axis=0)
    var_b = jnp.var(batch_obs, axis=0)
    delta = mean_b - norm["mean"]
    tot = norm["count"] + n_b
    new_mean = norm["mean"] + delta * n_b / tot
    m2 = (norm["var"] * norm["count"] + var_b * n_b
          + delta ** 2 * norm["count"] * n_b / tot)
    return {"mean": new_mean, "var": m2 / tot, "count": tot}


class PPOLearner:
    """Collects on-device rollouts and applies PPO updates, all inside jit.
    Pass a mesh-sharded sim state for multi-chip execution — XLA partitions
    the whole program from the state's shardings."""

    def __init__(self, cfg: PPOConfig, step_fn, obs_fn, inject_fn, reward_fn,
                 done_fn=None, seed: int = 0):
        self.cfg = cfg
        self.params = init_params(cfg, jax.random.PRNGKey(seed))
        self.opt_m = jax.tree_util.tree_map(jnp.zeros_like, self.params)
        self.opt_v = jax.tree_util.tree_map(jnp.zeros_like, self.params)
        self.opt_t = jnp.zeros((), jnp.int32)
        self.key = jax.random.PRNGKey(seed + 1)
        self.norm = {
            "mean": jnp.zeros(cfg.obs_dim),
            "var": jnp.ones(cfg.obs_dim),
            "count": jnp.float32(1e-4),
        }

        def rollout(state, params, norm, key):
            def body(carry, _):
                st, k = carry
                obs = obs_fn(st)
                if cfg.normalize_obs:
                    obs_n = normalize_obs(obs, norm, cfg.obs_clip)
                else:
                    obs_n = obs
                k, sub = jax.random.split(k)
                act, logp, value = sample_action(params, obs_n, sub)
                st2 = inject_fn(st, act)
                st3 = step_fn(st2)
                rew = reward_fn(st, st3)
                done = (done_fn(st3).astype(jnp.float32) if done_fn is not None
                        else jnp.zeros_like(rew))
                return (st3, k), (obs, obs_n, act, logp, value, rew, done)

            (state, key), traj = jax.lax.scan(
                body, (state, key), None, length=cfg.rollout_len)
            final_obs = obs_fn(state)
            if cfg.normalize_obs:
                final_obs = normalize_obs(final_obs, norm, cfg.obs_clip)
            last_value = policy_apply(params, final_obs)[2]
            return state, key, traj, last_value

        def loss_fn(params, obs, act, old_logp, adv, ret):
            mu, log_std, value = policy_apply(params, obs)
            std = jnp.exp(log_std)
            logp = jnp.sum(
                -0.5 * ((act - mu) / std) ** 2 - log_std
                - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
            ratio = jnp.exp(logp - old_logp)
            adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
            pg = -jnp.minimum(
                ratio * adv_n,
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n,
            ).mean()
            v_loss = jnp.mean((value - ret) ** 2)
            entropy = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            return pg + cfg.value_coef * v_loss - cfg.entropy_coef * entropy

        def adam(params, opt_m, opt_v, opt_t, grads):
            opt_t = opt_t + 1
            b1, b2, eps = 0.9, 0.999, 1e-8
            opt_m = jax.tree_util.tree_map(
                lambda m_, g: b1 * m_ + (1 - b1) * g, opt_m, grads)
            opt_v = jax.tree_util.tree_map(
                lambda v_, g: b2 * v_ + (1 - b2) * g * g, opt_v, grads)
            tf = opt_t.astype(jnp.float32)
            params = jax.tree_util.tree_map(
                lambda p, m_, v_: p - cfg.lr * (m_ / (1 - b1 ** tf))
                / (jnp.sqrt(v_ / (1 - b2 ** tf)) + eps),
                params, opt_m, opt_v)
            return params, opt_m, opt_v, opt_t

        def update(params, opt_m, opt_v, opt_t, norm, state, key):
            state, key, traj, last_value = rollout(state, params, norm, key)
            obs_raw, obs_n, act, logp, value, rew, done = traj
            adv, ret = gae(rew, value, done, last_value, cfg.gamma,
                           cfg.gae_lambda)
            T, W = rew.shape
            N = T * W
            flat = lambda x: x.reshape((N,) + x.shape[2:])
            batch = (flat(obs_n), flat(act), flat(logp), flat(adv), flat(ret))

            n_mb = max(1, cfg.num_minibatches)
            mb = N // n_mb
            loss_total = jnp.float32(0.0)
            for _ in range(max(1, cfg.epochs)):
                if n_mb > 1:
                    key, pk_ = jax.random.split(key)
                    perm = jax.random.permutation(pk_, N)
                    shuf = tuple(x[perm] for x in batch)
                else:
                    shuf = batch
                mbs = tuple(
                    x[: n_mb * mb].reshape((n_mb, mb) + x.shape[1:])
                    for x in shuf)

                def mb_step(carry, xs):
                    params, opt_m, opt_v, opt_t = carry
                    loss, grads = jax.value_and_grad(loss_fn)(params, *xs)
                    params, opt_m, opt_v, opt_t = adam(
                        params, opt_m, opt_v, opt_t, grads)
                    return (params, opt_m, opt_v, opt_t), loss

                (params, opt_m, opt_v, opt_t), losses = jax.lax.scan(
                    mb_step, (params, opt_m, opt_v, opt_t), mbs)
                loss_total = loss_total + losses.mean()

            if cfg.normalize_obs:
                norm = update_norm(norm, flat(obs_raw))
            mean_rew = rew.mean()
            return (params, opt_m, opt_v, opt_t, norm, state, key,
                    loss_total / max(1, cfg.epochs), mean_rew)

        self._update = jax.jit(update, donate_argnums=(5,))

    def train_step(self, state):
        """One rollout + PPO update.  Returns (state, loss, mean_reward)."""
        (self.params, self.opt_m, self.opt_v, self.opt_t, self.norm, state,
         self.key, loss, mean_rew) = self._update(
            self.params, self.opt_m, self.opt_v, self.opt_t, self.norm,
            state, self.key)
        return state, loss, mean_rew
