"""Sharded PPO learner tests — the act->step->learn loop over a device mesh
(BASELINE config 5 on the virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu.models import fantasy_vs as fvs
from gpu_ecs_madrona_tpu.parallel import make_world_mesh, shard_state, world_sharding
from gpu_ecs_madrona_tpu.parallel.learner import PPOConfig, PPOLearner


def make_env(num_worlds=8):
    cfg = fvs.FantasyVsConfig(num_worlds=num_worlds, num_dragons=3,
                              num_knights=6, seed=4, cleanup=False)
    return fvs.make_rl_env(cfg, donate=False)


def test_train_step_runs_and_learns_shape():
    sim, obs_fn, inject_fn, reward_fn, obs_dim, act_dim = make_env()
    learner = PPOLearner(
        PPOConfig(obs_dim=obs_dim, act_dim=act_dim, hidden=32, rollout_len=4),
        sim.graph.step, obs_fn, inject_fn, reward_fn)
    state = sim.state
    state, loss, rew = learner.train_step(state)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(rew))
    # params changed
    state, loss2, rew2 = learner.train_step(state)
    assert np.isfinite(float(loss2))


def test_sharded_training_multichip():
    """The full loop partitioned over an 8-device mesh: worlds sharded,
    params replicated, gradient all-reduce over ICI (XLA-inserted)."""
    assert jax.device_count() >= 8
    sim, obs_fn, inject_fn, reward_fn, obs_dim, act_dim = make_env(num_worlds=16)
    mesh = make_world_mesh(jax.devices()[:8])
    state = shard_state(sim.state, mesh)
    learner = PPOLearner(
        PPOConfig(obs_dim=obs_dim, act_dim=act_dim, hidden=32, rollout_len=4),
        sim.graph.step, obs_fn, inject_fn, reward_fn)
    state, loss, rew = learner.train_step(state)
    assert np.isfinite(float(loss))
    # state stays sharded over the mesh after the update
    leaf = state["arch"][fvs.Dragon.name]["mask"]
    assert len(leaf.sharding.device_set) == 8
    # and another step composes
    state, loss2, _ = learner.train_step(state)
    assert np.isfinite(float(loss2))


def test_reward_reflects_damage():
    sim, obs_fn, inject_fn, reward_fn, obs_dim, act_dim = make_env()
    s0 = sim.state
    s1 = sim.graph.step(s0) if False else None
    sim.step()
    r = reward_fn(s0, sim.state)
    # knights shoot on tick 1 -> positive damage reward somewhere
    assert (np.asarray(r) >= 0).all()
    assert np.asarray(r).max() > 0


def test_minibatch_multiepoch_normalized():
    """Minibatched multi-epoch PPO with observation normalization + done
    masking (the standard PPO loop, all inside one jit program)."""
    sim, obs_fn, inject_fn, reward_fn, obs_dim, act_dim = make_env()

    def done_fn(state):
        # arbitrary on-device done signal: every 3rd tick
        return (state["tick"] % 3) == 0

    learner = PPOLearner(
        PPOConfig(obs_dim=obs_dim, act_dim=act_dim, hidden=32, rollout_len=4,
                  epochs=2, num_minibatches=4, normalize_obs=True),
        sim.graph.step, obs_fn, inject_fn, reward_fn, done_fn=done_fn)
    state = sim.state
    state, loss, rew = learner.train_step(state)
    assert np.isfinite(float(loss))
    # normalization stats updated from the rollout
    assert float(learner.norm["count"]) > 1.0
    assert np.isfinite(np.asarray(learner.norm["mean"])).all()
    state, loss2, _ = learner.train_step(state)
    assert np.isfinite(float(loss2))
