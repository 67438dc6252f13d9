"""Episode auto-reset node (TaskGraphBuilder.reset_node) — the RL
world-reset pattern as a framework feature (new vs reference: its examples
never reset; RL users handle resets out-of-band)."""

import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu import (Archetype, ExecutorConfig, TaskGraphExecutor,
                                 component)
from gpu_ecs_madrona_tpu.core import base

Faller = Archetype("ResetFaller", [base.Position])


class ResetWorld:
    @staticmethod
    def register_types(registry):
        base.register_types(registry)
        registry.register_archetype(Faller, capacity=4)
        registry.export_column(Faller, base.Position, 0)

    @staticmethod
    def init(ctx, init_data=None):
        W = ctx.num_worlds
        ctx.data = {}
        k = ctx.rng_one()
        import jax
        z0 = jax.vmap(lambda kk: jax.random.uniform(kk, (), minval=5.0,
                                                    maxval=10.0))(k)
        pos = jnp.stack([jnp.zeros((W,)), jnp.zeros((W,)), z0], axis=-1)
        ctx.make_entities(Faller, counts=1, max_new=1,
                          values={base.Position: pos[:, None, :]})

    @staticmethod
    def setup_tasks(builder):
        def fall(rowctx, pos):
            return pos - jnp.array([0.0, 0.0, 1.0])

        n = builder.parallel_for_node(fall, [base.Position],
                                      archetypes=[Faller], name="fall")

        def hit_ground(ctx):
            pos = ctx.column(Faller, base.Position)
            return (pos[:, 0, 2] <= 0.0) & ctx.row_mask(Faller)[:, 0]

        builder.reset_node(hit_ground, ResetWorld.init, [n])


def test_auto_reset_reinitializes_done_worlds():
    sim = TaskGraphExecutor(ResetWorld, ExecutorConfig(num_worlds=8, seed=7))
    sim.run(50)
    pos, mask = sim.get_exported(0)
    z = np.asarray(pos)[:, 0, 2]
    assert np.asarray(mask)[:, 0].all()
    # all worlds keep cycling: z stays in (0, 10]
    assert (z > 0.0).all() and (z <= 10.0).all()
    # resets happened: reset worlds restart their tick at 0
    ticks = np.asarray(sim.state["tick"])
    assert (ticks < 50).any()  # at least one world reset (tick restarted)


def test_auto_reset_deterministic():
    a = TaskGraphExecutor(ResetWorld, ExecutorConfig(num_worlds=8, seed=7))
    b = TaskGraphExecutor(ResetWorld, ExecutorConfig(num_worlds=8, seed=7))
    a.run(37)
    b.run(37)
    pa = np.asarray(a.get_exported(0)[0])
    pb = np.asarray(b.get_exported(0)[0])
    assert np.array_equal(pa, pb)
    # different seeds diverge after resets
    c = TaskGraphExecutor(ResetWorld, ExecutorConfig(num_worlds=8, seed=8))
    c.run(37)
    pc = np.asarray(c.get_exported(0)[0])
    assert not np.array_equal(pa, pc)
