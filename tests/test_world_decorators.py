"""Decorator-based world definition (core/world.py) — the Pythonic layer
over the builder protocol."""

import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu import (Archetype, ExecutorConfig, TaskGraphExecutor,
                                 World, system)
from gpu_ecs_madrona_tpu.core import base

Mover = Archetype("DecoMover", [base.Position])


class DecoWorld(World):
    @staticmethod
    def register_types(registry):
        base.register_types(registry)
        registry.register_archetype(Mover, capacity=4)
        registry.export_column(Mover, base.Position, 0)

    @staticmethod
    def init(ctx, init_data=None):
        W = ctx.num_worlds
        ctx.data = {"log": jnp.zeros((W, 3))}
        ctx.make_entities(Mover, counts=2, max_new=2, values={
            base.Position: jnp.zeros((W, 2, 3))})

    @system(components=[base.Position], archetypes=[Mover])
    def step_x(rowctx, pos):
        return pos + jnp.array([1.0, 0.0, 0.0])

    @system()  # chains after step_x by declaration order
    def double_y(ctx):
        pos = ctx.column(Mover, base.Position)
        ctx.set_column(Mover, base.Position,
                       pos.at[..., 1].set(pos[..., 0] * 2))

    @system(after=["step_x"])  # explicit dep: runs after step_x (and is
    # topologically free relative to double_y's output on y)
    def stamp_z(ctx):
        pos = ctx.column(Mover, base.Position)
        ctx.set_column(Mover, base.Position, pos.at[..., 2].set(7.0))


class DecoChild(DecoWorld):
    @system(after=["stamp_z", "double_y"])
    def shift_all(ctx):
        pos = ctx.column(Mover, base.Position)
        ctx.set_column(Mover, base.Position, pos + 10.0)


def test_decorated_world_runs_in_order():
    sim = TaskGraphExecutor(DecoWorld, ExecutorConfig(num_worlds=2, seed=0))
    sim.run(3)
    pos, mask = sim.get_exported(0)
    p = np.asarray(pos)
    assert np.asarray(mask)[:, :2].all()
    # x incremented per step; y = 2x (set after); z stamped
    np.testing.assert_allclose(p[:, :2, 0], 3.0)
    np.testing.assert_allclose(p[:, :2, 1], 6.0)
    np.testing.assert_allclose(p[:, :2, 2], 7.0)


def test_decorated_world_inheritance():
    sim = TaskGraphExecutor(DecoChild, ExecutorConfig(num_worlds=2, seed=0))
    sim.run(1)
    p = np.asarray(sim.get_exported(0)[0])
    np.testing.assert_allclose(p[:, :2, 0], 11.0)   # 1 + 10
    np.testing.assert_allclose(p[:, :2, 2], 17.0)   # 7 + 10


def test_unknown_dependency_raises():
    import pytest

    class Bad(World):
        @staticmethod
        def register_types(registry):
            base.register_types(registry)
            registry.register_archetype(Mover, capacity=4)

        @staticmethod
        def init(ctx, init_data=None):
            ctx.data = {}

        @system(after=["nope"])
        def s(ctx):
            pass

    with pytest.raises(ValueError, match="nope"):
        TaskGraphExecutor(Bad, ExecutorConfig(num_worlds=1, seed=0))
