"""ECS core tests — modeled on reference tests/state.cpp (register, create,
destroy, recreate, Loc validity across id recycling) plus the masked-slot
semantics unique to the TPU design."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpu_ecs_madrona_tpu import (
    Archetype,
    Context,
    ECSRegistry,
    Entity,
    StateManager,
    component,
)

Position = component("Position", ((3,), jnp.float32))
Velocity = component("Velocity", ((3,), jnp.float32))
Health = component("Health", hp=((), jnp.int32))

Body = Archetype("Body", [Position, Velocity])
Unit = Archetype("Unit", [Position, Health])


def make_mgr(num_worlds=4, cap=16, max_entities=64):
    reg = ECSRegistry()
    reg.register_archetype(Body, capacity=cap)
    reg.register_archetype(Unit, capacity=cap)
    reg.export_column(Body, Position, 0)
    return StateManager(reg, num_worlds, max_entities)


def test_create_entities_basic():
    mgr = make_mgr()
    state = mgr.make_initial_state()
    state, ents = mgr.make_entities(state, Body, counts=3, max_new=4)
    assert ents.shape == (4, 4)
    ents = np.asarray(ents)
    # 3 created per world, slot 3 unused
    assert (ents[:, :3] >= 0).all()
    assert (ents[:, 3] == -1).all()
    counts = np.asarray(mgr.num_rows(state, Body))
    assert (counts == 3).all()


def test_create_with_values_and_get():
    mgr = make_mgr()
    state = mgr.make_initial_state()
    vals = jnp.tile(jnp.arange(12, dtype=jnp.float32).reshape(4, 1, 3), (1, 2, 1))
    state, ents = mgr.make_entities(
        state, Body, counts=2, max_new=2, values={Position: vals}
    )
    got, found = mgr.get_component(state, Position, ents)
    assert np.asarray(found).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(vals))


def test_destroy_and_recycle_ids():
    """Mirrors reference tests/state.cpp: destroy every other entity, verify
    liveness, recreate, verify generation bumps invalidate stale handles."""
    mgr = make_mgr()
    state = mgr.make_initial_state()
    state, ents = mgr.make_entities(state, Body, counts=8, max_new=8)

    # destroy rows 0, 2, 4, 6
    destroy = ents[:, ::2]
    state = mgr.destroy_entities(state, destroy)
    counts = np.asarray(mgr.num_rows(state, Body))
    assert (counts == 4).all()

    # stale handles are dead; kept handles are alive
    _, _, live_dead = mgr.lookup(state, destroy)
    assert not np.asarray(live_dead).any()
    _, _, live_kept = mgr.lookup(state, ents[:, 1::2])
    assert np.asarray(live_kept).all()

    # recreate: ids recycle (lowest-index-first) with bumped generation
    state, ents2 = mgr.make_entities(state, Body, counts=4, max_new=4)
    assert (np.asarray(ents2) >= 0).all()
    # recycled ids have gen=1 now; stale gen-0 handles must still be dead
    _, _, live_stale = mgr.lookup(state, destroy)
    assert not np.asarray(live_stale).any()
    _, _, live_new = mgr.lookup(state, ents2)
    assert np.asarray(live_new).all()
    # generation differs between the stale and new handle for the same id
    same_id = np.asarray(Entity.id(ents2[:, 0])) == np.asarray(Entity.id(destroy[:, 0]))
    gen_new = np.asarray(Entity.gen(ents2[:, 0]))
    gen_old = np.asarray(Entity.gen(destroy[:, 0]))
    assert ((~same_id) | (gen_new != gen_old)).all()


def test_per_world_divergence():
    """Different worlds create different numbers of entities (the lockstep
    divergence the masked allocator exists for)."""
    mgr = make_mgr()
    state = mgr.make_initial_state()
    counts = jnp.array([0, 1, 2, 4], jnp.int32)
    state, ents = mgr.make_entities(state, Body, counts=counts, max_new=4)
    got = np.asarray(mgr.num_rows(state, Body))
    np.testing.assert_array_equal(got, [0, 1, 2, 4])
    e = np.asarray(ents)
    for w, c in enumerate([0, 1, 2, 4]):
        assert (e[w, :c] >= 0).all()
        assert (e[w, c:] == -1).all()


def test_capacity_overflow_drops():
    mgr = make_mgr(cap=4)
    state = mgr.make_initial_state()
    state, e1 = mgr.make_entities(state, Body, counts=3, max_new=4)
    state, e2 = mgr.make_entities(state, Body, counts=3, max_new=4)
    # only 1 slot left -> 1 created
    got = np.asarray(mgr.num_rows(state, Body))
    assert (got == 4).all()
    e2 = np.asarray(e2)
    assert (e2[:, 0] >= 0).all()
    assert (e2[:, 1:] == -1).all()


def test_set_component_by_entity():
    mgr = make_mgr()
    state = mgr.make_initial_state()
    state, ents = mgr.make_entities(state, Unit, counts=2, max_new=2)
    state = mgr.set_component(state, Health, ents, {"hp": jnp.full((4, 2), 7)})
    got, found = mgr.get_component(state, Health, ents)
    assert np.asarray(found).all()
    assert (np.asarray(got["hp"]) == 7).all()


def test_get_component_across_archetypes():
    """Position lives in both Body and Unit — gather must span both
    (reference query over multiple archetypes)."""
    mgr = make_mgr()
    state = mgr.make_initial_state()
    state, eb = mgr.make_entities(
        state, Body, counts=1, max_new=1,
        values={Position: jnp.ones((4, 1, 3))})
    state, eu = mgr.make_entities(
        state, Unit, counts=1, max_new=1,
        values={Position: jnp.full((4, 1, 3), 2.0)})
    both = jnp.concatenate([eb, eu], axis=1)
    got, found = mgr.get_component(state, Position, both)
    assert np.asarray(found).all()
    g = np.asarray(got)
    np.testing.assert_allclose(g[:, 0], 1.0)
    np.testing.assert_allclose(g[:, 1], 2.0)


def test_clear_archetype():
    mgr = make_mgr()
    state = mgr.make_initial_state()
    state, ents = mgr.make_entities(state, Body, counts=5, max_new=5)
    state = mgr.clear_archetype(state, Body)
    assert (np.asarray(mgr.num_rows(state, Body)) == 0).all()
    _, _, live = mgr.lookup(state, ents)
    assert not np.asarray(live).any()
    # ids are free again
    state, ents2 = mgr.make_entities(state, Body, counts=5, max_new=5)
    assert (np.asarray(ents2) >= 0).all()


def test_singleton_roundtrip():
    reg = ECSRegistry()
    reg.register_archetype(Body, capacity=4)
    WorldClock = component("WorldClock", t=((), jnp.float32))
    reg.register_singleton(WorldClock)
    mgr = StateManager(reg, 3, 16)
    state = mgr.make_initial_state()
    state = mgr.set_singleton(state, WorldClock, {"t": jnp.array([1.0, 2.0, 3.0])})
    got = mgr.get_singleton(state, WorldClock)
    np.testing.assert_allclose(np.asarray(got["t"]), [1.0, 2.0, 3.0])


def test_ops_are_jittable():
    mgr = make_mgr()

    @jax.jit
    def prog(state):
        state, ents = mgr.make_entities(state, Body, counts=4, max_new=4)
        state = mgr.destroy_entities(state, ents[:, :2])
        state, _ = mgr.make_entities(state, Body, counts=1, max_new=1)
        return state

    state = prog(mgr.make_initial_state())
    assert (np.asarray(mgr.num_rows(state, Body)) == 3).all()
