"""SimState + StateManager: the batched ECS store and its functional ops.

TPU-native redesign of the reference's state layer:
  - reference Table (src/common/table.cpp): SoA columns, swap-remove, 2x
    realloc growth.  Here: per-archetype SoA jax arrays with a leading
    ``[num_worlds, capacity]`` axis and a boolean ``mask`` of live rows.
    There is no growth and no swap-remove — capacities are static and rows
    are freed by clearing mask bits (XLA requires static shapes; masking is
    the TPU idiom the reference's dynamic tables cannot use).
  - reference EntityStore / IDMap (include/madrona/impl/id_map.hpp:19-138):
    lock-free generational id allocator.  Here: per-world id arrays
    (``loc_arch``/``loc_row``/``gen``) and *deterministic lowest-index-first*
    allocation computed with a cumsum ranking — a pure function of state, no
    atomics, identical across replays (the reference's per-thread free-list
    caches make its allocation order nondeterministic; ours is reproducible
    by construction).
  - reference StateManager (src/core/state.cpp, src/mw/device/state.cpp):
    one manager spanning all worlds, per-world tables.  Here: StateManager
    is the *static* schema companion; all dynamic data lives in the
    ``SimState`` pytree, so a whole simulation is checkpointable and
    shardable as one pytree.

All mutating ops are pure: they take a state dict and return a new one.
Inside a jit trace these compile to in-place donations.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu.core.component import (
    ENTITY_GEN_MASK,
    Archetype,
    Component,
    Entity,
)
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
from gpu_ecs_madrona_tpu.utils import debug

SimState = Dict[str, Any]


# ---------------------------------------------------------------------------
# Batched gather/scatter helpers (rows may be -1 = invalid)
# ---------------------------------------------------------------------------


# Row-gather strategy: XLA's gather op lowers to a slow sequential
# custom-call on TPU inside large fused step programs (measured ~4ms for a
# [256,1600]<-[256,108] gather vs 0.013ms as a one-hot matmul).  For the
# small per-archetype tables an ECS uses, expressing the gather as a
# one-hot-matrix matmul routes it onto the MXU and is exact:
#   - floats: 0/1 selection matmul sums one exact term
#   - int32: split into two 16-bit halves (each < 2^24, exact in f32),
#     gather both, recombine with wrap-safe shifts
_ONEHOT_GATHER_MAX_CAP = 2048


def _onehot_matmul(oh: jax.Array, flat: jax.Array) -> jax.Array:
    """oh: [W, K, cap] f32; flat: [W, cap, D] f32 -> [W, K, D].

    The VALUES side must be EXACT (utils/math.py EXACT note): the TPU MXU
    default is one bf16 pass, which silently truncates every gathered
    float to ~3 digits — caught on-chip as 0.098-wrong contact normals in
    the simple_jobs XLA narrowphase (the fused kernel's native gathers
    were exact and exposed the diff).  The one-hot side is 0/1 and stays
    DEFAULT."""
    from gpu_ecs_madrona_tpu.utils import math as _m
    return jax.lax.dot_general(
        oh, flat,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=(_m.DEFAULT_P, _m.EXACT),
    )


def _onehot_gather(arr: jax.Array, rows: jax.Array) -> jax.Array:
    W, cap = arr.shape[0], arr.shape[1]
    K = rows.shape[1]
    trailing = arr.shape[2:]
    D = 1
    for s in trailing:
        D *= s
    safe = jnp.clip(rows, 0, cap - 1)
    oh = (
        safe[:, :, None] == jnp.arange(cap, dtype=safe.dtype)[None, None, :]
    ).astype(jnp.float32)
    flat = arr.reshape(W, cap, D)
    dt = arr.dtype
    if jnp.issubdtype(dt, jnp.floating):
        out = _onehot_matmul(oh, flat.astype(jnp.float32)).astype(dt)
    elif dt == jnp.bool_:
        out = _onehot_matmul(oh, flat.astype(jnp.float32)) > 0.5
    else:
        f = flat.astype(jnp.int32)
        lo = (f & 0xFFFF).astype(jnp.float32)
        hi = ((f >> 16) & 0xFFFF).astype(jnp.float32)
        lo_g = jnp.round(_onehot_matmul(oh, lo)).astype(jnp.int32)
        hi_g = jnp.round(_onehot_matmul(oh, hi)).astype(jnp.int32)
        out = ((hi_g << 16) | lo_g).astype(dt)
    return out.reshape((W, K) + trailing)


def batched_gather(arr: jax.Array, rows: jax.Array) -> jax.Array:
    """arr: [W, cap, ...]; rows: [W, K] (entries may be invalid; clipped).

    Returns [W, K, ...].  Callers mask out invalid rows themselves.
    """
    cap = arr.shape[1]
    if cap <= _ONEHOT_GATHER_MAX_CAP:
        return _onehot_gather(arr, rows)
    safe = jnp.clip(rows, 0, cap - 1)
    idx = safe.reshape(safe.shape + (1,) * (arr.ndim - 2))
    idx = jnp.broadcast_to(idx, safe.shape + arr.shape[2:])
    return jnp.take_along_axis(arr, idx, axis=1)


def batched_scatter(arr: jax.Array, rows: jax.Array, values: jax.Array,
                    valid: Optional[jax.Array] = None) -> jax.Array:
    """Scatter values [W, K, ...] into arr [W, cap, ...] at rows [W, K].

    Invalid rows (negative, or ``valid`` False) are dropped by routing them
    to an out-of-range index (mode="drop") — the TPU-safe analog of the
    reference's predicated writes.
    """
    cap = arr.shape[1]
    ok = rows >= 0
    if valid is not None:
        ok = ok & valid
    idx = jnp.where(ok, rows, cap)  # cap = out of range -> dropped
    W = arr.shape[0]
    widx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[:, None], idx.shape)
    return arr.at[widx, idx].set(values, mode="drop")


def _alloc_slots_world(free: jax.Array, count: jax.Array, k: int) -> jax.Array:
    """Pick the first ``count`` free slot indices (lowest-index-first).

    free: bool [cap]; count: int32 scalar; returns int32 [k], -1 past count
    or when free slots run out.  Deterministic replacement for the
    reference's IDMap free-list pop (id_map_impl.inl).
    """
    cap = free.shape[0]
    ranks = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free slots
    take = free & (ranks < k)
    dest = jnp.where(take, ranks, k)  # k = dropped
    rows = jnp.full((k,), -1, jnp.int32)
    rows = rows.at[dest].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    valid = jnp.arange(k, dtype=jnp.int32) < count
    return jnp.where(valid & (rows >= 0), rows, -1)


_alloc_slots = jax.vmap(_alloc_slots_world, in_axes=(0, 0, None))


# ---------------------------------------------------------------------------
# StateManager
# ---------------------------------------------------------------------------


class StateManager:
    """Static schema + construction/ops for the batched ECS state.

    The analog of reference StateManager (src/core/state.cpp) minus all
    runtime allocation: every capacity is fixed at construction.
    """

    def __init__(
        self,
        registry: ECSRegistry,
        num_worlds: int,
        max_entities_per_world: Optional[int] = None,
    ):
        registry.freeze()
        self.registry = registry
        self.num_worlds = int(num_worlds)
        total_cap = sum(info.capacity for info in registry.archetypes.values())
        self.max_entities = int(max_entities_per_world or max(total_cap, 1))
        self.arch_index = {name: info.index for name, info in registry.archetypes.items()}

    # -- construction -----------------------------------------------------

    def make_initial_state(self, seed: int = 0) -> SimState:
        W = self.num_worlds
        arch_states = {}
        for name, info in self.registry.archetypes.items():
            cap = info.capacity
            comp_store = {}
            for comp in info.archetype.components:
                comp_store[comp.name] = {
                    fname: jnp.zeros((W, cap) + tuple(shape), dtype)
                    for fname, (shape, dtype) in comp.fields
                }
            arch_states[name] = {
                "mask": jnp.zeros((W, cap), jnp.bool_),
                "entity": jnp.full((W, cap), -1, Entity.dtype),
                "comps": comp_store,
            }
        singles = {}
        for name, comp in self.registry.singletons.items():
            singles[name] = {
                fname: jnp.zeros((W,) + tuple(shape), dtype)
                for fname, (shape, dtype) in comp.fields
            }
        keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(
            jnp.arange(W, dtype=jnp.uint32)
        )
        return {
            "arch": arch_states,
            "eid": {
                "loc_arch": jnp.full((W, self.max_entities), -1, jnp.int32),
                "loc_row": jnp.full((W, self.max_entities), -1, jnp.int32),
                "gen": jnp.zeros((W, self.max_entities), jnp.int32),
            },
            "singleton": singles,
            "user": {},
            "rng": keys,
            "tick": jnp.zeros((W,), jnp.int32),
            # per-world, per-archetype dropped-create counters: the masked
            # analog of the reference's capacity asserts
            # (src/core/state.inl:398-449).  Release builds count silently
            # (read via TaskGraphExecutor.overflow_counters()); GEM_TPU_DEBUG
            # also fires an in-step check() on any drop.
            "overflow": {
                name: jnp.zeros((W,), jnp.int32)
                for name in self.registry.archetypes
            },
        }

    # -- entity lifecycle -------------------------------------------------

    def make_entities(
        self,
        state: SimState,
        arch: Archetype,
        counts: jax.Array,  # int32 [W] (or python int broadcast)
        max_new: int,
        values: Optional[Dict[Component, Any]] = None,
    ) -> Tuple[SimState, jax.Array]:
        """Create up to ``counts[w]`` entities per world (max_new static cap).

        Returns (new_state, entities [W, max_new] int32; -1 where not
        created).  Functional analog of reference makeEntityNow
        (src/core/state.inl:398-449) batched over worlds.  Overflow (table or
        id space full) drops the excess creates — the masked analog of the
        reference's assert — and increments the per-world overflow counter
        (checked in-step under GEM_TPU_DEBUG).
        """
        W = self.num_worlds
        info = self.registry.archetypes[arch.name]
        astate = state["arch"][arch.name]
        counts = jnp.broadcast_to(jnp.asarray(counts, jnp.int32), (W,))

        rows = _alloc_slots(~astate["mask"], counts, max_new)  # [W, K]
        id_free = state["eid"]["loc_arch"] < 0
        eids = _alloc_slots(id_free, counts, max_new)  # [W, K]
        valid = (rows >= 0) & (eids >= 0)

        made = jnp.sum(valid.astype(jnp.int32), axis=1)
        dropped = jnp.maximum(counts, 0) - made
        debug.check(dropped == 0,
                    "make_entities overflow on archetype "
                    f"{arch.name}: dropped={{}} per world", dropped)
        rows = jnp.where(valid, rows, -1)
        eids = jnp.where(valid, eids, -1)

        gens = batched_gather(state["eid"]["gen"], eids)
        ents = jnp.where(valid, Entity.pack(eids, gens), -1)

        new_mask = batched_scatter(astate["mask"], rows, jnp.ones(rows.shape, jnp.bool_))
        new_ent_col = batched_scatter(astate["entity"], rows, ents)
        new_comps = dict(astate["comps"])
        prepared = {}
        if values:
            for comp, val in values.items():
                prepared[comp.name] = comp.validate_value(val, (W, max_new))
        for comp in info.archetype.components:
            store = dict(new_comps[comp.name])
            vals = prepared.get(comp.name)
            for fname, (shape, dtype) in comp.fields:
                if vals is not None:
                    v = vals[fname]
                else:
                    v = jnp.zeros((W, max_new) + tuple(shape), dtype)
                store[fname] = batched_scatter(store[fname], rows, v)
            new_comps[comp.name] = store

        new_arch = dict(state["arch"])
        new_arch[arch.name] = {"mask": new_mask, "entity": new_ent_col, "comps": new_comps}

        eid_state = state["eid"]
        aidx = jnp.full(rows.shape, info.index, jnp.int32)
        new_loc_arch = batched_scatter(eid_state["loc_arch"], eids, aidx)
        new_loc_row = batched_scatter(eid_state["loc_row"], eids, rows)

        new_state = dict(state)
        new_state["arch"] = new_arch
        new_state["eid"] = {
            "loc_arch": new_loc_arch,
            "loc_row": new_loc_row,
            "gen": eid_state["gen"],
        }
        new_state["overflow"] = {
            **state["overflow"],
            arch.name: state["overflow"][arch.name] + dropped,
        }
        return new_state, ents

    def destroy_entities(
        self,
        state: SimState,
        ents: jax.Array,  # int32 [W, K]
        valid: Optional[jax.Array] = None,
    ) -> SimState:
        """Destroy entities (null/-1 and stale-generation handles ignored).

        Functional analog of reference destroyEntityNow
        (src/core/state.inl + state.cpp) batched over worlds.
        """
        eid_state = state["eid"]
        eids = Entity.id(ents)
        gens = Entity.gen(ents)
        ok = ~Entity.is_null(ents)
        if valid is not None:
            ok = ok & valid
        cur_gen = batched_gather(eid_state["gen"], eids)
        loc_arch = batched_gather(eid_state["loc_arch"], eids)
        loc_row = batched_gather(eid_state["loc_row"], eids)
        ok = ok & ((cur_gen & ENTITY_GEN_MASK) == gens) & (loc_arch >= 0)

        new_arch = dict(state["arch"])
        for name, info in self.registry.archetypes.items():
            sel = ok & (loc_arch == info.index)
            astate = new_arch[name]
            rows = jnp.where(sel, loc_row, -1)
            mask = batched_scatter(astate["mask"], rows, jnp.zeros(rows.shape, jnp.bool_))
            entc = batched_scatter(astate["entity"], rows,
                                   jnp.full(rows.shape, -1, Entity.dtype))
            new_arch[name] = {"mask": mask, "entity": entc, "comps": astate["comps"]}

        rel = jnp.where(ok, eids, -1)
        new_loc_arch = batched_scatter(eid_state["loc_arch"], rel,
                                       jnp.full(rel.shape, -1, jnp.int32))
        new_loc_row = batched_scatter(eid_state["loc_row"], rel,
                                      jnp.full(rel.shape, -1, jnp.int32))
        cur = batched_gather(eid_state["gen"], rel)
        new_gen = batched_scatter(eid_state["gen"], rel, cur + 1)

        new_state = dict(state)
        new_state["arch"] = new_arch
        new_state["eid"] = {"loc_arch": new_loc_arch, "loc_row": new_loc_row, "gen": new_gen}
        return new_state

    def emit_temporaries(
        self,
        state: SimState,
        arch: Archetype,
        counts: jax.Array,
        values: Dict[Component, Any],
        count_overflow: bool = True,
    ) -> SimState:
        """Fast-path creation into an EMPTY temporary archetype.

        The analog of the reference's ``makeTemporary`` rows (used for
        CandidateTemporary / Contact archetypes, physics.hpp:184-193):
        temporaries carry no entity ids in the reference either, and are
        cleared wholesale each step.  Because the table is empty and
        allocation is lowest-index-first, the new rows are exactly the
        prefix 0..counts-1 — so creation is a dense column write plus a
        prefix mask, with zero scatters (the TPU win over the generic
        make_entities path).

        ``values`` arrays are [W, K, ...] with K <= capacity; counts is
        clipped to K (the clip increments the archetype's per-world
        overflow counter and, under GEM_TPU_DEBUG, fires an in-step
        check()).  Rows have no entity handles (entity column = -1); look
        them up by row, not by handle.

        Only archetypes registered with ``temporary=True`` are accepted:
        this call wholesale-replaces the mask/entity columns, which would
        leak the entity ids of any real (handle-carrying) rows.

        count_overflow=False skips the counter/check: pass it when the
        emission is OBSERVABILITY-ONLY (nothing in the step consumes the
        rows, e.g. the fused-kernel paths that solve in VMEM) — the
        counter would otherwise keep the producer computation live that
        XLA DCE deletes when the temporaries go unobserved, and clipping
        an unobserved emission affects nothing.
        """
        info = self.registry.archetypes[arch.name]
        if not info.temporary:
            raise ValueError(
                f"emit_temporaries({arch.name}): archetype must be "
                "registered with temporary=True — emitting into a normal "
                "archetype would wholesale-replace its mask/entity columns "
                "and leak any live entity handles")
        cap = info.capacity
        W = self.num_worlds
        counts = jnp.broadcast_to(jnp.asarray(counts, jnp.int32), (W,))

        new_comps = dict(state["arch"][arch.name]["comps"])
        k = None
        for comp, val in values.items():
            prepared_shape_src = val if not comp.scalar else {"value": val}
            first = next(iter(prepared_shape_src.values()))
            k = first.shape[1] if k is None else k
        if k is None:
            k = cap
        k = min(k, cap)
        if count_overflow:
            dropped = jnp.maximum(counts, 0) - jnp.clip(counts, 0, k)
            debug.check(dropped == 0,
                        "emit_temporaries overflow on archetype "
                        f"{arch.name} (capacity {cap}, K {k}): "
                        "dropped={} per world", dropped)
        counts = jnp.minimum(counts, k)

        for comp, val in values.items():
            prepared = comp.validate_value(val, (W, k))
            store = dict(new_comps[comp.name])
            for fname, (shape, dtype) in comp.fields:
                v = prepared[fname]
                if k == cap:
                    store[fname] = v
                else:
                    store[fname] = jnp.zeros((W, cap) + tuple(shape), dtype).at[
                        :, :k
                    ].set(v)
            new_comps[comp.name] = store

        mask = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts[:, None]
        new_arch = dict(state["arch"])
        new_arch[arch.name] = {
            "mask": mask,
            "entity": jnp.full((W, cap), -1, Entity.dtype),
            "comps": new_comps,
        }
        new_state = dict(state)
        new_state["arch"] = new_arch
        if count_overflow:
            new_state["overflow"] = {
                **state["overflow"],
                arch.name: state["overflow"][arch.name] + dropped,
            }
        return new_state

    def destroy_rows(self, state: SimState, arch: Archetype,
                     dead: jax.Array) -> SimState:
        """Destroy all rows of ``arch`` where ``dead`` [W, cap] is set.

        The scatter-free fast path for "destroy every entity matching a
        condition" (the reference's cleanup-query pattern,
        examples/fantasy_vs/fvs.cpp:212-227): the archetype side is pure
        elementwise masking, and the id-table side gathers each id slot's
        death flag through loc_row (a one-hot matmul) instead of
        scattering row-by-row.  Measured 7x faster than handle-based
        destroy_entities at 16K worlds (TPU scatters serialize)."""
        info = self.registry.archetypes[arch.name]
        astate = state["arch"][arch.name]
        dead = dead & astate["mask"]

        new_arch = dict(state["arch"])
        new_arch[arch.name] = {
            "mask": astate["mask"] & ~dead,
            "entity": jnp.where(dead, -1, astate["entity"]),
            "comps": astate["comps"],
        }

        eid_state = state["eid"]
        owned = eid_state["loc_arch"] == info.index
        # each id slot's row -> was that row destroyed?
        dead_at_loc = batched_gather(dead, eid_state["loc_row"])
        sel = owned & dead_at_loc & (eid_state["loc_row"] >= 0)
        new_state = dict(state)
        new_state["arch"] = new_arch
        new_state["eid"] = {
            "loc_arch": jnp.where(sel, -1, eid_state["loc_arch"]),
            "loc_row": jnp.where(sel, -1, eid_state["loc_row"]),
            "gen": jnp.where(sel, eid_state["gen"] + 1, eid_state["gen"]),
        }
        return new_state

    def clear_archetype(self, state: SimState, arch: Archetype) -> SimState:
        """Free every row of an archetype in every world (reference
        clearArchetype / ClearTmpNode, taskgraph.hpp:125-134).

        Component stores are zeroed: a cleared table holds no observable
        data (the reference leaves stale bytes, which are equally
        unobservable).  Zeroing matters on TPU — it lets XLA dead-code-
        eliminate the *production* of temporary rows that nothing consumed
        before the clear, which is how the jit step avoids paying for
        unobserved temporaries (the fusion analog of the reference's
        megakernel keeping temporaries in registers)."""
        info = self.registry.archetypes[arch.name]
        astate = state["arch"][arch.name]
        eid_state = state["eid"]
        # Free all entity ids pointing at this archetype.
        owned = eid_state["loc_arch"] == info.index
        new_state = dict(state)
        new_state["eid"] = {
            "loc_arch": jnp.where(owned, -1, eid_state["loc_arch"]),
            "loc_row": jnp.where(owned, -1, eid_state["loc_row"]),
            "gen": jnp.where(owned, eid_state["gen"] + 1, eid_state["gen"]),
        }
        new_arch = dict(state["arch"])
        new_arch[arch.name] = {
            "mask": jnp.zeros_like(astate["mask"]),
            "entity": jnp.full_like(astate["entity"], -1),
            "comps": jax.tree_util.tree_map(jnp.zeros_like, astate["comps"]),
        }
        new_state["arch"] = new_arch
        return new_state

    # -- component access by entity handle --------------------------------

    def lookup(self, state: SimState, ents: jax.Array):
        """Entity handles -> (arch_index [..], row [..], live bool [..]).

        Analog of reference EntityStore getLoc (state.hpp:64-97)."""
        eid_state = state["eid"]
        eids = Entity.id(ents)
        gens = Entity.gen(ents)
        cur_gen = batched_gather(eid_state["gen"], eids)
        loc_arch = batched_gather(eid_state["loc_arch"], eids)
        loc_row = batched_gather(eid_state["loc_row"], eids)
        live = (~Entity.is_null(ents)) & (loc_arch >= 0) & (
            (cur_gen & ENTITY_GEN_MASK) == gens
        )
        return loc_arch, loc_row, live

    def get_component(
        self, state: SimState, comp: Component, ents: jax.Array
    ) -> Tuple[Any, jax.Array]:
        """Gather component values for entity handles [W, K].

        Returns (value, live_mask).  Gathers across every archetype holding
        the component (reference Context::get, context.inl)."""
        loc_arch, loc_row, live = self.lookup(state, ents)
        W, K = ents.shape[0], ents.shape[1]
        out = {
            fname: jnp.zeros((W, K) + tuple(shape), dtype)
            for fname, (shape, dtype) in comp.fields
        }
        found = jnp.zeros((W, K), jnp.bool_)
        for info in self.registry.archetypes_with(comp):
            sel = live & (loc_arch == info.index)
            store = state["arch"][info.archetype.name]["comps"][comp.name]
            for fname in out:
                v = batched_gather(store[fname], jnp.where(sel, loc_row, 0))
                selb = sel.reshape(sel.shape + (1,) * (v.ndim - 2))
                out[fname] = jnp.where(selb, v, out[fname])
            found = found | sel
        if comp.scalar:
            return out["value"], found
        return out, found

    def set_component(
        self,
        state: SimState,
        comp: Component,
        ents: jax.Array,
        value: Any,
        valid: Optional[jax.Array] = None,
    ) -> SimState:
        """Scatter component values to entity handles [W, K]."""
        loc_arch, loc_row, live = self.lookup(state, ents)
        if valid is not None:
            live = live & valid
        W, K = ents.shape[0], ents.shape[1]
        prepared = comp.validate_value(value, (W, K))
        new_arch = dict(state["arch"])
        for info in self.registry.archetypes_with(comp):
            sel = live & (loc_arch == info.index)
            astate = new_arch[info.archetype.name]
            store = dict(astate["comps"][comp.name])
            rows = jnp.where(sel, loc_row, -1)
            for fname in prepared:
                store[fname] = batched_scatter(store[fname], rows, prepared[fname])
            comps = dict(astate["comps"])
            comps[comp.name] = store
            new_arch[info.archetype.name] = {
                "mask": astate["mask"],
                "entity": astate["entity"],
                "comps": comps,
            }
        new_state = dict(state)
        new_state["arch"] = new_arch
        return new_state

    # -- direct column access ---------------------------------------------

    def column(self, state: SimState, arch: Archetype, comp: Component):
        """The raw SoA column [W, cap, ...] (scalar comps unwrap)."""
        store = state["arch"][arch.name]["comps"][comp.name]
        if comp.scalar:
            return store["value"]
        return dict(store)

    def set_column(self, state: SimState, arch: Archetype, comp: Component, value) -> SimState:
        astate = state["arch"][arch.name]
        old = astate["comps"][comp.name]
        if comp.scalar:
            value = {"value": jnp.asarray(value, old["value"].dtype)}
        new_store = {}
        for fname, oldarr in old.items():
            v = jnp.asarray(value[fname], oldarr.dtype)
            if v.shape != oldarr.shape:
                raise ValueError(
                    f"set_column {arch.name}.{comp.name}.{fname}: shape {v.shape} != {oldarr.shape}"
                )
            new_store[fname] = v
        comps = dict(astate["comps"])
        comps[comp.name] = new_store
        new_arch = dict(state["arch"])
        new_arch[arch.name] = {"mask": astate["mask"], "entity": astate["entity"], "comps": comps}
        new_state = dict(state)
        new_state["arch"] = new_arch
        return new_state

    def row_mask(self, state: SimState, arch: Archetype) -> jax.Array:
        return state["arch"][arch.name]["mask"]

    def entity_column(self, state: SimState, arch: Archetype) -> jax.Array:
        return state["arch"][arch.name]["entity"]

    def num_rows(self, state: SimState, arch: Archetype) -> jax.Array:
        """Live row count per world [W] (reference archetypeCount)."""
        return jnp.sum(state["arch"][arch.name]["mask"].astype(jnp.int32), axis=1)

    # -- queries (reference query.hpp / makeQuery) --------------------------

    def query(self, *comps):
        """Compile a component-set query: the list of matching archetypes
        (reference StateManager::makeQuery, src/core/state.cpp; Query
        objects, include/madrona/query.hpp:17-105).  Queries are static —
        compile once, reuse every step."""
        return tuple(self.registry.archetypes_with(*comps))

    def query_columns(self, state: SimState, query, comps):
        """Iterate a compiled query: yields (archetype, [columns...], mask)
        per matching archetype (reference iterateArchetypes,
        src/core/state.inl:358-384)."""
        for info in query:
            cols = [self.column(state, info.archetype, c) for c in comps]
            yield info.archetype, cols, self.row_mask(state, info.archetype)

    # -- singletons --------------------------------------------------------

    def get_singleton(self, state: SimState, comp: Component):
        store = state["singleton"][comp.name]
        if comp.scalar:
            return store["value"]
        return dict(store)

    def set_singleton(self, state: SimState, comp: Component, value) -> SimState:
        old = state["singleton"][comp.name]
        if comp.scalar:
            value = {"value": value}
        new_store = {f: jnp.asarray(value[f], old[f].dtype).reshape(old[f].shape)
                     for f in old}
        singles = dict(state["singleton"])
        singles[comp.name] = new_store
        new_state = dict(state)
        new_state["singleton"] = singles
        return new_state
