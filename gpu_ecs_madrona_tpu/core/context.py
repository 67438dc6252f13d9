"""Context — the imperative façade system code sees during tracing.

TPU-native analog of reference Context (include/madrona/context.hpp:17-159).
The reference hands each system a per-world Context with mutable component
refs.  Here, the entire step is traced once by jax.jit, so Context can look
imperative — every "mutation" rebinds the underlying state pytree to new
traced arrays — while the compiled step remains a pure function
state -> state.  This is the direct analog of how the reference's megakernel
threads all systems through one persistent device state.

All accessors operate on the full worlds batch: components come back with a
leading [num_worlds, ...] axis.  Per-row system functions are vmapped by
ParallelForNode (see taskgraph.py), matching the reference's row loop
(src/core/state.inl iterateArchetypesImpl / device/taskgraph.inl:168-201).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core.component import Archetype, Component, Entity
from gpu_ecs_madrona_tpu.core.state import SimState, StateManager


class Context:
    """Mutable view over a SimState during one traced step."""

    def __init__(self, mgr: StateManager, state: SimState):
        self._mgr = mgr
        self._state = dict(state)

    # -- raw state ---------------------------------------------------------

    @property
    def state(self) -> SimState:
        return self._state

    def set_state(self, state: SimState):
        """Replace the underlying state wholesale (used by whole-state
        transforms like TaskGraphBuilder.reset_node)."""
        self._state = dict(state)

    @property
    def mgr(self) -> StateManager:
        return self._mgr

    @property
    def num_worlds(self) -> int:
        return self._mgr.num_worlds

    # -- per-world user data (reference ctx.data() / WorldBase) ------------

    @property
    def data(self) -> Dict[str, Any]:
        return self._state["user"]

    @data.setter
    def data(self, value):
        self._state["user"] = value

    # -- entity lifecycle ---------------------------------------------------

    def make_entities(self, arch: Archetype, counts, max_new: int,
                      values: Optional[Dict[Component, Any]] = None) -> jax.Array:
        """Batched makeEntityNow (reference context.hpp:33-35)."""
        self._state, ents = self._mgr.make_entities(
            self._state, arch, counts, max_new, values)
        return ents

    def destroy_entities(self, ents, valid=None):
        """Batched destroyEntityNow (reference context.hpp:50-52)."""
        self._state = self._mgr.destroy_entities(self._state, ents, valid)

    def clear_archetype(self, arch: Archetype):
        self._state = self._mgr.clear_archetype(self._state, arch)

    def destroy_rows(self, arch: Archetype, dead):
        """Scatter-free destroy-by-row-mask (see StateManager.destroy_rows)."""
        self._state = self._mgr.destroy_rows(self._state, arch, dead)

    def emit_temporaries(self, arch: Archetype, counts, values,
                         count_overflow: bool = True):
        """Fast creation into an empty temporary archetype (reference
        makeTemporary; see StateManager.emit_temporaries)."""
        self._state = self._mgr.emit_temporaries(
            self._state, arch, counts, values,
            count_overflow=count_overflow)

    def add_overflow(self, arch: Archetype, counts):
        """Account capacity-shaped losses into ``arch``'s per-world
        overflow counter (the surface read by
        TaskGraphExecutor.overflow_counters()).  For producers whose drops
        happen outside emit_temporaries — e.g. the sweep-and-prune
        broadphase window saturating (possible missed pairs)."""
        ov = dict(self._state["overflow"])
        ov[arch.name] = ov[arch.name] + jnp.asarray(counts, jnp.int32)
        self._state["overflow"] = ov

    # -- component access ---------------------------------------------------

    def get(self, comp: Component, ents) -> Tuple[Any, jax.Array]:
        """Gather by entity handle; returns (values, live_mask)
        (reference ctx.get<T>(e), context.inl)."""
        return self._mgr.get_component(self._state, comp, ents)

    def set(self, comp: Component, ents, value, valid=None):
        self._state = self._mgr.set_component(self._state, comp, ents, value, valid)

    def column(self, arch: Archetype, comp: Component):
        """Direct SoA column [W, cap, ...] (reference ArchetypeRef::component)."""
        return self._mgr.column(self._state, arch, comp)

    def set_column(self, arch: Archetype, comp: Component, value):
        self._state = self._mgr.set_column(self._state, arch, comp, value)

    def row_mask(self, arch: Archetype) -> jax.Array:
        return self._mgr.row_mask(self._state, arch)

    def entity_column(self, arch: Archetype) -> jax.Array:
        return self._mgr.entity_column(self._state, arch)

    def num_rows(self, arch: Archetype) -> jax.Array:
        return self._mgr.num_rows(self._state, arch)

    # -- queries -------------------------------------------------------------

    def query(self, *comps):
        """reference ctx.query<Components...>() (context.hpp:107-110)."""
        return self._mgr.query(*comps)

    def for_each(self, query, comps, fn):
        """reference ctx.forEach(query, fn) (context.hpp:112-117): calls
        fn(archetype, columns, mask) per matching archetype — batch-level,
        the caller vectorizes over rows."""
        for arch, cols, mask in self._mgr.query_columns(self._state, query, comps):
            fn(arch, cols, mask)

    # -- singletons ----------------------------------------------------------

    def singleton(self, comp: Component):
        """reference ctx.getSingleton<T>() (context.hpp:96-98)."""
        return self._mgr.get_singleton(self._state, comp)

    def set_singleton(self, comp: Component, value):
        self._state = self._mgr.set_singleton(self._state, comp, value)

    # -- tick / RNG ----------------------------------------------------------

    @property
    def tick(self) -> jax.Array:
        return self._state["tick"]

    def advance_tick(self):
        self._state["tick"] = self._state["tick"] + 1

    def rng(self, n: int = 1) -> jax.Array:
        """Split ``n`` fresh per-world PRNG keys [W, n, 2].

        The reference has no engine RNG (examples use thread_local mt19937,
        e.g. examples/collisions/collisions.cpp:20-26); counter-based
        per-world keys are the deterministic TPU-native replacement.
        """
        keys = self._state["rng"]  # [W, 2]
        split = jax.vmap(lambda k: jax.random.split(k, n + 1))(keys)  # [W, n+1, 2]
        self._state["rng"] = split[:, 0]
        return split[:, 1:]

    def rng_one(self) -> jax.Array:
        """One fresh key per world [W, 2]."""
        return self.rng(1)[:, 0]
