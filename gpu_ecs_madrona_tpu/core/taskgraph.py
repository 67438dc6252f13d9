"""TaskGraph: dependency-ordered system nodes traced into one jit step.

TPU-native redesign of the reference's taskgraph executor:
  - reference Builder + topo sort: include/madrona/taskgraph.hpp:41-83,
    src/core/taskgraph.cpp:46-109 (CPU) and src/mw/device/taskgraph_utils.cpp
    :68-140 (GPU).  Same API shape here (add nodes with dependency lists,
    sort at build).
  - reference megakernel execution: one CUDA kernel walks the sorted node
    list per world-thread (src/mw/device/megakernel_impl.inl:44-55).  Here
    the sorted node list is traced *in order* into a single Python function
    and handed to jax.jit — the jit-compiled step function IS the
    megakernel: XLA fuses across nodes, and every node operates on all
    worlds at once (lockstep batch) instead of one world per thread.
  - reference ParallelForNode row loop (device/taskgraph.inl:168-201): here
    a per-row system function vmapped over (worlds, rows) with the live-row
    mask gating writebacks.

Node functions must be traceable (no data-dependent Python control flow);
use jnp.where / lax.cond / lax.scan inside systems, exactly as the
reference's systems must avoid host calls inside the megakernel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core.component import Archetype, Component
from gpu_ecs_madrona_tpu.core.context import Context
from gpu_ecs_madrona_tpu.core.state import SimState, StateManager


@dataclasses.dataclass(frozen=True)
class NodeID:
    """Handle returned by builder methods, used to express dependencies
    (reference TaskGraph::NodeID, taskgraph.hpp:33-39)."""

    idx: int


@dataclasses.dataclass
class RowCtx:
    """Per-row view handed to ParallelFor system functions.

    The TPU analog of the reference Context inside a system callback
    (device/taskgraph.inl:190-199): world-level user data (broadcast), the
    live-flag for this row, a per-row PRNG key, and scalar indices.
    """

    data: Any          # per-world user data pytree (leading axes stripped)
    singletons: Dict[str, Any]  # per-world singleton values
    key: jax.Array     # per-row PRNG key [2]
    world: jax.Array   # scalar world index
    row: jax.Array     # scalar row index
    tick: jax.Array    # scalar tick for this world
    live: jax.Array    # scalar bool: row currently alive

    def singleton(self, comp: Component):
        return self.singletons[comp.name]


@dataclasses.dataclass
class _Node:
    name: str
    run: Callable[[Context], None]
    deps: Tuple[int, ...]


class TaskGraphBuilder:
    """Stage nodes + dependencies, then build a sorted TaskGraph.

    API parity with reference TaskGraph::Builder (taskgraph.hpp:41-113):
      addNodeFn           -> add_node
      parallelForNode     -> parallel_for_node
      ClearTmpNode        -> clear_tmp_node
      ResetTmpAllocNode   -> no-op on TPU (no bump allocator; temporaries
                             are fixed-capacity archetypes) — kept as an
                             explicit no-op node for graph parity.
    """

    def __init__(self, mgr: StateManager):
        self.mgr = mgr
        self._nodes: List[_Node] = []

    # -- generic nodes -----------------------------------------------------

    def add_node(
        self,
        fn: Callable[[Context], None],
        deps: Sequence[NodeID] = (),
        name: Optional[str] = None,
    ) -> NodeID:
        name = name or getattr(fn, "__name__", f"node{len(self._nodes)}")
        node = _Node(name=name, run=fn, deps=tuple(d.idx for d in deps))
        self._nodes.append(node)
        return NodeID(len(self._nodes) - 1)

    # -- parallel-for over archetype rows ---------------------------------

    def parallel_for_node(
        self,
        fn: Callable,
        components: Sequence[Component],
        deps: Sequence[NodeID] = (),
        archetypes: Optional[Sequence[Archetype]] = None,
        name: Optional[str] = None,
        needs_rng: bool = False,
    ) -> NodeID:
        """Run ``fn(rowctx, *component_values) -> updated component values``
        for every live row of every archetype containing ``components``.

        ``fn`` is vmapped over (worlds, rows); returned values write back
        only where the row mask is set.  fn must tolerate garbage values on
        dead rows (they are never written back).  Matches reference
        ParallelForNode semantics (taskgraph.hpp:99-113) with query
        archetype-matching (src/core/state.cpp makeQuery).
        """
        components = tuple(components)
        mgr = self.mgr
        name = name or getattr(fn, "__name__", "parallel_for")

        def run(ctx: Context):
            matches = (
                [mgr.registry.archetypes[a.name] for a in archetypes]
                if archetypes is not None
                else mgr.registry.archetypes_with(*components)
            )
            W = mgr.num_worlds
            user = ctx.data
            for path, leaf in jax.tree_util.tree_leaves_with_path(user):
                if leaf.ndim == 0 or leaf.shape[0] != W:
                    raise ValueError(
                        f"ctx.data leaf {jax.tree_util.keystr(path)} has shape "
                        f"{leaf.shape}; every user-data leaf needs a leading "
                        f"num_worlds={W} axis (broadcast constants with "
                        f"jnp.broadcast_to or close over them in the system fn)"
                    )
            singles = {
                sname: mgr.get_singleton(ctx.state, comp)
                for sname, comp in mgr.registry.singletons.items()
            }
            tick = ctx.tick
            for info in matches:
                arch = info.archetype
                cap = info.capacity
                mask = ctx.row_mask(arch)
                cols = [ctx.column(arch, c) for c in components]
                if needs_rng:
                    wkeys = ctx.rng_one()  # [W, 2]
                else:
                    wkeys = jnp.zeros((W, 2), jnp.uint32)
                rows_iota = jnp.arange(cap, dtype=jnp.int32)
                worlds_iota = jnp.arange(W, dtype=jnp.int32)

                def per_row(user_w, singles_w, wkey, world, tick_w, row, live, *vals):
                    key = jax.random.fold_in(wkey, row) if needs_rng else wkey
                    rowctx = RowCtx(
                        data=user_w, singletons=singles_w, key=key,
                        world=world, row=row, tick=tick_w, live=live,
                    )
                    out = fn(rowctx, *vals)
                    if len(components) == 1 and not isinstance(out, tuple):
                        out = (out,)
                    return out

                inner = jax.vmap(
                    per_row,
                    in_axes=(None, None, None, None, None, 0, 0)
                    + (0,) * len(components),
                )
                outer = jax.vmap(
                    inner,
                    in_axes=(0, 0, 0, 0, 0, None, 0) + (0,) * len(components),
                )
                with jax.named_scope(f"pfor_{name}_{arch.name}"):
                    new_vals = outer(
                        user, singles, wkeys, worlds_iota, tick,
                        rows_iota, mask, *cols,
                    )
                for comp, old, new in zip(components, cols, new_vals):
                    merged = jax.tree_util.tree_map(
                        lambda o, n: jnp.where(
                            mask.reshape(mask.shape + (1,) * (o.ndim - 2)), n, o
                        ),
                        old, new,
                    )
                    ctx.set_column(arch, comp, merged)

        return self.add_node(run, deps, name=name)

    # -- temporaries -------------------------------------------------------

    def clear_tmp_node(self, arch: Archetype, deps: Sequence[NodeID] = ()) -> NodeID:
        """reference ClearTmpNode (taskgraph.hpp:125-134)."""

        def clear(ctx: Context):
            ctx.clear_archetype(arch)

        return self.add_node(clear, deps, name=f"clear_{arch.name}")

    def reset_node(
        self,
        condition_fn: Callable[[Context], jax.Array],
        init_fn: Callable[[Context], None],
        deps: Sequence[NodeID] = (),
        name: str = "episode_reset",
    ) -> NodeID:
        """Per-world episode auto-reset — the RL pattern the reference
        leaves to user code (its examples run fixed-length loops; RL users
        reset worlds out-of-band via exported flags).  Here reset is a
        framework node: worlds where ``condition_fn(ctx) -> [W] bool`` is
        True are rebuilt in place by running ``init_fn`` (normally the
        world class's ``init``) on a pristine state.

        Reset worlds draw fresh per-world RNG keys from the running stream,
        so episodes differ across resets yet the whole trajectory stays
        deterministic.  Non-reset worlds are untouched (per-leaf masked
        select — no host round-trip, stays inside the jit step).  Reset
        worlds restart at tick 0.
        """
        mgr = self.mgr

        def run(ctx: Context):
            done = condition_fn(ctx)
            fresh = mgr.make_initial_state(seed=0)
            fresh["rng"] = ctx.rng_one()   # fresh stream for reset worlds
            fctx = Context(mgr, fresh)
            init_fn(fctx)
            ini = fctx.state
            cur = ctx.state

            def merge(c, i):
                d = done.reshape((done.shape[0],) + (1,) * (c.ndim - 1))
                return jnp.where(d, i, c)

            ctx.set_state(jax.tree_util.tree_map(merge, cur, ini))

        return self.add_node(run, deps, name=name)

    def reset_tmp_alloc_node(self, deps: Sequence[NodeID] = ()) -> NodeID:
        """reference ResetTmpAllocNode (taskgraph.hpp:115-123) — no TPU
        analog needed (no bump allocator); kept as explicit no-op."""

        def noop(ctx: Context):
            pass

        return self.add_node(noop, deps, name="reset_tmp_alloc")

    # -- build -------------------------------------------------------------

    def build(self) -> "TaskGraph":
        """Topological sort preserving insertion order among ready nodes —
        same discipline as reference taskgraph.cpp:46-109."""
        n = len(self._nodes)
        indeg = [0] * n
        dependents: List[List[int]] = [[] for _ in range(n)]
        for i, node in enumerate(self._nodes):
            indeg[i] = len(node.deps)
            for d in node.deps:
                dependents[d].append(i)
        order: List[int] = []
        ready = [i for i in range(n) if indeg[i] == 0]
        while ready:
            i = ready.pop(0)
            order.append(i)
            for j in dependents[i]:
                indeg[j] -= 1
                if indeg[j] == 0:
                    ready.append(j)
        if len(order) != n:
            raise ValueError("taskgraph has a dependency cycle")
        return TaskGraph(self.mgr, [self._nodes[i] for i in order])


class TaskGraph:
    """A sorted node list; ``step`` traces every node in order."""

    def __init__(self, mgr: StateManager, nodes: List[_Node]):
        self.mgr = mgr
        self.nodes = nodes

    @property
    def node_names(self) -> List[str]:
        return [n.name for n in self.nodes]

    def step(self, state: SimState) -> SimState:
        """One simulation step across all worlds.  Trace-time analog of the
        reference megakernel node loop (megakernel_impl.inl:27-40)."""
        ctx = Context(self.mgr, state)
        for node in self.nodes:
            with jax.named_scope(node.name):
                node.run(ctx)
        ctx.advance_tick()
        return ctx.state
