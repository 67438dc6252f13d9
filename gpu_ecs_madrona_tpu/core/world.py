"""Decorator-based world definition — sugar over the builder protocol.

The raw protocol (executor.py) mirrors the reference's registerTypes /
setupTasks free functions (mw_cpu.inl:5-44).  This module adds the
Pythonic layer the reference's C++ templates can't offer: declare systems
as decorated methods and the taskgraph wires itself.

    class MyWorld(World):
        @staticmethod
        def register_types(registry): ...
        @staticmethod
        def init(ctx, init_data=None): ...

        @system(components=[Position, Velocity])
        def integrate(rowctx, pos, vel):            # per-row (vmapped)
            return pos + vel, vel

        @system()                                   # batch node
        def spawn(ctx): ...

        @system(after=["integrate"])                # explicit dependency
        def cleanup(ctx): ...

Ordering: systems chain in declaration order by default (each depends on
the previous one — the common sequential pipeline); pass ``after=[...]``
(names or function refs) for explicit DAG edges, or ``after=[]`` for a
root node.  Subclasses inherit base-class systems (declared first).
"""

from __future__ import annotations

import itertools
from typing import Callable, Optional, Sequence

from gpu_ecs_madrona_tpu.core.taskgraph import TaskGraphBuilder

_order_counter = itertools.count()


def system(fn: Optional[Callable] = None, *, components=None, archetypes=None,
           after: Optional[Sequence] = None, name: Optional[str] = None,
           needs_rng: bool = False):
    """Mark a world method as a taskgraph system.

    components given -> ParallelForNode (fn(rowctx, *values) per live row);
    omitted -> batch node (fn(ctx)).  See module doc for ordering rules.
    """

    def wrap(f):
        f._gem_system = {
            "order": next(_order_counter),
            "components": components,
            "archetypes": archetypes,
            "after": after,
            "name": name or f.__name__,
            "needs_rng": needs_rng,
        }
        return staticmethod(f)

    if fn is not None:
        return wrap(fn)
    return wrap


class World:
    """Base class wiring @system-decorated methods into setup_tasks."""

    @classmethod
    def _systems(cls):
        seen = {}
        for klass in reversed(cls.__mro__):
            for attr in vars(klass).values():
                f = getattr(attr, "__func__", attr)
                meta = getattr(f, "_gem_system", None)
                if meta is not None:
                    seen[meta["name"]] = (meta["order"], f, meta)
        return sorted(seen.values(), key=lambda t: t[0])

    @classmethod
    def setup_tasks(cls, builder: TaskGraphBuilder):
        ids = {}
        prev = []
        for _, f, meta in cls._systems():
            if meta["after"] is None:
                deps = prev
            else:
                deps = []
                for a in meta["after"]:
                    key = a if isinstance(a, str) else getattr(
                        a, "__name__", getattr(
                            getattr(a, "__func__", a), "__name__"))
                    if key not in ids:
                        raise ValueError(
                            f"system {meta['name']!r}: dependency {key!r} "
                            "not declared earlier")
                    deps.append(ids[key])
            if meta["components"] is not None:
                nid = builder.parallel_for_node(
                    f, meta["components"], deps=deps,
                    archetypes=meta["archetypes"], name=meta["name"],
                    needs_rng=meta["needs_rng"])
            else:
                nid = builder.add_node(f, deps=deps, name=meta["name"])
            ids[meta["name"]] = nid
            prev = [nid]

    # default no-op hooks (subclasses normally override)
    @staticmethod
    def register_types(registry):
        raise NotImplementedError

    @staticmethod
    def init(ctx, init_data=None):
        raise NotImplementedError
