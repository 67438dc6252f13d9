"""Component, Archetype and Entity definitions.

TPU-native redesign of the reference's ECS type layer:
  - components  : reference include/madrona/ecs.hpp:17-44 (C++ structs with a
                  TypeTracker integer id).  Here a ``Component`` is a named,
                  ordered set of fields, each field a (shape, dtype) leaf.
                  Storage is SoA jax arrays with a leading ``[num_worlds,
                  capacity]`` axis, so a "column" in the reference's Table
                  (src/common/table.cpp) becomes one jax array per field.
  - archetypes  : reference ``Archetype<Ts...>`` typelist (ecs.hpp:45-52).
  - entities    : reference ``Entity {gen, id}`` generational handle
                  (ecs.hpp:17-30).  Here an entity handle is a single int32
                  with the per-world entity id in the low bits and the
                  generation in the high bits, so entity-valued components
                  are ordinary int32 arrays (static shapes, TPU friendly).

Nothing in this module is a port: the reference stores components in typed
C++ columns addressed by pointer; this design names them and lets XLA lay
them out.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Entity handles
# ---------------------------------------------------------------------------

# Entity id bit layout (within one world's id space):
#   bits [0, ENTITY_ID_BITS)   : slot index into the world's entity store
#   bits [ENTITY_ID_BITS, 31)  : generation counter (wraps)
# -1 is the null entity (all bits set → gen/id patterns never collide since
# we mask on unpack and validate generation on lookup).
#
# The split is configurable via GEM_TPU_ENTITY_ID_BITS (read at import):
# the default 20/11 gives 1M ids/world and 2048 generations per slot.
# Long-running churn-heavy sims that recycle the same slot >2048 times can
# alias a stale handle (reference IDMap has 32-bit gens, id_map.hpp) —
# trade id space for generation headroom (e.g. 16 -> 32K gens) if so.
import os as _os

# 64-bit handles (opt-in): GEM_TPU_ENTITY_64=1 widens handles to int64
# with the reference's full 32-bit id + 31-bit generation headroom
# (Entity{gen,id} is 32+32, ecs.hpp:17-44) — the generation then
# realistically never wraps (2^31 reuse cycles per slot vs int32's 2^11
# default).  Requires jax_enable_x64 (set automatically at import when the
# flag is on).  Costs 2x handle memory/bandwidth; component data stays f32.
ENTITY_64 = _os.environ.get("GEM_TPU_ENTITY_64") == "1"
if ENTITY_64:
    import jax as _jax
    _jax.config.update("jax_enable_x64", True)
    ENTITY_ID_BITS = 32
    ENTITY_GEN_BITS = 31
    _HANDLE_NP = np.int64
else:
    ENTITY_ID_BITS = int(_os.environ.get("GEM_TPU_ENTITY_ID_BITS", 20))
    assert 4 <= ENTITY_ID_BITS <= 27, ENTITY_ID_BITS
    ENTITY_GEN_BITS = 31 - ENTITY_ID_BITS
    _HANDLE_NP = np.int32
ENTITY_ID_MASK = (1 << ENTITY_ID_BITS) - 1
ENTITY_GEN_MASK = (1 << ENTITY_GEN_BITS) - 1

NULL_ENTITY = _HANDLE_NP(-1)


class Entity:
    """Namespace for entity-handle helpers (handles are plain int arrays —
    int32 by default, int64 with GEM_TPU_ENTITY_64=1)."""

    dtype = jnp.int64 if ENTITY_64 else jnp.int32

    @staticmethod
    def pack(eid, gen):
        eid = jnp.asarray(eid, Entity.dtype)
        gen = jnp.asarray(gen, Entity.dtype)
        return (eid & ENTITY_ID_MASK) | ((gen & ENTITY_GEN_MASK) << ENTITY_ID_BITS)

    @staticmethod
    def id(e):
        # result fits int32 even in 64-bit mode (id mask is 32 bits; row
        # indices downstream are well below 2^31)
        return (jnp.asarray(e, Entity.dtype) & ENTITY_ID_MASK).astype(jnp.int32)

    @staticmethod
    def gen(e):
        return ((jnp.asarray(e, Entity.dtype) >> ENTITY_ID_BITS)
                & ENTITY_GEN_MASK).astype(jnp.int32)

    @staticmethod
    def is_null(e):
        return jnp.asarray(e, Entity.dtype) < 0

    @staticmethod
    def null():
        return Entity.dtype(-1)


# ---------------------------------------------------------------------------
# Components
# ---------------------------------------------------------------------------

FieldSpec = Tuple[Tuple[int, ...], Any]  # (shape, dtype)


@dataclasses.dataclass(frozen=True)
class Component:
    """A named component type: an ordered mapping field -> (shape, dtype).

    ``scalar`` components have exactly one field named "value"; their values
    are passed to/returned from systems as the bare array rather than a dict.
    """

    name: str
    fields: Tuple[Tuple[str, FieldSpec], ...]
    scalar: bool = False

    def __repr__(self):
        return f"Component({self.name})"

    def __hash__(self):
        return hash(self.name)

    def __eq__(self, other):
        return isinstance(other, Component) and other.name == self.name

    @property
    def field_dict(self) -> Dict[str, FieldSpec]:
        return dict(self.fields)

    def zero_value(self, leading: Tuple[int, ...]):
        """A zero-initialized value pytree with the given leading dims."""
        vals = {
            fname: jnp.zeros(leading + tuple(shape), dtype)
            for fname, (shape, dtype) in self.fields
        }
        if self.scalar:
            return vals["value"]
        return vals

    def validate_value(self, value, leading: Tuple[int, ...]):
        """Broadcast/convert a user-provided value to storage layout."""
        if self.scalar:
            value = {"value": value}
        out = {}
        for fname, (shape, dtype) in self.fields:
            v = jnp.asarray(value[fname], dtype)
            target = leading + tuple(shape)
            out[fname] = jnp.broadcast_to(v, target)
        return out


def component(
    name: str,
    spec: Union[FieldSpec, Dict[str, FieldSpec], None] = None,
    **field_kwargs: FieldSpec,
) -> Component:
    """Define a component type.

    ``component("Position", ((3,), jnp.float32))`` — scalar (single-array).
    ``component("Contact", normal=((3,), f32), a=((), i32))`` — struct.
    """
    if spec is not None and field_kwargs:
        raise ValueError("pass either a single spec or field kwargs, not both")
    if spec is None and not field_kwargs:
        raise ValueError(f"component {name} needs a field spec")
    if field_kwargs:
        fields = tuple((k, (tuple(v[0]), v[1])) for k, v in field_kwargs.items())
        return Component(name=name, fields=fields, scalar=False)
    if isinstance(spec, dict):
        fields = tuple((k, (tuple(v[0]), v[1])) for k, v in spec.items())
        return Component(name=name, fields=fields, scalar=False)
    shape, dtype = spec
    return Component(name=name, fields=(("value", (tuple(shape), dtype)),), scalar=True)


def singleton_component(name, spec=None, **field_kwargs) -> Component:
    """A singleton component (one instance per world, reference
    state.hpp registerSingleton / context.hpp getSingleton)."""
    return component(name, spec, **field_kwargs)


# The built-in Entity "column": every archetype implicitly stores the entity
# handle of each row (reference table.hpp column 0 stores Entity).
ENTITY_COMPONENT = component("__entity__", ((), Entity.dtype))


# ---------------------------------------------------------------------------
# Archetypes
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Archetype:
    """An archetype: a named, ordered set of component types.

    Mirrors reference ``Archetype<Components...>`` (include/madrona/ecs.hpp)
    — but capacity is a *static* per-archetype configuration (set at
    registration) because XLA requires static shapes; the reference grows
    tables dynamically (src/common/table.cpp:44-61) which has no TPU analog.
    """

    name: str
    components: Tuple[Component, ...]

    def __init__(self, name: str, components: Sequence[Component]):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "components", tuple(components))
        seen = set()
        for c in self.components:
            if c.name in seen:
                raise ValueError(f"duplicate component {c.name} in archetype {name}")
            seen.add(c.name)

    def __repr__(self):
        return f"Archetype({self.name})"

    def __hash__(self):
        return hash(self.name)

    def __eq__(self, other):
        return isinstance(other, Archetype) and other.name == self.name

    def has(self, comp: Component) -> bool:
        return any(c.name == comp.name for c in self.components)
