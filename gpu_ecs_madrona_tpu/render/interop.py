"""RenderingSystem — instance/camera data export for batch rendering.

TPU redesign of reference src/mw/render/interop.cpp + include/madrona/
mw_render.hpp: the reference packs per-entity TLAS instance descriptors
(instanceTransformSetup, interop.cpp:10-60, atomic slot counters) and
per-view camera data (updateViewData, interop.cpp:62-93) into buffers the
Vulkan renderer consumes.  Here the packed buffers are singleton-style
per-world arrays updated by ordinary taskgraph nodes, consumed by the
Pallas/JAX batch renderer (render.renderer) — no atomics: instance slot =
row index (dense masked layout).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.core import base
from gpu_ecs_madrona_tpu.core.component import Archetype, component
from gpu_ecs_madrona_tpu.core.context import Context
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
from gpu_ecs_madrona_tpu.core.taskgraph import NodeID, TaskGraphBuilder

# reference render::ObjectID alias (mw_render.hpp) — reuses base ObjectID.
# ActiveView (mw_render.hpp:16-24): per-agent camera parameters.
ActiveView = component(
    "ActiveView",
    view_idx=((), jnp.int32),
    tan_fov=((), jnp.float32),
    eye_offset=((3,), jnp.float32),
)

# Packed outputs (reference InstanceData / ViewData buffers)
RenderInstances = component(
    "RenderInstances",
    # packed per row of the renderable archetype
    txfm_pos=((3,), jnp.float32),
    txfm_rot=((4,), jnp.float32),
    txfm_scale=((3,), jnp.float32),
    obj_id=((), jnp.int32),
)
RenderViews = component(
    "RenderViews",
    eye=((3,), jnp.float32),
    rot=((4,), jnp.float32),
    tan_fov=((), jnp.float32),
)


class RenderingSystem:
    """reference render::RenderingSystem (mw_render.hpp:27-40)."""

    @staticmethod
    def register_types(registry: ECSRegistry):
        registry.register_component(ActiveView)

    @staticmethod
    def init(ctx: Context, renderable_archetypes: Sequence[Archetype] = (),
             view_archetype: Optional[Archetype] = None, max_views: int = 1):
        """reference RenderingSystem::init (interop.cpp:183-211) — the
        per-world RendererState grid layout is unnecessary here (worlds are
        batch entries, not a spatial grid).  Pre-creates the packed render
        buffers in ctx.data so the state pytree structure is stable across
        steps (donation requires matching in/out structures)."""
        W = ctx.num_worlds
        render = {}
        for arch in renderable_archetypes:
            cap = ctx.mgr.registry.archetypes[arch.name].capacity
            render[arch.name] = {
                "pos": jnp.zeros((W, cap, 3)),
                "rot": jnp.zeros((W, cap, 4)).at[..., 0].set(1.0),
                "scale": jnp.ones((W, cap, 3)),
                "obj_id": jnp.zeros((W, cap), jnp.int32),
                "mask": jnp.zeros((W, cap), bool),
            }
        if view_archetype is not None:
            cap = ctx.mgr.registry.archetypes[view_archetype.name].capacity
            render["__views__"] = {
                "eye": jnp.zeros((W, cap, 3)),
                "rot": jnp.zeros((W, cap, 4)).at[..., 0].set(1.0),
                "tan_fov": jnp.ones((W, cap)),
                "mask": jnp.zeros((W, cap), bool),
            }
        user = dict(ctx.data)
        user["render"] = render
        ctx.data = user

    @staticmethod
    def setup_view(ctx: Context, fov_degrees: float, view_idx=0,
                   eye_offset=(0.0, 0.0, 0.0)):
        """reference RenderingSystem::setupView (mw_render.hpp:35-37).
        Returns an ActiveView value dict for make_entities."""
        import math as pymath

        W = ctx.num_worlds
        tan_fov = pymath.tan(pymath.radians(fov_degrees) / 2.0)
        return {
            "view_idx": jnp.broadcast_to(jnp.int32(view_idx), (W, 1)),
            "tan_fov": jnp.full((W, 1), tan_fov, jnp.float32),
            "eye_offset": jnp.broadcast_to(
                jnp.asarray(eye_offset, jnp.float32), (W, 1, 3)),
        }

    @staticmethod
    def setup_tasks(
        builder: TaskGraphBuilder,
        deps: Sequence[NodeID],
        renderable_archetypes: Sequence[Archetype],
        view_archetype: Optional[Archetype] = None,
    ) -> NodeID:
        """Pack instance transforms + views into user-data render buffers
        (reference setupTasks, interop.cpp:114-139).  Buffers appear in
        ctx.data["render"] with one entry per renderable archetype."""

        def pack(ctx: Context):
            render = {}
            for arch in renderable_archetypes:
                pos = ctx.column(arch, base.Position)
                rot = ctx.column(arch, base.Rotation)
                has_scale = arch.has(base.Scale)
                scale = (ctx.column(arch, base.Scale) if has_scale
                         else jnp.ones_like(pos))
                obj = ctx.column(arch, base.ObjectID)
                mask = ctx.row_mask(arch)
                render[arch.name] = {
                    "pos": pos, "rot": rot, "scale": scale,
                    "obj_id": obj, "mask": mask,
                }
            if view_archetype is not None:
                vpos = ctx.column(view_archetype, base.Position)
                vrot = ctx.column(view_archetype, base.Rotation)
                av = ctx.column(view_archetype, ActiveView)
                vmask = ctx.row_mask(view_archetype)
                # route each view row into its view_idx slot (reference
                # updateViewData writes viewData[view_idx], interop.cpp:
                # 62-93) — masked sum over rows, slot counts are tiny
                cap = vpos.shape[1]
                slots = jnp.arange(cap, dtype=jnp.int32)
                sel = ((av["view_idx"][:, :, None] == slots[None, None, :])
                       & vmask[:, :, None])
                self_f = sel.astype(jnp.float32)

                def packv(x):
                    # values side exact — one-bf16-pass (TPU default)
                    # truncates camera eye/rot to ~3 digits (utils/math.py
                    # EXACT note); the one-hot selector side stays cheap.
                    hp = (jax.lax.Precision.DEFAULT,
                          jax.lax.Precision.HIGHEST)
                    if x.ndim == 2:
                        return jnp.einsum("wrs,wr->ws", self_f, x,
                                          precision=hp)
                    return jnp.einsum("wrs,wrc->wsc", self_f, x,
                                      precision=hp)

                render["__views__"] = {
                    "eye": packv(vpos + av["eye_offset"]),
                    "rot": packv(vrot),
                    "tan_fov": packv(av["tan_fov"]),
                    "mask": jnp.any(sel, axis=1),
                }
            user = dict(ctx.data)
            user["render"] = render
            ctx.data = user

        return builder.add_node(pack, deps, name="render_pack")

    @staticmethod
    def reset(ctx: Context):
        """reference RenderingSystem::reset (interop.cpp)."""
