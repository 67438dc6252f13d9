"""Tile frustum culling (RendererConfig.tile_size) — the TPU-native
stand-in for the reference's per-world TLAS (vk/batch_renderer.cpp:491-514):
per-tile sphere-vs-cone culling + nearest-M survivors, O(M) per pixel
instead of O(N)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpu_ecs_madrona_tpu import Archetype, ExecutorConfig, TaskGraphExecutor
from gpu_ecs_madrona_tpu.core import base
from gpu_ecs_madrona_tpu.physics import assets
from gpu_ecs_madrona_tpu.render.interop import ActiveView, RenderingSystem
from gpu_ecs_madrona_tpu.render.renderer import BatchRenderer, RendererConfig


def build_sim(tile_size, max_per_tile, n_balls=24, res=32):
    loader = assets.PhysicsLoader()
    loader.load_objects([
        assets.make_sphere(0.5),
        assets.make_box((0.4, 0.4, 0.4)),
        assets.make_plane(),
    ])
    objmgr = loader.get_object_manager()

    Ball = Archetype("TCBall", [base.Position, base.Rotation, base.Scale,
                                base.ObjectID])
    Cam = Archetype("TCCam", [base.Position, base.Rotation, ActiveView])
    renderer = BatchRenderer(
        RendererConfig(width=res, height=res, max_views=1, backend="xla",
                       tile_size=tile_size,
                       max_instances_per_tile=max_per_tile),
        objmgr)

    class Wld:
        @staticmethod
        def register_types(registry):
            base.register_types(registry)
            RenderingSystem.register_types(registry)
            registry.register_archetype(Ball, capacity=n_balls + 1)
            registry.register_archetype(Cam, capacity=1)

        @staticmethod
        def init(ctx, init_data=None):
            W = ctx.num_worlds
            ctx.data = {}
            RenderingSystem.init(ctx, renderable_archetypes=[Ball],
                                 view_archetype=Cam, max_views=1)
            renderer.init_buffers(ctx)
            # deterministic grid of alternating spheres/boxes in front of
            # the camera, plus a ground plane
            idx = np.arange(n_balls)
            px = (idx % 5 - 2).astype(np.float32) * 1.6
            pz = (idx // 5).astype(np.float32) * 1.4 + 0.6
            py = 4.0 + (idx % 3).astype(np.float32) * 2.0
            pos = np.stack([px, py, pz], -1)[None].repeat(W, 0)
            oid = (idx % 2).astype(np.int32)[None].repeat(W, 0)
            ctx.make_entities(Ball, counts=n_balls, max_new=n_balls, values={
                base.Position: jnp.asarray(pos),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (W, n_balls, 4)),
                base.Scale: jnp.ones((W, n_balls, 3)),
                base.ObjectID: jnp.asarray(oid),
            })
            ctx.make_entities(Ball, counts=1, max_new=1, values={
                base.Position: jnp.zeros((W, 1, 3)),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (W, 1, 4)),
                base.Scale: jnp.ones((W, 1, 3)),
                base.ObjectID: jnp.full((W, 1), 2, jnp.int32),
            })
            v0 = RenderingSystem.setup_view(ctx, 90.0, view_idx=0)
            ctx.make_entities(Cam, counts=1, max_new=1, values={
                base.Position: jnp.broadcast_to(
                    jnp.array([0.0, -2.0, 1.5]), (W, 1, 3)),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (W, 1, 4)),  # looks +y
                ActiveView: v0,
            })

        @staticmethod
        def setup_tasks(builder):
            n = RenderingSystem.setup_tasks(builder, [], [Ball], Cam)
            renderer.setup_tasks(builder, [n], [Ball])

    sim = TaskGraphExecutor(Wld, ExecutorConfig(num_worlds=2,
                                                max_entities_per_world=64,
                                                seed=0, donate=False))
    sim.run(1)
    out = sim.state["user"]["render_out"]
    return np.asarray(out["rgb"]), np.asarray(out["depth"])


def test_tiled_matches_dense():
    """With per-tile capacity covering every instance, the tiled image is
    IDENTICAL to the dense O(N)-per-pixel image."""
    rgb_dense, depth_dense = build_sim(tile_size=0, max_per_tile=0)
    rgb_tiled, depth_tiled = build_sim(tile_size=16, max_per_tile=32)
    assert np.array_equal(rgb_dense, rgb_tiled)
    finite = np.isfinite(depth_dense)
    assert np.array_equal(finite, np.isfinite(depth_tiled))
    assert np.allclose(depth_dense[finite], depth_tiled[finite])
    # scene sanity: something actually rendered
    assert finite.any() and (rgb_dense[..., 3] > 0).any()


def test_tiled_capped_keeps_nearest():
    """A tiny per-tile cap drops farthest-first (by axial distance), so the
    capped depth can only ever get FARTHER than the dense depth — never
    nearer — and most pixels are still exact."""
    _, depth_dense = build_sim(tile_size=0, max_per_tile=0)
    _, depth_capped = build_sim(tile_size=16, max_per_tile=4)
    finite_c = np.isfinite(depth_capped)
    assert finite_c.any()
    # hits can never be nearer than the true nearest surface
    assert (depth_capped[finite_c] >= depth_dense[finite_c] - 1e-5).all()
    # and the cap only affects a minority of pixels in this scene
    exact = np.isclose(depth_capped[finite_c], depth_dense[finite_c],
                       atol=1e-5)
    assert exact.mean() > 0.8, exact.mean()


def build_sim_mesh(tile_size, max_per_tile, res=32, backend="xla"):
    """Scene with a triangle RENDER mesh (an L-shaped non-convex prism)
    on one object, plus spheres and a ground plane — exercises the
    tiles+meshes composition (Möller–Trumbore on tile survivors)."""
    loader = assets.PhysicsLoader()
    loader.load_objects([
        assets.make_sphere(0.5),
        assets.make_box((0.6, 0.6, 0.6)),
        assets.make_plane(),
    ])
    objmgr = loader.get_object_manager()

    # L-shaped prism (non-convex): exceeds nothing, but its shape differs
    # from the physics box so a mesh-vs-analytic mixup shows in pixels
    v2 = [(0, 0), (1.2, 0), (1.2, 0.5), (0.5, 0.5), (0.5, 1.2), (0, 1.2)]
    verts, tris = [], []
    for z in (-0.4, 0.4):
        for (x, y) in v2:
            verts.append((x - 0.6, y - 0.6, z))
    fan = [(0, 1, 2), (0, 2, 3), (0, 3, 4), (0, 4, 5)]
    for (a, b, c) in fan:
        tris.append((a, b, c))
        tris.append((6 + a, 6 + c, 6 + b))
    for i in range(6):
        j = (i + 1) % 6
        tris.append((i, j, 6 + j))
        tris.append((i, 6 + j, 6 + i))
    mesh = (np.asarray(verts, np.float32), np.asarray(tris, np.int32))

    Ball = Archetype("TMBall", [base.Position, base.Rotation, base.Scale,
                                base.ObjectID])
    Cam = Archetype("TMCam", [base.Position, base.Rotation, ActiveView])
    renderer = BatchRenderer(
        RendererConfig(width=res, height=res, max_views=1, backend=backend,
                       tile_size=tile_size,
                       max_instances_per_tile=max_per_tile,
                       max_tris=32),
        objmgr, render_meshes={1: mesh})

    n_inst = 9

    class Wld:
        @staticmethod
        def register_types(registry):
            base.register_types(registry)
            RenderingSystem.register_types(registry)
            registry.register_archetype(Ball, capacity=n_inst + 1)
            registry.register_archetype(Cam, capacity=1)

        @staticmethod
        def init(ctx, init_data=None):
            W = ctx.num_worlds
            ctx.data = {}
            RenderingSystem.init(ctx, renderable_archetypes=[Ball],
                                 view_archetype=Cam, max_views=1)
            renderer.init_buffers(ctx)
            idx = np.arange(n_inst)
            px = (idx % 3 - 1).astype(np.float32) * 2.0
            pz = (idx // 3).astype(np.float32) * 1.5 + 0.6
            py = 4.0 + (idx % 2).astype(np.float32) * 2.5
            pos = np.stack([px, py, pz], -1)[None].repeat(W, 0)
            oid = (idx % 2).astype(np.int32)[None].repeat(W, 0)
            ctx.make_entities(Ball, counts=n_inst, max_new=n_inst, values={
                base.Position: jnp.asarray(pos),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (W, n_inst, 4)),
                base.Scale: jnp.ones((W, n_inst, 3)),
                base.ObjectID: jnp.asarray(oid),
            })
            ctx.make_entities(Ball, counts=1, max_new=1, values={
                base.Position: jnp.zeros((W, 1, 3)),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (W, 1, 4)),
                base.Scale: jnp.ones((W, 1, 3)),
                base.ObjectID: jnp.full((W, 1), 2, jnp.int32),
            })
            v0 = RenderingSystem.setup_view(ctx, 90.0, view_idx=0)
            ctx.make_entities(Cam, counts=1, max_new=1, values={
                base.Position: jnp.broadcast_to(
                    jnp.array([0.0, -2.0, 1.5]), (W, 1, 3)),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (W, 1, 4)),
                ActiveView: v0,
            })

        @staticmethod
        def setup_tasks(builder):
            n = RenderingSystem.setup_tasks(builder, [], [Ball], Cam)
            renderer.setup_tasks(builder, [n], [Ball])

    sim = TaskGraphExecutor(Wld, ExecutorConfig(num_worlds=2,
                                                max_entities_per_world=64,
                                                seed=0, donate=False))
    sim.run(1)
    out = sim.state["user"]["render_out"]
    return np.asarray(out["rgb"]), np.asarray(out["depth"])


def test_tiled_with_meshes_matches_dense():
    """Tiles + triangle render meshes compose: with per-tile capacity
    covering the scene, the tiled image is IDENTICAL to the dense one
    (previously any mesh forced the dense fallback)."""
    rgb_dense, depth_dense = build_sim_mesh(tile_size=0, max_per_tile=0)
    rgb_tiled, depth_tiled = build_sim_mesh(tile_size=16, max_per_tile=16)
    assert np.array_equal(rgb_dense, rgb_tiled)
    finite = np.isfinite(depth_dense)
    assert np.array_equal(finite, np.isfinite(depth_tiled))
    assert np.allclose(depth_dense[finite], depth_tiled[finite])
    assert finite.any() and (rgb_dense[..., 3] > 0).any()


@pytest.mark.slow
def test_pallas_with_meshes_matches_xla():
    """Triangle render meshes in the Pallas pixel-tile kernel (VERDICT r3
    #7): the streamed folded-constant Moeller-Trumbore loop reproduces
    the XLA dense path to quantization tolerance (previously meshes
    forced the XLA path).  res=16: interpret mode evaluates the unrolled
    instances-x-triangles loop op by op — the 32px scene took >90 CPU-min."""
    rgb_x, depth_x = build_sim_mesh(tile_size=0, max_per_tile=0, res=16)
    rgb_p, depth_p = build_sim_mesh(tile_size=0, max_per_tile=0, res=16,
                                    backend="pallas")
    finite = np.isfinite(depth_x)
    assert finite.any() and (rgb_x[..., 3] > 0).any()
    assert np.array_equal(finite, np.isfinite(depth_p))
    assert np.allclose(depth_p[finite], depth_x[finite], rtol=1e-4,
                       atol=1e-3)
    assert np.abs(rgb_p.astype(np.int32) - rgb_x.astype(np.int32)).max() <= 1
