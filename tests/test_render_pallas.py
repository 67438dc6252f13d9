"""Pallas pixel-tile render kernel vs the XLA renderer path.

Same scene, same camera: the streaming kernel (ops/render_kernel.py,
interpret mode on CPU) must reproduce the XLA path's RGBA + depth output
to float-accumulation/quantization tolerance.  Covers all three analytic
primitives (sphere / exact convex hull / plane), dead instance rows, and
a rotated+scaled instance.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu import Archetype, ExecutorConfig, TaskGraphExecutor
from gpu_ecs_madrona_tpu.core import base
from gpu_ecs_madrona_tpu.physics import assets
from gpu_ecs_madrona_tpu.render.interop import ActiveView, RenderingSystem
from gpu_ecs_madrona_tpu.render.renderer import BatchRenderer, RendererConfig

Shape = Archetype("PRShape", [base.Position, base.Rotation, base.Scale,
                              base.ObjectID])
Cam = Archetype("PRCam", [base.Position, base.Rotation, ActiveView])


def scene_objmgr():
    loader = assets.PhysicsLoader(max_verts=8, max_faces=6, max_edges=3,
                                  max_face_verts=4, max_full_edges=12)
    loader.load_objects([
        assets.make_box((0.6, 0.4, 0.5)),
        assets.make_sphere(0.7),
        assets.make_plane(),
    ])
    return loader.get_object_manager()


def render_scene(backend, W=2, res=32):
    objmgr = scene_objmgr()
    renderer = BatchRenderer(
        RendererConfig(width=res, height=res, max_views=1, backend=backend),
        objmgr)

    s2 = 1 / np.sqrt(2)
    inst_pos = np.array([
        [0.0, 3.0, 0.6],      # box
        [1.2, 4.0, 0.8],      # sphere
        [0.0, 0.0, 0.0],      # ground plane
        [-1.1, 3.5, 0.5],     # rotated+scaled box
    ], np.float32)
    inst_rot = np.array([
        [1, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0], [s2, 0, 0, s2],
    ], np.float32)
    inst_scale = np.array([
        [1, 1, 1], [1, 1, 1], [1, 1, 1], [1.5, 1.0, 0.8],
    ], np.float32)
    inst_obj = np.array([0, 1, 2, 0], np.int32)
    n = len(inst_obj)

    class SceneWorld:
        @staticmethod
        def register_types(registry):
            base.register_types(registry)
            RenderingSystem.register_types(registry)
            registry.register_archetype(Shape, capacity=n + 2)  # 2 dead rows
            registry.register_archetype(Cam, capacity=1)

        @staticmethod
        def init(ctx, init_data=None):
            Wn = ctx.num_worlds
            ctx.data = {}
            RenderingSystem.init(ctx, renderable_archetypes=[Shape],
                                 view_archetype=Cam)
            renderer.init_buffers(ctx)
            # world 1 shifts the scene slightly: outputs must differ by world
            shift = (jnp.arange(Wn, dtype=jnp.float32) * 0.3)[:, None, None]
            pos = jnp.broadcast_to(jnp.asarray(inst_pos), (Wn, n, 3))
            pos = pos + shift * jnp.array([1.0, 0.0, 0.0])
            ctx.make_entities(Shape, counts=n, max_new=n, values={
                base.Position: pos,
                base.Rotation: jnp.broadcast_to(jnp.asarray(inst_rot),
                                                (Wn, n, 4)),
                base.Scale: jnp.broadcast_to(jnp.asarray(inst_scale),
                                             (Wn, n, 3)),
                base.ObjectID: jnp.broadcast_to(jnp.asarray(inst_obj),
                                                (Wn, n)),
            })
            ctx.make_entities(Cam, counts=1, max_new=1, values={
                base.Position: jnp.broadcast_to(
                    jnp.array([0.0, -2.0, 1.2]), (Wn, 1, 3)),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (Wn, 1, 4)),
                ActiveView: RenderingSystem.setup_view(ctx, 70.0),
            })

        @staticmethod
        def setup_tasks(builder):
            pack = RenderingSystem.setup_tasks(builder, [], [Shape], Cam)
            renderer.setup_tasks(builder, [pack], [Shape])

    sim = TaskGraphExecutor(SceneWorld, ExecutorConfig(
        num_worlds=W, max_entities_per_world=16, seed=0))
    sim.run(1)
    return (np.asarray(sim.rgb_observations()),
            np.asarray(sim.depth_observations()))


def test_pallas_matches_xla():
    rgb_x, depth_x = render_scene("xla")
    rgb_p, depth_p = render_scene("pallas")

    # scene sanity: hits exist, plane fills the lower frame, worlds differ
    hits = np.isfinite(depth_x)
    assert hits.mean() > 0.3
    assert not np.array_equal(depth_x[0], depth_x[1])

    np.testing.assert_array_equal(np.isfinite(depth_p), hits)
    np.testing.assert_allclose(depth_p[hits], depth_x[hits], rtol=1e-4,
                               atol=1e-3)
    # RGBA8: allow +-1 quantization from float-order differences
    assert np.abs(rgb_p.astype(np.int32) - rgb_x.astype(np.int32)).max() <= 1


def test_pallas_auto_off_cpu():
    """On CPU the auto backend must stay on the XLA path (interpret-mode
    pallas is debug-speed)."""
    objmgr = scene_objmgr()
    r = BatchRenderer(RendererConfig(width=256, height=256, backend="auto"),
                      objmgr)
    assert not r._use_pallas(256 * 256, 64)
