"""simple_taskgraph behavioral tests (reference examples/simple_taskgraph/)."""

import numpy as np

from gpu_ecs_madrona_tpu.models import simple_taskgraph as stg


def small_cfg(**kw):
    d = dict(num_worlds=4, num_objects=10, num_substeps=2, seed=11)
    d.update(kw)
    return stg.SimpleTaskgraphConfig(**d)


def test_builds_and_runs():
    sim = stg.make_executor(small_cfg())
    sim.run(10)
    pos, mask = sim.get_exported(2)
    p = np.asarray(pos)[np.asarray(mask)]
    assert np.isfinite(p).all()
    # spheres fall under gravity but the clamp system keeps z >= 0
    assert (p[:, 2] >= -0.5).all()


def test_agent_export():
    sim = stg.make_executor(small_cfg())
    sim.run(5)
    apos, amask = sim.get_exported(0)
    arot, _ = sim.get_exported(1)
    assert (np.asarray(amask).sum(axis=1) == 1).all()
    # static agent stays at origin with identity rotation
    np.testing.assert_allclose(np.asarray(apos)[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(arot)[:, 0, 0], 1.0, atol=1e-5)


def test_render_buffers_packed():
    sim = stg.make_executor(small_cfg())
    sim.run(3)
    render = sim.state["user"]["render"]
    inst = render[stg.Sphere.name]
    assert (np.asarray(inst["mask"]).sum(axis=1) == 10).all()
    views = render["__views__"]
    assert (np.asarray(views["mask"]).sum(axis=1) == 1).all()
    assert np.allclose(np.asarray(views["tan_fov"])[np.asarray(views["mask"])], 1.0)


def test_fixed_seed_parity():
    """BASELINE config 1: fixed-seed trajectory parity across rebuilds."""
    a = stg.make_executor(small_cfg())
    b = stg.make_executor(small_cfg())
    a.run(20)
    b.run(20)
    pa, _ = a.get_exported(2)
    pb, _ = b.get_exported(2)
    assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_rendered_observations():
    """RGB/depth observations (reference rgbObservations/depthObservations,
    vk/batch_renderer.cpp): spheres visible from the agent camera."""
    import numpy as np
    sim = stg.make_executor(small_cfg(render=True, render_width=32,
                                      render_height=32))
    sim.run(2)
    out = sim.state["user"]["render_out"]
    rgb = np.asarray(out["rgb"])    # [W, V, H, Wpx, 4]
    depth = np.asarray(out["depth"])
    assert rgb.shape == (4, 1, 32, 32, 4)
    assert rgb.dtype == np.uint8
    # some pixels hit spheres (alpha = 255) and some miss (alpha = 0)
    assert (rgb[..., 3] == 255).any()
    assert (rgb[..., 3] == 0).any()
    hit = np.isfinite(depth)
    assert hit.any()
    assert (depth[hit] > 0).all()
    # hit pixels match alpha mask
    np.testing.assert_array_equal(hit, rgb[..., 3] == 255)
