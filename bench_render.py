"""Benchmark: batch observation rendering (secondary metric).

Prints ONE JSON line like bench.py.  Workload: simple_taskgraph with the
renderer enabled — spheres + agent camera, RGB + depth observations per
world per step (the reference's BatchRenderer::render per-frame path,
vk/batch_renderer.cpp:465-683).

Env knobs: BENCH_RENDER_WORLDS (1024), BENCH_RENDER_RES (64),
BENCH_RENDER_OBJECTS (32), BENCH_RENDER_TICKS (30),
BENCH_RENDER_BACKEND (auto|xla|pallas), BENCH_RENDER_TILE (0 = dense),
BENCH_RENDER_MESH=1 (triangle render mesh on the spheres).
"""

import json
import os
import sys
import time

NUM_WORLDS = int(os.environ.get("BENCH_RENDER_WORLDS", 1024))
RES = int(os.environ.get("BENCH_RENDER_RES", 64))
NUM_OBJECTS = int(os.environ.get("BENCH_RENDER_OBJECTS", 32))
NUM_TICKS = int(os.environ.get("BENCH_RENDER_TICKS", 30))
BACKEND = os.environ.get("BENCH_RENDER_BACKEND", "auto")
TILE = int(os.environ.get("BENCH_RENDER_TILE", 0))
MESH = os.environ.get("BENCH_RENDER_MESH") == "1"


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from gpu_ecs_madrona_tpu.models import simple_taskgraph as stg

    sim = stg.make_executor(stg.SimpleTaskgraphConfig(
        num_worlds=NUM_WORLDS, num_objects=NUM_OBJECTS, seed=0,
        render=True, render_width=RES, render_height=RES,
        render_backend=BACKEND, render_tile=TILE, render_mesh=MESH))

    import jax as _jax
    import numpy as _np

    def drain():
        # true host-value barrier (see bench.py: block_until_ready
        # under-waits on the axon tunnel)
        leaf = _jax.tree_util.tree_leaves(sim.state)[0]
        _np.asarray(leaf[(0,) * leaf.ndim])

    sim.run(3)
    sim.block_until_ready()
    drain()

    start = time.perf_counter()
    sim.run(NUM_TICKS)
    sim.block_until_ready()
    drain()
    elapsed = time.perf_counter() - start

    import numpy as np
    depth = np.asarray(sim.depth_observations())
    rgb = np.asarray(sim.rgb_observations())
    if not (np.isfinite(depth[depth < np.inf]).all() and rgb.shape[-1] == 4):
        print(json.dumps({"metric": "render frames/s", "value": 0.0,
                          "unit": "frames/s", "vs_baseline": 0.0,
                          "error": "bad observations"}))
        sys.exit(1)

    frames_per_s = NUM_TICKS * NUM_WORLDS / elapsed
    ms_per_batch = elapsed / NUM_TICKS * 1000.0
    print(json.dumps({
        "metric": (f"render+physics frames/s @ {NUM_WORLDS} worlds, "
                   f"{RES}x{RES}, {NUM_OBJECTS} objs, {BACKEND}"
                   + (", tri-mesh" if MESH else "")),
        "value": round(frames_per_s, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / 1_000_000.0, 4),
        "ms_per_batched_step": round(ms_per_batch, 2),
    }))


if __name__ == "__main__":
    main()
