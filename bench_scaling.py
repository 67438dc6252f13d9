"""Scaling-efficiency benchmark: worlds sharded over N devices.

BASELINE.json gate: >=85% scaling efficiency from 1 chip to N>=2 hosts.
On real multi-chip hardware this measures true ICI scaling; on a single
host it can exercise the virtual CPU mesh (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count) as a partitioning smoke test.

Prints one JSON line per device count plus a summary efficiency line.
"""

import json
import os
import time


def measure(num_devices: int, worlds_per_device: int, ticks: int) -> float:
    import jax
    from gpu_ecs_madrona_tpu.models import collisions as col
    from gpu_ecs_madrona_tpu.parallel import make_world_mesh, shard_state, world_sharding

    devices = jax.devices()[:num_devices]
    mesh = make_world_mesh(devices)
    W = worlds_per_device * num_devices
    sim = col.make_executor(col.CollisionsConfig(num_worlds=W, seed=0),
                            donate=False)
    state = shard_state(sim.state, mesh)
    sharding = world_sharding(mesh)
    shardings = jax.tree_util.tree_map(lambda _: sharding, state)
    step = jax.jit(
        sim.graph.step,
        in_shardings=(shardings,),
        out_shardings=shardings,
        donate_argnums=0,
    )
    import numpy as _np

    def drain(s):
        # true host-value barrier (see bench.py: block_until_ready
        # under-waits on the axon tunnel)
        leaf = jax.tree_util.tree_leaves(s)[0]
        _np.asarray(leaf[(0,) * leaf.ndim])

    state = step(state)
    jax.block_until_ready(state)
    drain(state)
    t0 = time.perf_counter()
    for _ in range(ticks):
        state = step(state)
    jax.block_until_ready(state)
    drain(state)
    elapsed = time.perf_counter() - t0
    return ticks * W / elapsed


def main():
    # BENCH_SCALING_CPU=1: virtual 8-device CPU mesh (the axon
    # sitecustomize pins jax_platforms to the tunneled TPU, so env vars
    # alone don't switch backends — override after import, like
    # tests/conftest.py)
    if os.environ.get("BENCH_SCALING_CPU") == "1":
        xla_flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in xla_flags:
            os.environ["XLA_FLAGS"] = (
                xla_flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if os.environ.get("BENCH_SCALING_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu", jax.default_backend()

    worlds_per_device = int(os.environ.get("BENCH_WORLDS_PER_DEVICE", 2048))
    ticks = int(os.environ.get("BENCH_NUM_TICKS", 50))
    avail = len(jax.devices())
    counts = sorted({1, 2, avail} & set(range(1, avail + 1))) or [1]
    results = {}
    for nd in counts:
        sps = measure(nd, worlds_per_device, ticks)
        results[nd] = sps
        print(json.dumps({
            "metric": f"collisions env-steps/s @ {nd} device(s), "
                      f"{worlds_per_device} worlds/device",
            "value": round(sps, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(sps / 1_000_000.0, 4),
        }))
    if len(results) > 1 and 1 in results:
        nd = max(results)
        eff = results[nd] / (results[1] * nd)
        print(json.dumps({
            "metric": f"scaling efficiency 1 -> {nd} devices",
            "value": round(eff, 4),
            "unit": "fraction",
            "vs_baseline": round(eff / 0.85, 4),
        }))


if __name__ == "__main__":
    main()
