"""Benchmark: full rigid-body physics pipeline at scale (secondary metric).

Prints ONE JSON line like bench.py (the headline bench stays collisions).
Workload: models/rigid_bench.py — ground plane + pile of boxes/spheres per
world, full broadphase -> SAT narrowphase -> XPBD pipeline, compacted-pairs
contact mode.

Env knobs: BENCH_PHYS_WORLDS (8192), BENCH_PHYS_BODIES (64),
BENCH_PHYS_TICKS (50), BENCH_PHYS_MODE (pairs|dense|pallas),
BENCH_PHYS_BP (auto|dense|sap|fused), BENCH_PHYS_CANDS (0 = 4*bodies),
BENCH_PHYS_PERSIST=1 (cross-step persistent manifolds; forces bp=fused
+ refresh), BENCH_PHYS_SETTLE_TICKS (run N un-timed ticks first so the
pile is settled when the windows start — the quasi-static regime the
persistent-manifold skip targets).
"""

import json
import os
import time

NUM_WORLDS = int(os.environ.get("BENCH_PHYS_WORLDS", 8192))
NUM_BODIES = int(os.environ.get("BENCH_PHYS_BODIES", 64))
NUM_TICKS = int(os.environ.get("BENCH_PHYS_TICKS", 50))
MODE = os.environ.get("BENCH_PHYS_MODE", "pallas")
BP = os.environ.get("BENCH_PHYS_BP", "auto")
CANDS = int(os.environ.get("BENCH_PHYS_CANDS", 0))
REFRESH = os.environ.get("BENCH_PHYS_REFRESH") == "1"
PERSIST = os.environ.get("BENCH_PHYS_PERSIST") == "1"
SETTLE_TICKS = int(os.environ.get("BENCH_PHYS_SETTLE_TICKS", 0))
# BENCH_PHYS_SETTLE=1: the quasi-static settling-pile variant — boxes
# only (rolling spheres never stop: zero contact slip means dynamic
# friction cannot decelerate them, so the default mix never quiesces),
# jittered-grid spawn (uniform spawn interpenetrates at t=0 and ejects
# bodies ballistically for thousands of ticks), persistent manifolds on,
# and 400 un-timed settle ticks before the windows.
SETTLE = os.environ.get("BENCH_PHYS_SETTLE") == "1"
BODY_MIX, SPAWN = "alternate", "uniform"
# world-level sleep layered on persist (BENCH_PHYS_SLEEP=0 disables):
# quiescent worlds freeze bit-exactly and skip the whole kernel
SLEEP_THR = (0.02 if SETTLE
             and os.environ.get("BENCH_PHYS_SLEEP", "1") == "1" else 0.0)
if SETTLE:
    # BENCH_PHYS_PERSIST=0 runs the same settled workload WITHOUT the
    # persistent-manifold skip (the honest A/B for the skip's win)
    PERSIST = os.environ.get("BENCH_PHYS_PERSIST", "1") == "1"
    BODY_MIX, SPAWN = "boxes", "grid"
    SETTLE_TICKS = SETTLE_TICKS or 400
    BP = "fused"
    REFRESH = True
if PERSIST:
    BP = "fused"
    REFRESH = True


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from gpu_ecs_madrona_tpu.models import rigid_bench as rb

    sim = rb.make_executor(rb.RigidBenchConfig(
        num_worlds=NUM_WORLDS, num_bodies=NUM_BODIES, contact_mode=MODE,
        broadphase_mode=BP, max_candidates=CANDS, seed=0,
        contact_refresh=REFRESH, manifold_persist=PERSIST,
        body_mix=BODY_MIX, spawn=SPAWN,
        sleep_threshold=SLEEP_THR if PERSIST else 0.0))

    sim.run(3)
    sim.block_until_ready()
    if SETTLE_TICKS:
        sim.run(SETTLE_TICKS)
        sim.block_until_ready()

    # multi-window timing (VERDICT r3 #6): min/median/max across windows
    # separates chip contention from real regression
    n_windows = max(3, int(os.environ.get("BENCH_WINDOWS", 3)))
    import numpy as _np
    import jax as _jax

    def drain():
        # true host-value barrier: block_until_ready under-waits on the
        # axon tunnel (see bench.py)
        leaf = _jax.tree_util.tree_leaves(sim.state)[0]
        _np.asarray(leaf[(0,) * leaf.ndim])

    window_s = []
    drain()
    for _ in range(n_windows):
        start = time.perf_counter()
        sim.run(NUM_TICKS)
        sim.block_until_ready()
        drain()
        window_s.append(time.perf_counter() - start)
    window_tput = sorted(NUM_TICKS * NUM_WORLDS / s for s in window_s)

    # Correctness guard (see bench.py): never report throughput off a
    # non-finite trajectory.
    import numpy as np
    import sys
    pos, mask = sim.get_exported(0)
    if not np.isfinite(np.asarray(pos)[np.asarray(mask)]).all():
        print(json.dumps({"metric": "rigid-body physics env-steps/s",
                          "value": 0.0, "unit": "env-steps/s",
                          "vs_baseline": 0.0,
                          "error": "non-finite trajectory"}))
        sys.exit(1)

    overflow = int(sum(np.asarray(v).sum()
                       for v in sim.overflow_counters().values()))
    steps_per_s = window_tput[len(window_tput) // 2]
    print(json.dumps({
        "overflow": overflow,
        "metric": (f"rigid-body physics env-steps/s @ {NUM_WORLDS} worlds x "
                   f"{NUM_BODIES} bodies ({MODE}, bp={BP}"
                   f"{', refresh' if REFRESH else ''}"
                   f"{', persist' if PERSIST else ''}"
                   f"{', settled-pile' if SETTLE else ''})"),
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / 1_000_000.0, 4),
        "windows": {"n": n_windows, "ticks_per_window": NUM_TICKS,
                    "min": round(window_tput[0], 1),
                    "median": round(steps_per_s, 1),
                    "max": round(window_tput[-1], 1),
                    "ms": [round(s * 1e3, 2) for s in window_s]},
    }))


if __name__ == "__main__":
    main()
