"""Benchmark: collisions example, aggregate env-steps/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): 1M aggregate env-steps/s at 8192 worlds on
the collisions physics workload (vs_baseline = value / 1e6).

Metric definition matches the reference examples' FPS printout:
num_ticks * num_worlds / elapsed (reference examples/simple_taskgraph/
mw_cpu.cpp:39-42, examples/collisions/gpu.cpp:32-43).
"""

import json
import os
import sys
import time

NUM_WORLDS = int(os.environ.get("BENCH_NUM_WORLDS", 8192))
NUM_TICKS = int(os.environ.get("BENCH_NUM_TICKS", 100))
BASELINE_STEPS_PER_S = 1_000_000.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from gpu_ecs_madrona_tpu.models import collisions as col
    from gpu_ecs_madrona_tpu.tooling import autotuner

    # Exec-config feedback loop (the MADRONA_MWGPU_EXEC_CONFIG_FILE
    # analog): use the tuned artifact if present; otherwise run a quick
    # fused-on/off sweep at this workload, persist it, and consume it.
    cfg_source = "artifact"
    tuned = autotuner.lookup("collisions", num_worlds=NUM_WORLDS,
                             num_objects=100)
    if tuned is None and os.environ.get("BENCH_NO_TUNE") != "1":
        try:
            entry = autotuner.tune_collisions(NUM_WORLDS, 100, ticks=40)
            autotuner.save([entry])
            tuned = entry["config"]
            cfg_source = "swept"
        except Exception as e:  # tuning must never kill the bench
            print(f"# autotune failed: {e}", file=sys.stderr)
    if tuned is None:
        tuned = {}
        cfg_source = "heuristic"

    sim = col.make_executor(
        col.CollisionsConfig(num_worlds=NUM_WORLDS, seed=0,
                             fused=tuned.get("fused"))
    )

    # Warmup: compile the step program (the reference's analog is the NVRTC
    # megakernel build, amortized by its kernel cache / our persistent
    # compilation cache).
    sim.run(3)
    sim.block_until_ready()

    start = time.perf_counter()
    sim.run(NUM_TICKS)
    sim.block_until_ready()
    elapsed = time.perf_counter() - start

    # Correctness guard: a numerically exploding sim has the same static
    # shapes and runs just as "fast" — never report throughput off a NaN
    # trajectory (this caught the TPU bf16-matmul Gram-d2 explosion).
    import numpy as np
    pos, mask = sim.get_exported(0)
    pos = np.asarray(pos)
    if not np.isfinite(pos[np.asarray(mask)]).all():
        print(json.dumps({"metric": "collisions env-steps/s", "value": 0.0,
                          "unit": "env-steps/s", "vs_baseline": 0.0,
                          "error": "non-finite trajectory"}))
        sys.exit(1)

    steps_per_s = NUM_TICKS * NUM_WORLDS / elapsed
    print(
        json.dumps(
            {
                "metric": f"collisions env-steps/s @ {NUM_WORLDS} worlds (1 chip)",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
                "exec_config": {"source": cfg_source, **tuned},
            }
        )
    )


if __name__ == "__main__":
    main()
