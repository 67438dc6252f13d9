"""Benchmark: collisions example, aggregate env-steps/s on one chip.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): 1M aggregate env-steps/s at 8192 worlds on
the collisions physics workload (vs_baseline = value / 1e6).

Metric definition matches the reference examples' FPS printout:
num_ticks * num_worlds / elapsed (reference examples/simple_taskgraph/
mw_cpu.cpp:39-42, examples/collisions/gpu.cpp:32-43).

Driver-safety contract (round-2 postmortem: a poisoned exec-config artifact
flipped the bench to a minutes-to-compile path and timed the driver out):
  * NEVER sweeps/tunes unless BENCH_TUNE=1 is set explicitly — a plain
    `python bench.py` only ever builds ONE executor.
  * Tuned artifacts are consulted but only trusted when backend-matched and
    validated (tooling/autotuner.lookup's trust gates); otherwise the static
    heuristic runs.
  * Stage-stamped progress lines go to stderr so a timeout is attributable.
"""

import json
import os
import sys
import time

NUM_WORLDS = int(os.environ.get("BENCH_NUM_WORLDS", 8192))
NUM_TICKS = int(os.environ.get("BENCH_NUM_TICKS", 1000))
BASELINE_STEPS_PER_S = 1_000_000.0
_T0 = time.perf_counter()


def stage(msg):
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    stage("importing jax")
    import jax
    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    stage(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    from gpu_ecs_madrona_tpu.models import collisions as col
    from gpu_ecs_madrona_tpu.tooling import autotuner

    # Exec-config feedback loop (the MADRONA_MWGPU_EXEC_CONFIG_FILE analog).
    # lookup() only returns backend-matched validated entries; sweeping is
    # opt-in via BENCH_TUNE=1 and never happens under the driver.
    tuned = autotuner.lookup("collisions", num_worlds=NUM_WORLDS,
                             num_objects=100)
    cfg_source = "artifact" if tuned is not None else "heuristic"
    if tuned is None and os.environ.get("BENCH_TUNE") == "1":
        stage("BENCH_TUNE=1: sweeping fused on/off (2+2 subprocesses)")
        try:
            entry = autotuner.tune_collisions(NUM_WORLDS, 100, ticks=40)
            autotuner.save([entry])
            if entry.get("validated"):
                tuned = entry["config"]
                cfg_source = "swept"
            else:
                stage("sweep winner failed validation; using heuristic")
        except Exception as e:  # tuning must never kill the bench
            stage(f"autotune failed: {e}")
    if tuned is None:
        tuned = {}
    stage(f"exec config: source={cfg_source} {tuned}")

    stage(f"building executor ({NUM_WORLDS} worlds)")
    sim = col.make_executor(
        col.CollisionsConfig(num_worlds=NUM_WORLDS, seed=0,
                             fused=tuned.get("fused"))
    )

    # Warmup: compile the step program (the reference's analog is the NVRTC
    # megakernel build, amortized by its kernel cache / our persistent
    # compilation cache).
    stage("warmup / compile")
    sim.run(3)
    sim.block_until_ready()

    # Multi-window timing (VERDICT r3 #6): chip contention on the shared
    # tunnel makes single-window numbers swing 2x; N windows with
    # min/median/max distinguish a quiet-chip capability (max) from a
    # contended run and make any future regression diagnosable.
    n_windows = max(3, int(os.environ.get("BENCH_WINDOWS", 5)))
    ticks_per_window = max(1, NUM_TICKS // n_windows)
    stage(f"timing {n_windows} windows x {ticks_per_window} ticks")
    import numpy as _np

    def drain():
        # block_until_ready alone UNDER-WAITS on the axon tunnel (round-4
        # discovery: a 1000-tick collisions window "completed" in 117 ms
        # of dispatch while 6.2 s of device work stayed queued — a 53x
        # inflated headline).  Only materializing a VALUE on the host is
        # a true barrier; fetch one scalar of the final state.
        leaf = jax.tree_util.tree_leaves(sim.state)[0]
        _np.asarray(leaf[(0,) * leaf.ndim])

    window_s = []
    drain()
    for i in range(n_windows):
        start = time.perf_counter()
        sim.run(ticks_per_window)
        sim.block_until_ready()
        drain()
        window_s.append(time.perf_counter() - start)
        stage(f"  window {i}: {window_s[-1] * 1e3:.1f} ms")
    window_tput = sorted(ticks_per_window * NUM_WORLDS / s for s in window_s)
    tput_min = window_tput[0]
    tput_med = window_tput[len(window_tput) // 2]
    tput_max = window_tput[-1]
    stage(f"throughput min/med/max = {tput_min / 1e6:.1f} / "
          f"{tput_med / 1e6:.1f} / {tput_max / 1e6:.1f} M steps/s")

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

    steps_per_s = tput_med
    print(
        json.dumps(
            {
                "metric": f"collisions env-steps/s @ {NUM_WORLDS} worlds (1 chip)",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
                "exec_config": {"source": cfg_source, **tuned},
                "windows": {
                    "n": n_windows,
                    "ticks_per_window": ticks_per_window,
                    "min": round(tput_min, 1),
                    "median": round(tput_med, 1),
                    "max": round(tput_max, 1),
                    "ms": [round(s * 1e3, 2) for s in window_s],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
