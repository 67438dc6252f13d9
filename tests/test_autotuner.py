"""Closed-loop exec-config autotuner (VERDICT round-1 missing #5): the
sweep emits an artifact the executors CONSUME — the analog of the
reference's MADRONA_MWGPU_EXEC_CONFIG_FILE feedback loop
(/root/reference/src/mw/cuda_exec.cpp:1460-1517)."""

import json

import numpy as np
import pytest

from gpu_ecs_madrona_tpu.tooling import autotuner


def test_lookup_nearest_workload(tmp_path):
    path = tmp_path / "tune.json"
    autotuner.save([
        {"kind": "collisions", "key": {"num_worlds": 8192, "num_objects": 100},
         "config": {"fused": True}, "backend": "cpu", "validated": True},
        {"kind": "collisions", "key": {"num_worlds": 64, "num_objects": 100},
         "config": {"fused": False}, "backend": "cpu", "validated": True},
        {"kind": "physics_substep", "key": {"num_worlds": 1024, "bodies": 64},
         "config": {"contact_mode": "pairs", "substep_wt": 4},
         "backend": "cpu", "validated": True},
    ], str(path))
    # nearest in log space
    assert autotuner.lookup("collisions", path=str(path),
                            num_worlds=4096, num_objects=100) == {"fused": True}
    assert autotuner.lookup("collisions", path=str(path),
                            num_worlds=128, num_objects=100) == {"fused": False}
    assert autotuner.lookup("physics_substep", path=str(path),
                            num_worlds=900, bodies=50) == {
        "contact_mode": "pairs", "substep_wt": 4}
    assert autotuner.lookup("nope", path=str(path), num_worlds=1) is None


def test_lookup_trust_gates(tmp_path):
    """Round-2 postmortem: entries from another backend or without
    validated=true must be IGNORED so a poisoned artifact can never flip
    a consumer off the heuristic path."""
    path = str(tmp_path / "tune.json")
    autotuner.save([
        {"kind": "collisions", "key": {"num_worlds": 8192},
         "config": {"fused": False}, "backend": "tpu", "validated": True},
        {"kind": "collisions", "key": {"num_worlds": 64},
         "config": {"fused": False}, "backend": "cpu", "validated": False},
        {"kind": "collisions", "key": {"num_worlds": 32},
         "config": {"fused": False}, "backend": "cpu"},  # legacy: no flag
    ], path)
    # tests run on the cpu backend: the tpu entry, the failed-validation
    # entry, and the legacy no-flag entry are all untrusted
    assert autotuner.lookup("collisions", path=path, num_worlds=8192) is None


def test_save_replaces_same_key(tmp_path):
    path = str(tmp_path / "tune.json")
    autotuner.save([{"kind": "collisions", "key": {"num_worlds": 8},
                     "config": {"fused": False}, "backend": "cpu",
                     "validated": True}], path)
    autotuner.save([{"kind": "collisions", "key": {"num_worlds": 8},
                     "config": {"fused": True}, "backend": "cpu",
                     "validated": True}], path)
    with open(path) as f:
        entries = json.load(f)["entries"]
    assert len(entries) == 1 and entries[0]["config"] == {"fused": True}


@pytest.mark.slow
def test_sweep_emits_consumable_artifact(tmp_path, monkeypatch):
    """End-to-end loop on CPU: tune_collisions measures both fused modes,
    saves the artifact, and CollisionsConfig(fused=None) consumes it via
    GEM_TPU_EXEC_CONFIG_FILE."""
    from gpu_ecs_madrona_tpu.models import collisions as col

    path = str(tmp_path / "tune.json")
    entry = autotuner.tune_collisions(num_worlds=4, num_objects=6, ticks=2)
    assert entry["kind"] == "collisions"
    assert "fused" in entry["config"]
    assert len(entry["metric_steps_per_s"]) >= 1
    autotuner.save([entry], path)
    monkeypatch.setenv(autotuner.CONFIG_ENV, path)

    # the consumer honors the artifact value: spy on the fused kernel —
    # with tuned fused=False it must never be traced, with fused=True it
    # must be (the spy raises a marker error at trace time)
    from gpu_ecs_madrona_tpu.ops import collision_kernel as ck

    class _Marker(Exception):
        pass

    def boom(*a, **k):
        raise _Marker()

    monkeypatch.setattr(ck, "fused_collisions_step", boom)

    autotuner.save([{"kind": "collisions",
                     "key": {"num_worlds": 4, "num_objects": 6},
                     "config": {"fused": False}, "backend": "cpu",
                     "validated": True}], path)
    sim = col.make_executor(col.CollisionsConfig(num_worlds=4, num_objects=6,
                                                 seed=0))
    sim.run(2)
    assert np.isfinite(np.asarray(sim.get_exported(0)[0])).all()

    autotuner.save([{"kind": "collisions",
                     "key": {"num_worlds": 4, "num_objects": 6},
                     "config": {"fused": True}, "backend": "cpu",
                     "validated": True}], path)
    with pytest.raises(_Marker):
        sim = col.make_executor(col.CollisionsConfig(num_worlds=4,
                                                     num_objects=6, seed=0))
        sim.run(1)


def test_physics_auto_consumes_artifact(tmp_path, monkeypatch):
    """setup_substep_tasks(contact_mode='auto') picks the tuned mode."""
    import jax.numpy as jnp
    from gpu_ecs_madrona_tpu import (Archetype, ExecutorConfig,
                                     TaskGraphExecutor, base)
    from gpu_ecs_madrona_tpu.physics import (BODY_COMPONENTS,
                                             RigidBodyPhysicsSystem, assets)
    from gpu_ecs_madrona_tpu.physics.components import (
        ResponseType, RESPONSE_DYNAMIC)

    path = str(tmp_path / "tune.json")
    autotuner.save([{"kind": "physics_substep",
                     "key": {"num_worlds": 2, "bodies": 8},
                     "config": {"contact_mode": "pairs"}, "backend": "cpu",
                     "validated": True}], path)
    monkeypatch.setenv(autotuner.CONFIG_ENV, path)

    loader = assets.PhysicsLoader()
    loader.load_objects([assets.make_sphere(1.0)])
    mgr = loader.get_object_manager()
    Body = Archetype("TuneBody", BODY_COMPONENTS)

    class W:
        @staticmethod
        def register_types(r):
            RigidBodyPhysicsSystem.register_types(r, max_candidates=16,
                                                  max_contacts=16)
            r.register_archetype(Body, capacity=8)  # <=48: heuristic=dense
            r.export_column(Body, base.Position, 0)

        @staticmethod
        def init(ctx, init_data=None):
            Wn = ctx.num_worlds
            ctx.data = {"_": jnp.zeros((Wn, 1))}
            RigidBodyPhysicsSystem.init(ctx, delta_t=1 / 60, num_substeps=2)
            ctx.make_entities(Body, counts=2, max_new=2, values={
                base.Position: jnp.broadcast_to(
                    jnp.array([[0.0, 0, 1.0], [0.5, 0, 2.0]]), (Wn, 2, 3)),
                base.Rotation: jnp.broadcast_to(
                    jnp.array([1.0, 0, 0, 0]), (Wn, 2, 4)),
                base.Scale: jnp.ones((Wn, 2, 3)),
                base.ObjectID: jnp.zeros((Wn, 2), jnp.int32),
                ResponseType: jnp.full((Wn, 2), RESPONSE_DYNAMIC, jnp.int32),
            })

        @staticmethod
        def setup_tasks(builder):
            bp = RigidBodyPhysicsSystem.setup_broadphase_tasks(
                builder, [], Body, mgr)
            RigidBodyPhysicsSystem.setup_substep_tasks(
                builder, [bp], 2, Body, mgr, contact_mode="auto")

    sim = TaskGraphExecutor(W, ExecutorConfig(num_worlds=2,
                                              max_entities_per_world=16,
                                              seed=0))
    sim.run(1)
    # tuned "pairs" overrides the <=48-bodies "dense" heuristic; the pairs
    # path emits per-substep nodes named physics_substep_*
    names = [n.name for n in sim.graph.nodes]
    assert any(n.startswith("physics_substep_") for n in names), names
    assert not any("fused" in n for n in names)
