from gpu_ecs_madrona_tpu.core import component, registry, state, context, taskgraph, executor, base  # noqa: F401
