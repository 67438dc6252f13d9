from gpu_ecs_madrona_tpu.parallel.mesh import (  # noqa: F401
    WORLD_AXIS,
    initialize_distributed,
    make_world_mesh,
    shard_state,
    world_sharding,
)
