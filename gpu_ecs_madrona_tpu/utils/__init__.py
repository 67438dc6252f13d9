from gpu_ecs_madrona_tpu.utils import math  # noqa: F401
