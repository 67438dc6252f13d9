"""Backend/platform capability detection.

Pallas TPU (Mosaic) kernels only compile for real TPU-like platforms.
The axon tunnel reports backend "axon" but IS a TPU, so detection must be
an ALLOWLIST of TPU-like platforms — a denylist of "cpu" would route a
CUDA/ROCm jax backend ("gpu") into pltpu kernels that cannot compile
(advisor finding, round 2).  Unknown platforms fall back to the XLA
formulations, which compile everywhere.
"""

from __future__ import annotations

import jax

_TPU_LIKE = ("tpu", "axon")


def is_tpu() -> bool:
    """True when Mosaic (pltpu) kernels can compile natively."""
    return jax.default_backend() in _TPU_LIKE


def pallas_interpret() -> bool:
    """Interpret-mode flag for pallas_call: interpret everywhere except a
    real TPU (CPU tests, and any non-TPU accelerator where Mosaic would
    fail to compile).  Interpret mode is debug-speed — auto paths should
    only *select* Pallas when is_tpu(); this flag just keeps forced
    configs correct off-TPU."""
    return not is_tpu()
