"""Python bindings layer — Tensor hand-off to training frameworks.

Mirror of reference src/python/bindings.cpp + include/madrona/python.hpp:
  madrona::py::Tensor      -> Tensor (wraps a jax.Array + live-row mask)
  Tensor::to_torch (DLPack zero-copy, bindings.cpp:108-123)
                           -> Tensor.to_torch() via dlpack on CPU; explicit
                              host copy from TPU (torch has no TPU backend —
                              the supported TPU path is keeping the learner
                              in JAX, see parallel/learner.py)
  CudaSync (utils.cpp:19-26) -> unnecessary: XLA orders operations on a
                              stream per device; jax.block_until_ready is
                              the explicit analog, exposed as Tensor.sync().
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Tensor:
    """An exported ECS column view (reference py::Tensor).

    values: jax.Array [num_worlds, capacity, ...] (or a dict of them for
    struct components); mask: bool [num_worlds, capacity] of live rows.
    """

    values: Any
    mask: Optional[jax.Array] = None

    @property
    def shape(self):
        leaf = jax.tree_util.tree_leaves(self.values)[0]
        return leaf.shape

    @property
    def dtype(self):
        leaf = jax.tree_util.tree_leaves(self.values)[0]
        return leaf.dtype

    def to_jax(self):
        return self.values

    def to_numpy(self):
        return jax.tree_util.tree_map(np.asarray, self.values)

    def to_torch(self):
        """Zero-copy to torch on CPU backends (DLPack, the analog of
        reference bindings.cpp:108-123); device->host copy elsewhere."""
        import torch

        def conv(x):
            if x.dtype == jnp.bool_:
                # dlpack bool support is flaky; use uint8 view
                return torch.from_numpy(np.asarray(x).astype(np.uint8)).bool()
            if list(x.devices())[0].platform == "cpu":
                return torch.utils.dlpack.from_dlpack(x)
            return torch.from_numpy(np.asarray(x))

        return jax.tree_util.tree_map(conv, self.values)

    @staticmethod
    def from_torch(t):
        """Import torch tensors (reference tensor import path,
        bindings.cpp)."""
        import torch

        def conv(x):
            if isinstance(x, torch.Tensor):
                if x.device.type == "cpu":
                    return jnp.from_dlpack(x.contiguous())
                return jnp.asarray(x.cpu().numpy())
            return jnp.asarray(x)

        return jax.tree_util.tree_map(
            conv, t, is_leaf=lambda v: isinstance(v, torch.Tensor))

    def sync(self):
        """reference CudaSync::wait — block until values are materialized."""
        jax.block_until_ready(self.values)
        return self


def exported_tensor(executor, slot: int) -> Tensor:
    """Wrap TaskGraphExecutor.get_exported in a Tensor (snapshot semantics —
    see executor.get_exported docs)."""
    values, mask = executor.get_exported(slot)
    return Tensor(values=values, mask=mask)
