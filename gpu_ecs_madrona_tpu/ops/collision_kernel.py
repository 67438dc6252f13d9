"""Pallas kernel: fused all-pairs collision pushes.

The hot op of the collisions workload (reference examples/collisions
broadphase+narrowphase+solver chain; our dense lowering in
models/collisions.py).  The XLA path materializes the [W, n, n] overlap
grid and normal reductions in HBM; this kernel keeps the entire pair grid
in VMEM per block of worlds and rides the MXU:

  - pairwise distances via one Gram matmul:  d2 = |x_i|^2 + |x_j|^2 - 2 X X^T
  - AABB overlap mask via [n,1] x [1,n] broadcast compares
  - the push reduction as a second matmul:
      delta = -2 (M X - X rowsum(M)),  M_ij = ok_ij * rsqrt(d2_ij)
    which equals  -2 sum_j ok_ij * normalize(x_j - x_i)  — the collisions
    solver semantics (both orders of each unordered pair, serial-commutes).

HBM traffic: positions/AABBs in, deltas out — no [n, n] tensor ever leaves
VMEM.  The diagonal is explicitly zeroed: i==j terms would otherwise
multiply a huge rsqrt(eps) into the two matmul paths whose cancellation is
only exact in infinite precision.

Layout: ALL kernel operands are coordinate-major [W, 3, n] (n padded to a
multiple of 128 = full lanes).  A first version passed [W, n, 3] blocks and
was 100x slower in-graph: a trailing dim of 3 wastes 125/128 lanes of every
VMEM tile and forces relayouts.  M is symmetric (d2 and overlap both are),
so the reduction works entirely in transposed space:
  out[3, n] = -2 * (X_t M - X_t * colsum(M)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_t_ref, lo_t_ref, hi_t_ref, mask_r_ref, out_ref):
    wb = pos_t_ref.shape[0]
    n = pos_t_ref.shape[2]

    eye_c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    eye_r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    not_eye = (eye_c != eye_r).astype(jnp.float32)

    for w in range(wb):
        xt = pos_t_ref[w]       # [3, n]
        gram = jax.lax.dot_general(
            xt, xt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [n, n]
        sq = jnp.sum(xt * xt, axis=0, keepdims=True)     # [1, n]
        # d2_ij = |x_i|^2 + |x_j|^2 - 2 x_i.x_j ; column vector via the
        # symmetric transpose trick: sq as both row ([1,n]) and, through
        # the gram diagonal... use broadcasted transpose-free form:
        d2 = jnp.transpose(sq) + sq - 2.0 * gram

        lo_t = lo_t_ref[w]      # [3, n]
        hi_t = hi_t_ref[w]
        ok = jnp.transpose(mask_r_ref[w]) * mask_r_ref[w]   # [n,1]*[1,n]
        for a in range(3):
            lo_r = lo_t[a:a + 1, :]     # [1, n]
            hi_r = hi_t[a:a + 1, :]
            ok = ok * (
                (jnp.transpose(lo_r) <= hi_r)
                & (jnp.transpose(hi_r) >= lo_r)
            ).astype(jnp.float32)
        ok = ok * not_eye

        m = ok * jax.lax.rsqrt(jnp.maximum(d2, 1e-30))   # [n, n] symmetric
        xm = jax.lax.dot_general(
            xt, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [3, n]
        colsum = jnp.sum(m, axis=0, keepdims=True)       # [1, n]
        out_ref[w] = -2.0 * (xm - xt * colsum)


@functools.partial(jax.jit, static_argnames=("interpret",))
def collision_pushes(pos, lo, hi, mask, interpret: bool = False):
    """pos [W, n, 3], lo/hi [W, n, 3], mask [W, n] bool -> delta [W, n, 3].

    Equivalent to the dense XLA path in models/collisions.py solver (all
    overlapping ordered pairs, -2 * sum of unit center-line normals).
    """
    W, n0, _ = pos.shape
    n = ((n0 + 127) // 128) * 128
    # worlds per program, bounded by VMEM: the kernel's live set is
    # ~3 x [n, n] f32 tiles per world iteration (gram/d2/m) plus operands;
    # keep wb * n^2 * 12B under ~6 MB of the 16 MB scoped budget.
    if n * n * 12 > 6 * 1024 * 1024:
        raise ValueError(
            f"collision_pushes: n={n0} pads to {n}; the [n, n] pair tiles "
            "exceed the VMEM budget — tile the pair matrix (planned) or "
            "use the XLA dense path for n > ~700")
    wb = max(1, min(8, (6 * 1024 * 1024) // max(n * n * 12, 1)))
    while W % wb != 0:
        wb -= 1

    def prep(x, fill=0.0):
        # [W, n0, 3] -> coordinate-major padded [W, 3, n]
        xt = jnp.swapaxes(x, 1, 2)
        return jnp.pad(xt, ((0, 0), (0, 0), (0, n - n0)), constant_values=fill)

    # center per world: d2 and the push sum are translation-invariant, and
    # centering avoids f32 cancellation in |x|^2 at large coordinates
    pos = pos - jnp.mean(pos, axis=1, keepdims=True)
    pos_t = prep(pos)
    lo_t = prep(lo, fill=1.0)    # degenerate AABBs: overlap nothing
    hi_t = prep(hi, fill=-1.0)
    mask_r = jnp.pad(mask.astype(jnp.float32)[:, None, :],
                     ((0, 0), (0, 0), (0, n - n0)))      # [W, 1, n]

    grid = (W // wb,)

    def bs(shape):
        return pl.BlockSpec((wb,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[bs((3, n)), bs((3, n)), bs((3, n)), bs((1, n))],
        out_specs=bs((3, n)),
        out_shape=jax.ShapeDtypeStruct((W, 3, n), jnp.float32),
        interpret=interpret,
    )(pos_t, lo_t, hi_t, mask_r)
    return jnp.swapaxes(out[:, :, :n0], 1, 2)
