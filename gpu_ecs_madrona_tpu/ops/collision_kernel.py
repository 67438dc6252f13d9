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
        lo_t = lo_t_ref[w]      # [3, n]
        hi_t = hi_t_ref[w]
        ok = jnp.transpose(mask_r_ref[w]) * mask_r_ref[w]   # [n,1]*[1,n]
        # d2 subtract-first (NOT the Gram matmul): on the TPU MXU the
        # f32 matmul runs one bf16 pass by default, and the Gram
        # cancellation |xi|^2+|xj|^2-2<xi,xj> then computes close-pair d2
        # negative -> rsqrt(clamp) explodes (utils/math.py EXACT note;
        # exactly the failure the XLA-path solver hit on v5e).
        d2 = jnp.zeros((n, n), jnp.float32)
        for a in range(3):
            lo_r = lo_t[a:a + 1, :]     # [1, n]
            hi_r = hi_t[a:a + 1, :]
            ok = ok * (
                (jnp.transpose(lo_r) <= hi_r)
                & (jnp.transpose(hi_r) >= lo_r)
            ).astype(jnp.float32)
            diff = jnp.transpose(xt[a:a + 1, :]) - xt[a:a + 1, :]
            d2 = d2 + diff * diff
        ok = ok * not_eye

        m = ok * jax.lax.rsqrt(jnp.maximum(d2, 1e-30))   # [n, n] symmetric
        xm = jax.lax.dot_general(
            xt, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [3, n]
        colsum = jnp.sum(m, axis=0, keepdims=True)       # [1, n]
        out_ref[w] = -2.0 * (xm - xt * colsum)


def _kernel_tiled(pos_i_ref, lo_i_ref, hi_i_ref, mask_i_ref,
                  pos_j_ref, lo_j_ref, hi_j_ref, mask_j_ref, out_ref,
                  *, tile: int):
    """One (world, i-tile, j-tile) program of the tiled pair matrix.

    Accumulates the j-tile's contribution to the i-tile's push: the pair
    matrix [n, n] never exists whole — only a [Ti, Tj] window lives in
    VMEM.  Output revisiting over the fastest (j) grid axis does the
    reduction; `@pl.when(j == 0)` initializes.
    """
    j = pl.program_id(2)
    ti = tile

    xt_i = pos_i_ref[0]     # [3, Ti]
    xt_j = pos_j_ref[0]     # [3, Tj]

    # d2 from per-axis differences (subtract-first), not the Gram form:
    # the Gram trick cancels |x|^2-scale terms and loses close-pair d2 to
    # f32 rounding (rsqrt then explodes).  Three [Ti, Tj] broadcast passes
    # cost about the same as the AABB compares below and are exact.
    d2 = jnp.zeros((ti, ti), jnp.float32)
    for a in range(3):
        diff = jnp.transpose(xt_i[a:a + 1, :]) - xt_j[a:a + 1, :]
        d2 = d2 + diff * diff

    ok = jnp.transpose(mask_i_ref[0]) * mask_j_ref[0]    # [Ti,1]*[1,Tj]
    lo_i, hi_i = lo_i_ref[0], hi_i_ref[0]
    lo_j, hi_j = lo_j_ref[0], hi_j_ref[0]
    for a in range(3):
        ok = ok * (
            (jnp.transpose(lo_i[a:a + 1, :]) <= hi_j[a:a + 1, :])
            & (jnp.transpose(hi_i[a:a + 1, :]) >= lo_j[a:a + 1, :])
        ).astype(jnp.float32)
    # global diagonal: i-tile row r is body pid(1)*Ti + r, j-tile col c is
    # body pid(2)*Tj + c (Ti == Tj == tile)
    gi = pl.program_id(1) * ti + jax.lax.broadcasted_iota(
        jnp.int32, (ti, ti), 0)
    gj = j * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, ti), 1)
    ok = ok * (gi != gj).astype(jnp.float32)

    m = ok * jax.lax.rsqrt(jnp.maximum(d2, 1e-30))       # [Ti, Tj]
    # sum_j m_ij x_j  ->  [3, Ti]
    xm = jax.lax.dot_general(
        xt_j, m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    # rowsum_i = sum_j m_ij as [1, Ti] via a ones matmul (stays on the MXU;
    # a [Ti,1] -> [1,Ti] transpose would relayout)
    rowsum = jax.lax.dot_general(
        jnp.ones((1, ti), jnp.float32), m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [1, Ti]
    part = -2.0 * (xm - xt_i * rowsum)

    @pl.when(j == 0)
    def _():
        out_ref[0] = part

    @pl.when(j != 0)
    def _():
        out_ref[0] += part


@functools.partial(jax.jit, static_argnames=("interpret", "force_tile"))
def collision_pushes(pos, lo, hi, mask, interpret: bool = False,
                     force_tile: int = 0):
    """pos [W, n, 3], lo/hi [W, n, 3], mask [W, n] bool -> delta [W, n, 3].

    Equivalent to the dense XLA path in models/collisions.py solver (all
    overlapping ordered pairs, -2 * sum of unit center-line normals).

    Small n (padded [n, n] grid fits VMEM): one program per world-block,
    whole pair grid resident.  Large n: the pair matrix is tiled
    [tile, tile] with output revisiting over the j axis — n is unbounded
    (HBM traffic stays positions/AABBs in, deltas out; tiles stream).
    `force_tile` pins the tile size (testing).
    """
    W, n0, _ = pos.shape
    n = ((n0 + 127) // 128) * 128
    # Single-block path bound: the live set is ~3 x [n, n] f32 tiles per
    # world iteration (gram/d2/m) plus operands; keep n^2 * 12B under ~6 MB
    # of the 16 MB scoped budget.
    tiled = force_tile > 0 or n * n * 12 > 6 * 1024 * 1024
    if tiled:
        tile = force_tile if force_tile > 0 else 512
        n = ((n0 + tile - 1) // tile) * tile
        wb = 1
    else:
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

    if tiled:
        nt = n // tile
        grid = (W, nt, nt)

        def bs_i(rows):
            return pl.BlockSpec((1, rows, tile), lambda w, i, j: (w, 0, i),
                                memory_space=pltpu.VMEM)

        def bs_j(rows):
            return pl.BlockSpec((1, rows, tile), lambda w, i, j: (w, 0, j),
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            functools.partial(_kernel_tiled, tile=tile),
            grid=grid,
            in_specs=[bs_i(3), bs_i(3), bs_i(3), bs_i(1),
                      bs_j(3), bs_j(3), bs_j(3), bs_j(1)],
            out_specs=bs_i(3),
            out_shape=jax.ShapeDtypeStruct((W, 3, n), jnp.float32),
            interpret=interpret,
        )(pos_t, lo_t, hi_t, mask_r, pos_t, lo_t, hi_t, mask_r)
        return jnp.swapaxes(out[:, :, :n0], 1, 2)

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


def _kernel_fused_step(pos_t_ref, rot_t_ref, mask_r_ref,
                       delta_ref, lo_ref, hi_ref):
    """Whole collisions step in VMEM: AABB from the rotated unit cube,
    overlap grid, and the pair-push reduction — nothing [n, n] touches HBM.

    The AABB of the +-1 corner cube under rotation R centered at p is
    p -+ e with e_a = sum_b |R_ab| (the min/max over all eight sign
    combinations of (R c)_a is -+ that row-abs sum), so the eight-corner
    transform of the XLA path (models/collisions.py aabb_preprocess)
    collapses to nine quat products per body.
    """
    wb = pos_t_ref.shape[0]
    n = pos_t_ref.shape[2]

    pt = pos_t_ref[...]                       # [wb, 3, n]
    qw = rot_t_ref[:, 0:1, :]                 # [wb, 1, n]
    qx = rot_t_ref[:, 1:2, :]
    qy = rot_t_ref[:, 2:3, :]
    qz = rot_t_ref[:, 3:4, :]
    two = jnp.float32(2.0)
    r00 = 1.0 - two * (qy * qy + qz * qz)
    r01 = two * (qx * qy - qw * qz)
    r02 = two * (qx * qz + qw * qy)
    r10 = two * (qx * qy + qw * qz)
    r11 = 1.0 - two * (qx * qx + qz * qz)
    r12 = two * (qy * qz - qw * qx)
    r20 = two * (qx * qz - qw * qy)
    r21 = two * (qy * qz + qw * qx)
    r22 = 1.0 - two * (qx * qx + qy * qy)
    e = jnp.concatenate(
        [jnp.abs(r00) + jnp.abs(r01) + jnp.abs(r02),
         jnp.abs(r10) + jnp.abs(r11) + jnp.abs(r12),
         jnp.abs(r20) + jnp.abs(r21) + jnp.abs(r22)], axis=1)  # [wb, 3, n]
    lo_ref[...] = pt - e
    hi_ref[...] = pt + e

    eye_c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    eye_r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    not_eye = (eye_c != eye_r).astype(jnp.float32)

    for w in range(wb):
        # Per-world operands are re-read from REFS, not sliced from the
        # computed [wb, 3, n] values: Mosaic (2026-08, v5e) miscompiles
        # python-int slicing of large multi-world intermediates inside this
        # loop (wrong deltas at wb=8; exact at wb=1), while the identical
        # ref-indexed pattern (_kernel above) is correct.  Reading lo/hi
        # back through the output refs also keeps the live set per
        # iteration at [3, n] instead of wb x [3, n].
        xt = pos_t_ref[w]       # [3, n]
        lo_t, hi_t = lo_ref[w], hi_ref[w]
        ok = jnp.transpose(mask_r_ref[w]) * mask_r_ref[w]
        d2 = jnp.zeros((n, n), jnp.float32)
        for a in range(3):
            ok = ok * (
                (jnp.transpose(lo_t[a:a + 1, :]) <= hi_t[a:a + 1, :])
                & (jnp.transpose(hi_t[a:a + 1, :]) >= lo_t[a:a + 1, :])
            ).astype(jnp.float32)
            diff = jnp.transpose(xt[a:a + 1, :]) - xt[a:a + 1, :]
            d2 = d2 + diff * diff
        ok = ok * not_eye
        m = ok * jax.lax.rsqrt(jnp.maximum(d2, 1e-30))   # [n, n] symmetric
        xm = jax.lax.dot_general(
            xt, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [3, n]
        colsum = jnp.sum(m, axis=0, keepdims=True)
        delta_ref[w] = -2.0 * (xm - xt * colsum)


@functools.partial(jax.jit, static_argnames=("interpret", "force_wb"))
def fused_collisions_step(pos, rot, mask, interpret: bool = False,
                          force_wb: int = 0):
    """pos [W, n, 3], rot [W, n, 4] (w-first quats), mask [W, n] bool ->
    (delta [W, n, 3], lo [W, n, 3], hi [W, n, 3]).

    One pallas_call covering the collisions example's whole per-tick chain
    (models/collisions.py aabb_preprocess + solver; the reference's
    broadphase/narrowphase job chain, examples/collisions/collisions.cpp).
    The [n, n] overlap/distance grids live only in VMEM; HBM traffic is
    pos/rot in, delta/aabb out.  d2 is computed subtract-first (exact for
    close pairs, no Gram cancellation).
    """
    W, n0, _ = pos.shape
    n = ((n0 + 127) // 128) * 128
    if n * n * 12 > 6 * 1024 * 1024:
        raise ValueError(
            f"fused_collisions_step: n={n0} exceeds the single-tile bound; "
            "use collision_pushes (tiled) + the XLA aabb node for large n")
    wb = force_wb or max(1, min(8, (6 * 1024 * 1024) // max(n * n * 12, 1)))
    while W % wb != 0:
        wb -= 1

    def prep(x, c, fill=0.0):
        xt = jnp.swapaxes(x, 1, 2)
        return jnp.pad(xt, ((0, 0), (0, 0), (0, n - n0)), constant_values=fill)

    pos_t = prep(pos, 3)
    rot_t = prep(rot, 4)
    mask_r = jnp.pad(mask.astype(jnp.float32)[:, None, :],
                     ((0, 0), (0, 0), (0, n - n0)))

    grid = (W // wb,)

    def bs(shape):
        return pl.BlockSpec((wb,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    delta, lo, hi = pl.pallas_call(
        _kernel_fused_step,
        grid=grid,
        in_specs=[bs((3, n)), bs((4, n)), bs((1, n))],
        out_specs=[bs((3, n)), bs((3, n)), bs((3, n))],
        out_shape=[jax.ShapeDtypeStruct((W, 3, n), jnp.float32)] * 3,
        interpret=interpret,
    )(pos_t, rot_t, mask_r)
    unprep = lambda x: jnp.swapaxes(x[:, :, :n0], 1, 2)
    return unprep(delta), unprep(lo), unprep(hi)
