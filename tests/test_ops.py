"""Pallas kernel tests (interpret mode on CPU) — parity vs the XLA
reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu.ops.collision_kernel import collision_pushes
from gpu_ecs_madrona_tpu.utils import math as m


def reference_pushes(pos, lo, hi, mask):
    n = pos.shape[1]
    ok = m.aabb_overlaps(lo[:, :, None, :], hi[:, :, None, :],
                         lo[:, None, :, :], hi[:, None, :, :])
    ok = ok & mask[:, :, None] & mask[:, None, :] & ~jnp.eye(n, dtype=bool)[None]
    diff = pos[:, None, :, :] - pos[:, :, None, :]
    inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(diff * diff, -1, keepdims=True), 1e-30))
    return -2.0 * jnp.sum(jnp.where(ok[..., None], diff * inv, 0.0), axis=2)


def test_collision_pushes_parity():
    key = jax.random.PRNGKey(3)
    W, n = 4, 37  # non-multiple-of-128 exercises padding
    pos = jax.random.uniform(key, (W, n, 3), minval=-5, maxval=5)
    lo, hi = pos - 1.3, pos + 1.3
    mask = jnp.ones((W, n), bool).at[:, -5:].set(False)
    got = collision_pushes(pos, lo, hi, mask, interpret=True)
    want = reference_pushes(pos, lo, hi, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_collision_pushes_dead_rows_zero():
    key = jax.random.PRNGKey(5)
    W, n = 2, 16
    pos = jax.random.uniform(key, (W, n, 3), minval=-1, maxval=1)
    lo, hi = pos - 2.0, pos + 2.0
    mask = jnp.zeros((W, n), bool).at[:, :4].set(True)
    got = np.asarray(collision_pushes(pos, lo, hi, mask, interpret=True))
    # dead rows receive no pushes
    assert np.allclose(got[:, 4:], 0.0)
    assert np.isfinite(got).all()


def test_collisions_example_pallas_matches_xla():
    """The example's solver with use_pallas must match the XLA path."""
    from gpu_ecs_madrona_tpu.models import collisions as col

    # on the CPU test backend use_pallas auto-disables; force parity via
    # the kernel in interpret mode against the model's dense path instead
    cfg = col.CollisionsConfig(num_worlds=2, num_objects=12, max_pairs=256,
                               seed=8, use_pallas=False)
    sim = col.make_executor(cfg)
    sim.step()
    pos = sim.mgr.column(sim.state, col.CubeObject, col.Translation)
    aabb = sim.mgr.column(sim.state, col.CubeObject, col.PhysicsAABB)
    mask = sim.mgr.row_mask(sim.state, col.CubeObject)
    k = collision_pushes(pos, aabb["lo"], aabb["hi"], mask, interpret=True)
    x = reference_pushes(pos, aabb["lo"], aabb["hi"], mask)
    np.testing.assert_allclose(np.asarray(k), np.asarray(x), atol=1e-4)


def test_collision_pushes_tiled_parity():
    """Pair-matrix tiled path (large n) matches the reference formula and
    the single-block path, including masked/padded rows and the diagonal."""
    key = jax.random.PRNGKey(11)
    W, n = 2, 200
    pos = jax.random.uniform(key, (W, n, 3), minval=-5, maxval=5)
    lo, hi = pos - 0.8, pos + 0.8
    mask = jnp.ones((W, n), bool).at[:, -7:].set(False)
    got = collision_pushes(pos, lo, hi, mask, interpret=True, force_tile=128)
    want = reference_pushes(pos, lo, hi, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # the single-block path computes d2 in Gram form (different rounding
    # near contact) — cross-formulation agreement is loose by construction
    single = collision_pushes(pos, lo, hi, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(single), atol=5e-2)


def test_collision_pushes_tiled_close_pairs_exact():
    """The tiled path computes d2 subtract-first: a near-coincident pair at
    large coordinates must yield a unit-normal push (magnitude 2), not a
    Gram-cancellation explosion."""
    pos = np.zeros((1, 2, 3), np.float32)
    pos[0, 0] = [50.0, 50.0, 50.0]
    pos[0, 1] = [50.02, 50.0, 50.0]   # true d2 = 4e-4, |x|^2 ~ 7.5e3
    lo, hi = pos - 0.5, pos + 0.5
    mask = np.ones((1, 2), bool)
    out = np.asarray(collision_pushes(pos, lo, hi, mask, interpret=True,
                                      force_tile=128))
    assert abs(np.linalg.norm(out[0, 0]) - 2.0) < 1e-3


def test_fused_collisions_step_trajectory_parity():
    """fused=True (one pallas_call megakernel, interpret on CPU) must
    reproduce the XLA node-chain trajectory."""
    from gpu_ecs_madrona_tpu.models import collisions as col

    def traj(fused):
        cfg = col.CollisionsConfig(num_worlds=4, num_objects=24,
                                   max_pairs=256, seed=3, fused=fused)
        sim = col.make_executor(cfg)
        out = []
        for _ in range(5):
            sim.step()
            out.append(np.asarray(
                sim.mgr.column(sim.state, col.CubeObject, col.Translation)))
        return out

    for a, b in zip(traj(False), traj(True)):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_mask_cumsum_last_exact():
    """MXU triangular-matmul cumsum == jnp.cumsum for 0/1 masks, at the
    shapes the rank-compaction broadphases use and at the bf16-boundary
    width n=300 (sums up to 300 must still be exact via f32 accumulate)."""
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for shape in [(4, 7, 13), (2, 100, 100), (3, 300), (5,)]:
        mask = rng.random(shape) < 0.7
        got = np.asarray(m.mask_cumsum_last(jnp.asarray(mask)))
        want = np.cumsum(mask, axis=-1).astype(np.int32)
        np.testing.assert_array_equal(got, want, err_msg=str(shape))
