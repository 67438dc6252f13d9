"""Tensor bindings tests (reference src/python/bindings.cpp parity)."""

import numpy as np
import jax.numpy as jnp

from gpu_ecs_madrona_tpu.bindings import Tensor, exported_tensor
from gpu_ecs_madrona_tpu.models import collisions as col


def make_sim():
    return col.make_executor(
        col.CollisionsConfig(num_worlds=2, num_objects=8, max_pairs=64, seed=1))


def test_exported_tensor_roundtrip():
    sim = make_sim()
    t = exported_tensor(sim, 0)
    assert t.shape[0] == 2
    n = t.to_numpy()
    assert np.isfinite(n[np.asarray(t.mask)]).all()


def test_to_torch_zero_copy_cpu():
    sim = make_sim()
    t = exported_tensor(sim, 0)
    tt = t.to_torch()
    import torch

    assert isinstance(tt, torch.Tensor)
    assert tt.shape == t.shape
    np.testing.assert_allclose(tt.numpy(), np.asarray(t.values))


def test_from_torch():
    import torch

    x = torch.arange(12, dtype=torch.float32).reshape(3, 4)
    j = Tensor.from_torch(x)
    np.testing.assert_allclose(np.asarray(j), x.numpy())


def test_torch_action_injection():
    """RL-loop pattern: learner writes actions via torch, sim consumes them
    (reference copyInExportedColumns + CudaSync flow)."""
    import torch

    sim = make_sim()
    t = exported_tensor(sim, 0)
    actions = t.to_torch().clone()
    actions[:, :, 2] = 5.0
    sim.set_exported(0, Tensor.from_torch(actions))
    sim.step()
    t2 = exported_tensor(sim, 0)
    vals = np.asarray(t2.values)
    live = np.asarray(t2.mask)
    # solver pushes may move z slightly; it must be near 5, not the old value
    assert (np.abs(vals[live][:, 2] - 5.0) < 2.0).all()


def test_struct_component_tensor():
    from gpu_ecs_madrona_tpu.models import fantasy_vs as fvs

    sim = fvs.make_executor(fvs.FantasyVsConfig(num_worlds=2, num_dragons=3,
                                                num_knights=5, seed=2))
    t = exported_tensor(sim, 1)  # Dragon Health (struct -> dict)
    tt = t.to_torch()
    assert set(tt.keys()) == {"hp"}
    assert (tt["hp"].numpy()[np.asarray(t.mask)] == 1000).all()


def test_packed_export_roundtrip():
    """get_exported(slot, packed=True): the reference's cross-world packed
    layout (exportBlockSums + exportCopyOut, device/consts.cpp:137-273) —
    live rows compacted to the front in (world, row) order with
    counts/offsets, consumable by torch without reimplementing
    compaction.  Validated against the padded view on a world with
    per-world divergent live sets (fantasy_vs churn)."""
    from gpu_ecs_madrona_tpu.models import fantasy_vs as fv

    sim = fv.make_executor(fv.FantasyVsConfig(num_worlds=3, seed=5),
                           donate=False)
    sim.run(6)  # churn: worlds diverge in live counts
    vals, mask = sim.get_exported(0)
    packed, counts, offsets = sim.get_exported(0, packed=True)
    vals = np.asarray(vals)
    mask = np.asarray(mask)
    packed = np.asarray(packed)
    counts = np.asarray(counts)
    offsets = np.asarray(offsets)

    assert (counts == mask.sum(axis=1)).all()
    assert (offsets == np.cumsum(counts) - counts).all()
    total = counts.sum()
    # per-world slices match the padded view's live rows, order preserved
    for w in range(mask.shape[0]):
        expect = vals[w][mask[w]]
        got = packed[offsets[w]:offsets[w] + counts[w]]
        np.testing.assert_array_equal(got, expect)
    # tail is zero padding
    assert (packed[total:] == 0).all()

    # torch hand-off of the packed buffer
    import torch
    t = torch.from_numpy(packed[:total].copy())
    assert t.shape[0] == total
