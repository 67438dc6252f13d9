"""64-bit entity handles (opt-in, GEM_TPU_ENTITY_64=1): the reference's
full Entity{gen:32, id:32} headroom (ecs.hpp:17-44), closing the int32
default's generation-wrap alias window (2^11 reuses of one slot).

The flag is read at package import, so the checks run in a subprocess."""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent("""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["GEM_TPU_ENTITY_64"] = "1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from gpu_ecs_madrona_tpu.core.component import (
        Entity, ENTITY_GEN_BITS, ENTITY_ID_BITS)

    assert Entity.dtype == jnp.int64
    assert ENTITY_ID_BITS == 32 and ENTITY_GEN_BITS == 31

    # pack/unpack roundtrip far beyond the int32 default's 2^11 gen cap
    eids = jnp.array([0, 1, 123456, (1 << 31)], jnp.int64)
    gens = jnp.array([0, 5000, (1 << 20), (1 << 30)], jnp.int64)
    h = Entity.pack(eids, gens)
    assert (np.asarray(Entity.id(h)) ==
            np.asarray(eids & ((1 << 32) - 1)).astype(np.int64)
            .astype(np.int32)).all()
    assert (np.asarray(Entity.gen(h)) == np.asarray(gens)).all()
    assert not bool(Entity.is_null(h).any())
    assert bool(Entity.is_null(Entity.null()))

    # no aliasing after >2^11 reuse cycles of the same slot: a stale
    # handle from cycle 0 must stay dead at cycle 3000 (in int32 mode the
    # same loop aliases at cycle 2048 — tests/test_entity_soak.py)
    from gpu_ecs_madrona_tpu import (Archetype, ExecutorConfig,
                                     TaskGraphExecutor, component)
    Tag = component("E64Tag", ((), jnp.int32))
    A = Archetype("E64Arch", [Tag])

    class W:
        @staticmethod
        def register_types(r):
            r.register_archetype(A, capacity=2)
            r.export_column(A, Tag, 0)

        @staticmethod
        def init(ctx, init_data=None):
            ctx.data = {"_": jnp.zeros((ctx.num_worlds, 1))}

        @staticmethod
        def setup_tasks(builder):
            def churn(ctx):
                ents = ctx.make_entities(A, counts=1, max_new=1,
                                         values={Tag: jnp.zeros(
                                             (ctx.num_worlds, 1), jnp.int32)})
                ctx.destroy_entities(ents)
            builder.add_node(churn, name="churn")

    sim = TaskGraphExecutor(W, ExecutorConfig(num_worlds=2,
                                              max_entities_per_world=4,
                                              seed=0, donate=False))
    # grab a handle from the first cycle, then churn well past 2^11
    from gpu_ecs_madrona_tpu.core.context import Context
    ctx = Context(sim.mgr, sim.state)
    stale = ctx.make_entities(A, counts=1, max_new=1,
                              values={Tag: jnp.zeros((2, 1), jnp.int32)})
    ctx.destroy_entities(stale)
    sim._state = ctx.state
    sim.run(3000)
    _, _, live = sim.mgr.lookup(sim.state, stale)
    assert not bool(np.asarray(live).any()), \\
        "stale 64-bit handle aliased after churn"
    print("ENTITY64 OK")
""")


def test_entity64_subprocess():
    r = subprocess.run([sys.executable, "-c", SCRIPT], capture_output=True,
                       text=True, cwd=REPO, timeout=560,
                       env={**os.environ, "GEM_TPU_ENTITY_64": "1",
                            "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ENTITY64 OK" in r.stdout
