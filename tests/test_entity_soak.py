"""Entity-handle generation soak (VERDICT round-1 weak #9): churn one slot
past the generation wrap and pin down the aliasing contract.

Default split (GEM_TPU_ENTITY_ID_BITS=20) gives 11 generation bits: a slot
recycled exactly 2^11 times aliases a stale handle (reference IDMap has
32-bit gens, impl/id_map.hpp:19-138, so it practically never wraps).  The
documented mitigation is trading id bits for gen bits via
GEM_TPU_ENTITY_ID_BITS (read at import) — verified here in a subprocess
with 8 id bits / 23 gen bits, where the same churn does NOT alias.
"""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np

from gpu_ecs_madrona_tpu.core.component import (
    Archetype,
    ENTITY_GEN_BITS,
    component,
)
from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
from gpu_ecs_madrona_tpu.core.state import StateManager

Val = component("SoakVal", ((), jnp.float32))
Thing = Archetype("SoakThing", [Val])


def _churn_setup():
    registry = ECSRegistry()
    registry.register_archetype(Thing, capacity=2)
    mgr = StateManager(registry, num_worlds=1, max_entities_per_world=4)
    state = mgr.make_initial_state(seed=0)

    @jax.jit
    def churn(s):
        """Destroy the live entity in slot 0 and recreate it (one recycle:
        gen increments on destroy)."""
        ent = s["arch"][Thing.name]["entity"][:, 0:1]
        s = mgr.destroy_entities(s, ent)
        s, _ = mgr.make_entities(s, Thing, counts=1, max_new=1)
        return s

    state, first = mgr.make_entities(state, Thing, counts=1, max_new=1)
    return mgr, state, churn, first


def test_stale_handles_die_before_wrap():
    mgr, state, churn, first = _churn_setup()
    h0 = first[:, 0:1]
    # a handful of recycles: the stale handle must be dead every time
    for i in range(5):
        state = churn(state)
        _, _, live = mgr.lookup(state, h0)
        assert not bool(np.asarray(live)[0, 0]), f"stale live after {i+1}"


def test_gen_wrap_aliases_at_2_pow_gen_bits():
    """The wrap is real and lands exactly where the bit split says: after
    2^ENTITY_GEN_BITS recycles the stale handle ALIASES (this is the
    documented contract, not a bug — widen gen bits to push it out)."""
    wrap = 1 << ENTITY_GEN_BITS
    mgr, state, churn, first = _churn_setup()
    h0 = first[:, 0:1]
    for i in range(wrap - 1):
        state = churn(state)
    _, _, live = mgr.lookup(state, h0)
    assert not bool(np.asarray(live)[0, 0]), "stale live one before wrap"
    state = churn(state)
    _, _, live = mgr.lookup(state, h0)
    assert bool(np.asarray(live)[0, 0]), (
        "expected documented aliasing at the wrap; if this fails the gen "
        "accounting changed — update the contract docs")


def test_wider_gen_bits_defer_wrap():
    """GEM_TPU_ENTITY_ID_BITS=8 -> 23 gen bits: the same churn count that
    aliases under the default split stays dead (subprocess: the split is
    read at import)."""
    wrap_default = 1 << ENTITY_GEN_BITS
    script = textwrap.dedent(f"""
        import os
        os.environ["GEM_TPU_ENTITY_ID_BITS"] = "8"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        import jax.numpy as jnp
        from gpu_ecs_madrona_tpu.core.component import (Archetype, component,
                                                        ENTITY_GEN_BITS)
        from gpu_ecs_madrona_tpu.core.registry import ECSRegistry
        from gpu_ecs_madrona_tpu.core.state import StateManager
        assert ENTITY_GEN_BITS == 23, ENTITY_GEN_BITS
        Val = component("SoakVal2", ((), jnp.float32))
        Thing = Archetype("SoakThing2", [Val])
        registry = ECSRegistry()
        registry.register_archetype(Thing, capacity=2)
        mgr = StateManager(registry, num_worlds=1, max_entities_per_world=4)
        state = mgr.make_initial_state(seed=0)
        state, first = mgr.make_entities(state, Thing, counts=1, max_new=1)
        h0 = first[:, 0:1]

        @jax.jit
        def churn(s):
            ent = s["arch"][Thing.name]["entity"][:, 0:1]
            s = mgr.destroy_entities(s, ent)
            s, _ = mgr.make_entities(s, Thing, counts=1, max_new=1)
            return s

        for _ in range({wrap_default}):
            state = churn(state)
        _, _, live = mgr.lookup(state, h0)
        assert not bool(np.asarray(live)[0, 0]), "aliased despite 23 gen bits"
        print("NO_ALIAS_OK")
    """)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr
    assert "NO_ALIAS_OK" in out.stdout
