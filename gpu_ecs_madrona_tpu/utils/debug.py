"""In-step debug printing + runtime checks.

Counterpart of the reference's HostPrint device->host printf channel
(src/mw/device/include/madrona/mw_gpu/host_print.hpp + the polling host
thread, cuda_exec.cpp:39-186).  On TPU this whole machinery collapses into
jax.debug.print (XLA outfeed + host callback); host_print exists so system
code reads like the reference's HostPrint::log.

check() wraps jax.debug to assert invariants inside jitted systems — the
"device debug build" analog (reference MADRONA_MWGPU_FORCE_DEBUG), gated by
GEM_TPU_DEBUG so release steps pay nothing.
"""

import os

import jax

DEBUG = bool(os.environ.get("GEM_TPU_DEBUG"))


def host_print(fmt: str, *args, **kwargs):
    """reference HostPrint::log — usable inside jitted system functions."""
    jax.debug.print(fmt, *args, **kwargs)


def check(pred, fmt: str, *args):
    """Debug-gated in-step invariant check (prints on violation).  No-op
    unless GEM_TPU_DEBUG is set."""
    if not DEBUG:
        return
    import jax.numpy as jnp

    def report(ok, *a):
        jax.debug.print("CHECK FAILED: " + fmt, *a)

    jax.lax.cond(jnp.all(pred), lambda *a: None, lambda *a: report(pred, *a), *args)
