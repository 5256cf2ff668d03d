"""Backend-selection helpers shared by every host-side entry point.

JAX's documented contract is that ``JAX_PLATFORMS=cpu`` selects the CPU
backend — but PLUGIN backends (the axon TPU tunnel in this environment)
register themselves regardless of the env var, so a script launched with
``JAX_PLATFORMS=cpu`` still initializes the tunnel on first jax use and
hangs indefinitely when the tunnel is wedged (or dies with
``Unable to initialize backend 'axon'`` when it is down).  Mirroring the
env var into ``jax.config`` before any jax use restores the documented
semantics.  The CLI (cli.py), bench (bench.py), driver entry
(__graft_entry__.py) and test conftest all do this; example scripts call
:func:`honor_platform_env` for the same guarantee.
"""
import os


def honor_platform_env():
    """Mirror ``JAX_PLATFORMS`` into ``jax.config`` (no-op when unset).

    Must run before the first jax operation of the process; safe to call
    multiple times.  Returns the platform string that was applied (or None).
    """
    plat = os.environ.get('JAX_PLATFORMS')
    if plat:
        import jax
        jax.config.update('jax_platforms', plat)
    return plat or None
