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


def probe_backend(timeout=150, env_override='CLIMATEMODEL_TPU_BENCH_PROBE_S'):
    """Initialize the configured jax backend in a BOUNDED subprocess.

    Returns ``(info_dict, None)`` on success — ``info_dict`` has
    ``platform``, ``n_devices`` and ``device`` — or ``(None, error_str)`` on
    failure/timeout.  The caller must not have touched ``jax.devices()``
    first: with the axon tunnel wedged, backend init blocks indefinitely
    inside the claim loop (BENCH_r03 died exactly there) and a killable
    subprocess is the only way to bound it.  ``env_override`` names an env
    var whose value (seconds) overrides ``timeout``.

    Shared by bench.py and __graft_entry__.py so wedged-tunnel semantics
    can't drift between the driver entry points.
    """
    import json
    import subprocess
    import sys
    if env_override:
        timeout = float(os.environ.get(env_override, timeout))
    # the child honors JAX_PLATFORMS the same way the parent does — an
    # explicit JAX_PLATFORMS=cpu must probe the CPU, not the preset plugin
    code = ('import os, jax, json; '
            'p = os.environ.get("JAX_PLATFORMS"); '
            'p and jax.config.update("jax_platforms", p); '
            'd = jax.devices(); '
            'print(json.dumps({"platform": d[0].platform, '
            '"n_devices": len(d), "device": str(d[0])}))')
    try:
        proc = subprocess.run(
            [sys.executable, '-c', code], capture_output=True, text=True,
            timeout=timeout)
    except subprocess.TimeoutExpired:
        return None, (f'backend init timed out after {timeout:.0f}s '
                      '(tunnel wedged?)')
    except Exception as e:                          # pragma: no cover
        return None, f'backend probe failed to launch: {e}'
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or '').strip()[-300:]
        return None, f'backend init failed (rc={proc.returncode}): {tail}'
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1]), None
    except Exception as e:
        return None, f'backend probe output unparseable: {e}'
