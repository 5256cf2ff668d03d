"""Test configuration.

Tests run on CPU with 8 virtual XLA devices (the SURVEY.md substitute for
multi-chip hardware: sharding/halo-exchange tests exercise real collectives on
the forced host platform) and float64 enabled so physics parity is checked
against the NumPy-double reference semantics.
"""
import os

# the session environment presets JAX_PLATFORMS=axon (the tunneled TPU); tests
# must run on the host CPU with virtual devices, so override unconditionally.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# the axon TPU plugin ignores the env var, so force the platform via config too
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
