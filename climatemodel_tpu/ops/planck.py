"""Planck functions (reference: /root/reference/Model/radiation/real_gas.py:14-42).

The reference forms 2 h f^3 / c^2 directly; f^3 ~ 1e46 overflows float32, so we
group the constants as ((2h/c^2)^(1/3) f)^3 and use expm1 — identical in exact
arithmetic (float64 agreement ~1e-15 relative) but finite in f32 on TPU, where
deep-Wien wavenumbers then round gracefully to B = 0 (x / inf)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import h_planck, k_boltzmann, speed_of_light

_CBRT_2H_OVER_C2 = float((2.0 * h_planck / speed_of_light ** 2) ** (1.0 / 3.0))
# per-wavenumber (cm^-1) constants: B_nu = ((c1 nu)^3) / expm1(c2 nu / T)
_C1 = float((2.0e8 * h_planck * speed_of_light ** 2) ** (1.0 / 3.0))
_C2 = float(100.0 * h_planck * speed_of_light / k_boltzmann)


def _ns(x):
    """Array namespace of the argument: host NumPy stays NumPy (float64 grid
    building must not round-trip through the accelerator's float32), traced
    values use jnp.  Canonical copy — imported by the other namespace-
    polymorphic modules (transmission, optical_depth, humidity)."""
    if isinstance(x, (np.ndarray, np.generic, float, int)):
        return np
    return jnp


def B_freq(freq, T):
    """Planck spectral radiance per frequency: sigma T^4 = integral(pi B df)."""
    xp = _ns(freq) if not isinstance(freq, (float, int)) else _ns(T)
    u = h_planck * freq / (k_boltzmann * T)
    if xp is np:
        with np.errstate(over='ignore'):
            return (_CBRT_2H_OVER_C2 * freq) ** 3 / np.expm1(u)
    return (_CBRT_2H_OVER_C2 * freq) ** 3 / xp.expm1(u)


def B_wavenumber(nu, T):
    """Planck spectral radiance per wavenumber (cm^-1):
    sigma T^4 = integral(pi B dnu)."""
    xp = _ns(nu) if not isinstance(nu, (float, int)) else _ns(T)
    u = _C2 * nu / T
    if xp is np:
        with np.errstate(over='ignore'):
            return (_C1 * nu) ** 3 / np.expm1(u)
    return (_C1 * nu) ** 3 / xp.expm1(u)
