"""Planck functions (reference: /root/reference/Model/radiation/real_gas.py:14-42)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import h_planck, k_boltzmann, speed_of_light


def _ns(x):
    if isinstance(x, (np.ndarray, np.generic, float, int)):
        return np
    return jnp


def B_freq(freq, T):
    """Planck spectral radiance per frequency: sigma T^4 = integral(pi B df).

    Overflow in exp for deep-Wien wavenumbers yields B -> 0, matching the
    reference's behaviour (real_gas.py:14-27); the NumPy path suppresses the
    (benign) overflow warning."""
    xp = _ns(freq) if not isinstance(freq, (float, int)) else _ns(T)
    u = h_planck * freq / (k_boltzmann * T)
    if xp is np:
        with np.errstate(over='ignore'):
            return (2.0 * h_planck * freq ** 3 / speed_of_light ** 2) \
                / (np.exp(u) - 1.0)
    return (2.0 * h_planck * freq ** 3 / speed_of_light ** 2) / (xp.exp(u) - 1.0)


def B_wavenumber(nu, T):
    """Planck spectral radiance per wavenumber (cm^-1):
    sigma T^4 = integral(pi B dnu)."""
    dfreq_dnu = 100.0 * speed_of_light
    return dfreq_dnu * B_freq(100.0 * nu * speed_of_light, T)
