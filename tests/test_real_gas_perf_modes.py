"""Opt-in performance modes of the real-gas march: the bf16 transmission
cache trades ~3 significant digits in the cached [L, nz, nz-1] operators for
half the per-step HBM traffic (models/real_gas.py precompute_transmission)."""
import numpy as np
import pytest

from climatemodel_tpu.models.real_gas import RealGas
from climatemodel_tpu.spectral import humidity


def _make(cache_dtype=None):
    return RealGas(nz=40, ny=1, molecule_names=['single_line'], T_g=260.0,
                   q_funcs={'single_line': humidity.co2},
                   q_funcs_args={'single_line': ()}, delta_temp_change=0.1,
                   dtype=np.float32, cache_dtype=cache_dtype)


def _active_cells(gas, thresh=0.3):
    """Optically active cells: the decoupled thin top levels are
    path-dependent in the reference itself (CLAUDE.md) and land on different
    fixed points under any perturbation — mask them like the parity tests."""
    tau = np.asarray(gas.tau_interface).max(axis=1)     # [nz], TOA-first
    return tau[1:] > thresh                             # per cell


def test_bf16_cache_equilibrium_close_to_f32():
    import jax.numpy as jnp
    ref = _make()
    ref.evolve_to_equilibrium(flux_thresh=1e-2, save=False, t_end=20.0)
    fast = _make(cache_dtype=jnp.bfloat16)
    fast.evolve_to_equilibrium(flux_thresh=1e-2, save=False, t_end=20.0)
    # bf16 storage shifts the atmospheric-emission integrals by ~0.4%
    # relative; combined with the ft=1e-2 march slack the optically thick
    # (tau > 0.3) equilibrium moves by ~0.5 K typical, < 1 K
    act = _active_cells(ref)
    err = np.abs(np.asarray(ref.T) - np.asarray(fast.T))[act]
    assert float(err.max()) < 1.0
    assert np.isfinite(np.asarray(fast.T)).all()


def test_bf16_cache_ensemble_path():
    import jax.numpy as jnp
    from climatemodel_tpu.models import ensemble
    gas = _make()
    states, sc, T_gs, args = ensemble.real_gas_ensemble(
        gas, F_scales=[1.0, 1.1])
    out32, _ = ensemble.real_gas_evolve_ensemble(
        states, sc, T_gs, *args, jnp.asarray(1e-2, gas.dtype), t_end=20.0)
    out16, _ = ensemble.real_gas_evolve_ensemble(
        states, sc, T_gs, *args, jnp.asarray(1e-2, gas.dtype), t_end=20.0,
        cache_dtype=jnp.bfloat16)
    act = _active_cells(gas)
    err = np.abs(np.asarray(out32.T) - np.asarray(out16.T))[:, act]
    assert float(err.max()) < 1.0
