"""Opt-in performance modes of the real-gas march: the bf16 transmission
cache trades ~3 significant digits in the cached interior operators for half
the per-step HBM traffic (models/real_gas.py precompute_transmission).

The reduced-precision cache stores ROW-DIFFERENCED operators (D-layout, see
TransmissionCache): quantizing the adjacent-row differences instead of the
absolute operators bounds the heating-tendency noise by the local flux
divergence, not the absolute flux — directly-quantized bf16 operators put a
biased ~0.3 K/day spurious tendency on radiatively-decoupled micro-mass TOA
levels at nz=400 (measured) and marched them to the negative-T abort.

Measured endpoint shifts (pure-f32 CPU marches, optically active tau > 0.3):
single_line nz=40: 0.40 K max; single_line nz=400: 0.35 K max.  The 4-gas
fabricated-earth column is NOT a bf16-safe config: its near-decoupled
cold-trap levels around 1e4 Pa have enormous dT/dF and shift by tens of K
under ANY ~0.4% flux perturbation (31 K with the old M-layout, 25 K with the
D-layout) — documented in PERF.md, not asserted here."""
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
    # (tau > 0.3) equilibrium moves by 0.31-0.40 K max (measured: 0.315 K
    # CPU f32 now, 0.40 K recorded on v5e) — assert at 1.5x the larger
    # measurement (r02/r03 directive: bound derived from the measurement)
    act = _active_cells(ref)
    err = np.abs(np.asarray(ref.T) - np.asarray(fast.T))[act]
    assert float(err.max()) < 0.6
    assert np.isfinite(np.asarray(fast.T)).all()


def test_bf16_diff_layout_flux_reconstruction():
    """The D-layout reconstructs flux VALUES at f32-like conditioning and its
    adjacent-row flux differences (what the tendency consumes) carry far less
    noise than eps_bf16 * |flux|."""
    import jax.numpy as jnp
    from climatemodel_tpu.models.real_gas import (
        _net_and_diff, precompute_transmission, real_gas_fluxes_cached,
        real_gas_net_and_diff_cached)
    gas = _make()
    T = jnp.asarray(np.asarray(gas.T)[:, 0])
    T_g = jnp.asarray(gas.T_g, gas.dtype)
    delta = jnp.asarray(gas.nu_bands['delta'], gas.dtype)
    outs, marchs = {}, {}
    for name, cd in (('f32', None), ('bf16', jnp.bfloat16)):
        cache = precompute_transmission(gas.tau_device, gas.band_arrays, cd)
        if cd is not None:
            assert cache.M_sum is None and cache.D_sum is not None
        up, down = real_gas_fluxes_cached(
            T, T_g, cache, gas.band_arrays, gas._F_star_factor)
        outs[name] = _net_and_diff(up, down, delta)
        marchs[name] = real_gas_net_and_diff_cached(
            T, T_g, cache, gas.band_arrays, gas._F_star_factor, delta)
    net_scale = float(jnp.abs(outs['f32'][0]).max())
    for pair in (outs, marchs):
        # values: within ~bf16 epsilon of the flux scale on both paths
        assert float(jnp.abs(pair['bf16'][0]
                             - pair['f32'][0]).max()) < 8e-3 * net_scale
    # the MARCH path's tendency differences are an order of magnitude
    # tighter than eps_bf16 * |flux| (the quantized quantity IS the
    # difference); the diagnostics path quantizes the operators directly
    # and only carries the value-level bound above
    diff_err = float(jnp.abs(marchs['bf16'][1] - marchs['f32'][1]).max())
    assert diff_err < 8e-4 * net_scale
    # the march path's f32 layout (summed operator M_sum) agrees with the
    # per-direction diagnostics path to f32 rounding of the flux scale
    np.testing.assert_allclose(np.asarray(marchs['f32'][0]),
                               np.asarray(outs['f32'][0]),
                               atol=3e-5 * net_scale)


def test_bf16_cache_hires_march_stable():
    """nz=400 pure-f32 march with the bf16 cache converges (the M-layout
    crashed it with a negative-T abort) and lands within 1 K of f32."""
    import jax.numpy as jnp
    ref = _make_hires()
    ref.evolve_to_equilibrium(flux_thresh=1e-2, save=False, t_end=20.0)
    fast = _make_hires(cache_dtype=jnp.bfloat16)
    fast.evolve_to_equilibrium(flux_thresh=1e-2, save=False, t_end=20.0)
    act = _active_cells(ref)
    err = np.abs(np.asarray(ref.T) - np.asarray(fast.T))[act]
    # measured 0.303 K (CPU f32 now) / 0.35 K (v5e record); 1.5x margin
    assert float(err.max()) < 0.6


def _make_hires(cache_dtype=None):
    return RealGas(nz=400, ny=1, molecule_names=['single_line'], T_g=260.0,
                   q_funcs={'single_line': humidity.co2},
                   q_funcs_args={'single_line': ()}, delta_temp_change=0.1,
                   dtype=np.float32, cache_dtype=cache_dtype)


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
    assert float(err.max()) < 0.6          # same bound as the solo column


def test_check_every_real_gas_march():
    """The chunked-exit march (check_every=4) converges to the f32-march
    equilibrium on the single-line column: same physics, coarser exit
    sampling (may overshoot the exit by up to 3 steps)."""
    ref, fast = _make(), _make()
    # two calls tighten past the delta-percentile exit's ~1 K slack, which
    # the two check cadences otherwise sample differently
    for i in range(2):
        ref.evolve_to_equilibrium(flux_thresh=1e-2, save=False, t_end=20.0)
        fast.evolve_to_equilibrium(flux_thresh=1e-2, save=False, t_end=20.0,
                                   check_every=4)
        info = fast._equilibrium_info
        if i == 0:
            assert bool(np.asarray(info.equilibrium))
        else:
            # a re-march from equilibrium may legitimately exit on t_end:
            # near-equilibrium dt is huge, so simulated time races past
            # t_end between the sparse checks before delta falls below the
            # re-tightened threshold (measured endpoint error 0.006 K)
            assert bool(np.asarray(info.equilibrium)) \
                or bool(np.asarray(info.timed_out))
    err = np.abs(np.asarray(ref.T) - np.asarray(fast.T))[_active_cells(ref)]
    assert float(err.max()) < 0.2
