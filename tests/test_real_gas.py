"""Real-gas band radiation: parity against the executed reference using the
surviving lookup tables (single_line toy gas, CO2_no_sw), plus physics checks."""
import contextlib
import io

import numpy as np
import pytest

import reference_harness as rh
from climatemodel_tpu.models.real_gas import RealGas
from climatemodel_tpu.spectral import humidity

REF_LUT = '/root/reference/Model/radiation/real_gas_data/HitranData/LookupTables'

pytestmark = pytest.mark.skipif(not rh.reference_available(),
                                reason='reference tree not mounted')


def _import_ref():
    rh.import_reference_base()
    import Model.radiation.real_gas as ref_rg
    import Model.radiation.real_gas_data.specific_humidity as ref_hum
    return ref_rg, ref_hum


def _single_line_pair(nz=50, T_g=260.0, **kw):
    ref_rg, ref_hum = _import_ref()
    kw_ref = dict(nz=nz, ny=1, molecule_names=['single_line'], T_g=T_g,
                  q_funcs={'single_line': ref_hum.co2},
                  q_funcs_args={'single_line': ()}, delta_temp_change=0.1, **kw)
    with contextlib.redirect_stdout(io.StringIO()):
        ref = ref_rg.RealGas(**kw_ref)
    mine = RealGas(**dict(kw_ref, q_funcs={'single_line': humidity.co2},
                          table_folder=REF_LUT))
    return ref, mine


def test_bands_grid_tau_identical():
    ref, mine = _single_line_pair()
    assert ref.nz == mine.nz
    np.testing.assert_array_equal(ref.nu, mine.nu)
    np.testing.assert_array_equal(ref.nu_bands['sw'], mine.nu_bands['sw'])
    np.testing.assert_allclose(ref.nu_bands['centre'], mine.nu_bands['centre'])
    np.testing.assert_allclose(ref.nu_bands['delta'], mine.nu_bands['delta'])
    for r_rng, m_rng in zip(ref.nu_bands['range'], mine.nu_bands['range']):
        np.testing.assert_array_equal(r_rng, m_rng)
    np.testing.assert_array_equal(ref.p_interface, mine.p_interface)
    np.testing.assert_allclose(ref.tau_interface, mine.tau_interface,
                               atol=1e-14)


def test_fluxes_machine_precision():
    """The packed-band einsum formulation reproduces the reference's per-band
    loops to float64 epsilon."""
    ref, mine = _single_line_pair()
    np.testing.assert_allclose(mine.up_flux, ref.up_flux, atol=1e-13)
    np.testing.assert_allclose(mine.down_flux, ref.down_flux, atol=1e-13)
    np.testing.assert_allclose(mine.net_flux, ref.net_flux, atol=1e-11)


def test_trajectory_and_equilibrium_parity():
    ref, mine = _single_line_pair()
    t_r = t_m = 0.0
    for _ in range(40):
        t_r, _ = ref.take_time_step(t_r)
        t_m, _ = mine.take_time_step(t_m)
    assert np.abs(ref.T - mine.T).max() < 1e-7
    with contextlib.redirect_stdout(io.StringIO()):
        ref.evolve_to_equilibrium(flux_thresh=1e-3, save=False, t_end=2.0)
    mine.evolve_to_equilibrium(flux_thresh=1e-3, save=False, t_end=2.0)
    assert np.abs(ref.T - mine.T).max() < 1e-6


def test_auto_grid_parity():
    ref, mine = _single_line_pair(nz='auto')
    assert ref.nz == mine.nz
    np.testing.assert_allclose(ref.p_interface, mine.p_interface, rtol=1e-12)


def test_newton_Tg_guess_parity():
    """T_g=None triggers the Newton TOA-balance solve (real_gas.py:505-528)."""
    ref, mine = _single_line_pair(T_g=None)
    assert ref.T_g == pytest.approx(mine.T_g, abs=0.01)


def test_co2_table_column():
    """Earth-ish CO2 column using the surviving CO2_no_sw lookup table."""
    ref_rg, ref_hum = _import_ref()
    # nz=50, not 40: the reference's fixed-nz grid check (real_gas.py:499-500)
    # fails on float rounding for nz=40, in the reference itself too.
    kw = dict(nz=50, ny=1, molecule_names=['CO2_no_sw'], T_g=288.0,
              q_funcs_args={'CO2_no_sw': (370, 80000)}, delta_temp_change=0.1)
    with contextlib.redirect_stdout(io.StringIO()):
        ref = ref_rg.RealGas(q_funcs={'CO2_no_sw': ref_hum.co2}, **kw)
    mine = RealGas(q_funcs={'CO2_no_sw': humidity.co2}, table_folder=REF_LUT,
                   **kw)
    np.testing.assert_allclose(mine.up_flux, ref.up_flux, atol=1e-12)
    np.testing.assert_allclose(mine.down_flux, ref.down_flux, atol=1e-12)


def test_greenhouse_bite_with_earth_profile():
    """With a realistic decreasing T(p), CO2 bites into the OLR spectrum:
    OLR < surface blackbody emission over the long-wave bands."""
    from climatemodel_tpu.ops.planck import B_wavenumber
    from climatemodel_tpu.spectral.temperature_profiles import earth_temp
    mine = RealGas(nz=50, ny=1, molecule_names=['CO2_no_sw'],
                   q_funcs={'CO2_no_sw': humidity.co2},
                   q_funcs_args={'CO2_no_sw': (370, 80000)},
                   table_folder=REF_LUT, T_func=earth_temp,
                   delta_temp_change=0.1)
    lw = ~mine.nu_bands['sw']
    olr = (mine.up_flux[0, lw] * mine.nu_bands['delta'][lw]).sum()
    surf = (np.pi * np.asarray(B_wavenumber(mine.nu_bands['centre'][lw],
                                            mine.T_g))
            * mine.nu_bands['delta'][lw]).sum()
    assert olr < surf - 1.0


def test_olr_breakdown_and_greenhouse_response():
    """Surface/atmosphere OLR split (real_gas.py:629-669) and CO2-doubling
    reduces OLR (the headline greenhouse signature; needs a decreasing T(p),
    an isothermal column has no greenhouse effect)."""
    from climatemodel_tpu.spectral.temperature_profiles import earth_temp

    def build(co2_ppmv):
        return RealGas(nz=50, ny=1, molecule_names=['CO2_no_sw'],
                       q_funcs={'CO2_no_sw': humidity.co2},
                       q_funcs_args={'CO2_no_sw': (co2_ppmv, 80000)},
                       table_folder=REF_LUT, T_func=earth_temp,
                       delta_temp_change=0.1)

    mine = build(370)
    up, down, olr_cont = mine.get_flux(include_olr_breakdown=True)
    np.testing.assert_allclose(olr_cont['surface'] + olr_cont['atmos'], up[0],
                               atol=1e-10)
    olr_1x = (up[0] * mine.nu_bands['delta'])[~mine.nu_bands['sw']].sum()
    mine2 = build(2 * 370)
    olr_2x = (mine2.up_flux[0] * mine2.nu_bands['delta'])[
        ~mine2.nu_bands['sw']].sum()
    assert olr_2x < olr_1x


def test_evolve_change_compos():
    mine = RealGas(nz=30, ny=1, molecule_names=['single_line'], T_g=260.0,
                   q_funcs={'single_line': humidity.co2},
                   q_funcs_args={'single_line': ()}, table_folder=REF_LUT,
                   delta_temp_change=0.1)
    data = mine.evolve_change_compos(
        [255.0, 265.0], [{'single_line': ()}, {'single_line': ()}],
        flux_thresh=1e-2, t_end=0.5)
    assert mine.T_g == 265.0
    assert len(data['t']) >= 3


def test_save_path_honors_chunk_steps():
    """The save=True snapshot march with an explicit chunk_steps (bounding
    single XLA executions, like grey.py:487) must reach the same endpoint
    and record the same per-step trajectory as the default 256-chunk (r04
    review: chunk_steps was silently ignored on this path)."""
    kw = dict(nz=24, ny=1, molecule_names=['single_line'], T_g=260.0,
              q_funcs={'single_line': humidity.co2},
              q_funcs_args={'single_line': ()}, delta_temp_change=0.1,
              n_nu_bands=30)
    runs = {}
    for chunk in (None, 7):
        gas = RealGas(**kw)
        data = gas.evolve_to_equilibrium(flux_thresh=2.0, save=True,
                                         chunk_steps=chunk)
        runs[chunk] = (np.asarray(gas.T), np.asarray(data['t']),
                       np.stack([np.asarray(Ti) for Ti in data['T']]))
    T_a, t_a, traj_a = runs[None]
    T_b, t_b, traj_b = runs[7]
    assert len(t_a) == len(t_b) and len(t_a) > 3
    # bit-identical on CPU f64 (the two chunkings run the same compiled
    # snapshot program; like the grey chunked-exit bit-identity pin)
    np.testing.assert_array_equal(T_a, T_b)
    np.testing.assert_array_equal(traj_a, traj_b)
