"""OLR-area / greenhouse-activity diagnostics (centa_presentation/base.py
parity), driven on the surviving CO2 lookup table."""
import contextlib
import io

import numpy as np
import pytest

import reference_harness as rh
from climatemodel_tpu.diagnostics import olr
from climatemodel_tpu.models.real_gas import RealGas
from climatemodel_tpu.spectral import humidity
from climatemodel_tpu.spectral.temperature_profiles import earth_temp

REF_LUT = '/root/reference/Model/radiation/real_gas_data/HitranData/LookupTables'

pytestmark = pytest.mark.skipif(not rh.reference_available(),
                                reason='reference tree not mounted')


def _build(co2_ppmv=300.0):
    return RealGas(nz=50, ny=1, molecule_names=['CO2_no_sw'],
                   q_funcs={'CO2_no_sw': humidity.constant_q},
                   q_funcs_args={'CO2_no_sw': (co2_ppmv, 'CO2')},
                   table_folder=REF_LUT, T_func=earth_temp,
                   delta_temp_change=0.1)


def _ref_build(co2_ppmv=300.0):
    rh.import_reference_base()
    import Model.radiation.real_gas as ref_rg
    import Model.radiation.real_gas_data.specific_humidity as ref_hum
    import Model.radiation.real_gas_data.temperature_profiles as ref_tp
    with contextlib.redirect_stdout(io.StringIO()):
        return ref_rg.RealGas(
            nz=50, ny=1, molecule_names=['CO2_no_sw'],
            q_funcs={'CO2_no_sw': ref_hum.constant_q},
            q_funcs_args={'CO2_no_sw': (co2_ppmv, 'CO2')},
            T_func=ref_tp.earth_temp, delta_temp_change=0.1)


def test_olr_area_values():
    atmos = _build()
    area = olr.get_olr_area(atmos)
    # OLR area is a positive flux of the right order (hundreds of W/m^2)
    assert 100 < area < 500
    surf_area = olr.get_surface_up_flux_olr_area(atmos)
    assert 0 < surf_area < area * 1.5


def test_add_ghg_reduces_olr():
    atmos = _build()
    tot, surf = olr.get_olr_area_add_ghg(atmos, 'CO2_no_sw',
                                         np.array([0.0, 200.0, 600.0]),
                                         earth_temp)
    # more GHG -> less outgoing long-wave, monotonic
    assert tot[1] < tot[0] and tot[2] < tot[1]
    assert surf[1] < surf[0]
    # requires a constant_q profile (base.py:110-111)
    atmos2 = RealGas(nz=50, ny=1, molecule_names=['CO2_no_sw'],
                     q_funcs={'CO2_no_sw': humidity.co2},
                     q_funcs_args={'CO2_no_sw': (370, 80000)},
                     table_folder=REF_LUT, T_func=earth_temp,
                     delta_temp_change=0.1)
    with pytest.raises(ValueError):
        olr.get_olr_area_add_ghg(atmos2, 'CO2_no_sw', np.array([0.0, 10.0]),
                                 earth_temp)


def test_eqv_ppmv():
    # adding 44 g/mol worth of CO2 = 16/44 as many ppmv of CH4 mass-for-mass
    assert olr.eqv_ppmv('CH4', 16.0) == pytest.approx(16.0 * 44.0 / 16.0)


def test_ghg_activity_matches_reference():
    rh.import_reference_base()
    import Model.radiation.real_gas as ref_rg
    ref = _ref_build()
    mine = _build()
    # reference activity computation (centa_presentation/base.py:157-186)
    absorb = np.ones_like(ref.nu)
    lw = ~ref.nu_bands['sw']
    ranges = [ref.nu_bands['range'][i] for i in np.where(lw)[0]]
    deltas = ref.nu_bands['delta'][lw]
    expect = np.zeros(lw.sum())
    for i, (rng, d) in enumerate(zip(ranges, deltas)):
        expect[i] = ref_rg.dtransmission_dq(
            ref.p_interface[0], ref.p_interface[-1], ref.p_interface,
            rng, d, ref.nu, ref.tau_interface, absorb)
    mass_conv = humidity.humidity_from_ppmv(1, 'CO2')
    nu_c, act = olr.get_ghg_activity(mine)
    np.testing.assert_allclose(act, -expect.flatten() * mass_conv, rtol=1e-10)
    np.testing.assert_allclose(nu_c, ref.nu_bands['centre'][lw])


def test_ghg_activity_loads_non_member_molecule():
    """get_ghg_activity can probe a molecule that is NOT in the atmosphere
    (the reference loads any molecule's table, base.py:175)."""
    atmos = _build()
    assert 'gray' not in atmos._tables
    nu_c, activity = olr.get_ghg_activity(atmos, 'gray')
    assert nu_c.size == activity.size > 0
    assert np.isfinite(activity).all()


def test_presentation_plot_surfaces_build():
    """Smoke the remaining presentation plot surfaces: plot_incoming_short_wave
    (real_gas.py:812-837), plot_T_q, and the arctic-amplification panel
    (base.py:124-154)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from climatemodel_tpu.spectral.temperature_profiles import earth_temp
    atmos = _build()
    ax = atmos.plot_incoming_short_wave()
    assert ax.figure is not None
    plt.close('all')
    axs = olr.plot_T_q(atmos)
    assert axs is not None
    plt.close('all')
    fig, ax = plt.subplots()
    olr.ghg_diff_initial_h2o_plot(ax, atmos, [1.0, 2.0], 'CO2_no_sw',
                                  np.array([0.0, 50.0]), earth_temp)
    assert len(ax.lines) >= 2
    plt.close('all')
