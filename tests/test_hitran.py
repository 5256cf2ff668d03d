"""HITRAN spectroscopy pipeline: the vectorised line accumulation, toy-gas
table generators and the UV cross-section loader, validated against the
executed reference and its surviving lookup tables."""
import contextlib
import io
import os

import numpy as np
import pytest

import reference_harness as rh
from climatemodel_tpu.spectral import hitran

REF_DATA = '/root/reference/Model/radiation/real_gas_data/HitranData'
REF_LUT = os.path.join(REF_DATA, 'LookupTables')

pytestmark = pytest.mark.skipif(not rh.reference_available(),
                                reason='reference tree not mounted')


def _ref_hitran():
    rh.import_reference_base()
    import Model.radiation.real_gas_data.hitran as ref_h
    return ref_h


def test_single_line_table_matches_stored_reference(tmp_path):
    """Our generator must reproduce the reference's shipped single_line.npy
    exactly (real_gas_script.py:16-25 recipe)."""
    tab = hitran.make_single_line_table(output_folder=str(tmp_path))
    ref_tab = np.load(os.path.join(REF_LUT, 'single_line.npy'),
                      allow_pickle=True).item()
    np.testing.assert_array_equal(tab['nu'], ref_tab['nu'])
    np.testing.assert_array_equal(tab['p'], ref_tab['p'])
    np.testing.assert_array_equal(tab['T'], ref_tab['T'])
    np.testing.assert_allclose(tab['absorption_coef'],
                               ref_tab['absorption_coef'], rtol=1e-12)


def test_gray_table_matches_stored_reference(tmp_path):
    tab = hitran.make_gray_table(output_folder=str(tmp_path))
    ref_tab = np.load(os.path.join(REF_LUT, 'gray.npy'),
                      allow_pickle=True).item()
    np.testing.assert_array_equal(tab['nu'], ref_tab['nu'])
    np.testing.assert_allclose(tab['absorption_coef'],
                               ref_tab['absorption_coef'])


def test_vectorised_accumulation_matches_reference_loop():
    """Random synthetic line list: the chunked scatter-add equals the
    reference's per-line Python loop (hitran.py:223-247)."""
    ref_h = _ref_hitran()
    rng = np.random.default_rng(5)
    L = 60
    lines = {'nu': np.sort(rng.uniform(200, 1200, L)),
             'sw': 10.0 ** rng.uniform(-2, 2, L),
             'gamma_air': rng.uniform(0.02, 0.12, L),
             'n_air': rng.uniform(0.4, 0.9, L),
             'elower': np.zeros(L)}
    p = np.logspace(np.log10(101320), np.log10(1000), 30)
    T = np.full(30, 280.0)
    nu = np.arange(150.0, 1300.0, 10.0)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_grid = ref_h.get_absorption_coefficient(p, T, nu, 'syn',
                                                    dict(lines),
                                                    n_line_widths=1000)
    my_grid = hitran.get_absorption_coefficient(p, T, nu, lines,
                                                n_line_widths=1000, chunk=17)
    np.testing.assert_allclose(my_grid, ref_grid, rtol=1e-10, atol=1e-14)


def test_gamma_s_extrapolation_match_reference():
    ref_h = _ref_hitran()
    p = np.logspace(5, 2, 20)
    T = np.linspace(250, 320, 20)
    np.testing.assert_allclose(
        np.asarray(hitran.gamma_extrapolate(p, T, 0.08, 0.7)),
        ref_h.gamma_extrapolate(p, T, 0.08, 0.7))
    np.testing.assert_allclose(
        np.asarray(hitran.s_extrapolate(T, 3.5, 667.0, 0.7)),
        ref_h.s_extrapolate(T, 3.5, 667.0, 0.7), rtol=1e-12)


def test_wavenumber_array_from_synthetic_lines():
    ref_h = _ref_hitran()
    rng = np.random.default_rng(8)
    L = 500
    lines = {'nu': np.sort(rng.normal(900, 120, L)),
             'sw': 10.0 ** rng.uniform(-6, 3, L),
             'gamma_air': rng.uniform(0.02, 0.12, L)}
    mine = hitran.get_wavenumber_array(dict(lines))
    theirs = ref_h.get_wavenumber_array(dict(lines))
    np.testing.assert_array_equal(mine, theirs)


def test_xsc_loader_matches_reference():
    """O3 UV cross-sections: raw read and full grid-extension path
    (hitran.py:250-312), driven on the reference's .xsc data files."""
    ref_h = _ref_hitran()
    nu_ir = np.arange(0.0, 1505.0, 10.0)
    p = np.logspace(5, 2, 10)
    T = np.array([250.0, 290.0])
    nu_r, k_r = ref_h.load_from_cross_section_xsc(nu_ir, p, T, molecule='O3',
                                                  return_raw=True)
    nu_m, k_m = hitran.load_from_cross_section_xsc(nu_ir, p, T, molecule='O3',
                                                   data_folder=REF_DATA,
                                                   return_raw=True)
    np.testing.assert_allclose(nu_m, nu_r)
    np.testing.assert_allclose(k_m, k_r)
    full_nu_r, grid_r = ref_h.load_from_cross_section_xsc(nu_ir, p, T, 'O3')
    full_nu_m, grid_m = hitran.load_from_cross_section_xsc(
        nu_ir, p, T, 'O3', data_folder=REF_DATA)
    np.testing.assert_allclose(full_nu_m, full_nu_r)
    np.testing.assert_allclose(grid_m, grid_r)


def test_shipped_tables_exist_or_generate(tmp_path):
    """The framework can always fabricate its toy-gas tables from scratch."""
    hitran.make_single_line_table(output_folder=str(tmp_path))
    hitran.make_gray_table(output_folder=str(tmp_path))
    t1 = hitran.load_table('single_line', str(tmp_path))
    t2 = hitran.load_table('gray', str(tmp_path))
    assert t1['absorption_coef'].shape == (1, 1, 41)
    assert t2['absorption_coef'].shape == (1, 1, 501)


def test_native_backend_matches_jax_and_reference(tmp_path):
    """C++ accumulator and parser: identical results to the jax backend and
    np.genfromtxt (skipped when no compiler toolchain is present)."""
    from climatemodel_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')
    rng = np.random.default_rng(9)
    L = 80
    lines = {'nu': np.sort(rng.uniform(300, 900, L)),
             'sw': 10.0 ** rng.uniform(-2, 2, L),
             'gamma_air': rng.uniform(0.02, 0.12, L),
             'n_air': rng.uniform(0.4, 0.9, L)}
    p = np.logspace(np.log10(101320), np.log10(1000), 40)
    T = np.full(40, 290.0)
    nu = np.arange(250.0, 1000.0, 10.0)
    g_nat = hitran.get_absorption_coefficient(p, T, nu, lines,
                                              backend='native')
    g_jax = hitran.get_absorption_coefficient(p, T, nu, lines, backend='jax')
    np.testing.assert_allclose(g_nat, g_jax, rtol=1e-12)
    # parser vs genfromtxt on a synthetic HITRAN-style line file
    path = tmp_path / 'CO2.txt'
    with open(path, 'w') as f:
        f.write('molec_id local_iso_id nu sw elower gamma_air n_air\n')
        for i in range(500):
            iso = 1 if i % 3 else 2
            f.write(f'2 {iso} {600 + i * 0.1:.4f} {1e-20 * (i + 1):.6e} '
                    f'10.0 0.07 0.65\n')
    body = native.parse_numeric_table(str(path))
    ref = np.genfromtxt(path, names=True)
    assert body.shape == (500, 7)
    for k, name in enumerate(ref.dtype.names):
        np.testing.assert_allclose(body[:, k], ref[name])
    # full load_molecule_data path (native parser + isotopologue filter)
    data = hitran.load_molecule_data('CO2', data_folder=str(tmp_path))
    assert (np.asarray(data['nu']).size
            == (np.arange(500) % 3 != 0).sum())


def test_numpy_backend_matches_jax():
    """The host-f64 accumulation (the non-x64 'auto' fallback) matches the
    jax backend (f64 under the test config) to float64 precision."""
    rng = np.random.default_rng(6)
    L = 40
    lines = {'nu': np.sort(rng.uniform(350, 700, L)),
             'sw': rng.uniform(1.0, 100.0, L),
             'gamma_air': rng.uniform(0.05, 0.2, L),
             'n_air': rng.uniform(0.5, 0.8, L)}
    p = np.logspace(5, 3, 5)
    T = np.array([250.0, 290.0, 330.0])
    nu = np.arange(300.0, 755.0, 10.0)
    a = hitran.get_absorption_coefficient(p, T[0:1], nu, lines, backend='jax')
    b = hitran.get_absorption_coefficient(p, T[0:1], nu, lines,
                                          backend='numpy')
    np.testing.assert_allclose(b, a, rtol=1e-12)


def test_single_line_overwrite_guard(tmp_path):
    """overwrite=False must protect the FINAL single_line.npy (a stale
    'custom' temp must neither block nor be required)."""
    hitran.make_single_line_table(output_folder=str(tmp_path))
    target = hitran.table_path('single_line', str(tmp_path))
    with open(target, 'wb') as f:
        f.write(b'USER DATA')
    with pytest.raises(ValueError, match='already exists'):
        hitran.make_single_line_table(output_folder=str(tmp_path),
                                      overwrite=False)
    with open(target, 'rb') as f:
        assert f.read() == b'USER DATA'
    hitran.make_single_line_table(output_folder=str(tmp_path), overwrite=True)
    assert np.load(target, allow_pickle=True).item()['nu'].size > 0


def test_native_parser_skips_ragged_rows(tmp_path):
    """A line with extra (or missing) tokens must be SKIPPED consistently by
    both the dimension scan and the parser — a partial parse once shifted
    every subsequent row silently."""
    from climatemodel_tpu import native
    if not native.available():
        pytest.skip('native library not built')
    path = tmp_path / 'tab.txt'
    with open(path, 'w') as f:
        f.write('a b c\n')
        f.write('1 2 3\n')
        f.write('4 5 6 99\n')       # extra token: ragged, must be skipped
        f.write('7 8\n')            # missing token: ragged, must be skipped
        f.write('10 11 12\n')
    body = native.parse_numeric_table(str(path))
    np.testing.assert_array_equal(body, [[1, 2, 3], [10, 11, 12]])


def _par_record(mid, iso, nu, sw, a, ga, gs, el, na, da):
    s = (f'{mid:2d}{iso:1d}{nu:12.6f}{sw:10.3E}{a:10.3E}{ga:5.3f}{gs:5.3f}'
         f'{el:10.4f}{na:4.2f}{da:8.5f}')
    assert len(s) == 67
    return s + ' ' * 93          # quanta/error/reference trailer ignored


_DROPIN_LINES = [                # (iso, nu, sw, gamma_air, elower, n_air)
    (1, 1306.0, 1.2e-19, 0.060, 100.0, 0.75),
    (1, 1350.5, 3.0e-20, 0.050, 200.0, 0.70),
    (2, 1310.0, 5.0e-20, 0.055, 50.0, 0.70),    # non-main iso: filtered out
]


def test_real_line_file_dropin_end_to_end(tmp_path, monkeypatch):
    """The real-HITRAN drop-in procedure (docs/hitran_dropin.md, VERDICT r03
    missing #1): a user places a line file — native 160-char .par OR the
    reference's named-column .txt — runs make_table, points
    CLIMATEMODEL_TPU_LUT_DIR at the output, and a RealGas column marches on
    it through the fully public path.  Both formats must parse identically
    (same table bytes) and the non-main isotopologue must be filtered like
    the reference (hitran.py:51-53)."""
    import jax.numpy as jnp

    line_dir = tmp_path / 'lines'
    lut_dir = tmp_path / 'tables'
    line_dir.mkdir()
    # 160-char fixed-width .par (the hitranonline bulk-download format)
    par = '\n'.join(_par_record(6, iso, nu, sw, 1.0, ga, ga + 0.02, el, na,
                                0.0)
                    for iso, nu, sw, ga, el, na in _DROPIN_LINES)
    (line_dir / 'CH4.par').write_text(par + '\n')
    # the reference's named-column .txt with the same physics
    hdr = 'molec_id local_iso_id nu sw elower gamma_air n_air'
    rows = [f'6 {iso} {nu} {sw} {el} {ga} {na}'
            for iso, nu, sw, ga, el, na in _DROPIN_LINES]
    txt_dir = tmp_path / 'lines_txt'
    txt_dir.mkdir()
    (txt_dir / 'CH4.txt').write_text(hdr + '\n' + '\n'.join(rows) + '\n')

    data_par = hitran.load_molecule_data('CH4', str(line_dir))
    data_txt = hitran.load_molecule_data('CH4', str(txt_dir))
    assert data_par['nu'].shape == (2,)          # iso-2 line filtered
    for k in data_par:
        np.testing.assert_allclose(data_par[k], data_txt[k], rtol=1e-12)

    # small table grid so the test is fast; the PUBLIC make_table path
    tab = hitran.make_table('CH4',
                            p_array=np.logspace(np.log10(101320.0),
                                                np.log10(20.0), 40),
                            T_array=np.arange(250.0, 351.0, 50.0),
                            data_folder=str(line_dir),
                            output_folder=str(lut_dir), overwrite=True)
    assert tab['absorption_coef'].shape == (40, 3, tab['nu'].size)
    assert float(tab['absorption_coef'].max()) > 0

    # the framework resolves the drop-in through the env var everywhere
    monkeypatch.setenv('CLIMATEMODEL_TPU_LUT_DIR', str(lut_dir))
    from climatemodel_tpu.models.real_gas import RealGas
    from climatemodel_tpu.spectral import humidity
    gas = RealGas(nz=25, ny=1, molecule_names=['CH4'], T_g=270.0,
                  q_funcs={'CH4': humidity.ch4}, q_funcs_args={'CH4': ()},
                  n_nu_bands=20, delta_temp_change=0.1)
    gas.evolve_to_equilibrium(flux_thresh=1e-1, save=False, t_end=20.0)
    info = gas._equilibrium_info
    assert bool(np.asarray(info.equilibrium)) or bool(
        np.asarray(info.timed_out))
    T = np.asarray(gas.T)
    assert np.isfinite(T).all() and (T > 0).all()
