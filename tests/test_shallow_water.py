"""Shallow-water engine tests: step-for-step parity against the executed
reference, conservation properties, and wave-physics signatures
(SURVEY.md section 4 items 2-3)."""
import numpy as np
import pytest

import reference_harness as rh
from climatemodel_tpu.constants import g as g_earth
from climatemodel_tpu.models.shallow_water import (ShallowWater,
                                                   apply_boundary_conditions)

GRAV_WAVE = dict(
    nx=40, ny=40, dx=100e3, dy=100e3, dt=60.0, f_0=0.0, beta=0.0,
    initial_info={'type': 'height_gaussian', 'min_h_surface': 9750.0,
                  'max_h_surface': 10750.0, 'x0': 0.0, 'y0': 0.0,
                  'x_std': 800e3, 'y_std': 800e3, 'add_noise': False})


def _make_ref(**kw):
    ref_sw, _ = rh.import_reference_shallow()
    return ref_sw.ShallowWater(**kw)


@pytest.mark.parametrize('solver', ['richtmyer', 'lax_friedrichs',
                                    'maccormack', 'lax_wendroff'])
def test_step_parity_each_solver(solver):
    """One step of every scheme matches the reference bit-for-bit (float64)."""
    kw = dict(GRAV_WAVE, numerical_solver=solver)
    ref = _make_ref(**kw)
    mine = ShallowWater(**kw)
    np.testing.assert_allclose(mine.h, ref.h, atol=1e-12)
    t_r, _ = ref.time_step(0.0)
    t_m, _ = mine.time_step(0.0)
    assert t_r == pytest.approx(t_m)
    np.testing.assert_allclose(mine.h, ref.h, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(mine.u, ref.u, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(mine.v, ref.v, rtol=1e-10, atol=1e-12)


def test_trajectory_parity_50_steps():
    ref = _make_ref(**GRAV_WAVE)
    mine = ShallowWater(**GRAV_WAVE)
    t_r = t_m = 0.0
    for _ in range(50):
        t_r, _ = ref.time_step(t_r, save_every=1e9)
        t_m, _ = mine.time_step(t_m, save_every=1e9)
    assert t_r == pytest.approx(t_m, rel=1e-12)
    np.testing.assert_allclose(mine.h, ref.h, rtol=1e-10, atol=1e-9)
    np.testing.assert_allclose(mine.u, ref.u, atol=1e-9)


def test_el_nino_parity():
    """El Nino scenario: thermocline initialisation, wind-closure defaults and
    30 forced steps match the reference."""
    h_mean, g_use = 100.0, 0.05
    c = np.sqrt(g_use * h_mean)
    from climatemodel_tpu.constants import Omega, R_earth
    beta = 2 * Omega / R_earth
    L_def = np.sqrt(c / beta)
    dx = L_def / 5
    nx = int(round(10 * L_def / dx))
    ny = int(round(6 * L_def / dx))
    dt = 0.05 * dx / c
    r = 1 / (10 * 30 * 24 * 60 ** 2)
    bc = {'x': 'walls', 'y': 'walls',
          'y_walls_damp': {'dist_thresh': (ny / 2) * dx - 3 * dx, 'r': r * 100}}
    kw = dict(nx=nx, ny=ny, dx=dx, dy=dx, dt=dt, f_0=0.0, beta=beta,
              boundary_type=bc, r=r, g=g_use,
              initial_info={'type': 'el_nino', 'max_h_surface': 110.0,
                            'min_h_surface': 90.0, 'y_std': L_def,
                            'add_noise': False, 'wind': {'type': 'forced'}})
    ref = _make_ref(**{k: (dict(v) if isinstance(v, dict) else v)
                       for k, v in kw.items()})
    mine = ShallowWater(**kw)
    # wind closure defaults identical (shallow_water.py:234-269)
    for key in ('gamma', 'initial_tau_over_h', 'seasonal_fluct',
                'x_average_width', 'y_average_width'):
        assert ref.initial_info['wind'][key] == \
            pytest.approx(mine.initial_info['wind'][key], rel=1e-12), key
    t_r = t_m = 0.0
    for _ in range(30):
        t_r, _ = ref.time_step(t_r, save_every=1e9)
        t_m, _ = mine.time_step(t_m, save_every=1e9)
    np.testing.assert_allclose(mine.h, ref.h, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(mine.u, ref.u, atol=1e-10)


def test_boundary_conditions_match_reference():
    ref = _make_ref(**GRAV_WAVE)
    rng = np.random.default_rng(0)
    h = rng.normal(size=(12, 10))
    u = rng.normal(size=(12, 10))
    v = rng.normal(size=(12, 10))
    for bx, by in [('periodic', 'walls'), ('walls', 'walls'),
                   ('walls', 'periodic'), ('periodic', 'periodic')]:
        ref.boundary_type = {'x': bx, 'y': by}
        hr, ur, vr = ref.boundary_conditions(h.copy(), u.copy(), v.copy())
        hm, um, vm = (np.asarray(a) for a in apply_boundary_conditions(
            h.copy(), u.copy(), v.copy(), bx, by))
        np.testing.assert_array_equal(hm, hr)
        np.testing.assert_array_equal(um, ur)
        np.testing.assert_array_equal(vm, vr)


def test_linear_gravity_wave_speed():
    """Linear mode: a small bump spreads at c = sqrt(g h_mean)
    (SURVEY.md section 4, dispersion fixture)."""
    h0 = 1000.0
    kw = dict(GRAV_WAVE)
    kw['initial_info'] = dict(kw['initial_info'], min_h_surface=h0,
                              max_h_surface=h0 + 1.0, x_std=300e3,
                              y_std=300e3)
    world = ShallowWater(**kw, linear=True)
    c = np.sqrt(world.g * world.h_mean)
    # run until the ring peak should be ~9 cells out (bump sigma = 3 cells)
    target_t = 9 * world.dx / c
    nt = int(target_t / world.dt_0)
    world.run(nt=nt, save_every=None, snapshots=False)
    dh = world.h - world.h_mean
    centre = world.nx // 2
    ray = dh[centre:, world.ny // 2]            # outward along +x from centre
    peak_cells = np.argmax(ray[2:]) + 2         # skip the drained centre
    expected_cells = c * float(world.state.t) / world.dx
    assert abs(peak_cells - expected_cells) <= 2.0


def test_mass_conservation_periodic():
    """Fully periodic domain: the conservative form preserves total mass
    (walls only conserve approximately — ghost-cell reflection leaks O(dt)
    boundary flux, in the reference too)."""
    kw = dict(GRAV_WAVE, boundary_type={'x': 'periodic', 'y': 'periodic'})
    world = ShallowWater(**kw)
    m0 = world.h[1:-1, 1:-1].sum()
    world.run(nt=100, snapshots=False)
    m1 = world.h[1:-1, 1:-1].sum()
    assert abs(m1 - m0) / m0 < 1e-9


def test_geostrophic_balance_stays_steady():
    """A geostrophically balanced jet should stay near-steady."""
    kw = dict(nx=40, ny=40, dx=100e3, dy=100e3, dt=60.0, f_0=1e-4, beta=0.0,
              initial_info={'type': 'uniform_zonal', 'mean_h_surface': 1000.0,
                            'u_mean': 10.0, 'add_noise': False})
    world = ShallowWater(**kw)
    u0 = world.u.copy()
    world.run(nt=200, snapshots=False)
    interior = (slice(2, -2), slice(2, -2))
    assert np.abs(world.u[interior] - u0[interior]).max() < 1.0


def test_run_snapshots_match_loop():
    w1 = ShallowWater(**GRAV_WAVE)
    data = w1.run(nt=20, save_every=60.0)
    assert data['h'].shape[0] == 21    # initial + 20 snapshots (1 per step)
    w2 = ShallowWater(**GRAV_WAVE)
    t = 0.0
    for _ in range(20):
        t, _ = w2.time_step(t, save_every=1e9)
    np.testing.assert_allclose(data['h'][-1], w2.h, rtol=1e-12)
    np.testing.assert_allclose(data['t'][-1], t, rtol=1e-12)


def test_tiny_dt_aborts():
    kw = dict(GRAV_WAVE)
    kw['initial_info'] = dict(kw['initial_info'], max_h_surface=12000.0)
    world = ShallowWater(**kw)
    # inject an absurd velocity so CFL collapses below 10 s
    world._state = world._state.replace(
        u=world._state.u + 1e5, t=world._state.t + 1.0)
    with pytest.raises(ValueError, match='time step very small'):
        world.time_step(1.0)


def test_el_nino_five_day_run_matches_reference():
    """The exact shallow_script.py El Nino configuration (150x75, forced
    Bjerknes wind, sponge walls) marched 5 simulated days: the fused scan run
    must match the reference's per-step Python loop."""
    from climatemodel_tpu.constants import Omega, R_earth
    h_mean, g_use = 100.0, 0.05
    c = np.sqrt(g_use * h_mean)
    beta = 2 * Omega / R_earth
    L_def = np.sqrt(c / beta)
    dx = L_def / 5
    nx = int(round(30 * L_def / dx))
    ny = int(round(15 * L_def / dx))
    dt = 0.01 * dx / c
    r = 1 / (10 * 30 * 24 * 60 ** 2)
    bc = {'x': 'walls', 'y': 'walls',
          'y_walls_damp': {'dist_thresh': (ny / 2) * dx - 6 * dx,
                           'r': r * 100}}
    mk = dict(nx=nx, ny=ny, dx=dx, dy=dx, dt=dt, f_0=0.0, beta=beta,
              boundary_type=bc, r=r, g=g_use,
              initial_info={'type': 'el_nino', 'max_h_surface': 110.0,
                            'min_h_surface': 90.0, 'y_std': L_def,
                            'add_noise': False, 'wind': {'type': 'forced'}})
    ref = _make_ref(**{k: (dict(v, wind=dict(v['wind']))
                           if isinstance(v, dict) and 'wind' in v else
                           (dict(v) if isinstance(v, dict) else v))
                       for k, v in mk.items()})
    mine = ShallowWater(**mk)
    nt = int(np.fix(5 * 24 * 60 ** 2 / dt) + 1)
    t = 0.0
    for _ in range(nt):
        t, _ = ref.time_step(t, save_every=1e12)
    mine.run(nt=nt, snapshots=False)
    assert float(mine.state.t) == pytest.approx(t, rel=1e-9)
    np.testing.assert_allclose(mine.h, ref.h, rtol=2e-7, atol=2e-7)
    np.testing.assert_allclose(mine.u, ref.u, atol=1e-9)
    # physical signature: the east-west thermocline seesaw is evolving
    he, hw = mine.get_average_east_west_boundary_thickness(
        mine.h, mine.initial_info['wind']['x_average_width'],
        mine.initial_info['wind']['y_average_width'])
    assert hw > he            # west stays deeper early in the event


def test_equatorial_kelvin_wave_speed():
    """Kelvin wave config (shallow_script.py:83-91): an equatorial bump
    propagates east at c = sqrt(g h)."""
    kw = dict(nx=120, ny=60, dx=100e3, dy=100e3, dt=60.0, f_0=0.0, beta=5e-10,
              boundary_type={'x': 'walls', 'y': 'walls'},
              initial_info={'type': 'height_gaussian',
                            'min_h_surface': 9750.0,
                            'max_h_surface': 10750.0, 'x0': -2000e3, 'y0': 0.0,
                            'x_std': 800e3, 'y_std': 800e3,
                            'add_noise': False})
    world = ShallowWater(**kw)
    c = np.sqrt(world.g * world.h_mean)
    x0 = -2000e3
    target_t = 1500e3 / c                       # travel ~15 cells east
    nt = int(target_t / world.dt_0)
    world.run(nt=nt, snapshots=False)
    eq = world.ny // 2
    dh = world.h[:, eq] - np.median(world.h[:, eq])
    # the dominant equatorial crest has moved east at c
    x_peak = world.X[np.argmax(dh), 0]
    expected = x0 + c * float(world.state.t)
    assert abs(x_peak - expected) < 3 * world.dx
    assert x_peak > x0 + 10 * world.dx     # it really propagated eastward


def test_plot_animate_builds_frames():
    import matplotlib
    matplotlib.use('Agg')
    world = ShallowWater(**GRAV_WAVE)
    data = world.run(nt=10, save_every=60.0)
    anim = world.plot_animate(data['t'], data['h'], data['u'], data['v'],
                              nPlotFrames=4)
    world._animate_frame(0)
    world._animate_frame(2)


def test_run_executes_exactly_nt_steps():
    """run(nt, save_every) must execute exactly nt steps (the reference loops
    nt time_step calls): snapshot-chunk rounding once dropped or OVERRAN."""
    kw = dict(nx=18, ny=12, dx=100e3, dy=100e3, dt=60.0, f_0=1e-4,
              beta=1.6e-11,
              initial_info={'type': 'height_gaussian',
                            'min_h_surface': 9750.0, 'max_h_surface': 10750.0,
                            'x0': 0.0, 'y0': 0.0, 'x_std': 300e3,
                            'y_std': 300e3, 'add_noise': False})
    for nt, save_steps in [(10, 7), (5, 10), (12, 4)]:
        ref = ShallowWater(**kw)
        for _ in range(nt):
            t, _ = ref.time_step(float(ref.state.t), save_every=1e18)
        world = ShallowWater(**kw)
        data = world.run(nt=nt, save_every=save_steps * world.dt_0)
        assert float(world.state.t) == pytest.approx(float(ref.state.t)), \
            (nt, save_steps)
        np.testing.assert_allclose(world.h, ref.h, rtol=1e-12)
        # snapshots at every full chunk plus the initial state (init + final
        # when no full chunk fits)
        n_snaps = nt // save_steps
        assert len(data['t']) == (1 + n_snaps if n_snaps else 2)
