"""Grey-gas radiative equilibrium: evolve to equilibrium and compare against the
analytic oracles (the reference's de-facto validation, SURVEY.md section 4).

The analytic comparison is restricted to the optically active region
(tau > 0.03): optically thin top levels are radiatively decoupled (their
tendency ~ dtau ~ 0) and neither the reference nor any faithful
re-implementation moves them from the isothermal start — verified by running
the actual reference under tests/reference_harness.py.  Equilibrium is marched
twice (the second call after the reference's RemoveInd reset, base.py:329-334)
which is how reference experiments reach tight flux balance."""
import jax.numpy as jnp
import numpy as np
import pytest

from climatemodel_tpu.constants import F_sun, p_surface_earth, sigma
from climatemodel_tpu.models.grey import GreyGas, GreySwEquilibrium
from climatemodel_tpu.ops import optical_depth as od


def _evolve_tight(world, convective_adjust=False, n_calls=2, flux_thresh=1e-4):
    for _ in range(n_calls):
        world.evolve_to_equilibrium(flux_thresh=flux_thresh, save=False,
                                    convective_adjust=convective_adjust,
                                    t_end=30.0)


def test_no_sw_equilibrium_matches_analytic():
    """tau_sw = 0 world: T_eqb = ((F/2 sigma)(1 + tau))^(1/4) (grey.py:443-446),
    matched to <0.1 K in the optically active region (BASELINE.md target)."""
    world = GreyGas(nz=100, ny=1, tau_lw_func='scale_height',
                    tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    up_eqb, down_eqb, T_eqb, *_, correct = world.equilibrium_sol()
    assert correct
    _evolve_tight(world)
    active = world.tau[:, 0] > 0.03
    err = np.abs(world.T - T_eqb)[active]
    assert err.max() < 0.1, f'max T error {err.max():.4f} K'
    # interface fluxes close to the closed form in the active region
    act_i = world.tau_interface[:, 0] > 0.03
    assert np.abs(world.up_lw_flux - up_eqb)[act_i].max() < 0.3
    assert np.abs(world.down_lw_flux - down_eqb)[act_i].max() < 0.3


def test_sw_equilibrium_matches_analytic():
    """Exponential lw+sw with integer alpha ratio: closed-form oracle
    (grey.py:507-647 / radiation_script.py:15-22)."""
    p_width_lw = 100000.0
    alpha_sw = od.get_exponential_alpha(p_width_lw) / 5
    p_width_sw = od.get_exponential_p_width(alpha_sw)
    world = GreyGas(nz=150, ny=1, tau_lw_func='exponential',
                    tau_lw_func_args=[p_width_lw, 4.0],
                    tau_sw_func='exponential',
                    tau_sw_func_args=[p_width_sw, 0.6])
    *_, T_eqb, _, _, correct = world.equilibrium_sol()
    assert correct
    _evolve_tight(world)
    # exclude the bottom-most cell: sigma T^4 is curved in tau for the sw case,
    # so the piecewise-constant-per-cell discretisation (shared with the
    # reference recursion) biases the thickest cell by O(dtau^2) ~ 0.7 K.
    active = world.tau[:, 0] > 0.03
    active[0] = False
    err = np.abs(world.T - T_eqb)[active]
    assert err.max() < 0.1, f'max T error {err.max():.4f} K'


def test_sw_analytic_boundary_conditions():
    """The closed-form sw equilibrium satisfies its defining BCs."""
    lw = od.exponential(p_width=100000.0, tau_surface=4.0)
    alpha_sw = od.get_exponential_alpha(100000.0) / 3
    sw = od.exponential(p_width=od.get_exponential_p_width(alpha_sw),
                        tau_surface=0.5)
    A = 0.3 * np.exp(-2 * 0.5)
    calc = GreySwEquilibrium(F_sun, A, lw, sw)
    # down_lw(TOA) = 0
    assert abs(calc.down_lw_flux(0.0)) < 1e-9
    # net flux = 0 everywhere (radiative equilibrium)
    t2 = np.linspace(0, 0.5, 40)
    net = (calc.up_lw_flux(t2) - calc.down_lw_flux(t2)
           + calc.up_sw_flux(t2) - calc.down_sw_flux(t2))
    np.testing.assert_allclose(net, 0, atol=1e-9)
    # TOA balance: up_lw(0) = (1 - A) F / 4
    assert abs(calc.up_lw_flux(0.0) - (1 - A) * F_sun / 4) < 1e-9


def test_latitude_grid_equilibrium():
    """ny=16 latitude grid: every column reaches its local analytic RE."""
    world = GreyGas(nz=60, ny=16, tau_lw_func='scale_height',
                    tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    _, _, T_eqb, *_ = world.equilibrium_sol()
    _evolve_tight(world)
    # a single dt is shared across all latitudes (reference semantics,
    # base.py:197-246), so near-transparent levels converge unevenly; compare
    # where the gas is meaningfully absorbing.
    active = world.tau[:, 0] > 0.1
    err = np.abs(world.T - T_eqb)[active]
    assert err.max() < 0.2, f'max T error {err.max():.4f} K'


def test_save_mode_matches_fast_mode():
    args = dict(nz=30, ny=1, tau_lw_func='scale_height',
                tau_lw_func_args=[0.22 * p_surface_earth, 2.0])
    w1 = GreyGas(**args)
    w1.evolve_to_equilibrium(flux_thresh=1e-3, save=False)
    w2 = GreyGas(**args)
    data = w2.evolve_to_equilibrium(flux_thresh=1e-3, save=True)
    assert len(data['t']) > 2
    # while_loop fusion reorders float ops vs per-step dispatch, so argmax ties
    # can flip late in the march; both land on the same physical equilibrium.
    np.testing.assert_allclose(w1.T, w2.T, atol=0.05)


def test_rce_with_convective_adjustment():
    """Radiative-convective equilibrium on the thermosphere world — the
    configuration the reference's Convective Adjustment notebook runs
    (radiation_script.py:33-36).  The march converges, the active-region
    profile is convectively stable, and temperatures stay physical."""
    from climatemodel_tpu.constants import R_specific, c_p_dry
    world = GreyGas(nz='auto', ny=1,
                    tau_lw_func='scale_height_and_peak_in_atmosphere',
                    tau_lw_func_args=[51000, 4, 100, 600, 0.1],
                    tau_sw_func='scale_height_and_peak_in_atmosphere',
                    tau_sw_func_args=[p_surface_earth, 0.12, 100, 20, 0.002])
    world.evolve_to_equilibrium(flux_thresh=1e-1, save=False,
                                convective_adjust=True)
    alpha = R_specific / c_p_dry
    active = world.tau[:, 0] > 0.05
    theta = world.T[:, 0] / (world.p[:, 0] / p_surface_earth) ** alpha
    assert np.all(np.diff(theta)[active[:-1]] > -1e-7)
    assert 150 < world.T.min() and world.T.max() < 400


def test_isothermal_initial_state_energy_balance():
    world = GreyGas(nz=30, ny=1, tau_lw_func='scale_height',
                    tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    T0_expect = (F_sun * (1 - 0.3) / 4 / sigma) ** 0.25
    np.testing.assert_allclose(world.T0, T0_expect, rtol=1e-10)
    assert world.T.shape == (world.nz - 1, 1)


def test_fused_save_flux_lag_parity():
    """The fused snapshot march's data_dict reproduces the reference save_data
    layout: flux entries stored with step k are the fluxes computed from step
    k's STARTING temperature (grey.py:296-383 lag), and tau entries repeat the
    static grids."""
    from climatemodel_tpu.models.grey import grey_fluxes
    w = GreyGas(nz=25, ny=1, tau_lw_func='scale_height',
                tau_lw_func_args=[0.22 * p_surface_earth, 2.0])
    data = {'t': [0.0], 'T': [w.T.copy()],
            'tau': {'lw': [w.tau.copy()], 'sw': [w.tau_sw.copy()]},
            'flux': {'lw_up': [w.up_lw_flux], 'lw_down': [w.down_lw_flux],
                     'sw_up': [w.up_sw_flux], 'sw_down': [w.down_sw_flux]}}
    data = w.evolve_to_equilibrium(data_dict=data, flux_thresh=5e-2, save=True)
    n = len(data['t'])
    assert n > 3
    for key in ('T',):
        assert len(data[key]) == n
    for key in ('lw_up', 'lw_down', 'sw_up', 'sw_down'):
        assert len(data['flux'][key]) == n
    assert len(data['tau']['lw']) == n
    # lag check: flux stored at step k comes from T at step k-1
    for k in (2, n - 1):
        up_lw, down_lw, _, _ = grey_fluxes(
            jnp.asarray(data['T'][k - 1], w.dtype), w.forcing)
        np.testing.assert_allclose(np.asarray(data['flux']['lw_up'][k]),
                                   np.asarray(up_lw), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(data['flux']['lw_down'][k]),
                                   np.asarray(down_lw), rtol=1e-6)


def test_repeat_march_restarts_clock_and_honours_T_initial():
    """data_dict=None restarts t=0 (base.py:301-306): a second march applies
    T_initial and gets the forced first step instead of instantly exiting on
    a stale delta."""
    world = GreyGas(nz=30, ny=1, tau_lw_func='scale_height',
                    tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    world.evolve_to_equilibrium(flux_thresh=1e-2, save=False)
    T_eq = world.T.copy()
    T2 = T_eq + 10.0
    world.evolve_to_equilibrium(T_initial=T2, flux_thresh=1e-2, save=False)
    assert float(world.state.t) > 0          # clock restarted and marched
    assert int(world._equilibrium_info.steps) > 1
    # the march genuinely marched back from the +10 K start in the optically
    # active region (thin top levels are path-dependent; the delta exit can
    # stop short of full balance — both documented reference quirks)
    active = world.tau[:, 0] > 0.1
    dev = np.abs(world.T - T_eq)[active].max()
    assert 1e-4 < dev < 5.0


def test_equilibrium_sol_sw_requires_single_latitude():
    """The sw closed form is single-latitude; the reference raises
    (grey.py:529-530) instead of silently using latitude 0's albedo."""
    from climatemodel_tpu.ops import optical_depth as od
    alpha_sw = od.get_exponential_alpha(100000) / 5
    world = GreyGas(nz=30, ny=4, tau_lw_func='exponential',
                    tau_lw_func_args=[100000, 4], tau_sw_func='exponential',
                    tau_sw_func_args=[od.get_exponential_p_width(alpha_sw),
                                      0.6])
    with pytest.raises(ValueError, match='single latitude'):
        world.equilibrium_sol()


def test_check_every_chunked_exit():
    """check_every=K marches are the SAME physics at a coarser exit cadence:
    capped at an identical step count (max_steps, no exit firing) the K=1 and
    K=4 states are bit-identical (the reduced steps skip only the exit
    statistics, column.py _march_body); a full adaptive march with K=4 still
    converges and lands on the same equilibrium."""
    import jax.numpy as jnp
    from climatemodel_tpu.models.grey import _grey_evolve

    def make():
        return GreyGas(nz=40, ny=1, tau_lw_func='exponential',
                       tau_lw_func_args=[100000, 4])

    # 14 steps (the 2-step fully-checked prefix + 3 chunks of 4), tiny
    # threshold so no exit fires: bit-identical trajectories
    states = {}
    for k in (1, 4):
        w = make()
        st, info = _grey_evolve(
            w.state, w.forcing, jnp.asarray(w.p_interface, w.dtype),
            jnp.asarray(w.p[:, 0], w.dtype), jnp.asarray(1e-12, w.dtype),
            t_end=1e9, max_steps=14, check_every=k)
        assert int(info.steps) == 14
        states[k] = st
    np.testing.assert_array_equal(np.asarray(states[1].T),
                                  np.asarray(states[4].T))
    np.testing.assert_array_equal(np.asarray(states[1].t),
                                  np.asarray(states[4].t))

    # full adaptive march: K=4 converges to the same equilibrium (it may
    # march a little longer: the exit is detected at the first check at or
    # after the K=1 exit point, and the i==1 threshold tightening samples a
    # later delta)
    w1, w4 = make(), make()
    # march twice (the reference experiments' pattern for tight equilibria —
    # a single call's delta-percentile exit can stop with the surface cell
    # ~1 K off balance, and the two cadences sample that exit differently)
    for _ in range(2):
        w1.evolve_to_equilibrium(flux_thresh=1e-3, save=False)
        w4.evolve_to_equilibrium(flux_thresh=1e-3, save=False, check_every=4)
    assert bool(np.asarray(w4._equilibrium_info.equilibrium))
    active = w1.tau[:, 0] > 0.03
    assert np.abs(np.asarray(w1.T) - np.asarray(w4.T))[active].max() < 0.2


def test_check_every_ensemble_path():
    """check_every composes with the vmapped ensemble march (the per-member
    masked while_loop): members converge to the same equilibria as the
    per-step cadence."""
    import jax
    import jax.numpy as jnp
    from climatemodel_tpu.models import ensemble

    world = GreyGas(nz=40, ny=1, tau_lw_func='exponential',
                    tau_lw_func_args=[100000, 4])
    F = np.linspace(1100.0, 1500.0, 8)
    states, forcings, p_int, p_c = ensemble.grey_ensemble(world, F)
    ft = jnp.asarray(1e-3, world.dtype)
    out1, info1 = ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                                ft, max_steps=5000)
    out4, info4 = ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                                ft, max_steps=5000,
                                                check_every=4)
    assert bool(jnp.all(info4.equilibrium | info4.timed_out))
    active = world.tau[:, 0] > 0.03
    err = np.abs(np.asarray(out1.T) - np.asarray(out4.T))[:, active]
    assert float(err.max()) < 1.0


def test_fused_stats_ensemble_bit_identical():
    """fused_stats=True (the fused net+exit-statistics step) marches every
    member to the BIT-IDENTICAL endpoint, step count and flags as the split
    path — the whole contract of ops/two_stream.grey_net_with_stats (on CPU
    this exercises the XLA fallback + the stats plumbing through
    update_temp/check_equilibrium; the Pallas kernel itself is pinned
    bit-exact in test_two_stream + on-chip)."""
    import jax
    import jax.numpy as jnp
    from climatemodel_tpu.models import ensemble

    world = GreyGas(nz=40, ny=1, tau_lw_func='exponential',
                    tau_lw_func_args=[100000, 4],
                    tau_sw_func='exponential', tau_sw_func_args=[80000, 0.2])
    F = np.linspace(1100.0, 1600.0, 9)       # odd count: ragged lane pad
    states, forcings, p_int, p_c = ensemble.grey_ensemble(world, F)
    ft = jnp.asarray(1e-3, world.dtype)
    out0, info0 = ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                                ft, max_steps=5000,
                                                fused_stats=False)
    out1, info1 = ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                                ft, max_steps=5000,
                                                fused_stats=True)
    for a, b in zip(jax.tree_util.tree_leaves((out0, info0)),
                    jax.tree_util.tree_leaves((out1, info1))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_check_every_with_chunked_device_calls():
    """check_every composes with chunk_steps (the watchdog-bounded multi-call
    march): chunk re-entry passes i0 >= 2 so the fully-checked prefix no-ops,
    and the march still reaches the per-step endpoint."""
    def make():
        return GreyGas(nz=40, ny=1, tau_lw_func='exponential',
                       tau_lw_func_args=[100000, 4])
    w_ref, w_chunk = make(), make()
    w_ref.evolve_to_equilibrium(flux_thresh=1e-3, save=False)
    w_chunk.evolve_to_equilibrium(flux_thresh=1e-3, save=False,
                                  chunk_steps=25, check_every=4)
    info = w_chunk._equilibrium_info
    assert bool(np.asarray(info.equilibrium))
    active = w_ref.tau[:, 0] > 0.03
    err = np.abs(np.asarray(w_ref.T) - np.asarray(w_chunk.T))[active]
    assert float(err.max()) < 1.0


def test_dip_memory_with_chunked_device_calls():
    """dip_memory composes with chunk_steps (the watchdog-bounded multi-call
    march): device-call boundaries never alter the physics steps, and the
    dip-memory chunk freezes at the true exit step, so the endpoint stays
    BIT-IDENTICAL to the single-call per-step march (the plain check_every
    composition above only holds a 1 K tolerance)."""
    def make():
        return GreyGas(nz=60, ny=1,
                       tau_lw_func='scale_height_and_peak_in_atmosphere',
                       tau_lw_func_args=[51000, 4, 100, 600, 0.1],
                       tau_sw_func='scale_height_and_peak_in_atmosphere',
                       tau_sw_func_args=[p_surface_earth, 0.12, 100, 20,
                                         0.002])
    w_ref, w_chunk = make(), make()
    w_ref.evolve_to_equilibrium(flux_thresh=1e-3, save=False,
                                convective_adjust=True)
    w_chunk.evolve_to_equilibrium(flux_thresh=1e-3, save=False,
                                  convective_adjust=True,
                                  chunk_steps=25, check_every=4,
                                  dip_memory=True)
    i_ref, i_chunk = w_ref._equilibrium_info, w_chunk._equilibrium_info
    assert bool(np.asarray(i_chunk.equilibrium))
    np.testing.assert_array_equal(np.asarray(w_ref.T), np.asarray(w_chunk.T))
    assert int(i_ref.steps) == int(i_chunk.steps)


def test_dip_memory_bit_identical_to_per_step():
    """``check_every=K, dip_memory=True`` freezes the carry at the first stop
    event, so the FULL adaptive march — not just a step-capped prefix — is
    bit-identical to the per-step cadence: same endpoint bits, same step
    count, same delta, same flags, same simulated time.  This is the exit
    statistic that makes chunked checks safe for convective marches, whose
    oscillating delta the plain sparse checks miss (PERF.md)."""
    def make():
        return GreyGas(nz=60, ny=1,
                       tau_lw_func='scale_height_and_peak_in_atmosphere',
                       tau_lw_func_args=[51000, 4, 100, 600, 0.1],
                       tau_sw_func='scale_height_and_peak_in_atmosphere',
                       tau_sw_func_args=[p_surface_earth, 0.12, 100, 20,
                                         0.002])

    for conv in (False, True):
        w1, w8 = make(), make()
        w1.evolve_to_equilibrium(flux_thresh=1e-3, save=False,
                                 convective_adjust=conv)
        w8.evolve_to_equilibrium(flux_thresh=1e-3, save=False,
                                 convective_adjust=conv,
                                 check_every=8, dip_memory=True)
        i1, i8 = w1._equilibrium_info, w8._equilibrium_info
        np.testing.assert_array_equal(np.asarray(w1._state.T),
                                      np.asarray(w8._state.T))
        assert int(i1.steps) == int(i8.steps)
        assert float(w1._state.t) == float(w8._state.t)
        assert float(i1.delta_net_flux) == float(i8.delta_net_flux)
        for f in ('equilibrium', 'failed', 'nan', 'timed_out'):
            assert bool(getattr(i1, f)) == bool(getattr(i8, f)), (conv, f)


def test_dip_memory_ensemble_exact_convergence():
    """dip_memory fixes the ensemble regression of plain check_every
    (members overshoot their exits, converged fraction drops — PERF.md): the
    K=4 dip-memory ensemble march is bit-identical to per-step, member by
    member, including the convergence flags."""
    import jax.numpy as jnp
    from climatemodel_tpu.models import ensemble

    world = GreyGas(nz=40, ny=1, tau_lw_func='exponential',
                    tau_lw_func_args=[100000, 4])
    F = np.linspace(1100.0, 1500.0, 8)
    states, forcings, p_int, p_c = ensemble.grey_ensemble(world, F)
    ft = jnp.asarray(1e-3, world.dtype)
    out1, info1 = ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                                ft, max_steps=5000)
    out4, info4 = ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                                ft, max_steps=5000,
                                                check_every=4,
                                                dip_memory=True)
    np.testing.assert_array_equal(np.asarray(out1.T), np.asarray(out4.T))
    np.testing.assert_array_equal(np.asarray(info1.steps),
                                  np.asarray(info4.steps))
    np.testing.assert_array_equal(np.asarray(info1.equilibrium),
                                  np.asarray(info4.equilibrium))


def test_dip_memory_freezes_at_max_steps_cap():
    """The step cap is a stop event inside the dip chunk: a capped march must
    return exactly the per-step march's state at step max_steps, not overshoot
    by up to K-1 live steps (review finding, reproduced before the fix:
    steps 38 vs 37 with bit-different endpoints)."""
    import jax.numpy as jnp
    from climatemodel_tpu.models import ensemble

    world = GreyGas(nz=40, ny=1, tau_lw_func='exponential',
                    tau_lw_func_args=[100000, 4])
    F = np.linspace(1200.0, 1400.0, 4)
    states, forcings, p_int, p_c = ensemble.grey_ensemble(world, F)
    ft = jnp.asarray(1e-9, world.dtype)     # unreachable: the cap binds
    out1, info1 = ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                                ft, max_steps=37)
    out4, info4 = ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                                ft, max_steps=37,
                                                check_every=4,
                                                dip_memory=True)
    np.testing.assert_array_equal(np.asarray(info1.steps),
                                  np.asarray(info4.steps))
    np.testing.assert_array_equal(np.asarray(out1.T), np.asarray(out4.T))


def test_f32_noise_blocked_member_finishes_in_f64():
    """The high-insolation f32 tail (VERDICT r03 weak #4): member F=1579.68
    (and 1550.57) cannot satisfy the delta-percentile exit in f32 — the
    95th-percentile flux-change statistic bottoms out at ~3-5e-3 W/m^2 (lw
    recurrence rounding amplified by e^tau_surface), above the 1e-3
    threshold — so the plain march times out at the t_end cap.  The robust
    wrapper must finish exactly those members in f64 by the UNCHANGED
    reference criterion and leave the healthy members' results alone."""
    import jax

    from climatemodel_tpu.models import ensemble

    world = GreyGas(nz=60, ny=1, tau_lw_func='scale_height',
                    tau_lw_func_args=[0.22 * p_surface_earth, 4.0],
                    dtype=jnp.float32)
    F_values = np.array([900.0, 1200.0, 1550.57387057, 1579.68253968])
    states, forcings, p_int, p_c = ensemble.grey_ensemble(world, F_values)
    ft = jnp.asarray(1e-3, jnp.float32)
    fs, info = ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                             ft, max_steps=3000)
    eqb = np.asarray(jax.device_get(info.equilibrium))
    tout = np.asarray(jax.device_get(info.timed_out))
    assert eqb[0] and eqb[1], 'healthy members must converge plainly'
    assert not eqb[2] and not eqb[3], \
        'pinned members converged in f32 — the noise floor moved, retire ' \
        'this test or re-pin the member'
    assert tout[2] and tout[3]

    fs_r, info_r, finished = ensemble.grey_finish_unconverged_f64(
        fs, info, forcings, p_int, p_c, ft, max_steps=3000)
    assert sorted(np.asarray(finished).tolist()) == [2, 3]
    eqb_r = np.asarray(jax.device_get(info_r.equilibrium))
    assert eqb_r.all()
    assert not np.asarray(jax.device_get(info_r.timed_out)).any()
    # healthy members' temperatures untouched by the scatter
    np.testing.assert_array_equal(np.asarray(fs_r.T[:2]), np.asarray(fs.T[:2]))
    # finished members keep the ensemble dtype and continue the f32 state
    # (the delta exit is path-dependent — base.py quirk, CLAUDE.md — so an
    # exact endpoint oracle doesn't exist; the spec is 'converged by the
    # unchanged reference criterion', asserted via equilibrium above)
    assert fs_r.T.dtype == jnp.float32
    # mask to the optically active region: thin top levels are radiatively
    # decoupled and their values are path-dependent (CLAUDE.md quirk)
    active = np.asarray(world.tau)[:, 0] > 0.03
    cont = np.abs(np.asarray(fs_r.T[2:], np.float64)
                  - np.asarray(fs.T[2:], np.float64))[:, active]
    assert float(cont.max()) < 5.0, cont.max()
    # total simulated time accumulates across the finishing calls
    assert np.all(np.asarray(fs_r.t[2:]) > np.asarray(fs.t[2:]))


def test_bake_forcing_matches_dynamic_march():
    """bake_forcing=True (forcing/pressure grids as compile-time constants,
    grey.py _baked_evolve) is a compile MODE: same march semantics, same
    equilibrium.  Radiative marches converge deterministically, so the
    endpoint agreement is tight; the convective leg uses the thermosphere
    config (whose adaptive march genuinely reaches its delta exit) and
    asserts both cadences converge — non-converged oscillating convective
    states amplify single-ulp folding differences without bound and are NOT
    comparable (measured 11 K after 3k timed-out steps, CPU f64)."""
    def make():
        return GreyGas(nz=40, ny=1, tau_lw_func='exponential',
                       tau_lw_func_args=[100000, 4])

    w_dyn, w_baked = make(), make()
    for _ in range(2):
        w_dyn.evolve_to_equilibrium(flux_thresh=1e-3, save=False)
        w_baked.evolve_to_equilibrium(flux_thresh=1e-3, save=False,
                                      bake_forcing=True)
    assert bool(np.asarray(w_baked._equilibrium_info.equilibrium))
    active = w_dyn.tau[:, 0] > 0.03
    diff = np.abs(np.asarray(w_dyn.T) - np.asarray(w_baked.T))[active]
    assert diff.max() < 0.05, f'baked radiative endpoint off {diff.max():.4f} K'

    # convective leg: a converging config, both cadences reach equilibrium
    from climatemodel_tpu.cli import grey_world_kwargs
    def make_conv():
        return GreyGas(nz=60, ny=1, **grey_world_kwargs('thermosphere'))
    w_dc, w_bc = make_conv(), make_conv()
    for _ in range(2):
        w_dc.evolve_to_equilibrium(flux_thresh=1e-3, save=False, t_end=30.0,
                                   convective_adjust=True)
        w_bc.evolve_to_equilibrium(flux_thresh=1e-3, save=False, t_end=30.0,
                                   convective_adjust=True, bake_forcing=True)
    assert bool(np.asarray(w_bc._equilibrium_info.equilibrium))
    assert bool(np.asarray(w_dc._equilibrium_info.equilibrium))
    # converged convective equilibria agree except for the documented
    # path-dependent convective-layer-edge freedom (PERF.md r05)
    d_surf = abs(float(w_dc.T[0, 0]) - float(w_bc.T[0, 0]))
    assert d_surf < 0.5, f'surface disagreement {d_surf:.3f} K'


def test_bake_forcing_fingerprint_catches_inplace_albedo_mutation():
    """The baked closure is keyed by a VALUE fingerprint of the forcing: an
    in-place albedo mutation (exactly what the ice-albedo ramp does through
    the reference's albedo/albedo_mod aliasing, grey.py:91-96) must trigger
    a fresh bake, not silently reuse stale constants."""
    world = GreyGas(nz=40, ny=4, tau_lw_func='exponential',
                    tau_lw_func_args=[100000, 4],
                    albedo=lambda lat: np.full_like(lat, 0.3))
    world.evolve_to_equilibrium(flux_thresh=1e-3, save=False,
                                bake_forcing=True)
    T_warm = np.asarray(world.T).copy()

    # mutate albedo IN PLACE (reference aliasing semantics; a gentle step —
    # a 0.3->0.7 jump marches some level below zero, which raises like the
    # reference), re-march baked
    world.albedo[:] = 0.4
    world.evolve_to_equilibrium(flux_thresh=1e-3, save=False,
                                bake_forcing=True)
    T_cold_baked = np.asarray(world.T).copy()
    assert T_cold_baked.max() < T_warm.max() - 2.0, \
        'baked march reused stale albedo constants after in-place mutation'

    # and the baked cold endpoint agrees with the dynamic cold march
    world2 = GreyGas(nz=40, ny=4, tau_lw_func='exponential',
                     tau_lw_func_args=[100000, 4],
                     albedo=lambda lat: np.full_like(lat, 0.4))
    world2.T = T_warm
    world2.evolve_to_equilibrium(flux_thresh=1e-3, save=False)
    active = world2.tau[:, 0] > 0.03
    diff = np.abs(np.asarray(world2.T) - T_cold_baked)[active]
    assert diff.max() < 0.5, f'stale-constant divergence {diff.max():.3f} K'
