"""Auxiliary subsystems: checkpoint/resume, animation, ensembles, the driver
entry points, and the bench harness (tiny CPU configs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from climatemodel_tpu.constants import p_surface_earth
from climatemodel_tpu.models.grey import GreyGas
from climatemodel_tpu.models.shallow_water import ShallowWater
from climatemodel_tpu.utils.checkpoint import load_pytree, save_pytree


def test_checkpoint_roundtrip_grey(tmp_path):
    w = GreyGas(nz=25, ny=2, tau_lw_func='scale_height',
                tau_lw_func_args=[0.22 * p_surface_earth, 3.0])
    w.take_time_step(0.0)
    w.take_time_step(float(w.state.t))
    path = tmp_path / 'grey_state'
    save_pytree(path, w.state)
    w2 = GreyGas(nz=25, ny=2, tau_lw_func='scale_height',
                 tau_lw_func_args=[0.22 * p_surface_earth, 3.0])
    restored = load_pytree(path, w2.state)
    np.testing.assert_array_equal(np.asarray(restored.T), w.T)
    assert float(restored.t) == float(w.state.t)
    # resume: feeding the restored state back continues identically
    w2._state = restored
    t3a, _ = w.take_time_step(float(w.state.t))
    t3b, _ = w2.take_time_step(float(w2.state.t))
    assert t3a == pytest.approx(t3b)
    np.testing.assert_allclose(w.T, w2.T, rtol=1e-12)


def test_checkpoint_roundtrip_orbax(tmp_path):
    """Orbax backend: directory checkpoint, async save, sharded restore."""
    pytest.importorskip('orbax.checkpoint')
    from climatemodel_tpu.utils.checkpoint import wait_for_saves
    w = GreyGas(nz=25, ny=2, tau_lw_func='scale_height',
                tau_lw_func_args=[0.22 * p_surface_earth, 3.0])
    w.take_time_step(0.0)
    save_pytree(tmp_path / 'grey_ocp', w.state, backend='orbax',
                async_save=True)
    wait_for_saves()
    w2 = GreyGas(nz=25, ny=2, tau_lw_func='scale_height',
                 tau_lw_func_args=[0.22 * p_surface_earth, 3.0])
    restored = load_pytree(tmp_path / 'grey_ocp', w2.state, backend='orbax')
    np.testing.assert_array_equal(np.asarray(restored.T), w.T)
    assert float(restored.t) == float(w.state.t)
    # restore honours the template's sharding: place the live state on an
    # explicit device sharding and round-trip it
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()[:2]), ('d',))
    sh = NamedSharding(mesh, P())
    sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sh), w2.state)
    save_pytree(tmp_path / 'grey_sharded', sharded, backend='orbax')
    back = load_pytree(tmp_path / 'grey_sharded', sharded, backend='orbax')
    np.testing.assert_array_equal(np.asarray(back.T), np.asarray(sharded.T))
    # restored leaves keep device placement + sharding (no host gather): a
    # genuinely partitioned (non-replicated) template must come back as a
    # jax.Array with that same partitioned sharding
    sh_split = NamedSharding(mesh, P(None, 'd'))        # T is (nz-1, ny=2)
    split = jax.tree_util.tree_map(
        lambda x: (jax.device_put(jnp.asarray(x), sh_split)
                   if getattr(x, 'ndim', 0) == 2 and x.shape[-1] == 2 else
                   jax.device_put(jnp.asarray(x), sh)), w2.state)
    save_pytree(tmp_path / 'grey_split', split, backend='orbax')
    back2 = load_pytree(tmp_path / 'grey_split', split, backend='orbax')
    assert isinstance(back2.T, jax.Array)
    assert back2.T.sharding == split.T.sharding
    np.testing.assert_array_equal(np.asarray(back2.T), np.asarray(split.T))


def test_checkpoint_roundtrip_shallow_water(tmp_path):
    kw = dict(nx=20, ny=14, dx=1e5, dy=1e5, dt=60.0, f_0=1e-4, beta=0.0,
              initial_info={'type': 'height_gaussian', 'min_h_surface': 9750.0,
                            'max_h_surface': 9850.0, 'x0': 0.0, 'y0': 0.0,
                            'x_std': 3e5, 'y_std': 3e5, 'add_noise': False})
    w = ShallowWater(**kw)
    w.run(nt=10, snapshots=False)
    save_pytree(tmp_path / 'sw', w.state)
    w2 = ShallowWater(**kw)
    w2._state = load_pytree(tmp_path / 'sw', w2.state)
    w.run(nt=5, snapshots=False)
    w2.run(nt=5, snapshots=False)
    np.testing.assert_allclose(w2.h, w.h, rtol=1e-12)


def test_animation_builds_frames():
    import matplotlib
    matplotlib.use('Agg')
    from climatemodel_tpu.diagnostics.animation import Animate
    w = GreyGas(nz=25, ny=1, tau_lw_func='scale_height',
                tau_lw_func_args=[0.22 * p_surface_earth, 3.0])
    data = w.evolve_to_equilibrium(flux_thresh=5e-2, save=True)
    *_, T_eqb, _, _, ok = w.equilibrium_sol()
    anim = Animate(w, data['T'], data['t'], T_eqb, ok, nPlotFrames=5)
    anim._frame_1d(0)
    anim._frame_1d(len(anim.t_plot) - 1)
    # 2-D layout
    w2 = GreyGas(nz=20, ny=6, tau_lw_func='scale_height',
                 tau_lw_func_args=[0.22 * p_surface_earth, 3.0])
    data2 = w2.evolve_to_equilibrium(flux_thresh=5e-2, save=True)
    anim2 = Animate(w2, data2['T'], data2['t'], nPlotFrames=4)
    anim2._frame_2d(0)
    # tau/flux-overlay variant (radiation_script.py:115 usage)
    w3 = GreyGas(nz=25, ny=1, tau_lw_func='scale_height',
                 tau_lw_func_args=[0.22 * p_surface_earth, 3.0])
    d3 = {'t': [], 'T': [],
          'tau': {'lw': [], 'sw': []},
          'flux': {'lw_up': [], 'lw_down': [], 'sw_up': [], 'sw_down': []}}
    d3 = w3.save_data(d3, 0.0)
    d3 = w3.evolve_to_equilibrium(d3, flux_thresh=5e-2, save=True)
    anim3 = Animate(w3, d3['T'], d3['t'], tau_array=d3['tau'],
                    flux_array=d3['flux'], nPlotFrames=4)
    anim3._frame_1d(0)
    anim3._frame_1d(len(anim3.t_plot) - 1)


def test_grey_ensemble_members_independent():
    """Each vmapped member converges to its own stellar constant's equilibrium,
    identical to running that member alone."""
    from climatemodel_tpu.models import ensemble
    w = GreyGas(nz=30, ny=1, tau_lw_func='scale_height',
                tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    F_vals = np.array([900.0, 1367.0])
    states, forcings, p_int, p_c = ensemble.grey_ensemble(w, F_vals)
    out_states, info = ensemble.grey_evolve_ensemble(
        states, forcings, p_int, p_c, jnp.asarray(1e-3, w.dtype),
        max_steps=20_000)
    assert bool(info.equilibrium.all())
    # solo run of member 1 must match the batched member 1
    w1 = GreyGas(nz=30, ny=1, tau_lw_func='scale_height',
                 tau_lw_func_args=[0.22 * p_surface_earth, 4.0],
                 F_stellar_constant=1367.0)
    w1.evolve_to_equilibrium(flux_thresh=1e-3, save=False)
    np.testing.assert_allclose(np.asarray(out_states.T[1]), w1.T, atol=1e-8)
    # member 0 (dimmer star) is colder
    assert np.asarray(out_states.T[0]).mean() < np.asarray(out_states.T[1]).mean()


def test_grey_ensemble_seeds_from_raw_albedo():
    """grey_ensemble's isothermal member seeds must come from the RAW albedo
    (reference base.py:120), not albedo_mod: with an sw absorber the member
    seed must equal the T0 of a fresh GreyGas built at that stellar constant
    (r04 review finding — albedo_mod seeding started every member warmer)."""
    from climatemodel_tpu.models import ensemble
    w = GreyGas(nz=24, ny=1,
                tau_lw_func='scale_height',
                tau_lw_func_args=[0.22 * p_surface_earth, 4.0],
                tau_sw_func='scale_height',
                tau_sw_func_args=[0.08 * p_surface_earth, 2.0])
    assert float(w.albedo_mod[0]) < float(w.albedo[0])   # sw absorber active
    F_vals = np.array([900.0, 1367.0])
    states, _, _, _ = ensemble.grey_ensemble(w, F_vals)
    for i, F in enumerate(F_vals):
        solo = GreyGas(nz=24, ny=1,
                       tau_lw_func='scale_height',
                       tau_lw_func_args=[0.22 * p_surface_earth, 4.0],
                       tau_sw_func='scale_height',
                       tau_sw_func_args=[0.08 * p_surface_earth, 2.0],
                       F_stellar_constant=float(F))
        np.testing.assert_allclose(np.asarray(states.T[i]), solo.T,
                                   rtol=1e-6)


def test_real_gas_ensemble_member_matches_solo():
    """A vmapped real-gas member with scale=1 and the template T_g follows the
    identical trajectory to the solo march (shared transmission cache, own
    adaptive-dt controller per member)."""
    from climatemodel_tpu.models import ensemble
    from climatemodel_tpu.models.real_gas import RealGas
    from climatemodel_tpu.spectral import humidity

    def make():
        return RealGas(nz=30, ny=1, molecule_names=['single_line'],
                       T_g=260.0, q_funcs={'single_line': humidity.co2},
                       q_funcs_args={'single_line': ()},
                       delta_temp_change=0.1)

    gas = make()
    states, scales, T_gs, args = ensemble.real_gas_ensemble(
        gas, F_scales=[1.0, 1.15], T_g_values=[gas.T_g, gas.T_g + 10.0])
    out_states, info = ensemble.real_gas_evolve_ensemble(
        states, scales, T_gs, *args, jnp.asarray(1e-3, gas.dtype),
        max_steps=20_000, t_end=50.0)
    # the toy gas plateaus above ft=1e-3 (optically-thin-top path dependence,
    # see CLAUDE.md) — require a clean exit, not strict convergence
    assert bool((info.equilibrium | info.timed_out).all())
    assert not bool(info.failed.any()) and not bool(info.nan.any())
    solo = make()
    solo.evolve_to_equilibrium(flux_thresh=1e-3, save=False, t_end=50.0)
    np.testing.assert_allclose(np.asarray(out_states.T[0]), solo.T, atol=1e-8)
    # the brighter-star, warmer-ground member equilibrates hotter
    assert np.asarray(out_states.T[1]).mean() > np.asarray(out_states.T[0]).mean()


def test_real_gas_compos_ensemble_ghg_ladder():
    """stacked_tau=True: each member carries its own composition's optical
    depth (the reference's sequential CO2-ladder loop, real_gas_script.py:
    27-40, as one vmapped march); a ladder member matches its solo march."""
    from climatemodel_tpu.models import ensemble
    from climatemodel_tpu.models.real_gas import RealGas
    from climatemodel_tpu.spectral import humidity

    def make(q_surface):
        return RealGas(nz=30, ny=1, molecule_names=['single_line'],
                       T_g=260.0,
                       q_funcs={'single_line': humidity.co2},
                       q_funcs_args={'single_line': (q_surface,)},
                       delta_temp_change=0.1)

    gases = [make(370.0), make(2960.0)]        # 1x and 8x CO2
    states, scales, T_gs, args = ensemble.real_gas_compos_ensemble(gases)
    out_states, info = ensemble.real_gas_evolve_ensemble(
        states, scales, T_gs, *args, jnp.asarray(1e-3, gases[0].dtype),
        max_steps=20_000, stacked_tau=True, t_end=50.0)
    assert bool((info.equilibrium | info.timed_out).all())
    assert not bool(info.failed.any()) and not bool(info.nan.any())
    solo = make(2960.0)
    solo.evolve_to_equilibrium(flux_thresh=1e-3, save=False, t_end=50.0)
    # the cache is built INSIDE the vmap for stacked_tau: XLA batches its
    # einsums differently than the solo path, and the f64 reassociation drift
    # accumulates over the ~50-model-year march — pin to 1e-3 K, not ulps
    np.testing.assert_allclose(np.asarray(out_states.T[1]), solo.T, atol=1e-3)
    # more absorber => stronger greenhouse: members genuinely differ
    assert not np.allclose(np.asarray(out_states.T[0]),
                           np.asarray(out_states.T[1]), atol=0.5)


def test_real_gas_find_Tg_ensemble_matches_solo():
    """The vectorised secant T_g solve agrees with the reference-style scalar
    Newton (real_gas.py:530-562) and orders with insolation."""
    from climatemodel_tpu.models import ensemble
    from climatemodel_tpu.models.real_gas import RealGas
    from climatemodel_tpu.spectral import humidity

    def make():
        return RealGas(nz=30, ny=1, molecule_names=['single_line'],
                       T_g=260.0, q_funcs={'single_line': humidity.co2},
                       q_funcs_args={'single_line': ()},
                       delta_temp_change=0.1)

    gas = make()
    states, scales, T_gs, args = ensemble.real_gas_ensemble(
        gas, F_scales=[1.0, 1.2])
    Tg, _, info = ensemble.real_gas_find_Tg_ensemble(
        states, scales, T_gs, args, flux_thresh=0.1, tol=0.5)
    assert bool(info['converged'].all())
    solo = make()
    Tg_solo = solo.find_Tg(flux_thresh=0.1, tol=0.5)
    # both solvers stop within tol of the root: agree to ~2 tol
    assert abs(float(Tg[0]) - Tg_solo) < 1.0
    # brighter star needs a warmer ground to balance the TOA flux
    assert float(Tg[1]) > float(Tg[0])


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.h)
    assert bool(jnp.isfinite(out.h).all())
    assert float(out.t) > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_bench_smoke_cpu():
    """Tiny-config smoke of every bench path (numbers meaningless on CPU)."""
    import bench
    r = bench.bench_grey(n_ensemble=4, nz=20, max_steps=50)
    assert r['model_days_per_sec'] > 0
    r = bench.bench_sw(nx=34, ny=18, nt=5, solver='richtmyer', el_nino=False)
    assert r['cell_updates_per_sec'] > 0
    r = bench.bench_ebm(ny=4, nz=20)
    assert r['model_days_per_sec'] > 0


def test_per_latitude_ensemble_matches_shared_dt_equilibrium():
    """Framework extra: marching latitudes as independent vmapped columns
    (own dt each) reaches the same equilibrium as the reference's shared-dt
    march, faster per column."""
    from climatemodel_tpu.models import ensemble
    world = GreyGas(nz=40, ny=12, tau_lw_func='scale_height',
                    tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    _, _, T_eqb, *_ = world.equilibrium_sol()
    states, forcings, p_int, p_c = ensemble.grey_latitude_ensemble(world)
    out_states = states
    for _ in range(2):
        out_states, info = ensemble.grey_evolve_ensemble(
            out_states, forcings, p_int, p_c, jnp.asarray(1e-4, world.dtype),
            max_steps=100_000, use_delta_exit=False)
    T = np.asarray(out_states.T)[:, :, 0].T          # back to [nz-1, ny]
    # per-column convergence is bounded by the controller's own level-freezing
    # (like the reference); compare where the gas meaningfully absorbs
    active = world.tau[:, 0] > 0.1
    assert np.abs(T - T_eqb)[active].max() < 0.15
    # members converge at very different per-column rates (own dt each)
    assert np.asarray(info.steps).max() > 3 * np.asarray(info.steps).min()


def test_find_Tg_balances_toa_flux():
    """RealGas.find_Tg: outer Newton over full equilibrium marches
    (real_gas.py:530-562) drives the TOA net flux towards zero."""
    from climatemodel_tpu.models.real_gas import RealGas
    from climatemodel_tpu.spectral import humidity
    REF_LUT = ('/root/reference/Model/radiation/real_gas_data/HitranData/'
               'LookupTables')
    gas = RealGas(nz=30, ny=1, molecule_names=['single_line'], T_g=250.0,
                  q_funcs={'single_line': humidity.co2},
                  q_funcs_args={'single_line': ()}, table_folder=REF_LUT,
                  delta_temp_change=0.1)
    root = gas.find_Tg(flux_thresh=0.1, tol=0.5)
    assert 230 < root < 300
    assert abs(gas.net_flux[0]) < 2.0     # TOA balance within Newton tol


def test_plot_eqb_builds_figure():
    """GreyGas.plot_eqb draws the 3-panel tau/T/flux figure, with dotted
    no-short-wave overlays when a sw absorber is present (grey.py:453-501)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from climatemodel_tpu.ops import optical_depth as od
    alpha_sw = od.get_exponential_alpha(100000.0) / 3
    w = GreyGas(nz=20, ny=1, tau_lw_func='exponential',
                tau_lw_func_args=[100000.0, 4.0],
                tau_sw_func='exponential',
                tau_sw_func_args=[od.get_exponential_p_width(alpha_sw), 0.2])
    fig, ax = w.plot_eqb(*w.equilibrium_sol()[:5])
    assert len(ax) == 3
    assert len(ax[1].lines) == 2          # sw solution + tau_sw=0 overlay
    plt.close(fig)
    w0 = GreyGas(nz=20, ny=1, tau_lw_func='scale_height',
                 tau_lw_func_args=[0.22 * p_surface_earth, 3.0])
    fig0, ax0 = w0.plot_eqb(*w0.equilibrium_sol()[:5])
    assert len(ax0[1].lines) == 1
    plt.close(fig0)


def test_plot_absorption_coefficient():
    """hitran.plot_absorption_coefficient reads the nearest (p, T) slice
    (hitran.py:360-387)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from climatemodel_tpu.spectral import hitran
    REF_LUT = ('/root/reference/Model/radiation/real_gas_data/HitranData/'
               'LookupTables')
    nu, k = hitran.plot_absorption_coefficient(
        'single_line', 101320.0, 296.0, do_plot=False, folder=REF_LUT)
    table = hitran.load_table('single_line', REF_LUT)
    np.testing.assert_array_equal(nu, table['nu'])
    np.testing.assert_array_equal(k, table['absorption_coef'][0, 0])
    fig, ax = hitran.plot_absorption_coefficient(
        'single_line', 101320.0, 296.0, folder=REF_LUT)
    assert ax.get_yscale() == 'log'
    plt.close(fig)


def test_nan_sentinel_aborts_march():
    """A non-finite forcing aborts the fused march immediately with a clear
    error instead of looping to max_steps (SURVEY §5 sanitizer row)."""
    w = GreyGas(nz=20, ny=1, tau_lw_func='scale_height',
                tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    w.F_stellar_constant = float('nan')
    with pytest.raises(FloatingPointError, match='non-finite'):
        w.evolve_to_equilibrium(flux_thresh=1e-3, save=False)
    assert bool(w._equilibrium_info.nan)
    assert int(w._equilibrium_info.steps) <= 3


def test_verbose_chunked_march_telemetry(capsys):
    """verbose=True on the fused save=False march prints per-chunk convergence
    telemetry (steps / t / delta_net_flux, base.py:324-327) and still reaches
    the same equilibrium."""
    kw = dict(nz=20, ny=1, tau_lw_func='scale_height',
              tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    w = GreyGas(**kw)
    w.evolve_to_equilibrium(flux_thresh=1e-3, save=False, verbose=True,
                            chunk_steps=50)
    out = capsys.readouterr().out
    assert 'delta_net_flux' in out and 'step ' in out
    w2 = GreyGas(**kw)
    w2.evolve_to_equilibrium(flux_thresh=1e-3, save=False)
    np.testing.assert_allclose(w.T, w2.T, atol=1e-6)


def test_albedo_ramp_guard():
    """GreyAlbedoFeedback.update_albedo raises instead of spinning forever when
    the ramp cannot converge (models/ice_albedo.py guard; the reference's loop
    at ice_albedo_feedback.py:152-158 has no exit)."""
    from climatemodel_tpu.models.ice_albedo import GreyAlbedoFeedback
    fb = GreyAlbedoFeedback(
        tau_lw_surface_values=[1.0, 4.0], stellar_constant_values=1361.0,
        nz=20, ny=4, tau_lw_func='scale_height',
        tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    # an albedo target the 0.1-increment ramp can never land on (0.45 from
    # 0.3: 0.4 -> 0.5 -> 0.4 -> ... oscillates forever in the reference)
    fb.albedo_function = lambda latitude, T_surface=None: \
        np.full(np.shape(latitude), 0.45)
    with pytest.raises(RuntimeError, match='albedo ramp did not converge'):
        fb.update_albedo(delta_albedo=0.1, delta_net_flux_thresh=1e-2,
                         max_ramp_iterations=3)


def test_cli_grey_and_shallow(tmp_path, capsys):
    from climatemodel_tpu.cli import main
    main(['grey', '--world', 'scale_height', '--nz', '25',
          '--flux-thresh', '1e-1',
          '--out', str(tmp_path / 'grey_state')])
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith('{')][0]
    import json
    rec = json.loads(line)
    assert rec['nz'] == 25 and rec['steps'] > 0
    assert 150 < rec['T_surface'] < 400
    assert (tmp_path / 'grey_state.npz').exists()

    main(['shallow', '--scenario', 'gravity_wave', '--n-days', '0.05'])
    out = capsys.readouterr().out
    rec = json.loads([l for l in out.splitlines() if l.startswith('{')][0])
    assert rec['scenario'] == 'gravity_wave' and rec['final_t_days'] > 0


def test_cli_scenario_registry_complete():
    from climatemodel_tpu.cli import SHALLOW_SCENARIOS, shallow_scenario
    for name in SHALLOW_SCENARIOS:
        kw, run = shallow_scenario(name)
        assert 'initial_info' in kw and run['n_days'] > 0


def test_percentile_topk_matches_jnp_percentile():
    """The march's top_k order-statistics percentile (column._percentile_topk)
    reproduces jnp.percentile's linear interpolation across sizes, percentile
    values, dtypes, and duplicate-heavy data."""
    import jax.numpy as jnp
    from climatemodel_tpu.models.column import _percentile_topk
    rng = np.random.default_rng(42)
    for n in (1, 2, 3, 20, 59, 64 * 59, 381):
        for pct in (95, 50, 90, 100, 0):
            for dt in (np.float64, np.float32):
                x = rng.normal(size=n).astype(dt)
                if n > 10:
                    x[:: 3] = x[0]            # duplicates
                got = float(_percentile_topk(jnp.asarray(x), pct))
                want = float(jnp.percentile(jnp.asarray(x), pct))
                assert got == pytest.approx(want, rel=1e-6, abs=1e-12), \
                    (n, pct, dt)


def test_check_every_sticky_negative_T_abort():
    """A transient negative-T excursion during the REDUCED steps of a
    check_every chunk must still set the failed flag, even when the
    temperature has recovered by the time the chunk's full check runs
    (column._march_body accumulates the abort criteria stickily)."""
    import jax.numpy as jnp
    from climatemodel_tpu.constants import g, c_p_dry
    from climatemodel_tpu.models import column

    # one cell between two interfaces; net_fn engineered so the adaptive
    # controller (delta_t = 1 K per step) walks T down 2.5 -> 1.5 -> 0.5 ->
    # -0.5 and then oscillates +-0.5: the dip happens at step 2 (the first
    # REDUCED step after the fully-checked two-step prefix) and the chunk's
    # full check at i=10 sees T = +0.5 again
    p_int = jnp.asarray([[2.0], [1.0]])
    dp = float(p_int[1, 0] - p_int[0, 0])

    def net_fn(T):
        f = 3e-4 * (0.2 - T[0, 0])            # target tendency (K/s)
        x1 = 1.0 + dp * c_p_dry / g * f
        return jnp.stack([jnp.full((1,), 1.0), jnp.full((1,), x1)])

    def run(check_every, dip_memory=False):
        state = column.ColumnState(
            T=jnp.full((1, 1), 2.5), net_flux=jnp.zeros((2, 1)),
            t=jnp.asarray(0.0),
            tsi=column.init_time_step_info(1, temp_change=1.0,
                                           dtype=jnp.float64))
        return column.evolve_to_equilibrium(
            state, net_fn, p_int, jnp.asarray([1.5]), flux_thresh=1e-12,
            t_end=1e12, max_steps=10, check_every=check_every,
            dip_memory=dip_memory)

    st8, info8 = run(8)
    assert float(st8.T[0, 0]) > 0             # recovered by the check...
    assert bool(info8.failed)                  # ...but the dip still aborts
    # the per-step march flags it at the dip itself
    st1, info1 = run(1)
    assert bool(info1.failed)
    assert float(st1.T[0, 0]) < 0

    # dip_memory freezes the carry AT the failure step: unlike the sticky
    # plain-K chunk above (which reports the recovered T=+0.5 state), the
    # dip-memory chunk returns the per-step march's exact failure state
    st8d, info8d = run(8, dip_memory=True)
    assert bool(info8d.failed)
    assert float(st8d.T[0, 0]) == float(st1.T[0, 0])
    assert int(info8d.steps) == int(info1.steps)


def test_percentile_topk_propagates_nan():
    """A NaN anywhere in the input must yield NaN, like jnp.percentile —
    top_k alone sorts NaNs to the top and would return a plausible finite
    value (r03 advisor finding)."""
    import jax.numpy as jnp
    from climatemodel_tpu.models.column import _percentile_topk
    rng = np.random.default_rng(0)
    for n in (1, 3, 59, 381):
        for pct in (95, 50, 100):
            x = rng.normal(size=n).astype(np.float32)
            x[n // 2] = np.nan
            got = float(_percentile_topk(jnp.asarray(x), pct))
            assert np.isnan(got), (n, pct, got)
            assert np.isnan(float(jnp.percentile(jnp.asarray(x), pct)))


def test_animation_truncation_any_latitude_semantics():
    """ny>1 frame truncation follows the reference formula exactly
    (animation.py:113-122): the 99th percentile is taken over the LEVEL
    axis per (frame, latitude), and a frame counts as converged when ANY
    latitude's change is small (r04 review parity fix — a flattened
    percentile required joint smallness).  Construct frames where latitude
    0 converges at frame 6 while latitude 1 keeps changing: the selected
    frames must stop at the reference's max_index, not run to the end."""
    w = GreyGas(nz=20, ny=2, tau_lw_func='scale_height',
                tau_lw_func_args=[0.22 * p_surface_earth, 3.0])
    nz_c = w.T.shape[0]
    n_t = 40
    rng = np.random.default_rng(0)
    T_arr = []
    for i in range(n_t):
        T = np.full((nz_c, 2), 250.0)
        # latitude 0: changes shrink below 0.01 K after frame 6
        T[:, 0] += (1.0 if i < 6 else 0.001) * i + rng.random(nz_c) * 1e-4
        T[:, 1] += 5.0 * i                    # latitude 1: never converges
        T_arr.append(T)
    from climatemodel_tpu.diagnostics.animation import Animate
    anim = Animate(w, T_arr, list(range(n_t)), nPlotFrames=10,
                   fract_frames_at_start=0.0)
    # reference formula, computed independently
    diffs = np.abs(np.diff(np.stack(T_arr), axis=0))
    small = np.where(np.percentile(diffs, 99, axis=1) < 0.01)[0]
    sep = np.where(np.ediff1d(small) > 1)[0]
    max_index = (small[max(sep) + 1] + 1) if len(sep) else (small[0] + 1)
    assert len(small) > 0 and max_index < n_t - 1
    assert anim.t_plot.max() == max_index
