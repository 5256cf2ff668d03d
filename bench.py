"""Benchmark harness: measures the BASELINE.json configs on the available
accelerator and prints ONE JSON line
{"metric", "value", "unit", "vs_baseline", "extra": {...}}.

Configs (BASELINE.md):
  grey  — grey-gas RCE throughput: a vmapped ensemble of independent columns
          (different stellar constants, the ice-albedo sweep workload) marched
          to radiative equilibrium by the fused while_loop; metric is total
          simulated model-days per wall-second.
  sw    — shallow-water throughput: large nonlinear beta-plane grid, richtmyer
          scheme with live CFL control, whole run fused in one lax.scan;
          metric is interior cell-updates per wall-second.
  real  — real-gas band column: adaptive steps per second of the packed-band
          flux march (single_line toy gas, shipped table).
  ebm   — latitude-grid grey world with step-function (icy) albedo marched to
          equilibrium: model-days/s for the EBM workload.

North-star targets (driver-supplied): 10,000 grey model-days/s and 1e9
shallow-water cell-updates/s on a v5e-8; this harness runs on however many
chips are visible (one, under axon) and reports absolute numbers.
"""
import json
import os
import sys
import time

import numpy as np

# keep the preset platform (axon TPU when available); fall back silently to
# CPU.  An EXPLICIT JAX_PLATFORMS=cpu must actually bench the CPU: plugin
# backends ignore the env var alone, so mirror it into jax.config before
# any jax use (utils/platform.honor_platform_env inlined here — bench must
# set the config before importing the package triggers jax)
import jax
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
import jax.numpy as jnp

# Persistent client-side compilation cache: serialized executables land in a
# repo-local dir that survives across processes and driver rounds, so a cold
# process deserializes (~0.1 s/program) instead of recompiling.  Measured on
# the axon tunnel: a cold-worker grey_rce config wall of ~1040 s (BENCH_r02)
# collapses to ctor + deserialize once this dir is populated.  Override the
# location (or disable with an empty string) via CLIMATEMODEL_TPU_COMPILE_CACHE.
#
# The dir is scoped per HOST CPU fingerprint: rounds can run on different
# machines, and XLA:CPU AOT executables compiled for another machine's
# feature set load with a may-SIGILL warning — a SIGILL in a CPU-fallback
# bench would kill the process with no JSON record.  (TPU entries keyed by
# the same fingerprint just recompile once per new host.)


def _host_cache_dir(base):
    import hashlib
    import platform as _platform
    sig = _platform.machine() + ';' + _platform.processor()
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith(('flags', 'Features')):
                    sig += ';' + line.strip()
                    break
    except OSError:
        pass
    return os.path.join(base, 'host-' +
                        hashlib.sha1(sig.encode()).hexdigest()[:12])


_CACHE_DIR = os.environ.get('CLIMATEMODEL_TPU_COMPILE_CACHE')
if _CACHE_DIR is None:
    _CACHE_DIR = _host_cache_dir(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     '.jax_compile_cache'))
if _CACHE_DIR:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def _sync(tree):
    jax.block_until_ready(tree)


def bench_grey(n_ensemble=4096, nz=60, max_steps=3000):
    """The headline grey-RCE ensemble (BASELINE config #1 at ensemble scale).

    The plain f32 march leaves a ~0.05% tail unconverged (2/4096
    high-insolation members whose delta-percentile exit statistic is blocked
    by the f32 flux-recurrence noise floor, ~3-5e-3 W/m^2 > the 1e-3
    threshold); ``grey_evolve_ensemble_robust`` finishes exactly those
    members in f64 by the reference's own unchanged criterion
    (models/ensemble.py; pinned by tests/test_grey_rce.py::
    test_f32_noise_blocked_member_finishes_in_f64).  The timed loop measures
    the plain march (the throughput number); the finishing pass is timed
    separately and reported as f64_finish_wall_s."""
    from climatemodel_tpu.constants import p_surface_earth
    from climatemodel_tpu.models import ensemble
    from climatemodel_tpu.models.grey import GreyGas

    world = GreyGas(nz=nz, ny=1, tau_lw_func='scale_height',
                    tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    F_values = np.linspace(800.0, 1600.0, n_ensemble)
    states, forcings, p_int, p_c = ensemble.grey_ensemble(world, F_values)
    ft = jnp.asarray(1e-3, world.dtype)
    run = lambda: ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                                ft, max_steps=max_steps)
    out = run()           # compile + converge once
    _sync(out)
    wall = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        _sync(out)
        wall = min(wall, time.perf_counter() - t0)
    final_states, info = out
    t_np, steps_np, eqb_np = jax.device_get(
        (final_states.t, info.steps, info.equilibrium))
    days = float(np.sum(t_np)) / 86400.0
    res = {'model_days_per_sec': days / wall, 'wall_s': wall,
           'ensemble': n_ensemble, 'nz': nz,
           'total_steps': int(np.sum(steps_np)),
           'converged_fraction_f32': float(np.mean(eqb_np))}
    # guarded: if f64 is unavailable on this backend the OPTIONAL finishing
    # pass must not cost the headline row its numbers
    try:
        t0 = time.perf_counter()
        fs_r, info_r, finished = ensemble.grey_finish_unconverged_f64(
            final_states, info, forcings, p_int, p_c, ft, max_steps=max_steps)
        _sync(fs_r)
        res['f64_finish_wall_s'] = time.perf_counter() - t0
        res['f64_finished_members'] = int(len(finished))
        res['converged_fraction'] = float(np.mean(
            jax.device_get(info_r.equilibrium)))
    except Exception as e:
        res['f64_finish_error'] = f'{type(e).__name__}: {e}'[:200]
        res['converged_fraction'] = res['converged_fraction_f32']
    return res


def bench_sw(nx=2050, ny=1026, nt=400, solver='richtmyer_pallas',
             el_nino=True):
    """El Nino wind-forced run (the BASELINE config) scaled to a large grid,
    stepping with the fused Pallas Richtmyer kernel."""
    from climatemodel_tpu.constants import Omega, R_earth
    from climatemodel_tpu.models.shallow_water import (ShallowWater,
                                                       sw_simulate)
    if el_nino:
        h_mean, g_use = 100.0, 0.05
        c = np.sqrt(g_use * h_mean)
        beta = 2 * Omega / R_earth
        L_def = np.sqrt(c / beta)
        dx = L_def / 5
        dt = 0.01 * dx / c
        r = 1 / (10 * 30 * 24 * 3600)
        world = ShallowWater(
            nx=nx, ny=ny, dx=dx, dy=dx, dt=dt, f_0=0.0, beta=beta, r=r,
            g=g_use, numerical_solver=solver,
            boundary_type={'x': 'walls', 'y': 'walls',
                           'y_walls_damp': {'dist_thresh': (ny / 2) * dx
                                            - 6 * dx, 'r': r * 100}},
            initial_info={'type': 'el_nino', 'max_h_surface': 110.0,
                          'min_h_surface': 90.0, 'y_std': L_def,
                          'add_noise': False, 'wind': {'type': 'forced'}})
    else:
        world = ShallowWater(
            nx=nx, ny=ny, dx=100e3, dy=100e3, dt=60.0, f_0=1e-4, beta=1.6e-11,
            numerical_solver=solver,
            initial_info={'type': 'height_gaussian', 'min_h_surface': 9750.0,
                          'max_h_surface': 10750.0, 'x0': 0.0, 'y0': 0.0,
                          'x_std': 4000e3, 'y_std': 4000e3,
                          'add_noise': False})
    kw = world._step_kwargs()
    # hoist params: the .params property re-uploads the geometry arrays on
    # every access, which dominates wall time over the tunneled link
    params = world.params
    # warm with the SAME static step count so the timed call never compiles;
    # take the best of 3 trials (the tunneled chip shows timing variance)
    state = sw_simulate(world.state, params, nt, **kw)
    _sync(state)
    wall = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        state = sw_simulate(state, params, nt, **kw)
        _sync(state)
        wall = min(wall, time.perf_counter() - t0)
    cells = (nx - 2) * (ny - 2)
    out = {'cell_updates_per_sec': cells * nt / wall, 'wall_s': wall,
           'grid': [nx, ny], 'steps': nt, 'solver': solver,
           'el_nino_forced': el_nino, 'ms_per_step': 1e3 * wall / nt}
    if el_nino:
        # the wind-free step (no global Bjerknes reduction) isolates the
        # fused kernel: report it alongside as the kernel ceiling
        sub = bench_sw(nx=nx, ny=ny, nt=nt, solver=solver, el_nino=False)
        out['no_wind_cell_updates_per_sec'] = sub['cell_updates_per_sec']
        out['no_wind_ms_per_step'] = sub['ms_per_step']
    return out


def bench_real_gas():
    """Real-gas equilibrium march throughput (device march only: host model
    construction — grids, bands, tau integration — is one-time setup)."""
    from climatemodel_tpu.models.real_gas import RealGas, _real_gas_evolve
    from climatemodel_tpu.spectral import humidity
    gas = RealGas(nz='auto', ny=1, molecule_names=['single_line'], T_g=265.0,
                  q_funcs={'single_line': humidity.co2},
                  q_funcs_args={'single_line': ()}, delta_temp_change=0.1)
    args = (gas.state, jnp.asarray(gas.T_g, gas.dtype), gas.tau_device,
            gas.band_arrays, gas._F_star_factor,
            jnp.asarray(gas.nu_bands['delta'], gas.dtype),
            jnp.asarray(gas.p_interface, gas.dtype),
            jnp.asarray(gas.p[:, 0], gas.dtype),
            jnp.asarray(1e-4, gas.dtype))
    out = _real_gas_evolve(*args)
    _sync(out[0].T)
    wall = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = _real_gas_evolve(*args)
        _sync(out[0].T)
        wall = min(wall, time.perf_counter() - t0)
    steps_np, t_np = jax.device_get((out[1].steps, out[0].t))  # one pull
    steps = int(steps_np)
    days = float(t_np) / 86400.0
    return {'steps_per_sec': steps / wall, 'model_days_per_sec': days / wall,
            'nz': gas.nz, 'steps': steps, 'wall_s': wall}


def bench_real_gas_earth(n_nu_bands=200):
    """Earth-scale real-gas column: 4-gas earth-like composition (fabricated
    standalone tables), nz='auto', 200 Planck-equalised bands — the
    centa-presentation scale (centa_presentation/script.py:21-24) where the
    nz x nz packed-band transmission engine is actually stressed."""
    from climatemodel_tpu.models.real_gas import RealGas, _real_gas_evolve
    from climatemodel_tpu.spectral import earth_tables
    earth_tables.ensure_earth_tables()
    gas = RealGas(nz='auto', ny=1, molecule_names=['CO2', 'CH4', 'H2O', 'O3'],
                  T_g=265.19, p_toa=0.1, n_nu_bands=n_nu_bands, temp_change=1,
                  delta_temp_change=0.1)
    args = (gas.state, jnp.asarray(gas.T_g, gas.dtype), gas.tau_device,
            gas.band_arrays, gas._F_star_factor,
            jnp.asarray(gas.nu_bands['delta'], gas.dtype),
            jnp.asarray(gas.p_interface, gas.dtype),
            jnp.asarray(gas.p[:, 0], gas.dtype),
            jnp.asarray(1e-3, gas.dtype))      # the reference's flux_thresh
    out = _real_gas_evolve(*args, t_end=20.0)
    _sync(out[0].T)
    wall = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = _real_gas_evolve(*args, t_end=20.0)
        _sync(out[0].T)
        wall = min(wall, time.perf_counter() - t0)
    # one batched pull (each separate sync is a tunnel round trip)
    steps_np, t_np, eqb, tout, failed, nan = jax.device_get(
        (out[1].steps, out[0].t, out[1].equilibrium, out[1].timed_out,
         out[1].failed, out[1].nan))
    steps = int(steps_np)
    days = float(t_np) / 86400.0
    n_lw = int(gas.band_arrays.idx.shape[0])
    res = {'steps_per_sec': steps / wall, 'model_days_per_sec': days / wall,
           'nz': gas.nz, 'n_nu_bands': n_nu_bands, 'n_lw_bands': n_lw,
           'steps': steps, 'wall_s': wall, 'ms_per_step': 1e3 * wall / steps,
           # the throughput number is only meaningful for a healthy march
           'equilibrium': bool(eqb), 'timed_out': bool(tout),
           'failed': bool(failed), 'nan': bool(nan)}
    # chunked-exit variant (check_every=4): the same march with the exit
    # statistics every 4th step — ~15-20% on this launch-bound column
    out = _real_gas_evolve(*args, t_end=20.0, check_every=4)
    _sync(out[0].T)
    wall = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = _real_gas_evolve(*args, t_end=20.0, check_every=4)
        _sync(out[0].T)
        wall = min(wall, time.perf_counter() - t0)
    steps_np, eqb = jax.device_get((out[1].steps, out[1].equilibrium))
    steps = int(steps_np)
    res['check_every_4'] = {
        'steps_per_sec': steps / wall, 'steps': steps, 'wall_s': wall,
        'ms_per_step': 1e3 * wall / steps, 'equilibrium': bool(eqb)}
    return res


def bench_real_gas_earth_ensemble(n_ensemble=64, n_nu_bands=200):
    """Vmapped earth-composition ensemble: members share one composition (one
    TransmissionCache, hoisted outside the vmap) and sweep the insolation
    scale — the arctic-amplification workload.  Batching turns the per-step
    flux GEMV into one batched GEMM whose second dimension is the member axis
    (MXU work), so aggregate throughput should far exceed the single column."""
    from climatemodel_tpu.models import ensemble
    from climatemodel_tpu.models.real_gas import RealGas
    from climatemodel_tpu.spectral import earth_tables
    earth_tables.ensure_earth_tables()
    # temp_change=0.5: the wide insolation sweep at the single-column default
    # (1 K/step) drives a few marginal members through a negative-T transient
    # at the hot UV layer; with the gentler controller and the band-first
    # differenced tendency (real_gas._net_and_diff) all 64 members converge
    # (BENCH_r02's lone failed member was f32 reduction-order noise heating a
    # radiatively-decoupled micro-mass TOA level)
    gas = RealGas(nz='auto', ny=1, molecule_names=['CO2', 'CH4', 'H2O', 'O3'],
                  T_g=265.19, p_toa=0.1, n_nu_bands=n_nu_bands,
                  temp_change=0.5, delta_temp_change=0.1)
    scales = np.linspace(0.85, 1.15, n_ensemble)
    states, sc, T_gs, args = ensemble.real_gas_ensemble(gas, F_scales=scales)
    ft = jnp.asarray(1e-3, gas.dtype)
    run = lambda: ensemble.real_gas_evolve_ensemble(
        states, sc, T_gs, *args, ft, t_end=20.0, max_steps=5000)
    out = run()
    _sync(out)
    wall = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        _sync(out)
        wall = min(wall, time.perf_counter() - t0)
    fs, info = out
    # one batched pull (each separate sync is a ~25 ms tunnel round trip)
    t_np, steps_np, eqb_np, failed_np = jax.device_get(
        (fs.t, info.steps, info.equilibrium, info.failed))
    days = float(np.sum(t_np)) / 86400.0
    steps = int(np.sum(steps_np))
    return {'model_days_per_sec': days / wall, 'ensemble': n_ensemble,
            'nz': gas.nz, 'n_nu_bands': n_nu_bands, 'wall_s': wall,
            'total_steps': steps, 'member_steps_per_sec': steps / wall,
            'converged_fraction': float(np.mean(eqb_np)),
            'failed_fraction': float(np.mean(failed_np))}


def bench_real_gas_hires(nz=400, n_nu_bands=200, max_steps=500):
    """High-resolution earth column (nz=400 x 200 bands): the cached march
    streams the summed [L, nz, nz-1] march operator (~100 MB f32;
    real_gas_net_and_diff_cached) every step.  The opt-in bf16 cache
    (cache_dtype, row-differenced D_sum layout) quarters those bytes but no
    longer buys wall-clock at this size — the march is launch-bound
    (PERF.md) — so the pair is reported as a characterization, not a
    speedup claim.  Throughput-only: steps capped at max_steps / t_end
    (per-dtype counts reported; ms/step is the comparable number)."""
    from climatemodel_tpu.models.real_gas import RealGas, _real_gas_evolve
    from climatemodel_tpu.spectral import earth_tables
    earth_tables.ensure_earth_tables()
    gas = RealGas(nz=nz, ny=1, molecule_names=['CO2', 'CH4', 'H2O', 'O3'],
                  T_g=265.19, p_toa=0.1, n_nu_bands=n_nu_bands, temp_change=1,
                  delta_temp_change=0.1)
    args = (gas.state, jnp.asarray(gas.T_g, gas.dtype), gas.tau_device,
            gas.band_arrays, gas._F_star_factor,
            jnp.asarray(gas.nu_bands['delta'], gas.dtype),
            jnp.asarray(gas.p_interface, gas.dtype),
            jnp.asarray(gas.p[:, 0], gas.dtype),
            jnp.asarray(1e-3, gas.dtype))
    res = {'nz': nz, 'n_nu_bands': n_nu_bands}
    for key, cd in (('f32', None), ('bf16_cache', jnp.bfloat16)):
        out = _real_gas_evolve(*args, t_end=2.0, max_steps=max_steps,
                               cache_dtype=cd)
        _sync(out[0].T)
        wall = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            out = _real_gas_evolve(*args, t_end=2.0, max_steps=max_steps,
                                   cache_dtype=cd)
            _sync(out[0].T)
            wall = min(wall, time.perf_counter() - t0)
        steps = int(jax.device_get(out[1].steps))
        res[key] = {'steps_per_sec': steps / wall,
                    'ms_per_step': 1e3 * wall / steps, 'steps': steps}
    n_lw = int(gas.band_arrays.idx.shape[0])
    # the march streams ONE summed operator M_sum [n_lw, nz, nz-1]
    # (real_gas_net_and_diff_cached) — half the bytes of the per-direction
    # pair the diagnostics path uses
    b = n_lw * nz * (nz - 1) * 4
    res['f32']['min_traffic_gbs'] = b * res['f32']['steps_per_sec'] / 1e9
    res['bf16_speedup'] = (res['bf16_cache']['steps_per_sec']
                           / res['f32']['steps_per_sec'])
    return res


def _thermosphere_world(nz=150):
    # fixed nz (the 'auto' thermosphere grid is ~600 levels; the march
    # compiles/runs long enough to trip the axon execution watchdog).
    # The tau config comes from the CLI registry — ONE transcription of the
    # reference experiment block (radiation_script.py:32-36), shared with
    # tests/tools
    from climatemodel_tpu.cli import grey_world_kwargs
    from climatemodel_tpu.models.grey import GreyGas
    return GreyGas(nz=nz, ny=1, **grey_world_kwargs('thermosphere'))


def bench_grey_single_column(nz=150):
    """Single-column grey radiative march (BASELINE config #1 at one column):
    the workload is LAUNCH/exit-machinery-bound on TPU — the flux+controller
    device compute is ~0.03 ms/step while the adaptive march runs ~0.2 — so
    the chunked-exit cadence (check_every=8: exit statistics every 8th step,
    column.evolve_to_equilibrium) is reported alongside the per-step
    reference cadence.  Radiative delta_net_flux decays monotonically, so the
    sparse checks exit within a few steps of the per-step march (convective
    marches oscillate and are NOT run chunked).  The dip-memory variant
    (check_every=8, dip_memory=True) is the bit-exact chunking — per-step
    exit statistics with the while-loop cond/carry machinery amortised over
    the chunk — bounding how much of the chunked win is the skipped
    percentile vs the loop machinery."""
    out = {}
    for key, K, dip in (('per_step', 1, False), ('check_every_8', 8, False),
                        ('check_every_8_dip', 8, True)):
        kw = dict(flux_thresh=1e-3, save=False, check_every=K,
                  dip_memory=dip)
        _thermosphere_world(nz).evolve_to_equilibrium(**kw)     # compile
        wall = float('inf')
        # best-of-5: each march is only ~0.05-0.15 s, so a single tunnel
        # hiccup (~25 ms round trips dominate this config) flips the
        # per-step vs chunked comparison — more repeats, keep the min
        for _ in range(5):
            w = _thermosphere_world(nz)
            t0 = time.perf_counter()
            w.evolve_to_equilibrium(**kw)
            dt = time.perf_counter() - t0
            if dt < wall:
                wall = dt
                steps = int(w._equilibrium_info.steps)
                days = float(w.state.t) / 86400.0
        out[key] = {'model_days_per_sec': days / wall, 'steps': steps,
                    'wall_s': wall, 'ms_per_step': 1e3 * wall / steps}
    out['nz'] = nz
    return out


def bench_rce_conv():
    """Grey radiative-convective equilibrium (BASELINE config #2): the
    thermosphere world with convective adjustment inside the compiled march.

    conv_method='reference' is the faithful group-blend iteration — its
    operator matches the executed reference to 1e-8 and its marched
    equilibrium is certified as a fixed point of the reference's own
    adjustment operator (tests/test_reference_parity.py; the reference's own
    convective MARCH NaNs on this config, see CLAUDE.md) and, after the
    dtype-aware instability
    tolerance fix (ops/convection.py _instability_tol), runs at ~0.7 ms/step
    on v5e (it was ~300 ms/step before the fix).  The isotonic variational
    adjustment (Pallas kernel) is reported alongside: ~2.6x faster per step
    but its mixed-layer boundaries differ from the reference's fixed point
    (up to ~20 K at convective-layer edges on coarse grids — measured, CPU
    f64, thermosphere nz=60/150).  flux_thresh is tight so the march is long
    enough (~300 steps) to amortise the fixed dispatch latency — short
    marches measure the tunnel, not the step."""
    out = {}
    for key, method, chunk_kw in (
            ('reference', 'reference', {}),
            ('isotonic_variant', 'isotonic', {}),
            # forcing baked as compile-time constants: same physics per step
            # (probe-verified equal adjustment work), ~2.7x from XLA
            # scheduling the nested adjustment loops around literals; one
            # compile per forcing, so it measures the repeated-march regime
            ('baked_variant', 'reference', dict(bake_forcing=True)),
            # bit-exact chunked exit (dip_memory freezes the carry at the
            # first stop event): the convective march's delta oscillates so
            # plain check_every misses its exits, but the dip-memory chunk
            # keeps per-step statistics while amortising the while-loop
            # cond/carry machinery — same endpoint bits and step count as
            # the per-step reference row above it
            ('dip_memory_variant', 'reference',
             dict(check_every=8, dip_memory=True))):
        # t_end=30: trajectories that miss the early delta dip (the baked
        # CPU-like path) march ~8 simulated years to theirs — the default
        # 4-year cap returned a TIMED-OUT state whose days/s looked great
        # (caught by the r05 verify drive); every row must be a CONVERGED
        # march, pinned by the equilibrium field below
        kw = dict(flux_thresh=1e-3, save=False, convective_adjust=True,
                  conv_method=method, t_end=30.0, **chunk_kw)
        world = _thermosphere_world()
        world.evolve_to_equilibrium(**kw)         # compile + run
        # best-of-3 (r03 timed a single run; one tunnel hiccup inflated the
        # headline ms/step) — each trial is a fresh world so the march
        # always starts from the isothermal state
        wall = float('inf')
        for _ in range(3):
            world2 = _thermosphere_world()
            t0 = time.perf_counter()
            world2.evolve_to_equilibrium(**kw)
            dt = time.perf_counter() - t0
            if dt < wall:
                wall = dt
                days = float(world2.state.t) / 86400.0
                steps = int(world2._equilibrium_info.steps)
        res = {'model_days_per_sec': days / wall, 'steps': steps,
               'wall_s': wall, 'steps_per_sec': steps / wall,
               'ms_per_step': 1e3 * wall / steps,
               'equilibrium': bool(world2._equilibrium_info.equilibrium)}
        if key == 'reference':
            out.update(res, nz=world2.nz, conv_method='reference')
            T_ref_endpoint = np.asarray(world2.T, np.float64)
        else:
            if key == 'dip_memory_variant':
                res['endpoint_bit_equal'] = bool(
                    (np.asarray(world2.T, np.float64)
                     == T_ref_endpoint).all())
            elif key == 'baked_variant':
                # baked trajectories differ at the f32-bit level (host-folded
                # exp); record the equilibrium agreement explicitly
                res['endpoint_max_dT_vs_reference_K'] = float(np.max(np.abs(
                    np.asarray(world2.T, np.float64) - T_ref_endpoint)))
            out[key] = res

    # (r05) the Pallas-kernel executor row ('kernel_variant') was removed
    # with the kernel's retirement: compiled Mosaic output diverged 0.545 K
    # from its own XLA core on chip, and running the suspect kernel mid-bench
    # poisoned subsequent rows (r04 judge's ensemble-row fault).  PERF.md
    # records the negative result.
    return out


def bench_rce_conv_ensemble(n_ensemble=512):
    """Vmapped convective-RCE ensemble: n independent thermosphere columns
    (varying stellar constants) marched to radiative-convective equilibrium in
    one compiled program — the TPU-native way to run convective RCE at scale.

    conv_method='reference' (the default) both carries the parity bound and
    WINS on time-to-solution here: measured on v5e it converges 512/512
    members in ~0.45 s wall vs the isotonic kernel's 79% in ~2.3 s (isotonic
    fixed points keep re-triggering marginal adjustments against the
    delta-percentile exit).  model_days_per_sec counts each member's model
    time until ITS convergence, so the faithful method's lower number is a
    feature — members stop marching sooner."""
    from climatemodel_tpu.models import ensemble
    world = _thermosphere_world()
    F = np.linspace(1200.0, 1500.0, n_ensemble)
    states, forcings, p_int, p_c = ensemble.grey_ensemble(world, F)
    ft = jnp.asarray(1e-1, world.dtype)
    out = {}
    for key, method, chunk_kw in (
            ('reference', 'reference', {}),
            ('isotonic_variant', 'isotonic', {}),
            # bit-exact chunked exit — member-by-member identical endpoints
            # and convergence flags (plain check_every regressed the
            # converged fraction here, PERF.md), cond/carry amortised
            ('dip_memory_variant', 'reference',
             dict(check_every=4, dip_memory=True))):
        run = lambda: ensemble.grey_evolve_ensemble(
            states, forcings, p_int, p_c, ft, convective_adjust=True,
            max_steps=3000, conv_method=method, **chunk_kw)
        res = run()
        _sync(res)
        wall = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            res = run()
            _sync(res)
            wall = min(wall, time.perf_counter() - t0)
        fs, info = res
        t_np, steps_np, eqb_np = jax.device_get(
            (fs.t, info.steps, info.equilibrium))
        days = float(np.sum(t_np)) / 86400.0
        r = {'model_days_per_sec': days / wall, 'wall_s': wall,
             'total_steps': int(np.sum(steps_np)),
             'converged_fraction': float(np.mean(eqb_np))}
        if key == 'reference':
            out.update(r, ensemble=n_ensemble, nz=world.nz,
                       conv_method='reference')
            steps_ref = steps_np
        else:
            if key == 'dip_memory_variant':
                r['steps_bit_equal'] = bool((steps_np == steps_ref).all())
            out[key] = r
    return out


def _icy_ebm(ny, nz):
    from climatemodel_tpu.constants import p_surface_earth
    from climatemodel_tpu.models.grey import GreyGas
    return GreyGas(nz=nz, ny=ny, tau_lw_func='scale_height',
                   tau_lw_func_args=[0.22 * p_surface_earth, 4.0],
                   albedo=lambda lat: np.where(np.abs(lat) > 60, 0.6, 0.3))


def bench_ebm(ny=64, nz=40):
    world = _icy_ebm(ny, nz)
    world.evolve_to_equilibrium(flux_thresh=1e-3, save=False)  # compile+run
    wall = float('inf')
    for _ in range(3):                      # best-of-3, fresh world per trial
        world2 = _icy_ebm(ny, nz)
        t0 = time.perf_counter()
        world2.evolve_to_equilibrium(flux_thresh=1e-3, save=False)
        wall = min(wall, time.perf_counter() - t0)
    days = float(world2.state.t) / 86400.0
    shared = {'model_days_per_sec': days / wall, 'ny': ny,
              'steps': int(world2._equilibrium_info.steps), 'wall_s': wall}

    # per-latitude independent-dt ensemble march (models/ensemble.py:65): each
    # latitude gets its own adaptive-dt controller instead of the reference's
    # shared dt that drags every column to the slowest one
    from climatemodel_tpu.models import ensemble
    world3 = _icy_ebm(ny, nz)
    states, forcings, p_int, p_c = ensemble.grey_latitude_ensemble(world3)
    ft = jnp.asarray(1e-3, world3.dtype)
    # default (delta-aware) exit, matching the shared-dt world above: in
    # strict flux-balance mode frozen-level fluxes never vanish and every
    # member reports timed_out even with a fully static temperature field
    run = lambda: ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                                ft)
    out = run()
    _sync(out)
    wall_e = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        _sync(out)
        wall_e = min(wall_e, time.perf_counter() - t0)
    fs, info = out
    t_np, steps_np, eqb_np = jax.device_get(
        (fs.t, info.steps, info.equilibrium))
    days_e = float(np.sum(t_np)) / 86400.0
    shared['independent_dt_ensemble'] = {
        'model_days_per_sec': days_e / wall_e, 'wall_s': wall_e,
        'total_steps': int(np.sum(steps_np)),
        'converged_fraction_f32': float(np.mean(eqb_np))}
    # the same f32 noise-floor tail as the grey ensemble (~2/64 latitudes):
    # finish the blocked members in f64 by the unchanged criterion (guarded
    # like bench_grey's: an optional pass must not cost the row its numbers)
    try:
        fs_r, info_r, finished = ensemble.grey_finish_unconverged_f64(
            fs, info, forcings, p_int, p_c, ft)
        _sync(fs_r)
        shared['independent_dt_ensemble']['f64_finished_members'] = \
            int(len(finished))
        shared['independent_dt_ensemble']['converged_fraction'] = float(
            np.mean(jax.device_get(info_r.equilibrium)))
    except Exception as e:
        shared['independent_dt_ensemble']['f64_finish_error'] = \
            f'{type(e).__name__}: {e}'[:200]
        shared['independent_dt_ensemble']['converged_fraction'] = \
            shared['independent_dt_ensemble']['converged_fraction_f32']
    return shared


def bench_weak_scaling_cpu(base=8):
    """Sharded shallow-water weak scaling on the virtual CPU mesh: fixed
    per-device tile, 1/2/4/8 devices (the only multi-chip evidence this
    single-chip environment allows; ICI behavior must wait for real hardware).
    Runs in a subprocess so the TPU-attached parent keeps its backend."""
    import json as _json
    import subprocess
    import sys
    code = r'''
import json, time
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from climatemodel_tpu.models.shallow_water import ShallowWater
from climatemodel_tpu.parallel.halo import ShardedShallowWater
out = {}
for n in (1, 2, 4, 8):
    nx = 32 * n + 2
    world = ShallowWater(nx=nx, ny=130, dx=100e3, dy=100e3, dt=60.0,
                         f_0=1e-4, beta=1.6e-11,
                         initial_info={'type': 'height_gaussian',
                                       'min_h_surface': 9750.0,
                                       'max_h_surface': 10750.0,
                                       'x0': 0.0, 'y0': 0.0,
                                       'x_std': 1000e3, 'y_std': 1000e3,
                                       'add_noise': False})
    mesh = Mesh(np.asarray(jax.devices()[:n]), ('x',))
    sw = ShardedShallowWater(world, mesh, axis_name='x')
    sw.run(nt=50)                      # compile + run
    t0 = time.perf_counter()
    sw.run(nt=50)
    wall = time.perf_counter() - t0
    cells = (nx - 2) * 128
    out[str(n)] = {'cell_updates_per_sec': cells * 50 / wall,
                   'wall_s': wall, 'grid': [nx, 130]}
print(json.dumps(out))
'''
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    flag = f'--xla_force_host_platform_device_count={base}'
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') + ' ' + flag).strip()
    try:
        proc = subprocess.run([sys.executable, '-c', code], env=env,
                              capture_output=True, text=True, timeout=420,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        line = proc.stdout.strip().splitlines()[-1]
        return _json.loads(line)
    except Exception as e:          # never fail the whole bench on this extra
        return {'error': str(e)[:200]}


def bench_weak_scaling_2d_cpu(base=8):
    """2-D spatial decomposition weak scaling (ShardedShallowWater2D): fixed
    per-device tile over 1x1 / 2x1 / 2x2 / 4x2 meshes on the virtual CPU
    mesh.  Two tile sizes: 32x32 (the halo-dominated toy regime — kept for
    continuity with r02/r03 numbers) and 256x256 (realistic production tile:
    the surface/volume ratio is 8x smaller, so halo_overhead_pct here is what
    actual scaling headroom looks like).  halo_overhead_pct compares each
    run's per-cell rate against the same-tile 1-device run — the fraction of
    step time the two ppermute halo rings (x and y) cost at that count."""
    import json as _json
    import subprocess
    import sys
    code = r'''
import json, time
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from climatemodel_tpu.models.shallow_water import ShallowWater
from climatemodel_tpu.parallel.halo import ShardedShallowWater2D
out = {}
for tile in (32, 256):
    res = {}
    rate_1dev = None
    nt = 50 if tile == 32 else 20
    for mx, my in ((1, 1), (2, 1), (2, 2), (4, 2)):
        n = mx * my
        nx, ny = tile * mx + 2, tile * my + 2
        world = ShallowWater(nx=nx, ny=ny, dx=100e3, dy=100e3, dt=60.0,
                             f_0=1e-4, beta=1.6e-11,
                             initial_info={'type': 'height_gaussian',
                                           'min_h_surface': 9750.0,
                                           'max_h_surface': 10750.0,
                                           'x0': 0.0, 'y0': 0.0,
                                           'x_std': 1000e3, 'y_std': 1000e3,
                                           'add_noise': False})
        mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(mx, my), ('x', 'y'))
        sw = ShardedShallowWater2D(world, mesh)
        sw.run(nt=nt)                      # compile + run
        wall = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            sw.run(nt=nt)
            wall = min(wall, time.perf_counter() - t0)
        cells = (nx - 2) * (ny - 2)
        rate = cells * nt / wall
        per_dev = rate / n
        if rate_1dev is None:
            rate_1dev = per_dev
        res[str(n)] = {'mesh': [mx, my], 'grid': [nx, ny], 'wall_s': wall,
                       'cell_updates_per_sec': rate,
                       'halo_overhead_pct': round(
                           max(0.0, 100.0 * (1 - per_dev / rate_1dev)), 1)}
    out['tile_%d' % tile] = res
print(json.dumps(out))
'''
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    flag = f'--xla_force_host_platform_device_count={base}'
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') + ' ' + flag).strip()
    try:
        proc = subprocess.run([sys.executable, '-c', code], env=env,
                              capture_output=True, text=True, timeout=600,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        line = proc.stdout.strip().splitlines()[-1]
        return _json.loads(line)
    except Exception as e:          # never fail the whole bench on this extra
        return {'error': str(e)[:200]}


_V5E_HBM_GBS = 819.0    # v5e peak HBM bandwidth (public spec), for rooflines


def _probe_backend(timeout=150):
    """Bounded-subprocess backend probe (never init a possibly-wedged tunnel
    in-process); shared logic in utils/platform.probe_backend.  Returns
    (info_dict, None) or (None, error_str); override seconds via
    CLIMATEMODEL_TPU_BENCH_PROBE_S."""
    from climatemodel_tpu.utils.platform import probe_backend
    return probe_backend(timeout)


def _smoke_configs():
    """Tiny-config bench list for the CPU-fallback / smoke path: proves the
    whole pipeline end-to-end in minutes without pretending the numbers are
    the record (the JSON carries smoke=true + backend_error).
    CLIMATEMODEL_TPU_BENCH_TINY=1 cuts it to one sub-minute config — used by
    tests/test_bench_entry.py to pin the wedged-backend fallback."""
    if os.environ.get('CLIMATEMODEL_TPU_BENCH_TINY'):
        return (
            ('grey_rce_single_column', lambda: bench_grey_single_column(nz=40)),
        )
    return (
        ('grey_rce', lambda: bench_grey(n_ensemble=64, nz=40, max_steps=600)),
        ('shallow_water', lambda: bench_sw(nx=258, ny=130, nt=50,
                                           solver='richtmyer')),
        ('grey_rce_single_column', lambda: bench_grey_single_column(nz=60)),
    )


def _full_configs():
    return (
        ('grey_rce', bench_grey),
        ('shallow_water', bench_sw),
        ('real_gas', bench_real_gas),
        ('grey_rce_single_column', bench_grey_single_column),
        ('real_gas_earth', bench_real_gas_earth),
        ('real_gas_earth_ensemble', bench_real_gas_earth_ensemble),
        ('real_gas_hires', bench_real_gas_hires),
        ('rce_convective', bench_rce_conv),
        ('rce_convective_ensemble', bench_rce_conv_ensemble),
        ('ebm_ice_albedo', bench_ebm),
        ('sw_weak_scaling_cpu_mesh', bench_weak_scaling_cpu),
        ('sw_weak_scaling_2d', bench_weak_scaling_2d_cpu),
    )


def _main_inner():
    # concurrent-load guard: a pytest storm or stray TPU client on this host
    # skews wall-clock timings (BENCH_LOCAL_r03's single-column rows were
    # polluted exactly this way) — stamp the record so a polluted run is
    # distinguishable from a clean one
    ncpu = os.cpu_count() or 1
    try:
        load_start = os.getloadavg()[0]
    except OSError:                                 # pragma: no cover
        load_start = None

    info, backend_error = _probe_backend()
    if backend_error is not None:
        # fall back to a clearly-annotated CPU smoke run: valid JSON beats a
        # traceback when the tunnel is down
        jax.config.update('jax_platforms', 'cpu')
    smoke = backend_error is not None or bool(
        os.environ.get('CLIMATEMODEL_TPU_BENCH_SMOKE'))

    extra = {'platform': jax.devices()[0].platform,
             'n_devices': len(jax.devices()),
             'device': str(jax.devices()[0]),
             'dtype': str(jnp.zeros(0).dtype)}
    if backend_error is not None:
        extra['backend_error'] = backend_error
    if smoke:
        extra['smoke'] = True
    if load_start is not None:
        extra['loadavg_start'] = round(load_start, 2)
        extra['n_cpus'] = ncpu
        if load_start > 0.25 * ncpu:
            extra['host_load_warning'] = (
                f'1-min loadavg {load_start:.1f} on {ncpu} CPUs at bench '
                'start — another heavy process is likely running; timings '
                'may be polluted')

    # every config is guarded so one broken config can't zero out the whole
    # record; config_wall_s records each config's total wall INCLUDING
    # compiles, so future rounds can see where bench time goes
    walls = {}
    only = [a.split('=', 1)[1] for a in sys.argv[1:]
            if a.startswith('--only=')]
    configs = _smoke_configs() if smoke else _full_configs()
    if only:
        # quick partial re-runs (e.g. right after the tunnel recovers):
        # python bench.py --only=grey_rce --only=rce_convective
        configs = [(k, f) for k, f in configs
                   if any(sub in k for sub in only)]
        extra['only'] = only
    for key, fn in configs:
        t0 = time.perf_counter()
        try:
            extra[key] = fn()
        except Exception as e:      # record, keep benching
            extra[key] = {'error': f'{type(e).__name__}: {e}'[:300]}
        walls[key] = round(time.perf_counter() - t0, 1)
    extra['config_wall_s'] = walls
    try:
        extra['loadavg_end'] = round(os.getloadavg()[0], 2)
    except OSError:                                 # pragma: no cover
        pass

    platform = extra['platform']
    # roofline: minimum HBM traffic of the SW step is 3 reads + 3 writes of
    # the interior field set (plus the damping field read in the fused
    # kernel); report the fraction of peak bandwidth that traffic implies so
    # future rounds can see headroom, not just absolute numbers
    sw = extra.get('shallow_water', {})
    if 'error' not in sw and sw:
        nxi = sw['grid'][0] - 2
        nyi = sw['grid'][1] - 2
        bytes_per_step = 6 * nxi * nyi * 4
        sw['min_traffic_gbs'] = (bytes_per_step
                                 / (sw['wall_s'] / sw['steps']) / 1e9)
        sw['roofline_fraction_min_traffic'] = \
            sw['min_traffic_gbs'] / _V5E_HBM_GBS if platform != 'cpu' else None

    # real-gas earth roofline: the cached march streams ONE summed
    # [n_lw_bands, nz, nz-1] f32 march operator per step
    # (real_gas_net_and_diff_cached) — same count as the hires bench so the
    # two metrics are comparable
    rge = extra.get('real_gas_earth', {})
    if rge and 'error' not in rge:
        b = rge['n_lw_bands'] * rge['nz'] * (rge['nz'] - 1) * 4
        rge['min_traffic_gbs'] = b * rge['steps_per_sec'] / 1e9
        rge['roofline_fraction_min_traffic'] = \
            rge['min_traffic_gbs'] / _V5E_HBM_GBS if platform != 'cpu' else None

    # grey ensemble roofline: ~8 member-column-sized arrays touched per
    # adaptive step (T r/w, scan coefficients, up/down fluxes, net flux,
    # controller state) — a deliberately rough lower bound
    g = extra.get('grey_rce', {})
    if g and 'error' not in g:
        gb = 8 * g['nz'] * 4 * g['total_steps'] / g['wall_s'] / 1e9
        g['min_traffic_gbs'] = gb
        g['roofline_fraction_min_traffic'] = \
            gb / _V5E_HBM_GBS if platform != 'cpu' else None

    grey_days = g.get('model_days_per_sec', 0.0)
    sw_cups = sw.get('cell_updates_per_sec', 0.0)
    extra['north_star_ratio'] = {'grey': grey_days / 1e4, 'sw': sw_cups / 1e9}

    # The FULL record goes to a repo-local file; stdout gets a COMPACT line.
    # The driver captures only the tail of stdout (~2k chars): BENCH_r04's
    # full-extra line was tail-truncated and recorded as parsed=null — the
    # one line the driver parses must stay small, the detail lives in the
    # file (r04 verdict item 9).
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             'BENCH_FULL.json')
    compact_extra = {k: extra[k] for k in
                     ('platform', 'n_devices', 'smoke', 'backend_error',
                      'only', 'host_load_warning', 'loadavg_start',
                      'loadavg_end', 'north_star_ratio', 'config_wall_s')
                     if k in extra}
    # one headline number per major config so the compact line is readable
    # on its own
    for key, field in (('shallow_water', 'cell_updates_per_sec'),
                       ('rce_convective', 'model_days_per_sec'),
                       ('grey_rce_single_column', None),
                       ('rce_convective_ensemble', 'model_days_per_sec'),
                       ('ebm_ice_albedo', 'model_days_per_sec'),
                       ('real_gas_earth', 'steps_per_sec')):
        row = extra.get(key)
        if not isinstance(row, dict):
            continue
        if 'error' in row:
            compact_extra[key] = {'error': row['error'][:120]}
        elif key == 'grey_rce_single_column':
            ps = row.get('per_step', {})
            if 'model_days_per_sec' in ps:
                compact_extra[key] = round(ps['model_days_per_sec'], 1)
        elif field in row:
            compact_extra[key] = round(row[field], 1)
    result = {
        'metric': 'grey_rce_model_days_per_sec',
        'value': grey_days,
        'unit': 'model-days/s',
        'vs_baseline': grey_days / 1e4,
        'extra': extra,
    }
    try:
        with open(full_path, 'w') as f:
            json.dump(result, f, indent=1)
        compact_extra['full_record'] = os.path.basename(full_path)
    except OSError as e:            # read-only checkout: keep the line small
        compact_extra['full_record_error'] = str(e)[:120]
    print(json.dumps(dict(result, extra=compact_extra)))


def main():
    """Always emits ONE parseable JSON line and exits 0 — a wedged backend or
    a crashed config produces an annotated record, never a bare traceback
    (BENCH_r03 was rc=1 with no record; the driver needs the JSON)."""
    try:
        _main_inner()
    except Exception as e:
        import traceback
        print(json.dumps({
            'metric': 'grey_rce_model_days_per_sec', 'value': 0.0,
            'unit': 'model-days/s', 'vs_baseline': 0.0,
            'extra': {'error': f'{type(e).__name__}: {e}'[:500],
                      'traceback': traceback.format_exc()[-1500:]}}))


if __name__ == '__main__':
    main()
