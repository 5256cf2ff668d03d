"""Ensemble (batched) column marches: vmap/pjit over independent columns.

The reference marches one world at a time in a Python loop; parameter sweeps
(ice-albedo, GHG ladders) and throughput benchmarks instead batch thousands of
independent columns as a leading vmap axis over the whole compiled
march-to-equilibrium (SURVEY.md section 2, "Data parallel / ensemble parallel").
Under vmap, the ``lax.while_loop`` runs lock-step until every member converges,
with already-converged members frozen — each member keeps its own adaptive dt,
RemoveInd mask and simulated time.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import column
from .grey import GreyForcing, GreyGas, grey_net_flux
from .column import ColumnState


def broadcast_state(state: ColumnState, n: int) -> ColumnState:
    """Tile a single-column state along a new leading ensemble axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), state)


def grey_ensemble_forcing(world: GreyGas, F_stellar_values) -> GreyForcing:
    """Batched forcing varying the stellar constant across members."""
    n = len(F_stellar_values)
    base = world.forcing
    tile = lambda x: jnp.broadcast_to(x, (n,) + x.shape)
    return GreyForcing(
        dtau=tile(base.dtau), tau_sw_interface=tile(base.tau_sw_interface),
        albedo_mod=tile(base.albedo_mod),
        solar_latitude_factor=tile(base.solar_latitude_factor),
        F_stellar=jnp.asarray(F_stellar_values, base.F_stellar.dtype))


@functools.partial(jax.jit, static_argnames=('convective_adjust', 'max_steps',
                                             'net_flux_percentile',
                                             'use_delta_exit', 'conv_method',
                                             'check_every', 'dip_memory',
                                             'fused_stats'))
def grey_evolve_ensemble(states: ColumnState, forcings: GreyForcing,
                         p_interface, p_centre_col, flux_thresh,
                         convective_adjust=False, t_end=4.0, conv_thresh=1e-5,
                         conv_t_multiplier=5.0, net_flux_thresh=1e-7,
                         net_flux_percentile=95, max_steps=500_000,
                         use_delta_exit=True, conv_method='reference',
                         check_every=1, dip_memory=False, fused_stats=True):
    """vmapped march-to-equilibrium over a leading ensemble axis of
    (states, forcings); the pressure grid is shared.

    The default adjustment is the faithful group-blend iteration: it carries
    the <0.1 K reference-equilibrium parity bound AND, measured on v5e at
    512 members x nz=150, it converges 100% of members in 0.45 s wall vs the
    isotonic kernel's 79% in 2.3 s — the isotonic fixed points sit less well
    with the delta-percentile exit, so members keep re-triggering marginal
    adjustments.  Under vmap the faithful method's data-dependent while_loops
    run lock-step at the slowest member's trip count, but after the
    dtype-aware instability tolerance (ops/convection.py _instability_tol)
    typical trip counts are 1-3 sweeps.  conv_method='isotonic' remains the
    fully parallel variational alternative (Pallas lane-batched kernel).

    ``fused_stats=True`` (default) computes the net flux AND the per-member
    exit statistics (delta-percentile order statistics, max|net|) in ONE
    fused Pallas pass per step (ops/two_stream.grey_net_with_stats) instead
    of the flux kernel + separate XLA fusions/top_k — bit-identical by
    construction; the T-independent sw fluxes and TOA boundary hoist out of
    the loop (same expressions on the same inputs).  Verified on the real
    v5e at the 4096-member bench config: endpoint/steps/flags BIT-EQUAL to
    the split path and 1.11x end-to-end (9.72e6 model-days/s,
    tools/verify_fused_stats_onchip.py)."""
    from ..ops.two_stream import grey_net_with_stats, sw_flux

    def one(state, forcing):
        net_fn = lambda T: grey_net_flux(T, forcing)
        stats_fn = None
        if fused_stats:
            up_toa = (1.0 - forcing.albedo_mod) * \
                forcing.solar_latitude_factor * forcing.F_stellar / 4.0
            up_sw, down_sw = sw_flux(forcing.tau_sw_interface,
                                     forcing.albedo_mod,
                                     forcing.solar_latitude_factor,
                                     forcing.F_stellar)
            stats_fn = lambda T, prev: grey_net_with_stats(
                T, forcing.dtau, up_toa, up_sw, down_sw, prev,
                pct=net_flux_percentile)
        return column.evolve_to_equilibrium(
            state, net_fn, p_interface, p_centre_col, flux_thresh=flux_thresh,
            convective_adjust=convective_adjust, t_end=t_end,
            conv_thresh=conv_thresh, conv_t_multiplier=conv_t_multiplier,
            net_flux_thresh=net_flux_thresh,
            net_flux_percentile=net_flux_percentile, max_steps=max_steps,
            use_delta_exit=use_delta_exit, conv_method=conv_method,
            check_every=check_every, dip_memory=dip_memory,
            net_stats_fn=stats_fn)
    return jax.vmap(one)(states, forcings)


def grey_evolve_ensemble_robust(states: ColumnState, forcings: GreyForcing,
                                p_interface, p_centre_col, flux_thresh,
                                finish_repeats: int = 8,
                                finish_max_steps: int = 1_000, **march_kw):
    """Ensemble march plus an f64 finishing pass for precision-blocked members.

    A small tail of reduced-precision members (~2/4096 at f32, high
    insolation) can never satisfy the reference's delta-percentile exit
    (base.py:248-264): the 95th-percentile flux-change statistic has an f32
    noise floor of ~3-5e-3 W/m^2 — rounding of the lw recurrence amplified by
    e^tau_surface across the column — which sits above the 1e-3 threshold, so
    the member marches to the t_end cap (timed_out) even though the same
    member converges cleanly in f64 (measured: F=1579.7, nz=60 — f64 exits
    via the delta criterion at 599 steps).  This wrapper re-marches ONLY the
    unconverged members in float64 (fresh-call restart semantics, like the
    reference experiments that call evolve_to_equilibrium repeatedly),
    repeating up to ``finish_repeats`` fresh calls, then scatters the
    finished states back in the ensemble dtype.  The exit criterion itself is
    never loosened — the tail members converge by the reference's own rule in
    the reference's own precision.

    :return: (final states, info, finished) where ``finished`` is the int
        array of member indices completed by the f64 pass (empty when the
        plain march converges everything or the ensemble is already f64).
    """
    fs, info = grey_evolve_ensemble(states, forcings, p_interface,
                                    p_centre_col, flux_thresh, **march_kw)
    return grey_finish_unconverged_f64(
        fs, info, forcings, p_interface, p_centre_col, flux_thresh,
        finish_repeats=finish_repeats, finish_max_steps=finish_max_steps,
        **march_kw)


def grey_finish_unconverged_f64(fs: ColumnState, info, forcings: GreyForcing,
                                p_interface, p_centre_col, flux_thresh,
                                finish_repeats: int = 8,
                                finish_max_steps: int = 1_000, **march_kw):
    """The f64 finishing pass of :func:`grey_evolve_ensemble_robust`, applied
    to an already-marched ensemble (fs, info) — callers that keep the plain
    march's result avoid re-running it.

    ``finish_max_steps`` bounds ONE device execution (f64 on TPU is
    emulated/slow, and the axon worker kills single executions running
    longer than ~1-2 min — CLAUDE.md); the repeat loop continues a march
    that ran out of steps from its final state, so the effective budget is
    ``finish_repeats * finish_max_steps`` steps in watchdog-safe chunks
    (typical blocked members converge in ~250-600 steps)."""
    eqb, failed, nan = jax.device_get((info.equilibrium, info.failed,
                                       info.nan))
    # only timed-out members are finishing candidates: failed/nan are real
    # aborts the caller must see
    cand = ~np.asarray(eqb) & ~np.asarray(failed) & ~np.asarray(nan)
    if not cand.any() or fs.T.dtype == jnp.float64:
        return fs, info, np.zeros((0,), np.int64)
    bad = np.where(cand)[0]
    n = cand.shape[0]

    sub = lambda x: np.asarray(x)[bad] if (np.ndim(x) and
                                           np.shape(x)[0] == n) else \
        np.asarray(x)
    # ONE batched pull for everything host-side (each separate device_get is
    # a ~25 ms tunnel round trip — CLAUDE.md)
    fs_host, info_host, fo_host, p_i_host, p_c_host, ft_host = \
        jax.device_get((fs, info, forcings, p_interface, p_centre_col,
                        flux_thresh))
    fin = jax.tree_util.tree_map(sub, fs_host)
    fo = jax.tree_util.tree_map(sub, fo_host)
    t_base = np.asarray(fin.t, np.float64)
    steps_extra = np.zeros(len(bad), np.int64)
    kw64 = dict(march_kw)
    kw64['max_steps'] = int(finish_max_steps)
    with jax.enable_x64():
        up = lambda x: jnp.asarray(np.asarray(x, np.float64)
                                   if np.asarray(x).dtype.kind == 'f'
                                   else np.asarray(x))
        st64 = jax.tree_util.tree_map(up, fin)
        fo64 = jax.tree_util.tree_map(up, fo)
        p_i64 = jnp.asarray(np.asarray(p_i_host, np.float64))
        p_c64 = jnp.asarray(np.asarray(p_c_host, np.float64))
        ft64 = jnp.asarray(float(ft_host), jnp.float64)
        # repeats run lock-step over ALL bad members (vmap can't drop rows),
        # so a member that converges in an earlier repeat is FROZEN: its
        # snapshot is kept and later marches of it are ignored (a fresh call
        # from a converged state would re-tighten ft at i==1 and could both
        # drift the endpoint and flip its equilibrium flag back off)
        done = np.zeros(len(bad), bool)
        fin64 = info64 = None

        def merge(best, new):
            if best is None:
                return new
            return jax.tree_util.tree_map(
                lambda b, nw: np.where(
                    done.reshape((-1,) + (1,) * (np.ndim(nw) - 1)), b, nw),
                best, new)

        for _ in range(int(finish_repeats)):
            # fresh-call restart (base.py:301-306): t=0, forced first step
            st64 = st64.replace(t=jnp.zeros_like(st64.t))
            st64, step_info = grey_evolve_ensemble(st64, fo64, p_i64, p_c64,
                                                   ft64, **kw64)
            # ONE batched pull per repeat (CLAUDE.md: every device->host
            # sync is a ~25 ms tunnel round trip)
            st_np, info_np = jax.device_get((st64, step_info))
            steps_extra += np.where(done, 0,
                                    np.asarray(info_np.steps, np.int64))
            t_base += np.where(done, 0.0, np.asarray(st_np.t, np.float64))
            fin64 = merge(fin64, st_np)
            info64 = merge(info64, info_np)
            done |= np.asarray(info_np.equilibrium)
            if done.all():
                break

    def scatter(full_host, part):
        full_np = np.array(full_host)           # host copy, no device pull
        full_np[bad] = np.asarray(part, full_np.dtype)
        return jnp.asarray(full_np)
    fs_out = jax.tree_util.tree_map(scatter, fs_host, fin64)
    # total simulated time = the f32 march's plus every finishing call's
    fs_out = fs_out.replace(t=scatter(fs_host.t, t_base))
    info_out = column.EquilibriumInfo(
        steps=scatter(info_host.steps,
                      np.asarray(info_host.steps)[bad] + steps_extra),
        delta_net_flux=scatter(info_host.delta_net_flux,
                               info64.delta_net_flux),
        flux_thresh=info.flux_thresh,
        failed=scatter(info_host.failed, info64.failed),
        equilibrium=scatter(info_host.equilibrium, info64.equilibrium),
        nan=scatter(info_host.nan, info64.nan),
        timed_out=scatter(info_host.timed_out,
                          np.asarray(info64.timed_out)
                          & ~np.asarray(info64.equilibrium)))
    return fs_out, info_out, bad


def grey_latitude_ensemble(world: GreyGas):
    """Split a ny>1 latitude-grid world into ny independent single-column
    members, each with its own adaptive-dt controller.

    The reference shares one dt across all latitudes (base.py:197-246), which
    drags convergence to the slowest column; latitudes never couple in this
    model, so marching them as a vmapped ensemble is a pure improvement
    (framework extra — opt-in, not used by the parity paths).

    :return: (states, forcings, p_interface [nz,1], p_centre [nz-1]) with a
        leading ny axis; reassemble with ``states.T[:, :, 0].T``.
    """
    ny = world.ny
    base = world.forcing
    def col(x):
        return jnp.moveaxis(x, -1, 0)[:, ..., None]      # [ny, ..., 1]
    forcings = GreyForcing(
        dtau=col(base.dtau), tau_sw_interface=col(base.tau_sw_interface),
        albedo_mod=base.albedo_mod[:, None],
        solar_latitude_factor=base.solar_latitude_factor[:, None],
        F_stellar=jnp.broadcast_to(base.F_stellar, (ny,)))
    st = world.state
    states = ColumnState(
        T=jnp.moveaxis(st.T, 1, 0)[:, :, None],
        net_flux=jnp.moveaxis(st.net_flux, 1, 0)[:, :, None],
        t=jnp.broadcast_to(st.t, (ny,)),
        tsi=jax.tree_util.tree_map(
            lambda x: (jnp.broadcast_to(x, (ny,) + x.shape)
                       if x.ndim == 0 else
                       x.reshape(world.nz - 1, ny).T), st.tsi))
    p_int = jnp.asarray(world.p_interface[:, :1], world.dtype)
    p_c = jnp.asarray(world.p[:, 0], world.dtype)
    return states, forcings, p_int, p_c


@functools.partial(jax.jit, static_argnames=('convective_adjust',
                                             'use_delta_exit', 'conv_method',
                                             'max_steps', 'stacked_tau',
                                             'cache_dtype', 'check_every',
                                             'dip_memory'))
def real_gas_evolve_ensemble(states: ColumnState, F_scales, T_gs,
                             tau_interface, ba, F_star_factor, delta,
                             p_interface, p_centre_col, flux_thresh,
                             convective_adjust=False, t_end=4.0,
                             conv_thresh=1e-5, conv_t_multiplier=5.0,
                             max_steps=500_000, use_delta_exit=True,
                             conv_method='reference', stacked_tau=False,
                             cache_dtype=None, check_every=1,
                             dip_memory=False):
    """vmapped real-gas march over a leading ensemble axis.

    With ``stacked_tau=False`` members share one composition: the
    tau-dependent TransmissionCache is precomputed ONCE outside the vmap, so
    the per-step flux — a GEMV against the [L, nz, nz-1] operators for a
    single column — becomes a batched GEMM with the member axis as the second
    matmul dimension (MXU work instead of HBM-bound matrix streaming).  Per
    member: insolation scale ``F_scales`` and ground temperature ``T_gs``
    (the stellar-sweep / arctic-amplification workloads,
    centa_presentation/script.py:40-74).

    With ``stacked_tau=True``, ``tau_interface`` carries a leading member
    axis — one composition per member, each with its own cache (memory
    ~ n * L * nz^2 floats) — the GHG-ladder workload the reference runs as a
    sequential Python loop of full marches (real_gas_script.py:27-40).
    """
    from .real_gas import (precompute_transmission,
                           real_gas_net_and_diff_cached)

    shared_cache = None if stacked_tau else \
        precompute_transmission(tau_interface, ba, cache_dtype)

    def one(state, scale, T_g, tau_i):
        cache = precompute_transmission(tau_i, ba, cache_dtype) \
            if stacked_tau else shared_cache
        def net_fn(T):
            return real_gas_net_and_diff_cached(T[:, 0], T_g, cache, ba,
                                                F_star_factor * scale, delta)
        return column.evolve_to_equilibrium(
            state, net_fn, p_interface, p_centre_col, flux_thresh=flux_thresh,
            convective_adjust=convective_adjust, t_end=t_end,
            conv_thresh=conv_thresh, conv_t_multiplier=conv_t_multiplier,
            max_steps=max_steps, p_descending=False,
            use_delta_exit=use_delta_exit, conv_method=conv_method,
            check_every=check_every, dip_memory=dip_memory)
    tau_axis = 0 if stacked_tau else None
    return jax.vmap(one, in_axes=(0, 0, 0, tau_axis))(
        states, F_scales, T_gs, tau_interface)


def real_gas_ensemble(gas, F_scales=None, T_g_values=None):
    """Batched (states, scales, T_gs, march args) from a template RealGas.

    Each member starts from its own isothermal T_g profile with a FRESH march
    state — t = 0 and a re-initialised adaptive-dt controller (the reference's
    per-world initialisation, real_gas.py:296-299) — even when the template
    has already been marched: a converged template's shrunk delta_t would
    otherwise restart every member up to ~10x slower (the slow-restart problem
    evolve_change_compos works around explicitly, real_gas.py:781-784).
    Composition — and hence the transmission cache — is shared.
    """
    from .column import init_time_step_info
    n = len(F_scales) if F_scales is not None else len(T_g_values)
    states = broadcast_state(gas.state, n)
    scales = jnp.asarray(np.ones(n) if F_scales is None else
                         np.asarray(F_scales, np.float64), gas.dtype)
    T_gs = jnp.asarray(np.full(n, gas.T_g) if T_g_values is None else
                       np.asarray(T_g_values, np.float64), gas.dtype)
    T0 = jnp.broadcast_to(T_gs[:, None, None], (n,) + gas.T.shape)
    tsi0 = init_time_step_info(gas.nz - 1, gas.temp_change,
                               gas.delta_temp_change, gas.dtype)
    states = states.replace(
        T=jnp.asarray(T0, gas.dtype),
        net_flux=jnp.zeros_like(states.net_flux),
        t=jnp.zeros((n,), gas.dtype),
        tsi=jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape), tsi0))
    args = (gas.tau_device, gas.band_arrays, gas._F_star_factor,
            jnp.asarray(gas.nu_bands['delta'], gas.dtype),
            jnp.asarray(gas.p_interface, gas.dtype),
            jnp.asarray(gas.p[:, 0], gas.dtype))
    return states, scales, T_gs, args


def real_gas_find_Tg_ensemble(states, scales, T_gs0, args, flux_thresh=0.1,
                              tol=0.5, max_iter=12, stacked_tau=False,
                              verbose=False, **march_kw):
    """Batched ground-temperature solve: the reference's ``find_Tg`` Newton
    (real_gas.py:530-562, optimize.newton with no derivative = secant) as a
    vectorised secant iteration — every trial is ONE vmapped equilibrium
    march for all members at once.  The reference's CO2-ladder experiment
    (real_gas_script.py:27-40) runs this sequentially per concentration.

    :param states, scales, T_gs0, args: from ``real_gas_ensemble`` (shared
        composition, e.g. insolation sweep) or ``real_gas_compos_ensemble``
        (+ ``stacked_tau=True``, one composition per member).
    :param tol: per-member secant step tolerance (reference tol=0.5 K).
    :return: (T_g [n], final states, {'converged', 'iterations', 'residual'})
    """
    dtype = states.T.dtype
    tsi_fresh = states.tsi
    ft = jnp.asarray(flux_thresh, dtype)

    def march(prev_states, T_gs):
        # warm-start the temperature field, fresh march bookkeeping
        st = prev_states.replace(t=jnp.zeros_like(prev_states.t),
                                 net_flux=jnp.zeros_like(prev_states.net_flux),
                                 tsi=tsi_fresh)
        out, _info = real_gas_evolve_ensemble(st, scales, T_gs, *args, ft,
                                              stacked_tau=stacked_tau,
                                              **march_kw)
        return out, out.net_flux[:, 0, 0]          # TOA net flux per member

    x0 = T_gs0
    st, f0 = march(states, x0)
    x1 = x0 * (1 + 1e-4) + 1e-4                    # scipy newton secant seed
    st, f1 = march(st, x1)
    done = jnp.zeros(x0.shape, bool)
    iters = 0
    for iters in range(1, max_iter + 1):
        denom = f1 - f0
        zero = denom == 0
        # a zero denominator means the flux response fell below the march's
        # resolution — probe a fixed step toward balance (net > 0 at TOA =
        # net cooling = ground too warm) instead of silently declaring the
        # unbalanced T_g converged (scipy raises on a zero derivative)
        probe = jnp.sign(f1) * jnp.maximum(tol, 1.0)
        step = jnp.where(zero, probe,
                         f1 * (x1 - x0) / jnp.where(zero, 1.0, denom))
        x2 = jnp.where(done, x1, x1 - step)
        done = done | ((jnp.abs(x2 - x1) < tol) & ~zero)
        x0, f0 = x1, f1
        st, f2 = march(st, x2)
        x1, f1 = x2, f2
        done_np, x_np = jax.device_get((done, x1))  # one pull per iteration
        if verbose:
            print(f'find_Tg iter {iters}: {int(done_np.sum())}/{done_np.size}'
                  f' converged, T_g in [{x_np.min():.2f}, {x_np.max():.2f}]')
        if bool(done_np.all()):
            break
    # hand back march-ready states: a converged trial's shrunk delta_t would
    # restart follow-up marches ~10x slower (real_gas.py:781-784)
    st = st.replace(t=jnp.zeros_like(st.t),
                    net_flux=jnp.zeros_like(st.net_flux), tsi=tsi_fresh)
    return x1, st, {'converged': done, 'iterations': iters, 'residual': f1}


def real_gas_compos_ensemble(gases, T_g_values=None):
    """Batched march inputs from one RealGas PER COMPOSITION (the GHG-ladder
    workload, real_gas_script.py:27-40): members stack their own
    tau_interface; pass the result to ``real_gas_evolve_ensemble`` with
    ``stacked_tau=True``.

    All members must share the grid and wavenumber machinery (same molecules
    and nz — only the humidity/abundance args may differ between them).
    """
    g0 = gases[0]
    for g in gases[1:]:
        if g.nz != g0.nz or g.tau_device.shape != g0.tau_device.shape:
            raise ValueError('composition members must share nz and the '
                             'band/wavenumber structure')
        # star/albedo/distance all fold into F_star_factor — members that
        # differ there would silently march with g0's insolation
        if not np.allclose(np.asarray(g._F_star_factor),
                           np.asarray(g0._F_star_factor)):
            raise ValueError('composition members must share the stellar '
                             'forcing (T_star/R_star/distance/albedo); only '
                             'humidity/abundance args may differ')
    n = len(gases)
    states = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[g.state for g in gases])
    T_gs = jnp.asarray([g.T_g for g in gases] if T_g_values is None
                       else np.asarray(T_g_values, np.float64), g0.dtype)
    scales = jnp.ones((n,), g0.dtype)
    taus = jnp.stack([g.tau_device for g in gases])
    args = (taus, g0.band_arrays, g0._F_star_factor,
            jnp.asarray(g0.nu_bands['delta'], g0.dtype),
            jnp.asarray(g0.p_interface, g0.dtype),
            jnp.asarray(g0.p[:, 0], g0.dtype))
    return states, scales, T_gs, args


def grey_ensemble(world: GreyGas, F_stellar_values):
    """Convenience: batched (states, forcings, grids) from a template world."""
    from ..constants import sigma
    n = len(F_stellar_values)
    states = broadcast_state(world.state, n)
    # isothermal initial condition consistent with each member's forcing —
    # from the RAW albedo exactly like the reference ctor (base.py:120 ->
    # get_isothermal_temp(self.albedo, ...)), NOT albedo_mod: with an sw
    # absorber albedo_mod = albedo * exp(-2 tau_sw_surface) < albedo would
    # seed every member warmer than constructing it as its own GreyGas
    F = np.asarray(F_stellar_values, dtype=np.float64)[:, None]       # [n, 1]
    T0 = (F * world.solar_latitude_factor[None]
          * (1 - world.albedo[None]) / 4 / sigma) ** 0.25             # [n, ny]
    T_init = np.broadcast_to(T0[:, None, :], (n,) + world.T.shape)
    states = states.replace(
        T=jnp.asarray(T_init, world.dtype),
        net_flux=jnp.zeros_like(states.net_flux))
    forcings = grey_ensemble_forcing(world, F_stellar_values)
    p_int = jnp.asarray(world.p_interface, world.dtype)
    p_c = jnp.asarray(world.p[:, 0], world.dtype)
    return states, forcings, p_int, p_c
