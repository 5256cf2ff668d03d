"""Column-model base machinery: state pytrees, the adaptive time-step
controller, and jit-compiled march-to-equilibrium drivers.

This is the TPU-native re-design of the reference ``Atmosphere`` base class
(/root/reference/Model/radiation/base.py:76-335).  The reference drives a Python
while-loop mutating NumPy arrays on ``self``; here the whole march runs as a
``lax.while_loop`` over an immutable state pytree resident in HBM, with the
branchy scalar bookkeeping of ``update_time_step`` (base.py:197-246) re-expressed
as masked vector/scalar ops so it jits and vmaps over ensemble axes:

  * ``time_step_info`` dict        -> TimeStepInfo dataclass of scalars + masks
  * ``RemoveInd`` list             -> boolean ``removed`` mask
  * oscillation/stagnation counts  -> int32 scalars updated with jnp.where
  * per-step percentile/argmax     -> jnp reductions over the flattened grid

Semantics follow base.py line-for-line (cited inline) so equilibrium endpoints
match the NumPy reference to the <0.1 K target.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax
from jax.experimental import checkify

from ..constants import g, c_p_dry, sigma, SECONDS_PER_DAY, SECONDS_PER_YEAR
from ..ops.convection import convective_adjustment
from ..ops.two_stream import percentile_topk_params


# --------------------------------------------------------------------------
# Host-side helpers (base.py:10-73)
# --------------------------------------------------------------------------

def round_any(x, base, round_type='round'):
    """Round x to the nearest multiple of base (base.py:10-20)."""
    fn = {'round': np.round, 'ceil': np.ceil, 'floor': np.floor}[round_type]
    return base * fn(x / base)


def t_years_days(t):
    """Seconds -> (whole years, remaining days) (base.py:23-27)."""
    t_full_days = t / SECONDS_PER_DAY
    t_years, t_days = divmod(t_full_days, 365)
    return t_years, t_days


def latitudinal_solar_distribution(latitude, c=0.477):
    """Annually-averaged insolation factor S(phi) = 1 - c/2 (3 sin^2 phi - 1),
    trapz-normalised so integral(0.5 S cos phi dphi) = 1 (base.py:30-48,
    North 1975)."""
    latitude = np.asarray(latitude, dtype=np.float64)
    if latitude.size > 1:
        lat_r = np.radians(latitude)
        lat_dist = 1 - 0.5 * c * (3 * np.sin(lat_r) ** 2 - 1)
        norm = np.trapz(0.5 * lat_dist * np.cos(lat_r), lat_r)
        return lat_dist / norm
    return np.ones_like(latitude)


def get_isothermal_temp(albedo, F_stellar=None, latitude=None, T_star=None,
                        R_star=None, star_planet_dist=None):
    """Equilibrium temperature of a bare planet (base.py:51-73)."""
    if F_stellar is None:
        F_stellar = sigma * T_star ** 4 * R_star ** 2 / star_planet_dist ** 2
    if latitude is not None:
        F_stellar = F_stellar * latitudinal_solar_distribution(latitude)
    return np.power(F_stellar / sigma * (1 - np.asarray(albedo)) / 4, 0.25)


# --------------------------------------------------------------------------
# State pytrees
# --------------------------------------------------------------------------

@struct.dataclass
class TimeStepInfo:
    """Vectorised form of the reference time_step_info dict (base.py:125-128)."""
    delta_t: jnp.ndarray          # 'DeltaT': current target max |dT| per step (K)
    max_delta_t: jnp.ndarray      # 'MaxDeltaT': ceiling for delta_t
    delta_t_step: jnp.ndarray     # 'DeltaT_step': increment for delta_t
    max_tend: jnp.ndarray         # 'MaxTend': tendency at the controlling level
    max_tend_ind: jnp.ndarray     # 'MaxTendInd': flat index of controlling level
    dt: jnp.ndarray               # 'dt': current time step (s)
    n_same_1: jnp.ndarray         # 'nSameMaxInd' (oscillation count)
    n_same_2: jnp.ndarray         # 'nSameMaxInd2' (agreement count)
    removed: jnp.ndarray          # 'RemoveInd' as bool mask [(nz-1)*ny]
    convective: jnp.ndarray       # 'convective_levels' as bool mask [(nz-1)*ny]


@struct.dataclass
class ColumnState:
    """Radiative column state: all arrays live in HBM, orientation is the
    owning model's (grey: surface-first; real-gas: TOA-first)."""
    T: jnp.ndarray                # [nz-1, ny] cell temperatures
    net_flux: jnp.ndarray         # [nz, ny] net interface flux (up - down)
    t: jnp.ndarray                # scalar: simulated time (s)
    tsi: TimeStepInfo


def init_time_step_info(n_levels_flat: int, temp_change: float = 1.0,
                        delta_temp_change: float = 0.01,
                        dtype=jnp.float32) -> TimeStepInfo:
    """Fresh TimeStepInfo carry for a march (reference time_step_info
    defaults, base.py:125-128)."""
    f = lambda v: jnp.asarray(v, dtype)
    return TimeStepInfo(
        delta_t=f(temp_change), max_delta_t=f(temp_change),
        delta_t_step=f(delta_temp_change), max_tend=f(0.0),
        max_tend_ind=jnp.asarray(-1, jnp.int32), dt=f(0.0),
        n_same_1=jnp.asarray(0, jnp.int32), n_same_2=jnp.asarray(0, jnp.int32),
        removed=jnp.zeros((n_levels_flat,), bool),
        convective=jnp.zeros((n_levels_flat,), bool))


@jax.jit
def reset_time_step_info(tsi: TimeStepInfo) -> TimeStepInfo:
    """Post-equilibrium reset (base.py:329-334).  Jitted: eagerly dispatching
    even these few trivial ops is latency-bound through the axon tunnel."""
    return tsi.replace(removed=jnp.zeros_like(tsi.removed),
                       n_same_1=jnp.zeros_like(tsi.n_same_1),
                       n_same_2=jnp.zeros_like(tsi.n_same_2),
                       max_tend_ind=jnp.full_like(tsi.max_tend_ind, -1))


# --------------------------------------------------------------------------
# Adaptive time step (base.py:197-246)
# --------------------------------------------------------------------------

def update_time_step(tsi: TimeStepInfo, T_tendency_flat, allowed) -> TimeStepInfo:
    """Pick dt so the fastest-changing allowed level moves by delta_t kelvin,
    with oscillation shrink / agreement grow / freeze bookkeeping.

    :param T_tendency_flat: [(nz-1)*ny] temperature tendencies (K/s).
    :param allowed: bool [(nz-1)*ny], the ``levels_to_update`` mask.
    """
    masked = jnp.where(allowed, jnp.abs(T_tendency_flat), -jnp.inf)
    max_ind = jnp.argmax(masked).astype(jnp.int32)
    max_tend = T_tendency_flat[max_ind]

    same = max_ind == tsi.max_tend_ind
    flipped = jnp.sign(max_tend) != jnp.sign(tsi.max_tend)
    osc = same & flipped                                   # base.py:211-217
    grow = same & ~flipped & (tsi.delta_t < tsi.max_delta_t)  # base.py:218-225
    reset = ~osc & ~grow                                   # base.py:226-228

    delta_t = jnp.where(
        osc, jnp.maximum(tsi.delta_t - tsi.delta_t_step, tsi.delta_t_step),
        jnp.where(grow, jnp.minimum(tsi.delta_t + tsi.delta_t_step,
                                    tsi.max_delta_t), tsi.delta_t))
    n1 = jnp.where(osc, tsi.n_same_1 + 1, jnp.where(reset, 0, tsi.n_same_1))
    n2 = jnp.where(grow, tsi.n_same_2 + 1, jnp.where(reset, 0, tsi.n_same_2))

    # prolonged oscillation/stagnation freezes the controlling level
    # (base.py:230-239)
    n_removed = jnp.sum(tsi.removed)
    freeze = ((n1 > 1) & (n2 > 10)) | ((n1 > 20) & (n2 == 0)) | \
             ((n_removed > 3) & ((n1 + n2) > 0))
    removed = tsi.removed.at[max_ind].set(tsi.removed[max_ind] | freeze)
    n1 = jnp.where(freeze, 0, n1)
    n2 = jnp.where(freeze, 0, n2)

    dt = delta_t / jnp.abs(max_tend)
    dt = jnp.where(jnp.isfinite(dt), dt, float(SECONDS_PER_DAY))  # base.py:244-246
    return tsi.replace(delta_t=delta_t, max_tend=max_tend, max_tend_ind=max_ind,
                       dt=dt, n_same_1=n1, n_same_2=n2, removed=removed)


def _percentile_topk(x, pct):
    """Exact percentile via ``lax.top_k`` order statistics.

    Matches ``jnp.percentile``'s default linear interpolation (same two
    order statistics, same lerp — context-FMA ulp differences only) but only
    selects the top ~(100-pct)% tail instead of fully sorting: the march
    evaluates this every (checked) step on |net_flux - prev| (base.py:173),
    and at 95 the tail is 1/20th of the array.  pct must be static.

    NaN semantics match ``jnp.percentile`` too: ``top_k`` sorts NaNs to the
    top, which would otherwise hand direct consumers (take_time_step host
    loops, e.g. the staged-tau ramp driver) a plausible FINITE delta from a
    corrupted flux field — so a NaN anywhere in x propagates explicitly
    (r03 advisor finding; the fused march is separately protected by its
    sticky non-finite sentinel)."""
    x = x.reshape(-1)
    n = x.shape[0]
    m, frac = percentile_topk_params(n, pct)
    # top[0] is the global max, already computed: NaN there == NaN anywhere
    top = lax.top_k(x, m)[0]
    nan_in = jnp.isnan(top[0])
    val = top[m - 1] if (frac == 0.0 or m < 2) else \
        top[m - 1] * (1 - frac) + top[m - 2] * frac
    return jnp.where(nan_in, jnp.asarray(jnp.nan, x.dtype), val)


def _percentile_from_stats(top1, top_hi, top_lo, n, pct):
    """:func:`_percentile_topk` evaluated from precomputed order statistics
    (the fused net+stats kernel's outputs): same two order statistics, same
    lerp, same NaN sentinel — bit-identical given bit-identical stats.
    ``top_hi``/``top_lo`` are the (m-1)-th / m-th largest values; when
    m == 1 the m-th largest IS the maximum, which the producer returns as
    ``top1``."""
    m, frac = percentile_topk_params(n, pct)
    if m < 2:
        val = top1
    elif frac == 0.0:
        val = top_lo
    else:
        val = top_lo * (1 - frac) + top_hi * frac
    return jnp.where(jnp.isnan(top1), jnp.asarray(jnp.nan, val.dtype), val)


# --------------------------------------------------------------------------
# Temperature update (base.py:130-195)
# --------------------------------------------------------------------------

def update_temp(state: ColumnState, net_flux, p_interface, p_centre_col,
                changing_tau: bool = False, convective_adjust: bool = False,
                net_flux_thresh: float = 1e-7, net_flux_percentile: float = 95,
                conv_thresh: float = 1e-5, conv_t_multiplier: float = 5.0,
                p_descending: bool = True, conv_method: str = 'reference',
                net_flux_diff=None, compute_delta: bool = True,
                delta_stats=None):
    """One finite-volume temperature update with adaptive dt.

    :param net_flux: [nz, ny] freshly computed net flux.
    :param p_interface: [nz, ny] interface pressures (model's own orientation).
    :param p_centre_col: [nz-1] cell-centre pressures of column 0 — used by
        convective adjustment.
    :param p_descending: static orientation of the model's pressure axis
        (grey: True, surface first; real-gas: False, TOA first).
    :param net_flux_diff: optional [nz-1, ny] adjacent-interface flux
        difference ``net_flux[1:] - net_flux[:-1]`` evaluated in a
        better-conditioned order by the caller (e.g. the real-gas band sum
        differenced per band BEFORE the band reduction).  In f32 the direct
        difference of two ~1e2 W/m^2 band sums carries ~1e-5 W/m^2 of
        reduction-order noise, which at micro-mass TOA levels (dp < 1 Pa)
        becomes a biased heating of radiatively-decoupled layers — one
        insolation-ensemble member cooled such a level to the negative-T
        abort (member 47 of BENCH_r02's real_gas_earth_ensemble, p=0.25 Pa).
        In f64 the two forms agree to machine epsilon.
    :param compute_delta: static; ``False`` skips the 95th-percentile
        flux-change statistic (a full sort every step) and returns
        ``delta_net_flux=None`` — used by the ``check_every`` chunked-exit
        march, whose intermediate steps never consume it.
    :param delta_stats: optional (top1, top_hi, top_lo) order statistics of
        ``|net_flux - state.net_flux|`` precomputed by a fused flux+stats
        operator (ops/two_stream.grey_net_with_stats); bit-identical
        replacement for the in-place top_k (see _percentile_from_stats).
    :return: (new_state, delta_net_flux)
    """
    T = state.T
    tsi = state.tsi
    n_flat = T.size
    # finite volume tendency dT/dt = g/c_p * dF/dp (base.py:166-168)
    flux_diff = (net_flux[1:, :] - net_flux[:-1, :] if net_flux_diff is None
                 else net_flux_diff)
    T_tendency = g / c_p_dry * flux_diff / (
        p_interface[1:, :] - p_interface[:-1, :])
    tend_flat = T_tendency.reshape(-1)

    first_or_forced = (state.t <= 0) | bool(changing_tau)
    # stagnant levels (|net flux| small) and frozen levels stop updating
    # (base.py:169-177)
    active = jnp.abs(net_flux[:-1, :].reshape(-1)) > net_flux_thresh
    allowed = jnp.where(first_or_forced, jnp.ones((n_flat,), bool),
                        active & ~tsi.removed)
    delta_net_flux = None
    if compute_delta:
        pctl = (_percentile_from_stats(*delta_stats, net_flux.size,
                                       net_flux_percentile)
                if delta_stats is not None else
                _percentile_topk(jnp.abs(net_flux - state.net_flux),
                                 net_flux_percentile))
        delta_net_flux = jnp.where(first_or_forced,
                                   jnp.asarray(1e6, T.dtype),
                                   pctl.astype(T.dtype))

    any_allowed = jnp.any(allowed)
    tsi_new = update_time_step(tsi, tend_flat, allowed)
    tsi = jax.tree_util.tree_map(
        lambda new, old: jnp.where(any_allowed, new, old), tsi_new, tsi)
    # convective-region speed-up (base.py:182-183)
    dt = tsi.dt
    if convective_adjust:
        in_conv = tsi.convective[tsi.max_tend_ind]
        dt = jnp.where(any_allowed & in_conv, dt * conv_t_multiplier, dt)
        tsi = tsi.replace(dt=dt)

    T_new = jnp.where(allowed.reshape(T.shape), T + dt * T_tendency, T)

    if convective_adjust:
        T_adj = convective_adjustment(p_centre_col, T_new,
                                      descending=p_descending,
                                      method=conv_method)
        conv_mask = allowed & (jnp.abs(T_adj.reshape(-1) - T_new.reshape(-1))
                               > conv_thresh)             # base.py:190-192
        tsi = tsi.replace(convective=conv_mask)
        T_new = T_adj

    new_state = state.replace(T=T_new, net_flux=net_flux, t=state.t + dt, tsi=tsi)
    return new_state, delta_net_flux


@functools.partial(jax.jit, static_argnames=('use_delta_exit',))
def check_equilibrium(net_flux, delta_net_flux, flux_thresh=1e-3,
                      use_delta_exit=True, net_absmax=None):
    """max|F_net| < thresh or (optionally) delta F < thresh (base.py:248-264).

    ``use_delta_exit=False`` disables the reference's flux-stopped-changing
    shortcut and demands true flux balance — useful for per-column ensemble
    marches where the percentile criterion over a single small column exits
    prematurely.  ``net_absmax`` optionally supplies a precomputed
    max|net_flux| (the fused flux+stats operator's — bit-identical, max is
    an exact selection)."""
    absmax = jnp.max(jnp.abs(net_flux)) if net_absmax is None else net_absmax
    eqb = absmax < flux_thresh
    if use_delta_exit:
        eqb = eqb | (delta_net_flux < flux_thresh)
    return eqb


# --------------------------------------------------------------------------
# March to equilibrium (base.py:266-335)
# --------------------------------------------------------------------------

class EquilibriumInfo(NamedTuple):
    """Per-march exit telemetry: step count, final delta statistic and
    the disjoint exit flags (converged / failed / nan / timed_out)."""
    steps: jnp.ndarray
    delta_net_flux: jnp.ndarray
    flux_thresh: jnp.ndarray
    failed: jnp.ndarray            # temperature went negative (base.py:319-320)
    equilibrium: jnp.ndarray       # TRUE convergence (flux/delta criterion)
    nan: jnp.ndarray               # non-finite T or flux appeared (sanitizer:
    #                                the march aborts immediately instead of
    #                                running to max_steps on garbage; the
    #                                reference has no equivalent guard)
    timed_out: jnp.ndarray         # hit the t_end cap WITHOUT converging — a
    #                                legitimate exit like the reference's
    #                                (base.py:322), but kept separate so
    #                                convergence claims can't count timeouts


def evolve_to_equilibrium(state: ColumnState, net_flux_fn: Callable,
                          p_interface, p_centre_col, *, flux_thresh: float = 1e-3,
                          convective_adjust: bool = False, t_end: float = 4.0,
                          conv_thresh: float = 1e-5, conv_t_multiplier: float = 5.0,
                          net_flux_thresh: float = 1e-7,
                          net_flux_percentile: float = 95,
                          max_steps: int = 500_000, p_descending: bool = True,
                          use_delta_exit: bool = True,
                          conv_method: str = 'reference', i0=0,
                          final_reset: bool = True, check_every: int = 1,
                          dip_memory: bool = False, debug: bool = False,
                          net_stats_fn: Callable | None = None):
    """jit-compiled while-loop march to radiative(-convective) equilibrium.

    :param net_flux_fn: T [nz-1, ny] -> net flux [nz, ny]; the model's fused
        radiation operator.
    :param t_end: hard cap in simulated years (base.py:322).
    :param i0: starting iteration count — pass the previous chunk's step count
        when chunking a march across multiple device calls (single very long
        XLA executions can trip accelerator watchdogs).
    :param final_reset: reset the time-step bookkeeping on exit
        (base.py:329-334); pass False for intermediate chunks.
    :param check_every: static; evaluate the exit criteria every this many
        steps instead of every step.  The reference checks per step
        (base.py:266-335), but at small nz the adaptive march is dominated by
        the per-step exit machinery (the 95th-percentile flux-change sort,
        the equilibrium/NaN/negative-T reductions and their carry plumbing) —
        ``check_every=K`` runs K-1 reduced steps (physics + dt controller
        only) per full check, amortising that cost.  The first two steps are
        always full checks so the reference's i==1 threshold tightening
        (base.py:315-317) samples the exact same delta; semantics of the
        intermediate steps are identical, and the march may overshoot the
        exit point by up to K-1 steps (it stops at the first CHECK that sees
        equilibrium / t_end / a failure; the negative-T and NaN criteria are
        accumulated stickily through the reduced steps, so even a transient
        excursion that recovers before the check still aborts — nothing is
        missed, only detected late).  Opt-in; default 1 preserves
        exact reference exit semantics.  Measured on v5e K=8 is the sweet
        spot: radiative single-column marches drop from ~0.20-0.21 to
        ~0.10-0.13 ms/step (nz=150/600); convective marches are
        sweep-dominated and gain only ~20%.
    :param dip_memory: static; only meaningful with ``check_every > 1``.
        The default reduced steps skip the exit statistics entirely, so a
        march whose delta statistic dips below threshold for one step and
        then rises again (convective marches under per-step adjustment;
        individual grey-ensemble members) can MISS its exit and run on —
        measured as a ~5x step-count regression on convective marches and a
        converged-fraction drop on the grey ensemble (PERF.md).  With
        ``dip_memory=True`` every step of the chunk evaluates the full exit
        criteria and the carry FREEZES at the first stop event (equilibrium
        dip, negative-T, non-finite, t_end): the returned state, step count,
        delta and flags are exactly the per-step march's (bit-identical
        endpoints, tests/test_grey_rce.py), only their detection is deferred
        to the chunk boundary.  Relative to ``check_every=1`` it amortises
        the while-loop cond/carry machinery over K steps while keeping the
        per-step percentile; relative to plain ``check_every=K`` it pays the
        percentile back in exchange for exactness.
    :param debug: static; instrument every march step with
        :mod:`jax.experimental.checkify` user checks that record WHERE a
        failure first appeared (first non-finite net-flux interface, first
        non-finite temperature level, first negative-temperature level, plus
        the step count and simulated time) instead of only freezing the
        march via the sentinel flags (SURVEY §5 sanitizer row).  The caller
        must run the march under :func:`checkify.checkify` (the model-layer
        ``evolve_to_equilibrium(debug=True)`` entry points do) and throw the
        returned error on the host.  Numerics are unchanged — a healthy
        debug march is bit-identical to a plain one.  Requires per-step
        checking (``check_every=1``): the failing step IS the payload.
    :param net_stats_fn: optional fused flux+statistics operator
        ``(T, prev_net) -> (net, top1, top_hi, top_lo, max|net|)``
        (ops/two_stream.grey_net_with_stats) replacing ``net_flux_fn`` AND
        the in-march delta-percentile/flux-balance reductions with one
        kernel pass — bit-identical by construction (the stats are
        selections; the net assembly repeats the XLA op order).
    :return: (final ColumnState, EquilibriumInfo)
    """
    if debug and check_every > 1:
        raise ValueError('debug=True needs per-step checks (check_every=1): '
                         'the failing step/level is the whole point')
    dtype = state.T.dtype
    t0 = state.t
    ft0 = jnp.asarray(flux_thresh, dtype)

    body = _march_body(net_flux_fn, p_interface, p_centre_col, t0,
                       convective_adjust=convective_adjust, t_end=t_end,
                       conv_thresh=conv_thresh,
                       conv_t_multiplier=conv_t_multiplier,
                       net_flux_thresh=net_flux_thresh,
                       net_flux_percentile=net_flux_percentile,
                       p_descending=p_descending, use_delta_exit=use_delta_exit,
                       conv_method=conv_method, check_every=check_every,
                       dip_memory=dip_memory, max_steps=max_steps,
                       debug=debug, net_stats_fn=net_stats_fn)

    def cond(carry):
        _st, _ft, _delta, i, eqb, failed, nan, tout = carry
        return ~eqb & ~tout & ~failed & ~nan & (i < max_steps)

    init = (state, ft0, jnp.asarray(1e6, dtype),
            jnp.asarray(i0, jnp.int32), jnp.asarray(False), jnp.asarray(False),
            jnp.asarray(False), jnp.asarray(False))
    if check_every > 1:
        # the first two steps run fully checked so the i==1 threshold
        # tightening samples the same delta as a per-step march (a no-op on
        # chunk re-entry, where i0 >= 2 already)
        body1 = _march_body(net_flux_fn, p_interface, p_centre_col, t0,
                            convective_adjust=convective_adjust, t_end=t_end,
                            conv_thresh=conv_thresh,
                            conv_t_multiplier=conv_t_multiplier,
                            net_flux_thresh=net_flux_thresh,
                            net_flux_percentile=net_flux_percentile,
                            p_descending=p_descending,
                            use_delta_exit=use_delta_exit,
                            conv_method=conv_method,
                            net_stats_fn=net_stats_fn)
        init = lax.while_loop(lambda c: cond(c) & (c[3] < 2), body1, init)
    st, ft, delta, i, eqb, failed, nan, tout = lax.while_loop(cond, body, init)
    if final_reset:
        st = st.replace(tsi=reset_time_step_info(st.tsi))
    return st, EquilibriumInfo(steps=i, delta_net_flux=delta, flux_thresh=ft,
                               failed=failed, equilibrium=eqb, nan=nan,
                               timed_out=tout)


def _march_body(net_flux_fn, p_interface, p_centre_col, t0, *,
                convective_adjust, t_end, conv_thresh, conv_t_multiplier,
                net_flux_thresh, net_flux_percentile, p_descending,
                use_delta_exit, conv_method, check_every: int = 1,
                dip_memory: bool = False, max_steps=None,
                debug: bool = False, net_stats_fn=None):
    """The shared march step over carry (state, ft, delta, i, eqb, failed,
    nan, timed_out) used by both the fused while_loop and the snapshot scan.

    ``check_every=K`` prepends K-1 reduced steps (physics + dt controller,
    no exit statistics) to the full checked step — see
    :func:`evolve_to_equilibrium`.  ``dip_memory=True`` instead runs K
    fully-checked steps whose carry freezes at the first stop event, making
    the chunked march bit-identical to the per-step one; it requires
    ``max_steps`` so the freeze also honours the step cap (a capped per-step
    march stops AT ``max_steps``, so the chunk must too)."""
    def step(st, compute_delta):
        if net_stats_fn is not None:
            # fused flux + exit statistics (ops/two_stream.
            # grey_net_with_stats): net, the delta order statistics and
            # max|net| in one kernel pass — bit-identical to the split path
            net, top1, top_hi, top_lo, absmax = net_stats_fn(st.T,
                                                             st.net_flux)
            net_diff, stats = None, (top1, top_hi, top_lo)
        else:
            out = net_flux_fn(st.T)
            # net_flux_fn may return (net, net_diff) with a
            # better-conditioned adjacent-interface difference (see
            # update_temp's net_flux_diff)
            net, net_diff = out if isinstance(out, tuple) else (out, None)
            stats = absmax = None
        st, delta = update_temp(st, net, p_interface, p_centre_col,
                                changing_tau=False,
                                convective_adjust=convective_adjust,
                                net_flux_thresh=net_flux_thresh,
                                net_flux_percentile=net_flux_percentile,
                                conv_thresh=conv_thresh,
                                conv_t_multiplier=conv_t_multiplier,
                                p_descending=p_descending,
                                conv_method=conv_method,
                                net_flux_diff=net_diff,
                                compute_delta=compute_delta,
                                delta_stats=stats)
        return st, net, delta, absmax

    def exit_flags(st, net, delta, ft, absmax=None):
        """The per-step stop criteria, evaluated ONCE here so the per-step
        body and the dip-memory chunk cannot drift apart (their bit-identity
        is the dip feature's whole contract)."""
        eqb = check_equilibrium(st.net_flux, delta, ft, use_delta_exit,
                                net_absmax=absmax)
        failed = jnp.min(st.T) < 0
        # NaN/inf sentinel (SURVEY §5 sanitizer row): abort the march on the
        # first non-finite temperature or flux instead of looping on garbage
        nan = ~(jnp.all(jnp.isfinite(st.T)) & jnp.all(jnp.isfinite(net)))
        tout = ((st.t - t0) / SECONDS_PER_YEAR > t_end) & ~eqb
        return eqb, failed, nan, tout

    if dip_memory and check_every > 1:
        if max_steps is None:
            raise ValueError('dip_memory requires max_steps (the freeze '
                             'must honour the step cap)')

        def dip_body(carry):
            st, ft, delta0, i, eqb0, failed0, nan0, tout0 = carry

            # K fully-checked steps per body call; the carry FREEZES at the
            # first stop event so state/steps/delta/flags are bit-identical
            # to the per-step march — only their detection waits for the
            # chunk boundary.  The step cap is a stop event too: the outer
            # cond only sees i at chunk boundaries, so without it a capped
            # march would overshoot by up to K-1 live steps.  All selects
            # are vector where's (vmap-safe).
            def chunk_step(_, c):
                st, i, delta, eqb, failed, nan, tout = c
                stop = eqb | failed | nan | tout | (i >= max_steps)
                st_new, net, d, am = step(st, compute_delta=True)
                st = jax.tree_util.tree_map(
                    lambda frozen, new: jnp.where(stop, frozen, new),
                    st, st_new)
                delta = jnp.where(stop, delta, d)
                i = i + jnp.where(stop, 0, 1)
                # am describes the discarded step's net for frozen members,
                # like net itself — harmless: every consumer below masks
                # with ~stop
                hit, f_now, n_now, t_now = exit_flags(st, net, delta, ft,
                                                      absmax=am)
                failed = failed | (f_now & ~stop)
                nan = nan | (n_now & ~stop)
                eqb = eqb | (hit & ~stop)
                tout = tout | (t_now & ~stop)
                return st, i, delta, eqb, failed, nan, tout

            # outer cond guarantees every flag is False on entry; the &False
            # keeps traced dtypes/shapes.  (r05 negative result: UNROLLING
            # this chunk into straight-line code buys nothing on v5e — 0.52
            # unrolled vs 0.51 per-step on the convective march — the cost
            # is the body's dependency chain, not fori boundaries; see
            # PERF.md "where the convective march's time actually goes".)
            init = (st, i, delta0, eqb0 & False, failed0 & False,
                    nan0 & False, tout0 & False)
            st, i, delta, eqb, failed, nan, tout = lax.fori_loop(
                0, int(check_every), chunk_step, init)
            return st, ft, delta, i, eqb, failed, nan, tout
        return dip_body

    def body(carry):
        st, ft, _delta, i, _eqb, failed0, nan0, _tout = carry
        failed = failed0 & False      # fresh accumulators, right dtype/shape
        nan = nan0 & False
        if check_every > 1:
            # the failure criteria stay STICKY through the reduced steps —
            # a transient negative-T or non-finite excursion that recovers
            # before the next check must still abort, exactly like the
            # per-step march (the K-chunking only defers the exit
            # STATISTICS: percentile/equilibrium/timeout are state-based and
            # cannot be missed, these two are history-based)
            def reduced(_, c):
                st_r, i_r, f_r, n_r = c
                st_r, net_r, _d, _am = step(st_r, compute_delta=False)
                f_r = f_r | (jnp.min(st_r.T) < 0)
                n_r = n_r | ~(jnp.all(jnp.isfinite(st_r.T))
                              & jnp.all(jnp.isfinite(net_r)))
                return st_r, i_r + 1, f_r, n_r
            st, i, failed, nan = lax.fori_loop(
                0, int(check_every) - 1, reduced, (st, i, failed, nan))
        st, net, delta, absmax = step(st, compute_delta=True)
        if debug:
            # checkify user checks (SURVEY §5 sanitizer row): locate the
            # first failure instead of only freezing on it.  Order matters —
            # checkify keeps the FIRST error, and a non-finite net flux is
            # the usual cause of the non-finite temperature one step later.
            bad_net = ~jnp.isfinite(net).ravel()
            checkify.check(
                ~jnp.any(bad_net),
                'march debug: non-finite net flux first at flat interface '
                '{lev} (step {i}, t={t} s) — the radiation operator '
                'produced NaN/inf from this state',
                lev=jnp.argmax(bad_net), i=i + 1, t=st.t)
            bad_T = ~jnp.isfinite(st.T).ravel()
            checkify.check(
                ~jnp.any(bad_T),
                'march debug: non-finite temperature first at flat level '
                '{lev} (step {i}, t={t} s)',
                lev=jnp.argmax(bad_T), i=i + 1, t=st.t)
            T_flat = st.T.ravel()
            checkify.check(
                jnp.min(T_flat) >= 0,
                'march debug: temperature {tmin} K below zero first at flat '
                'level {lev} (step {i}, t={t} s) — the reference aborts '
                'here too (base.py:319-320)',
                tmin=jnp.min(T_flat), lev=jnp.argmin(T_flat), i=i + 1,
                t=st.t)
        # second iteration tightens the threshold (base.py:315-317); in
        # chunked-exit mode i==1 only occurs in the fully-checked two-step
        # prefix (evolve_to_equilibrium), which uses a check_every=1 body
        ft = jnp.where(i == 1, jnp.minimum(ft, 0.99 * delta), ft)
        eqb, f_now, n_now, timed_out = exit_flags(st, net, delta, ft,
                                                  absmax=absmax)
        failed = failed | f_now
        nan = nan | n_now
        return st, ft, delta, i + 1, eqb, failed, nan, timed_out
    return body


def run_chunked_march(state: ColumnState, evolve: Callable, *, t_host_start,
                      t_end, chunk_steps, flux_thresh, verbose=False):
    """Drive a compiled save=False march in bounded chunks (host loop shared
    by GreyGas and RealGas evolve_to_equilibrium).

    ``chunk_steps`` bounds each single XLA execution against
    watchdog-limited accelerators (the axon worker kills executions longer
    than ~1-2 min, CLAUDE.md).  ``evolve(state, ft, i0=, t_end=, max_steps=)``
    must run the fused march with ``final_reset=False`` and return
    ``(state, EquilibriumInfo)``.  Each chunk re-anchors its in-device
    timeout (t_end budgets the WHOLE march, so every chunk gets only the
    remainder), carries the tightened flux threshold forward (the i==1
    tightening must survive chunk boundaries), batches all device pulls
    into one transfer, and prints the reference's per-chunk telemetry
    (base.py:324-327) when verbose.  Returns ``(state, info)`` with the
    controller reset for the next fresh call (base.py:329-334).
    """
    i0 = 0
    ft = flux_thresh
    t_start = t_chunk_start = t_host_start
    while True:
        t_end_chunk = float(t_end) - (t_chunk_start - t_start) \
            / SECONDS_PER_YEAR
        state, info = evolve(state, ft, i0=i0,
                             t_end=t_end_chunk,
                             max_steps=i0 + int(chunk_steps))
        steps_np, delta_np, t_chunk, eqb_np, failed_np, nan_np, tout_np = \
            jax.device_get((info.steps, info.delta_net_flux, state.t,
                            info.equilibrium, info.failed, info.nan,
                            info.timed_out))
        i0 = int(steps_np)
        ft = info.flux_thresh            # keep the tightened threshold
        t_chunk_start = float(t_chunk)
        if verbose:
            print(f'step {i0}: t = '
                  f'{float(t_chunk) / SECONDS_PER_YEAR:.3f} yr, '
                  f'delta_net_flux = {float(delta_np):.4f}')
        if bool(eqb_np) or bool(tout_np) or bool(failed_np) or bool(nan_np):
            break
    state = state.replace(tsi=reset_time_step_info(state.tsi))
    return state, info


def evolve_snapshots(state: ColumnState, net_flux_fn: Callable, p_interface,
                     p_centre_col, *, n_snaps: int, steps_per_snap: int = 1,
                     snapshot_fn: Callable | None = None,
                     flux_thresh: float = 1e-3, convective_adjust: bool = False,
                     t_end: float = 4.0, conv_thresh: float = 1e-5,
                     conv_t_multiplier: float = 5.0,
                     net_flux_thresh: float = 1e-7,
                     net_flux_percentile: float = 95,
                     p_descending: bool = True, use_delta_exit: bool = True,
                     conv_method: str = 'reference', i0=0,
                     snapshot_on: str = 'pre'):
    """Fused march that stacks a snapshot every ``steps_per_snap`` steps.

    The TPU-native replacement of the reference's per-step ``save_data``
    appends (base.py:266-335 + save_data): instead of two device->host syncs
    per step, the whole chunk of ``n_snaps * steps_per_snap`` steps runs as one
    ``lax.scan`` and the host pulls all snapshots in one transfer.  Once the
    march reaches equilibrium (or fails) the remaining scan iterations are
    no-ops emitting repeats of the final state — callers truncate using the
    returned per-snapshot ``steps`` / ``equilibrium`` arrays.

    :param snapshot_fn: optional ``T -> pytree`` of extra per-snapshot arrays
        (e.g. the grey model's four flux fields for animation data).
    :param snapshot_on: 'pre' evaluates snapshot_fn on the temperature BEFORE
        the snapshot's steps — the grey reference's save_data stores fluxes
        computed at step start alongside the post-step temperature
        (grey.py:296-383); 'post' evaluates it on the post-step temperature —
        the real-gas reference recomputes fluxes at save time
        (real_gas.py:720-746).
    :return: (final state, EquilibriumInfo, snaps) where snaps is a dict with
        't', 'T', 'delta', 'steps', 'equilibrium', 'failed', 'nan' arrays of
        leading length n_snaps, plus 'extra' from snapshot_fn.
    """
    dtype = state.T.dtype
    t0 = state.t
    ft0 = jnp.asarray(flux_thresh, dtype)
    body = _march_body(net_flux_fn, p_interface, p_centre_col, t0,
                       convective_adjust=convective_adjust, t_end=t_end,
                       conv_thresh=conv_thresh,
                       conv_t_multiplier=conv_t_multiplier,
                       net_flux_thresh=net_flux_thresh,
                       net_flux_percentile=net_flux_percentile,
                       p_descending=p_descending,
                       use_delta_exit=use_delta_exit, conv_method=conv_method)

    def inner_cond_limit(limit):
        def cond(carry):
            _st, _ft, _delta, i, eqb, failed, nan, tout = carry
            return ~eqb & ~tout & ~failed & ~nan & (i < limit)
        return cond

    if snapshot_on not in ('pre', 'post'):
        raise ValueError(f'snapshot_on must be pre or post, got {snapshot_on!r}')

    def outer(carry, _):
        extra = None
        if snapshot_fn is not None and snapshot_on == 'pre':
            extra = snapshot_fn(carry[0].T)
        limit = carry[3] + steps_per_snap
        carry = lax.while_loop(inner_cond_limit(limit), body, carry)
        st, ft, delta, i, eqb, failed, nan, tout = carry
        if snapshot_fn is not None and snapshot_on == 'post':
            extra = snapshot_fn(st.T)
        snap = {'t': st.t, 'T': st.T, 'delta': delta, 'steps': i,
                'equilibrium': eqb, 'failed': failed, 'nan': nan,
                'timed_out': tout}
        if extra is not None:
            snap['extra'] = extra
        return carry, snap

    init = (state, ft0, jnp.asarray(1e6, dtype),
            jnp.asarray(i0, jnp.int32), jnp.asarray(False), jnp.asarray(False),
            jnp.asarray(False), jnp.asarray(False))
    carry, snaps = lax.scan(outer, init, None, length=n_snaps)
    st, ft, delta, i, eqb, failed, nan, tout = carry
    info = EquilibriumInfo(steps=i, delta_net_flux=delta, flux_thresh=ft,
                           failed=failed, equilibrium=eqb, nan=nan,
                           timed_out=tout)
    return st, info, snaps
