"""Real-gas band radiative column model, TPU-native.

Re-design of the reference ``RealGas``
(/root/reference/Model/radiation/real_gas.py:187-841): line-by-line HITRAN
absorption collapsed into lookup tables, band-averaged transmission-function
flux integrals, and the shared adaptive-dt march to equilibrium.

TPU mapping (SURVEY.md sections 2/5):

  * wavenumber machinery, band construction and the absorption-weighted 'auto'
    pressure grid stay host-side NumPy float64 (shape-determining);
  * the hot per-band Python loop (real_gas.py:645-663) becomes one jitted
    function over *packed band structures* — all-band attenuation and the
    long-wave nz x nz transmission matrices are batched einsums, and the
    per-level trapz integrals with moving limits become two precomputed weight
    matrices (ops/transmission.py);
  * the reference's cubic-spline T(p_interface) (real_gas.py:634-636) is exact
    spline interpolation, which is *linear in the data* — so it enters the
    compiled flux as a single precomputed [nz, nz-1] matrix multiply;
  * the equilibrium march reuses the shared lax.while_loop driver
    (models/column.py) with TOA-first orientation.

Array orientation matches the reference real-gas model: axis 0 index 0 = top of
atmosphere (ascending pressure).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import checkify
from scipy import optimize
from scipy.interpolate import InterpolatedUnivariateSpline, interp1d

from ..constants import (AU, R_sun, SECONDS_PER_YEAR, T_sun, g,
                         p_surface_earth, p_toa_earth, sigma)
from ..ops.planck import B_wavenumber
from ..ops import transmission as tr
from ..spectral import bands as bands_mod
from ..spectral import hitran
from ..spectral.humidity import molecules, ppmv_from_humidity
from . import column
from .column import ColumnState, get_isothermal_temp, init_time_step_info


@struct.dataclass
class BandArrays:
    """Device-resident packed band structure + integration weights."""
    idx: jnp.ndarray        # [n_bands, K] nu indices
    w: jnp.ndarray          # [n_bands, K] trapz weights
    delta: jnp.ndarray      # [n_bands]
    centre: jnp.ndarray     # [n_bands]
    lw_idx: jnp.ndarray     # [n_lw, K_lw]
    lw_w: jnp.ndarray       # [n_lw, K_lw]
    lw_delta: jnp.ndarray   # [n_lw]
    lw_centre: jnp.ndarray  # [n_lw]
    lw_list: jnp.ndarray    # [n_lw] band indices
    W_up: jnp.ndarray       # [nz, nz+1]
    W_down: jnp.ndarray     # [nz, nz+1]
    S: jnp.ndarray          # [nz, nz-1] spline interpolation matrix
    dp_int: jnp.ndarray     # [nz-1] interface pressure differences


@struct.dataclass
class TransmissionCache:
    """tau-dependent factors of the flux equations, constant during a march
    (the optical depth only changes with composition, not temperature): the
    per-band attenuation vectors, and the flux-integral weight products
    W x dTr folded into matmul-ready operators.

    The march path (real_gas_net_and_diff_cached) only ever consumes the SUM
    of the two interior operators — up's integral enters net with -m_up and
    down's with -m_down — so the cache carries a dedicated march operator in
    addition to the per-direction ones the diagnostics need:

    * full precision: ``M_sum = M_up + M_down`` [L, nz, nz-1] — the march
      streams HALF the bytes of the two-operator formulation;
    * reduced ``cache_dtype`` (bf16): the ROW-DIFFERENCED sum
      ``D_sum[b, i, :] = M_sum[b, i+1, :] - M_sum[b, i, :]`` in the reduced
      dtype plus the f32 first row — a QUARTER of the f32 two-operator
      bytes.  The heating tendency consumes adjacent-row flux DIFFERENCES,
      and quantizing D bounds the tendency noise by
      eps_bf16 * |local flux divergence| instead of eps_bf16 * |flux|:
      directly-quantized operators turn ~0.4% of the ~1e2 W/m^2 flux into a
      BIASED spurious tendency at micro-mass TOA levels (measured
      ~0.3 K/day at nz=400 where the true tendency is ~0; marches ran away
      to the negative-T abort over ~1e4 steps).  In this layout the
      per-direction operators are kept in the reduced dtype too, for the
      (rare, value-level) diagnostics flux evaluations."""
    att_up: jnp.ndarray       # [B, nz]
    att_down: jnp.ndarray     # [B, nz]
    M_up: jnp.ndarray         # [L, nz, nz-1]  interior-up operator
    M_down: jnp.ndarray       # [L, nz, nz-1]  interior-down operator (j rows)
    lo_up: jnp.ndarray        # [L, nz]  lower-interface term coefficients
    sf_up: jnp.ndarray        # [L, nz]  surface term coefficients
    toa_down: jnp.ndarray     # [L, nz]  TOA term coefficients
    hi_down: jnp.ndarray      # [L, nz]  upper-interface term coefficients
    M_sum: jnp.ndarray = None     # [L, nz, nz-1] march operator (f32 layout)
    D_sum: jnp.ndarray = None     # [L, nz-1, nz-1] row-differenced march
    #                               operator (reduced layout)
    row0_sum: jnp.ndarray = None  # [L, nz-1] f32 first row of M_sum


def precompute_transmission(tau_interface, ba: BandArrays,
                            cache_dtype=None) -> TransmissionCache:
    """Fold everything tau-dependent out of the per-step flux computation.

    :param cache_dtype: optional storage dtype for the interior operators
        (e.g. ``jnp.bfloat16``): quarters the march-streamed bytes and
        roughly halves cache memory.  The reduced-precision layout stores
        the ROW-DIFFERENCED summed operator (see TransmissionCache) so the
        quantization error lands on the already-small adjacent-row flux
        differences the tendency consumes, not on the absolute fluxes;
        matmuls accumulate in f32 (``preferred_element_type``); rank-1
        terms stay full precision.  Opt-in, for memory-constrained caches
        (e.g. stacked_tau ladders at high nz): with the summed f32 march
        operator the single-column march is launch-bound on v5e, so bf16 no
        longer buys wall-clock there (PERF.md); endpoint shifts ~0.4 K
        (bounded in tests/test_real_gas_perf_modes.py).
    """
    nz = tau_interface.shape[0]
    att_up = tr.band_attenuation(tau_interface, ba.idx, ba.w, ba.delta,
                                 ref_level=nz - 1)
    att_down = tr.band_attenuation(tau_interface, ba.idx, ba.w, ba.delta,
                                   ref_level=0)
    Tr = tr.band_transmission_matrices(tau_interface, ba.lw_idx, ba.lw_w,
                                       ba.lw_delta)
    dTr_up = jnp.diff(Tr, axis=2) / ba.dp_int[None, None, :]
    dTr_dn = jnp.diff(Tr, axis=1) / ba.dp_int[None, :, None]

    diag_up = jnp.diagonal(dTr_up, axis1=1, axis2=2)
    diag_up = jnp.concatenate([diag_up, jnp.zeros_like(diag_up[:, :1])], 1)
    lo_up = ba.W_up[None, :, 0] * diag_up
    sf_up = ba.W_up[None, :, nz] * dTr_up[:, :, nz - 2]
    M_up = ba.W_up[None, :, 1:nz] * dTr_up

    diag_dn = jnp.diagonal(dTr_dn, axis1=1, axis2=2, offset=1)
    diag_dn = jnp.concatenate([jnp.zeros_like(diag_dn[:, :1]), diag_dn], 1)
    toa_down = ba.W_down[None, :, 0] * dTr_dn[:, 0, :]
    hi_down = ba.W_down[None, :, nz] * diag_dn
    # M_down[b, j, m] = W_down[j, 1+m] * dTr_dn[b, m, j]
    M_down = jnp.swapaxes(dTr_dn, 1, 2) * ba.W_down[None, :, 1:nz]
    M_sum = M_up + M_down
    if cache_dtype is not None:
        D_sum = (M_sum[:, 1:, :] - M_sum[:, :-1, :]).astype(cache_dtype)
        return TransmissionCache(att_up=att_up, att_down=att_down,
                                 M_up=M_up.astype(cache_dtype),
                                 M_down=M_down.astype(cache_dtype),
                                 lo_up=lo_up, sf_up=sf_up, toa_down=toa_down,
                                 hi_down=hi_down, D_sum=D_sum,
                                 row0_sum=M_sum[:, 0, :])
    return TransmissionCache(att_up=att_up, att_down=att_down, M_up=M_up,
                             M_down=M_down, lo_up=lo_up, sf_up=sf_up,
                             toa_down=toa_down, hi_down=hi_down,
                             M_sum=M_sum)


def _cached_band_matvec(M, B_c):
    """``einsum('bim,bm->bi')`` against a cached operator, accumulating in
    B_c's dtype.  When the cache is stored reduced-precision
    (``cache_dtype=bf16``) the operands stay bf16 on TPU (the MXU has a
    native BF16xBF16->F32 dot) but are upcast on every other platform —
    XLA:CPU lacks that dot for these shapes.  The branch is resolved per
    EXECUTING platform via ``lax.platform_dependent``, not the process
    default backend, so a computation explicitly device_put on CPU inside a
    TPU-default process gets the upcast too (r03 advisor finding)."""
    if M.dtype == B_c.dtype:
        return jnp.einsum('bim,bm->bi', M, B_c,
                          preferred_element_type=B_c.dtype)

    def native(M, B):
        return jnp.einsum('bim,bm->bi', M, B.astype(M.dtype),
                          preferred_element_type=B.dtype)

    def upcast(M, B):
        return jnp.einsum('bim,bm->bi', M.astype(B.dtype), B,
                          preferred_element_type=B.dtype)

    return jax.lax.platform_dependent(M, B_c, tpu=native, default=upcast)


def real_gas_fluxes_cached(T, T_g, cache: TransmissionCache, ba: BandArrays,
                           F_star_factor):
    """Per-step flux evaluation with the tau-dependent factors precomputed:
    only the Planck factors depend on T, so the long-wave integrals reduce to
    one batched matmul per direction (MXU work) plus rank-1 corrections."""
    up0 = jnp.pi * B_wavenumber(ba.centre, T_g)
    up = up0[:, None] * cache.att_up
    down = F_star_factor[:, None] * cache.att_down

    T_interface = ba.S @ T
    T_interface = T_interface.at[-1].set(T_g)
    B_c = jnp.pi * B_wavenumber(ba.lw_centre[:, None], T[None, :])
    B_int = jnp.pi * B_wavenumber(ba.lw_centre[:, None], T_interface[None, :])
    B_g = jnp.pi * B_wavenumber(ba.lw_centre, T_g)

    # the GEMV accumulates in f32 even when the cached operators are stored
    # bf16 (see precompute_transmission's cache_dtype); this per-direction
    # evaluation is the DIAGNOSTICS path (saved animation fluxes, OLR) —
    # marches go through real_gas_net_and_diff_cached
    m_up = _cached_band_matvec(cache.M_up, B_c)
    m_down = _cached_band_matvec(cache.M_down, B_c)
    integral_up = -(cache.lo_up * B_int + m_up + cache.sf_up * B_g[:, None])
    integral_down = (cache.toa_down * B_int[:, :1] + m_down
                     + cache.hi_down * B_int)
    up = up.at[ba.lw_list].add(integral_up)
    down = down.at[ba.lw_list].add(integral_down)
    return up.T, down.T


def real_gas_fluxes(T, T_g, tau_interface, ba: BandArrays, F_star_factor):
    """Up/down band fluxes at interfaces [nz, n_bands] (real_gas.py:629-669).

    :param T: [nz-1] cell temperatures (TOA first).
    :param T_g: scalar ground temperature.
    :param tau_interface: [nz, n_nu] optical depth at interfaces.
    :param F_star_factor: pi B(nu, T_star) premultiplier
        R_star^2/d^2 (1-albedo)/4 combined per band, [n_bands].
    """
    nz = tau_interface.shape[0]
    # interface temperatures via the precomputed spline matrix; ground pinned
    T_interface = ba.S @ T
    T_interface = T_interface.at[-1].set(T_g)

    up0 = jnp.pi * B_wavenumber(ba.centre, T_g)                    # [B]
    down0 = F_star_factor                                          # [B]
    att_up = tr.band_attenuation(tau_interface, ba.idx, ba.w, ba.delta,
                                 ref_level=nz - 1)                 # [B, nz]
    att_down = tr.band_attenuation(tau_interface, ba.idx, ba.w, ba.delta,
                                   ref_level=0)
    up = up0[:, None] * att_up
    down = down0[:, None] * att_down

    # long-wave bands: atmospheric emission integrals (real_gas.py:564-627)
    Tr = tr.band_transmission_matrices(tau_interface, ba.lw_idx, ba.lw_w,
                                       ba.lw_delta)                # [L, nz, nz]
    dTr_up = jnp.diff(Tr, axis=2) / ba.dp_int[None, None, :]       # [L, nz, nz-1]
    dTr_dn = jnp.diff(Tr, axis=1) / ba.dp_int[None, :, None]       # [L, nz-1, nz]
    B_c = jnp.pi * B_wavenumber(ba.lw_centre[:, None], T[None, :])      # [L, nz-1]
    B_int = jnp.pi * B_wavenumber(ba.lw_centre[:, None], T_interface[None, :])
    B_g = jnp.pi * B_wavenumber(ba.lw_centre, T_g)                 # [L]

    diag_up = jnp.diagonal(dTr_up, axis1=1, axis2=2)               # [L, nz-1]
    diag_up = jnp.concatenate([diag_up, jnp.zeros_like(diag_up[:, :1])], 1)
    term_lo = ba.W_up[None, :, 0] * B_int * diag_up
    term_in = jnp.einsum('im,bim,bm->bi', ba.W_up[:, 1:nz], dTr_up, B_c)
    term_sf = ba.W_up[None, :, nz] * B_g[:, None] * dTr_up[:, :, nz - 2]
    integral_up = -(term_lo + term_in + term_sf)                   # [L, nz]

    diag_dn = jnp.diagonal(dTr_dn, axis1=1, axis2=2, offset=1)     # [L, nz-1]
    diag_dn = jnp.concatenate([jnp.zeros_like(diag_dn[:, :1]), diag_dn], 1)
    term_toa = ba.W_down[None, :, 0] * B_int[:, :1] * dTr_dn[:, 0, :]
    term_ind = jnp.einsum('jm,bmj,bm->bj', ba.W_down[:, 1:nz], dTr_dn, B_c)
    term_up = ba.W_down[None, :, nz] * B_int * diag_dn
    integral_down = term_toa + term_ind + term_up                  # [L, nz]

    up = up.at[ba.lw_list].add(integral_up)
    down = down.at[ba.lw_list].add(integral_down)
    return up.T, down.T      # [nz, n_bands]


@jax.jit
def _net_flux(T, T_g, tau_interface, ba: BandArrays, F_star_factor, delta):
    up, down = real_gas_fluxes(T, T_g, tau_interface, ba, F_star_factor)
    return jnp.sum((up - down) * delta[None, :], axis=1)


def _net_and_diff(up, down, delta):
    """(net, net_diff) with the adjacent-interface difference taken PER BAND
    before the band reduction.

    The heating tendency divides ``net[k+1] - net[k]`` by dp; differencing
    the two ~1e2 W/m^2 band sums directly leaves f32 reduction-order noise of
    ~|net| * eps ~ 1e-5 W/m^2 on the difference, which at micro-mass TOA
    levels (dp ~ 0.1 Pa) turns into a spurious, batch-layout-dependent
    heating of radiatively-decoupled layers — BENCH_r02's
    real_gas_earth_ensemble member 47 (F_scale=1.074) cooled the p=0.25 Pa
    level to the negative-T abort this way (CPU f64, CPU f32 and smaller TPU
    batches all converge; only the 64-member GEMM rounding realization
    tripped it).  Differencing per band first bounds the noise by
    ~sqrt(L) * eps * |band contribution| instead — ~20x smaller.  In f64 the
    two forms agree to machine epsilon (parity tests unchanged)."""
    ud = up - down                                      # [nz, B]
    net = jnp.sum(ud * delta[None, :], axis=1)[:, None]
    net_diff = jnp.sum((ud[1:, :] - ud[:-1, :]) * delta[None, :],
                       axis=1)[:, None]
    return net, net_diff


def real_gas_net_and_diff_cached(T, T_g, cache: TransmissionCache,
                                 ba: BandArrays, F_star_factor, delta):
    """March-path (net, net_diff) — the per-step hot function.

    Net flux only ever consumes the interior operators through
    -(m_up + m_down), so the march streams the summed operator: M_sum
    [L, nz, nz-1] in f32 (half the bytes of the per-direction pair) or the
    row-differenced D_sum [L, nz-1, nz-1] in the reduced dtype (a quarter).

    Full-precision layout: one [L, nz, nz-1] einsum materialises the
    per-band m_sum rows so the adjacent-interface difference can be taken
    PER BAND before the band reduction — the conditioning that fixed
    BENCH_r02's failed ensemble member (see :func:`_net_and_diff`).

    Reduced layout: band-reduce FIRST, reconstruct after.  The per-band
    m rows never materialise — only their band-weighted sum enters net — so
    the per-step heavy work is exactly ONE reduced-precision einsum over
    D_sum, followed by rank-1 f32 base terms and a single [nz-1]-vector
    prefix (a generated-triangular matvec: jnp.cumsum lowers to a log-depth
    chain of small kernels that measurably ate the bandwidth win).  The
    operator part of net_diff IS the quantized E — tendency noise is bounded
    by the local flux divergence, not the absolute flux."""
    up0 = jnp.pi * B_wavenumber(ba.centre, T_g)
    T_interface = ba.S @ T
    T_interface = T_interface.at[-1].set(T_g)
    B_c = jnp.pi * B_wavenumber(ba.lw_centre[:, None], T[None, :])
    B_int = jnp.pi * B_wavenumber(ba.lw_centre[:, None], T_interface[None, :])
    B_g = jnp.pi * B_wavenumber(ba.lw_centre, T_g)

    # base (everything except the interior operators): rank-1 f32 terms
    ud_base = up0[:, None] * cache.att_up \
        - F_star_factor[:, None] * cache.att_down                # [B, nz]
    lw_base = -(cache.lo_up * B_int + cache.sf_up * B_g[:, None]) \
        - (cache.toa_down * B_int[:, :1] + cache.hi_down * B_int)  # [L, nz]

    if cache.M_sum is not None:
        m_sum = jnp.einsum('bim,bm->bi', cache.M_sum, B_c,
                           preferred_element_type=B_c.dtype)     # [L, nz]
        ud = ud_base.at[ba.lw_list].add(lw_base - m_sum)
        w = ud * delta[:, None]                                  # [B, nz]
        net = jnp.sum(w, axis=0)
        net_diff = jnp.sum(w[:, 1:] - w[:, :-1], axis=0)
        return net[:, None], net_diff[:, None]

    ud_base = ud_base.at[ba.lw_list].add(lw_base)
    w = ud_base * delta[:, None]                                 # [B, nz]
    net_base = jnp.sum(w, axis=0)                                # [nz]
    diff_base = jnp.sum(w[:, 1:] - w[:, :-1], axis=0)            # [nz-1]

    # XLA:CPU lacks a BF16xBF16->F32 dot for these shapes — upcast off-TPU
    # (branch resolved per executing platform, see _cached_band_matvec)
    E = _cached_band_matvec(cache.D_sum, B_c)                    # [L, nz-1]
    dl = delta[ba.lw_list]                                       # [L]
    c0 = -jnp.sum(dl * jnp.einsum('bm,bm->b', cache.row0_sum, B_c))
    g = -(E.T @ dl)                                              # [nz-1]
    nz_i = g.shape[0] + 1
    tri = (jnp.arange(nz_i)[:, None]
           > jnp.arange(nz_i - 1)[None, :]).astype(B_c.dtype)
    net = net_base + c0 + tri @ g
    net_diff = diff_base + g
    return net[:, None], net_diff[:, None]


# jitted aliases for host-side diagnostics: eager dispatch of the band einsums
# is latency-bound through the axon tunnel
_real_gas_fluxes_jit = jax.jit(real_gas_fluxes)
_band_attenuation_jit = functools.partial(jax.jit, static_argnames=(
    'ref_level',))(tr.band_attenuation)


# max_steps stays dynamic (it's only compared in the while cond): the chunked
# march passes a growing i0+chunk_steps and must not retrace per chunk
def _real_gas_evolve_core(state: ColumnState, T_g, tau_interface,
                          ba: BandArrays, F_star_factor, delta, p_interface,
                          p_centre_col, flux_thresh, convective_adjust=False,
                          t_end=4.0, conv_thresh=1e-5, conv_t_multiplier=5.0,
                          net_flux_thresh=1e-7, net_flux_percentile=95,
                          max_steps=500_000, conv_method='reference', i0=0,
                          final_reset=True, cache_dtype=None, check_every=1,
                          dip_memory=False, debug=False):
    # tau (composition) is fixed during the march: hoist the transmission
    # matrices and integral-weight products out of the loop; each step is then
    # a couple of small batched matmuls over the Planck factors.
    cache = precompute_transmission(tau_interface, ba, cache_dtype)

    def net_fn(T):
        return real_gas_net_and_diff_cached(T[:, 0], T_g, cache, ba,
                                            F_star_factor, delta)
    return column.evolve_to_equilibrium(
        state, net_fn, p_interface, p_centre_col, flux_thresh=flux_thresh,
        convective_adjust=convective_adjust, t_end=t_end,
        conv_thresh=conv_thresh, conv_t_multiplier=conv_t_multiplier,
        net_flux_thresh=net_flux_thresh,
        net_flux_percentile=net_flux_percentile, max_steps=max_steps,
        p_descending=False, conv_method=conv_method, i0=i0,
        final_reset=final_reset, check_every=check_every,
        dip_memory=dip_memory, debug=debug)


_real_gas_evolve = functools.partial(jax.jit, static_argnames=(
    'convective_adjust', 'net_flux_percentile', 'conv_method', 'final_reset',
    'cache_dtype', 'check_every', 'dip_memory', 'debug'))(_real_gas_evolve_core)


@functools.partial(jax.jit, static_argnames=('convective_adjust',
                                             'net_flux_percentile',
                                             'conv_method', 'final_reset',
                                             'cache_dtype'))
def _real_gas_evolve_debug(state: ColumnState, T_g, tau_interface,
                           ba: BandArrays, F_star_factor, delta, p_interface,
                           p_centre_col, flux_thresh, convective_adjust=False,
                           t_end=4.0, conv_thresh=1e-5, conv_t_multiplier=5.0,
                           net_flux_thresh=1e-7, net_flux_percentile=95,
                           max_steps=500_000, conv_method='reference', i0=0,
                           final_reset=True, cache_dtype=None):
    """checkify-instrumented march (SURVEY §5 sanitizer row): same physics as
    :func:`_real_gas_evolve` but every step carries user checks locating the
    first non-finite flux/temperature (flat index, step, simulated time).
    Returns ``(checkify_error, (state, info))``; the caller throws on host."""
    checked = checkify.checkify(
        functools.partial(_real_gas_evolve_core,
                          convective_adjust=convective_adjust,
                          net_flux_percentile=net_flux_percentile,
                          conv_method=conv_method, final_reset=final_reset,
                          cache_dtype=cache_dtype, debug=True),
        errors=checkify.user_checks)
    return checked(state, T_g, tau_interface, ba, F_star_factor, delta,
                   p_interface, p_centre_col, flux_thresh, t_end=t_end,
                   conv_thresh=conv_thresh,
                   conv_t_multiplier=conv_t_multiplier,
                   net_flux_thresh=net_flux_thresh, max_steps=max_steps,
                   i0=i0)


@functools.partial(jax.jit, static_argnames=('convective_adjust', 'n_snaps',
                                             'conv_method', 'with_fluxes',
                                             'cache_dtype'))
def _real_gas_evolve_snapshots(state: ColumnState, T_g, tau_interface,
                               ba: BandArrays, F_star_factor, delta, delta_lw,
                               delta_sw, p_interface, p_centre_col, flux_thresh,
                               n_snaps, convective_adjust=False, t_end=4.0,
                               conv_thresh=1e-5, conv_t_multiplier=5.0,
                               conv_method='reference', i0=0,
                               with_fluxes=False, cache_dtype=None):
    """Fused save-mode march: per-step snapshots of (t, T) and optionally the
    lw/sw-split flux sums the reference's save_data records
    (real_gas.py:720-746), pulled to the host one chunk at a time."""
    cache = precompute_transmission(tau_interface, ba, cache_dtype)

    def net_fn(T):
        return real_gas_net_and_diff_cached(T[:, 0], T_g, cache, ba,
                                            F_star_factor, delta)

    snap_fn = None
    if with_fluxes:
        def snap_fn(T):
            up, down = real_gas_fluxes_cached(T[:, 0], T_g, cache, ba,
                                              F_star_factor)
            return (up @ delta_lw, down @ delta_lw,
                    up @ delta_sw, down @ delta_sw)

    return column.evolve_snapshots(
        state, net_fn, p_interface, p_centre_col, n_snaps=n_snaps,
        steps_per_snap=1, snapshot_fn=snap_fn, snapshot_on='post',
        flux_thresh=flux_thresh, convective_adjust=convective_adjust,
        t_end=t_end, conv_thresh=conv_thresh,
        conv_t_multiplier=conv_t_multiplier, conv_method=conv_method, i0=i0,
        p_descending=False)


class RealGas:
    """User-facing real-gas band column model (real_gas.py:187-299 ctor API)."""

    def __init__(self, nz, ny, molecule_names, T_g=None, q_funcs=None,
                 q_funcs_args=None, n_nu_bands=40, T_star=T_sun, R_star=R_sun,
                 star_planet_dist=AU, albedo=0.3, temp_change=1.0,
                 delta_temp_change=0.01, T_func=None,
                 p_surface=p_surface_earth, p_toa=p_toa_earth,
                 table_folder=None, dtype=None, cache_dtype=None):
        if ny != 1:
            raise NotImplementedError('RealGas supports ny=1 (like the '
                                      'reference); batch columns with vmap')
        self.ny = 1
        self.p_surface = float(p_surface)
        self.p_toa = float(p_toa)
        self.table_folder = table_folder
        # optional storage dtype for the cached transmission operators (e.g.
        # jnp.bfloat16): a bandwidth/precision trade for the fused march
        self.cache_dtype = cache_dtype
        self.dtype = dtype or jnp.zeros(0).dtype
        self.star = {'T': float(T_star), 'R': float(R_star),
                     'star_planet_dist': float(star_planet_dist)}
        self.F_stellar_constant = sigma * self.star['T'] ** 4 * \
            self.star['R'] ** 2 / self.star['star_planet_dist'] ** 2
        self.latitude = np.zeros(1)
        self.albedo = float(np.asarray(albedo).ravel()[0])
        self.solar_latitude_factor = np.ones(1)
        self.temp_change = float(temp_change)
        self.delta_temp_change = float(delta_temp_change)
        self.T0 = get_isothermal_temp(self.albedo, self.F_stellar_constant)
        self.T_func = T_func
        solve_T_g = T_g is None and T_func is None
        if T_g is None:
            if T_func is not None:
                self.T_g = float(T_func(np.array(self.p_surface)))
            else:
                self.T_g = float(self.T0) + 20.0      # greenhouse guess
        else:
            self.T_g = float(T_g)

        self.molecule_names = list(molecule_names)
        if q_funcs is None:
            q_funcs = {m: molecules[m]['q'] for m in self.molecule_names}
            default_args = {m: molecules[m]['q_args']
                            for m in self.molecule_names}
        else:
            default_args = None
        self.q_funcs = q_funcs
        if q_funcs_args is None:
            if default_args is None:
                raise ValueError('q_funcs_args required with custom q_funcs')
            self.q_funcs_args = default_args
        elif list(q_funcs_args.keys()) == list(self.q_funcs.keys()):
            self.q_funcs_args = q_funcs_args
        else:
            raise ValueError("Keys don't match in q_funcs and q_funcs_args")

        # wavenumber spacing from the first molecule's table (real_gas.py:275-277)
        self._tables = {m: hitran.load_table(m, self.table_folder)
                        for m in self.molecule_names}
        nu0 = self._tables[self.molecule_names[0]]['nu']
        self.d_nu = float(nu0[1] - nu0[0])
        self.n_nu_bands = int(n_nu_bands)
        self._build_wavenumber_machinery()

        p_col = self.get_p_grid(nz)
        self.p_interface = np.sort(p_col)[:, None]           # ascending, [nz, 1]
        self.p = 0.5 * (self.p_interface[:-1] + self.p_interface[1:])
        if T_func is None:
            T = np.ones_like(self.p) * self.T_g
            T_interface = np.ones(self.nz) * self.T_g
        else:
            T = np.asarray(T_func(self.p))
            T_interface = np.asarray(T_func(self.p_interface[:, 0]))
        self._T_host = T
        self._refresh_tau(T_interface)
        self._build_weights()

        self._state = ColumnState(
            T=jnp.asarray(T, self.dtype),
            net_flux=jnp.zeros((self.nz, 1), self.dtype),
            t=jnp.asarray(0.0, self.dtype),
            tsi=init_time_step_info(self.nz - 1, self.temp_change,
                                    self.delta_temp_change, self.dtype))
        self.up_flux, self.down_flux = self.get_flux()
        self.net_flux = (self.up_flux * self.nu_bands['delta']).sum(axis=1) - \
            (self.down_flux * self.nu_bands['delta']).sum(axis=1)
        self._state = self._state.replace(
            net_flux=jnp.asarray(self.net_flux[:, None], self.dtype))
        if solve_T_g:
            self.inital_Tg_guess()

    # ------------- host-side construction -------------

    def _build_wavenumber_machinery(self):
        self.nu, self.nu_lw, self._nu_overlap, self.nu_sw = \
            bands_mod.get_wavenumber_array(self.T_g, self.star['T'], self.d_nu)
        self.nu_bands = bands_mod.get_wavenumber_bands(
            self.n_nu_bands, self.T_g, self.star['T'], self.nu_lw,
            self._nu_overlap, self.nu_sw)
        self._packed = tr.PackedBands(self.nu_bands, self.nu)
        self._drop_device_cache()

    def _absorption_lookup(self, p, T, wavenumber, name):
        return tr.crop_lookup(p, T, wavenumber, self._tables[name])

    def _refresh_tau(self, T_interface):
        """(Re)compute tau at interfaces for the current composition
        (real_gas.py:291-292)."""
        self.tau_interface = tr.optical_depth(
            self.p_interface[:, 0], T_interface, self.nu, self.molecule_names,
            self.q_funcs, self.q_funcs_args, self._absorption_lookup, g)
        self._drop_device_cache()

    def _build_weights(self):
        """Static flux-integral weights + the spline interpolation matrix."""
        self._W_up, self._W_down = tr.flux_integral_weights(
            self.p_interface[:, 0], self.p[:, 0])
        # InterpolatedUnivariateSpline is linear in the data: extract its
        # matrix by interpolating unit vectors (exact FITPACK parity)
        n = self.nz - 1
        S = np.zeros((self.nz, n))
        pc = self.p[:, 0]
        pi = self.p_interface[:, 0]
        k = min(3, n - 1)
        for j in range(n):
            e = np.zeros(n)
            e[j] = 1.0
            S[:, j] = InterpolatedUnivariateSpline(pc, e, k=k)(pi)
        self._S = S

    @property
    def band_arrays(self) -> BandArrays:
        """Device-resident packed bands; cached (re-uploading the packed
        index/weight arrays every call dominates wall time on a tunneled
        accelerator).  Invalidated by _build_wavenumber_machinery/_refresh_tau
        via _drop_device_cache."""
        if getattr(self, '_band_arrays_cache', None) is not None:
            return self._band_arrays_cache
        d = self.dtype
        pk = self._packed
        self._band_arrays_cache = BandArrays(
            idx=jnp.asarray(pk.idx), w=jnp.asarray(pk.w, d),
            delta=jnp.asarray(pk.delta, d), centre=jnp.asarray(pk.centre, d),
            lw_idx=jnp.asarray(pk.lw_idx), lw_w=jnp.asarray(pk.lw_w, d),
            lw_delta=jnp.asarray(pk.lw_delta, d),
            lw_centre=jnp.asarray(pk.lw_centre, d),
            lw_list=jnp.asarray(pk.lw_list),
            W_up=jnp.asarray(self._W_up, d), W_down=jnp.asarray(self._W_down, d),
            S=jnp.asarray(self._S, d),
            dp_int=jnp.asarray(np.diff(self.p_interface[:, 0]), d))
        return self._band_arrays_cache

    def _drop_device_cache(self):
        self._band_arrays_cache = None
        self._F_star_cache = None
        self._tau_device = None
        self._geom_device_cache = None

    @property
    def _geom_device(self):
        """Cached device copies of the static per-step geometry (band
        widths, interface/centre pressures): host-driven take_time_step
        loops must not re-upload them every step over the tunnel
        (r04 review finding)."""
        if getattr(self, '_geom_device_cache', None) is not None:
            return self._geom_device_cache
        d = self.dtype
        self._geom_device_cache = (
            jnp.asarray(self.nu_bands['delta'], d),
            jnp.asarray(self.p_interface, d),
            jnp.asarray(self.p[:, 0], d))
        return self._geom_device_cache

    @property
    def _F_star_factor(self):
        if getattr(self, '_F_star_cache', None) is not None:
            return self._F_star_cache
        self._F_star_cache = jnp.asarray(
            np.pi * np.asarray(B_wavenumber(self._packed.centre,
                                            self.star['T']))
            * self.star['R'] ** 2 / self.star['star_planet_dist'] ** 2
            * (1 - self.albedo) / 4, self.dtype)
        return self._F_star_cache

    @property
    def tau_device(self):
        if getattr(self, '_tau_device', None) is not None:
            return self._tau_device
        self._tau_device = jnp.asarray(self.tau_interface, self.dtype)
        return self._tau_device

    def get_p_grid(self, nz, min_absorb_coef_use=10e-6,
                   min_log_p_spacing_factor=5000, max_log_p_spacing_factor=50,
                   max_max_log_p_spacing=0.2):
        """Absorption-weighted adaptive pressure grid (real_gas.py:404-503):
        log-p spacing shrinks where specific humidity x absorption is large."""
        auto = nz == 'auto'
        p_initial_size = int(1e6) if auto else int(nz * 1000)
        p_interface = np.logspace(np.log10(self.p_surface),
                                  np.log10(self.p_toa), p_initial_size)
        q = np.zeros_like(p_interface)
        for name in self.molecule_names:
            table = self._tables[name]
            k_all = tr.nearest_lookup(table['p'],
                                      np.ones_like(table['p']) * self.T_g,
                                      table['nu'], table)
            use_nu = np.max(k_all, axis=0) > min_absorb_coef_use
            k_mean = np.mean(k_all[:, use_nu], axis=1)
            k_mean = k_mean / np.max(k_mean)
            if len(k_mean) > 1:
                coef_interp = interp1d(table['p'], k_mean)
                to_interp = np.where(p_interface >= table['p'].min())[0]
                k_of_p = np.ones_like(p_interface)
                k_of_p[to_interp] = coef_interp(p_interface[to_interp])
                k_of_p[p_interface < table['p'].min()] = k_of_p[to_interp[-1]]
            else:
                k_of_p = np.ones_like(p_interface)
            q_mol = np.asarray(self.q_funcs[name](p_interface,
                                                  *self.q_funcs_args[name]))
            q = q + q_mol * k_of_p

        log_p = np.log10(p_interface)
        if auto:
            log_q = np.log10(q)
            log_q[q == 0] = log_q[q > 0].min()
            min_sp = -log_q.max() / min_log_p_spacing_factor
            max_sp = np.clip(-log_q.min() / max_log_p_spacing_factor, min_sp,
                             max_max_log_p_spacing)
            fract_large = (q > 0.9 * q.max()).sum() / q.size
            min_sp = fract_large * max_sp + (1 - fract_large) * min_sp

            if log_q.min() == log_q.max():
                spacing_of = lambda lq: min_sp
            else:
                gradient = (max_sp - min_sp) / (log_q.min() - log_q.max())
                intercept = max_sp - gradient * log_q.min()
                spacing_of = lambda lq: gradient * lq + intercept

            current = log_p[0]
            out = []
            while current > log_p[-1]:
                out.append(current)
                ind = np.abs(log_p - current).argmin()
                current = out[-1] - spacing_of(log_q[ind])
            out = np.array(out)
            cum = np.cumsum(np.abs(np.ediff1d(out)))
            cum = cum * (log_p[0] - log_p[-1]) / cum[-1]
            log_p_final = np.concatenate((out[:1], out[0] - cum))
            self.nz = len(log_p_final)
        else:
            alpha = np.log10(log_p[0] - log_p[-1] + 1) / (nz - 1)
            log_p_final = log_p[0] + 1 - 10 ** (alpha * np.arange(nz))
            # the reference checks exact float equality here
            # (real_gas.py:499-500) and crashes on rounding for many nz values
            # (e.g. 36, 40); we snap the endpoint when it is merely rounding.
            if not np.isclose(log_p_final[-1], log_p[-1], rtol=0, atol=1e-9):
                raise ValueError('Too few grid points to cover pressure grid')
            log_p_final[-1] = log_p[-1]
            self.nz = int(nz)
        return 10 ** log_p_final

    # ------------- state views -------------

    @property
    def T(self):
        return np.asarray(self._state.T)

    @T.setter
    def T(self, value):
        self._state = self._state.replace(T=jnp.asarray(value, self.dtype))

    @property
    def state(self) -> ColumnState:
        return self._state

    # ------------- fluxes -------------

    def get_flux(self, include_olr_breakdown=False):
        """Up/down band fluxes [nz, n_nu_bands] (real_gas.py:629-669)."""
        up, down = _real_gas_fluxes_jit(
            jnp.asarray(self.T[:, 0], self.dtype),
            jnp.asarray(self.T_g, self.dtype),
            self.tau_device, self.band_arrays,
            self._F_star_factor)
        up, down = np.asarray(up), np.asarray(down)
        if include_olr_breakdown:
            # surface vs atmosphere contributions to OLR (real_gas.py:643-665)
            att = np.asarray(_band_attenuation_jit(
                self.tau_device,
                self.band_arrays.idx, self.band_arrays.w,
                self.band_arrays.delta, ref_level=self.nz - 1))
            surface = np.pi * np.asarray(
                B_wavenumber(self._packed.centre, self.T_g)) * att[:, 0]
            olr_cont = {'surface': surface, 'atmos': up[0] - surface}
            return up, down, olr_cont
        return up, down

    def take_time_step(self, t, T_initial=None, changing_tau=False,
                       convective_adjust=False, net_flux_thresh=1e-7,
                       net_flux_percentile=95, conv_thresh=1e-5,
                       conv_t_multiplier=5):
        """One adaptive step (real_gas.py:671-718)."""
        if t == 0 and T_initial is not None:
            self.T = T_initial
        self._state = self._state.replace(t=jnp.asarray(t, self.dtype))
        delta_nu, p_int_dev, p_c_dev = self._geom_device
        # state T stays on device (self.T would pull D2H then re-upload)
        net = _net_flux(self._state.T[:, 0].astype(self.dtype),
                        jnp.asarray(self.T_g, self.dtype),
                        self.tau_device,
                        self.band_arrays, self._F_star_factor,
                        delta_nu)
        self._state, delta = column.update_temp(
            self._state, net[:, None],
            p_int_dev, p_c_dev, changing_tau=changing_tau,
            convective_adjust=convective_adjust,
            net_flux_thresh=net_flux_thresh,
            net_flux_percentile=net_flux_percentile, conv_thresh=conv_thresh,
            conv_t_multiplier=conv_t_multiplier, p_descending=False)
        nf_np, t_np, delta_np = jax.device_get(
            (self._state.net_flux, self._state.t, delta))
        self.net_flux = np.asarray(nf_np)[:, 0]
        return float(t_np), float(delta_np)

    def evolve_to_equilibrium(self, data_dict=None, flux_thresh=1e-3,
                              T_initial=None, convective_adjust=False,
                              save=False, t_end=4.0, conv_thresh=1e-5,
                              conv_t_multiplier=5, conv_method='reference',
                              chunk_steps=None, verbose=False, check_every=1,
                              dip_memory=False, debug=False):
        """March to equilibrium (base.py:266-335) with the fused device loop.

        :param chunk_steps: split the fused march into device calls of this
            many steps (bounds single XLA executions on watchdog-limited
            accelerators and enables progress telemetry).
        :param verbose: print per-chunk convergence telemetry (steps, t,
            delta_net_flux — the base.py:324-327 progress line); implies
            ``chunk_steps=1000`` when chunking wasn't requested.
        :param check_every: evaluate the exit criteria every this many steps
            (save=False path only) — amortises the per-step percentile/exit
            machinery that bounds single-column marches on TPU; may overshoot
            the exit by up to check_every-1 steps (see
            column.evolve_to_equilibrium).  Default 1 = reference semantics.
        :param dip_memory: with ``check_every=K``, evaluate the full exit
            criteria every step inside the chunk and freeze the carry at the
            first stop event — bit-identical to ``check_every=1`` (see
            column.evolve_to_equilibrium); use for convective marches.
        :param debug: run the march under :mod:`jax.experimental.checkify`
            user checks (SURVEY §5 sanitizer row): a failure raises
            ``checkify.JaxRuntimeError`` on the host naming the first
            non-finite net-flux interface / non-finite temperature level /
            below-zero level plus the step and simulated time, instead of
            the plain path's location-free ``FloatingPointError``.
            save=False + check_every=1 only; numerics are unchanged.
        """
        if debug and (save or check_every != 1 or dip_memory):
            raise ValueError('debug=True supports the fused save=False '
                             'per-step march only (check_every=1, '
                             'dip_memory=False)')
        # data_dict=None restarts the clock (base.py:301-306): each fresh call
        # gets the t=0 forced first step.  The starting t is tracked as a
        # HOST value so neither the T_initial t==0 check nor the fresh
        # data_dict seed forces a device sync (a ~25 ms tunnel round trip
        # each — they dominated single-march walls); the fresh seed's T
        # snapshot is deferred into the march's final batched pull.
        t_host = 0.0 if data_dict is None else float(data_dict['t'][-1])
        self._state = self._state.replace(t=jnp.asarray(t_host, self.dtype))
        if T_initial is not None and t_host == 0:
            self.T = T_initial
        T_seed_dev = None
        if data_dict is None:
            T_seed_dev = self._state.T        # device ref; pulled at the end
            data_dict = {'t': [t_host], 'T': [None]}
        if save:
            if T_seed_dev is not None:   # snapshot path pulls per chunk anyway
                data_dict['T'][0] = np.asarray(jax.device_get(T_seed_dev))
            # fused snapshot march: chunks of per-step snapshots as one
            # lax.scan each, one batched device_get per chunk (the reference's
            # loop syncs twice per step; real_gas.py:720-746 save semantics,
            # fluxes recomputed at the post-step temperature)
            with_fluxes = 'flux' in data_dict
            with_q = 'q' in data_dict
            sw_mask = self.nu_bands['sw']
            d_nu = self.nu_bands['delta']
            args = (jnp.asarray(self.T_g, self.dtype), self.tau_device,
                    self.band_arrays, self._F_star_factor,
                    jnp.asarray(d_nu, self.dtype),
                    jnp.asarray(np.where(sw_mask, 0.0, d_nu), self.dtype),
                    jnp.asarray(np.where(sw_mask, d_nu, 0.0), self.dtype),
                    jnp.asarray(self.p_interface, self.dtype),
                    jnp.asarray(self.p[:, 0], self.dtype))
            ft = jnp.asarray(flux_thresh, self.dtype)
            # honor chunk_steps exactly like grey's save path (grey.py:487):
            # it exists to bound single-XLA-execution length against
            # watchdog-limited accelerators
            chunk = int(chunk_steps) if chunk_steps else 256
            i0 = 0
            t_start = t_chunk_start = data_dict['t'][-1]
            while True:
                t_end_chunk = float(t_end) - (t_chunk_start - t_start) \
                    / SECONDS_PER_YEAR
                self._state, info, snaps = _real_gas_evolve_snapshots(
                    self._state, *args, ft, n_snaps=chunk,
                    convective_adjust=convective_adjust, t_end=t_end_chunk,
                    conv_thresh=conv_thresh,
                    conv_t_multiplier=conv_t_multiplier,
                    conv_method=conv_method, i0=i0, with_fluxes=with_fluxes,
                    cache_dtype=self.cache_dtype)
                info_np, snaps_np = jax.device_get((info, snaps))
                steps = np.asarray(snaps_np['steps'])
                prev = i0
                for k in range(chunk):
                    if steps[k] <= prev:
                        break
                    prev = int(steps[k])
                    data_dict['t'].append(float(snaps_np['t'][k]))
                    data_dict['T'].append(np.asarray(snaps_np['T'][k]))
                    if with_fluxes:
                        fx = snaps_np['extra']
                        data_dict['flux']['lw_up'].append(np.asarray(fx[0][k]))
                        data_dict['flux']['lw_down'].append(
                            np.asarray(fx[1][k]))
                        data_dict['flux']['sw_up'].append(np.asarray(fx[2][k]))
                        data_dict['flux']['sw_down'].append(
                            np.asarray(fx[3][k]))
                    if with_q:
                        for name in data_dict['q']:
                            q_mol = np.asarray(self.q_funcs[name](
                                self.p[:, 0], *self.q_funcs_args[name]))
                            data_dict['q'][name].append(
                                ppmv_from_humidity(q_mol, name))
                i0 = int(info_np.steps)
                ft = info.flux_thresh
                t_chunk_start = data_dict['t'][-1]
                if bool(info_np.nan):
                    raise FloatingPointError(
                        'non-finite temperature or flux encountered during '
                        'the march (NaN sentinel) — check forcing/table '
                        'inputs')
                if bool(info_np.failed):
                    raise ValueError('Temperature is below zero')
                if bool(info_np.equilibrium) or bool(info_np.timed_out):
                    break
            self._equilibrium_info = info_np
            self._state = self._state.replace(
                tsi=column.reset_time_step_info(self._state.tsi))
            self.up_flux, self.down_flux = self.get_flux()
            nf = jax.device_get(self._state.net_flux)
            self.net_flux = np.asarray(nf)[:, 0]
            return data_dict
        if verbose and chunk_steps is None:
            chunk_steps = 1000
        args = (jnp.asarray(self.T_g, self.dtype), self.tau_device,
                self.band_arrays, self._F_star_factor,
                jnp.asarray(self.nu_bands['delta'], self.dtype),
                jnp.asarray(self.p_interface, self.dtype),
                jnp.asarray(self.p[:, 0], self.dtype))
        kw = dict(convective_adjust=convective_adjust,
                  conv_thresh=conv_thresh, conv_t_multiplier=conv_t_multiplier,
                  conv_method=conv_method, cache_dtype=self.cache_dtype,
                  check_every=int(check_every), dip_memory=bool(dip_memory))
        ft = jnp.asarray(flux_thresh, self.dtype)
        kw_dbg = dict(convective_adjust=convective_adjust,
                      conv_thresh=conv_thresh,
                      conv_t_multiplier=conv_t_multiplier,
                      conv_method=conv_method, cache_dtype=self.cache_dtype)
        if chunk_steps is None:
            if debug:
                err, (self._state, info) = _real_gas_evolve_debug(
                    self._state, *args, ft, t_end=float(t_end), **kw_dbg)
                err.throw()    # raises JaxRuntimeError with the location
            else:
                self._state, info = _real_gas_evolve(self._state, *args, ft,
                                                     t_end=float(t_end), **kw)
        else:
            def chunk_evolve(state, ft_c, *, i0, t_end, max_steps):
                if debug:
                    err, out = _real_gas_evolve_debug(
                        state, *args, ft_c, i0=i0, t_end=t_end,
                        max_steps=max_steps, final_reset=False, **kw_dbg)
                    err.throw()   # per chunk: a debug march syncs anyway
                    return out
                return _real_gas_evolve(state, *args, ft_c, i0=i0,
                                        t_end=t_end, max_steps=max_steps,
                                        final_reset=False, **kw)
            self._state, info = column.run_chunked_march(
                self._state, chunk_evolve,
                t_host_start=data_dict['t'][-1], t_end=t_end,
                chunk_steps=chunk_steps, flux_thresh=ft, verbose=verbose)
        # batch every device->host read into one transfer (each separate sync
        # is a full tunnel round trip on axon)
        self._equilibrium_info, nf_np, t_np, T_np, T_seed_np = jax.device_get(
            (info, self._state.net_flux, self._state.t, self._state.T,
             T_seed_dev))
        if T_seed_np is not None:
            data_dict['T'][0] = np.asarray(T_seed_np)
        if bool(self._equilibrium_info.nan):
            raise FloatingPointError(
                'non-finite temperature or flux encountered during the march '
                '(NaN sentinel) — check forcing/table inputs')
        if bool(self._equilibrium_info.failed):
            raise ValueError('Temperature is below zero')
        if not bool(self._equilibrium_info.equilibrium) and \
                not bool(self._equilibrium_info.timed_out):
            raise RuntimeError(
                'march hit the max_steps safety cap without converging or '
                'reaching t_end — use chunk_steps, raise t_end, or loosen '
                'flux_thresh')
        self.up_flux, self.down_flux = self.get_flux()
        self.net_flux = np.asarray(nf_np)[:, 0]
        data_dict['t'].append(float(t_np))
        data_dict['T'].append(np.asarray(T_np))
        return data_dict

    # ------------- T_g solvers (real_gas.py:505-562) -------------

    def inital_Tg_guess(self):
        """Newton-solve T_g so the initial column-summed net flux vanishes,
        then rebuild bands/tau at the solution (real_gas.py:505-528)."""
        delta = jnp.asarray(self.nu_bands['delta'], self.dtype)

        def f(x):
            T_g = float(np.asarray(x).ravel()[0])
            net = _net_flux(jnp.full((self.nz - 1,), T_g, self.dtype),
                            jnp.asarray(T_g, self.dtype),
                            jnp.asarray(self.tau_interface, self.dtype),
                            self.band_arrays, self._F_star_factor, delta)
            return float(np.sum(np.asarray(net)))

        self.T_g = float(optimize.newton(f, self.T_g))
        self.T = np.ones_like(self.p) * self.T_g
        T_interface = np.ones(self.nz) * self.T_g
        self._build_wavenumber_machinery()
        self._refresh_tau(T_interface)
        self.up_flux, self.down_flux = self.get_flux()
        self.net_flux = (self.up_flux * self.nu_bands['delta']).sum(axis=1) - \
            (self.down_flux * self.nu_bands['delta']).sum(axis=1)
        self._state = self._state.replace(
            net_flux=jnp.asarray(self.net_flux[:, None], self.dtype))

    def find_Tg(self, flux_thresh=0.1, tol=0.5, convective_adjust=False,
                verbose=False):
        """Outer Newton on the TOA flux balance, each iteration a full
        equilibrium march (real_gas.py:530-562)."""
        def f(x):
            self.T_g = float(np.asarray(x).ravel()[0])
            if verbose:
                print(f'Trying T_g = {self.T_g:.1f} K')
            self._state = self._state.replace(t=jnp.asarray(0.0, self.dtype))
            self.evolve_to_equilibrium(flux_thresh=flux_thresh, save=False,
                                       convective_adjust=convective_adjust)
            return float(self.net_flux[0])
        root = optimize.newton(f, self.T_g, tol=tol)
        return float(np.asarray(root).ravel()[0])

    def evolve_change_compos(self, T_g, q_args, data_dict=None,
                             flux_thresh=1e-3, convective_adjust=False,
                             t_end=2.0):
        """Staged composition/T_g sequence, re-equilibrating after each change
        (real_gas.py:748-785)."""
        self.T_g = float(T_g[0])
        self.T = np.ones_like(self.p) * self.T_g
        self._build_wavenumber_machinery()
        T_interface = np.ones(self.nz) * self.T_g
        self.q_funcs_args = q_args[0]
        self._refresh_tau(T_interface)
        for i in range(len(T_g)):
            self.T_g = float(T_g[i])
            self.q_funcs_args = q_args[i]
            self._refresh_tau(T_interface)
            data_dict = self.evolve_to_equilibrium(
                data_dict, flux_thresh=flux_thresh,
                convective_adjust=convective_adjust, t_end=t_end)
            # avoid a slow restart of the next stage (real_gas.py:784)
            tsi = self._state.tsi
            self._state = self._state.replace(
                tsi=tsi.replace(delta_t=tsi.max_delta_t))
        return data_dict

    # ------------- data/plots -------------

    def save_data(self, data_dict, t):
        """Append T and lw/sw-split flux sums (real_gas.py:720-746)."""
        data_dict['t'].append(t)
        data_dict['T'].append(self.T.copy())
        if 'flux' in data_dict:
            self.up_flux, self.down_flux = self.get_flux()
            sw = self.nu_bands['sw']
            lw = ~sw
            d = self.nu_bands['delta']
            data_dict['flux']['lw_up'].append(
                (self.up_flux[:, lw] * d[lw]).sum(axis=1))
            data_dict['flux']['lw_down'].append(
                (self.down_flux[:, lw] * d[lw]).sum(axis=1))
            data_dict['flux']['sw_up'].append(
                (self.up_flux[:, sw] * d[sw]).sum(axis=1))
            data_dict['flux']['sw_down'].append(
                (self.down_flux[:, sw] * d[sw]).sum(axis=1))
        if 'q' in data_dict:
            for name in data_dict['q']:
                q_mol = np.asarray(self.q_funcs[name](self.p[:, 0],
                                                      *self.q_funcs_args[name]))
                data_dict['q'][name].append(ppmv_from_humidity(q_mol, name))
        return data_dict

    def plot_olr(self, olr_label='Top of atmosphere', ax=None, show_bands=True):
        """OLR spectrum vs the surface blackbody (real_gas.py:787-810)."""
        import matplotlib.pyplot as plt
        from .column import round_any
        surface_up = np.asarray(B_wavenumber(self.nu_lw, self.T_g)) * np.pi
        if ax is None:
            _, ax = plt.subplots(1, 1)
        ax.plot(self.nu_lw, surface_up, color='k',
                label=f'$T_g={self.T_g:.0f}$K blackbody')
        use = ~self.nu_bands['sw']
        use[np.where(~use == True)[0][0] if (~use).any() else -1] = True
        centres = self.nu_bands['centre'][use]
        if show_bands:
            ax.scatter(centres, np.asarray(B_wavenumber(centres, self.T_g))
                       * np.pi, color='k', s=10)
        ax.plot(centres, self.up_flux[0, use], label=olr_label)
        ax.set_xlim((0, round_any(self.nu_lw.max(), 500, 'ceil')))
        ax.set_ylim((0, round_any(surface_up.max(), 0.05, 'ceil')))
        ax.set_xlabel('Wavenumber cm$^{-1}$')
        ax.set_ylabel('Flux Density ((W/m$^2$)/cm$^{-1}$)')
        ax.legend()
        ax.set_title('Upward Planetary Radiation')
        return ax

    def plot_incoming_short_wave(self, sw_label='Surface', ax=None,
                                 show_bands=True):
        """Incoming solar spectrum at TOA vs surface (real_gas.py:812-837)."""
        import matplotlib.pyplot as plt
        from .column import round_any

        def solar_flux(nu):
            return np.asarray(B_wavenumber(nu, self.star['T'])) * np.pi * \
                self.star['R'] ** 2 / self.star['star_planet_dist'] ** 2 * \
                (1 - self.albedo) / 4
        toa = solar_flux(self.nu_sw)
        if ax is None:
            _, ax = plt.subplots(1, 1)
        ax.plot(self.nu_sw, toa, color='k', label='Top of atmosphere')
        use = self.nu_bands['sw']
        centres = self.nu_bands['centre'][use]
        if show_bands:
            ax.scatter(centres, solar_flux(centres), color='k', s=10)
        ax.plot(centres, self.down_flux[-1, use], label=sw_label)
        ax.set_xlim((0, round_any(self.nu_sw.max(), 10000, 'ceil')))
        ax.set_ylim((0, round_any(toa.max(), 0.005, 'ceil')))
        ax.set_xlabel('Wavenumber cm$^{-1}$')
        ax.set_ylabel('Flux Density ((W/m$^2$)/cm$^{-1}$)')
        ax.legend()
        ax.set_title('Downward Solar Radiation')
        return ax

    def __str__(self):
        return 'Real Gas'
