"""Two-stream grey radiative flux operators.

The reference computes long-wave up/down fluxes with a sequential per-level Python
loop (GreyGas.get_lw_flux, /root/reference/Model/radiation/grey.py:251-275):

    up[i]   = up[i+1]   * exp(+dtau[i]) + sigma*T[i]^4 * (1 - exp(+dtau[i]))
    down[i] = down[i+1] * exp(-dtau[i]) + sigma*T[i]^4 * (1 - exp(-dtau[i]))

with the boundary condition at the top of the atmosphere (index -1 in the
reference's surface-first ordering): up = net absorbed stellar flux, down = 0.

Each of these is a first-order affine recurrence x_{k+1} = a_k x_k + b_k, which we
evaluate in log-depth with ``lax.associative_scan`` over the composition monoid
(a, b) o (a', b') = (a a', a' b + b').  Both streams are solved in one scan by
stacking them as a leading channel axis.  Short-wave fluxes are the closed-form
Beer law (grey.py:277-294) and need no scan.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import sigma


def affine_scan(a, b, x0, reverse=False):
    """Solve x_{k+1} = a_k * x_k + b_k for k = 0..n-1 along axis 0.

    :param a, b: arrays [n, ...] of recurrence coefficients.
    :param x0: array [...] initial value.
    :param reverse: if True, solves x_k = a_k * x_{k+1} + b_k with x_n = x0
        (i.e. the recurrence runs from the last element towards the first).
    :return: array [n+1, ...]; element 0 (or n if reverse) equals x0.
    """
    if reverse:
        a = jnp.flip(a, axis=0)
        b = jnp.flip(b, axis=0)

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    A, B = lax.associative_scan(combine, (a, b), axis=0)
    xs = A * x0 + B
    out = jnp.concatenate([jnp.expand_dims(x0, 0), xs], axis=0)
    if reverse:
        out = jnp.flip(out, axis=0)
    return out


def _lw_scan_eval(T, dtau, up_toa, reverse=True):
    """Associative-scan evaluation over trailing-batch arrays [nz-1, b]."""
    e_plus = jnp.exp(dtau)
    e_minus = jnp.exp(-dtau)
    source = sigma * T ** 4
    # channel axis 1: 0 = up-stream, 1 = down-stream
    a = jnp.stack([e_plus, e_minus], 1)
    b = jnp.stack([source * (1.0 - e_plus), source * (1.0 - e_minus)], 1)
    x_toa = jnp.stack([jnp.broadcast_to(up_toa, T.shape[1:]).astype(T.dtype),
                       jnp.zeros(T.shape[1:], T.dtype)])
    flux = affine_scan(a, b, x_toa, reverse=reverse)
    return flux[:, 0], flux[:, 1]


# Batched executor with a custom vmap rule: ensemble-member batch axes
# FLATTEN onto the trailing (lane) axis, so on TPU the whole batch reaches
# the sequential Pallas kernel (ops/pallas_two_stream.py) in one launch
# instead of the associative scan's many small stages — profiled at 4096
# members x nz=60 the scan costs ~0.7 ms/step, ~40x its HBM traffic.
@jax.custom_batching.custom_vmap
def _lw_core(T, dtau, up_toa):
    """[nz-1, b] cells (surface-first) -> (up, down) [nz, b] interfaces.

    The kernel branch resolves per EXECUTING platform via
    ``lax.platform_dependent`` — a CPU-placed computation in a TPU-default
    process must never trace the Mosaic kernel onto CPU (the r03 advisor's
    real_gas bug class)."""
    if T.dtype == jnp.float32 and T.shape[1] >= 8:
        from .pallas_two_stream import lw_flux_lanes
        return jax.lax.platform_dependent(
            T, dtau, up_toa,
            tpu=lambda T_, d_, u_: lw_flux_lanes(T_, d_, u_),
            default=lambda T_, d_, u_: _lw_scan_eval(T_, d_, u_,
                                                     reverse=True))
    return _lw_scan_eval(T, dtau, up_toa, reverse=True)


@_lw_core.def_vmap
def _lw_core_vmap_rule(axis_size, in_batched, T, dtau, up_toa):
    T_b, d_b, u_b = in_batched
    if not T_b:
        T = jnp.broadcast_to(T[None], (axis_size,) + T.shape)
    if not d_b:
        dtau = jnp.broadcast_to(dtau[None], (axis_size,) + dtau.shape)
    if not u_b:
        up_toa = jnp.broadcast_to(up_toa[None], (axis_size,) + up_toa.shape)
    n, nlev, b0 = T.shape
    flat = lambda x: jnp.moveaxis(x, 0, 1).reshape(nlev, n * b0)
    up, down = _lw_core(flat(T), flat(dtau), up_toa.reshape(n * b0))
    unflat = lambda x: jnp.moveaxis(x.reshape(nlev + 1, n, b0), 1, 0)
    return (unflat(up), unflat(down)), (True, True)


def lw_flux_plain(T, dtau, up_flux_toa, surface_first=True):
    """Differentiable associative-scan evaluation of :func:`lw_flux` —
    bypasses the ``custom_vmap`` kernel dispatcher, whose batching rule
    retraces pathologically under ``jax.jacfwd``'s vmapped jvp (hangs for
    minutes on a 39-cell Jacobian; diagnostics/sensitivity.py uses this
    path).  Same semantics and shapes as :func:`lw_flux`."""
    batch_shape = T.shape[1:]
    dtau_f = jnp.asarray(dtau)
    while dtau_f.ndim < T.ndim:
        dtau_f = dtau_f[..., None]
    nlev = T.shape[0]
    Tf = T.reshape(nlev, -1)
    dtauf = jnp.broadcast_to(dtau_f, T.shape).reshape(nlev, -1)
    toaf = jnp.broadcast_to(up_flux_toa, batch_shape).astype(T.dtype)
    up, down = _lw_scan_eval(Tf, dtauf, toaf.reshape(-1),
                             reverse=surface_first)
    return (up.reshape((nlev + 1,) + batch_shape),
            down.reshape((nlev + 1,) + batch_shape))


def lw_flux(T, dtau, up_flux_toa, surface_first=True):
    """Grey long-wave up/down fluxes at interfaces from cell temperatures.

    For gradient/Jacobian evaluation use :func:`lw_flux_plain` — the batched
    kernel dispatcher below does not compose with ``jax.jacfwd``.

    :param T: [nz-1, ...] cell temperatures.
    :param dtau: [nz-1, ...] |optical depth difference| across each cell.
    :param up_flux_toa: [...] top-of-atmosphere upward flux boundary condition
        ((1-albedo_mod) * solar_latitude_factor * F_stellar / 4, grey.py:265).
    :param surface_first: orientation of axis 0 (True matches the reference grey
        model: index 0 = surface, index nz-1 = TOA).
    :return: (up_lw_flux, down_lw_flux) at interfaces, shape [nz, ...].
    """
    if not surface_first:
        # TOA-first orientation (the level-sharded pp path): scan form
        dtau_f = jnp.asarray(dtau)
        while dtau_f.ndim < T.ndim:             # column-shared [nz-1] dtau
            dtau_f = dtau_f[..., None]
        return _lw_scan_eval(T, jnp.broadcast_to(dtau_f, T.shape),
                             up_flux_toa, reverse=False)
    batch_shape = T.shape[1:]
    nlev = T.shape[0]
    Tf = T.reshape(nlev, -1)
    dtau = jnp.asarray(dtau)
    while dtau.ndim < T.ndim:                   # column-shared [nz-1] dtau
        dtau = dtau[..., None]
    dtauf = jnp.broadcast_to(dtau, T.shape).reshape(nlev, -1)
    toaf = jnp.broadcast_to(up_flux_toa, batch_shape).astype(T.dtype)
    up, down = _lw_core(Tf, dtauf, toaf.reshape(-1))
    return (up.reshape((nlev + 1,) + batch_shape),
            down.reshape((nlev + 1,) + batch_shape))


def lw_flux_sequential(T, dtau, up_flux_toa, surface_first=True):
    """Reference-ordering sequential evaluation of the same recurrence via
    ``lax.scan`` — numerically identical composition order to the NumPy loop;
    used for validation and as a fallback for extreme optical depths."""
    source = sigma * T ** 4
    if surface_first:
        source_s = jnp.flip(source, 0)
        dtau_s = jnp.flip(dtau, 0)
    else:
        source_s, dtau_s = source, dtau

    def step(carry, inp):
        up, down = carry
        src, dt = inp
        ep, em = jnp.exp(dt), jnp.exp(-dt)
        up = up * ep + src * (1.0 - ep)
        down = down * em + src * (1.0 - em)
        return (up, down), (up, down)

    init = (jnp.broadcast_to(up_flux_toa, T.shape[1:]).astype(T.dtype),
            jnp.zeros(T.shape[1:], T.dtype))
    _, (ups, downs) = lax.scan(step, init, (source_s, dtau_s))
    up = jnp.concatenate([init[0][None], ups], 0)
    down = jnp.concatenate([init[1][None], downs], 0)
    if surface_first:
        up, down = jnp.flip(up, 0), jnp.flip(down, 0)
    return up, down


def percentile_topk_params(n: int, pct) -> tuple[int, float]:
    """(m, frac) of the exact-percentile order statistics: jnp.percentile's
    default linear interpolation reads the m-th and (m-1)-th largest of n
    values and lerps them by frac (see column._percentile_topk)."""
    q = (n - 1) * float(pct) / 100.0
    k0 = int(np.floor(q))
    return n - k0, q - k0


@functools.lru_cache(maxsize=None)
def _net_stats_core_for(pct: float):
    """Member-level fused net-flux + exit-statistics operator (cached per
    static percentile), with a custom vmap rule that routes large f32
    batches to the fused Pallas kernel on TPU.

    The grey march consumes, every step: net = up_lw - down_lw + up_sw -
    down_sw, the two order statistics of |net - prev_net| behind the
    delta-percentile exit (base.py:248-264 via column._percentile_topk),
    its NaN sentinel top_1, and max|net| for the flux-balance exit.
    Computing them inside the flux kernel's VMEM walk removes the XLA
    fusions + top_k sort that otherwise re-read the fluxes from HBM every
    iteration (~40% of the profiled r05 ensemble step).  Everything the
    kernel adds over the proven lw walk is add/sub/abs/min/max — bit-equal
    to the XLA formulas by construction (selections + exact ops; |x|
    removes the ±0 selection ambiguity)."""

    def _stats_shapes(T):
        n_stat = (T.shape[0] + 1) * T.shape[1]        # nz * ny values
        m, _frac = percentile_topk_params(n_stat, pct)
        return max(m, 2)

    def _xla_batched(T, dtau, up_toa, up_sw, down_sw, prev_net):
        """[B, nz-1, ny] member batch via the existing XLA path (vmapped
        lw_flux + net assembly + per-member top_k) — the bit-identical
        fallback for CPU, ny>1 or small batches."""
        L = _stats_shapes(T[0])
        up, down = jax.vmap(lw_flux)(T, dtau, up_toa)
        net = up - down + up_sw - down_sw
        x = jnp.abs(net - prev_net).reshape(net.shape[0], -1)
        top = lax.top_k(x, L)[0]
        absmax = jnp.max(jnp.abs(net).reshape(net.shape[0], -1), axis=1)
        return net, top[:, 0], top[:, L - 2], top[:, L - 1], absmax

    @jax.custom_batching.custom_vmap
    def core(T, dtau, up_toa, up_sw, down_sw, prev_net):
        """Single member [nz-1, ny]: (net [nz, ny], top1, top_{m-1}, top_m,
        max|net|) with the top-k over |net - prev_net| flattened."""
        L = _stats_shapes(T)
        up, down = lw_flux(T, dtau, up_toa)
        net = up - down + up_sw - down_sw
        x = jnp.abs(net - prev_net).reshape(-1)
        top = lax.top_k(x, L)[0]
        return (net, top[0], top[L - 2], top[L - 1],
                jnp.max(jnp.abs(net)))

    @core.def_vmap
    def _core_vmap_rule(axis_size, in_batched, T, dtau, up_toa, up_sw,
                        down_sw, prev_net):
        args = [T, dtau, up_toa, up_sw, down_sw, prev_net]
        for k, b in enumerate(in_batched):
            if not b:
                args[k] = jnp.broadcast_to(args[k][None],
                                           (axis_size,) + args[k].shape)
        T, dtau, up_toa, up_sw, down_sw, prev_net = args
        B, nlev, ny = T.shape
        if T.dtype == jnp.float32 and ny == 1 and B >= 8:
            L = _stats_shapes(T[0])

            def _kernel_path(T, dtau, up_toa, up_sw, down_sw, prev_net):
                from .pallas_two_stream import grey_net_stats_lanes
                lanes = lambda x: x[:, :, 0].T                # [B,r,1]->[r,B]
                net, top1, hi, lo, absmax = grey_net_stats_lanes(
                    lanes(T), lanes(dtau), lanes(up_sw), lanes(down_sw),
                    up_toa[:, 0], lanes(prev_net), L)
                return net.T[:, :, None], top1, hi, lo, absmax

            out = lax.platform_dependent(
                T, dtau, up_toa, up_sw, down_sw, prev_net,
                tpu=_kernel_path, default=_xla_batched)
        else:
            out = _xla_batched(T, dtau, up_toa, up_sw, down_sw, prev_net)
        return out, (True,) * 5

    return core


def grey_net_with_stats(T, dtau, up_toa, up_sw, down_sw, prev_net, pct=95):
    """Fused ``grey_net_flux`` + exit statistics (see _net_stats_core_for).

    :param T, dtau: [nz-1, ny]; up_sw, down_sw, prev_net: [nz, ny];
        up_toa: [ny].  The sw fluxes and up_toa are T-independent — hoist
        them out of the march loop (bit-identical: same expressions on the
        same inputs).
    :param pct: static exit percentile (reference net_flux_percentile).
    :return: (net [nz, ny], top1, top_hi, top_lo, absmax) member scalars.
    """
    return _net_stats_core_for(float(pct))(T, dtau, up_toa, up_sw, down_sw,
                                           prev_net)


def sw_flux(tau_sw_interface, albedo_mod, solar_latitude_factor, F_stellar,
            isothermal=False):
    """Beer-law short-wave fluxes at interfaces (grey.py:277-294).

    ``tau_sw_interface`` may be None (or all zeros) for a transparent short-wave
    atmosphere; ``isothermal=True`` returns the no-atmosphere fluxes used for the
    initial condition (grey.py:104).
    """
    base_up = albedo_mod * solar_latitude_factor * F_stellar / 4.0
    base_down = solar_latitude_factor * F_stellar / 4.0
    if tau_sw_interface is None or isothermal:
        if tau_sw_interface is not None:
            up = jnp.broadcast_to(base_up, tau_sw_interface.shape)
            down = jnp.broadcast_to(base_down, tau_sw_interface.shape)
            return up, down
        return base_up, base_down
    up = base_up * jnp.exp(tau_sw_interface)
    down = base_down * jnp.exp(-tau_sw_interface)
    return up, down
