"""Lane-batched grey two-stream flux kernel.

The grey march body is dominated by the lw flux recurrence: evaluated as an
``associative_scan`` it costs ~0.7 ms per lock-step iteration at 4096
members x nz=60 on v5e — ~40x over its HBM traffic — because the log-depth
scan lowers to many small kernel launches.  This kernel instead puts the
member batch on the LANE axis and walks the recurrence sequentially over
level rows held in VMEM:

    up[i]   = up[i+1]   * e^{+dtau_i} + sigma T_i^4 (1 - e^{+dtau_i})
    down[i] = down[i+1] * e^{-dtau_i} + sigma T_i^4 (1 - e^{-dtau_i})

(surface-first orientation: the walk runs TOA -> surface, reference
grey.py:251-275).  One launch per step, ~60 row operations per program of
128 members.  The composition order is EXACTLY the reference's sequential
loop (ops/two_stream.lw_flux_sequential) — bit-identical to it, and within
f32 reassociation error of the associative scan.

Reached through ``two_stream.lw_flux`` whose custom_vmap rule flattens
nested batch axes onto the lane dimension (same pattern as
ops/pallas_isotonic.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from ..constants import sigma

LANE = 128
SUBL = 8          # native VPU tile is (8, 128): pack 8 member rows per op


def _lw_kernel_packed(T_ref, dtau_ref, toa_ref, up_ref, down_ref, *, n):
    """Sublane-packed member block: refs [n(+1), SUBL, LANE].  Identical
    composition order to :func:`_lw_kernel`, but every row op is a full
    native (8, 128) tile instead of a single-sublane (1, 128) vector —
    8x fewer instructions for the same dependency-chain length."""
    up = toa_ref[:, :, :]                       # (1, SUBL, LANE)
    down = jnp.zeros_like(up)
    up_ref[pl.ds(n, 1), :, :] = up
    down_ref[pl.ds(n, 1), :, :] = down

    def step(k, carry):
        up, down = carry
        i = n - 1 - k
        dt = dtau_ref[pl.ds(i, 1), :, :]
        src = sigma * T_ref[pl.ds(i, 1), :, :] ** 4
        ep = jnp.exp(dt)
        em = jnp.exp(-dt)
        up = up * ep + src * (1.0 - ep)
        down = down * em + src * (1.0 - em)
        up_ref[pl.ds(i, 1), :, :] = up
        down_ref[pl.ds(i, 1), :, :] = down
        return up, down

    lax.fori_loop(0, n, step, (up, down))


def _net_stats_kernel(T_ref, dtau_ref, usw_ref, dsw_ref, toa_ref, prev_ref,
                      net_ref, stats_ref, *, n, L):
    """Fused grey step statistics: the lw walk + net-flux assembly + the
    march's per-member exit statistics, in one VMEM pass (r05 — the profiled
    ensemble iteration spends ~3x the flux-kernel time in XLA fusions that
    re-read the fluxes to build ``net``, ``|net - prev|`` and its top-k).

    Every op is an add/sub/exp/min/max/abs — no division, no reciprocal —
    so the outputs are bit-identical to the XLA formulas by construction:
      net[i]  = ((up_lw - down_lw) + up_sw) - down_sw   (grey.py:296-300
                 left-assoc order)
      stats   = rows [top_1, top_{L-1}, top_L, max|net|] where top_k are
                the k largest of |net - prev| per member (== lax.top_k
                VALUES: selections only; |x| kills the -0.0 ambiguity) and
                the maximum chain propagates NaN exactly like a sort that
                puts NaNs first.
    Refs are rank-agnostic: (rows..., LANE) blocks — the same body serves
    the (n, LANE) row grid and the (n, SUBL, LANE) packed grid."""
    up = toa_ref[...]
    down = jnp.zeros_like(up)
    ninf = jnp.full_like(up, -jnp.inf)

    def emit(i, up, down, carry):
        """net at interface i from streams (up, down); fold into stats."""
        amax, regs = carry
        net = ((up - down) + usw_ref[pl.ds(i, 1)]) - dsw_ref[pl.ds(i, 1)]
        net_ref[pl.ds(i, 1)] = net
        x = jnp.abs(net - prev_ref[pl.ds(i, 1)])
        new_regs = []
        for r in regs:                    # sorted-desc insertion, min/max only
            new_regs.append(jnp.maximum(r, x))
            x = jnp.minimum(r, x)
        return jnp.maximum(amax, jnp.abs(net)), tuple(new_regs)

    carry0 = emit(n, up, down, (ninf, (ninf,) * L))

    def step(k, c):
        up, down, amax, regs = c[0], c[1], c[2], c[3:]
        i = n - 1 - k
        dt = dtau_ref[pl.ds(i, 1)]
        src = sigma * T_ref[pl.ds(i, 1)] ** 4
        ep = jnp.exp(dt)
        em = jnp.exp(-dt)
        up = up * ep + src * (1.0 - ep)
        down = down * em + src * (1.0 - em)
        amax, regs = emit(i, up, down, (amax, regs))
        return (up, down, amax) + regs

    out = lax.fori_loop(0, n, step, (up, down, carry0[0]) + carry0[1])
    amax, regs = out[2], out[3:]
    stats_ref[pl.ds(0, 1)] = regs[0]          # top_1 (NaN sentinel / max)
    stats_ref[pl.ds(1, 1)] = regs[L - 2]      # top_{m-1}
    stats_ref[pl.ds(2, 1)] = regs[L - 1]      # top_m
    stats_ref[pl.ds(3, 1)] = amax             # max |net|


def _lw_kernel(T_ref, dtau_ref, toa_ref, up_ref, down_ref, *, n):
    """One member block: T/dtau [n, LANE] cells, toa [1, LANE]; up/down
    [n+1, LANE] interface fluxes (surface-first: row n = TOA)."""
    up = toa_ref[:, :]
    down = jnp.zeros_like(up)
    up_ref[pl.ds(n, 1), :] = up
    down_ref[pl.ds(n, 1), :] = down

    def step(k, carry):
        up, down = carry
        i = n - 1 - k
        dt = dtau_ref[pl.ds(i, 1), :]
        src = sigma * T_ref[pl.ds(i, 1), :] ** 4
        ep = jnp.exp(dt)
        em = jnp.exp(-dt)
        up = up * ep + src * (1.0 - ep)
        down = down * em + src * (1.0 - em)
        up_ref[pl.ds(i, 1), :] = up
        down_ref[pl.ds(i, 1), :] = down
        return up, down

    lax.fori_loop(0, n, step, (up, down))


def _lw_lanes_packed(T, dtau, up_flux_toa, interpret=False):
    """Sublane-packed grid: 1024 members per program as (8, 128) tiles.
    Bit-identical to the (1, 128) walk (elementwise, same op order);
    measured 1.37x on-device at 4096x59 (chained-jit timing, v5e) and
    +11% on the grey ensemble bench — tools/verify_packed_lw_onchip.py
    proves compiled bit-equality vs the row kernel and the XLA sequence."""
    n, b = T.shape
    dtype = T.dtype
    bp = -(-b // (SUBL * LANE)) * SUBL * LANE
    rows = bp // LANE

    def pad3(x):
        return (jnp.zeros((x.shape[0], bp), dtype).at[:, :b].set(x)
                .reshape(x.shape[0], rows, LANE))

    toa = (jnp.zeros((1, bp), dtype).at[0, :b].set(up_flux_toa)
           .reshape(1, rows, LANE))
    up, down = pl.pallas_call(
        functools.partial(_lw_kernel_packed, n=n),
        grid=(rows // SUBL,),
        in_specs=[pl.BlockSpec((n, SUBL, LANE), lambda i: (0, i, 0)),
                  pl.BlockSpec((n, SUBL, LANE), lambda i: (0, i, 0)),
                  pl.BlockSpec((1, SUBL, LANE), lambda i: (0, i, 0))],
        out_specs=[pl.BlockSpec((n + 1, SUBL, LANE), lambda i: (0, i, 0)),
                   pl.BlockSpec((n + 1, SUBL, LANE), lambda i: (0, i, 0))],
        out_shape=[jax.ShapeDtypeStruct((n + 1, rows, LANE), dtype),
                   jax.ShapeDtypeStruct((n + 1, rows, LANE), dtype)],
        interpret=interpret,
    )(pad3(T), pad3(dtau), toa)
    return (up.reshape(n + 1, bp)[:, :b],
            down.reshape(n + 1, bp)[:, :b])


@functools.partial(jax.jit, static_argnames=('interpret',))
def lw_flux_lanes(T, dtau, up_flux_toa, interpret=False):
    """Surface-first lw fluxes with the batch on the LAST axis.

    :param T, dtau: [nz-1, b] cell values (index 0 = surface).
    :param up_flux_toa: [b] TOA upward boundary condition.
    :return: (up, down) [nz, b] interface fluxes, bit-identical to
        ``lw_flux_sequential``.
    """
    if T.shape[1] >= SUBL * LANE:
        return _lw_lanes_packed(T, dtau, up_flux_toa, interpret=interpret)
    return _lw_lanes_rows(T, dtau, up_flux_toa, interpret=interpret)


@functools.partial(jax.jit, static_argnames=('L', 'interpret'))
def grey_net_stats_lanes(T, dtau, up_sw, down_sw, up_toa, prev_net, L,
                         interpret=False):
    """Fused net flux + exit statistics with the batch on the LAST axis.

    :param T, dtau: [nz-1, b] cell values (index 0 = surface).
    :param up_sw, down_sw, prev_net: [nz, b] interface values.
    :param up_toa: [b] TOA upward lw boundary condition.
    :param L: static top-k depth (>= 2).
    :return: (net [nz, b], top1 [b], top_hi [b], top_lo [b], absmax [b]) —
        net bit-identical to the XLA ``up-down+usw-dsw`` on
        ``lw_flux_sequential`` streams; top_* the lax.top_k(|net-prev|, L)
        values [0], [L-2], [L-1]; absmax = max|net| per member.
    """
    n, b = T.shape
    dtype = T.dtype
    packed = b >= SUBL * LANE
    unit = SUBL * LANE if packed else LANE
    bp = -(-b // unit) * unit
    rows = bp // LANE

    if packed:
        shp = lambda r: (r, rows, LANE)
        blk = lambda r: (r, SUBL, LANE)
        imap = lambda r: (lambda i: (0, i, 0))
        grid = rows // SUBL
    else:
        shp = lambda r: (r, bp)
        blk = lambda r: (r, LANE)
        imap = lambda r: (lambda i: (0, i))
        grid = rows

    def pad(x):
        flat = jnp.zeros((x.shape[0], bp), dtype).at[:, :b].set(x)
        return flat.reshape(shp(x.shape[0]))

    toa = pad(up_toa[None])
    net, stats = pl.pallas_call(
        functools.partial(_net_stats_kernel, n=n, L=L),
        grid=(grid,),
        in_specs=[pl.BlockSpec(blk(n), imap(n)),
                  pl.BlockSpec(blk(n), imap(n)),
                  pl.BlockSpec(blk(n + 1), imap(n + 1)),
                  pl.BlockSpec(blk(n + 1), imap(n + 1)),
                  pl.BlockSpec(blk(1), imap(1)),
                  pl.BlockSpec(blk(n + 1), imap(n + 1))],
        out_specs=[pl.BlockSpec(blk(n + 1), imap(n + 1)),
                   pl.BlockSpec(blk(4), imap(4))],
        out_shape=[jax.ShapeDtypeStruct(shp(n + 1), dtype),
                   jax.ShapeDtypeStruct(shp(4), dtype)],
        interpret=interpret,
    )(pad(T), pad(dtau), pad(up_sw), pad(down_sw), toa, pad(prev_net))
    net = net.reshape(n + 1, bp)[:, :b]
    stats = stats.reshape(4, bp)[:, :b]
    return net, stats[0], stats[1], stats[2], stats[3]


def _lw_lanes_rows(T, dtau, up_flux_toa, interpret=False):
    """Single-sublane grid: one (1, 128)-vector member row per program."""
    n, b = T.shape
    dtype = T.dtype
    bp = -(-b // LANE) * LANE

    def pad(x):
        return jnp.zeros((x.shape[0], bp), dtype).at[:, :b].set(x)

    toa = jnp.zeros((1, bp), dtype).at[0, :b].set(up_flux_toa)
    up, down = pl.pallas_call(
        functools.partial(_lw_kernel, n=n),
        grid=(bp // LANE,),
        in_specs=[pl.BlockSpec((n, LANE), lambda i: (0, i)),
                  pl.BlockSpec((n, LANE), lambda i: (0, i)),
                  pl.BlockSpec((1, LANE), lambda i: (0, i))],
        out_specs=[pl.BlockSpec((n + 1, LANE), lambda i: (0, i)),
                   pl.BlockSpec((n + 1, LANE), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((n + 1, bp), dtype),
                   jax.ShapeDtypeStruct((n + 1, bp), dtype)],
        interpret=interpret,
    )(pad(T), pad(dtau), toa)
    return up[:, :b], down[:, :b]
