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
