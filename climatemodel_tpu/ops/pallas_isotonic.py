"""Batched weighted isotonic regression as a Pallas TPU kernel.

The isotonic convective adjustment (ops/convection.py, method='isotonic')
evaluates the parallel min-max formula

    theta'_i = max_{s<=i} min_{t>=i} avg(s, t),
    avg(s, t) = (SV[t+1] - SV[s]) / (SW[t+1] - SW[s])

per column.  The XLA evaluation materialises the full [n, n] average table
per batch member and runs two log-depth associative scans over it; profiled
on v5e at 512 members x n=150 that costs ~6 ms per call and DOMINATES
convective-ensemble marches (see CLAUDE.md).  This kernel instead puts the
BATCH on the lane axis and iterates t sequentially:

  * per grid program: 128 members (lanes) x n levels (sublanes);
  * loop t = n-1 .. 0 keeping M[s, m] = min_{t'>=t} avg(s, t', m) as the
    carry — one [n, 128] minimum per step (no table in HBM, no lane scans);
  * r_t = max over the masked sublane axis of M — a native VPU reduction —
    written as the [1, 128] output row for level t.

min/max are exactly associative, and num/den are computed from the same
prefix sums, so the kernel output is BIT-IDENTICAL to the XLA formula
(pinned in tests/test_convection.py).

The reference's algorithm being re-expressed: the enthalpy-conserving pool
of adjacent violators (convective_adjustment.py:36-118); see
ops/convection.py for the equivalence argument.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

LANE = 128


def _iso_kernel(sv_ref, sw_ref, out_ref, *, n):
    """One member-block: sv [n+1, LANE] per-member prefix sums, sw [n+1, 1]
    shared prefix weights, out [n, LANE] isotonic fit."""
    sv_s = sv_ref[:n, :]                    # SV[s] rows          [n, m]
    sw_s = sw_ref[:n, :]                    # SW[s] rows          [n, 1]
    s_idx = lax.broadcasted_iota(jnp.int32, (n, LANE), 0)
    inf = jnp.asarray(jnp.inf, sv_s.dtype)

    def step(k, M):
        t = n - 1 - k
        sv_t = sv_ref[pl.ds(t + 1, 1), :]   # SV[t+1]             [1, m]
        sw_t = sw_ref[pl.ds(t + 1, 1), :]   # SW[t+1]             [1, 1]
        valid = s_idx <= t
        avg_t = jnp.where(valid, (sv_t - sv_s) / (sw_t - sw_s), inf)
        M = jnp.minimum(M, avg_t)           # min over t' >= t, all s at once
        r_t = jnp.max(jnp.where(valid, M, -inf), axis=0, keepdims=True)
        out_ref[pl.ds(t, 1), :] = r_t       # theta'_t = max_{s<=t} M[s]
        return M

    lax.fori_loop(0, n, step, jnp.full((n, LANE), inf, sv_s.dtype))


@functools.partial(jax.jit, static_argnames=('interpret',))
def isotonic_increasing_lanes(theta, v, interpret=False):
    """Weighted non-decreasing isotonic regression over the LAST axis.

    :param theta: [b, n] batch of profiles (the batch lands on TPU lanes).
    :param v: [n] shared positive weights.
    :return: [b, n] isotonic fits, bit-identical to the XLA min-max formula.
    """
    b, n = theta.shape
    dtype = theta.dtype
    bp = -(-b // LANE) * LANE
    theta_T = jnp.zeros((n, bp), dtype).at[:, :b].set(theta.T)
    sv = jnp.concatenate([jnp.zeros((1, bp), dtype),
                          jnp.cumsum(v[:, None] * theta_T, axis=0)], axis=0)
    sw = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(v)])[:, None]
    out = pl.pallas_call(
        functools.partial(_iso_kernel, n=n),
        grid=(bp // LANE,),
        in_specs=[pl.BlockSpec((n + 1, LANE), lambda i: (0, i)),
                  pl.BlockSpec((n + 1, 1), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((n, LANE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n, bp), dtype),
        interpret=interpret,
    )(sv, sw)
    return out[:, :b].T
