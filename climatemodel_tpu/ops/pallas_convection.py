"""Faithful group-blend convective adjustment as a Pallas TPU kernel.

The reference algorithm (convective_adjustment.py:36-118) is two nested
data-dependent loops: outer sweeps until stable, inner left-to-right over the
sweep's frozen unstable groups, each group replaced by the
enthalpy-conserving blend of two flattened candidate profiles.  The XLA
re-expression (ops/convection.py _reference_adjust_single) runs those loops
as nested ``lax.while_loop``s of ~30 small reductions per group — dozens of
tiny sequenced ops per march step on TPU.  This kernel runs the WHOLE
iteration on-chip in one launch:

  * batch of columns on the LANE axis (128 per grid program, padded lanes
    hold a stable theta = idx profile so they never add lock-step trips);
  * levels on sublanes: every group search is a masked min/max/sum reduction
    along axis 0 — native VPU reductions;
  * groups are found first-unprocessed-first from the sweep's FROZEN
    unstable mask (identical order to the reference's gid walk);
  * the sublane shift for theta-diffs goes through a VMEM scratch row write
    (value-level shifted concats at non-8-multiple offsets miscompile in
    Mosaic — CLAUDE.md), and single-row extraction is a masked sum.

Numerics vs the XLA path: theta is computed as T * (1/pi) with the
reciprocal taken OUTSIDE the kernel (Mosaic lowers division to a fast
~6e-6-relative reciprocal), enthalpy sums may reduce in a different order
(f32 reassociation ~1e-7 rel), and beta's division is Mosaic's.  Group
DETECTION uses the same dtype-aware tolerance as ops/convection.py
``_instability_tol``, so decisions only differ for diffs within ~1e-7 of the
threshold; marched endpoints agree to well under the 0.1 K parity budget
(tests/test_pallas_convection.py).

Gated OFF by default (CLIMATEMODEL_TPU_CONV_REF_KERNEL=1 to enable) until
verified on the real chip — interpret-mode correctness does not guarantee
Mosaic-compiled correctness (the Hillis-Steele incident, CLAUDE.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_SMALL = 1e-10          # the reference's f64 instability tolerance


def _faithful_kernel(T_ref, pi_ref, ipi_ref, w_ref, thr_ref, out_ref, th_pad,
                     *, n, max_outer):
    idx = lax.broadcasted_iota(jnp.int32, (n, LANE), 0)
    pi = pi_ref[:]                       # [n, 1]
    ipi = ipi_ref[:]                     # [n, 1]
    w = w_ref[:]                         # [n, 1]
    thr = thr_ref[:]                     # [1, LANE]
    dtype = out_ref.dtype
    small = jnp.asarray(_SMALL, dtype)
    # dtype-aware tolerance EXACTLY like ops/convection._instability_tol:
    # the eps-scaled term applies only below f64 — in f64 the reference's
    # 1e-10 constant is used verbatim (16*eps_f64*theta would exceed it at
    # micro-mass high-theta levels and silently skip marginal adjustments
    # the executed reference performs)
    eps = float(jnp.finfo(dtype).eps)
    eps16 = jnp.asarray(16 * eps if eps > 1e-12 else 0.0, dtype)
    zero = jnp.zeros((n, LANE), dtype)

    def row_at(x, r):
        """x's row r (r may be [1, LANE] per-lane) as a [1, LANE] vector —
        masked-sum extraction (per-lane sublane gathers are unsupported)."""
        return jnp.sum(jnp.where(idx == r, x, zero), axis=0, keepdims=True)

    # boolean [n, LANE] vectors never enter loop CARRIES: Mosaic's i1-vector
    # relayouts are a known miscompile risk class (CLAUDE.md), so masks are
    # carried as int32 0/1 and converted at use
    as_i32 = lambda m: m.astype(jnp.int32)
    as_bool = lambda m: m != 0

    def unstable(T, ignored_i):
        """The reference's duplicated-last-diff instability mask at the
        dtype-aware tolerance (ops/convection.py _instability_tol); int32
        0/1 output."""
        theta = T * ipi
        th_pad[pl.ds(0, n), :] = theta
        th_pad[pl.ds(n, 1), :] = row_at(theta, n - 1)
        th_next = th_pad[pl.ds(1, n), :]
        d = th_next - theta
        mag = jnp.maximum(jnp.abs(th_next), jnp.abs(theta))
        d = jnp.where(idx == n - 1, row_at(d, n - 2), d)
        mag = jnp.where(idx == n - 1, row_at(mag, n - 2), mag)
        tol = jnp.maximum(small, eps16 * mag)
        return as_i32((d < -tol) & ~as_bool(ignored_i))

    def group_step(carry):
        T, ignored_i, processed_i, un_frozen_i = carry
        ignored = as_bool(ignored_i)
        un_frozen = as_bool(un_frozen_i)
        cand = un_frozen & ~as_bool(processed_i)
        has = jnp.any(cand, axis=0, keepdims=True)             # [1, LANE]
        first = jnp.min(jnp.where(cand, idx, n), axis=0, keepdims=True)
        stop = jnp.min(jnp.where((~un_frozen) & (idx >= first), idx, n),
                       axis=0, keepdims=True)
        in_g = un_frozen & (idx >= first) & (idx < stop)
        theta = T * ipi
        # 'lower' candidate: flatten [start .. lo_anchor] at theta[lo_anchor]
        lo_anchor = jnp.minimum(stop, n - 1)                   # grp_last + 1
        theta_lo = row_at(theta, lo_anchor)
        low_mask = (theta < theta_lo) & (idx < lo_anchor)
        any_low = jnp.any(low_mask, axis=0, keepdims=True)
        start = jnp.where(
            any_low,
            jnp.max(jnp.where(low_mask, idx, -1), axis=0, keepdims=True) + 1,
            0)
        T_lower = jnp.where((idx >= start) & (idx <= lo_anchor),
                            theta_lo * pi, T)
        # 'upper' candidate: flatten [hi_anchor .. stop2] at theta[hi_anchor]
        hi_anchor = first
        theta_hi = row_at(theta, hi_anchor)
        hi_mask = (theta > theta_hi) & (idx > hi_anchor)
        any_hi = jnp.any(hi_mask, axis=0, keepdims=True)
        stop2 = jnp.where(
            any_hi,
            jnp.min(jnp.where(hi_mask, idx, n - 1), axis=0, keepdims=True),
            n - 1)
        T_upper = jnp.where((idx >= hi_anchor) & (idx <= stop2),
                            theta_hi * pi, T)
        # enthalpy-conserving blend (convective_adjustment.py:102-105)
        H = jnp.sum(w * T, axis=0, keepdims=True)
        H_lo = jnp.sum(w * T_lower, axis=0, keepdims=True)
        H_hi = jnp.sum(w * T_upper, axis=0, keepdims=True)
        denom = H_hi - H_lo
        beta = jnp.where(denom == 0, jnp.asarray(0.5, dtype),
                         (H - H_lo) / jnp.where(denom == 0,
                                                jnp.asarray(1.0, dtype),
                                                denom))
        T_new = beta * T_upper + (1 - beta) * T_lower
        accept = (jnp.max(jnp.abs(T_new - T), axis=0, keepdims=True)
                  < thr)
        apply = has & accept
        T = jnp.where(apply, T_new, T)
        ignored = ignored | (in_g & has & ~accept)
        processed = as_bool(processed_i) | (in_g & has)
        return T, as_i32(ignored), as_i32(processed), un_frozen_i

    def sweep(carry):
        T, ignored_i, un_i, it, _progressed = carry
        T_prev = T
        # left-to-right over the sweep's FROZEN groups
        T, ignored_i, _, _ = lax.while_loop(
            lambda c: jnp.any((c[3] != 0) & (c[2] == 0)), group_step,
            (T, ignored_i, jnp.zeros((n, LANE), jnp.int32), un_i))
        un_new = unstable(T, ignored_i)
        progressed = jnp.any(T != T_prev) | jnp.any(un_new != un_i)
        return T, ignored_i, un_new, it + 1, as_i32(progressed)

    def sweep_cond(carry):
        _T, _ignored, un_i, it, progressed_i = carry
        return jnp.any(un_i != 0) & (it < max_outer) & (progressed_i != 0)

    T0 = T_ref[:]
    ignored0 = jnp.zeros((n, LANE), jnp.int32)
    un0 = unstable(T0, ignored0)
    T_fin, _, _, _, _ = lax.while_loop(
        sweep_cond, sweep,
        (T0, ignored0, un0, jnp.asarray(0, jnp.int32),
         jnp.asarray(1, jnp.int32)))
    out_ref[:] = T_fin


@functools.partial(jax.jit, static_argnames=('interpret',))
def faithful_adjust_lanes(T2d, pi, w, thresh, interpret=False):
    """Faithful group-blend adjustment over a batch of columns.

    :param T2d: [b, n] cell temperatures, p descending along n (surface
        first) — the batch lands on TPU lanes.
    :param pi: [n] Exner-like factor (p/p_ref)^alpha (shared grid).
    :param w: [n] trapz enthalpy weights of the shared grid.
    :param thresh: [b] per-column group-skip threshold delta_T_thresh.
    :return: [b, n] adjusted temperatures.
    """
    b, n = T2d.shape
    dtype = T2d.dtype
    bp = -(-b // LANE) * LANE
    pi_c = pi.astype(dtype)[:, None]                           # [n, 1]
    # pad lanes with the stable profile theta = idx (never triggers work)
    stable = pi_c * jnp.arange(1, n + 1, dtype=dtype)[:, None]
    T_T = jnp.broadcast_to(stable, (n, bp)).at[:, :b].set(T2d.T)
    thr = jnp.ones((1, bp), dtype).at[0, :b].set(thresh.astype(dtype))
    out = pl.pallas_call(
        functools.partial(_faithful_kernel, n=n, max_outer=4 * n),
        grid=(bp // LANE,),
        in_specs=[pl.BlockSpec((n, LANE), lambda i: (0, i)),
                  pl.BlockSpec((n, 1), lambda i: (0, 0)),
                  pl.BlockSpec((n, 1), lambda i: (0, 0)),
                  pl.BlockSpec((n, 1), lambda i: (0, 0)),
                  pl.BlockSpec((1, LANE), lambda i: (0, i))],
        out_specs=pl.BlockSpec((n, LANE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n, bp), dtype),
        scratch_shapes=[pltpu.VMEM((n + 1, LANE), dtype)],
        interpret=interpret,
    )(T_T, pi_c, (1.0 / pi_c).astype(dtype), w.astype(dtype)[:, None], thr)
    return out[:, :b].T
