"""Bisect WHERE the adaptive convective march's extra ~0.4 ms/step lives.

tools/isolate_conv_march.py (v5e, nz=150) measured:
    fori_conv_ref     0.177 ms/step   (fixed fori, conv every step)
    adaptive_conv_ref 0.540 ms/step   (full while_loop march)
    adaptive_conv_iso 0.170 ms/step   (same march, isotonic conv)
    adaptive_rad      0.120 ms/step
so the adaptive machinery is ~free EXCEPT when the faithful group-blend's
nested while_loops are in the body.  This script rebuilds the march body
piece by piece between the two endpoints to find the responsible construct.

    python tools/conv_while_bisect.py [nz]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from climatemodel_tpu.models import column
from climatemodel_tpu.models.grey import GreyGas, grey_net_flux

NZ = int(sys.argv[1]) if len(sys.argv) > 1 else 150
N_STEPS = 300


from climatemodel_tpu.ops.convection import (_instability_tol,
                                             _trapz_weights)


def flat_adjust_col(pi, wgt, T, thresh, mode):
    nz = T.shape[0]
    idx = jnp.arange(nz)
    max_outer = 4 * nz
    max_groups = nz // 2 + 1

    def unstable_mask(T, ignored):
        theta = T / pi
        d = theta[1:] - theta[:-1]
        d_ext = jnp.concatenate([d, d[-1:]])
        return (d_ext < -_instability_tol(theta)) & ~ignored

    def group_body(gi, T, ignored, gid):
        in_g = gid == gi
        any_g = jnp.any(in_g)
        theta = T / pi
        grp_first = jnp.argmax(in_g)
        grp_last = nz - 1 - jnp.argmax(jnp.flip(in_g))
        lo_anchor = jnp.minimum(grp_last + 1, nz - 1)
        theta_lo = theta[lo_anchor]
        low_mask = (theta < theta_lo) & (idx < lo_anchor)
        start = jnp.where(jnp.any(low_mask),
                          jnp.max(jnp.where(low_mask, idx, -1)) + 1, 0)
        T_lower = jnp.where((idx >= start) & (idx <= lo_anchor),
                            theta_lo * pi, T)
        hi_anchor = grp_first
        theta_hi = theta[hi_anchor]
        hi_mask = (theta > theta_hi) & (idx > hi_anchor)
        stop = jnp.where(jnp.any(hi_mask),
                         jnp.min(jnp.where(hi_mask, idx, nz - 1)),
                         nz - 1)
        T_upper = jnp.where((idx >= hi_anchor) & (idx <= stop),
                            theta_hi * pi, T)
        H = jnp.sum(wgt * T)
        H_lo = jnp.sum(wgt * T_lower)
        H_hi = jnp.sum(wgt * T_upper)
        denom = H_hi - H_lo
        beta = jnp.where(denom == 0, 0.5,
                         (H - H_lo) / jnp.where(denom == 0, 1.0, denom))
        T_new = beta * T_upper + (1 - beta) * T_lower
        accept = jnp.max(jnp.abs(T_new - T)) < thresh
        T = jnp.where(any_g & accept, T_new, T)
        ignored = ignored | (in_g & any_g & ~accept)
        return T, ignored

    if mode == 'flat_while':
        # single while: one iteration = one group OR a sweep boundary
        def sweep_setup(T, ignored):
            un = unstable_mask(T, ignored)
            starts = un & ~jnp.concatenate([jnp.array([False]),
                                            un[:-1]])
            gid = jnp.where(un, jnp.cumsum(starts), 0)
            n_groups = jnp.minimum(jnp.max(gid), max_groups)
            return un, gid, n_groups

        un0, gid0, ng0 = sweep_setup(T, jnp.zeros((nz,), bool))
        done0 = ~jnp.any(un0)

        def cond(c):
            return ~c[-1]

        def body(c):
            T, ignored, gid, ng, gi, it, T_prev, un_prev, done = c

            def do_group(_):
                Tn, ign = group_body(gi, T, ignored, gid)
                return (Tn, ign, gid, ng, gi + 1, it, T_prev, un_prev,
                        done)

            def do_boundary(_):
                progressed = jnp.any(T != T_prev) | jnp.any(
                    unstable_mask(T, ignored) != un_prev)
                it_n = it + 1
                un, gid_n, ng_n = sweep_setup(T, ignored)
                d = (~jnp.any(un)) | (it_n >= max_outer) | ~progressed
                return (T, ignored, gid_n, ng_n,
                        jnp.asarray(1, gid_n.dtype), it_n, T, un, d)

            return lax.cond(gi > ng, do_boundary, do_group, None)

        init = (T, jnp.zeros((nz,), bool), gid0, ng0,
                jnp.asarray(1, gid0.dtype), jnp.asarray(0, jnp.int32),
                T, un0, done0)
        out = lax.while_loop(cond, body, init)
        return out[0]
    elif mode == 'static_fori':
        # bracket experiment: 3 sweeps x 4 groups, fully static
        def sweep(_, carry):
            T, ignored = carry
            un = unstable_mask(T, ignored)
            starts = un & ~jnp.concatenate([jnp.array([False]),
                                            un[:-1]])
            gid = jnp.where(un, jnp.cumsum(starts), 0)
            def g(gi, c):
                T, ignored = c
                has = jnp.any(gid == gi)
                Tn, ign = group_body(gi, T, ignored, gid)
                return (jnp.where(has, Tn, T),
                        jnp.where(has, ign, ignored))
            return lax.fori_loop(1, 5, g, (T, ignored))
        T_out, _ = lax.fori_loop(0, 3, sweep,
                                 (T, jnp.zeros((nz,), bool)))
        return T_out
    raise ValueError(mode)


def world():
    from climatemodel_tpu.cli import grey_world_kwargs
    return GreyGas(nz=NZ, ny=1, **grey_world_kwargs('thermosphere'))


def best_of(fn, n=5):
    fn()
    w = float('inf')
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        w = min(w, time.perf_counter() - t0)
    return w


def make(variant):
    w = world()
    p_int = jnp.asarray(w.p_interface, w.dtype)
    p_c = jnp.asarray(w.p[:, 0], w.dtype)
    forcing = w.forcing
    st0 = w.state
    dtype = w.dtype

    def step(st, compute_delta=True):
        net = grey_net_flux(st.T, forcing)
        st2, delta = column.update_temp(
            st, net, p_int, p_c, convective_adjust=True,
            conv_method='reference', compute_delta=compute_delta)
        return st2, net, delta

    if variant == 'fori_plain':
        @jax.jit
        def run(st):
            def body(_, st):
                st, _, _ = step(st, compute_delta=False)
                return st
            return lax.fori_loop(0, N_STEPS, body, st)
    elif variant == 'while_trivial_cond':
        # while_loop, body = step only, cond = i < N (no flags in carry)
        @jax.jit
        def run(st):
            def body(c):
                st, i = c
                st, _, _ = step(st, compute_delta=False)
                return st, i + 1
            def cond(c):
                return c[1] < N_STEPS
            return lax.while_loop(cond, body, (st, jnp.asarray(0, jnp.int32)))
    elif variant == 'while_flags_not_in_cond':
        # flags computed every step, carried, but cond only checks i
        @jax.jit
        def run(st):
            ft = jnp.asarray(1e-9, dtype)
            def body(c):
                st, i, eqb, failed, nan = c
                st, net, delta = step(st)
                eqb = column.check_equilibrium(st.net_flux, delta, ft)
                failed = jnp.min(st.T) < 0
                nan = ~(jnp.all(jnp.isfinite(st.T)) & jnp.all(jnp.isfinite(net)))
                return st, i + 1, eqb, failed, nan
            def cond(c):
                return c[1] < N_STEPS
            return lax.while_loop(cond, body, (st, jnp.asarray(0, jnp.int32),
                                               jnp.asarray(False),
                                               jnp.asarray(False),
                                               jnp.asarray(False)))
    elif variant == 'while_flags_in_cond':
        # full adaptive shape: flags in both carry AND cond
        @jax.jit
        def run(st):
            ft = jnp.asarray(1e-9, dtype)
            def body(c):
                st, i, eqb, failed, nan = c
                st, net, delta = step(st)
                eqb = column.check_equilibrium(st.net_flux, delta, ft)
                failed = jnp.min(st.T) < 0
                nan = ~(jnp.all(jnp.isfinite(st.T)) & jnp.all(jnp.isfinite(net)))
                return st, i + 1, eqb, failed, nan
            def cond(c):
                _, i, eqb, failed, nan = c
                return ~eqb & ~failed & ~nan & (i < N_STEPS)
            return lax.while_loop(cond, body, (st, jnp.asarray(0, jnp.int32),
                                               jnp.asarray(False),
                                               jnp.asarray(False),
                                               jnp.asarray(False)))
    elif variant == 'while_exact_carry':
        # handwritten replica of _march_body's full 8-tuple carry: state, ft,
        # delta, i, eqb, failed, nan, tout + the i==1 tightening + timeout
        from climatemodel_tpu.constants import SECONDS_PER_YEAR
        t_end = 1e9
        t0v = st0.t
        @jax.jit
        def run(st):
            ft0 = jnp.asarray(1e-9, dtype)
            def body(c):
                st, ft, _delta, i, _eqb, failed0, nan0, _tout = c
                st, net, delta = step(st)
                ft = jnp.where(i == 1, jnp.minimum(ft, 0.99 * delta), ft)
                eqb = column.check_equilibrium(st.net_flux, delta, ft)
                failed = jnp.min(st.T) < 0
                nan = ~(jnp.all(jnp.isfinite(st.T)) & jnp.all(jnp.isfinite(net)))
                tout = ((st.t - t0v) / SECONDS_PER_YEAR > t_end) & ~eqb
                return st, ft, delta, i + 1, eqb, failed, nan, tout
            def cond(c):
                _st, _ft, _delta, i, eqb, failed, nan, tout = c
                return ~eqb & ~tout & ~failed & ~nan & (i < N_STEPS)
            init = (st, ft0, jnp.asarray(1e6, dtype),
                    jnp.asarray(0, jnp.int32), jnp.asarray(False),
                    jnp.asarray(False), jnp.asarray(False), jnp.asarray(False))
            return lax.while_loop(cond, body, init)
    elif variant == 'evolve_direct':
        # column.evolve_to_equilibrium called directly (no _grey_evolve jit
        # wrapper, static max_steps)
        @jax.jit
        def run(st):
            net_fn = lambda T: grey_net_flux(T, forcing)
            st2, info = column.evolve_to_equilibrium(
                st, net_fn, p_int, p_c,
                flux_thresh=jnp.asarray(1e-9, dtype), convective_adjust=True,
                t_end=1e9, max_steps=N_STEPS, conv_method='reference')
            return st2.T, info.steps
    elif variant.startswith('dyn_'):
        # evolve_direct but with ONE scalar routed through the jit boundary
        # (traced/dynamic) instead of baked static — isolates which dynamic
        # scalar costs full_evolve its 3x
        name = variant[4:]
        defaults = dict(max_steps=N_STEPS, t_end=1e9, conv_thresh=1e-5,
                        conv_t_multiplier=5.0, net_flux_thresh=1e-7)
        dyn_val = defaults.pop(name)

        @jax.jit
        def run_dyn(st, v):
            net_fn = lambda T: grey_net_flux(T, forcing)
            kw = dict(defaults)
            kw[name] = v
            st2, info = column.evolve_to_equilibrium(
                st, net_fn, p_int, p_c,
                flux_thresh=jnp.asarray(1e-9, dtype), convective_adjust=True,
                conv_method='reference', **kw)
            return st2.T, info.steps
        dv = (jnp.asarray(dyn_val, jnp.int32) if name == 'max_steps'
              else jnp.asarray(dyn_val, jnp.float32))
        run = lambda st: run_dyn(st, dv)
    elif variant == 'dynft':
        @jax.jit
        def run_ft(st, ftv):
            net_fn = lambda T: grey_net_flux(T, forcing)
            st2, info = column.evolve_to_equilibrium(
                st, net_fn, p_int, p_c, flux_thresh=ftv,
                convective_adjust=True, t_end=1e9, max_steps=N_STEPS,
                conv_method='reference')
            return st2.T, info.steps
        ftv = jnp.asarray(1e-9, dtype)
        run = lambda st: run_ft(st, ftv)
    elif variant == 'dynforcing':
        # forcing crosses the jit boundary (dynamic pytree, like _grey_evolve)
        @jax.jit
        def run_f(st, fc):
            net_fn = lambda T: grey_net_flux(T, fc)
            st2, info = column.evolve_to_equilibrium(
                st, net_fn, p_int, p_c,
                flux_thresh=jnp.asarray(1e-9, dtype), convective_adjust=True,
                t_end=1e9, max_steps=N_STEPS, conv_method='reference')
            return st2.T, info.steps
        run = lambda st: run_f(st, forcing)
    elif variant == 'dynforcing_prehoist':
        # forcing crosses the jit boundary (dynamic) BUT all T-independent
        # flux coefficients are computed once BEFORE the while loop and the
        # body closes over those tracers.  Distinguishes LICM failure (this
        # is fast) from needs-literal-constants (this stays slow).
        from climatemodel_tpu.constants import sigma
        from climatemodel_tpu.ops.two_stream import affine_scan, sw_flux

        @jax.jit
        def run_ph(st, fc):
            up_toa = (1.0 - fc.albedo_mod) * fc.solar_latitude_factor * \
                fc.F_stellar / 4.0
            up_sw, down_sw = sw_flux(fc.tau_sw_interface, fc.albedo_mod,
                                     fc.solar_latitude_factor, fc.F_stellar)
            e_plus = jnp.exp(fc.dtau)
            e_minus = jnp.exp(-fc.dtau)
            a = jnp.stack([e_plus, e_minus], 1)
            one_minus = jnp.stack([1.0 - e_plus, 1.0 - e_minus], 1)
            x_toa = jnp.stack(
                [jnp.broadcast_to(up_toa, st.T.shape[1:]).astype(st.T.dtype),
                 jnp.zeros(st.T.shape[1:], st.T.dtype)])

            def net_fn(T):
                source = sigma * T ** 4
                b = source[:, None, :] * one_minus
                flux = affine_scan(a, b, x_toa, reverse=True)
                up_lw, down_lw = flux[:, 0], flux[:, 1]
                return up_lw - down_lw + up_sw - down_sw

            st2, info = column.evolve_to_equilibrium(
                st, net_fn, p_int, p_c,
                flux_thresh=jnp.asarray(1e-9, dtype), convective_adjust=True,
                t_end=1e9, max_steps=N_STEPS, conv_method='reference')
            return st2.T, info.steps
        run = lambda st: run_ph(st, forcing)
    elif variant in ('flat_while', 'static_fori', 'cond_gate'):
        # dynforcing + restructured faithful conv control flow
        from climatemodel_tpu.constants import (R_specific, g as g_c,
                                                c_p_dry, p_surface_earth)
        from climatemodel_tpu.ops import convection as C

        def conv_fn(p, T2d, mode):
            from climatemodel_tpu.constants import (R_specific, g as gc,
                                                    c_p_dry, p_surface_earth)
            al = R_specific * (gc / c_p_dry) / gc
            pi = (p / p_surface_earth) ** al
            wgt = _trapz_weights(p)
            thresh = jnp.median(T2d[:, 0]) / 4.0
            if mode == 'cond_gate':
                from climatemodel_tpu.ops.convection import (
                    _reference_adjust_core)
                def unstable_any(T):
                    theta = T / pi
                    d = theta[1:] - theta[:-1]
                    d_ext = jnp.concatenate([d, d[-1:]])
                    return jnp.any(d_ext < -_instability_tol(theta))
                Tc = T2d[:, 0]
                Tn = lax.cond(unstable_any(Tc),
                              lambda t: _reference_adjust_core(pi, wgt, t,
                                                               thresh),
                              lambda t: t, Tc)
                return Tn[:, None]
            return flat_adjust_col(pi, wgt, T2d[:, 0], thresh, mode)[:, None]

        mode = variant

        @jax.jit
        def run_r(st, fc):
            net_fn = lambda T: grey_net_flux(T, fc)

            def step_r(c):
                st, ft, _d, i, _e, f0, n0, _t = c
                net = net_fn(st.T)
                st2, delta = column.update_temp(
                    st, net, p_int, p_c, convective_adjust=False,
                    compute_delta=True)
                # apply conv manually after the controller update (the
                # conv_mask bookkeeping is skipped — timing experiment only)
                T_adj = conv_fn(p_c, st2.T, mode)
                st2 = st2.replace(T=T_adj)
                eqb = column.check_equilibrium(st2.net_flux, delta,
                                               jnp.asarray(1e-9, dtype))
                failed = jnp.min(st2.T) < 0
                nan = ~(jnp.all(jnp.isfinite(st2.T))
                        & jnp.all(jnp.isfinite(net)))
                return st2, ft, delta, i + 1, eqb, failed, nan, _t

            def cond(c):
                _st, _ft, _d, i, eqb, failed, nan, tout = c
                return ~eqb & ~failed & ~nan & (i < N_STEPS)

            init = (st, jnp.asarray(1e-9, dtype), jnp.asarray(1e6, dtype),
                    jnp.asarray(0, jnp.int32), jnp.asarray(False),
                    jnp.asarray(False), jnp.asarray(False), jnp.asarray(False))
            out = lax.while_loop(cond, step_r, init)
            return out[0].T, out[3]
        run = lambda st: run_r(st, forcing)
    elif variant.startswith('book_'):
        # replicate update_temp's convective bookkeeping with toggles to find
        # which piece costs the remaining ~0.26 ms/step (dynforcing, gated
        # library core).  book_all == the library path; book_none == the
        # earlier cond_gate experiment.
        toggles = set(variant[5:].split('+')) if variant != 'book_none' else set()
        # toggles from: inconv (dt multiplier gather), mask (conv_mask
        # compute), carry (tsi.convective update)
        from climatemodel_tpu.ops.convection import convective_adjustment

        @jax.jit
        def run_bk(st, fc):
            net_fn = lambda T: grey_net_flux(T, fc)

            def stepb(c):
                st, ft, _d, i, _e, f0, n0, _t = c
                net = net_fn(st.T)
                T = st.T
                tsi = st.tsi
                n_flat = T.size
                flux_diff = net[1:, :] - net[:-1, :]
                from climatemodel_tpu.constants import g as gc, c_p_dry
                T_tendency = gc / c_p_dry * flux_diff / (
                    p_int[1:, :] - p_int[:-1, :])
                tend_flat = T_tendency.reshape(-1)
                first = st.t <= 0
                active = jnp.abs(net[:-1, :].reshape(-1)) > 1e-7
                allowed = jnp.where(first, jnp.ones((n_flat,), bool),
                                    active & ~tsi.removed)
                delta = jnp.where(
                    first, jnp.asarray(1e6, T.dtype),
                    column._percentile_topk(jnp.abs(net - st.net_flux),
                                            95).astype(T.dtype))
                any_allowed = jnp.any(allowed)
                tsi_new = column.update_time_step(tsi, tend_flat, allowed)
                tsi = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(any_allowed, new, old),
                    tsi_new, tsi)
                dt = tsi.dt
                if 'inconv' in toggles:
                    in_conv = tsi.convective[tsi.max_tend_ind]
                    dt = jnp.where(any_allowed & in_conv, dt * 5.0, dt)
                    tsi = tsi.replace(dt=dt)
                elif 'f32conv' in toggles:
                    # mask carried as f32 in tsi.convective; gather + compare
                    in_conv = tsi.convective[tsi.max_tend_ind] > 0.5
                    dt = jnp.where(any_allowed & in_conv, dt * 5.0, dt)
                    tsi = tsi.replace(dt=dt)
                elif 'anyconv' in toggles:
                    # same boolean via a masked reduction (no dynamic gather)
                    in_conv = jnp.any(tsi.convective
                                      & (jnp.arange(n_flat, dtype=jnp.int32)
                                         == tsi.max_tend_ind))
                    dt = jnp.where(any_allowed & in_conv, dt * 5.0, dt)
                    tsi = tsi.replace(dt=dt)
                T_new = jnp.where(allowed.reshape(T.shape),
                                  T + dt * T_tendency, T)
                if 'flat' in toggles:
                    from climatemodel_tpu.constants import (
                        R_specific, g as g2, c_p_dry as cpd, p_surface_earth)
                    al = R_specific * (g2 / cpd) / g2
                    piv = (p_c / p_surface_earth) ** al
                    wv = _trapz_weights(p_c)
                    thv = jnp.median(T_new[:, 0]) / 4.0
                    T_adj = flat_adjust_col(piv, wv, T_new[:, 0], thv,
                                            'flat_while')[:, None]
                else:
                    T_adj = convective_adjustment(p_c, T_new, descending=True,
                                                  method='reference')
                if 'mask' in toggles:
                    conv_mask = allowed & (
                        jnp.abs(T_adj.reshape(-1) - T_new.reshape(-1)) > 1e-5)
                    if 'carry' in toggles:
                        if 'f32conv' in toggles:
                            tsi = tsi.replace(
                                convective=conv_mask.astype(jnp.float32))
                        else:
                            tsi = tsi.replace(convective=conv_mask)
                T_new = T_adj
                st2 = st.replace(T=T_new, net_flux=net, t=st.t + dt, tsi=tsi)
                eqb = column.check_equilibrium(st2.net_flux, delta, ft)
                failed = jnp.min(st2.T) < 0
                nan = ~(jnp.all(jnp.isfinite(st2.T))
                        & jnp.all(jnp.isfinite(net)))
                return st2, ft, delta, i + 1, eqb, failed, nan, _t

            def cond(c):
                _st, _ft, _d, i, eqb, failed, nan, tout = c
                return ~eqb & ~failed & ~nan & (i < N_STEPS)

            if 'f32conv' in toggles:
                st = st.replace(tsi=st.tsi.replace(
                    convective=st.tsi.convective.astype(jnp.float32)))
            init = (st, jnp.asarray(1e-9, dtype), jnp.asarray(1e6, dtype),
                    jnp.asarray(0, jnp.int32), jnp.asarray(False),
                    jnp.asarray(False), jnp.asarray(False), jnp.asarray(False))
            out = lax.while_loop(cond, stepb, init)
            return out[0].T, out[3]
        run = lambda st: run_bk(st, forcing)
    elif variant == 'probe':
        # dyn-forcing march instrumented with: gate-trigger count (on the
        # PRE-adjustment profile), and the applied-adjustment magnitude
        # distribution: tiny (<1e-3 K: rounding-war class) vs real.
        from climatemodel_tpu.ops.convection import convective_adjustment
        from climatemodel_tpu.constants import (R_specific, g as gc, c_p_dry,
                                                p_surface_earth)

        @jax.jit
        def run_p(st, fc):
            def stepp(c):
                st, i, n_gate, n_tiny, n_real, max_adj, sum_adj = c
                net = grey_net_flux(st.T, fc)
                T = st.T
                tsi = st.tsi
                n_flat = T.size
                flux_diff = net[1:, :] - net[:-1, :]
                T_tendency = gc / c_p_dry * flux_diff / (
                    p_int[1:, :] - p_int[:-1, :])
                tend_flat = T_tendency.reshape(-1)
                first = st.t <= 0
                active = jnp.abs(net[:-1, :].reshape(-1)) > 1e-7
                allowed = jnp.where(first, jnp.ones((n_flat,), bool),
                                    active & ~tsi.removed)
                any_allowed = jnp.any(allowed)
                tsi_new = column.update_time_step(tsi, tend_flat, allowed)
                tsi = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(any_allowed, new, old),
                    tsi_new, tsi)
                dt = tsi.dt
                in_conv = tsi.convective[tsi.max_tend_ind]
                dt = jnp.where(any_allowed & in_conv, dt * 5.0, dt)
                tsi = tsi.replace(dt=dt)
                T_new = jnp.where(allowed.reshape(T.shape),
                                  T + dt * T_tendency, T)
                # gate predicate on the pre-adjustment profile
                al = R_specific * (gc / c_p_dry) / gc
                piv = (p_c / p_surface_earth) ** al
                theta = T_new[:, 0] / piv
                d = theta[1:] - theta[:-1]
                d_ext = jnp.concatenate([d, d[-1:]])
                fired = jnp.any(d_ext < -_instability_tol(theta))
                T_adj = convective_adjustment(p_c, T_new, descending=True,
                                              method='reference')
                adj = jnp.max(jnp.abs(T_adj - T_new))
                tiny = fired & (adj < 1e-3)
                real = fired & ~tiny
                conv_mask = allowed & (
                    jnp.abs(T_adj.reshape(-1) - T_new.reshape(-1)) > 1e-5)
                tsi = tsi.replace(convective=conv_mask)
                st2 = st.replace(T=T_adj, net_flux=net, t=st.t + dt, tsi=tsi)
                return (st2, i + 1, n_gate + fired.astype(jnp.int32),
                        n_tiny + tiny.astype(jnp.int32),
                        n_real + real.astype(jnp.int32),
                        jnp.maximum(max_adj, adj), sum_adj + adj)

            def cond(c):
                return c[1] < N_STEPS

            z = jnp.asarray(0, jnp.int32)
            out = lax.while_loop(cond, stepp,
                                 (st, z, z, z, z, jnp.asarray(0.0, dtype),
                                  jnp.asarray(0.0, dtype)))
            return out[2], out[3], out[4], out[5], out[6]

        if os.environ.get('PROBE_CONST'):
            run_p2 = jax.jit(lambda st: run_p.__wrapped__(st, forcing))
            runner = lambda st: run_p2(st)
        else:
            runner = lambda st: run_p(st, forcing)

        def go(st):
            g_, t_, r_, m_, s_ = jax.device_get(runner(st))
            print(f'probe: gate fired on {int(g_)}/{N_STEPS} steps; '
                  f'tiny(<1e-3K)={int(t_)} real={int(r_)} '
                  f'max|adj|={float(m_):.3e} K  mean|adj|='
                  f'{float(s_)/N_STEPS:.3e} K')
            return g_
        run = lambda st: go(st)
    elif variant == 'full_evolve':
        from climatemodel_tpu.models.grey import _grey_evolve
        ft = jnp.asarray(1e-9, dtype)
        def run(st):
            out = _grey_evolve(st, forcing, p_int, p_c, ft, t_end=1e9,
                               max_steps=N_STEPS, convective_adjust=True,
                               conv_method='reference')
            return out[0].T
    else:
        raise ValueError(variant)
    return lambda: jax.block_until_ready(run(st0))


def main():
    print(f'backend={jax.default_backend()} nz={NZ} steps={N_STEPS}')
    variants = sys.argv[2].split(',') if len(sys.argv) > 2 else (
        'fori_plain', 'while_trivial_cond', 'while_flags_not_in_cond',
        'while_flags_in_cond', 'while_exact_carry', 'evolve_direct',
        'full_evolve')
    for v in variants:
        wall = best_of(make(v))
        print(f'{v:26s} {1e3 * wall / N_STEPS:8.4f} ms/step')


if __name__ == '__main__':
    main()
