"""Equilibrium climate sensitivities by implicit differentiation.

A framework extra with no reference counterpart: the reference can only
estimate a sensitivity by perturbing a parameter and RE-MARCHING to
equilibrium (e.g. the ice-albedo hysteresis loop re-equilibrates per ramp
step, ice_albedo_feedback.py:139-166; the GHG ladders re-march per
composition, real_gas_script.py:27-40).  Because the whole radiation operator
here is a differentiable JAX function, the linear response of the equilibrium
itself is available directly from the implicit function theorem:

    the march's fixed point satisfies  F(T*, theta) = 0,   where F is the
    cellwise heating tendency  dT/dt = g/c_p * dF_net/dp,  so

    dT*/dtheta = -(dF/dT)^{-1} (dF/dtheta)          evaluated AT equilibrium

— one Jacobian (``jax.jacfwd`` over the fused flux operator, an [n, n]
matrix with n = nz-1 cells) and one linear solve, instead of a re-march per
parameter.  The Jacobian's diagonal is the Planck feedback (4 sigma T^3
cooling-to-space makes it strongly negative), which keeps the active-region
system well conditioned.

Caveats (documented, asserted in tests):

* valid for RADIATIVE equilibria.  A radiative-convective equilibrium is the
  fixed point of (adjustment o step) — the adjustment operator is piecewise
  and its active-set can change under the perturbation, so the pure-radiative
  Jacobian is wrong inside convective layers.
* the full-system solve is the default and is usually well conditioned even
  at optically thin levels (measured cond(J) ~ 26 on the nz=40 exponential
  world; every cell's own Planck emission keeps its diagonal alive, and the
  thin cells' transmission feedback onto the active region is REAL — masking
  them to dT=0 biased active-region sensitivities by ~9%).  For worlds with
  genuinely decoupled micro-mass levels (thermosphere p_toa ~ 0.1 Pa) an
  ``active`` mask can be passed to force dT = 0 outside it — those levels'
  equilibria are path-dependent anyway (CLAUDE.md).
* the response is LINEAR — a 1% insolation sensitivity extrapolates, a
  bifurcation (ice-albedo snowball jump) does not.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import g, c_p_dry


def _masked_solve(J, b, active=None):
    """Solve J dT = b; with an ``active`` mask, inactive rows/cols are
    replaced by identity rows (their dT is forced to b=0), keeping one
    static-shape dense solve instead of a gather to a dynamic submatrix."""
    if active is None:
        return jnp.linalg.solve(J, b)
    n = J.shape[0]
    both = active[:, None] & active[None, :]
    eye = jnp.eye(n, dtype=J.dtype)
    J_m = jnp.where(both, J, eye)
    b_m = jnp.where(active, b, 0.0)
    return jnp.linalg.solve(J_m, b_m)


def equilibrium_sensitivity(tendency_fn, T_eq, d_tendency, active=None):
    """dT* in a perturbation direction, by the implicit function theorem.

    :param tendency_fn: T [n] -> heating tendency [n] (K/s) at fixed
        parameters; must be JAX-differentiable.
    :param T_eq: [n] equilibrium temperatures (tendency_fn(T_eq) ~ 0).
    :param d_tendency: [n] directional derivative of the tendency with
        respect to the perturbed parameter, evaluated at T_eq — i.e.
        ``jax.jvp(lambda theta: tendency(T_eq, theta), (theta,), (dtheta,))``.
    :param active: optional [n] bool; cells outside it are pinned to dT = 0
        (use ONLY for genuinely decoupled levels whose Jacobian rows vanish —
        masking weakly-coupled cells biases the coupled solution, see module
        docstring).  None (default) solves the full system.
    :return: [n] equilibrium shift dT* per unit of the perturbation.
    """
    J = jax.jacfwd(tendency_fn)(T_eq)
    return _masked_solve(J, -d_tendency, active)


# --------------------------------------------------------------------------
# Grey model front-end
# --------------------------------------------------------------------------

def _grey_tendency(T_col, forcing, p_int_col):
    # evaluate the flux via lw_flux_plain (the differentiable associative
    # scan), NOT the custom_vmap kernel dispatcher the march uses: jacfwd
    # vmaps a jvp through the custom-batching rule, which retraces
    # recursively and hangs (see ops/two_stream.py lw_flux docstring)
    from ..ops.two_stream import lw_flux_plain, sw_flux
    up_toa = (1.0 - forcing.albedo_mod) * forcing.solar_latitude_factor * \
        forcing.F_stellar / 4.0
    up_lw, down_lw = lw_flux_plain(T_col[:, None], forcing.dtau, up_toa,
                                   surface_first=True)
    up_sw, down_sw = sw_flux(forcing.tau_sw_interface, forcing.albedo_mod,
                             forcing.solar_latitude_factor, forcing.F_stellar)
    net = (up_lw - down_lw + up_sw - down_sw)[:, 0]
    return g / c_p_dry * (net[1:] - net[:-1]) / (p_int_col[1:] - p_int_col[:-1])


def grey_equilibrium_sensitivity(world, dforcing=None, active_tau_thresh=None):
    """Linear response dT*[nz-1, ny] of a marched grey equilibrium to a
    forcing perturbation.

    :param world: a ``GreyGas`` already marched to RADIATIVE equilibrium.
    :param dforcing: a ``GreyForcing`` pytree of perturbation directions
        (same shapes as ``world.forcing``); e.g. 1 W/m^2 of stellar constant:
        ``world.forcing.replace(dtau=0*..., ..., F_stellar=1.0)``.  None
        defaults to exactly that insolation direction.
    :param active_tau_thresh: optional; when set, cells with |dtau_lw| below
        it are pinned to dT = 0.  Default None solves the full system (the
        right choice unless the world has genuinely decoupled micro-mass
        levels — see module docstring).
    :return: np.ndarray [nz-1, ny], kelvin per unit perturbation.

    Columns (latitudes) are independent in this model, so each is solved
    separately.
    """
    forcing = world.forcing
    if dforcing is None:
        zeros = jax.tree_util.tree_map(jnp.zeros_like, forcing)
        dforcing = zeros.replace(F_stellar=jnp.ones_like(forcing.F_stellar))
    T_eq = jnp.asarray(world.state.T)
    p_int = jnp.asarray(world.p_interface, world.dtype)
    active = (None if active_tau_thresh is None
              else jnp.abs(forcing.dtau) > active_tau_thresh)

    @jax.jit
    def one_col(T_col, p_col, f_col, df_col, act_col):
        # jitted: the per-latitude host loop must dispatch ONE compiled
        # call per column, not an eager jacfwd/solve chain (each eager op
        # is a tunnel round trip on axon; r04 review finding).  Compiled
        # once — column shapes are identical across j.
        tend = lambda T: _grey_tendency(T, f_col, p_col)
        _, dF = jax.jvp(lambda f: _grey_tendency(T_col, f, p_col),
                        (f_col,), (df_col,))
        return equilibrium_sensitivity(tend, T_col, dF, act_col)

    ny = T_eq.shape[1]
    outs = []
    for j in range(ny):                      # ny is small (<= ~64); host loop
        f_col = jax.tree_util.tree_map(
            lambda x: x[..., j:j + 1] if x.ndim == 2 else
            (x[j:j + 1] if x.ndim == 1 else x), forcing)
        df_col = jax.tree_util.tree_map(
            lambda x: x[..., j:j + 1] if x.ndim == 2 else
            (x[j:j + 1] if x.ndim == 1 else x), dforcing)
        outs.append(one_col(T_eq[:, j], p_int[:, j], f_col, df_col,
                            None if active is None else active[:, j]))
    return np.asarray(jnp.stack(outs, axis=1))


def _pooled_rce_solve(T_col, pi, w, J, dF, pool_tol):
    """Solve the pooled marginal-neutrality system (see
    grey_rce_equilibrium_sensitivity): pools from theta flatness of the
    endpoint, dT = R x with R the per-pool adiabat shapes, equations = the
    pool-wise w-weighted enthalpy balance of the perturbed tendency.
    Orientation-agnostic: T_col/pi/w and J/dF just have to share an index
    order.

    Everything here is HOST NumPy on pulled data: the pool structure is
    data-dependent (m varies per column, so a jitted solve would retrace
    per distinct pool count) and the matrices are small — the caller pulls
    (T_col, J, dF) in one batched device_get (r04 review finding)."""
    T_col, pi, w, J, dF = (np.asarray(x, np.float64)
                           for x in (T_col, pi, w, J, dF))
    theta = T_col / pi
    rel = np.abs(np.diff(theta)) / np.maximum(np.abs(theta[:-1]),
                                              np.abs(theta[1:]))
    same = rel < pool_tol
    pool_id = np.concatenate([[0], np.cumsum(~same)])
    m = int(pool_id[-1]) + 1
    n = T_col.shape[0]
    R = np.zeros((n, m))
    R[np.arange(n), pool_id] = pi
    W = np.zeros((m, n))
    W[pool_id, np.arange(n)] = w
    x = np.linalg.solve(W @ J @ R, -(W @ dF))
    return R @ x


def grey_rce_equilibrium_sensitivity(world, dforcing=None, pool_tol=1e-4):
    """Linear response of a RADIATIVE-CONVECTIVE equilibrium (framework
    extra: the textbook climate-sensitivity quantity, with convection).

    At RCE the convective layer sits at marginal neutrality — potential
    temperature theta = T/(p/p_ref)^alpha is CONSTANT across each
    convectively-mixed pool (the adjustment operator is the identity at the
    fixed point; the level-wise radiative imbalance inside the pool is the
    implied convective flux).  Under a forcing perturbation the pool must
    (a) stay on the adiabat — its temperatures move together as
    dT_i = dtheta_pool * pi_i — and (b) keep zero net enthalpy drift —
    sum_i w_i f_i = 0 over the pool (w = the adjustment's trapz enthalpy
    weights; the adjustment redistributes but conserves enthalpy).  Free
    cells are singleton pools, for which (b) reduces to the radiative
    balance f_i = 0.  That collapses the IFT system to one unknown per pool:

        (W J R) x = -(W dF),   dT = R x

    with R[i, b] = pi_i on pool b's cells and W the pool-wise w-weighted
    row sum.  Pools are detected from the marched endpoint by theta
    flatness (relative ``pool_tol``); validity assumes the perturbation
    does not change the pool structure (generic case; a pool on the verge
    of splitting/merging is a genuine non-smoothness of RCE itself).

    The exact grey oracle survives convection: the adjustment is
    scale-equivariant in T (pooling depends only on theta ORDER, enthalpy
    conservation is linear), so the RCE still maps F -> (1+eps)F onto
    T -> (1+eps)^(1/4) T and dT*/dF = T*/(4F) at every level
    (tests/test_sensitivity.py pins this on the thermosphere world).

    :param world: a ``GreyGas`` marched with ``convective_adjust=True``.
    :return: np.ndarray [nz-1, ny], kelvin per unit perturbation.
    """
    from ..constants import R_specific, c_p_dry as cpd, p_surface_earth
    from ..ops.convection import _trapz_weights

    forcing = world.forcing
    if dforcing is None:
        zeros = jax.tree_util.tree_map(jnp.zeros_like, forcing)
        dforcing = zeros.replace(F_stellar=jnp.ones_like(forcing.F_stellar))
    T_eq = jnp.asarray(world.state.T)
    p_int = jnp.asarray(world.p_interface, world.dtype)
    p_c = jnp.asarray(world.p[:, 0], world.dtype)      # descending, sfc first
    alpha = R_specific / cpd
    pi = (p_c / p_surface_earth) ** alpha
    w = _trapz_weights(p_c)

    @jax.jit
    def col_jac(T_col, p_col, f_col, df_col):
        # ONE compiled device call per column (compiled once); the pooled
        # solve itself is host NumPy on a single batched pull
        J = jax.jacfwd(lambda T: _grey_tendency(T, f_col, p_col))(T_col)
        _, dF = jax.jvp(lambda f: _grey_tendency(T_col, f, p_col),
                        (f_col,), (df_col,))
        return J, dF

    pi_np, w_np = jax.device_get((pi, w))
    ny = T_eq.shape[1]
    outs = []
    for j in range(ny):
        f_col = jax.tree_util.tree_map(
            lambda x: x[..., j:j + 1] if x.ndim == 2 else
            (x[j:j + 1] if x.ndim == 1 else x), forcing)
        df_col = jax.tree_util.tree_map(
            lambda x: x[..., j:j + 1] if x.ndim == 2 else
            (x[j:j + 1] if x.ndim == 1 else x), dforcing)
        J, dF = col_jac(T_eq[:, j], p_int[:, j], f_col, df_col)
        T_np, J_np, dF_np = jax.device_get((T_eq[:, j], J, dF))
        outs.append(_pooled_rce_solve(T_np, pi_np, w_np, J_np, dF_np,
                                      pool_tol))
    return np.stack(outs, axis=1)


# --------------------------------------------------------------------------
# Real-gas front-end
# --------------------------------------------------------------------------

def _real_gas_J_dF(gas, d_tau_interface, d_F_scale, d_T_g):
    """(T_eq, J, dF) of the real-gas heating tendency at the marched
    endpoint, with the perturbation direction folded into dF."""
    from ..models.real_gas import (precompute_transmission,
                                   real_gas_net_and_diff_cached)
    ba = gas.band_arrays
    delta = jnp.asarray(gas.nu_bands['delta'], gas.dtype)
    p_int = jnp.asarray(gas.p_interface[:, 0], gas.dtype)
    T_eq = jnp.asarray(gas.state.T[:, 0])
    tau0 = gas.tau_device
    T_g0 = jnp.asarray(gas.T_g, gas.dtype)
    s0 = jnp.asarray(1.0, gas.dtype)

    def tend(T, tau_i, T_g, scale):
        # rebuild the cache inside so tau enters differentiably (the march
        # hoists it; for the Jacobian the jvp just flows through it)
        cache = precompute_transmission(tau_i, ba, None)
        net, net_diff = real_gas_net_and_diff_cached(
            T, T_g, cache, ba, gas._F_star_factor * scale, delta)
        return g / c_p_dry * net_diff[:, 0] / (p_int[1:] - p_int[:-1])

    d_tau = (jnp.zeros_like(tau0) if d_tau_interface is None
             else jnp.asarray(d_tau_interface, tau0.dtype))
    _, dF = jax.jvp(lambda tau_i, T_g, s: tend(T_eq, tau_i, T_g, s),
                    (tau0, T_g0, s0),
                    (d_tau, jnp.asarray(d_T_g, gas.dtype),
                     jnp.asarray(d_F_scale, gas.dtype)))
    J = jax.jacfwd(lambda T: tend(T, tau0, T_g0, s0))(T_eq)
    return T_eq, J, dF


def real_gas_equilibrium_sensitivity(gas, d_tau_interface=None, d_F_scale=0.0,
                                     d_T_g=0.0, active_tau_thresh=None):
    """Linear response dT*[nz-1] of a marched real-gas equilibrium to a
    composition (optical depth), insolation, or ground-temperature change.

    The perturbation enters through the march operator's actual inputs: the
    banded interface optical depths (compute ``d_tau_interface`` as
    ``tau(perturbed composition) - tau(composition)`` from the table
    pipeline — the linearised GHG-ladder response without a re-march), a
    relative insolation scale (``d_F_scale=0.01`` = +1% stellar flux), and/or
    a ground-temperature shift ``d_T_g`` (kelvin).

    :param gas: a ``RealGas`` marched to RADIATIVE equilibrium (ny=1 by
        reference semantics, real_gas.py:634); for a convectively-adjusted
        march use :func:`real_gas_rce_equilibrium_sensitivity`.
    :return: np.ndarray [nz-1], kelvin per unit perturbation.
    """
    T_eq, J, dF = _real_gas_J_dF(gas, d_tau_interface, d_F_scale, d_T_g)
    active = None
    if active_tau_thresh is not None:
        tau0 = gas.tau_device
        # active where ANY band has meaningful optical-depth increments
        dtau_cell = jnp.abs(tau0[1:, :] - tau0[:-1, :]).max(axis=1)
        active = dtau_cell > active_tau_thresh
    return np.asarray(_masked_solve(J, -dF, active))


def real_gas_rce_equilibrium_sensitivity(gas, d_tau_interface=None,
                                         d_F_scale=0.0, d_T_g=0.0,
                                         pool_tol=1e-4):
    """Linear response of a real-gas RADIATIVE-CONVECTIVE equilibrium —
    the pooled marginal-neutrality solve of
    :func:`grey_rce_equilibrium_sensitivity` with the real-gas band operator
    (same perturbation directions as
    :func:`real_gas_equilibrium_sensitivity`).  On an endpoint with no
    convective pools this reduces exactly to the radiative full solve
    (every cell a singleton pool)."""
    from ..constants import R_specific, c_p_dry as cpd, p_surface_earth
    from ..ops.convection import _trapz_weights

    T_eq, J, dF = _real_gas_J_dF(gas, d_tau_interface, d_F_scale, d_T_g)
    p_c = jnp.asarray(gas.p[:, 0], gas.dtype)       # TOA-first, ascending
    alpha = R_specific / cpd
    pi = (p_c / p_surface_earth) ** alpha
    # the adjustment's enthalpy weights are defined on descending p; flip in
    # and out so the weights stay positive in this module's TOA-first order
    w = jnp.flip(_trapz_weights(jnp.flip(p_c)))
    T_np, pi_np, w_np, J_np, dF_np = jax.device_get((T_eq, pi, w, J, dF))
    return _pooled_rce_solve(T_np, pi_np, w_np, J_np, dF_np, pool_tol)
