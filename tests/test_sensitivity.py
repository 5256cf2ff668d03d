"""Equilibrium sensitivities by implicit differentiation
(diagnostics/sensitivity.py) — a framework extra the NumPy reference can only
approximate by re-marching.

Oracles:

* grey insolation sensitivity has an EXACT closed form: every grey flux is
  either proportional to sigma*T^4 (lw emission) or to F_stellar (sw/boundary
  terms), so scaling F by (1+eps) scales the equilibrium T^4 by (1+eps) —
  dT*/dF = T*/(4F) exactly, independent of the tau profile, at EVERY level.
* real-gas sensitivities are checked against a finite-difference re-march
  (the reference's only way to get them).
"""
import numpy as np
import pytest

from climatemodel_tpu.constants import F_sun
from climatemodel_tpu.diagnostics import sensitivity as sens
from climatemodel_tpu.models.grey import GreyGas


def _grey_world(ny=1, F=F_sun):
    return GreyGas(nz=40, ny=ny, tau_lw_func='exponential',
                   tau_lw_func_args=[100000, 4], F_stellar_constant=F)


def _march_tight(world, n=2):
    for _ in range(n):
        world.evolve_to_equilibrium(flux_thresh=1e-5, save=False, t_end=30.0)


def test_grey_insolation_sensitivity_analytic():
    world = _grey_world()
    _march_tight(world)
    dT = sens.grey_equilibrium_sensitivity(world)        # per W/m^2 stellar
    T = np.asarray(world.state.T)
    expected = T / (4.0 * F_sun)
    assert dT.shape == T.shape
    # full-system solve: EVERY level matches the exact scaling law (the
    # residual reflects how tightly the march converged, measured 0.4%)
    np.testing.assert_allclose(dT, expected, rtol=1e-2)


def test_grey_sensitivity_matches_remarch():
    """Cross-check against the reference's method: perturb F_stellar by 1%
    and re-march.  The FD baseline carries the delta-percentile exit's own
    slack (the surface cell can sit ~0.2 K off exact balance), so the
    comparison is mid-column."""
    world = _grey_world()
    _march_tight(world)
    dT = sens.grey_equilibrium_sensitivity(world)
    dF = 0.01 * F_sun
    world2 = _grey_world(F=F_sun + dF)
    _march_tight(world2)
    fd = (np.asarray(world2.state.T) - np.asarray(world.state.T))
    sl = slice(1, None)                      # skip the noisy surface cell
    np.testing.assert_allclose(dT[sl] * dF, fd[sl], rtol=0.03)


def test_grey_sensitivity_latitude_grid():
    """ny>1: each latitude column is an independent system; the insolation
    sensitivity keeps the exact T/(4F) form per column."""
    world = _grey_world(ny=4)
    _march_tight(world)
    dT = sens.grey_equilibrium_sensitivity(world)
    T = np.asarray(world.state.T)
    np.testing.assert_allclose(dT, T / (4.0 * F_sun), rtol=1e-2)


def test_grey_sensitivity_active_mask_pins_zero():
    """The opt-in decoupled-level mask pins masked cells to exactly 0 and
    leaves the active block well-posed (biased vs the full solve by the
    masked cells' transmission feedback — documented)."""
    world = _grey_world()
    _march_tight(world)
    dT = sens.grey_equilibrium_sensitivity(world, active_tau_thresh=0.03)
    active = np.abs(np.asarray(world.forcing.dtau)) > 0.03
    assert np.all(dT[~active] == 0.0)
    assert np.all(dT[active] > 0.0)


def _make_real_gas(T_g):
    from climatemodel_tpu.models.real_gas import RealGas
    from climatemodel_tpu.spectral import humidity
    return RealGas(nz=40, ny=1, molecule_names=['single_line'], T_g=T_g,
                   q_funcs={'single_line': humidity.co2},
                   q_funcs_args={'single_line': ()},
                   delta_temp_change=0.1, dtype=np.float64)


def test_real_gas_tendency_derivatives_match_central_differences():
    """The implicit solve's two ingredients — the Jacobian dF/dT and the
    parameter derivative dF/dT_g — match f64 central differences of the
    actual tendency function.  (The IFT conclusion follows mathematically;
    the re-march comparison below is limited by the march's own exit slack.)
    """
    import jax
    import jax.numpy as jnp
    from climatemodel_tpu.constants import g as g_c, c_p_dry
    from climatemodel_tpu.models.real_gas import (
        precompute_transmission, real_gas_net_and_diff_cached)

    base = _make_real_gas(260.0)
    for _ in range(2):
        base.evolve_to_equilibrium(flux_thresh=1e-4, save=False, t_end=30.0)
    ba = base.band_arrays
    delta = jnp.asarray(base.nu_bands['delta'], base.dtype)
    p_int = jnp.asarray(base.p_interface[:, 0], base.dtype)
    T_eq = jnp.asarray(base.state.T[:, 0])
    tau0 = base.tau_device

    def tend(T, T_g):
        cache = precompute_transmission(tau0, ba, None)
        _net, net_diff = real_gas_net_and_diff_cached(
            T, T_g, cache, ba, base._F_star_factor, delta)
        return g_c / c_p_dry * net_diff[:, 0] / (p_int[1:] - p_int[:-1])

    # residual tendency at the marched equilibrium is tiny
    assert float(jnp.abs(tend(T_eq, 260.0)).max()) < 1e-4

    e = 1e-3
    dF_fd = (tend(T_eq, 260.0 + e) - tend(T_eq, 260.0 - e)) / (2 * e)
    _, dF_ad = jax.jvp(lambda tg: tend(T_eq, tg),
                       (jnp.asarray(260.0, base.dtype),),
                       (jnp.asarray(1.0, base.dtype),))
    np.testing.assert_allclose(np.asarray(dF_ad), np.asarray(dF_fd),
                               rtol=1e-6, atol=1e-12)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=T_eq.shape))
    J = jax.jacfwd(lambda T: tend(T, 260.0))(T_eq)
    Jv_fd = (tend(T_eq + e * v, 260.0) - tend(T_eq - e * v, 260.0)) / (2 * e)
    np.testing.assert_allclose(np.asarray(J @ v), np.asarray(Jv_fd),
                               rtol=1e-5, atol=1e-11)


def test_real_gas_ground_temperature_sensitivity():
    """dT*/dT_g against a finite-difference re-march on the single-line
    column (f64).  The re-march baseline is only trustworthy away from the
    surface: near-surface cells carry the delta-percentile exit's slack
    (FD values there differ by 2-3x between step sizes d=0.25 and d=0.5,
    while the implicit profile is smooth), so the comparison is the upper
    (TOA-first) two thirds of the column."""
    base = _make_real_gas(260.0)
    for _ in range(2):
        base.evolve_to_equilibrium(flux_thresh=1e-4, save=False, t_end=30.0)
    dT = sens.real_gas_equilibrium_sensitivity(base, d_T_g=1.0)

    d = 0.5
    pert = _make_real_gas(260.0 + d)
    for _ in range(2):
        pert.evolve_to_equilibrium(flux_thresh=1e-4, save=False, t_end=30.0)
    fd = (np.asarray(pert.state.T) - np.asarray(base.state.T))[:, 0] / d
    # measured FD agreement: 1.7% at TOA degrading smoothly to ~20% by cell
    # 25 as the exit slack grows toward the surface — compare the clean half
    sl = slice(0, 18)
    assert np.all(np.abs(fd[sl]) > 0.05)
    np.testing.assert_allclose(dT[sl], fd[sl], rtol=0.06)


def test_grey_sensitivity_thermosphere_microlevels_full_solve():
    """The full-system solve stays well-posed on a world WITH radiatively-
    decoupled micro-mass levels (thermosphere tau peak, f32): active-region
    sensitivities match the exact oracle; decoupled levels are garbage-but-
    finite (their equilibria are path-dependent even in the reference).
    The opt-in mask is NOT better here — measured 70% active-region error
    at nz=598 vs the full solve's 0.2% — pinning the full-solve default."""
    from climatemodel_tpu.constants import p_surface_earth
    world = GreyGas(nz=150, ny=1,
                    tau_lw_func='scale_height_and_peak_in_atmosphere',
                    tau_lw_func_args=[51000, 4, 100, 600, 0.1],
                    tau_sw_func='scale_height_and_peak_in_atmosphere',
                    tau_sw_func_args=[p_surface_earth, 0.12, 100, 20, 0.002],
                    dtype=np.float32)
    world.evolve_to_equilibrium(flux_thresh=1e-2, save=False)
    dT = sens.grey_equilibrium_sensitivity(world)
    assert np.isfinite(dT).all()
    T = np.asarray(world.state.T)
    F = float(np.asarray(world.forcing.F_stellar))
    act = np.abs(np.asarray(world.forcing.dtau)) > 0.03
    rel = np.abs(dT / (T / (4.0 * F)) - 1)
    assert float(rel[act].max()) < 0.02


def test_real_gas_composition_sensitivity():
    """The composition direction (d tau_interface — the linearised GHG-ladder
    response): perturb the single-line gas's surface mixing ratio by +10%,
    compute d_tau = tau(1.1 q) - tau(q) from the actual table pipeline, and
    check the implicit response against a finite-difference re-march of the
    perturbed composition (trustworthy away from the surface, like the T_g
    test above)."""
    from climatemodel_tpu.models.real_gas import RealGas
    from climatemodel_tpu.spectral import humidity

    def make(q_scale):
        return RealGas(nz=40, ny=1, molecule_names=['single_line'],
                       T_g=260.0, q_funcs={'single_line': humidity.co2},
                       q_funcs_args={'single_line': (370 * q_scale,)},
                       delta_temp_change=0.1, dtype=np.float64)

    base = make(1.0)
    for _ in range(2):
        base.evolve_to_equilibrium(flux_thresh=1e-4, save=False, t_end=30.0)
    # central difference at +-8%: the FD oracle needs the signal (~1.2 K) to
    # dominate the march exit slack (~0.1 K near-surface, less aloft) —
    # measured per-unit-scale FD is -9.7 at d=0.02 vs -15.1/-14.3 at
    # d=0.04/0.08 (noise does NOT cancel in small central differences of a
    # marched equilibrium), while the implicit tangent (-14.2) matches the
    # d=0.08 FD to 0.5-3% over the upper three quarters of the column
    up, dn = make(1.08), make(0.92)
    d_tau = (np.asarray(up.tau_interface)
             - np.asarray(dn.tau_interface)) / 2.0
    dT = sens.real_gas_equilibrium_sensitivity(base, d_tau_interface=d_tau)
    assert np.isfinite(dT).all()

    for w in (up, dn):
        for _ in range(2):
            w.evolve_to_equilibrium(flux_thresh=1e-4, save=False, t_end=30.0)
    fd = (np.asarray(up.state.T) - np.asarray(dn.state.T))[:, 0] / 2.0
    sl = slice(0, 28)
    assert np.abs(fd[sl]).max() > 0.5      # the perturbation is substantive
    np.testing.assert_allclose(dT[sl], fd[sl], rtol=0.05)


def test_grey_rce_sensitivity_analytic_oracle():
    """Radiative-CONVECTIVE equilibrium sensitivity: the adjustment is
    scale-equivariant in T, so the exact dT*/dF = T*/(4F) oracle survives
    convection.  The pooled (one-unknown-per-convective-pool) solve hits it
    to 0.1% on the isotonic endpoint; the faithful-method endpoint is looser
    (delta-exit slack, ragged pool edges) at ~5%.  The pure-radiative solver
    applied to the same RCE endpoint is the negative control — inside the
    convective layer the radiative-balance assumption is simply false."""
    from climatemodel_tpu.constants import p_surface_earth

    def rce(method):
        w = GreyGas(nz=150, ny=1,
                    tau_lw_func='scale_height_and_peak_in_atmosphere',
                    tau_lw_func_args=[51000, 4, 100, 600, 0.1],
                    tau_sw_func='scale_height_and_peak_in_atmosphere',
                    tau_sw_func_args=[p_surface_earth, 0.12, 100, 20, 0.002],
                    dtype=np.float32)
        for _ in range(2):
            w.evolve_to_equilibrium(flux_thresh=1e-2, save=False,
                                    convective_adjust=True,
                                    conv_method=method)
        return w

    for method, bound in (('isotonic', 0.01), ('reference', 0.08)):
        w = rce(method)
        dT = sens.grey_rce_equilibrium_sensitivity(w)
        T = np.asarray(w.state.T)
        F = float(np.asarray(w.forcing.F_stellar))
        act = np.abs(np.asarray(w.forcing.dtau)) > 0.03
        rel = np.abs(dT / (T / (4.0 * F)) - 1)
        assert float(rel[act].max()) < bound, (method, float(rel[act].max()))
        if method == 'isotonic':
            # the world is genuinely convective: the pooled solve must have
            # found at least one multi-cell adiabatic pool, and ignoring it
            # (pure-radiative IFT) must be measurably WORSE
            dT_rad = sens.grey_equilibrium_sensitivity(w)
            rel_rad = np.abs(dT_rad / (T / (4.0 * F)) - 1)
            assert float(rel_rad[act].max()) > 2 * float(rel[act].max())


def test_real_gas_rce_sensitivity():
    """Real-gas RCE sensitivity: on a convectively-adjusted endpoint the
    pooled solve finds the adiabatic pools and produces a smooth warming
    response to +1% insolation; on a purely radiative endpoint (no pools)
    it reduces exactly to the radiative full solve."""
    base = _make_real_gas(260.0)
    for _ in range(2):
        base.evolve_to_equilibrium(flux_thresh=1e-4, save=False, t_end=30.0)
    # no pools at a radiative endpoint -> identical to the radiative solve
    rad = sens.real_gas_equilibrium_sensitivity(base, d_F_scale=0.01)
    rce = sens.real_gas_rce_equilibrium_sensitivity(base, d_F_scale=0.01)
    np.testing.assert_allclose(rce, rad, rtol=1e-10)

    # T_g=330 is the coolest single-line ground that actually pools cells
    # at RCE (260/300 K endpoints are convectively stable already)
    conv = _make_real_gas(330.0)
    for _ in range(2):
        conv.evolve_to_equilibrium(flux_thresh=1e-4, save=False, t_end=30.0,
                                   convective_adjust=True)
    dT = sens.real_gas_rce_equilibrium_sensitivity(conv, d_F_scale=0.01)
    assert np.isfinite(dT).all()
    assert np.all(dT > 0)                    # more sun, warmer everywhere
    # the convective march genuinely pooled some cells (theta-flat runs)
    from climatemodel_tpu.constants import R_specific, c_p_dry, \
        p_surface_earth
    theta = (np.asarray(conv.state.T)[:, 0]
             / (np.asarray(conv.p[:, 0]) / p_surface_earth)
             ** (R_specific / c_p_dry))
    rel = np.abs(np.diff(theta)) / theta[:-1]
    assert (rel < 1e-4).sum() >= 1
    # pooled cells move together on the adiabat: dtheta is constant within
    # a pool
    dtheta = dT / (np.asarray(conv.p[:, 0]) / p_surface_earth) \
        ** (R_specific / c_p_dry)
    pooled = rel < 1e-4
    np.testing.assert_allclose(np.diff(dtheta)[pooled], 0.0, atol=1e-10)
