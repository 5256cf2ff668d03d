"""Faithful group-blend Pallas kernel (ops/pallas_convection.py): interpret-
mode parity against the XLA core, the batched executor's vmap flattening,
and the routing gate.  Compiled-Mosaic behaviour is validated separately on
the real chip before the kernel is enabled by default
(CLIMATEMODEL_TPU_CONV_REF_KERNEL)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from climatemodel_tpu.constants import (R_specific, c_p_dry, g,
                                        p_surface_earth)
from climatemodel_tpu.models.grey import GreyGas
from climatemodel_tpu.ops import convection as cv
from climatemodel_tpu.ops.pallas_convection import faithful_adjust_lanes


def _thermo_profile(nz=120, dtype=jnp.float32):
    w = GreyGas(nz=nz, ny=1,
                tau_lw_func='scale_height_and_peak_in_atmosphere',
                tau_lw_func_args=[51000, 4, 100, 600, 0.1],
                tau_sw_func='scale_height_and_peak_in_atmosphere',
                tau_sw_func_args=[p_surface_earth, 0.12, 100, 20, 0.002],
                dtype=dtype)
    w.evolve_to_equilibrium(flux_thresh=1e-1, save=False)
    return (jnp.asarray(w.p[:, 0], dtype), jnp.asarray(w.T[:, 0], dtype))


def _grid(p):
    alpha = R_specific * (g / c_p_dry) / g
    return (p / p_surface_earth) ** alpha, cv._trapz_weights(p)


def _batch(T0, n_extra, dtype, seed=0):
    rng = np.random.default_rng(seed)
    cols = [np.asarray(T0)] + [
        np.asarray(T0) * (1 + 0.02 * rng.normal(size=T0.shape))
        for _ in range(n_extra)]
    return jnp.asarray(np.stack(cols), dtype)


@pytest.mark.parametrize('dtype,tol', [(jnp.float32, 0.0),
                                       (jnp.float64, 1e-12)])
def test_kernel_interpret_matches_xla_core(dtype, tol):
    """Interpret-mode kernel output vs the XLA faithful core: bit-exact in
    f32 (same theta convention, same reduction values on these profiles) and
    <=1e-12 in f64, on the radiatively-marched unstable thermosphere profile
    plus random perturbations, including a non-128-multiple batch (the lane
    padding path)."""
    p, T0 = _thermo_profile(dtype=dtype)
    pi, w = _grid(p)
    T2d = _batch(T0, 6, dtype)                       # b=7: padded lanes
    thr = jnp.median(T2d, axis=1) / 4.0
    want = jnp.stack([cv._reference_adjust_single(
        p, T2d[i], g / c_p_dry, thr[i], p_surface_earth)
        for i in range(T2d.shape[0])])
    got = faithful_adjust_lanes(T2d, pi, w, thr, interpret=True)
    # the adjustment must actually fire on the marched profile
    assert bool(jnp.any(want[0] != T2d[0]))
    err = np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64))
    assert float(err.max()) <= tol, err.max()


def test_ref_rows_vmap_flattens_to_one_batch():
    """Nested vmaps over _ref_rows merge into one leading row axis (the
    _iso_rows pattern) and match the per-column core exactly."""
    p, T0 = _thermo_profile(nz=80)
    pi, w = _grid(p)
    T3 = jnp.stack([_batch(T0, 2, jnp.float32, seed=s) for s in (1, 2)])
    thr = jnp.median(T3, axis=2) / 4.0               # [2, 3]
    got = jax.vmap(lambda T2, t2: cv._ref_rows(T2, pi, w, t2))(T3, thr)
    want = jnp.stack([jnp.stack([
        cv._reference_adjust_single(p, T3[i, j], g / c_p_dry, thr[i, j],
                                    p_surface_earth)
        for j in range(T3.shape[1])]) for i in range(T3.shape[0])])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_convective_adjustment_reference_unchanged_by_routing():
    """The public convective_adjustment(method='reference') output is
    unchanged by the _ref_rows routing (CPU fallback path = the old vmap)."""
    p, T0 = _thermo_profile(nz=80)
    T = jnp.stack([T0, T0 * 1.01], axis=1)           # [n, ny=2]
    got = cv.convective_adjustment(p, T, method='reference')
    want = jnp.stack([cv.convective_adjustment_single(
        p, T[:, j], method='reference') for j in range(2)], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_gate_defaults_off(monkeypatch):
    monkeypatch.delenv('CLIMATEMODEL_TPU_CONV_REF_KERNEL', raising=False)
    assert cv._ref_kernel_enabled() is False
    monkeypatch.setenv('CLIMATEMODEL_TPU_CONV_REF_KERNEL', '1')
    assert cv._ref_kernel_enabled() is True


def test_kernel_f64_uses_reference_constant_tolerance():
    """In f64 the kernel must use the reference's exact 1e-10 tolerance with
    NO eps scaling (at micro-mass high-theta levels 16*eps_f64*theta exceeds
    1e-10 and would silently skip marginal adjustments the executed reference
    performs — _instability_tol's documented rule).  A synthetic column with
    theta ~ 1e5 and one adjacent diff of -2e-10 must be adjusted identically
    by the kernel and the XLA core."""
    n = 16
    p = jnp.asarray(np.logspace(5, 2, n), jnp.float64)
    alpha = R_specific * (g / c_p_dry) / g
    pi = (p / p_surface_earth) ** alpha
    w = cv._trapz_weights(p)
    theta = 1e5 + jnp.arange(n, dtype=jnp.float64)      # stable ramp
    theta = theta.at[8].set(theta[7] - 2e-10)           # marginal instability
    T = theta * pi
    thr = jnp.asarray([jnp.median(T) / 4.0])
    want = cv._reference_adjust_single(p, T, g / c_p_dry, thr[0],
                                       p_surface_earth)
    assert bool(jnp.any(want != T)), 'the XLA core must adjust this column'
    got = faithful_adjust_lanes(T[None, :], pi, w, thr, interpret=True)[0]
    assert bool(jnp.any(got != T)), \
        'kernel skipped the marginal adjustment: f64 tolerance regressed'
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-12)


def test_reference_kernel_method_equals_reference_off_tpu():
    """conv_method='reference_kernel' is the same faithful algorithm with an
    explicit kernel executor; off-TPU it must reproduce method='reference'
    exactly (lax.platform_dependent default branch = the XLA core)."""
    p, T0 = _thermo_profile(nz=80)
    T = jnp.stack([T0, T0 * 1.02], axis=1)
    a = cv.convective_adjustment(p, T, method='reference')
    b = cv.convective_adjustment(p, T, method='reference_kernel')
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
