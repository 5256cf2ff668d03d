"""Fused Pallas Richtmyer kernel vs the jnp stencil path (interpret mode on
CPU; the compiled TPU path is exercised by bench.py and the verify drives)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from climatemodel_tpu.models import shallow_water as sw
from climatemodel_tpu.ops import stencils
from climatemodel_tpu.ops.pallas_stencils import (richtmyer_step_interior,
                                                  supports, _pick_band)


def _jnp_reference(h, u, v, fcor_full, h_base, dt, g, dx, dy):
    flux_x = sw.make_flux_x(g, 0.0, False)
    flux_y = sw.make_flux_y(g, 0.0, False)
    src = sw.make_source(g, fcor_full, h_base, dx, dy, False)
    U = sw.get_conservative_form(h, u, v, False)
    U2 = stencils.richtmyer(U, flux_x, flux_y, src, dt, dx, dy, [0])
    return sw.get_physical_values(U2, False)


@pytest.mark.parametrize('shape', [(34, 30), (66, 130)])
def test_kernel_matches_jnp_path(shape):
    nx, ny = shape
    rng = np.random.default_rng(1)
    h = jnp.asarray(1000 + 20 * rng.standard_normal((nx, ny)))
    u = jnp.asarray(rng.standard_normal((nx, ny)))
    v = jnp.asarray(rng.standard_normal((nx, ny)))
    fcor = jnp.asarray(1e-4 + 1e-6 * rng.standard_normal((nx, ny)))
    h_base = jnp.asarray(50 * rng.standard_normal((nx, ny)))
    dhbx = stencils.centered_diff_x(h_base, 1e5)
    dhby = stencils.centered_diff_y(h_base, 1e5)
    r0 = jnp.zeros((nx - 2, ny - 2))
    out = richtmyer_step_interior(h, u, v, fcor[1:-1, 1:-1], r0, dhbx, dhby,
                                  60.0, True, 9.81, 1e5, 1e5, interpret=True)
    h2, u2, v2 = _jnp_reference(h, u, v, fcor, h_base, jnp.float64(60.0),
                                jnp.float64(9.81), 1e5, 1e5)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(h2)[1:-1, 1:-1],
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(u2)[1:-1, 1:-1],
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(v2)[1:-1, 1:-1],
                               rtol=1e-10, atol=1e-12)


def test_full_step_parity_with_pallas_solver():
    """sw_step with solver='richtmyer_pallas' (interpret on CPU) matches the
    jnp richtmyer step through damping/wind/BCs."""
    kw = dict(nx=34, ny=20, dx=100e3, dy=100e3, dt=60.0, f_0=1e-4, beta=0.0,
              r=1e-6,
              orography_info={'type': 'mountain', 'max_h_base': 100.0,
                              'x0': 0.0, 'y0': 0.0, 'x_std': 3e5,
                              'y_std': 3e5},
              initial_info={'type': 'height_gaussian', 'min_h_surface': 9750.0,
                            'max_h_surface': 9850.0, 'x0': 0.0, 'y0': 0.0,
                            'x_std': 3e5, 'y_std': 3e5, 'add_noise': False})
    a = sw.ShallowWater(**kw)
    b = sw.ShallowWater(**kw, numerical_solver='richtmyer_pallas')
    sa = a.state
    sb = b.state
    for _ in range(5):
        sa = sw.sw_step(sa, a.params, **a._step_kwargs())
        sb = sw.sw_step(sb, b.params, **b._step_kwargs())
    np.testing.assert_allclose(np.asarray(sb.h), np.asarray(sa.h), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sb.u), np.asarray(sa.u), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sb.v), np.asarray(sa.v), atol=1e-12)


def test_band_picker_and_supports():
    assert _pick_band(2048, 1024) % 8 == 0
    assert 2048 % _pick_band(2048, 1024) == 0
    assert supports(2050, 1026)
    assert not supports(15, 20)       # 13 interior rows: no mult-of-8 divisor
    with pytest.raises(ValueError):
        richtmyer_step_interior(jnp.ones((15, 20)), jnp.ones((15, 20)),
                                jnp.ones((15, 20)), jnp.ones((13, 18)),
                                jnp.zeros((13, 18)), jnp.ones((13, 18)),
                                jnp.ones((13, 18)), 60.0, True, 9.81, 1e5,
                                1e5, interpret=True)
    # linear mode rejected at model level
    with pytest.raises(ValueError):
        sw.ShallowWater(nx=34, ny=20, dx=1e5, dy=1e5, dt=60, f_0=1e-4, beta=0,
                        linear=True, numerical_solver='richtmyer_pallas')


def _assert_ulp_equal(a, b):
    """Frame path vs per-step path agree to f64 ulp.  The kernels share the
    same jnp arithmetic, but XLA CPU contracts mul+add chains into FMAs
    differently across program contexts (scan body vs standalone jit), which
    perturbs the fused damping/CFL expressions by ~1 ulp; anything beyond that
    is a real layout/BC bug and fails these bounds immediately."""
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12,
                               atol=1e-13)


def test_frame_path_matches_step_loop():
    """The padded-frame fast path (sw_simulate/sw_simulate_snapshots with
    solver='richtmyer_pallas' on frame-eligible grids) is ulp-identical to
    stepping sw_step: same kernel arithmetic, only the memory layout differs
    (see _assert_ulp_equal)."""
    from climatemodel_tpu.ops.pallas_stencils import frame_supports
    kw = dict(nx=34, ny=130, dx=100e3, dy=100e3, dt=60.0, f_0=1e-4, beta=1e-11,
              r=1e-6, boundary_type={'x': 'walls', 'y': 'walls'},
              initial_info={'type': 'height_gaussian', 'min_h_surface': 9750.0,
                            'max_h_surface': 9850.0, 'x0': 0.0, 'y0': 0.0,
                            'x_std': 3e5, 'y_std': 3e5, 'add_noise': False},
              numerical_solver='richtmyer_pallas')
    w = sw.ShallowWater(**kw)
    assert frame_supports(w.nx, w.ny)
    # loop of single steps (non-frame path)
    sa = w.state
    for _ in range(6):
        sa = sw.sw_step(sa, w.params, **w._step_kwargs())
    # fused frame path
    sb = sw.sw_simulate(w.state, w.params, 6, **w._step_kwargs())
    _assert_ulp_equal(sb.h, sa.h)
    _assert_ulp_equal(sb.u, sa.u)
    _assert_ulp_equal(sb.v, sa.v)
    assert float(sb.t) == float(sa.t)
    # snapshot variant returns the same trajectory
    st_snap, snaps = sw.sw_simulate_snapshots(w.state, w.params, 3, 2,
                                              **w._step_kwargs())
    _assert_ulp_equal(snaps[1][-1], sa.h)
    np.testing.assert_array_equal(np.asarray(st_snap.h), np.asarray(snaps[1][-1]))


def test_frame_path_el_nino_wind():
    """Frame path with the El Nino forced-wind closure and orography both
    active (exercises masks, damping, and the non-flat kernel variant)."""
    kw = dict(nx=34, ny=130, dx=100e3, dy=100e3, dt=60.0, f_0=0.0, beta=1e-11,
              r=1e-7, g=0.05,
              orography_info={'type': 'mountain', 'max_h_base': 5.0,
                              'x0': 0.0, 'y0': 0.0, 'x_std': 3e5,
                              'y_std': 3e5},
              boundary_type={'x': 'walls', 'y': 'walls'},
              initial_info={'type': 'el_nino', 'max_h_surface': 110.0,
                            'min_h_surface': 90.0, 'y_std': 4e5,
                            'add_noise': False, 'wind': {'type': 'forced'}})
    w = sw.ShallowWater(**kw, numerical_solver='richtmyer_pallas')
    sa = w.state
    for _ in range(4):
        sa = sw.sw_step(sa, w.params, **w._step_kwargs())
    sb = sw.sw_simulate(w.state, w.params, 4, **w._step_kwargs())
    _assert_ulp_equal(sb.h, sa.h)
    _assert_ulp_equal(sb.u, sa.u)
    _assert_ulp_equal(sb.v, sa.v)


@pytest.mark.parametrize('bx,by', [('periodic', 'walls'), ('periodic', 'periodic'),
                                   ('walls', 'periodic')])
def test_frame_path_boundary_combinations(bx, by):
    """Frame-path BCs (apply_boundary_conditions_frame) reproduce every
    periodic/walls combination bit-exactly."""
    kw = dict(nx=34, ny=130, dx=100e3, dy=100e3, dt=60.0, f_0=1e-4, beta=0.0,
              r=0.0, boundary_type={'x': bx, 'y': by},
              initial_info={'type': 'height_gaussian', 'min_h_surface': 9750.0,
                            'max_h_surface': 9850.0, 'x0': 0.0, 'y0': 0.0,
                            'x_std': 3e5, 'y_std': 3e5, 'add_noise': False},
              numerical_solver='richtmyer_pallas')
    w = sw.ShallowWater(**kw)
    sa = w.state
    for _ in range(5):
        sa = sw.sw_step(sa, w.params, **w._step_kwargs())
    sb = sw.sw_simulate(w.state, w.params, 5, **w._step_kwargs())
    _assert_ulp_equal(sb.h, sa.h)
    _assert_ulp_equal(sb.u, sa.u)
    _assert_ulp_equal(sb.v, sa.v)
