"""Checkified debug-mode marches (SURVEY §5 sanitizer row).

The reference has no sanitizer (single-threaded NumPy; its only guards are
the negative-T abort at base.py:319-320 and the shallow-water velocity check
at shallow_water.py:334).  The TPU-native equivalent: ``debug=True`` runs the
fused march under :mod:`jax.experimental.checkify` user checks that name the
first failing level/interface, the step and the simulated time — instead of
the production path's location-free sentinel freeze.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from climatemodel_tpu.constants import p_surface_earth
from climatemodel_tpu.models import column
from climatemodel_tpu.models.grey import GreyGas


def _grey_world(nz=30):
    return GreyGas(nz=nz, ny=1, tau_lw_func='scale_height',
                   tau_lw_func_args=[0.22 * p_surface_earth, 4.0])


# ---------------------------------------------------------------------------
# column-level: precise location payloads from a controlled toy operator
# ---------------------------------------------------------------------------

def _toy_march(net_fn, nz=12, debug=True, T0=250.0, **kw):
    """March a toy column whose radiation operator is ``net_fn``."""
    p_col = jnp.linspace(float(p_surface_earth), 100.0, nz)
    p_int = p_col[:, None]                       # [nz, ny=1]
    p_c = 0.5 * (p_col[:-1] + p_col[1:])
    state = column.ColumnState(
        T=jnp.full((nz - 1, 1), float(T0)), t=jnp.asarray(0.0),
        net_flux=jnp.zeros((nz, 1)),
        tsi=column.init_time_step_info(nz - 1, dtype=jnp.float64))

    def run(st):
        return column.evolve_to_equilibrium(
            st, net_fn, p_int, p_c, flux_thresh=1e-3, max_steps=50,
            debug=debug, **kw)

    if debug:
        err, (st, info) = checkify.checkify(
            jax.jit(run), errors=checkify.user_checks)(state)
        return err, st, info
    st, info = jax.jit(run)(state)
    return None, st, info


def test_toy_nan_net_flux_reports_interface_and_step():
    """A NaN planted at interface 3 of the toy operator is reported with its
    flat index on the very first checked step."""
    def net_fn(T):
        net = jnp.zeros((T.shape[0] + 1, T.shape[1]), T.dtype)
        return net.at[3, 0].set(jnp.nan)

    err, _st, info = _toy_march(net_fn)
    with pytest.raises(checkify.JaxRuntimeError) as exc:
        err.throw()
    msg = str(exc.value)
    assert 'non-finite net flux' in msg
    assert 'interface 3' in msg
    assert 'step 1' in msg
    # the sentinel flags still froze the march exactly like production
    assert bool(info.nan)
    assert int(info.steps) == 1


def test_toy_negative_temperature_reports_level():
    """A violently cooling operator drives T below zero; the debug check
    names the coldest flat level, like the reference abort (base.py:319-320)
    but with a location."""
    def net_fn(T):
        # strong T-dependent flux divergence at level 5 -> steady local
        # cooling (the T dependence keeps the delta statistic above the
        # threshold, so the march cannot fake an equilibrium exit first)
        net = jnp.zeros((T.shape[0] + 1, T.shape[1]), T.dtype)
        net = net.at[5, 0].set(-1e9 - 1e6 * T[5, 0])
        return net.at[6, 0].set(1e9 + 1e6 * T[5, 0])

    err, _st, info = _toy_march(net_fn, T0=5.0)
    with pytest.raises(checkify.JaxRuntimeError) as exc:
        err.throw()
    msg = str(exc.value)
    assert 'below zero' in msg
    assert 'level 5' in msg
    assert bool(info.failed)


def test_toy_healthy_march_no_error():
    def net_fn(T):
        return jnp.zeros((T.shape[0] + 1, T.shape[1]), T.dtype)

    err, _st, info = _toy_march(net_fn)
    err.throw()          # no error recorded
    assert bool(info.equilibrium)


def test_debug_requires_per_step_checks():
    def net_fn(T):
        return jnp.zeros((T.shape[0] + 1, T.shape[1]), T.dtype)

    with pytest.raises(ValueError, match='check_every'):
        _toy_march(net_fn, check_every=8)


# ---------------------------------------------------------------------------
# model-level: GreyGas / RealGas entry points
# ---------------------------------------------------------------------------

def test_grey_debug_march_bit_identical_to_plain():
    w1, w2 = _grey_world(), _grey_world()
    w1.evolve_to_equilibrium(flux_thresh=1e-1, save=False)
    w2.evolve_to_equilibrium(flux_thresh=1e-1, save=False, debug=True)
    assert np.array_equal(np.asarray(w1.T), np.asarray(w2.T))
    assert int(w1._equilibrium_info.steps) == int(w2._equilibrium_info.steps)


def test_grey_debug_nan_injection_reports_location():
    w = _grey_world()
    T0 = np.asarray(w.T).copy()
    T0[7] = np.nan
    with pytest.raises(checkify.JaxRuntimeError) as exc:
        w.evolve_to_equilibrium(flux_thresh=1e-1, save=False, debug=True,
                                T_initial=T0)
    msg = str(exc.value)
    assert 'non-finite' in msg and 'step 1' in msg

    # production path: same failure, location-free sentinel
    w2 = _grey_world()
    with pytest.raises(FloatingPointError):
        w2.evolve_to_equilibrium(flux_thresh=1e-1, save=False, T_initial=T0)


def test_grey_debug_rejects_unsupported_modes():
    w = _grey_world()
    with pytest.raises(ValueError, match='debug'):
        w.evolve_to_equilibrium(save=True, debug=True)
    with pytest.raises(ValueError, match='debug'):
        w.evolve_to_equilibrium(save=False, debug=True, check_every=8)


def test_grey_debug_chunked_march_still_reports():
    """chunk_steps bounds single XLA executions; debug composes with it
    (the error is thrown at each chunk boundary)."""
    w = _grey_world()
    T0 = np.asarray(w.T).copy()
    T0[3] = np.inf
    with pytest.raises(checkify.JaxRuntimeError, match='non-finite'):
        w.evolve_to_equilibrium(flux_thresh=1e-1, save=False, debug=True,
                                chunk_steps=16, T_initial=T0)


def test_real_gas_debug_march_matches_plain():
    from climatemodel_tpu.models.real_gas import RealGas
    from climatemodel_tpu.spectral import humidity

    def make():
        return RealGas(nz=30, ny=1, molecule_names=['single_line'],
                       T_g=260.0, q_funcs={'single_line': humidity.co2},
                       q_funcs_args={'single_line': ()},
                       delta_temp_change=0.1)

    g1, g2 = make(), make()
    g1.evolve_to_equilibrium(flux_thresh=1e-1, save=False, t_end=0.5)
    g2.evolve_to_equilibrium(flux_thresh=1e-1, save=False, t_end=0.5,
                             debug=True)
    assert np.array_equal(np.asarray(g1.T), np.asarray(g2.T))

    g3 = make()
    T0 = np.asarray(g3.T).copy()
    T0[4] = np.nan
    with pytest.raises(checkify.JaxRuntimeError, match='non-finite'):
        g3.evolve_to_equilibrium(flux_thresh=1e-1, save=False, t_end=0.5,
                                 debug=True, T_initial=T0)
