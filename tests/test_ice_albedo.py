"""Ice-albedo feedback harness: sweep mechanics and the physical signature
(ice extent grows as the star dims; warm-start hysteresis ordering)."""
import numpy as np
import pytest

from climatemodel_tpu.constants import F_sun, p_surface_earth
from climatemodel_tpu.models.ice_albedo import (GreyAlbedoFeedback,
                                                albedo_step_function)


def test_albedo_step_function():
    lat = np.linspace(-90, 90, 10)
    a = albedo_step_function(lat)
    np.testing.assert_allclose(a, 0.3)
    T = np.where(np.abs(lat) > 60, 250.0, 280.0)
    a = albedo_step_function(lat, T)
    assert set(np.unique(a)) == {0.3, 0.6}
    assert np.all(a[np.abs(lat) > 60] == 0.6)


def test_sweep_ordering_warm_cold_warm():
    exp = GreyAlbedoFeedback(4.0, np.array([800.0, 1100.0, 1400.0]), nz=20,
                             ny=4, tau_lw_func='scale_height',
                             tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    np.testing.assert_allclose(exp.changing_param_values,
                               [1400, 1100, 800, 1100, 1400])
    assert exp.changing_param == 'stellar'
    # invalid combinations rejected (ice_albedo_feedback.py:90-96)
    with pytest.raises(ValueError):
        GreyAlbedoFeedback(np.array([1, 2.0]), np.array([1.0, 2]), 20, 4,
                           'scale_height', [0.22 * p_surface_earth, 4.0])


def test_stellar_sweep_grows_ice_when_cooling():
    values = np.array([700.0, 1100.0, 1500.0])
    exp = GreyAlbedoFeedback(4.0, values, nz=25, ny=8,
                             tau_lw_func='scale_height',
                             tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    albedo_array, ice_latitude, T_surface = exp.run(
        delta_albedo=0.15, delta_net_flux_thresh=1e-3)
    n = len(exp.changing_param_values)
    assert len(ice_latitude) == n == 5
    # cooling branch: ice edge latitude moves equatorward (non-increasing)
    cooling = ice_latitude[:3]
    assert all(a >= b for a, b in zip(cooling, cooling[1:]))
    # coldest point has more ice than the warmest
    assert ice_latitude[2] < ice_latitude[0]
    # surface temperature responds in the right direction
    assert T_surface[2].mean() < T_surface[0].mean()
    # albedo values stay within the step-function bounds
    for a in albedo_array:
        assert np.all((a >= 0.3 - 1e-9) & (a <= 0.6 + 1e-9))


def test_tau_sweep_mutates_grid():
    values = np.array([2.0, 4.0])
    exp = GreyAlbedoFeedback(values, F_sun, nz=20, ny=4,
                             tau_lw_func='scale_height',
                             tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    tau0 = exp.grey_world.tau_interface.copy()
    _, ice_latitude, _ = exp.run(delta_albedo=0.15, delta_net_flux_thresh=1e-3)
    assert len(ice_latitude) == 3
    # after the sweep the grid reflects the final (largest) tau value
    assert exp.grey_world.tau_interface[0, 0] == pytest.approx(4.0, rel=1e-6)
    assert not np.allclose(tau0, 0)


def test_hysteresis_loop():
    """The headline ice-albedo physics (Ice-Albedo Feedback notebook /
    radiation_script.py:152-166): sweeping the stellar constant
    warm -> cold -> warm, the warming branch holds MORE ice than the cooling
    branch at the same forcing (bistability from the albedo feedback)."""
    exp = GreyAlbedoFeedback(4.0, np.arange(600.0, 2250.0, 150.0), nz=25,
                             ny=8, tau_lw_func='scale_height',
                             tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    _, ice_lat, _ = exp.run(0.1, delta_net_flux_thresh=1e-3)
    vals = exp.changing_param_values
    n_cool = vals.argmin() + 1
    cool = dict(zip(vals[:n_cool], ice_lat[:n_cool]))
    warm = dict(zip(vals[n_cool - 1:], ice_lat[n_cool - 1:]))
    shared = [v for v in cool if v in warm]
    # warming branch never has less ice, and strictly more somewhere
    assert all(warm[v] <= cool[v] for v in shared)
    assert any(warm[v] < cool[v] for v in shared)
