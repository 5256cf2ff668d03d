"""Tau(p)/q(p) profile family tests: internal consistency (q = g/k dtau/dp),
canonical values, inversions, and reference-style construction."""
import numpy as np
import pytest

from climatemodel_tpu.constants import g, p_surface_earth
from climatemodel_tpu.ops import optical_depth as od

P_TOA = 20.0
FAMILIES = {
    'scale_height': dict(p_width=0.22 * p_surface_earth, tau_surface=4.0),
    'exponential': dict(p_width=100000.0, tau_surface=4.0),
    'peak_in_atmosphere': dict(p_width=10000.0, p_max=50000.0, tau_surface=4.0),
    'scale_height_and_peak_in_atmosphere': dict(
        p_width1=51000.0, tau_surface1=4.0, p_width2=100.0, p_max2=600.0,
        tau_surface2=0.1),
}


@pytest.mark.parametrize('name,kwargs', FAMILIES.items())
def test_q_is_g_over_k_dtau_dp(name, kwargs):
    prof = od.PROFILES[name](**kwargs)
    p = np.logspace(np.log10(p_surface_earth), np.log10(P_TOA), 2000)
    tau = np.asarray(prof.tau(p))
    q = np.asarray(prof.q(p))
    # numerical derivative of tau wrt p (central differences)
    dtau_dp = np.gradient(tau, p)
    q_expected = g / prof.k * dtau_dp
    interior = slice(5, -5)
    mask = np.abs(p[interior] - kwargs.get('p_max', -1)) > 2000  # skip kink
    mask &= np.abs(p[interior] - kwargs.get('p_max2', -1)) > 50
    np.testing.assert_allclose(q[interior][mask], q_expected[interior][mask],
                               rtol=2e-3)


@pytest.mark.parametrize('name,kwargs', FAMILIES.items())
def test_tau_surface_value(name, kwargs):
    prof = od.PROFILES[name](**kwargs)
    tau_s = float(prof.tau(np.array(p_surface_earth)))
    expected = kwargs.get('tau_surface',
                          kwargs.get('tau_surface1', 0)
                          + kwargs.get('tau_surface2', 0))
    assert abs(tau_s - expected) < 1e-8 * max(1, expected)


@pytest.mark.parametrize('name', ['scale_height', 'exponential',
                                  'peak_in_atmosphere'])
def test_p_from_tau_roundtrip(name):
    prof = od.PROFILES[name](**FAMILIES[name])
    p = np.logspace(np.log10(p_surface_earth), np.log10(1000.0), 50)
    tau = np.asarray(prof.tau(p))
    p_back = np.asarray(prof.p_from_tau(tau))
    np.testing.assert_allclose(p_back, p, rtol=1e-8)


def test_alpha_converters_roundtrip():
    alpha = od.get_exponential_alpha(1e5)
    assert np.isclose(od.get_exponential_p_width(alpha), 1e5)
    # scale height alpha: q falls to 1/e at p_surface - p_width
    a = od.get_scale_height_alpha(0.22 * p_surface_earth, p_surface_earth)
    p_fall = p_surface_earth - 0.22 * p_surface_earth
    assert np.isclose((p_fall / p_surface_earth) ** a, np.exp(-1))


def test_make_profile_pins_p_surface():
    # mirror of ensure_p_surface_correct_in_tau_func (grey.py:108-127)
    prof = od.make_profile('exponential', (100000.0, 4.0), p_surface=50000.0)
    assert prof.p_surface == 50000.0
    assert np.isclose(float(prof.tau(np.array(50000.0))), 4.0)
    # defaults filled for unspecified trailing args
    assert prof.k == 1.0


def test_is_zero_flag():
    assert od.make_profile('exponential', (100000.0, 0.0), p_surface_earth).is_zero
    assert not od.make_profile('exponential', (100000.0, 1.0),
                               p_surface_earth).is_zero
