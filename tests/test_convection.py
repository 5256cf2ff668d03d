"""Convective adjustment tests.

``method='reference'`` must reproduce, step for step, the reference's serial
groupby/blend algorithm (/root/reference/Model/radiation/convective_adjustment.py:36-118).
The oracle below is an independent NumPy implementation of that algorithm
written fresh from its equations.  ``method='isotonic'`` (the parallel
weighted-PAVA form) must satisfy the same physical properties — stability and
enthalpy conservation — though its mixed-layer boundaries may differ.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from climatemodel_tpu.constants import (F_sun, g, c_p_dry, p_surface_earth,
                                        R_specific, sigma)
from climatemodel_tpu.ops import optical_depth as od
from climatemodel_tpu.ops.convection import (convective_adjustment,
                                             convective_adjustment_single)


def _oracle_single(p, T, lapse_rate=g / c_p_dry, delta_T_thresh=None):
    """Serial reference-style adjustment (oracle; p descending).

    Group membership is frozen per outer sweep; groups are processed
    left-to-right with theta refreshed after each, and groups whose blended
    adjustment exceeds delta_T_thresh are permanently ignored."""
    T = T.astype(np.float64).copy()
    if delta_T_thresh is None:
        delta_T_thresh = np.median(T) / 4.0
    alpha = R_specific * lapse_rate / g
    pi = (p / p_surface_earth) ** alpha
    small = 1e-10
    nz = len(p)
    w = np.zeros(nz)
    dp = p[:-1] - p[1:]
    w[:-1] += 0.5 * dp
    w[1:] += 0.5 * dp          # sum(w T) = -trapz(T, p)

    def unstable_of(T, ignore):
        theta = T / pi
        d = np.diff(theta)
        d = np.concatenate([d, d[-1:]])     # duplicated last diff
        un = np.where(d < -small)[0]
        return np.setdiff1d(un, sorted(ignore))

    ignore = set()
    unstable = unstable_of(T, ignore)
    for _ in range(10 * nz):
        if len(unstable) == 0:
            break
        groups = np.split(unstable, np.where(np.diff(unstable) != 1)[0] + 1)
        for grp in groups:
            theta = T / pi
            lo_anchor = min(grp[-1] + 1, nz - 1)
            theta_lo = theta[lo_anchor]
            below = np.where((theta < theta_lo)
                             & (np.arange(nz) < lo_anchor))[0]
            start = 0 if len(below) == 0 else below.max() + 1
            T_lower = T.copy()
            T_lower[start:lo_anchor + 1] = theta_lo * pi[start:lo_anchor + 1]

            hi_anchor = grp[0]
            theta_hi = theta[hi_anchor]
            above = np.where((theta > theta_hi)
                             & (np.arange(nz) > hi_anchor))[0]
            stop = nz - 1 if len(above) == 0 else above.min()
            T_upper = T.copy()
            T_upper[hi_anchor:stop + 1] = theta_hi * pi[hi_anchor:stop + 1]

            H, H_lo, H_hi = (np.sum(w * x) for x in (T, T_lower, T_upper))
            beta = (H - H_lo) / (H_hi - H_lo)
            T_new = beta * T_upper + (1 - beta) * T_lower
            if np.abs(T_new - T).max() < delta_T_thresh:
                T = T_new
            else:
                ignore.update(grp.tolist())
        unstable = unstable_of(T, ignore)
    return T


def _descending_p(nz=60):
    return np.logspace(np.log10(p_surface_earth), np.log10(1000.0), nz)


def _random_profile(seed, nz=50):
    rng = np.random.default_rng(seed)
    T = 320 - 60 * np.linspace(0, 1, nz) + 8 * rng.standard_normal(nz)
    # keep the top pair strongly stable (the reference would crash otherwise)
    T[-1] = T[-2] + 30
    return T


@pytest.mark.parametrize('method', ['reference', 'isotonic'])
def test_stable_profile_unchanged(method):
    p = _descending_p()
    alpha = R_specific / c_p_dry
    theta = np.linspace(300, 400, len(p))      # increasing with height: stable
    T = theta * (p / p_surface_earth) ** alpha
    T_adj = np.asarray(convective_adjustment_single(
        jnp.asarray(p), jnp.asarray(T), method=method))
    np.testing.assert_allclose(T_adj, T, rtol=1e-10)


@pytest.mark.parametrize('method', ['reference', 'isotonic'])
def test_enthalpy_conserved_and_stable(method):
    rng = np.random.default_rng(3)
    p = _descending_p()
    T = np.clip(280 + 40 * rng.standard_normal(len(p)).cumsum() / 6, 150, 400)
    T[-1] = T[-2] + 30
    T_adj = np.asarray(convective_adjustment_single(
        jnp.asarray(p), jnp.asarray(T), delta_T_thresh=1e9, method=method))
    np.testing.assert_allclose(-np.trapz(T_adj, p), -np.trapz(T, p), rtol=1e-10)
    alpha = R_specific / c_p_dry
    theta = T_adj / (p / p_surface_earth) ** alpha
    assert np.all(np.diff(theta) > -1e-7)


@pytest.mark.parametrize('seed', range(6))
def test_reference_method_matches_oracle(seed):
    p = _descending_p(50)
    T = _random_profile(seed)
    T_ours = np.asarray(convective_adjustment_single(
        jnp.asarray(p), jnp.asarray(T), delta_T_thresh=1e9))
    T_ref = _oracle_single(p, T, delta_T_thresh=1e9)
    np.testing.assert_allclose(T_ours, T_ref, atol=1e-8)


def test_reference_method_matches_oracle_on_grey_re_profile():
    """The physically-relevant input: an analytic grey radiative-equilibrium
    profile with a superadiabatic troposphere."""
    prof = od.scale_height(p_width=0.22 * p_surface_earth, tau_surface=4.0)
    p = np.logspace(np.log10(p_surface_earth), np.log10(20.0), 120)
    tau = np.asarray(prof.tau(p))
    F0 = (1 - 0.3) * F_sun / 4
    T = ((F0 / (2 * sigma)) * (1 + tau)) ** 0.25
    T_ours = np.asarray(convective_adjustment_single(jnp.asarray(p),
                                                     jnp.asarray(T)))
    T_ref = _oracle_single(p, T)
    np.testing.assert_allclose(T_ours, T_ref, atol=1e-8)
    assert np.abs(T_ours - T).max() > 0.5      # it actually adjusted something


@pytest.mark.parametrize('method', ['reference', 'isotonic'])
def test_large_adjustment_skipped(method):
    """A huge unstable spike must be left alone
    (convective_adjustment.py:106-110)."""
    p = _descending_p(40)
    T = np.linspace(300, 250, len(p))
    T[10] = T[9] + 300.0   # absurd spike whose fix exceeds the threshold
    thresh = np.median(T) / 4
    T_adj = np.asarray(convective_adjustment_single(
        jnp.asarray(p), jnp.asarray(T), delta_T_thresh=thresh, method=method))
    assert np.abs(T_adj - T).max() < max(thresh, abs(T[10] - T[9]))
    assert abs(T_adj[10] - T[10]) < thresh


def test_multi_latitude_and_ordering():
    p = _descending_p(30)
    rng = np.random.default_rng(7)
    T = 280 + 10 * rng.standard_normal((30, 6)).cumsum(axis=0) / 3
    T[-1] = T[-2] + 30
    out_desc = np.asarray(convective_adjustment(jnp.asarray(p), jnp.asarray(T)))
    # ascending input ordering handled like the reference (auto flip)
    out_asc = np.asarray(convective_adjustment(jnp.asarray(p[::-1].copy()),
                                               jnp.asarray(T[::-1].copy())))
    np.testing.assert_allclose(out_asc[::-1], out_desc, rtol=1e-12)
    for j in range(6):
        np.testing.assert_allclose(-np.trapz(out_desc[:, j], p),
                                   -np.trapz(T[:, j], p), rtol=1e-8)


def test_pallas_isotonic_bit_matches_formula():
    """The lane-batched Pallas kernel (interpret mode on CPU) is BIT-identical
    to the XLA min-max table: same prefix sums, same divisions, and min/max
    are exactly associative (ops/pallas_isotonic.py)."""
    import jax
    from climatemodel_tpu.ops.convection import _isotonic_increasing
    from climatemodel_tpu.ops.pallas_isotonic import isotonic_increasing_lanes
    rng = np.random.default_rng(3)
    for b, n in [(2, 9), (7, 149), (140, 31)]:
        theta = jnp.asarray(200 + 100 * rng.random((b, n)), jnp.float32)
        v = jnp.asarray(rng.uniform(0.5, 2.0, (n,)), jnp.float32)
        ref = jax.vmap(lambda th: _isotonic_increasing(th, v))(theta)
        got = isotonic_increasing_lanes(theta, v, interpret=True)
        assert bool(jnp.all(ref == got)), (b, n)


def test_iso_rows_nested_vmap_flattens():
    """Nested vmaps over _iso_rows (ny inside ensemble members) merge into one
    flat batch via the custom_vmap rule and match the per-column formula."""
    import jax
    from climatemodel_tpu.ops.convection import _iso_rows, _isotonic_increasing
    rng = np.random.default_rng(5)
    n = 23
    theta3 = jnp.asarray(250 + 30 * rng.standard_normal((4, 3, n)))
    v = jnp.asarray(rng.uniform(0.5, 2.0, (n,)))
    got = jax.vmap(jax.vmap(lambda th: _iso_rows(th[None, :], v)[0]))(theta3)
    ref = jax.vmap(jax.vmap(lambda th: _isotonic_increasing(th, v)))(theta3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_isotonic_shape_fuzz():
    """Seeded shape fuzz: kernel bit-parity vs the formula across irregular
    (batch, n) combinations incl. lane/sublane boundary cases."""
    import jax
    from climatemodel_tpu.ops.convection import _isotonic_increasing
    from climatemodel_tpu.ops.pallas_isotonic import isotonic_increasing_lanes
    rng = np.random.default_rng(11)
    for b, n in [(1, 8), (127, 9), (129, 64), (128, 150), (17, 255)]:
        theta = jnp.asarray(200 + 100 * rng.random((b, n)), jnp.float32)
        v = jnp.asarray(rng.uniform(0.5, 2.0, (n,)), jnp.float32)
        ref = jax.vmap(lambda th: _isotonic_increasing(th, v))(theta)
        got = isotonic_increasing_lanes(theta, v, interpret=True)
        assert bool(jnp.all(ref == got)), (b, n)


def test_segment_abs_max_matches_scatter_formulation():
    """The scatter-free segmented-scan segment max (ops/convection.py
    _segment_abs_max) equals the original .at[seg_id].max scatter on random
    segment patterns, including all-False / all-True edges."""
    import jax.numpy as jnp
    from climatemodel_tpu.ops.convection import _segment_abs_max
    rng = np.random.default_rng(3)
    for n in (1, 2, 7, 150):
        for frac in (0.0, 0.3, 0.7, 1.0):
            dT = rng.normal(size=n)
            changed = rng.random(n) < frac
            # oracle: the scatter formulation
            starts = changed & ~np.concatenate([[False], changed[:-1]])
            seg_id = np.where(changed, np.cumsum(starts), 0)
            seg_max = np.zeros(n + 1)
            np.maximum.at(seg_max, seg_id, np.abs(dT))
            want = np.where(changed, seg_max[seg_id], 0.0)
            got = np.asarray(_segment_abs_max(jnp.asarray(dT),
                                              jnp.asarray(changed)))
            np.testing.assert_allclose(got, want, rtol=0, atol=0)
