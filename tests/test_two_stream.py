"""Two-stream flux operator tests: associative scan vs explicit NumPy recursion
implementing the reference update (grey.py:251-294)."""
import jax.numpy as jnp
import numpy as np

from climatemodel_tpu.constants import sigma
from climatemodel_tpu.ops.two_stream import (affine_scan, lw_flux,
                                             lw_flux_sequential, sw_flux)


def _numpy_lw_reference(T, dtau, up_toa):
    """Surface-first sequential recursion, as in the reference loop."""
    nz = T.shape[0] + 1
    up = np.zeros((nz,) + T.shape[1:])
    down = np.zeros_like(up)
    up[-1] = up_toa
    for i in range(T.shape[0] - 1, -1, -1):
        up[i] = up[i + 1] * np.exp(dtau[i]) + sigma * T[i] ** 4 * (1 - np.exp(dtau[i]))
        down[i] = down[i + 1] * np.exp(-dtau[i]) + sigma * T[i] ** 4 * (1 - np.exp(-dtau[i]))
    return up, down


def test_affine_scan_forward():
    rng = np.random.default_rng(0)
    a = rng.uniform(0.5, 1.5, (17, 3))
    b = rng.normal(size=(17, 3))
    x0 = rng.normal(size=(3,))
    out = np.asarray(affine_scan(jnp.asarray(a), jnp.asarray(b), jnp.asarray(x0)))
    expect = [x0]
    for k in range(17):
        expect.append(a[k] * expect[-1] + b[k])
    np.testing.assert_allclose(out, np.stack(expect), rtol=1e-12)


def test_affine_scan_reverse():
    rng = np.random.default_rng(1)
    a = rng.uniform(0.5, 1.5, (9,))
    b = rng.normal(size=(9,))
    x_last = 2.0
    out = np.asarray(affine_scan(jnp.asarray(a), jnp.asarray(b),
                                 jnp.asarray(x_last), reverse=True))
    expect = np.zeros(10)
    expect[-1] = x_last
    for k in range(8, -1, -1):
        expect[k] = a[k] * expect[k + 1] + b[k]
    np.testing.assert_allclose(out, expect, rtol=1e-12)


def test_lw_flux_matches_reference_recursion():
    rng = np.random.default_rng(2)
    nz, ny = 80, 4
    T = rng.uniform(150, 350, (nz - 1, ny))
    dtau = rng.uniform(0, 0.3, (nz - 1, ny))
    up_toa = rng.uniform(100, 300, (ny,))
    up_ref, down_ref = _numpy_lw_reference(T, dtau, up_toa)
    up, down = lw_flux(jnp.asarray(T), jnp.asarray(dtau), jnp.asarray(up_toa))
    np.testing.assert_allclose(np.asarray(up), up_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(down), down_ref, rtol=1e-10)
    # sequential lax.scan variant agrees too
    up2, down2 = lw_flux_sequential(jnp.asarray(T), jnp.asarray(dtau),
                                    jnp.asarray(up_toa))
    np.testing.assert_allclose(np.asarray(up2), up_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(down2), down_ref, rtol=1e-12)


def test_sw_flux_beer_law():
    tau_sw = jnp.linspace(0.5, 0.0, 11)[:, None] * jnp.ones((1, 2))
    albedo_mod = jnp.array([0.3, 0.2])
    sol = jnp.array([1.0, 1.1])
    F = 1367.0
    up, down = sw_flux(tau_sw, albedo_mod, sol, F)
    np.testing.assert_allclose(np.asarray(up),
                               np.asarray(albedo_mod * sol * F / 4 * jnp.exp(tau_sw)))
    np.testing.assert_allclose(np.asarray(down),
                               np.asarray(sol * F / 4 * jnp.exp(-tau_sw)))
    # isothermal: constants everywhere (grey.py:104)
    up_i, down_i = sw_flux(tau_sw, albedo_mod, sol, F, isothermal=True)
    assert np.allclose(np.asarray(up_i), np.asarray(albedo_mod * sol * F / 4))
    assert np.ptp(np.asarray(down_i), axis=0).max() == 0


def test_pallas_lw_kernel_bit_matches_sequential():
    """The lane-batched Pallas lw kernel (interpret mode on CPU) reproduces
    the reference's sequential composition order bit-for-bit
    (ops/pallas_two_stream.py)."""
    from climatemodel_tpu.ops.pallas_two_stream import lw_flux_lanes
    rng = np.random.default_rng(2)
    for n, b in [(59, 7), (24, 130)]:
        T = jnp.asarray(200 + 100 * rng.random((n, b)), jnp.float32)
        dtau = jnp.asarray(0.2 * rng.random((n, b)), jnp.float32)
        toa = jnp.asarray(200 + 50 * rng.random((b,)), jnp.float32)
        us, ds = lw_flux_sequential(T, dtau, toa)
        uk, dk = lw_flux_lanes(T, dtau, toa, interpret=True)
        assert bool(jnp.all(us == uk) & jnp.all(ds == dk)), (n, b)


def test_lw_flux_nested_vmap_flattens():
    """Member-vmapped lw_flux (the ensemble path) merges batch axes through
    the custom_vmap rule and matches per-member evaluation."""
    import jax
    rng = np.random.default_rng(4)
    n, members, ny = 20, 5, 3
    T = jnp.asarray(220 + 60 * rng.random((members, n, ny)))
    dtau = jnp.asarray(0.15 * rng.random((members, n, ny)))
    toa = jnp.asarray(200 + 40 * rng.random((members, ny)))
    up_v, down_v = jax.vmap(lw_flux)(T, dtau, toa)
    for m in range(members):
        up_m, down_m = lw_flux(T[m], dtau[m], toa[m])
        np.testing.assert_array_equal(np.asarray(up_v[m]), np.asarray(up_m))
        np.testing.assert_array_equal(np.asarray(down_v[m]),
                                      np.asarray(down_m))


def test_pallas_lw_kernel_shape_fuzz():
    """Seeded shape fuzz of the lane-batched flux kernel vs the sequential
    reference order, incl. lane-boundary batch sizes."""
    from climatemodel_tpu.ops.pallas_two_stream import lw_flux_lanes
    rng = np.random.default_rng(12)
    for n, b in [(1, 3), (8, 127), (60, 129), (150, 16), (31, 256)]:
        T = jnp.asarray(200 + 100 * rng.random((n, b)), jnp.float32)
        dtau = jnp.asarray(0.2 * rng.random((n, b)), jnp.float32)
        toa = jnp.asarray(200 + 50 * rng.random((b,)), jnp.float32)
        us, ds = lw_flux_sequential(T, dtau, toa)
        uk, dk = lw_flux_lanes(T, dtau, toa, interpret=True)
        assert bool(jnp.all(us == uk) & jnp.all(ds == dk)), (n, b)


def test_pallas_lw_packed_bit_matches_sequential():
    """The sublane-packed (8,128)-tile variant (engaged at b >= 1024)
    reproduces the sequential composition order bit-for-bit, incl. ragged
    batch sizes that pad up to the 1024-member program width."""
    from climatemodel_tpu.ops.pallas_two_stream import (SUBL, LANE,
                                                        _lw_lanes_packed,
                                                        lw_flux_lanes)
    assert SUBL * LANE == 1024
    rng = np.random.default_rng(21)
    for n, b in [(60, 1024), (59, 1025), (24, 2048), (7, 1234)]:
        T = jnp.asarray(200 + 100 * rng.random((n, b)), jnp.float32)
        dtau = jnp.asarray(0.2 * rng.random((n, b)), jnp.float32)
        toa = jnp.asarray(200 + 50 * rng.random((b,)), jnp.float32)
        us, ds = lw_flux_sequential(T, dtau, toa)
        uk, dk = lw_flux_lanes(T, dtau, toa, interpret=True)
        assert bool(jnp.all(us == uk) & jnp.all(ds == dk)), (n, b)
        # the dispatcher really routed to the packed grid
        up, dp_ = _lw_lanes_packed(T, dtau, toa, interpret=True)
        assert bool(jnp.all(up == uk) & jnp.all(dp_ == dk)), (n, b)


def test_pallas_net_stats_kernel_bit_matches_xla_formulas():
    """The fused net+stats kernel (interpret mode) reproduces the XLA path
    bit-for-bit: net assembly order, lax.top_k order statistics of
    |net - prev| and max|net| — across row/packed grids, ragged sizes and
    top-k depths."""
    from climatemodel_tpu.ops.pallas_two_stream import grey_net_stats_lanes
    from climatemodel_tpu.ops.two_stream import percentile_topk_params
    import jax.numpy as jnp
    from jax import lax
    rng = np.random.default_rng(33)
    for n, b, pct in [(59, 4096, 95), (59, 130, 95), (149, 16, 95),
                      (20, 1025, 90), (5, 9, 50)]:
        T = jnp.asarray(200 + 100 * rng.random((n, b)), jnp.float32)
        dtau = jnp.asarray(0.2 * rng.random((n, b)), jnp.float32)
        toa = jnp.asarray(200 + 50 * rng.random((b,)), jnp.float32)
        usw = jnp.asarray(100 * rng.random((n + 1, b)), jnp.float32)
        dsw = jnp.asarray(300 * rng.random((n + 1, b)), jnp.float32)
        prev = jnp.asarray(300 * rng.random((n + 1, b)) - 150, jnp.float32)
        m, _ = percentile_topk_params(n + 1, pct)
        L = max(m, 2)
        net_k, top1, hi, lo, amax = grey_net_stats_lanes(
            T, dtau, usw, dsw, toa, prev, L, interpret=True)
        us, ds = lw_flux_sequential(T, dtau, toa)
        net_x = us - ds + usw - dsw
        top = lax.top_k(jnp.abs(net_k - prev).T, L)[0]
        assert bool(jnp.all(net_k == net_x)), (n, b)
        assert bool(jnp.all(top1 == top[:, 0])), (n, b)
        assert bool(jnp.all(hi == top[:, L - 2])), (n, b)
        assert bool(jnp.all(lo == top[:, L - 1])), (n, b)
        assert bool(jnp.all(amax == jnp.max(jnp.abs(net_k), axis=0))), (n, b)


def test_pallas_net_stats_kernel_nan_sentinel():
    """A NaN anywhere in a member's |net - prev| poisons that member's top_1
    (the march's NaN sentinel), and max|net| propagates NaN from net itself,
    exactly like top_k / jnp.max."""
    from climatemodel_tpu.ops.pallas_two_stream import grey_net_stats_lanes
    import jax.numpy as jnp
    rng = np.random.default_rng(34)
    n, b = 12, 16
    T = jnp.asarray(200 + 100 * rng.random((n, b)), jnp.float32)
    dtau = jnp.asarray(0.2 * rng.random((n, b)), jnp.float32)
    toa = jnp.asarray(200 + 50 * rng.random((b,)), jnp.float32)
    usw = jnp.zeros((n + 1, b), jnp.float32)
    dsw = jnp.zeros((n + 1, b), jnp.float32)
    prev = jnp.zeros((n + 1, b), jnp.float32).at[4, 3].set(jnp.nan)
    net, top1, hi, lo, amax = grey_net_stats_lanes(
        T, dtau, usw, dsw, toa, prev, 3, interpret=True)
    assert bool(jnp.isnan(top1[3])) and not bool(jnp.any(jnp.isnan(top1[:3])))
    assert not bool(jnp.any(jnp.isnan(amax)))      # net itself is finite


def test_grey_net_with_stats_matches_split_path():
    """The member-level fused operator under vmap (the ensemble path, XLA
    fallback on CPU) returns exactly grey_net_flux + the update_temp
    percentile machinery's order statistics."""
    import jax
    from climatemodel_tpu.ops.two_stream import (grey_net_with_stats,
                                                 percentile_topk_params)
    rng = np.random.default_rng(35)
    B, n, ny = 6, 30, 1
    T = jnp.asarray(220 + 60 * rng.random((B, n, ny)))
    dtau = jnp.asarray(0.15 * rng.random((B, n, ny)))
    toa = jnp.asarray(200 + 40 * rng.random((B, ny)))
    usw = jnp.asarray(50 * rng.random((B, n + 1, ny)))
    dsw = jnp.asarray(340 * rng.random((B, n + 1, ny)))
    prev = jnp.asarray(200 * rng.random((B, n + 1, ny)) - 100)
    net, top1, hi, lo, amax = jax.vmap(
        lambda t, d, u, us, ds, p: grey_net_with_stats(t, d, u, us, ds, p,
                                                       pct=95))(
        T, dtau, toa, usw, dsw, prev)
    m, _ = percentile_topk_params((n + 1) * ny, 95)
    for i in range(B):
        up_i, dn_i = lw_flux(T[i], dtau[i], toa[i])
        net_i = up_i - dn_i + usw[i] - dsw[i]
        np.testing.assert_array_equal(np.asarray(net[i]), np.asarray(net_i))
        from jax import lax
        top = lax.top_k(jnp.abs(net_i - prev[i]).reshape(-1), m)[0]
        assert float(top1[i]) == float(top[0])
        assert float(hi[i]) == float(top[m - 2])
        assert float(lo[i]) == float(top[m - 1])
        assert float(amax[i]) == float(jnp.max(jnp.abs(net_i)))


def test_lw_flux_plain_matches_dispatcher_and_differentiates():
    """lw_flux_plain equals lw_flux (same scan on CPU) and composes with
    jax.jacfwd — the property the custom_vmap dispatcher lacks."""
    import jax
    import jax.numpy as jnp
    from climatemodel_tpu.ops.two_stream import lw_flux, lw_flux_plain
    rng = np.random.default_rng(3)
    T = jnp.asarray(230 + 60 * rng.random((19, 2)))
    dtau = jnp.asarray(0.2 * rng.random((19, 2)))
    toa = jnp.asarray(200 + 10 * rng.random((2,)))
    for sf in (True, False):
        if sf:
            a = lw_flux(T, dtau, toa, surface_first=sf)
            b = lw_flux_plain(T, dtau, toa, surface_first=sf)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        J = jax.jacfwd(lambda t: lw_flux_plain(t, dtau, toa,
                                               surface_first=sf)[0])(T)
        assert np.isfinite(np.asarray(J)).all()
