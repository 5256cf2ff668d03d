"""End-to-end differentiability of the compute paths (framework capability:
the reference's NumPy loops have no adjoint; here whole simulations are
functional jnp programs, so jax.grad gives exact reverse-mode sensitivities
— the mechanism behind diagnostics/sensitivity.py, checked here directly
against central finite differences in f64)."""
import jax
import jax.numpy as jnp
import numpy as np

from climatemodel_tpu.constants import p_surface_earth
from climatemodel_tpu.models.grey import GreyGas, grey_net_flux
from climatemodel_tpu.models.shallow_water import ShallowWater, sw_simulate


def _fd_check(f, x0, idxs, rtol, eps_scale=1e-4):
    """Central finite differences vs jax.grad at selected flat indices."""
    g = np.asarray(jax.jit(jax.grad(f))(x0)).ravel()
    x_flat = np.asarray(x0, np.float64).ravel()
    for i in idxs:
        eps = eps_scale * max(1.0, abs(x_flat[i]))
        xp = x_flat.copy()
        xp[i] += eps
        xm = x_flat.copy()
        xm[i] -= eps
        fp = float(f(jnp.asarray(xp.reshape(np.shape(x0)))))
        fm = float(f(jnp.asarray(xm.reshape(np.shape(x0)))))
        fd = (fp - fm) / (2 * eps)
        assert abs(g[i] - fd) <= rtol * max(abs(fd), 1e-8), \
            (i, g[i], fd)


def test_grad_through_shallow_water_steps():
    """d(height variance after 5 fused steps)/d(initial height) via the
    adjoint of the whole lax.scan matches finite differences."""
    world = ShallowWater(
        nx=18, ny=12, dx=100e3, dy=100e3, dt=60.0, f_0=1e-4, beta=1.6e-11,
        initial_info={'type': 'height_gaussian', 'min_h_surface': 9750.0,
                      'max_h_surface': 10750.0, 'x0': 0.0, 'y0': 0.0,
                      'x_std': 400e3, 'y_std': 400e3, 'add_noise': False})
    kw = world._step_kwargs()
    params = world.params
    state0 = world.state
    h_mean = jnp.mean(state0.h)

    def loss(h0):
        st = state0.replace(h=h0)
        out = sw_simulate(st, params, 5, **kw)
        return jnp.sum((out.h[1:-1, 1:-1] - h_mean) ** 2) / h0.size

    _fd_check(loss, state0.h, idxs=[5 * 12 + 6, 9 * 12 + 6, 0], rtol=2e-4)


def test_grad_through_grey_radiation():
    """d(OLR)/dT via the adjoint of the two-stream associative scan matches
    finite differences — the building block behind
    diagnostics.sensitivity.grey_equilibrium_sensitivity.

    Uses ``lw_flux_plain``, the documented differentiable path: the
    ``custom_vmap`` kernel dispatcher (``lw_flux``) does not support
    reverse-mode AD (jax custom_vmap limitation; lw_flux_plain docstring)."""
    from climatemodel_tpu.ops.two_stream import lw_flux_plain

    world = GreyGas(nz=40, ny=1, tau_lw_func='scale_height',
                    tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    dtau = world.forcing.dtau
    up_toa = jnp.asarray(240.0, world.dtype)
    T0 = jnp.asarray(world.T[:, 0]) + jnp.linspace(30.0, -30.0, world.nz - 1)

    def olr(T):
        up, _down = lw_flux_plain(T, dtau[:, 0], up_toa)
        return up[-1]

    _fd_check(olr, T0, idxs=[0, 10, 38], rtol=1e-5, eps_scale=1e-3)
