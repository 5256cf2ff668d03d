"""Ensemble (batched) column marches: vmap/pjit over independent columns.

The reference marches one world at a time in a Python loop; parameter sweeps
(ice-albedo, GHG ladders) and throughput benchmarks instead batch thousands of
independent columns as a leading vmap axis over the whole compiled
march-to-equilibrium (SURVEY.md section 2, "Data parallel / ensemble parallel").
Under vmap, the ``lax.while_loop`` runs lock-step until every member converges,
with already-converged members frozen — each member keeps its own adaptive dt,
RemoveInd mask and simulated time.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import column
from .grey import GreyForcing, GreyGas, grey_net_flux
from .column import ColumnState


def broadcast_state(state: ColumnState, n: int) -> ColumnState:
    """Tile a single-column state along a new leading ensemble axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), state)


def grey_ensemble_forcing(world: GreyGas, F_stellar_values) -> GreyForcing:
    """Batched forcing varying the stellar constant across members."""
    n = len(F_stellar_values)
    base = world.forcing
    tile = lambda x: jnp.broadcast_to(x, (n,) + x.shape)
    return GreyForcing(
        dtau=tile(base.dtau), tau_sw_interface=tile(base.tau_sw_interface),
        albedo_mod=tile(base.albedo_mod),
        solar_latitude_factor=tile(base.solar_latitude_factor),
        F_stellar=jnp.asarray(F_stellar_values, base.F_stellar.dtype))


@functools.partial(jax.jit, static_argnames=('convective_adjust', 'max_steps',
                                             'net_flux_percentile',
                                             'use_delta_exit', 'conv_method'))
def grey_evolve_ensemble(states: ColumnState, forcings: GreyForcing,
                         p_interface, p_centre_col, flux_thresh,
                         convective_adjust=False, t_end=4.0, conv_thresh=1e-5,
                         conv_t_multiplier=5.0, net_flux_thresh=1e-7,
                         net_flux_percentile=95, max_steps=500_000,
                         use_delta_exit=True, conv_method='isotonic'):
    """vmapped march-to-equilibrium over a leading ensemble axis of
    (states, forcings); the pressure grid is shared.

    For convective ensembles the default adjustment is the fully parallel
    isotonic form: under vmap the faithful group-iteration's data-dependent
    while_loops run max-trip lock-step across members, so the parallel
    closed form is the right batched kernel (same physics, see
    ops/convection.py)."""
    def one(state, forcing):
        net_fn = lambda T: grey_net_flux(T, forcing)
        return column.evolve_to_equilibrium(
            state, net_fn, p_interface, p_centre_col, flux_thresh=flux_thresh,
            convective_adjust=convective_adjust, t_end=t_end,
            conv_thresh=conv_thresh, conv_t_multiplier=conv_t_multiplier,
            net_flux_thresh=net_flux_thresh,
            net_flux_percentile=net_flux_percentile, max_steps=max_steps,
            use_delta_exit=use_delta_exit, conv_method=conv_method)
    return jax.vmap(one)(states, forcings)


def grey_latitude_ensemble(world: GreyGas):
    """Split a ny>1 latitude-grid world into ny independent single-column
    members, each with its own adaptive-dt controller.

    The reference shares one dt across all latitudes (base.py:197-246), which
    drags convergence to the slowest column; latitudes never couple in this
    model, so marching them as a vmapped ensemble is a pure improvement
    (framework extra — opt-in, not used by the parity paths).

    :return: (states, forcings, p_interface [nz,1], p_centre [nz-1]) with a
        leading ny axis; reassemble with ``states.T[:, :, 0].T``.
    """
    ny = world.ny
    base = world.forcing
    def col(x):
        return jnp.moveaxis(x, -1, 0)[:, ..., None]      # [ny, ..., 1]
    forcings = GreyForcing(
        dtau=col(base.dtau), tau_sw_interface=col(base.tau_sw_interface),
        albedo_mod=base.albedo_mod[:, None],
        solar_latitude_factor=base.solar_latitude_factor[:, None],
        F_stellar=jnp.broadcast_to(base.F_stellar, (ny,)))
    st = world.state
    states = ColumnState(
        T=jnp.moveaxis(st.T, 1, 0)[:, :, None],
        net_flux=jnp.moveaxis(st.net_flux, 1, 0)[:, :, None],
        t=jnp.broadcast_to(st.t, (ny,)),
        tsi=jax.tree_util.tree_map(
            lambda x: (jnp.broadcast_to(x, (ny,) + x.shape)
                       if x.ndim == 0 else
                       x.reshape(world.nz - 1, ny).T), st.tsi))
    p_int = jnp.asarray(world.p_interface[:, :1], world.dtype)
    p_c = jnp.asarray(world.p[:, 0], world.dtype)
    return states, forcings, p_int, p_c


def grey_ensemble(world: GreyGas, F_stellar_values):
    """Convenience: batched (states, forcings, grids) from a template world."""
    from ..constants import sigma
    n = len(F_stellar_values)
    states = broadcast_state(world.state, n)
    # isothermal initial condition consistent with each member's forcing
    # (base.py:51-73 per member)
    F = np.asarray(F_stellar_values, dtype=np.float64)[:, None]       # [n, 1]
    T0 = (F * world.solar_latitude_factor[None]
          * (1 - world.albedo_mod[None]) / 4 / sigma) ** 0.25         # [n, ny]
    T_init = np.broadcast_to(T0[:, None, :], (n,) + world.T.shape)
    states = states.replace(
        T=jnp.asarray(T_init, world.dtype),
        net_flux=jnp.zeros_like(states.net_flux))
    forcings = grey_ensemble_forcing(world, F_stellar_values)
    p_int = jnp.asarray(world.p_interface, world.dtype)
    p_c = jnp.asarray(world.p[:, 0], world.dtype)
    return states, forcings, p_int, p_c
