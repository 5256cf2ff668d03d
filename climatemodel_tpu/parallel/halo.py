"""Sharded shallow-water stepping: spatial domain decomposition over a device
mesh with ring halo exchange.

This is the framework's distributed-communication pattern (SURVEY.md section 5):
the reference's ghost-cell boundary conditions (shallow_water.py:393-444) become
a one-column halo exchange between x-neighbouring shards via ``lax.ppermute``
over the ICI ring, inside ``shard_map``.  Global reductions (CFL max, the
El Nino boundary-average wind closure) become ``lax.pmax``/``lax.psum`` over the
mesh axis.

Representation: shards hold *interior-x* columns [nx_i/P, ny] (y ghost rows are
kept and refreshed locally; x ghost columns are reconstructed every step from
the halo + physical boundary rules).  Static geometry (Coriolis, orography)
is pre-padded per shard on the host so ghost-column *construction* values match
the unsharded model exactly.  Equality with the unsharded step is exact because
(a) every ghost value of the reference BCs is a copy of an interior value, and
(b) no scheme stencil ever reads a ghost corner (verified in tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:                                  # older jax
    from jax.experimental.shard_map import shard_map

from ..models import shallow_water as sw
from ..ops import stencils


def _ring_perms(n):
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    return fwd, bwd


def _pad_x(f, axis_name, bx, wall_value=None):
    """Reconstruct the x ghost columns of a local block via halo exchange.

    :param f: [local_nx, ny] local interior-x block (y ghosts included).
    :param wall_value: None -> ghost copies adjacent interior (h, v rule);
        a float -> ghost fixed to that value (u at walls).
    """
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    fwd, bwd = _ring_perms(n)
    from_left = lax.ppermute(f[-1:], axis_name, fwd)    # left neighbour's last col
    from_right = lax.ppermute(f[:1], axis_name, bwd)    # right neighbour's first col
    if bx == 'periodic':
        left, right = from_left, from_right             # ring wrap == periodic BC
    elif bx == 'walls':
        if wall_value is None:
            own_left, own_right = f[:1], f[-1:]
        else:
            own_left = jnp.full_like(f[:1], wall_value)
            own_right = jnp.full_like(f[-1:], wall_value)
        left = jnp.where(i == 0, own_left, from_left)
        right = jnp.where(i == n - 1, own_right, from_right)
    else:
        raise ValueError(f'unknown x boundary {bx!r}')
    return jnp.concatenate([left, f, right], axis=0)


def _apply_y_bc(h, u, v, by):
    """Local y boundary conditions on the ghost rows (shallow_water.py:427-443).
    Works on interior-x blocks: every column applies the same rule."""
    if by == 'periodic':
        def per_y(f):
            f = f.at[:, 0].set(f[:, -2])
            f = f.at[:, -1].set(f[:, 1])
            return f
        return per_y(h), per_y(u), per_y(v)
    if by == 'walls':
        v = v.at[:, 0].set(0.0).at[:, -1].set(0.0)
        h = h.at[:, 0].set(h[:, 1]).at[:, -1].set(h[:, -2])
        u = u.at[:, 0].set(u[:, 1]).at[:, -1].set(u[:, -2])
        return h, u, v
    raise ValueError(f'unknown y boundary {by!r}')


def make_sharded_step(mesh: Mesh, axis_name='x', solver='richtmyer',
                      linear=False, bx='periodic', by='walls', wind_type=None,
                      target_courant=0.1):
    """Build the per-shard step body (to be wrapped in shard_map/scan)."""

    def step(h, u, v, t, dt0, dt_prev, f_cor_pad, h_base_pad, r_int, g, h_mean,
             dx, dy, wind_gamma, wind_tau0, wind_fluct, east_w, west_w):
        # global CFL (max over all shards; ghost copies never exceed interior)
        max_u = lax.pmax(jnp.max(u ** 2 + v ** 2), axis_name)
        dt_cfl = jnp.minimum(dt0, target_courant * jnp.minimum(dx, dy)
                             / jnp.sqrt(max_u))
        dt = jnp.where(t > 0, dt_cfl, dt_prev)
        ok = dt >= 10.0

        hp = _pad_x(h, axis_name, bx)
        up = _pad_x(u, axis_name, bx, wall_value=0.0 if bx == 'walls' else None)
        vp = _pad_x(v, axis_name, bx)
        U = sw.get_conservative_form(hp, up, vp, linear)
        flux_x = sw.make_flux_x(g, h_mean, linear)
        flux_y = sw.make_flux_y(g, h_mean, linear)
        source = sw.make_source(g, f_cor_pad, h_base_pad, dx, dy, linear)
        if solver == 'lax_wendroff':
            U = stencils.lax_wendroff(U, flux_x, flux_y, source, dt, dx, dy,
                                      [0], hp.shape[0], hp.shape[1],
                                      sw.make_jacobian_x(g), sw.make_jacobian_y(g))
        else:
            U = stencils.SCHEMES[solver](U, flux_x, flux_y, source, dt, dx, dy,
                                         [0])
        h_new, u_new, v_new = sw.get_physical_values(U[:, 1:-1, :], linear)
        u_new = u_new - r_int * dt * u
        v_new = v_new - r_int * dt * v
        if wind_type not in (None, 'unforced'):
            if wind_type == 'seasonal':
                t_year = 365 * 24 * 60 ** 2
                wind = wind_tau0 + wind_fluct * jnp.sin(t * 2 * jnp.pi / t_year)
            else:
                # BC-consistent h for the boundary averages: y ghosts refreshed,
                # x ghost contributions folded into the precomputed weights
                h_bc = _apply_y_bc(h_new, u_new, v_new, by)[0]
                h_east = lax.psum(jnp.sum(h_bc * east_w), axis_name) / \
                    lax.psum(jnp.sum(east_w), axis_name)
                h_west = lax.psum(jnp.sum(h_bc * west_w), axis_name) / \
                    lax.psum(jnp.sum(west_w), axis_name)
                forced = wind_gamma * (h_east - h_west)
                if wind_type == 'seasonal_forced':
                    t_year = 365 * 24 * 60 ** 2
                    wind = forced + wind_fluct * jnp.sin(t * 2 * jnp.pi / t_year)
                else:
                    wind = forced
            u_new = u_new + wind * dt
        h_new, u_new, v_new = _apply_y_bc(h_new, u_new, v_new, by)
        h_new = jnp.where(ok, h_new, h)
        u_new = jnp.where(ok, u_new, u)
        v_new = jnp.where(ok, v_new, v)
        return h_new, u_new, v_new, t + dt, dt, ok

    return step


class ShardedShallowWater:
    """Domain-decomposed wrapper around a ShallowWater model.

    Shards the x axis of the grid over ``mesh`` and runs the identical physics
    with halo exchange; results match the single-device model exactly.
    """

    def __init__(self, world: sw.ShallowWater, mesh: Mesh, axis_name='x'):
        self.world = world
        self.mesh = mesh
        self.axis_name = axis_name
        n_shards = mesh.shape[axis_name]
        nxi = world.nx - 2
        if nxi % n_shards:
            raise ValueError(f'interior nx={nxi} not divisible by '
                             f'{n_shards} shards')
        self.n_shards = n_shards
        self.local_nx = nxi // n_shards
        d = world.dtype

        # per-shard padded static geometry: block b covers global ghost-grid
        # columns [b*local, b*local + local + 1]
        def pad_geometry(full):
            blocks = [full[b * self.local_nx: b * self.local_nx
                           + self.local_nx + 2] for b in range(n_shards)]
            return np.stack(blocks)
        self.f_cor_pad = jnp.asarray(pad_geometry(world.f_coriolis), d)
        self.h_base_pad = jnp.asarray(pad_geometry(world.h_base), d)
        self.r_int = jnp.asarray(world.r[1:-1], d)

        # El Nino boundary-average masks folded onto interior-x cells: every
        # ghost column of h is a copy of an interior column, so its mask weight
        # accumulates onto the source column (exact ghost-inclusive averages)
        if world.wind_type is not None:
            w = world.initial_info['wind']
            east_m, west_m = world._boundary_masks(w['x_average_width'],
                                                   w['y_average_width'])
            self.east_w = jnp.asarray(self._fold_ghost_mask(east_m), d)
            self.west_w = jnp.asarray(self._fold_ghost_mask(west_m), d)
            self.wind_gamma = jnp.asarray(w['gamma'], d)
            self.wind_tau0 = jnp.asarray(w['initial_tau_over_h'], d)
            self.wind_fluct = jnp.asarray(w['seasonal_fluct'], d)
        else:
            z = jnp.zeros((nxi, world.ny), d)
            self.east_w = self.west_w = z
            self.wind_gamma = self.wind_tau0 = self.wind_fluct = \
                jnp.asarray(0.0, d)

    def _fold_ghost_mask(self, mask):
        """Full ghost-grid mask [nx, ny] -> interior-x weights [nx-2, ny]."""
        nx = self.world.nx
        bx = self.world.boundary_type['x']
        w = mask[1:-1].astype(np.float64).copy()
        left_src = (nx - 3) if bx == 'periodic' else 0
        right_src = 0 if bx == 'periodic' else (nx - 3)
        w[left_src] += mask[0]
        w[right_src] += mask[-1]
        return w

    def _step_fn(self, target_courant=0.1):
        wld = self.world
        body = make_sharded_step(self.mesh, self.axis_name,
                                 solver=wld.numerical_solver, linear=wld.linear,
                                 bx=wld.boundary_type['x'],
                                 by=wld.boundary_type['y'],
                                 wind_type=wld.wind_type,
                                 target_courant=target_courant)
        return body

    def run(self, nt, target_courant=0.1):
        """Run nt steps sharded; updates the wrapped world's state in place."""
        wld = self.world
        d = wld.dtype
        ax = self.axis_name
        sharded = P(ax, None)
        rep = P()
        spec_in = (sharded, sharded, sharded, rep, rep, rep,
                   P(ax, None, None), P(ax, None, None), sharded,
                   rep, rep, rep, rep, rep, rep, rep, sharded, sharded)
        body = self._step_fn(target_courant)

        @functools.partial(shard_map, mesh=self.mesh, in_specs=spec_in,
                           out_specs=(sharded, sharded, sharded, rep, rep, rep))
        def simulate(h, u, v, t, dt0, dt_prev, f_cor_pad, h_base_pad, r_int,
                     g, h_mean, dx, dy, gamma, tau0, fluct, east_w, west_w):
            f_cor_pad = f_cor_pad[0]
            h_base_pad = h_base_pad[0]

            def scan_body(carry, _):
                h, u, v, t, dt, ok0 = carry
                h, u, v, t, dt, ok = body(h, u, v, t, dt0, dt, f_cor_pad,
                                          h_base_pad, r_int, g, h_mean, dx, dy,
                                          gamma, tau0, fluct, east_w, west_w)
                return (h, u, v, t, dt, ok0 & ok), None

            init = (h, u, v, t, dt_prev, jnp.asarray(True))
            (h, u, v, t, dt, ok), _ = lax.scan(scan_body, init, None, length=nt)
            return h, u, v, t, dt, ok

        st = wld.state
        h, u, v, t, dt, ok = simulate(
            st.h[1:-1], st.u[1:-1], st.v[1:-1], st.t,
            jnp.asarray(wld.dt_0, d), st.dt, self.f_cor_pad, self.h_base_pad,
            self.r_int, jnp.asarray(wld.g, d), jnp.asarray(wld.h_mean, d),
            jnp.asarray(wld.dx, d), jnp.asarray(wld.dy, d), self.wind_gamma,
            self.wind_tau0, self.wind_fluct, self.east_w, self.west_w)
        if not bool(ok):
            raise ValueError('time step very small')
        # write back: reconstruct global ghost columns with the standard BCs
        h_full = jnp.concatenate([h[:1], h, h[-1:]], axis=0)
        u_full = jnp.concatenate([u[:1], u, u[-1:]], axis=0)
        v_full = jnp.concatenate([v[:1], v, v[-1:]], axis=0)
        h_full, u_full, v_full = sw.apply_boundary_conditions(
            h_full, u_full, v_full, wld.boundary_type['x'],
            wld.boundary_type['y'])
        wld._state = st.replace(h=h_full.astype(d), u=u_full.astype(d),
                                v=v_full.astype(d), t=t, dt=dt,
                                ok=st.ok & ok)
        return wld._state


# --------------------------------------------------------------------------
# 2-D (x, y) domain decomposition
# --------------------------------------------------------------------------

def _pad_axis(f, mesh_axis, boundary, array_axis, wall_value=None):
    """Reconstruct one array axis's ghost layer via ring halo exchange over a
    mesh axis, applying the physical boundary rule at the global edges."""
    n = lax.axis_size(mesh_axis)
    i = lax.axis_index(mesh_axis)
    fwd, bwd = _ring_perms(n)
    if array_axis == 0:
        lo_edge, hi_edge = f[:1], f[-1:]
    else:
        lo_edge, hi_edge = f[:, :1], f[:, -1:]
    from_lo = lax.ppermute(hi_edge, mesh_axis, fwd)    # lower neighbour's top
    from_hi = lax.ppermute(lo_edge, mesh_axis, bwd)    # upper neighbour's bottom
    if boundary == 'periodic':
        lo, hi = from_lo, from_hi
    elif boundary == 'walls':
        own_lo = lo_edge if wall_value is None else jnp.full_like(lo_edge,
                                                                  wall_value)
        own_hi = hi_edge if wall_value is None else jnp.full_like(hi_edge,
                                                                  wall_value)
        lo = jnp.where(i == 0, own_lo, from_lo)
        hi = jnp.where(i == n - 1, own_hi, from_hi)
    else:
        raise ValueError(f'unknown boundary {boundary!r}')
    return jnp.concatenate([lo, f, hi], axis=array_axis)


def make_sharded_step_2d(ax_x='x', ax_y='y', solver='richtmyer', linear=False,
                         bx='periodic', by='walls', wind_type=None,
                         target_courant=0.1):
    """Per-shard step for a 2-D spatial decomposition: shards hold interior
    blocks [nxi/Px, nyi/Py]; both ghost layers are rebuilt every step from the
    halos (corners from the neighbours' own ghost rows — never read by any
    scheme stencil)."""
    axes = (ax_x, ax_y)

    def pad2(f, wall_u_x=False, wall_v_y=False):
        f = _pad_axis(f, ax_y, by, 1,
                      wall_value=0.0 if (wall_v_y and by == 'walls') else None)
        f = _pad_axis(f, ax_x, bx, 0,
                      wall_value=0.0 if (wall_u_x and bx == 'walls') else None)
        return f

    def step(h, u, v, t, dt0, dt_prev, f_cor_pad, h_base_pad, r_int, g, h_mean,
             dx, dy, wind_gamma, wind_tau0, wind_fluct, east_w, west_w):
        max_u = jnp.max(u ** 2 + v ** 2)
        for ax in axes:
            max_u = lax.pmax(max_u, ax)
        dt_cfl = jnp.minimum(dt0, target_courant * jnp.minimum(dx, dy)
                             / jnp.sqrt(max_u))
        dt = jnp.where(t > 0, dt_cfl, dt_prev)
        ok = dt >= 10.0

        hp = pad2(h)
        up = pad2(u, wall_u_x=True)
        vp = pad2(v, wall_v_y=True)
        U = sw.get_conservative_form(hp, up, vp, linear)
        flux_x = sw.make_flux_x(g, h_mean, linear)
        flux_y = sw.make_flux_y(g, h_mean, linear)
        source = sw.make_source(g, f_cor_pad, h_base_pad, dx, dy, linear)
        if solver == 'lax_wendroff':
            U = stencils.lax_wendroff(U, flux_x, flux_y, source, dt, dx, dy,
                                      [0], hp.shape[0], hp.shape[1],
                                      sw.make_jacobian_x(g),
                                      sw.make_jacobian_y(g))
        else:
            U = stencils.SCHEMES[solver](U, flux_x, flux_y, source, dt, dx, dy,
                                         [0])
        h_new, u_new, v_new = sw.get_physical_values(U[:, 1:-1, 1:-1], linear)
        u_new = u_new - r_int * dt * u
        v_new = v_new - r_int * dt * v
        if wind_type not in (None, 'unforced'):
            if wind_type == 'seasonal':
                t_year = 365 * 24 * 60 ** 2
                wind = wind_tau0 + wind_fluct * jnp.sin(t * 2 * jnp.pi / t_year)
            else:
                def gsum(x):
                    s = jnp.sum(x)
                    for ax in axes:
                        s = lax.psum(s, ax)
                    return s
                h_east = gsum(h_new * east_w) / gsum(east_w)
                h_west = gsum(h_new * west_w) / gsum(west_w)
                forced = wind_gamma * (h_east - h_west)
                if wind_type == 'seasonal_forced':
                    t_year = 365 * 24 * 60 ** 2
                    wind = forced + wind_fluct * jnp.sin(t * 2 * jnp.pi
                                                         / t_year)
                else:
                    wind = forced
            u_new = u_new + wind * dt
        h_new = jnp.where(ok, h_new, h)
        u_new = jnp.where(ok, u_new, u)
        v_new = jnp.where(ok, v_new, v)
        return h_new, u_new, v_new, t + dt, dt, ok

    return step


class ShardedShallowWater2D:
    """Full 2-D (x, y) domain decomposition of a ShallowWater model over a
    mesh with axes (ax_x, ax_y); matches the single-device model exactly."""

    def __init__(self, world: sw.ShallowWater, mesh: Mesh, ax_x='x', ax_y='y'):
        self.world = world
        self.mesh = mesh
        self.ax_x, self.ax_y = ax_x, ax_y
        px, py = mesh.shape[ax_x], mesh.shape[ax_y]
        nxi, nyi = world.nx - 2, world.ny - 2
        if nxi % px or nyi % py:
            raise ValueError(f'interior {nxi}x{nyi} not divisible by '
                             f'{px}x{py} shards')
        self.lx, self.ly = nxi // px, nyi // py
        d = world.dtype

        def pad_geometry(full):
            blocks = [[full[i * self.lx: i * self.lx + self.lx + 2,
                            j * self.ly: j * self.ly + self.ly + 2]
                       for j in range(py)] for i in range(px)]
            return np.asarray(blocks)         # [px, py, lx+2, ly+2]
        self.f_cor_pad = jnp.asarray(pad_geometry(world.f_coriolis), d)
        self.h_base_pad = jnp.asarray(pad_geometry(world.h_base), d)
        self.r_int = jnp.asarray(world.r[1:-1, 1:-1], d)

        if world.wind_type is not None:
            w = world.initial_info['wind']
            east_m, west_m = world._boundary_masks(w['x_average_width'],
                                                   w['y_average_width'])
            self.east_w = jnp.asarray(self._fold_mask_2d(east_m), d)
            self.west_w = jnp.asarray(self._fold_mask_2d(west_m), d)
            self.wind_gamma = jnp.asarray(w['gamma'], d)
            self.wind_tau0 = jnp.asarray(w['initial_tau_over_h'], d)
            self.wind_fluct = jnp.asarray(w['seasonal_fluct'], d)
        else:
            z = jnp.zeros((nxi, nyi), d)
            self.east_w = self.west_w = z
            self.wind_gamma = self.wind_tau0 = self.wind_fluct = \
                jnp.asarray(0.0, d)

    def _fold_mask_2d(self, mask):
        """Ghost-grid mask [nx, ny] -> interior weights [nx-2, ny-2]: every
        ghost h value is a copy of an interior cell, so its mask weight
        accumulates onto the source cell (exact ghost-inclusive averages)."""
        nx, ny = self.world.nx, self.world.ny
        bx = self.world.boundary_type['x']
        by = self.world.boundary_type['y']
        # fold x ghost columns first
        w1 = mask[1:-1].astype(np.float64).copy()          # [nxi, ny]
        w1[(nx - 3) if bx == 'periodic' else 0] += mask[0]
        w1[0 if bx == 'periodic' else (nx - 3)] += mask[-1]
        # then y ghost rows
        w2 = w1[:, 1:-1].copy()                            # [nxi, nyi]
        w2[:, (ny - 3) if by == 'periodic' else 0] += w1[:, 0]
        w2[:, 0 if by == 'periodic' else (ny - 3)] += w1[:, -1]
        return w2

    def run(self, nt, target_courant=0.1):
        wld = self.world
        d = wld.dtype
        ax_x, ax_y = self.ax_x, self.ax_y
        shard2 = P(ax_x, ax_y)
        geom = P(ax_x, ax_y, None, None)
        rep = P()
        spec_in = (shard2, shard2, shard2, rep, rep, rep, geom, geom, shard2,
                   rep, rep, rep, rep, rep, rep, rep, shard2, shard2)
        body = make_sharded_step_2d(ax_x, ax_y, solver=wld.numerical_solver,
                                    linear=wld.linear,
                                    bx=wld.boundary_type['x'],
                                    by=wld.boundary_type['y'],
                                    wind_type=wld.wind_type,
                                    target_courant=target_courant)

        @functools.partial(shard_map, mesh=self.mesh, in_specs=spec_in,
                           out_specs=(shard2, shard2, shard2, rep, rep, rep))
        def simulate(h, u, v, t, dt0, dt_prev, f_cor_pad, h_base_pad, r_int,
                     g, h_mean, dx, dy, gamma, tau0, fluct, east_w, west_w):
            f_cor_pad = f_cor_pad[0, 0]
            h_base_pad = h_base_pad[0, 0]

            def scan_body(carry, _):
                h, u, v, t, dt, ok0 = carry
                h, u, v, t, dt, ok = body(h, u, v, t, dt0, dt, f_cor_pad,
                                          h_base_pad, r_int, g, h_mean, dx, dy,
                                          gamma, tau0, fluct, east_w, west_w)
                return (h, u, v, t, dt, ok0 & ok), None

            init = (h, u, v, t, dt_prev, jnp.asarray(True))
            (h, u, v, t, dt, ok), _ = lax.scan(scan_body, init, None, length=nt)
            return h, u, v, t, dt, ok

        st = wld.state
        h, u, v, t, dt, ok = simulate(
            st.h[1:-1, 1:-1], st.u[1:-1, 1:-1], st.v[1:-1, 1:-1], st.t,
            jnp.asarray(wld.dt_0, d), st.dt, self.f_cor_pad, self.h_base_pad,
            self.r_int, jnp.asarray(wld.g, d), jnp.asarray(wld.h_mean, d),
            jnp.asarray(wld.dx, d), jnp.asarray(wld.dy, d), self.wind_gamma,
            self.wind_tau0, self.wind_fluct, self.east_w, self.west_w)
        if not bool(ok):
            raise ValueError('time step very small')
        pad = ((1, 1), (1, 1))
        h_full = jnp.asarray(np.pad(np.asarray(h), pad, mode='edge'))
        u_full = jnp.asarray(np.pad(np.asarray(u), pad, mode='edge'))
        v_full = jnp.asarray(np.pad(np.asarray(v), pad, mode='edge'))
        h_full, u_full, v_full = sw.apply_boundary_conditions(
            h_full, u_full, v_full, wld.boundary_type['x'],
            wld.boundary_type['y'])
        wld._state = st.replace(h=h_full.astype(d), u=u_full.astype(d),
                                v=v_full.astype(d), t=t, dt=dt, ok=st.ok & ok)
        return wld._state
