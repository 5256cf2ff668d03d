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
(b) of the four schemes only maccormack reads ghost corners — the 1-D
decomposition reproduces the reference's periodic-y corner rules (incl. the
``f[-1,-1]=f[-2,-1]`` quirk) on the edge shards, and the 2-D decomposition
fixes the four GLOBAL corners via a y-ring exchange between the corner
shards (``_fix_corners_periodic_y_2d``; interior seam corners are already
exact because y is padded before x).  The El Nino wind closure's
ghost-inclusive boundary averages fold ghost mask weights onto their source
cells for every (bx, by) combination, corner override rules included.

``numerical_solver='richtmyer_pallas'`` (r05): the 1-D decomposition runs the
FUSED PALLAS FRAME KERNEL per shard — each shard's state lives in a padded
frame (ops/pallas_stencils layout), the halo exchange supplies the two x
ghost rows (kernel mode ``bx='given'``), and the y boundary conditions,
damping, abort freeze and CFL max stay fused in-kernel.  Requirements:
nonlinear, walls-y, local interior with a multiple-of-8 band divisor;
anything else falls back to the jnp stencils WITH a UserWarning (never
silently — r04 verdict item 6).  Parity vs the single-device kernel path is
f64-ulp-level on CPU interpret (tests/test_sharded.py).
"""
from __future__ import annotations

import functools
import warnings

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


def _wind_stress(wind_type, t, tau0, fluct, forced):
    """Compose the wind stress from its parts (shallow_water.py:272-308 /
    el_nino_seasonal_wind); shared by the 1-D and 2-D sharded steps."""
    t_year = 365 * 24 * 60 ** 2
    seasonal = fluct * jnp.sin(t * 2 * jnp.pi / t_year)
    if wind_type == 'seasonal':
        return tau0 + seasonal
    if wind_type == 'seasonal_forced':
        return forced + seasonal
    if wind_type == 'forced':
        return forced
    raise ValueError(f'wind type {wind_type!r} not valid')


def _fix_corners_periodic_y(fp, axis_name):
    """Reference periodic-y ghost-CORNER rules on the global-edge shards
    (shallow_water.py:428-436, applied after the x rules so they win):
    f[0,0]=f[1,-2], f[0,-1]=f[1,1], f[-1,0]=f[-2,-2], and the reference's own
    quirk f[-1,-1]=f[-2,-1] (whose value per_y already set to f[-2,1]).
    Middle shards' padded columns are interior columns whose y-ghost rows
    follow the plain per_y rule — the halo already carries those."""
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    L = fp.shape[0] - 2
    fp = fp.at[0, 0].set(jnp.where(i == 0, fp[1, -2], fp[0, 0]))
    fp = fp.at[0, -1].set(jnp.where(i == 0, fp[1, 1], fp[0, -1]))
    fp = fp.at[L + 1, 0].set(jnp.where(i == n - 1, fp[L, -2], fp[L + 1, 0]))
    fp = fp.at[L + 1, -1].set(jnp.where(i == n - 1, fp[L, -1], fp[L + 1, -1]))
    return fp


def _fix_corners_periodic_y_2d(fp, f, ax_x, ax_y):
    """Reference periodic-y ghost-corner rules at the four GLOBAL corners of a
    2-D decomposition (shallow_water.py:428-436, applied after the x rules so
    they win): f[0,0]=f[1,-2], f[-1,0]=f[-2,-2], f[0,-1]=f[1,1] and the quirk
    f[-1,-1]=f[-2,-1] (whose value the y edge rule already set to f[-2,1]).
    Every source is an interior cell of the same-x shard at the OPPOSITE
    global y edge, so the corner shards exchange one value over the y ring
    (two ppermutes per x side); every other shard's write is a no-op.
    Interior seam corners need no fixing: padding y before x transports the
    diagonal neighbours' values exactly.

    :param fp: [lx+2, ly+2] padded local block (pad2 output).
    :param f: [lx, ly] local interior block.
    """
    n_y = lax.axis_size(ax_y)
    j = lax.axis_index(ax_y)
    n_x = lax.axis_size(ax_x)
    i = lax.axis_index(ax_x)
    fwd, bwd = _ring_perms(n_y)

    def fix_side(fp, xi, xg, on_edge):
        own_hi = f[xi, -1].reshape(1, 1)    # this shard's y-hi interior corner
        own_lo = f[xi, 0].reshape(1, 1)
        from_hi = lax.ppermute(own_hi, ax_y, fwd)[0, 0]   # j=0 <- j=n_y-1
        from_lo = lax.ppermute(own_lo, ax_y, bwd)[0, 0]   # j=n_y-1 <- j=0
        fp = fp.at[xg, 0].set(jnp.where(on_edge & (j == 0), from_hi,
                                        fp[xg, 0]))
        fp = fp.at[xg, -1].set(jnp.where(on_edge & (j == n_y - 1), from_lo,
                                         fp[xg, -1]))
        return fp

    fp = fix_side(fp, 0, 0, i == 0)           # global x-lo ghost column
    fp = fix_side(fp, -1, -1, i == n_x - 1)   # global x-hi ghost column
    return fp


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
        if by == 'periodic':
            # maccormack reads ghost corners; the reference's per_y corner
            # rules override whatever the x rules wrote there
            hp = _fix_corners_periodic_y(hp, axis_name)
            up = _fix_corners_periodic_y(up, axis_name)
            vp = _fix_corners_periodic_y(vp, axis_name)
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
                forced = None
            else:
                # BC-consistent h for the boundary averages: y ghosts refreshed,
                # x ghost contributions folded into the precomputed weights
                h_bc = _apply_y_bc(h_new, u_new, v_new, by)[0]
                h_east = lax.psum(jnp.sum(h_bc * east_w), axis_name) / \
                    lax.psum(jnp.sum(east_w), axis_name)
                h_west = lax.psum(jnp.sum(h_bc * west_w), axis_name) / \
                    lax.psum(jnp.sum(west_w), axis_name)
                forced = wind_gamma * (h_east - h_west)
            wind = _wind_stress(wind_type, t, wind_tau0, wind_fluct, forced)
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

    def __init__(self, world: sw.ShallowWater, mesh: Mesh, axis_name='x',
                 use_kernel='auto'):
        self.world = world
        self.mesh = mesh
        self.axis_name = axis_name
        # richtmyer_pallas shards onto the fused frame kernel per shard
        # (bx='given': the halo exchange supplies the x ghost rows, the y
        # boundary conditions stay fused in-kernel).  Conditions: nonlinear,
        # walls-y (the periodic-y ghost-CORNER rules of the reference need
        # values the kernel's per-row lane writes don't see), and the local
        # interior must tile (frame_supports).  Everything else falls back
        # to the jnp richtmyer stencils — loudly, so a flagship-kernel run
        # can't silently downgrade (r04 verdict item 6).
        from ..ops.pallas_stencils import frame_supports
        n_sh = mesh.shape[axis_name]
        kernel_ok = (world.numerical_solver == 'richtmyer_pallas'
                     and not world.linear
                     and world.boundary_type['y'] == 'walls'
                     and (world.nx - 2) % n_sh == 0
                     and frame_supports((world.nx - 2) // n_sh + 2, world.ny))
        if use_kernel == 'auto':
            self.use_kernel = kernel_ok
            if world.numerical_solver == 'richtmyer_pallas' and not kernel_ok:
                warnings.warn(
                    'sharded shallow water: richtmyer_pallas requested but '
                    'the fused kernel path needs nonlinear + walls-y + a '
                    'multiple-of-8 band divisor of the local interior — '
                    'falling back to the jnp richtmyer stencils',
                    stacklevel=2)
        elif use_kernel and not kernel_ok:
            raise ValueError('use_kernel=True but this configuration cannot '
                             'run the fused kernel path (needs '
                             'richtmyer_pallas, nonlinear, walls-y, and a '
                             'tileable local interior)')
        else:
            self.use_kernel = bool(use_kernel)
        self.solver = ('richtmyer' if world.numerical_solver
                       == 'richtmyer_pallas' else world.numerical_solver)
        n_shards = mesh.shape[axis_name]
        nxi = world.nx - 2
        if nxi % n_shards:
            raise ValueError(f'interior nx={nxi} not divisible by '
                             f'{n_shards} shards')
        self.n_shards = n_shards
        self.local_nx = nxi // n_shards
        self._compiled = {}
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
        if self.use_kernel:
            # interior geometry for the fused kernel (sharded P(ax, None))
            self.fcor_int = jnp.asarray(world.f_coriolis[1:-1, 1:-1], d)
            self.r_int_k = jnp.asarray(np.asarray(world.r)[1:-1, 1:-1], d)
            if world.orography_info['type'] == 'flat':
                self.dhb = None
            else:
                hb = jnp.asarray(world.h_base, d)
                self.dhb = (stencils.centered_diff_x(hb, world.dx),
                            stencils.centered_diff_y(hb, world.dy))

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
        """Full ghost-grid mask [nx, ny] -> interior-x weights [nx-2, ny].

        Every ghost h value is a copy of some other cell, so each ghost mask
        weight accumulates onto its source; x ghost columns fold here, y
        ghost rows stay (the step refreshes local y ghosts before averaging).
        With periodic-y the reference's corner rules (shallow_water.py:
        428-436) override the x rules, so the 4 corner weights route to THEIR
        sources (f[0,0]=f[1,-2], f[0,-1]=f[1,1], f[-1,0]=f[-2,-2], and the
        quirk f[-1,-1]=f[-2,-1] whose value is f[-2,1]) instead of the
        x-column fold; with walls-y the plain fold is already exact (the
        y-walls copy rule composes with the x rules cell-by-cell)."""
        nx, ny = self.world.nx, self.world.ny
        bx = self.world.boundary_type['x']
        by = self.world.boundary_type['y']
        m = mask.astype(np.float64).copy()
        w = m[1:-1].copy()
        if by == 'periodic':
            # interior-x index, ghost-grid y index (w keeps the y extent)
            w[0, ny - 2] += m[0, 0]
            w[0, 1] += m[0, -1]
            w[nx - 3, ny - 2] += m[-1, 0]
            w[nx - 3, 1] += m[-1, -1]
            m[0, 0] = m[0, -1] = m[-1, 0] = m[-1, -1] = 0.0
        left_src = (nx - 3) if bx == 'periodic' else 0
        right_src = 0 if bx == 'periodic' else (nx - 3)
        w[left_src] += m[0]
        w[right_src] += m[-1]
        return w

    def _step_fn(self, target_courant=0.1):
        wld = self.world
        body = make_sharded_step(self.mesh, self.axis_name,
                                 solver=self.solver, linear=wld.linear,
                                 bx=wld.boundary_type['x'],
                                 by=wld.boundary_type['y'],
                                 wind_type=wld.wind_type,
                                 target_courant=target_courant)
        return body

    def _simulate_fn(self, nt, target_courant):
        """Build (and cache) the shard_map'd nt-step program: a fresh closure
        per run() would re-trace and re-compile the whole scan every call."""
        key = (nt, target_courant)
        if key in self._compiled:
            return self._compiled[key]
        ax = self.axis_name
        sharded = P(ax, None)
        rep = P()
        spec_in = (sharded, sharded, sharded, rep, rep, rep,
                   P(ax, None, None), P(ax, None, None), sharded,
                   rep, rep, rep, rep, rep, rep, rep, sharded, sharded)
        body = self._step_fn(target_courant)

        @jax.jit
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

        self._compiled[key] = simulate
        return simulate

    def _simulate_fn_kernel(self, nt, target_courant):
        """shard_map'd nt-step program on the fused Pallas frame kernel.

        Per shard the state lives in a padded frame (ops/pallas_stencils
        layout); every step (1) rebuilds the two x ghost rows — ppermute
        halo from the ring neighbours, physical wall rules at the global
        edges — then (2) runs richtmyer_step_frame with bx='given' (y BCs,
        damping, abort freeze and the CFL max fused in-kernel), then (3)
        applies the El Niño wind from psum'd masked means.  The CFL dt uses
        lax.pmax of the per-shard interior maxima (max is exactly
        associative); per-cell arithmetic is the same fused window update,
        so runs match the single-device kernel path to f64 ulp
        (test_sharded.py; on CPU interpret the single-device kernel's OWN
        ghost-row stores carry ~1-ulp FMA-context noise — the class
        CLAUDE.md pins at rtol=1e-12 — so bit-equality is not the right
        contract there).
        """
        key = ('kernel', nt, target_courant)
        if key in self._compiled:
            return self._compiled[key]
        from ..ops.pallas_stencils import (FRAME_LANE0, FRAME_ROW0,
                                           frame_shape, richtmyer_step_frame)
        wld = self.world
        ax = self.axis_name
        n = self.n_shards
        lnx, ny = self.local_nx, wld.ny
        nyi = ny - 2
        bx = wld.boundary_type['x']
        wind_type = wld.wind_type
        flat = self.dhb is None
        fr, fl = frame_shape(lnx + 2, ny)
        R0, L0 = FRAME_ROW0, FRAME_LANE0
        fwd, bwd = _ring_perms(n)

        sharded = P(ax, None)
        rep = P()
        spec_in = [sharded, sharded, sharded, rep, rep, rep,
                   sharded, sharded]
        if not flat:
            spec_in += [sharded, sharded]
        spec_in += [rep, rep, rep, rep, rep, rep, sharded, sharded]

        def to_frame(f):
            buf = jnp.zeros((fr, fl), f.dtype)
            return lax.dynamic_update_slice(buf, f, (R0, L0 - 1))

        def simulate_body(h, u, v, t, dt0, dt_prev, fcor, r_, *rest):
            if flat:
                dhbx = dhby = None
            else:
                dhbx, dhby, *rest = rest
            g, dx, dy, gamma, tau0, fluct, east_w, west_w = rest
            i = lax.axis_index(ax)

            def set_ghosts(f_f, zero_at_walls):
                first = f_f[R0:R0 + 1]
                last = f_f[R0 + lnx - 1:R0 + lnx]
                from_left = lax.ppermute(last, ax, fwd)
                from_right = lax.ppermute(first, ax, bwd)
                if bx == 'periodic':
                    top, bot = from_left, from_right
                else:
                    own_top = (jnp.zeros_like(first) if zero_at_walls
                               else first)
                    own_bot = jnp.zeros_like(last) if zero_at_walls else last
                    top = jnp.where(i == 0, own_top, from_left)
                    bot = jnp.where(i == n - 1, own_bot, from_right)
                return f_f.at[R0 - 1:R0].set(top).at[R0 + lnx:
                                                     R0 + lnx + 1].set(bot)

            kern = lambda interp: (lambda *a: richtmyer_step_frame(
                *a, lnx + 2, ny, bx='given', by='walls', interpret=interp))

            def body(carry, _):
                h_f, u_f, v_f, t, dt_prev, max2, ok0 = carry
                max_u = jnp.sqrt(lax.pmax(max2, ax))
                dt_cfl = jnp.minimum(dt0, target_courant
                                     * jnp.minimum(dx, dy) / max_u)
                dt = jnp.where(t > 0, dt_cfl, dt_prev)
                ok = ok0 & (dt >= 10.0)
                h_f = set_ghosts(h_f, False)
                u_f = set_ghosts(u_f, bx == 'walls')
                v_f = set_ghosts(v_f, False)
                h_n, u_n, v_n, max2_k = jax.lax.platform_dependent(
                    h_f, u_f, v_f, fcor, r_, dhbx, dhby, dt, ok, g, dx, dy,
                    tpu=kern(False), default=kern(True))
                if wind_type not in (None, 'unforced'):
                    if wind_type == 'seasonal':
                        forced = jnp.asarray(0.0, h_n.dtype)
                    else:
                        hw = h_n[R0:R0 + lnx, L0 - 1:L0 - 1 + ny]
                        h_east = lax.psum(jnp.sum(hw * east_w), ax) / \
                            lax.psum(jnp.sum(east_w), ax)
                        h_west = lax.psum(jnp.sum(hw * west_w), ax) / \
                            lax.psum(jnp.sum(west_w), ax)
                        forced = gamma * (h_east - h_west)
                    wind = _wind_stress(wind_type, t, tau0, fluct, forced)
                    u_n = u_n + jnp.where(ok, wind * dt, jnp.zeros_like(dt))
                    # (no x-ghost-row re-zero needed: the output frame's
                    # ghost rows are rebuilt from the post-wind interior at
                    # the next step's set_ghosts)
                    ui = u_n[R0:R0 + lnx, L0:L0 + nyi]
                    vi = v_n[R0:R0 + lnx, L0:L0 + nyi]
                    max2_new = jnp.max(ui * ui + vi * vi)
                else:
                    max2_new = max2_k
                return (h_n, u_n, v_n, t + dt, dt, max2_new, ok), None

            max2_0 = jnp.max(u ** 2 + v ** 2)
            init = (to_frame(h), to_frame(u), to_frame(v), t, dt_prev,
                    max2_0, jnp.asarray(True))
            (h_f, u_f, v_f, t, dt, _m2, ok), _ = lax.scan(
                body, init, None, length=nt)
            blk = lambda f: f[R0:R0 + lnx, L0 - 1:L0 - 1 + ny]
            return blk(h_f), blk(u_f), blk(v_f), t, dt, ok

        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, which the checker (jax>=0.9 default on) rejects
        simulate = jax.jit(functools.partial(
            shard_map, mesh=self.mesh, in_specs=tuple(spec_in),
            out_specs=(sharded, sharded, sharded, rep, rep, rep),
            check_vma=False)(simulate_body))
        self._compiled[key] = simulate
        return simulate

    def run(self, nt, target_courant=0.1):
        """Run nt steps sharded; updates the wrapped world's state in place."""
        wld = self.world
        d = wld.dtype
        if self.use_kernel:
            return self._run_kernel(nt, target_courant)
        simulate = self._simulate_fn(nt, target_courant)
        st = wld.state
        h, u, v, t, dt, ok = simulate(
            st.h[1:-1], st.u[1:-1], st.v[1:-1], st.t,
            jnp.asarray(wld.dt_0, d), st.dt, self.f_cor_pad, self.h_base_pad,
            self.r_int, jnp.asarray(wld.g, d), jnp.asarray(wld.h_mean, d),
            jnp.asarray(wld.dx, d), jnp.asarray(wld.dy, d), self.wind_gamma,
            self.wind_tau0, self.wind_fluct, self.east_w, self.west_w)
        return self._commit(st, h, u, v, t, dt, ok)

    def _run_kernel(self, nt, target_courant):
        wld = self.world
        d = wld.dtype
        simulate = self._simulate_fn_kernel(nt, target_courant)
        st = wld.state
        ops = [st.h[1:-1], st.u[1:-1], st.v[1:-1], st.t,
               jnp.asarray(wld.dt_0, d), st.dt, self.fcor_int, self.r_int_k]
        if self.dhb is not None:
            ops += [self.dhb[0], self.dhb[1]]
        ops += [jnp.asarray(wld.g, d), jnp.asarray(wld.dx, d),
                jnp.asarray(wld.dy, d), self.wind_gamma, self.wind_tau0,
                self.wind_fluct, self.east_w, self.west_w]
        h, u, v, t, dt, ok = simulate(*ops)
        return self._commit(st, h, u, v, t, dt, ok)

    def _commit(self, st, h, u, v, t, dt, ok):
        """Write back: reconstruct the global ghost columns with the standard
        BCs and commit the (frozen-at-abort) state BEFORE raising, like the
        unsharded run — callers inspect world.dt / resume after catching."""
        wld = self.world
        d = wld.dtype
        h_full = jnp.concatenate([h[:1], h, h[-1:]], axis=0)
        u_full = jnp.concatenate([u[:1], u, u[-1:]], axis=0)
        v_full = jnp.concatenate([v[:1], v, v[-1:]], axis=0)
        h_full, u_full, v_full = sw.apply_boundary_conditions(
            h_full, u_full, v_full, wld.boundary_type['x'],
            wld.boundary_type['y'])
        wld._state = st.replace(h=h_full.astype(d), u=u_full.astype(d),
                                v=v_full.astype(d), t=t, dt=dt,
                                ok=st.ok & ok)
        if not bool(ok):
            raise ValueError('time step very small')
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
        if solver == 'maccormack' and by == 'periodic':
            # maccormack is the one scheme that reads ghost corners; the
            # global corners need the reference's periodic-y override rules
            hp = _fix_corners_periodic_y_2d(hp, h, ax_x, ax_y)
            up = _fix_corners_periodic_y_2d(up, u, ax_x, ax_y)
            vp = _fix_corners_periodic_y_2d(vp, v, ax_x, ax_y)
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
                forced = None
            else:
                def gsum(x):
                    s = jnp.sum(x)
                    for ax in axes:
                        s = lax.psum(s, ax)
                    return s
                h_east = gsum(h_new * east_w) / gsum(east_w)
                h_west = gsum(h_new * west_w) / gsum(west_w)
                forced = wind_gamma * (h_east - h_west)
            wind = _wind_stress(wind_type, t, wind_tau0, wind_fluct, forced)
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
        self.solver = ('richtmyer' if world.numerical_solver
                       == 'richtmyer_pallas' else world.numerical_solver)
        self._compiled = {}
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
        accumulates onto the source cell (exact ghost-inclusive averages).
        With periodic-y the reference's corner rules (shallow_water.py:
        428-436) override the x rules, so the 4 corner weights route straight
        to their interior sources (f[0,0]=f[1,-2] etc.); with walls-y the
        x-then-y fold is already exact cell-by-cell."""
        nx, ny = self.world.nx, self.world.ny
        bx = self.world.boundary_type['x']
        by = self.world.boundary_type['y']
        m = mask.astype(np.float64).copy()
        corner = np.zeros((nx - 2, ny - 2))
        if by == 'periodic':
            corner[0, ny - 3] += m[0, 0]          # f[0,0]   = f[1,-2]
            corner[0, 0] += m[0, -1]              # f[0,-1]  = f[1,1]
            corner[nx - 3, ny - 3] += m[-1, 0]    # f[-1,0]  = f[-2,-2]
            corner[nx - 3, 0] += m[-1, -1]        # f[-1,-1] = f[-2,1]
            m[0, 0] = m[0, -1] = m[-1, 0] = m[-1, -1] = 0.0
        # fold x ghost columns first
        w1 = m[1:-1].copy()                                # [nxi, ny]
        w1[(nx - 3) if bx == 'periodic' else 0] += m[0]
        w1[0 if bx == 'periodic' else (nx - 3)] += m[-1]
        # then y ghost rows
        w2 = w1[:, 1:-1].copy()                            # [nxi, nyi]
        w2[:, (ny - 3) if by == 'periodic' else 0] += w1[:, 0]
        w2[:, 0 if by == 'periodic' else (ny - 3)] += w1[:, -1]
        return w2 + corner

    def _simulate_fn(self, nt, target_courant):
        """Build (and cache) the shard_map'd nt-step program (a fresh closure
        per run() would recompile the whole scan every call)."""
        key = (nt, target_courant)
        if key in self._compiled:
            return self._compiled[key]
        wld = self.world
        ax_x, ax_y = self.ax_x, self.ax_y
        shard2 = P(ax_x, ax_y)
        geom = P(ax_x, ax_y, None, None)
        rep = P()
        spec_in = (shard2, shard2, shard2, rep, rep, rep, geom, geom, shard2,
                   rep, rep, rep, rep, rep, rep, rep, shard2, shard2)
        body = make_sharded_step_2d(ax_x, ax_y, solver=self.solver,
                                    linear=wld.linear,
                                    bx=wld.boundary_type['x'],
                                    by=wld.boundary_type['y'],
                                    wind_type=wld.wind_type,
                                    target_courant=target_courant)

        @jax.jit
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

        self._compiled[key] = simulate
        return simulate

    def run(self, nt, target_courant=0.1):
        wld = self.world
        d = wld.dtype
        simulate = self._simulate_fn(nt, target_courant)
        st = wld.state
        h, u, v, t, dt, ok = simulate(
            st.h[1:-1, 1:-1], st.u[1:-1, 1:-1], st.v[1:-1, 1:-1], st.t,
            jnp.asarray(wld.dt_0, d), st.dt, self.f_cor_pad, self.h_base_pad,
            self.r_int, jnp.asarray(wld.g, d), jnp.asarray(wld.h_mean, d),
            jnp.asarray(wld.dx, d), jnp.asarray(wld.dy, d), self.wind_gamma,
            self.wind_tau0, self.wind_fluct, self.east_w, self.west_w)
        pad = ((1, 1), (1, 1))
        # device-side padding: host round trips cost ~25 ms per sync on axon
        h_full = jnp.pad(h, pad, mode='edge')
        u_full = jnp.pad(u, pad, mode='edge')
        v_full = jnp.pad(v, pad, mode='edge')
        h_full, u_full, v_full = sw.apply_boundary_conditions(
            h_full, u_full, v_full, wld.boundary_type['x'],
            wld.boundary_type['y'])
        wld._state = st.replace(h=h_full.astype(d), u=u_full.astype(d),
                                v=v_full.astype(d), t=t, dt=dt, ok=st.ok & ok)
        if not bool(ok):
            raise ValueError('time step very small')
        return wld._state
