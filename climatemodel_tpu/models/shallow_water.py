"""2-D shallow-water dynamics on a beta plane, TPU-native.

Re-design of the reference ``ShallowWater``
(/root/reference/Model/dynamics/shallow_water.py:10-828): conservative form
U = (h, uh, vh), four FV/FD schemes (ops/stencils.py), ghost-cell boundary
conditions, CFL time-step control, orography, the full scenario library
(uniform/sinusoidal/jet zonal flows, height gaussian/step, El Nino with the
Bjerknes wind feedback closure), and Rayleigh damping with sponge walls.

TPU mapping: the whole ``time_step`` body — CFL reduction, scheme stencil,
damping, wind feedback, boundary conditions — is one jit-compiled function of an
immutable state pytree; long runs use ``lax.scan`` over it so the entire
simulation is a single XLA program with state resident in HBM.  All
forcing/geometry (Coriolis field, orography, damping, wind-closure masks)
enters as a dynamic pytree, so parameter changes never retrace.  For multi-chip
runs the same step body is wrapped in ``shard_map`` with halo exchange
(climatemodel_tpu.parallel.halo).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from ..constants import g as g_earth
from ..ops import stencils


# --------------------------------------------------------------------------
# State / parameter pytrees
# --------------------------------------------------------------------------

@struct.dataclass
class SWState:
    """Shallow-water prognostic state pytree (ghost cells included)."""
    h: jnp.ndarray          # [nx, ny] fluid depth (incl. ghost cells)
    u: jnp.ndarray          # [nx, ny] zonal velocity
    v: jnp.ndarray          # [nx, ny] meridional velocity
    t: jnp.ndarray          # scalar time (s)
    dt: jnp.ndarray         # scalar current time step (s)
    ok: jnp.ndarray         # scalar bool: False once dt < 10 s (abort flag)


@struct.dataclass
class SWParams:
    """Dynamic inputs of the compiled step (changing these never retraces)."""
    f_coriolis: jnp.ndarray   # [nx, ny]
    h_base: jnp.ndarray       # [nx, ny] orography
    r: jnp.ndarray            # [nx, ny] Rayleigh damping coefficient
    g: jnp.ndarray            # scalar gravity
    h_mean: jnp.ndarray       # scalar mean depth (linear mode)
    dt_0: jnp.ndarray         # scalar initial/maximum time step
    dx: jnp.ndarray
    dy: jnp.ndarray
    # El Nino wind closure (ignored unless wind_type != None):
    wind_gamma: jnp.ndarray           # Bjerknes feedback strength
    wind_initial_tau: jnp.ndarray     # initial tau/h
    wind_seasonal_fluct: jnp.ndarray  # seasonal oscillation magnitude
    east_mask: jnp.ndarray            # [nx, ny] averaging mask (east boundary)
    west_mask: jnp.ndarray            # [nx, ny] averaging mask (west boundary)


# --------------------------------------------------------------------------
# Physics closures (shallow_water.py:446-578)
# --------------------------------------------------------------------------

def get_conservative_form(h, u, v, linear):
    """Stack (h, u, v) into U = [h, hu, hv] (or [h, u, v] linearised),
    shallow_water.py:457-468."""
    if linear:
        return jnp.stack([h, u, v])
    return jnp.stack([h, h * u, h * v])


def get_physical_values(U, linear):
    """Invert :func:`get_conservative_form`: U -> (h, u, v)."""
    h = U[0]
    if linear:
        return h, U[1], U[2]
    return h, U[1] / h, U[2] / h


def make_flux_x(g, h_mean, linear):
    """x-direction flux F(U) closure (shallow_water.py:471-489)."""
    def flux_x(U):
        if linear:
            return jnp.stack([h_mean * U[1], g * U[0], jnp.zeros_like(U[0])])
        return jnp.stack([U[1],
                          U[1] ** 2 / U[0] + 0.5 * g * U[0] ** 2,
                          U[1] * U[2] / U[0]])
    return flux_x


def make_flux_y(g, h_mean, linear):
    """y-direction flux G(U) closure (shallow_water.py:492-510)."""
    def flux_y(U):
        if linear:
            return jnp.stack([h_mean * U[2], jnp.zeros_like(U[0]), g * U[0]])
        return jnp.stack([U[2],
                          U[1] * U[2] / U[0],
                          U[2] ** 2 / U[0] + 0.5 * g * U[0] ** 2])
    return flux_y


def make_source(g, f_coriolis, h_base, dx, dy, linear):
    """Coriolis + orography-gradient source Q(U) on the interior
    (shallow_water.py:555-578)."""
    dhbase_dx = stencils.centered_diff_x(h_base, dx)
    dhbase_dy = stencils.centered_diff_y(h_base, dy)
    f_int = f_coriolis[1:-1, 1:-1]

    def source(U):
        h, u, v = get_physical_values(U[:, 1:-1, 1:-1], linear)
        Q1 = f_int * v - g * dhbase_dx
        Q2 = -f_int * u - g * dhbase_dy
        if not linear:
            Q1 = h * Q1
            Q2 = h * Q2
        return jnp.stack([jnp.zeros_like(Q1), Q1, Q2])
    return source


def make_jacobian_x(g):
    """Flux-Jacobian A = dF/dU closure for lax_wendroff."""
    def jacobian_x(U):
        """A = dF/dU [nx, ny, 3, 3], nonlinear only (shallow_water.py:519-535)."""
        nx, ny = U.shape[1], U.shape[2]
        A = jnp.zeros((nx, ny, 3, 3), U.dtype)
        A = A.at[:, :, 1, 0].set(-U[2] ** 2 / U[0] ** 2 + g * U[0])
        A = A.at[:, :, 2, 0].set(-U[1] * U[2] / U[0] ** 2)
        A = A.at[:, :, 0, 1].set(1.0)
        A = A.at[:, :, 1, 1].set(2 * U[1] / U[0])
        A = A.at[:, :, 2, 1].set(U[2] / U[0])
        A = A.at[:, :, 2, 2].set(U[1] / U[0])
        return A
    return jacobian_x


def make_jacobian_y(g):
    """Flux-Jacobian B = dG/dU closure for lax_wendroff."""
    def jacobian_y(U):
        """B = dG/dU (shallow_water.py:537-553)."""
        nx, ny = U.shape[1], U.shape[2]
        B = jnp.zeros((nx, ny, 3, 3), U.dtype)
        B = B.at[:, :, 1, 0].set(-U[1] * U[2] / U[0] ** 2)
        B = B.at[:, :, 2, 0].set(-U[2] ** 2 / U[0] ** 2 + g * U[0])
        B = B.at[:, :, 1, 1].set(U[2] / U[0])
        B = B.at[:, :, 0, 2].set(1.0)
        B = B.at[:, :, 1, 2].set(U[1] / U[0])
        B = B.at[:, :, 2, 2].set(2 * U[2] / U[0])
        return B
    return jacobian_y


# --------------------------------------------------------------------------
# Boundary conditions (shallow_water.py:393-444)
# --------------------------------------------------------------------------

def apply_boundary_conditions(h, u, v, bx='periodic', by='walls'):
    """Ghost-cell boundary conditions, x block then y block exactly like the
    reference (corner handling included)."""
    h, u, v = jnp.asarray(h), jnp.asarray(u), jnp.asarray(v)
    if bx == 'periodic':
        def per_x(f):
            f = f.at[0, 1:-1].set(f[-2, 1:-1])
            f = f.at[0, 0].set(f[-2, 1])
            f = f.at[0, -1].set(f[-2, -2])
            f = f.at[-1, 1:-1].set(f[1, 1:-1])
            f = f.at[-1, 0].set(f[1, 1])
            f = f.at[-1, -1].set(f[1, -2])
            return f
        h, u, v = per_x(h), per_x(u), per_x(v)
    elif bx == 'walls':
        u = u.at[0, :].set(0.0).at[-1, :].set(0.0)
        for name in ('h', 'v'):
            f = h if name == 'h' else v
            f = f.at[0, :].set(f[1, :]).at[-1, :].set(f[-2, :])
            if name == 'h':
                h = f
            else:
                v = f

    if by == 'periodic':
        def per_y(f):
            f = f.at[1:-1, 0].set(f[1:-1, -2])
            f = f.at[0, 0].set(f[1, -2])
            f = f.at[-1, 0].set(f[-2, -2])
            f = f.at[1:-1, -1].set(f[1:-1, 1])
            f = f.at[0, -1].set(f[1, 1])
            f = f.at[-1, -1].set(f[-2, -1])
            return f
        h, u, v = per_y(h), per_y(u), per_y(v)
    elif by == 'walls':
        v = v.at[:, 0].set(0.0).at[:, -1].set(0.0)
        for name in ('h', 'u'):
            f = h if name == 'h' else u
            f = f.at[:, 0].set(f[:, 1]).at[:, -1].set(f[:, -2])
            if name == 'h':
                h = f
            else:
                u = f
    return h, u, v


# (frame-path boundary conditions live inside the Pallas kernel —
# ops/pallas_stencils.py writes the final ghost values with the band output)


# --------------------------------------------------------------------------
# El Nino wind closure (shallow_water.py:272-308, 727-766)
# --------------------------------------------------------------------------

def masked_mean(field, mask):
    """Mean of field over mask>0 cells (pad regions can never poison
    the sum)."""
    # where (not multiply) so undefined values outside the mask — the pad
    # regions of padded-frame fields — can never poison the sum
    return jnp.sum(jnp.where(mask > 0, field, 0)) / jnp.sum(mask)


def east_west_thickness(h, params: SWParams, east_mask=None, west_mask=None):
    """Mean thermocline depth near the east/west boundaries
    (shallow_water.py:738-766); masks may be overridden (padded-frame path)."""
    east_mask = params.east_mask if east_mask is None else east_mask
    west_mask = params.west_mask if west_mask is None else west_mask
    return masked_mean(h, east_mask), masked_mean(h, west_mask)


def seasonal_wind(params: SWParams, t):
    """Annual sinusoid about the initial wind (shallow_water.py:727-736)."""
    t_year = 365 * 24 * 60 ** 2
    return params.wind_initial_tau + params.wind_seasonal_fluct * \
        jnp.sin(t * 2 * jnp.pi / t_year)


def atmosphere_wind(params: SWParams, h_bc, t, wind_type, east_mask=None,
                    west_mask=None):
    """tau/h_mean wind stress for the u equation (shallow_water.py:272-308).
    ``h_bc`` must already satisfy the boundary conditions."""
    if wind_type is None or wind_type == 'unforced':
        return jnp.asarray(0.0, h_bc.dtype)
    if wind_type == 'seasonal':
        return seasonal_wind(params, t)
    h_east, h_west = east_west_thickness(h_bc, params, east_mask, west_mask)
    forced = params.wind_gamma * (h_east - h_west)
    if wind_type == 'seasonal_forced':
        return forced + seasonal_wind(params, t) - params.wind_initial_tau
    if wind_type == 'forced':
        return forced
    raise ValueError(f"wind type {wind_type!r} not valid")


# --------------------------------------------------------------------------
# The compiled step
# --------------------------------------------------------------------------

# row_geometry is accepted for _step_kwargs compatibility but NOT static:
# sw_step never reads it (only the frame path in sw_simulate does), and a
# static unused flag would compile two identical programs per configuration
@functools.partial(jax.jit, static_argnames=('solver', 'linear', 'bx', 'by',
                                             'wind_type', 'target_courant',
                                             'flat_orography'))
def sw_step(state: SWState, params: SWParams, solver='richtmyer', linear=False,
            bx='periodic', by='walls', wind_type=None, target_courant=0.1,
            flat_orography=False, row_geometry=False):
    """One shallow-water time step (shallow_water.py:339-373)."""
    h, u, v = state.h, state.u, state.v
    # CFL control after the first step (shallow_water.py:321-337)
    max_u = jnp.sqrt(jnp.max(u ** 2 + v ** 2))
    dt_cfl = jnp.minimum(params.dt_0,
                         target_courant * jnp.minimum(params.dx, params.dy)
                         / max_u)
    dt = jnp.where(state.t > 0, dt_cfl, state.dt)
    ok = state.ok & (dt >= 10.0)

    if solver == 'richtmyer_pallas':
        if linear:
            raise ValueError('richtmyer_pallas supports the nonlinear '
                             'equations only (use richtmyer for linear=True)')
        # fused Pallas TPU kernel: one HBM pass per step including damping and
        # the abort freeze (ops/pallas_stencils)
        from ..ops.pallas_stencils import richtmyer_step_interior
        # flat orography: skip the two gradient field reads entirely (the
        # jnp path's "- g * 0" source terms are exact no-ops)
        dhb_dx = None if flat_orography else \
            stencils.centered_diff_x(params.h_base, params.dx)
        dhb_dy = None if flat_orography else \
            stencils.centered_diff_y(params.h_base, params.dy)
        # interpret mode resolves per EXECUTING platform (never compile
        # Mosaic for a CPU-placed step in a TPU-default process, and never
        # silently interpret on a TPU-placed step in a CPU-default one)
        kern = lambda interp: (lambda *a: richtmyer_step_interior(
            *a, interpret=interp))
        hi, ui, vi, _max2 = jax.lax.platform_dependent(
            h, u, v, params.f_coriolis[1:-1, 1:-1], params.r[1:-1, 1:-1],
            dhb_dx, dhb_dy, dt, ok, params.g, params.dx, params.dy,
            tpu=kern(False), default=kern(True))
        h_new = h.at[1:-1, 1:-1].set(hi)
        u_new = u.at[1:-1, 1:-1].set(ui)
        v_new = v.at[1:-1, 1:-1].set(vi)
        # wind + boundary conditions (damping/freeze already fused; BCs
        # recompute ghosts from the frozen interior, so the freeze holds)
        if wind_type is not None:
            h_for_wind = apply_boundary_conditions(h_new, u_new, v_new,
                                                   bx, by)[0]
            wind = atmosphere_wind(params, h_for_wind, state.t, wind_type)
            u_new = u_new + jnp.where(ok, wind * dt, jnp.zeros_like(dt))
        h_new, u_new, v_new = apply_boundary_conditions(h_new, u_new, v_new,
                                                        bx, by)
        return state.replace(h=h_new, u=u_new, v=v_new, t=state.t + dt,
                             dt=dt, ok=ok)
    flux_x = make_flux_x(params.g, params.h_mean, linear)
    flux_y = make_flux_y(params.g, params.h_mean, linear)
    source = make_source(params.g, params.f_coriolis, params.h_base,
                         params.dx, params.dy, linear)
    U = get_conservative_form(h, u, v, linear)
    if solver == 'lax_wendroff':
        U = stencils.lax_wendroff(U, flux_x, flux_y, source, dt, params.dx,
                                  params.dy, [0], h.shape[0], h.shape[1],
                                  make_jacobian_x(params.g),
                                  make_jacobian_y(params.g))
    else:
        U = stencils.SCHEMES[solver](U, flux_x, flux_y, source, dt, params.dx,
                                     params.dy, [0])
    h_new, u_new, v_new = get_physical_values(U, linear)
    return _finish_step(state, params, h, u, v, h_new, u_new, v_new, dt, ok,
                        bx, by, wind_type)


def _finish_step(state, params, h, u, v, h_new, u_new, v_new, dt, ok, bx, by,
                 wind_type):
    """Damping, wind feedback, boundary conditions, abort freeze
    (shallow_water.py:362-373)."""
    # Rayleigh damping against the *pre-step* velocities (shallow_water.py:362-363)
    u_new = u_new - params.r * dt * u
    v_new = v_new - params.r * dt * v
    if wind_type is not None:
        h_for_wind = apply_boundary_conditions(h_new, u_new, v_new, bx, by)[0]
        wind = atmosphere_wind(params, h_for_wind, state.t, wind_type)
        u_new = u_new + wind * dt
    h_new, u_new, v_new = apply_boundary_conditions(h_new, u_new, v_new, bx, by)
    # freeze the state if the step failed (dt too small): host raises
    h_new = jnp.where(ok, h_new, h)
    u_new = jnp.where(ok, u_new, u)
    v_new = jnp.where(ok, v_new, v)
    return state.replace(h=h_new, u=u_new, v=v_new, t=state.t + dt, dt=dt, ok=ok)


def _use_frame_path(state, solver):
    from ..ops.pallas_stencils import frame_supports
    return solver == 'richtmyer_pallas' and frame_supports(*state.h.shape)


def _frame_constants(state, params, flat_orography, row_geometry):
    """Loop-invariant padded-frame inputs, hoisted out of the scan by XLA.

    ``row_geometry=True`` passes the Coriolis and damping fields as single
    rows (both are y-only functions in every reference scenario — f = f0 +
    beta*y, sponge damping varies with |y|), saving two full-field HBM reads
    per kernel step."""
    from ..ops.pallas_stencils import pad_frame
    dhb_dx = None if flat_orography else \
        stencils.centered_diff_x(params.h_base, params.dx)
    dhb_dy = None if flat_orography else \
        stencils.centered_diff_y(params.h_base, params.dy)
    if row_geometry:
        r_int = params.r[1:2, 1:-1]
        fcor_int = params.f_coriolis[1:2, 1:-1]
    else:
        r_int = params.r[1:-1, 1:-1]
        fcor_int = params.f_coriolis[1:-1, 1:-1]
    return (r_int, pad_frame(params.east_mask), pad_frame(params.west_mask),
            fcor_int, dhb_dx, dhb_dy)


def sw_step_frame(state: SWState, max2, params: SWParams, extras, bx, by,
                  wind_type, target_courant, nx, ny):
    """sw_step on padded-frame state (richtmyer_pallas only): identical
    arithmetic, zero per-step pad/relayout traffic.  Damping, abort freeze,
    boundary conditions and the CFL max-speed statistic are all fused into the
    kernel; ``max2`` carries max(u^2+v^2) of the current state so the CFL
    controller (shallow_water.py:321-337) costs no field reads.  Pad regions
    of the frame hold undefined values between steps; every reduction below
    reads only the interior window."""
    from ..ops.pallas_stencils import FRAME_LANE0, FRAME_ROW0, \
        richtmyer_step_frame
    r_int, east_f, west_f, fcor_int, dhb_dx, dhb_dy = extras
    h, u, v = state.h, state.u, state.v
    max_u = jnp.sqrt(max2)
    dt_cfl = jnp.minimum(params.dt_0,
                         target_courant * jnp.minimum(params.dx, params.dy)
                         / max_u)
    dt = jnp.where(state.t > 0, dt_cfl, state.dt)
    ok = state.ok & (dt >= 10.0)

    # interpret mode resolves per EXECUTING platform (see sw_step)
    kern = lambda interp: (lambda *a: richtmyer_step_frame(
        *a, nx, ny, bx=bx, by=by, interpret=interp))
    h_new, u_new, v_new, max2_k = jax.lax.platform_dependent(
        h, u, v, fcor_int, r_int, dhb_dx, dhb_dy, dt, ok, params.g,
        params.dx, params.dy, tpu=kern(False), default=kern(True))

    if wind_type is not None:
        # kernel outputs are fully boundary-conditioned: the masked means can
        # read h_new directly (shallow_water.py:364-366 wind after BCs on h)
        wind = atmosphere_wind(params, h_new, state.t, wind_type,
                               east_mask=east_f, west_mask=west_f)
        u_new = u_new + jnp.where(ok, wind * dt, jnp.zeros_like(dt))
        gt, gb = FRAME_ROW0 - 1, FRAME_ROW0 + nx - 2
        if bx == 'walls':
            # the uniform wind add broke the zero x-wall u ghosts; restore
            # them (reference order: wind -> BCs, shallow_water.py:364-370)
            u_new = u_new.at[gt, :].set(0.0).at[gb, :].set(0.0)
            if by == 'periodic':
                # per_y corner writes read interior values (wind included)
                r0, rN = FRAME_ROW0, FRAME_ROW0 + nx - 3
                l0, lN = FRAME_LANE0, FRAME_LANE0 + ny - 3
                gl, gr = FRAME_LANE0 - 1, FRAME_LANE0 + ny - 2
                u_new = u_new.at[gt, gl].set(u_new[r0, lN])
                u_new = u_new.at[gt, gr].set(u_new[r0, l0])
                u_new = u_new.at[gb, gl].set(u_new[rN, lN])
                u_new = u_new.at[gb, gr].set(u_new[rN, l0])
        # wind changed u: recompute the CFL statistic over the new interior
        # (ghost values only replicate interior cells or are zero, so the
        # interior max equals the reference's full-array max)
        ui = u_new[FRAME_ROW0:FRAME_ROW0 + nx - 2,
                   FRAME_LANE0:FRAME_LANE0 + ny - 2]
        vi = v_new[FRAME_ROW0:FRAME_ROW0 + nx - 2,
                   FRAME_LANE0:FRAME_LANE0 + ny - 2]
        max2_new = jnp.max(ui * ui + vi * vi)
    else:
        max2_new = max2_k
    return state.replace(h=h_new, u=u_new, v=v_new, t=state.t + dt, dt=dt,
                         ok=ok), max2_new


@functools.partial(jax.jit, static_argnames=('solver', 'linear', 'bx', 'by',
                                             'wind_type', 'target_courant',
                                             'n_steps', 'flat_orography',
                                             'row_geometry'))
def sw_simulate(state: SWState, params: SWParams, n_steps, solver='richtmyer',
                linear=False, bx='periodic', by='walls', wind_type=None,
                target_courant=0.1, flat_orography=False, row_geometry=False):
    """n_steps fused into one lax.scan: the whole run is a single XLA program."""
    if solver == 'richtmyer_pallas' and linear:
        raise ValueError('richtmyer_pallas supports the nonlinear equations '
                         'only (use richtmyer for linear=True)')
    if _use_frame_path(state, solver):
        from ..ops.pallas_stencils import pad_frame, unpad_frame
        nx, ny = state.h.shape
        extras = _frame_constants(state, params, flat_orography,
                                  row_geometry)
        max2 = jnp.max(state.u ** 2 + state.v ** 2)
        st = state.replace(h=pad_frame(state.h), u=pad_frame(state.u),
                           v=pad_frame(state.v))

        def fbody(carry, _):
            st, m2 = carry
            st, m2 = sw_step_frame(st, m2, params, extras, bx, by, wind_type,
                                   target_courant, nx, ny)
            return (st, m2), None
        (st, _), _ = lax.scan(fbody, (st, max2), None, length=n_steps)
        return st.replace(h=unpad_frame(st.h, nx, ny),
                          u=unpad_frame(st.u, nx, ny),
                          v=unpad_frame(st.v, nx, ny))

    def body(st, _):
        return sw_step(st, params, solver=solver, linear=linear, bx=bx, by=by,
                       wind_type=wind_type, target_courant=target_courant,
                       flat_orography=flat_orography,
                       row_geometry=row_geometry), None
    state, _ = lax.scan(body, state, None, length=n_steps)
    return state


@functools.partial(jax.jit, static_argnames=('solver', 'linear', 'bx', 'by',
                                             'wind_type', 'target_courant',
                                             'n_snaps', 'steps_per_snap',
                                             'flat_orography', 'row_geometry'))
def sw_simulate_snapshots(state: SWState, params: SWParams, n_snaps,
                          steps_per_snap, solver='richtmyer', linear=False,
                          bx='periodic', by='walls', wind_type=None,
                          target_courant=0.1, flat_orography=False,
                          row_geometry=False):
    """Run n_snaps * steps_per_snap steps, stacking (t, h, u, v) snapshots every
    steps_per_snap steps — the scan-native replacement of data_dict appends."""
    if solver == 'richtmyer_pallas' and linear:
        raise ValueError('richtmyer_pallas supports the nonlinear equations '
                         'only (use richtmyer for linear=True)')
    if _use_frame_path(state, solver):
        from ..ops.pallas_stencils import pad_frame, unpad_frame
        nx, ny = state.h.shape
        extras = _frame_constants(state, params, flat_orography,
                                  row_geometry)
        max2 = jnp.max(state.u ** 2 + state.v ** 2)
        st0 = state.replace(h=pad_frame(state.h), u=pad_frame(state.u),
                            v=pad_frame(state.v))

        def finner(carry, _):
            st, m2 = carry
            st, m2 = sw_step_frame(st, m2, params, extras, bx, by, wind_type,
                                   target_courant, nx, ny)
            return (st, m2), None

        def fouter(carry, _):
            carry, _ = lax.scan(finner, carry, None, length=steps_per_snap)
            st = carry[0]
            return carry, (st.t, unpad_frame(st.h, nx, ny),
                           unpad_frame(st.u, nx, ny),
                           unpad_frame(st.v, nx, ny))

        (st, _), snaps = lax.scan(fouter, (st0, max2), None, length=n_snaps)
        st = st.replace(h=unpad_frame(st.h, nx, ny),
                        u=unpad_frame(st.u, nx, ny),
                        v=unpad_frame(st.v, nx, ny))
        return st, snaps

    def inner(st, _):
        return sw_step(st, params, solver=solver, linear=linear, bx=bx, by=by,
                       wind_type=wind_type, target_courant=target_courant,
                       flat_orography=flat_orography,
                       row_geometry=row_geometry), None

    def outer(st, _):
        st, _ = lax.scan(inner, st, None, length=steps_per_snap)
        return st, (st.t, st.h, st.u, st.v)

    state, snaps = lax.scan(outer, state, None, length=n_snaps)
    return state, snaps


# --------------------------------------------------------------------------
# User-facing model
# --------------------------------------------------------------------------

class ShallowWater:
    """Reference-parity shallow-water model (shallow_water.py:10-89 ctor API)."""

    def __init__(self, nx, ny, dx, dy, dt, f_0, beta, orography_info=None,
                 initial_info=None, boundary_type=None,
                 numerical_solver='richtmyer', r=0, g=g_earth, linear=False,
                 noise_seed=None, dtype=None):
        self.nx, self.ny = int(nx), int(ny)
        self.dx, self.dy = float(dx), float(dy)
        self.dt_0 = float(dt)
        self.g = float(g)
        self.linear = bool(linear)
        if numerical_solver not in tuple(stencils.SCHEMES) + ('richtmyer_pallas',):
            raise ValueError(f'unknown solver {numerical_solver!r}')
        if numerical_solver == 'richtmyer_pallas' and linear:
            raise ValueError('richtmyer_pallas supports the nonlinear '
                             'equations only')
        if numerical_solver == 'richtmyer_pallas':
            from ..ops.pallas_stencils import supports as _pallas_supports
            if not _pallas_supports(int(nx), int(ny)):
                import warnings
                warnings.warn(
                    f'grid ({nx}, {ny}) has no multiple-of-8 interior row '
                    'divisor for the Pallas kernel; falling back to the jnp '
                    'richtmyer solver')
                numerical_solver = 'richtmyer'
        self.numerical_solver = numerical_solver
        self.orography_info = orography_info
        self.initial_info = initial_info
        if boundary_type is None:
            boundary_type = {'x': 'periodic', 'y': 'walls'}
        self.boundary_type = boundary_type
        self.dtype = dtype or jnp.zeros(0).dtype
        self._noise_seed = noise_seed

        x = np.arange(nx) * dx
        x = x - x.mean()
        y = np.arange(ny) * dy
        y = y - y.mean()
        self.Y, self.X = np.meshgrid(y, x)     # [nx, ny]
        # sponge-wall damping (shallow_water.py:78-81)
        self.r = np.ones((nx, ny)) * r
        if boundary_type.get('y') == 'walls' and 'y_walls_damp' in boundary_type:
            border = np.abs(self.Y[0]) >= boundary_type['y_walls_damp']['dist_thresh']
            self.r[:, border] = boundary_type['y_walls_damp']['r']
        self.f_0 = float(f_0)
        self.beta = float(beta)
        self.f_coriolis = f_0 + beta * self.Y
        self.h_base = self.orography()
        u, v, h_surface = self.initial_conditions()
        self.h_surface = h_surface
        h = h_surface - self.h_base
        h, u, v = (np.asarray(a) for a in apply_boundary_conditions(
            jnp.asarray(h), jnp.asarray(u), jnp.asarray(v),
            boundary_type['x'], boundary_type['y']))
        self.h_mean = float(h.mean())

        self._state = SWState(
            h=jnp.asarray(h, self.dtype), u=jnp.asarray(u, self.dtype),
            v=jnp.asarray(v, self.dtype), t=jnp.asarray(0.0, self.dtype),
            dt=jnp.asarray(self.dt_0, self.dtype), ok=jnp.asarray(True))

    # ------------- host-side scenario construction -------------

    def orography(self):
        """Rigid-base profile: flat / slope / mountain (shallow_water.py:101-127)."""
        info = self.orography_info
        if info is None:
            info = self.orography_info = {'type': 'flat'}
        if info['type'] == 'flat':
            return np.zeros((self.nx, self.ny))
        if info['type'] == 'slope':
            return info['max_h_base'] * (self.X - self.X.min()) / self.X.max()
        if info['type'] == 'mountain':
            return info['max_h_base'] * np.exp(
                -0.5 * ((self.X - info['x0']) / info['x_std']) ** 2
                - 0.5 * ((self.Y - info['y0']) / info['y_std']) ** 2)
        raise ValueError("orography_info['type'] not valid")

    def get_geostrophic_velocities(self, h_surface):
        """u = -(g/f) dh/dy, v = (g/f) dh/dx on the interior
        (shallow_water.py:129-141)."""
        u = np.zeros((self.nx, self.ny))
        v = np.zeros((self.nx, self.ny))
        f_int = self.f_coriolis[1:-1, 1:-1]
        u[1:-1, 1:-1] = -self.g * (h_surface[1:-1, 2:] - h_surface[1:-1, :-2]) \
            / (2 * self.dy) / f_int
        v[1:-1, 1:-1] = self.g * (h_surface[2:, 1:-1] - h_surface[:-2, 1:-1]) \
            / (2 * self.dx) / f_int
        return u, v

    def initial_conditions(self):
        """Scenario library (shallow_water.py:143-319)."""
        info = self.initial_info
        if info is None:
            info = self.initial_info = {
                'type': 'uniform_zonal',
                'mean_h_surface': 2 * np.max(self.h_base) + 1000,
                'u_mean': 20, 'add_noise': False}
        u = np.zeros((self.nx, self.ny))
        v = np.zeros((self.nx, self.ny))
        h_surface = np.ones((self.nx, self.ny))
        kind = info['type']
        if kind == 'uniform_zonal':
            h_surface = info['mean_h_surface'] - \
                (info['u_mean'] * self.f_0 / self.g) * self.Y
            u, v = self.get_geostrophic_velocities(h_surface)
        elif kind == 'sinusoidal_zonal':
            cos_mult = 2 * info['n_periods'] * np.pi / self.Y.max()
            if self.f_0 == 0:
                h_jet_max = np.abs(self.f_coriolis).mean() * info['u_max'] / \
                    (cos_mult * self.g)
            else:
                h_jet_max = self.f_0 * info['u_max'] / (cos_mult * self.g)
            h_surface = info['mean_h_surface'] - h_jet_max * \
                np.cos((self.Y - info['y0']) * cos_mult)
            u, v = self.get_geostrophic_velocities(h_surface)
        elif kind == 'jet_zonal':
            # Bickley jet: sech^2 wind <-> tanh height (shallow_water.py:182-189)
            h_jet_max = self.f_0 * info['u_max'] * info['jet_width'] / self.g
            h_surface = info['mean_h_surface'] - h_jet_max * \
                np.tanh((self.Y - info['y0']) / info['jet_width'])
            u, v = self.get_geostrophic_velocities(h_surface)
        elif kind == 'height_gaussian':
            h_surface = info['min_h_surface'] + \
                (info['max_h_surface'] - info['min_h_surface']) * np.exp(
                    -0.5 * ((self.X - info['x0']) / info['x_std']) ** 2
                    - 0.5 * ((self.Y - info['y0']) / info['y_std']) ** 2)
        elif kind == 'height_step':
            coord = self.Y if info['direction'] == 'y' else self.X
            h_surface = np.where(coord <= info['discontinuity_pos'],
                                 info['min_h_surface'], info['max_h_surface'])
        elif kind == 'el_nino':
            h_surface = self._el_nino_initial(info)
        else:
            raise ValueError("initial_info['type'] not valid")
        if info.get('add_noise'):
            amp = max(np.mean(np.abs(np.diff(h_surface))) / 10, 1e-20)
            rng = np.random.default_rng(self._noise_seed)
            h_surface = h_surface + rng.standard_normal(self.X.shape) * amp
        if np.min(h_surface) < np.max(self.h_base):
            raise ValueError('surface height is less than floor height')
        return u, v, h_surface

    def _el_nino_initial(self, info):
        """Tilted thermocline + Bjerknes feedback wind defaults
        (shallow_water.py:211-308)."""
        x_gradient = -((info['max_h_surface'] - info['min_h_surface'])
                       / (self.X.max() - self.X.min()))
        h_surface_mean = 0.5 * (info['max_h_surface'] + info['min_h_surface'])
        h_surface = h_surface_mean + self.X * x_gradient * \
            np.exp(-0.5 * ((self.Y - 0) / info['y_std']) ** 2)
        initial_tau_over_h_guess = x_gradient * self.g

        wind = info['wind']
        for key in ('gamma', 'seasonal_fluct', 'x_average_width',
                    'y_average_width'):
            wind.setdefault(key, None)
        if wind['gamma'] is None:
            # chosen so the feedback can turn the wind eastward
            # (shallow_water.py:239-242)
            wind['gamma'] = 1.2 * abs(initial_tau_over_h_guess) / (
                info['max_h_surface'] - info['min_h_surface'])
        c = np.sqrt(self.g * h_surface_mean)
        L_def = np.sqrt(c / self.beta) if self.beta else c * 3600
        if wind['x_average_width'] is None:
            wind['x_average_width'] = 8 * L_def
        if wind['y_average_width'] is None:
            wind['y_average_width'] = 5 * L_def

        # exact initial wind from the BC-consistent initial thickness
        # (shallow_water.py:252-260)
        h = h_surface - self.h_base
        h = np.asarray(apply_boundary_conditions(
            jnp.asarray(h), jnp.zeros_like(jnp.asarray(h)),
            jnp.zeros_like(jnp.asarray(h)), self.boundary_type['x'],
            self.boundary_type['y'])[0])
        east, west = self._boundary_masks(wind['x_average_width'],
                                          wind['y_average_width'])
        h_east = h[east].mean() if east.any() else 0.0
        h_west = h[west].mean() if west.any() else 0.0
        wind['initial_tau_over_h'] = wind['gamma'] * (h_east - h_west)
        if wind['seasonal_fluct'] is None:
            if wind['type'] == 'seasonal':
                wind['seasonal_fluct'] = abs(wind['initial_tau_over_h'])
            else:
                wind['seasonal_fluct'] = abs(wind['initial_tau_over_h']) / 10
        return h_surface

    def _boundary_masks(self, x_average_width, y_average_width):
        """Boolean [nx, ny] masks for east/west boundary-strip averages
        (shallow_water.py:738-753)."""
        x_east = self.X[:, 0] >= self.X.max() - x_average_width
        x_west = self.X[:, 0] <= self.X.min() + x_average_width
        y_in = np.abs(self.Y[0]) <= y_average_width / 2
        east = x_east[:, None] & y_in[None, :]
        west = x_west[:, None] & y_in[None, :]
        return east, west

    # ------------- compiled-step plumbing -------------

    @property
    def wind_type(self):
        if self.initial_info.get('type') == 'el_nino':
            return self.initial_info['wind']['type']
        return None

    @property
    def params(self) -> SWParams:
        """Device-resident forcing/geometry pytree; cached — the grid geometry
        is immutable after construction, and re-uploading the [nx, ny] arrays
        on every access dominates wall time on a tunneled accelerator.  Call
        invalidate_params() after mutating geometry attributes by hand."""
        if getattr(self, '_params_cache', None) is not None:
            return self._params_cache
        self._params_cache = self._build_params()
        return self._params_cache

    def invalidate_params(self):
        self._params_cache = None

    def _build_params(self) -> SWParams:
        d = self.dtype
        if self.wind_type is not None:
            w = self.initial_info['wind']
            east, west = self._boundary_masks(w['x_average_width'],
                                              w['y_average_width'])
            gamma = w['gamma']
            tau0 = w['initial_tau_over_h']
            fluct = w['seasonal_fluct']
        else:
            east = west = np.zeros((self.nx, self.ny), bool)
            gamma = tau0 = fluct = 0.0
        return SWParams(
            f_coriolis=jnp.asarray(self.f_coriolis, d),
            h_base=jnp.asarray(self.h_base, d),
            r=jnp.asarray(self.r, d),
            g=jnp.asarray(self.g, d), h_mean=jnp.asarray(self.h_mean, d),
            dt_0=jnp.asarray(self.dt_0, d),
            dx=jnp.asarray(self.dx, d), dy=jnp.asarray(self.dy, d),
            wind_gamma=jnp.asarray(gamma, d),
            wind_initial_tau=jnp.asarray(tau0, d),
            wind_seasonal_fluct=jnp.asarray(fluct, d),
            east_mask=jnp.asarray(east, d), west_mask=jnp.asarray(west, d))

    @property
    def state(self) -> SWState:
        return self._state

    @property
    def h(self):
        return np.asarray(self._state.h)

    @property
    def u(self):
        return np.asarray(self._state.u)

    @property
    def v(self):
        return np.asarray(self._state.v)

    @property
    def dt(self):
        return float(self._state.dt)

    def _step_kwargs(self, target_courant=0.1):
        # the Coriolis and damping fields are y-only functions in every
        # reference scenario; when exactly row-constant the frame kernel
        # reads them as single rows (two full-field HBM reads saved per step)
        row_geometry = bool(
            np.array_equal(self.r, np.broadcast_to(self.r[:1], self.r.shape))
            and np.array_equal(self.f_coriolis,
                               np.broadcast_to(self.f_coriolis[:1],
                                               self.f_coriolis.shape)))
        return dict(solver=self.numerical_solver, linear=self.linear,
                    bx=self.boundary_type['x'], by=self.boundary_type['y'],
                    wind_type=self.wind_type, target_courant=target_courant,
                    flat_orography=self.orography_info['type'] == 'flat',
                    row_geometry=row_geometry)

    def boundary_conditions(self, h, u, v):
        """Reference-parity helper (shallow_water.py:393-444)."""
        out = apply_boundary_conditions(jnp.asarray(h), jnp.asarray(u),
                                        jnp.asarray(v), self.boundary_type['x'],
                                        self.boundary_type['y'])
        return tuple(np.asarray(a) for a in out)

    # ------------- stepping -------------

    def time_step(self, t, data_dict=None, save_every=0.1, target_courant=0.1):
        """One step with reference data_dict semantics (shallow_water.py:339-373)."""
        if data_dict is None:
            data_dict = {'t': [t], 'h': [self.h], 'u': [self.u], 'v': [self.v]}
        self._state = self._state.replace(t=jnp.asarray(t, self.dtype))
        self._state = sw_step(self._state, self.params,
                              **self._step_kwargs(target_courant))
        # batch the scalar pulls (each separate sync is a tunnel round trip);
        # the field pull happens only on saving steps
        ok_np, t_np, dt_np = jax.device_get(
            (self._state.ok, self._state.t, self._state.dt))
        if not bool(ok_np):
            raise ValueError('time step very small')
        t = float(t_np)
        if np.divmod(t, save_every)[1] < float(dt_np):
            h_np, u_np, v_np = jax.device_get(
                (self._state.h, self._state.u, self._state.v))
            data_dict['t'].append(t)
            data_dict['h'].append(np.asarray(h_np))
            data_dict['u'].append(np.asarray(u_np))
            data_dict['v'].append(np.asarray(v_np))
        return t, data_dict

    def save_data(self, data_dict, t):
        data_dict['t'].append(t)
        data_dict['h'].append(self.h)
        data_dict['u'].append(self.u)
        data_dict['v'].append(self.v)
        return data_dict

    def run(self, n_days=None, nt=None, save_every=None, target_courant=0.1,
            snapshots=True):
        """Run the simulation as fused lax.scan programs.

        :param n_days: simulated days (nt = fix(n_days*86400/dt_0)+1, the
            reference driver convention, shallow_script.py:124-125).
        :param save_every: approximate save interval (s); snapshots are taken
            every round(save_every/dt_0) steps.
        :return: data_dict with stacked arrays 't', 'h', 'u', 'v'.
        """
        if nt is None:
            nt = int(np.fix(n_days * 24 * 60 ** 2 / self.dt_0) + 1)
        if not snapshots:
            self._state = sw_simulate(self._state, self.params, nt,
                                      **self._step_kwargs(target_courant))
            ok, t1, h1, u1, v1 = jax.device_get(     # one batched pull
                (self._state.ok, self._state.t, self._state.h,
                 self._state.u, self._state.v))
            if not bool(ok):
                raise ValueError('time step very small')
            return {'t': np.asarray([float(t1)]),
                    'h': np.asarray(h1)[None], 'u': np.asarray(u1)[None],
                    'v': np.asarray(v1)[None]}
        if save_every is None:
            steps_per_snap = 1
        else:
            steps_per_snap = max(1, int(round(save_every / self.dt_0)))
        # exactly nt steps like the reference loop: full snapshot chunks plus
        # a fused remainder (< steps_per_snap steps, no snapshot of its own)
        n_snaps = nt // steps_per_snap
        remainder = nt - n_snaps * steps_per_snap
        t0, h0, u0, v0 = jax.device_get(          # one batched pull
            (self._state.t, self._state.h, self._state.u, self._state.v))
        snaps = None
        if n_snaps:
            self._state, snaps = sw_simulate_snapshots(
                self._state, self.params, n_snaps, steps_per_snap,
                **self._step_kwargs(target_courant))
        if remainder:
            self._state = sw_simulate(self._state, self.params, remainder,
                                      **self._step_kwargs(target_courant))
        if snaps is None:
            ok, t1, h1, u1, v1 = jax.device_get(   # one batched pull
                (self._state.ok, self._state.t, self._state.h,
                 self._state.u, self._state.v))
            if not bool(ok):
                raise ValueError('time step very small')
            return {'t': np.asarray([float(t0), float(t1)]),
                    'h': np.stack([np.asarray(h0), np.asarray(h1)]),
                    'u': np.stack([np.asarray(u0), np.asarray(u1)]),
                    'v': np.stack([np.asarray(v0), np.asarray(v1)])}
        ok, (t_arr, h_arr, u_arr, v_arr) = jax.device_get(  # one batched pull
            (self._state.ok, snaps))
        if not bool(ok):
            raise ValueError('time step very small')
        return {'t': np.concatenate([[float(t0)], t_arr]),
                'h': np.concatenate([np.asarray(h0)[None], h_arr]),
                'u': np.concatenate([np.asarray(u0)[None], u_arr]),
                'v': np.concatenate([np.asarray(v0)[None], v_arr])}

    # ------------- El Nino diagnostics -------------

    def plot_animate(self, t_array, h_array, u_array, v_array, nPlotFrames=50,
                     fract_frames_at_start=0.0):
        """Height + vorticity animation with velocity quiver
        (shallow_water.py:580-725): surface height on a diverging colormap
        about the median initial height, vorticity about zero, axes normalised
        by the deformation radius."""
        import matplotlib.pyplot as plt
        from matplotlib.animation import FuncAnimation
        from mpl_toolkits.axes_grid1 import make_axes_locatable
        from ..ops.stencils import centered_diff_x, centered_diff_y

        fig, axs = plt.subplots(2, 1, sharex=True,
                                figsize=(12 + int(max(self.nx / 250 - 1, 0)),
                                         6 + int(max(self.ny / 50 - 1, 0))))
        cax1 = make_axes_locatable(axs[0]).append_axes('right', '5%', '5%')
        cax2 = make_axes_locatable(axs[1]).append_axes('right', '5%', '5%')
        interval = int(min(6, self.ny / 5, self.nx / 5))

        t_plot = np.asarray(t_array)
        h_plot = np.asarray(h_array)
        u_plot = np.asarray(u_array)
        v_plot = np.asarray(v_array)
        if t_plot.size > nPlotFrames:
            start_end = int(fract_frames_at_start * nPlotFrames)
            use_start = np.arange(0, start_end)
            use_end = np.unique(np.linspace(start_end, t_plot.size - 1,
                                            int((1 - fract_frames_at_start)
                                                * nPlotFrames),
                                            dtype=int))[1:]
            use = np.concatenate((use_start, use_end))
            t_plot, h_plot = t_plot[use], h_plot[use]
            u_plot, v_plot = u_plot[use], v_plot[use]

        # axes normalised by the deformation radius (shallow_water.py:627-634)
        c = np.sqrt(self.g * np.median(h_plot[0]))
        if self.f_0 == 0 and self.beta == 0:
            L_def = c * 3600
        elif self.f_0 != 0:
            L_def = c / self.f_0
        else:
            L_def = np.sqrt(c / self.beta)
        x = self.X[1:-1, 0] / L_def
        y = self.Y[0, 1:-1] / L_def
        h_base = self.h_base[1:-1, 1:-1]
        h_surf = h_plot[:, 1:-1, 1:-1] + h_base
        med = np.median(self.h_surface)
        dmax = np.abs(h_surf - med).max()
        h_lims = (med - dmax, med + dmax)
        vort = np.stack([np.asarray(centered_diff_x(jnp.asarray(v_plot[i]),
                                                    self.dx))
                         - np.asarray(centered_diff_y(jnp.asarray(u_plot[i]),
                                                      self.dy))
                         for i in range(t_plot.size)])
        v_lims = (-np.abs(vort).max(), np.abs(vort).max())
        min_space = min(self.dx / L_def, self.dy / L_def)
        vel_max = np.sqrt((u_plot ** 2 + v_plot ** 2).max())
        scale = min_space * interval / max(vel_max, 1e-30)

        def animate(i):
            cax1.cla()
            cax2.cla()
            axs[0].clear()
            axs[1].clear()
            im = axs[0].imshow(h_surf[i].T, extent=[x.min(), x.max(),
                                                    y.min(), y.max()],
                               cmap='bwr', origin='lower')
            fig.colorbar(im, cax=cax1).set_label('height (m)')
            if self.orography_info['type'] != 'flat':
                axs[0].contour(x, y, h_base.T, colors='g', alpha=0.25)
            u_i = u_plot[i][1:-1, 1:-1]
            v_i = v_plot[i][1:-1, 1:-1]
            axs[0].quiver(x[2::interval], y[2::interval],
                          (u_i[2::interval, 2::interval] * scale).T,
                          (v_i[2::interval, 2::interval] * scale).T,
                          scale_units='xy', scale=1, minshaft=2, pivot='mid')
            im2 = axs[1].imshow(vort[i].T, extent=[x.min(), x.max(),
                                                   y.min(), y.max()],
                                cmap='bwr', origin='lower')
            fig.colorbar(im2, cax=cax2).set_label('vorticity (s$^{-1}$)')
            im.set_clim(h_lims)
            im2.set_clim(v_lims)
            for ax in axs:
                ax.axis((x.min(), x.max(), y.min(), y.max()))
            t_days, t_hours = divmod(t_plot[i] / 3600.0, 24)
            axs[0].text(0.5, 1.01,
                        f'{t_days:.0f} Days and {t_hours:.1f} Hours',
                        horizontalalignment='center',
                        verticalalignment='bottom',
                        transform=axs[0].transAxes)

        self._animate_frame = animate    # exposed for tests
        return FuncAnimation(fig, animate, frames=t_plot.size, interval=100,
                             blit=False, repeat_delay=200)

    def el_nino_seasonal_wind(self, t):
        w = self.initial_info['wind']
        t_year = 365 * 24 * 60 ** 2
        return w['initial_tau_over_h'] + w['seasonal_fluct'] * \
            np.sin(np.asarray(t) * 2 * np.pi / t_year)

    def get_average_east_west_boundary_thickness(self, h, x_average_width,
                                                 y_average_width):
        """Mean thickness near east/west boundaries, for single fields or
        stacked time series (shallow_water.py:738-766)."""
        east, west = self._boundary_masks(x_average_width, y_average_width)
        h = np.asarray(h)
        if h.ndim == 2:
            return h[east].mean(), h[west].mean()
        flat = h.reshape(h.shape[0], -1)
        return (flat[:, east.ravel()].mean(axis=1),
                flat[:, west.ravel()].mean(axis=1))

    def el_nino_plot(self, t, h, x_average_width=None, y_average_width=None):
        """East/west thermocline + wind time-series plot
        (shallow_water.py:768-828)."""
        import matplotlib.pyplot as plt
        w = self.initial_info['wind']
        # 'is None' (not falsy-or): an explicit 0 width selects the boundary
        # column, like the reference (shallow_water.py:785-788)
        if x_average_width is None:
            x_average_width = w['x_average_width']
        if y_average_width is None:
            y_average_width = w['y_average_width']
        h_east, h_west = self.get_average_east_west_boundary_thickness(
            h, x_average_width, y_average_width)
        h_avg = np.asarray(h)[0].mean()
        t_days = np.asarray(t) / 86400.0
        fig, ax = plt.subplots(1, 1, figsize=(12, 5))
        ln1 = ax.plot(t_days, h_east, label=r'$\overline{h}_{east}$', color='b')
        ln2 = ax.plot(t_days, h_west, label=r'$\overline{h}_{west}$', color='r')
        rng = max(np.abs(h_east - h_avg).max(), np.abs(h_west - h_avg).max())
        ax.set_ylim((h_avg - rng * 1.1, h_avg + rng * 1.1))
        ax.set_ylabel('Thermocline Depth / m')
        ax.set_xlabel('Time / days')
        ax2 = ax.twinx()
        feedback = w['gamma'] * (h_east - h_west)
        if 'seasonal' in w['type']:
            seasonal = self.el_nino_seasonal_wind(np.asarray(t))
            total = feedback + seasonal - w['initial_tau_over_h']
            ln3 = ax2.plot(t_days, seasonal, 'g--', label='seasonal wind')
        else:
            total = feedback
            ln3 = ax2.plot(t_days, np.full_like(t_days,
                                                w['initial_tau_over_h']),
                           'g--', label='Initial wind')
        ln4 = ax2.plot(t_days, total, 'k--', label='total wind')
        ax2.set_ylabel(r'Wind: $\tau^x / h_{mean}$')
        lns = ln1 + ln2 + ln3 + ln4
        ax.legend(lns, [l.get_label() for l in lns], loc=0)
        return fig
