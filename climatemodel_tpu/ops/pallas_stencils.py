"""Pallas TPU kernel: fused nonlinear Richtmyer shallow-water step.

The jnp stencil path (ops/stencils.py) materialises ~20 field-sized
intermediates per step (conservative form, F/G fluxes, half-step states,
half-step fluxes, source) — HBM traffic dominates on TPU.  This kernel fuses
the whole per-step update — conservative form, both Richtmyer stages, the
Coriolis/orography source with the reference's half-time h (include_source,
numerical_methods.py:108-132), the Rayleigh damping against pre-step
velocities (shallow_water.py:362-363), the abort freeze (dt-too-small,
shallow_water.py:334), and the next step's CFL max-speed reduction
(shallow_water.py:321-337) — into ONE pass: each grid step DMAs a band of
full-width rows (with one halo row each side) of h/u/v (+ the damping field r)
from HBM into VMEM, computes entirely in VMEM, and writes the interior band of
the updated physical fields.  Per step the only HBM traffic is ~4 reads +
3 writes of the field set.  Boundary conditions and the El Niño wind stress
remain in the caller (models/shallow_water.py): ghost updates touch only the
grid perimeter, and the wind needs a global reduction of the completed step.

The band DMAs are double-buffered: while band i is being computed, band i+1's
rows are already streaming into the other scratch slot, so HBM transfer
overlaps with VPU compute instead of serialising with it.

Mosaic constrains HBM slices to the (8, 128) tile grid, so the row bands are
8-aligned: the band height TX divides the interior rows and the DMA window is
TX+8 rows starting at the 8-aligned offset i*TX (the trailing rows beyond the
halo are dead weight); inputs are padded by 6 rows once per call to keep the
last window in bounds.  The y axis is never sliced in HBM.

Flat-orography grids (h_base == const, e.g. every El Niño configuration) use a
specialised kernel variant that skips the two orography-gradient field reads
and their arithmetic — the jnp path's ``- g * 0`` terms are exact no-ops, so
results are bit-identical.  The source term uses the exact algebraic
cancellation h_mid * (f * (vh / h_mid)) == f * vh of the reference's form
(shallow_water.py:555-578 evaluates physical velocities at half-time h), which
removes one reciprocal per cell; the jnp comparison tests allow the ~1 ulp
difference.

Semantics match stencils.richtmyer + include_source + get_physical_values +
the damping/freeze lines of the step (same operations, fused).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAME_ROW0 = 8     # frame row of the first interior row (ghost row at 7)
FRAME_LANE0 = 1    # frame lane of the first interior col (ghost col at 0)

# VMEM budget for band sizing
_FRAME_VMEM_BUDGET = 12 * 2 ** 20


def _fused_update(h, u, v, dt, g, sx, sy, fcor, dhbx, dhby, r, ok):
    """Fused Richtmyer window update.

    :param h, u, v: (n+2, m+2) windows (interior + one ghost each side),
        pre-step physical fields with boundary conditions applied.
    :param fcor, dhbx, dhby, r: (n, m) interior Coriolis / orography-gradient /
        damping fields (dhbx/dhby None on flat orography).
    :param ok: scalar bool — False freezes the output at the pre-step values
        (the dt-collapse abort of shallow_water.py:334).
    :return: (h, u, v, speed2) interior (n, m) post-step physical fields
        (damped, frozen; wind NOT applied) and the max of u^2+v^2 over them.
    """
    uh = h * u
    vh = h * v
    gh2 = 0.5 * g * h * h
    F0, F1, F2 = uh, uh * u + gh2, uh * v
    G0, G1, G2 = vh, uh * v, vh * v + gh2

    # stage 1: half-step states (numerical_methods.py:68-75)
    def half_x(q, Fq):
        return (0.5 * (q[1:, 1:-1] + q[:-1, 1:-1])
                - 0.5 * sx * (Fq[1:, 1:-1] - Fq[:-1, 1:-1]))

    def half_y(q, Gq):
        return (0.5 * (q[1:-1, 1:] + q[1:-1, :-1])
                - 0.5 * sy * (Gq[1:-1, 1:] - Gq[1:-1, :-1]))

    hx0 = half_x(h, F0)
    hx1 = half_x(uh, F1)
    hx2 = half_x(vh, F2)
    hy0 = half_y(h, G0)
    hy1 = half_y(uh, G1)
    hy2 = half_y(vh, G2)

    # stage 2: half-step fluxes and conservative update
    inv_hx = 1.0 / hx0
    Fh0 = hx1
    Fh1 = hx1 * hx1 * inv_hx + 0.5 * g * hx0 * hx0
    Fh2 = hx1 * hx2 * inv_hx
    inv_hy = 1.0 / hy0
    Gh0 = hy2
    Gh1 = hy1 * hy2 * inv_hy
    Gh2 = hy2 * hy2 * inv_hy + 0.5 * g * hy0 * hy0

    def update(q, Fh, Gh):
        return (q[1:-1, 1:-1] - sx * (Fh[1:, :] - Fh[:-1, :])
                - sy * (Gh[:, 1:] - Gh[:, :-1]))

    h_new = update(h, Fh0, Gh0)
    uh_new = update(uh, Fh1, Gh1)
    vh_new = update(vh, Fh2, Gh2)

    # source at half-time h (include_source, numerical_methods.py:108-132):
    # h commits first; momenta see h_mid = (h_new + h_old)/2, old uh/vh.
    # h_mid cancels exactly against the division inside the physical
    # velocities, so the Coriolis part is just f * (vh, -uh).
    uh_w = uh[1:-1, 1:-1]
    vh_w = vh[1:-1, 1:-1]
    if dhbx is None:
        Q1 = fcor * vh_w
        Q2 = -fcor * uh_w
    else:
        h_mid = 0.5 * (h_new + h[1:-1, 1:-1])
        gh_mid = g * h_mid
        Q1 = fcor * vh_w - gh_mid * dhbx
        Q2 = -fcor * uh_w - gh_mid * dhby
    uh_new = uh_new + Q1 * dt
    vh_new = vh_new + Q2 * dt

    # physical values + Rayleigh damping against the PRE-step velocities
    # (shallow_water.py:362-363) + abort freeze
    inv_new = 1.0 / h_new
    r_dt = r * dt
    u_new = uh_new * inv_new - r_dt * u[1:-1, 1:-1]
    v_new = vh_new * inv_new - r_dt * v[1:-1, 1:-1]
    h_out = jnp.where(ok, h_new, h[1:-1, 1:-1])
    u_out = jnp.where(ok, u_new, u[1:-1, 1:-1])
    v_out = jnp.where(ok, v_new, v[1:-1, 1:-1])
    speed2 = jnp.max(u_out * u_out + v_out * v_out)
    return h_out, u_out, v_out, speed2


def _scalar_args(dt_ref, g_ref, sx_ref, sy_ref, ok_ref):
    return (dt_ref[0, 0], g_ref[0, 0], sx_ref[0, 0], sy_ref[0, 0],
            ok_ref[0, 0] != 0)


def _accumulate_max2(max2_out, speed2, i):
    @pl.when(i == 0)
    def _init():
        max2_out[0, 0] = speed2

    @pl.when(i > 0)
    def _acc():
        max2_out[0, 0] = jnp.maximum(max2_out[0, 0], speed2)


# --------------------------------------------------------------------------
# Plain-interior kernel: [nx, ny] fields with ghost cells, banded by rows
# --------------------------------------------------------------------------

def _kernel_body(dt_ref, g_ref, sx_ref, sy_ref, ok_ref, h_hbm, u_hbm, v_hbm,
                 fcor_ref, r_ref, dhbx_ref, dhby_ref, h_out, u_out, v_out,
                 max2_out, hh, uu, vv, sem, *, TX, NY, NBANDS):
    i = pl.program_id(0)

    # interior band b covers full-array rows 1+b*TX .. b*TX+TX; with one halo
    # row each side the window is rows [b*TX, b*TX+TX+1]; the DMA loads the
    # 8-aligned superset [b*TX, b*TX+TX+7].
    def band_copies(b, slot):
        row0 = pl.multiple_of(b * TX, 8)
        return [pltpu.make_async_copy(src.at[pl.ds(row0, TX + 8), :],
                                      dst.at[slot], sem.at[slot, k])
                for k, (src, dst) in enumerate(((h_hbm, hh), (u_hbm, uu),
                                                (v_hbm, vv)))]

    slot = i % 2

    @pl.when(i == 0)
    def _prefetch_first():
        for cp in band_copies(0, 0):
            cp.start()

    @pl.when(i + 1 < NBANDS)
    def _prefetch_next():
        for cp in band_copies(i + 1, (i + 1) % 2):
            cp.start()

    for cp in band_copies(i, slot):
        cp.wait()

    dt, g, sx, sy, ok = _scalar_args(dt_ref, g_ref, sx_ref, sy_ref, ok_ref)
    h = hh[slot, : TX + 2, :NY]
    u = uu[slot, : TX + 2, :NY]
    v = vv[slot, : TX + 2, :NY]
    dhbx = None if dhbx_ref is None else dhbx_ref[:]
    dhby = None if dhby_ref is None else dhby_ref[:]
    h_o, u_o, v_o, speed2 = _fused_update(h, u, v, dt, g, sx, sy,
                                          fcor_ref[:], dhbx, dhby, r_ref[:],
                                          ok)
    h_out[:] = h_o
    u_out[:] = u_o
    v_out[:] = v_o
    _accumulate_max2(max2_out, speed2, i)


def _kernel(dt_ref, g_ref, sx_ref, sy_ref, ok_ref, h_hbm, u_hbm, v_hbm,
            fcor_ref, r_ref, dhbx_ref, dhby_ref, h_out, u_out, v_out,
            max2_out, hh, uu, vv, sem, *, TX, NY, NBANDS):
    _kernel_body(dt_ref, g_ref, sx_ref, sy_ref, ok_ref, h_hbm, u_hbm, v_hbm,
                 fcor_ref, r_ref, dhbx_ref, dhby_ref, h_out, u_out, v_out,
                 max2_out, hh, uu, vv, sem, TX=TX, NY=NY, NBANDS=NBANDS)


def _kernel_flat(dt_ref, g_ref, sx_ref, sy_ref, ok_ref, h_hbm, u_hbm, v_hbm,
                 fcor_ref, r_ref, h_out, u_out, v_out, max2_out,
                 hh, uu, vv, sem, *, TX, NY, NBANDS):
    _kernel_body(dt_ref, g_ref, sx_ref, sy_ref, ok_ref, h_hbm, u_hbm, v_hbm,
                 fcor_ref, r_ref, None, None, h_out, u_out, v_out,
                 max2_out, hh, uu, vv, sem, TX=TX, NY=NY, NBANDS=NBANDS)


# --------------------------------------------------------------------------
# Padded-frame variant: zero per-step relayout traffic, BCs inside the kernel
# --------------------------------------------------------------------------
#
# richtmyer_step_interior still pays XLA passes per step that dwarf the kernel
# itself: jnp.pad of the inputs, the (1,1)-offset .at[1:-1,1:-1].set reassembly
# (a misaligned dynamic-update-slice forces a full cross-lane relayout), and
# the ghost-cell boundary-condition writes (strided column updates copy whole
# tiles).  The frame variant removes all of them: fields live permanently in a
# padded frame with the interior at (FRAME_ROW0, FRAME_LANE0) = (8, 1) so
# every HBM row window is 8-tile aligned, the kernel writes full-width row
# bands of the output frame directly, and the FINAL boundary-condition ghost
# values (models/shallow_water.py apply_boundary_conditions semantics, x block
# then y block including the corner quirks) are computed from the new interior
# and written as part of the band output: ghost lanes ride each band's window,
# ghost rows go out as two extra 8-row DMAs from the edge bands (periodic-x
# ghost rows need the opposite edge's rows, so band 0 parks its first interior
# row in a persistent VMEM scratch for the last band).  Outputs are therefore
# fully boundary-conditioned; only the dead pad regions are undefined and they
# are never read.


def frame_shape(nx, ny):
    """Padded-frame shape for an [nx, ny] field (interior nx-2 x ny-2)."""
    return nx - 2 + 2 * FRAME_ROW0, -(-(ny - 2 + 2 * FRAME_LANE0) // 128) * 128


def frame_supports(nx, ny):
    """Frame fast path needs a multiple-of-8 band divisor of nx-2."""
    return _pick_band(nx - 2, frame_shape(nx, ny)[1]) >= 8


def pad_frame(a, value=0.0):
    """Embed an [nx, ny] field (with ghost cells) into the padded frame."""
    fr, fl = frame_shape(a.shape[0], a.shape[1])
    r0, l0 = FRAME_ROW0 - 1, FRAME_LANE0 - 1
    return jnp.pad(a, ((r0, fr - a.shape[0] - r0), (l0, fl - a.shape[1] - l0)),
                   constant_values=value)


def unpad_frame(a_f, nx, ny):
    """Extract the [nx, ny] field (with ghost cells) from a padded frame; works
    on stacked [..., frame] arrays too."""
    r0, l0 = FRAME_ROW0 - 1, FRAME_LANE0 - 1
    return a_f[..., r0:r0 + nx, l0:l0 + ny]


def _store_ghost_row(ref, k, row, t_src, row1, zx_zero, zy_zero, by, nyi):
    """Store one fully-BC'd ghost row into ghost-scratch ``ref[k, row]``:
    lanes [gl, interior..., gr] at lane offset FRAME_LANE0-1.

    :param t_src: (nyi,) the x-block source vector for this ghost row (new
        interior values, or zeros for u at x-walls).
    :param row1: (nyi,) the adjacent *global* interior row — the y-periodic
        corner rules read it (apply_boundary_conditions per_y corner writes).
    """
    L0 = FRAME_LANE0
    if zx_zero:
        t_src = jnp.zeros_like(t_src)
    # all stores 2-D: Mosaic cannot store scalars/1-D vectors to VMEM
    ref[k, row:row + 1, L0:L0 + nyi] = t_src[None]
    if by == 'walls':
        cl = jnp.zeros((), t_src.dtype) if zy_zero else t_src[0]
        cr = jnp.zeros((), t_src.dtype) if zy_zero else t_src[nyi - 1]
    else:   # periodic
        cl = row1[nyi - 1]
        cr = row1[0]
    ref[k, row:row + 1, L0 - 1:L0] = cl.reshape(1, 1)
    ref[k, row:row + 1, L0 + nyi:L0 + nyi + 1] = cr.reshape(1, 1)


def _write_ghost_lanes(out_ref, slot, Fo, zy_zero, by, TX, NYI):
    """Each band writes its own rows' ghost lanes (the y block of
    apply_boundary_conditions restricted to interior rows)."""
    L0 = FRAME_LANE0
    if by == 'walls':
        left = jnp.zeros((TX,), Fo.dtype) if zy_zero else Fo[:, 0]
        right = jnp.zeros((TX,), Fo.dtype) if zy_zero else Fo[:, NYI - 1]
    else:
        left = Fo[:, NYI - 1]
        right = Fo[:, 0]
    out_ref[slot, 8:8 + TX, L0 - 1:L0] = left[:, None]
    out_ref[slot, 8:8 + TX, L0 + NYI:L0 + NYI + 1] = right[:, None]


def _kernel_frame_body(dt_ref, g_ref, sx_ref, sy_ref, ok_ref,
                       h_hbm, u_hbm, v_hbm, fcor_ref, r_ref,
                       dhbx_ref, dhby_ref, h_out, u_out, v_out, max2_out,
                       hh, uu, vv, oh, ou, ov, tg, bg, fi, isem, osem, gsem,
                       *, TX, NYI, NBANDS, BX, BY):
    i = pl.program_id(0)
    slot = i % 2
    R0, L0 = FRAME_ROW0, FRAME_LANE0
    outs = (oh, ou, ov)
    hbm_outs = (h_out, u_out, v_out)
    # (zx_zero, zy_zero): u is zeroed at x-walls, v at y-walls
    zflags = ((False, False), (BX == 'walls', False), (False, BY == 'walls'))

    # interior band b needs frame rows [R0-1 + b*TX, TX+2); the 8-aligned
    # read superset is [b*TX, TX+16) (R0 = 8), full frame width
    def in_copies(b, s):
        row0 = pl.multiple_of(b * TX, 8)
        return [pltpu.make_async_copy(src.at[pl.ds(row0, TX + 16), :],
                                      dst.at[s], isem.at[s, k])
                for k, (src, dst) in enumerate(((h_hbm, hh), (u_hbm, uu),
                                                (v_hbm, vv)))]

    # output band b: full-width frame rows [R0 + b*TX, TX) (8-aligned) from
    # scratch rows [8, 8+TX)
    def out_copies(b, s):
        row0 = pl.multiple_of(R0 + b * TX, 8)
        return [pltpu.make_async_copy(src.at[s, pl.ds(8, TX), :],
                                      dst.at[pl.ds(row0, TX), :],
                                      osem.at[s, k])
                for k, (src, dst) in enumerate(zip(outs, hbm_outs))]

    # ghost-row copies: top = frame rows [0, 8) (ghost at 7), bottom = frame
    # rows [R0 + nxi, 8) (ghost at row 0 of the window)
    def top_copies():
        return [pltpu.make_async_copy(tg.at[k], dst.at[pl.ds(0, 8), :],
                                      gsem.at[0, k])
                for k, dst in enumerate(hbm_outs)]

    def bottom_copies():
        row0 = pl.multiple_of(R0 + NBANDS * TX, 8)
        return [pltpu.make_async_copy(bg.at[k], dst.at[pl.ds(row0, 8), :],
                                      gsem.at[1, k])
                for k, dst in enumerate(hbm_outs)]

    @pl.when(i == 0)
    def _prefetch_first():
        for cp in in_copies(0, 0):
            cp.start()

    @pl.when(i + 1 < NBANDS)
    def _prefetch_next():
        for cp in in_copies(i + 1, (i + 1) % 2):
            cp.start()

    # the out scratch slot is reused at band i; its DMA from band i-2 must be
    # done before we overwrite it
    @pl.when(jnp.logical_and(i >= 2, i < NBANDS))
    def _drain_old_out():
        for cp in out_copies(i - 2, slot):
            cp.wait()

    for cp in in_copies(i, slot):
        cp.wait()

    dt, g, sx, sy, ok = _scalar_args(dt_ref, g_ref, sx_ref, sy_ref, ok_ref)
    # compute window: (TX+2, NYI+2) at scratch offset (R0-1, L0-1)
    h = hh[slot, R0 - 1: R0 + TX + 1, L0 - 1: L0 + NYI + 1]
    u = uu[slot, R0 - 1: R0 + TX + 1, L0 - 1: L0 + NYI + 1]
    v = vv[slot, R0 - 1: R0 + TX + 1, L0 - 1: L0 + NYI + 1]
    dhbx = None if dhbx_ref is None else dhbx_ref[:]
    dhby = None if dhby_ref is None else dhby_ref[:]
    h_o, u_o, v_o, speed2 = _fused_update(h, u, v, dt, g, sx, sy,
                                          fcor_ref[:], dhbx, dhby, r_ref[:],
                                          ok)
    fields = (h_o, u_o, v_o)
    for k, (out_ref, Fo) in enumerate(zip(outs, fields)):
        out_ref[slot, 8:8 + TX, L0:L0 + NYI] = Fo
        _write_ghost_lanes(out_ref, slot, Fo, zflags[k][1], BY, TX, NYI)
    _accumulate_max2(max2_out, speed2, i)

    # ---- ghost rows (x block then y corners, shallow_water.py:393-444) ----
    def fill_top(row1_of, src_of):
        """tg[k] row 7 <- ghost row built from src (x source) and row1
        (global first interior row, for y-periodic corners)."""
        for k in range(3):
            _store_ghost_row(tg, k, 7, src_of(k), row1_of(k), zflags[k][0],
                             zflags[k][1], BY, NYI)

    def fill_bottom(rowlast_of, src_of):
        for k in range(3):
            _store_ghost_row(bg, k, 0, src_of(k), rowlast_of(k), zflags[k][0],
                             zflags[k][1], BY, NYI)

    if BX == 'given':
        # sharded path (parallel/halo.py): the x ghost rows are supplied by
        # the halo exchange OUTSIDE the kernel — write nothing here; the
        # output frame's ghost rows are undefined until the caller rebuilds
        # them (every step does, before the next kernel call)
        pass
    elif BX == 'walls':
        @pl.when(i == 0)
        def _top_walls():
            fill_top(lambda k: fields[k][0], lambda k: fields[k][0])
            for cp in top_copies():
                cp.start()

        @pl.when(i == NBANDS - 1)
        def _bottom_walls():
            fill_bottom(lambda k: fields[k][TX - 1],
                        lambda k: fields[k][TX - 1])
            for cp in bottom_copies():
                cp.start()
    else:   # periodic x: ghost rows swap edges; u is NOT zeroed
        if NBANDS == 1:
            @pl.when(i == 0)
            def _rows_single():
                fill_top(lambda k: fields[k][0], lambda k: fields[k][TX - 1])
                fill_bottom(lambda k: fields[k][TX - 1],
                            lambda k: fields[k][0])
                for cp in top_copies() + bottom_copies():
                    cp.start()
        else:
            @pl.when(i == 0)
            def _park_first_row():
                # park the global first interior row for the last band
                for k, Fo in enumerate(fields):
                    fi[k, 0:1, L0:L0 + NYI] = Fo[0][None]

            @pl.when(i == NBANDS - 1)
            def _rows_periodic():
                first = lambda k: fi[k, 0, L0:L0 + NYI]
                fill_top(first, lambda k: fields[k][TX - 1])
                fill_bottom(lambda k: fields[k][TX - 1], first)
                for cp in top_copies() + bottom_copies():
                    cp.start()

    for cp in out_copies(i, slot):
        cp.start()

    @pl.when(i == NBANDS - 1)
    def _drain_final():
        for cp in out_copies(i, slot):
            cp.wait()
        if NBANDS > 1:
            for cp in out_copies(i - 1, 1 - slot):
                cp.wait()
        if BX != 'given':
            for cp in top_copies() + bottom_copies():
                cp.wait()


@functools.partial(jax.jit, static_argnames=('nx', 'ny', 'bx', 'by',
                                             'interpret'))
def richtmyer_step_frame(h_f, u_f, v_f, f_cor, r_damp, dhb_dx, dhb_dy,
                         dt, ok, g, dx, dy, nx, ny, bx='periodic', by='walls',
                         interpret=False):
    """Fused Richtmyer step on padded-frame fields, boundary conditions
    included.

    :param h_f, u_f, v_f: [frame_shape(nx, ny)] padded-frame fields, interior
        at (FRAME_ROW0, FRAME_LANE0), ghost cells adjacent and valid.
    :param f_cor, r_damp: interior Coriolis and Rayleigh damping fields,
        either [nx-2, ny-2] or a broadcastable row [1, ny-2] (both are
        y-only functions for every reference scenario — passing the row saves
        two full-field HBM reads per step).
    :param ok: scalar bool; False freezes the step (dt-collapse abort).
    :param bx: 'walls' | 'periodic' | 'given'.  'given' is the sharded-path
        mode (parallel/halo.py): the input frame's x ghost rows were filled
        by a halo exchange and the kernel writes NO x ghost rows — the
        output frame's ghost rows are undefined until the caller's next
        exchange.  y ghost lanes are always written.
    :return: (h, u, v, max2): full-frame outputs with interior updated
        (damped, frozen) and ALL ghost cells boundary-conditioned exactly like
        apply_boundary_conditions (El Niño wind stress NOT applied — the
        caller adds it and re-zeros the x-wall u ghost rows), plus the scalar
        max(u^2+v^2) over the new interior — the next step's CFL statistic.
        Pad regions are undefined and never read.
    """
    flat = dhb_dx is None
    nxi, nyi = nx - 2, ny - 2
    fr, fl = frame_shape(nx, ny)
    TX = _pick_band(nxi, fl, vmem_budget=_FRAME_VMEM_BUDGET)
    if TX == 0:
        raise ValueError(f'interior rows {nxi} have no multiple-of-8 divisor')
    nbands = nxi // TX
    dtype = h_f.dtype
    scalar = lambda x: jnp.asarray(x, dtype).reshape(1, 1)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    def field_spec(a):
        if a.shape[0] == 1:     # broadcast row, loaded once per band
            return pl.BlockSpec((1, nyi), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((TX, nyi), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out_shape = jax.ShapeDtypeStruct((fr, fl), dtype)
    kernel = functools.partial(_kernel_frame_flat if flat else _kernel_frame,
                               TX=TX, NYI=nyi, NBANDS=nbands, BX=bx, BY=by)
    in_specs = [smem, smem, smem, smem, smem, any_spec, any_spec, any_spec,
                field_spec(f_cor), field_spec(r_damp)]
    operands = [scalar(dt), scalar(g), scalar(dt / dx), scalar(dt / dy),
                jnp.asarray(ok, jnp.int32).reshape(1, 1),
                h_f, u_f, v_f, f_cor, r_damp]
    if not flat:
        in_specs += [field_spec(dhb_dx), field_spec(dhb_dy)]
        operands += [dhb_dx, dhb_dy]
    h_o, u_o, v_o, max2 = pl.pallas_call(
        kernel,
        grid=(nbands,),
        in_specs=in_specs,
        out_specs=(any_spec, any_spec, any_spec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(out_shape, out_shape, out_shape,
                   jax.ShapeDtypeStruct((1, 1), dtype)),
        scratch_shapes=[
            pltpu.VMEM((2, TX + 16, fl), dtype),
            pltpu.VMEM((2, TX + 16, fl), dtype),
            pltpu.VMEM((2, TX + 16, fl), dtype),
            pltpu.VMEM((2, TX + 8, fl), dtype),
            pltpu.VMEM((2, TX + 8, fl), dtype),
            pltpu.VMEM((2, TX + 8, fl), dtype),
            pltpu.VMEM((3, 8, fl), dtype),     # top ghost rows
            pltpu.VMEM((3, 8, fl), dtype),     # bottom ghost rows
            pltpu.VMEM((3, 8, fl), dtype),     # parked first interior row
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(*operands)
    return h_o, u_o, v_o, max2[0, 0]


def _kernel_frame(dt_ref, g_ref, sx_ref, sy_ref, ok_ref, h_hbm, u_hbm, v_hbm,
                  fcor_ref, r_ref, dhbx_ref, dhby_ref,
                  h_out, u_out, v_out, max2_out,
                  hh, uu, vv, oh, ou, ov, tg, bg, fi, isem, osem, gsem,
                  *, TX, NYI, NBANDS, BX, BY):
    _kernel_frame_body(dt_ref, g_ref, sx_ref, sy_ref, ok_ref,
                       h_hbm, u_hbm, v_hbm, fcor_ref, r_ref,
                       dhbx_ref, dhby_ref, h_out, u_out, v_out, max2_out,
                       hh, uu, vv, oh, ou, ov, tg, bg, fi, isem, osem, gsem,
                       TX=TX, NYI=NYI, NBANDS=NBANDS, BX=BX, BY=BY)


def _kernel_frame_flat(dt_ref, g_ref, sx_ref, sy_ref, ok_ref,
                       h_hbm, u_hbm, v_hbm, fcor_ref, r_ref,
                       h_out, u_out, v_out, max2_out,
                       hh, uu, vv, oh, ou, ov, tg, bg, fi, isem, osem, gsem,
                       *, TX, NYI, NBANDS, BX, BY):
    _kernel_frame_body(dt_ref, g_ref, sx_ref, sy_ref, ok_ref,
                       h_hbm, u_hbm, v_hbm, fcor_ref, r_ref,
                       None, None, h_out, u_out, v_out, max2_out,
                       hh, uu, vv, oh, ou, ov, tg, bg, fi, isem, osem, gsem,
                       TX=TX, NYI=NYI, NBANDS=NBANDS, BX=BX, BY=BY)


def _pick_band(n, ny_pad=1024, vmem_budget=9 * 2 ** 20):
    """Largest multiple-of-8 divisor of n whose working set fits the VMEM
    budget (~18 band-sized f32 buffers live: 2x3 double-buffered halo scratch,
    pipelined in/out tiles, temporaries).  Returns 0 if none."""
    target = max(vmem_budget // (18 * 4 * ny_pad), 8)
    t = min(int(target), n)
    t -= t % 8
    while t >= 8 and n % t:
        t -= 8
    return t


def supports(nx, ny):
    """Whether the fused kernel tiles this grid ((nx-2) needs a mult-of-8
    divisor)."""
    return _pick_band(nx - 2, -(-ny // 128) * 128) >= 8


@functools.partial(jax.jit, static_argnames=('interpret',))
def richtmyer_step_interior(h, u, v, f_cor_int, r_int, dhb_dx, dhb_dy,
                            dt, ok, g, dx, dy, interpret=False):
    """One fused nonlinear Richtmyer interior update.

    :param h, u, v: [nx, ny] full fields including ghost cells (old values,
        boundary conditions already applied).
    :param f_cor_int, r_int, dhb_dx, dhb_dy: [nx-2, ny-2] interior Coriolis,
        damping and orography-gradient fields (centered differences of
        h_base); pass ``None`` for both gradients on flat-orography grids to
        skip their HBM reads (bit-identical to zero gradients).
    :param ok: scalar bool; False freezes the step.
    :return: (h, u, v, max2) interior [nx-2, ny-2] updated physical fields
        (damped, frozen; before wind stress / boundary conditions) and the
        scalar max(u^2+v^2) over them.
    """
    flat = dhb_dx is None
    nx, ny = h.shape
    nxi, nyi = nx - 2, ny - 2
    ny_pad = -(-ny // 128) * 128
    TX = _pick_band(nxi, ny_pad)
    if TX == 0:
        raise ValueError(f'interior rows {nxi} have no multiple-of-8 divisor; '
                         'use the jnp richtmyer solver for this grid')
    nbands = nxi // TX
    grid = (nbands,)
    dtype = h.dtype
    # pad 6 dead rows so the last 8-aligned DMA window stays in bounds, and
    # pad lanes to a 128 multiple (Mosaic DMA tiling constraint)
    pad = ((0, 6), (0, ny_pad - ny))
    h_p = jnp.pad(h, pad)
    u_p = jnp.pad(u, pad)
    v_p = jnp.pad(v, pad)
    scalar = lambda x: jnp.asarray(x, dtype).reshape(1, 1)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    band_spec = pl.BlockSpec((TX, nyi), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nxi, nyi), dtype)
    kernel = functools.partial(_kernel_flat if flat else _kernel,
                               TX=TX, NY=ny, NBANDS=nbands)
    in_specs = [smem, smem, smem, smem, smem, any_spec, any_spec, any_spec,
                band_spec, band_spec]
    operands = [scalar(dt), scalar(g), scalar(dt / dx), scalar(dt / dy),
                jnp.asarray(ok, jnp.int32).reshape(1, 1),
                h_p, u_p, v_p, f_cor_int, r_int]
    if not flat:
        in_specs += [band_spec, band_spec]
        operands += [dhb_dx, dhb_dy]
    h_o, u_o, v_o, max2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(band_spec, band_spec, band_spec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(out_shape, out_shape, out_shape,
                   jax.ShapeDtypeStruct((1, 1), dtype)),
        scratch_shapes=[
            pltpu.VMEM((2, TX + 8, ny_pad), dtype),
            pltpu.VMEM((2, TX + 8, ny_pad), dtype),
            pltpu.VMEM((2, TX + 8, ny_pad), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(*operands)
    return h_o, u_o, v_o, max2[0, 0]
