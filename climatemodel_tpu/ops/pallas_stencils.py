"""Pallas TPU kernel: fused nonlinear Richtmyer shallow-water step.

The jnp stencil path (ops/stencils.py) materialises ~20 field-sized
intermediates per step (conservative form, F/G fluxes, half-step states,
half-step fluxes, source) — HBM traffic dominates on TPU.  This kernel fuses
the whole interior update — conservative form, both Richtmyer stages, and the
Coriolis/orography source with the reference's half-time h (include_source,
numerical_methods.py:108-132) — into one pass: each grid step DMAs a band of
full-width rows (with one halo row each side) of h/u/v from HBM into VMEM,
computes entirely in VMEM, and writes the interior band of the updated
physical fields.  Per step the only HBM traffic is ~3 reads + 3 writes of the
field set.

The band DMAs are double-buffered: while band i is being computed, band i+1's
rows are already streaming into the other scratch slot, so HBM transfer
overlaps with VPU compute instead of serialising with it (the out bands are
pipelined by pallas_call itself via the blocked out_specs).

Mosaic constrains HBM slices to the (8, 128) tile grid, so the row bands are
8-aligned: the band height TX divides the interior rows and the DMA window is
TX+8 rows starting at the 8-aligned offset i*TX (the 6 trailing rows beyond the
halo are dead weight); inputs are padded by 6 rows once per call to keep the
last window in bounds.  The y axis is never sliced in HBM.

Flat-orography grids (h_base == const, e.g. every El Niño configuration) use a
specialised kernel variant that skips the two orography-gradient field reads
and their arithmetic — the jnp path's ``- g * 0`` terms are exact no-ops, so
results are bit-identical.

Semantics match stencils.richtmyer + include_source + get_physical_values
(same operations, fused); boundary conditions, CFL, damping and wind remain in
the caller (models/shallow_water.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_body(dt_ref, g_ref, sx_ref, sy_ref, h_hbm, u_hbm, v_hbm,
                 fcor_ref, dhbx_ref, dhby_ref, h_out, u_out, v_out,
                 hh, uu, vv, sem, *, TX, NY, NBANDS):
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

    dt = dt_ref[0, 0]
    g = g_ref[0, 0]
    sx = sx_ref[0, 0]
    sy = sy_ref[0, 0]

    # compute on the real (unpadded) window only
    h = hh[slot, : TX + 2, :NY]
    u = uu[slot, : TX + 2, :NY]
    v = vv[slot, : TX + 2, :NY]
    uh = h * u
    vh = h * v
    gh2 = 0.5 * g * h * h
    # fluxes on the window (flux_x/flux_y, shallow_water.py:485-517)
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
    # h commits first; momenta see h_mid = (h_new + h_old)/2, old uh/vh
    h_mid = 0.5 * (h_new + h[1:-1, 1:-1])
    inv_mid = 1.0 / h_mid
    u_mid = uh[1:-1, 1:-1] * inv_mid
    v_mid = vh[1:-1, 1:-1] * inv_mid
    fcor = fcor_ref[:]
    if dhbx_ref is None:
        Q1 = h_mid * (fcor * v_mid)
        Q2 = h_mid * (-fcor * u_mid)
    else:
        Q1 = h_mid * (fcor * v_mid - g * dhbx_ref[:])
        Q2 = h_mid * (-fcor * u_mid - g * dhby_ref[:])
    uh_new = uh_new + Q1 * dt
    vh_new = vh_new + Q2 * dt

    inv_new = 1.0 / h_new
    h_out[:] = h_new
    u_out[:] = uh_new * inv_new
    v_out[:] = vh_new * inv_new


def _kernel(dt_ref, g_ref, sx_ref, sy_ref, h_hbm, u_hbm, v_hbm,
            fcor_ref, dhbx_ref, dhby_ref, h_out, u_out, v_out,
            hh, uu, vv, sem, *, TX, NY, NBANDS):
    _kernel_body(dt_ref, g_ref, sx_ref, sy_ref, h_hbm, u_hbm, v_hbm,
                 fcor_ref, dhbx_ref, dhby_ref, h_out, u_out, v_out,
                 hh, uu, vv, sem, TX=TX, NY=NY, NBANDS=NBANDS)


def _kernel_flat(dt_ref, g_ref, sx_ref, sy_ref, h_hbm, u_hbm, v_hbm,
                 fcor_ref, h_out, u_out, v_out, hh, uu, vv, sem,
                 *, TX, NY, NBANDS):
    _kernel_body(dt_ref, g_ref, sx_ref, sy_ref, h_hbm, u_hbm, v_hbm,
                 fcor_ref, None, None, h_out, u_out, v_out,
                 hh, uu, vv, sem, TX=TX, NY=NY, NBANDS=NBANDS)


# --------------------------------------------------------------------------
# Padded-frame variant: zero per-step relayout traffic
# --------------------------------------------------------------------------
#
# The plain richtmyer_step_interior still pays two XLA passes per step that
# dwarf the kernel itself: jnp.pad of the inputs and the (1,1)-offset
# .at[1:-1,1:-1].set reassembly (a misaligned dynamic-update-slice forces a
# full cross-lane relayout).  The frame variant removes both: fields live
# permanently in a padded frame with the interior at (FRAME_ROW0, FRAME_LANE0)
# = (8, 128) so every HBM window below is (8, 128)-tile aligned, and the
# kernel writes full-width row bands of the output frame directly.  Ghost
# rows/cols of the output are left uninitialised — the caller's boundary
# conditions rewrite all four sides every step (models/shallow_water.py) —
# and the dead pad regions are never read.

FRAME_ROW0 = 8     # frame row of the first interior row (ghost row at 7)
FRAME_LANE0 = 128  # frame lane of the first interior col (ghost col at 127)


def frame_shape(nx, ny):
    """Padded-frame shape for an [nx, ny] field (interior nx-2 x ny-2)."""
    return nx - 2 + 2 * FRAME_ROW0, ny - 2 + 2 * FRAME_LANE0


def frame_supports(nx, ny):
    """Frame fast path needs 128 | (ny-2) (aligned full-lane interior) and a
    multiple-of-8 band divisor of nx-2."""
    return (ny - 2) % 128 == 0 and _pick_band(nx - 2, ny - 2 + 256) >= 8


def pad_frame(a, value=0.0):
    """Embed an [nx, ny] field (with ghost cells) into the padded frame."""
    r0, l0 = FRAME_ROW0 - 1, FRAME_LANE0 - 1
    return jnp.pad(a, ((r0, FRAME_ROW0 - 1), (l0, FRAME_LANE0 - 1)),
                   constant_values=value)


def unpad_frame(a_f, nx, ny):
    """Extract the [nx, ny] field (with ghost cells) from a padded frame; works
    on stacked [..., frame] arrays too."""
    r0, l0 = FRAME_ROW0 - 1, FRAME_LANE0 - 1
    return a_f[..., r0:r0 + nx, l0:l0 + ny]


def _kernel_frame_body(dt_ref, g_ref, sx_ref, sy_ref, h_hbm, u_hbm, v_hbm,
                       fcor_ref, dhbx_ref, dhby_ref, h_out, u_out, v_out,
                       hh, uu, vv, oh, ou, ov, isem, osem,
                       *, TX, NYI, NBANDS):
    i = pl.program_id(0)
    slot = i % 2
    R0, L0 = FRAME_ROW0, FRAME_LANE0

    # interior band b needs frame rows [R0-1 + b*TX, TX+2); the 8-aligned
    # read superset is [b*TX, TX+16) (R0 = 8), full frame width
    def in_copies(b, s):
        row0 = pl.multiple_of(b * TX, 8)
        return [pltpu.make_async_copy(src.at[pl.ds(row0, TX + 16), :],
                                      dst.at[s], isem.at[s, k])
                for k, (src, dst) in enumerate(((h_hbm, hh), (u_hbm, uu),
                                                (v_hbm, vv)))]

    # output band b: full-width frame rows [R0 + b*TX, TX) (8-aligned)
    def out_copies(b, s):
        row0 = pl.multiple_of(R0 + b * TX, 8)
        return [pltpu.make_async_copy(src.at[s],
                                      dst.at[pl.ds(row0, TX), :],
                                      osem.at[s, k])
                for k, (src, dst) in enumerate(((oh, h_out), (ou, u_out),
                                                (ov, v_out)))]

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

    dt = dt_ref[0, 0]
    g = g_ref[0, 0]
    sx = sx_ref[0, 0]
    sy = sy_ref[0, 0]

    # compute window: (TX+2, NYI+2) at scratch offset (R0-1, L0-1)
    h = hh[slot, R0 - 1: R0 + TX + 1, L0 - 1: L0 + NYI + 1]
    u = uu[slot, R0 - 1: R0 + TX + 1, L0 - 1: L0 + NYI + 1]
    v = vv[slot, R0 - 1: R0 + TX + 1, L0 - 1: L0 + NYI + 1]
    uh = h * u
    vh = h * v
    gh2 = 0.5 * g * h * h
    F0, F1, F2 = uh, uh * u + gh2, uh * v
    G0, G1, G2 = vh, uh * v, vh * v + gh2

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

    h_mid = 0.5 * (h_new + h[1:-1, 1:-1])
    inv_mid = 1.0 / h_mid
    u_mid = uh[1:-1, 1:-1] * inv_mid
    v_mid = vh[1:-1, 1:-1] * inv_mid
    fcor = fcor_ref[:]
    if dhbx_ref is None:
        Q1 = h_mid * (fcor * v_mid)
        Q2 = h_mid * (-fcor * u_mid)
    else:
        Q1 = h_mid * (fcor * v_mid - g * dhbx_ref[:])
        Q2 = h_mid * (-fcor * u_mid - g * dhby_ref[:])
    uh_new = uh_new + Q1 * dt
    vh_new = vh_new + Q2 * dt

    inv_new = 1.0 / h_new
    oh[slot, :, L0:L0 + NYI] = h_new
    ou[slot, :, L0:L0 + NYI] = uh_new * inv_new
    ov[slot, :, L0:L0 + NYI] = vh_new * inv_new
    for cp in out_copies(i, slot):
        cp.start()

    @pl.when(i == NBANDS - 1)
    def _drain_final():
        for cp in out_copies(i, slot):
            cp.wait()
        if NBANDS > 1:
            for cp in out_copies(i - 1, 1 - slot):
                cp.wait()


def _kernel_frame(dt_ref, g_ref, sx_ref, sy_ref, h_hbm, u_hbm, v_hbm,
                  fcor_ref, dhbx_ref, dhby_ref, h_out, u_out, v_out,
                  hh, uu, vv, oh, ou, ov, isem, osem, *, TX, NYI, NBANDS):
    _kernel_frame_body(dt_ref, g_ref, sx_ref, sy_ref, h_hbm, u_hbm, v_hbm,
                       fcor_ref, dhbx_ref, dhby_ref, h_out, u_out, v_out,
                       hh, uu, vv, oh, ou, ov, isem, osem,
                       TX=TX, NYI=NYI, NBANDS=NBANDS)


def _kernel_frame_flat(dt_ref, g_ref, sx_ref, sy_ref, h_hbm, u_hbm, v_hbm,
                       fcor_ref, h_out, u_out, v_out,
                       hh, uu, vv, oh, ou, ov, isem, osem,
                       *, TX, NYI, NBANDS):
    _kernel_frame_body(dt_ref, g_ref, sx_ref, sy_ref, h_hbm, u_hbm, v_hbm,
                       fcor_ref, None, None, h_out, u_out, v_out,
                       hh, uu, vv, oh, ou, ov, isem, osem,
                       TX=TX, NYI=NYI, NBANDS=NBANDS)


@functools.partial(jax.jit, static_argnames=('nx', 'ny', 'interpret'))
def richtmyer_step_frame(h_f, u_f, v_f, f_cor_int, dhb_dx, dhb_dy, dt, g,
                         dx, dy, nx, ny, interpret=False):
    """Fused Richtmyer step on padded-frame fields.

    :param h_f, u_f, v_f: [frame_shape(nx, ny)] padded-frame fields, interior
        at (FRAME_ROW0, FRAME_LANE0), ghost cells adjacent, boundary
        conditions already applied.
    :return: full-frame (h, u, v) with the interior updated.  Ghost rows/cols
        and pad regions of the outputs are UNDEFINED — the caller must apply
        boundary conditions before reading any ghost value, and must never
        reduce over pad regions.
    """
    flat = dhb_dx is None
    nxi, nyi = nx - 2, ny - 2
    fr, fl = frame_shape(nx, ny)
    assert nyi % 128 == 0, 'frame path needs 128 | (ny-2)'
    TX = _pick_band(nxi, fl, vmem_budget=8 * 2 ** 20)
    if TX == 0:
        raise ValueError(f'interior rows {nxi} have no multiple-of-8 divisor')
    nbands = nxi // TX
    dtype = h_f.dtype
    scalar = lambda x: jnp.asarray(x, dtype).reshape(1, 1)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    band_spec = pl.BlockSpec((TX, nyi), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((fr, fl), dtype)
    kernel = functools.partial(_kernel_frame_flat if flat else _kernel_frame,
                               TX=TX, NYI=nyi, NBANDS=nbands)
    in_specs = [smem, smem, smem, smem, any_spec, any_spec, any_spec,
                band_spec]
    operands = [scalar(dt), scalar(g), scalar(dt / dx), scalar(dt / dy),
                h_f, u_f, v_f, f_cor_int]
    if not flat:
        in_specs += [band_spec, band_spec]
        operands += [dhb_dx, dhb_dy]
    return pl.pallas_call(
        kernel,
        grid=(nbands,),
        in_specs=in_specs,
        out_specs=(any_spec, any_spec, any_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, TX + 16, fl), dtype),
            pltpu.VMEM((2, TX + 16, fl), dtype),
            pltpu.VMEM((2, TX + 16, fl), dtype),
            pltpu.VMEM((2, TX, fl), dtype),
            pltpu.VMEM((2, TX, fl), dtype),
            pltpu.VMEM((2, TX, fl), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(*operands)


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
def richtmyer_step_interior(h, u, v, f_cor_int, dhb_dx, dhb_dy, dt, g, dx, dy,
                            interpret=False):
    """One fused nonlinear Richtmyer interior update.

    :param h, u, v: [nx, ny] full fields including ghost cells (old values,
        boundary conditions already applied).
    :param f_cor_int, dhb_dx, dhb_dy: [nx-2, ny-2] interior Coriolis field and
        orography gradients (centered differences of h_base); pass ``None``
        for both gradients on flat-orography grids to skip their HBM reads
        (bit-identical to zero gradients).
    :return: (h, u, v) interior [nx-2, ny-2] updated physical fields (before
        damping / wind / boundary conditions).
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
    in_specs = [smem, smem, smem, smem, any_spec, any_spec, any_spec,
                band_spec]
    operands = [scalar(dt), scalar(g), scalar(dt / dx), scalar(dt / dy),
                h_p, u_p, v_p, f_cor_int]
    if not flat:
        in_specs += [band_spec, band_spec]
        operands += [dhb_dx, dhb_dy]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(band_spec, band_spec, band_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, TX + 8, ny_pad), dtype),
            pltpu.VMEM((2, TX + 8, ny_pad), dtype),
            pltpu.VMEM((2, TX + 8, ny_pad), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(*operands)
