"""Conservative finite-volume/finite-difference scheme library.

Solves dU/dt + df(U)/dx + dg(U)/dy = Q(U) on a ghost-cell grid, re-implementing
the four schemes of the reference
(/root/reference/Model/dynamics/numerical_methods.py:11-132) as pure jnp stencil
ops that XLA fuses into a few passes over the grid.  Array layout matches the
reference: U has shape [n_conserved, nx, ny] with one ghost cell on every side;
schemes update the interior and leave ghosts untouched (boundary conditions are
applied by the caller afterwards).

Unlike the reference, which re-evaluates the flux closures on every shifted
window, each stage evaluates f/g ONCE on the full (or half-step) array and
takes shifted slices of the result — elementwise fluxes give bit-identical
values while halving the arithmetic and, more importantly on TPU, the HBM
traffic of the fused step.
"""
from __future__ import annotations

import jax.numpy as jnp


def include_source(u, un, u_new_no_source, Q, no_source_ind, dt):
    """Two-stage source handling (numerical_methods.py:108-132): source-free
    components are committed first, then Q is evaluated at (u + un)/2 with the
    committed components visible, and added to every component."""
    for i in no_source_ind:
        u = u.at[i, 1:-1, 1:-1].set(u_new_no_source[i])
    u_for_source = 0.5 * (u + un)
    return u.at[:, 1:-1, 1:-1].set(u_new_no_source + Q(u_for_source) * dt)


def lax_friedrichs(u, f, g, Q, dt, dx, dy, no_source_ind=()):
    """First-order Lax-Friedrichs (numerical_methods.py:11-21)."""
    un = u
    sx = dt / dx
    sy = dt / dy
    F = f(un)
    G = g(un)
    u_new = (0.25 * (un[:, 2:, 1:-1] + un[:, :-2, 1:-1]
                     + un[:, 1:-1, 2:] + un[:, 1:-1, :-2])
             - 0.5 * sx * (F[:, 2:, 1:-1] - F[:, :-2, 1:-1])
             - 0.5 * sy * (G[:, 1:-1, 2:] - G[:, 1:-1, :-2]))
    return include_source(u, un, u_new, Q, no_source_ind, dt)


def richtmyer(u, f, g, Q, dt, dx, dy, no_source_ind=()):
    """Two-step Richtmyer Lax-Wendroff — the reference default
    (numerical_methods.py:62-80)."""
    un = u
    sx = dt / dx
    sy = dt / dy
    F = f(un)
    G = g(un)
    u_half_x = (0.5 * (un[:, 1:, 1:-1] + un[:, :-1, 1:-1])
                - 0.5 * sx * (F[:, 1:, 1:-1] - F[:, :-1, 1:-1]))
    u_half_y = (0.5 * (un[:, 1:-1, 1:] + un[:, 1:-1, :-1])
                - 0.5 * sy * (G[:, 1:-1, 1:] - G[:, 1:-1, :-1]))
    F_h = f(u_half_x)
    G_h = g(u_half_y)
    u_new = (un[:, 1:-1, 1:-1]
             - sx * (F_h[:, 1:, :] - F_h[:, :-1, :])
             - sy * (G_h[:, :, 1:] - G_h[:, :, :-1]))
    return include_source(u, un, u_new, Q, no_source_ind, dt)


def maccormack(u, f, g, Q, dt, dx, dy, no_source_ind=()):
    """MacCormack predictor-corrector (numerical_methods.py:83-105)."""
    un = u
    sx = dt / dx
    sy = dt / dy
    F = f(un)
    G = g(un)
    u_pred = (un[:, :-1, :-1]
              - sx * (F[:, 1:, :-1] - F[:, :-1, :-1])
              - sy * (G[:, :-1, 1:] - G[:, :-1, :-1]))
    F_p = f(u_pred)
    G_p = g(u_pred)
    # PRESERVED REFERENCE BUG: the G-flux (y) difference is scaled by sx, not
    # sy (numerical_methods.py:93 multiplies both corrector differences by
    # sigma_x).  Kept deliberately for bit-level parity with the reference —
    # do NOT "fix" to sy without breaking the maccormack oracle tests
    # (tests/test_shallow_water.py).  Harmless on square grids (dx == dy).
    u_new = (0.5 * (un[:, 1:-1, 1:-1] + u_pred[:, 1:, 1:])
             - 0.5 * sx * (F_p[:, 1:, 1:] - F_p[:, :-1, 1:])
             - 0.5 * sx * (G_p[:, 1:, 1:] - G_p[:, 1:, :-1]))
    return include_source(u, un, u_new, Q, no_source_ind, dt)


def jacobian_mult(J, f):
    """Contract Jacobian [nx, ny, n, n] with vector field [n, nx, ny]
    (numerical_methods.py:24-35)."""
    return jnp.einsum('xyij,jxy->ixy', J, f)


def lax_wendroff(u, f, g, Q, dt, dx, dy, no_source_ind, nx, ny, A, B):
    """Single-step Lax-Wendroff with flux Jacobians A = df/dU, B = dg/dU
    (numerical_methods.py:38-59)."""
    un = u
    sx = dt / dx
    sy = dt / dy
    F = f(un)
    G = g(un)
    A_ph = A(0.5 * (un[:, 2:, 1:-1] + un[:, 1:-1, 1:-1]))
    A_ph_term = jacobian_mult(A_ph, F[:, 2:, 1:-1] - F[:, 1:-1, 1:-1])
    A_mh = A(0.5 * (un[:, 1:-1, 1:-1] + un[:, :-2, 1:-1]))
    A_mh_term = jacobian_mult(A_mh, F[:, 1:-1, 1:-1] - F[:, :-2, 1:-1])
    B_ph = B(0.5 * (un[:, 1:-1, 2:] + un[:, 1:-1, 1:-1]))
    B_ph_term = jacobian_mult(B_ph, G[:, 1:-1, 2:] - G[:, 1:-1, 1:-1])
    B_mh = B(0.5 * (un[:, 1:-1, 1:-1] + un[:, 1:-1, :-2]))
    B_mh_term = jacobian_mult(B_mh, G[:, 1:-1, 1:-1] - G[:, 1:-1, :-2])
    u_new = (un[:, 1:-1, 1:-1]
             - 0.5 * sx * (F[:, 2:, 1:-1] - F[:, :-2, 1:-1])
             + 0.5 * sx ** 2 * (A_ph_term - A_mh_term)
             - 0.5 * sy * (G[:, 1:-1, 2:] - G[:, 1:-1, :-2])
             + 0.5 * sy ** 2 * (B_ph_term - B_mh_term))
    return include_source(u, un, u_new, Q, no_source_ind, dt)


def centered_diff_x(u, dx):
    """du/dx on the interior (numerical_methods.py:135-139)."""
    return (u[2:, 1:-1] - u[:-2, 1:-1]) / (2 * dx)


def centered_diff_y(u, dy):
    """du/dy on the interior (numerical_methods.py:142-146)."""
    return (u[1:-1, 2:] - u[1:-1, :-2]) / (2 * dy)


SCHEMES = {
    'lax_friedrichs': lax_friedrichs,
    'lax_wendroff': lax_wendroff,
    'richtmyer': richtmyer,
    'maccormack': maccormack,
}
