"""On-chip isolation of the convective adaptive-march cost (VERDICT r03 #3).

BENCH_LOCAL_r03 measured the adaptive convective single-column march at
~1.16 ms/step for BOTH conv methods, while the fused fixed-step fori march
measures 0.048 (isotonic) / 0.116 (faithful) ms/step and the radiative
adaptive march 0.147 — so ~1 ms/step of ADAPTIVE-march overhead appears only
when convection is in the body, for either method.  This script brackets
where it goes.  Run on the real chip:

    python tools/isolate_conv_march.py [nz]

Variants (all nz=150 thermosphere, f32, fixed 300 steps where applicable):
  fori_rad          fixed-step march, flux + controller only
  fori_conv_ref     + faithful group-blend adjustment every step
  fori_conv_iso     + isotonic adjustment every step
  fori_conv_ref_d   fori_conv_ref + the delta percentile every step
  adaptive_rad      full while_loop march, convective_adjust=False
  adaptive_conv_ref full while_loop march, faithful
  adaptive_conv_iso full while_loop march, isotonic
  op_ref_stable     faithful operator alone on the marched (stable) profile
  op_ref_unstable   faithful operator alone on the isothermal+heated profile
  op_iso_*          isotonic operator likewise
  seg_scatter       the isotonic revert's segment-max alone
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from climatemodel_tpu.constants import p_surface_earth
from climatemodel_tpu.models import column
from climatemodel_tpu.models.grey import GreyGas, _grey_evolve, grey_net_flux
from climatemodel_tpu.ops.convection import convective_adjustment

NZ = int(sys.argv[1]) if len(sys.argv) > 1 else 150
N_STEPS = 300


def world():
    from climatemodel_tpu.cli import grey_world_kwargs
    return GreyGas(nz=NZ, ny=1, **grey_world_kwargs('thermosphere'))


def best_of(fn, n=5):
    fn()                                   # compile
    w = float('inf')
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        w = min(w, time.perf_counter() - t0)
    return w


def fori_march(w, conv=None, with_delta=False):
    p_int = jnp.asarray(w.p_interface, w.dtype)
    p_c = jnp.asarray(w.p[:, 0], w.dtype)
    forcing = w.forcing

    @jax.jit
    def run(st):
        def body(_, carry):
            st, acc = carry
            net = grey_net_flux(st.T, forcing)
            st2, delta = column.update_temp(
                st, net, p_int, p_c,
                convective_adjust=conv is not None,
                conv_method=conv or 'reference',
                compute_delta=with_delta)
            if with_delta:
                acc = acc + delta
            return st2, acc
        return lax.fori_loop(0, N_STEPS, body,
                             (st, jnp.asarray(0.0, st.T.dtype)))
    st0 = w.state
    return lambda: jax.block_until_ready(run(st0))


def adaptive_march(w, conv=None):
    p_int = jnp.asarray(w.p_interface, w.dtype)
    p_c = jnp.asarray(w.p[:, 0], w.dtype)
    forcing = w.forcing
    ft = jnp.asarray(1e-9, w.dtype)        # unreachable: run to max_steps
    st0 = w.state

    def run():
        out = _grey_evolve(st0, forcing, p_int, p_c, ft, t_end=1e9,
                           max_steps=N_STEPS,
                           convective_adjust=conv is not None,
                           conv_method=conv or 'reference')
        jax.block_until_ready(out[0].T)
    return run


def op_only(p_c, T, method):
    f = jax.jit(lambda T: convective_adjustment(p_c, T, descending=True,
                                                method=method))
    Tj = jnp.asarray(T)
    return lambda: jax.block_until_ready(f(Tj))


def seg_scatter_only(nz):
    from climatemodel_tpu.ops.convection import _segment_abs_max
    rng = np.random.default_rng(0)
    dT = jnp.asarray(rng.normal(size=nz), jnp.float32)
    changed = jnp.asarray(rng.random(nz) > 0.5)
    f = jax.jit(lambda dT, changed: _segment_abs_max(dT, changed))
    return lambda: jax.block_until_ready(f(dT, changed))


def main():
    print(f'backend={jax.default_backend()} nz={NZ} steps={N_STEPS}')

    for name, fn in (
            ('fori_rad', fori_march(world())),
            ('fori_conv_ref', fori_march(world(), conv='reference')),
            ('fori_conv_iso', fori_march(world(), conv='isotonic')),
            ('fori_conv_ref_d', fori_march(world(), conv='reference',
                                           with_delta=True)),
            ('adaptive_rad', adaptive_march(world())),
            ('adaptive_conv_ref', adaptive_march(world(), conv='reference')),
            ('adaptive_conv_iso', adaptive_march(world(), conv='isotonic'))):
        wall = best_of(fn)
        print(f'{name:20s} {1e3 * wall / N_STEPS:8.4f} ms/step')

    # operator-only calls on stable vs unstable profiles
    w2 = world()
    w2.evolve_to_equilibrium(flux_thresh=1e-1, save=False)
    T_stable = np.asarray(w2.T)
    T_unstable = np.asarray(world().T)       # isothermal: maximally unstable?
    p_c = jnp.asarray(w2.p[:, 0], w2.dtype)
    for name, T in (('stable', T_stable), ('unstable', T_unstable)):
        for method in ('reference', 'isotonic'):
            wall = best_of(op_only(p_c, T, method))
            print(f'op_{method[:3]}_{name:9s} {1e3 * wall:8.4f} ms/call')

    try:
        wall = best_of(seg_scatter_only(NZ))
        print(f'{"seg_max":20s} {1e3 * wall:8.4f} ms/call')
    except ImportError:
        print('seg_max helper not present (pre-refactor tree)')


if __name__ == '__main__':
    main()
