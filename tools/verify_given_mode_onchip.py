"""On-chip validation of the bx='given' frame-kernel mode (r05).

The sharded shallow-water path (parallel/halo.py) runs richtmyer_step_frame
with bx='given' — x ghost rows supplied by the halo exchange instead of the
in-kernel BC writes.  CPU tests exercise it in interpret mode only, and this
repo has twice seen kernels that are bit-exact in interpret mode miscompile
in Mosaic (Hillis-Steele scan, faithful-conv lanes).  A single chip cannot
run the 8-way shard_map, but it CAN drive the compiled 'given' kernel
directly: fill a full-grid frame's ghost rows with exactly the values the
'walls' kernel would write, step both kernels, and compare interiors — the
window arithmetic is identical, so compiled outputs must be BIT-EQUAL.

    python tools/verify_given_mode_onchip.py
exit 0 + one JSON line on success.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from climatemodel_tpu.models.shallow_water import ShallowWater, sw_simulate
from climatemodel_tpu.ops.pallas_stencils import (FRAME_LANE0, FRAME_ROW0,
                                                  pad_frame,
                                                  richtmyer_step_frame)


def main():
    nx, ny = 130, 66
    world = ShallowWater(nx=nx, ny=ny, dx=100e3, dy=100e3, dt=60.0,
                         f_0=1e-4, beta=1.6e-11,
                         numerical_solver='richtmyer_pallas',
                         boundary_type={'x': 'walls', 'y': 'walls'},
                         initial_info={'type': 'height_gaussian',
                                       'min_h_surface': 9750.0,
                                       'max_h_surface': 10750.0,
                                       'x0': 0.0, 'y0': 0.0,
                                       'x_std': 1500e3, 'y_std': 1500e3,
                                       'add_noise': False})
    # evolve a bit so the fields are non-trivial
    st = sw_simulate(world.state, world.params, 20, **world._step_kwargs())
    p = world.params
    d = world.dtype
    fcor = p.f_coriolis[1:-1, 1:-1]
    r_int = p.r[1:-1, 1:-1]
    dt = jnp.asarray(120.0, d)
    ok = jnp.asarray(True)

    h_f = pad_frame(st.h)
    u_f = pad_frame(st.u)
    v_f = pad_frame(st.v)
    # the state already carries wall BCs (apply_boundary_conditions ran at
    # the end of sw_simulate), so the frame ghost rows/lanes are exactly the
    # values the 'walls' kernel maintains
    args = (fcor, r_int, None, None, dt, ok, p.g, p.dx, p.dy)

    out_w = richtmyer_step_frame(h_f, u_f, v_f, *args, nx, ny,
                                 bx='walls', by='walls')
    out_g = richtmyer_step_frame(h_f, u_f, v_f, *args, nx, ny,
                                 bx='given', by='walls')
    R0, L0 = FRAME_ROW0, FRAME_LANE0
    nxi, nyi = nx - 2, ny - 2
    res = {'backend': jax.default_backend()}
    ok_all = True
    for name, a, b in zip('huv', out_w[:3], out_g[:3]):
        ai = np.asarray(a[R0:R0 + nxi, L0 - 1:L0 + nyi + 1])
        bi = np.asarray(b[R0:R0 + nxi, L0 - 1:L0 + nyi + 1])
        eq = bool((ai == bi).all())
        res[f'{name}_interior_and_ylanes_bit_equal'] = eq
        ok_all &= eq
    res['max2_bit_equal'] = bool(np.asarray(out_w[3]) == np.asarray(out_g[3]))
    ok_all &= res['max2_bit_equal']
    res['ok'] = ok_all
    print(json.dumps(res))
    sys.exit(0 if ok_all else 1)


if __name__ == '__main__':
    main()
