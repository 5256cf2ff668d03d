"""Are the dyn-forcing and const-forcing convective marches the SAME
trajectory?  XLA constant-folds exp(dtau) on the host for the baked variant,
which can shift bits and change the instability/sweep pattern — in which
case the 3x 'scheduling' gap would really be a work gap.

    python tools/conv_dyn_vs_const_endpoint.py [nz]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from climatemodel_tpu.models import column
from climatemodel_tpu.models.grey import GreyGas, grey_net_flux

NZ = int(sys.argv[1]) if len(sys.argv) > 1 else 150
N_STEPS = 300


def main():
    from climatemodel_tpu.cli import grey_world_kwargs
    w = GreyGas(nz=NZ, ny=1, **grey_world_kwargs('thermosphere'))
    p_int = jnp.asarray(w.p_interface, w.dtype)
    p_c = jnp.asarray(w.p[:, 0], w.dtype)
    forcing = w.forcing
    st0 = w.state
    dtype = w.dtype

    def evolve(st, fc):
        net_fn = lambda T: grey_net_flux(T, fc)
        st2, info = column.evolve_to_equilibrium(
            st, net_fn, p_int, p_c,
            flux_thresh=jnp.asarray(1e-9, dtype), convective_adjust=True,
            t_end=1e9, max_steps=N_STEPS, conv_method='reference')
        return st2.T, st2.t, info.steps

    run_const = jax.jit(lambda st: evolve(st, forcing))
    run_dyn = jax.jit(evolve)

    Tc, tc, sc = jax.device_get(run_const(st0))
    Td, td, sd = jax.device_get(run_dyn(st0, forcing))
    print(f'steps const={int(sc)} dyn={int(sd)}')
    print(f't     const={float(tc):.6e} dyn={float(td):.6e}')
    diff = np.abs(np.asarray(Tc, np.float64) - np.asarray(Td, np.float64))
    print(f'endpoint max|dT| = {diff.max():.6e} K  (bitwise equal: '
          f'{bool((np.asarray(Tc) == np.asarray(Td)).all())})')


if __name__ == '__main__':
    main()
