"""On-chip validation + timing of the fused net+exit-statistics march step.

grey_evolve_ensemble(fused_stats=True) computes the net flux AND the
delta-percentile order statistics / max|net| in one Pallas pass per step
(ops/two_stream.grey_net_with_stats -> pallas_two_stream._net_stats_kernel),
replacing the XLA fusions + top_k sort that the r05 profile showed dominate
the ensemble iteration (tools/profile_grey_ensemble.py).  Interpret mode and
the CPU fallback are pinned bit-exact in tests; this script proves the
COMPILED Mosaic kernel drives the 4096-member bench-config march to the
bit-identical endpoint, step count and flags — and times both paths.

    python tools/verify_fused_stats_onchip.py [n_members] [nz]
exit 0 + one JSON line on success (bit-equal AND not slower).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
NZ = int(sys.argv[2]) if len(sys.argv) > 2 else 60


def main():
    from climatemodel_tpu.constants import p_surface_earth
    from climatemodel_tpu.models import ensemble
    from climatemodel_tpu.models.grey import GreyGas

    world = GreyGas(nz=NZ, ny=1, tau_lw_func='scale_height',
                    tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    F_values = np.linspace(800.0, 1600.0, N)
    states, forcings, p_int, p_c = ensemble.grey_ensemble(world, F_values)
    ft = jnp.asarray(1e-3, world.dtype)

    def run(fused):
        return ensemble.grey_evolve_ensemble(states, forcings, p_int, p_c,
                                             ft, max_steps=3000,
                                             fused_stats=fused)

    res = {'backend': jax.default_backend(), 'members': N, 'nz': NZ}
    walls = {}
    outs = {}
    for fused in (False, True):
        out = jax.block_until_ready(run(fused))      # compile + converge
        wall = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(fused)
            jax.block_until_ready(out)
            wall = min(wall, time.perf_counter() - t0)
        walls[fused] = wall
        outs[fused] = jax.device_get(out)

    (st0, info0), (st1, info1) = outs[False], outs[True]
    leaves0 = jax.tree_util.tree_leaves((st0, info0))
    leaves1 = jax.tree_util.tree_leaves((st1, info1))
    bit_equal = all(np.array_equal(a, b, equal_nan=True)
                    for a, b in zip(leaves0, leaves1))
    res['endpoint_bit_equal'] = bool(bit_equal)
    res['total_steps'] = int(np.sum(info1.steps))
    res['converged_fraction_f32'] = float(np.mean(info1.equilibrium))
    days = float(np.sum(np.asarray(st1.t, np.float64))) / 86400.0
    res['split_wall_s'] = round(walls[False], 4)
    res['fused_wall_s'] = round(walls[True], 4)
    res['speedup'] = round(walls[False] / walls[True], 3)
    res['fused_model_days_per_sec'] = days / walls[True]

    ok = bit_equal and walls[True] <= walls[False] * 1.02
    res['ok'] = ok
    print(json.dumps(res))
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
