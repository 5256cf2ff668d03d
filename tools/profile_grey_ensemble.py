"""Per-op device-time breakdown of the headline grey-RCE ensemble march.

Same config as bench.py's grey_rce row (4096 members x nz=60, the bench
world/forcing sweep) but capped at a fixed step count so the profiled
execution is one bounded while_loop; aggregates the Chrome trace like
tools/profile_conv_march.py.  Use this to decide where the next ensemble
kernel belongs — r05 used it to attribute the post-flux-kernel residual.

    python tools/profile_grey_ensemble.py [n_members] [nz] [n_steps]
"""
import glob
import gzip
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
N_STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 300


def main():
    from climatemodel_tpu.constants import p_surface_earth
    from climatemodel_tpu.models import ensemble
    from climatemodel_tpu.models.grey import GreyGas

    world = GreyGas(nz=NZ, ny=1, tau_lw_func='scale_height',
                    tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
    F_values = np.linspace(800.0, 1600.0, N)
    states, forcings, p_int, p_c = ensemble.grey_ensemble(world, F_values)
    ft = jnp.asarray(1e-3, world.dtype)
    # flux_thresh tiny + delta exit on: members march to the max_steps cap,
    # so every profiled iteration is a full working step
    run = lambda: ensemble.grey_evolve_ensemble(
        states, forcings, p_int, p_c, jnp.asarray(1e-12, world.dtype),
        max_steps=N_STEPS)
    jax.block_until_ready(run())
    t0 = time.perf_counter()
    jax.block_until_ready(run())
    wall = time.perf_counter() - t0
    print(f'{N}x{NZ}, {N_STEPS} lock-step iterations: '
          f'{1e3 * wall / N_STEPS:.4f} ms/iteration ({wall:.3f} s wall)')

    outdir = '/tmp/jaxprof_grey_ens'
    os.system(f'rm -rf {outdir}')
    with jax.profiler.trace(outdir):
        jax.block_until_ready(run())

    paths = glob.glob(os.path.join(outdir, '**', '*.trace.json.gz'),
                      recursive=True)
    if not paths:
        print('no trace found under', outdir)
        return
    with gzip.open(paths[0], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    pid_names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_names[e['pid']] = e['args'].get('name', '')
    agg = {}
    total = 0.0
    for e in events:
        if e.get('ph') != 'X':
            continue
        pname = pid_names.get(e.get('pid'), '')
        if 'TPU' not in pname and 'device' not in pname.lower():
            continue
        name = e.get('name', '?')
        dur = e.get('dur', 0)
        if name.startswith('jit_') or 'module' in name.lower():
            continue
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f'device op time total {total/1e3:.2f} ms over {len(agg)} op names')
    for name, dur in top:
        print(f'  {dur/1e3:9.3f} ms  {dur/N_STEPS:8.2f} us/step  {name[:90]}')


if __name__ == '__main__':
    main()
