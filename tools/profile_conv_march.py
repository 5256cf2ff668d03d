"""Capture jax.profiler traces of the convective march with constant vs
dynamic forcing and print the per-op device-time breakdown from the
trace.json.gz (Chrome trace) — no TensorBoard needed.

    python tools/profile_conv_march.py [variant] [nz]
variant in {const, dyn} — const closes over the forcing (fast),
dyn passes it through the jit boundary (the production path, ~3x slower).
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

from climatemodel_tpu.models import column
from climatemodel_tpu.models.grey import GreyGas, grey_net_flux

VARIANT = sys.argv[1] if len(sys.argv) > 1 else 'dyn'
NZ = int(sys.argv[2]) if len(sys.argv) > 2 else 150
N_STEPS = 300


def main():
    from climatemodel_tpu.cli import grey_world_kwargs
    w = GreyGas(nz=NZ, ny=1, **grey_world_kwargs('thermosphere'))
    p_int = jnp.asarray(w.p_interface, w.dtype)
    p_c = jnp.asarray(w.p[:, 0], w.dtype)
    forcing = w.forcing
    st0 = w.state
    dtype = w.dtype

    if VARIANT == 'const':
        @jax.jit
        def run(st):
            net_fn = lambda T: grey_net_flux(T, forcing)
            st2, info = column.evolve_to_equilibrium(
                st, net_fn, p_int, p_c,
                flux_thresh=jnp.asarray(1e-9, dtype), convective_adjust=True,
                t_end=1e9, max_steps=N_STEPS, conv_method='reference')
            return st2.T, info.steps
        go = lambda: jax.block_until_ready(run(st0))
    else:
        @jax.jit
        def run(st, fc):
            net_fn = lambda T: grey_net_flux(T, fc)
            st2, info = column.evolve_to_equilibrium(
                st, net_fn, p_int, p_c,
                flux_thresh=jnp.asarray(1e-9, dtype), convective_adjust=True,
                t_end=1e9, max_steps=N_STEPS, conv_method='reference')
            return st2.T, info.steps
        go = lambda: jax.block_until_ready(run(st0, forcing))

    go()                                    # compile + warm
    t0 = time.perf_counter()
    go()
    wall = time.perf_counter() - t0
    print(f'{VARIANT}: {1e3 * wall / N_STEPS:.4f} ms/step')

    outdir = f'/tmp/jaxprof_{VARIANT}'
    os.system(f'rm -rf {outdir}')
    with jax.profiler.trace(outdir):
        go()

    # find the trace.json.gz and aggregate device-op durations
    paths = glob.glob(os.path.join(outdir, '**', '*.trace.json.gz'),
                      recursive=True)
    if not paths:
        print('no trace found under', outdir)
        return
    with gzip.open(paths[0], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # device events live on pids whose process_name mentions TPU/device
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
        # skip the top-level module span (it overlaps everything)
        name = e.get('name', '?')
        dur = e.get('dur', 0)
        if name.startswith('jit_run') or 'module' in name.lower():
            continue
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f'device op time total {total/1e3:.2f} ms over {len(agg)} op names')
    for name, dur in top:
        print(f'  {dur/1e3:9.3f} ms  {dur/N_STEPS:8.2f} us/step  {name[:90]}')


if __name__ == '__main__':
    main()
