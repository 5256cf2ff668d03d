"""On-chip validation + timing of the sublane-packed grey lw flux kernel.

r05 follow-on to the MFU-frontier experiment (PERF.md): the (1, 128) row
walk issues one single-sublane vector op per level per quantity; packing 8
member rows per op as native (8, 128) tiles (ops/pallas_two_stream.py
``_lw_lanes_packed``, engaged at b >= 1024) promises ~8x fewer issued
instructions for the same dependency-chain length.  Interpret mode is
bit-exact (tests/test_two_stream.py) but this repo has twice seen
interpret-exact kernels miscompile in Mosaic, so the packed grid must be
proven BIT-EQUAL to both the proven row kernel and the XLA sequential
reference on the real chip before it ships — and timed, so the PERF.md
claim is a measurement, not a hope.

Timing methodology matters on the tunnel: isolated per-call timings are
launch-latency-dominated and once showed the packed kernel 6% SLOWER while
the chained-device measurement (below: K calls data-chained inside ONE jit)
showed it 1.37x FASTER — and the end-to-end ensemble bench confirmed +11%.

    python tools/verify_packed_lw_onchip.py
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
from jax import lax

from climatemodel_tpu.ops.pallas_two_stream import (_lw_lanes_packed,
                                                    _lw_lanes_rows)
from climatemodel_tpu.ops.two_stream import lw_flux_sequential


def _time_chained(kernel, args, n, K=500, reps=3):
    """ms per kernel call, measured as K data-chained calls inside one jit
    (a dependency through T forces sequential execution on-device)."""
    T0, dtau, toa = args

    @jax.jit
    def f(T, dtau, toa):
        def body(i, T):
            up, dn = kernel(T, dtau, toa)
            return T + 1e-12 * (up[:n] - dn[:n])
        return lax.fori_loop(0, K, body, T)

    _ = float(jnp.sum(f(T0, dtau, toa)))       # compile + full sync
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(jnp.sum(f(T0, dtau, toa)))   # host pull = real sync
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    n, b = 59, 4096                      # the grey-ensemble bench shape
    rng = np.random.default_rng(7)
    T = jnp.asarray(200 + 100 * rng.random((n, b)), jnp.float32)
    dtau = jnp.asarray(0.2 * rng.random((n, b)), jnp.float32)
    toa = jnp.asarray(200 + 50 * rng.random((b,)), jnp.float32)

    packed = jax.jit(_lw_lanes_packed)
    rows = jax.jit(_lw_lanes_rows)
    seq = jax.jit(lw_flux_sequential)

    up_p, dn_p = jax.device_get(packed(T, dtau, toa))
    up_r, dn_r = jax.device_get(rows(T, dtau, toa))
    up_s, dn_s = jax.device_get(seq(T, dtau, toa))

    res = {'backend': jax.default_backend(), 'n': n, 'b': b}
    res['packed_vs_rows_bit_equal'] = bool(
        (up_p == up_r).all() and (dn_p == dn_r).all())
    res['packed_vs_xla_seq_bit_equal'] = bool(
        (up_p == up_s).all() and (dn_p == dn_s).all())
    res['packed_vs_rows_max_abs'] = float(
        max(np.abs(up_p - up_r).max(), np.abs(dn_p - dn_r).max()))

    res['rows_ms'] = round(_time_chained(_lw_lanes_rows, (T, dtau, toa), n), 4)
    res['packed_ms'] = round(_time_chained(_lw_lanes_packed, (T, dtau, toa),
                                           n), 4)
    res['speedup'] = round(res['rows_ms'] / res['packed_ms'], 2)

    ok = (res['packed_vs_rows_bit_equal']
          and res['packed_vs_xla_seq_bit_equal']
          and res['packed_ms'] <= res['rows_ms'] * 1.05)
    res['ok'] = ok
    print(json.dumps(res))
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
