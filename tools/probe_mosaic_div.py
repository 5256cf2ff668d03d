"""Probe: is f32 division in compiled Mosaic bit-exact vs XLA on this chip?

Decides whether a FULLY fused march-step kernel (tendency = g/c_p *
flux_diff / dp and dt = delta_t / |max_tend| in-kernel) can be bit-identical
to the XLA path.  CLAUDE.md records that the literal ``1.0/x`` lowers to a
~6e-6-relative fast reciprocal; whether general ``a/b`` does too has never
been measured here.  Patterns probed: a/b, c*a/b (the tendency form, c a
folded constant), a/|b| (the dt form), across magnitudes.

    python tools/probe_mosaic_div.py
prints one JSON line; exit 0 if ALL patterns are bit-exact.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

C = np.float32(9.81 / 1004.64)          # a g/c_p-like folded constant


def _kernel(a_ref, b_ref, o1_ref, o2_ref, o3_ref):
    a = a_ref[:, :]
    b = b_ref[:, :]
    o1_ref[:, :] = a / b
    o2_ref[:, :] = C * a / b
    o3_ref[:, :] = a / jnp.abs(b)


@jax.jit
def via_pallas(a, b):
    return pl.pallas_call(
        _kernel,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype)] * 3,
    )(a, b)


@jax.jit
def via_xla(a, b):
    return a / b, C * a / b, a / jnp.abs(b)


def main():
    rng = np.random.default_rng(11)
    # magnitudes spanning the march's ranges: fluxes ~1e-3..1e3 over
    # pressure differences ~1e-1..1e4, tendencies ~1e-9..1e0
    a = jnp.asarray(np.float32(10.0 ** rng.uniform(-6, 4, (256, 128))
                               * rng.choice([-1, 1], (256, 128))))
    b = jnp.asarray(np.float32(10.0 ** rng.uniform(-4, 5, (256, 128))
                               * rng.choice([-1, 1], (256, 128))))
    outs_p = jax.device_get(via_pallas(a, b))
    outs_x = jax.device_get(via_xla(a, b))
    res = {'backend': jax.default_backend()}
    names = ['a_div_b', 'c_mul_a_div_b', 'a_div_abs_b']
    ok = True
    for name, p, x in zip(names, outs_p, outs_x):
        eq = bool(np.array_equal(p, x))
        with np.errstate(divide='ignore', invalid='ignore'):
            rel = np.abs(p - x) / np.maximum(np.abs(x), 1e-30)
        res[name] = {'bit_equal': eq,
                     'max_rel': float(np.nanmax(rel)),
                     'frac_differ': float(np.mean(p != x))}
        ok &= eq
    res['ok'] = ok
    print(json.dumps(res))
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
