"""On-chip (compiled Mosaic) verification of the faithful convective kernel.

Interpret-mode bit-exactness (tests/test_pallas_convection.py) does NOT
guarantee compiled-Mosaic correctness (the Hillis-Steele suffix-scan
incident, CLAUDE.md), so ops/pallas_convection.py is gated off by default
until THIS script passes on the real chip.  Run it as soon as the axon
tunnel answers:

    python tools/verify_conv_kernel_onchip.py

It is chip-safe by construction: one process, every XLA execution is a
single bounded kernel call or a <=400-step march (well under the worker
watchdog), and all device pulls are batched.  Battery:

  1. operator parity, marched thermosphere profile + random perturbations
     (the interpret-mode test battery, compiled): expect f32 bit-exact
  2. operator parity, isothermal+heated strongly-unstable profiles
  3. operator parity, marginal profiles (upward theta gaps at 0.5/1/2/4x
     the dtype-aware tolerance's eps term, i.e. ON the decision boundary)
     — decisions MAY differ; endpoints must stay inside the 0.1 K budget
  4. full convective march conv_method='reference_kernel' vs 'reference':
     endpoint agreement in the optically active region + per-step timing

Prints one JSON line; exit 0 iff every gate passes.  On success flip the
default by exporting CLIMATEMODEL_TPU_CONV_REF_KERNEL=1 (and record the
measured numbers in PERF.md / CLAUDE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe_backend(timeout=150):
    """Shared bounded probe (utils/platform.probe_backend); platform or None."""
    from climatemodel_tpu.utils.platform import probe_backend
    info, err = probe_backend(timeout)
    return None if err is not None else info['platform']


def main():
    out = {'tool': 'verify_conv_kernel_onchip', 'ok': False}
    # --interpret-smoke: run the identical battery through the interpret-mode
    # kernel on CPU — validates THIS SCRIPT (not Mosaic) without the chip
    smoke = '--interpret-smoke' in sys.argv
    out['interpret_smoke'] = smoke
    if smoke:
        os.environ.setdefault('JAX_PLATFORMS', 'cpu')
        import jax
        jax.config.update('jax_platforms', 'cpu')
    else:
        platform = _probe_backend()
        out['platform'] = platform
        if platform != 'tpu':
            out['error'] = f'need a real TPU backend, probe said {platform!r}'
            print(json.dumps(out))
            return 1

    import numpy as np
    import jax
    import jax.numpy as jnp

    from climatemodel_tpu.constants import (R_specific, c_p_dry, g,
                                            p_surface_earth)
    from climatemodel_tpu.cli import grey_world_kwargs
    from climatemodel_tpu.models.grey import GreyGas
    from climatemodel_tpu.ops import convection as cv
    from climatemodel_tpu.ops.pallas_convection import faithful_adjust_lanes

    def thermo_world(nz=120):
        return GreyGas(nz=nz, ny=1, **grey_world_kwargs('thermosphere'))

    w0 = thermo_world()
    w0.evolve_to_equilibrium(flux_thresh=1e-1, save=False)
    p = jnp.asarray(w0.p[:, 0], jnp.float32)
    T0 = jnp.asarray(w0.T[:, 0], jnp.float32)
    alpha = R_specific * (g / c_p_dry) / g
    pi = (p / p_surface_earth) ** alpha
    wts = cv._trapz_weights(p)

    def xla_batch(T2d, thr):
        # EAGER on the host CPU backend: (a) eager arithmetic matches the
        # pinned interpret-mode battery bit-for-bit (jitting re-fuses FMAs
        # and flips near-marginal decisions — measured 0.07 K on the
        # marched profile), and (b) no eager dispatch ever crosses the
        # tunnel (r04 review: the oracle must not cost minutes of ~25 ms
        # round trips on the chip this script should occupy briefly).
        p_cpu = jnp.asarray(np.asarray(p))
        return jnp.stack([cv._reference_adjust_single(
            p_cpu, T2d[i], g / c_p_dry, thr[i], p_surface_earth)
            for i in range(T2d.shape[0])])

    cpu0 = jax.devices('cpu')[0]

    def compare(tag, T2d, budget_bitexact=True):
        thr = jnp.median(T2d, axis=1) / 4.0
        with jax.default_device(cpu0):
            want = jax.device_get(xla_batch(jnp.asarray(np.asarray(T2d)),
                                            jnp.asarray(np.asarray(thr))))
        t0 = time.perf_counter()
        got = faithful_adjust_lanes(T2d, pi, wts, thr, interpret=smoke)
        got.block_until_ready()
        wall = time.perf_counter() - t0
        got = jax.device_get(got)
        err = float(np.abs(np.asarray(got, np.float64)
                           - np.asarray(want, np.float64)).max())
        fired = bool((np.asarray(want) != np.asarray(jax.device_get(T2d)))
                     .any())
        rec = {'max_abs_err_K': err, 'adjustment_fired': fired,
               'first_call_wall_s': round(wall, 3)}
        rec['ok'] = bool(err == 0.0) if budget_bitexact else bool(err < 0.1)
        out[tag] = rec
        return rec['ok']

    rng = np.random.default_rng(0)
    ok = True

    # 1. marched profile + perturbations (the interpret battery, compiled)
    cols = [np.asarray(T0)] + [np.asarray(T0)
                               * (1 + 0.02 * rng.normal(size=T0.shape))
                               for _ in range(6)]
    ok &= compare('marched_profile', jnp.asarray(np.stack(cols), jnp.float32))

    # 2. isothermal + heated-surface strongly-unstable profiles
    iso = np.full(T0.shape, 300.0, np.float32)
    heated = [iso + np.linspace(80.0 * s, 0.0, T0.shape[0]).astype(np.float32)
              for s in (0.5, 1.0, 2.0)]
    ok &= compare('isothermal_heated', jnp.asarray(np.stack([iso] + heated)))

    # 3. marginal profiles: upward theta gaps at EXACTLY s x the f32
    # instability tolerance's eps term (16*eps*|theta|, _instability_tol) —
    # s=0.5 must read stable, s=1 sits ON the decision boundary, s=2/4 just
    # past it.  This is the one regime where Mosaic's ~6e-6-relative fast
    # reciprocal can flip a group decision vs XLA, so DECISIONS may
    # legitimately differ; endpoints must stay inside the parity budget
    # (the flipped adjustments flatten gaps of ~1e-6 relative, so the T
    # change is ~1e-6*T ~ 3e-4 K << 0.1 K).
    theta0 = np.asarray(T0 / pi, np.float64)
    theta_m = np.maximum.accumulate(theta0)            # stable envelope
    eps32 = float(np.finfo(np.float32).eps)
    marg = []
    for s in (0.5, 1.0, 2.0, 4.0):
        th = theta_m.copy()
        lower = th[0:-1:3][:th[1::3].shape[0]]
        th[1::3] = lower * (1.0 - s * 16.0 * eps32)
        marg.append((th * np.asarray(pi, np.float64)).astype(np.float32))
    ok &= compare('marginal', jnp.asarray(np.stack(marg)),
                  budget_bitexact=False)

    # 4. full convective march: kernel executor vs default, active region
    kw = dict(flux_thresh=1e-3, save=False, convective_adjust=True)
    res = {}
    for method in ('reference', 'reference_kernel'):
        world = thermo_world()
        world.evolve_to_equilibrium(conv_method=method, **kw)   # compile+run
        world = thermo_world()
        t0 = time.perf_counter()
        world.evolve_to_equilibrium(conv_method=method, **kw)
        wall = time.perf_counter() - t0
        steps = int(world._equilibrium_info.steps)
        res[method] = {'T': np.asarray(world.T, np.float64),
                       'tau': np.asarray(world.tau),
                       'ms_per_step': 1e3 * wall / steps, 'steps': steps,
                       'days_per_sec': float(world.state.t) / 86400.0 / wall}
    active = res['reference']['tau'][:, 0] > 0.03
    march_err = float(np.abs(res['reference']['T']
                             - res['reference_kernel']['T'])[active].max())
    out['march'] = {
        'endpoint_err_K': march_err,
        'ref_ms_per_step': round(res['reference']['ms_per_step'], 4),
        'kernel_ms_per_step': round(res['reference_kernel']['ms_per_step'],
                                    4),
        'ref_days_per_sec': round(res['reference']['days_per_sec'], 1),
        'kernel_days_per_sec': round(res['reference_kernel']['days_per_sec'],
                                     1),
        'speedup': round(res['reference']['ms_per_step']
                         / res['reference_kernel']['ms_per_step'], 2),
        'ok': bool(march_err < 0.1)}
    ok &= out['march']['ok']

    out['ok'] = bool(ok)
    print(json.dumps(out))
    return 0 if ok else 2


if __name__ == '__main__':
    sys.exit(main())
