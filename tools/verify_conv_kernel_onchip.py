"""On-chip (compiled Mosaic) verification of the faithful convective kernel.

Interpret-mode bit-exactness (tests/test_pallas_convection.py) does NOT
guarantee compiled-Mosaic correctness (the Hillis-Steele suffix-scan
incident, CLAUDE.md), so this script gates ops/pallas_convection.py on the
real chip:

    python tools/verify_conv_kernel_onchip.py

Gate design (r04 rework — the original gates demanded bit-exactness between
the TPU kernel and an eager-CPU oracle, which the DEFAULT XLA executor
itself does not have: on marched/marginal thermosphere profiles the
group-blend decision cascade is platform-chaotic, and XLA-jitted-on-TPU vs
eager-CPU measured 7.7 K on the same inputs while CPU f32 vs f64 marches of
the same config differ 0.96 K — the f32 fixed point itself moves K-scale):

  1. mosaic: compiled vs interpret-mode kernel, SAME process, SAME inputs,
     over the whole battery (marched+perturbed, strongly-unstable,
     decision-boundary marginal) — must be BIT-EXACT.  This is the actual
     miscompile gate: interpret mode executes the identical program as
     plain XLA ops on this chip.
  2. strong_operator: kernel vs the eager-CPU XLA core on strongly-unstable
     profiles (unambiguous decisions; residual = Mosaic's ~6e-6 reciprocal
     + reduction order) — < 0.1 K.
  3. platform_spread: on the marched battery the kernel's distance from
     the CPU oracle must not exceed 2x the DEFAULT executor's own
     (XLA-jitted-on-TPU vs eager-CPU) distance — the kernel adds no
     platform sensitivity the XLA path doesn't already have (measured r04:
     8.02 vs 8.01 K — identical chaos).  The decision-boundary 'marginal'
     battery is reported but NOT gated: it is coin-toss chaos by
     construction, and the kernel's flip band is legitimately ~3x wider
     (Mosaic's ~6e-6-relative reciprocal vs XLA's 16*eps ~ 1.9e-6), so its
     spread (0.50 vs 0.18 K measured) reflects tie-breaking, not error;
     gate 1 already pins Mosaic bit-exactness ON that battery.
  4. march: both executors march the thermosphere world twice (tests march
     twice for tight equilibria — CLAUDE.md) and the kernel endpoint's
     error vs the f64 CPU truth (computed in a CPU subprocess, cached in
     the temp dir) must be <= max(1.5x the default executor's error,
     0.1 K).  Measured r04 on v5e: kernel 1.38-1.41 K vs default executor
     1.57-5.3 K (the kernel lands CLOSER to the f64 fixed point), 7.2 ->
     1.04 ms/step.

Chip-safe by construction: one process, every XLA execution is a single
bounded kernel call or an adaptive march (well under the worker watchdog),
all device pulls batched, the f64 truth runs on CPU in a subprocess.
Prints one JSON line; exit 0 iff every gate passes.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_F64_TRUTH_SRC = r"""
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'; os.environ['JAX_ENABLE_X64'] = '1'
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu'); jax.config.update('jax_enable_x64', True)
import numpy as np
from climatemodel_tpu.cli import grey_world_kwargs
from climatemodel_tpu.models.grey import GreyGas
w = GreyGas(nz={nz}, ny=1, dtype=np.dtype('float64'), **grey_world_kwargs({world!r}))
for _ in range(2):
    w.evolve_to_equilibrium(flux_thresh={ft}, save=False, convective_adjust=True,
                            conv_method='reference')
np.savez({path!r}, T64=np.asarray(w.T, np.float64), tau=np.asarray(w.tau, np.float64))
"""


def _probe_backend(timeout=150):
    """Shared bounded probe (utils/platform.probe_backend); platform or None."""
    from climatemodel_tpu.utils.platform import probe_backend
    info, err = probe_backend(timeout)
    return None if err is not None else info['platform']


def _f64_truth(world, nz, flux_thresh):
    """March the f64 reference truth on CPU in a subprocess (cached npz)."""
    import numpy as np
    path = os.path.join(tempfile.gettempdir(),
                        f'cmt_conv_f64_{world}_nz{nz}_ft{flux_thresh:g}.npz')
    if not os.path.exists(path):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        src = _F64_TRUTH_SRC.format(repo=repo, nz=nz, world=world,
                                    ft=flux_thresh, path=path)
        env = {k: v for k, v in os.environ.items() if k != 'JAX_PLATFORMS'}
        subprocess.run([sys.executable, '-c', src], check=True, env=env,
                       timeout=1200, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
    d = np.load(path)
    return d['T64'], d['tau']


def main():
    out = {'tool': 'verify_conv_kernel_onchip', 'ok': False}
    # --interpret-smoke: run the battery through the interpret-mode kernel
    # on CPU — validates THIS SCRIPT (not Mosaic) without the chip
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

    NZ = 120

    def thermo_world():
        return GreyGas(nz=NZ, ny=1, **grey_world_kwargs('thermosphere'))

    w0 = thermo_world()
    w0.evolve_to_equilibrium(flux_thresh=1e-1, save=False)
    p = jnp.asarray(w0.p[:, 0], jnp.float32)
    T0 = jnp.asarray(w0.T[:, 0], jnp.float32)
    alpha = R_specific * (g / c_p_dry) / g
    pi = (p / p_surface_earth) ** alpha
    wts = cv._trapz_weights(p)
    p_np = np.asarray(p)

    def oracle_cpu(T2d_np, thr_np):
        """The XLA core, EAGER on the host CPU backend: (a) eager arithmetic
        matches the pinned interpret-mode battery bit-for-bit (jitting
        re-fuses FMAs and flips near-marginal decisions — measured 0.07 K),
        and (b) no eager dispatch ever crosses the tunnel."""
        cpu0 = jax.devices('cpu')[0]
        with jax.default_device(cpu0):
            p_cpu = jnp.asarray(p_np)
            T2 = jnp.asarray(T2d_np)
            th = jnp.asarray(thr_np)
            return np.stack([np.asarray(cv._reference_adjust_single(
                p_cpu, T2[i], g / c_p_dry, th[i], p_surface_earth))
                for i in range(T2.shape[0])]).astype(np.float64)

    xla_tpu = jax.jit(lambda T2, th: jax.vmap(
        lambda Tc, t: cv._reference_adjust_single(
            p, Tc, g / c_p_dry, t, p_surface_earth))(T2, th))

    # ---- batteries ------------------------------------------------------
    rng = np.random.default_rng(0)
    marched = np.stack([np.asarray(T0)] + [
        np.asarray(T0) * (1 + 0.02 * rng.normal(size=T0.shape))
        for _ in range(6)]).astype(np.float32)
    iso = np.full(T0.shape, 300.0, np.float32)
    strong = np.stack([iso] + [
        iso + np.linspace(80.0 * s, 0.0, T0.shape[0]).astype(np.float32)
        for s in (0.5, 1.0, 2.0)])
    # marginal: upward theta gaps at EXACTLY s x the f32 tolerance's eps term
    theta_m = np.maximum.accumulate(np.asarray(T0 / pi, np.float64))
    eps32 = float(np.finfo(np.float32).eps)
    marg = []
    for s in (0.5, 1.0, 2.0, 4.0):
        th = theta_m.copy()
        lower = th[0:-1:3][:th[1::3].shape[0]]
        th[1::3] = lower * (1.0 - s * 16.0 * eps32)
        marg.append((th * np.asarray(pi, np.float64)).astype(np.float32))
    marg = np.stack(marg)

    batteries = {'marched': marched, 'strong': strong, 'marginal': marg}
    thresholds = {k: np.median(v, axis=1) / 4.0 for k, v in batteries.items()}

    ok = True

    # ---- gate 1: compiled Mosaic == interpret, bit-exact -----------------
    g1 = {}
    for name, T2d_np in batteries.items():
        T2d = jnp.asarray(T2d_np)
        thr = jnp.asarray(thresholds[name])
        a = np.asarray(faithful_adjust_lanes(T2d, pi, wts, thr,
                                             interpret=False))
        b = np.asarray(faithful_adjust_lanes(T2d, pi, wts, thr,
                                             interpret=True))
        g1[name] = float(np.abs(a.astype(np.float64)
                                - b.astype(np.float64)).max())
    out['mosaic'] = {'max_abs_err_K': g1, 'ok': all(v == 0.0
                                                    for v in g1.values())}
    ok &= out['mosaic']['ok']

    # ---- gate 2: strong-instability operator parity vs CPU oracle --------
    want = oracle_cpu(strong, thresholds['strong'])
    got = np.asarray(faithful_adjust_lanes(
        jnp.asarray(strong), pi, wts, jnp.asarray(thresholds['strong'])),
        np.float64)
    err = float(np.abs(got - want).max())
    out['strong_operator'] = {'max_abs_err_K': err, 'ok': bool(err < 0.1)}
    ok &= out['strong_operator']['ok']

    # ---- gate 3: platform spread no worse than the default executor ------
    g3 = {}
    for name in ('marched', 'marginal'):
        T2d_np, thr_np = batteries[name], thresholds[name]
        want = oracle_cpu(T2d_np, thr_np)
        kern = np.asarray(faithful_adjust_lanes(
            jnp.asarray(T2d_np), pi, wts, jnp.asarray(thr_np)), np.float64)
        dflt = np.asarray(xla_tpu(jnp.asarray(T2d_np), jnp.asarray(thr_np)),
                          np.float64)
        e_k = float(np.abs(kern - want).max())
        e_d = float(np.abs(dflt - want).max())
        rec = {'kernel_vs_cpu_K': e_k, 'default_vs_cpu_K': e_d}
        if name == 'marched':
            rec['ok'] = bool(e_k <= 2.0 * max(e_d, 0.05))
            ok &= rec['ok']
        # 'marginal' is informational only — see the module docstring
        g3[name] = rec
    out['platform_spread'] = g3

    # ---- gate 4: march endpoint vs f64 truth + timing --------------------
    T64, tau64 = _f64_truth('thermosphere', NZ, 1e-3)
    active = tau64[:, 0] > 0.03
    kw = dict(flux_thresh=1e-3, save=False, convective_adjust=True)
    res = {}
    for method in ('reference', 'reference_kernel'):
        world = thermo_world()
        world.evolve_to_equilibrium(conv_method=method, **kw)  # compile+run
        world = thermo_world()
        t0 = time.perf_counter()
        world.evolve_to_equilibrium(conv_method=method, **kw)
        wall = time.perf_counter() - t0
        steps = int(world._equilibrium_info.steps)
        world.evolve_to_equilibrium(conv_method=method, **kw)  # march twice
        res[method] = {
            'err_vs_f64_K': float(np.abs(np.asarray(world.T, np.float64)
                                         - T64)[active].max()),
            'ms_per_step': 1e3 * wall / steps, 'steps': steps,
            'days_per_sec': float(world.state.t) / 86400.0 / wall}
    e_k = res['reference_kernel']['err_vs_f64_K']
    e_d = res['reference']['err_vs_f64_K']
    out['march'] = {
        'kernel_err_vs_f64_K': e_k,
        'ref_err_vs_f64_K': e_d,
        'ref_ms_per_step': round(res['reference']['ms_per_step'], 4),
        'kernel_ms_per_step': round(res['reference_kernel']['ms_per_step'],
                                    4),
        'ref_days_per_sec': round(res['reference']['days_per_sec'], 1),
        'kernel_days_per_sec': round(res['reference_kernel']['days_per_sec'],
                                     1),
        'speedup': round(res['reference']['ms_per_step']
                         / res['reference_kernel']['ms_per_step'], 2),
        'ok': bool(e_k <= max(1.5 * e_d, 0.1))}
    ok &= out['march']['ok']

    out['ok'] = bool(ok)
    print(json.dumps(out))
    return 0 if ok else 2


if __name__ == '__main__':
    sys.exit(main())
