"""Walkthrough: how the convective adjustment algorithm works.

Runnable translation of the reference's Convective Adjustment notebook
(/root/reference/notebooks/Convective Adjustment.ipynb) onto the TPU-native
framework — same thermosphere example, same step-by-step construction, same
enthalpy printouts (notebook cells 10-12).

The physics: convection develops wherever the lapse rate is supercritical,
dT/dz < -gamma with gamma = g/c_p the dry adiabat.  In pressure coordinates
that is dtheta/dp > 0 for the potential temperature theta = T/(p/p0)^alpha
with alpha = R gamma / g (notebook eqs 5-9; convective_adjustment.py:58-59).
The adjustment flattens each unstable run of levels onto a constant-theta
(adiabatic) profile while conserving column enthalpy H = -integral(T dp)
(first law with dq totalling zero over the column, notebook eq 4):

1. march the thermosphere world to RADIATIVE equilibrium — its lower
   atmosphere ends up convectively unstable (the greenhouse profile is
   steeper than the adiabat);
2. find the connected unstable runs of levels (theta decreasing with
   height... i.e. theta_diff < -1e-10 going up, convective_adjustment.py:62);
3. for the first run, build the TWO flattened candidate profiles — theta set
   to the value just above the run ('lower', cools) and to the value at its
   base ('upper', warms).  NEITHER conserves enthalpy (cell 10's printout);
4. blend them, T = beta*T_upper + (1-beta)*T_lower with beta chosen so the
   blend's enthalpy equals the original (eq 10-11;
   convective_adjustment.py:102-105) — the printout shows H_final == H_0;
5. repeat over all runs until stable — that whole iteration is what
   ``climatemodel_tpu.ops.convection.convective_adjustment`` (the faithful
   ``method='reference'``) runs as one fused XLA op; the walkthrough checks
   its output removes every unstable level at conserved enthalpy and lowers
   the surface temperature (notebook's closing observation).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from climatemodel_tpu.utils.platform import honor_platform_env
honor_platform_env()   # JAX_PLATFORMS=cpu must beat the TPU plugin

import matplotlib
if os.environ.get('DISPLAY', '') == '':
    matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

from climatemodel_tpu.constants import R_specific, c_p_dry, g, p_surface_earth
from climatemodel_tpu.models.grey import GreyGas
from climatemodel_tpu.ops.convection import (convective_adjustment,
                                             get_enthalpy, get_theta)

OUT = os.path.dirname(__file__)


def find_unstable_groups(theta, small=1e-10):
    """Connected runs of unstable levels, exactly like the reference's
    groupby construction (convective_adjustment.py:60-71 / notebook cell 4):
    duplicate the last diff so the array matches the level count, flag
    theta_diff < -small (pressure is DEcreasing with index).  ``small`` may
    be a per-level array (the f32 operator's dtype-aware tolerance)."""
    d = np.diff(theta)
    d = np.concatenate([d, d[-1:]])
    small = np.broadcast_to(np.asarray(small), d.shape)
    unstable = np.where(d < -small)[0]
    groups = []
    for lev in unstable:
        if groups and lev == groups[-1][-1] + 1:
            groups[-1].append(int(lev))
        else:
            groups.append([int(lev)])
    return groups


def candidate_profiles(T, theta, pi, group):
    """The notebook's get_adjust_theta (cell 6; convective_adjustment.py:74-94):
    flatten theta over the run anchored just ABOVE it ('lower') and at its
    BASE ('upper'), extending each flat region until the profile is stable."""
    n = T.size
    idx = np.arange(n)
    out = {}
    # 'lower': theta of the level just above the run, applied down to the
    # first level below it with smaller theta
    lo_anchor = min(group[-1] + 1, n - 1)
    theta_lo = theta[lo_anchor]
    low_levels = idx[(theta < theta_lo) & (idx < lo_anchor)]
    start = (low_levels.max() + 1) if low_levels.size else 0
    T_lower = T.copy()
    T_lower[start:lo_anchor + 1] = theta_lo * pi[start:lo_anchor + 1]
    out['lower'] = T_lower
    # 'upper': theta at the run's base, applied up to the first level above
    # with larger theta
    hi_anchor = group[0]
    theta_hi = theta[hi_anchor]
    hi_levels = idx[(theta > theta_hi) & (idx > hi_anchor)]
    stop = hi_levels.min() if hi_levels.size else n - 1
    T_upper = T.copy()
    T_upper[hi_anchor:stop + 1] = theta_hi * pi[hi_anchor:stop + 1]
    out['upper'] = T_upper
    return out


def run_walkthrough(nz=150, flux_thresh=1e-1, save_png=True, verbose=True):
    say = print if verbose else (lambda *a, **k: None)
    # 1. thermosphere world (radiation_script.py:33-36) to RADIATIVE
    #    equilibrium — convection deliberately off so the instability shows
    world = GreyGas(nz=nz, ny=1,
                    tau_lw_func='scale_height_and_peak_in_atmosphere',
                    tau_lw_func_args=[51000, 4, 100, 600, 0.1],
                    tau_sw_func='scale_height_and_peak_in_atmosphere',
                    tau_sw_func_args=[p_surface_earth, 0.12, 100, 20, 0.002])
    world.evolve_to_equilibrium(flux_thresh=flux_thresh, save=False)
    p = np.asarray(world.p[:, 0], np.float64)          # surface first
    T0 = np.asarray(world.T[:, 0], np.float64)

    # 2. potential temperature and the unstable runs
    lapse = g / c_p_dry
    alpha = R_specific * lapse / g
    pi = (p / p_surface_earth) ** alpha
    theta0 = np.asarray(get_theta(T0, p, p_surface_earth, alpha))
    groups = find_unstable_groups(theta0)
    say(f'radiative equilibrium: nz={world.nz}, '
        f'T_surface={T0[0]:.2f} K')
    say(f'unstable runs of levels (theta falling with height): '
        f'{[f"{gr[0]}-{gr[-1]}" for gr in groups]}')
    assert groups, 'the thermosphere profile should be unstable near the surface'

    # 3. candidate flattened profiles for the first (near-surface) run and
    #    their enthalpies — neither conserves H (notebook cell 10)
    H0 = float(get_enthalpy(T0, p))
    cand = candidate_profiles(T0, theta0, pi, groups[0])
    H_lo = float(get_enthalpy(cand['lower'], p))
    H_hi = float(get_enthalpy(cand['upper'], p))
    say(f'Initial Enthalpy:    {H0:.6e}')
    say(f'theta_low Enthalpy:  {H_lo:.6e}   (cools: too little energy)')
    say(f'theta_upper Enthalpy:{H_hi:.6e}   (warms: too much energy)')

    # 4. the enthalpy-conserving blend (notebook eq 10-11)
    beta = (H0 - H_lo) / (H_hi - H_lo)
    T_blend = beta * cand['upper'] + (1 - beta) * cand['lower']
    H_blend = float(get_enthalpy(T_blend, p))
    say(f'beta = {beta:.4f}')
    say(f'Final Enthalpy:      {H_blend:.6e}   '
        f'(conserved to {abs(H_blend / H0 - 1):.2e} relative)')
    assert abs(H_blend / H0 - 1) < 1e-12

    # 5. the library operator runs that iteration over ALL runs as one fused
    #    op — stable everywhere, enthalpy conserved, surface cooled
    T_adj = np.asarray(convective_adjustment(p, T0, method='reference'),
                       np.float64)
    theta_adj = np.asarray(get_theta(T_adj, p, p_surface_earth, alpha))
    # stability is judged at the operator's own tolerance: the world runs
    # f32, where theta carries ~16 eps_f32 |theta| of round-trip noise
    # (ops/convection.py _instability_tol) — at the micro-mass high-theta
    # top levels that is far above the reference's f64-calibrated 1e-10
    tol = np.maximum(1e-10, 16 * np.finfo(np.float32).eps * np.abs(theta_adj))
    groups_after = find_unstable_groups(theta_adj, small=tol)
    H_adj = float(get_enthalpy(T_adj, p))
    say(f'full operator: unstable levels after = '
        f'{sum(len(gr) for gr in groups_after)} (at the f32 tolerance), '
        f'enthalpy drift = {abs(H_adj / H0 - 1):.2e} relative')
    say(f'surface temperature {T0[0]:.2f} K -> {T_adj[0]:.2f} K '
        '(cooled: the near-surface gradient relaxed to the adiabat)')
    assert not groups_after
    assert abs(H_adj / H0 - 1) < 1e-5     # f32 arithmetic in the operator
    assert T_adj[0] < T0[0]

    if save_png:
        fig, axs = plt.subplots(1, 2, sharey=True, figsize=(12, 6))
        for ax in axs:
            ax.set_yscale('log')
            ax.set_ylim(p.max() * 1.05, p.min())
            ax.set_ylabel('Pressure / Pa')
        axs[0].plot(T0, p, label='radiative equilibrium')
        axs[0].plot(cand['lower'], p, 'k--', lw=1,
                    label=r'$T(\theta_{low})$ candidate')
        axs[0].plot(cand['upper'], p, 'r--', lw=1,
                    label=r'$T(\theta_{upper})$ candidate')
        axs[0].plot(T_adj, p, color='tab:orange', label='adjusted (blend)')
        axs[0].set_xlabel('Temperature / K')
        axs[0].legend(fontsize=8)
        axs[1].plot(theta0, p, label='original')
        axs[1].plot(theta_adj, p, color='tab:orange', label='adjusted')
        for gr in groups:
            axs[1].axhspan(p[gr[0]], p[min(gr[-1] + 1, p.size - 1)],
                           color='red', alpha=0.15)
        axs[1].set_xlabel(r'Potential temperature $\theta$ / K')
        axs[1].set_xlim(theta0.min() * 0.95,
                        np.percentile(theta0, 75))
        axs[1].legend(fontsize=8)
        fig.suptitle('Convective adjustment: enthalpy-conserving flattening '
                     'of unstable runs')
        fig.tight_layout()
        path = os.path.join(OUT, 'walkthrough_convective_adjustment.png')
        fig.savefig(path, dpi=90)
        plt.close(fig)
        say(f'saved {os.path.basename(path)}')
    return {'world': world, 'T0': T0, 'T_adj': T_adj, 'groups': groups,
            'H0': H0, 'H_adj': H_adj, 'beta': beta}


if __name__ == '__main__':
    run_walkthrough(nz=150)
