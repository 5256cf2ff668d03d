"""Real-gas band radiation experiments (reference driver: real_gas_script.py).

The upstream raw HITRAN line lists are not distributed; the Earth-composition
run uses the package's fabricated earth-like tables (generated at first boot,
climatemodel_tpu.spectral.earth_tables) — drop real HITRAN-derived tables into
CLIMATEMODEL_TPU_LUT_DIR to upgrade it to true spectroscopy.  The default
animated run uses the ``single_line`` toy gas (the reference's own fixture,
real_gas_script.py:16-25).
"""
import os
import sys

# allow running from any cwd without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from climatemodel_tpu.utils.platform import honor_platform_env
honor_platform_env()   # JAX_PLATFORMS=cpu must beat the TPU plugin

import matplotlib
if os.environ.get('DISPLAY', '') == '':
    matplotlib.use('Agg')
import matplotlib.pyplot as plt

from climatemodel_tpu.diagnostics.animation import Animate
from climatemodel_tpu.models.real_gas import RealGas
from climatemodel_tpu.spectral import earth_tables, humidity

OUT = os.path.dirname(__file__)
conv_adjust = False

'''Making hitran absorption coef data (real_gas_script.py:15-25)'''
# from climatemodel_tpu.spectral import hitran
# hitran.make_single_line_table()          # fabricated toy gas
# hitran.make_table('CO2', wavenumber_array=np.arange(0, 1505, 10.0))

'''Earth composition (real_gas_script.py:43-59): fabricated earth-like tables
are generated on first run; marching the 4-gas column to equilibrium'''
earth_tables.ensure_earth_tables()
earth = RealGas(nz='auto', ny=1, molecule_names=['CO2', 'CH4', 'H2O', 'O3'],
                T_g=265.19, p_toa=0.1, temp_change=1, delta_temp_change=0.1)
# t_end=20: the reference's 2-model-year cap stops ~70 steps short of true
# convergence for this composition (delta 1.2e-2 vs the 1e-3 threshold)
earth.evolve_to_equilibrium(flux_thresh=1e-3, save=False, t_end=20.0,
                            convective_adjust=conv_adjust)
ax = earth.plot_olr()
ax.figure.savefig(os.path.join(OUT, 'real_gas_earth_olr.png'), dpi=90)
print(f'earth column: nz={earth.nz}, '
      f'bands={len(earth.nu_bands["delta"])}, '
      f'T surface={earth.T[-1, 0]:.1f} K, '
      f'equilibrium={bool(earth._equilibrium_info.equilibrium)}')

'''Insolation sweep as one vmapped ensemble (framework extra): 16 earth
columns sharing the transmission cache march together — the batched GEMM
path, ~20x the aggregate throughput of marching them one by one.  200
Planck-equalised bands (the centa scale): at the default 40 bands the
chunkier band fluxes drive some members into oscillatory limit cycles
above the 1e-3 threshold.'''
from climatemodel_tpu.models import ensemble
import jax.numpy as jnp
import numpy as np
earth200 = RealGas(nz='auto', ny=1, molecule_names=['CO2', 'CH4', 'H2O', 'O3'],
                   T_g=265.19, p_toa=0.1, n_nu_bands=200, temp_change=0.5,
                   delta_temp_change=0.1)
states, sc, T_gs, eargs = ensemble.real_gas_ensemble(
    earth200, F_scales=np.linspace(0.9, 1.1, 16))
fs, info = ensemble.real_gas_evolve_ensemble(
    states, sc, T_gs, *eargs, jnp.asarray(1e-3, earth200.dtype), t_end=20.0)
import jax
eqb_np, T_sfc = jax.device_get((info.equilibrium, fs.T[:, -1, 0]))
print(f'insolation sweep: {int(eqb_np.sum())}/16 converged, '
      f'surface-air T {float(T_sfc.min()):.1f}..{float(T_sfc.max()):.1f} K')

'''Evolving CO2 conc - GHG ladder (real_gas_script.py:27-40): the reference
marches each concentration sequentially; here the whole ladder is ONE vmapped
march with a per-member optical depth (stacked_tau=True)'''
# def with_co2(multiplier):              # reference pattern: full-arg dicts
#     base = dict(earth.q_funcs_args)
#     base['CO2'] = (base['CO2'][0] * multiplier, *base['CO2'][1:])
#     return RealGas(nz=50, ny=1, molecule_names=['CO2', 'CH4', 'H2O', 'O3'],
#                    T_g=265.19, temp_change=1, delta_temp_change=0.1,
#                    q_funcs_args=base)
# ladder = [with_co2(m) for m in (1.0, 50.0)]
# states, sc, T_gs, largs = ensemble.real_gas_compos_ensemble(ladder)
# fs, info = ensemble.real_gas_evolve_ensemble(
#     states, sc, T_gs, *largs, jnp.asarray(1e-3, ladder[0].dtype),
#     stacked_tau=True)
# # ... and the 'finding list of ground temp eqb' variant: every ladder rung's
# # T_g solved at once (vectorised secant, each trial one vmapped march)
# Tg, _, info = ensemble.real_gas_find_Tg_ensemble(
#     states, sc, T_gs, largs, stacked_tau=True)

'''Single-line toy gas'''
gas = RealGas(nz='auto', ny=1, molecule_names=['single_line'], T_g=265.19,
              q_funcs={'single_line': humidity.co2},
              q_funcs_args={'single_line': ()}, delta_temp_change=0.1)
flux_dict = {'lw_up': [], 'lw_down': [], 'sw_up': [], 'sw_down': []}
data = {'t': [], 'T': [], 'flux': flux_dict}
data = gas.save_data(data, 0)
data = gas.evolve_to_equilibrium(data, flux_thresh=1e-3,
                                 convective_adjust=conv_adjust, t_end=2.0,
                                 save=True)
anim = Animate(gas, data['T'], data['t'], flux_array=data['flux'],
               nPlotFrames=70).anim
anim.save(os.path.join(OUT, 'real_gas_equilibrium.gif'), writer='pillow',
          fps=10)
ax = gas.plot_olr()
ax.figure.savefig(os.path.join(OUT, 'real_gas_olr.png'), dpi=90)
ax2 = gas.plot_incoming_short_wave()
ax2.figure.savefig(os.path.join(OUT, 'real_gas_sw.png'), dpi=90)
print(f'real gas: nz={gas.nz}, T_g={gas.T_g:.2f} K, '
      f'T surface={gas.T[-1, 0]:.1f} K (plots saved)')
