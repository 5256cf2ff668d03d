"""Grey-gas radiation experiments (reference driver: radiation_script.py).

Four experiment blocks, config-as-code like the reference; the thermosphere
world and the ice-albedo stellar sweep run by default.  Run with MPLBACKEND=Agg
for headless use; animations/figures are saved next to this script.
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
import numpy as np

from climatemodel_tpu.constants import F_sun, p_surface_earth
from climatemodel_tpu.diagnostics.animation import Animate
from climatemodel_tpu.models.grey import GreyGas
from climatemodel_tpu.models.ice_albedo import GreyAlbedoFeedback
from climatemodel_tpu.ops import optical_depth as od

ny = 1
conv_adjust = False
OUT = os.path.dirname(__file__)

'''Analytic solution with short wave (radiation_script.py:15-22)'''
# p_width_lw = 100000
# alpha_sw = od.get_exponential_alpha(p_width_lw) / 5
# p_width_sw = od.get_exponential_p_width(alpha_sw)
# grey_world = GreyGas(nz='auto', ny=ny, tau_lw_func='exponential',
#                      tau_lw_func_args=[p_width_lw, 4],
#                      tau_sw_func='exponential',
#                      tau_sw_func_args=[p_width_sw, 0.6])

'''With thermosphere (radiation_script.py:33-36)'''
grey_world = GreyGas(nz='auto', ny=ny,
                     tau_lw_func='scale_height_and_peak_in_atmosphere',
                     tau_lw_func_args=[51000, 4, 100, 600, 0.1],
                     tau_sw_func='scale_height_and_peak_in_atmosphere',
                     tau_sw_func_args=[p_surface_earth, 0.12, 100, 20, 0.002])

'''Approach to equilibrium (radiation_script.py:38-52)'''
T_eqb = None
correct = True
if grey_world.ny == 1:
    up_eqb, down_eqb, T_eqb, up_sw_eqb, down_sw_eqb, correct = \
        grey_world.equilibrium_sol(convective_adjust=conv_adjust)
data = grey_world.evolve_to_equilibrium(flux_thresh=1e-1,
                                        convective_adjust=conv_adjust,
                                        save=True)
anim = Animate(grey_world, data['T'], data['t'], T_eqb, correct,
               nPlotFrames=30).anim
anim.save(os.path.join(OUT, 'grey_equilibrium.gif'), writer='pillow', fps=10)
print(f'thermosphere world: nz={grey_world.nz}, '
      f'T surface={grey_world.T[0, 0]:.1f} K '
      f'(saved grey_equilibrium.gif)')

'''Equilibrium climate sensitivity WITHOUT re-marching (framework extra:
one Jacobian + one solve at the marched equilibrium, diagnostics/sensitivity;
the exact grey oracle dT*/dF = T*/(4F) cross-checks it in place)'''
from climatemodel_tpu.diagnostics import sensitivity

dT_dF = sensitivity.grey_equilibrium_sensitivity(grey_world)   # K per W/m^2
T_now = np.asarray(grey_world.state.T)
oracle = T_now / (4.0 * F_sun)
act = np.abs(np.asarray(grey_world.forcing.dtau)) > 0.03
print(f'insolation sensitivity: surface {dT_dF[0, 0]:.4f} K/(W/m^2) '
      f'(exact oracle {oracle[0, 0]:.4f}; active-region max |rel err| '
      f'{np.abs(dT_dF / oracle - 1)[act].max():.4f}; optically-thin levels '
      f'are path-dependent and excluded, CLAUDE.md)')

'''Evolution with tau: staged lw->sw ramp (radiation_script.py:54-116)'''
from staged_tau_ramp import run_staged_tau_ramp

ramp_world, ramp_data = run_staged_tau_ramp(
    nz='auto', ny=ny, conv_adjust=conv_adjust, out_dir=OUT)
print(f'staged tau ramp: {len(ramp_data["t"])} frames, final T_surface='
      f'{float(np.asarray(ramp_world.T)[0, 0]):.1f} K '
      f'(saved grey_tau_ramp.gif)')

'''Ice-albedo feedback: stellar-constant sweep (radiation_script.py:152-166)'''
stellar_constant_values = np.arange(600, 2250, 150.0)
ice_albedo = GreyAlbedoFeedback(4.0, stellar_constant_values, nz=40, ny=16,
                                tau_lw_func='scale_height',
                                tau_lw_func_args=[0.22 * p_surface_earth, 4.0])
albedo_array, ice_latitude, T_surface = ice_albedo.run(
    0.1, delta_net_flux_thresh=1e-3, conv_adjust=conv_adjust, progress=True)
fig = ice_albedo.plot(ice_latitude, T_surface)
plt.gcf().savefig(os.path.join(OUT, 'ice_albedo_hysteresis.png'), dpi=90)
print('ice-albedo sweep done: ice edge latitudes', ice_latitude)
