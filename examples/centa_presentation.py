"""Greenhouse-potential analysis (reference: centa_presentation/script.py).

Delta-OLR as greenhouse gas is added, at several scalings of a broadband
background absorber — the Arctic-amplification experiment
(centa_presentation/base.py:124-154): where the background absorber (H2O in
the reference) is scarce, each added unit of GHG bites harder into the OLR.

The upstream raw HITRAN line lists are not distributed, so this demo fabricates
its gases with the framework's table generator: the surviving CO2_no_sw table
plays the GHG and a generated broadband 'continuum' gas plays H2O.
"""
import os
import sys

# allow running from any cwd without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from climatemodel_tpu.utils.platform import honor_platform_env
honor_platform_env()   # JAX_PLATFORMS=cpu must beat the TPU plugin
import tempfile

import matplotlib
if os.environ.get('DISPLAY', '') == '':
    matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

from climatemodel_tpu.diagnostics import olr
from climatemodel_tpu.models.real_gas import RealGas
from climatemodel_tpu.spectral import hitran, humidity
from climatemodel_tpu.spectral.temperature_profiles import earth_temp

OUT = os.path.dirname(__file__)
REF_LUT = '/root/reference/Model/radiation/real_gas_data/HitranData/LookupTables'

# fabricate a weak broadband absorber (H2O-continuum stand-in) with our
# generator: many broad overlapping lines across the long-wave window
tmp = tempfile.mkdtemp()
rng = np.random.default_rng(0)
lines = {'nu': np.linspace(50.0, 1450.0, 60),
         'sw': np.full(60, 40.0),
         'gamma_air': np.full(60, 2.0),
         'n_air': np.full(60, 0.7)}
hitran.make_table(lines, wavenumber_array=np.arange(0.0, 1505.0, 10.0),
                  p_array=np.array([hitran.p_reference]),
                  T_array=np.array([hitran.T_reference]), output_folder=tmp)
os.replace(hitran.table_path('custom', tmp), hitran.table_path('H2O_like', tmp))
# make the CO2 table resolvable from the same folder
co2_src = os.path.join(REF_LUT, 'CO2_no_sw.npy') if os.path.isdir(REF_LUT) \
    else None
if co2_src:
    os.symlink(co2_src, hitran.table_path('CO2_no_sw', tmp))
    humidity.molecules.setdefault('H2O_LIKE', dict(humidity.molecules['H2O']))

    def build(h2o_scale):
        return RealGas(nz=50, ny=1,
                       molecule_names=['CO2_no_sw', 'H2O_like'],
                       q_funcs={'CO2_no_sw': humidity.constant_q,
                                'H2O_like': humidity.h2o},
                       q_funcs_args={'CO2_no_sw': (300.0, 'CO2'),
                                     'H2O_like': (h2o_scale,)},
                       table_folder=tmp, T_func=earth_temp, n_nu_bands=60,
                       delta_temp_change=0.1)

    fig, ax = plt.subplots(1, 1, figsize=(8, 6))
    co2_added = np.array([0.0, 50.0, 100.0, 200.0, 400.0])
    for scale in (1.0, 0.3, 0.05):
        atmos = build(scale)
        tot, _ = olr.get_olr_area_add_ghg(atmos, 'CO2_no_sw', co2_added,
                                          earth_temp)
        ax.plot(co2_added, tot - tot[0], label=f'{scale:g}')
    ax.legend(title='background absorber\nscaling')
    ax.set_xlabel('CO2 added (ppmv)')
    ax.set_ylabel(r'$\Delta$OLR (W/m$^2$)')
    ax.set_title('GHG potency grows as the background absorber thins\n'
                 '(Arctic amplification mechanism)')
    fig.savefig(os.path.join(OUT, 'arctic_amplification.png'), dpi=90)
    print('saved arctic_amplification.png')

    # greenhouse-activity spectrum (base.py:157-186)
    atmos = build(1.0)
    nu_c, act = olr.get_ghg_activity(atmos)
    fig2, ax2 = plt.subplots(1, 1)
    ax2.plot(nu_c, act)
    ax2.set_xlabel('Wavenumber cm$^{-1}$')
    ax2.set_ylabel('GHG activity (-dT/dq per CO2-ppmv)')
    fig2.savefig(os.path.join(OUT, 'ghg_activity.png'), dpi=90)
    print('saved ghg_activity.png')
else:
    print('CO2_no_sw table unavailable; skipping')
