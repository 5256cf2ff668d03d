"""Import harness for the NumPy reference at /root/reference.

The reference depends on ``sympl`` only for physical constants
(Model/constants.py); that package is not installed, so we inject a stub
exposing ``get_constant`` with exactly the values our framework inlines in
climatemodel_tpu.constants — parity tests then compare like against like.

The reference is used here strictly as a *numerical oracle* (run, never
copied): trajectories and equilibria of our TPU implementation are asserted
against the executed reference behaviour.
"""
import os
import sys
import types

os.environ.setdefault('MPLBACKEND', 'Agg')
sys.dont_write_bytecode = True   # /root/reference is a read-only mount

from climatemodel_tpu import constants as C

_CONSTANTS = {
    'gravitational_acceleration': C.g,
    'heat_capacity_of_dry_air_at_constant_pressure': C.c_p_dry,
    'stefan_boltzmann_constant': C.sigma,
    'reference_air_pressure': C.p_surface_earth,
    'solar_constant': C.F_sun,
    'planetary_rotation_rate': C.Omega,
    'planetary_radius': C.R_earth,
    'gas_constant_of_dry_air': C.R_specific,
    'avogadro_constant': C.Avogadro,
    'speed_of_light': C.speed_of_light,
    'planck_constant': C.h_planck,
    'boltzmann_constant': C.k_boltzmann,
}

if 'sympl' not in sys.modules:
    _sympl = types.ModuleType('sympl')

    def get_constant(name, units):
        return _CONSTANTS[name]

    _sympl.get_constant = get_constant
    sys.modules['sympl'] = _sympl

REFERENCE_PATH = '/root/reference'
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)


def reference_available():
    return os.path.isdir(REFERENCE_PATH)


def import_reference_grey():
    import Model.radiation.grey as ref_grey
    import Model.radiation.grey_optical_depth as ref_od
    return ref_grey, ref_od


def import_reference_base():
    import Model.radiation.base as ref_base
    return ref_base


def import_reference_convection():
    import Model.radiation.convective_adjustment as ref_conv
    return ref_conv


def import_reference_shallow():
    import Model.dynamics.shallow_water as ref_sw
    import Model.dynamics.numerical_methods as ref_nm
    return ref_sw, ref_nm
