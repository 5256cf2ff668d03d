"""TPU-native climate simulation framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the educational
NumPy reference jduffield65/ClimateModel: grey-gas and real-gas (HITRAN band)
two-stream radiative columns marched to radiative(-convective) equilibrium, dry
convective adjustment, a latitude-grid energy-balance model with ice-albedo
hysteresis, and a 2-D shallow-water dynamics engine with Kelvin/Rossby/gravity
wave and El Nino scenarios.  See SURVEY.md for the structural map of the
reference and README.md for the design.
"""

from . import constants

__version__ = '0.1.0'
