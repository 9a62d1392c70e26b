"""Vehicle and world parameter presets.

Values transcribed from the reference parameter files:
  - DJI_PHANTOM: gym_copter/dynamics/vehicles/dji_phantom.py:9-26 (the
    canonical values `Lander-v0` runs with; note B=5e-3).
  - DJI_PHANTOM_ATTIC: attic/mars/dynamics/djiphantom.py:43-57 (the attic
    uses B=5e-6 — a known discrepancy, see SURVEY.md §2.4).
  - INGENUITY: attic/mars/dynamics/ingenuity.py (coaxial Mars helicopter;
    exposed here for the Mars world-parameter capability).
"""

from gym_copter_tpu.core import constants as C
from gym_copter_tpu.core.types import VehicleParams, WorldParams

DJI_PHANTOM = VehicleParams(
    B=5.0e-3,
    D=2.0e-6,
    M=1.380,
    L=0.350,
    Ix=2.0,
    Iy=2.0,
    Iz=3.0,
    Jr=38.0e-4,
    maxrpm=15000.0,
)

DJI_PHANTOM_ATTIC = DJI_PHANTOM._replace(B=5.0e-6)

# Ingenuity "coaxial" (actually quad-X per the reference's own comment)
# vehicle constants, attic/mars/dynamics/ingenuity.py:50-70; flown with MARS
# world params (ingenuity.py:73-74).  The reference additionally declares a
# lift coefficient C_L=0.4 for its blade-element lift term.
INGENUITY = VehicleParams(
    B=5.0e-6,
    D=2.0e-6,
    M=1.380,
    L=0.350,
    Ix=2.0,
    Iy=2.0,
    Iz=3.0,
    Jr=38.0e-4,
    maxrpm=15000.0,
)
INGENUITY_C_L = 0.4

EARTH = WorldParams(g=C.EARTH_G, rho=C.EARTH_RHO)
MARS = WorldParams(g=C.MARS_G, rho=C.MARS_RHO)
