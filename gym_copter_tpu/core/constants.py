"""State-vector layout and flight-status constants.

Mirrors the reference's state indexing (gym_copter/dynamics/__init__.py:48-59)
and status machine states (gym_copter/dynamics/__init__.py:65-68) so that
trajectories, rewards, and termination logic are directly comparable.
"""

# 12-dimensional state vector layout (position/velocity interleaved, NED frame).
# Reference: gym_copter/dynamics/__init__.py:48-59
STATE_X = 0
STATE_X_DOT = 1
STATE_Y = 2
STATE_Y_DOT = 3
STATE_Z = 4
STATE_Z_DOT = 5
STATE_PHI = 6
STATE_PHI_DOT = 7
STATE_THETA = 8
STATE_THETA_DOT = 9
STATE_PSI = 10
STATE_PSI_DOT = 11

STATE_SIZE = 12

# Flight status values. Transitions:
#   LANDED -> AIRBORNE -> CRASHED, or
#   LANDED -> AIRBORNE -> LEVELING -> LANDED
# Reference: gym_copter/dynamics/__init__.py:61-68
STATUS_CRASHED = 0
STATUS_LANDED = 1
STATUS_LEVELING = 2
STATUS_AIRBORNE = 3

# Safe-landing thresholds (reference: gym_copter/dynamics/__init__.py:70-73).
# NOTE the reference reads Y_DOT as "velx" and Z_DOT as "vely" when testing
# these (gym_copter/dynamics/__init__.py:165-170); that quirk is preserved.
LANDING_VEL_X = 2.0
LANDING_VEL_Y = 1.0
LANDING_ANGLE = 0.7853981633974483  # pi/4

# Gravitational constant (reference: gym_copter/dynamics/__init__.py:76)
EARTH_G = 9.80665
# Sea-level air density on Earth (attic/mars/dynamics/__init__.py:83-84)
EARTH_RHO = 1.225
# Mars world parameters (attic/mars/dynamics/ingenuity.py:73-74)
MARS_G = 3.721
MARS_RHO = 0.017

STATE_NAMES_12 = ('X', 'dX', 'Y', 'dY', 'Z', 'dZ',
                  'Phi', 'dPhi', 'Theta', 'dTheta', 'Psi', 'dPsi')
