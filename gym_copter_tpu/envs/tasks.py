"""Task specs for the Lander / Hover family.

Observation slices, action sizes, and motor maps follow the reference
variants (SURVEY.md §2.4):
  Lander1D: obs (z,dz),            1 motor broadcast to 4   (attic lander1d.py:43-49)
  Lander2D: obs (y,dy,z,dz,phi,dphi), 2 motors [m0,m1,m1,m0] (attic lander2d.py:43-51)
  Lander3D: obs 10 (yaw dropped),  4 motors identity         (gym_copter/envs/lander.py:39-44,95-97)
  Hover1D/2D/3D: same obs/motor maps, +1-per-step reward     (attic hover*.py)
"""

from gym_copter_tpu.envs.base import TaskSpec

_IDENTITY4 = ((1.0, 0.0, 0.0, 0.0),
              (0.0, 1.0, 0.0, 0.0),
              (0.0, 0.0, 1.0, 0.0),
              (0.0, 0.0, 0.0, 1.0))
_ONE_MOTOR = ((1.0,), (1.0,), (1.0,), (1.0,))
_TWO_MOTOR = ((1.0, 0.0), (0.0, 1.0), (0.0, 1.0), (1.0, 0.0))

# 3-demand (throttle, roll, pitch) mixer of the attic "simple" 3D lander,
# motors = [t - r - p, t + r + p, t + r - p, t - r + p]
# (attic/gym_copter/envs/simple_lander3d.py:85-88)
_DEMAND3 = ((1.0, -1.0, -1.0),
            (1.0, 1.0, 1.0),
            (1.0, 1.0, -1.0),
            (1.0, -1.0, 1.0))

OBS_1D = (4, 5)
OBS_2D = (2, 3, 4, 5, 6, 7)
OBS_3D_LANDER = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9)
OBS_3D_FULL = tuple(range(12))

LANDER_1D = TaskSpec('Lander1D', 'lander', OBS_1D, 1, _ONE_MOTOR)
LANDER_2D = TaskSpec('Lander2D', 'lander', OBS_2D, 2, _TWO_MOTOR)
LANDER_3D = TaskSpec('Lander3D', 'lander', OBS_3D_LANDER, 4, _IDENTITY4)
# The attic "simple" 3D lander is its own variant, not just a mixer change
# (attic/gym_copter/envs/simple_lander3d.py): throttle demand clipped to
# [0,1] pre-mix with signed roll/pitch and the MIXED motors clipped (:84-99),
# shaping -(25·‖state[0:6]‖ + 250·‖state[6:10]‖) (:113-117), out-of-bounds
# and excess tilt both REPLACING the reward and terminating (:124-133),
# done the moment the vehicle lands (:135-141), a fixed +2.5 X/Y start
# offset with no wind kick (:74-76), start altitude 5 (:22), and a reset
# that is a real zero-demand step (:79).  Runs at 50 Hz on the attic
# vehicle (see PRESET_PARAMS below); the reference has no step cap — the
# registry's 1000-step truncation still applies here.
LANDER_3D_SIMPLE = TaskSpec('Lander3DSimple', 'lander_simple',
                            OBS_3D_LANDER, 3, _DEMAND3,
                            action_mode='demand3', termination='simple',
                            start_altitude=5.0, perturb_on_reset=False,
                            start_xy_offset=2.5, integrate_on_reset=True)
HOVER_1D = TaskSpec('Hover1D', 'hover', OBS_1D, 1, _ONE_MOTOR)
HOVER_2D = TaskSpec('Hover2D', 'hover', OBS_2D, 2, _TWO_MOTOR)
HOVER_3D = TaskSpec('Hover3D', 'hover', OBS_3D_FULL, 4, _IDENTITY4)

# Auxiliary attic tasks (SURVEY.md §2.2):
# AltHold: starts AT the hold target, 1-dim action rescaled [-1,1]->[0,1]
# on all motors, obs (altitude, climb rate) in ENU, +1/step within 1 m of
# 10 m (attic/gym_copter/envs/althold.py:21-64).
ALTHOLD = TaskSpec('AltHold', 'althold', OBS_1D, 1, _ONE_MOTOR,
                   action_mode='rescale01', termination='none',
                   skip_when_landed=False, start_altitude=10.0,
                   negate_obs=True, perturb_on_reset=False)
# Takeoff: starts grounded, raw 4-motor action, shaping -|alt-5| delta
# (attic/gym_copter/envs/takeoff.py:30-91).
TAKEOFF = TaskSpec('Takeoff', 'takeoff', OBS_3D_LANDER, 4, _IDENTITY4,
                   action_mode='raw', termination='none',
                   skip_when_landed=False, start_altitude=0.0,
                   perturb_on_reset=False)
# Distance: starts grounded, shaping sqrt(x^2+y^2) delta — maximize
# horizontal distance (attic/gym_copter/envs/distance.py:20-86).
DISTANCE = TaskSpec('Distance', 'distance', OBS_3D_LANDER, 4, _IDENTITY4,
                    action_mode='raw', termination='none',
                    skip_when_landed=False, start_altitude=0.0,
                    perturb_on_reset=False)
# Target: 15-dim obs (12 state + target x/y/altitude), target circling at
# radius 10 with dtheta=0.0025/step, reward stubbed 0, done on crash
# (attic/gym_copter/envs/target.py:13-69).  Unlike the reference — whose
# orbit angle never resets across episodes and whose reset returns stale
# zero target coordinates — the angle here is derived from the episode
# step count (theta = 0.0025*(n-1)).
TARGET = TaskSpec('Target', 'target', OBS_3D_FULL, 4, _IDENTITY4,
                  action_mode='rescale01', termination='crash_only',
                  skip_when_landed=False, start_altitude=0.0,
                  perturb_on_reset=False)

ALL_TASKS = {
    'Lander1D-v0': LANDER_1D,
    'Lander2D-v0': LANDER_2D,
    'Lander3D-v0': LANDER_3D,
    'Lander-v0': LANDER_3D,          # active registry alias (gym_copter/__init__.py:9-13)
    'Lander3DSimple-v0': LANDER_3D_SIMPLE,
    'Hover1D-v0': HOVER_1D,
    'Hover2D-v0': HOVER_2D,
    'Hover3D-v0': HOVER_3D,
    'AltHold-v0': ALTHOLD,
    'Takeoff-v0': TAKEOFF,
    'Distance-v0': DISTANCE,
    'Target-v0': TARGET,
}

# Named parameter presets: Mars/Ingenuity world-parameter dynamics
# (attic/mars/dynamics/ingenuity.py:44-76 — quad-X "coaxial" Ingenuity
# vehicle, Mars gravity/air density, blade-element lift model).  Resolved by
# registry.make(); e.g. make('Lander3DMars-v0').
def _mars_params():
    from gym_copter_tpu.core.types import EnvParams
    from gym_copter_tpu.core import vehicles
    return EnvParams(vehicle=vehicles.INGENUITY, world=vehicles.MARS,
                     lift_model='blade_element')


def _simple_lander_params():
    # 50 Hz (simple_lander3d.py:29) on the attic vehicle — the variant's
    # dynamics import target (gym_copter.dynamics.djiphantom) is absent
    # from the reference tree, but its heuristic's throttle bias of +0.5
    # (simple_lander3d.py:211) only hovers a vehicle with B=5e-6
    # (hover throttle ~0.52), i.e. the attic DJI Phantom.
    from gym_copter_tpu.core.types import EnvParams, TaskParams
    from gym_copter_tpu.core import vehicles
    return EnvParams(vehicle=vehicles.DJI_PHANTOM_ATTIC,
                     task=TaskParams(dt=1.0 / 50.0))


PRESET_PARAMS = {
    'Lander3DMars-v0': _mars_params,
    'Hover3DMars-v0': _mars_params,
    'Lander3DSimple-v0': _simple_lander_params,
}
ALL_TASKS['Lander3DMars-v0'] = LANDER_3D
ALL_TASKS['Hover3DMars-v0'] = HOVER_3D

# Per-variant CSV column names (reference STATE_NAMES, e.g. lander.py:30-31)
STATE_NAMES = {
    'lander1d': ['Z', 'dZ'],
    'lander2d': ['X', 'dX', 'Z', 'dZ', 'Phi', 'dPhi'],
    'lander3d': ['X', 'dX', 'Y', 'dY', 'Z', 'dZ',
                 'Phi', 'dPhi', 'Theta', 'dTheta'],
    'hover3d': ['X', 'dX', 'Y', 'dY', 'Z', 'dZ',
                'Phi', 'dPhi', 'Theta', 'dTheta', 'Psi', 'dPsi'],
}
