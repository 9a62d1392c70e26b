"""Adaptive disturbance rejection (learn/adaptive.py) — the PES-style
counterpart of the reference's Nengo experiment (attic/nengo/adaptive.py).

The contract: across a batch of sustained wind forces, the online-adapted
controller must (1) hold the altitude setpoint far better than the bare PD
controller (which carries the classic P-controller steady-state offset),
and (2) adapt EACH plant to ITS OWN disturbance in one lockstep rollout.
"""

import numpy as np

import jax.numpy as jnp

from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.learn import adaptive

PARAMS = EnvParams(vehicle=vehicles.DJI_PHANTOM)
WINDS = jnp.asarray([-4.0, -2.0, 0.0, 2.0, 4.0])
CFG = adaptive.AdaptiveConfig()


def test_adaptation_beats_pd_across_wind_sweep():
    pd = adaptive.run(PARAMS, WINDS, 6000, CFG, adapt=False)
    ad = adaptive.run(PARAMS, WINDS, 6000, CFG, adapt=True)
    pd_err = np.asarray(adaptive.tracking_error(pd, CFG))
    ad_err = np.asarray(adaptive.tracking_error(ad, CFG))

    # the bare PD controller has a large steady-state offset (it must hold
    # error k_p*(target-z) = hover thrust + wind); adaptation removes it
    assert (pd_err > 1.0).all(), pd_err
    assert (ad_err < 0.2).all(), ad_err
    assert (ad_err < pd_err / 5.0).all()


def test_each_plant_learns_its_own_disturbance():
    h = adaptive.run(PARAMS, WINDS, 6000, CFG, adapt=True)
    # the learned steady-state thrust (u_extra at the end) must increase
    # monotonically with downward wind: each lane adapted independently
    u_extra_final = np.asarray(h['u_extra'][-200:].mean(axis=0))
    assert (np.diff(u_extra_final) < 0).all() or \
           (np.diff(u_extra_final) > 0).all(), u_extra_final
    # and the zero-wind plant must have learned ~the hover thrust
    from gym_copter_tpu.control.heuristics import hover_motor_value
    hover = hover_motor_value(PARAMS)
    assert abs(float(u_extra_final[2]) - hover) < 0.5 * hover
