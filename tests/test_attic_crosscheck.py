"""Execute the reference's ATTIC task variants and crosscheck them.

Round-1 parity covered the active Lander3D (test_reference_crosscheck.py);
this file extends the executed-crosscheck to the attic variant taxonomy.
The attic is a decade of strata written against dynamics/task APIs that no
longer all exist in the tree, so each variant falls in one of three buckets
(all claims below are *executed* by these tests, not read):

RUNNABLE AS-IS (genuine attic code, bit-exact vs the float64 oracle):
  * Hover3D  — attic/gym_copter/envs/hover.py + hover3d.py on top of the
    ACTIVE task layer (gym_copter/envs/task.py).  Only the `_ThreeD`
    rendering mixin (imported from a module absent from the tree) is
    stubbed; it contributes no step/reward behavior.
  * Lander2D — attic/gym_copter/envs/lander2d.py imports `_Lander`, a
    symbol that exists nowhere in the tree (attic lander.py defines
    `Lander` with a fixed (10, 4) signature).  A 4-line constructor shim
    (`_Lander` = active Lander with pass-through sizes) restores the
    historical class; the executed obs/motor/reward code is the attic's.

RUNNABLE WITH THE ORACLE DYNAMICS INJECTED (attic task-layer code executed
genuinely; the dynamics import target is absent from the tree):
  * Takeoff / Distance — import `gym_copter.dynamics.djiphantom`, which
    does not exist; the only extant DJIPhantomDynamics
    (attic/mars/dynamics/djiphantom.py) raises KeyError('C_L') at
    construction (test_mars_djiphantom_unconstructable proves it).  We
    inject OracleDynamics behind the expected interface and compare the
    attic task layer against the JAX env at the repo's standard
    JAX<->oracle tolerance.
  * AltHold / Target — the CopterEnv base (attic/gym_copter/envs/copter.py)
    additionally requires a no-arg `DJIPhantomDynamics()` and
    `update(dt)`, an API no extant dynamics implements.  Same injection.

BLOCKED (cannot execute any reference code path; the blocker itself is
asserted so it stays documented-and-true):
  * Lander1D / Hover1D / Hover2D — their `_get_state` slices the state
    (`state[4:6]`, `state[2:8]`) but the active `Dynamics.getState()`
    returns a dict (gym_copter/dynamics/__init__.py:199-206), so every
    reset raises TypeError.  Their obs slices (z,dz) / (y..dphi) and motor
    maps match this repo's OBS_1D/OBS_2D specs by inspection
    (attic lander1d.py:43-49, hover2d.py:44-50).

See PARITY.md "Attic crosscheck matrix" for the summary table.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.compat.numpy_oracle import OracleDynamics, OracleEnv

REFERENCE = '/root/reference'
ATTIC = os.path.join(REFERENCE, 'attic')

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, 'gym_copter')),
    reason='reference checkout not available')


def _load(name, path, package_dirs=None):
    spec = importlib.util.spec_from_file_location(
        name, path, submodule_search_locations=package_dirs)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class OracleDynamicsAdapter:
    """The attic-facing dynamics interface over the float64 oracle.

    Implements both historical calling conventions the attic expects of
    `gym_copter.dynamics.djiphantom.DJIPhantomDynamics`:
      * Takeoff/Distance: `DJIPhantomDynamics(framesPerSecond)` then
        `setMotors(m); update()`            (takeoff.py:54,67-68)
      * CopterEnv family: `DJIPhantomDynamics()` then
        `setMotors(m); update(dt)`          (copter.py:42-44,92)
    """

    # state/status constants as the attic task layers read them off the
    # dynamics object (e.g. simple_lander3d.py:72-76,94-99); values are the
    # oracle's own (core/constants.py mirrors dynamics/__init__.py:48-68)
    from gym_copter_tpu.core import constants as _C
    STATE_X = _C.STATE_X
    STATE_Y = _C.STATE_Y
    STATE_Z = _C.STATE_Z
    STATUS_CRASHED = _C.STATUS_CRASHED
    STATUS_LANDED = _C.STATUS_LANDED
    STATUS_LEVELING = _C.STATUS_LEVELING
    STATUS_AIRBORNE = _C.STATUS_AIRBORNE

    def __init__(self, framesPerSecond=None):
        self._params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
        if framesPerSecond is not None:
            self._set_dt(1.0 / framesPerSecond)
        self._oracle = OracleDynamics(self._params)
        self._motors = np.zeros(4)

    def _set_dt(self, dt):
        self._params = self._params._replace(
            task=self._params.task._replace(dt=dt))

    def getStatus(self):
        return self._oracle.status

    def setState(self, state):
        self._oracle.set_state(state)

    def getState(self):
        return tuple(self._oracle.x)

    def setMotors(self, motorvals):
        self._motors = np.asarray(motorvals, dtype=np.float64)

    def update(self, dt=None):
        if dt is not None and dt != self._params.task.dt:
            self._set_dt(dt)
            self._oracle.p = self._params
        self._oracle.step(self._motors)


@pytest.fixture(scope='session')
def attic():
    """Assemble the executable attic surface into sys.modules."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import gym_copter.envs.task  # the active task layer  # noqa: F401
    import gym_copter.envs.lander as active_lander
    from gym_copter.envs.task import _Task

    # -- old-`gym` shim: the attic predates the gymnasium rename
    if 'gym' not in sys.modules:
        import gymnasium
        gym_mod = types.ModuleType('gym')
        gym_mod.Env = gymnasium.Env
        gym_mod.spaces = gymnasium.spaces
        utils_mod = types.ModuleType('gym.utils')
        utils_mod.seeding = gymnasium.utils.seeding
        utils_mod.EzPickle = gymnasium.utils.EzPickle
        gym_mod.utils = utils_mod
        sys.modules['gym'] = gym_mod
        sys.modules['gym.utils'] = utils_mod
        sys.modules['gym.spaces'] = gymnasium.spaces

    # -- attic sensors package (vision/DVS), used by hover3d/lander imports
    sens_dir = os.path.join(ATTIC, 'gym_copter', 'sensors')
    _load('gym_copter.sensors', os.path.join(sens_dir, '__init__.py'),
          [sens_dir])
    vis_dir = os.path.join(sens_dir, 'vision')
    _load('gym_copter.sensors.vision', os.path.join(vis_dir, '__init__.py'),
          [vis_dir])

    # -- `gym_copter.envs.threed` is absent from the tree; hover3d uses it
    #    as a rendering mixin AND relied on it (or an older task layer) for
    #    the identity `_get_motors` — Hover3D defines none of its own, so it
    #    cannot take a single airborne step without this.  Identity is the
    #    only definition consistent with its 4-motor action space and
    #    matches the active Lander's `_get_motors` (gym_copter/envs/
    #    lander.py:95-97).
    threed = types.ModuleType('gym_copter.envs.threed')

    class _ThreeD:
        def __init__(self):
            self.viewer = None

        def use_hud(self):
            pass

        def render(self, mode='human'):
            return None

        def demo_pose(self, args):
            pass

        def _get_motors(self, motors):
            return motors

    threed._ThreeD = _ThreeD
    sys.modules['gym_copter.envs.threed'] = threed

    # -- `_Lander`: the symbol lander1d/2d import exists nowhere in the
    #    tree; restore it as the active Lander with pass-through sizes
    #    (everything else — reward, reset, step — is genuine reference code)
    class _Lander(active_lander.Lander):
        def __init__(self, observation_size, action_size):
            _Task.__init__(self, observation_size, action_size)
            self.viewer = None

    active_lander._Lander = _Lander

    # -- oracle-backed dynamics behind the absent import target
    dj = types.ModuleType('gym_copter.dynamics.djiphantom')
    dj.DJIPhantomDynamics = OracleDynamicsAdapter
    sys.modules['gym_copter.dynamics.djiphantom'] = dj

    envs_dir = os.path.join(ATTIC, 'gym_copter', 'envs')
    ns = types.SimpleNamespace()
    ns.hover = _load('gym_copter.envs.hover',
                     os.path.join(envs_dir, 'hover.py'))
    ns.hover1d = _load('gym_copter.envs.hover1d',
                       os.path.join(envs_dir, 'hover1d.py'))
    ns.hover2d = _load('gym_copter.envs.hover2d',
                       os.path.join(envs_dir, 'hover2d.py'))
    ns.hover3d = _load('gym_copter.envs.hover3d',
                       os.path.join(envs_dir, 'hover3d.py'))
    ns.lander1d = _load('gym_copter.envs.lander1d',
                        os.path.join(envs_dir, 'lander1d.py'))
    ns.lander2d = _load('gym_copter.envs.lander2d',
                        os.path.join(envs_dir, 'lander2d.py'))
    ns.copter = _load('gym_copter.envs.copter',
                      os.path.join(envs_dir, 'copter.py'))
    ns.althold = _load('gym_copter.envs.althold',
                       os.path.join(envs_dir, 'althold.py'))
    ns.target = _load('gym_copter.envs.target',
                      os.path.join(envs_dir, 'target.py'))
    ns.takeoff = _load('gym_copter.envs.takeoff',
                       os.path.join(envs_dir, 'takeoff.py'))
    ns.distance = _load('gym_copter.envs.distance',
                        os.path.join(envs_dir, 'distance.py'))
    ns.active_lander = active_lander
    return ns


def _dji_params(dt=None):
    p = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    if dt is not None:
        p = p._replace(task=p.task._replace(dt=dt))
    return p


# ---------------------------------------------------------------------------
# Bucket 1: genuine attic code, bit-exact vs the oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('seed', [0, 42])
def test_attic_hover3d_bit_exact(attic, seed):
    """attic Hover3D (hover.py:18-21 reward, hover3d.py:32-37 obs) executed
    against the active task layer, replayed bit-for-bit by the oracle."""
    env = attic.hover3d.Hover3D()
    oracle = OracleEnv(_dji_params(), task_kind='hover',
                       obs_indices=tuple(range(12)), action_size=4)

    np.random.seed(seed)
    ref_obs, _ = env.reset()
    our_obs, _ = oracle.reset(seed=seed)
    np.testing.assert_array_equal(np.asarray(our_obs, np.float32),
                                  np.asarray(ref_obs))

    rng = np.random.default_rng(seed)
    for t in range(999):
        action = (np.full(4, 1.625e-2) if t % 3 == 0
                  else rng.uniform(0, 0.05, 4))
        ref_obs, ref_rew, ref_done, _, _ = env.step(action)
        our_obs, our_rew, our_done, _, _ = oracle.step(action)
        assert our_done == ref_done, f'step {t}'
        np.testing.assert_array_equal(
            np.asarray(our_obs, np.float32), np.asarray(ref_obs),
            err_msg=f'step {t}')
        assert float(our_rew) == float(ref_rew), f'step {t}'
        if ref_done:
            break
    assert ref_done, 'episode should terminate (crash from free fall)'


@pytest.mark.parametrize('seed', [0, 42])
def test_attic_lander2d_bit_exact(attic, seed):
    """attic Lander2D obs map (y,dy,z,dz,phi,dphi) and motor map
    [m0,m1,m1,m0] (lander2d.py:43-51), executed via the `_Lander` shim."""
    env = attic.lander2d.Lander2D()
    oracle = OracleEnv(_dji_params(), task_kind='lander',
                       obs_indices=(2, 3, 4, 5, 6, 7), action_size=2,
                       motor_map=lambda m: [m[0], m[1], m[1], m[0]])

    np.random.seed(seed)
    ref_obs, _ = env.reset()
    our_obs, _ = oracle.reset(seed=seed)
    np.testing.assert_array_equal(np.asarray(our_obs, np.float32),
                                  np.asarray(ref_obs))

    rng = np.random.default_rng(seed)
    for t in range(999):
        action = (np.full(2, 1.625e-2) if t % 3 == 0
                  else rng.uniform(0, 0.05, 2))
        ref_obs, ref_rew, ref_done, _, _ = env.step(action)
        our_obs, our_rew, our_done, _, _ = oracle.step(action)
        assert our_done == ref_done, f'step {t}'
        np.testing.assert_array_equal(
            np.asarray(our_obs, np.float32), np.asarray(ref_obs),
            err_msg=f'step {t}')
        assert float(our_rew) == float(ref_rew), f'step {t}'
        if ref_done:
            break
    assert ref_done


# ---------------------------------------------------------------------------
# Bucket 2: attic task layer executed with the oracle dynamics injected,
# compared against the JAX env at the repo's standard oracle<->JAX tolerance
# ---------------------------------------------------------------------------

def _jax_env(name, dt):
    from gym_copter_tpu.envs import registry
    return registry.make(name, num_envs=1, params=_dji_params(dt=dt),
                         dtype=jnp.float64)


def test_attic_takeoff_matches_jax(attic):
    """attic Takeoff shaping -|alt-5| delta + raw motors (takeoff.py:62-91)
    vs the JAX Takeoff-v0 task."""
    ref = attic.takeoff.Takeoff()        # ctor runs reset + zero step
    env = _jax_env('Takeoff-v0', dt=1.0 / ref.FRAMES_PER_SECOND)
    state, obs = env.reset()
    np.testing.assert_array_equal(np.asarray(obs[:, 0]), np.zeros(10))

    rng = np.random.default_rng(0)
    for t in range(400):
        action = rng.uniform(0.0, 0.6, 4)
        ref_obs, ref_rew, ref_done, _ = ref.step(action)
        state, ts = env.step(state, jnp.asarray(action[:, None]))
        assert not ref_done and not bool(ts.done[0])
        np.testing.assert_allclose(np.asarray(ts.obs[:, 0]),
                                   np.asarray(ref_obs, np.float64),
                                   rtol=1e-6, atol=1e-9,
                                   err_msg=f'step {t}')
        np.testing.assert_allclose(float(ts.reward[0]), float(ref_rew),
                                   rtol=1e-9, atol=1e-9)


def test_attic_distance_matches_jax(attic):
    """attic Distance shaping sqrt(x^2+y^2) delta (distance.py:60-86) vs the
    JAX Distance-v0 task."""
    ref = attic.distance.Distance()
    env = _jax_env('Distance-v0', dt=1.0 / ref.FRAMES_PER_SECOND)
    state, obs = env.reset()

    rng = np.random.default_rng(1)
    base = np.array([0.4, 0.42, 0.38, 0.44])   # asymmetric -> tilt -> travel
    for t in range(400):
        action = base + rng.uniform(0, 0.05, 4)
        ref_obs, ref_rew, ref_done, _ = ref.step(action)
        state, ts = env.step(state, jnp.asarray(action[:, None]))
        assert not ref_done and not bool(ts.done[0])
        np.testing.assert_allclose(np.asarray(ts.obs[:, 0]),
                                   np.asarray(ref_obs, np.float64),
                                   rtol=1e-6, atol=1e-9,
                                   err_msg=f'step {t}')
        np.testing.assert_allclose(float(ts.reward[0]), float(ref_rew),
                                   rtol=1e-9, atol=1e-9)


def test_attic_althold_matches_jax(attic):
    """attic CopterAltHold (althold.py:36-64): [-1,1]->[0,1] action rescale,
    ENU-negated (altitude, climb) obs, cumulative +1-on-target reward.  The
    JAX env reports the per-step increment (documented deviation), so the
    cumulative sums are compared."""
    ref = attic.althold.CopterAltHold()          # dt=0.001, target 10 m
    env = _jax_env('AltHold-v0', dt=ref.dt)
    state, obs = env.reset()

    # documented deviation: the attic reset returns the env's STALE state
    # array (zeros) because `_init` only updates the dynamics object
    # (althold.py:56-64 + copter.py:88-93); the rebuild reports the true
    # initial (altitude, climb) = (10, 0)
    ref_obs = ref.reset()
    np.testing.assert_array_equal(np.asarray(ref_obs, np.float64),
                                  [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(obs[:, 0]), [10.0, 0.0])

    rng = np.random.default_rng(2)
    our_total = 0.0
    for t in range(500):
        action = rng.uniform(-1.0, 1.0, 1)
        ref_obs, ref_total, _, _ = ref.step(action)
        state, ts = env.step(state, jnp.asarray(action[:, None]))
        our_total += float(ts.reward[0])
        np.testing.assert_allclose(np.asarray(ts.obs[:, 0]),
                                   np.asarray(ref_obs, np.float64),
                                   rtol=1e-6, atol=1e-9,
                                   err_msg=f'step {t}')
        assert our_total == float(ref_total), f'step {t}'


def test_attic_target_matches_jax_first_episode(attic):
    """attic CopterTarget (target.py:36-69): 15-dim obs with the circling
    target.  Within the first episode the JAX step-indexed orbit angle
    matches the attic's accumulated one exactly; the known deviation is at
    reset, where the attic returns stale zero target coordinates."""
    ref = attic.target.CopterTarget()
    env = _jax_env('Target-v0', dt=ref.dt)
    state, obs = env.reset()

    ref_obs = ref.reset()
    # documented deviation (envs/tasks.py:63-66): attic reset shows the
    # target at (0, 0); the rebuild shows its true t=0 position (10, 0)
    np.testing.assert_array_equal(np.asarray(ref_obs[12:14]), [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(obs[12:14, 0]), [10.0, 0.0])
    assert float(ref_obs[14]) == float(obs[14, 0]) == 10.0

    rng = np.random.default_rng(3)
    for t in range(300):
        action = rng.uniform(-1.0, 1.0, 4)
        ref_obs, ref_rew, ref_crashed, _ = ref.step(action)
        state, ts = env.step(state, jnp.asarray(action[:, None]))
        assert float(ref_rew) == 0.0 and float(ts.reward[0]) == 0.0
        assert not ref_crashed and not bool(ts.done[0])
        np.testing.assert_allclose(np.asarray(ts.obs[:, 0]),
                                   np.asarray(ref_obs, np.float64),
                                   rtol=1e-6, atol=1e-9,
                                   err_msg=f'step {t}')


# ---------------------------------------------------------------------------
# Bucket 3: blockers, asserted so the PARITY.md claims stay true
# ---------------------------------------------------------------------------

def test_attic_1d2d_variants_blocked_on_dict_state(attic):
    """Lander1D/Hover1D/Hover2D `_get_state` slices the state array
    (lander1d.py:43-45, hover2d.py:44-46) but the active dynamics returns a
    dict (gym_copter/dynamics/__init__.py:199-206): unexecutable as-is."""
    for cls in (attic.lander1d.Lander1D, attic.hover1d.Hover1D,
                attic.hover2d.Hover2D):
        env = cls()
        np.random.seed(0)
        with pytest.raises((TypeError, KeyError)):
            env.reset()


def test_attic_lander_symbol_missing(attic):
    """lander1d/2d import `_Lander`, which no file in the tree defines
    (attic lander.py defines `Lander` with a fixed (10, 4) ctor)."""
    src = open(os.path.join(ATTIC, 'gym_copter', 'envs', 'lander.py')).read()
    assert '_Lander' not in src
    assert 'class Lander' in src


def test_mars_djiphantom_unconstructable(attic):
    """The only extant DJIPhantomDynamics (attic/mars/dynamics) cannot be
    constructed: MultirotorDynamics reads vparams['C_L']
    (attic/mars/dynamics/__init__.py:101) which djiphantom.py never defines
    — so attic Takeoff/Distance/CopterEnv have no runnable dynamics."""
    mars_dyn_dir = os.path.join(ATTIC, 'mars', 'dynamics')
    had = sys.modules.get('dynamics')
    try:
        _load('dynamics', os.path.join(mars_dyn_dir, '__init__.py'),
              [mars_dyn_dir])
        mars_dj = _load('_mars_djiphantom',
                        os.path.join(mars_dyn_dir, 'djiphantom.py'))
        with pytest.raises(KeyError, match='C_L'):
            mars_dj.DJIPhantomDynamics(50)
    finally:
        if had is not None:
            sys.modules['dynamics'] = had
        else:
            sys.modules.pop('dynamics', None)
        sys.modules.pop('_mars_djiphantom', None)


def test_attic_simple_lander3d_matches_jax(attic):
    """attic Lander3DSimple (simple_lander3d.py) — demand3 mixing with
    signed roll/pitch and post-mix clipping (:84-99), 250-factor pitch/roll
    shaping (:113-117), replace-and-terminate out-of-bounds/tilt (:124-133),
    done-on-landed with the bonus added after the replacement (:135-141),
    fixed +2.5 X/Y start and a free-fall reset step (:74-79) — executed
    genuinely with the oracle dynamics injected, vs the JAX
    Lander3DSimple-v0 task on identical params."""
    simple = sys.modules.get('gym_copter.envs.simple_lander3d') or _load(
        'gym_copter.envs.simple_lander3d',
        os.path.join(ATTIC, 'gym_copter', 'envs', 'simple_lander3d.py'))
    ref = simple.Lander3DSimple()     # ctor runs reset (free-fall step)
    from gym_copter_tpu.envs import registry
    env = registry.make('Lander3DSimple-v0', num_envs=1,
                        params=_dji_params(dt=1.0 / ref.FRAMES_PER_SECOND),
                        dtype=jnp.float64)

    ref_obs = ref.reset()
    state, obs = env.reset()
    np.testing.assert_allclose(np.asarray(obs[:, 0]),
                               np.asarray(ref_obs, np.float64),
                               rtol=1e-6, atol=1e-9)

    # the PD expert's throttle over-thrusts the active-vehicle params
    # (hover ~0.0166), so drive a scripted profile instead: near-hover
    # throttle with small signed roll/pitch demands (exercising the
    # pre-mix throttle clip and the signed mixing — large demands make
    # the spun-up dynamics chaotic enough to amplify ULP noise past any
    # tolerance), then motors off -> free fall -> crash, exercising the
    # landed/crashed termination arm
    rng = np.random.default_rng(7)
    ref_done = False
    for t in range(400):
        if t < 60:
            action = np.array([0.017 + 0.002 * rng.standard_normal(),
                               rng.uniform(-0.004, 0.004),
                               rng.uniform(-0.004, 0.004)])
        else:
            action = np.array([-1.0, 0.0, 0.0])   # throttle clipped to 0
        ref_obs, ref_rew, ref_done, _ = ref.step(action)
        state, ts = env.step(state, jnp.asarray(action[:, None]))
        assert bool(ts.done[0]) == bool(ref_done), f'step {t}'
        # on the done step ts.obs already belongs to the auto-reset next
        # episode; the finished step's state is ts.x (envs/base.py TimeStep)
        our_obs = (np.asarray(ts.x[:10, 0]) if ref_done
                   else np.asarray(ts.obs[:, 0]))
        np.testing.assert_allclose(our_obs, np.asarray(ref_obs, np.float64),
                                   rtol=1e-6, atol=1e-9, err_msg=f'step {t}')
        np.testing.assert_allclose(float(ts.reward[0]), float(ref_rew),
                                   rtol=1e-6, atol=1e-9, err_msg=f'step {t}')
        if ref_done:
            break
    assert ref_done, 'profile should end the episode (crash from free fall)'


def test_simple_lander_pd_expert_lands_with_bonus():
    """On the variant's own preset (attic vehicle, 50 Hz) the reference PD
    expert (simple_lander3d.py:186-211) must land inside the radius: total
    return well above the +100 bonus threshold on every batched env."""
    from gym_copter_tpu.envs import registry
    from gym_copter_tpu.control.heuristics import lander3d_simple_pid
    env = registry.make('Lander3DSimple-v0', num_envs=4, seed=0)
    state, obs = env.reset()
    init, policy = lander3d_simple_pid(4)
    total = np.zeros(4)
    done_seen = np.zeros(4, bool)
    ps = init
    for _ in range(600):
        ps, act = policy(ps, obs)
        state, ts = env.step(state, act)
        obs = ts.obs
        total += np.where(done_seen, 0.0, np.asarray(ts.reward))
        done_seen |= np.asarray(ts.done)
        if done_seen.all():
            break
    assert done_seen.all(), 'expert episodes should terminate by landing'
    assert (total > 150.0).all(), f'expected bonus landings, got {total}'
