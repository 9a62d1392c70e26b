"""Timing harness sanity (utils/profiling.py)."""

import time

from gym_copter_tpu.utils import profiling


def test_differential_throughput_cancels_fixed_overhead():
    """A synthetic workload with a large fixed cost per call and a known
    per-iteration cost: the differential estimate must recover the
    per-iteration cost, not the fixed overhead."""
    per_iter = 2e-4
    fixed = 30e-3

    def run(num_steps):
        time.sleep(fixed + per_iter * num_steps)
        return 0.0

    res = profiling.differential_steps_per_sec(run, 10, 60, batch=128,
                                               reps=2)
    est = res['ns_per_iter'] * 1e-9
    assert 0.5 * per_iter < est < 2.0 * per_iter
    assert res['steps_per_sec'] > 0


def test_timed_host_sync_means_over_reps():
    calls = []

    def fn():
        calls.append(1)
        time.sleep(0.001)
        return 0.0

    d = profiling.timed_host_sync(fn, reps=3)
    assert len(calls) == 4  # 1 warm-up + 3 timed
    assert d >= 0.001
