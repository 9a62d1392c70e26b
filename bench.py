#!/usr/bin/env python3
"""Headline benchmark: env-steps/s at 4096 batched Lander3D envs on one chip.

This is BASELINE.json's metric ("env-steps/s/chip at 4096 batched Lander3D
envs").  The reference has no speed baseline (single env, 100 Hz real-time
paced — see BASELINE.md), so vs_baseline is reported against the north-star
target of 10M env-steps/s per host: vs_baseline = value / 1e7.

The measured path is the fused Pallas rollout kernel
(gym_copter_tpu/ops/pallas_rollout.py): the whole T-step auto-resetting
rollout runs as ONE kernel with the batch state pinned in VMEM.  Where the
kernel family doesn't apply (non-TPU backends), the XLA `lax.scan` path is
measured instead.

Timing is differential — t(T_hi) - t(T_lo) over the extra steps — with a
per-rep host transfer of the result.  On this rig the TPU is reached through
a tunnel whose `block_until_ready` acks dispatch before completion, so
naive timing both under-counts (no completion wait) and over-counts (fixed
tunnel round-trip latency); the differential with forced host reads cancels
both.  Sanity: the kernel's per-env episode counts are checked against the
XLA path before timing.

Measurement methodology (round 5, replacing the round-1..4 windows): the
marginal workload is 1M kernel steps (~0.6 s at 7G env-steps/s) — an order
of magnitude above the tunnel's observed ~50 ms round-trip jitter, where
the old 100k-step window (~55 ms) was *inside* it, producing 33% spreads,
bimodal samples, and degenerate reps where the large run timed no longer
than the small one.  Degenerate samples are rejected and re-drawn, the
estimate is the median, and the spread is MAD-based (robust to outlier
reps).  A spread above SPREAD_GATE_PCT triggers one full re-measurement;
the run with the lower spread is kept.

Regression gate: the result is compared against the last
docs/bench_history.json entry recorded with the SAME methodology — a drop
of more than 5% beyond the measured spread prints a WARNING to stderr.
Pre-round-5 entries carry methodology noise (see the history file's note)
and are never used for gating.

Prints exactly one JSON line (stdout):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "spread_pct": N, "vs_last_pct": N}
"""

import datetime
import json
import os
import sys

import jax
import jax.numpy as jnp

from gym_copter_tpu.utils import profiling
from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import base, tasks
from gym_copter_tpu.ops import pallas_rollout as pr

NORTH_STAR = 1.0e7  # env-steps/s per host (BASELINE.json north_star)

B = 4096
# Marginal workload = (T_HI - T_LO) kernel steps = 1M (~0.6 s at 7G
# env-steps/s), >= 10x the tunnel's ~50 ms jitter; samples whose measured
# marginal time lands below MIN_MARGINAL_S are jitter artifacts, rejected.
T_LO, T_HI = 100_000, 1_100_000
REPS = 10
MIN_MARGINAL_S = 0.05
SPREAD_GATE_PCT = 10.0
METHODOLOGY = 'r5:diff1M/mad/reject50ms'

# CPU fallback (driver smoke on non-TPU backends): the scan path runs
# ~1000x slower, so scale the windows down to keep the run finite.
T_LO_CPU, T_HI_CPU = 200, 2_200


def main():
    params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    spec = tasks.LANDER_3D
    key = jax.random.PRNGKey(0)
    env_ids = jnp.arange(B, dtype=jnp.int32)
    state, _ = base.reset(key, env_ids, jnp.zeros(B, jnp.int32), params, spec)
    action = jnp.full((4, B), 1.625e-2, jnp.float32)  # demo heuristic thrust

    on_tpu = jax.default_backend() == 'tpu'

    def rollout(st, num_steps, seed):
        if on_tpu:
            return pr.fused_rollout(st, action, num_steps, params, spec,
                                    seed=seed)
        return pr.scan_rollout(st, action, key, env_ids, num_steps, params,
                               spec)

    # correctness sanity: fused episode counts == XLA-path episode counts
    sanity_record = None
    if on_tpu:
        import time as _time
        _t0 = _time.perf_counter()
        _, ft = rollout(state, 10_000, 0)
        _, st_ = pr.scan_rollout(state, action, key, env_ids, 10_000, params,
                                 spec)
        f_eps = float(jnp.mean(ft['episodes']))
        s_eps = float(jnp.mean(st_['episodes']))
        sanity_record = {
            'test': 'bench.fused_vs_scan_episode_sanity',
            'passed': abs(f_eps - s_eps) < 0.5,
            'seconds': round(_time.perf_counter() - _t0, 2),
        }
        assert sanity_record['passed'], (f_eps, s_eps)

    def run(num_steps):
        _, tot = rollout(state, num_steps, 0)
        return float(tot['reward_sum'][0])              # forced host sync

    t_lo, t_hi = (T_LO, T_HI) if on_tpu else (T_LO_CPU, T_HI_CPU)
    min_marg = MIN_MARGINAL_S if on_tpu else 0.0

    def measure():
        return profiling.differential_steps_per_sec(
            run, t_lo, t_hi, batch=B, reps=REPS, min_marginal_s=min_marg)

    res = measure()
    if res['spread_pct'] > SPREAD_GATE_PCT:
        print(f'NOTE: spread {res["spread_pct"]:.1f}% > '
              f'{SPREAD_GATE_PCT}% gate — re-measuring once',
              file=sys.stderr)
        res2 = measure()
        if res2['spread_pct'] < res['spread_pct']:
            res = res2
        if res['spread_pct'] > SPREAD_GATE_PCT:
            print(f'WARNING: spread {res["spread_pct"]:.1f}% still above '
                  f'the {SPREAD_GATE_PCT}% gate after re-measurement — '
                  f'treat this value as noisy', file=sys.stderr)
    steps_per_sec = res['steps_per_sec']

    # regression gate vs the last same-methodology run
    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             'docs', 'bench_history.json')
    history = {'note': '', 'runs': []}
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            loaded = json.load(f)
        if isinstance(loaded, list):  # migrate the pre-r5 flat-list format
            history['runs'] = loaded
            history['note'] = (
                'Entries without a "methodology" key predate round 5 and '
                'were measured with a 100k-step differential window — '
                'smaller than the TPU tunnel\'s round-trip jitter — so '
                'their values carry up to ~35% methodology noise and their '
                'spread_pct is a plain stddev over unrejected (sometimes '
                'degenerate) samples.  They are kept for the historical '
                'record but are not comparable to r5+ entries and are '
                'never used for regression gating.')
        else:
            history = loaded
    vs_last_pct = None
    prior = [r for r in history['runs']
             if r.get('methodology') == METHODOLOGY
             and r.get('backend') == jax.default_backend()]
    if prior:
        last = prior[-1]['value']
        vs_last_pct = (steps_per_sec - last) / last * 100.0
        # warn when the drop exceeds the measured noise plus the 5% gate
        if vs_last_pct < -(5.0 + res['spread_pct']):
            print(f'WARNING: headline bench regressed {vs_last_pct:.1f}% vs '
                  f'last recorded run ({last:.3g} env-steps/s) — beyond the '
                  f'{res["spread_pct"]:.1f}% measured spread + 5% gate',
                  file=sys.stderr)
    history['runs'].append({
        'date': datetime.datetime.now(datetime.timezone.utc)
                .strftime('%Y-%m-%dT%H:%M:%SZ'),
        'value': round(steps_per_sec),
        'spread_pct': round(res['spread_pct'], 2),
        'samples': [round(s) for s in res['samples']],
        'rejected': res['rejected'],
        'backend': jax.default_backend(),
        'methodology': METHODOLOGY,
    })
    os.makedirs(os.path.dirname(hist_path), exist_ok=True)
    with open(hist_path, 'w') as f:
        json.dump(history, f, indent=1)

    # hardware-test cadence (VERDICT r4 weak #8): the driver runs bench.py
    # every round, so refresh docs/tpu_tests.json here when it is stale
    # (>20 h) — hardware coverage can no longer silently go stale — and
    # append this run's fused-vs-scan sanity as a recorded test.  All
    # subprocess output goes to stderr; stdout stays the one JSON line.
    if on_tpu and not os.environ.get('GCT_SKIP_TPU_TESTS'):
        repo = os.path.dirname(os.path.abspath(__file__))
        tt_path = os.path.join(repo, 'docs', 'tpu_tests.json')
        stale = True
        if os.path.exists(tt_path):
            stale = (datetime.datetime.now().timestamp()
                     - os.path.getmtime(tt_path)) > 20 * 3600
        if stale:
            import subprocess
            print('docs/tpu_tests.json stale — regenerating on-chip test '
                  'record (set GCT_SKIP_TPU_TESTS=1 to skip)',
                  file=sys.stderr)
            try:
                subprocess.run(
                    ['bash', os.path.join(repo, 'scripts',
                                          'run_tpu_tests.sh'), tt_path],
                    stdout=sys.stderr, stderr=sys.stderr, timeout=2400,
                    check=False)
            except Exception as e:  # never let the record kill the bench
                print(f'tpu-test regeneration failed: {e}', file=sys.stderr)
        if sanity_record is not None and os.path.exists(tt_path):
            try:
                with open(tt_path) as f:
                    tt = json.load(f)
                tt['tests'] = ([t for t in tt.get('tests', [])
                                if t['test'] != sanity_record['test']]
                               + [sanity_record])
                tt['all_passed'] = all(t['passed'] for t in tt['tests'])
                tt['bench_sanity_recorded'] = (
                    datetime.datetime.now(datetime.timezone.utc)
                    .strftime('%Y-%m-%dT%H:%M:%SZ'))
                with open(tt_path, 'w') as f:
                    json.dump(tt, f, indent=1)
            except Exception as e:
                print(f'tpu-test record append failed: {e}', file=sys.stderr)

    out = {
        'metric': 'lander3d_env_steps_per_sec_4096envs_1chip',
        'value': round(steps_per_sec),
        'unit': 'env-steps/s',
        'vs_baseline': round(steps_per_sec / NORTH_STAR, 3),
        'spread_pct': round(res['spread_pct'], 2),
        'rejected_samples': res['rejected'],
    }
    if vs_last_pct is not None:
        out['vs_last_pct'] = round(vs_last_pct, 2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
