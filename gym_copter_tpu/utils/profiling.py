"""Timing and profiling harness.

The reference has no profiling support at all (SURVEY.md §5 — its only
instruments are stdout reward prints and a wall-clock sync sleep).  This
module provides the two tools the TPU build uses:

* `differential_steps_per_sec` — the honest-throughput measurement used by
  bench.py and the kernel benchmarks.  On this rig the TPU is reached
  through a tunnel whose `block_until_ready` acks dispatch before
  completion, so naive timing both under-counts (no completion wait) and
  over-counts (fixed per-call round-trip latency).  Timing the SAME
  workload at two sizes and dividing the extra work by the extra time
  cancels both effects; a host-side scalar read after every run forces
  true completion.

* `trace` — thin wrapper over `jax.profiler.trace` for XLA/TPU timeline
  captures viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable


def timed_host_sync(fn: Callable[[], float], reps: int) -> float:
    """Mean wall seconds per call; `fn` must end with a host read (e.g.
    `float(result[0])`) so the device work is actually finished."""
    fn()  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def differential_samples(run, t_lo: int, t_hi: int, *,
                         batch: int, reps: int = 5,
                         min_marginal_s: float = 0.0) -> dict:
    """Per-rep marginal throughput samples of `run(num_steps)`.

    Each rep times one (t_lo, t_hi) pair and yields its own marginal
    steps/s, so the caller can report median AND spread — a single
    aggregated number hides tunnel-noise variance (the round-3 headline
    drifted -4% with no way to tell noise from regression).

    Degenerate samples — reps where the tunnel's round-trip jitter ate the
    marginal workload, so d_hi - d_lo <= min_marginal_s — are REJECTED and
    re-sampled (up to 3x reps attempts), never clamped: the round-4
    headline carried samples where a 120k-step run timed *no longer than*
    a 20k-step run, clamped to 1e-12 s and reported as absurd throughput.
    Callers must size (t_hi - t_lo) so the expected marginal work is well
    above min_marginal_s (>= ~10x is the rule of thumb).
    """
    run(t_lo)  # warm-up / compile
    run(t_hi)
    samples, rejected = [], 0
    max_attempts = 3 * reps
    floor = max(min_marginal_s, 1e-9)
    for _ in range(max_attempts):
        if len(samples) >= reps:
            break
        t0 = time.perf_counter()
        run(t_lo)
        d_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(t_hi)
        d_hi = time.perf_counter() - t0
        marginal = d_hi - d_lo
        if marginal <= floor:
            rejected += 1
            continue
        samples.append(batch * (t_hi - t_lo) / marginal)
    return {'samples': samples, 'rejected': rejected}


def robust_stats(samples: list) -> dict:
    """Median + MAD-based spread of throughput samples.

    spread_pct is the normalized median absolute deviation
    (1.4826 * MAD / median, in percent) — robust to the tunnel's
    occasional multi-x outlier rep, unlike the stddev used pre-round-5
    (one 37G outlier among 7G samples blew spread past any useful gate).
    """
    import statistics

    if not samples:
        return {'median': 0.0, 'spread_pct': float('inf'), 'n': 0}
    med = statistics.median(samples)
    mad = statistics.median(abs(s - med) for s in samples)
    spread = (1.4826 * mad / med * 100.0) if med > 0 else float('inf')
    return {'median': med, 'spread_pct': spread, 'n': len(samples)}


def differential_steps_per_sec(run, t_lo: int, t_hi: int, *,
                               batch: int, reps: int = 5,
                               min_marginal_s: float = 0.0) -> dict:
    """Marginal throughput of `run(num_steps) -> host-synced result`.

    Returns {'steps_per_sec', 'ns_per_iter', 'samples', 'spread_pct',
    'rejected', 'n_samples'}: steps_per_sec is the MEDIAN of per-rep
    differential samples, spread_pct the MAD-based robust spread in
    percent (see `robust_stats`), rejected the count of degenerate reps
    discarded because jitter swallowed the marginal workload (see
    `differential_samples`).
    """
    res = differential_samples(run, t_lo, t_hi, batch=batch, reps=reps,
                               min_marginal_s=min_marginal_s)
    samples = res['samples']
    stats = robust_stats(samples)
    med = stats['median']
    return {
        'steps_per_sec': med,
        'ns_per_iter': (batch / med * 1e9) if med > 0 else float('inf'),
        'samples': samples,
        'spread_pct': stats['spread_pct'],
        'rejected': res['rejected'],
        'n_samples': len(samples),
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/TPU profiler trace into `log_dir`:

        with profiling.trace('/tmp/trace'):
            run_workload()
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
