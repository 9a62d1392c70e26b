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
                         batch: int, reps: int = 5) -> list:
    """Per-rep marginal throughput samples of `run(num_steps)`.

    Each rep times one (t_lo, t_hi) pair and yields its own marginal
    steps/s, so the caller can report median AND spread — a single
    aggregated number hides tunnel-noise variance (the round-3 headline
    drifted -4% with no way to tell noise from regression)."""
    run(t_lo)  # warm-up / compile
    run(t_hi)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(t_lo)
        d_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(t_hi)
        d_hi = time.perf_counter() - t0
        marg = max(d_hi - d_lo, 1e-12) / (t_hi - t_lo)
        samples.append(batch / marg)
    return samples


def differential_steps_per_sec(run, t_lo: int, t_hi: int, *,
                               batch: int, reps: int = 5) -> dict:
    """Marginal throughput of `run(num_steps) -> host-synced result`.

    Returns {'steps_per_sec', 'ns_per_iter', 'samples', 'spread_pct'}:
    steps_per_sec is the MEDIAN of per-rep differential samples (a mean of
    lo/hi aggregates lets one slow sample skew the estimate), samples the
    raw per-rep values, spread_pct their relative stddev in percent.
    """
    import statistics

    samples = differential_samples(run, t_lo, t_hi, batch=batch, reps=reps)
    med = statistics.median(samples)
    spread = (statistics.pstdev(samples) / med * 100.0) if len(samples) > 1 \
        else 0.0
    return {
        'steps_per_sec': med,
        'ns_per_iter': batch / med * 1e9,
        'samples': samples,
        'spread_pct': spread,
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
