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


def differential_steps_per_sec(run, t_lo: int, t_hi: int, *,
                               batch: int, reps: int = 5) -> dict:
    """Marginal throughput of `run(num_steps) -> host-synced result`.

    Returns {'steps_per_sec', 'ns_per_iter', 't_lo_s', 't_hi_s'} where
    steps_per_sec counts batch * steps and ns_per_iter is the marginal
    time of one batched iteration.
    """
    d_lo = timed_host_sync(lambda: run(t_lo), reps)
    d_hi = timed_host_sync(lambda: run(t_hi), reps)
    marg = max(d_hi - d_lo, 1e-12) / (t_hi - t_lo)
    return {
        'steps_per_sec': batch / marg,
        'ns_per_iter': marg * 1e9,
        't_lo_s': d_lo,
        't_hi_s': d_hi,
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
