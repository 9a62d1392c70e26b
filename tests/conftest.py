"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no tests at all (SURVEY.md §4); this suite is built on the
strategy SURVEY.md §4 prescribes: float64 oracle parity, property tests on
the branchless status machine, and fake-multi-device sharding tests via
``--xla_force_host_platform_device_count`` — so the full sharded path is
exercised without TPU hardware.  float64 is enabled globally; the engine is
dtype-explicit so float32 behavior is still testable.
"""

import os

if os.environ.get('GCT_TPU_TESTS'):
    # escape hatch for the @pytest.mark.skipif(backend != 'tpu') tests:
    # keep the container's default (real-TPU) platform and float32, e.g.
    #   GCT_TPU_TESTS=1 pytest tests/test_pallas_rollout.py -k tpu
    # (scripts/run_tpu_tests.sh runs the whole on-chip subset and records
    # docs/tpu_tests.json)
    import jax  # noqa: F401
else:
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    _flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in _flags:
        os.environ['XLA_FLAGS'] = (
            _flags + ' --xla_force_host_platform_device_count=8').strip()

    import jax

    # The container's sitecustomize registers a tunneled TPU backend and
    # forces jax_platforms='axon,cpu'; tests must run on the virtual CPU
    # mesh (true float64, 8 fake devices), so force the platform back
    # before any backend initializes.
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
