"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can be
exercised on a single host (benchmarks run on real TPU hardware via bench.py).

The container's sitecustomize registers the axon TPU backend and imports jax
at interpreter startup, so env vars are read before conftest runs —
``jax.config.update`` is the reliable override.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: amortizes jit compiles across test runs.
# The cache key includes a host-CPU fingerprint: XLA:CPU AOT artifacts are
# machine-feature-specific, and loading a cache written on a different
# machine can SIGILL mid-test-run.


def _cpu_fingerprint() -> str:
    import hashlib
    try:
        with open('/proc/cpuinfo') as f:
            flags = next(
                (line for line in f if line.startswith('flags')), '')
    except OSError:
        flags = ''
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


_CACHE_DIR = os.path.join(
    os.path.dirname(__file__), '..', '.jax_cache', _cpu_fingerprint())
jax.config.update('jax_compilation_cache_dir', os.path.abspath(_CACHE_DIR))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.2)
