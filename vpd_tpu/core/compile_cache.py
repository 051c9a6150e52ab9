"""Persistent XLA compilation cache, on by default for every entry point.

TPU-first rationale: everything under jit is traced once and compiled;
on this hardware the compile, not the math, dominates cold starts. The
measured numbers on the dev relay (PERF.md "cold start"): a trivial
program compiles in 100-240 s under load, while a persistent-cache hit
deserializes the same executable in seconds. The reference has no
counterpart (eager torch pays no compile); for a compiled framework the
cache is what makes sweeps, CLIs, and repeated benchmark runs start
warm across *processes* — the in-process jit cache already dedupes
within one run.

Enabled from `vpd_tpu/__init__.py` so every CLI, the bench, and the
driver contracts inherit it. Controls:

  VPD_JAX_CACHE=0          disable entirely
  VPD_JAX_CACHE_DIR=<dir>  override the location
                           (default ~/.cache/vpd_tpu/jax)

The cache key covers the serialized HLO, jaxlib/backend versions, XLA
flags, and compile options, so entries are never reused across
incompatible toolchains; stale entries are evicted LRU under a 4 GiB
cap. Failures (read-only FS, old jax) degrade to no caching, never to
an error.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser('~'), '.cache', 'vpd_tpu', 'jax')

_enabled = False


def enable(cache_dir=None):
    """Idempotently point jax at the persistent compilation cache."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get('VPD_JAX_CACHE', '1') == '0':
        return False
    cache_dir = (cache_dir or os.environ.get('VPD_JAX_CACHE_DIR')
                 or _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # Relay compiles are minutes; anything >2s is worth persisting.
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          2.0)
        jax.config.update('jax_compilation_cache_max_size',
                          4 * 1024 ** 3)
    except Exception:
        return False
    _enabled = True
    return True
