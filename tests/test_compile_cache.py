"""Persistent XLA compilation cache (vpd_tpu/core/compile_cache.py).

No reference counterpart (eager torch pays no compile); this is the
TPU-native cold-start story: entry points warm across processes. See
PERF.md "cold start" for the relay measurements.
"""

import json
import os
import subprocess
import sys

from vpd_tpu.core import compile_cache

_CHILD = r"""
import json, os, sys
import jax
jax.config.update('jax_platforms', 'cpu')
import vpd_tpu
# CPU compiles are sub-second; force them under the persistence bar
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
import jax.numpy as jnp

@jax.jit
def probe_fn(x):
    return jnp.sin(x @ x.T).sum() * 3.0

import numpy as np
x = np.arange(64, dtype=np.float32).reshape(8, 8)
val = float(probe_fn(x))
print(json.dumps({
    'val': val,
    'cache_dir': jax.config.jax_compilation_cache_dir,
    'entries': sorted(os.listdir(os.environ['VPD_JAX_CACHE_DIR'])),
}))
"""


def _run_child(cache_dir, extra_env=None):
    env = dict(os.environ, VPD_JAX_CACHE_DIR=str(cache_dir))
    env.pop('JAX_PLATFORMS', None)
    env.update(extra_env or {})
    out = subprocess.run([sys.executable, '-c', _CHILD],
                         capture_output=True, text=True, env=env,
                         timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cache_populates_and_hits(tmp_path):
    cache_dir = tmp_path / 'jaxcache'
    first = _run_child(cache_dir)
    assert first['cache_dir'] == str(cache_dir)
    probe_entries = [e for e in first['entries'] if 'probe_fn' in e]
    assert probe_entries, first['entries']

    second = _run_child(cache_dir)
    assert second['val'] == first['val']
    # the hit must not rewrite or duplicate the entry
    assert [e for e in second['entries'] if 'probe_fn' in e] \
        == probe_entries


def test_env_opt_out(tmp_path):
    cache_dir = tmp_path / 'nocache'
    cache_dir.mkdir()  # child lists it even when caching is off
    res = _run_child(cache_dir, {'VPD_JAX_CACHE': '0'})
    assert res['cache_dir'] is None
    assert res['entries'] == []


def test_enable_idempotent():
    # the conftest already imported vpd_tpu -> enabled in-process
    assert compile_cache.enable() == compile_cache.enable()
