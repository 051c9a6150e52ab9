"""Dynamic time warping with R-dtw step patterns.

The reference delegates to the compiled `dtw-python` core
(`util/neighbors.py:9-17`) with step pattern `symmetricP2` (falling back to
`symmetric2` for short sequences) and uses `normalizedDistance` (cost /
(N + M)). This module provides:

* a numpy host implementation (exact semantics, used for parity),
* a batched TPU implementation (`dtw_distance_matrix_tpu`): many (query,
  target) pairs evaluated as one `lax.scan` over DP rows with the pair
  dimension vectorized — retrieval sweeps run O(pairs) on the VPU instead
  of a Python loop over a compiled scalar core.

Step pattern semantics (R `dtw::symmetricP2`): each recursion is a
multi-step move; unreachable cells stay +inf; if the end cell is
unreachable (slope constraint violated) the distance is +inf, mirroring
the reference's ValueError -> inf behavior (`util/neighbors.py:14-16`).
"""

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    _HAS_JAX = True
except ImportError:
    _HAS_JAX = False

INF = np.inf


def _cost_matrix_symmetric2(d):
    n, m = d.shape
    g = np.full((n, m), INF)
    g[0, 0] = d[0, 0]
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                continue
            best = INF
            if i > 0 and j > 0:
                best = g[i - 1, j - 1] + 2 * d[i, j]
            if i > 0:
                best = min(best, g[i - 1, j] + d[i, j])
            if j > 0:
                best = min(best, g[i, j - 1] + d[i, j])
            g[i, j] = best
    return g


def _cost_matrix_symmetricP2(d):
    n, m = d.shape
    g = np.full((n, m), INF)
    g[0, 0] = d[0, 0]
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                continue
            best = INF
            # pattern 2: diagonal
            if i >= 1 and j >= 1:
                best = g[i - 1, j - 1] + 2 * d[i, j]
            # pattern 1: (i-2, j-3) -> weights 2,2,1
            if i >= 2 and j >= 3:
                best = min(best, g[i - 2, j - 3] + 2 * d[i - 1, j - 2]
                           + 2 * d[i, j - 1] + d[i, j])
            # pattern 3: (i-3, j-2) -> weights 2,1,1
            if i >= 3 and j >= 2:
                best = min(best, g[i - 3, j - 2] + 2 * d[i - 2, j - 1]
                           + d[i - 1, j] + d[i, j])
            g[i, j] = best
    return g


_PATTERNS = {
    'symmetric2': _cost_matrix_symmetric2,
    'symmetricP2': _cost_matrix_symmetricP2,
}


def dtw_distance(d, step_pattern='symmetricP2', normalized=True):
    """DTW distance of a pairwise local-cost matrix d (N, M)."""
    d = np.asarray(d, dtype=np.float64)
    n, m = d.shape
    g = _PATTERNS[step_pattern](d)
    dist = g[n - 1, m - 1]
    if normalized:
        dist = dist / (n + m)
    return float(dist)


def pairwise_l2(a, b):
    """Euclidean pairwise distances, sklearn `pairwise_distances` parity."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    sq = (np.sum(a * a, axis=1)[:, None] + np.sum(b * b, axis=1)[None, :]
          - 2 * a @ b.T)
    return np.sqrt(np.maximum(sq, 0))


def build_dtw_distance_fn(step_pattern='symmetricP2', prefer_native=True):
    """Sequence-level distance fn (reference util/neighbors.py:9-17).

    Uses the native C++ core (ops/dtw_native.py) when the toolchain is
    available — the equivalent of the reference's compiled dtw-python
    dependency — falling back to the pure-numpy DP.
    """
    if prefer_native:
        try:
            from .dtw_native import available, build_native_dtw_fn
            if available():
                return build_native_dtw_fn(step_pattern)
        except Exception:
            pass

    def dtw_fn(a, b):
        d = pairwise_l2(a, b)
        return dtw_distance(d, step_pattern=step_pattern)

    return dtw_fn


# ---------------------------------------------------------------------------
# Batched TPU path
# ---------------------------------------------------------------------------

if _HAS_JAX:

    def _tpu_symmetric2(d, n, m):
        """DP over rows via lax.scan; d is (N_pad, M_pad) with +inf padding
        outside (n, m). Returns unnormalized end cost."""
        N, M = d.shape
        BIG = jnp.float32(1e30)

        col_ids = jnp.arange(M)

        def row_step(carry, row_d):
            prev, row_idx = carry
            # left-to-right dependency within a row: scan over columns
            def col_step(left, inputs):
                dj, prev_j, prev_jm1, j = inputs
                diag = jnp.where((row_idx > 0) & (j > 0),
                                 prev_jm1 + 2 * dj, BIG)
                up = jnp.where(row_idx > 0, prev_j + dj, BIG)
                lf = jnp.where(j > 0, left + dj, BIG)
                here = jnp.minimum(jnp.minimum(diag, up), lf)
                here = jnp.where((row_idx == 0) & (j == 0), dj, here)
                return here, here

            prev_shift = jnp.concatenate([jnp.array([BIG]), prev[:-1]])
            _, row = jax.lax.scan(
                col_step, BIG, (row_d, prev, prev_shift, col_ids))
            return (row, row_idx + 1), row

        init = (jnp.full((M,), BIG), jnp.int32(0))
        (_, _), rows = jax.lax.scan(row_step, init, d)
        return rows[n - 1, m - 1]

    def dtw_distance_tpu(a, b, n=None, m=None):
        """symmetric2 normalized DTW of two (padded) sequences on device.

        a: (N_pad, D), b: (M_pad, D); n, m give true lengths (default all).
        """
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        n = a.shape[0] if n is None else n
        m = b.shape[0] if m is None else m
        sq = (jnp.sum(a * a, 1)[:, None] + jnp.sum(b * b, 1)[None, :]
              - 2 * a @ b.T)
        d = jnp.sqrt(jnp.maximum(sq, 0))
        return _tpu_symmetric2(d, n, m) / (n + m)

    def dtw_distance_matrix_tpu(queries, q_lens, targets, t_lens):
        """All-pairs normalized symmetric2 DTW.

        queries: (Q, N_pad, D), targets: (T, M_pad, D) with true lengths.
        Returns (Q, T) distances. vmapped over both axes; jit-able.
        """
        fn = lambda q, ql, t, tl: dtw_distance_tpu(q, t, ql, tl)
        over_t = jax.vmap(fn, in_axes=(None, None, 0, 0))
        over_qt = jax.vmap(over_t, in_axes=(0, 0, None, None))
        return over_qt(jnp.asarray(queries), jnp.asarray(q_lens),
                       jnp.asarray(targets), jnp.asarray(t_lens))
