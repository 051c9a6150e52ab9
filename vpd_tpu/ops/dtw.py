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
            # pattern 3: (i-3, j-2) -> weights 2,2,1 (mirror of pattern
            # 1: Sakoe-Chiba symmetric weight = di+dj per step)
            if i >= 3 and j >= 2:
                best = min(best, g[i - 3, j - 2] + 2 * d[i - 2, j - 1]
                           + 2 * d[i - 1, j] + d[i, j])
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
                fn = build_native_dtw_fn(step_pattern)
                fn.fork_safe = True  # pure C++ .so, no XLA client
                return fn
        except Exception:
            pass

    def dtw_fn(a, b):
        d = pairwise_l2(a, b)
        return dtw_distance(d, step_pattern=step_pattern)

    dtw_fn.fork_safe = True  # pure numpy DP, no XLA client
    return dtw_fn


# ---------------------------------------------------------------------------
# Batched TPU path
# ---------------------------------------------------------------------------

if _HAS_JAX:

    BIG = jnp.float32(1e30)

    def _row_scan_symmetric2(d, n, m):
        """Vectorized-row DP via the (min,+) prefix trick.

        Within a row, g[j] = min(c[j], g[j-1] + d[j]) with
        c[j] = min(prev[j-1] + 2 d[j], prev[j] + d[j]); unrolling gives
        g = S + cummin(c - S) where S is the prefix sum of d — so each
        row is one shifted-min + one log-step cumulative min, and only
        the row loop is sequential (N steps instead of N*M).
        """
        N, M = d.shape
        col = jnp.arange(M)
        col_valid = col < m

        def cummin(x):
            shift = 1
            while shift < M:
                x = jnp.minimum(
                    x, jnp.concatenate([jnp.full((shift,), BIG),
                                        x[:-shift]]))
                shift *= 2
            return x

        end_onehot = (col == m - 1).astype(jnp.float32)

        def row_step(carry, row):
            prev, final, i = carry
            dj = jnp.where(col_valid, row, BIG)
            prev_shift = jnp.concatenate([jnp.array([BIG]), prev[:-1]])
            c = jnp.where(
                i == 0,
                jnp.where(col == 0, dj, BIG),
                jnp.minimum(prev_shift + 2 * dj, prev + dj))
            s = jnp.cumsum(jnp.where(col_valid, row, 0.))
            g = jnp.minimum(s + cummin(c - s), BIG)
            g = jnp.where(col_valid, g, BIG)
            # mask-reduce instead of a per-row lane gather of g[m-1]
            final = jnp.where(i == n - 1,
                              jnp.sum(jnp.minimum(g, BIG) * end_onehot),
                              final)
            return (g, final, i + 1), None

        (_, final, _), _ = jax.lax.scan(
            row_step, (jnp.full((M,), BIG), jnp.float32(0), jnp.int32(0)),
            d)
        return final

    def _row_scan_symmetricP2(d, n, m):
        """Vectorized-row DP for the Sakoe-Chiba P=2 pattern.

        Every step pattern consumes >= 1 row, so there is NO within-row
        dependency: each row is pure shifted adds/mins over the previous
        three g rows and two d rows. N sequential steps total.
        """
        N, M = d.shape
        col = jnp.arange(M)
        col_valid = col < m

        def shift(x, k):
            return jnp.concatenate([jnp.full((k,), BIG), x[:-k]]) \
                if k > 0 else x

        def shift0(x, k):  # shift with zero fill (for cost rows)
            return jnp.concatenate([jnp.zeros((k,)), x[:-k]]) \
                if k > 0 else x

        end_onehot = (col == m - 1).astype(jnp.float32)

        def row_step(carry, row):
            g1, g2, g3, d1, d2, final, i = carry
            dj = jnp.where(col_valid, row, BIG)

            diag = shift(g1, 1) + 2 * dj
            p1 = jnp.where(
                (i >= 2) & (col >= 3),
                shift(g2, 3) + 2 * shift0(d1, 2) + 2 * shift0(dj, 1) + dj,
                BIG)
            p3 = jnp.where(
                (i >= 3) & (col >= 2),
                shift(g3, 2) + 2 * shift0(d2, 1) + 2 * d1 + dj,
                BIG)
            g = jnp.minimum(jnp.minimum(diag, p1), p3)
            g = jnp.where((i == 0) & (col == 0), dj, g)
            g = jnp.where(col_valid, jnp.minimum(g, BIG), BIG)
            final = jnp.where(i == n - 1, jnp.sum(g * end_onehot), final)
            return (g, g1, g2, dj, d1, final, i + 1), None

        init = (jnp.full((M,), BIG),) * 3 + (jnp.zeros((M,)),) * 2 \
            + (jnp.float32(0), jnp.int32(0))
        (_, _, _, _, _, final, _), _ = jax.lax.scan(row_step, init, d)
        return final

    def _pairwise_cost(a, b):
        sq = (jnp.sum(a * a, 1)[:, None] + jnp.sum(b * b, 1)[None, :]
              - 2 * a @ b.T)
        return jnp.sqrt(jnp.maximum(sq, 0))

    def _make_all_pairs(step_pattern):
        dp = (_row_scan_symmetricP2 if step_pattern == 'symmetricP2'
              else _row_scan_symmetric2)

        def one(q, ql, t, tl):
            d = _pairwise_cost(q, t)
            cost = dp(d, ql, tl)
            cost = jnp.where(cost >= BIG * 0.5, jnp.inf, cost)
            return cost / (ql + tl)

        over_t = jax.vmap(one, in_axes=(None, None, 0, 0))
        return jax.jit(jax.vmap(over_t, in_axes=(0, 0, None, None)))

    # One jitted entry per step pattern, built once at import: repeated
    # same-shape calls (kNN trials) hit the compile cache instead of
    # retracing a fresh closure per invocation.
    _ALL_PAIRS = {p: _make_all_pairs(p)
                  for p in ('symmetric2', 'symmetricP2')}

    def dtw_distance_matrix_fast(queries, q_lens, targets, t_lens,
                                 step_pattern='symmetric2'):
        """All-pairs normalized DTW, row-vectorized (fast TPU path).

        queries: (Q, N_pad, D), targets: (T, M_pad, D); returns (Q, T).
        Unreachable (slope-constrained) pairs return +inf.
        """
        return _ALL_PAIRS[step_pattern](
            jnp.asarray(queries, jnp.float32), jnp.asarray(q_lens),
            jnp.asarray(targets, jnp.float32), jnp.asarray(t_lens))

    def dtw_distance_matrix_tpu(queries, q_lens, targets, t_lens,
                                step_pattern='symmetric2'):
        """All-pairs normalized DTW on device (row-vectorized scan)."""
        return dtw_distance_matrix_fast(queries, q_lens, targets, t_lens,
                                        step_pattern)

    def dtw_distance_tpu(a, b, n=None, m=None, step_pattern='symmetric2'):
        """Normalized DTW of two (padded) sequences on device."""
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        n = a.shape[0] if n is None else n
        m = b.shape[0] if m is None else m
        return dtw_distance_matrix_fast(
            a[None], jnp.array([n]), b[None], jnp.array([m]),
            step_pattern)[0, 0]
