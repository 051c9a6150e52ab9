"""k-NN and retrieval over DTW distances.

Parity with reference `util/neighbors.py:29-93` (heap top-k, majority vote
with nearest-of-majority tiebreak). The distance backend is this
framework's DTW (`ops/dtw.py`); `batch_distances` optionally routes the
all-pairs sweep through the batched TPU DTW kernel, replacing the
reference's per-pair compiled scalar core + process pool.
"""

import heapq
import multiprocessing as mp
import warnings
from collections import Counter

import numpy as np

from ..ops.dtw import build_dtw_distance_fn

# Fork-time closure hack (reference util/neighbors.py:20-26): pool workers
# read the train set + distance fn from a module global captured at fork,
# so non-picklable distance fns (native .so closures) still parallelize.
_FORK_CTX = {}


def _fork_dist(args):
    i, x = args
    return i, _FORK_CTX['fn'](x, _FORK_CTX['X'][i])


def pooled_distances(x, X, distance_fn, processes):
    """[(i, dist)] of x against every row of X over a fork process pool.

    Parity with reference `util/neighbors.py:21-41` (optional process-pool
    brute force). Requires the 'fork' start method; falls back to serial
    when unavailable, or when a JAX backend is already initialized and the
    distance_fn might close over it (XLA clients are not fork-safe —
    forked workers calling into a live backend can hang). Native .so /
    numpy closures are tagged fork-safe via `fn.fork_safe = True`.
    """
    if not getattr(distance_fn, 'fork_safe', False):
        try:  # private jax API: treat any failure as "assume initialized"
            import jax._src.xla_bridge as _xb
            backend_live = _xb.backends_are_initialized()
        except Exception:
            backend_live = True
        if backend_live:
            warnings.warn(
                'pooled_distances: JAX backend already initialized and '
                'distance_fn is not tagged fork_safe; running serially '
                '(forking a live XLA client is unsafe).')
            return [(i, distance_fn(x, xt)) for i, xt in enumerate(X)]
    try:
        ctx = mp.get_context('fork')
    except ValueError:
        return [(i, distance_fn(x, xt)) for i, xt in enumerate(X)]
    _FORK_CTX['X'] = X
    _FORK_CTX['fn'] = distance_fn
    try:
        with ctx.Pool(processes) as pool:
            return pool.map(_fork_dist, [(i, x) for i in range(len(X))])
    finally:
        _FORK_CTX.clear()


class KNearestNeighbors:

    def __init__(self, X, y, distance_fn, k=1, processes=None):
        self.X = X
        self.y = y
        self.k = k
        self.distance_fn = distance_fn
        self.processes = processes

    def predict(self, x):
        return self.predict_n(x)

    def predict_n(self, *xs):
        top_k = []
        for x in xs:
            if self.processes and self.processes > 1 and len(self.X) > 1:
                dists = pooled_distances(x, self.X, self.distance_fn,
                                         self.processes)
            else:
                dists = ((i, self.distance_fn(x, xt))
                         for i, xt in enumerate(self.X))
            for i, d in dists:
                (heapq.heappush if len(top_k) < self.k
                 else heapq.heappushpop)(top_k, (-d, i))
        top_k = [(-d, i) for d, i in top_k]

        cls_count = Counter(self.y[i] for _, i in top_k)
        max_count = cls_count.most_common(1)[0][1]

        best_i = None
        best_cls_dist = float('inf')
        for d, i in top_k:
            if cls_count[self.y[i]] == max_count and d < best_cls_dist:
                best_cls_dist = d
                best_i = i
        return self.y[best_i], best_i


class Neighbors:
    """Retrieval ranking (`util/neighbors.py:76-93`)."""

    def __init__(self, X, distance_fn):
        self.X = X
        self.distance_fn = distance_fn

    def find(self, x, k, min_len):
        knn_pq = []
        for i, x_train in enumerate(self.X):
            if x_train is not None and x_train.shape[0] >= min_len:
                d = self.distance_fn(x, x_train)
                (heapq.heappush if len(knn_pq) < k
                 else heapq.heappushpop)(knn_pq, (-d, i))
        return [(i, -nd) for nd, i in sorted(knn_pq, key=lambda z: -z[0])]

    def dist(self, x, i):
        return self.distance_fn(x, self.X[i])


def batch_distances_tpu(queries, targets, max_len=512,
                        step_pattern='symmetricP2',
                        query_block=64, target_block=128):
    """(Q, T) normalized DTW distances on device (row-vectorized scan).

    queries/targets: lists of (T_i, D) arrays. Sequences longer than
    max_len are truncated (retrieval sweeps; callers pick max_len).
    Infeasible symmetricP2 pairs come back +inf (callers may re-run the
    inf entries with 'symmetric2', mirroring the host fallback).

    The sweep runs in (query_block x target_block) pair chunks: each
    pair's DP holds an (L, L) local-cost slab, so an unchunked
    1000x1000 corpus would allocate hundreds of GB at once. Blocks are
    zero-padded to power-of-two sizes so the whole sweep reuses a
    handful of compiled shapes.
    """
    from ..ops.dtw import dtw_distance_matrix_tpu

    nq, nt = len(queries), len(targets)
    if nq == 0 or nt == 0:
        return np.zeros((nq, nt), np.float32)

    def pad(seqs, rows):
        d = seqs[0].shape[-1]
        out = np.zeros((rows, max_len, d), np.float32)
        lens = np.ones(rows, np.int32)  # dummy rows get length 1
        for i, s in enumerate(seqs):
            n = min(len(s), max_len)
            out[i, :n] = s[:n]
            lens[i] = max(n, 1)
        return out, lens

    def block_of(n, cap):
        b = 1
        while b < min(n, cap):
            b *= 2
        return b

    qb = block_of(nq, query_block)
    tb = block_of(nt, target_block)
    nq_pad = -(-nq // qb) * qb
    nt_pad = -(-nt // tb) * tb
    q, ql = pad(queries, nq_pad)
    t, tl = pad(targets, nt_pad)

    pallas_fn = None
    if max_len == 128:
        # lane-packed Pallas kernel: ~7x the row-scan on chip
        try:
            from ..ops.pallas.dtw_kernel import dtw_matrix_pallas
            pallas_fn = dtw_matrix_pallas
        except Exception:
            pass

    out = np.empty((nq_pad, nt_pad), np.float32)
    for i in range(0, nq_pad, qb):
        for j in range(0, nt_pad, tb):
            qs, qls = q[i:i + qb], ql[i:i + qb]
            ts, tls = t[j:j + tb], tl[j:j + tb]
            if pallas_fn is not None:
                try:
                    out[i:i + qb, j:j + tb] = pallas_fn(
                        qs, qls, ts, tls, step_pattern=step_pattern)
                    continue
                except Exception:
                    pallas_fn = None
            out[i:i + qb, j:j + tb] = np.asarray(
                dtw_distance_matrix_tpu(qs, qls, ts, tls,
                                        step_pattern=step_pattern))
    out = out[:nq, :nt]
    # zero-length sequences are infeasible, not all-zero rows of length
    # 1: the host path errors/returns inf there (ValueError -> inf)
    empty_q = np.array([len(s) == 0 for s in queries], bool)
    empty_t = np.array([len(s) == 0 for s in targets], bool)
    out[empty_q, :] = np.inf
    out[:, empty_t] = np.inf
    return out


def make_dtw_fns():
    """(primary symmetricP2, fallback symmetric2) distance fns
    (`recognize.py:133-135`)."""
    return (build_dtw_distance_fn('symmetricP2'),
            build_dtw_distance_fn('symmetric2'))
