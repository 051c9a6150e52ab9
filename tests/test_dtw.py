"""DTW correctness: hand-computed cases + host/TPU agreement."""

import numpy as np

from vpd_tpu.ops.dtw import (
    build_dtw_distance_fn, dtw_distance, dtw_distance_matrix_tpu,
    dtw_distance_tpu, pairwise_l2)


def test_symmetric2_hand_case():
    d = np.array([[1., 2.], [3., 4.]])
    # cm[0,0]=1; cm[0,1]=3; cm[1,0]=4; cm[1,1]=min(1+8, 3+4, 4+4)=7
    assert dtw_distance(d, 'symmetric2', normalized=False) == 7
    assert dtw_distance(d, 'symmetric2') == 7 / 4


def test_symmetricP2_hand_case():
    d = np.array([[1., 2.], [3., 4.]])
    # only the diagonal pattern applies on 2x2: 1 + 2*4 = 9
    assert dtw_distance(d, 'symmetricP2', normalized=False) == 9
    assert dtw_distance(d, 'symmetricP2') == 9 / 4


def test_symmetricP2_slope_constraint_inf():
    # 2 x 10 violates the P=2 slope constraint -> unreachable end cell
    d = np.ones((2, 10))
    assert dtw_distance(d, 'symmetricP2') == np.inf


def test_identical_sequences_zero():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(12, 4))
    fn = build_dtw_distance_fn('symmetric2')
    assert fn(a, a) < 1e-6
    fnp = build_dtw_distance_fn('symmetricP2')
    assert fnp(a, a) < 1e-6


def test_symmetric2_matches_textbook_dp():
    """Cross-check against an independent O(nm) min-cost implementation."""
    rng = np.random.default_rng(1)
    for _ in range(5):
        a = rng.normal(size=(rng.integers(3, 9), 3))
        b = rng.normal(size=(rng.integers(3, 9), 3))
        d = pairwise_l2(a, b)
        n, m = d.shape
        g = np.full((n + 1, m + 1), np.inf)
        g[0, 0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                step = min(g[i - 1, j - 1] + d[i - 1, j - 1],
                           g[i - 1, j], g[i, j - 1])
                # textbook symmetric2 weights the diagonal twice
                g[i, j] = min(g[i - 1, j - 1] + 2 * d[i - 1, j - 1],
                              g[i - 1, j] + d[i - 1, j - 1],
                              g[i, j - 1] + d[i - 1, j - 1])
        # match only when start cell counted once, as in dtw-python
        expected = g[n, m] - d[0, 0]
        got = dtw_distance(d, 'symmetric2', normalized=False)
        np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_tpu_matches_host():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(10, 4)).astype(np.float32)
    b = rng.normal(size=(14, 4)).astype(np.float32)
    host = build_dtw_distance_fn('symmetric2')(a, b)
    dev = float(dtw_distance_tpu(a, b))
    np.testing.assert_allclose(dev, host, rtol=1e-5)

    # padded batched form
    a_pad = np.zeros((3, 16, 4), np.float32)
    b_pad = np.zeros((2, 16, 4), np.float32)
    qs = [rng.normal(size=(rng.integers(5, 16), 4)).astype(np.float32)
          for _ in range(3)]
    ts = [rng.normal(size=(rng.integers(5, 16), 4)).astype(np.float32)
          for _ in range(2)]
    for i, q in enumerate(qs):
        a_pad[i, :len(q)] = q
    for i, t in enumerate(ts):
        b_pad[i, :len(t)] = t
    mat = np.asarray(dtw_distance_matrix_tpu(
        a_pad, [len(q) for q in qs], b_pad, [len(t) for t in ts]))
    for i, q in enumerate(qs):
        for j, t in enumerate(ts):
            np.testing.assert_allclose(
                mat[i, j], build_dtw_distance_fn('symmetric2')(q, t),
                rtol=1e-4)


def test_all_pairs_no_retrace_on_same_shape():
    """Two same-shape calls hit the jit cache (VERDICT r1 weak #4)."""
    from vpd_tpu.ops import dtw as dtw_mod

    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 6, 3)).astype(np.float32)
    t = rng.normal(size=(3, 6, 3)).astype(np.float32)
    lens_q = np.array([6, 5])
    lens_t = np.array([6, 4, 5])
    fn = dtw_mod._ALL_PAIRS['symmetric2']
    before = fn._cache_size()
    a = dtw_mod.dtw_distance_matrix_tpu(q, lens_q, t, lens_t,
                                        step_pattern='symmetric2')
    after_first = fn._cache_size()
    b = dtw_mod.dtw_distance_matrix_tpu(q, lens_q, t, lens_t,
                                        step_pattern='symmetric2')
    assert fn._cache_size() == after_first  # no recompile on 2nd call
    assert after_first >= before
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_batch_distances_tpu_chunked_matches_host():
    """Blocked all-pairs sweep == per-pair host DP, incl. ragged blocks."""
    from vpd_tpu.tasks.neighbors import batch_distances_tpu

    rng = np.random.default_rng(2)
    qs = [rng.normal(size=(rng.integers(8, 20), 5)).astype(np.float32)
          for _ in range(5)]
    ts = [rng.normal(size=(rng.integers(8, 20), 5)).astype(np.float32)
          for _ in range(7)]
    got = batch_distances_tpu(qs, ts, max_len=32,
                              step_pattern='symmetric2',
                              query_block=2, target_block=4)
    fn = build_dtw_distance_fn('symmetric2', prefer_native=False)
    want = np.array([[fn(q, t) for t in ts] for q in qs])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_symmetricP2_is_symmetric():
    """A symmetric step pattern must give dtw(a,b) == dtw(b,a); pattern
    3 previously dropped the 2x weight on d[i-1,j] (Sakoe-Chiba
    symmetric weight = di+dj per step => both side patterns are 2,2,1)."""
    rng = np.random.default_rng(1)
    a = rng.normal(size=(10, 4))
    b = rng.normal(size=(13, 4))
    d_ab = pairwise_l2(a, b)
    fwd = dtw_distance(d_ab, 'symmetricP2')
    bwd = dtw_distance(d_ab.T, 'symmetricP2')
    assert abs(fwd - bwd) < 1e-12, (fwd, bwd)


def test_batch_distances_empty_and_zero_len():
    from vpd_tpu.tasks.neighbors import batch_distances_tpu

    rng = np.random.default_rng(0)
    seqs = [rng.normal(size=(8, 3)).astype(np.float32) for _ in range(3)]
    assert batch_distances_tpu([], seqs).shape == (0, 3)
    assert batch_distances_tpu(seqs, []).shape == (3, 0)
    # zero-length sequences are infeasible (+inf), not length-1 zeros
    empty = np.zeros((0, 3), np.float32)
    out = batch_distances_tpu([seqs[0], empty], seqs + [empty],
                              max_len=16)
    assert np.isinf(out[1]).all() and np.isinf(out[:, 3]).all()
    assert np.isfinite(out[0, :3]).all()
