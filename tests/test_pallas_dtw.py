"""Pallas DTW kernel vs the host reference (interpret mode on CPU)."""

import numpy as np
import pytest

from vpd_tpu.ops.dtw import dtw_distance, pairwise_l2
from vpd_tpu.ops.pallas.dtw_kernel import dtw_matrix_pallas


@pytest.mark.parametrize('sp', ['symmetricP2', 'symmetric2'])
def test_pallas_dtw_parity(sp):
    rng = np.random.default_rng(0)
    Q0, T0, L, D = 3, 5, 128, 8
    qs = [rng.normal(size=(int(rng.integers(5, L + 1)), D)
                     ).astype(np.float32) for _ in range(Q0)]
    ts = [rng.normal(size=(int(rng.integers(5, L + 1)), D)
                     ).astype(np.float32) for _ in range(T0)]
    qpad = np.zeros((Q0, L, D), np.float32)
    tpad = np.zeros((T0, L, D), np.float32)
    for i, q in enumerate(qs):
        qpad[i, :len(q)] = q
    for i, t in enumerate(ts):
        tpad[i, :len(t)] = t

    mat = dtw_matrix_pallas(qpad, [len(x) for x in qs], tpad,
                            [len(x) for x in ts], sp, interpret=True)
    assert mat.shape == (Q0, T0)
    for i, q in enumerate(qs):
        for j, t in enumerate(ts):
            ref = dtw_distance(pairwise_l2(q, t), sp)
            if np.isinf(ref):
                assert np.isinf(mat[i, j])
            else:
                np.testing.assert_allclose(mat[i, j], ref, rtol=5e-3)


def test_pallas_dtw_pads_blocks():
    # Q, T not multiples of the block sizes -> internal padding
    rng = np.random.default_rng(1)
    q = rng.normal(size=(3, 128, 4)).astype(np.float32)
    t = rng.normal(size=(5, 128, 4)).astype(np.float32)
    mat = dtw_matrix_pallas(q, np.full(3, 128), t, np.full(5, 128),
                            'symmetric2', interpret=True)
    assert mat.shape == (3, 5)
    assert np.isfinite(mat).all()
