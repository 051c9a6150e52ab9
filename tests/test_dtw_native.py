"""Native C++ DTW core: parity with the numpy reference implementation."""

import numpy as np
import pytest

from vpd_tpu.ops.dtw import build_dtw_distance_fn, dtw_distance, pairwise_l2

native = pytest.importorskip('vpd_tpu.ops.dtw_native')

pytestmark = pytest.mark.skipif(
    not native.available(), reason='no native toolchain')


@pytest.mark.parametrize('sp', ['symmetric2', 'symmetricP2'])
def test_native_matches_numpy(sp):
    rng = np.random.default_rng(0)
    for _ in range(10):
        a = rng.normal(size=(rng.integers(2, 40), 5))
        b = rng.normal(size=(rng.integers(2, 40), 5))
        d = pairwise_l2(a, b)
        x = dtw_distance(d, sp)
        y = native.dtw_distance_native(d, sp)
        z = native.dtw_seq_distance_native(a, b, sp)
        if np.isinf(x):
            assert np.isinf(y) and np.isinf(z)
        else:
            np.testing.assert_allclose(y, x, rtol=1e-12)
            np.testing.assert_allclose(z, x, rtol=1e-9)


def test_default_fn_uses_native():
    fn = build_dtw_distance_fn('symmetric2')
    rng = np.random.default_rng(1)
    a = rng.normal(size=(10, 3))
    assert fn(a, a) < 1e-6


def test_infeasible_is_inf():
    d = np.ones((2, 10))
    assert np.isinf(native.dtw_distance_native(d, 'symmetricP2'))
