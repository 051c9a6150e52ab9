"""The .emb.pkl interchange format must stay byte-stable.

The golden file was produced by core.io.store_embs_pickle; regenerating
the same logical content must yield identical bytes (protocol, field
order, dtypes), and the reference's plain-pickle reader must accept it.
"""

import pickle

import numpy as np

from vpd_tpu.core.io import load_embs_pickle, store_embs_pickle

GOLDEN = 'tests/golden/interchange.emb.pkl'


def _canonical_embs():
    rng = np.random.default_rng(1234)
    return [
        (0, rng.normal(size=(2, 8)).astype(np.float32),
         {'kp_score': 0.9, 'is_mean': False, 'is_flip': False}),
        (1, rng.normal(size=(2, 8)).astype(np.float32),
         {'kp_score': 0.75, 'is_mean': True}),
        (3, rng.normal(size=(8,)).astype(np.float32), {}),
    ]


def test_golden_bytes_stable(tmp_path):
    out = tmp_path / 'x.emb.pkl'
    store_embs_pickle(str(out), _canonical_embs())
    with open(GOLDEN, 'rb') as fp:
        golden = fp.read()
    assert out.read_bytes() == golden


def test_golden_loads_with_plain_pickle():
    with open(GOLDEN, 'rb') as fp:
        embs = pickle.load(fp)  # what the reference does (util/io.py:30)
    assert [e[0] for e in embs] == [0, 1, 3]
    assert embs[0][1].shape == (2, 8)
    assert embs[0][1].dtype == np.float32
    assert embs[0][2]['is_flip'] is False

    loaded = load_embs_pickle(GOLDEN)
    np.testing.assert_array_equal(loaded[0][1], embs[0][1])
