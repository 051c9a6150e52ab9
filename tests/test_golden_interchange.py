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


def test_atomic_write_crash_safety(tmp_path):
    """A failed/interrupted store leaves the previous complete file
    intact (core/io + core/checkpoint write temp + os.replace)."""
    import numpy as np
    import pytest

    from vpd_tpu.core import checkpoint as ckpt
    from vpd_tpu.core.io import load_pickle, store_pickle

    path = str(tmp_path / 'x.emb.pkl')
    store_pickle(path, [1, 2, 3])

    class Unpicklable:
        def __reduce__(self):
            raise RuntimeError('simulated crash mid-serialize')

    with pytest.raises(RuntimeError):
        store_pickle(path, [Unpicklable()])
    assert load_pickle(path) == [1, 2, 3]  # old file untouched

    tree = {'w': np.arange(4, dtype=np.float32)}
    ckpt.save_bundle(str(tmp_path), 'best_epoch', {'encoder': tree})
    loaded = ckpt.load_component(
        str(tmp_path), 'best_epoch', 'encoder',
        {'w': np.zeros(4, np.float32)})
    np.testing.assert_array_equal(loaded['w'], tree['w'])
    # no temp residue after successful writes
    assert not [f for f in tmp_path.iterdir() if f.name.endswith('.tmp')]


def test_store_gz_json_header_names_final_file(tmp_path):
    """The atomic temp-file write must not leak '.tmp' into the gzip
    FNAME header — headers match a direct gzip.open(path) write."""
    import gzip
    import json

    from vpd_tpu.core.io import load_gz_json, store_gz_json

    path = tmp_path / 'scores.json.gz'
    store_gz_json(str(path), {'k': [1, 2]})
    raw = path.read_bytes()
    assert b'.tmp' not in raw
    assert b'scores.json' in raw  # FNAME = basename minus '.gz'
    assert load_gz_json(str(path)) == {'k': [1, 2]}
    # same header layout as a direct (non-atomic) write
    direct = tmp_path / 'direct.json.gz'
    with gzip.open(str(direct), 'wt', encoding='ascii') as fp:
        json.dump({'k': [1, 2]}, fp)
    dr = direct.read_bytes()
    # same-length FNAMEs ('scores.json'/'direct.json') => same total size
    assert b'direct.json' in dr and len(dr) == len(raw)


def test_checkpoint_ignores_leftover_tmp(tmp_path):
    """A crash mid-write leaves 'epochNNNN.*.ckpt.tmp'; resume must not
    count it as a checkpoint (fullmatch, not prefix match)."""
    import numpy as np

    from vpd_tpu.core import checkpoint as ckpt

    tree = {'w': np.ones((2, 2), np.float32)}
    ckpt.save_bundle(str(tmp_path), 'epoch0003', {'encoder': tree})
    (tmp_path / 'epoch0007.encoder.ckpt.tmp').write_bytes(b'partial')
    assert ckpt.last_checkpoint_epoch(str(tmp_path)) == 3
    loaded = ckpt.load_component(str(tmp_path), 'epoch0003', 'encoder',
                                 {'w': np.zeros((2, 2), np.float32)})
    np.testing.assert_array_equal(loaded['w'], tree['w'])
