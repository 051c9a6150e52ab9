"""Downstream tasks: densify, proposals, detection AP, recognition."""

import os

import numpy as np
import pytest

from vpd_tpu.datasets.load import group_by_frame, load_actions, normalize_rows
from vpd_tpu.datasets.eval_splits import get_test_prefixes
from vpd_tpu.datasets.metadata_cache import load_meta_cache
from vpd_tpu.tasks.detect import (
    Label, evaluate_proposals, get_video_intervals, run_localization)
from vpd_tpu.tasks.eval import (
    calc_iou, compute_ap, compute_precision_recall_curve)
from vpd_tpu.tasks.recognize import (
    KnnModel, SeqModel, run_action_recognition, run_action_retrieval,
    sample_embeddings)
from vpd_tpu.train.proposal import get_proposals


def test_group_by_frame_mean_and_interp():
    e = np.eye(4)
    embs = [
        (0, e[0], {}), (0, e[1], {}),  # two detections on frame 0
        (3, e[2], {}),                 # gap of 2 frames
    ]
    dense, mask = group_by_frame(embs)
    assert dense.shape == (4, 4)
    np.testing.assert_allclose(dense[0], (e[0] + e[1]) / 2)
    assert list(mask) == [True, False, False, True]
    # reference interpolation quirk: weight a=i/gap on the PREVIOUS frame
    a1 = 1 / 3
    np.testing.assert_allclose(dense[1], a1 * dense[0] + (1 - a1) * dense[3])


def test_group_by_frame_flip_rows():
    embs = [(i, np.ones((2, 3)) * i, {}) for i in range(3)]
    dense, mask = group_by_frame(embs)
    assert dense.shape == (3, 2, 3)
    assert mask.all()


def test_normalize_rows():
    x = np.array([[3., 4.], [0., 0.]])
    out = normalize_rows(x)
    np.testing.assert_allclose(out[0], [0.6, 0.8])
    np.testing.assert_allclose(out[1], [0., 0.])  # zero rows preserved


def test_get_proposals_merge_and_minlen():
    scores = np.array([0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 0, 0, 1, 0],
                      dtype=float)
    # runs [1,4], [6,10], [13,13]; gap between first two is 2 > 1 ->
    # not merged; [1,4] and [13,13] dropped (strict len > 3 filter,
    # util/proposal.py:208-209)
    props = get_proposals(scores, 0.5)
    assert [p for p, _ in props] == [(6, 10)]
    # with merge_thresh 2 the first two merge
    props2 = get_proposals(scores, 0.5, merge_thresh=2)
    assert props2[0][0] == (1, 10)


def test_temporal_iou():
    assert calc_iou(0, 10, 0, 10) == 1
    assert calc_iou(0, 10, 10, 20) == 0
    np.testing.assert_allclose(calc_iou(0, 10, 5, 15), 5 / 15)


def test_ap_perfect_and_worst():
    pc, rc = compute_precision_recall_curve([True, True], 2)
    assert compute_ap(pc, rc) == 1.0
    pc, rc = compute_precision_recall_curve([False, True, True], 2)
    ap = compute_ap(pc, rc)
    assert 0 < ap < 1


def test_ap_empty_curve_degenerate():
    """Zero proposals for a class: the bare envelope, AP 0 (not a
    crash) — the graceful degenerate direct callers relied on."""
    from vpd_tpu.tasks.eval import compute_interpolated_precision
    assert compute_ap([], []) == 0.0
    ipc, irc = compute_interpolated_precision([], [])
    assert irc == [0.0, 1.0] and ipc == [1.0, 0.0]


def test_evaluate_proposals_perfect_detection():
    # one video, two GT intervals, scores exactly covering them
    scores = np.zeros(100)
    scores[10:20] = 1.0
    scores[50:60] = 1.0
    labels = [Label('v', 'action', 10, 20, 25.0),
              Label('v', 'action', 50, 60, 25.0)]
    ints = get_video_intervals(labels)
    aps = evaluate_proposals([('v', scores)], ints, [0.5],
                             min_prop_len=5, max_prop_len=15,
                             t_ious=[0.5])
    np.testing.assert_allclose(aps, [[1.0]])


def _dense_videos(num_videos=6, frames=400, dim=8, seed=0):
    """Synthetic dense embeddings with an 'action signature' in windows."""
    rng = np.random.default_rng(seed)
    emb_dict = {}
    labels = []
    for v in range(num_videos):
        name = 'vid{}'.format(v)
        x = rng.normal(0, 0.3, size=(frames, dim))
        for start in range(40, frames - 40, 90):
            x[start:start + 20] += 2.0  # action signature
            labels.append(Label(name, 'action', start, start + 20, 25.0))
        emb_dict[name] = (x.astype(np.float32), np.ones(frames, bool))
    return emb_dict, labels


def test_run_localization_end_to_end():
    emb_dict, labels = _dense_videos()
    train = [l for l in labels if not l.video.endswith('5')]
    test = [l for l in labels if l.video.endswith('5')]
    results, thresholds = run_localization(
        'fs_jump', emb_dict, train, test, n_trials=1, k=1,
        hidden_dim=16, batch_size=16, samples_per_epoch=64, seq_len=64,
        num_epochs=3, min_epochs=1, log=lambda *a: None)
    aps = results[0]
    assert aps.shape == (len(thresholds), 9)
    assert np.isfinite(aps).all()
    # the signature is trivially separable; some threshold should score well
    assert aps.max() > 0.5


def test_run_localization_all_videos(tmp_path):
    """--_all scores every embedded video, not just the test split
    (reference detect.py:91,336-338): the prediction json gains the
    train videos too; the AP tables still evaluate the same test
    intervals."""
    import json
    import os

    emb_dict, labels = _dense_videos()
    train = [l for l in labels if not l.video.endswith('5')]
    test = [l for l in labels if l.video.endswith('5')]
    kw = dict(n_trials=1, k=1, hidden_dim=16, batch_size=16,
              samples_per_epoch=64, seq_len=64, num_epochs=1,
              min_epochs=1, log=lambda *a: None)
    out_all = str(tmp_path / 'all')
    run_localization('fs_jump', emb_dict, train, test, out_dir=out_all,
                     _all=True, **kw)
    (pred_file,) = os.listdir(out_all)
    with open(os.path.join(out_all, pred_file)) as fp:
        preds = json.load(fp)
    assert set(preds) == set(emb_dict)


def _assert_tree_close(a, b, rtol=2e-4, atol=2e-5):
    import jax

    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for (path, xa), xb in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=rtol, atol=atol,
            err_msg=str(path))


def _ensemble_data(n=6, frames=120, dim=6, seed=11):
    rng = np.random.default_rng(seed)
    X, y = [], []
    for _ in range(n):
        x = rng.normal(0, 0.3, size=(frames, dim)).astype(np.float32)
        vy = np.zeros(frames, np.int32)
        for start in range(20, frames - 20, 50):
            x[start:start + 10] += 2.0
            vy[start:start + 10] = 1
        X.append(x)
        y.append(vy)
    return X, y


_ENSEMBLE_KW = dict(hidden_dim=8, batch_size=8, num_epochs=3,
                    min_epochs=1, seq_len=32, samples_per_epoch=32)


def test_fused_ensemble_matches_sequential():
    """EnsembleProposal(fused=True) == sequential fold training: one
    vmapped per-step program must reproduce every member's params,
    batch_stats, and therefore ensemble predictions."""
    from vpd_tpu.train.proposal import EnsembleProposal

    X, y = _ensemble_data()
    kw = dict(_ENSEMBLE_KW, ensemble_size=2, splits=3, seed=5)
    seq = EnsembleProposal('gru', X, y, fused=False, **kw)
    fused = EnsembleProposal('gru', X, y, fused=True, **kw)
    _assert_tree_close(fused._stacked_params, seq._stacked_params)
    _assert_tree_close(fused._stacked_stats, seq._stacked_stats)
    probe = X[0]
    np.testing.assert_allclose(fused.predict(probe), seq.predict(probe),
                               rtol=2e-4, atol=2e-5)


def test_fused_ensemble_early_termination_matches():
    # A 1-epoch val-stall window stops members at different epochs; the
    # fused live-mask must freeze each member exactly where the
    # sequential trainer breaks.
    from vpd_tpu.train.proposal import EnsembleProposal

    X, y = _ensemble_data(seed=13)
    kw = dict(_ENSEMBLE_KW, num_epochs=6,
              early_term_no_val_improvement=1, ensemble_size=2,
              splits=2, seed=3)
    seq = EnsembleProposal('gru', X, y, fused=False, **kw)
    fused = EnsembleProposal('gru', X, y, fused=True, **kw)
    _assert_tree_close(fused._stacked_params, seq._stacked_params)


def test_fused_ensemble_sharded_matches_unsharded():
    # Member axis over the 8-device mesh (2 members pad to 8): a pure
    # placement change.
    from vpd_tpu.core.mesh import get_mesh
    from vpd_tpu.train.proposal import EnsembleProposal

    X, y = _ensemble_data(seed=17)
    kw = dict(_ENSEMBLE_KW, ensemble_size=2, splits=3, seed=7)
    plain = EnsembleProposal('gru', X, y, fused=True, **kw)
    sharded = EnsembleProposal('gru', X, y, fused=True, mesh=get_mesh(),
                               **kw)
    _assert_tree_close(plain._stacked_params, sharded._stacked_params)
    _assert_tree_close(plain._stacked_stats, sharded._stacked_stats)


def _recognition_data(num_classes=3, per_class=8, t=20, dim=6, seed=0):
    rng = np.random.default_rng(seed)
    embs, labels = {}, {}
    # class prototypes are fixed across train/test splits
    protos = np.random.default_rng(42).normal(size=(num_classes, dim)) * 2
    for c in range(num_classes):
        for i in range(per_class):
            name = 'c{}_{}'.format(c, i)
            seq = protos[c] + rng.normal(0, 0.3, size=(t, dim))
            embs[name] = seq.astype(np.float32)
            labels[name] = c
    return embs, labels


def test_knn_model_recognition():
    train_embs, train_labels = _recognition_data(seed=0)
    test_embs, test_labels = _recognition_data(per_class=3, seed=1)
    model = KnnModel('dtw', train_embs, train_labels, k=1)
    correct = sum(
        int(model.predict(x)[0] == test_labels[a])
        for a, x in test_embs.items())
    assert correct / len(test_embs) >= 0.8


def test_seq_model_recognition_with_flip_rows():
    train_embs, train_labels = _recognition_data(per_class=6)
    # add a flip dimension: (T, 2, D)
    train_embs = {k: np.stack([v, v], axis=1)
                  for k, v in train_embs.items()}
    test_embs, test_labels = _recognition_data(per_class=2, seed=3)
    test_embs = {k: np.stack([v, v], axis=1) for k, v in test_embs.items()}
    model = SeqModel('gru', train_embs, train_labels, hidden_dim=8,
                     num_epochs=15, min_epochs=2, learning_rate=0.01,
                     depth=1)
    correct = sum(
        int(model.predict(x)[0] == test_labels[a])
        for a, x in test_embs.items())
    assert correct / len(test_embs) >= 0.6


def test_run_action_recognition_few_shot_protocol(tmp_path):
    train_embs, train_labels = _recognition_data(per_class=10)
    test_embs, test_labels = _recognition_data(per_class=2, seed=5)
    from vpd_tpu.datasets.load import Category
    categories = {i: Category('class{}'.format(i)) for i in range(3)}

    # premade few-shot id files
    for ne in (2,):
        for trial in range(2):
            ids = [a for a in train_embs if a.endswith(
                ('_{}'.format(trial * 2), '_{}'.format(trial * 2 + 1)))]
            with open(tmp_path / 'train_{}_{}.ids.txt'.format(ne, trial),
                      'w') as fp:
                fp.write('\n'.join(ids))

    accs = run_action_recognition(
        categories, train_embs, train_labels, test_embs, test_labels,
        test_embs, test_labels, str(tmp_path / 'out'), 'dtw', 1, [2],
        str(tmp_path / 'train_{}_{}.ids.txt'), hidden_dim=8, attn=False,
        num_epochs=10, val_freq=1, n_trials=2, no_test_flip=False,
        log=lambda *a: None)
    assert len(accs[2]) == 2
    out_files = os.listdir(tmp_path / 'out')
    assert any(f.endswith('.test_pred.csv') for f in out_files)
    assert any(f.endswith('.pdf') for f in out_files)


def test_run_action_retrieval():
    embs, labels = _recognition_data(per_class=4)
    hit_rates, precs = run_action_retrieval(embs, labels, [1, 3],
                                            log=lambda *a: None)
    assert set(hit_rates) == {1, 3}
    assert all(0 <= v <= 100 for v in hit_rates.values())
    assert hit_rates[3] >= hit_rates[1]

    # the device sweep must reproduce the host protocol's metrics
    dev_rates, dev_precs = run_action_retrieval(
        embs, labels, [1, 3], device=True, log=lambda *a: None)
    assert dev_rates == hit_rates
    for h in precs:
        np.testing.assert_allclose(dev_precs[h], precs[h], atol=1e-6)

    # embedding-less actions must be invisible to BOTH rankers: the
    # device path once ranked inf-padded None-emb columns as neighbors
    embs2 = dict(embs)
    for i, a in enumerate(sorted(embs2)):
        if i % 3 == 0:
            embs2[a] = None
    h_rates, h_precs = run_action_retrieval(embs2, labels, [1, 3],
                                            log=lambda *a: None)
    d_rates, d_precs = run_action_retrieval(
        embs2, labels, [1, 3], device=True, log=lambda *a: None)
    assert d_rates == h_rates
    for h in h_precs:
        np.testing.assert_allclose(d_precs[h], h_precs[h], atol=1e-6)

    # discriminating case: fewer valid targets than max_hit, and the
    # first None action in index order shares the query's label — the
    # pre-fix device ranker returned it as a phantom rank-2 neighbor
    # (hit@3) that the host ranker can never produce
    rng = np.random.default_rng(3)
    embs3 = {'a0': rng.normal(size=(6, 4)).astype(np.float32),
             'a1': None, 'a2': None,
             'b0': rng.normal(size=(6, 4)).astype(np.float32),
             'b1': None}
    labels3 = {'a0': 0, 'a1': 0, 'a2': 0, 'b0': 1, 'b1': 1}
    h3, hp3 = run_action_retrieval(embs3, labels3, [3],
                                   log=lambda *a: None)
    d3, dp3 = run_action_retrieval(embs3, labels3, [3], device=True,
                                   log=lambda *a: None)
    assert d3 == h3
    np.testing.assert_allclose(dp3[3], hp3[3], atol=1e-6)


def test_sample_embeddings_per_class():
    embs, labels = _recognition_data(per_class=6)
    sub = sample_embeddings(embs, labels, 2, seed=0)
    counts = {}
    for a in sub:
        counts[labels[a]] = counts.get(labels[a], 0) + 1
    assert all(v == 2 for v in counts.values())


def test_real_split_files_load():
    actions = load_actions(
        'vpd_tpu/datasets/data/action_dataset/tennis/all.txt')
    assert len(actions) > 10000
    prefixes = get_test_prefixes('tennis')
    assert any(a.split(':')[0].startswith(prefixes) for a in actions)

    meta = load_meta_cache('tennis')
    assert len(meta) > 1000
    assert meta[next(iter(meta))].fps > 0


def test_ap_full_recall_at_top_proposal():
    """Single GT hit by the top proposal: the reference crashes here
    (detect.py:225 assert); we return max precision at recall 1."""
    pc, rc = compute_precision_recall_curve([True], 1)
    assert compute_ap(pc, rc) == 1.0
    pc, rc = compute_precision_recall_curve([True, False], 1)
    assert compute_ap(pc, rc) == 1.0
    pc, rc = compute_precision_recall_curve([False, True], 1)
    assert 0 < compute_ap(pc, rc) <= 1


def test_pooled_knn_distances_match_serial():
    """Process-pool brute force (reference util/neighbors.py:21-41)."""
    import numpy as np

    from vpd_tpu.tasks.neighbors import (KNearestNeighbors,
                                         pooled_distances)

    rng = np.random.default_rng(11)
    X = [rng.normal(size=(rng.integers(5, 9), 4)) for _ in range(6)]
    y = np.array([0, 1, 0, 1, 0, 1])
    x = rng.normal(size=(7, 4))

    def dist(a, b):
        return float(np.linalg.norm(a.mean(0) - b.mean(0)))

    dist.fork_safe = True  # pure numpy: keep the pool path exercised
    pooled = dict(pooled_distances(x, X, dist, processes=2))
    serial = {i: dist(x, xt) for i, xt in enumerate(X)}
    assert pooled.keys() == serial.keys()
    for i in serial:
        assert abs(pooled[i] - serial[i]) < 1e-12

    knn_p = KNearestNeighbors(X, y, dist, k=3, processes=2)
    knn_s = KNearestNeighbors(X, y, dist, k=3)
    assert knn_p.predict(x) == knn_s.predict(x)


def test_device_knn_matches_host_knn():
    """Device-precomputed kNN == host KnnModel on a small few-shot run."""
    import numpy as np

    from vpd_tpu.tasks.recognize import (DeviceKnnIndex, DeviceKnnModel,
                                         KnnModel)

    rng = np.random.default_rng(3)
    C, D = 3, 6

    def make(n, with_flip=True):
        embs, labels = {}, {}
        for i in range(n):
            t = int(rng.integers(10, 30))
            name = 'a{}'.format(len(labels))
            cls = i % C
            base = rng.normal(size=(t, 1, D)) + 3 * cls
            embs[name] = np.concatenate(
                [base, base + 0.1 * rng.normal(size=base.shape)],
                axis=1).astype(np.float32)
            labels[name] = cls
        return embs, labels

    train_embs, train_labels = make(12)
    test_embs, test_labels = make(8)

    host = KnnModel('dtw', train_embs, train_labels, k=3)
    index = DeviceKnnIndex(train_embs, test_embs, train_labels,
                           max_len=64, log=lambda *a: None)
    dev = DeviceKnnModel(index, set(train_embs), k=3)

    agree = 0
    for action, embs in test_embs.items():
        hp, hn = host.predict(embs, ensemble=True)
        dp, dn = dev.predict_action(action, ensemble=True)
        assert hp == dp, (action, hp, dp)
        assert hn == dn, (action, hn, dn)
        agree += 1
    assert agree == len(test_embs)

    # few-shot subset view selects the right columns
    sub = set(list(train_embs)[:6])
    host_sub = KnnModel('dtw', {a: train_embs[a] for a in sub},
                        train_labels, k=1)
    dev_sub = DeviceKnnModel(index, sub, k=1)
    for action, embs in test_embs.items():
        assert host_sub.predict(embs)[0] == \
            dev_sub.predict_action(action)[0]


def test_run_action_recognition_device_knn(tmp_path):
    """Few-shot protocol end-to-end with the device kNN index."""
    import numpy as np

    from vpd_tpu.tasks.recognize import run_action_recognition

    rng = np.random.default_rng(4)
    C, D = 3, 5
    cats = {i: type('C', (), {'name': 'c{}'.format(i)})() for i in range(C)}

    def make(n):
        embs, labels = {}, {}
        for i in range(n):
            t = int(rng.integers(8, 20))
            name = 'a{}'.format(len(embs)) + ('t' if n > 9 else '')
            cls = i % C
            embs[name] = (rng.normal(size=(t, 2, D)) + 2 * cls).astype(
                np.float32)
            labels[name] = cls
        return embs, labels

    train_embs, train_labels = make(9)
    test_embs, test_labels = make(12)
    ids_by_file = {'ids_3_0': set(list(train_embs)[:6])}

    accs = run_action_recognition(
        cats, train_embs, train_labels, None, None, test_embs,
        test_labels, str(tmp_path), 'dtw', 1, [3], 'ids_{}_{}',
        hidden_dim=8, attn=False, num_epochs=1, val_freq=1, n_trials=1,
        no_test_flip=False,
        load_action_ids_fn=lambda f: ids_by_file[f],
        device_knn=True, device_max_len=32, log=lambda *a: None)
    assert 3 in accs and len(accs[3]) == 1
    # class centers are separated by 2 sigma; kNN should do well
    assert accs[3][0] >= 0.5
    assert any(f.endswith('.csv') for f in os.listdir(tmp_path))
