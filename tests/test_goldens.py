"""Absolute-accuracy golden runs for the downstream protocols.

The protocol tests in test_downstream.py assert loose bounds (>= 0.6);
these use a cleanly-separable seeded corpus and pin HARD numbers, so a
protocol regression (windowing, fps subsampling, split handling, variant
stacking — reference `recognize.py:206-577`, `detect.py`) fails loudly
instead of degrading silently.
"""

import numpy as np
import pytest

from test_downstream import _recognition_data
from vpd_tpu.datasets.load import Category
from vpd_tpu.tasks.detect import (Label, evaluate_proposals,
                                  get_video_intervals, run_localization)
from vpd_tpu.tasks.recognize import (DeviceKnnIndex, DeviceKnnModel,
                                     KnnModel, SeqModel,
                                     run_action_recognition,
                                     run_action_retrieval)


def _separable_data(num_classes=3, per_class=6, t=16, dim=6, seed=0,
                    noise=0.05):
    """Like _recognition_data but with prototypes far outside the noise
    floor: every reasonable classifier must be exact here."""
    rng = np.random.default_rng(seed)
    protos = np.random.default_rng(42).normal(size=(num_classes, dim)) * 4
    embs, labels = {}, {}
    for c in range(num_classes):
        for i in range(per_class):
            name = 'c{}_{}'.format(c, i)
            embs[name] = (protos[c] + rng.normal(0, noise, (t, dim))) \
                .astype(np.float32)
            labels[name] = c
    return embs, labels


def test_knn_recognition_golden_exact():
    train_embs, train_labels = _separable_data(seed=0)
    test_embs, test_labels = _separable_data(per_class=3, seed=1)
    for k in (1, 3):
        model = KnnModel('dtw', train_embs, train_labels, k=k)
        preds = {a: model.predict(x)[0] for a, x in test_embs.items()}
        assert preds == test_labels, k  # accuracy == 1.0


def test_device_knn_recognition_golden_exact():
    train_embs, train_labels = _separable_data(seed=0)
    test_embs, test_labels = _separable_data(per_class=3, seed=1)
    index = DeviceKnnIndex(train_embs, test_embs, train_labels,
                           max_len=32, log=lambda *a: None)
    model = DeviceKnnModel(index, set(train_embs), k=1)
    preds = {a: model.predict_action(a)[0] for a in test_embs}
    assert preds == test_labels  # accuracy == 1.0


def test_gru_recognition_golden_exact():
    train_embs, train_labels = _separable_data(per_class=6, seed=0)
    test_embs, test_labels = _separable_data(per_class=2, seed=2)
    model = SeqModel('gru', train_embs, train_labels, hidden_dim=16,
                     num_epochs=30, min_epochs=5, learning_rate=0.01,
                     depth=1)
    preds = {a: model.predict(x)[0] for a, x in test_embs.items()}
    assert preds == test_labels  # accuracy == 1.0


def test_few_shot_protocol_golden(tmp_path):
    """Full few-shot protocol at n=4: every trial must be exact (1.0)."""
    train_embs, train_labels = _separable_data(per_class=8, seed=0)
    test_embs, test_labels = _separable_data(per_class=2, seed=3)
    categories = {i: Category('class{}'.format(i)) for i in range(3)}

    for trial in range(2):
        ids = [a for a in train_embs
               if int(a.split('_')[1]) in range(trial * 4, trial * 4 + 4)]
        with open(tmp_path / 'train_4_{}.ids.txt'.format(trial),
                  'w') as fp:
            fp.write('\n'.join(ids))

    for device_knn in (False, True):
        accs = run_action_recognition(
            categories, train_embs, train_labels, test_embs, test_labels,
            test_embs, test_labels, None, 'dtw', 1, [4],
            str(tmp_path / 'train_{}_{}.ids.txt'), hidden_dim=8,
            attn=False, num_epochs=5, val_freq=1, n_trials=2,
            no_test_flip=True, device_knn=device_knn,
            log=lambda *a: None)
        assert accs[4] == [1.0, 1.0], device_knn


def test_retrieval_golden_exact():
    embs, labels = _separable_data(per_class=4, seed=0)
    hit_rates, precs = run_action_retrieval(embs, labels, [1, 3],
                                            log=lambda *a: None)
    assert hit_rates[1] == 100.0
    assert hit_rates[3] == 100.0
    for h in precs:
        np.testing.assert_allclose(precs[h], 100.0)  # percent, exact


def test_evaluate_proposals_golden_multi_video():
    """Greedy matching/AP over several videos with exact score coverage
    stays pinned at 1.0 across tIoU thresholds up to the boundary."""
    results, labels = [], []
    for v in range(3):
        scores = np.zeros(200)
        for start in (20, 100):
            scores[start:start + 12] = 0.9 + 0.01 * v
            labels.append(Label('v{}'.format(v), 'action',
                                start, start + 12, 25.0))
        results.append(('v{}'.format(v), scores))
    ints = get_video_intervals(labels)
    aps = evaluate_proposals(results, ints, [0.5], min_prop_len=5,
                             max_prop_len=20,
                             t_ious=[0.1, 0.3, 0.5, 0.7, 0.9])
    np.testing.assert_allclose(aps, np.ones((1, 5)))


@pytest.mark.slow
def test_localization_golden(tmp_path):
    """Trained ensemble localization on a separable signature: the best
    operating point must reach AP >= 0.9 at tIoU 0.5."""
    from test_downstream import _dense_videos

    emb_dict, labels = _dense_videos(num_videos=6, frames=400, seed=0)
    train = [l for l in labels if not l.video.endswith('5')]
    test = [l for l in labels if l.video.endswith('5')]
    results, thresholds = run_localization(
        'fs_jump', emb_dict, train, test, n_trials=1, k=1,
        hidden_dim=16, batch_size=16, samples_per_epoch=128, seq_len=64,
        num_epochs=6, min_epochs=2, log=lambda *a: None)
    aps = results[0]  # (thresholds, t_ious)
    assert aps[:, 4].max() >= 0.9, aps[:, 4]  # tIoU 0.5 column
