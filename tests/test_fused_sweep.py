"""FusedSweepTrainer == sequential SeqModelTrainer, member by member.

The fused sweep (`train/fused_sweep.py`) trains every trial of a few-shot
size as one vmapped device program. These tests pit it head-to-head
against the sequential trainer (`train/classifier.py`) on identical
subsets, checking final parameters, validation-best selection, early
termination, and the integrated `run_action_recognition` protocol.
"""

import numpy as np
import pytest

from vpd_tpu.train.classifier import SeqModelTrainer, bucket_len
from vpd_tpu.train.fused_sweep import FusedSweepTrainer


def _pool(n_per_class=6, t_lo=5, t_hi=20, d=5, classes=3, seed=0):
    rng = np.random.default_rng(seed)
    protos = rng.normal(0, 1, size=(classes, d))
    X, y = [], []
    for c in range(classes):
        for _ in range(n_per_class):
            t = int(rng.integers(t_lo, t_hi + 1))
            X.append((protos[c] + rng.normal(0, 0.4, size=(t, d))
                      ).astype(np.float32))
            y.append(c)
    return X, np.array(y, np.int32)


def _assert_tree_close(a, b, rtol=2e-4, atol=2e-5):
    import jax

    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for (path, xa), xb in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=rtol, atol=atol,
            err_msg=str(path))


def _run_pair(member_rows, X, y, Xv, yv, fused_kwargs=None, **kwargs):
    floor = max(max(len(x) for x in X), max(len(x) for x in Xv))
    fused = FusedSweepTrainer(
        'gru', X, y, member_rows, X_val=Xv, y_val=yv,
        bucket_floor=floor, **dict(kwargs, **(fused_kwargs or {})))
    seq = []
    for rows in member_rows:
        seq.append(SeqModelTrainer(
            'gru', [X[r] for r in rows], y[np.asarray(rows)],
            X_val=Xv, y_val=yv, bucket_floor=floor, **kwargs))
    return fused, seq


COMMON = dict(hidden_dim=8, batch_size=4, num_epochs=8, min_epochs=0,
              wr_count=2, val_freq=2, learning_rate=0.01,
              early_term_val_num_epochs=200, depth=1)


def test_fused_matches_sequential_members():
    X, y = _pool()
    Xv, yv = _pool(n_per_class=2, seed=1)
    member_rows = [
        list(range(len(X))),              # full pool
        [0, 1, 6, 7, 12, 13],             # 2-shot
        [0, 1, 2, 6, 7, 8, 12, 13, 14],   # 3-shot (partial last batch)
    ]
    fused, seq = _run_pair(member_rows, X, y, Xv, yv,
                           fused_kwargs={'epochs_per_dispatch': 3},
                           **COMMON)
    for mi, trainer in enumerate(seq):
        fp, fs = fused.member(mi)
        _assert_tree_close(fp, trainer.params)
        _assert_tree_close(fs, trainer.batch_stats)


def test_fused_early_termination_matches():
    # early_term_acc=0.5 stops members at different epochs (train-acc
    # break); the fused program must freeze each member at the same
    # state the sequential trainer stops at.
    X, y = _pool(seed=2)
    Xv, yv = _pool(n_per_class=2, seed=3)
    member_rows = [list(range(len(X))), [0, 2, 6, 8, 12, 14]]
    kwargs = dict(COMMON, num_epochs=12, min_epochs=1, early_term_acc=0.5)
    fused, seq = _run_pair(member_rows, X, y, Xv, yv, **kwargs)
    for mi, trainer in enumerate(seq):
        fp, fs = fused.member(mi)
        _assert_tree_close(fp, trainer.params)
        _assert_tree_close(fs, trainer.batch_stats)


def test_fused_val_stall_termination_matches():
    # tiny early_term_val_num_epochs forces the stall branch
    X, y = _pool(seed=4)
    Xv, yv = _pool(n_per_class=2, seed=5)
    member_rows = [[0, 1, 6, 7, 12, 13], [2, 3, 8, 9, 14, 15]]
    kwargs = dict(COMMON, num_epochs=10, val_freq=1,
                  early_term_val_num_epochs=2)
    fused, seq = _run_pair(member_rows, X, y, Xv, yv, **kwargs)
    for mi, trainer in enumerate(seq):
        fp, _ = fused.member(mi)
        _assert_tree_close(fp, trainer.params)


def test_fused_no_validation_returns_final_params():
    X, y = _pool(n_per_class=4)
    member_rows = [list(range(len(X))), [0, 4, 8]]
    kwargs = dict(COMMON, num_epochs=4)
    floor = max(len(x) for x in X)
    fused = FusedSweepTrainer('gru', X, y, member_rows,
                              bucket_floor=floor, **kwargs)
    for mi, rows in enumerate(member_rows):
        trainer = SeqModelTrainer('gru', [X[r] for r in rows],
                                  y[np.asarray(rows)], bucket_floor=floor,
                                  **kwargs)
        fp, _ = fused.member(mi)
        _assert_tree_close(fp, trainer.params)


def test_fused_sharded_matches_sequential_members():
    # Sharding the member axis over the 8-device CPU mesh must be a pure
    # placement change: every member's final state equals the sequential
    # trainer's. 3 members over 8 devices exercises the pad-to-axis path
    # (5 padded copies of member 0 train but are never read back).
    from vpd_tpu.core.mesh import get_mesh

    X, y = _pool()
    Xv, yv = _pool(n_per_class=2, seed=1)
    member_rows = [
        list(range(len(X))),
        [0, 1, 6, 7, 12, 13],
        [0, 1, 2, 6, 7, 8, 12, 13, 14],
    ]
    mesh = get_mesh()
    assert mesh.size == 8
    fused, seq = _run_pair(member_rows, X, y, Xv, yv,
                           fused_kwargs={'epochs_per_dispatch': 3,
                                         'mesh': mesh},
                           **COMMON)
    assert fused.num_members == len(member_rows)
    for mi, trainer in enumerate(seq):
        fp, fs = fused.member(mi)
        _assert_tree_close(fp, trainer.params)
        _assert_tree_close(fs, trainer.batch_stats)


def test_fused_sharded_matches_unsharded_early_term():
    # Early termination (stop flags polled one chunk behind) must behave
    # identically when the member axis is sharded.
    from vpd_tpu.core.mesh import get_mesh

    X, y = _pool(seed=2)
    Xv, yv = _pool(n_per_class=2, seed=3)
    member_rows = [list(range(len(X))), [0, 2, 6, 8, 12, 14]]
    kwargs = dict(COMMON, num_epochs=12, min_epochs=1, early_term_acc=0.5)
    plain, _ = _run_pair(member_rows, X, y, Xv, yv, **kwargs)
    sharded, _ = _run_pair(member_rows, X, y, Xv, yv,
                           fused_kwargs={'mesh': get_mesh()}, **kwargs)
    np.testing.assert_array_equal(plain.stopped, sharded.stopped)
    np.testing.assert_array_equal(plain.best_epoch, sharded.best_epoch)
    # members land on different devices when sharded, so XLA fuses the
    # per-member math differently — exact equality is not expected, the
    # suite's standard trajectory tolerance is
    for mi in range(len(member_rows)):
        pp, ps = plain.member(mi)
        sp, ss = sharded.member(mi)
        _assert_tree_close(pp, sp)
        _assert_tree_close(ps, ss)


def test_fused_rejects_member_missing_a_class():
    X, y = _pool(n_per_class=2)
    with pytest.raises(ValueError):
        FusedSweepTrainer('gru', X, y, [[0, 1]], **COMMON)


def test_run_action_recognition_fused_equals_sequential(tmp_path):
    from vpd_tpu.datasets.load import Category
    from vpd_tpu.tasks.recognize import run_action_recognition

    rng = np.random.default_rng(7)
    protos = rng.normal(0, 1, size=(3, 5))

    def synth(per_class, seed):
        r = np.random.default_rng(seed)
        embs, labels = {}, {}
        for c in range(3):
            for i in range(per_class):
                name = 'c{}_{}'.format(c, i)
                t = int(r.integers(6, 14))
                embs[name] = (protos[c]
                              + r.normal(0, 0.3, (t, 5))).astype(np.float32)
                labels[name] = c
        return embs, labels

    train_embs, train_labels = synth(6, seed=8)
    test_embs, test_labels = synth(2, seed=9)
    categories = {i: Category('class{}'.format(i)) for i in range(3)}

    for trial in range(2):
        ids = [a for a in train_embs if a.endswith(
            ('_{}'.format(trial * 2), '_{}'.format(trial * 2 + 1)))]
        with open(tmp_path / 'train_2_{}.ids.txt'.format(trial), 'w') as fp:
            fp.write('\n'.join(ids))

    def run(fused):
        return run_action_recognition(
            categories, train_embs, train_labels, test_embs, test_labels,
            test_embs, test_labels, None, 'gru', 1, [2],
            str(tmp_path / 'train_{}_{}.ids.txt'), hidden_dim=8,
            attn=False, num_epochs=6, val_freq=2, n_trials=2,
            no_test_flip=False, fused_sweep=fused, log=lambda *a: None)

    assert run(True) == run(False)
