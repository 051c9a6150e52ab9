"""Sequence classifier heads: shapes, masking semantics, training."""

import jax
import jax.numpy as jnp
import numpy as np

from vpd_tpu.models.gru import (
    BiRNN, CNNClassifier, MaskedBatchNorm, SeqClassifier, length_mask)
from vpd_tpu.train.classifier import SeqModelTrainer, pad_sequences


def test_birnn_masking():
    model = BiRNN('gru', hidden_dim=8, depth=2)
    x = jax.random.normal(jax.random.key(0), (3, 10, 4))
    lengths = jnp.array([10, 5, 7])
    variables = model.init(jax.random.key(1), x, lengths)
    out, last = model.apply(variables, x, lengths)
    assert out.shape == (3, 10, 16)
    assert last.shape == (4, 3, 8)
    # padded positions are zero
    assert np.allclose(np.asarray(out[1, 5:]), 0)

    # forward last state equals output at t = len-1 (first half of features)
    np.testing.assert_allclose(
        np.asarray(out[1, 4, :8]), np.asarray(last[-2, 1]), atol=1e-5)

    # padding must not change valid outputs
    out2, _ = model.apply(variables, x[:, :7], jnp.array([7, 5, 7]))
    np.testing.assert_allclose(
        np.asarray(out[1, :5]), np.asarray(out2[1, :5]), atol=1e-5)


def test_lstm_variant():
    model = BiRNN('lstm', hidden_dim=4, depth=1)
    x = jnp.ones((2, 6, 3))
    lengths = jnp.array([6, 3])
    variables = model.init(jax.random.key(0), x, lengths)
    out, last = model.apply(variables, x, lengths)
    assert out.shape == (2, 6, 8)
    assert last.shape == (2, 2, 4)


def test_masked_batchnorm_ignores_padding():
    model = MaskedBatchNorm()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 8, 5)).astype(np.float32)
    lengths = jnp.array([8, 8, 8, 8])
    variables = model.init(jax.random.key(0), jnp.asarray(x), lengths)

    # corrupt padding of a shorter batch; stats must not change
    x2 = x.copy()
    x2[2, 4:] = 100.
    lengths2 = jnp.array([8, 8, 4, 8])

    _, s1 = model.apply(variables, jnp.asarray(x), lengths2, train=True,
                        mutable=['batch_stats'])
    _, s2 = model.apply(variables, jnp.asarray(x2), lengths2, train=True,
                        mutable=['batch_stats'])
    np.testing.assert_allclose(
        np.asarray(s1['batch_stats']['mean']),
        np.asarray(s2['batch_stats']['mean']), atol=1e-5)


def test_seq_classifier_shapes():
    for attention in (True, False):
        model = SeqClassifier('gru', hidden_dim=8, num_classes=5,
                              use_attention=attention)
        x = jnp.ones((2, 12, 6))
        lengths = jnp.array([12, 7])
        variables = model.init(jax.random.key(0), x, lengths)
        out = model.apply(variables, x, lengths)
        assert out.shape == (2, 5)


def test_cnn_classifier_shapes():
    model = CNNClassifier(hidden_dim=8, num_classes=3, depth=2)
    x = jnp.ones((2, 30, 6))
    variables = model.init(jax.random.key(0), x, jnp.array([30, 20]))
    assert model.apply(variables, x, jnp.array([30, 20])).shape == (2, 3)


def _toy_problem(n=40, t=12, d=6, seed=0):
    """Two classes separable by the mean of the sequence."""
    rng = np.random.default_rng(seed)
    X, y = [], []
    for i in range(n):
        label = i % 2
        length = int(rng.integers(6, t + 1))
        base = 1.0 if label else -1.0
        X.append(rng.normal(loc=base, scale=0.5,
                            size=(length, d)).astype(np.float32))
        y.append(label)
    return X, y


def test_trainer_learns_toy_problem():
    X, y = _toy_problem()
    Xv, yv = _toy_problem(n=12, seed=1)
    trainer = SeqModelTrainer(
        'gru', X, y, hidden_dim=8, batch_size=8, num_epochs=30,
        min_epochs=3, early_term_acc=0.99, X_val=Xv, y_val=yv,
        learning_rate=0.01, depth=1)
    correct = 0
    for x, label in zip(Xv, yv):
        pred, _ = trainer.predict(x)
        correct += int(pred == label)
    assert correct / len(Xv) >= 0.8

    # flip-ensemble prediction path
    cls, score = trainer.predict_n(Xv[0], Xv[0])
    assert 0 <= cls < 2 and 0 < score <= 1


def test_pad_sequences():
    X = [np.ones((3, 2)), np.ones((5, 2))]
    padded, lens = pad_sequences(X)
    assert padded.shape == (2, 5, 2)
    assert list(lens) == [3, 5]
    assert np.all(padded[0, 3:] == 0)


def test_prewarm_shares_jit_cache():
    """prewarm_seq_model compiles the SAME cached programs a subsequent
    trainer uses (no second cache entry), and training still works."""
    from vpd_tpu.train.classifier import (_cached_train_step, bucket_len,
                                          SeqModelTrainer,
                                          prewarm_seq_model)

    rng = np.random.default_rng(0)
    # hidden_dim=9 is unique to this test: other tests in the suite may
    # already have cached common configs, which would make the +1
    # assertion flaky under full-suite ordering
    X = [rng.normal(size=(rng.integers(5, 12), 4)).astype(np.float32)
         for _ in range(12)]
    y = np.array([i % 2 for i in range(12)])

    before = _cached_train_step.cache_info().currsize
    th = prewarm_seq_model('gru', 2, hidden_dim=9, seq_dim=4,
                           max_len=max(len(x) for x in X),
                           batch_size=6, block=True, depth=1)
    assert not th.is_alive()
    mid = _cached_train_step.cache_info().currsize
    assert mid == before + 1  # prewarm created the entry

    trainer = SeqModelTrainer('gru', X, y, hidden_dim=9, batch_size=6,
                              num_epochs=3, min_epochs=1, depth=1)
    # the trainer reused the prewarmed entry rather than adding one
    assert _cached_train_step.cache_info().currsize == mid
    assert bucket_len(11) == 16 and bucket_len(17) == 32
    pred = trainer.predict(X[0])
    assert pred[0] in (0, 1)


def test_batchnorm_ignores_padded_rows():
    """Partial batches are padded with duplicate rows (static shapes);
    BN batch statistics must cover only the valid rows — the reference
    trains torch BN on the true-sized batch."""
    import jax
    import jax.numpy as jnp

    from vpd_tpu.models.gru import MaskedBatchNorm, TorchBatchNorm

    rng = np.random.default_rng(5)
    n_real, n_pad, d = 5, 3, 4
    x_real = rng.normal(size=(n_real, d)).astype(np.float32)
    x_pad = np.concatenate([x_real, np.tile(x_real[:1], (n_pad, 1))])
    valid = np.arange(n_real + n_pad) < n_real

    bn = TorchBatchNorm()
    v = bn.init(jax.random.key(0), jnp.zeros((1, d)))
    want, want_mut = bn.apply(v, x_real, train=True,
                              mutable=['batch_stats'])
    got, got_mut = bn.apply(v, x_pad, train=True, valid=valid,
                            mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(got)[:n_real],
                               np.asarray(want), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5),
        got_mut['batch_stats'], want_mut['batch_stats'])

    # MaskedBatchNorm: padded-row timesteps excluded from masked stats
    t = 6
    xs_real = rng.normal(size=(n_real, t, d)).astype(np.float32)
    lens_real = rng.integers(2, t + 1, n_real).astype(np.int32)
    xs_pad = np.concatenate([xs_real, np.tile(xs_real[:1],
                                              (n_pad, 1, 1))])
    lens_pad = np.concatenate([lens_real, np.tile(lens_real[:1], n_pad)])

    mbn = MaskedBatchNorm()
    v = mbn.init(jax.random.key(0), jnp.zeros((1, t, d)),
                 jnp.ones((1,), jnp.int32))
    want, want_mut = mbn.apply(v, xs_real, lens_real, train=True,
                               mutable=['batch_stats'])
    got, got_mut = mbn.apply(v, xs_pad, lens_pad, train=True, valid=valid,
                             mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(got)[:n_real],
                               np.asarray(want), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5),
        got_mut['batch_stats'], want_mut['batch_stats'])
