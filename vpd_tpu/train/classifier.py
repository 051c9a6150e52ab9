"""Few-shot sequence-classifier training (recognition heads).

Parity with reference `BaseSeqModel` (`util/classifier.py:185-298`): AdamW
with cyclic cosine restarts (restart period = epochs/10), cross-entropy
over padded sequence batches, validation-best parameter snapshot, early
termination on train accuracy or stalled validation.

TPU-first: sequences are padded once to a global max length so every epoch
reuses one jitted program; the batch dimension is padded to a fixed size
with a validity mask (no dynamic shapes, no re-compiles for the last
batch); lr/weight-decay arrive as traced scalars from the host schedule.
"""

import functools
import math
import threading

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.schedule import CyclicCosineRestarts
from ..models.gru import CNNClassifier, SeqClassifier


def bucket_len(n):
    """Power-of-two time-axis bucket (min 16): shape-stable across
    few-shot trials so they share one compiled program."""
    return max(16, 1 << int(math.ceil(math.log2(max(int(n), 1)))))


@functools.lru_cache(maxsize=None)
def _shared_tx():
    """One AdamW instance for every classifier head: lr and weight decay
    are injected per step, so a single transformation (and therefore a
    single jit cache entry per model config) serves all trials."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)


@functools.lru_cache(maxsize=32)
def _cached_train_step(model):
    """Jitted train step keyed on the (hashable) flax module config.

    Few-shot sweeps construct a fresh SeqModelTrainer per trial; fresh
    jitted closures would recompile the RNN graph every trial (~minutes
    per compile on relay-attached TPU hosts). Sharing one jitted step per
    model config compiles once per (shape, config) across the sweep.
    """
    tx = _shared_tx()

    @jax.jit
    def step(params, batch_stats, opt_state, x, lengths, y, valid,
             lr, wd, rng, step_i):
        rng = jax.random.fold_in(rng, step_i)

        def loss_fn(p):
            # valid also reaches the BN layers: rows padded onto a
            # partial batch must not skew batch statistics (the
            # reference trains on the true-sized batch)
            out, mut = model.apply(
                {'params': p, 'batch_stats': batch_stats},
                x, lengths, train=True, valid=valid,
                mutable=['batch_stats'], rngs={'dropout': rng})
            logp = jax.nn.log_softmax(out)
            nll = -jnp.take_along_axis(
                logp, y[:, None], axis=1).squeeze(1)
            loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
            correct = jnp.sum(
                (jnp.argmax(out, 1) == y) * valid)
            return loss, (mut['batch_stats'], correct)

        (loss, (new_stats, correct)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        opt_state.hyperparams['learning_rate'] = lr
        opt_state.hyperparams['weight_decay'] = wd
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats,
                new_opt, loss, correct)

    return step


@functools.lru_cache(maxsize=32)
def _cached_logits_fn(model):
    @jax.jit
    def logits(params, batch_stats, x, lengths):
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           x, lengths, train=False)

    return logits


def pad_sequences(X, max_len=None):
    """list of (T_i, D) -> (N, T_max, D) + lengths (N,)."""
    lengths = np.array([len(x) for x in X], dtype=np.int32)
    t = int(max_len or lengths.max())
    d = X[0].shape[-1]
    out = np.zeros((len(X), t, d), dtype=np.float32)
    for i, x in enumerate(X):
        n = min(len(x), t)
        out[i, :n] = x[:n]
    return out, np.minimum(lengths, t)


def make_model(arch_type, num_classes, hidden_dim, **kwargs):
    if arch_type == 'cnn':
        return CNNClassifier(hidden_dim=hidden_dim,
                             num_classes=num_classes, **kwargs)
    return SeqClassifier(cell_type=arch_type, hidden_dim=hidden_dim,
                         num_classes=num_classes, **kwargs)


_PREWARM_LOCK = threading.Lock()


def prewarm_seq_model(arch_type, num_classes, hidden_dim, seq_dim,
                      max_len, batch_size=50, seed=0, block=False,
                      **kwargs):
    """Start compiling the shared train/eval programs on a background
    thread, overlapping the (possibly minutes-long, relay-side) XLA
    compile with host-side sweep preparation so trial 0 doesn't pay it
    serially. Shapes must match the sweep's: same model config kwargs,
    batch_size, and the bucketed max_len the trainers will use. The jit
    caches (`_cached_train_step` / `_cached_logits_fn`) dedupe with the
    sweep's own calls, and concurrent first-calls of one jitted program
    block on a single shared compile. Best-effort: failures are
    swallowed (the sweep then compiles at trial 0 as before).
    """
    def work():
        try:
            with _PREWARM_LOCK:
                model = make_model(arch_type, num_classes, hidden_dim,
                                   **kwargs)
                step = _cached_train_step(model)
                logits = _cached_logits_fn(model)
            t = bucket_len(max_len)
            variables = model.init(
                {'params': jax.random.key(seed)},
                jnp.zeros((1, t, seq_dim)), jnp.ones((1,), jnp.int32))
            params = variables['params']
            stats = variables.get('batch_stats', {})
            opt_state = _shared_tx().init(params)
            x = np.zeros((batch_size, t, seq_dim), np.float32)
            lens = np.full((batch_size,), t, np.int32)
            y = np.zeros((batch_size,), np.int32)
            valid = np.ones((batch_size,), bool)
            out = step(params, stats, opt_state, x, lens, y, valid,
                       np.float32(1e-3), np.float32(0.01),
                       jax.random.key(seed + 1), np.int32(1))
            np.asarray(out[3])  # readback forces the (lazy) relay compile
            np.asarray(logits(params, stats, x, lens))
        except Exception:  # pragma: no cover - best-effort warm-up
            pass

    th = threading.Thread(target=work, daemon=True)
    th.start()
    if block:
        th.join()
    return th


class SeqModelTrainer:
    """Train + predict wrapper (reference BaseSeqModel semantics)."""

    def __init__(self, arch_type, X, y, hidden_dim, batch_size=50,
                 num_epochs=500, min_epochs=10, wr_count=10,
                 early_term_acc=1, X_val=None, y_val=None, val_freq=1,
                 early_term_val_num_epochs=200, learning_rate=0.001,
                 load_weights=None, preset=None, seed=0, log=None,
                 bucket_floor=None, **kwargs):
        self.num_classes = int(np.unique(np.asarray(y)).shape[0])
        # jnp.take_along_axis CLAMPS out-of-range labels inside jit —
        # a label >= num_classes (e.g. a class whose every sequence is
        # embedding-less) would silently train a corrupted head where
        # torch's F.cross_entropy crashes loudly
        assert int(np.max(y)) < self.num_classes, \
            (int(np.max(y)), self.num_classes)
        self.model = make_model(arch_type, self.num_classes, hidden_dim,
                                **kwargs)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

        max_len = max(
            max(len(x) for x in X),
            max((len(x) for x in (X_val or [])), default=0),
            # sweep-wide length floor: every few-shot subset then shares
            # one bucketed shape (and the prewarmed compile), even when
            # the subset misses the globally-longest sequence
            bucket_floor or 0)
        # Bucket the time axis to a power of two: few-shot sweeps draw
        # different train subsets per trial, and a per-trial max length
        # would give every trial a fresh shape (and a fresh ~minutes RNN
        # compile); bucketing keeps trials on the shared jit cache.
        max_len = bucket_len(max_len)
        Xp, lens = pad_sequences(X, max_len)
        yp = np.asarray(y, dtype=np.int32)

        variables = self.model.init(
            {'params': jax.random.key(seed)},
            jnp.zeros((1, max_len, Xp.shape[-1])), jnp.ones((1,), jnp.int32))
        self.params = variables['params']
        self.batch_stats = variables.get('batch_stats', {})

        if load_weights is not None:  # pretrained head, skip training
            self._logits = self._make_logits_fn()
            self.load(load_weights)
            return
        if preset is not None:  # trained elsewhere (fused sweep)
            self.params, self.batch_stats = preset
            self._logits = self._make_logits_fn()
            return

        tx = _shared_tx()
        opt_state = tx.init(self.params)

        sched = CyclicCosineRestarts(
            learning_rate, 0.01, batch_size, len(X),
            restart_period=max(1, num_epochs // wr_count))

        train_step = _cached_train_step(self.model)
        eval_logits = self._make_logits_fn()
        dropout_key = jax.random.key(seed + 1)

        if X_val is not None:
            Xv, lens_v = pad_sequences(X_val, max_len)
            yv = np.asarray(y_val, dtype=np.int32)

        best = None
        best_val_err_loss = (1., float('inf'))
        best_val_epoch = 0
        step_i = 0
        for epoch in range(num_epochs):
            sched.epoch_start()
            order = self.rng.permutation(len(Xp))
            step_outs = []  # device values; sync once per epoch, not per step
            n = 0
            for i in range(0, len(order), batch_size):
                idx = order[i:i + batch_size]
                pad = batch_size - len(idx)
                idx_p = np.concatenate([idx, np.zeros(pad, np.int64)]) \
                    if pad else idx
                valid = np.arange(batch_size) < len(idx)
                # lr/wd/step go in as host scalars; fold_in happens inside
                # the jit — eager per-step ops would each be a separate
                # device dispatch (ruinous on relay-attached hosts).
                step_i += 1
                (self.params, self.batch_stats, opt_state, loss,
                 correct) = train_step(
                    self.params, self.batch_stats, opt_state,
                    Xp[idx_p], lens[idx_p], yp[idx_p], valid,
                    np.float32(sched.lr), np.float32(sched.weight_decay),
                    dropout_key, np.int32(step_i))
                sched.batch_step()
                step_outs.append((loss, correct))
                n += len(idx)
            from ..core.metrics import fetch_metrics

            step_outs = fetch_metrics(step_outs)  # ONE device readback
            ep_loss = sum(float(l) for l, _ in step_outs)
            ep_correct = sum(int(c) for _, c in step_outs)
            acc = ep_correct / n

            if X_val is not None and epoch % val_freq == 0:
                val_loss, val_acc = self._evaluate(
                    eval_logits, Xv, lens_v, yv)
                if (1 - val_acc, val_loss) <= best_val_err_loss:
                    best_val_epoch = epoch
                    best_val_err_loss = (1 - val_acc, val_loss)
                    best = (jax.tree_util.tree_map(np.asarray, self.params),
                            jax.tree_util.tree_map(np.asarray,
                                                   self.batch_stats))
                elif (early_term_val_num_epochs > 0 and
                      epoch - early_term_val_num_epochs > best_val_epoch):
                    break
            if log is not None:
                log(epoch, ep_loss / n, acc)
            if epoch >= min_epochs and acc > early_term_acc:
                break

        if best is not None:
            self.params, self.batch_stats = best
        self._logits = self._make_logits_fn()

    # -- jitted pieces ------------------------------------------------------

    def _make_logits_fn(self):
        return _cached_logits_fn(self.model)

    def _evaluate(self, logits_fn, X, lengths, y):
        total_loss, correct = 0., 0
        for i in range(0, len(X), self.batch_size):
            xs, ls, ys = (X[i:i + self.batch_size],
                          lengths[i:i + self.batch_size],
                          y[i:i + self.batch_size])
            out = np.asarray(logits_fn(self.params, self.batch_stats,
                                       xs, ls))
            logp = out - np.log(np.sum(np.exp(
                out - out.max(1, keepdims=True)), 1, keepdims=True)) \
                - out.max(1, keepdims=True)
            total_loss += float(-np.mean(logp[np.arange(len(ys)), ys]))
            correct += int(np.sum(np.argmax(out, 1) == ys))
        num_batches = math.ceil(len(X) / self.batch_size)
        return total_loss / max(num_batches, 1), correct / len(X)

    # -- prediction (reference predict/predict_n) ---------------------------

    def predict(self, x, full=False):
        x = np.asarray(x)
        # bucket the time axis to limit re-jitting across query lengths
        bucket = bucket_len(len(x))
        xp, lens = pad_sequences([x], max_len=bucket)
        out = np.asarray(self._logits(
            self.params, self.batch_stats, xp, lens))[0]
        probs = np.exp(out - out.max())
        probs /= probs.sum()
        if full:
            return probs
        cls = int(np.argmax(probs))
        return cls, float(probs[cls])

    def predict_n(self, *xs):
        scores = np.mean([self.predict(x, full=True) for x in xs], axis=0)
        cls = int(np.argmax(scores))
        return cls, float(scores[cls])

    # -- persistence (reference BaseSeqModel.save / load_weights) ----------

    def save(self, out_path):
        from flax import serialization

        with open(out_path, 'wb') as fp:
            fp.write(serialization.to_bytes(
                {'params': jax.tree_util.tree_map(np.asarray, self.params),
                 'batch_stats': jax.tree_util.tree_map(
                     np.asarray, self.batch_stats)}))

    def load(self, path):
        from flax import serialization

        with open(path, 'rb') as fp:
            restored = serialization.from_bytes(
                {'params': self.params, 'batch_stats': self.batch_stats},
                fp.read())
        self.params = restored['params']
        self.batch_stats = restored['batch_stats']
