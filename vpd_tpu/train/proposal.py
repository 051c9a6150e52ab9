"""Per-frame action proposal model for temporal detection.

Parity with reference `util/proposal.py`: a 2-layer BiGRU/BiLSTM scoring
every frame as action/background, trained on random 250-frame windows
sampled length-weighted across videos (5000 virtual samples per epoch),
AdamW, validation-best snapshot, early termination; `get_proposals`
thresholds scores into runs, merges gaps <= 1 and drops runs <= 3 frames;
`EnsembleProposal` trains k models over KFold(5) splits (flip-augmented
copies of a video stay in one fold via custom_split) and averages
per-frame scores over models x flip variants.

TPU notes: train windows are fixed-length (static shapes by construction);
full-video prediction pads the time axis to power-of-2 buckets.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..models.gru import BiRNN

NUM_TRAIN_EPOCHS = 25
MIN_TRAIN_EPOCHS = 10


@functools.lru_cache(maxsize=None)
def _shared_tx():
    return optax.adamw(1e-3, weight_decay=0.01)


@functools.lru_cache(maxsize=32)
def _cached_train_step(model):
    """One jitted step per (hashable) model config: the KFold x flip
    ensemble constructs many ProposalTrainers with identical configs, and
    fresh jitted closures would recompile the BiGRU graph per member."""
    tx = _shared_tx()

    @jax.jit
    def step(params, batch_stats, opt_state, x, y, rng, step_i):
        rng = jax.random.fold_in(rng, step_i)
        lengths = jnp.full((x.shape[0],), x.shape[1])

        def loss_fn(p):
            logits, mut = model.apply(
                {'params': p, 'batch_stats': batch_stats}, x, lengths,
                train=True, mutable=['batch_stats'],
                rngs={'dropout': rng})
            flat = logits.reshape(-1, 2)
            yf = y.reshape(-1)
            loss = jnp.mean(
                -jnp.take_along_axis(jax.nn.log_softmax(flat),
                                     yf[:, None], axis=1))
            correct = jnp.sum(jnp.argmax(flat, 1) == yf)
            return loss, (mut['batch_stats'], correct)

        (loss, (new_stats, correct)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats,
                new_opt, loss, correct)

    return step


@functools.lru_cache(maxsize=32)
def _cached_eval_fn(model):
    @jax.jit
    def fn(params, batch_stats, x, y):
        lengths = jnp.full((x.shape[0],), x.shape[1])
        logits = model.apply(
            {'params': params, 'batch_stats': batch_stats}, x, lengths,
            train=False)
        flat = logits.reshape(-1, 2)
        yf = y.reshape(-1)
        loss = jnp.mean(
            -jnp.take_along_axis(jax.nn.log_softmax(flat),
                                 yf[:, None], axis=1))
        return loss, jnp.sum(jnp.argmax(flat, 1) == yf)

    return fn


@functools.lru_cache(maxsize=32)
def _cached_predict_fn(model):
    @jax.jit
    def fn(params, batch_stats, x, lengths):
        logits = model.apply(
            {'params': params, 'batch_stats': batch_stats}, x, lengths,
            train=False)
        return jax.nn.softmax(logits, axis=-1)[..., 1]

    return fn


@functools.lru_cache(maxsize=32)
def _cached_ensemble_predict_fn(model):
    """Whole-ensemble prediction as ONE dispatch: vmap the per-frame
    scorer over stacked member params (the reference loops models x flip
    variants per video, `util/proposal.py:245-256` — k x 2 serial GPU
    calls; here all members and variants score in a single program)."""

    @jax.jit
    def fn(stacked_params, stacked_stats, x, lengths):
        def one(p, s):
            logits = model.apply({'params': p, 'batch_stats': s}, x,
                                 lengths, train=False)
            return jax.nn.softmax(logits, axis=-1)[..., 1]

        return jax.vmap(one)(stacked_params, stacked_stats)  # (k, n, T)

    return fn


class ProposalSeq(nn.Module):
    """BiRNN -> per-frame 2-class head (`util/proposal.py:16-54`)."""
    cell_type: str
    hidden_dim: int
    depth: int = 2
    dropout: float = 0.5
    input_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, lengths, train: bool = False):
        x = nn.Dropout(self.input_dropout, deterministic=not train)(x)
        outputs, _ = BiRNN(self.cell_type, self.hidden_dim,
                           self.depth)(x, lengths)
        b, t, h2 = outputs.shape
        flat = outputs.reshape(b * t, h2)
        flat = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)(flat)
        flat = nn.Dropout(self.dropout, deterministic=not train)(flat)
        flat = nn.relu(nn.Dense(h2)(flat))
        flat = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)(flat)
        flat = nn.Dropout(self.dropout, deterministic=not train)(flat)
        logits = nn.Dense(2)(flat)
        return logits.reshape(b, t, 2)


class _WindowSampler:
    """Random fixed-length windows, videos weighted by spare length
    (`util/proposal.py:56-75`)."""

    def __init__(self, X, y, seq_len=250, n=5000, seed=0):
        self.X = X
        self.y = y
        weights = np.array([max(0, len(z) - seq_len) for z in y],
                           dtype=np.float64)
        assert weights.max() > 0, 'All sequences are too short!'
        self.p = weights / weights.sum()
        self.seq_len = seq_len
        self.n = n
        self.rng = np.random.default_rng(seed)

    def batch(self, batch_size):
        xs, ys = [], []
        for _ in range(batch_size):
            idx = self.rng.choice(len(self.y), p=self.p)
            start = self.rng.integers(
                0, len(self.y[idx]) - self.seq_len)
            xs.append(self.X[idx][start:start + self.seq_len])
            ys.append(self.y[idx][start:start + self.seq_len])
        return (np.stack(xs).astype(np.float32),
                np.stack(ys).astype(np.int32))


class ProposalTrainer:
    """Train one proposal model (reference BaseProposalModel)."""

    def __init__(self, arch_type, X, y, hidden_dim, batch_size=100,
                 num_epochs=NUM_TRAIN_EPOCHS, min_epochs=MIN_TRAIN_EPOCHS,
                 early_term_acc=1, early_term_no_val_improvement=50,
                 X_val=None, y_val=None, seq_len=250, samples_per_epoch=5000,
                 seed=0, **kwargs):
        self.model = ProposalSeq(arch_type, hidden_dim, **kwargs)
        emb_dim = X[0].shape[-1]
        self.seq_len = seq_len

        variables = self.model.init(
            {'params': jax.random.key(seed)},
            jnp.zeros((1, seq_len, emb_dim)), jnp.full((1,), seq_len))
        self.params = variables['params']
        self.batch_stats = variables.get('batch_stats', {})
        tx = _shared_tx()
        opt_state = tx.init(self.params)

        train_step = self._make_train_step(tx)
        sampler = _WindowSampler(X, y, seq_len, samples_per_epoch, seed)
        val_sampler = (_WindowSampler(X_val, y_val, seq_len,
                                      samples_per_epoch, seed + 1)
                       if X_val is not None else None)
        eval_fn = self._make_eval_fn()
        dropout_key = jax.random.key(seed + 2)

        best = None
        best_val_err_loss = (1., float('inf'))
        best_val_epoch = 0
        steps_per_epoch = samples_per_epoch // batch_size
        step_i = 0
        for epoch in range(num_epochs):
            step_outs = []  # device values; sync once per epoch
            total = 0
            for _ in range(steps_per_epoch):
                xb, yb = sampler.batch(batch_size)
                # fold_in happens inside the jit: an eager per-step op is
                # a separate device dispatch (ruinous on relay hosts)
                step_i += 1
                (self.params, self.batch_stats, opt_state, loss,
                 corr) = train_step(self.params, self.batch_stats,
                                    opt_state, xb, yb, dropout_key,
                                    np.int32(step_i))
                step_outs.append((loss, corr))
                total += yb.size
            from ..core.metrics import fetch_metrics

            step_outs = fetch_metrics(step_outs)  # ONE device readback
            ep_loss = sum(float(l) for l, _ in step_outs)
            correct = sum(int(c) for _, c in step_outs)
            acc = correct / total

            if val_sampler is not None:
                v_outs = []
                v_total = 0
                for _ in range(max(1, steps_per_epoch // 5)):
                    xb, yb = val_sampler.batch(batch_size)
                    v_outs.append(eval_fn(self.params, self.batch_stats,
                                          xb, yb))
                    v_total += yb.size
                v_outs = fetch_metrics(v_outs)
                v_loss = sum(float(l) for l, _ in v_outs)
                v_correct = sum(int(c) for _, c in v_outs)
                val_acc = v_correct / v_total
                if (1 - val_acc, v_loss) <= best_val_err_loss:
                    best_val_epoch = epoch
                    best_val_err_loss = (1 - val_acc, v_loss)
                    best = (jax.tree_util.tree_map(np.asarray, self.params),
                            jax.tree_util.tree_map(np.asarray,
                                                   self.batch_stats))
                    if 1 - best_val_err_loss[0] >= early_term_acc \
                            and epoch > min_epochs:
                        break
                elif (epoch - best_val_epoch
                      >= early_term_no_val_improvement
                      and epoch > min_epochs):
                    break
            if epoch >= min_epochs and acc > early_term_acc:
                break

        if best is not None:
            self.params, self.batch_stats = best
        self._predict_fn = self._make_predict_fn()

    def _make_train_step(self, tx):
        assert tx is _shared_tx()
        return _cached_train_step(self.model)

    def _make_eval_fn(self):
        return _cached_eval_fn(self.model)

    def _make_predict_fn(self):
        return _cached_predict_fn(self.model)

    def predict(self, x):
        """Per-frame P(action) for one (T, D) sequence."""
        x = np.asarray(x, np.float32)
        t = len(x)
        bucket = max(32, 1 << int(np.ceil(np.log2(max(t, 1)))))
        xp = np.zeros((1, bucket, x.shape[-1]), np.float32)
        xp[0, :t] = x
        scores = np.asarray(self._predict_fn(
            self.params, self.batch_stats, xp,
            np.array([t], np.int32)))[0]
        return scores[:t]


def get_proposals(scores, activation_thresh, min_prop_len=3,
                  merge_thresh=1):
    """Threshold -> runs -> merge gaps -> min length; score = mean
    (`util/proposal.py:175-209`)."""
    props = []
    curr = None
    for i in range(len(scores)):
        if scores[i] >= activation_thresh:
            curr = (i, i) if curr is None else (curr[0], i)
        else:
            if curr is not None:
                props.append(curr)
                curr = None
    if curr is not None:
        props.append(curr)

    merged = []
    for p in props:
        if merged and p[0] - merged[-1][1] <= merge_thresh:
            merged[-1] = (merged[-1][0], p[1])
        else:
            merged.append(p)

    return [(p, float(np.mean(scores[p[0]:p[1] + 1]))) for p in merged
            if p[1] - p[0] > min_prop_len]


class EnsembleProposal:
    """KFold(5) ensemble (`util/proposal.py:212-256`)."""

    def __init__(self, arch_type, X, y, hidden_dim, ensemble_size=3,
                 splits=5, custom_split=None, seed=0, **kwargs):
        if custom_split is None:
            custom_split = np.arange(len(X))
        unique_idxs = np.array(sorted(set(custom_split)))
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(unique_idxs))

        folds = np.array_split(order, splits)
        models = []
        for f in range(splits):
            val_set = set(unique_idxs[folds[f]].tolist())
            X_train, y_train, X_val, y_val = [], [], [], []
            for j in range(len(X)):
                if custom_split[j] in val_set:
                    X_val.append(X[j])
                    y_val.append(y[j])
                else:
                    X_train.append(X[j])
                    y_train.append(y[j])
            models.append(ProposalTrainer(
                arch_type, X_train, y_train, hidden_dim,
                X_val=X_val, y_val=y_val, seed=seed + f, **kwargs))
            if len(models) >= ensemble_size:
                break
        self.models = models
        # Stack member params once; predict_n runs the whole ensemble in
        # one vmapped dispatch per video.
        self._stacked_params = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[m.params for m in models])
        self._stacked_stats = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[m.batch_stats for m in models])
        self._predict_fn = _cached_ensemble_predict_fn(models[0].model)

    def predict_n(self, *xs):
        """Mean per-frame P(action) over members x variants; variants
        must share a length (flip copies of one video)."""
        t = len(xs[0])
        assert all(len(x) == t for x in xs), [len(x) for x in xs]
        bucket = max(32, 1 << int(np.ceil(np.log2(max(t, 1)))))
        xp = np.zeros((len(xs), bucket, xs[0].shape[-1]), np.float32)
        for i, x in enumerate(xs):
            xp[i, :t] = x
        lens = np.full(len(xs), t, np.int32)
        scores = np.asarray(self._predict_fn(
            self._stacked_params, self._stacked_stats, xp, lens))
        return scores[:, :, :t].mean(axis=(0, 1))

    def predict(self, x):
        return self.predict_n(x)
