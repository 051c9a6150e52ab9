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
def _cached_fused_train_step(model):
    """Per-step program advancing ALL ensemble members at once.

    The reference trains the KFold members serially
    (`util/proposal.py:212-240`); folds are independent, so the member
    axis is a free vmap dimension — one dispatch advances every member,
    and a `live` mask freezes early-terminated members on device (their
    updates are computed and discarded, so overshoot never changes a
    result).
    """
    tx = _shared_tx()

    @jax.jit
    def step(params, stats, opt, live, x, y, keys, step_i):
        def one(p, st, o, xb, yb, key):
            rng = jax.random.fold_in(key, step_i)
            lengths = jnp.full((xb.shape[0],), xb.shape[1])

            def loss_fn(pp):
                logits, mut = model.apply(
                    {'params': pp, 'batch_stats': st}, xb, lengths,
                    train=True, mutable=['batch_stats'],
                    rngs={'dropout': rng})
                flat = logits.reshape(-1, 2)
                yf = yb.reshape(-1)
                loss = jnp.mean(
                    -jnp.take_along_axis(jax.nn.log_softmax(flat),
                                         yf[:, None], axis=1))
                correct = jnp.sum(jnp.argmax(flat, 1) == yf)
                return loss, (mut['batch_stats'], correct)

            (loss, (new_st, correct)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, new_o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), new_st, new_o,
                    loss, correct)

        new_p, new_st, new_o, loss, corr = jax.vmap(one)(
            params, stats, opt, x, y, keys)
        from .fused_sweep import _tree_where

        return (_tree_where(live, new_p, params),
                _tree_where(live, new_st, stats),
                _tree_where(live, new_o, opt), loss, corr)

    return step


@functools.lru_cache(maxsize=32)
def _cached_fused_eval_fn(model):
    @jax.jit
    def fn(params, stats, x, y):
        def one(p, st, xb, yb):
            lengths = jnp.full((xb.shape[0],), xb.shape[1])
            logits = model.apply(
                {'params': p, 'batch_stats': st}, xb, lengths,
                train=False)
            flat = logits.reshape(-1, 2)
            yf = yb.reshape(-1)
            loss = jnp.mean(
                -jnp.take_along_axis(jax.nn.log_softmax(flat),
                                     yf[:, None], axis=1))
            return loss, jnp.sum(jnp.argmax(flat, 1) == yf)

        return jax.vmap(one)(params, stats, x, y)

    return fn


@functools.lru_cache(maxsize=32)
def _cached_snapshot_fn(model):
    """Masked device-side best-params snapshot (no per-member fetches)."""
    del model  # cache key only

    @jax.jit
    def snap(update, params, stats, best_params, best_stats):
        from .fused_sweep import _tree_where

        return (_tree_where(update, params, best_params),
                _tree_where(update, stats, best_stats))

    return snap


class FusedEnsembleTrainer:
    """Train every KFold ensemble member as ONE vmapped device program.

    `members` is a list of (X_train, y_train, X_val, y_val, seed) fold
    specs. Semantics replicate `ProposalTrainer` member-by-member: each
    member keeps its own init key (`jax.random.key(seed)`), window
    sampler RNG streams (seed / seed+1), dropout key (seed+2), and the
    reference's validation-best + early-termination rules
    (`util/proposal.py:109-173`) — decided on host from the per-member
    epoch metrics, with best snapshots kept on device via masked
    selects. Equality with sequential `ProposalTrainer`s is tested in
    tests/test_downstream.py.

    With a `mesh`, the member axis shards over the 'data' axis (members
    are independent — no collectives); member count is padded to a
    multiple of the axis size with copies of member 0 that train but
    are never read back.
    """

    def __init__(self, arch_type, members, hidden_dim, batch_size=100,
                 num_epochs=NUM_TRAIN_EPOCHS, min_epochs=MIN_TRAIN_EPOCHS,
                 early_term_acc=1, early_term_no_val_improvement=50,
                 seq_len=250, samples_per_epoch=5000, mesh=None, **kwargs):
        from ..core.mesh import member_axis_placement, step_sync_needed
        from ..core.metrics import fetch_metrics

        real_m = len(members)
        mesh, members, put_m, _ = member_axis_placement(mesh, members)
        m = len(members)

        self.model = ProposalSeq(arch_type, hidden_dim, **kwargs)
        emb_dim = members[0][0][0].shape[-1]
        self.seq_len = seq_len

        inits = [self.model.init(
            {'params': jax.random.key(seed)},
            jnp.zeros((1, seq_len, emb_dim)), jnp.full((1,), seq_len))
            for _, _, _, _, seed in members]
        params = put_m(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[v['params'] for v in inits]))
        stats = put_m(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[v.get('batch_stats', {}) for v in inits]))
        tx = _shared_tx()
        opt = put_m(jax.vmap(tx.init)(params))
        keys = put_m(jnp.stack(
            [jax.random.key(seed + 2) for _, _, _, _, seed in members]))

        samplers = [_WindowSampler(X, y, seq_len, samples_per_epoch, seed)
                    for X, y, _, _, seed in members]
        val_samplers = [_WindowSampler(Xv, yv, seq_len, samples_per_epoch,
                                       seed + 1)
                        for _, _, Xv, yv, seed in members]

        fused_step = _cached_fused_train_step(self.model)
        fused_eval = _cached_fused_eval_fn(self.model)
        snap = _cached_snapshot_fn(self.model)
        sync = step_sync_needed(mesh)

        best_params, best_stats = params, stats
        best_err_loss = [(1., float('inf'))] * m
        best_epoch = np.zeros(m, np.int64)
        live = np.ones(m, bool)
        steps_per_epoch = samples_per_epoch // batch_size
        # the reference validates a FULL virtual epoch (same n=5000
        # window dataset for val, `util/proposal.py:94-96,112-114`) —
        # a shortened val pass would noise up best-epoch selection
        val_steps = steps_per_epoch
        step_i = 0
        for epoch in range(num_epochs):
            live_dev = put_m(live)
            step_outs = []
            total = 0
            for _ in range(steps_per_epoch):
                xb = np.empty((m, batch_size, seq_len, emb_dim),
                              np.float32)
                yb = np.empty((m, batch_size, seq_len), np.int32)
                for mi in range(m):
                    xb[mi], yb[mi] = samplers[mi].batch(batch_size)
                step_i += 1
                params, stats, opt, loss, corr = fused_step(
                    params, stats, opt, live_dev, put_m(xb), put_m(yb),
                    keys, np.int32(step_i))
                if sync:
                    # multi-device CPU: a sharded device_put racing the
                    # in-flight program deadlocks (core/mesh.py:102)
                    jax.block_until_ready(params)
                step_outs.append((loss, corr))
                total += batch_size * seq_len
            step_outs = fetch_metrics(step_outs)
            acc = np.sum([np.asarray(c, np.int64) for _, c in step_outs],
                         axis=0) / total

            v_outs = []
            v_total = 0
            for _ in range(val_steps):
                xb = np.empty((m, batch_size, seq_len, emb_dim),
                              np.float32)
                yb = np.empty((m, batch_size, seq_len), np.int32)
                for mi in range(m):
                    xb[mi], yb[mi] = val_samplers[mi].batch(batch_size)
                ev = fused_eval(params, stats, put_m(xb), put_m(yb))
                if sync:
                    jax.block_until_ready(ev)
                v_outs.append(ev)
                v_total += batch_size * seq_len
            v_outs = fetch_metrics(v_outs)
            v_loss = np.sum([np.asarray(l, np.float64)
                             for l, _ in v_outs], axis=0)
            val_acc = np.sum([np.asarray(c, np.int64) for _, c in v_outs],
                             axis=0) / v_total

            update = np.zeros(m, bool)
            for mi in range(m):
                if not live[mi]:
                    continue
                if (1 - val_acc[mi], v_loss[mi]) <= best_err_loss[mi]:
                    best_epoch[mi] = epoch
                    best_err_loss[mi] = (1 - val_acc[mi], v_loss[mi])
                    update[mi] = True
                    if 1 - best_err_loss[mi][0] >= early_term_acc \
                            and epoch > min_epochs:
                        live[mi] = False
                elif (epoch - best_epoch[mi]
                      >= early_term_no_val_improvement
                      and epoch > min_epochs):
                    live[mi] = False
                if live[mi] and epoch >= min_epochs \
                        and acc[mi] > early_term_acc:
                    live[mi] = False
            if update.any():
                best_params, best_stats = snap(
                    put_m(update), params, stats, best_params, best_stats)
                if sync:
                    jax.block_until_ready(best_params)
            if not live.any():
                break

        take = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda z: np.asarray(z)[:real_m], t)
        self.stacked_params = take(best_params)
        self.stacked_stats = take(best_stats)
        self.num_members = real_m

    def member(self, mi):
        take = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda z: z[mi], t)
        return take(self.stacked_params), take(self.stacked_stats)


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
                # full virtual val epoch (`util/proposal.py:94-96`)
                for _ in range(steps_per_epoch):
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
    """KFold(5) ensemble (`util/proposal.py:212-256`).

    `fused=True` (the default) trains all folds as one vmapped per-step
    device program (`FusedEnsembleTrainer`) instead of sequentially — k
    times fewer dispatches and one compile per localization trial, same
    member-by-member results (equality tested in
    tests/test_downstream.py); `mesh` additionally shards the member
    axis across the data mesh. `fused=False` keeps the reference-shaped
    sequential loop (`--sequential_ensemble` on the CLI).
    """

    def __init__(self, arch_type, X, y, hidden_dim, ensemble_size=3,
                 splits=5, custom_split=None, seed=0, fused=True,
                 mesh=None, **kwargs):
        if custom_split is None:
            custom_split = np.arange(len(X))
        unique_idxs = np.array(sorted(set(custom_split)))
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(unique_idxs))

        folds = np.array_split(order, splits)
        specs = []
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
            specs.append((X_train, y_train, X_val, y_val, seed + f))
            if len(specs) >= ensemble_size:
                break

        if fused:
            trainer = FusedEnsembleTrainer(
                arch_type, specs, hidden_dim, mesh=mesh, **kwargs)
            self.models = []
            self._stacked_params = jax.tree_util.tree_map(
                jnp.asarray, trainer.stacked_params)
            self._stacked_stats = jax.tree_util.tree_map(
                jnp.asarray, trainer.stacked_stats)
            self._predict_fn = _cached_ensemble_predict_fn(trainer.model)
            return

        models = [ProposalTrainer(
            arch_type, Xt, yt, hidden_dim, X_val=Xv, y_val=yv, seed=s,
            **kwargs) for Xt, yt, Xv, yv, s in specs]
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
