"""Fused few-shot sweep: train every trial of a few-shot size at once.

The reference protocol (`recognize.py:553-574`) trains one sequence head
per (few-shot size, trial) — 60 independent trainings that differ ONLY in
which training sequences they see (every trial uses the same seed, so
init params and dropout streams are identical; `util/classifier.py:185`).
The sequential port (`train/classifier.py`) already shares one compiled
step across trials; this module goes the TPU-native step further and
*stacks the trials*: the training-sequence pool lives on device once, each
member (trial) addresses it through per-epoch index schedules computed on
host with the member's exact numpy RNG stream, and a single jitted program
advances all members together — the per-member train step is `vmap`ed onto
the MXU and `lax.scan` runs a whole validation period of epochs per
dispatch.

Parity: the device program replicates `SeqModelTrainer`'s semantics
member-by-member — per-epoch permutations from `np.random.default_rng
(seed)`, partial batches padded with member row 0 + validity masks,
per-step (lr, wd) from `CyclicCosineRestarts` walked per member on host,
`fold_in(key, step_i)` dropout streams, chunked validation loss
(`classifier.py:_evaluate`), lexicographic `(1 - val_acc, val_loss) <=`
best selection, the val-stall early termination applied only on
non-improving val epochs, and the train-accuracy break. A stopped member's
state freezes on device (masked updates) so overshooting epochs in flight
cannot change its result. Equality with the sequential trainer is tested
head-to-head in tests/test_fused_sweep.py.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.mesh import (DATA_AXIS, member_axis_placement,
                         step_sync_needed)
from ..core.schedule import CyclicCosineRestarts
from .classifier import (_shared_tx, bucket_len, make_model,
                         pad_sequences)


def _tree_where(pred, new, old):
    """Per-member select over stacked pytrees; pred is (M,) bool."""
    def sel(n, o):
        p = pred.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(p, n, o)
    return jax.tree_util.tree_map(sel, new, old)


def _stack_trees(tree, m):
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (m,) + x.shape), tree)


class FusedSweepTrainer:
    """Train M same-shape sequence heads as one vmapped device program.

    Args mirror `SeqModelTrainer` (reference `util/classifier.py:185-298`)
    with the member dimension factored out:

    - X_pool / y_pool: the shared training-sequence pool (list of (T, D)
      float arrays) and integer class labels, uploaded to device once.
    - member_rows: list (length M) of index lists into the pool — the
      rows each member trains on, in the member's local order.
    - X_val / y_val: validation sequences shared by every member.
    - mesh: optional `jax.sharding.Mesh` with a '{data}' axis. Members
      are independent, so the stacked member dimension shards across it
      with NO collectives in the train program (the only cross-device
      traffic is the stop-flag readback between chunks). Member count is
      padded to a multiple of the axis size with copies of member 0;
      padded members train but are never read back.

    After construction, `member(m)` returns (params, batch_stats) numpy
    trees for member m (the validation-best snapshot when a validation
    set was given, else the final state) — bit-compatible with
    `SeqModelTrainer` save/load trees.

    BUCKETING CAVEAT: all members pad to one bucket derived from the
    POOL's max length (`self.bucket_max_len` after construction), while
    a standalone `SeqModelTrainer` buckets to its own subset's max — and
    the unmasked attention-pooling quirk (QUIRKS.md) makes trained
    weights depend on the padded length. Member-for-member equality
    with sequential trainers therefore requires constructing those with
    `bucket_floor=<this pool max>` (tasks/recognize.py does; tested in
    tests/test_fused_sweep.py).
    """

    def __init__(self, arch_type, X_pool, y_pool, member_rows, hidden_dim,
                 batch_size=50, num_epochs=500, min_epochs=10, wr_count=10,
                 early_term_acc=1, X_val=None, y_val=None, val_freq=1,
                 early_term_val_num_epochs=200, learning_rate=0.001,
                 seed=0, bucket_floor=None, epochs_per_dispatch=None,
                 mesh=None, log=None, **kwargs):
        real_m = len(member_rows)
        mesh, member_rows, put_m, put_r = member_axis_placement(
            mesh, member_rows)
        if mesh is not None:
            # schedules carry the member axis at dim 2
            shard_sched = NamedSharding(mesh, P(None, None, DATA_AXIS))
            put_sched = lambda x: jax.device_put(x, shard_sched)  # noqa: E731
        else:
            put_sched = lambda x: x  # noqa: E731 - jit uploads it

        y_pool = np.asarray(y_pool, dtype=np.int32)
        num_classes = int(np.unique(y_pool).shape[0])
        # replicate torch's loud out-of-range crash: take_along_axis
        # would clamp a label >= num_classes inside jit (classifier.py)
        assert int(y_pool.max()) < num_classes, \
            (int(y_pool.max()), num_classes)
        for rows in member_rows:
            got = int(np.unique(y_pool[np.asarray(rows)]).shape[0])
            if got != num_classes:
                # the sequential trainer would build a smaller head for
                # this member (classes are re-derived per subset); the
                # stacked program cannot — callers fall back per size
                raise ValueError(
                    'member covers {} of {} classes; fused training '
                    'requires every member to see every class'.format(
                        got, num_classes))
        self.num_classes = num_classes
        model = make_model(arch_type, num_classes, hidden_dim, **kwargs)
        self.model = model

        m = len(member_rows)
        max_len = max(
            max(len(x) for x in X_pool),
            max((len(x) for x in (X_val or [])), default=0),
            bucket_floor or 0)
        max_len = bucket_len(max_len)
        self.bucket_max_len = max_len  # see BUCKETING CAVEAT above
        Xp, lens = pad_sequences(X_pool, max_len)

        variables = model.init(
            {'params': jax.random.key(seed)},
            jnp.zeros((1, max_len, Xp.shape[-1])), jnp.ones((1,), jnp.int32))
        params = put_m(_stack_trees(variables['params'], m))
        batch_stats = put_m(_stack_trees(variables.get('batch_stats', {}), m))
        tx = _shared_tx()
        opt_state = put_m(jax.vmap(tx.init)(params))

        has_val = X_val is not None
        if has_val:
            Xv, lens_v = pad_sequences(X_val, max_len)
            yv = np.asarray(y_val, dtype=np.int32)
            n_val = len(Xv)
            n_val_chunks = math.ceil(n_val / batch_size)
            v_pad = n_val_chunks * batch_size
            Xv = np.concatenate(
                [Xv, np.zeros((v_pad - n_val,) + Xv.shape[1:], Xv.dtype)])
            lens_v = np.concatenate(
                [lens_v, np.ones(v_pad - n_val, lens_v.dtype)])
            yv = np.concatenate([yv, np.zeros(v_pad - n_val, yv.dtype)])
            val_row_valid = np.arange(v_pad) < n_val
            # per-chunk row counts replicate _evaluate's chunked means
            chunk_count = np.minimum(
                n_val - np.arange(n_val_chunks) * batch_size,
                batch_size).astype(np.float32)
        else:
            Xv = np.zeros((batch_size, max_len, Xp.shape[-1]), np.float32)
            lens_v = np.ones((batch_size,), np.int32)
            yv = np.zeros((batch_size,), np.int32)
            val_row_valid = np.zeros((batch_size,), bool)
            n_val, n_val_chunks = 0, 1
            chunk_count = np.ones((1,), np.float32)

        member_rows = [np.asarray(r, dtype=np.int32) for r in member_rows]
        lens_m = np.array([len(r) for r in member_rows], np.int32)
        steps_m = np.maximum(1, np.ceil(lens_m / batch_size)).astype(int)
        s_max = int(steps_m.max())

        # host-side replicas of each member's trainer-local state
        scheds = [CyclicCosineRestarts(
            learning_rate, 0.01, batch_size, int(n),
            restart_period=max(1, num_epochs // wr_count))
            for n in lens_m]
        rngs = [np.random.default_rng(seed) for _ in range(m)]
        step_counters = np.zeros(m, np.int64)

        # Epochs per device dispatch. Any value is correct (stopped
        # members are masked on device; do_val is computed from absolute
        # epoch ids), so this only trades dispatch count against
        # early-stop overshoot. Default: at least one validation period
        # and at least 16 epochs per program.
        chunk_len = int(epochs_per_dispatch or max(1, val_freq, 16))
        chunk_len = max(1, min(chunk_len, num_epochs))
        dropout_key = jax.random.key(seed + 1)

        run_chunk = _cached_chunk_fn(
            model, tx, batch_size, s_max, chunk_len, n_val_chunks,
            bool(has_val))

        pool_x = put_r(Xp)
        pool_len = put_r(lens)
        pool_y = put_r(y_pool)
        val_x = put_r(Xv.reshape(
            (n_val_chunks, batch_size) + Xv.shape[1:]))
        val_len = put_r(lens_v.reshape(n_val_chunks, batch_size))
        val_y = put_r(yv.reshape(n_val_chunks, batch_size))
        val_valid = put_r(val_row_valid.reshape(n_val_chunks, batch_size))
        chunk_count = put_r(chunk_count)
        dropout_key = put_r(dropout_key)

        state = dict(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            best_params=params, best_stats=batch_stats,
            best_err=put_m(jnp.ones((m,), jnp.float32)),
            best_loss=put_m(jnp.full((m,), jnp.inf, jnp.float32)),
            best_epoch=put_m(jnp.zeros((m,), jnp.int32)),
            stopped=put_m(jnp.zeros((m,), bool)))

        n_m = put_m(jnp.asarray(lens_m, jnp.float32))
        scalars = put_r(dict(
            min_epochs=np.int32(min_epochs),
            early_term_acc=np.float32(early_term_acc),
            etvne=np.int32(early_term_val_num_epochs),
            n_val=np.float32(n_val), n_chunks=np.float32(n_val_chunks)))
        sync = step_sync_needed(mesh)
        prev_stopped = None
        for chunk_start in range(0, num_epochs, chunk_len):
            epochs = list(range(chunk_start,
                                min(chunk_start + chunk_len, num_epochs)))
            idx = np.zeros((chunk_len, s_max, m, batch_size), np.int32)
            bvalid = np.zeros((chunk_len, s_max, m, batch_size), bool)
            step_valid = np.zeros((chunk_len, s_max, m), bool)
            lr = np.ones((chunk_len, s_max, m), np.float32)
            wd = np.zeros((chunk_len, s_max, m), np.float32)
            step_i = np.zeros((chunk_len, s_max, m), np.int32)
            do_val = np.zeros((chunk_len,), bool)
            epoch_ids = np.zeros((chunk_len,), np.int32)
            for e_local, epoch in enumerate(epochs):
                epoch_ids[e_local] = epoch
                do_val[e_local] = has_val and epoch % val_freq == 0
                for mi in range(m):
                    sched = scheds[mi]
                    sched.epoch_start()
                    order = rngs[mi].permutation(lens_m[mi])
                    rows = member_rows[mi]
                    for s, i in enumerate(range(0, lens_m[mi], batch_size)):
                        sel = order[i:i + batch_size]
                        pad = batch_size - len(sel)
                        local = (np.concatenate([sel, np.zeros(pad, np.int64)])
                                 if pad else sel)
                        idx[e_local, s, mi] = rows[local]
                        bvalid[e_local, s, mi] = (
                            np.arange(batch_size) < len(sel))
                        step_valid[e_local, s, mi] = True
                        step_counters[mi] += 1
                        step_i[e_local, s, mi] = step_counters[mi]
                        lr[e_local, s, mi] = sched.lr
                        wd[e_local, s, mi] = sched.weight_decay
                        sched.batch_step()

            state = run_chunk(
                state, pool_x, pool_len, pool_y, put_sched(idx),
                put_sched(bvalid), put_sched(step_valid), put_sched(lr),
                put_sched(wd), put_sched(step_i), put_r(epoch_ids),
                put_r(do_val), val_x, val_len, val_y,
                val_valid, chunk_count, dropout_key, n_m,
                scalars['min_epochs'], scalars['early_term_acc'],
                scalars['etvne'], scalars['n_val'], scalars['n_chunks'])
            if sync:
                # multi-device CPU (tests/dryruns): a sharded device_put
                # for the next chunk racing this in-flight program
                # deadlocks the in-process communicator — block here
                jax.block_until_ready(state)
            if log is not None:
                log('fused chunk epochs {}-{} dispatched'.format(
                    epochs[0], epochs[-1]))
            # poll the stop flags one chunk behind: the next chunk is
            # already enqueued before this sync, and a stopped member's
            # updates are masked on device, so overshoot is just the
            # in-flight work — never a different result
            if prev_stopped is not None and bool(np.asarray(
                    prev_stopped).all()):
                break
            prev_stopped = state['stopped']

        which = 'best_params' if has_val else 'params'
        stats_key = 'best_stats' if has_val else 'batch_stats'
        final_params = jax.tree_util.tree_map(np.asarray, state[which])
        final_stats = jax.tree_util.tree_map(np.asarray, state[stats_key])
        self._params, self._stats = final_params, final_stats
        self.best_epoch = np.asarray(state['best_epoch'])[:real_m]
        self.stopped = np.asarray(state['stopped'])[:real_m]
        self.num_members = real_m

    def member(self, mi):
        """(params, batch_stats) numpy trees for member `mi`."""
        take = lambda t: jax.tree_util.tree_map(lambda x: x[mi], t)
        return take(self._params), take(self._stats)


_CHUNK_CACHE = {}


def _cached_chunk_fn(model, tx, batch_size, s_max, chunk_len,
                     n_val_chunks, has_val):
    """One compiled chunk program per (model config, sweep shape)."""
    key = (model, batch_size, s_max, chunk_len, n_val_chunks, has_val)
    if key in _CHUNK_CACHE:
        return _CHUNK_CACHE[key]

    def train_step_m(params, stats, opt, x, xlen, y, bvalid, lr, wd,
                     rng, step_i):
        """One member's train step — mirrors classifier._cached_train_step."""
        rng = jax.random.fold_in(rng, step_i)

        def loss_fn(p):
            out, mut = model.apply(
                {'params': p, 'batch_stats': stats},
                x, xlen, train=True, valid=bvalid,
                mutable=['batch_stats'], rngs={'dropout': rng})
            logp = jax.nn.log_softmax(out)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=1).squeeze(1)
            loss = jnp.sum(nll * bvalid) / jnp.maximum(jnp.sum(bvalid), 1)
            correct = jnp.sum((jnp.argmax(out, 1) == y) * bvalid)
            return loss, (mut['batch_stats'], correct)

        (loss, (new_stats, correct)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        opt.hyperparams['learning_rate'] = lr
        opt.hyperparams['weight_decay'] = wd
        updates, new_opt = tx.update(grads, opt, params)
        return (optax.apply_updates(params, updates),
                new_stats, new_opt, correct.astype(jnp.float32))

    def eval_member(params, stats, val_x, val_len, val_y, val_valid,
                    chunk_count, n_val, n_chunks):
        """Chunked val loss/acc — mirrors SeqModelTrainer._evaluate."""
        def chunk(c_x, c_len, c_y, c_valid, c_count):
            out = model.apply({'params': params, 'batch_stats': stats},
                              c_x, c_len, train=False)
            logp = jax.nn.log_softmax(out)
            nll = -jnp.take_along_axis(logp, c_y[:, None], 1).squeeze(1)
            loss = jnp.sum(nll * c_valid) / jnp.maximum(c_count, 1.)
            correct = jnp.sum((jnp.argmax(out, 1) == c_y) * c_valid)
            return loss, correct

        losses, corrects = jax.vmap(chunk)(
            val_x, val_len, val_y, val_valid, chunk_count)
        val_loss = jnp.sum(losses) / jnp.maximum(n_chunks, 1.)
        val_acc = jnp.sum(corrects) / jnp.maximum(n_val, 1.)
        return val_loss, val_acc

    @jax.jit
    def run_chunk(state, pool_x, pool_len, pool_y, idx, bvalid,
                  step_valid, lr, wd, step_i, epoch_ids, do_val, val_x,
                  val_len, val_y, val_valid, chunk_count, dropout_key,
                  n_m, min_epochs, early_term_acc, etvne, n_val,
                  n_chunks):

        def epoch_body(carry, xs):
            e_idx, e_bvalid, e_svalid, e_lr, e_wd, e_step_i, epoch, dv = xs

            def step_body(c, s_xs):
                s_idx, s_bvalid, s_svalid, s_lr, s_wd, s_step = s_xs
                params, stats, opt, correct_sum = c

                def member_step(p, st, o, m_idx, m_bvalid, m_lr, m_wd,
                                m_step):
                    x = jnp.take(pool_x, m_idx, axis=0)
                    xlen = jnp.take(pool_len, m_idx, axis=0)
                    y = jnp.take(pool_y, m_idx, axis=0)
                    return train_step_m(p, st, o, x, xlen, y,
                                        m_bvalid, m_lr, m_wd,
                                        dropout_key, m_step)

                new_p, new_st, new_o, correct = jax.vmap(member_step)(
                    params, stats, opt, s_idx, s_bvalid, s_lr, s_wd,
                    s_step)
                live = s_svalid & ~carry['stopped']
                params = _tree_where(live, new_p, params)
                stats = _tree_where(live, new_st, stats)
                opt = _tree_where(live, new_o, opt)
                correct_sum = correct_sum + jnp.where(live, correct, 0.)
                return (params, stats, opt, correct_sum), None

            (params, stats, opt, correct_sum), _ = jax.lax.scan(
                step_body,
                (carry['params'], carry['batch_stats'],
                 carry['opt_state'], jnp.zeros_like(n_m)),
                (e_idx, e_bvalid, e_svalid, e_lr, e_wd, e_step_i))
            carry = dict(carry, params=params, batch_stats=stats,
                         opt_state=opt)
            acc = correct_sum / n_m

            def with_val(carry):
                val_loss, val_acc = jax.vmap(
                    lambda p, st: eval_member(
                        p, st, val_x, val_len, val_y, val_valid,
                        chunk_count, n_val, n_chunks))(
                    carry['params'], carry['batch_stats'])
                err = 1. - val_acc
                improved = ((err < carry['best_err'])
                            | ((err == carry['best_err'])
                               & (val_loss <= carry['best_loss'])))
                update = improved & ~carry['stopped']
                best_params = _tree_where(
                    update, carry['params'], carry['best_params'])
                best_stats = _tree_where(
                    update, carry['batch_stats'], carry['best_stats'])
                # the stall check lives in the reference's `elif`: it
                # only fires on epochs where val did NOT improve
                stall = (~improved & (etvne > 0)
                         & (epoch - etvne > carry['best_epoch']))
                return dict(
                    carry,
                    best_params=best_params, best_stats=best_stats,
                    best_err=jnp.where(update, err, carry['best_err']),
                    best_loss=jnp.where(update, val_loss,
                                        carry['best_loss']),
                    best_epoch=jnp.where(update, epoch,
                                         carry['best_epoch']),
                    stopped=carry['stopped'] | stall)

            carry = jax.lax.cond(dv, with_val, lambda c: c, carry)
            # train-accuracy break (reference classifier.py:296-298),
            # checked every epoch after the val block
            acc_stop = (epoch >= min_epochs) & (acc > early_term_acc)
            carry = dict(carry, stopped=carry['stopped'] | acc_stop)
            return carry, None

        state, _ = jax.lax.scan(
            epoch_body, state,
            (idx, bvalid, step_valid, lr, wd, step_i, epoch_ids, do_val))
        return state

    _CHUNK_CACHE[key] = run_chunk
    return run_chunk
