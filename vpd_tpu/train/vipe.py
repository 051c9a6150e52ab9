"""VIPE* teacher training: jitted contrastive + 3D-lifting step.

Loss parity with reference `models/keypoint.py:38-126`:
  * positive hinge:  sum ||e1 - e2||                       (target +1)
  * negative hinge:  sum relu(margin - ||e1 - e_neg||) * neg_valid
  * lifting MSE:     weight_3d * sum (decoder(e) - feats)^2 for both views
  * total loss / batch_n

TPU-first re-design: instead of N per-dataset DataLoaders zipped on host
(`models/util.py:26-47`), one fused fixed-shape batch carries rows from all
mocap families with an integer `dataset_id`; the decoder evaluates all
per-family heads in one einsum and the MSE is column-masked per family.
The encoder runs three passes (pose1/pose2/neg) so BatchNorm batch
statistics match the reference's three separate forward calls. Everything
runs under one `jax.jit` over a data-sharded batch, so batch reductions
(and therefore BN stats) are globally exact on a multi-chip mesh with no
explicit collectives.
"""

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax import linen as nn

HINGE_MARGIN = 1.0


class VIPEModel(nn.Module):
    """Encoder + (optional) multi-head 3D decoder as one flax module."""
    encoder: nn.Module
    decoder: Any = None  # None for pairwise-only configs

    def embed(self, pose, train=False):
        n = pose.shape[0]
        return self.encoder(pose.reshape(n, -1), train=train)

    def decode(self, emb, dataset_id, train=False):
        return self.decoder(emb, dataset_id, train=train)

    def __call__(self, batch, train=False):
        e1 = self.embed(batch['pose1'], train=train)
        e2 = self.embed(batch['pose2'], train=train)
        e_neg = self.embed(batch['pose_neg'], train=train)
        pred1 = pred2 = None
        if self.decoder is not None:
            pred1 = self.decode(e1, batch['dataset_id'], train=train)
            pred2 = self.decode(e2, batch['dataset_id'], train=train)
        return e1, e2, e_neg, pred1, pred2


class VIPETrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx):
        params = variables['params']
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get('batch_stats', {}),
                   opt_state=tx.init(params), tx=tx)


def create_state(model, sample_batch, learning_rate, seed=0,
                 weight_decay=0.01):
    variables = model.init(
        {'params': jax.random.key(seed)}, sample_batch, train=False)
    tx = optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    return VIPETrainState.create(variables, tx)


def _losses(model, params, batch_stats, batch, kp_mask, weight_3d, train,
            dropout_rng=None):
    variables = {'params': params, 'batch_stats': batch_stats}
    kwargs = {}
    if train:
        kwargs = {'mutable': ['batch_stats'],
                  'rngs': {'dropout': dropout_rng}}
    out = model.apply(variables, batch, train=train, **kwargs)
    (e1, e2, e_neg, pred1, pred2), mutated = (
        out if train else (out, {'batch_stats': batch_stats}))

    n = e1.shape[0]
    ds_id = batch['dataset_id']

    def safe_norm(x):  # grad-safe ||x||
        return jnp.sqrt(jnp.sum(jnp.square(x), axis=1) + 1e-12)

    pos = safe_norm(e1 - e2)
    neg = nn.relu(HINGE_MARGIN - safe_norm(e1 - e_neg))
    contra_rows = pos + neg * batch['neg_valid']

    mse_rows = jnp.zeros(n)
    if pred1 is not None:
        col_mask = kp_mask[ds_id] * batch['has_3d'][:, None]
        target = batch['kp_features']
        mse_rows = (
            jnp.sum(jnp.square(pred1 - target) * col_mask, axis=1)
            + jnp.sum(jnp.square(pred2 - target) * col_mask, axis=1))

    row_loss = contra_rows + weight_3d * mse_rows
    loss = jnp.sum(row_loss) / n

    num_ds = kp_mask.shape[0]
    seg = partial(jax.ops.segment_sum, num_segments=num_ds,
                  indices_are_sorted=False)
    metrics = {
        'loss_sum': jnp.sum(row_loss),
        'contra_sum': jnp.sum(contra_rows),
        'n': jnp.asarray(n, jnp.float32),
        'ds_loss_sum': seg(row_loss, ds_id),
        'ds_count': seg(jnp.ones(n), ds_id),
    }
    return loss, (metrics, mutated['batch_stats'])


def make_train_step(model, kp_mask, weight_3d=1.0):
    kp_mask = jnp.asarray(kp_mask)

    @jax.jit
    def train_step(state, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(
            lambda p: _losses(model, p, state.batch_stats, batch, kp_mask,
                              weight_3d, True, dropout_rng), has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(state.params)
        updates, new_opt = state.tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt), \
            metrics

    return train_step


def make_eval_step(model, kp_mask, weight_3d=1.0):
    kp_mask = jnp.asarray(kp_mask)

    @jax.jit
    def eval_step(state, batch):
        _, (metrics, _) = _losses(
            model, state.params, state.batch_stats, batch, kp_mask,
            weight_3d, False)
        return metrics

    return eval_step


def make_embed_fn(model):
    """Jitted inference: (n, K, 3) normalized poses -> (n, D) embeddings."""

    @jax.jit
    def embed(params, batch_stats, poses):
        return model.apply(
            {'params': params, 'batch_stats': batch_stats}, poses,
            train=False, method=VIPEModel.embed)

    return embed


def run_epoch(batcher, state, step_fn, num_batches, rng=None, train=True,
              sync=False):
    """Host loop over one virtual epoch; returns (state, epoch metrics).

    `sync=True` blocks on each step's metrics — required on multi-device
    CPU where overlapping sharded programs deadlock the in-process
    collective rendezvous (`core.mesh.step_sync_needed`)."""
    import numpy as np

    # Keep metrics on device until the epoch ends: per-step float()/
    # np.asarray would force a host sync per dispatch and serialize steps
    # that otherwise pipeline (27 ms each on relay-attached hosts).
    step_metrics = []
    for _ in range(num_batches):
        batch = batcher.next_batch()
        if train:
            state, metrics = step_fn(state, batch, rng)
        else:
            metrics = step_fn(state, batch)
        if sync:
            jax.block_until_ready(metrics['loss_sum'])
        step_metrics.append(metrics)

    from ..core.metrics import fetch_metrics

    step_metrics = fetch_metrics(step_metrics)  # ONE device readback
    total = {'loss_sum': 0., 'contra_sum': 0., 'n': 0.}
    ds_loss = None
    ds_count = None
    for metrics in step_metrics:
        for k in total:
            total[k] += float(metrics[k])
        ds_loss = (metrics['ds_loss_sum'] if ds_loss is None
                   else ds_loss + metrics['ds_loss_sum'])
        ds_count = (metrics['ds_count'] if ds_count is None
                    else ds_count + metrics['ds_count'])

    n = max(total['n'], 1)
    per_ds = {i: float(ds_loss[i] / max(ds_count[i], 1))
              for i in range(len(ds_loss))}
    return state, {
        'loss': total['loss_sum'] / n,
        'contra': total['contra_sum'] / n,
        'per_dataset': per_ds,
    }
