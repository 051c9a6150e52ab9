"""VPD student training: fused augmentation + distillation MSE step.

Parity with reference `train_vpd_model.py:53-112`: ResNet student embeds a
(possibly RGB+flow) crop; loss is sum-reduction MSE against the teacher
embedding (optionally passed through the `fcn_time` motion head mapping
emb -> 2*emb, `--motion`); AdamW; moving-average-val best checkpoints.

TPU-first: the uint8 batch is transferred once; color jitter, mask noise,
flip (+x-flow negation), random resized crop, normalization, the bf16
ResNet forward/backward and the AdamW update are ONE jitted program, so
augmentation rides the same HBM residency as the model step. Under a data
mesh the batch is sharded on dim 0; jit makes BatchNorm statistics global.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from ..data.augment import eval_transform_batch, train_augment_batch
from ..models.fc import FCNet


class MotionHead(nn.Module):
    """FCNet(emb -> [128,128] -> 2*emb) (`train_vpd_model.py:62-65`)."""
    emb_dim: int
    dtype: jnp.dtype = jnp.float32  # head stays f32 under bf16 encoders

    @nn.compact
    def __call__(self, x, train: bool = False):
        return FCNet((128, 128), 2 * self.emb_dim, dropout=0.,
                     dtype=self.dtype)(x, train=train)


class VPDTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


class VPDStudent(nn.Module):
    encoder: nn.Module
    motion: Optional[MotionHead] = None

    def __call__(self, x, train: bool = False):
        emb = self.encoder(x, train=train)
        if self.motion is not None:
            emb = self.motion(emb, train=train)
        return emb


def create_state(model, sample_img, learning_rate, seed=0,
                 weight_decay=0.01):
    variables = model.init(jax.random.key(seed), sample_img, train=False)
    tx = optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    return VPDTrainState(
        step=jnp.zeros((), jnp.int32), params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(variables['params']), tx=tx)


def apply_train_update(model, state, imgs, emb, drop_rng):
    """fwd/bwd/AdamW on an already-augmented float image batch.

    The differentiated objective is the UN-normalized sum-reduction MSE:
    the reference backprops the raw sum (`train_vpd_model.py:87-91` ->
    `models/util.py:50-53` — no mean before `.backward()`, unlike the
    VIPE trainer which divides by batch_n first, `models/keypoint.py:112-116`).
    Under AdamW the gradient scale cancels except through eps, but
    matching it exactly keeps update trajectories comparable with the
    reference head-to-head (tests/test_reference_oracle.py).
    """
    def loss_fn(params):
        out, mutated = model.apply(
            {'params': params, 'batch_stats': state.batch_stats},
            imgs, train=True, mutable=['batch_stats'],
            rngs={'dropout': drop_rng})
        # sum-reduction MSE (reference train_vpd_model.py:87)
        loss_sum = jnp.sum(jnp.square(out - emb))
        return loss_sum, mutated

    (loss_sum, mutated), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(
        grads, state.opt_state, state.params)
    new_state = state.replace(
        step=state.step + 1,
        params=optax.apply_updates(state.params, updates),
        batch_stats=mutated['batch_stats'], opt_state=new_opt)
    return new_state, {'emb_loss_sum': loss_sum,
                       'n': jnp.float32(emb.shape[0])}


def _fused_step_body(model, mean, std, img_dim, use_flow, use_mask,
                     aug_dtype, state, rgb, flow, mask, emb, flip, rng,
                     jitter_order='batch'):
    """Augment -> fwd/bwd -> AdamW on explicit pixel/target operands
    (shared by the host-streamed and HBM-cache-gathered steps)."""
    aug_rng = jax.random.fold_in(rng, state.step)
    imgs, _ = train_augment_batch(
        aug_rng, rgb, mean, std,
        flow_u8=flow if use_flow else None,
        mask_u8=mask if use_mask else None,
        flip=flip, out_size=img_dim, dtype=aug_dtype,
        jitter_order=jitter_order)
    return apply_train_update(model, state, imgs, emb,
                              jax.random.fold_in(aug_rng, 1))


def make_train_step(model, mean, std, img_dim=128, use_flow=False,
                    use_mask=True, donate=True, aug_dtype=None,
                    jitter_order='batch'):
    """One fused program: augment uint8 batch -> student fwd/bwd -> AdamW.

    `aug_dtype=bfloat16` runs the augmentation block in bf16 (see
    `train_augment_batch`); float32 is the full-precision default. (Note
    the round-3 jitter rework randomized the color-op order per batch,
    so same-seed pixel streams differ from rounds 1-2 at any dtype.)
    `jitter_order='per_sample'` opts into torchvision-exact per-image
    color-op ordering (QUIRKS.md).
    """
    aug_dtype = aug_dtype if aug_dtype is not None else jnp.float32

    def step(state, batch, rng):
        return _fused_step_body(
            model, mean, std, img_dim, use_flow, use_mask, aug_dtype,
            state, batch['rgb'], batch.get('flow'), batch.get('mask'),
            batch['emb'], batch['flip'], rng, jitter_order)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _cache_gather(cache, idx, mesh, rows_per_device):
    """Gather pixel rows from the HBM cache by global row index.

    Replicated cache (mesh/rows_per_device None): a plain local gather —
    each device indexes its own full copy with its index sub-batch.
    Row-sharded cache: a shard_map local gather — device d holds cache
    rows [d*per, (d+1)*per) and its index block references only those
    (CacheIndexSource homes each batch block), so the gather is
    `rows[idx - d*per]` per device, no collectives on the pixel bytes.
    """
    if rows_per_device is None:
        return {k: v[idx] for k, v in cache.items()}
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..core.mesh import DATA_AXIS

    names = sorted(cache)

    def body(idx_l, *streams):
        local = idx_l - jax.lax.axis_index(DATA_AXIS) * rows_per_device
        return tuple(s[local] for s in streams)

    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(DATA_AXIS),) * (1 + len(names)),
        out_specs=(P(DATA_AXIS),) * len(names))(
            idx, *[cache[k] for k in names])
    return dict(zip(names, out))


def make_cached_train_step(model, mean, std, img_dim=128, use_flow=False,
                           use_mask=True, donate=True, aug_dtype=None,
                           mesh=None, rows_per_device=None,
                           jitter_order='batch'):
    """Train step over an HBM-resident crop cache (`data/hbm_cache.py`).

    The batch carries only row indices + targets (~KB); pixels are
    gathered from `cache` arrays already staged in device memory, so the
    per-step host->device transfer shrinks from ~MBs of uint8 images to
    the index vector — training throughput then tracks the compute roof
    even on upload-constrained links. No reference counterpart (the
    reference re-decodes PNGs on CPU workers every epoch,
    `train_vpd_model.py:205`). `mesh`/`rows_per_device` select the
    row-sharded gather (see `_cache_gather`).
    """
    aug_dtype = aug_dtype if aug_dtype is not None else jnp.float32

    def step(state, batch, rng, cache):
        used = {k: v for k, v in cache.items()
                if k == 'rgb' or (k == 'flow' and use_flow)
                or (k == 'mask' and use_mask)}
        g = _cache_gather(used, batch['idx'], mesh, rows_per_device)
        return _fused_step_body(
            model, mean, std, img_dim, use_flow, use_mask, aug_dtype,
            state, g['rgb'], g.get('flow'), g.get('mask'),
            batch['emb'], batch['flip'], rng, jitter_order)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mean, std, use_flow=False):
    @jax.jit
    def step(state, batch):
        imgs = eval_transform_batch(
            batch['rgb'], mean, std,
            flow_u8=batch.get('flow') if use_flow else None)
        out = model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            imgs, train=False)
        loss_sum = jnp.sum(jnp.square(out - batch['emb']))
        return {'emb_loss_sum': loss_sum,
                'n': jnp.float32(out.shape[0])}

    return step


def make_cached_eval_step(model, mean, std, use_flow=False, mesh=None,
                          rows_per_device=None):
    """Deterministic eval over the HBM crop cache (index batches)."""

    @jax.jit
    def step(state, batch, cache):
        used = {k: v for k, v in cache.items()
                if k == 'rgb' or (k == 'flow' and use_flow)}
        g = _cache_gather(used, batch['idx'], mesh, rows_per_device)
        imgs = eval_transform_batch(g['rgb'], mean, std,
                                    flow_u8=g.get('flow'))
        out = model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            imgs, train=False)
        loss_sum = jnp.sum(jnp.square(out - batch['emb']))
        return {'emb_loss_sum': loss_sum,
                'n': jnp.float32(out.shape[0])}

    return step


def make_aug_eval_step(model, mean, std, img_dim=128, use_flow=False,
                       use_mask=True, aug_dtype=None,
                       jitter_order='batch'):
    """Validation step WITH train-time augmentation (reference parity:
    the reference builds its val datasets with augment=True,
    `vpd_dataset/single_frame.py:354` + `vpd_dataset/common.py:83-108`,
    so val batches get jitter/crop/flip). Model stays in eval mode.
    Off by default — see QUIRKS.md "Deviations"; enable with the
    `augment_val` config flag / `--augment_val`. `aug_dtype` and
    `jitter_order` must match the train step's so val loss is computed
    under the same augmentation distribution."""
    aug_dtype = aug_dtype if aug_dtype is not None else jnp.float32

    def step(state, batch, rng, step_idx):
        aug_rng = jax.random.fold_in(rng, step_idx)
        imgs, _ = train_augment_batch(
            aug_rng, batch['rgb'], mean, std,
            flow_u8=batch.get('flow') if use_flow else None,
            mask_u8=batch.get('mask') if use_mask else None,
            flip=batch['flip'], out_size=img_dim, dtype=aug_dtype,
            jitter_order=jitter_order)
        out = model.apply(
            {'params': state.params, 'batch_stats': state.batch_stats},
            imgs, train=False)
        loss_sum = jnp.sum(jnp.square(out - batch['emb']))
        return {'emb_loss_sum': loss_sum,
                'n': jnp.float32(out.shape[0])}

    return jax.jit(step)


def make_embed_fn(model):
    """Deterministic embed of preprocessed (B, S, S, C) float images."""

    @jax.jit
    def embed(params, batch_stats, imgs):
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           imgs, train=False)

    return embed
