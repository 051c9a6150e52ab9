"""Fully-connected model family: the VIPE* encoder and pose decoders.

Behavioral parity with reference `models/module.py:133-227`:

* `FCNet`      — plain MLP with ReLU/dropout (+ optional BatchNorm).
* `FCResNet`   — linear stem + stacked residual MLP blocks; the VIPE*
  encoder. Each block computes ``block(x) - x`` — the reference's (unusual)
  sign (`models/module.py:173-175`) is kept deliberately for parity.
* `FCPoseDecoder` / `FCResNetPoseDecoder` — shared trunk + one linear head
  per 3D mocap dataset. The TPU-first twist: instead of selecting a head by
  string at runtime (host control flow), all heads are evaluated as one
  batched einsum and rows are gathered by integer ``dataset_id``, so a
  single jitted train step serves every dataset in a fused batch.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FCNet(nn.Module):
    """MLP: in -> hidden[0] -> ... -> out with ReLU between layers.

    Dropout sits between hidden layers only (reference models/module.py:152).
    """
    hidden_dims: Sequence[int]
    output_dim: int
    dropout: float = 0.3
    batch_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = list(self.hidden_dims)
        if not dims:
            return nn.Dense(self.output_dim, dtype=self.dtype)(x)
        x = nn.Dense(dims[0], dtype=self.dtype)(x)
        for i in range(len(dims)):
            x = nn.relu(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype)(x)
            out_d = dims[i + 1] if i + 1 < len(dims) else self.output_dim
            x = nn.Dense(out_d, dtype=self.dtype)(x)
            if i + 1 < len(dims):
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class FcResidualBlock(nn.Module):
    """(Linear-BN-ReLU-Drop) x2, returning ``block(x) - x``.

    The subtraction (not addition) replicates reference
    `models/module.py:173-175` exactly; trained VIPE* weights depend on it.
    """
    hidden_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for _ in range(2):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h - x


class FCResNet(nn.Module):
    """Linear stem + ReLU + `num_blocks` residual MLP blocks (+ out linear).

    The VIPE* encoder (reference `models/module.py:178-190`); default shape
    (2 blocks, 1024 hidden) from `train_vipe_model.py:51`.
    """
    out_dim: int  # None => expose trunk features
    num_blocks: int
    hidden_dim: int
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        for _ in range(self.num_blocks):
            x = FcResidualBlock(self.hidden_dim, self.dropout,
                                dtype=self.dtype)(x, train=train)
        if self.out_dim is not None:
            x = nn.Dense(self.out_dim, dtype=self.dtype)(x)
        return x


class _MultiHead(nn.Module):
    """All per-dataset linear heads as one einsum + dataset_id gather.

    Heads output `max(target_dims)` features; each dataset reads only its
    own first `target_dims[i]` columns (the train step masks the rest).
    """
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, dataset_id):
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (self.num_heads, x.shape[-1], self.head_dim))
        bias = self.param(
            'bias', nn.initializers.zeros, (self.num_heads, self.head_dim))
        # (n, h) x (k, h, d) -> (n, k, d); gather each row's own head.
        all_heads = jnp.einsum(
            'nh,khd->nkd', x.astype(self.dtype), kernel.astype(self.dtype))
        all_heads = all_heads + bias.astype(self.dtype)[None]
        return jnp.take_along_axis(
            all_heads, dataset_id[:, None, None].astype(jnp.int32),
            axis=1).squeeze(1)


class FCPoseDecoder(nn.Module):
    """FCNet trunk -> ReLU -> per-dataset linear head (ref module.py:211-227).

    `target_dims` are the flattened 3D-feature sizes per dataset; heads are
    padded to the max and selected by `dataset_id`.
    """
    hidden_dims: Sequence[int]
    target_dims: Tuple[int, ...]
    dropout: float = 0.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, dataset_id, train: bool = False):
        assert len(self.hidden_dims) >= 2
        trunk = FCNet(self.hidden_dims[:-1], self.hidden_dims[-1],
                      dropout=self.dropout, dtype=self.dtype)
        x = nn.relu(trunk(emb, train=train))
        return _MultiHead(len(self.target_dims), max(self.target_dims),
                          dtype=self.dtype)(x, dataset_id)


class FCResNetPoseDecoder(nn.Module):
    """FCResNet trunk -> per-dataset head (ref module.py:193-208)."""
    num_blocks: int
    hidden_dim: int
    target_dims: Tuple[int, ...]
    dropout: float = 0.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, dataset_id, train: bool = False):
        trunk = FCResNet(None, self.num_blocks, self.hidden_dim,
                         dropout=self.dropout, dtype=self.dtype)
        x = trunk(emb, train=train)
        return _MultiHead(len(self.target_dims), max(self.target_dims),
                          dtype=self.dtype)(x, dataset_id)
