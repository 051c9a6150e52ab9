"""Recurrent/conv sequence heads for downstream action recognition.

Parity with reference `util/classifier.py:29-134` re-designed for TPU:
torch packed sequences become padded batches + `seq_lengths`-aware
`flax.linen.RNN` (lax.scan under jit; static shapes). Deliberate parity
quirks, kept because trained heads depend on them:

* attention pooling is *unmasked* over padded steps (the reference pads
  outputs with 0 before softmax, `util/classifier.py:84-97`), so padded
  positions contribute exp(0) weight with zero vectors;
* max pooling masks padded steps with -inf (reference padding_value).

`MaskedBatchNorm` replaces `util/torch/batchnorm1d.py`: batch statistics
are computed over valid timesteps only.
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def length_mask(lengths, max_len):
    """(B,) lengths -> (B, T) bool validity mask."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


class TorchGRUCell(nn.RNNCellBase):
    """GRU cell with torch's DOUBLE-bias parameterization.

    torch `nn.GRU` carries b_ih AND b_hh per gate (cuDNN layout); both
    receive identical gradients, so under Adam-family optimizers the
    summed bias moves with TWICE the adaptive step of a single folded
    bias. flax's `nn.GRUCell` folds them (identical forward, halved
    effective bias step), which diverges from reference training
    dynamics (`util/classifier.py:204` AdamW) — proven by the classifier
    trajectory oracle. Forward math and initializers match
    `flax.linen.GRUCell` exactly; the only change is a zero-init bias on
    the hr/hz recurrent projections.
    """
    features: int
    param_dtype: 'jnp.dtype' = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        dense_i = lambda name: nn.Dense(
            self.features, use_bias=True, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.lecun_normal(), name=name)
        dense_h = lambda name: nn.Dense(
            self.features, use_bias=True, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.orthogonal(), name=name)
        r = nn.sigmoid(dense_i('ir')(x) + dense_h('hr')(h))
        z = nn.sigmoid(dense_i('iz')(x) + dense_h('hz')(h))
        n = nn.tanh(dense_i('in')(x) + r * dense_h('hn')(h))
        new_h = (1. - z) * n + z * h
        return new_h, new_h

    @nn.nowrap
    def initialize_carry(self, rng, input_shape):
        return jnp.zeros(input_shape[:-1] + (self.features,),
                         self.param_dtype)

    @property
    def num_feature_axes(self):
        return 1


class TorchLSTMCell(nn.RNNCellBase):
    """LSTM cell with torch's double-bias parameterization (see
    TorchGRUCell). Gate math and initializers match
    `flax.linen.OptimizedLSTMCell`; both the input and recurrent
    projections carry biases, as torch `nn.LSTM` does.
    """
    features: int
    param_dtype: 'jnp.dtype' = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        dense_i = lambda name: nn.Dense(
            self.features, use_bias=True, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.lecun_normal(), name=name)
        dense_h = lambda name: nn.Dense(
            self.features, use_bias=True, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.orthogonal(), name=name)
        i = nn.sigmoid(dense_i('ii')(x) + dense_h('hi')(h))
        f = nn.sigmoid(dense_i('if')(x) + dense_h('hf')(h))
        g = nn.tanh(dense_i('ig')(x) + dense_h('hg')(h))
        o = nn.sigmoid(dense_i('io')(x) + dense_h('ho')(h))
        new_c = f * c + i * g
        new_h = o * nn.tanh(new_c)
        return (new_c, new_h), new_h

    @nn.nowrap
    def initialize_carry(self, rng, input_shape):
        shape = input_shape[:-1] + (self.features,)
        return (jnp.zeros(shape, self.param_dtype),
                jnp.zeros(shape, self.param_dtype))

    @property
    def num_feature_axes(self):
        return 1


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over (B, T, D) inputs counting only valid timesteps.

    Parity with `util/torch/batchnorm1d.py:29-93` (masked mean/var, running
    stats updated with masked statistics).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, lengths, train: bool = False, valid=None):
        d = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros(d))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones(d))
        scale = self.param('scale', nn.initializers.ones, (d,))
        bias = self.param('bias', nn.initializers.zeros, (d,))

        if train:
            mask = length_mask(lengths, x.shape[1])
            if valid is not None:
                # rows padded onto a partial batch (duplicates of row 0,
                # train/classifier.py) must not count toward batch stats
                # — the reference sees the true-sized batch
                mask = mask & valid[:, None]
            mask = mask[..., None]
            n = jnp.sum(mask)
            nc = jnp.maximum(n, 1)
            bmean = jnp.sum(x * mask, axis=(0, 1)) / nc
            bvar = jnp.sum(jnp.square(x - bmean) * mask, axis=(0, 1)) / nc
            # batchnorm1d.py:73-87 semantics: batch stats apply (and the
            # running stats update) only when n > 1; normalization uses the
            # biased variance while running stats take the UNBIASED one.
            use_batch = n > 1
            old_mean, old_var = ra_mean.value, ra_var.value
            unbiased = bvar * (n / jnp.maximum(n - 1, 1))
            ra_mean.value = jnp.where(
                use_batch,
                self.momentum * old_mean + (1 - self.momentum) * bmean,
                old_mean)
            ra_var.value = jnp.where(
                use_batch,
                self.momentum * old_var + (1 - self.momentum) * unbiased,
                old_var)
            mean = jnp.where(use_batch, bmean, old_mean)
            var = jnp.where(use_batch, bvar, old_var)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


class TorchBatchNorm(nn.Module):
    """BatchNorm over (B, D) with torch running-stat semantics.

    flax's `nn.BatchNorm` stores the *biased* batch variance in its running
    stats; `torch.nn.BatchNorm1d` — what the reference head uses
    (`util/classifier.py:61-65`) — stores the unbiased one (factor
    n/(n-1)). Eval-mode numerics of trained heads depend on it at the
    small batch sizes few-shot sweeps run with.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False, valid=None):
        d = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros(d))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones(d))
        scale = self.param('scale', nn.initializers.ones, (d,))
        bias = self.param('bias', nn.initializers.zeros, (d,))
        if train:
            if valid is None:
                n = x.shape[0]
                unbias = n / max(n - 1, 1)
                mean = jnp.mean(x, axis=0)
                var = jnp.mean(jnp.square(x - mean), axis=0)
            else:
                # partial batches are padded to a fixed size with
                # duplicate rows (static shapes); stats must cover only
                # the real rows, like torch seeing the true-sized batch
                w = valid.astype(x.dtype)[:, None]
                n = jnp.sum(w)
                unbias = n / jnp.maximum(n - 1, 1)
                mean = jnp.sum(x * w, axis=0) / n
                var = jnp.sum(jnp.square(x - mean) * w, axis=0) / n
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var * unbias)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


class BiRNN(nn.Module):
    """Multi-layer bidirectional GRU/LSTM over padded sequences.

    Returns (outputs (B, T, 2H) zeroed at padding, last_state
    (2 * depth, B, H)) matching torch's (h_n layout: layer-major,
    direction-minor)."""
    cell_type: str
    hidden_dim: int
    depth: int = 2

    @nn.compact
    def __call__(self, x, lengths):
        def make_cell():
            # param_dtype also sets the scan-carry dtype: follow the
            # input so f64 runs (x64 reference oracles) keep a matching
            # carry; f32 inputs behave exactly as before
            if self.cell_type == 'gru':
                return TorchGRUCell(self.hidden_dim, param_dtype=x.dtype)
            elif self.cell_type == 'lstm':
                return TorchLSTMCell(self.hidden_dim,
                                     param_dtype=x.dtype)
            raise NotImplementedError(self.cell_type)

        last_states = []
        for _ in range(self.depth):
            fwd = nn.RNN(make_cell(), return_carry=True)
            bwd = nn.RNN(make_cell(), return_carry=True, reverse=True,
                         keep_order=True)
            carry_f, out_f = fwd(x, seq_lengths=lengths)
            carry_b, out_b = bwd(x, seq_lengths=lengths)
            x = jnp.concatenate([out_f, out_b], axis=-1)
            for c in (carry_f, carry_b):
                # LSTM carry is (c, h); torch h_n uses the hidden state
                last_states.append(c[1] if isinstance(c, tuple) else c)

        mask = length_mask(lengths, x.shape[1])[..., None]
        outputs = x * mask
        last_state = jnp.stack(last_states)  # (2*depth, B, H)
        return outputs, last_state


class SeqClassifier(nn.Module):
    """BiRNN + (attention | max) pooling + BN/dropout FC head.

    Parity with `_ABCSeqModel.Seq` (`util/classifier.py:29-101`).
    """
    cell_type: str
    hidden_dim: int
    num_classes: int
    depth: int = 2
    dropout: float = 0.5
    input_dropout: float = 0.2
    input_batchnorm: bool = False
    use_attention: bool = True

    @nn.compact
    def __call__(self, x, lengths, train: bool = False, valid=None):
        x = nn.Dropout(self.input_dropout, deterministic=not train)(x)
        if self.input_batchnorm:
            x = MaskedBatchNorm()(x, lengths, train=train, valid=valid)

        outputs, last_state = BiRNN(
            self.cell_type, self.hidden_dim, self.depth)(x, lengths)

        hidden2 = 2 * self.hidden_dim
        if self.use_attention:
            n = last_state.shape[1]
            flat = jnp.transpose(last_state, (1, 0, 2)).reshape(n, -1)
            attn_vec = nn.relu(nn.Dense(hidden2)(flat))  # (B, 2H)
            logits = jnp.einsum('bth,bh->bt', outputs, attn_vec)
            # parity: softmax over ALL steps incl. padding (outputs are 0
            # there, so logits are exactly 0 for padded positions)
            attn = nn.softmax(logits, axis=1)
            pooled = jnp.einsum('bth,bt->bh', outputs, attn)
        else:
            mask = length_mask(lengths, outputs.shape[1])[..., None]
            neg_inf = jnp.full_like(outputs, -jnp.inf)
            pooled = jnp.max(jnp.where(mask, outputs, neg_inf), axis=1)

        # explicit names keep the param/batch_stats tree compatible with
        # heads saved before nn.BatchNorm was replaced by TorchBatchNorm
        pooled = TorchBatchNorm(name='BatchNorm_0')(
            pooled, train=train, valid=valid)
        pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        pooled = nn.Dense(hidden2)(pooled)
        pooled = nn.relu(pooled)
        pooled = TorchBatchNorm(name='BatchNorm_1')(
            pooled, train=train, valid=valid)
        pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        return nn.Dense(self.num_classes)(pooled)


class CNNClassifier(nn.Module):
    """Multi-kernel 1D-conv text-CNN head (`util/classifier.py:103-134`)."""
    hidden_dim: int
    num_classes: int
    kernel_sizes: Sequence[int] = (3, 5, 7)
    depth: int = 1
    dropout: float = 0.5
    input_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, lengths, train: bool = False, valid=None):
        assert self.depth <= 2  # valid: unused (no batch-stat layers)
        x = nn.Dropout(self.input_dropout, deterministic=not train)(x)

        feats = []
        for k in self.kernel_sizes:
            h = nn.relu(nn.Conv(self.hidden_dim, (k,), padding='VALID')(x))
            if self.depth > 1:
                h = nn.relu(nn.Conv(self.hidden_dim, (7,),
                                    strides=(k // 2,), padding='VALID')(h))
            # max over time; conservatively mask nothing (reference CNN
            # also pools over zero-padded steps)
            feats.append(jnp.max(h, axis=1))
        x = jnp.concatenate(feats, axis=1)

        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)
