"""Flax EfficientNet-b{0..7} student backbone.

Parity feature with reference `models/rgb.py:62-66`, which builds
`efficientnet_pytorch.EfficientNet.from_name('efficientnet-b{N}',
in_channels=..., num_classes=emb_dim)`. Standard MBConv+SE architecture
with width/depth compound scaling; NHWC, bf16-friendly (BN in f32 via
flax's dtype promotion), swish activations.
"""

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

# (width_mult, depth_mult, dropout)
ARCH_PARAMS = {
    'b0': (1.0, 1.0, 0.2), 'b1': (1.0, 1.1, 0.2), 'b2': (1.1, 1.2, 0.3),
    'b3': (1.2, 1.4, 0.3), 'b4': (1.4, 1.8, 0.4), 'b5': (1.6, 2.2, 0.4),
    'b6': (1.8, 2.6, 0.5), 'b7': (2.0, 3.1, 0.5),
}

# (kernel, repeats, in_filters, out_filters, expand, stride)
BASE_BLOCKS = [
    (3, 1, 32, 16, 1, 1),
    (3, 2, 16, 24, 6, 2),
    (5, 2, 24, 40, 6, 2),
    (3, 3, 40, 80, 6, 2),
    (5, 3, 80, 112, 6, 1),
    (5, 4, 112, 192, 6, 2),
    (3, 1, 192, 320, 6, 1),
]

SE_RATIO = 0.25


def round_filters(filters, width_mult, divisor=8):
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats, depth_mult):
    return int(math.ceil(depth_mult * repeats))


class MBConv(nn.Module):
    in_filters: int
    out_filters: int
    kernel: int
    stride: int
    expand: int
    dropout: float = 0.2  # drop-connect rate
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn():
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.99, epsilon=1e-3,
                                dtype=self.dtype)

        inputs = x
        mid = self.in_filters * self.expand
        if self.expand != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
            x = nn.swish(bn()(x))

        x = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                    feature_group_count=mid, padding='SAME',
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.swish(bn()(x))

        # squeeze-and-excitation
        se_dim = max(1, int(self.in_filters * SE_RATIO))
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.swish(nn.Conv(se_dim, (1, 1), dtype=self.dtype)(se))
        se = nn.sigmoid(nn.Conv(mid, (1, 1), dtype=self.dtype)(se))
        x = x * se

        x = nn.Conv(self.out_filters, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = bn()(x)

        if self.stride == 1 and self.in_filters == self.out_filters:
            # stochastic depth on the residual branch
            x = nn.Dropout(self.dropout, deterministic=not train,
                           broadcast_dims=(1, 2, 3))(x)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    variant: str  # 'b0'..'b7'
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, depth, dropout = ARCH_PARAMS[self.variant]

        def bn():
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.99, epsilon=1e-3,
                                dtype=self.dtype)

        x = nn.Conv(round_filters(32, width), (3, 3), strides=2,
                    padding='SAME', use_bias=False, dtype=self.dtype)(x)
        x = nn.swish(bn()(x))

        for kernel, repeats, fin, fout, expand, stride in BASE_BLOCKS:
            fin = round_filters(fin, width)
            fout = round_filters(fout, width)
            for i in range(round_repeats(repeats, depth)):
                x = MBConv(in_filters=fin if i == 0 else fout,
                           out_filters=fout, kernel=kernel,
                           stride=stride if i == 0 else 1,
                           expand=expand, dtype=self.dtype)(x, train=train)

        x = nn.Conv(round_filters(1280, width), (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.swish(bn()(x))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim,
                        dtype=jnp.float32)(x.astype(jnp.float32))


def build_effnet(model_arch, emb_dim, dtype=jnp.bfloat16):
    """'effnet0'.. or 'efficientnet-b0'.. -> EfficientNet module."""
    variant = 'b' + model_arch[-1]
    assert variant in ARCH_PARAMS, model_arch
    return EfficientNet(variant=variant, output_dim=emb_dim, dtype=dtype)
