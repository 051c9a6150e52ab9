"""Flax ResNet backbone for the VPD student.

Parity with reference `models/module.py:17-130` (a torchvision-style ResNet
with configurable input channels and output embedding dim) re-designed for
TPU: NHWC layout (XLA:TPU's native conv layout), bfloat16 compute with
float32 params/batch-stats, and BatchNorm that can synchronize batch
statistics across a mesh axis (`axis_name='data'`) under shard_map — the
TPU equivalent of the single-GPU BatchNorm in the reference.

`expand_stem_to_channels` reproduces the reference's 5-channel first-conv
surgery (`models/rgb.py:8-37`): RGB kernels are mean-reduced over the input
channel axis and broadcast to the new channel count.
"""

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

KAIMING_OUT = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: Any = None
    dtype: jnp.dtype = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       kernel_init=KAIMING_OUT)
        identity = x
        out = conv(self.planes, (3, 3), strides=self.stride, padding=1)(x)
        out = self.norm()(out)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), padding=1)(out)
        # Last BN in the branch: scale init is zero when zero_init_residual.
        out = self.norm(name='bn_last')(out)
        if self.downsample:
            identity = conv(self.planes, (1, 1), strides=self.stride)(x)
            identity = self.norm()(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: Any = None
    base_width: int = 64
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       kernel_init=KAIMING_OUT)
        width = int(self.planes * (self.base_width / 64.)) * self.groups
        identity = x
        out = conv(width, (1, 1))(x)
        out = self.norm()(out)
        out = nn.relu(out)
        out = conv(width, (3, 3), strides=self.stride, padding=1,
                   feature_group_count=self.groups)(out)
        out = self.norm()(out)
        out = nn.relu(out)
        out = conv(self.planes * self.expansion, (1, 1))(out)
        out = self.norm(name='bn_last')(out)
        if self.downsample:
            identity = conv(self.planes * self.expansion, (1, 1),
                            strides=self.stride)(x)
            identity = self.norm()(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """NHWC ResNet: (N, H, W, C) -> (N, output_dim) embeddings."""
    layers: tuple
    block: Any  # BasicBlock | Bottleneck
    output_dim: int
    width_per_group: int = 64
    groups: int = 1
    zero_init_residual: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None  # e.g. 'data' for cross-replica sync

    @nn.compact
    def __call__(self, x, train: bool = False):
        last_scale = (nn.initializers.zeros if self.zero_init_residual
                      else nn.initializers.ones)

        def norm(name=None):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
                scale_init=last_scale if name == 'bn_last'
                else nn.initializers.ones,
                axis_name=self.bn_axis_name if train else None,
                name=name)

        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, kernel_init=KAIMING_OUT)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, num_blocks in enumerate(self.layers):
            planes = 64 * (2 ** stage)
            for i in range(num_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                needs_down = (i == 0 and (
                    stride != 1
                    or (stage == 0 and self.block.expansion != 1)))
                x = self.block(
                    planes=planes, stride=stride, downsample=needs_down,
                    norm=norm, dtype=self.dtype,
                    **({'base_width': self.width_per_group,
                        'groups': self.groups}
                       if self.block is Bottleneck else {}))(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        # the head always runs in >= f32 (bf16 models compute it in f32;
        # f64 models — e.g. the x64 reference-trajectory oracle — keep f64)
        head_dt = jnp.promote_types(self.dtype, jnp.float32)
        x = nn.Dense(self.output_dim, dtype=head_dt)(x.astype(head_dt))
        return x


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: tuple
    block: Any
    width_per_group: int = 64


# Reference registry `models/module.py:17-32`.
ENCODER_ARCH = {
    'resnet18': ResNetConfig((2, 2, 2, 2), BasicBlock),
    'resnet34': ResNetConfig((3, 4, 6, 3), BasicBlock),
    'resnet50': ResNetConfig((3, 4, 6, 3), Bottleneck),
    'resnet101': ResNetConfig((3, 4, 23, 3), Bottleneck),
    'wide_resnet50_2': ResNetConfig((3, 4, 6, 3), Bottleneck,
                                    width_per_group=128),
    'wide_resnet101_2': ResNetConfig((3, 4, 23, 3), Bottleneck,
                                     width_per_group=128),
}


def build_encoder(arch, emb_dim, dtype=jnp.bfloat16, bn_axis_name=None,
                  zero_init_residual=False):
    """Build the VPD student backbone by registry name."""
    cfg = ENCODER_ARCH[arch]
    return ResNet(layers=cfg.layers, block=cfg.block, output_dim=emb_dim,
                  width_per_group=cfg.width_per_group, dtype=dtype,
                  bn_axis_name=bn_axis_name,
                  zero_init_residual=zero_init_residual)


def expand_stem_to_channels(variables, num_channels):
    """Rebuild the first conv for `num_channels` inputs by mean-expanding.

    TPU-native equivalent of reference `add_flow_to_model`
    (`models/rgb.py:8-37`): kernel (7, 7, C_in, 64) -> mean over C_in ->
    broadcast to (7, 7, num_channels, 64). Works on an NHWC variables
    pytree; returns a new pytree.
    """
    def fix(path, leaf):
        names = [getattr(p, 'key', None) for p in path]
        # Only the top-level stem conv, not the blocks' nested Conv_0s.
        if names == ['params', 'Conv_0', 'kernel'] and leaf.ndim == 4:
            mean = leaf.mean(axis=2, keepdims=True)
            return jnp.broadcast_to(
                mean, mean.shape[:2] + (num_channels,) + mean.shape[3:])
        return leaf

    return jax.tree_util.tree_map_with_path(fix, variables)
