"""TPU-native RAFT optical flow (Teed & Deng, ECCV 2020) in Flax.

The reference computes flow with an *external* CUDA RAFT checkout driven
by `raft/flow.py` (`model(image1, image2, iters=20, test_mode=True)` on
0-255 RGB, `raft/flow.py:109-112`) and ships only the quantized-PNG
writer. This module is a from-scratch NHWC re-implementation of the
"basic" RAFT so flow can be produced on TPU:

* the all-pairs correlation volume is one MXU matmul
  (`einsum(bxyc,buvc)`), with a 4-level average-pooled pyramid;
* correlation lookup is a radius-4 bilinear gather per level;
* the recurrent update (motion encoder -> separable ConvGRU -> flow head
  + convex-upsampling mask) runs as a statically-unrolled refinement loop
  under one jit.

Checkpoints trained with the official repo (e.g. raft-things.pth) import
via `import_torch_raft`; the DataParallel 'module.' prefix the reference
keeps for key compat (`raft/flow.py:102-105`) is stripped automatically.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def _instance_norm(x, eps=1e-5):
    """Affine-free per-sample, per-channel norm (InstanceNorm2d defaults)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str  # 'instance' | 'batch' | 'none'
    stride: int = 1
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        def norm(name):
            if self.norm_fn == 'batch':
                bn = nn.BatchNorm(use_running_average=not train,
                                  momentum=0.9, epsilon=1e-5, name=name)
                return bn
            if self.norm_fn == 'instance':
                return _instance_norm
            return lambda v: v

        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name='conv1')(x)
        y = nn.relu(norm('norm1')(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name='conv2')(y)
        y = nn.relu(norm('norm2')(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        padding=0, dtype=self.dtype,
                        name='downsample_conv')(x)
            x = norm('norm3')(x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    planes: int
    norm_fn: str  # 'instance' | 'none' (small models don't use batch)
    stride: int = 1
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        norm = (_instance_norm if self.norm_fn == 'instance'
                else (lambda v: v))
        q = self.planes // 4
        y = nn.relu(norm(nn.Conv(q, (1, 1), padding=0, dtype=self.dtype,
                                 name='conv1')(x)))
        y = nn.relu(norm(nn.Conv(q, (3, 3), strides=self.stride, padding=1,
                                 dtype=self.dtype, name='conv2')(y)))
        y = nn.relu(norm(nn.Conv(self.planes, (1, 1), padding=0,
                                 dtype=self.dtype, name='conv3')(y)))
        if self.stride != 1:
            x = norm(nn.Conv(self.planes, (1, 1), strides=self.stride,
                             padding=0, dtype=self.dtype,
                             name='downsample_conv')(x))
        return nn.relu(x + y)


class SmallEncoder(nn.Module):
    """raft-small fnet/cnet: 7x7/2 stem + 3 bottleneck stages (1/8)."""
    output_dim: int = 128
    norm_fn: str = 'instance'
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(32, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name='conv1')(x)
        if self.norm_fn == 'instance':
            x = _instance_norm(x)
        x = nn.relu(x)
        for li, (planes, stride) in enumerate(
                [(32, 1), (64, 2), (96, 2)], start=1):
            for bi in range(2):
                x = BottleneckBlock(
                    planes, self.norm_fn, stride=stride if bi == 0 else 1,
                    dtype=self.dtype,
                    name='layer{}_{}'.format(li, bi))(x, train=train)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name='conv2')(x)


class BasicEncoder(nn.Module):
    """fnet/cnet trunk: 7x7/2 stem + 3 residual stages -> 1x1 head (1/8)."""
    output_dim: int = 256
    norm_fn: str = 'instance'
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name='conv1')(x)
        if self.norm_fn == 'batch':
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name='norm1')(x)
        elif self.norm_fn == 'instance':
            x = _instance_norm(x)
        x = nn.relu(x)
        for li, (planes, stride) in enumerate(
                [(64, 1), (96, 2), (128, 2)], start=1):
            for bi in range(2):
                x = ResidualBlock(
                    planes, self.norm_fn, stride=stride if bi == 0 else 1,
                    dtype=self.dtype,
                    name='layer{}_{}'.format(li, bi))(x, train=train)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name='conv2')(x)


def coords_grid(batch, ht, wd):
    """(B, H, W, 2) pixel coordinates, channels (x, y)."""
    y, x = jnp.meshgrid(jnp.arange(ht), jnp.arange(wd), indexing='ij')
    grid = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


def _bilinear_sample(img, coords):
    """Zero-padded bilinear sample. img (h, w); coords (..., 2) as (x, y).

    Equivalent to grid_sample(align_corners=True, padding_mode='zeros')
    after the official pixel->[-1,1] rescale.
    """
    h, w = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    out = 0.
    for dy, sy in ((0, 1. - wy), (1, wy)):
        yi = y0 + dy
        iy = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vy = jnp.where((yi >= 0) & (yi <= h - 1), sy, 0.)
        for dx, sx in ((0, 1. - wx), (1, wx)):
            xi = x0 + dx
            ix = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            vx = jnp.where((xi >= 0) & (xi <= w - 1), sx, 0.)
            out = out + img[iy, ix] * vy * vx
    return out


def corr_pyramid(fmap1, fmap2, num_levels=4):
    """All-pairs correlation + pooled pyramid.

    fmap1/fmap2 (B, H, W, C) -> [num_levels x (B*H*W, H/2^l, W/2^l)].
    """
    b, h, w, c = fmap1.shape
    corr = jnp.einsum('bxyc,buvc->bxyuv', fmap1, fmap2,
                      preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(c, jnp.float32))
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr[..., 0]]
    for _ in range(num_levels - 1):
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
        pyramid.append(corr[..., 0])
    return pyramid


def _tap_weights(centers, d, size):
    """(N,) centers + (K,) offsets -> (N, K, size) bilinear hat weights.

    The hat function max(0, 1 - |pos - u|) over integer source positions
    u reproduces grid_sample(align_corners=True, padding_mode='zeros')
    exactly: out-of-range taps fade to zero contribution.
    """
    pos = centers[:, None, None] + d[None, :, None]
    idx = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    return jnp.maximum(0., 1. - jnp.abs(pos - idx))


def corr_lookup(pyramid, coords, radius=4):
    """Sample (2r+1)^2 neighborhoods around coords at every pyramid level.

    coords (B, H, W, 2) at 1/8 resolution -> (B, H, W, levels*(2r+1)^2).

    TPU-first: instead of per-tap bilinear gathers (scalar-gather bound),
    the separable bilinear weights become two small batched matmuls per
    level — x-interp then y-interp — which XLA maps onto the MXU.

    Tap layout matches the official checkpoint quirk: meshgrid(dy, dx)
    added to (x, y) centroids means the x-offset varies along the FIRST
    tap axis, so the flattened tap index k = i*(2r+1)+j is
    x-offset-major (convc1 weights are per-tap and depend on this).
    """
    b, h, w, _ = coords.shape
    flat = coords.reshape(b * h * w, 2)
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    out = []
    for lvl, corr in enumerate(pyramid):
        hl, wl = corr.shape[1], corr.shape[2]
        wx = _tap_weights(flat[:, 0] / (2. ** lvl), d, wl)  # (N, K, wl)
        wy = _tap_weights(flat[:, 1] / (2. ** lvl), d, hl)  # (N, K, hl)
        tmp = jnp.einsum('nvu,niu->nvi', corr, wx)
        vals = jnp.einsum('nvi,njv->nij', tmp, wy)  # (N, K, K) x-major
        out.append(vals.reshape(b, h, w, -1))
    return jnp.concatenate(out, axis=-1)


class MotionEncoder(nn.Module):
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        dt = self.dtype
        c = nn.relu(nn.Conv(256, (1, 1), dtype=dt, name='convc1')(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=dt,
                            name='convc2')(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=dt,
                            name='convf1')(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=dt,
                            name='convf2')(f))
        out = nn.relu(nn.Conv(126, (3, 3), padding=1, dtype=dt,
                              name='conv')(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        for suffix, ksize, pad in (('1', (1, 5), ((0, 0), (2, 2))),
                                   ('2', (5, 1), ((2, 2), (0, 0)))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                   dtype=self.dtype,
                                   name='convz' + suffix)(hx))
            r = nn.sigmoid(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                   dtype=self.dtype,
                                   name='convr' + suffix)(hx))
            q = jnp.tanh(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                 dtype=self.dtype,
                                 name='convq' + suffix)(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class SmallMotionEncoder(nn.Module):
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        dt = self.dtype
        c = nn.relu(nn.Conv(96, (1, 1), padding=0, dtype=dt,
                            name='convc1')(corr))
        f = nn.relu(nn.Conv(64, (7, 7), padding=3, dtype=dt,
                            name='convf1')(flow))
        f = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=dt,
                            name='convf2')(f))
        out = nn.relu(nn.Conv(80, (3, 3), padding=1, dtype=dt,
                              name='conv')(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class ConvGRU(nn.Module):
    hidden_dim: int = 96
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                               dtype=self.dtype, name='convz')(hx))
        r = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                               dtype=self.dtype, name='convr')(hx))
        q = jnp.tanh(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                             dtype=self.dtype, name='convq')(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SmallUpdateBlock(nn.Module):
    hidden_dim: int = 96
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        dt = self.dtype
        motion = SmallMotionEncoder(dtype=dt, name='encoder')(flow, corr)
        net = ConvGRU(self.hidden_dim, dtype=dt, name='gru')(
            net, jnp.concatenate([inp, motion], axis=-1))
        d = nn.relu(nn.Conv(128, (3, 3), padding=1, dtype=dt,
                            name='flow_head_conv1')(net))
        delta = nn.Conv(2, (3, 3), padding=1, dtype=dt,
                        name='flow_head_conv2')(d)
        return net, None, delta.astype(jnp.float32)


class BasicUpdateBlock(nn.Module):
    hidden_dim: int = 128
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        dt = self.dtype
        motion = MotionEncoder(dtype=dt, name='encoder')(flow, corr)
        net = SepConvGRU(self.hidden_dim, dtype=dt, name='gru')(
            net, jnp.concatenate([inp, motion], axis=-1))
        d = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=dt,
                            name='flow_head_conv1')(net))
        delta = nn.Conv(2, (3, 3), padding=1, dtype=dt,
                        name='flow_head_conv2')(d)
        m = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=dt,
                            name='mask_conv1')(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=dt,
                              name='mask_conv2')(m)
        return net, mask.astype(jnp.float32), delta.astype(jnp.float32)


def upsample_flow_convex(flow, mask):
    """Convex-combination 8x upsampling. flow (B,H,W,2), mask (B,H,W,576).

    Mask channel layout matches the official view(N, 1, 9, 8, 8, H, W):
    neighbor index k = (dy+1)*3 + (dx+1) major, then the 8x8 subpixel grid.
    """
    b, h, w, _ = flow.shape
    mask = nn.softmax(mask.reshape(b, h, w, 9, 64), axis=3)
    fp = jnp.pad(8. * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nbrs = jnp.stack(
        [fp[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=3)
    up = jnp.einsum('bhwks,bhwkc->bhwsc', mask, nbrs)  # (B,H,W,64,2)
    up = up.reshape(b, h, w, 8, 8, 2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


def _align_corners_up_matrix(out_size, in_size):
    """(out, in) bilinear weights for align_corners=True interpolation."""
    if in_size == 1:
        return jnp.ones((out_size, 1), jnp.float32)
    src = jnp.arange(out_size, dtype=jnp.float32) * (
        (in_size - 1) / (out_size - 1))
    idx = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.maximum(0., 1. - jnp.abs(src[:, None] - idx[None, :]))


def upsample_flow_bilinear8(flow):
    """8x flow upsampling for raft-small (no convex mask): matches
    8 * F.interpolate(scale_factor=8, mode='bilinear',
    align_corners=True) as two separable interpolation matmuls."""
    b, h, w, _ = flow.shape
    wy = _align_corners_up_matrix(8 * h, h)
    wx = _align_corners_up_matrix(8 * w, w)
    return 8. * jnp.einsum('oh,bhwc,pw->bopc', wy, flow, wx)


class RAFT(nn.Module):
    """RAFT in basic (default) or small form. Call with 0-255 RGB
    (B, H, W, 3); H, W divisible by 8.

    `small=True` is the official raft-small architecture: bottleneck
    encoders (fnet instance-norm, cnet norm-free), hidden 96 + context
    64, radius-3 lookup, plain ConvGRU, bilinear (not convex) 8x
    upsampling. `dtype=jnp.bfloat16` runs every conv in bf16 (params
    stay f32; flow updates, correlation accumulation and upsampling
    stay f32).
    """
    small: bool = False
    corr_levels: int = 4
    dtype: type = jnp.float32

    @property
    def hidden_dim(self):
        return 96 if self.small else 128

    @property
    def context_dim(self):
        return 64 if self.small else 128

    @property
    def corr_radius(self):
        return 3 if self.small else 4

    @nn.compact
    def __call__(self, image1, image2, iters=12, train=False):
        assert iters >= 1, 'iters must be >= 1'
        assert image1.shape[1] % 8 == 0 and image1.shape[2] % 8 == 0, (
            'H and W must be divisible by 8 (the official repo pads with '
            'InputPadder); got {}'.format(image1.shape))
        im1 = 2. * (image1 / 255.) - 1.
        im2 = 2. * (image2 / 255.) - 1.

        if self.small:
            fnet = SmallEncoder(128, 'instance', dtype=self.dtype,
                                name='fnet')
            cnet_mod = SmallEncoder(
                self.hidden_dim + self.context_dim, 'none',
                dtype=self.dtype, name='cnet')
        else:
            fnet = BasicEncoder(256, 'instance', dtype=self.dtype,
                                name='fnet')
            cnet_mod = BasicEncoder(
                self.hidden_dim + self.context_dim, 'batch',
                dtype=self.dtype, name='cnet')
        fmap1 = fnet(im1, train=train)
        fmap2 = fnet(im2, train=train)
        cnet = cnet_mod(im1, train=train)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])

        b = image1.shape[0]
        h, w = fmap1.shape[1], fmap1.shape[2]
        min_dim = 2 ** (self.corr_levels - 1)
        assert h >= min_dim and w >= min_dim, (
            'images too small for a {}-level correlation pyramid: 1/8-res '
            'grid is {}x{}, need >= {}'.format(
                self.corr_levels, h, w, min_dim))
        pyramid = corr_pyramid(fmap1, fmap2, self.corr_levels)
        coords0 = coords_grid(b, h, w)
        coords1 = coords0

        update = (SmallUpdateBlock(self.hidden_dim, dtype=self.dtype,
                                   name='update_block') if self.small
                  else BasicUpdateBlock(self.hidden_dim, dtype=self.dtype,
                                        name='update_block'))

        def up(flow, mask):
            if mask is None:
                return upsample_flow_bilinear8(flow)
            return upsample_flow_convex(flow, mask)

        predictions = []
        for _ in range(iters):
            # official per-iteration truncation: coords1 = coords1.detach()
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, mask, delta = update(net, inp, corr, flow)
            coords1 = coords1 + delta
            if train:
                predictions.append(up(coords1 - coords0, mask))
        if train:
            return predictions
        return up(coords1 - coords0, mask)


def sequence_loss(predictions, flow_gt, gamma=0.8, max_flow=400.):
    """Exponentially-weighted L1 over refinement iterations (RAFT paper)."""
    mag = jnp.sqrt((flow_gt ** 2).sum(-1, keepdims=True))
    valid = (mag < max_flow).astype(jnp.float32)
    n = len(predictions)
    loss = 0.
    for i, pred in enumerate(predictions):
        loss = loss + gamma ** (n - i - 1) * (
            valid * jnp.abs(pred - flow_gt)).mean()
    return loss


# ---------------------------------------------------------------------------
# Official-checkpoint import (princeton-vl/RAFT basic models).

def is_small_state_dict(sd):
    """Detect the raft-small layout (bottleneck blocks have a conv3)."""
    return any(k.endswith('fnet.layer1.0.conv3.weight') for k in sd)


def import_torch_raft(sd):
    """Torch RAFT state_dict -> {'params': ..., 'batch_stats': ...}.

    Handles both official layouts; build the model with
    RAFT(small=is_small_state_dict(sd)).
    """
    from .torch_compat import _bn, _conv

    sd = {(k[len('module.'):] if k.startswith('module.') else k): v
          for k, v in sd.items()}
    small = is_small_state_dict(sd)

    def conv(prefix):
        out = {'kernel': _conv(sd[prefix + '.weight'])}
        if prefix + '.bias' in sd:
            out['bias'] = np.asarray(sd[prefix + '.bias'])
        return out

    block_convs = ('conv1', 'conv2', 'conv3') if small else (
        'conv1', 'conv2')
    params, stats = {}, {}
    for enc, norm in (('fnet', 'instance'),
                      ('cnet', 'none' if small else 'batch')):
        p, s = {'conv1': conv(enc + '.conv1')}, {}
        if norm == 'batch':
            p['norm1'], s['norm1'] = _bn(enc + '.norm1', sd)
        for li, stride in ((1, 1), (2, 2), (3, 2)):
            for bi in range(2):
                name = 'layer{}_{}'.format(li, bi)
                tp = '{}.layer{}.{}'.format(enc, li, bi)
                bp = {c: conv('{}.{}'.format(tp, c)) for c in block_convs}
                bs = {}
                if norm == 'batch':
                    bp['norm1'], bs['norm1'] = _bn(tp + '.norm1', sd)
                    bp['norm2'], bs['norm2'] = _bn(tp + '.norm2', sd)
                if bi == 0 and stride != 1:
                    bp['downsample_conv'] = conv(tp + '.downsample.0')
                    if norm == 'batch':
                        bp['norm3'], bs['norm3'] = _bn(
                            tp + '.downsample.1', sd)
                p[name] = bp
                if bs:
                    s[name] = bs
        p['conv2'] = conv(enc + '.conv2')
        params[enc] = p
        if s:
            stats[enc] = s

    ub = 'update_block.'
    enc_convs = (('convc1', 'convf1', 'convf2', 'conv') if small
                 else ('convc1', 'convc2', 'convf1', 'convf2', 'conv'))
    gru_convs = (('convz', 'convr', 'convq') if small
                 else ('convz1', 'convr1', 'convq1',
                       'convz2', 'convr2', 'convq2'))
    params['update_block'] = {
        'encoder': {k: conv(ub + 'encoder.' + k) for k in enc_convs},
        'gru': {k: conv(ub + 'gru.' + k) for k in gru_convs},
        'flow_head_conv1': conv(ub + 'flow_head.conv1'),
        'flow_head_conv2': conv(ub + 'flow_head.conv2'),
    }
    if not small:
        params['update_block']['mask_conv1'] = conv(ub + 'mask.0')
        params['update_block']['mask_conv2'] = conv(ub + 'mask.2')
    return {'params': params, 'batch_stats': stats}


def export_torch_raft(variables):
    """Inverse of import_torch_raft (used to round-trip-test the mapping)."""
    out = {}

    def put_conv(prefix, p):
        out[prefix + '.weight'] = np.transpose(
            np.asarray(p['kernel']), (3, 2, 0, 1))
        if 'bias' in p:
            out[prefix + '.bias'] = np.asarray(p['bias'])

    def put_bn(prefix, p, s):
        out[prefix + '.weight'] = np.asarray(p['scale'])
        out[prefix + '.bias'] = np.asarray(p['bias'])
        out[prefix + '.running_mean'] = np.asarray(s['mean'])
        out[prefix + '.running_var'] = np.asarray(s['var'])

    params = variables['params']
    stats = variables.get('batch_stats', {})
    for enc in ('fnet', 'cnet'):
        p = params[enc]
        s = stats.get(enc, {})
        put_conv(enc + '.conv1', p['conv1'])
        if 'norm1' in p:
            put_bn(enc + '.norm1', p['norm1'], s['norm1'])
        for li in (1, 2, 3):
            for bi in range(2):
                name = 'layer{}_{}'.format(li, bi)
                tp = '{}.layer{}.{}'.format(enc, li, bi)
                bp, bs = p[name], s.get(name, {})
                for c in ('conv1', 'conv2', 'conv3'):
                    if c in bp:
                        put_conv('{}.{}'.format(tp, c), bp[c])
                for norm_name, torch_name in (
                        ('norm1', tp + '.norm1'), ('norm2', tp + '.norm2'),
                        ('norm3', tp + '.downsample.1')):
                    if norm_name in bp:
                        put_bn(torch_name, bp[norm_name], bs[norm_name])
                if 'downsample_conv' in bp:
                    put_conv(tp + '.downsample.0', bp['downsample_conv'])
        put_conv(enc + '.conv2', p['conv2'])

    ub = params['update_block']
    for k, v in ub['encoder'].items():
        put_conv('update_block.encoder.' + k, v)
    for k, v in ub['gru'].items():
        put_conv('update_block.gru.' + k, v)
    put_conv('update_block.flow_head.conv1', ub['flow_head_conv1'])
    put_conv('update_block.flow_head.conv2', ub['flow_head_conv2'])
    if 'mask_conv1' in ub:
        put_conv('update_block.mask.0', ub['mask_conv1'])
        put_conv('update_block.mask.2', ub['mask_conv2'])
    return out


def raft_flow_fn(variables, iters=20, dtype=None, small=False):
    """Jitted (prev_u8, curr_u8) -> (B, H, W, 2) flow, raft/flow.py parity."""
    model = RAFT(small=small,
                 dtype=dtype if dtype is not None else jnp.float32)

    @jax.jit
    def fn(prev_u8, curr_u8):
        im1 = prev_u8.astype(jnp.float32)
        im2 = curr_u8.astype(jnp.float32)
        return model.apply(variables, im1, im2, iters=iters, train=False)

    return fn
