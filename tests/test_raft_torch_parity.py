"""Numerical parity of the Flax RAFT port against torch semantics.

Builds a torch mirror of the official basic-RAFT forward (same math the
princeton-vl checkpoints were trained with: grid_sample align_corners
lookup, unfold-based convex upsampling, SepConvGRU), loads it with
weights exported from a randomly-initialized Flax model via
`export_torch_raft`, and checks the two forwards agree. This proves the
checkpoint-import mapping AND the NHWC re-implementation (paddings, tap
ordering, norm semantics) end to end.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vpd_tpu.models.raft import RAFT, export_torch_raft  # noqa: E402


def _norm(norm_fn, planes):
    if norm_fn == 'batch':
        return nn.BatchNorm2d(planes)
    return nn.InstanceNorm2d(planes)


class TResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, norm_fn, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1,
                               stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.norm1 = _norm(norm_fn, planes)
        self.norm2 = _norm(norm_fn, planes)
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride),
                _norm(norm_fn, planes))

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TBasicEncoder(nn.Module):
    def __init__(self, output_dim, norm_fn):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.norm1 = _norm(norm_fn, 64)
        self.layer1 = nn.Sequential(TResidualBlock(64, 64, norm_fn, 1),
                                    TResidualBlock(64, 64, norm_fn, 1))
        self.layer2 = nn.Sequential(TResidualBlock(64, 96, norm_fn, 2),
                                    TResidualBlock(96, 96, norm_fn, 1))
        self.layer3 = nn.Sequential(TResidualBlock(96, 128, norm_fn, 2),
                                    TResidualBlock(128, 128, norm_fn, 1))
        self.conv2 = nn.Conv2d(128, output_dim, 1)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        return self.conv2(self.layer3(self.layer2(self.layer1(x))))


def t_bilinear_sampler(img, coords):
    h, w = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (w - 1) - 1
    ygrid = 2 * ygrid / (h - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


class TCorrBlock:
    def __init__(self, fmap1, fmap2, num_levels=4, radius=4):
        self.num_levels = num_levels
        self.radius = radius
        b, c, h, w = fmap1.shape
        corr = torch.matmul(fmap1.view(b, c, h * w).transpose(1, 2),
                            fmap2.view(b, c, h * w))
        corr = corr.view(b * h * w, 1, h, w) / math.sqrt(c)
        self.pyramid = [corr]
        for _ in range(num_levels - 1):
            corr = F.avg_pool2d(corr, 2, stride=2)
            self.pyramid.append(corr)
        self.shape = (b, h, w)

    def __call__(self, coords):
        r = self.radius
        coords = coords.permute(0, 2, 3, 1)
        b, h, w, _ = coords.shape
        out = []
        for i, corr in enumerate(self.pyramid):
            d = torch.linspace(-r, r, 2 * r + 1)
            delta = torch.stack(torch.meshgrid(d, d, indexing='ij'),
                                axis=-1)
            centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** i
            sampled = t_bilinear_sampler(
                corr, centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2))
            out.append(sampled.view(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous()


class TMotionEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.convc1 = nn.Conv2d(4 * 81, 256, 1)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(192 + 64, 126, 3, padding=1)

    def forward(self, flow, corr):
        c = F.relu(self.convc1(corr))
        c = F.relu(self.convc2(c))
        f = F.relu(self.convf1(flow))
        f = F.relu(self.convf2(f))
        out = F.relu(self.conv(torch.cat([c, f], dim=1)))
        return torch.cat([out, flow], dim=1)


class TSepConvGRU(nn.Module):
    def __init__(self, hidden=128, input_dim=256):
        super().__init__()
        k = hidden + input_dim
        self.convz1 = nn.Conv2d(k, hidden, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(k, hidden, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(k, hidden, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(k, hidden, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(k, hidden, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(k, hidden, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        for convz, convr, convq in ((self.convz1, self.convr1, self.convq1),
                                    (self.convz2, self.convr2, self.convq2)):
            hx = torch.cat([h, x], dim=1)
            z = torch.sigmoid(convz(hx))
            r = torch.sigmoid(convr(hx))
            q = torch.tanh(convq(torch.cat([r * h, x], dim=1)))
            h = (1 - z) * h + z * q
        return h


class TUpdateBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TMotionEncoder()
        self.gru = TSepConvGRU()
        self.flow_head = nn.Sequential()
        self.flow_head.conv1 = nn.Conv2d(128, 256, 3, padding=1)
        self.flow_head.conv2 = nn.Conv2d(256, 2, 3, padding=1)
        self.mask = nn.Sequential(nn.Conv2d(128, 256, 3, padding=1),
                                  nn.ReLU(inplace=True),
                                  nn.Conv2d(256, 64 * 9, 1))

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, motion], dim=1))
        d = F.relu(self.flow_head.conv1(net))
        delta = self.flow_head.conv2(d)
        return net, 0.25 * self.mask(net), delta


class TRAFT(nn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = TBasicEncoder(256, 'instance')
        self.cnet = TBasicEncoder(256, 'batch')
        self.update_block = TUpdateBlock()

    @staticmethod
    def coords_grid(b, h, w):
        coords = torch.meshgrid(torch.arange(h), torch.arange(w),
                                indexing='ij')
        return torch.stack(coords[::-1], dim=0).float()[None].repeat(
            b, 1, 1, 1)

    @staticmethod
    def upsample_flow(flow, mask):
        n, _, h, w = flow.shape
        mask = mask.view(n, 1, 9, 8, 8, h, w)
        mask = torch.softmax(mask, dim=2)
        up = F.unfold(8 * flow, [3, 3], padding=1)
        up = up.view(n, 2, 9, 1, 1, h, w)
        up = torch.sum(mask * up, dim=2)
        up = up.permute(0, 1, 4, 2, 5, 3)
        return up.reshape(n, 2, 8 * h, 8 * w)

    def forward(self, image1, image2, iters):
        im1 = 2 * (image1 / 255.) - 1
        im2 = 2 * (image2 / 255.) - 1
        fmap1, fmap2 = self.fnet(im1), self.fnet(im2)
        corr_fn = TCorrBlock(fmap1, fmap2)
        cnet = self.cnet(im1)
        net, inp = torch.split(cnet, [128, 128], dim=1)
        net, inp = torch.tanh(net), F.relu(inp)
        b, _, h, w = fmap1.shape
        coords0 = self.coords_grid(b, h, w)
        coords1 = coords0.clone()
        for _ in range(iters):
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
        return self.upsample_flow(coords1 - coords0, mask)


def test_raft_forward_matches_torch_mirror():
    model = RAFT()
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(42), z, z, iters=1)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in export_torch_raft(variables).items()}

    tmodel = TRAFT()
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    # only batchnorm num_batches_tracked buffers may be missing
    assert not unexpected, unexpected
    assert all('num_batches_tracked' in k for k in missing), missing
    tmodel.eval()

    # >= 128px: the official grid_sample normalization (2x/(W-1)-1)
    # NaNs on the 1x1 level a 64px input would produce
    rng = np.random.default_rng(5)
    im1 = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.float32)
    im2 = np.roll(im1, 2, axis=2) + rng.normal(
        scale=2., size=im1.shape).astype(np.float32)

    flow_jax = np.asarray(model.apply(
        variables, jnp.asarray(im1), jnp.asarray(im2), iters=3,
        train=False))
    with torch.no_grad():
        flow_torch = tmodel(
            torch.from_numpy(im1).permute(0, 3, 1, 2),
            torch.from_numpy(im2).permute(0, 3, 1, 2), iters=3)
    flow_torch = flow_torch.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(flow_jax, flow_torch, atol=1e-3)


# ---------------------------------------------------------------------------
# raft-small mirror


class TBottleneckBlock(nn.Module):
    def __init__(self, in_planes, planes, norm_fn, stride):
        super().__init__()
        q = planes // 4
        self.conv1 = nn.Conv2d(in_planes, q, 1)
        self.conv2 = nn.Conv2d(q, q, 3, padding=1, stride=stride)
        self.conv3 = nn.Conv2d(q, planes, 1)
        mk = (lambda p: nn.InstanceNorm2d(p)) if norm_fn == 'instance' \
            else (lambda p: nn.Identity())
        self.norm1, self.norm2, self.norm3 = mk(q), mk(q), mk(planes)
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride), mk(planes))

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        y = F.relu(self.norm3(self.conv3(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TSmallEncoder(nn.Module):
    def __init__(self, output_dim, norm_fn):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, 7, stride=2, padding=3)
        self.norm1 = (nn.InstanceNorm2d(32) if norm_fn == 'instance'
                      else nn.Identity())
        self.layer1 = nn.Sequential(TBottleneckBlock(32, 32, norm_fn, 1),
                                    TBottleneckBlock(32, 32, norm_fn, 1))
        self.layer2 = nn.Sequential(TBottleneckBlock(32, 64, norm_fn, 2),
                                    TBottleneckBlock(64, 64, norm_fn, 1))
        self.layer3 = nn.Sequential(TBottleneckBlock(64, 96, norm_fn, 2),
                                    TBottleneckBlock(96, 96, norm_fn, 1))
        self.conv2 = nn.Conv2d(96, output_dim, 1)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        return self.conv2(self.layer3(self.layer2(self.layer1(x))))


class TSmallUpdateBlock(nn.Module):
    def __init__(self):
        super().__init__()
        enc = nn.Module()
        enc.convc1 = nn.Conv2d(4 * 49, 96, 1)
        enc.convf1 = nn.Conv2d(2, 64, 7, padding=3)
        enc.convf2 = nn.Conv2d(64, 32, 3, padding=1)
        enc.conv = nn.Conv2d(96 + 32, 80, 3, padding=1)
        self.encoder = enc
        gru = nn.Module()
        k = 96 + (82 + 64)
        gru.convz = nn.Conv2d(k, 96, 3, padding=1)
        gru.convr = nn.Conv2d(k, 96, 3, padding=1)
        gru.convq = nn.Conv2d(k, 96, 3, padding=1)
        self.gru = gru
        self.flow_head = nn.Sequential()
        self.flow_head.conv1 = nn.Conv2d(96, 128, 3, padding=1)
        self.flow_head.conv2 = nn.Conv2d(128, 2, 3, padding=1)

    def forward(self, net, inp, corr, flow):
        c = F.relu(self.encoder.convc1(corr))
        f = F.relu(self.encoder.convf1(flow))
        f = F.relu(self.encoder.convf2(f))
        motion = F.relu(self.encoder.conv(torch.cat([c, f], dim=1)))
        motion = torch.cat([motion, flow], dim=1)
        x = torch.cat([inp, motion], dim=1)
        hx = torch.cat([net, x], dim=1)
        z = torch.sigmoid(self.gru.convz(hx))
        r = torch.sigmoid(self.gru.convr(hx))
        q = torch.tanh(self.gru.convq(torch.cat([r * net, x], dim=1)))
        net = (1 - z) * net + z * q
        d = F.relu(self.flow_head.conv1(net))
        return net, self.flow_head.conv2(d)


class TRAFTSmall(nn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = TSmallEncoder(128, 'instance')
        self.cnet = TSmallEncoder(96 + 64, 'none')
        self.update_block = TSmallUpdateBlock()

    def forward(self, image1, image2, iters):
        im1 = 2 * (image1 / 255.) - 1
        im2 = 2 * (image2 / 255.) - 1
        fmap1, fmap2 = self.fnet(im1), self.fnet(im2)
        corr_fn = TCorrBlock(fmap1, fmap2, radius=3)
        cnet = self.cnet(im1)
        net, inp = torch.split(cnet, [96, 64], dim=1)
        net, inp = torch.tanh(net), F.relu(inp)
        b, _, h, w = fmap1.shape
        coords0 = TRAFT.coords_grid(b, h, w)
        coords1 = coords0.clone()
        for _ in range(iters):
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
        flow = coords1 - coords0
        return 8 * F.interpolate(flow, scale_factor=8, mode='bilinear',
                                 align_corners=True)


def test_raft_small_matches_torch_mirror():
    from vpd_tpu.models.raft import import_torch_raft, is_small_state_dict

    model = RAFT(small=True)
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(7), z, z, iters=1)
    sd_np = export_torch_raft(variables)
    assert is_small_state_dict(sd_np)
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in sd_np.items()}

    tmodel = TRAFTSmall()
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing
    tmodel.eval()

    rng = np.random.default_rng(8)
    im1 = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.float32)
    im2 = np.roll(im1, 2, axis=2) + rng.normal(
        scale=2., size=im1.shape).astype(np.float32)
    flow_jax = np.asarray(model.apply(
        variables, jnp.asarray(im1), jnp.asarray(im2), iters=3,
        train=False))
    with torch.no_grad():
        flow_torch = tmodel(
            torch.from_numpy(im1).permute(0, 3, 1, 2),
            torch.from_numpy(im2).permute(0, 3, 1, 2), iters=3)
    flow_torch = flow_torch.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(flow_jax, flow_torch, atol=1e-3)

    # import path: the same dict reloads into matching flax params
    back = import_torch_raft({'module.' + k: v for k, v in sd_np.items()})
    np.testing.assert_array_equal(
        np.asarray(back['params']['update_block']['gru']['convz']['kernel']),
        np.asarray(variables['params']['update_block']['gru']['convz']
                   ['kernel']))
