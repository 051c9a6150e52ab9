"""Numerical parity with PyTorch reference models via weight conversion.

Defines the reference's torch modules in-test (torchvision-style ResNet,
reference models/module.py FCResNet), converts random-initialized weights,
and checks outputs agree within the BASELINE 1e-3 cosine target.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vpd_tpu.models import FCResNet, build_encoder  # noqa: E402
from vpd_tpu.models.torch_compat import (  # noqa: E402
    convert_fcresnet_state_dict, convert_resnet_state_dict)


# ---- torchvision-style reference ResNet (models/module.py:35-130) ---------

def conv3x3(i, o, stride=1):
    return tnn.Conv2d(i, o, 3, stride=stride, padding=1, bias=False)


def conv1x1(i, o, stride=1):
    return tnn.Conv2d(i, o, 1, stride=stride, bias=False)


class TorchBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = conv1x1(inplanes, planes)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes, stride)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = conv1x1(planes, planes * 4)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(tnn.Module):

    def __init__(self, block, layers, input_dim, output_dim):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(input_dim, 64, 7, stride=2, padding=3,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], 2)
        self.layer3 = self._make_layer(block, 256, layers[2], 2)
        self.layer4 = self._make_layer(block, 512, layers[3], 2)
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(512 * block.expansion, output_dim)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = tnn.Sequential(
                conv1x1(self.inplanes, planes * block.expansion, stride),
                tnn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        return self.fc(torch.flatten(x, 1))


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            m.running_mean.copy_(torch.randn(
                m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(
                m.running_var.shape, generator=g) + 0.5)


def cosine(a, b):
    a, b = a.reshape(-1), b.reshape(-1)
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.mark.parametrize('arch,block,channels', [
    ('resnet18', TorchBasicBlock, 3),
    ('resnet34', TorchBasicBlock, 5),
    ('resnet50', TorchBottleneck, 3),
])
def test_resnet_parity(arch, block, channels):
    from vpd_tpu.models.resnet import ENCODER_ARCH
    layers = ENCODER_ARCH[arch].layers

    torch.manual_seed(0)
    tmodel = TorchResNet(block, layers, channels, 32).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet_state_dict(sd, arch)

    model = build_encoder(arch, emb_dim=32, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(
        size=(2, 64, 64, channels)).astype(np.float32)

    out_flax = np.asarray(model.apply(
        {'params': params, 'batch_stats': stats}, jnp.asarray(x)))
    with torch.no_grad():
        out_torch = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    assert 1 - cosine(out_flax, out_torch) < 1e-3
    np.testing.assert_allclose(out_flax, out_torch, rtol=1e-3, atol=1e-4)


class TorchFcResidualBlock(tnn.Module):
    """Reference models/module.py:159-175."""

    def __init__(self, hidden_dim, dropout):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.Linear(hidden_dim, hidden_dim),
            tnn.BatchNorm1d(hidden_dim),
            tnn.ReLU(),
            tnn.Dropout(dropout),
            tnn.Linear(hidden_dim, hidden_dim),
            tnn.BatchNorm1d(hidden_dim),
            tnn.ReLU(),
            tnn.Dropout(dropout))

    def forward(self, x):
        return self.block(x) - x


class TorchFCResNet(tnn.Module):
    """Reference models/module.py:178-190."""

    def __init__(self, in_dim, out_dim, num_blocks, hidden_dim,
                 dropout=0.3):
        super().__init__()
        layers = [tnn.Linear(in_dim, hidden_dim), tnn.ReLU()]
        for _ in range(num_blocks):
            layers.append(TorchFcResidualBlock(hidden_dim, dropout))
        layers.append(tnn.Linear(hidden_dim, out_dim))
        self.layers = tnn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


def test_fcresnet_parity():
    torch.manual_seed(1)
    tmodel = TorchFCResNet(39, 32, 2, 1024).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=1)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_fcresnet_state_dict(sd, num_blocks=2)

    model = FCResNet(out_dim=32, num_blocks=2, hidden_dim=1024)
    x = np.random.default_rng(1).normal(size=(5, 39)).astype(np.float32)
    out_flax = np.asarray(model.apply(
        {'params': params, 'batch_stats': stats}, jnp.asarray(x)))
    with torch.no_grad():
        out_torch = tmodel(torch.from_numpy(x)).numpy()

    assert 1 - cosine(out_flax, out_torch) < 1e-3
    np.testing.assert_allclose(out_flax, out_torch, rtol=1e-3, atol=1e-4)


# ---- ImageNet-pretrained student init (models/rgb.py:19-66) ---------------

def test_imagenet_init_matches_reference_surgery():
    """`imagenet_init_variables` == torch `add_flow_to_model` numerics.

    A random-weight torch resnet18 stands in for torchvision's ImageNet
    checkpoint. The reference surgery (mean-expand conv1 over the input
    channel axis to 5 identical copies, swap fc) applied in torch must
    match the flax 5-channel student initialized from the same state_dict.
    """
    from vpd_tpu.models.torch_compat import imagenet_init_variables

    torch.manual_seed(3)
    tmodel = TorchResNet(TorchBasicBlock, (2, 2, 2, 2), 3, 1000).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, seed=3)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    # reference surgery in torch (models/rgb.py:19-43)
    with torch.no_grad():
        w = tmodel.conv1.weight.data
        new_conv = tnn.Conv2d(5, 64, 7, stride=2, padding=3, bias=False)
        new_conv.weight.data = w.mean(dim=1, keepdim=True).expand(
            64, 5, 7, 7).contiguous()
        tmodel.conv1 = new_conv
        new_fc = tnn.Linear(512, 16)
        tmodel.fc = new_fc
        fc_sd = {'fc.weight': new_fc.weight.numpy(),
                 'fc.bias': new_fc.bias.numpy()}

    params, stats = imagenet_init_variables(sd, 'resnet18', num_channels=5)
    assert 'Dense_0' not in params
    params['Dense_0'] = {
        'kernel': np.transpose(fc_sd['fc.weight'], (1, 0)),
        'bias': fc_sd['fc.bias']}

    model = build_encoder('resnet18', emb_dim=16, dtype=jnp.float32)
    x = np.random.default_rng(3).normal(
        size=(2, 64, 64, 5)).astype(np.float32)
    out_flax = np.asarray(model.apply(
        {'params': params, 'batch_stats': stats}, jnp.asarray(x)))
    with torch.no_grad():
        out_torch = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    assert 1 - cosine(out_flax, out_torch) < 1e-3
    np.testing.assert_allclose(out_flax, out_torch, rtol=1e-3, atol=1e-4)


def test_vpd_trainer_pretrained_wiring():
    """--pretrained grafts backbone weights; without weights it errors."""
    from vpd_tpu.train.vpd_loop import VPDTrainer, default_config

    torch.manual_seed(4)
    tmodel = TorchResNet(TorchBasicBlock, (2, 2, 2, 2), 3, 1000).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    config = default_config('tennis', emb_dim=8, batch_size=4, img_dim=32,
                            use_flow=True, encoder_arch='resnet18',
                            pretrained=True)
    with pytest.raises(ValueError, match='init_weights'):
        VPDTrainer(None, None, config, dtype=jnp.float32)

    trainer = VPDTrainer(None, None, config, dtype=jnp.float32,
                         pretrained_weights=sd)
    k = np.asarray(trainer.state.params['encoder']['Conv_0']['kernel'])
    assert k.shape == (7, 7, 5, 64)
    # all 5 input channels identical == mean of the torch RGB kernel
    ref = sd['conv1.weight'].mean(axis=1).transpose(1, 2, 0)
    for c in range(5):
        np.testing.assert_allclose(k[:, :, c, :], ref, rtol=1e-6)
    # backbone BN stats restored from the checkpoint
    np.testing.assert_allclose(
        np.asarray(
            trainer.state.batch_stats['encoder']['BatchNorm_0']['mean']),
        sd['bn1.running_mean'], rtol=1e-6)
    # emb head stays freshly initialized (replace_last_layer)
    assert trainer.state.params['encoder']['Dense_0'][
        'kernel'].shape == (512, 8)


def _tree_equal(a, b, path=''):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + '/' + str(k))
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=path + '/k')


@pytest.mark.parametrize('arch', ['resnet18', 'resnet50'])
def test_export_import_resnet_round_trip(arch):
    """export_resnet_state_dict and convert_resnet_state_dict are exact
    inverses (pure transposes) — including the Bottleneck layout, which
    the forward-equality oracle tests do not cover."""
    import jax

    from vpd_tpu.models.torch_compat import (convert_resnet_state_dict,
                                             export_resnet_state_dict)

    model = build_encoder(arch, emb_dim=8, dtype=jnp.float32)
    variables = model.init(jax.random.key(3), jnp.zeros((1, 32, 32, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(np.asarray, variables['batch_stats'])

    sd = export_resnet_state_dict(params, stats, arch, prefix='resnet.')
    assert all(k.startswith('resnet.') for k in sd)
    p2, s2 = convert_resnet_state_dict(sd, arch)
    _tree_equal(params, p2)
    _tree_equal(stats, s2)


def test_export_import_fcresnet_round_trip():
    import jax

    from vpd_tpu.models.torch_compat import (convert_fcresnet_state_dict,
                                             export_fcresnet_state_dict)

    model = FCResNet(8, 2, 32, dtype=jnp.float32)
    variables = model.init(jax.random.key(4), jnp.zeros((1, 39)))
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(np.asarray, variables['batch_stats'])

    sd = export_fcresnet_state_dict(params, stats, 2)
    p2, s2 = convert_fcresnet_state_dict(sd, 2)
    _tree_equal(params, p2)
    _tree_equal(stats, s2)
