"""PyTorch <-> Flax checkpoint interchange for the reference's models.

The reference stores torchvision-layout `state_dict`s
(`{name}.encoder.pt`); this module converts those tensors into this
framework's NHWC Flax parameter pytrees so reference-trained models can be
served here with < 1e-3 cosine deviation (BASELINE.md parity target) —
and exports Flax pytrees back to the torch layout so models trained HERE
serve in the reference (`export_*_state_dict`, tools/export_torch_model).

Layout mapping (torch -> flax):
  conv weights  (O, I, kh, kw) -> (kh, kw, I, O)
  linear        (O, I)         -> (I, O)
  batchnorm     weight/bias/running_mean/running_var
                -> scale/bias + batch_stats mean/var
"""

import numpy as np

from .resnet import ENCODER_ARCH, BasicBlock


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w):
    return np.transpose(np.asarray(w), (1, 0))


def _bn(prefix, sd):
    params = {'scale': np.asarray(sd[prefix + '.weight']),
              'bias': np.asarray(sd[prefix + '.bias'])}
    stats = {'mean': np.asarray(sd[prefix + '.running_mean']),
             'var': np.asarray(sd[prefix + '.running_var'])}
    return params, stats


def convert_resnet_state_dict(sd, arch):
    """torchvision-style ResNet state_dict -> (params, batch_stats).

    `sd` keys may carry the reference's 'resnet.' prefix
    (RGBF_EmbeddingModel wraps the backbone as `self.resnet`,
    models/rgb.py:61).
    """
    sd = {k.split('resnet.', 1)[-1] if k.startswith('resnet.') else k: v
          for k, v in sd.items()}
    cfg = ENCODER_ARCH[arch]
    is_basic = cfg.block is BasicBlock

    params = {'Conv_0': {'kernel': _conv(sd['conv1.weight'])}}
    stats = {}
    p, s = _bn('bn1', sd)
    params['BatchNorm_0'] = p
    stats['BatchNorm_0'] = s

    block_cls = 'BasicBlock' if is_basic else 'Bottleneck'
    flat = 0
    for stage, num_blocks in enumerate(cfg.layers, start=1):
        for i in range(num_blocks):
            t = 'layer{}.{}.'.format(stage, i)
            name = '{}_{}'.format(block_cls, flat)
            flat += 1
            bp, bs = {}, {}
            if is_basic:
                bp['Conv_0'] = {'kernel': _conv(sd[t + 'conv1.weight'])}
                bp['BatchNorm_0'], bs['BatchNorm_0'] = _bn(t + 'bn1', sd)
                bp['Conv_1'] = {'kernel': _conv(sd[t + 'conv2.weight'])}
                bp['bn_last'], bs['bn_last'] = _bn(t + 'bn2', sd)
                down_conv = 'Conv_2'
                down_bn = 'BatchNorm_1'
            else:
                bp['Conv_0'] = {'kernel': _conv(sd[t + 'conv1.weight'])}
                bp['BatchNorm_0'], bs['BatchNorm_0'] = _bn(t + 'bn1', sd)
                bp['Conv_1'] = {'kernel': _conv(sd[t + 'conv2.weight'])}
                bp['BatchNorm_1'], bs['BatchNorm_1'] = _bn(t + 'bn2', sd)
                bp['Conv_2'] = {'kernel': _conv(sd[t + 'conv3.weight'])}
                bp['bn_last'], bs['bn_last'] = _bn(t + 'bn3', sd)
                down_conv = 'Conv_3'
                down_bn = 'BatchNorm_2'
            if t + 'downsample.0.weight' in sd:
                bp[down_conv] = {
                    'kernel': _conv(sd[t + 'downsample.0.weight'])}
                bp[down_bn], bs[down_bn] = _bn(t + 'downsample.1', sd)
            params[name] = bp
            stats[name] = bs

    params['Dense_0'] = {'kernel': _dense(sd['fc.weight']),
                         'bias': np.asarray(sd['fc.bias'])}
    return params, stats


def imagenet_init_variables(sd, arch, num_channels=3):
    """torchvision ImageNet state_dict -> student encoder init pytrees.

    Reproduces the reference's pretrained-student construction
    (models/rgb.py:56-66, wired at train_vpd_model.py:215):
    `add_flow_to_model` (models/rgb.py:19-37) replaces the first conv by
    the mean of the pretrained kernel over its input-channel axis expanded
    to `num_channels` identical copies, and `replace_last_layer`
    (models/rgb.py:40-43) swaps fc for a fresh emb head — so the fc entry
    is dropped here and the caller keeps its freshly-initialized Dense_0.
    """
    params, stats = convert_resnet_state_dict(sd, arch)
    del params['Dense_0']
    if num_channels != 3:
        k = params['Conv_0']['kernel']  # (kh, kw, 3, 64)
        mean = k.mean(axis=2, keepdims=True)
        params['Conv_0']['kernel'] = np.broadcast_to(
            mean, mean.shape[:2] + (num_channels,) + mean.shape[3:]).copy()
    return params, stats


def convert_fcresnet_state_dict(sd, num_blocks):
    """Reference FCResNet state_dict -> (params, batch_stats).

    Torch layout (models/module.py:178-190): layers.0 stem Linear,
    layers.{2+i}.block.{0,1,4,5} per residual block, layers.{2+n} out
    Linear.
    """
    def lin(prefix):
        return {'kernel': _dense(sd[prefix + '.weight']),
                'bias': np.asarray(sd[prefix + '.bias'])}

    params = {'Dense_0': lin('layers.0')}
    stats = {}
    for i in range(num_blocks):
        t = 'layers.{}.block.'.format(2 + i)
        name = 'FcResidualBlock_{}'.format(i)
        bp = {'Dense_0': lin(t + '0'), 'Dense_1': lin(t + '4')}
        bs = {}
        bp['BatchNorm_0'], bs['BatchNorm_0'] = _bn(t + '1', sd)
        bp['BatchNorm_1'], bs['BatchNorm_1'] = _bn(t + '5', sd)
        params[name] = bp
        stats[name] = bs
    params['Dense_1'] = lin('layers.{}'.format(2 + num_blocks))
    return params, stats


def convert_fcposedecoder_state_dict(sd, dataset_targets):
    """Reference FCPoseDecoder state_dict -> (params, {}).

    Torch layout (`models/module.py:211-227`): `fcn.layers.*` FCNet trunk
    (batch_norm=False, so only Linear layers carry params) plus one
    `fc_{dataset}` linear head per 3D dataset. Our decoder runs every
    head as one padded `_MultiHead_0` einsum indexed by dataset_id
    (`models/fc.py`), so heads are stacked in `dataset_targets` order —
    the full config['datasets'] order, with zero rows for datasets that
    have no 3D head (their columns are masked by the train step anyway).

    dataset_targets: ordered [(name, flattened_3d_dim_or_0)].
    """
    def lin(prefix):
        return {'kernel': _dense(sd[prefix + '.weight']),
                'bias': np.asarray(sd[prefix + '.bias'])}

    trunk_idx = sorted(
        int(k.split('.')[2]) for k in sd
        if k.startswith('fcn.layers.') and k.endswith('.weight'))
    fcnet = {'Dense_{}'.format(i): lin('fcn.layers.{}'.format(j))
             for i, j in enumerate(trunk_idx)}

    head_dim = max(max(d for _, d in dataset_targets), 1)
    last = fcnet['Dense_{}'.format(len(trunk_idx) - 1)]['kernel']
    in_dim, dtype = last.shape[1], last.dtype  # keep source precision
    ws, bs = [], []
    for name, dim in dataset_targets:
        w = np.zeros((in_dim, head_dim), dtype)
        b = np.zeros((head_dim,), dtype)
        if dim:
            tw = _dense(sd['fc_{}.weight'.format(name)])
            assert tw.shape == (in_dim, dim), (name, tw.shape, dim)
            w[:, :dim] = tw
            b[:dim] = sd['fc_{}.bias'.format(name)]
        ws.append(w)
        bs.append(b)
    params = {'FCNet_0': fcnet,
              '_MultiHead_0': {'kernel': np.stack(ws),
                               'bias': np.stack(bs)}}
    return params, {}


def torch_param_names(sd):
    """state_dict keys that are parameters (not buffers), in
    `module.parameters()` order — torch emits a module's parameters
    before its buffers and recurses in registration order, so filtering
    the ordered state_dict preserves the optimizer's param indexing."""
    return [k for k in sd
            if k.endswith(('.weight', '.bias')) and 'running' not in k]


def load_torch_state_dict(path):
    """Load a .pt state_dict on CPU as {key: ndarray} (torch required)."""
    import torch

    sd = torch.load(path, map_location='cpu')
    return {k: v.numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Export (the inverse direction): serve models trained HERE in the
# reference codebase. Same layout mapping, transposed back; BatchNorms
# regain the `num_batches_tracked` counter torch state_dicts carry
# (strict load_state_dict rejects dicts without it).
# ---------------------------------------------------------------------------

def _conv_back(k):
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _dense_back(k):
    return np.transpose(np.asarray(k), (1, 0))


def _bn_back(prefix, params, stats, out):
    out[prefix + '.weight'] = np.asarray(params['scale'])
    out[prefix + '.bias'] = np.asarray(params['bias'])
    out[prefix + '.running_mean'] = np.asarray(stats['mean'])
    out[prefix + '.running_var'] = np.asarray(stats['var'])
    out[prefix + '.num_batches_tracked'] = np.asarray(0, np.int64)


def export_resnet_state_dict(params, stats, arch, prefix='resnet.'):
    """Flax encoder pytrees -> torchvision-layout {key: ndarray}.

    `prefix='resnet.'` matches how the reference saves VPD encoders
    (RGBF_EmbeddingModel wraps the backbone as `self.resnet`,
    models/rgb.py:61); pass '' for a bare torchvision ResNet."""
    cfg = ENCODER_ARCH[arch]
    is_basic = cfg.block is BasicBlock
    sd = {prefix + 'conv1.weight': _conv_back(params['Conv_0']['kernel'])}
    _bn_back(prefix + 'bn1', params['BatchNorm_0'],
             stats['BatchNorm_0'], sd)

    block_cls = 'BasicBlock' if is_basic else 'Bottleneck'
    flat = 0
    for stage, num_blocks in enumerate(cfg.layers, start=1):
        for i in range(num_blocks):
            t = '{}layer{}.{}.'.format(prefix, stage, i)
            bp = params['{}_{}'.format(block_cls, flat)]
            bs = stats['{}_{}'.format(block_cls, flat)]
            flat += 1
            if is_basic:
                convs = [('conv1', 'Conv_0'), ('conv2', 'Conv_1')]
                bns = [('bn1', 'BatchNorm_0'), ('bn2', 'bn_last')]
                down_conv, down_bn = 'Conv_2', 'BatchNorm_1'
            else:
                convs = [('conv1', 'Conv_0'), ('conv2', 'Conv_1'),
                         ('conv3', 'Conv_2')]
                bns = [('bn1', 'BatchNorm_0'), ('bn2', 'BatchNorm_1'),
                       ('bn3', 'bn_last')]
                down_conv, down_bn = 'Conv_3', 'BatchNorm_2'
            for tname, fname in convs:
                sd[t + tname + '.weight'] = _conv_back(bp[fname]['kernel'])
            for tname, fname in bns:
                _bn_back(t + tname, bp[fname], bs[fname], sd)
            if down_conv in bp:
                sd[t + 'downsample.0.weight'] = _conv_back(
                    bp[down_conv]['kernel'])
                _bn_back(t + 'downsample.1', bp[down_bn], bs[down_bn], sd)

    sd[prefix + 'fc.weight'] = _dense_back(params['Dense_0']['kernel'])
    sd[prefix + 'fc.bias'] = np.asarray(params['Dense_0']['bias'])
    return sd


def export_fcresnet_state_dict(params, stats, num_blocks):
    """Flax FCResNet pytrees -> reference torch layout {key: ndarray}
    (models/module.py:178-190)."""
    def lin_back(prefix, p, out):
        out[prefix + '.weight'] = _dense_back(p['kernel'])
        out[prefix + '.bias'] = np.asarray(p['bias'])

    sd = {}
    lin_back('layers.0', params['Dense_0'], sd)
    for i in range(num_blocks):
        t = 'layers.{}.block.'.format(2 + i)
        bp = params['FcResidualBlock_{}'.format(i)]
        bs = stats['FcResidualBlock_{}'.format(i)]
        lin_back(t + '0', bp['Dense_0'], sd)
        _bn_back(t + '1', bp['BatchNorm_0'], bs['BatchNorm_0'], sd)
        lin_back(t + '4', bp['Dense_1'], sd)
        _bn_back(t + '5', bp['BatchNorm_1'], bs['BatchNorm_1'], sd)
    lin_back('layers.{}'.format(2 + num_blocks), params['Dense_1'], sd)
    return sd


def export_fcposedecoder_state_dict(params, dataset_targets):
    """Our padded-multi-head decoder params -> reference FCPoseDecoder
    state_dict (inverse of convert_fcposedecoder_state_dict).

    Replicates the torch FCNet Sequential indexing of
    `models/module.py:133-153` (batch_norm=False: Linear at 0, then
    ReLU/Linear[/Dropout] per hidden dim) and unpads each 3D dataset's
    head out of `_MultiHead_0`.
    """
    fcnet = params['FCNet_0']
    n_lin = len(fcnet)
    idxs, pos = [0], 1
    for i in range(n_lin - 1):  # torch FCNet hidden_dims count
        pos += 1  # ReLU
        idxs.append(pos)
        pos += 1  # Linear
        if i + 1 < n_lin - 1:
            pos += 1  # Dropout
    out = {}
    for i, j in enumerate(idxs):
        lin = fcnet['Dense_{}'.format(i)]
        out['fcn.layers.{}.weight'.format(j)] = _dense_back(lin['kernel'])
        out['fcn.layers.{}.bias'.format(j)] = np.asarray(lin['bias'])
    head = params['_MultiHead_0']
    for i, (name, dim) in enumerate(dataset_targets):
        if not dim:
            continue
        out['fc_{}.weight'.format(name)] = _dense_back(
            np.asarray(head['kernel'])[i][:, :dim])
        out['fc_{}.bias'.format(name)] = np.asarray(
            head['bias'])[i][:dim]
    return out


def save_torch_state_dict(path, sd):
    """Save {key: ndarray} as a torch .pt state_dict (torch required).

    float leaves save as float32 tensors; the num_batches_tracked
    counters stay int64, matching torch BatchNorm buffers."""
    import torch

    # copy=True: transposed views are non-writable, which torch warns on
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, path)
