"""Differential tests against the ACTUAL reference code as oracle.

Unlike test_torch_compat.py (which re-types reference architectures
in-test), these tests import the read-only reference tree at
/root/reference and assert head-to-head numerical equality on randomized
inputs, so any drift in either implementation fails loudly:

  * `vipe_dataset/dataset_base.py:37-137` normalize_2d_skeleton /
    get_3d_features / normalize_3d_offsets / is_good_3d_neg_sample
    vs `vpd_tpu.geometry.{coco,features3d}` (all variants: numpy single,
    numpy batch, jax batch).
  * `models/keypoint.py:38-126` Keypoint_EmbeddingModel.epoch (the real
    VIPE loss, eval path) vs the fused jitted VIPE step with weights
    transplanted via `models.torch_compat`.
  * `util/proposal.py:175-209` get_proposals vs
    `vpd_tpu.train.proposal.get_proposals` (fuzzed score traces).
  * `action_dataset/load.py:16-48` group_by_frame / normalize_rows vs
    `vpd_tpu.datasets.load` (fuzzed sparse embedding lists).

The reference's conv-ResNet half of models/module.py needs torchvision
(absent); a catch-all stub satisfies those imports — the FC classes used
here are the reference's own code, untouched.
"""

import json
import math
import os
import sys
import types

import numpy as np
import pytest

REF = '/root/reference'
if not os.path.isdir(REF):
    pytest.skip('reference tree not available', allow_module_level=True)
torch = pytest.importorskip('torch')
pytest.importorskip('scipy')

if REF not in sys.path:
    sys.path.append(REF)  # append: never shadows repo/test modules


def _stub_torchvision():
    # test_reference_oracle_tools.py installs a torchvision.transforms
    # stub; extend that module instead of bailing so collection order
    # between the two files doesn't matter.
    tv = sys.modules.get('torchvision')
    if tv is not None and getattr(tv, 'models', None) is not None:
        return

    class _AnyAttr(types.ModuleType):
        def __getattr__(self, name):
            return None

    if tv is None:
        tv = types.ModuleType('torchvision')
    tvm = _AnyAttr('torchvision.models')
    tvr = types.ModuleType('torchvision.models.resnet')

    # Faithful torchvision block semantics (the standard public
    # architecture, also re-typed in test_torch_compat.py) so the
    # reference's models.module.ResNet class runs as a real oracle.
    nn = torch.nn

    def conv3x3(i, o, stride=1, groups=1, dilation=1):
        return nn.Conv2d(i, o, 3, stride=stride, padding=dilation,
                         groups=groups, bias=False, dilation=dilation)

    def conv1x1(i, o, stride=1):
        return nn.Conv2d(i, o, 1, stride=stride, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1,
                     norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            assert groups == 1 and base_width == 64 and dilation == 1
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = norm_layer(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1,
                     norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            width = int(planes * (base_width / 64.)) * groups
            self.conv1 = conv1x1(inplanes, width)
            self.bn1 = norm_layer(width)
            self.conv2 = conv3x3(width, width, stride, groups, dilation)
            self.bn2 = norm_layer(width)
            self.conv3 = conv1x1(width, planes * self.expansion)
            self.bn3 = norm_layer(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    tvr.BasicBlock = BasicBlock
    tvr.Bottleneck = Bottleneck
    tvr.conv1x1 = conv1x1
    tvm.resnet = tvr
    tv.models = tvm
    sys.modules.update({'torchvision': tv, 'torchvision.models': tvm,
                        'torchvision.models.resnet': tvr})


_stub_torchvision()


# ---------------------------------------------------------------------------
# dataset_base: 2D normalization + 3D features
# ---------------------------------------------------------------------------

def _random_pose(rng, degenerate=False):
    kp = rng.normal(0, 40, (17, 3)).astype(np.float32)
    kp[:, :2] += rng.uniform(100, 500, 2).astype(np.float32)
    kp[:, 2] = rng.uniform(0, 1, 17)
    if degenerate:  # all torso points identical -> max_torso_dist == 0
        from vpd_tpu.geometry.coco import COCO_TORSO_POINTS
        kp[COCO_TORSO_POINTS] = kp[COCO_TORSO_POINTS[0]]
    return kp


@pytest.mark.parametrize('zero_confs', [False, True])
@pytest.mark.parametrize('bones', [False, True])
def test_normalize_2d_skeleton_oracle(zero_confs, bones):
    from vipe_dataset import dataset_base as ref

    from vpd_tpu.geometry import coco

    rng = np.random.default_rng(0)
    poses = [_random_pose(rng) for _ in range(8)]
    poses.append(_random_pose(rng, degenerate=True))
    flips = [bool(i % 2) for i in range(len(poses))]

    want = [ref.normalize_2d_skeleton(
        kp, flip, to_tensor=False, zero_confs=zero_confs,
        include_bone_features=bones) for kp, flip in zip(poses, flips)]
    got = [coco.normalize_2d_skeleton(
        kp, flip, zero_confs=zero_confs, include_bone_features=bones)
        for kp, flip in zip(poses, flips)]
    got_batch = coco.normalize_2d_skeleton_batch(
        np.stack(poses), np.array(flips), zero_confs=zero_confs,
        include_bone_features=bones)
    for w, g, gb in zip(want, got, got_batch):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gb, w, rtol=1e-4, atol=1e-5)

    jax = pytest.importorskip('jax')
    del jax
    got_dev = np.asarray(coco.normalize_2d_batch(
        np.stack(poses), np.array(flips), zero_confs=zero_confs,
        include_bone_features=bones))
    np.testing.assert_allclose(
        got_dev, np.stack(want), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('extremities', [False, True])
@pytest.mark.parametrize('root_dirs', [True, False])
def test_get_3d_features_oracle(extremities, root_dirs):
    from vipe_dataset import dataset_base as ref
    from vipe_dataset import human36m as ref_h36m

    from vpd_tpu.geometry.features3d import get_3d_features
    from vpd_tpu.geometry.human36m import SPEC

    rng = np.random.default_rng(1)
    for _ in range(6):
        offsets = rng.normal(0, 0.3, (20, 3))
        offsets += np.sign(offsets) * 0.05  # keep norms well away from 0
        want = ref.get_3d_features(
            offsets, ref_h36m, include_extremities=extremities,
            include_root_directions=root_dirs)
        got = get_3d_features(
            offsets, SPEC, include_extremities=extremities,
            include_root_directions=root_dirs)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_3d_offset_helpers_oracle():
    from vipe_dataset import dataset_base as ref

    from vpd_tpu.geometry import features3d

    rng = np.random.default_rng(2)
    offs = rng.normal(0, 1, (20, 3)) + 0.1
    wo, wd = ref.normalize_3d_offsets(offs.copy())
    go, gd = features3d.normalize_3d_offsets(offs.copy())
    np.testing.assert_allclose(go, wo)
    np.testing.assert_allclose(gd, wd)

    for i in range(20):
        a = ref.normalize_3d_offsets(rng.normal(0, 1, (20, 3)) + 0.1)[0]
        b = ref.normalize_3d_offsets(rng.normal(0, 1, (20, 3)) + 0.1)[0]
        ignore = [0, 3] if i % 3 == 0 else None
        assert (ref.is_good_3d_neg_sample(a, b, ignore)
                == features3d.is_good_3d_neg_sample(a, b, ignore))


# ---------------------------------------------------------------------------
# models/keypoint.py epoch loss vs the fused VIPE step
# ---------------------------------------------------------------------------

EMB, BLOCKS, HID = 8, 2, 32
IN_DIM = 13 * 3
TGT = 140  # human36m: 20 edges x 7 features


def _torch_vipe_model(seed, dropout=0.3):
    import models.module as mm
    from models.keypoint import Keypoint_EmbeddingModel

    torch.manual_seed(seed)
    enc = mm.FCResNet(IN_DIM, EMB, BLOCKS, HID, dropout=dropout)
    dec = mm.FCPoseDecoder(EMB, [24, 16], [('human36m', TGT)])
    gen = torch.Generator().manual_seed(seed + 1)
    for mod in list(enc.modules()) + list(dec.modules()):
        if isinstance(mod, torch.nn.BatchNorm1d):  # non-trivial stats
            with torch.no_grad():
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * .1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=gen) + .5)
    return Keypoint_EmbeddingModel(enc, {'3d': dec}, 'cpu'), enc, dec


def _transplant(enc, dec):
    """Torch FCResNet encoder + FCPoseDecoder -> flax variable tree."""
    from vpd_tpu.models.torch_compat import _dense, \
        convert_fcresnet_state_dict

    enc_sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    enc_params, enc_stats = convert_fcresnet_state_dict(enc_sd, BLOCKS)

    trunk_linears = [m for m in dec.fcn.modules()
                     if isinstance(m, torch.nn.Linear)]
    dec_params = {'FCNet_0': {
        'Dense_{}'.format(i): {
            'kernel': _dense(m.weight.detach().numpy()),
            'bias': m.bias.detach().numpy()}
        for i, m in enumerate(trunk_linears)}}
    head = dec.target_dict['human36m']
    dec_params['_MultiHead_0'] = {
        'kernel': _dense(head.weight.detach().numpy())[None],
        'bias': head.bias.detach().numpy()[None]}
    return ({'encoder': enc_params, 'decoder': dec_params},
            {'encoder': enc_stats})


def test_vipe_epoch_loss_oracle():
    """One eval epoch through the reference Keypoint_EmbeddingModel vs the
    fused jitted step, same weights, same batches (ref models/keypoint.py
    :38-126; repo train/vipe.py)."""
    import optax

    from vpd_tpu.train.vipe import (VIPEModel, VIPETrainState,
                                    make_eval_step)
    from vpd_tpu.models.fc import FCPoseDecoder, FCResNet

    ref_model, enc, dec = _torch_vipe_model(seed=3)

    rng = np.random.default_rng(4)
    n, batches = 16, 3
    raw = []
    for _ in range(batches):
        raw.append({
            'pose1': rng.normal(0, .5, (n, 13, 3)).astype(np.float32),
            'pose2': rng.normal(0, .5, (n, 13, 3)).astype(np.float32),
            'pose_neg': rng.normal(0, .5, (n, 13, 3)).astype(np.float32),
            'neg_valid': (rng.uniform(size=n) < .8).astype(np.float32),
            'kp_features': rng.normal(0, .4, (n, TGT)).astype(np.float32),
        })

    torch_loader = [{
        'pose1': torch.from_numpy(b['pose1']),
        'pose2': torch.from_numpy(b['pose2']),
        'pose_neg': torch.from_numpy(b['pose_neg']),
        'pose_neg_is_valid': torch.from_numpy(b['neg_valid']),
        'kp_features': torch.from_numpy(
            b['kp_features'].reshape(n, 20, 7)),
    } for b in raw]
    want_contra, want_loss, want_per_ds = ref_model.epoch(
        [('human36m', torch_loader)], optimizer=None)

    model = VIPEModel(
        encoder=FCResNet(EMB, BLOCKS, HID),
        decoder=FCPoseDecoder((24, 16), (TGT,)))
    params, stats = _transplant(enc, dec)
    state = VIPETrainState.create(
        {'params': params, 'batch_stats': stats}, optax.sgd(0.))
    eval_step = make_eval_step(model, kp_mask=np.ones((1, TGT)))

    loss_sum = contra_sum = total_n = 0.0
    for b in raw:
        metrics = eval_step(state, {
            'pose1': b['pose1'], 'pose2': b['pose2'],
            'pose_neg': b['pose_neg'], 'neg_valid': b['neg_valid'],
            'kp_features': b['kp_features'],
            'dataset_id': np.zeros(n, np.int32),
            'has_3d': np.ones(n, np.float32),
        })
        loss_sum += float(metrics['loss_sum'])
        contra_sum += float(metrics['contra_sum'])
        total_n += float(metrics['n'])

    assert total_n == n * batches
    np.testing.assert_allclose(loss_sum / total_n, want_loss, rtol=2e-4)
    np.testing.assert_allclose(contra_sum / total_n, want_contra,
                               rtol=2e-4)
    np.testing.assert_allclose(loss_sum / total_n, want_per_ds['human36m'],
                               rtol=2e-4)


def test_vipe_train_trajectory_oracle():
    """Full backward + AdamW trajectory of the VIPE teacher vs the
    reference, head-to-head.

    3 REAL optimizer steps of `models/keypoint.py:38-126` epoch (train
    mode: BatchNorm1d batch stats, hinge + masked-neg + 2-view lifting
    MSE, `batch_loss /= batch_n` BEFORE backward at `:112-116`, AdamW as
    `train_vipe_model.py:312-316` builds it over encoder+decoder params
    `:164-169`) vs 3 steps of our fused jitted train step, transplanted
    init, identical batches, both sides f64 (see the VPD trajectory
    oracle above for why f64). Dropout 0 on both sides — torch and jax
    cannot share dropout masks, and optimizer parity is what's on trial.
    """
    import optax

    from vpd_tpu.models.fc import FCPoseDecoder, FCResNet
    from vpd_tpu.train.vipe import (VIPEModel, VIPETrainState,
                                    make_train_step)

    import jax
    import jax.numpy as jnp

    n_steps, n, lr = 3, 16, 1e-3
    ref_model, enc, dec = _torch_vipe_model(seed=7, dropout=0.)
    enc.double()
    dec.double()
    opt = torch.optim.AdamW(
        list(enc.parameters()) + list(dec.parameters()), lr=lr)

    rng = np.random.default_rng(8)
    raw = []
    for _ in range(n_steps):
        raw.append({
            'pose1': rng.normal(0, .5, (n, 13, 3)),
            'pose2': rng.normal(0, .5, (n, 13, 3)),
            'pose_neg': rng.normal(0, .5, (n, 13, 3)),
            'neg_valid': (rng.uniform(size=n) < .8).astype(np.float64),
            'kp_features': rng.normal(0, .4, (n, TGT)),
        })

    params0, stats0 = _transplant(enc, dec)
    params0 = jax.tree_util.tree_map(np.copy, params0)  # torch views!
    stats0 = jax.tree_util.tree_map(np.copy, stats0)
    init_ref = jax.tree_util.tree_map(np.copy, params0)

    # reference: one epoch() call per batch -> per-step loss trace;
    # optimizer and BN running stats persist across calls
    ref_steps = [
        ref_model.epoch(
            [('human36m', [{
                'pose1': torch.from_numpy(b['pose1']),
                'pose2': torch.from_numpy(b['pose2']),
                'pose_neg': torch.from_numpy(b['pose_neg']),
                'pose_neg_is_valid': torch.from_numpy(b['neg_valid']),
                'kp_features': torch.from_numpy(
                    b['kp_features'].reshape(n, 20, 7)),
            }])],
            optimizer=opt)
        for b in raw]

    with jax.enable_x64():
        model = VIPEModel(
            encoder=FCResNet(EMB, BLOCKS, HID, dropout=0.,
                             dtype=jnp.float64),
            decoder=FCPoseDecoder((24, 16), (TGT,), dtype=jnp.float64))
        sample = {
            'pose1': jnp.zeros((2, 13, 3), jnp.float64),
            'pose2': jnp.zeros((2, 13, 3), jnp.float64),
            'pose_neg': jnp.zeros((2, 13, 3), jnp.float64),
            'dataset_id': jnp.zeros(2, jnp.int32),
        }
        template = model.init({'params': jax.random.key(0)}, sample,
                              train=False)
        jax.tree_util.tree_map(  # same treedef or the transplant is wrong
            lambda a, b: None, dict(template['params']), params0)
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                         weight_decay=0.01)  # torch AdamW defaults
        state = VIPETrainState.create(
            {'params': params0, 'batch_stats': stats0}, tx)
        step = make_train_step(model, kp_mask=np.ones((1, TGT)))
        our_steps = []
        for b in raw:
            state, metrics = step(state, {
                'pose1': b['pose1'], 'pose2': b['pose2'],
                'pose_neg': b['pose_neg'], 'neg_valid': b['neg_valid'],
                # the reference casts targets to f32 even in double mode
                # (`models/keypoint.py:89` `.float()`): round ours the
                # same way or the losses differ at the f32-target level
                'kp_features': b['kp_features'].astype(np.float32)
                                               .astype(np.float64),
                'dataset_id': np.zeros(n, np.int32),
                'has_3d': np.ones(n, np.float64),
            }, jax.random.key(1))
            our_steps.append((float(metrics['contra_sum']) / n,
                              float(metrics['loss_sum']) / n))
        final_params = jax.device_get(dict(state.params))
        final_stats = jax.device_get(dict(state.batch_stats))

    for i, ((contra, loss), (rc, rl, _)) in enumerate(
            zip(our_steps, ref_steps)):
        assert abs(loss - rl) / abs(rl) < 1e-9, (i, loss, rl)
        assert abs(contra - rc) / (abs(rc) + 1e-12) < 1e-9, (i, contra, rc)

    final_ref, stats_ref = _transplant(enc, dec)

    def check_leaf(path, ours, reff, init):
        ours, reff, init = map(np.asarray, (ours, reff, init))
        delta = np.linalg.norm(reff - init)
        err = np.linalg.norm(ours - reff)
        # the absolute floor covers leaves whose gradient is ~0: Adam's
        # step-1 update there is g/(|g|+eps)-shaped and f64 rounding of
        # a near-zero g moves the update at the 1e-10 level
        assert err <= 1e-7 * delta + 1e-9, \
            (jax.tree_util.keystr(path), err, delta)

    jax.tree_util.tree_map_with_path(
        check_leaf, final_params, final_ref, init_ref)

    # running means exact; running vars carry the flax-biased vs
    # torch-unbiased n/(n-1) factor (n = batch rows = 16 here, QUIRKS.md)
    def check_stat(path, ours, reff):
        key = jax.tree_util.keystr(path)
        ours, reff = np.asarray(ours), np.asarray(reff)
        err = np.linalg.norm(ours - reff) / (np.linalg.norm(reff) + 1e-8)
        assert err < (0.2 if 'var' in key else 1e-9), (key, err)

    jax.tree_util.tree_map_with_path(
        check_stat, final_stats, stats_ref)


def test_import_resume_trajectory_oracle(tmp_path):
    """Seamless --resume of a torch VIPE run: train 2 steps in torch,
    save exactly what `train_vipe_model.save_model` saves (`:171-183`
    encoder + decoder-3d + optimizer state dicts + config.json), convert
    with `tools/import_torch_model` (decoder heads onto the padded
    multi-head, AdamW exp_avg/exp_avg_sq/step onto the optax state),
    then take step 3 HERE and step 3 in torch — they must match: loss,
    post-step params, and the carried-over Adam moments all line up only
    if the optimizer-state conversion preserved per-leaf moments through
    the same transposes as the weights. Both sides f64.
    """
    import optax

    import jax
    import jax.numpy as jnp
    from vpd_tpu.core import checkpoint as ckpt
    from vpd_tpu.core.io import store_json
    from vpd_tpu.models.fc import FCPoseDecoder, FCResNet
    from vpd_tpu.tools.import_torch_model import main as import_main
    from vpd_tpu.train.vipe import (VIPETrainState, make_train_step)

    n, lr, hid = 16, 1e-3, 16
    ref_model, enc, dec = _torch_vipe_model(seed=19, dropout=0.)
    # config-expressible decoder: decoder_arch=(2, hid) -> [hid, hid]
    import models.module as mm
    dec = mm.FCPoseDecoder(EMB, [hid, hid], [('human36m', TGT)])
    from models.keypoint import Keypoint_EmbeddingModel
    ref_model = Keypoint_EmbeddingModel(enc, {'3d': dec}, 'cpu')
    enc.double()
    dec.double()
    opt = torch.optim.AdamW(
        list(enc.parameters()) + list(dec.parameters()), lr=lr)

    rng = np.random.default_rng(20)

    def batch():
        return {
            'pose1': rng.normal(0, .5, (n, 13, 3)),
            'pose2': rng.normal(0, .5, (n, 13, 3)),
            'pose_neg': rng.normal(0, .5, (n, 13, 3)),
            'neg_valid': (rng.uniform(size=n) < .8).astype(np.float64),
            'kp_features': rng.normal(0, .4, (n, TGT)),
        }

    def ref_step(b):
        return ref_model.epoch(
            [('human36m', [{
                'pose1': torch.from_numpy(b['pose1']),
                'pose2': torch.from_numpy(b['pose2']),
                'pose_neg': torch.from_numpy(b['pose_neg']),
                'pose_neg_is_valid': torch.from_numpy(b['neg_valid']),
                'kp_features': torch.from_numpy(
                    b['kp_features'].reshape(n, 20, 7)),
            }])],
            optimizer=opt)

    for _ in range(2):  # the "interrupted" torch run
        ref_step(batch())

    # save exactly as train_vipe_model.save_model does (:171-183)
    src = tmp_path / 'torch_run'
    src.mkdir()
    torch.save(enc.state_dict(), src / 'epoch0002.encoder.pt')
    torch.save(dec.state_dict(), src / 'epoch0002.decoder-3d.pt')
    torch.save(opt.state_dict(), src / 'epoch0002.optimizer.pt')
    store_json(str(src / 'config.json'), {
        'datasets': [{'name': 'human36m', '3d_pose_shape': [20, 7],
                      'mean_kp_offset_norms': None}],
        'num_epochs': 10, 'learning_rate': lr, 'batch_size': n,
        'embedding_dim': EMB, 'encoder_arch': [BLOCKS, HID],
        'decoder_arch': [2, hid], 'embed_bones': False,
        'augment_camera': True})

    out = tmp_path / 'imported'
    import_main(str(src), str(out))

    b3 = batch()
    rl3 = ref_step(b3)[1]  # torch takes step 3

    with jax.enable_x64():
        from vpd_tpu.train.vipe import VIPEModel
        model = VIPEModel(
            encoder=FCResNet(EMB, BLOCKS, HID, dropout=0.,
                             dtype=jnp.float64),
            decoder=FCPoseDecoder((hid, hid), (TGT,), dropout=0.,
                                  dtype=jnp.float64))
        sample = {
            'pose1': jnp.zeros((2, 13, 3), jnp.float64),
            'pose2': jnp.zeros((2, 13, 3), jnp.float64),
            'pose_neg': jnp.zeros((2, 13, 3), jnp.float64),
            'dataset_id': jnp.zeros(2, jnp.int32),
        }
        template = model.init({'params': jax.random.key(0)}, sample,
                              train=False)
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                         weight_decay=0.01)
        state = VIPETrainState.create(
            {'params': template['params'],
             'batch_stats': template.get('batch_stats', {})}, tx)

        # restore the imported bundle exactly as VIPETrainer.load_model
        enc_t = ckpt.load_component(
            str(out), 'epoch0002', 'encoder',
            {'params': state.params['encoder'],
             'batch_stats': state.batch_stats['encoder']})
        dec_t = ckpt.load_component(
            str(out), 'epoch0002', 'decoder-3d',
            {'params': state.params['decoder'], 'batch_stats': {}})
        opt_t = ckpt.load_component(
            str(out), 'epoch0002', 'optimizer', state.opt_state)
        state = state.replace(
            params={'encoder': enc_t['params'],
                    'decoder': dec_t['params']},
            batch_stats={'encoder': enc_t['batch_stats'],
                         'decoder': state.batch_stats.get('decoder', {})},
            opt_state=opt_t)

        step = make_train_step(model, kp_mask=np.ones((1, TGT)))
        state, metrics = step(state, {
            'pose1': b3['pose1'], 'pose2': b3['pose2'],
            'pose_neg': b3['pose_neg'], 'neg_valid': b3['neg_valid'],
            'kp_features': b3['kp_features'].astype(np.float32)
                                            .astype(np.float64),
            'dataset_id': np.zeros(n, np.int32),
            'has_3d': np.ones(n, np.float64),
        }, jax.random.key(2))
        our_l3 = float(metrics['loss_sum']) / n
        final_params = jax.device_get(dict(state.params))

    assert abs(our_l3 - rl3) / abs(rl3) < 1e-9, (our_l3, rl3)

    final_ref, _ = _transplant(enc, dec)  # torch after ITS step 3

    def check_leaf(path, ours, reff):
        ours, reff = np.asarray(ours), np.asarray(reff)
        err = np.linalg.norm(ours - reff)
        # atol floor: near-zero-gradient leaves carry Adam's f64
        # rounding sensitivity (see the VPD trajectory oracle)
        assert err <= 1e-9 + 1e-8 * np.linalg.norm(reff), \
            (jax.tree_util.keystr(path), err)

    jax.tree_util.tree_map_with_path(
        check_leaf, final_params['encoder'], final_ref['encoder'])
    jax.tree_util.tree_map_with_path(
        check_leaf, final_params['decoder'], final_ref['decoder'])


def test_export_resume_trajectory_oracle(tmp_path):
    """The mirror of the import oracle: train 2 steps HERE, save the
    trainer's bundle (encoder + decoder-3d + optimizer), export with
    `tools/export_torch_model`, `load_state_dict` everything into torch
    models + a torch AdamW exactly as `train_vipe_model.load_model`
    does (`:186-209`), then take step 3 on both sides — torch's
    continuation must match ours to 1e-9. Both sides f64.
    """
    import optax

    import jax
    import jax.numpy as jnp
    from vpd_tpu.core import checkpoint as ckpt
    from vpd_tpu.core.io import store_json
    from vpd_tpu.models.fc import FCPoseDecoder, FCResNet
    from vpd_tpu.tools.export_torch_model import main as export_main
    from vpd_tpu.train.vipe import (VIPEModel, VIPETrainState,
                                    make_train_step)

    n, lr, hid = 16, 1e-3, 16
    rng = np.random.default_rng(23)

    def batch():
        return {
            'pose1': rng.normal(0, .5, (n, 13, 3)),
            'pose2': rng.normal(0, .5, (n, 13, 3)),
            'pose_neg': rng.normal(0, .5, (n, 13, 3)),
            'neg_valid': (rng.uniform(size=n) < .8).astype(np.float64),
            'kp_features': rng.normal(0, .4, (n, TGT)),
        }

    with jax.enable_x64():
        model = VIPEModel(
            encoder=FCResNet(EMB, BLOCKS, HID, dropout=0.,
                             dtype=jnp.float64),
            decoder=FCPoseDecoder((hid, hid), (TGT,), dropout=0.,
                                  dtype=jnp.float64))
        sample = {
            'pose1': jnp.zeros((2, 13, 3), jnp.float64),
            'pose2': jnp.zeros((2, 13, 3), jnp.float64),
            'pose_neg': jnp.zeros((2, 13, 3), jnp.float64),
            'dataset_id': jnp.zeros(2, jnp.int32),
        }
        variables = model.init({'params': jax.random.key(3)}, sample,
                               train=False)
        # flax initializers emit f32 params even under x64 (param_dtype
        # default); cast so the whole trajectory is stored in f64 like
        # the torch double() side
        f64 = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: jnp.asarray(a, jnp.float64), t)
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                         weight_decay=0.01)
        state = VIPETrainState.create(
            {'params': f64(variables['params']),
             'batch_stats': f64(variables.get('batch_stats', {}))}, tx)
        step = make_train_step(model, kp_mask=np.ones((1, TGT)))

        def our_step(s, b):
            return step(s, {
                'pose1': b['pose1'], 'pose2': b['pose2'],
                'pose_neg': b['pose_neg'], 'neg_valid': b['neg_valid'],
                'kp_features': b['kp_features'].astype(np.float32)
                                               .astype(np.float64),
                'dataset_id': np.zeros(n, np.int32),
                'has_3d': np.ones(n, np.float64),
            }, jax.random.key(4))

        for _ in range(2):  # the "interrupted" run here
            state, _ = our_step(state, batch())

        src = tmp_path / 'here_run'
        src.mkdir()
        ckpt.save_bundle(str(src), 'epoch0002', {
            'encoder': {'params': state.params['encoder'],
                        'batch_stats': state.batch_stats['encoder']},
            'decoder-3d': {'params': state.params['decoder'],
                           'batch_stats': {}},
            'optimizer': state.opt_state,
        })
        store_json(str(src / 'config.json'), {
            'datasets': [{'name': 'human36m', '3d_pose_shape': [20, 7],
                          'mean_kp_offset_norms': None}],
            'num_epochs': 10, 'learning_rate': lr, 'batch_size': n,
            'embedding_dim': EMB, 'encoder_arch': [BLOCKS, HID],
            'decoder_arch': [2, hid], 'embed_bones': False,
            'augment_camera': True})

        out = tmp_path / 'exported'
        export_main(str(src), str(out))

        b3 = batch()
        state, metrics = our_step(state, b3)  # our step 3
        our_l3 = float(metrics['loss_sum']) / n
        final_ours = jax.device_get(dict(state.params))

    # torch side: fresh models + AdamW, everything load_state_dict'd
    # from the export, exactly as train_vipe_model.load_model does
    import models.module as mm
    from models.keypoint import Keypoint_EmbeddingModel

    enc = mm.FCResNet(IN_DIM, EMB, BLOCKS, HID, dropout=0).double()
    dec = mm.FCPoseDecoder(EMB, [hid, hid], [('human36m', TGT)]).double()
    opt = torch.optim.AdamW(
        list(enc.parameters()) + list(dec.parameters()), lr=lr)
    enc.load_state_dict(torch.load(str(out / 'epoch0002.encoder.pt'),
                                   map_location='cpu'))
    dec.load_state_dict(torch.load(str(out / 'epoch0002.decoder-3d.pt'),
                                   map_location='cpu'))
    opt.load_state_dict(torch.load(str(out / 'epoch0002.optimizer.pt'),
                                   map_location='cpu'))
    ref_model = Keypoint_EmbeddingModel(enc, {'3d': dec}, 'cpu')

    rl3 = ref_model.epoch(
        [('human36m', [{
            'pose1': torch.from_numpy(b3['pose1']),
            'pose2': torch.from_numpy(b3['pose2']),
            'pose_neg': torch.from_numpy(b3['pose_neg']),
            'pose_neg_is_valid': torch.from_numpy(b3['neg_valid']),
            'kp_features': torch.from_numpy(
                b3['kp_features'].reshape(n, 20, 7)),
        }])],
        optimizer=opt)[1]

    assert abs(our_l3 - rl3) / abs(rl3) < 1e-9, (our_l3, rl3)

    final_ref, _ = _transplant(enc, dec)  # torch after ITS step 3

    def check_leaf(path, ours, reff):
        ours, reff = np.asarray(ours), np.asarray(reff)
        err = np.linalg.norm(ours - reff)
        assert err <= 1e-9 + 1e-8 * np.linalg.norm(reff), \
            (jax.tree_util.keystr(path), err)

    jax.tree_util.tree_map_with_path(
        check_leaf, final_ours['encoder'], final_ref['encoder'])
    jax.tree_util.tree_map_with_path(
        check_leaf, final_ours['decoder'], final_ref['decoder'])


def test_fcresnet_forward_oracle():
    """Reference FCResNet forward (the real models/module.py, not a
    re-typed mirror) vs flax FCResNet with transplanted weights."""
    import models.module as mm

    from vpd_tpu.models.fc import FCResNet
    from vpd_tpu.models.torch_compat import convert_fcresnet_state_dict

    torch.manual_seed(5)
    tmod = mm.FCResNet(IN_DIM, EMB, BLOCKS, HID)
    tmod.eval()
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = convert_fcresnet_state_dict(sd, BLOCKS)

    x = np.random.default_rng(6).normal(0, 1, (9, IN_DIM)) \
        .astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()
    got = np.asarray(FCResNet(EMB, BLOCKS, HID).apply(
        {'params': params, 'batch_stats': stats}, x, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# util/proposal.py get_proposals + action_dataset/load.py group_by_frame
# ---------------------------------------------------------------------------

def test_get_proposals_oracle():
    from util.proposal import BaseProposalModel

    from vpd_tpu.train.proposal import get_proposals

    rng = np.random.default_rng(7)
    for trial in range(50):
        scores = rng.uniform(0, 1, rng.integers(1, 60))
        thresh = float(rng.uniform(0.2, 0.8))
        min_len = int(rng.integers(0, 5))
        merge = int(rng.integers(0, 4))
        want = BaseProposalModel.get_proposals(
            scores, thresh, min_prop_len=min_len, merge_thresh=merge)
        got = get_proposals(
            scores, thresh, min_prop_len=min_len, merge_thresh=merge)
        assert [p for p, _ in got] == [p for p, _ in want], trial
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-12)


def _random_embs(rng, two_d):
    frames = sorted(rng.choice(100, size=rng.integers(2, 20),
                               replace=False).tolist())
    embs = []
    for f in frames:
        for _ in range(rng.integers(1, 3)):  # duplicate frames happen
            shape = (2, 6) if two_d else (6,)
            embs.append((int(f), rng.normal(0, 1, shape), {'score': 1.0}))
    return embs


@pytest.mark.parametrize('two_d', [False, True])
def test_group_by_frame_oracle(two_d):
    from action_dataset import load as ref

    from vpd_tpu.datasets import load as mine

    rng = np.random.default_rng(8)
    for _ in range(10):
        embs = _random_embs(rng, two_d)
        want_dense, want_mask = ref.group_by_frame(list(embs))
        got_dense, got_mask = mine.group_by_frame(list(embs))
        np.testing.assert_allclose(got_dense, want_dense)
        np.testing.assert_array_equal(got_mask, want_mask)

        x = rng.normal(0, 2, (12, 6) if not two_d else (12, 2, 6))
        np.testing.assert_allclose(
            mine.normalize_rows(x.copy()), ref.normalize_rows(x.copy()))


# ---------------------------------------------------------------------------
# util/torch/cyclic_scheduler.py vs core/schedule.py
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('epoch_size,batch_size,restart_period', [
    (104, 16, 4),   # ragged final batch, several t_mult=2 restarts
    (96, 16, 3),    # exact batches
    (50, 50, 1),    # single batch per epoch, restart every epoch
])
def test_cyclic_scheduler_oracle(epoch_size, batch_size, restart_period):
    """The reference's vendored adamwr scheduler (the actual torch class,
    driven exactly as util/classifier.py:205-289 drives it) vs
    core/schedule.CyclicCosineRestarts, full (lr, wd) trajectories."""
    from util.torch.cyclic_scheduler import CyclicLRWithRestarts

    from vpd_tpu.core.schedule import CyclicCosineRestarts

    lr0 = 1e-3
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr0)  # wd = torch default 0.01
    ref = CyclicLRWithRestarts(opt, batch_size, epoch_size,
                               restart_period=restart_period)
    mine = CyclicCosineRestarts(lr0, 0.01, batch_size, epoch_size,
                                restart_period=restart_period)

    n_batches = math.ceil(epoch_size / batch_size)
    for epoch in range(13):
        ref.step()
        mine.epoch_start()
        for _ in range(n_batches):
            g = opt.param_groups[0]
            # worst observed divergence is ~5e-11 (fp association order
            # inside the cosine policy), far below training significance
            assert abs(g['lr'] - mine.lr) < 1e-9, epoch
            assert abs(g['weight_decay'] - mine.weight_decay) < 1e-9
            ref.batch_step()
            mine.batch_step()


# ---------------------------------------------------------------------------
# util/box.py, action_dataset/eval.py, finegym/util.py, diving48/util.py
# ---------------------------------------------------------------------------

def test_box_oracle():
    import util.box as ref_box

    from vpd_tpu.utils import box as mine

    rng = np.random.default_rng(9)
    for _ in range(100):
        vals = rng.integers(0, 50, 8)
        r1, r2 = ref_box.Box(*vals[:4]), ref_box.Box(*vals[4:])
        m1, m2 = mine.Box(*vals[:4]), mine.Box(*vals[4:])
        if r1.w * r1.h + r2.w * r2.h > 0:
            assert mine.calc_iou(m1, m2) == ref_box.calc_iou(r1, r2)
        assert tuple(mine.calc_union(m1, m2)) == \
            tuple(ref_box.calc_union(r1, r2))
        x, y = rng.integers(0, 60, 2)
        assert mine.calc_contains(m1, x, y) == \
            ref_box.calc_contains(r1, x, y)


def test_test_prefixes_oracle():
    from action_dataset import eval as ref_eval

    from vpd_tpu.datasets import eval_splits as mine

    for ds in ('fs', 'fs_jump', 'tennis', 'tennis_swing'):
        assert mine.get_test_prefixes(ds) == ref_eval.get_test_prefixes(ds)


class _Meta:
    def __init__(self, fps):
        self.fps = fps


def _synth_finegym(tmp_path, rng):
    from vpd_tpu.core.io import store_pickle

    annotations, labels, meta = {}, [], {}
    emb_dir = tmp_path / 'embs'
    os.makedirs(emb_dir, exist_ok=True)
    for v in range(3):
        vid = 'V{:03d}'.format(v)
        annotations[vid] = {}
        for e in range(2):
            ev = 'E_{:05d}'.format(e)
            segs = {}
            for a in range(3):
                act = 'A_{:04d}'.format(a)
                s = float(rng.uniform(0, 20))
                segs[act] = {'timestamps': [
                    (s, s + float(rng.uniform(0.5, 8)))]}
                labels.append('{}_E_{:05d}_A_{:04d}'.format(vid, e, a))
            annotations[vid][ev] = {'segments': segs}
            key = '{}_{}'.format(vid, ev)
            meta[key] = _Meta(fps=float(rng.choice([25.0, 29.97, 50.0])))
            embs = [(f, rng.normal(size=4).astype(np.float32), {})
                    for f in range(0, 1200, int(rng.integers(1, 3)))]
            store_pickle(str(emb_dir / (key + '.emb.pkl')), embs)
    labels.append('V999_E_00000_A_0000')  # missing meta -> skipped
    return annotations, labels, meta, str(emb_dir)


@pytest.mark.parametrize('kwargs', [
    {},
    {'target_fps': 10.0, 'norm': True},
    {'target_fps': 10.0, 'interp_skipped': True},
    {'pre_seconds': 1.5, 'min_seconds': 2, 'max_seconds': 4},
])
def test_finegym_load_actions_oracle(tmp_path, kwargs):
    """The fps-subsample accumulator + interp averaging + frame-window
    math, head-to-head on a synthetic corpus (finegym/util.py:66-125)."""
    from finegym import util as ref

    from vpd_tpu.datasets import finegym as mine

    rng = np.random.default_rng(12)
    annotations, labels, meta, emb_dir = _synth_finegym(tmp_path, rng)
    want = ref.load_actions(annotations, labels, meta, emb_dir=emb_dir,
                            **kwargs)
    got = mine.load_actions(annotations, labels, meta, emb_dir=emb_dir,
                            **kwargs)
    assert got.keys() == want.keys() and len(got) == 18
    for k in want:
        assert got[k][0] == want[k][0], k  # (start_frame, end_frame)
        if want[k][1] is None:
            assert got[k][1] is None, k
        else:
            np.testing.assert_allclose(got[k][1], want[k][1], err_msg=k)


@pytest.mark.parametrize('kwargs', [{}, {'target_fps': 12.0, 'norm': True}])
def test_diving48_labels_oracle(tmp_path, kwargs):
    import json

    from diving48 import util as ref

    from vpd_tpu.core.io import store_pickle
    from vpd_tpu.datasets import diving48 as mine

    rng = np.random.default_rng(13)
    emb_dir = tmp_path / 'embs'
    os.makedirs(emb_dir)
    actions = []
    for v in range(5):
        vid = 'dv{:03d}'.format(v)
        s = int(rng.integers(0, 50))
        actions.append({'vid_name': vid, 'start_frame': s,
                        'end_frame': s + int(rng.integers(10, 80)),
                        'label': int(rng.integers(0, 48))})
        embs = [(f, rng.normal(size=4).astype(np.float32), {})
                for f in range(0, 150, int(rng.integers(1, 3)))]
        store_pickle(str(emb_dir / (vid + '.emb.pkl')), embs)
    label_file = str(tmp_path / 'labels.json')
    with open(label_file, 'w') as fp:
        json.dump(actions, fp)
    meta = {a['vid_name']: _Meta(30.0) for a in actions}

    w_labels, w_data = ref.load_labels_and_embeddings(
        label_file, meta_dict=meta, emb_dir=str(emb_dir), **kwargs)
    g_labels, g_data = mine.load_labels_and_embeddings(
        label_file, meta_dict=meta, emb_dir=str(emb_dir), **kwargs)
    assert g_labels == w_labels
    assert g_data.keys() == w_data.keys()
    for k in w_data:
        assert g_data[k][0] == w_data[k][0]
        np.testing.assert_allclose(g_data[k][1], w_data[k][1], err_msg=k)


# ---------------------------------------------------------------------------
# models/module.py conv ResNet (the reference class itself)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('arch,input_dim', [
    ('resnet18', 3), ('resnet34', 5), ('resnet50', 3)])
def test_conv_resnet_oracle(arch, input_dim):
    """The reference's own models.module.ResNet (built with faithful
    torchvision block stubs) vs the flax NHWC ResNet with transplanted
    weights — upgrades test_torch_compat's re-typed mirror to the real
    class (models/module.py:35-131, incl. ENCODER_ARCH layer tables)."""
    import models.module as mm

    from vpd_tpu.models import build_encoder
    from vpd_tpu.models.torch_compat import convert_resnet_state_dict

    cfg = mm.ENCODER_ARCH[arch]
    torch.manual_seed(7)
    tmod = mm.ResNet(cfg.block, cfg.layers, input_dim, 16)
    gen = torch.Generator().manual_seed(8)
    for m in tmod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=gen) * .05)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=gen) + .5)
    tmod.eval()

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    params, stats = convert_resnet_state_dict(sd, arch)

    import jax.numpy as jnp
    x = np.random.default_rng(10).normal(
        0, 1, (2, 32, 32, input_dim)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    model = build_encoder(arch, 16, dtype=jnp.float32)
    got = np.asarray(model.apply(
        {'params': params, 'batch_stats': stats}, x, train=False))
    for w, g in zip(want, got):
        cos = float(np.dot(w, g) / (np.linalg.norm(w) * np.linalg.norm(g)))
        assert cos > 1 - 1e-3, (arch, cos)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# models/rgb.py: the real add_flow_to_model / replace_last_layer surgery
# ---------------------------------------------------------------------------

def _install_resnet_factories():
    """Give the torchvision stub working resnet factories (built on the
    reference's own ResNet class) so models/rgb.py's surgery runs."""
    tvm = sys.modules['torchvision'].models
    tvr = sys.modules['torchvision.models.resnet']

    def factory(layers, block_attr):
        def make(pretrained=False, **kw):
            import models.module as mm
            return mm.ResNet(getattr(tvr, block_attr), layers, 3, 1000)
        return make

    tvm.resnet18 = factory([2, 2, 2, 2], 'BasicBlock')
    tvm.resnet34 = factory([3, 4, 6, 3], 'BasicBlock')
    tvm.resnet50 = factory([3, 4, 6, 3], 'Bottleneck')
    # models.module.ENCODER_ARCH captures torchvision.models.resnetNN at
    # ITS import; if another oracle test imported it before the factories
    # existed (the _AnyAttr stub returns None), repair the captured
    # pretrained_init so RGBF_EmbeddingModel can build backbones.
    mm = sys.modules.get('models.module')
    if mm is not None:
        for arch in ('resnet18', 'resnet34', 'resnet50'):
            cfg = mm.ENCODER_ARCH.get(arch)
            if cfg is not None and cfg.pretrained_init is None:
                mm.ENCODER_ARCH[arch] = cfg._replace(
                    pretrained_init=getattr(tvm, arch))
    if 'efficientnet_pytorch' not in sys.modules:
        ep = types.ModuleType('efficientnet_pytorch')
        ep.EfficientNet = None
        ep.model = None
        sys.modules['efficientnet_pytorch'] = ep


def test_rgb_surgery_oracle():
    """The reference's actual add_flow_to_model (mean-expanded 5-channel
    stem, models/rgb.py:8-37) + replace_last_layer vs
    torch_compat.imagenet_init_variables, compared end-to-end: both
    models see the same surgery and produce the same embeddings."""
    _install_resnet_factories()
    import models.rgb as ref_rgb

    from vpd_tpu.models import build_encoder
    from vpd_tpu.models.torch_compat import (_dense,
                                             imagenet_init_variables)

    import jax.numpy as jnp

    torch.manual_seed(11)
    backbone = sys.modules['torchvision'].models.resnet34()
    gen = torch.Generator().manual_seed(12)
    for m in backbone.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=gen) * .05)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=gen) + .5)
    orig_sd = {k: v.detach().numpy().copy()
               for k, v in backbone.state_dict().items()}

    surgered = ref_rgb.add_flow_to_model(backbone)
    surgered = ref_rgb.replace_last_layer(surgered, 'fc', 16)
    surgered.eval()

    # reference surgery replaces ALL stem channels by the mean kernel
    assert surgered.conv1.weight.shape == (64, 5, 7, 7)
    np.testing.assert_allclose(
        surgered.conv1.weight.detach().numpy(),
        np.broadcast_to(orig_sd['conv1.weight'].mean(1, keepdims=True),
                        (64, 5, 7, 7)), rtol=1e-6)

    params, stats = imagenet_init_variables(orig_sd, 'resnet34',
                                            num_channels=5)
    params['Dense_0'] = {  # share the (random) new head for comparison
        'kernel': _dense(surgered.fc.weight.detach().numpy()),
        'bias': surgered.fc.bias.detach().numpy()}

    x = np.random.default_rng(13).normal(
        0, 1, (2, 32, 32, 5)).astype(np.float32)
    with torch.no_grad():
        want = surgered(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(build_encoder('resnet34', 16, dtype=jnp.float32)
                     .apply({'params': params, 'batch_stats': stats},
                            x, train=False))
    for w, g in zip(want, got):
        cos = float(np.dot(w, g) / (np.linalg.norm(w) * np.linalg.norm(g)))
        assert cos > 1 - 1e-3, cos


# ---------------------------------------------------------------------------
# Sequence classifier heads (util/classifier.py:29-134,
# util/torch/batchnorm1d.py:29-93)
# ---------------------------------------------------------------------------

def _pad_batch(rng, b, t, d):
    """Zero-padded (B, T, D) batch with random valid lengths, max hit."""
    lengths = rng.integers(2, t + 1, size=b)
    lengths[rng.integers(b)] = t
    x = np.zeros((b, t, d), np.float32)
    for i, n in enumerate(lengths):
        x[i, :n] = rng.standard_normal((n, d))
    return x, lengths


def test_masked_batchnorm_oracle():
    """Train steps, running stats, n<=1 fallback and eval vs the gist BN."""
    from util.torch.batchnorm1d import MaskedBatchNorm1d
    import jax.numpy as jnp
    from vpd_tpu.models.gru import MaskedBatchNorm

    rng = np.random.default_rng(0)
    d, t = 5, 7
    ref = MaskedBatchNorm1d(d)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(
            rng.standard_normal(d).astype(np.float32)))
        ref.bias.copy_(torch.from_numpy(
            rng.standard_normal(d).astype(np.float32)))
    model = MaskedBatchNorm()
    variables = {
        'params': {'scale': jnp.asarray(ref.weight.detach().numpy()),
                   'bias': jnp.asarray(ref.bias.detach().numpy())},
        'batch_stats': {'mean': jnp.zeros(d), 'var': jnp.ones(d)},
    }

    def step(x, lengths, train):
        nonlocal variables
        ref.train(train)
        with torch.no_grad():
            want = ref(torch.from_numpy(x).permute(0, 2, 1),
                       torch.from_numpy(lengths)).permute(0, 2, 1).numpy()
        if train:
            got, mut = model.apply(
                variables, jnp.asarray(x), jnp.asarray(lengths),
                train=True, mutable=['batch_stats'])
            variables = {'params': variables['params'],
                         'batch_stats': mut['batch_stats']}
        else:
            got = model.apply(variables, jnp.asarray(x),
                              jnp.asarray(lengths), train=False)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-5)

    for _ in range(3):
        x, lengths = _pad_batch(rng, 4, t, d)
        step(x, lengths, train=True)

    # running stats must agree (unbiased-variance update, momentum flip)
    np.testing.assert_allclose(
        np.asarray(variables['batch_stats']['mean']),
        ref.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(variables['batch_stats']['var']),
        ref.running_var.numpy(), rtol=1e-5, atol=1e-6)

    # n == 1 in train mode: normalize with running stats, no update
    x = np.zeros((1, t, d), np.float32)
    x[0, 0] = rng.standard_normal(d)
    step(x, np.array([1]), train=True)
    np.testing.assert_allclose(
        np.asarray(variables['batch_stats']['var']),
        ref.running_var.numpy(), rtol=1e-5, atol=1e-6)

    x, lengths = _pad_batch(rng, 4, t, d)
    step(x, lengths, train=False)


def _randomize_bn_stats(ref_model, rng):
    for m in ref_model.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(m.running_mean.shape[0])
                    .astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    (rng.random(m.running_var.shape[0]) + 0.5)
                    .astype(np.float32)))


def _transplant_seq(ref_model, cell_type, depth, hidden_dim,
                    use_attention, input_batchnorm):
    """torch Seq state_dict -> flax SeqClassifier variables."""
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    h = hidden_dim
    cell_name = 'TorchGRUCell' if cell_type == 'gru' else 'TorchLSTMCell'
    birnn = {}
    for layer in range(depth):
        for di, suffix in enumerate(['', '_reverse']):
            w_ih = sd['backbone.weight_ih_l%d%s' % (layer, suffix)]
            w_hh = sd['backbone.weight_hh_l%d%s' % (layer, suffix)]
            b_ih = sd['backbone.bias_ih_l%d%s' % (layer, suffix)]
            b_hh = sd['backbone.bias_hh_l%d%s' % (layer, suffix)]
            # the cells keep torch's DOUBLE-bias parameterization (b_ih
            # and b_hh map 1:1, no folding) so Adam bias dynamics match
            if cell_type == 'gru':
                # torch gate order r, z, n
                cell = {}
                for gi, g in enumerate(['r', 'z', 'n']):
                    sl = slice(gi * h, (gi + 1) * h)
                    cell['i' + g] = {'kernel': w_ih[sl].T, 'bias': b_ih[sl]}
                    cell['h' + g] = {'kernel': w_hh[sl].T, 'bias': b_hh[sl]}
            else:
                # torch gate order i, f, g, o
                cell = {}
                for gi, g in enumerate(['i', 'f', 'g', 'o']):
                    sl = slice(gi * h, (gi + 1) * h)
                    cell['i' + g] = {'kernel': w_ih[sl].T, 'bias': b_ih[sl]}
                    cell['h' + g] = {'kernel': w_hh[sl].T, 'bias': b_hh[sl]}
            birnn['%s_%d' % (cell_name, 2 * layer + di)] = cell

    params = {'BiRNN_0': birnn}
    stats = {}
    di = 0
    if use_attention:
        params['Dense_%d' % di] = {'kernel': sd['fc_attn.0.weight'].T,
                                   'bias': sd['fc_attn.0.bias']}
        di += 1
    if input_batchnorm:
        params['MaskedBatchNorm_0'] = {'scale': sd['bn_in.weight'],
                                       'bias': sd['bn_in.bias']}
        stats['MaskedBatchNorm_0'] = {'mean': sd['bn_in.running_mean'],
                                      'var': sd['bn_in.running_var']}
    for bi, (bn_key, lin_key) in enumerate([('fc_out.0', 'fc_out.2'),
                                            ('fc_out.4', 'fc_out.6')]):
        params['BatchNorm_%d' % bi] = {
            'scale': sd[bn_key + '.weight'], 'bias': sd[bn_key + '.bias']}
        stats['BatchNorm_%d' % bi] = {
            'mean': sd[bn_key + '.running_mean'],
            'var': sd[bn_key + '.running_var']}
        params['Dense_%d' % di] = {'kernel': sd[lin_key + '.weight'].T,
                                   'bias': sd[lin_key + '.bias']}
        di += 1
    import jax
    # copy=True: state_dict() arrays are views of live torch buffers that
    # the reference's train-mode forward mutates in place
    return jax.tree_util.tree_map(lambda a: np.array(a, copy=True),
                                  {'params': params, 'batch_stats': stats})


@pytest.mark.parametrize('cell_type,use_attention,input_batchnorm', [
    ('gru', True, True),
    ('gru', False, False),
    ('lstm', True, False),
    ('lstm', False, True),
])
def test_seq_classifier_oracle(cell_type, use_attention, input_batchnorm):
    """Eval AND train forward vs the reference Seq head, weights moved over.

    Train-mode dropout is zeroed on both sides so the comparison
    exercises the batch-stats paths (masked input BN + head BNs).
    """
    from util.classifier import _ABCSeqModel
    import jax.numpy as jnp
    from vpd_tpu.models.gru import SeqClassifier

    rng = np.random.default_rng(7)
    d, hdim, t, b, classes, depth = 6, 4, 9, 5, 3, 2
    torch.manual_seed(3)
    ref = _ABCSeqModel.Seq(cell_type, d, hdim, classes, depth=depth,
                           dropout=0.0, input_dropout=0.0,
                           input_batchnorm=input_batchnorm,
                           use_attention=use_attention)
    _randomize_bn_stats(ref, rng)
    model = SeqClassifier(cell_type, hidden_dim=hdim, num_classes=classes,
                          depth=depth, dropout=0.0, input_dropout=0.0,
                          input_batchnorm=input_batchnorm,
                          use_attention=use_attention)
    variables = _transplant_seq(ref, cell_type, depth, hdim,
                                use_attention, input_batchnorm)

    x, lengths = _pad_batch(rng, b, t, d)
    tx, tl = torch.from_numpy(x), torch.from_numpy(lengths)

    ref.eval()
    with torch.no_grad():
        want = ref(tx, tl).numpy()
    got = model.apply(variables, jnp.asarray(x), jnp.asarray(lengths),
                      train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    ref.train()
    with torch.no_grad():
        want = ref(tx, tl).numpy()
    got, mut = model.apply(variables, jnp.asarray(x), jnp.asarray(lengths),
                           train=True, mutable=['batch_stats'],
                           rngs={'dropout': __import__('jax').random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    # head BN running stats advanced identically (unbiased variance)
    for bi, key in enumerate(['fc_out.0', 'fc_out.4']):
        mod = dict(ref.named_modules())[key]
        np.testing.assert_allclose(
            np.asarray(mut['batch_stats']['BatchNorm_%d' % bi]['var']),
            mod.running_var.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_classifier_train_trajectory_oracle():
    """Full backward + AdamW + cyclic-scheduler trajectory of the
    downstream sequence classifier vs the reference, head-to-head.

    3 REAL training epochs of `util/classifier.py` `BaseSeqModel._epoch`
    (`:262-295`: packed BiGRU in train mode, mean cross-entropy,
    `loss.backward()` + `optimizer.step()`, the vendored
    CyclicLRWithRestarts stepping lr AND normalized weight decay per
    batch exactly as `:204-207` + `:268-289` drive it) against our
    production `_cached_train_step` + `CyclicCosineRestarts` loop from
    transplanted-identical weights on identical batches, both sides f64
    (see the VPD trajectory oracle for why f64). Dropout 0 both sides.
    Every batch contains a full-length sequence so the unmasked
    attention-pooling quirk (QUIRKS.md) sees the same softmax span.
    """
    from util.classifier import _ABCSeqModel, BaseSeqModel
    from util.torch.cyclic_scheduler import CyclicLRWithRestarts

    import jax
    import jax.numpy as jnp
    from vpd_tpu.core.schedule import CyclicCosineRestarts
    from vpd_tpu.models.gru import SeqClassifier
    from vpd_tpu.train.classifier import _cached_train_step, _shared_tx

    d, hdim, t, b, classes, depth = 6, 4, 9, 8, 3, 2
    n_epochs, batches, lr = 3, 2, 1e-3
    epoch_size = b * batches
    rng = np.random.default_rng(17)
    torch.manual_seed(13)
    ref = _ABCSeqModel.Seq('gru', d, hdim, classes, depth=depth,
                           dropout=0.0, input_dropout=0.0,
                           input_batchnorm=True, use_attention=True)
    _randomize_bn_stats(ref, rng)
    ref.double()
    opt = torch.optim.AdamW(ref.parameters(), lr=lr)
    sched_ref = CyclicLRWithRestarts(opt, b, epoch_size,
                                     restart_period=2)

    variables = _transplant_seq(ref, 'gru', depth, hdim, True, True)
    init_ref = jax.tree_util.tree_map(np.copy, variables['params'])

    data = []
    for _ in range(batches):
        x, lengths = _pad_batch(rng, b, t, d)
        data.append((x.astype(np.float64), lengths,
                     rng.integers(0, classes, b).astype(np.int32)))

    loader = [((torch.from_numpy(x), torch.from_numpy(lengths)),
               torch.from_numpy(y.astype(np.int64)))
              for x, lengths, y in data]
    ref_trace = [BaseSeqModel._epoch(ref, loader, 'cpu', opt, None,
                                     sched_ref)
                 for _ in range(n_epochs)]

    model = SeqClassifier('gru', hidden_dim=hdim, num_classes=classes,
                          depth=depth, dropout=0.0, input_dropout=0.0,
                          input_batchnorm=True, use_attention=True)
    with jax.enable_x64():
        params = variables['params']
        batch_stats = variables['batch_stats']
        tx = _shared_tx()
        opt_state = tx.init(params)
        step = _cached_train_step(model)
        sched = CyclicCosineRestarts(lr, 0.01, b, epoch_size,
                                     restart_period=2)
        valid = np.ones(b, bool)  # the trainer passes a bool row mask
        key = jax.random.key(5)
        our_trace = []
        step_i = 0
        for _ in range(n_epochs):
            sched.epoch_start()
            ep_loss = correct = 0.0
            for x, lengths, y in data:
                step_i += 1
                (params, batch_stats, opt_state, loss, corr) = step(
                    params, batch_stats, opt_state,
                    x, lengths, y, valid,
                    np.float64(sched.lr), np.float64(sched.weight_decay),
                    key, np.int32(step_i))
                sched.batch_step()
                ep_loss += float(loss)
                correct += float(corr)
            our_trace.append((ep_loss / epoch_size,
                              correct / epoch_size))
        final_params = jax.device_get(params)
        final_stats = jax.device_get(batch_stats)

    # per-epoch (loss, acc): epoch e > 0 integrates every update AND the
    # scheduler's per-batch (lr, wd) sequence of all prior epochs
    for e, ((ol, oa), (rl, ra)) in enumerate(zip(our_trace, ref_trace)):
        assert abs(ol - rl) / abs(rl) < 1e-9, (e, ol, rl)
        assert oa == ra, (e, oa, ra)

    final_refv = _transplant_seq(ref, 'gru', depth, hdim, True, True)

    def check_leaf(path, ours, reff, init):
        ours, reff, init = map(np.asarray, (ours, reff, init))
        delta = np.linalg.norm(reff - init)
        err = np.linalg.norm(ours - reff)
        assert err <= 1e-7 * delta + 1e-9, \
            (jax.tree_util.keystr(path), err, delta)

    jax.tree_util.tree_map_with_path(
        check_leaf, final_params, final_refv['params'], init_ref)

    # the classifier-head BNs replicate torch running-stat semantics
    # EXACTLY (unbiased variance, masked batch stats) — unlike the conv
    # BNs, running vars here must also agree to f64 exactness
    def check_stat(path, ours, reff):
        ours, reff = np.asarray(ours), np.asarray(reff)
        err = np.linalg.norm(ours - reff) / (np.linalg.norm(reff) + 1e-8)
        assert err < 1e-9, (jax.tree_util.keystr(path), err)

    jax.tree_util.tree_map_with_path(
        check_stat, final_stats, final_refv['batch_stats'])


@pytest.mark.parametrize('depth', [1, 2])
def test_cnn_classifier_oracle(depth):
    """Eval forward vs the reference text-CNN head (classifier.py:103-134)."""
    from util.classifier import _ABCSeqModel
    import jax.numpy as jnp
    from vpd_tpu.models.gru import CNNClassifier

    rng = np.random.default_rng(11)
    d, hdim, t, b, classes = 6, 4, 16, 3, 5
    ks = [3, 5, 7]
    torch.manual_seed(5)
    ref = _ABCSeqModel.CNN(d, hdim, classes, kernel_sizes=ks, depth=depth,
                           dropout=0.0, input_dropout=0.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = {}
    ci = 0
    for i in range(len(ks)):
        params['Conv_%d' % ci] = {
            'kernel': sd['convs.%d.weight' % i].transpose(2, 1, 0),
            'bias': sd['convs.%d.bias' % i]}
        ci += 1
        if depth > 1:
            params['Conv_%d' % ci] = {
                'kernel': sd['convs2.%d.weight' % i].transpose(2, 1, 0),
                'bias': sd['convs2.%d.bias' % i]}
            ci += 1
    params['Dense_0'] = {'kernel': sd['fc.1.weight'].T,
                         'bias': sd['fc.1.bias']}
    params['Dense_1'] = {'kernel': sd['fc.4.weight'].T,
                         'bias': sd['fc.4.bias']}

    model = CNNClassifier(hidden_dim=hdim, num_classes=classes,
                          kernel_sizes=tuple(ks), depth=depth,
                          dropout=0.0, input_dropout=0.0)
    x, lengths = _pad_batch(rng, b, t, d)
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), None).numpy()
    got = model.apply({'params': params}, jnp.asarray(x),
                      jnp.asarray(lengths), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Canonical orientation + flips (vipe_dataset/util.py:57-85)
# ---------------------------------------------------------------------------

def test_canonical_orientation_oracle():
    from vipe_dataset.util import (get_canonical_orientation as ref_fn,
                                   flip_skeleton_offsets as ref_flip)
    from vpd_tpu.geometry.orientation import get_canonical_orientation
    from vpd_tpu.geometry.human36m import SPEC

    rng = np.random.default_rng(21)
    hits = set()
    for i in range(400):
        X = rng.standard_normal((6, 3))
        # scale z to sweep the pitch through all 5 interp branches
        X[:, 2] *= rng.choice([0.05, 0.3, 1.0, 3.0, 20.0])
        fwd = rng.standard_normal(3)
        up = rng.standard_normal(3)
        want = ref_fn(X, fwd, up)
        got = get_canonical_orientation(X, fwd, up)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
        pitch = np.degrees(np.arcsin(want[2] if abs(want[2]) <= 1 else 0))
        hits.add(int(np.clip(pitch // 45, -2, 2)))
    assert len(hits) >= 3  # fuzz actually reached multiple pitch regimes

    # flip: reference free function vs the SkeletonSpec method, using the
    # spec's DERIVED xflip rows
    for _ in range(20):
        arr = rng.standard_normal((len(SPEC.xflip_rows), 3))
        np.testing.assert_allclose(
            SPEC.flip_offsets(arr), ref_flip(arr, list(SPEC.xflip_rows)),
            rtol=1e-12)


# ---------------------------------------------------------------------------
# mean_embs_by_frame (apply_vipe_model.py:39-69)
# ---------------------------------------------------------------------------

def test_mean_embs_by_frame_oracle():
    _stub_torchvision()
    import apply_vipe_model as ref_av
    from vpd_tpu.infer.apply_vipe import mean_embs_by_frame

    rng = np.random.default_rng(5)
    for flip in (False, True):
        pred_embs = []
        for frame in rng.permutation(12)[:8]:
            for _ in range(int(rng.integers(1, 4))):
                metas = ([{'is_flip': False}, {'is_flip': True}]
                         if flip else [{}])
                for meta in metas:
                    meta = dict(meta, kp_score=float(rng.random()))
                    pred_embs.append(
                        (int(frame),
                         rng.standard_normal(4).astype(np.float32), meta))
        want = ref_av.mean_embs_by_frame(list(pred_embs), flip)
        got = mean_embs_by_frame(list(pred_embs), flip)
        assert len(want) == len(got)
        for (wf, we, wm), (gf, ge, gm) in zip(want, got):
            assert wf == gf
            np.testing.assert_allclose(ge, we, rtol=1e-6)
            assert wm == gm


# ---------------------------------------------------------------------------
# Detection AP chain (detect.py:98-238)
# ---------------------------------------------------------------------------

def _stub_numba():
    if 'numba' in sys.modules:
        return
    numba = types.ModuleType('numba')

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda fn: fn

    numba.jit = jit
    numba.njit = jit
    sys.modules['numba'] = numba


def test_detect_ap_oracle():
    _stub_numba()
    import detect as ref_detect
    from vpd_tpu.tasks import eval as our_eval
    from vpd_tpu.tasks.detect import Label, get_video_intervals

    rng = np.random.default_rng(3)

    for _ in range(300):
        a1 = int(rng.integers(0, 50)); a2 = a1 + int(rng.integers(0, 30))
        b1 = int(rng.integers(0, 50)); b2 = b1 + int(rng.integers(0, 30))
        if a2 == a1 and b2 == b1:
            continue  # both degenerate: 0/0
        want = ref_detect.calc_iou(a1, a2, b1, b2)
        got = our_eval.calc_iou(a1, a2, b1, b2)
        assert abs(want - got) < 1e-12, (a1, a2, b1, b2)

    for _ in range(100):
        n = int(rng.integers(1, 60))
        is_tp = list(rng.random(n) < rng.random())
        if not any(is_tp):
            is_tp[int(rng.integers(n))] = True
        num_pos = int(sum(is_tp)) + int(rng.integers(0, 4))
        pc, rc = ref_detect.compute_precision_recall_curve(is_tp, num_pos)
        gpc, grc = our_eval.compute_precision_recall_curve(is_tp, num_pos)
        np.testing.assert_allclose(gpc, pc, rtol=1e-12)
        np.testing.assert_allclose(grc, rc, rtol=1e-12)
        ipc, irc = ref_detect.compute_interpolated_precision(pc, rc)
        gipc, girc = our_eval.compute_interpolated_precision(pc, rc)
        np.testing.assert_allclose(gipc, ipc, rtol=1e-12)
        np.testing.assert_allclose(girc, irc, rtol=1e-12)
        assert abs(ref_detect.compute_ap(pc, rc)
                   - our_eval.compute_ap(pc, rc)) < 1e-12

    for _ in range(30):
        examples = [
            Label('v%d' % rng.integers(0, 4), 'x',
                  s := int(rng.integers(0, 90)), s + int(rng.integers(1, 20)),
                  25.0)
            for _ in range(int(rng.integers(1, 25)))]
        ref_examples = [ref_detect.Label(*l) for l in examples]
        want = ref_detect.get_video_intervals(ref_examples)
        got = get_video_intervals(examples)
        assert set(want) == set(got)
        for k in want:
            assert list(want[k]) == list(got[k]), k


# ---------------------------------------------------------------------------
# Recognition dataset loaders (recognize.py:298-452)
# ---------------------------------------------------------------------------

def _stub_dtw():
    if 'dtw' in sys.modules:
        return
    dtw = types.ModuleType('dtw')
    dtw.dtw = None
    sys.modules['dtw'] = dtw


def _write_emb_file(path, frames, dim, rng):
    import pickle as pkl
    rows = []
    for f in sorted(frames):
        for _ in range(1 + int(rng.integers(0, 2))):  # some frames 2 dets
            rows.append((int(f), rng.standard_normal(dim).astype(np.float32),
                         {'kp_score': float(rng.random())}))
    with open(path, 'wb') as fp:
        pkl.dump(rows, fp)


def _load_ref_pickle(path):
    import pickle as pkl
    with open(path, 'rb') as fp:
        return pkl.load(fp)


def _cmp_loader_outputs(want, got):
    (rcat, rtre, rtrl, rve, rvl, rte, rtl, rints) = want
    (gcat, gtre, gtrl, gve, gvl, gte, gtl, gints) = got
    assert ({k: v.name for k, v in rcat.items()}
            == {k: v.name for k, v in gcat.items()})
    for re_, ge in ((rtre, gtre), (rve, gve), (rte, gte)):
        assert set(re_) == set(ge)
        for k in re_:
            if re_[k] is None:
                assert ge[k] is None, k
            else:
                np.testing.assert_allclose(ge[k], re_[k],
                                           rtol=1e-6, atol=1e-8)
    assert rtrl == gtrl and rvl == gvl and rtl == gtl
    assert set(rints) == set(gints)
    for k in rints:
        np.testing.assert_allclose(
            np.asarray(gints[k], dtype=float),
            np.asarray(rints[k], dtype=float), rtol=1e-9)


def test_recognize_tennis_loader_oracle(tmp_path, monkeypatch):
    """Windowing, split routing and interval math vs recognize.py:298-382."""
    _stub_dtw()
    import recognize as ref_recognize
    from vpd_tpu.datasets.recognition_data import load_tennis_data

    rng = np.random.default_rng(17)
    cache = _load_ref_pickle(
        os.path.join(REF, 'data/sports.cache/tennis.video_meta.pkl'))
    clips_by_video = {}
    for clip_name in cache:
        video, s, e = clip_name.rsplit('_', 2)
        clips_by_video.setdefault(video, []).append(
            (int(s), int(e), clip_name))

    with open(os.path.join(REF, 'action_dataset/tennis/all.txt')) as fp:
        all_actions = [l.strip().split(' ') for l in fp if l.strip()]
    val_ids = set()
    with open(os.path.join(REF, 'action_dataset/tennis/val.ids.txt')) as fp:
        val_ids = {l.strip() for l in fp if l.strip()}
    from vpd_tpu.datasets.eval_splits import get_test_prefixes
    test_prefixes = get_test_prefixes('tennis')

    # choose actions: >=4 per split with a matching clip, plus 2 unmatched
    counts = {'train': 0, 'val': 0, 'test': 0, 'none': 0}
    selected, emb_frames = [], {}
    for action, label in all_actions:
        base, player, frame = action.split(':')
        frame = int(frame)
        hit = next(((s, e, c) for s, e, c in clips_by_video.get(base, [])
                    if s <= frame <= e), None)
        split = ('test' if base.startswith(test_prefixes)
                 else 'val' if action in val_ids else 'train')
        if hit is None:
            if counts['none'] < 2:
                counts['none'] += 1
                selected.append((action, label))
            continue
        if counts[split] >= 4:
            continue
        counts[split] += 1
        selected.append((action, label))
        s, e, clip_name = hit
        fps = cache[clip_name].fps
        mid = frame - s
        lo = max(0, int(mid - fps * 0.5))
        hi = int(mid + fps * 0.5)
        key = player + '__' + clip_name
        # sparse frames leave gaps -> group_by_frame interpolation runs
        emb_frames.setdefault(key, set()).update(range(lo, hi, 3))
        if all(c >= 4 for c in
               [counts['train'], counts['val'], counts['test']]) \
                and counts['none'] >= 2:
            break
    assert all(counts[k] >= 4 for k in ('train', 'val', 'test')), counts

    sandbox = tmp_path / 'sandbox'
    (sandbox / 'action_dataset' / 'tennis').mkdir(parents=True)
    with open(sandbox / 'action_dataset' / 'tennis' / 'all.txt', 'w') as fp:
        for action, label in selected:
            fp.write('%s %s\n' % (action, label))
    import shutil
    shutil.copy(os.path.join(REF, 'action_dataset/tennis/val.ids.txt'),
                sandbox / 'action_dataset' / 'tennis' / 'val.ids.txt')
    (sandbox / 'data' / 'sports.cache').mkdir(parents=True)
    shutil.copy(os.path.join(REF, 'data/sports.cache/tennis.video_meta.pkl'),
                sandbox / 'data' / 'sports.cache' / 'tennis.video_meta.pkl')
    emb_dir = tmp_path / 'embs'
    emb_dir.mkdir()
    for key, frames in emb_frames.items():
        _write_emb_file(str(emb_dir / (key + '.emb.pkl')), frames, 4, rng)

    monkeypatch.chdir(sandbox)
    monkeypatch.setattr(ref_recognize.dataset_paths, 'TENNIS_VIDEO_DIR',
                        str(tmp_path / 'no_such_dir'))
    want = ref_recognize.load_tennis_data('tennis', str(emb_dir), True)
    got = load_tennis_data('tennis', str(emb_dir), True,
                           video_meta_dict=cache,
                           action_dir=str(sandbox / 'action_dataset'))
    _cmp_loader_outputs(want, got)


def test_recognize_fs_loader_oracle(tmp_path, monkeypatch):
    """Dilated jump windows + splits vs recognize.py:384-452 (including
    the unclamped negative start_frame slice quirk)."""
    _stub_dtw()
    import recognize as ref_recognize
    from vpd_tpu.datasets.recognition_data import load_fs_data

    rng = np.random.default_rng(19)
    cache = _load_ref_pickle(
        os.path.join(REF, 'data/sports.cache/fs.video_meta.pkl'))
    with open(os.path.join(REF, 'action_dataset/fs/all.txt')) as fp:
        all_actions = [l.strip().split(' ') for l in fp if l.strip()]
    with open(os.path.join(REF, 'action_dataset/fs/val.ids.txt')) as fp:
        val_ids = {l.strip() for l in fp if l.strip()}
    from vpd_tpu.datasets.eval_splits import get_test_prefixes
    test_prefixes = get_test_prefixes('fs')

    counts = {'train': 0, 'val': 0, 'test': 0}
    selected, emb_frames = [], {}
    empty_video = None  # one video whose emb slice comes out empty -> None
    for action, label in all_actions:
        video, s, e = action.split(':')
        if video not in cache:
            continue
        split = ('test' if video.startswith(test_prefixes)
                 else 'val' if action in val_ids else 'train')
        if counts[split] >= 4:
            continue
        counts[split] += 1
        selected.append((action, label))
        s, e = int(s), int(e)
        fps = cache[video].fps
        mid = (s + e) / 2
        lo = min(s, int(mid - fps * 2.5))
        hi = max(e, int(mid + fps * 0.5))
        if empty_video is None and lo > 8:
            # frames all below the window start -> dense slice is empty
            emb_frames[video] = set(range(0, 8, 2))
            empty_video = video
        else:
            emb_frames.setdefault(video, set()).update(
                range(max(0, lo), hi, 4))
        if all(c >= 4 for c in counts.values()) and empty_video:
            break
    assert all(c >= 4 for c in counts.values()), counts
    assert empty_video is not None

    sandbox = tmp_path / 'sandbox'
    (sandbox / 'action_dataset' / 'fs').mkdir(parents=True)
    with open(sandbox / 'action_dataset' / 'fs' / 'all.txt', 'w') as fp:
        for action, label in selected:
            fp.write('%s %s\n' % (action, label))
    import shutil
    shutil.copy(os.path.join(REF, 'action_dataset/fs/val.ids.txt'),
                sandbox / 'action_dataset' / 'fs' / 'val.ids.txt')
    (sandbox / 'data' / 'sports.cache').mkdir(parents=True)
    shutil.copy(os.path.join(REF, 'data/sports.cache/fs.video_meta.pkl'),
                sandbox / 'data' / 'sports.cache' / 'fs.video_meta.pkl')
    emb_dir = tmp_path / 'embs'
    emb_dir.mkdir()
    for key, frames in emb_frames.items():
        _write_emb_file(str(emb_dir / (key + '.emb.pkl')), frames, 4, rng)

    monkeypatch.chdir(sandbox)
    monkeypatch.setattr(ref_recognize.dataset_paths, 'FS_VIDEO_DIR',
                        str(tmp_path / 'no_such_dir'))
    want = ref_recognize.load_fs_data(str(emb_dir), True)
    got = load_fs_data(str(emb_dir), True, video_meta_dict=cache,
                       action_dir=str(sandbox / 'action_dataset'))
    _cmp_loader_outputs(want, got)


# ---------------------------------------------------------------------------
# kNN protocol (util/neighbors.py:29-101, recognize.py:125-184,580-649)
# ---------------------------------------------------------------------------

def _mean_dist(a, b):
    # deterministic, frequent exact ties via rounding (exercises the
    # heap tie-breaks)
    return round(float(abs(np.mean(a) - np.mean(b))), 1)


def _max_dist(a, b):
    return round(float(abs(np.max(a) - np.max(b))), 1)


def test_knn_neighbors_oracle():
    _stub_dtw()
    from util.neighbors import (KNearestNeighbors as RefKNN,
                                Neighbors as RefNbrs)
    from vpd_tpu.tasks.neighbors import KNearestNeighbors, Neighbors

    rng = np.random.default_rng(23)
    for _ in range(30):
        n = int(rng.integers(3, 12))
        X = [rng.standard_normal((int(rng.integers(1, 6)), 3))
             for _ in range(n)]
        y = [int(c) for c in rng.integers(0, 3, n)]
        k = int(rng.integers(1, 5))
        ref = RefKNN(X, y, _mean_dist, k=k)
        got = KNearestNeighbors(X, y, _mean_dist, k=k)
        for _ in range(4):
            q = rng.standard_normal((int(rng.integers(1, 6)), 3))
            assert ref.predict(q) == got.predict(q)
            qs = [rng.standard_normal((2, 3)) for _ in range(2)]
            assert ref.predict_n(*qs) == got.predict_n(*qs)

    for _ in range(20):
        n = int(rng.integers(3, 15))
        X = [None if rng.random() < 0.2
             else rng.standard_normal((int(rng.integers(1, 8)), 3))
             for _ in range(n)]
        ref = RefNbrs(X, _mean_dist)
        got = Neighbors(X, _mean_dist)
        q = rng.standard_normal((3, 3))
        for k in (1, 3, 50):
            for min_len in (1, 3):
                assert ref.find(q, k, min_len) == got.find(q, k, min_len)


def test_knn_model_oracle(monkeypatch):
    """KnnModel incl. variant stacking, ensembling and top-class fallback."""
    _stub_dtw()
    import recognize as ref_recognize
    from vpd_tpu.tasks import recognize as our_recognize

    def fake_build(step_pattern='symmetricP2'):
        return _mean_dist if step_pattern == 'symmetricP2' else _max_dist

    monkeypatch.setattr(ref_recognize, 'build_dtw_distance_fn', fake_build)
    monkeypatch.setattr(our_recognize, 'make_dtw_fns',
                        lambda: (_mean_dist, _max_dist))

    rng = np.random.default_rng(29)
    for variants in (False, True):
        train_embs, train_labels = {}, {}
        for i in range(10):
            t = int(rng.integers(2, 6))
            shape = (t, 2, 3) if variants else (t, 3)
            train_embs['seq%d' % i] = \
                rng.standard_normal(shape).astype(np.float32)
            train_labels['seq%d' % i] = int(rng.integers(0, 3))
        ref = ref_recognize.KnnModel('dtw', train_embs, train_labels, k=3)
        got = our_recognize.KnnModel('dtw', train_embs, train_labels, k=3)
        assert ref.top_class == got.top_class
        for ensemble in (True, False):
            for _ in range(6):
                t = int(rng.integers(2, 6))
                x = rng.standard_normal(
                    (t, 2, 3) if variants else (t, 3)).astype(np.float32)
                assert (ref.predict(x, ensemble=ensemble)
                        == got.predict(x, ensemble=ensemble))
        assert ref.predict(None) == got.predict(None)  # top-class fallback


def test_run_action_retrieval_oracle(monkeypatch, capsys):
    """Full retrieval protocol: hit@k / prec@k tables match the reference
    (identical injected distance fn; reference output parsed from its
    printed tabulate tables)."""
    _stub_dtw()
    import recognize as ref_recognize
    from vpd_tpu.tasks.recognize import run_action_retrieval

    monkeypatch.setattr(ref_recognize, 'build_dtw_distance_fn',
                        lambda *a, **k: _mean_dist)
    import vpd_tpu.tasks.recognize as our_recognize
    monkeypatch.setattr(our_recognize, 'build_dtw_distance_fn',
                        lambda *a, **k: _mean_dist)

    rng = np.random.default_rng(31)
    emb_dict, label_dict = {}, {}
    for i in range(14):
        name = 'a%02d' % i
        if i == 13:
            emb_dict[name] = None  # embs-less query path
        else:
            emb_dict[name] = rng.standard_normal(
                (int(rng.integers(2, 7)), 4)).astype(np.float32)
        label_dict[name] = int(rng.integers(0, 3))

    for queryset in (None, {'a01', 'a04', 'a05', 'a13'}):
        hit_t = [1, 3, 5]
        capsys.readouterr()
        ref_recognize.run_action_retrieval(
            dict(emb_dict), dict(label_dict), list(hit_t),
            queryset=queryset)
        out = capsys.readouterr().out
        rows = [l for l in out.splitlines() if l.startswith('%')]
        assert len(rows) == 2, out
        want_hit = [float(x) for x in rows[0].split()[1:]]
        want_prec = [float(x) for x in rows[1].split()[1:]]

        hit_rates, precs = run_action_retrieval(
            dict(emb_dict), dict(label_dict), list(hit_t),
            queryset=queryset, log=lambda *a: None)
        got_hit = [round(hit_rates[h], 2) for h in hit_t]
        got_prec = [round(precs[h], 2) for h in hit_t]
        np.testing.assert_allclose(got_hit, want_hit, atol=5e-3)
        np.testing.assert_allclose(got_prec, want_prec, atol=5e-3)


# ---------------------------------------------------------------------------
# train_vpd_model.py: the real ModelTrainer.epoch distillation loss
# ---------------------------------------------------------------------------

def test_vpd_epoch_loss_oracle(tmp_path):
    """The reference's actual ModelTrainer.epoch (train_vpd_model.py:67-98
    — eval-mode distillation MSE-sum / n with the motion FCNet chained
    after the encoder) vs our make_eval_step epoch accumulation, with
    weights transplanted and both sides assembling inputs from the same
    PNG crops through their own eval paths."""
    _install_resnet_factories()
    from synth import stub_torchvision_transforms
    stub_torchvision_transforms()
    cv2 = pytest.importorskip('cv2')
    pytest.importorskip('sklearn')
    import train_vpd_model as ref_tool
    from vpd_dataset.common import RGB_MEAN_STD as REF_MEAN_STD
    from vpd_dataset.single_frame import FrameDataset

    import jax
    import jax.numpy as jnp
    from vpd_tpu.data.augment import RGB_MEAN_STD
    from vpd_tpu.models import build_encoder
    from vpd_tpu.models.torch_compat import (_dense,
                                             convert_resnet_state_dict)
    from vpd_tpu.train.vpd import (MotionHead, VPDStudent, VPDTrainState,
                                   make_eval_step)

    emb_dim, dim, B, n_batches = 8, 32, 2, 3
    torch.manual_seed(21)
    encoder = ref_tool.RGBF_EmbeddingModel(
        'resnet18', emb_dim, use_flow=True, device='cpu')
    gen = torch.Generator().manual_seed(22)
    for m in encoder.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=gen) * .05)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=gen) + .5)
    trainer = ref_tool.ModelTrainer(encoder, motion=True)

    # ---- transplant: surgered 5ch encoder + motion FCNet -> flax trees
    sd = {k: v.detach().numpy()
          for k, v in encoder.resnet.state_dict().items()}
    enc_params, enc_stats = convert_resnet_state_dict(sd, 'resnet18')
    linears = [m for m in trainer.fcn_time.layers
               if isinstance(m, torch.nn.Linear)]
    assert len(linears) == 3  # emb -> 128 -> 128 -> 2*emb
    motion_params = {'FCNet_0': {
        'Dense_{}'.format(i): {'kernel': _dense(l.weight.detach().numpy()),
                               'bias': l.bias.detach().numpy()}
        for i, l in enumerate(linears)}}

    model = VPDStudent(
        encoder=build_encoder('resnet18', emb_dim, dtype=jnp.float32),
        motion=MotionHead(emb_dim))
    template = model.init(jax.random.key(0),
                          jnp.zeros((1, dim, dim, 5), jnp.float32),
                          train=False)
    params = {'encoder': enc_params, 'motion': motion_params}
    jax.tree_util.tree_map(  # same treedef or the transplant is wrong
        lambda a, b: None, dict(template['params']), params)
    state = VPDTrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats={'encoder': enc_stats}, opt_state=None, tx=None)

    # ---- shared corpus: PNG crops + flow, teacher targets
    rng = np.random.default_rng(23)
    tasks = []
    for i in range(n_batches * B):
        rgb = rng.integers(0, 255, (dim, dim, 3), dtype=np.uint8)
        flow = rng.integers(0, 255, (dim, dim, 3), dtype=np.uint8)
        prefix = str(tmp_path / 'v_{:06d}'.format(i))
        cv2.imwrite(prefix + '.png', cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(prefix + '.flow.png', flow)
        tasks.append(('v', i, prefix))
    targets = rng.normal(0, 1, (n_batches * B, 2 * emb_dim)) \
        .astype(np.float32)

    ds = FrameDataset(tasks, dim, REF_MEAN_STD['tennis'],
                      augment_jitter=0, augment_flip=False,
                      flow_img_name='flow')
    ref_batches = []
    for b in range(n_batches):
        imgs = torch.cat([ds[b * B + j]['img'] for j in range(B)])
        ref_batches.append(
            {'img': imgs,
             'emb': torch.from_numpy(targets[b * B:(b + 1) * B])})
    ref_loss = trainer.epoch(ref_batches)  # optimizer=None -> eval

    mean, std = RGB_MEAN_STD['tennis']
    step = make_eval_step(model, mean, std, use_flow=True)
    total = n = 0.0
    for b in range(n_batches):
        rgbs = np.stack([cv2.cvtColor(
            cv2.imread(tasks[b * B + j][2] + '.png'), cv2.COLOR_BGR2RGB)
            for j in range(B)])
        flows = np.stack([cv2.imread(tasks[b * B + j][2] + '.flow.png')
                          for j in range(B)])
        metrics = step(state, {'rgb': jnp.asarray(rgbs),
                               'flow': jnp.asarray(flows),
                               'emb': jnp.asarray(
                                   targets[b * B:(b + 1) * B])})
        total += float(metrics['emb_loss_sum'])
        n += float(metrics['n'])
    our_loss = total / n

    assert abs(our_loss - ref_loss) / abs(ref_loss) < 1e-3, \
        (our_loss, ref_loss)


def test_vpd_train_trajectory_oracle():
    """Full backward + AdamW trajectory vs the reference, head-to-head.

    Runs 3 REAL optimizer steps of `train_vpd_model.ModelTrainer.epoch`
    (`:67-98` train mode: BN batch stats, sum-reduction MSE backprop via
    `models/util.py:50-58`, `torch.optim.AdamW` from `get_optimizer`)
    and 3 steps of our `apply_train_update` (the fused step minus
    augmentation) from transplanted-identical weights on identical
    batches, then asserts the per-step loss trace AND the final
    parameters agree. This upgrades forward/loss parity to full
    training-step parity: gradients, optimizer math (betas/eps/decoupled
    wd on every param), and BN train-mode semantics all have to match
    for the post-update losses to line up.
    """
    _install_resnet_factories()
    from synth import stub_torchvision_transforms
    stub_torchvision_transforms()
    import train_vpd_model as ref_tool

    import jax
    import jax.numpy as jnp
    from vpd_tpu.models import build_encoder
    from vpd_tpu.models.torch_compat import (_dense,
                                             convert_resnet_state_dict)
    from vpd_tpu.train.vpd import (MotionHead, VPDStudent,
                                   apply_train_update, create_state)

    # Both sides run in FLOAT64: in f32, conv-gradient rounding noise
    # flips the sign of near-zero gradients, and Adam's step-1 update is
    # +-lr regardless of |g| — a handful of 11M params then differ by
    # 2*lr each and the step-2/3 losses drift ~1e-3 for reasons that are
    # noise, not semantics. f64 kills the noise floor (~1e-15), so any
    # remaining disagreement IS a semantic difference.
    emb_dim, dim, B, n_steps, lr = 8, 32, 4, 3, 1e-3
    torch.manual_seed(31)
    encoder = ref_tool.RGBF_EmbeddingModel(
        'resnet18', emb_dim, use_flow=True, device='cpu')
    trainer = ref_tool.ModelTrainer(encoder, motion=True)
    encoder.double()
    trainer.fcn_time.double()
    opt, scaler = trainer.get_optimizer(lr)  # AdamW, torch-default wd 0.01

    def torch_trees():
        sd = {k: v.detach().numpy()
              for k, v in encoder.resnet.state_dict().items()}
        enc_params, enc_stats = convert_resnet_state_dict(sd, 'resnet18')
        linears = [m for m in trainer.fcn_time.layers
                   if isinstance(m, torch.nn.Linear)]
        motion_params = {'FCNet_0': {
            'Dense_{}'.format(i): {
                'kernel': _dense(l.weight.detach().numpy()),
                'bias': l.bias.detach().numpy()}
            for i, l in enumerate(linears)}}
        return {'encoder': enc_params,
                'motion': motion_params}, enc_stats

    # .detach().numpy() leaves are VIEWS of the live torch tensors —
    # deep-copy or the reference's in-place training updates silently
    # rewrite our "initial" trees after the epochs below run
    params0, stats0 = torch_trees()
    params0 = jax.tree_util.tree_map(np.copy, params0)
    stats0 = jax.tree_util.tree_map(np.copy, stats0)
    init_ref = jax.tree_util.tree_map(np.copy, params0)

    rng = np.random.default_rng(32)
    imgs = rng.normal(0, 1, (n_steps, B, dim, dim, 5))
    targets = rng.normal(0, 1, (n_steps, B, 2 * emb_dim))

    # reference: one epoch() call per batch so the per-step (pre-update)
    # loss trace is observable; optimizer state persists across calls
    ref_losses = [
        trainer.epoch(
            [{'img': torch.from_numpy(
                np.moveaxis(imgs[i], -1, 1).copy()),
              'emb': torch.from_numpy(targets[i])}],
            optimizer=opt, scaler=scaler)
        for i in range(n_steps)]

    with jax.enable_x64():
        model = VPDStudent(
            encoder=build_encoder('resnet18', emb_dim,
                                  dtype=jnp.float64),
            motion=MotionHead(emb_dim, dtype=jnp.float64))
        state = create_state(
            model, jnp.zeros((1, dim, dim, 5), jnp.float64), lr)
        jax.tree_util.tree_map(  # same treedef or the transplant is wrong
            lambda a, b: None, dict(state.params), params0)
        state = state.replace(params=params0,
                              batch_stats={'encoder': stats0},
                              opt_state=state.tx.init(params0))

        step_fn = jax.jit(lambda s, im, e: apply_train_update(
            model, s, im, e, jax.random.key(0)))
        our_losses = []
        for i in range(n_steps):
            state, metrics = step_fn(state, jnp.asarray(imgs[i]),
                                     jnp.asarray(targets[i]))
            our_losses.append(float(metrics['emb_loss_sum']) / B)
        final_params = jax.device_get(dict(state.params))
        final_stats = jax.device_get(dict(state.batch_stats))

    # losses at step i > 0 integrate every preceding update: they only
    # match if gradients + AdamW math matched at every prior step
    for i, (ours, ref) in enumerate(zip(our_losses, ref_losses)):
        assert abs(ours - ref) / abs(ref) < 1e-9, (i, ours, ref)

    final_ref, stats_ref = torch_trees()

    def check_leaf(path, ours, reff, init):
        ours, reff, init = map(np.asarray, (ours, reff, init))
        delta = np.linalg.norm(reff - init)
        err = np.linalg.norm(ours - reff)
        assert err <= 1e-7 * delta + 1e-15, \
            (jax.tree_util.keystr(path), err, delta)

    jax.tree_util.tree_map_with_path(
        check_leaf, final_params, final_ref, init_ref)

    # BN running MEANS must agree to f64 exactness — they prove momentum
    # (0.1), axis selection, and layer mapping all match. Running VARS
    # deviate by design: flax blends the biased batch variance where
    # torch blends the unbiased one (QUIRKS.md conv-BN running-variance
    # note) — an n/(n-1) factor that this test's tiny shapes exaggerate
    # (stage 4 normalizes over n = B*1*1 = 4 elements; production shapes
    # put it at O(1e-5)). The loose var bound still catches gross
    # bookkeeping errors.
    def check_stat(path, ours, reff):
        key = jax.tree_util.keystr(path)
        ours, reff = np.asarray(ours), np.asarray(reff)
        err = np.linalg.norm(ours - reff) / (np.linalg.norm(reff) + 1e-8)
        tol = 0.2 if 'var' in key else 1e-9
        assert err < tol, (key, err)

    jax.tree_util.tree_map_with_path(
        check_stat, final_stats['encoder'], stats_ref)


# ---------------------------------------------------------------------------
# tools/import_torch_model.py: reference model dirs -> our checkpoint format
# ---------------------------------------------------------------------------

def test_import_torch_model_vipe(tmp_path):
    """A reference VIPE save_dir (config.json + {name}.encoder.pt,
    train_vipe_model.py:171-183,330-344) converted by the import tool
    loads through apply_vipe.load_model_dir and embeds identically to
    the torch encoder."""
    import models.module as mm

    from vpd_tpu.geometry.coco import pose_input_dim
    from vpd_tpu.infer.apply_vipe import load_model_dir
    from vpd_tpu.tools.import_torch_model import main as import_main

    in_dim = pose_input_dim(False)
    torch.manual_seed(11)
    enc_best = mm.FCResNet(in_dim, EMB, BLOCKS, HID)
    enc_old = mm.FCResNet(in_dim, EMB, BLOCKS, HID)
    gen = torch.Generator().manual_seed(12)
    for m in enc_best.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=gen) * .1)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=gen) + .5)

    ref_dir = tmp_path / 'torch_model'
    ref_dir.mkdir()
    torch.save(enc_best.state_dict(),
               str(ref_dir / 'best_epoch.encoder.pt'))
    # 5-digit epoch: the reference's '{:04d}'.format widens past 9999,
    # so the import regex must accept 4-or-more digits
    torch.save(enc_old.state_dict(),
               str(ref_dir / 'epoch10000.encoder.pt'))
    torch.save({'sgd': 1}, str(ref_dir / 'best_epoch.optimizer.pt'))
    with open(ref_dir / 'config.json', 'w') as fp:
        json.dump({
            'datasets': [{'name': 'human36m', '3d_pose_shape': [14, 3],
                          'mean_kp_offset_norms': [1.0] * 20}],
            'num_epochs': 500, 'learning_rate': 1e-4, 'batch_size': 100,
            'embedding_dim': EMB, 'encoder_arch': [BLOCKS, HID],
            'decoder_arch': [2, 16], 'embed_bones': False,
            'augment_camera': True}, fp)
    with open(ref_dir / 'loss.json', 'w') as fp:
        json.dump([{'epoch': 1, 'train': 1.0, 'val': 2.0}], fp)

    out_dir = str(tmp_path / 'converted')
    import_main(str(ref_dir), out_dir)
    assert os.path.exists(os.path.join(out_dir, 'loss.json'))

    x = np.random.default_rng(13).normal(
        0, 1, (6, in_dim)).astype(np.float32)
    for epoch, tmod in [(None, enc_best), (10000, enc_old)]:
        model, variables, config = load_model_dir(out_dir, epoch)
        assert config['embedding_dim'] == EMB
        tmod.eval()
        with torch.no_grad():
            want = tmod(torch.from_numpy(x)).numpy()
        got = np.asarray(model.encoder.apply(
            {'params': variables['params']['encoder'],
             'batch_stats': variables['batch_stats']['encoder']},
            x, train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_import_torch_model_vpd(tmp_path):
    """A reference VPD save_dir ('resnet.'-prefixed RGBF state_dict,
    models/rgb.py:61, train_vpd_model.py:107-112,222-228) converted by
    the import tool loads through apply_vpd.load_student_dir and embeds
    identically to the torch encoder."""
    import models.module as mm

    import jax.numpy as jnp
    from vpd_tpu.infer.apply_vpd import load_student_dir
    from vpd_tpu.tools.import_torch_model import main as import_main

    arch, in_ch, emb = 'resnet18', 5, 16
    cfg = mm.ENCODER_ARCH[arch]
    torch.manual_seed(14)
    tmod = mm.ResNet(cfg.block, cfg.layers, in_ch, emb)
    gen = torch.Generator().manual_seed(15)
    for m in tmod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=gen) * .05)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=gen) + .5)
    tmod.eval()

    ref_dir = tmp_path / 'torch_model'
    ref_dir.mkdir()
    torch.save({'resnet.' + k: v for k, v in tmod.state_dict().items()},
               str(ref_dir / 'best_epoch.encoder.pt'))
    # motion head: the reference fcn_time FCNet (train_vpd_model.py:
    # 62-65, saved as {name}.decoder.pt by save_model :107-112)
    fcn = mm.FCNet(emb, [128, 128], 2 * emb, dropout=0)
    torch.save(fcn.state_dict(), str(ref_dir / 'best_epoch.decoder.pt'))
    with open(ref_dir / 'config.json', 'w') as fp:
        json.dump({
            'num_epochs': 1000, 'batch_size': 100,
            'learning_rate': 5e-4, 'img_dim': 32, 'use_flow': True,
            'motion': False, 'emb_dim': emb, 'encoder_arch': arch,
            'rgb_mean_std': [[.4, .4, .4], [.2, .2, .2]]}, fp)

    out_dir = str(tmp_path / 'converted')
    import_main(str(ref_dir), out_dir)

    # the converted motion head must load as the 'decoder' component our
    # VPD resume expects and forward-match the torch fcn_time
    import jax
    from vpd_tpu.core import checkpoint as vckpt
    from vpd_tpu.train.vpd import MotionHead
    mh = MotionHead(emb)
    tmpl = mh.init(jax.random.key(0), jnp.zeros((1, emb), jnp.float32))
    loaded = vckpt.load_component(
        out_dir, 'best_epoch', 'decoder',
        {'params': tmpl['params'], 'batch_stats': {}})
    e = np.random.default_rng(17).normal(0, 1, (3, emb)) \
        .astype(np.float32)
    fcn.eval()
    with torch.no_grad():
        want_m = fcn(torch.from_numpy(e)).numpy()
    got_m = np.asarray(mh.apply({'params': loaded['params']}, e))
    np.testing.assert_allclose(got_m, want_m, rtol=1e-5, atol=1e-6)

    model, variables, config = load_student_dir(
        out_dir, dtype=jnp.float32)
    x = np.random.default_rng(16).normal(
        0, 1, (2, 32, 32, in_ch)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_import_torch_model_effnet_rejected(tmp_path):
    from vpd_tpu.tools.import_torch_model import main as import_main

    ref_dir = tmp_path / 'torch_model'
    ref_dir.mkdir()
    with open(ref_dir / 'config.json', 'w') as fp:
        json.dump({'use_flow': False, 'emb_dim': 8, 'motion': False,
                   'img_dim': 32, 'encoder_arch': 'effnet0',
                   'rgb_mean_std': [[.4] * 3, [.2] * 3]}, fp)
    with pytest.raises(SystemExit, match='resnet'):
        import_main(str(ref_dir), str(tmp_path / 'out'))


# ---------------------------------------------------------------------------
# tools/export_torch_model.py: models trained HERE -> reference .pt dirs
# ---------------------------------------------------------------------------

def _randomized_stats(stats, seed):
    """Non-trivial batch_stats so the export must move them correctly."""
    rng = np.random.default_rng(seed)

    def fix(d):
        return {k: ({'mean': rng.normal(0, .05, v['mean'].shape)
                              .astype(np.float32),
                     'var': rng.uniform(.5, 1.5, v['var'].shape)
                              .astype(np.float32)}
                    if set(v) == {'mean', 'var'} else fix(v))
                for k, v in d.items()}

    return fix(stats)


def test_export_torch_model_vipe(tmp_path):
    """A VIPE encoder trained here, exported by the export tool, loads
    STRICTLY into the reference's real FCResNet (models/module.py:178-190,
    the apply_vipe_model.py load path) and embeds identically."""
    import models.module as mm

    import jax
    import jax.numpy as jnp
    from vpd_tpu.core import checkpoint as ckpt
    from vpd_tpu.geometry.coco import pose_input_dim
    from vpd_tpu.models.fc import FCResNet
    from vpd_tpu.tools.export_torch_model import main as export_main

    in_dim = pose_input_dim(False)
    ours = FCResNet(EMB, BLOCKS, HID, dtype=jnp.float32)
    variables = ours.init(jax.random.key(21), jnp.zeros((1, in_dim)))
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = _randomized_stats(
        jax.tree_util.tree_map(np.asarray, variables['batch_stats']), 22)

    model_dir = str(tmp_path / 'ours')
    os.makedirs(model_dir)
    with open(os.path.join(model_dir, 'config.json'), 'w') as fp:
        json.dump({
            'datasets': [{'name': 'human36m', '3d_pose_shape': [14, 3],
                          'mean_kp_offset_norms': [1.0] * 20}],
            'num_epochs': 500, 'learning_rate': 1e-4, 'batch_size': 100,
            'embedding_dim': EMB, 'encoder_arch': [BLOCKS, HID],
            'decoder_arch': [2, 16], 'embed_bones': False,
            'augment_camera': True}, fp)
    ckpt.save_component(model_dir, 'best_epoch', 'encoder',
                        {'params': params, 'batch_stats': stats})

    out_dir = str(tmp_path / 'exported')
    export_main(model_dir, out_dir)

    tmod = mm.FCResNet(in_dim, EMB, BLOCKS, HID)
    sd = torch.load(os.path.join(out_dir, 'best_epoch.encoder.pt'))
    tmod.load_state_dict(sd, strict=True)
    tmod.eval()

    x = np.random.default_rng(23).normal(
        0, 1, (6, in_dim)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(
        {'params': params, 'batch_stats': stats}, x, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_export_torch_model_vpd(tmp_path):
    """A ResNet student trained here, exported, loads STRICTLY into the
    reference's RGBF_EmbeddingModel encoder (the apply_vpd_model.py:140-143
    load path, 'resnet.'-prefixed keys) and embeds identically."""
    _install_resnet_factories()
    import models.rgb as ref_rgb

    import jax
    import jax.numpy as jnp
    from vpd_tpu.core import checkpoint as ckpt
    from vpd_tpu.models import build_encoder
    from vpd_tpu.tools.export_torch_model import main as export_main

    arch, in_ch, emb = 'resnet18', 5, 16
    ours = build_encoder(arch, emb_dim=emb, dtype=jnp.float32)
    variables = ours.init(jax.random.key(24), jnp.zeros((1, 32, 32, in_ch)))
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = _randomized_stats(
        jax.tree_util.tree_map(np.asarray, variables['batch_stats']), 25)

    model_dir = str(tmp_path / 'ours')
    os.makedirs(model_dir)
    with open(os.path.join(model_dir, 'config.json'), 'w') as fp:
        json.dump({
            'num_epochs': 1000, 'batch_size': 100, 'learning_rate': 5e-4,
            'img_dim': 32, 'use_flow': True, 'motion': False,
            'emb_dim': emb, 'encoder_arch': arch,
            'rgb_mean_std': [[.4] * 3, [.2] * 3]}, fp)
    ckpt.save_component(model_dir, 'best_epoch', 'encoder',
                        {'params': params, 'batch_stats': stats})

    out_dir = str(tmp_path / 'exported')
    export_main(model_dir, out_dir)

    tmod = ref_rgb.RGBF_EmbeddingModel(arch, emb, True, 'cpu')
    sd = torch.load(os.path.join(out_dir, 'best_epoch.encoder.pt'))
    tmod.load_state_dict(sd, strict=True)
    tmod.eval()

    x = np.random.default_rng(26).normal(
        0, 1, (2, 32, 32, in_ch)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(ours.apply(
        {'params': params, 'batch_stats': stats}, x, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
