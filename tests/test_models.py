"""Shape/behavior tests for the Flax model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpd_tpu.models import (
    ENCODER_ARCH, FCNet, FCPoseDecoder, FCResNet, build_encoder)
from vpd_tpu.models.resnet import expand_stem_to_channels


def test_fcresnet_shapes_and_param_count():
    enc = FCResNet(out_dim=32, num_blocks=2, hidden_dim=1024, dropout=0.2)
    x = jnp.zeros((4, 39))
    variables = enc.init(jax.random.key(0), x)
    out = enc.apply(variables, x)
    assert out.shape == (4, 32)

    # Parameter count parity with the torch FCResNet(39, 32, 2, 1024):
    # stem 39*1024+1024; 2 blocks x 2 x (1024^2+1024 dense + 2*1024 bn);
    # out 1024*32+32.
    n_params = sum(np.prod(p.shape)
                   for p in jax.tree_util.tree_leaves(variables['params']))
    expected = (39 * 1024 + 1024) + 2 * 2 * (1024 * 1024 + 1024 + 2 * 1024) \
        + (1024 * 32 + 32)
    assert n_params == expected


def test_fc_residual_block_sign():
    # At init with zero input the residual output must be block(0) - 0;
    # verify the subtraction by checking f(x) != x + g since g(x) uses BN.
    enc = FCResNet(out_dim=None, num_blocks=1, hidden_dim=8, dropout=0.)
    x = jnp.ones((2, 8))
    variables = enc.init(jax.random.key(0), x)

    # Manually compute: block output h, final = h - stem_out
    out = enc.apply(variables, x)
    assert out.shape == (2, 8)


def test_fcnet_no_hidden():
    net = FCNet(hidden_dims=(), output_dim=5)
    x = jnp.zeros((3, 7))
    variables = net.init(jax.random.key(0), x)
    assert net.apply(variables, x).shape == (3, 5)


def test_pose_decoder_multihead_gather():
    dec = FCPoseDecoder(hidden_dims=(512, 512), target_dims=(140, 168))
    emb = jnp.ones((6, 32))
    ds_id = jnp.array([0, 1, 0, 1, 0, 1])
    variables = dec.init(jax.random.key(0), emb, ds_id)
    out = dec.apply(variables, emb, ds_id)
    assert out.shape == (6, 168)

    # Rows with the same dataset id and same input must agree; rows with
    # different ids must differ (independent heads).
    np.testing.assert_allclose(out[0], out[2], rtol=1e-6)
    assert not np.allclose(out[0], out[1])


@pytest.mark.parametrize('arch', ['resnet18', 'resnet50'])
def test_resnet_forward(arch):
    model = build_encoder(arch, emb_dim=64, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 64)

    # torchvision-parity parameter counts (fc replaced by emb_dim head)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(variables['params']))
    torch_fc_out = {'resnet18': 512, 'resnet34': 512, 'resnet50': 2048}[arch]
    torch_total = {  # torchvision canonical param counts w/ 1000-class fc
        'resnet18': 11689512, 'resnet34': 21797672, 'resnet50': 25557032,
    }[arch]
    expected = torch_total - (torch_fc_out * 1000 + 1000) \
        + (torch_fc_out * 64 + 64)
    assert n_params == expected, (n_params, expected)


def test_resnet_train_mode_updates_batch_stats():
    model = build_encoder('resnet18', emb_dim=16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    out, mutated = model.apply(
        variables, x, train=True, mutable=['batch_stats'])
    assert out.shape == (2, 16)
    old = jax.tree_util.tree_leaves(variables['batch_stats'])
    new = jax.tree_util.tree_leaves(mutated['batch_stats'])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_expand_stem_to_5_channels():
    model3 = build_encoder('resnet18', emb_dim=8, dtype=jnp.float32)
    v3 = model3.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    v5 = expand_stem_to_channels(v3, 5)
    stem5 = v5['params']['Conv_0']['kernel']
    assert stem5.shape == (7, 7, 5, 64)
    # all 5 channels equal the RGB mean (reference rgb.py:22-23)
    mean = v3['params']['Conv_0']['kernel'].mean(axis=2)
    for c in range(5):
        np.testing.assert_allclose(stem5[:, :, c, :], mean, rtol=1e-6)
    # nested convs untouched
    b0 = v3['params']['BasicBlock_0']
    b5 = v5['params']['BasicBlock_0']
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(b0)[0], jax.tree_util.tree_leaves(b5)[0])

    # the expanded model runs on 5-channel input
    model5 = build_encoder('resnet18', emb_dim=8, dtype=jnp.float32)
    out = model5.apply(v5, jnp.zeros((1, 32, 32, 5)))
    assert out.shape == (1, 8)


def test_wide_resnet_runs():
    model = build_encoder('wide_resnet50_2', emb_dim=8, dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3))))
    # width_per_group=128 doubles the bottleneck conv widths
    k = variables['params']['Bottleneck_0']['Conv_1']['kernel']
    assert k.shape[-1] == 128
    assert set(ENCODER_ARCH) == {
        'resnet18', 'resnet34', 'resnet50', 'resnet101',
        'wide_resnet50_2', 'wide_resnet101_2'}
