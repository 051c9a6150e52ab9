"""Flax RAFT port (models/raft.py): units + torch-checkpoint mapping.

The reference drives an external CUDA RAFT (`raft/flow.py:109-112`);
these tests pin the TPU-native re-implementation's building blocks and
the official-checkpoint import path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vpd_tpu.models.raft import (
    RAFT, _bilinear_sample, coords_grid, corr_lookup, corr_pyramid,
    export_torch_raft, import_torch_raft, sequence_loss,
    upsample_flow_convex)


def test_bilinear_sample_integer_and_padding():
    img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    pts = jnp.array([[1., 2.], [0., 0.], [3., 2.]])  # (x, y)
    out = _bilinear_sample(img, pts)
    np.testing.assert_allclose(out, [img[2, 1], img[0, 0], img[2, 3]])
    # halfway between (0,0) and (1,0)
    out = _bilinear_sample(img, jnp.array([[0.5, 0.]]))
    np.testing.assert_allclose(out, [(img[0, 0] + img[0, 1]) / 2])
    # outside -> zero contribution (grid_sample padding_mode='zeros')
    out = _bilinear_sample(img, jnp.array([[-1., 0.], [-0.5, 0.]]))
    np.testing.assert_allclose(out, [0., img[0, 0] * 0.5])


def test_corr_pyramid_self_similarity():
    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    pyr = corr_pyramid(fmap, fmap, num_levels=2)
    assert pyr[0].shape == (2 * 64, 8, 8) and pyr[1].shape == (2 * 64, 4, 4)
    # entry (b, x, y) at (u, v) = <f[b,x,y], f[b,u,v]> / sqrt(C)
    f = np.asarray(fmap)
    want = f[0, 1, 2] @ f[0, 3, 4] / 4.
    np.testing.assert_allclose(pyr[0][1 * 8 + 2, 3, 4], want, rtol=1e-5)

    # zero flow looks up the self-correlation at the center tap
    coords = coords_grid(2, 8, 8)
    feats = corr_lookup(pyr, coords, radius=1)
    assert feats.shape == (2, 8, 8, 2 * 9)
    self_corr = (f[0, 1, 2] ** 2).sum() / 4.
    np.testing.assert_allclose(feats[0, 1, 2, 4], self_corr, rtol=1e-5)


def test_upsample_flow_convex_center_mask():
    rng = np.random.default_rng(1)
    flow = jnp.asarray(rng.normal(size=(1, 2, 3, 2)).astype(np.float32))
    # mask heavily favoring the center neighbor (k=4) everywhere
    mask = np.full((1, 2, 3, 9, 64), -100., np.float32)
    mask[:, :, :, 4, :] = 100.
    up = upsample_flow_convex(flow, jnp.asarray(mask.reshape(1, 2, 3, 576)))
    assert up.shape == (1, 16, 24, 2)
    want = np.repeat(np.repeat(8 * np.asarray(flow), 8, 1), 8, 2)
    np.testing.assert_allclose(up, want, atol=1e-4)


def test_sequence_loss_weighting():
    gt = jnp.zeros((1, 8, 8, 2))
    off = jnp.ones((1, 8, 8, 2))
    # later predictions weighted more (gamma^(n-i-1))
    early = sequence_loss([off, gt], gt)
    late = sequence_loss([gt, off], gt)
    assert float(early) < float(late)


@pytest.fixture(scope='module')
def tiny_raft():
    model = RAFT()
    # 4 corr-pyramid levels need the 1/8-res grid >= 8x8 -> images >= 64px
    z = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), z, z, iters=1)
    return model, variables


def test_raft_forward_shape_and_param_count(tiny_raft):
    model, variables = tiny_raft
    n = sum(x.size for x in jax.tree.leaves(variables['params']))
    assert n == 5257536  # official "basic" RAFT is ~5.3M params
    rng = np.random.default_rng(2)
    im1 = jnp.asarray(rng.integers(0, 255, (2, 64, 72, 3)), jnp.float32)
    im2 = jnp.asarray(rng.integers(0, 255, (2, 64, 72, 3)), jnp.float32)
    flow = model.apply(variables, im1, im2, iters=2, train=False)
    assert flow.shape == (2, 64, 72, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_raft_train_mode_grads(tiny_raft):
    model, variables = tiny_raft
    rng = np.random.default_rng(3)
    im1 = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32)
    im2 = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32)
    gt = jnp.zeros((1, 64, 64, 2))

    def loss_fn(params):
        preds, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            im1, im2, iters=2, train=True, mutable=['batch_stats'])
        return sequence_loss(preds, gt)

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    gnorm = sum(float((g ** 2).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_compute_flow_cli_raft(tmp_path):
    cv2 = pytest.importorskip('cv2')
    from vpd_tpu.tools import compute_flow

    vid = tmp_path / 'vid0'
    vid.mkdir()
    rng = np.random.default_rng(4)
    base = rng.integers(0, 255, (64, 64, 3), np.uint8)
    for frame in (3, 4):
        cv2.imwrite(str(vid / '{}.png'.format(frame)),
                    np.roll(base, frame, axis=1))
        cv2.imwrite(str(vid / '{}.prev.png'.format(frame)),
                    np.roll(base, frame - 1, axis=1))
    compute_flow.main(str(tmp_path), 'flow', clip=20, img_dim=64,
                      batch_size=2, overwrite=False, model='raft',
                      raft_iters=2)
    for frame in (3, 4):
        out = cv2.imread(str(vid / '{}.flow.png'.format(frame)))
        assert out is not None and out.shape == (64, 64, 3)
        assert (out[..., 2] == 128).all()  # quantized-PNG third channel


def test_compute_flow_cli_model_checkpoint_path(tiny_raft, tmp_path):
    """Reference argv drop-in (raft/flow.py:128-129): --model takes a
    torch checkpoint PATH, which must imply raft + those weights."""
    cv2 = pytest.importorskip('cv2')
    torch = pytest.importorskip('torch')
    from vpd_tpu.tools import compute_flow

    _, variables = tiny_raft
    ckpt = str(tmp_path / 'raft-things.pth')
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in export_torch_raft(variables).items()}, ckpt)

    vid = tmp_path / 'vid0'
    vid.mkdir()
    rng = np.random.default_rng(4)
    base = rng.integers(0, 255, (64, 64, 3), np.uint8)
    cv2.imwrite(str(vid / '3.png'), np.roll(base, 3, axis=1))
    cv2.imwrite(str(vid / '3.prev.png'), np.roll(base, 2, axis=1))
    compute_flow.main(str(tmp_path), 'flow', clip=20, img_dim=64,
                      batch_size=1, overwrite=False, model=ckpt,
                      raft_iters=2)
    out = cv2.imread(str(vid / '3.flow.png'))
    assert out is not None and (out[..., 2] == 128).all()


def test_torch_mapping_round_trip_and_official_keys(tiny_raft):
    _, variables = tiny_raft
    sd = export_torch_raft(variables)
    # spot-check the official princeton-vl key layout
    for key in ('fnet.conv1.weight', 'fnet.layer2.0.downsample.0.weight',
                'cnet.norm1.running_mean', 'cnet.layer3.0.downsample.1.bias',
                'update_block.encoder.convc1.weight',
                'update_block.gru.convz1.weight',
                'update_block.flow_head.conv1.weight',
                'update_block.mask.2.bias'):
        assert key in sd, key
    # fnet instance norms are affine-free: no norm params exported
    assert not any('fnet' in k and 'norm' in k for k in sd)
    # DataParallel-prefixed dicts import too (raft/flow.py:102-105)
    back = import_torch_raft({'module.' + k: v for k, v in sd.items()})
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))
