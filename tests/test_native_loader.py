"""Native C++ crop decoder vs the cv2 host path (byte compatibility).

The native loader (native/crop_loader.cpp via data/native_loader.py)
replaces the reference's DataLoader worker processes
(train_vpd_model.py:205-212); these tests pin its decode output to the
cv2 path in data/crops.py so the two are interchangeable.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from vpd_tpu.data import crops as crops_mod
from vpd_tpu.data import native_loader
from vpd_tpu.data.crops import CropBatchSource

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason='no native toolchain/libpng')


def _write_pngs(tmp_path, n=4, dim=128, seed=0):
    rng = np.random.default_rng(seed)
    rgb_paths, flow_paths, mask_paths = [], [], []
    for i in range(n):
        p = str(tmp_path / '{}.png'.format(i))
        cv2.imwrite(p, rng.integers(0, 256, (dim, dim, 3), np.uint8))
        rgb_paths.append(p)
        p = str(tmp_path / '{}.flow.png'.format(i))
        cv2.imwrite(p, rng.integers(0, 256, (dim, dim, 3), np.uint8))
        flow_paths.append(p)
        p = str(tmp_path / '{}.mask.png'.format(i))
        cv2.imwrite(p, (rng.integers(0, 2, (dim, dim), np.uint8) * 255))
        mask_paths.append(p)
    return rgb_paths, flow_paths, mask_paths


def test_same_size_exact(tmp_path):
    dim = 64
    rgb_paths, flow_paths, mask_paths = _write_pngs(tmp_path, dim=dim)
    rgb, flow, mask = native_loader.decode_crops(
        rgb_paths, dim, flow_paths=flow_paths, mask_paths=mask_paths)
    for i in range(len(rgb_paths)):
        np.testing.assert_array_equal(
            rgb[i], crops_mod._imread_rgb(rgb_paths[i], dim))
        np.testing.assert_array_equal(
            flow[i], crops_mod._imread_raw(flow_paths[i], dim)[..., :3])
        np.testing.assert_array_equal(
            mask[i], crops_mod._imread_raw(mask_paths[i], dim)[..., 0])


@pytest.mark.parametrize('src_dim', [96, 160])
def test_resize_matches_cv2_linear(tmp_path, src_dim):
    dst = 128
    rng = np.random.default_rng(src_dim)
    p = str(tmp_path / 'r.png')
    img = rng.integers(0, 256, (src_dim, src_dim, 3), np.uint8)
    cv2.imwrite(p, img)
    out = native_loader.decode_crops([p], dst)[0][0]
    ref = crops_mod._imread_rgb(p, dst)
    # cv2 INTER_LINEAR uses fixed-point arithmetic; allow 2 LSB
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2


def test_missing_rgb_raises_missing_mask_zero_fills(tmp_path):
    dim = 32
    rgb_paths, _, _ = _write_pngs(tmp_path, n=1, dim=dim)
    with pytest.raises(IOError):
        native_loader.decode_crops(
            [str(tmp_path / 'nope.png')], dim)
    rgb, _, mask = native_loader.decode_crops(
        rgb_paths, dim, mask_paths=[str(tmp_path / 'nope.mask.png')])
    assert (mask == 0).all() and rgb.any()


def test_batch_source_native_vs_python_identical(tmp_path):
    dim = 48
    video_dir = tmp_path / 'vid0'
    os.makedirs(video_dir)
    rng = np.random.default_rng(7)
    samples = []
    for frame in range(6):
        cv2.imwrite(str(video_dir / '{}.png'.format(frame)),
                    rng.integers(0, 256, (dim, dim, 3), np.uint8))
        cv2.imwrite(str(video_dir / '{}.flow.png'.format(frame)),
                    rng.integers(0, 256, (dim, dim, 3), np.uint8))
        if frame % 2 == 0:  # odd frames exercise missing-mask zero fill
            cv2.imwrite(str(video_dir / '{}.mask.png'.format(frame)),
                        rng.integers(0, 2, (dim, dim), np.uint8) * 255)
        samples.append(('vid0', None, frame,
                        rng.normal(size=(2, 8)).astype(np.float32)))

    kwargs = dict(img_dim=dim, batch_size=5, flow_img_name='flow',
                  use_mask=True, augment=True, seed=3)
    a = CropBatchSource(samples, str(tmp_path), use_native=True,
                        **kwargs).next_batch()
    b = CropBatchSource(samples, str(tmp_path), use_native=False,
                        **kwargs).next_batch()
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
