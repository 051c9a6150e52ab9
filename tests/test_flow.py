"""Optical flow: quantization parity + LK estimator sanity."""

import numpy as np

from vpd_tpu.ops.flow import (
    flow_to_img, lucas_kanade_flow, subtract_median)


def test_flow_to_img_quantization_parity():
    # reference raft/flow.py:80-84: clip, +clip, *255/(2*clip+1), 128 ch
    flow = np.array([[[-30., 0.], [20., 5.]]])
    img = flow_to_img(flow, clip=20)
    assert img.shape == (1, 2, 3)
    assert img.dtype == np.uint8
    np.testing.assert_array_equal(img[0, 0], [0, int(20 * 255 / 41), 128])
    np.testing.assert_array_equal(
        img[0, 1], [int(40 * 255 / 41), int(25 * 255 / 41), 128])


def test_subtract_median():
    flow = np.ones((4, 4, 2)) * 3
    out = subtract_median(flow)
    np.testing.assert_allclose(out, 0)


def test_lk_recovers_translation():
    # translate a random texture by (3, -2) px; LK should find ~that flow
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (80, 80), dtype=np.uint8)
    import scipy.ndimage as ndi
    smooth = ndi.gaussian_filter(base.astype(float), 2)
    dx, dy = 3, -2
    img1 = np.stack([smooth] * 3, axis=-1)
    img2 = np.stack([np.roll(np.roll(smooth, dy, axis=0), dx, axis=1)] * 3,
                    axis=-1)
    i1 = img1[None].astype(np.uint8)
    i2 = img2[None].astype(np.uint8)
    flow = np.asarray(lucas_kanade_flow(i1, i2, levels=3, num_iters=5))
    # check interior (borders are unreliable)
    inner = flow[0, 20:60, 20:60]
    assert abs(np.median(inner[..., 0]) - dx) < 1.0, \
        np.median(inner[..., 0])
    assert abs(np.median(inner[..., 1]) - dy) < 1.0, \
        np.median(inner[..., 1])
