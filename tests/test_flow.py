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


def test_quantize_flow_device_matches_host():
    import jax.numpy as jnp

    from vpd_tpu.ops.flow import (flow_to_img, quantize_flow_device,
                                  subtract_median)

    rng = np.random.default_rng(11)
    flow = (rng.normal(scale=12., size=(3, 16, 16, 2))
            .astype(np.float32))
    dev = np.asarray(quantize_flow_device(jnp.asarray(flow), clip=20))
    for i in range(flow.shape[0]):
        host = flow_to_img(flow[i], clip=20)[..., :2]
        # identical arithmetic; allow 1 LSB for fp association order
        assert np.abs(dev[i].astype(int) - host.astype(int)).max() <= 1
        assert (dev[i] == host).mean() > 0.99

    devm = np.asarray(quantize_flow_device(
        jnp.asarray(flow), clip=20, subtract_median=True))
    for i in range(flow.shape[0]):
        host = flow_to_img(subtract_median(flow[i]), clip=20)[..., :2]
        assert np.abs(devm[i].astype(int) - host.astype(int)).max() <= 1


def test_compute_flow_cli_pipelined_lk(tmp_path):
    import cv2

    from vpd_tpu.tools import compute_flow

    vid = tmp_path / 'v'
    vid.mkdir()
    rng = np.random.default_rng(12)
    base = rng.integers(0, 255, (32, 32, 3), np.uint8)
    for frame in range(2, 7):
        cv2.imwrite(str(vid / '{}.png'.format(frame)),
                    np.roll(base, frame, axis=1))
        cv2.imwrite(str(vid / '{}.prev.png'.format(frame)),
                    np.roll(base, frame - 1, axis=1))
    # batch_size 2 over 5 pairs exercises the decode/compute/write pipeline
    compute_flow.main(str(tmp_path), 'flow', clip=20, img_dim=32,
                      batch_size=2, overwrite=False,
                      subtract_median_flag=True)
    for frame in range(2, 7):
        out = cv2.imread(str(vid / '{}.flow.png'.format(frame)))
        assert out is not None and (out[..., 2] == 128).all()


def test_mixed_precision_bool_quirk():
    """The reference's `--mixed_precision` is argparse type=bool
    (raft/flow.py:133-134): ANY non-empty value — including the string
    'False' — parses as True; only '' is False. Replicated verbatim for
    argv compatibility (QUIRKS.md)."""
    from vpd_tpu.tools.compute_flow import get_args

    base = ['crops', '--out_name', 'flow']
    assert get_args(base).mixed_precision is True
    assert get_args(base + ['--mixed_precision', 'False'])\
        .mixed_precision is True  # the quirk
    assert get_args(base + ['--mixed_precision', ''])\
        .mixed_precision is False


def test_compute_flow_model_path_guards(tmp_path):
    """--model <path> implies raft weights, but conflicts and typos must
    fail loudly, not deep in torch.load."""
    import pytest

    from vpd_tpu.tools import compute_flow

    with pytest.raises(SystemExit, match='one or the other'):
        compute_flow.main(str(tmp_path), 'flow', clip=20, img_dim=32,
                          batch_size=2, overwrite=False,
                          model='weights.pth', raft_weights='other.pth')
    with pytest.raises(SystemExit, match="must be 'lk', 'raft'"):
        compute_flow.main(str(tmp_path), 'flow', clip=20, img_dim=32,
                          batch_size=2, overwrite=False, model='rfat')


def test_encode_luma_matches_yuv_y_plane():
    """encode_luma is bit-identical to the Y plane of encode_yuv420 and
    to the float32 BT.601 spec (upload_codec.py)."""
    from vpd_tpu.data.upload_codec import (
        encode_luma, encode_yuv420, encode_yuv420_numpy)

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (4, 16, 16, 3), np.uint8)
    y = encode_luma(rgb)
    assert y.shape == (4, 256) and y.dtype == np.uint8
    np.testing.assert_array_equal(y, encode_yuv420(rgb)[:, :256])
    np.testing.assert_array_equal(y, encode_yuv420_numpy(rgb)[:, :256])
    x = rgb.astype(np.float32)
    spec = np.clip(np.rint(
        np.float32(0.299) * x[..., 0] + np.float32(0.587) * x[..., 1]
        + np.float32(0.114) * x[..., 2]), 0, 255) \
        .astype(np.uint8).reshape(4, -1)
    np.testing.assert_array_equal(y, spec)
    # odd dims fall back to the numpy path (yuv420 would need even dims)
    rgb_odd = rng.integers(0, 256, (2, 15, 17, 3), np.uint8)
    assert encode_luma(rgb_odd).shape == (2, 15 * 17)


def _smooth_color_scene(dx, dy, size=80, seed=7):
    import scipy.ndimage as ndi
    rng = np.random.default_rng(seed)
    base = np.stack([ndi.gaussian_filter(
        rng.integers(0, 255, (size, size)).astype(float), 2)
        for _ in range(3)], axis=-1)
    img1 = base[None].astype(np.uint8)
    img2 = np.roll(np.roll(base, dy, axis=0), dx, axis=1)[None] \
        .astype(np.uint8)
    return img1, img2


def test_lk_gray_matches_rgb_path():
    """The luma-plane LK entry (y8 upload codec) tracks the RGB path to
    within Y's uint8 rounding on a colored scene."""
    from vpd_tpu.data.upload_codec import encode_luma
    from vpd_tpu.ops.flow import lucas_kanade_flow_gray

    dx, dy = 3, -2
    img1, img2 = _smooth_color_scene(dx, dy)
    f_rgb = np.asarray(lucas_kanade_flow(img1, img2, num_iters=5))
    y1 = encode_luma(img1).reshape(1, 80, 80)
    y2 = encode_luma(img2).reshape(1, 80, 80)
    f_y = np.asarray(lucas_kanade_flow_gray(y1, y2, num_iters=5))
    inner_y = f_y[0, 20:60, 20:60]
    assert abs(np.median(inner_y[..., 0]) - dx) < 1.0
    assert abs(np.median(inner_y[..., 1]) - dy) < 1.0
    d = np.abs(f_rgb - f_y)[0, 20:60, 20:60]
    assert np.quantile(d, 0.99) < 0.25, np.quantile(d, 0.99)


def test_compute_flow_cli_upload_codecs(tmp_path):
    """--upload_codec yuv420/y8 write near-identical quantized PNGs to
    the raw path (lossy encodings; bounded drift)."""
    import cv2

    from vpd_tpu.tools import compute_flow

    vid = tmp_path / 'v'
    vid.mkdir()
    img1, img2 = _smooth_color_scene(2, 1, size=32, seed=9)
    for frame in range(2, 5):
        cv2.imwrite(str(vid / '{}.prev.png'.format(frame)),
                    np.roll(img1[0], frame, axis=1))
        cv2.imwrite(str(vid / '{}.png'.format(frame)),
                    np.roll(img2[0], frame, axis=1))
    for codec in ('raw', 'yuv420', 'y8'):
        compute_flow.main(str(tmp_path), 'f_' + codec, clip=20,
                          img_dim=32, batch_size=2, overwrite=False,
                          upload_codec=codec)
    for frame in range(2, 5):
        raw = cv2.imread(str(vid / '{}.f_raw.png'.format(frame)))
        assert raw is not None
        for codec in ('yuv420', 'y8'):
            out = cv2.imread(
                str(vid / '{}.f_{}.png'.format(frame, codec)))
            assert (out[..., 2] == 128).all()
            d = np.abs(out[..., :2].astype(int)
                       - raw[..., :2].astype(int))
            # uint8 quantization step is ~6.2 per unit flow; require
            # 95% of pixels within ~1/3 flow unit of the raw path
            assert (d <= 2).mean() > 0.95, (d.mean(), d.max())


def test_compute_flow_y8_requires_lk(tmp_path):
    import pytest

    from vpd_tpu.tools import compute_flow

    with pytest.raises(SystemExit, match='y8'):
        compute_flow.main(str(tmp_path), 'flow', clip=20, img_dim=32,
                          batch_size=2, overwrite=False, model='raft',
                          upload_codec='y8')
    # and the flag parses
    from vpd_tpu.tools.compute_flow import get_args
    a = get_args(['crops', '--out_name', 'f', '--upload_codec', 'y8'])
    assert a.upload_codec == 'y8'


def test_compute_flow_mesh_matches_single_device(tmp_path):
    """--data_parallel batch fan-out writes the same quantized PNGs as
    the single-device path (8-device CPU mesh via conftest)."""
    import cv2

    from vpd_tpu.core.mesh import get_mesh
    from vpd_tpu.tools import compute_flow

    vid = tmp_path / 'v'
    vid.mkdir()
    img1, img2 = _smooth_color_scene(2, 1, size=32, seed=11)
    for frame in range(12):
        cv2.imwrite(str(vid / '{}.prev.png'.format(frame)),
                    np.roll(img1[0], frame, axis=1))
        cv2.imwrite(str(vid / '{}.png'.format(frame)),
                    np.roll(img2[0], frame, axis=1))
    compute_flow.main(str(tmp_path), 'sd', clip=20, img_dim=32,
                      batch_size=8, overwrite=False)
    compute_flow.main(str(tmp_path), 'dp', clip=20, img_dim=32,
                      batch_size=8, overwrite=False, mesh=get_mesh())
    for frame in range(12):
        sd = cv2.imread(str(vid / '{}.sd.png'.format(frame)))
        dp = cv2.imread(str(vid / '{}.dp.png'.format(frame)))
        assert sd is not None and dp is not None
        d = np.abs(sd.astype(int) - dp.astype(int))
        assert d.max() <= 1, d.max()  # float-assoc under sharding only

    with __import__('pytest').raises(SystemExit, match='divisible'):
        compute_flow.main(str(tmp_path), 'dp2', clip=20, img_dim=32,
                          batch_size=9, overwrite=False, mesh=get_mesh())

    from vpd_tpu.tools.compute_flow import get_args
    assert get_args(['crops', '--out_name', 'f',
                     '--data_parallel']).data_parallel is True
