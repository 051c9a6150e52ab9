"""Upload codec (data/upload_codec.py): packing, device/host decode
equality, roundtrip quality, and the apply_vpd opt-in wiring."""

import os

import numpy as np
import pytest

from vpd_tpu.data.upload_codec import (decode_yuv420,
                                       decode_yuv420_reference,
                                       encode_yuv420, packed_nbytes)

IMG = 32


def _smooth_images(b, s, seed=0):
    """Natural-ish crops: smooth gradients + mild noise (what real video
    crops look like; the codec's design target)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    imgs = []
    for i in range(b):
        base = 128 + 70 * np.sin(xx / 9 + i) * np.cos(yy / 11 - i / 3.0)
        img = base[..., None] + rng.normal(0, 4, (s, s, 3))
        imgs.append(np.clip(img, 0, 255))
    return np.stack(imgs).astype(np.uint8)


def test_packed_size_and_shape():
    rgb = _smooth_images(3, IMG)
    packed = encode_yuv420(rgb)
    assert packed.dtype == np.uint8
    assert packed.shape == (3, packed_nbytes(IMG, IMG))
    # exactly half the raw payload
    assert packed.nbytes * 2 == rgb.nbytes


def test_native_packer_matches_numpy_bitexact():
    """The C++ single-pass packer (native/crop_loader.cpp
    vpd_yuv420_pack) implements the same deterministic float32 spec as
    encode_yuv420_numpy — byte-identical output (fp-contract off)."""
    from vpd_tpu.data import native_loader

    if not (native_loader.available() and hasattr(
            native_loader.get_lib(), 'vpd_yuv420_pack')):
        pytest.skip('native packer unavailable')
    rgb = np.random.default_rng(7).integers(
        0, 256, (16, IMG, IMG, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        native_loader.yuv420_pack(rgb),
        __import__('vpd_tpu.data.upload_codec', fromlist=['x'])
        .encode_yuv420_numpy(rgb))
    # odd spatial slabs still work (IMG is even; try a 30x46 shape)
    rgb2 = np.random.default_rng(8).integers(
        0, 256, (3, 30, 46, 3), dtype=np.uint8)
    from vpd_tpu.data.upload_codec import encode_yuv420_numpy
    np.testing.assert_array_equal(
        native_loader.yuv420_pack(rgb2), encode_yuv420_numpy(rgb2))


def test_device_decode_matches_reference_bitexact():
    rgb = np.random.default_rng(1).integers(
        0, 256, (4, IMG, IMG, 3), dtype=np.uint8)
    packed = encode_yuv420(rgb)
    dev = np.asarray(decode_yuv420(packed, IMG, IMG))
    ref = decode_yuv420_reference(packed, IMG, IMG)
    np.testing.assert_array_equal(dev, ref)


def test_grayscale_roundtrip_lossless():
    """R=G=B images have constant chroma (128), so 4:2:0 subsampling
    loses nothing and the roundtrip is bit-exact."""
    g = np.random.default_rng(2).integers(
        0, 256, (2, IMG, IMG, 1), dtype=np.uint8)
    rgb = np.repeat(g, 3, axis=-1)
    out = decode_yuv420_reference(encode_yuv420(rgb), IMG, IMG)
    np.testing.assert_array_equal(out, rgb)


def test_smooth_roundtrip_quality():
    """On natural-ish content the chroma loss is small (measured: mean
    ~2.4/255, p99 ~9 with per-channel noise sigma=4 — harsher chroma
    than real video, where the three channels move together)."""
    rgb = _smooth_images(4, IMG)
    out = decode_yuv420_reference(encode_yuv420(rgb), IMG, IMG)
    err = np.abs(out.astype(np.int32) - rgb.astype(np.int32))
    assert err.mean() < 4.0, err.mean()
    assert np.percentile(err, 99) <= 12, np.percentile(err, 99)
    # luma survives almost exactly even here: gray projection error ~1
    lum = lambda x: (0.299 * x[..., 0] + 0.587 * x[..., 1]
                     + 0.114 * x[..., 2])
    assert np.abs(lum(out.astype(np.float64))
                  - lum(rgb.astype(np.float64))).mean() < 1.0


def test_adversarial_chroma_error_bounded():
    """iid-uniform noise is the chroma worst case (no real video frame
    looks like this): documents the measured upper bound, ~43/255 mean,
    while luma still roundtrips tightly."""
    rgb = np.random.default_rng(3).integers(
        0, 256, (2, IMG, IMG, 3), dtype=np.uint8)
    out = decode_yuv420_reference(encode_yuv420(rgb), IMG, IMG)
    err = np.abs(out.astype(np.int32) - rgb.astype(np.int32))
    assert err.mean() < 60, err.mean()
    lum = lambda x: (0.299 * x[..., 0] + 0.587 * x[..., 1]
                     + 0.114 * x[..., 2])
    assert np.abs(lum(out.astype(np.float64))
                  - lum(rgb.astype(np.float64))).mean() < 1.0


def test_apply_vpd_upload_codec_end_to_end(tmp_path):
    """apply_vpd(upload_codec='yuv420') produces the same .emb.pkl as the
    raw path on a grayscale corpus (whose packing is lossless), proving
    the encode -> upload -> device-decode chain is wired correctly."""
    from PIL import Image

    from vpd_tpu.core.io import load_pickle
    from vpd_tpu.infer.apply_vpd import apply_vpd, scan_crop_dir
    from vpd_tpu.tools.bench_extract_e2e import make_model_dir

    rng = np.random.default_rng(4)
    crop_dir = tmp_path / 'crops'
    for v in range(2):
        vdir = crop_dir / 'video{}'.format(v)
        os.makedirs(vdir)
        for f in range(6):
            g = rng.integers(0, 256, (IMG, IMG, 1), dtype=np.uint8)
            Image.fromarray(np.repeat(g, 3, axis=-1)).save(
                vdir / '{}.png'.format(f))

    model_dir = str(tmp_path / 'model')
    make_model_dir(model_dir, 'resnet18', 8, IMG, False)
    videos, tasks = scan_crop_dir(str(crop_dir))

    out_raw = str(tmp_path / 'raw')
    out_codec = str(tmp_path / 'codec')
    apply_vpd(videos, tasks, model_dir, out_raw, batch_size=8,
              log=lambda *a: None)
    apply_vpd(videos, tasks, model_dir, out_codec, batch_size=8,
              log=lambda *a: None, upload_codec='yuv420')

    for v in videos:
        raw = load_pickle(os.path.join(out_raw, v + '.emb.pkl'))
        cod = load_pickle(os.path.join(out_codec, v + '.emb.pkl'))
        assert len(raw) == len(cod) == 6
        for (f1, e1, _), (f2, e2, _) in zip(raw, cod):
            assert f1 == f2
            np.testing.assert_array_equal(e1, e2)


def test_apply_vpd_codec_on_mesh_matches_single_device(tmp_path):
    """The codec composes with the multi-chip extraction fan-out: the
    packed (B, H*W*3//2) batch shards on its leading axis like raw
    crops, and a grayscale corpus (lossless packing) must reproduce the
    single-device raw-path embeddings at cosine level (different
    shardings pick different conv tilings)."""
    from PIL import Image

    from vpd_tpu.core.io import load_pickle
    from vpd_tpu.core.mesh import get_mesh
    from vpd_tpu.infer.apply_vpd import apply_vpd, scan_crop_dir
    from vpd_tpu.tools.bench_extract_e2e import make_model_dir

    rng = np.random.default_rng(6)
    crop_dir = tmp_path / 'crops'
    for v in range(2):
        vdir = crop_dir / 'video{}'.format(v)
        os.makedirs(vdir)
        for f in range(16):
            g = rng.integers(0, 256, (IMG, IMG, 1), dtype=np.uint8)
            Image.fromarray(np.repeat(g, 3, axis=-1)).save(
                vdir / '{}.png'.format(f))

    model_dir = str(tmp_path / 'model')
    make_model_dir(model_dir, 'resnet18', 8, IMG, False)
    videos, tasks = scan_crop_dir(str(crop_dir))

    out_raw = str(tmp_path / 'raw_single')
    out_mesh = str(tmp_path / 'codec_mesh')
    apply_vpd(videos, tasks, model_dir, out_raw, batch_size=16,
              log=lambda *a: None)
    apply_vpd(videos, tasks, model_dir, out_mesh, batch_size=16,
              log=lambda *a: None, mesh=get_mesh(),
              upload_codec='yuv420')

    for v in videos:
        raw = load_pickle(os.path.join(out_raw, v + '.emb.pkl'))
        cod = load_pickle(os.path.join(out_mesh, v + '.emb.pkl'))
        assert len(raw) == len(cod) == 16
        for (f1, e1, _), (f2, e2, _) in zip(raw, cod):
            assert f1 == f2
            for ra, rb in zip(np.atleast_2d(e1), np.atleast_2d(e2)):
                cos = float(np.dot(ra, rb) / (np.linalg.norm(ra)
                                              * np.linalg.norm(rb)))
                assert cos > 1 - 1e-4, cos


def test_apply_vpd_codec_rejects_mismatched_embed_fn(tmp_path):
    """jitter/no_flip alongside embed_fn already raises; the codec path
    relies on the documented caller contract instead — smoke that a
    consistent (embed_fn, upload_codec) pair works."""
    from PIL import Image

    from vpd_tpu.infer.apply_vpd import (apply_vpd, load_student_dir,
                                         make_variant_embed,
                                         scan_crop_dir)
    from vpd_tpu.tools.bench_extract_e2e import make_model_dir

    rng = np.random.default_rng(5)
    crop_dir = tmp_path / 'crops'
    vdir = crop_dir / 'v0'
    os.makedirs(vdir)
    for f in range(4):
        Image.fromarray(rng.integers(
            0, 256, (IMG, IMG, 3), dtype=np.uint8)).save(
            vdir / '{}.png'.format(f))

    model_dir = str(tmp_path / 'model')
    make_model_dir(model_dir, 'resnet18', 8, IMG, False)
    videos, tasks = scan_crop_dir(str(crop_dir))
    prepared = load_student_dir(model_dir)
    embed = make_variant_embed(*prepared, upload_codec='yuv420')
    out = str(tmp_path / 'out')
    apply_vpd(videos, tasks, model_dir, out, batch_size=4,
              log=lambda *a: None, prepared=prepared, embed_fn=embed,
              upload_codec='yuv420')
    assert os.path.exists(os.path.join(out, 'v0.emb.pkl'))


def test_native_luma_packer_matches_spec_bitexact():
    """vpd_luma_pack == the Y plane of the yuv420 spec, bit for bit,
    including odd spatial dims (which yuv420 itself rejects)."""
    from vpd_tpu.data import native_loader

    if not (native_loader.available() and hasattr(
            native_loader.get_lib(), 'vpd_luma_pack')):
        pytest.skip('native luma packer unavailable')
    from vpd_tpu.data.upload_codec import encode_yuv420_numpy

    rgb = np.random.default_rng(9).integers(
        0, 256, (16, IMG, IMG, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        native_loader.luma_pack(rgb),
        encode_yuv420_numpy(rgb)[:, :IMG * IMG])
    rgb_odd = np.random.default_rng(10).integers(
        0, 256, (3, 31, 45, 3), dtype=np.uint8)
    x = rgb_odd.astype(np.float32)
    spec = np.clip(np.rint(
        np.float32(0.299) * x[..., 0] + np.float32(0.587) * x[..., 1]
        + np.float32(0.114) * x[..., 2]), 0, 255) \
        .astype(np.uint8).reshape(3, -1)
    np.testing.assert_array_equal(native_loader.luma_pack(rgb_odd), spec)
