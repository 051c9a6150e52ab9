"""Opt-in lossy upload codec for host->device crop transfer (YUV 4:2:0).

The dev-tunnel link is the measured extraction bottleneck (PERF.md:
~30-70 MB/s H2D; the chip sits 95% idle at 128x128 uint8 batches). jax
ships device_put buffers raw — there is no relay-side decompress hook
and XLA cannot inflate zlib on device — so the only lever is a cheaper
*device-decodable* encoding. YUV 4:2:0 halves the payload (1.5 B/px vs
3): the host packs RGB into a full-res luma plane + 2x2-mean-pooled
chroma planes (vectorized numpy, BT.601 full-range), and the device
reconstructs uint8 RGB with reshapes + broadcasts at the top of the
jitted embed program (microseconds next to the encoder). Chroma
subsampling is visually lossless on natural video crops but NOT
bit-exact — strictly opt-in (`--upload_codec yuv420`), default raw.

No reference counterpart (the reference's GPU is PCIe-attached,
`apply_vpd_model.py:154-157` never worries about upload); this exists
to close the tunnel-H2D question with a mitigation + measurement
(PERF.md "upload codec").
"""

import numpy as np

CODECS = ('raw', 'yuv420')
# flow-upload codecs (tools/compute_flow.py): y8 ships ONLY the luma
# plane (1/3 the bytes) — valid when the estimator is luminance-only
# (the Lucas-Kanade pyramid grays its input as its first op anyway).
FLOW_CODECS = ('raw', 'yuv420', 'y8')

# BT.601 full-range analog coefficients (the standard JPEG/YCbCr pair).
_KR, _KG, _KB = 0.299, 0.587, 0.114
_U_SCALE = 0.564  # = 0.5 / (1 - KB)
_V_SCALE = 0.713  # = 0.5 / (1 - KR)


def packed_nbytes(h, w):
    """Per-sample packed size: full-res Y + quarter-res U and V."""
    assert h % 2 == 0 and w % 2 == 0, 'yuv420 needs even dims'
    return h * w + 2 * (h // 2) * (w // 2)


def encode_yuv420(rgb_u8, n_threads=None):
    """(B, H, W, 3) uint8 RGB -> (B, H*W*3//2) uint8 packed YUV 4:2:0.

    Uses the native single-pass packer when available (the numpy path
    is ~0.6 s per 1024x128x128 batch on a 1-core host — at tunnel-link
    speeds that would co-bottleneck with the upload it exists to fix);
    both paths implement the same deterministic float32 spec and match
    bit for bit (tested).
    """
    from . import native_loader
    if native_loader.available() and hasattr(
            native_loader.get_lib(), 'vpd_yuv420_pack'):
        return native_loader.yuv420_pack(rgb_u8, n_threads=n_threads)
    return encode_yuv420_numpy(rgb_u8)


def encode_yuv420_numpy(rgb_u8):
    """Pure-numpy encoder (fallback + the native packer's oracle).

    Spec (deterministic float32, fixed op order — the C++ packer
    replicates it exactly):
      Y   = rint(0.299 R + 0.587 G + 0.114 B)          per pixel
      R2,G2,B2 = 2x2 integer sums * 0.25               per chroma site
                 (exact in float32: sums <= 1020, /4 keeps .25 steps)
      Y2  = 0.299 R2 + 0.587 G2 + 0.114 B2
      U   = rint((B2 - Y2) * 0.564 + 128)
      V   = rint((R2 - Y2) * 0.713 + 128)
    Chroma pools BEFORE the transform — identical to transforming then
    pooling (the transform is linear) but exactly reproducible.
    """
    b, h, w, _ = rgb_u8.shape
    assert h % 2 == 0 and w % 2 == 0, 'yuv420 needs even dims'
    x = rgb_u8.astype(np.float32)
    r, g, bl = x[..., 0], x[..., 1], x[..., 2]
    y = _KR * r + _KG * g + _KB * bl
    x16 = rgb_u8.astype(np.uint16)
    p = (x16[:, 0::2, 0::2] + x16[:, 0::2, 1::2]
         + x16[:, 1::2, 0::2] + x16[:, 1::2, 1::2]) \
        .astype(np.float32) * np.float32(0.25)
    r2, g2, b2 = p[..., 0], p[..., 1], p[..., 2]
    y2 = _KR * r2 + _KG * g2 + _KB * b2
    u = (b2 - y2) * _U_SCALE + 128.0
    v = (r2 - y2) * _V_SCALE + 128.0

    def q(z):
        return np.clip(np.rint(z), 0, 255).astype(np.uint8)

    return np.concatenate(
        [q(y).reshape(b, -1), q(u).reshape(b, -1), q(v).reshape(b, -1)],
        axis=1)


def encode_luma(rgb_u8, n_threads=None):
    """(B, H, W, 3) uint8 RGB -> (B, H*W) uint8 luma plane (Y of yuv420).

    3x smaller than raw RGB; for luminance-only consumers (the LK flow
    pyramid) the only loss vs raw is Y's rint-to-uint8 quantization
    (<= 0.5/255 in gray), since those consumers discard chroma anyway.
    Bit-identical to the first H*W bytes of `encode_yuv420`.
    """
    from . import native_loader
    if native_loader.available() and hasattr(
            native_loader.get_lib(), 'vpd_luma_pack'):
        return native_loader.luma_pack(rgb_u8, n_threads=n_threads)
    x = rgb_u8.astype(np.float32)
    y = _KR * x[..., 0] + _KG * x[..., 1] + _KB * x[..., 2]
    return np.clip(np.rint(y), 0, 255).astype(np.uint8) \
        .reshape(rgb_u8.shape[0], -1)


def decode_yuv420(packed, h, w):
    """(B, H*W*3//2) uint8 -> (B, H, W, 3) uint8 RGB; jnp, jit-safe.

    Chroma is upsampled nearest (broadcast repeat); the inverse BT.601
    transform runs in float32 and rounds back to uint8, matching
    `decode_yuv420_reference` bit for bit (tested).
    """
    import jax.numpy as jnp

    b = packed.shape[0]
    n_y = h * w
    n_c = (h // 2) * (w // 2)
    y = packed[:, :n_y].astype(jnp.float32).reshape(b, h, w)
    u = packed[:, n_y:n_y + n_c].astype(jnp.float32) \
        .reshape(b, h // 2, w // 2) - 128.0
    v = packed[:, n_y + n_c:].astype(jnp.float32) \
        .reshape(b, h // 2, w // 2) - 128.0
    # nearest 2x upsample without gathers: insert axes and broadcast
    u = jnp.broadcast_to(u[:, :, None, :, None],
                         (b, h // 2, 2, w // 2, 2)).reshape(b, h, w)
    v = jnp.broadcast_to(v[:, :, None, :, None],
                         (b, h // 2, 2, w // 2, 2)).reshape(b, h, w)
    r = y + v / _V_SCALE
    bl = y + u / _U_SCALE
    g = (y - _KR * r - _KB * bl) / _KG
    rgb = jnp.stack([r, g, bl], axis=-1)
    # round half away from zero like np.rint on the non-negative clip
    # range (values are clipped first so rint == floor(x + .5) here)
    rgb = jnp.clip(rgb, 0.0, 255.0)
    return jnp.floor(rgb + 0.5).astype(jnp.uint8)


def decode_yuv420_reference(packed, h, w):
    """Numpy oracle for `decode_yuv420` (same math, host-side)."""
    b = packed.shape[0]
    n_y = h * w
    n_c = (h // 2) * (w // 2)
    y = packed[:, :n_y].astype(np.float32).reshape(b, h, w)
    u = packed[:, n_y:n_y + n_c].astype(np.float32) \
        .reshape(b, h // 2, w // 2) - 128.0
    v = packed[:, n_y + n_c:].astype(np.float32) \
        .reshape(b, h // 2, w // 2) - 128.0
    u = np.repeat(np.repeat(u, 2, axis=1), 2, axis=2)
    v = np.repeat(np.repeat(v, 2, axis=1), 2, axis=2)
    r = y + v / _V_SCALE
    bl = y + u / _U_SCALE
    g = (y - _KR * r - _KB * bl) / _KG
    rgb = np.stack([r, g, bl], axis=-1)
    rgb = np.clip(rgb, 0.0, 255.0)
    return np.floor(rgb + 0.5).astype(np.uint8)
