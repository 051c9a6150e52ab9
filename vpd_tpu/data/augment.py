"""Device-side batched image augmentation for the VPD student.

The reference augments per-sample on CPU workers with torchvision
(`vpd_dataset/common.py:39-108`, `vpd_dataset/single_frame.py:49-88`):
ColorJitter -> normalize -> mask noise -> flow concat -> flip (+x-flow
negation) -> RandomResizedCrop. Here the whole chain is a single jitted,
vmapped program over a uint8 NHWC batch: the host only decodes PNGs; the
TPU does everything else fused with the model step (HBM-friendly: one
uint8 transfer per batch, float math on device).

Semantics parity notes:
* jitter ranges: brightness/contrast 0.2, saturation 0.05, hue 0.05
  (`vpd_dataset/common.py:11-12`); factors are sampled per sample.
  torchvision applies the four ops in a random order per image; the
  batched path (`batch_color_jitter`) samples a random order per BATCH
  and dispatches one `lax.switch` branch (per-sample order would force
  all 24 permutations to evaluate under vmap). The per-sample
  `color_jitter` keeps a fixed order (QUIRKS.md).
* mask noise keeps the reference's acknowledged FIXME direction
  (`single_frame.py:68-73`): gaussian noise on the *person* pixels.
* flips negate the x-flow channel (index 3 of RGBF).
* RandomResizedCrop(scale=(0.5, 1), ratio=(0.9, 1.1)) resampled with an
  explicit bilinear gather grid.
"""

import itertools

import jax
import jax.numpy as jnp

JITTER = {'brightness': 0.2, 'contrast': 0.2,
          'saturation': 0.05, 'hue': 0.05}

# Per-sport channel statistics (reference vpd_dataset/common.py:14-36).
RGB_MEAN_STD = {
    'tennis': (
        (0.44157383614877077, 0.47029633580897046, 0.4534017568516162),
        (0.13526736314774856, 0.1208027074415591, 0.1261687563723076)),
    'fs': (
        (0.5747710337842444, 0.5644043210903272, 0.6334494151377134),
        (0.21349823115367886, 0.21827191146692457, 0.20393919008463163)),
    'fx': (
        (0.38402001736617936, 0.34764328219285123, 0.4099846773620623),
        (0.19505844565544309, 0.18984186888162677, 0.1989230425908947)),
    'diving48': (
        (0.3411329922282787, 0.46349889258964044, 0.5162481674015696),
        (0.16302619019820488, 0.17092395707914718, 0.19266662199338647)),
    'penn': (
        (0.43258389316320306, 0.4293850246457961, 0.383481774195889),
        (0.18936336742486998, 0.18502009571154798, 0.18244625387985822)),
    'resnet': ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
}

RANDOM_NOISE_SD = 0.05 ** 0.5  # sqrt(0.05), single_frame.py:21


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.)
    safe = jnp.maximum(delta, 1e-8)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    def pick(options):
        # explicit select chain; jnp.choose lowers to slow TPU gathers
        out = options[5]
        for sector in range(5):
            out = jnp.where(i == sector, options[sector], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(rgb, key, brightness=0.2, contrast=0.2, saturation=0.05,
                 hue=0.05):
    """Jitter one (H, W, 3) image in [0,1]; factors sampled from `key`."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (), minval=1 - brightness,
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=1 - contrast,
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=1 - saturation,
                            maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    # factors are sampled in f32 for RNG-stream stability across dtypes,
    # then cast so bf16 inputs stay bf16 (strong f32 would promote)
    fb, fc, fs, fh = (f.astype(rgb.dtype) for f in (fb, fc, fs, fh))

    rgb = jnp.clip(rgb * fb, 0., 1.)
    gray = jnp.mean(0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                    + 0.114 * rgb[..., 2])
    rgb = jnp.clip((rgb - gray) * fc + gray, 0., 1.)
    per_px_gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                   + 0.114 * rgb[..., 2])[..., None]
    rgb = jnp.clip((rgb - per_px_gray) * fs + per_px_gray, 0., 1.)
    hsv = _rgb_to_hsv(rgb)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + fh) % 1.0)
    return _hsv_to_rgb(hsv)


_JITTER_ORDERS = tuple(itertools.permutations(range(4)))


def batch_color_jitter(rgb, key, brightness=0.2, contrast=0.2,
                       saturation=0.05, hue=0.05, order=None,
                       per_sample_order=False):
    """Jitter a (B, H, W, 3) batch in [0,1]; per-sample factors.

    Reference parity: torchvision ColorJitter shuffles the op order
    (brightness, contrast, saturation, hue) per image
    (`vpd_dataset/common.py:20-26` via transforms.ColorJitter). The
    default samples the order per BATCH and dispatches one `lax.switch`
    branch — the op-order marginal distribution matches at zero extra
    compute (QUIRKS.md). `per_sample_order=True` replicates torchvision
    exactly: each sample draws its own permutation, realized as a fixed
    4-step chain that computes the four candidate ops per step and
    selects per sample with broadcast masks (TPU has no per-lane control
    flow, so the ops run ~4x; opt-in for parity-exact training).
    `order`: force one permutation for the whole batch (testing).
    """
    b = rgb.shape[0]
    kb, kc, ks, kh, ko = jax.random.split(key, 5)
    dt = rgb.dtype
    fb = jax.random.uniform(kb, (b, 1, 1, 1), minval=1 - brightness,
                            maxval=1 + brightness).astype(dt)
    fc = jax.random.uniform(kc, (b, 1, 1, 1), minval=1 - contrast,
                            maxval=1 + contrast).astype(dt)
    fs = jax.random.uniform(ks, (b, 1, 1, 1), minval=1 - saturation,
                            maxval=1 + saturation).astype(dt)
    fh = jax.random.uniform(kh, (b, 1, 1), minval=-hue,
                            maxval=hue).astype(dt)

    def gray_px(x):
        return (0.299 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2])

    def op_brightness(x):
        return jnp.clip(x * fb, 0., 1.)

    def op_contrast(x):  # blend with the per-image mean grayscale
        g = jnp.mean(gray_px(x), axis=(1, 2), keepdims=True)[..., None]
        return jnp.clip((x - g) * fc + g, 0., 1.)

    def op_saturation(x):  # blend with the per-pixel grayscale
        g = gray_px(x)[..., None]
        return jnp.clip((x - g) * fs + g, 0., 1.)

    def op_hue(x):
        hsv = _rgb_to_hsv(x)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + fh) % 1.0)
        return _hsv_to_rgb(hsv)

    ops = (op_brightness, op_contrast, op_saturation, op_hue)

    def compose(perm):
        def branch(x):
            for i in perm:
                x = ops[i](x)
            return x
        return branch

    if order is not None:
        return compose(tuple(order))(rgb)
    if per_sample_order:
        # (B, 4) independent permutations; step s applies op perms[:, s].
        perms = jax.vmap(lambda k: jax.random.permutation(k, 4))(
            jax.random.split(ko, b))
        x = rgb
        for step in range(4):
            sel = perms[:, step][:, None, None, None]
            cand = [op(x) for op in ops]
            x = jnp.where(sel == 0, cand[0],
                          jnp.where(sel == 1, cand[1],
                                    jnp.where(sel == 2, cand[2], cand[3])))
        return x
    idx = jax.random.randint(ko, (), 0, len(_JITTER_ORDERS))
    return jax.lax.switch(idx, [compose(p) for p in _JITTER_ORDERS], rgb)


def _interp_matrix(coords, size):
    """(out,) float source coords -> (out, size) bilinear weight rows.

    Each row holds (1-w) at floor(coord) and w at floor(coord)+1 (border
    clamped; a clamped pair collapses onto one index summing to 1). Built
    from iota comparisons — no gathers, so the resample below lowers to
    MXU matmuls instead of per-sample TPU gathers under vmap.
    """
    i = jnp.arange(size)
    c0 = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, size - 1)
    c1 = jnp.clip(c0 + 1, 0, size - 1)
    w = jnp.clip(coords - c0, 0., 1.)
    m0 = (i[None, :] == c0[:, None]) * (1. - w)[:, None]
    m1 = (i[None, :] == c1[:, None]) * w[:, None]
    return m0 + m1


def bilinear_resample(img, top, left, crop_h, crop_w, out_h, out_w):
    """Crop (top, left, crop_h, crop_w) from (H, W, C), resize bilinear.

    Separable: out = Wy @ img @ Wx^T with per-sample interpolation weight
    matrices, i.e. two matmuls that batch onto the MXU under vmap (the
    gather formulation was ~10x slower at train batch sizes).
    """
    h, w = img.shape[0], img.shape[1]
    ys = top + (jnp.arange(out_h) + 0.5) * crop_h / out_h - 0.5
    xs = left + (jnp.arange(out_w) + 0.5) * crop_w / out_w - 0.5
    wy = _interp_matrix(ys, h).astype(img.dtype)  # (out_h, h)
    wx = _interp_matrix(xs, w).astype(img.dtype)  # (out_w, w)
    tmp = jnp.einsum('iy,yxc->ixc', wy, img)
    return jnp.einsum('jx,ixc->ijc', wx, tmp)


def random_resized_crop(img, key, out_size, scale=(0.5, 1.0),
                        ratio=(0.9, 1.1)):
    """torchvision RandomResizedCrop parity (common.py:49-50)."""
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, (), minval=scale[0],
                                      maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    crop_w = jnp.clip(jnp.sqrt(area * aspect), 1., w)
    crop_h = jnp.clip(jnp.sqrt(area / aspect), 1., h)
    top = jax.random.uniform(k3, ()) * (h - crop_h)
    left = jax.random.uniform(k4, ()) * (w - crop_w)
    return bilinear_resample(img, top, left, crop_h, crop_w,
                             out_size, out_size)


def normalize_rgb(rgb01, mean, std):
    return ((rgb01 - jnp.asarray(mean, rgb01.dtype))
            / jnp.asarray(std, rgb01.dtype))


def decode_flow(flow_u8, dtype=jnp.float32):
    """(H, W, >=2) uint8 flow PNG -> 2ch float in [-0.5, 0.5]."""
    return flow_u8[..., :2].astype(dtype) / 255. - 0.5


def train_augment_batch(key, rgb_u8, mean, std, flow_u8=None, mask_u8=None,
                        flip=None, out_size=128, jitter=True,
                        mask_noise_prob=0.5, dtype=jnp.float32,
                        jitter_order='batch'):
    """The full fused train-time augmentation over an NHWC uint8 batch.

    rgb_u8: (B, H, W, 3); flow_u8: (B, H, W, >=2) or None; mask_u8:
    (B, H, W) person mask or None; flip: (B,) bool or None (sampled here).
    Returns (B, out, out, C) in `dtype` with C = 3 or 5, normalized.
    `dtype=bfloat16` halves the augment block's HBM traffic and runs the
    resample matmuls at MXU bf16 rate (the student model is bf16 anyway,
    so the cast merely moves earlier); default float32 is bit-compatible
    with rounds 1-2.
    """
    b = rgb_u8.shape[0]
    keys = jax.random.split(key, b)

    if flip is None:
        flip = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5, (b,))

    rgb01 = rgb_u8.astype(dtype) / 255.
    if jitter:
        # jitter_order='batch': one op order per batch (default, free);
        # 'per_sample': torchvision-exact per-image order (~4x op cost)
        rgb01 = batch_color_jitter(
            rgb01, jax.random.fold_in(key, 2),
            per_sample_order=(jitter_order == 'per_sample'), **JITTER)

    def one(rgb, flow1, mask1, fl, k):
        kj, kn, kc, kp = jax.random.split(k, 4)
        x = normalize_rgb(rgb, mean, std)

        if mask1 is not None:
            # reference quirk: noise on PERSON pixels (mask != 0)
            noise = jax.random.normal(kn, x.shape, x.dtype) \
                * RANDOM_NOISE_SD
            person = (mask1 > 0)[..., None]
            apply_noise = jax.random.uniform(kp, ()) <= mask_noise_prob
            x = x + jnp.where(apply_noise & person, noise,
                              jnp.zeros((), x.dtype))

        if flow1 is not None:
            x = jnp.concatenate([x, decode_flow(flow1, x.dtype)], axis=-1)

        def do_flip(z):
            z = z[:, ::-1, :]
            if flow1 is not None:
                z = z.at[..., 3].multiply(-1.)
            return z

        x = jax.lax.cond(fl, do_flip, lambda z: z, x)
        return random_resized_crop(x, kc, out_size)

    return jax.vmap(one)(rgb01, flow_u8, mask_u8, flip, keys), flip


def eval_transform_batch(rgb_u8, mean, std, flow_u8=None):
    """Deterministic extraction path: normalize (+flow concat) only."""
    x = normalize_rgb(rgb_u8.astype(jnp.float32) / 255., mean, std)
    if flow_u8 is not None:
        x = jnp.concatenate([x, decode_flow(flow_u8)], axis=-1)
    return x


def flip_batch(x, has_flow):
    """Horizontal flip with x-flow negation (extraction flip variants)."""
    x = x[:, :, ::-1, :]
    if has_flow:
        x = x.at[..., 3].multiply(-1.)
    return x
