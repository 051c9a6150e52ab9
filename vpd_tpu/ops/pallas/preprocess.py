"""Pallas TPU kernel: fused crop preprocessing.

One VMEM pass turns raw uint8 crops (+ flow) into normalized bfloat16
model input: u8->f32, /255, per-channel mean/std, flow decode to
[-0.5, 0.5], channel interleave to RGBF, and per-sample horizontal flip
with x-flow negation — the device half of the reference's CPU-worker
pipeline (`vpd_dataset/common.py:52-80`), fused so each batch touches HBM
once as uint8 and once as bf16.

Layout: NHWC is hostile to TPU tiling when C is 3/5 (the lane dimension
pads to 128, a 25x VMEM blowup), so arrays are viewed as (B, H, W*C) with
the W*C axis on lanes (384/640 lanes, both multiples of 128). Channel
interleave (W*3 + W*2 -> W*5) and the horizontal flip are 0/1 permutation
matrices built from iota inside the kernel and applied on the MXU;
per-channel mean/std and the x-flow sign pattern are iota-built lane
vectors. (Mosaic has no `rev` or uint8->float cast; casts hop through
int32.)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_pattern(values, period, length):
    """A (length,) f32 vector cycling `values` with the given period."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, length), 1)
    out = jnp.full((1, length), float(values[-1]), jnp.float32)
    for c in range(len(values) - 1):
        out = jnp.where(lane % period == c, float(values[c]), out)
    return out


def _kernel(rgb_ref, flow_ref, flip_ref, out_ref, *, mean, std, use_flow,
            w):
    # normalize rgb lanes: channel = lane % 3
    rgb = rgb_ref[:].astype(jnp.int32).astype(jnp.float32) * (1. / 255.)
    mean_v = _lane_pattern(mean, 3, rgb.shape[-1])
    inv_std_v = _lane_pattern([1. / s for s in std], 3, rgb.shape[-1])
    rgb = (rgb - mean_v) * inv_std_v
    bb, h, wc3 = rgb.shape

    if use_flow:
        flow = (flow_ref[:].astype(jnp.int32).astype(jnp.float32)
                * (1. / 255.) - 0.5)
        channels = 5
        # interleave: out lane l = (w, c); rgb lane i = (i//3, i%3),
        # flow lane j = (j//3, j%3) with c-3 = j%3 (only j%3 < 2 used)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (wc3, w * 5), 1)
        rgb_lane = jax.lax.broadcasted_iota(jnp.int32, (wc3, w * 5), 0)
        p_rgb = ((out_lane % 5 == rgb_lane % 3)
                 & (out_lane % 5 < 3)
                 & (out_lane // 5 == rgb_lane // 3)).astype(jnp.float32)
        p_flow = ((out_lane % 5 - 3 == rgb_lane % 3)
                  & (out_lane % 5 >= 3)
                  & (out_lane // 5 == rgb_lane // 3)).astype(jnp.float32)

        def mat(x, p):
            return jax.lax.dot_general(
                x.reshape(bb * h, wc3), p,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(bb, h, w * 5)

        x = mat(rgb, p_rgb) + mat(flow, p_flow)
    else:
        channels = 3
        x = rgb

    wc = w * channels
    # horizontal flip: out lane (w', c) <- in lane (w-1-w', c)
    a = jax.lax.broadcasted_iota(jnp.int32, (wc, wc), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (wc, wc), 1)
    p_flip = ((b // channels == (w - 1) - a // channels)
              & (b % channels == a % channels)).astype(jnp.float32)
    flipped = jax.lax.dot_general(
        x.reshape(bb * h, wc), p_flip,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bb, h, wc)
    if use_flow:
        # negate the x-flow channel (lane % 5 == 3) of flipped variants
        sign = _lane_pattern([1., 1., 1., -1., 1.], 5, wc)
        flipped = flipped * sign

    fl = flip_ref[:].reshape(-1, 1, 1) != 0
    out_ref[:] = jnp.where(fl, flipped, x).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('mean', 'std', 'block_b',
                                             'out_dtype', 'interpret'))
def preprocess_crops_pallas(rgb_u8, flow_u8, flip, mean, std,
                            block_b=8, out_dtype=jnp.bfloat16,
                            interpret=False):
    """(B, H, W, 3) u8 [+ (B, H, W, >=3) u8 flow] -> (B, H, W, C) bf16.

    flip: (B,) int/bool; pass flow_u8=None for RGB-only. Any B: batches
    not divisible by `block_b` are zero-padded to the next grid row and
    sliced back after the kernel (the extraction CLI's default batch of
    500 is not a multiple of 8).
    """
    b, h, w, _ = rgb_u8.shape
    use_flow = flow_u8 is not None
    channels = 5 if use_flow else 3

    mean = tuple(float(m) for m in mean)
    std = tuple(float(s) for s in std)
    flip = flip.astype(jnp.int32).reshape(-1, 1)

    pad = -b % block_b
    if pad:
        rgb_u8 = jnp.concatenate(
            [rgb_u8, jnp.zeros((pad, h, w, 3), rgb_u8.dtype)])
        if use_flow:
            flow_u8 = jnp.concatenate(
                [flow_u8,
                 jnp.zeros((pad,) + flow_u8.shape[1:], flow_u8.dtype)])
        flip = jnp.concatenate([flip, jnp.zeros((pad, 1), flip.dtype)])
    n = b + pad

    rgb_flat = rgb_u8.reshape(n, h, w * 3)
    inputs = [rgb_flat]
    in_specs = [pl.BlockSpec((block_b, h, w * 3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    if use_flow:
        inputs.append(flow_u8[..., :3].reshape(n, h, w * 3))
        in_specs.append(pl.BlockSpec((block_b, h, w * 3),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    else:
        inputs.append(jnp.zeros((n, 1, 128), jnp.uint8))
        in_specs.append(pl.BlockSpec((block_b, 1, 128),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    inputs.append(flip)
    in_specs.append(pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, mean=mean, std=std,
                               use_flow=use_flow, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(n // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, h, w * channels),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w * channels), out_dtype),
        interpret=interpret,
        # the f32 intermediates + the iota-built permutation matrices
        # overflow the default 16 MB scoped-vmem budget at large grids;
        # the chip has 128 MB of VMEM, so raise the ceiling instead of
        # shrinking the block below one MXU tile
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*inputs)
    return out[:b].reshape(b, h, w, channels)
