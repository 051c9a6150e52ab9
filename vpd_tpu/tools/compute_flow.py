#!/usr/bin/env python3
"""Compute optical flow PNGs for crop directories (raft/flow.py parity).

Walks crop dirs for ('<frame>.prev.png', '<frame>.png') pairs, estimates
flow on device, and writes '<frame>.<out_name>.png' in the reference's
quantized format (clip +/-20, optional median subtraction). Two TPU
estimators: the batched Lucas-Kanade pyramid (default, no weights
needed) or the Flax RAFT port (`--model raft --raft_weights <ckpt.pth>`,
accepts official princeton-vl checkpoints; iters=20 as in
raft/flow.py:111). Externally-generated RAFT PNGs remain interchangeable.

On upload-bound links (the dev tunnel, PERF.md) `--upload_codec` shrinks
the host->device frame payload: `yuv420` (half the bytes, lossy chroma,
any model) or `y8` (luma plane only, 1/3 the bytes, `--model lk` which
grays its input anyway). Both decode at the top of the jitted flow
program; default `raw` is bit-exact.
"""

import argparse
import os

import numpy as np

from ..data.crops import decode_crop_batch
from ..ops.flow import lucas_kanade_flow


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('path', help='crop root (videos as subdirs)')
    parser.add_argument('--out_name', type=str, required=True,
                        help='suffix: <frame>.<out_name>.png')
    parser.add_argument('--clip', type=int, default=20)
    parser.add_argument('--img_dim', type=int, default=128)
    parser.add_argument('--batch_size', type=int, default=256)
    parser.add_argument('--overwrite', action='store_true')
    parser.add_argument('--subtract_median', action='store_true')
    parser.add_argument('--model', default='lk',
                        help="'lk' (TPU Lucas-Kanade), 'raft', or — for "
                             "drop-in reference argv compatibility "
                             "(raft/flow.py:128-129) — a torch RAFT "
                             "checkpoint path, which implies "
                             "--model raft --raft_weights <path>")
    parser.add_argument('--raft_weights', type=str,
                        help='torch RAFT checkpoint (.pth) for --model raft')
    parser.add_argument('--raft_iters', type=int, default=20)
    parser.add_argument('--small', action='store_true',
                        help='raft-small architecture (auto-detected from '
                             '--raft_weights; needed only without weights)')
    # reference raft/flow.py:133-135 knobs, kept for drop-in argv
    # compatibility (incl. the reference's type=bool quirk where any
    # non-empty value parses as True)
    parser.add_argument('--mixed_precision', type=bool, default=True,
                        help='bf16 RAFT compute (the CUDA AMP analogue); '
                             'ignored for --model lk')
    parser.add_argument('--alternate_corr', action='store_true',
                        help='accepted for reference compatibility; the '
                             'correlation volume here is already the '
                             'memory-efficient MXU-matmul form')
    parser.add_argument('--data_parallel', action='store_true',
                        help='shard each batch over all local devices '
                             '(inference fan-out; flow is batch-'
                             'parallel, no collectives)')
    from ..data.upload_codec import FLOW_CODECS
    parser.add_argument('--upload_codec', choices=FLOW_CODECS,
                        default='raw',
                        help='host->device frame encoding for upload-'
                             'bound links (PERF.md): yuv420 halves the '
                             'bytes (lossy chroma, any model); y8 ships '
                             'only the luma plane (1/3 the bytes; '
                             '--model lk only, which grays its input '
                             'anyway)')
    return parser.parse_args(argv)


def build_flow_fn(model, raft_weights=None, raft_iters=20, small=False,
                  mixed_precision=True):
    if model == 'lk':
        return lucas_kanade_flow
    import jax.numpy as jnp
    from ..models.raft import (RAFT, import_torch_raft,
                               is_small_state_dict, raft_flow_fn)
    dtype = jnp.bfloat16 if mixed_precision else None
    if raft_weights:
        from ..models.torch_compat import load_torch_state_dict
        sd = load_torch_state_dict(raft_weights)
        small = is_small_state_dict(sd)
        variables = import_torch_raft(sd)
    else:  # random init: only useful for smoke tests
        import jax
        m = RAFT(small=small)
        z = jnp.zeros((1, 64, 64, 3))
        variables = m.init(jax.random.key(0), z, z, iters=1)
    return raft_flow_fn(variables, iters=raft_iters, small=small,
                        dtype=dtype)


def get_pairs(crop_dir, out_suffix, overwrite):
    pairs = []
    for root, _, files in os.walk(crop_dir):
        for f in files:
            if f.endswith('.prev.png'):
                prefix = os.path.join(root, f[:-len('.prev.png')])
                if os.path.isfile(prefix + '.png') and (
                        overwrite or
                        not os.path.exists(prefix + out_suffix)):
                    pairs.append(prefix)
    return sorted(pairs)


def main(path, out_name, clip, img_dim, batch_size, overwrite,
         subtract_median_flag=False, model='lk', raft_weights=None,
         raft_iters=20, small=False, mixed_precision=True,
         alternate_corr=False, upload_codec='raw', mesh=None):
    """Pipelined: decode chunk i+1 on a worker thread and PNG-write chunk
    i-1 while the device computes chunk i; flow is quantized to uint8 ON
    DEVICE (ops/flow.py quantize_flow_device), cutting readback 4x —
    readback, not compute, dominates RAFT through the relay."""
    from ..ops.flow import make_quantized_flow_fn

    if model not in ('lk', 'raft'):  # reference-style checkpoint path
        if raft_weights is not None:
            raise SystemExit(
                '--model {!r} looks like a checkpoint path but '
                '--raft_weights {!r} was also given; pass one or the '
                'other'.format(model, raft_weights))
        if not os.path.isfile(model):
            # keep argparse-choices-quality errors for typos
            raise SystemExit(
                "--model must be 'lk', 'raft', or an existing torch "
                'RAFT checkpoint path (got {!r})'.format(model))
        raft_weights, model = model, 'raft'
    sub_median = subtract_median_flag
    out_suffix = '.{}.png'.format(out_name)
    pairs = get_pairs(path, out_suffix, overwrite)
    print('{} frame pairs to process'.format(len(pairs)))
    del alternate_corr  # the corr volume is already the matmul form
    if upload_codec == 'y8' and model != 'lk':
        raise SystemExit(
            '--upload_codec y8 ships luma only, which is valid for the '
            'luminance-only --model lk (RAFT consumes RGB; use yuv420)')
    if mesh is not None and batch_size % mesh.devices.size != 0:
        raise SystemExit(
            '--batch_size {} must be divisible by the {}-device mesh '
            'for the batch-dim fan-out'.format(batch_size,
                                               mesh.devices.size))
    flow_fn = build_flow_fn(model, raft_weights, raft_iters, small=small,
                            mixed_precision=mixed_precision)
    if upload_codec == 'yuv420':
        from ..data.upload_codec import decode_yuv420
        rgb_flow_fn = flow_fn

        def flow_fn(prev_p, curr_p):  # packed (B, H*W*3//2) planes
            return rgb_flow_fn(decode_yuv420(prev_p, img_dim, img_dim),
                               decode_yuv420(curr_p, img_dim, img_dim))
    elif upload_codec == 'y8':
        from ..ops.flow import lucas_kanade_flow_gray

        def flow_fn(prev_p, curr_p):  # packed (B, H*W) luma planes
            b = prev_p.shape[0]
            return lucas_kanade_flow_gray(
                prev_p.reshape(b, img_dim, img_dim),
                curr_p.reshape(b, img_dim, img_dim))
    qfn = make_quantized_flow_fn(flow_fn, clip=clip,
                                 subtract_median=sub_median)

    import cv2

    from ..core.pipeline import run_pipelined

    png_compression = [cv2.IMWRITE_PNG_COMPRESSION, 9]

    if upload_codec == 'yuv420':
        from ..data.upload_codec import encode_yuv420 as encode_upload
    elif upload_codec == 'y8':
        from ..data.upload_codec import encode_luma as encode_upload
    else:
        def encode_upload(rgb):
            return rgb

    def decode_chunk(chunk):
        prev = np.zeros((batch_size, img_dim, img_dim, 3), np.uint8)
        curr = np.zeros((batch_size, img_dim, img_dim, 3), np.uint8)
        decode_crop_batch([p + '.prev.png' for p in chunk], img_dim,
                          rgb_out=prev)
        decode_crop_batch([p + '.png' for p in chunk], img_dim,
                          rgb_out=curr)
        prev, curr = encode_upload(prev), encode_upload(curr)
        if mesh is not None:
            # Multi-device placement stays on the MAIN thread: a sharded
            # device_put racing an in-flight sharded program deadlocks
            # the CPU backend's collective rendezvous (core/mesh.py).
            return prev, curr
        # H2D starts on the decode-ahead thread so the upload (the e2e
        # bottleneck through the relay, PERF.md) overlaps the in-flight
        # flow batch. Single-device path only runs here.
        import jax

        return jax.device_put(prev), jax.device_put(curr)

    def compute(host):
        if mesh is not None:
            # batch-dim fan-out over the mesh: flow is embarrassingly
            # batch-parallel, so GSPMD compiles qfn with zero collectives
            from ..core.mesh import shard_batch

            host = shard_batch(host, mesh)
        return qfn(*host)

    def write_chunk(chunk, dev_out):
        q = np.asarray(dev_out)[:len(chunk)]  # (n, H, W, 2) uint8
        third = np.full(q.shape[1:3] + (1,), 128, np.uint8)
        for j, prefix in enumerate(chunk):
            cv2.imwrite(prefix + out_suffix,
                        np.concatenate([q[j], third], axis=-1),
                        png_compression)

    run_pipelined([pairs[i:i + batch_size]
                   for i in range(0, len(pairs), batch_size)],
                  decode_chunk, compute, write_chunk)
    print('Done!')


if __name__ == '__main__':
    a = get_args()
    mesh = None
    if a.data_parallel:
        from ..core.mesh import get_mesh
        mesh = get_mesh()
    main(a.path, a.out_name, a.clip, a.img_dim, a.batch_size, a.overwrite,
         subtract_median_flag=a.subtract_median, model=a.model,
         raft_weights=a.raft_weights, raft_iters=a.raft_iters,
         small=a.small, mixed_precision=a.mixed_precision,
         alternate_corr=a.alternate_corr, upload_codec=a.upload_codec,
         mesh=mesh)
