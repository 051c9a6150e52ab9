"""VPD student feature extraction: crop PNGs -> per-video .emb.pkl.

Parity with reference `apply_vpd_model.py` + `FrameDataset`
(`vpd_dataset/single_frame.py:361-403`): for every crop, embed k variants
[orig, jitter x j, flip(, flip-jitter x j)] and write (frame, (k, D), {})
rows per video, sorted by frame. Only the encoder is used (the motion head
is train-only in the reference too).

TPU-first: the host decodes PNGs into fixed-size uint8 batches; normalize,
flow concat, flip (+x-flow negation) and jitter variants are generated ON
DEVICE inside the same jit as the ResNet forward, in bfloat16. Batches are
padded to a fixed size so one compiled program serves the whole corpus —
this path is the crops/sec/chip north-star benchmark.
"""

import itertools
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core.io import load_json, store_pickle
from ..core.pipeline import run_pipelined
from ..data import crops as crops_mod
from ..data.augment import (batch_color_jitter, eval_transform_batch,
                            flip_batch)
from ..train.vpd_loop import build_student

EXTRACT_BATCH = 512


def load_student_dir(model_dir, model_epoch=None, dtype=None):
    config = load_json(os.path.join(model_dir, 'config.json'))
    model = build_student(config, dtype=dtype)
    img_dim = config['img_dim']
    channels = 5 if config['use_flow'] else 3
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, img_dim, img_dim, channels)), train=False)
    name = ('best_epoch' if model_epoch is None
            else 'epoch{:04d}'.format(model_epoch))
    enc = ckpt.load_component(
        model_dir, name, 'encoder',
        {'params': variables['params']['encoder'],
         'batch_stats': variables.get('batch_stats', {}).get('encoder', {})})
    params = dict(variables['params'])
    params['encoder'] = enc['params']
    stats = dict(variables.get('batch_stats', {}))
    stats['encoder'] = enc['batch_stats']
    return model, {'params': params, 'batch_stats': stats}, config


def make_variant_embed(model, variables, config, jitter=0, flip=True,
                       upload_codec=None, preprocess='xla'):
    """Jitted: (B, S, S, 3[+flow]) uint8 -> (B, k, D) variant embeddings.

    Variant order: [orig, jitter x j, flip, flip-jitter x j] (flipped
    variants use flipped flow with negated x, fixing the reference's
    unflipped-flow quirk for flip-jitters, single_frame.py:386).
    `chunk_i` folds into the key INSIDE the jit (a host int arg, not an
    eager fold_in dispatch per chunk) so every chunk draws fresh jitter
    factors, like the reference's fresh ColorJitter draw per image
    (`single_frame.py:377-386`).

    `upload_codec='yuv420'`: the rgb operand is the PACKED
    (B, S*S*3//2) uint8 plane array from `data.upload_codec` — decoded
    back to uint8 RGB at the top of the program (halves H2D bytes on
    upload-bound links; lossy opt-in, see upload_codec.py).

    `preprocess='pallas'`: build the orig/flip variants with the fused
    Pallas normalize+interleave+flip kernel (`ops/pallas/preprocess`)
    instead of the XLA ops — measured ~7% faster end-of-chain at the
    B=4096 extraction rung, ~4% slower at B=1024 (PERF.md "Fused
    preprocessing"); no-jitter extractions only.
    """
    mean, std = config['rgb_mean_std']
    use_flow = config['use_flow']
    img_dim = config['img_dim']
    encoder_only = model.encoder  # motion head is train-only
    assert preprocess in ('xla', 'pallas'), preprocess
    if preprocess == 'pallas':
        assert jitter == 0, 'the Pallas preprocess covers no-jitter ' \
            'extraction only (color jitter stays on the XLA path)'

    @jax.jit
    def fn(rgb_u8, flow_u8, rng, chunk_i=0):
        if upload_codec == 'yuv420':
            from ..data.upload_codec import decode_yuv420
            rgb_u8 = decode_yuv420(rgb_u8, img_dim, img_dim)
        if preprocess == 'pallas':
            from ..ops.pallas.preprocess import preprocess_crops_pallas

            # interpret mode keeps the path testable on the CPU conftest
            interp = jax.default_backend() != 'tpu'
            fl = flow_u8 if use_flow else None

            def pre(flip_all):
                return preprocess_crops_pallas(
                    rgb_u8, fl,
                    jnp.full((rgb_u8.shape[0],), flip_all, jnp.int32),
                    mean, std, interpret=interp)

            variants = [pre(0)]
            if flip:
                variants.append(pre(1))
            k = len(variants)
            stacked = jnp.concatenate(variants, axis=0)
            embs = encoder_only.apply(
                {'params': variables['params']['encoder'],
                 'batch_stats': variables['batch_stats']['encoder']},
                stacked, train=False)
            return jnp.stack(jnp.split(embs, k, axis=0), axis=1)
        x = eval_transform_batch(rgb_u8, mean, std,
                                 flow_u8=flow_u8 if use_flow else None)
        variants = [x]
        chunk_rng = jax.random.fold_in(rng, chunk_i) if jitter else rng
        for j in range(jitter):
            jit_rgb = batch_color_jitter(
                rgb_u8.astype(jnp.float32) / 255.,
                jax.random.fold_in(chunk_rng, j))
            xj = (jit_rgb - jnp.asarray(mean)) / jnp.asarray(std)
            if use_flow:
                xj = jnp.concatenate([xj, x[..., 3:]], axis=-1)
            variants.append(xj)
        if flip:
            flipped = [flip_batch(v, use_flow) for v in variants]
            variants = variants + flipped

        k = len(variants)
        stacked = jnp.concatenate(variants, axis=0)
        embs = encoder_only.apply(
            {'params': variables['params']['encoder'],
             'batch_stats': variables['batch_stats']['encoder']},
            stacked, train=False)
        return jnp.stack(jnp.split(embs, k, axis=0), axis=1)  # (B, k, D)

    return fn


def scan_crop_dir(crop_dir):
    """Generic layout: crop_dir/<video>/<frame>.png
    (`apply_vpd_model.py:69-89`)."""
    img_re = re.compile(r'^\d+\.png$')
    videos = []
    tasks = []
    for video_name in sorted(os.listdir(crop_dir)):
        video_crop_dir = os.path.join(crop_dir, video_name)
        if not os.path.isdir(video_crop_dir):
            continue
        video_id = len(videos)
        videos.append(video_name)
        for img_file in sorted(os.listdir(video_crop_dir)):
            if img_re.match(img_file):
                frame_num = int(os.path.splitext(img_file)[0])
                tasks.append((video_id, frame_num,
                              os.path.join(video_crop_dir,
                                           str(frame_num))))
    return videos, tasks


def scan_tennis_crop_dir(video_dir, crop_dir):
    """Tennis layout: per-player crops named by source-video frame; output
    videos are '<player>__<clip>' (`apply_vpd_model.py:36-66`)."""
    videos = []
    tasks = []
    for video_file in sorted(os.listdir(video_dir)):
        if not video_file.endswith('.mp4'):
            continue
        video_name = os.path.splitext(video_file)[0]
        src_video_name, start_frame, end_frame = video_name.rsplit('_', 2)
        start_frame, end_frame = int(start_frame), int(end_frame)
        for player in ('front', 'back'):
            video_id = len(videos)
            videos.append('{}__{}'.format(player, video_name))
            for frame_num in range(start_frame, end_frame + 1):
                prefix = os.path.join(crop_dir, src_video_name, player,
                                      str(frame_num))
                if os.path.isfile(prefix + '.png'):
                    tasks.append((video_id, frame_num - start_frame, prefix))
    return videos, tasks


def apply_vpd(videos, tasks, model_dir, out_dir, model_epoch=None,
              flow_img_name=None, jitter=0, no_flip=False,
              batch_size=EXTRACT_BATCH, mesh=None, log=print,
              prepared=None, embed_fn=None, shard_reader=None, seed=0,
              upload_codec=None, preprocess='xla'):
    """Extraction; pass a `Mesh` to shard batches across chips (inference
    fan-out: sharded batch embed + host gather, SURVEY.md §2.8).

    `prepared=(model, variables, config)` and `embed_fn` let repeated
    calls in one process reuse the loaded weights and the compiled embed
    program instead of re-tracing per invocation. `embed_fn` takes
    `(rgb_u8, flow_u8, rng, chunk_i)` — the `make_variant_embed`
    contract; a legacy 3-arg `fn(rgb, flow, rng)` is also accepted (the
    per-chunk index is then dropped, so such a fn draws the same jitter
    factors every chunk). `shard_reader`
    (`data.shards.ShardReader` built with crop_root) replaces PNG decode
    with a memmap gather for packed crops; unpacked crops fall back to
    the decoder per row.

    `upload_codec='yuv420'` packs RGB host-side to half the bytes and
    decodes on device (lossy opt-in for upload-bound links; see
    `data/upload_codec.py`). Requires `embed_fn=None` or an embed built
    with the same `upload_codec`; flow planes ship raw either way.
    Shards packed with `--codec yuv420` skip the host encode entirely
    (the memmap gather fetches pre-packed rows) and require
    `upload_codec='yuv420'`.
    """
    model, variables, config = (prepared if prepared is not None
                                else load_student_dir(model_dir,
                                                      model_epoch))
    if config['use_flow']:
        assert flow_img_name, 'model uses flow; pass flow_img_name'
    img_dim = config['img_dim']
    shard_codec = 'raw' if shard_reader is None else shard_reader.codec
    if shard_codec != 'raw' and upload_codec != shard_codec:
        raise ValueError(
            'shards are packed with codec "{}"; pass upload_codec="{}" '
            '(raw pixels cannot be reconstructed from lossy shards)'
            .format(shard_codec, shard_codec))
    if mesh is not None and preprocess == 'pallas':
        raise ValueError(
            'preprocess="pallas" does not compose with the multi-device '
            'fan-out: XLA\'s SPMD partitioner has no rule for the Mosaic '
            'kernel inside the sharded embed — drop --data_parallel or '
            'use the default XLA preprocess')
    if embed_fn is not None and (jitter != 0 or no_flip):
        raise ValueError(
            'embed_fn bakes in its own jitter/flip variant set; passing '
            'jitter/no_flip alongside it would be silently ignored')
    embed = embed_fn if embed_fn is not None else make_variant_embed(
        model, variables, config, jitter=jitter, flip=not no_flip,
        upload_codec=upload_codec, preprocess=preprocess)
    if embed_fn is not None:
        import inspect

        try:
            ps = inspect.signature(embed).parameters.values()
            # variadic (*args) accepts the 4-arg call; only a fixed
            # signature with < 4 positionals is the legacy contract —
            # misclassifying a wrapped 4-arg fn as legacy would silently
            # drop chunk_i and freeze the per-chunk jitter draw
            variadic = any(p.kind == inspect.Parameter.VAR_POSITIONAL
                           for p in ps)
            n_params = len(ps)
        except (TypeError, ValueError):  # C-level callable: assume new
            variadic, n_params = True, 4
        if not variadic and n_params < 4:  # legacy fn(rgb, flow, rng)
            legacy = embed
            embed = lambda rgb, flow, rng, chunk_i: legacy(rgb, flow, rng)
    rng = jax.random.key(seed)
    chunk_counter = itertools.count()

    def decode_chunk(chunk):
        if shard_codec == 'yuv420':
            from ..data.upload_codec import packed_nbytes
            rgb = np.zeros((batch_size, packed_nbytes(img_dim, img_dim)),
                           np.uint8)
        else:
            rgb = np.zeros((batch_size, img_dim, img_dim, 3), np.uint8)
        # No flow buffer for 3-channel models: a zero (B, S, S, 3) array
        # would double the host->device bytes on upload-bound links.
        flow = (np.zeros((batch_size, img_dim, img_dim, 3), np.uint8)
                if config['use_flow'] else None)
        if shard_reader is not None:
            from ..data.shards import fill_or_decode
            fill_or_decode(
                shard_reader, [prefix for _, _, prefix in chunk], img_dim,
                flow_img_name=flow_img_name, rgb_out=rgb[:len(chunk)],
                flow_out=flow[:len(chunk)] if flow is not None else None,
                codec=shard_codec)
        else:
            crops_mod.decode_crop_batch(
                [prefix + '.png' for _, _, prefix in chunk], img_dim,
                flow_paths=(['{}.{}.png'.format(prefix, flow_img_name)
                             for _, _, prefix in chunk]
                            if config['use_flow'] else None),
                rgb_out=rgb, flow_out=flow)
        if upload_codec == 'yuv420' and shard_codec == 'raw':
            from ..data.upload_codec import encode_yuv420
            rgb = encode_yuv420(rgb)  # (B, S*S*3//2): half the bytes
        if mesh is not None:
            # Multi-device placement stays on the MAIN thread (compute):
            # a sharded device_put racing an in-flight sharded program
            # deadlocks the CPU backend's collective rendezvous
            # (core/mesh.step_sync_needed has the full story).
            return rgb, flow
        # Single device: start the H2D transfer from the decode-ahead
        # worker thread so upload overlaps the in-flight device compute
        # (upload is the bottleneck on slow links; decode on fast ones).
        return (jax.device_put(rgb),
                jax.device_put(flow) if flow is not None else None)

    chunks = [tasks[i:i + batch_size]
              for i in range(0, len(tasks), batch_size)]
    all_embs = [[] for _ in videos]

    def compute(host):
        rgb, flow = host
        if mesh is not None:
            from ..core.mesh import shard_batch

            rgb, flow = shard_batch((rgb, flow), mesh)
        # compute() runs sequentially on the main thread (run_pipelined)
        return embed(rgb, flow, rng, np.int32(next(chunk_counter)))

    def collect(chunk, dev_out):
        embs = np.asarray(dev_out)[:len(chunk)]
        for j, (video_id, frame_num, _) in enumerate(chunk):
            row = embs[j] if embs.shape[1] > 1 else embs[j, 0]
            all_embs[video_id].append((frame_num, row, {}))

    # decode ahead / device in flight / readback one behind (core.pipeline)
    run_pipelined(chunks, decode_chunk, compute, collect)

    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for video_name, embs in zip(videos, all_embs):
        if embs:
            embs.sort(key=lambda x: x[0])
            store_pickle(
                os.path.join(out_dir, '{}.emb.pkl'.format(video_name)), embs)
            written += 1
        else:
            log('{} has no crops'.format(video_name))
    log('Wrote {} videos'.format(written))
