#!/usr/bin/env python3
"""Extract VPD student embeddings (CLI parity: `apply_vpd_model.py`)."""

import argparse

from ..infer.apply_vpd import apply_vpd, scan_crop_dir, scan_tennis_crop_dir
from . import paths

DATASETS = ['tennis', 'fs', 'fx', 'diving48']


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('model_dir', type=str)
    parser.add_argument('-d', '--dataset', type=str, required=True,
                        choices=DATASETS)
    parser.add_argument('-o', '--out_dir', type=str, required=True)
    parser.add_argument('-m', '--model_epoch', type=int)
    parser.add_argument('--jitter', type=int, default=0)
    parser.add_argument('--no_flip', action='store_true')
    parser.add_argument('--flow_img', type=str)
    parser.add_argument('--batch_size', type=int, default=512)
    parser.add_argument('--crop_shards', type=str,
                        help='packed crop-shard dir (tools/pack_crops); '
                             'replaces PNG decode with a memmap gather')
    parser.add_argument('--upload_codec', type=str, default='raw',
                        choices=('raw', 'yuv420'),
                        help='yuv420: pack RGB to half the bytes before '
                             'host->device upload and decode on device '
                             '(lossy chroma subsampling; for upload-'
                             'bound links, see data/upload_codec.py)')
    parser.add_argument('--data_parallel', action='store_true',
                        help='shard each batch over all local devices '
                             '(inference fan-out, SURVEY.md §2.8; the '
                             'embed is batch-parallel)')
    parser.add_argument('--preprocess', default='xla',
                        choices=('xla', 'pallas'),
                        help='pallas: fused normalize+interleave+flip '
                             'kernel (ops/pallas/preprocess) instead of '
                             'the XLA ops; ~7%% faster at B=4096, '
                             'slightly slower at B=1024 (PERF.md); '
                             'no-jitter extractions only')
    return parser.parse_args()


def main(model_dir, dataset, out_dir, model_epoch, jitter, no_flip,
         flow_img, batch_size, crop_shards=None, upload_codec='raw',
         data_parallel=False, preprocess='xla'):
    if dataset == 'tennis':
        crop_dir = paths.TENNIS_CROP_DIR
        videos, tasks = scan_tennis_crop_dir(
            paths.TENNIS_VIDEO_DIR, crop_dir)
    else:
        crop_dir = {'fs': paths.FS_CROP_DIR, 'fx': paths.FX_CROP_DIR,
                    'diving48': paths.DIVING48_CROP_DIR}[dataset]
        videos, tasks = scan_crop_dir(crop_dir)

    # reference batch scaling (`apply_vpd_model.py:145-149`): the device
    # program embeds (B, variants, D), so divide the base batch by the
    # jitter variants and double it when flips are off — keeps device
    # memory constant as the variant count changes
    batch_size = batch_size // (jitter + 1)
    if no_flip:
        batch_size *= 2

    shard_reader = None
    if crop_shards:
        from ..data.shards import ShardReader
        shard_reader = ShardReader(crop_shards, crop_root=crop_dir)

    mesh = None
    if data_parallel:
        from ..core.mesh import get_mesh
        mesh = get_mesh()
        if batch_size % mesh.devices.size != 0:
            raise SystemExit(
                '--batch_size {} (after variant scaling) must be '
                'divisible by the {}-device mesh'.format(
                    batch_size, mesh.devices.size))

    apply_vpd(videos, tasks, model_dir, out_dir, model_epoch=model_epoch,
              flow_img_name=flow_img, jitter=jitter, no_flip=no_flip,
              batch_size=batch_size, shard_reader=shard_reader, mesh=mesh,
              upload_codec=(None if upload_codec == 'raw'
                            else upload_codec),
              preprocess=preprocess)
    print('Done!')


if __name__ == '__main__':
    main(**vars(get_args()))
