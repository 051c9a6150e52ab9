#!/usr/bin/env python3
"""Pack a crop PNG directory into contiguous uint8 shards (a decode-free
cache; see `data/shards.py`).

No reference counterpart: the reference pays PNG decode on every epoch
behind DataLoader worker processes (`apply_vpd_model.py:154-157`,
`train_vpd_model.py` num_workers); this one-time transcode makes batch
assembly a memmap gather instead. PNGs stay the interchange format.

Usage:
  python -m vpd_tpu.tools.pack_crops --img_dir <crops> --out_dir <shards> \
      --dim 128 [--flow_img flow] [--no_mask]
"""

import argparse

from ..data.shards import DEFAULT_ROWS_PER_SHARD, pack_crops


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--img_dir', type=str, required=True)
    parser.add_argument('--out_dir', type=str, required=True)
    parser.add_argument('--dim', type=int, default=128)
    parser.add_argument('--flow_img', type=str,
                        help='also pack <frame>.<flow_img>.png streams')
    parser.add_argument('--no_mask', action='store_true',
                        help='skip <frame>.mask.png streams')
    parser.add_argument('--rows_per_shard', type=int,
                        default=DEFAULT_ROWS_PER_SHARD)
    parser.add_argument('--codec', default='raw',
                        choices=('raw', 'yuv420'),
                        help='yuv420: store rgb pre-packed in the lossy '
                             'upload codec (extraction-only shards; no '
                             'per-batch host encode, half the bytes)')
    return parser.parse_args()


def main(img_dir, out_dir, dim, flow_img, no_mask, rows_per_shard, codec):
    pack_crops(img_dir, out_dir, dim, flow_img_name=flow_img,
               use_mask=not no_mask, rows_per_shard=rows_per_shard,
               codec=codec)
    print('Done!')


if __name__ == '__main__':
    main(**vars(get_args()))
