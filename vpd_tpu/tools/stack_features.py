#!/usr/bin/env python3
"""Concatenate two embedding dirs per frame (e.g. VIPE (+) 2D).

CLI parity with reference `stack_features.py` (min-of-scores meta).
"""

import argparse
import os

import numpy as np

from ..core.io import load_pickle, store_pickle
from ..data.crops import get_pose_score


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('emb_dir1', type=str)
    parser.add_argument('emb_dir2', type=str)
    parser.add_argument('-o', '--out_dir', type=str)
    return parser.parse_args()


def main(emb_dir1, emb_dir2, out_dir):
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)

    for emb_file in sorted(os.listdir(emb_dir1)):
        embs1 = load_pickle(os.path.join(emb_dir1, emb_file))
        embs2 = load_pickle(os.path.join(emb_dir2, emb_file))
        assert len(embs1) == len(embs2)

        embs = []
        for a, b in zip(embs1, embs2):
            assert a[0] == b[0], 'Frame mismatch: {} != {} - {}'.format(
                a[0], b[0], emb_file)
            stacked = np.concatenate(
                (a[1], b[1]), axis=0 if len(a[1].shape) == 1 else 1)
            meta = a[2]
            meta['kp_score'] = min(get_pose_score(meta, 0.5),
                                   get_pose_score(b[2], 0.5))
            embs.append((a[0], stacked, meta))

        if out_dir is not None:
            store_pickle(os.path.join(out_dir, emb_file), embs)
    print('Done!')


if __name__ == '__main__':
    main(**vars(get_args()))
