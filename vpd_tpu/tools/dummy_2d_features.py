#!/usr/bin/env python3
"""2D-VPD baseline teacher: normalized 2D keypoints as the "embedding".

CLI parity with reference `dummy_2d_features.py` (the teacher-free way to
exercise the whole student + downstream stack).
"""

import argparse
import os

import numpy as np

from ..core.io import load_gz_json, store_pickle
from ..geometry.coco import normalize_2d_skeleton
from ..infer.apply_vipe import iter_pose_videos


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('pose_dir', type=str)
    parser.add_argument('-o', '--out_dir', type=str)
    parser.add_argument('--no_flip', action='store_true')
    return parser.parse_args()


def main(pose_dir, out_dir, no_flip):
    for video_name, pose_path in iter_pose_videos(pose_dir):
        embs = []
        for frame_num, pose_data in load_gz_json(pose_path):
            raw_2d = np.array(pose_data[0][-1])
            pose_2d = normalize_2d_skeleton(raw_2d, False)
            emb = pose_2d[:, :2].flatten()  # drop confidence column
            meta = {'is_2d': True,
                    'kp_score': float(np.mean(pose_2d[:, 2] + 0.5))}
            if not no_flip:
                emb2 = normalize_2d_skeleton(
                    raw_2d, True)[:, :2].flatten()
                emb = np.stack([emb, emb2])
            embs.append((frame_num, emb, meta))

        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            store_pickle(
                os.path.join(out_dir, video_name + '.emb.pkl'), embs)
    print('Done!')


if __name__ == '__main__':
    main(**vars(get_args()))
