#!/usr/bin/env python3
"""Extract VIPE* teacher embeddings (CLI parity: `apply_vipe_model.py`)."""

import argparse

from ..infer.apply_vipe import apply_vipe


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('pose_dir')
    parser.add_argument('model_dir')
    parser.add_argument('-o', '--out_dir', type=str, required=True)
    parser.add_argument('-m', '--model_epoch', type=int)
    parser.add_argument('--allow_many_per_frame', action='store_true')
    parser.add_argument('--min_score', type=float, default=0)
    parser.add_argument('--no_flip', action='store_true')
    parser.add_argument('--invert', action='store_true',
                        help='Embed upside-down poses (diving48/fx)')
    return parser.parse_args()


def main(pose_dir, model_dir, out_dir, model_epoch, allow_many_per_frame,
         min_score, no_flip, invert):
    apply_vipe(pose_dir, model_dir, out_dir, model_epoch=model_epoch,
               min_score=min_score, no_flip=no_flip, invert=invert,
               allow_many_per_frame=allow_many_per_frame)
    print('Done!')


if __name__ == '__main__':
    main(**vars(get_args()))
