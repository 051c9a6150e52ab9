#!/usr/bin/env python3
"""Overlay COCO-17 pose skeletons on a video (parity: `view_2d_pose.py`)."""

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw

from ..core.io import load_gz_json

COCO_BONES = (
    (16, 14), (14, 12), (17, 15), (15, 13), (12, 13), (6, 12), (7, 13),
    (6, 7), (6, 8), (7, 9), (8, 10), (9, 11), (2, 3), (1, 2), (1, 3),
    (2, 4), (3, 5), (4, 6), (5, 7))


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('video_file')
    parser.add_argument('pose_file')
    parser.add_argument('-v', dest='vout_file')
    parser.add_argument('-vs', dest='vout_scale', type=float)
    return parser.parse_args()


def draw_keypoints(im, kp_poses, w=3, fill='white'):
    draw = ImageDraw.Draw(im)
    for pose in kp_poses:
        kp = pose[-1]
        for a, b in COCO_BONES:
            x1, y1 = kp[a - 1][0], kp[a - 1][1]
            x2, y2 = kp[b - 1][0], kp[b - 1][1]
            draw.line((x1, y1, x2, y2), fill=fill, width=w)


def main(video_file, pose_file, vout_file, vout_scale):
    import cv2

    if os.path.isdir(pose_file):
        video_name = os.path.splitext(os.path.basename(video_file))[0]
        pose_file = os.path.join(pose_file, video_name,
                                 'coco_keypoints.json.gz')
    kp_dict = dict(load_gz_json(pose_file))

    vc = cv2.VideoCapture(video_file)
    fps = vc.get(cv2.CAP_PROP_FPS)
    width = int(vc.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(vc.get(cv2.CAP_PROP_FRAME_HEIGHT))
    n = int(vc.get(cv2.CAP_PROP_FRAME_COUNT))

    vo = None
    if vout_file is not None:
        scale = vout_scale if vout_scale and vout_scale != 1 else 1
        vo_size = (int(width * scale), int(height * scale))
        vo = cv2.VideoWriter(vout_file,
                             cv2.VideoWriter_fourcc(*'mp4v'), fps, vo_size)

    for frame_num in range(n):
        ret, frame = vc.read()
        if not ret:
            break
        poses = kp_dict.get(frame_num, [])
        if poses:
            im = Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            draw_keypoints(im, poses)
            frame = cv2.cvtColor(np.array(im), cv2.COLOR_RGB2BGR)
        if vo is not None:
            if frame.shape[1] != vo_size[0]:
                frame = cv2.resize(frame, vo_size)
            vo.write(frame)
    vc.release()
    if vo is not None:
        vo.release()
    print('Done!')


if __name__ == '__main__':
    main(**vars(get_args()))
