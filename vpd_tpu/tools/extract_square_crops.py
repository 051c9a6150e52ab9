#!/usr/bin/env python3
"""Extract square athlete crops (+ t-k crops and masks) from videos.

CLI parity with reference `extract_square_crops.py`: per frame, a square
padded crop around the (optionally union-smoothed) tracked box, the same
crop of frame t-k via a ring buffer, and the best (score > 0.8) instance
mask decoded from base64 PNG into a frame-size canvas.
"""

import argparse
import os
from multiprocessing import Pool

import numpy as np

from ..core.io import decode_png, load_gz_json, load_json
from ..utils.video import crop_frame

PAD_PX = 25
PAD_FRAC = 0.1
MASK_THRESHOLD = 0.8


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('pose_dir', type=str)
    parser.add_argument('video_dir', type=str)
    parser.add_argument('-o', '--out_dir', type=str)
    parser.add_argument('-d', '--dim', type=int, default=128)
    parser.add_argument('--target_fps', type=int)
    parser.add_argument('--num_prev_frames', type=int, default=1)
    parser.add_argument('--no_smooth', action='store_true')
    parser.add_argument('--parallelism', type=int)
    parser.add_argument('-v', '--visualize', action='store_true',
                        help='show (or, headless, save under .viz/) the '
                             'crop strips while extracting')
    return parser.parse_args()


class DelayBuffer:

    def __init__(self, n):
        self.buffer = [None] * n
        self.idx = 0

    def push(self, x):
        self.buffer[self.idx] = x
        self.idx = (self.idx + 1) % len(self.buffer)

    def get(self, i):
        return self.buffer[(self.idx - 1 - i) % len(self.buffer)]


def extract_crops(video_path, box_dict, mask_dict, out_dir, dim, target_fps,
                  num_prev_frames, smooth_boxes, visualize=False):
    import cv2
    cv2.setNumThreads(0)
    png_compression = [cv2.IMWRITE_PNG_COMPRESSION, 9]

    vc = cv2.VideoCapture(video_path)
    n = int(vc.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = vc.get(cv2.CAP_PROP_FPS)

    prev_box = None
    prev_sample_gap = 1 if target_fps is None else round(fps / target_fps)
    buffer = DelayBuffer(num_prev_frames * (prev_sample_gap + 1))
    for frame_num in range(n):
        ret, frame = vc.read()
        assert ret
        buffer.push(frame)

        box = box_dict.get(frame_num)
        if box is not None:
            x, y, w, h = box
            x2, y2 = x + w, y + h
            if smooth_boxes and prev_box is not None:
                x, y = min(x, prev_box[0]), min(y, prev_box[1])
                x2 = max(x2, prev_box[0] + prev_box[2])
                y2 = max(y2, prev_box[1] + prev_box[3])

            crop_box = [int(x), int(y), int(x2), int(y2)]
            crop = crop_frame(*crop_box, frame, make_square=True,
                              pad_px=PAD_PX, pad_frac=PAD_FRAC)

            mask_crop = None
            mask_data = [m for m in mask_dict.get(frame_num, [])
                         if m[0] > MASK_THRESHOLD]
            if mask_data:
                mask_data.sort()
                _, mask_box, raw_mask = mask_data[-1]
                mx, my, mw, mh = map(int, mask_box)
                mask_frame = np.zeros((*frame.shape[:2], 1), np.uint8)
                mask_frame[my:my + mh, mx:mx + mw, :][
                    decode_png(raw_mask)] = 255
                mask_crop = crop_frame(*crop_box, mask_frame,
                                       make_square=True, pad_px=PAD_PX,
                                       pad_frac=PAD_FRAC)

            prev_crops = []
            for i in range(1, num_prev_frames + 1):
                prev_frame = buffer.get(prev_sample_gap * i)
                prev_crops.append(
                    crop_frame(*crop_box, prev_frame, make_square=True,
                               pad_px=PAD_PX, pad_frac=PAD_FRAC)
                    if prev_frame is not None else crop)

            if max(crop.shape[:2]) != dim:
                crop = cv2.resize(crop, (dim, dim))
                prev_crops = [cv2.resize(pc, (dim, dim))
                              for pc in prev_crops]
                if mask_crop is not None:
                    mask_crop = cv2.resize(mask_crop, (dim, dim))

            if visualize and (out_dir is not None
                              or os.environ.get('DISPLAY')):
                # reference extract_square_crops.py:118-120 shows the
                # crop strip in a window; headless hosts get a saved
                # strip under <out_dir>/.viz instead (see utils.display
                # for why the gate is on DISPLAY, not try/except)
                from ..utils.display import imshow_or_save
                imshow_or_save(
                    'person', np.hstack((crop, *prev_crops)),
                    os.path.join(out_dir or '.', '.viz',
                                 '{}.png'.format(frame_num)))

            if out_dir is not None:
                cv2.imwrite(os.path.join(
                    out_dir, '{}.png'.format(frame_num)), crop,
                    png_compression)
                for i, prev_crop in enumerate(prev_crops, 1):
                    cv2.imwrite(os.path.join(
                        out_dir, '{}.prev{}.png'.format(
                            frame_num, i if i > 1 else '')),
                        prev_crop, png_compression)
                if mask_crop is not None:
                    cv2.imwrite(os.path.join(
                        out_dir, '{}.mask.png'.format(frame_num)),
                        mask_crop, png_compression)

        prev_box = box
    vc.release()


def extract_crops_for_video(video_name, boxes, video_dir, pose_dir, out_dir,
                            dim, target_fps, num_prev_frames, smooth,
                            visualize=False):
    video_path = os.path.join(video_dir, video_name + '.mp4')
    video_out_dir = None
    if out_dir is not None:
        video_out_dir = os.path.join(out_dir, video_name)
        os.makedirs(video_out_dir, exist_ok=True)
    box_dict = {a: b for a, b in boxes}
    mask_dict = dict(load_gz_json(
        os.path.join(pose_dir, video_name, 'mask.json.gz')))
    extract_crops(video_path, box_dict, mask_dict, video_out_dir, dim,
                  target_fps, num_prev_frames, smooth, visualize=visualize)
    return video_name


def _worker(args):
    return extract_crops_for_video(*args)


def main(pose_dir, video_dir, out_dir, dim, target_fps, num_prev_frames,
         no_smooth, parallelism, visualize=False):
    video_names = [x for x in os.listdir(pose_dir)
                   if os.path.isdir(os.path.join(pose_dir, x))]
    box_dict = {v: load_json(os.path.join(pose_dir, v, 'boxes.json'))
                for v in video_names}
    worker_args = [
        (v, box_dict[v], video_dir, pose_dir, out_dir, dim, target_fps,
         num_prev_frames, not no_smooth, visualize) for v in video_names]

    if visualize:  # one window/viz stream (reference :170-173)
        parallelism = 1
    parallelism = parallelism or max(1, (os.cpu_count() or 2) // 2)
    with Pool(parallelism) as p:
        for video_name in p.imap_unordered(_worker, worker_args):
            print(video_name)
    print('Done!')


if __name__ == '__main__':
    main(**vars(get_args()))
