"""Video I/O utilities (host-side, offline preprocessing path).

Parity with reference `util/video.py:9-155`: cv2 metadata/decoding, ffmpeg
segment cutting, square crop-with-pad. These are deliberately host-only —
they sit upstream of the device pipeline (crop extraction, recutting).
"""

import os
import random
from collections import namedtuple
from subprocess import check_call

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except ImportError:
    _HAS_CV2 = False

VideoMetadata = namedtuple('VideoMetadata', [
    'fps', 'num_frames', 'width', 'height'])


def _get_metadata(vc):
    import cv2
    return VideoMetadata(
        vc.get(cv2.CAP_PROP_FPS),
        int(vc.get(cv2.CAP_PROP_FRAME_COUNT)),
        int(vc.get(cv2.CAP_PROP_FRAME_WIDTH)),
        int(vc.get(cv2.CAP_PROP_FRAME_HEIGHT)))


def get_metadata(video_path):
    import cv2
    vc = cv2.VideoCapture(video_path)
    try:
        return _get_metadata(vc)
    finally:
        vc.release()


def decode_frame(video_path, frame_num):
    import cv2
    vc = cv2.VideoCapture(video_path)
    try:
        meta = _get_metadata(vc)
        assert frame_num < meta.num_frames
        vc.set(cv2.CAP_PROP_POS_FRAMES, frame_num)
        is_ok, frame = vc.read()
        assert is_ok
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    finally:
        vc.release()


def pick_frame(video_path):
    import cv2
    vc = cv2.VideoCapture(video_path)
    try:
        return random.randint(0, _get_metadata(vc).num_frames - 1)
    finally:
        vc.release()


def cut_segment(video_file, video_meta, out_file, start, end, log=print):
    log('Extracting: {}'.format(out_file))
    s = start / video_meta.fps
    ms = int(s * 100) % 100
    s = int(s)
    check_call([
        'ffmpeg', '-ss', '{}.{}'.format(s, ms), '-i', video_file,
        '-c:v', 'libx264', '-c:a', 'aac', '-frames:v', str(end - start),
        '-y', out_file])


def cut_segment_cv2(video_file, video_meta, out_file, start, end,
                    log=print):
    """ffmpeg-free segment cut (reference util/video.py:65-81)."""
    import cv2
    log('Extracting using cv2: {}'.format(out_file))
    vc = cv2.VideoCapture(video_file)
    width = int(vc.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(vc.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = vc.get(cv2.CAP_PROP_FPS)
    vo = cv2.VideoWriter(out_file, cv2.VideoWriter_fourcc(*'mp4v'),
                         fps, (width, height))
    vc.set(cv2.CAP_PROP_POS_FRAMES, start)
    for _ in range(end - start):
        ret, frame = vc.read()
        assert ret
        vo.write(frame)
    vc.release()
    vo.release()


def cut_frames(video_file, video_meta, out_dir, start, end,
               width=640, height=360, log=print):
    log('Extracting: {}'.format(out_dir))
    os.makedirs(out_dir)
    s = start / video_meta.fps
    ms = int(s * 100) % 100
    s = int(s)
    check_call([
        'ffmpeg', '-ss', '{}.{}'.format(int(s), ms), '-i', video_file,
        '-frames:v', str(end - start), '-qscale:v', '2',
        '-vf', ('scale=w={w}:h={h}:force_original_aspect_ratio=1,'
                'pad={w}:{h}:(ow-iw)/2:(oh-ih)/2').format(w=width, h=height),
        '-y', os.path.join(out_dir, '%05d.jpg')])
    return len(os.listdir(out_dir))


def crop_frame(x1, y1, x2, y2, frame, make_square=False,
               pad_px=None, pad_frac=None):
    """Crop with optional squaring + padding; out-of-bounds zero-filled."""
    if make_square:
        h, w = y2 - y1, x2 - x1
        if h > w:
            mx = (x1 + x2) // 2
            x1, x2 = mx - h // 2, mx + h // 2
            if x2 - x1 < h:
                x1 -= 1
            assert x2 - x1 == h
        elif h < w:
            my = (y1 + y2) // 2
            y1, y2 = my - w // 2, my + w // 2
            if y2 - y1 < w:
                y1 -= 1
            assert y2 - y1 == w
    h, w = y2 - y1, x2 - x1

    pad_x = pad_y = pad_px if pad_px is not None else 0
    if pad_frac is not None:
        pad_x = int(w * pad_frac)
        pad_y = int(h * pad_frac)
    if pad_x > 0:
        x1 -= pad_x
        x2 += pad_x
    if pad_y > 0:
        y1 -= pad_y
        y2 += pad_y

    crop = frame[max(y1, 0):y2, max(x1, 0):x2, :]
    fh, fw, _ = frame.shape
    crop = np.pad(
        crop,
        ((-min(y1, 0), max(0, y2 - fh)),
         (-min(x1, 0), max(0, x2 - fw)), (0, 0)),
        mode='constant', constant_values=0)
    if make_square:
        assert crop.shape[0] == crop.shape[1], crop.shape
    return crop


def frames_to_video(out_file, frame_files, fps):
    import cv2
    vo = None
    for frame_file in frame_files:
        img = cv2.imread(frame_file)
        if vo is None:
            h, w, _ = img.shape
            vo = cv2.VideoWriter(out_file, cv2.VideoWriter_fourcc(*'avc1'),
                                 fps, (w, h))
        vo.write(img)
    if vo is not None:
        vo.release()
