"""Penn Action ablation dataset: crops cut on the fly from full frames.

Parity with reference `vpd_dataset/single_frame.py:276-358`
(PennDataset/PennDatasetUtil): samples are (seq, frame, is_flip, emb row,
box); both teacher flip rows become separate samples with pre-flipped
crops; boxes are squared + padded (25 px / 10%) before resize.
"""

import os

import numpy as np

from ..core.io import load_json, load_pickle
from ..utils.video import crop_frame

PAD_PX = 25
PAD_FRAC = 0.1


def scan_penn_dir(penn_dir, *, embed_time=False, min_pose_score=0.5):
    """Build the flat sample list from pose_embs.pkl + boxes.json.

    Returns (samples, emb_dim) with samples
    (seq, frame_num, is_flip, emb (D,), box).
    """
    emb_dict = load_pickle(os.path.join(penn_dir, 'pose_embs.pkl'))
    box_dict = load_json(os.path.join(penn_dir, 'boxes.json'))

    samples = []
    emb_dim = None
    for seq, embs in emb_dict.items():
        boxes = box_dict[seq]
        for i, (frame_num, score, emb_target) in enumerate(embs):
            if emb_dim is None:
                emb_dim = emb_target.shape[-1]
            if score < min_pose_score:
                continue
            if embed_time:
                if i == 0 or embs[i - 1][0] != frame_num - 1:
                    continue
                prev = embs[i - 1][2]
                emb_target = np.concatenate(
                    [emb_target, emb_target - prev],
                    axis=0 if len(emb_target.shape) == 1 else 1)
            samples.append((seq, frame_num, False, emb_target[0],
                            boxes[frame_num]))
            samples.append((seq, frame_num, True, emb_target[1],
                            boxes[frame_num]))
    return samples, emb_dim


def load_penn_crop(frame_dir, seq, frame_num, box, img_dim, flip=False):
    """Crop one Penn frame (reference PennDatasetUtil.load_crop)."""
    import cv2

    frame_path = os.path.join(frame_dir, seq,
                              '{:06d}.jpg'.format(frame_num + 1))
    frame = _imread_rgb_fullsize(frame_path)
    x, y, w, h = [int(z) for z in box]
    crop = crop_frame(x, y, x + w, y + h, frame, make_square=True,
                      pad_px=PAD_PX, pad_frac=PAD_FRAC)
    if flip:
        crop = crop[:, ::-1, :].copy()
    return cv2.resize(crop, (img_dim, img_dim))


def _imread_rgb_fullsize(path):
    import cv2

    return cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)


class PennBatchSource:
    """uint8 batch producer over Penn full-frame crops.

    Flips happen host-side here (crop is pre-flipped per the sampled
    teacher row), so the device augment runs with flip disabled.
    """

    def __init__(self, samples, frame_dir, img_dim, batch_size, *,
                 target_len=20000, augment=True, seed=0):
        assert samples
        self.samples = samples
        self.frame_dir = frame_dir
        self.img_dim = img_dim
        self.batch_size = batch_size
        self.target_len = target_len
        self.augment = augment
        self.rng = np.random.default_rng(seed)

    @property
    def num_batches(self):
        return max(1, self.target_len // self.batch_size)

    def next_batch(self):
        b, s = self.batch_size, self.img_dim
        rgb = np.zeros((b, s, s, 3), np.uint8)
        embs = []
        for i in range(b):
            seq, frame, is_flip, emb, box = self.samples[
                self.rng.integers(len(self.samples))]
            rgb[i] = load_penn_crop(self.frame_dir, seq, frame, box, s,
                                    flip=is_flip)
            embs.append(emb)
        return {'rgb': rgb, 'emb': np.stack(embs).astype(np.float32),
                'flip': np.zeros(b, bool)}
