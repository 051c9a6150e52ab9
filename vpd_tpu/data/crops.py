"""Host-side crop dataset for VPD student training and extraction.

Parity with reference `vpd_dataset/single_frame.py`: scans a teacher
`.emb.pkl` dir, filters by pose score, optionally row-normalizes targets
and builds `[e_t, e_t - e_{t-1}]` motion targets (requires consecutive
frames), 80/20 train/val split, and random sampling with a virtual epoch
length.

TPU-first split: the host path ONLY decodes PNGs into uint8 arrays
(cv2/PIL) and batches them; all float math, normalization and augmentation
run on device (`data/augment.py`). A double-buffering prefetch thread
hides decode latency behind the device step.
"""

import os
import queue
import threading

import numpy as np

from ..core.io import EMB_FILE_SUFFIX, load_pickle

try:
    import cv2
    cv2.setNumThreads(0)
    _HAS_CV2 = True
except ImportError:  # PIL fallback
    from PIL import Image
    _HAS_CV2 = False

DEFAULT_MIN_POSE_SCORE = 0.5


def _imread_rgb(path, img_dim):
    if _HAS_CV2:
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        if img.shape[0] != img_dim or img.shape[1] != img_dim:
            img = cv2.resize(img, (img_dim, img_dim))
        return img
    img = Image.open(path).convert('RGB')
    if img.size != (img_dim, img_dim):
        img = img.resize((img_dim, img_dim))
    return np.asarray(img)


def _imread_raw(path, img_dim):
    if _HAS_CV2:
        img = cv2.imread(path)
        if img.shape[0] != img_dim or img.shape[1] != img_dim:
            img = cv2.resize(img, (img_dim, img_dim))
        return img
    img = Image.open(path)
    if img.size != (img_dim, img_dim):
        img = img.resize((img_dim, img_dim))
    img = np.asarray(img)
    return img if img.ndim == 3 else img[..., None]


def decode_crop_batch(rgb_paths, img_dim, *, flow_paths=None,
                      mask_paths=None, rgb_out=None, flow_out=None,
                      mask_out=None, use_native=None):
    """Batch PNG decode with a single native-vs-host chokepoint.

    Uses the C++ thread-pool decoder (native_loader) when buildable,
    else the per-image cv2/PIL path; byte-identical either way. `*_out`
    arrays, when given, are filled in place (rows past len(paths) are
    left untouched). Missing masks zero-fill; missing rgb/flow raise.
    """
    n = len(rgb_paths)
    if rgb_out is None:
        rgb_out = np.zeros((n, img_dim, img_dim, 3), np.uint8)
    if flow_paths is not None and flow_out is None:
        flow_out = np.zeros((n, img_dim, img_dim, 3), np.uint8)
    if mask_paths is not None and mask_out is None:
        mask_out = np.zeros((n, img_dim, img_dim), np.uint8)
    from . import native_loader
    if use_native is None:
        use_native = native_loader.available()
    if use_native:
        native_loader.decode_crops(
            rgb_paths, img_dim, flow_paths=flow_paths,
            mask_paths=mask_paths, rgb_out=rgb_out[:n],
            flow_out=flow_out[:n] if flow_paths is not None else None,
            mask_out=mask_out[:n] if mask_paths is not None else None)
    else:
        for i in range(n):
            rgb_out[i] = _imread_rgb(rgb_paths[i], img_dim)
            if flow_paths is not None:
                flow_out[i] = _imread_raw(flow_paths[i], img_dim)[..., :3]
            if mask_paths is not None and os.path.exists(mask_paths[i]):
                mask_out[i] = _imread_raw(mask_paths[i], img_dim)[..., 0]
    return rgb_out, flow_out, mask_out


def get_pose_score(meta, default=None):
    for key in ('dp_score', 'kp_score'):
        if meta.get(key) is not None:
            return meta[key]
    if default is not None:
        return default
    raise NotImplementedError('no pose score in meta')


def _normalize_rows(x):
    if len(x.shape) == 1:
        return x / np.linalg.norm(x)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def scan_emb_dir(emb_dir, *, embed_time=False, min_pose_score=None,
                 normalize_target=False, exclude_prefixes=None,
                 tennis_layout=False, log=print):
    """Build the flat (video, [player,] frame, emb_target) sample list.

    Returns (samples, emb_dim) where each sample is
    (video_name, player_or_None, frame_num, emb_target (D,) or (2, D)).
    """
    score_thresh = (DEFAULT_MIN_POSE_SCORE if min_pose_score is None
                    else min_pose_score)
    samples = []
    emb_dim = None
    for emb_file in sorted(os.listdir(emb_dir)):
        if not emb_file.endswith(EMB_FILE_SUFFIX):
            continue
        video_name = emb_file[:-len(EMB_FILE_SUFFIX)]
        if exclude_prefixes is not None and \
                video_name.startswith(tuple(exclude_prefixes)):
            log('Excluded: {}'.format(video_name))
            continue

        video_embs = load_pickle(os.path.join(emb_dir, emb_file))
        if emb_dim is None and video_embs:
            emb_dim = video_embs[0][1].shape[-1]

        player = None
        frame_base = 0
        crop_video = video_name
        if tennis_layout:
            # '<player>__<video>_<start>_<end>' (single_frame.py:117-119)
            player, rest = video_name.split('__', 1)
            crop_video, start_frame, _ = rest.rsplit('_', 2)
            frame_base = int(start_frame)

        for i, (frame_num, emb_target, emb_meta) in enumerate(video_embs):
            assert emb_target.shape[-1] == emb_dim
            if get_pose_score(emb_meta) < score_thresh:
                continue
            if normalize_target:
                emb_target = _normalize_rows(emb_target)
            if embed_time:
                if i == 0 or video_embs[i - 1][0] != frame_num - 1:
                    continue
                emb_prev = video_embs[i - 1][1]
                if normalize_target:
                    emb_prev = _normalize_rows(emb_prev)
                emb_target = np.concatenate(
                    [emb_target, emb_target - emb_prev],
                    axis=0 if len(emb_target.shape) == 1 else 1)
            samples.append((crop_video, player, frame_base + frame_num,
                            emb_target))
    return samples, emb_dim


def train_val_split(samples, test_size=0.2, seed=0):
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(samples))
    n_val = int(round(len(samples) * test_size))
    val_idx = set(order[:n_val].tolist())
    train = [s for i, s in enumerate(samples) if i not in val_idx]
    val = [s for i, s in enumerate(samples) if i in val_idx]
    return train, val


class CropBatchSource:
    """Random-sampling uint8 batch producer over crop PNG directories.

    Produces dicts of host numpy arrays:
      {'rgb': (B,S,S,3) u8, 'emb': (B,D), 'flip': (B,) bool,
       'flow': (B,S,S,3) u8?, 'mask': (B,S,S) u8?}
    The target row (orig vs flipped teacher emb) is chosen host-side when
    the target has flip rows; the actual pixel flip happens on device with
    the same boolean.
    """

    def __init__(self, samples, img_dir, img_dim, batch_size, *,
                 target_len=20000, flow_img_name=None, use_mask=True,
                 augment=True, seed=0, use_native=None, shard_dir=None):
        assert samples, 'empty crop dataset'
        self.samples = samples
        self.img_dir = img_dir
        self.img_dim = img_dim
        self.batch_size = batch_size
        self.target_len = target_len
        self.flow_img_name = flow_img_name
        self.use_mask = use_mask
        self.augment = augment
        self.rng = np.random.default_rng(seed)
        if use_native is None:  # auto: C++ threaded decoder when buildable
            from . import native_loader
            use_native = native_loader.available()
        self.use_native = use_native
        self.shards = None
        if shard_dir is not None:  # packed-shard cache: memcpy, no codec
            from .shards import ShardReader
            self.shards = ShardReader(shard_dir, crop_root=img_dir)
            assert self.shards.codec == 'raw', \
                'training needs raw-pixel shards; "{}" shards are ' \
                'extraction-only (pack without --codec)'.format(
                    self.shards.codec)
            if flow_img_name:
                packed = self.shards.meta['flow_img_name']
                assert packed == flow_img_name, \
                    'shards packed with flow "{}", model needs "{}"' \
                    .format(packed, flow_img_name)
            assert not use_mask or self.shards.meta['use_mask'], \
                'shards packed without masks but use_mask=True'

    @property
    def num_batches(self):
        return max(1, self.target_len // self.batch_size)

    def _prefix(self, video, player, frame):
        base = (os.path.join(self.img_dir, video, player)
                if player else os.path.join(self.img_dir, video))
        return os.path.join(base, str(frame))

    def _paths(self, video, player, frame):
        prefix = self._prefix(video, player, frame)
        out = {'rgb': prefix + '.png'}
        if self.flow_img_name:
            out['flow'] = '{}.{}.png'.format(prefix, self.flow_img_name)
        if self.use_mask:
            out['mask'] = prefix + '.mask.png'
        return out

    def next_batch(self):
        b = self.batch_size
        s = self.img_dim
        rgb = np.zeros((b, s, s, 3), np.uint8)
        flow = (np.zeros((b, s, s, 3), np.uint8)
                if self.flow_img_name else None)
        mask = np.zeros((b, s, s), np.uint8) if self.use_mask else None
        embs = []
        flips = np.zeros(b, np.uint8)
        keys = []
        for i in range(b):
            video, player, frame, emb = self.samples[
                self.rng.integers(len(self.samples))]
            flip = bool(self.augment and self.rng.integers(2))
            if emb.ndim == 2:  # (orig, flip) teacher rows
                emb = emb[int(flip)]
            elif flip:
                flip = False  # no flipped target available
            flips[i] = flip
            keys.append((video, player, frame))
            embs.append(emb)
        if self.shards is not None:
            from .shards import fill_or_decode
            fill_or_decode(
                self.shards, [self._prefix(*k) for k in keys], s,
                flow_img_name=self.flow_img_name, rgb_out=rgb,
                flow_out=flow, mask_out=mask, use_native=self.use_native)
        else:
            batch_paths = [self._paths(*k) for k in keys]
            decode_crop_batch(
                [p['rgb'] for p in batch_paths], s,
                flow_paths=([p['flow'] for p in batch_paths]
                            if flow is not None else None),
                mask_paths=([p['mask'] for p in batch_paths]
                            if mask is not None else None),
                rgb_out=rgb, flow_out=flow, mask_out=mask,
                use_native=self.use_native)
        out = {'rgb': rgb, 'emb': np.stack(embs).astype(np.float32),
               'flip': flips.astype(bool)}
        if flow is not None:
            out['flow'] = flow
        if mask is not None:
            out['mask'] = mask
        return out


class PrefetchedSource:
    """Batch-source adapter decoding ahead on a background thread.

    `transform` (e.g. a mesh `shard_batch` partial) runs on the worker
    thread after decode, so the host->device upload it starts overlaps
    the in-flight train step instead of serializing with dispatch.
    """

    def __init__(self, source, depth=2, transform=None):
        self.source = source
        src = source
        if transform is not None:
            class _Transformed:
                num_batches = source.num_batches

                def next_batch(self):
                    return transform(source.next_batch())
            src = _Transformed()
        self._prefetcher = Prefetcher(src, depth)

    @property
    def num_batches(self):
        return self.source.num_batches

    def next_batch(self):
        return self._prefetcher.next()

    def close(self):
        self._prefetcher.close()


class _PrefetchError:
    """Worker-exception envelope shipped through the prefetch queue."""

    def __init__(self, exc):
        self.exc = exc


class Prefetcher:
    """Double-buffered background batch producer (hides PNG decode)."""

    def __init__(self, source, depth=2):
        self.source = source
        self.q = queue.Queue(maxsize=depth)
        self._stop = False
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        while not self._stop:
            try:
                batch = self.source.next_batch()
            except BaseException as exc:  # surface to the consumer —
                # a dead worker must not leave next() blocked forever
                batch = _PrefetchError(exc)
            # Bounded put so a full queue can't park the worker forever
            # after close() stops draining (shutdown race: _stop was only
            # checked between batches).
            while not self._stop:
                try:
                    self.q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if isinstance(batch, _PrefetchError):
                return

    def next(self):
        batch = self.q.get()
        if isinstance(batch, _PrefetchError):
            raise RuntimeError(
                'prefetch worker died: {!r}'.format(batch.exc)) \
                from batch.exc
        return batch

    def close(self, timeout=5.0):
        self._stop = True
        # Drain so a worker blocked in put() sees _stop promptly.
        while True:
            try:
                self.q.get_nowait()
            except queue.Empty:
                break
        self.thread.join(timeout)
