"""Packed crop shards: a decode-free cache of crop PNG directories.

The honest extract/train paths are PNG-decode-bound on few-core hosts
(PERF.md: ~1.0-1.3k crops/s vs a ~15k/chip device roof). The reference has
the same structural dependence on host decode (`apply_vpd_model.py:154-157`
hides it behind worker processes); a TPU-first pipeline removes it by
changing the STORAGE format: a one-time transcode of the PNG tree into
contiguous uint8 shard files + an index, after which fetching a training
batch is a memmap gather (memcpy, no codec). PNG remains the interchange
format written by `extract_square_crops` (reference
`extract_square_crops.py:122-135`); shards are a derived cache.

Layout under <shard_dir>:
  shards_meta.json          img_dim, codec, rows_per_shard, shard rows
  shards_index.pkl          {rel_prefix: global_row}
  s<NNNN>.rgb               (rows, S, S, 3) uint8, C-contiguous   [codec=raw]
                            (rows, S*S*3//2) uint8 packed YUV420  [codec=yuv420]
  s<NNNN>.flow              (rows, S, S, 3) uint8         [if flow packed]
  s<NNNN>.mask              (rows, S, S) uint8            [if masks packed]

`codec='yuv420'` stores the rgb stream PRE-PACKED in the lossy upload
codec (`data/upload_codec.py`): extraction with `--upload_codec yuv420`
then memmap-gathers the 1.5 B/px representation directly — no per-batch
host encode on the decode thread and half the shard disk / page-cache
bytes. Packed bytes are bit-identical to `encode_yuv420` of the raw
stream (the packer calls it), so yuv420 shards + yuv420 upload produce
the same embeddings as raw shards + yuv420 upload. Training and the HBM
cache consume raw pixels and reject yuv420 shards loudly. Flow and mask
streams always store raw (flow PNGs are already quantized; masks are
binary).

`rel_prefix` is the crop path relative to the image root, '/'-separated,
without extension: 'video/frame' or 'video/player/frame' — exactly the
prefixes `CropBatchSource._paths` / `scan_crop_dir` build.
"""

import json
import os
import re

import numpy as np

from ..core.io import load_pickle, store_json, store_pickle

META_FILE = 'shards_meta.json'
INDEX_FILE = 'shards_index.pkl'
_FRAME_RE = re.compile(r'^\d+\.png$')
DEFAULT_ROWS_PER_SHARD = 4096
_PACK_BATCH = 256


def scan_png_tree(img_dir):
    """Enumerate crops under img_dir -> [(rel_prefix, abs_prefix)].

    Handles both layouts: <video>/<frame>.png and
    <video>/<player>/<frame>.png (tennis).
    """
    out = []
    for video in sorted(os.listdir(img_dir)):
        vdir = os.path.join(img_dir, video)
        if video.startswith('.') or not os.path.isdir(vdir):
            continue
        leaves = [(vdir, video)]
        for sub in sorted(os.listdir(vdir)):
            sdir = os.path.join(vdir, sub)
            # skip hidden dirs (e.g. the .viz previews
            # extract_square_crops --visualize writes on headless hosts)
            if not sub.startswith('.') and os.path.isdir(sdir):
                leaves.append((sdir, video + '/' + sub))
        for leaf_dir, rel_base in leaves:
            for f in os.listdir(leaf_dir):
                if _FRAME_RE.match(f):
                    frame = f[:-4]
                    out.append((rel_base + '/' + frame,
                                os.path.join(leaf_dir, frame)))
    out.sort()
    return out


def pack_crops(img_dir, shard_dir, img_dim, *, flow_img_name=None,
               use_mask=True, rows_per_shard=DEFAULT_ROWS_PER_SHARD,
               use_native=None, codec='raw', log=print):
    """One-time transcode: PNG tree -> shard files + index. Returns count.

    Decoding reuses `decode_crop_batch` (C++ thread-pool decoder when
    buildable), so packed bytes are byte-identical to what the PNG path
    would feed the device. Missing masks zero-fill (same contract).
    `codec='yuv420'` stores the rgb stream pre-encoded for the upload
    codec (extraction-only shards; see module docstring).
    """
    from .crops import decode_crop_batch

    assert codec in ('raw', 'yuv420'), codec
    if codec == 'yuv420':
        from .upload_codec import encode_yuv420, packed_nbytes
        rgb_row_shape = (packed_nbytes(img_dim, img_dim),)
    else:
        rgb_row_shape = (img_dim, img_dim, 3)

    entries = scan_png_tree(img_dir)
    assert entries, 'no crops under {}'.format(img_dir)
    os.makedirs(shard_dir, exist_ok=True)

    index = {}
    shard_rows = []
    rgb_buf = np.zeros((rows_per_shard,) + rgb_row_shape, np.uint8)
    flow_buf = (np.zeros((rows_per_shard, img_dim, img_dim, 3), np.uint8)
                if flow_img_name else None)
    mask_buf = (np.zeros((rows_per_shard, img_dim, img_dim), np.uint8)
                if use_mask else None)

    def flush(n_rows):
        sid = len(shard_rows)
        rgb_buf[:n_rows].tofile(
            os.path.join(shard_dir, 's{:04d}.rgb'.format(sid)))
        if flow_buf is not None:
            flow_buf[:n_rows].tofile(
                os.path.join(shard_dir, 's{:04d}.flow'.format(sid)))
        if mask_buf is not None:
            mask_buf[:n_rows].tofile(
                os.path.join(shard_dir, 's{:04d}.mask'.format(sid)))
        shard_rows.append(n_rows)

    fill = 0
    for start in range(0, len(entries), _PACK_BATCH):
        chunk = entries[start:start + _PACK_BATCH]
        n = len(chunk)
        rgb = np.zeros((n, img_dim, img_dim, 3), np.uint8)
        flow = np.zeros_like(rgb) if flow_img_name else None
        mask = (np.zeros((n, img_dim, img_dim), np.uint8)
                if use_mask else None)
        decode_crop_batch(
            [p + '.png' for _, p in chunk], img_dim,
            flow_paths=(['{}.{}.png'.format(p, flow_img_name)
                         for _, p in chunk] if flow_img_name else None),
            mask_paths=([p + '.mask.png' for _, p in chunk]
                        if use_mask else None),
            rgb_out=rgb, flow_out=flow, mask_out=mask,
            use_native=use_native)
        if codec == 'yuv420':
            rgb = encode_yuv420(rgb)
        for j, (rel, _) in enumerate(chunk):
            index[rel] = len(shard_rows) * rows_per_shard + fill
            rgb_buf[fill] = rgb[j]
            if flow_buf is not None:
                flow_buf[fill] = flow[j]
            if mask_buf is not None:
                mask_buf[fill] = mask[j]
            fill += 1
            if fill == rows_per_shard:
                flush(fill)
                fill = 0
        if (start // _PACK_BATCH) % 20 == 0:
            log('packed {} / {} crops'.format(
                min(start + _PACK_BATCH, len(entries)), len(entries)))
    if fill:
        flush(fill)

    store_pickle(os.path.join(shard_dir, INDEX_FILE), index)
    # atomic: a crash during the meta dump at the end of a long pack must
    # not leave a truncated shards_meta.json
    store_json(os.path.join(shard_dir, META_FILE), {
        'img_dim': img_dim,
        'codec': codec,
        'flow_img_name': flow_img_name,
        'use_mask': use_mask,
        'rows_per_shard': rows_per_shard,
        'shard_rows': shard_rows,
        'num_rows': len(index),
    }, indent=2)
    log('packed {} crops into {} shards under {}'.format(
        len(index), len(shard_rows), shard_dir))
    return len(index)


class ShardReader:
    """Memmap-backed random access to packed crop shards.

    `crop_root`: when given, `fill()` also accepts ABSOLUTE path prefixes
    (as produced by `scan_crop_dir`) and relativizes them against it.
    """

    def __init__(self, shard_dir, crop_root=None):
        with open(os.path.join(shard_dir, META_FILE)) as fp:
            self.meta = json.load(fp)
        self.index = load_pickle(os.path.join(shard_dir, INDEX_FILE))
        self.crop_root = (os.path.abspath(crop_root)
                          if crop_root is not None else None)
        s = self.meta['img_dim']
        self.rows_per_shard = self.meta['rows_per_shard']
        # shards packed before the codec field existed are raw
        self.codec = self.meta.get('codec', 'raw')
        if self.codec == 'yuv420':
            from .upload_codec import packed_nbytes
            rgb_row_shape = (packed_nbytes(s, s),)
        else:
            rgb_row_shape = (s, s, 3)
        self._rgb = []
        self._flow = []
        self._mask = []
        for sid, rows in enumerate(self.meta['shard_rows']):
            base = os.path.join(shard_dir, 's{:04d}'.format(sid))
            self._rgb.append(np.memmap(
                base + '.rgb', np.uint8, 'r',
                shape=(rows,) + rgb_row_shape))
            if self.meta['flow_img_name']:
                self._flow.append(np.memmap(
                    base + '.flow', np.uint8, 'r', shape=(rows, s, s, 3)))
            if self.meta['use_mask']:
                self._mask.append(np.memmap(
                    base + '.mask', np.uint8, 'r', shape=(rows, s, s)))

    def __len__(self):
        return self.meta['num_rows']

    def _rel(self, prefix):
        if self.crop_root is not None:
            ap = os.path.abspath(prefix)
            # relativize any prefix living under the crop root — incl.
            # ones built from a RELATIVE img_dir, which previously
            # passed through verbatim and missed every index key; bare
            # index keys ('video/frame') still pass through untouched
            if ap == self.crop_root or \
                    ap.startswith(self.crop_root + os.sep):
                prefix = os.path.relpath(ap, self.crop_root)
        else:
            assert not os.path.isabs(prefix), \
                'absolute prefix but ShardReader has no crop_root'
        return prefix.replace(os.sep, '/')

    def rows(self, prefixes):
        """Global row per prefix; -1 where not packed."""
        return np.array([self.index.get(self._rel(p), -1)
                         for p in prefixes], np.int64)

    def fill(self, prefixes, rgb_out, flow_out=None, mask_out=None):
        """Gather packed rows into out arrays; returns the list of batch
        positions NOT found (caller falls back to PNG decode for those)."""
        rows = self.rows(prefixes)
        hit = rows >= 0
        if hit.any():
            sids = rows[hit] // self.rows_per_shard
            locals_ = rows[hit] % self.rows_per_shard
            pos = np.nonzero(hit)[0]
            for sid in np.unique(sids):
                sel = sids == sid
                p, l = pos[sel], locals_[sel]
                rgb_out[p] = self._rgb[sid][l]
                if flow_out is not None:
                    assert self._flow, 'shards packed without flow'
                    flow_out[p] = self._flow[sid][l]
                if mask_out is not None:
                    assert self._mask, 'shards packed without masks'
                    mask_out[p] = self._mask[sid][l]
        return np.nonzero(~hit)[0].tolist()


def fill_or_decode(reader, prefixes, img_dim, *, flow_img_name=None,
                   rgb_out=None, flow_out=None, mask_out=None,
                   use_native=None, codec='raw'):
    """Shard gather with per-row PNG-decode fallback for unpacked crops.

    Drop-in alternative to `decode_crop_batch` over path prefixes; output
    bytes are identical (the packer used the same decoder). Validates the
    request against the shard meta here — in the shared reader, not per
    consumer — so a flow-variant or size mismatch fails loudly instead
    of silently gathering the wrong packed stream.

    `codec` is the representation `rgb_out` expects ('raw' rows are
    (S, S, 3); 'yuv420' rows are the packed (S*S*3//2,) planes) and must
    match how the shards were packed; fallback rows for unpacked crops
    are PNG-decoded then encoded to match.
    """
    from .crops import decode_crop_batch

    assert img_dim == reader.meta['img_dim'], \
        'shards packed at img_dim={}, requested {}'.format(
            reader.meta['img_dim'], img_dim)
    assert codec == reader.codec, \
        'shards packed with codec "{}", requested "{}" — repack with ' \
        'tools/pack_crops --codec {}'.format(reader.codec, codec, codec)
    if flow_out is not None:
        packed = reader.meta['flow_img_name']
        assert packed == flow_img_name, \
            'shards packed with flow "{}", requested "{}"'.format(
                packed, flow_img_name)
    if mask_out is not None:
        assert reader.meta['use_mask'], \
            'shards packed without masks but a mask buffer was requested'

    n = len(prefixes)
    if rgb_out is None:
        rgb_out = np.zeros((n,) + reader._rgb[0].shape[1:], np.uint8)
    missing = reader.fill(prefixes, rgb_out[:n],
                          flow_out[:n] if flow_out is not None else None,
                          mask_out[:n] if mask_out is not None else None)
    if missing:
        m = len(missing)
        rgb_t = np.zeros((m, img_dim, img_dim, 3), np.uint8)
        flow_t = np.zeros_like(rgb_t) if flow_out is not None else None
        mask_t = (np.zeros((m, img_dim, img_dim), np.uint8)
                  if mask_out is not None else None)
        decode_crop_batch(
            [prefixes[i] + '.png' for i in missing], img_dim,
            flow_paths=(['{}.{}.png'.format(prefixes[i], flow_img_name)
                         for i in missing]
                        if flow_out is not None else None),
            mask_paths=([prefixes[i] + '.mask.png' for i in missing]
                        if mask_out is not None else None),
            rgb_out=rgb_t, flow_out=flow_t, mask_out=mask_t,
            use_native=use_native)
        if codec == 'yuv420':
            from .upload_codec import encode_yuv420
            rgb_t = encode_yuv420(rgb_t)
        rgb_out[missing] = rgb_t
        if flow_out is not None:
            flow_out[missing] = flow_t
        if mask_out is not None:
            mask_out[missing] = mask_t
    return rgb_out, flow_out, mask_out
