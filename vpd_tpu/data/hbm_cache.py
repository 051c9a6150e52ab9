"""HBM-resident crop cache: stage packed shards on device ONCE, gather
training batches on device.

Student training re-reads the same crop set for up to 1000 virtual
epochs (reference `train_vpd_model.py:32,183`), yet the reference
re-decodes PNGs on CPU workers for every epoch and this repo's shard
path still re-uploads ~MBs of uint8 pixels per step. A v5e chip has
16 GB of HBM and a typical crop corpus is ~1-8 GB packed, so the
TPU-first layout is: upload the shard arrays to device memory once at
trainer construction, then each step ships only (B,) row indices plus
the (B, D) teacher targets — a few KB — and the jitted step gathers the
pixel rows from HBM (`train/vpd.py make_cached_train_step`). Measured
on the relay-attached dev chip this removes the H2D bound entirely
(PERF.md round 3). Single-device meshes only for now; the multi-chip
extension shards cache rows per device and samples per shard.
"""

import numpy as np

from .crops import CropBatchSource


class DeviceCropCache:
    """Upload a ShardReader's streams to device; `.arrays` is the dict
    the cached train/eval steps index into.

    `mesh`: on a multi-device mesh the cache is REPLICATED on every
    device (each chip gathers its own data-sharded index sub-batch
    locally, no collectives) — valid whenever the packed corpus fits one
    chip's HBM. Row-sharding the cache for corpora beyond per-chip HBM
    is the remaining extension.
    """

    def __init__(self, reader, use_flow=False, use_mask=True, mesh=None,
                 log=print):
        import jax
        import jax.numpy as jnp

        self.reader = reader
        streams = {'rgb': reader._rgb}
        if use_flow:
            assert reader._flow, 'shards packed without flow'
            streams['flow'] = reader._flow
        if use_mask and reader._mask:
            streams['mask'] = reader._mask

        total = sum(sum(s.nbytes for s in shards)
                    for shards in streams.values())
        replicas = 1 if mesh is None else mesh.size
        log('DeviceCropCache: staging {:.2f} GB ({} rows) in HBM'
            '{}'.format(total / 2**30, len(reader),
                        ' x{} replicas'.format(replicas)
                        if replicas > 1 else ''))
        self.nbytes = total
        self.mesh = mesh

        def put(arr):
            if mesh is not None and mesh.size > 1:
                from jax.sharding import NamedSharding, PartitionSpec
                return jax.device_put(
                    arr, NamedSharding(mesh, PartitionSpec()))
            return jax.device_put(arr)

        # per-shard device_put bounds host peak memory; the concatenate
        # runs on device
        self.arrays = {
            name: jnp.concatenate([put(np.asarray(s)) for s in shards],
                                  axis=0)
            for name, shards in streams.items()}


class CacheIndexSource(CropBatchSource):
    """CropBatchSource that emits HBM-cache row indices instead of
    pixels. Draws the SAME (sample, flip) stream as CropBatchSource with
    the same seed (the pixel fetch is the only difference), so cached
    training is batch-for-batch identical to the shard/PNG path.
    """

    def __init__(self, samples, img_dir, img_dim, batch_size, *,
                 cache, **kwargs):
        kwargs.pop('shard_dir', None)
        super().__init__(samples, img_dir, img_dim, batch_size, **kwargs)
        self.device_cache = cache
        rows = cache.reader.rows(
            [self._prefix(v, p, f) for v, p, f, _ in samples])
        missing = int((rows < 0).sum())
        assert missing == 0, \
            '{} of {} samples are not in the packed shards; repack with ' \
            'tools/pack_crops before using the HBM cache'.format(
                missing, len(samples))
        self._rows = rows.astype(np.int32)

    def next_batch(self):
        b = self.batch_size
        idx = np.zeros(b, np.int32)
        embs = []
        flips = np.zeros(b, np.uint8)
        for i in range(b):
            s = self.rng.integers(len(self.samples))
            emb = self.samples[s][3]
            flip = bool(self.augment and self.rng.integers(2))
            if emb.ndim == 2:
                emb = emb[int(flip)]
            elif flip:
                flip = False
            flips[i] = flip
            idx[i] = self._rows[s]
            embs.append(emb)
        return {'idx': idx, 'emb': np.stack(embs).astype(np.float32),
                'flip': flips.astype(bool)}
