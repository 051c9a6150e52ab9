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
(PERF.md round 3).

Multi-chip placement (``mesh``) comes in two layouts:
- replicated (default): every chip holds the whole corpus and gathers
  its data-sharded index sub-batch locally, no collectives. Valid while
  the packed corpus fits ONE chip's HBM; training is batch-for-batch
  identical to the streamed path.
- row-sharded (``shard_rows=True``): cache rows are split contiguously
  over the 'data' axis, so the mesh's POOLED HBM bounds corpus size
  (8 chips x 16 GB holds a ~128 GB corpus). Each chip gathers only
  rows it homes (a shard_map local gather, still no collectives); the
  sampler draws each chip's sub-batch uniformly from that chip's
  resident rows (standard data-parallel loading). Sampling is uniform
  WITHIN each chip's partition; globally, samples on chips that home
  fewer train samples are drawn proportionally more often (by the
  max/min partition-size ratio — CacheIndexSource warns when the
  imbalance exceeds 10%). Row-major pack order keeps partitions
  near-equal for shuffled corpora.
"""

import numpy as np

from .crops import CropBatchSource


def _rows_range(shards, lo, hi, pad_to):
    """Rows [lo, hi) across a ShardReader's shard-file list, as one
    contiguous array zero-padded to pad_to rows (host peak = one block)."""
    first = shards[0]
    out = np.zeros((pad_to,) + first.shape[1:], first.dtype)
    pos = 0
    base = 0
    for s in shards:
        s_lo, s_hi = max(lo, base), min(hi, base + len(s))
        if s_lo < s_hi:
            out[pos:pos + (s_hi - s_lo)] = s[s_lo - base:s_hi - base]
            pos += s_hi - s_lo
        base += len(s)
    return out


class DeviceCropCache:
    """Upload a ShardReader's streams to device; `.arrays` is the dict
    the cached train/eval steps index into.

    `mesh`: multi-device placement — replicated per chip by default
    (corpus must fit one chip's HBM), row-sharded over the 'data' axis
    with ``shard_rows=True`` (corpus must fit the mesh's pooled HBM).
    """

    def __init__(self, reader, use_flow=False, use_mask=True, mesh=None,
                 shard_rows=False, log=print):
        import jax
        import jax.numpy as jnp

        self.reader = reader
        assert reader.codec == 'raw', \
            'the HBM cache stages raw pixels; "{}" shards are ' \
            'extraction-only (pack without --codec)'.format(reader.codec)
        streams = {'rgb': reader._rgb}
        if use_flow:
            assert reader._flow, 'shards packed without flow'
            streams['flow'] = reader._flow
        if use_mask and reader._mask:
            streams['mask'] = reader._mask

        total = sum(sum(s.nbytes for s in shards)
                    for shards in streams.values())
        n_dev = 1 if mesh is None else mesh.size
        self.row_sharded = bool(shard_rows) and n_dev > 1
        replicas = 1 if self.row_sharded else n_dev
        log('DeviceCropCache: staging {:.2f} GB ({} rows) in HBM'
            '{}'.format(total / 2**30, len(reader),
                        ' x{} replicas'.format(replicas) if replicas > 1
                        else ' sharded over {} chips'.format(n_dev)
                        if self.row_sharded else ''))
        self.nbytes = total
        self.mesh = mesh

        if self.row_sharded:
            from jax.sharding import NamedSharding, PartitionSpec
            from ..core.mesh import DATA_AXIS

            assert mesh.axis_names == (DATA_AXIS,), \
                'row-sharded cache needs a 1-D data mesh, got {}'.format(
                    mesh.axis_names)
            total_rows = len(reader)
            per = -(-total_rows // n_dev)  # ceil; tail rows zero-pad
            self.rows_per_device = per
            devices = list(mesh.devices.flat)
            sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))

            def put_sharded(shards):
                blocks = [
                    jax.device_put(
                        _rows_range(shards, d * per,
                                    min((d + 1) * per, total_rows), per),
                        devices[d])
                    for d in range(n_dev)]
                shape = (per * n_dev,) + blocks[0].shape[1:]
                return jax.make_array_from_single_device_arrays(
                    shape, sharding, blocks)

            self.arrays = {name: put_sharded(shards)
                           for name, shards in streams.items()}
            return

        self.rows_per_device = None

        sharding = None
        if mesh is not None and mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            sharding = NamedSharding(mesh, PartitionSpec())
        sh_kw = {} if sharding is None else {'out_shardings': sharding}

        def stage(shards):
            # Incremental donated updates: device peak stays at
            # corpus + one shard (a jnp.concatenate over device_put
            # shards would transiently hold 2x the corpus in HBM),
            # and host peak stays at one shard.
            shape = (sum(len(s) for s in shards),) + shards[0].shape[1:]
            out = jax.jit(lambda: jnp.zeros(shape, shards[0].dtype),
                          **sh_kw)()
            upd = jax.jit(
                lambda o, s, p: jax.lax.dynamic_update_slice(
                    o, s, (p,) + (0,) * (len(shape) - 1)),
                donate_argnums=0, **sh_kw)
            pos = 0
            for s in shards:
                block = np.asarray(s)
                if sharding is not None:
                    block = jax.device_put(block, sharding)
                out = upd(out, block, np.int32(pos))
                pos += len(s)
            return out

        self.arrays = {name: stage(shards)
                       for name, shards in streams.items()}


class CacheIndexSource(CropBatchSource):
    """CropBatchSource that emits HBM-cache row indices instead of
    pixels. Against a replicated cache it draws the SAME (sample, flip)
    stream as CropBatchSource with the same seed (the pixel fetch is
    the only difference), so cached training is batch-for-batch
    identical to the shard/PNG path. Against a row-sharded cache, batch
    block d (the slice shard_batch sends to device d) is drawn uniformly
    from the samples homed on device d — each chip trains on its
    resident partition, so gathers stay local (per-chip-uniform, not
    globally uniform when partitions are unequal; see the module
    docstring).
    """

    def __init__(self, samples, img_dir, img_dim, batch_size, *,
                 cache, **kwargs):
        kwargs.pop('shard_dir', None)
        # index batches never decode pixels — don't let the base class
        # auto-probe (and possibly g++-build) the native PNG decoder
        kwargs.setdefault('use_native', False)
        super().__init__(samples, img_dir, img_dim, batch_size, **kwargs)
        self.device_cache = cache
        # Enforce the same shard-meta contract as the streamed path
        # (CropBatchSource/fill_or_decode asserts are bypassed here
        # because pixels come from the cache, not the reader).
        meta = cache.reader.meta
        assert img_dim == meta['img_dim'], \
            'shards packed at img_dim={}, requested {}'.format(
                meta['img_dim'], img_dim)
        if self.flow_img_name:
            assert meta['flow_img_name'] == self.flow_img_name, \
                'shards packed with flow "{}", model needs "{}"'.format(
                    meta['flow_img_name'], self.flow_img_name)
            assert 'flow' in cache.arrays, \
                'DeviceCropCache staged without flow (use_flow=False) ' \
                'but the source needs it'
        if self.use_mask:
            assert meta['use_mask'], \
                'shards packed without masks but use_mask=True'
            assert 'mask' in cache.arrays, \
                'DeviceCropCache staged without masks (use_mask=False) ' \
                'but the source needs them'
        rows = cache.reader.rows(
            [self._prefix(v, p, f) for v, p, f, _ in samples])
        missing = int((rows < 0).sum())
        assert missing == 0, \
            '{} of {} samples are not in the packed shards; repack with ' \
            'tools/pack_crops before using the HBM cache'.format(
                missing, len(samples))
        self._rows = rows.astype(np.int32)
        self._by_device = None
        if cache.row_sharded:
            n = cache.mesh.size
            assert batch_size % n == 0, (batch_size, n)
            homes = self._rows // cache.rows_per_device
            self._by_device = [np.nonzero(homes == d)[0]
                               for d in range(n)]
            empty = [d for d, g in enumerate(self._by_device)
                     if len(g) == 0]
            assert not empty, \
                'no samples homed on device(s) {} — corpus too small ' \
                'to row-shard over {} chips; use the replicated cache' \
                .format(empty, n)
            sizes = [len(g) for g in self._by_device]
            if max(sizes) > 1.1 * min(sizes):
                import warnings
                warnings.warn(
                    'row-sharded cache partitions are unbalanced '
                    '({}-{} samples/chip): per-chip-uniform sampling '
                    'oversamples small partitions by up to {:.2f}x'
                    .format(min(sizes), max(sizes),
                            max(sizes) / min(sizes)))

    def next_batch(self):
        b = self.batch_size
        idx = np.zeros(b, np.int32)
        embs = []
        flips = np.zeros(b, np.uint8)
        for i in range(b):
            if self._by_device is None:
                # draw order matches CropBatchSource.next_batch exactly
                # (sample, flip interleaved) — equality contract
                s = int(self.rng.integers(len(self.samples)))
            else:  # block d of the batch lands on device d (shard_batch)
                g = self._by_device[i // (b // len(self._by_device))]
                s = int(g[self.rng.integers(len(g))])
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
