"""Packed crop shards: pack/read roundtrip, PNG-pipeline equality,
fallback decode, and sharded extraction equality (`data/shards.py`)."""

import os
import pickle

import numpy as np
import pytest

from test_vpd import IMG, setup_dataset, write_crop_tree
from vpd_tpu.data.crops import (CropBatchSource, decode_crop_batch,
                                train_val_split)
from vpd_tpu.data.shards import (ShardReader, fill_or_decode, pack_crops,
                                 scan_png_tree)


def test_scan_png_tree_layouts(tmp_path):
    write_crop_tree(str(tmp_path), ['vidA', 'vidB'], 3)
    # tennis-style player subdirs
    pdir = tmp_path / 'match' / 'front'
    os.makedirs(pdir)
    from PIL import Image
    Image.fromarray(np.zeros((IMG, IMG, 3), np.uint8)).save(
        str(pdir / '7.png'))
    entries = scan_png_tree(str(tmp_path))
    rels = [r for r, _ in entries]
    assert 'vidA/0' in rels and 'vidB/2' in rels
    assert 'match/front/7' in rels
    assert len(rels) == 7


def test_pack_reader_roundtrip(tmp_path):
    crop_dir = str(tmp_path / 'crops')
    write_crop_tree(crop_dir, ['v0', 'v1', 'v2'], 5, flow=True, mask=True)
    shard_dir = str(tmp_path / 'shards')
    # rows_per_shard=4 forces multiple shards (15 crops -> 4 shards)
    n = pack_crops(crop_dir, shard_dir, IMG, flow_img_name='flow',
                   rows_per_shard=4, log=lambda *a: None)
    assert n == 15
    reader = ShardReader(shard_dir, crop_root=crop_dir)
    assert len(reader) == 15
    assert len(reader.meta['shard_rows']) == 4

    prefixes = [os.path.join(crop_dir, 'v{}'.format(v), str(f))
                for v in range(3) for f in range(5)]
    rgb = np.zeros((15, IMG, IMG, 3), np.uint8)
    flow = np.zeros_like(rgb)
    mask = np.zeros((15, IMG, IMG), np.uint8)
    missing = reader.fill(prefixes, rgb, flow, mask)
    assert missing == []

    want_rgb, want_flow, want_mask = decode_crop_batch(
        [p + '.png' for p in prefixes], IMG,
        flow_paths=[p + '.flow.png' for p in prefixes],
        mask_paths=[p + '.mask.png' for p in prefixes])
    np.testing.assert_array_equal(rgb, want_rgb)
    np.testing.assert_array_equal(flow, want_flow)
    np.testing.assert_array_equal(mask, want_mask)


def test_fill_or_decode_fallback(tmp_path):
    crop_dir = str(tmp_path / 'crops')
    write_crop_tree(crop_dir, ['v0'], 4, mask=True)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, log=lambda *a: None)
    # a crop added AFTER packing must fall back to PNG decode
    write_crop_tree(crop_dir, ['late'], 2, mask=True, seed=77)

    reader = ShardReader(shard_dir, crop_root=crop_dir)
    prefixes = [os.path.join(crop_dir, 'v0', '1'),
                os.path.join(crop_dir, 'late', '0'),
                os.path.join(crop_dir, 'v0', '3')]
    assert reader.rows(prefixes).tolist()[1] == -1
    rgb, _, mask = fill_or_decode(
        reader, prefixes, IMG,
        mask_out=np.zeros((3, IMG, IMG), np.uint8))
    want_rgb, _, want_mask = decode_crop_batch(
        [p + '.png' for p in prefixes], IMG,
        mask_paths=[p + '.mask.png' for p in prefixes])
    np.testing.assert_array_equal(rgb, want_rgb)
    np.testing.assert_array_equal(mask, want_mask)


@pytest.mark.parametrize('flow', [False, True])
def test_crop_source_shard_equality(tmp_path, flow):
    """Same seed, shard-backed vs PNG-decode CropBatchSource: identical
    batches (the driver-visible equality contract)."""
    samples, _, crop_dir = setup_dataset(tmp_path, flow=flow, mask=True)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG,
               flow_img_name='flow' if flow else None,
               rows_per_shard=8, log=lambda *a: None)
    train, _ = train_val_split(samples)
    kw = dict(batch_size=8, target_len=32,
              flow_img_name='flow' if flow else None, seed=5)
    src_png = CropBatchSource(train, crop_dir, IMG, **kw)
    src_sh = CropBatchSource(train, crop_dir, IMG, shard_dir=shard_dir,
                             **kw)
    for _ in range(4):
        a, b = src_png.next_batch(), src_sh.next_batch()
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_shard_flow_name_mismatch(tmp_path):
    _, _, crop_dir = setup_dataset(tmp_path, flow=True)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, flow_img_name='flow',
               log=lambda *a: None)
    with pytest.raises(AssertionError):
        CropBatchSource([('video0', None, 0, np.zeros(4))], crop_dir,
                        IMG, batch_size=1, shard_dir=shard_dir,
                        flow_img_name='otherflow')


def test_apply_vpd_shard_equality(tmp_path):
    """Extraction through shards writes byte-identical .emb.pkl files."""
    import jax.numpy as jnp

    from vpd_tpu.infer.apply_vpd import (apply_vpd, load_student_dir,
                                         scan_crop_dir)
    from vpd_tpu.train.vpd_loop import VPDTrainer, default_config

    samples, emb_dim, crop_dir = setup_dataset(tmp_path)
    train, val = train_val_split(samples)
    src = CropBatchSource(train, crop_dir, IMG, batch_size=8, target_len=8)
    config = default_config('tennis', emb_dim, num_epochs=1, batch_size=8,
                            img_dim=IMG, encoder_arch='resnet18',
                            checkpoint_frequency=1)
    trainer = VPDTrainer(src, None, config, save_dir=str(tmp_path / 'm'),
                         dtype=jnp.float32)
    trainer.save_config()
    trainer.fit(log=lambda *a: None)

    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, use_mask=False,
               log=lambda *a: None)
    videos, tasks = scan_crop_dir(crop_dir)
    prepared = load_student_dir(str(tmp_path / 'm'), model_epoch=1)

    apply_vpd(videos, tasks, None, str(tmp_path / 'png_out'),
              model_epoch=1, batch_size=8, prepared=prepared,
              log=lambda *a: None)
    apply_vpd(videos, tasks, None, str(tmp_path / 'shard_out'),
              model_epoch=1, batch_size=8, prepared=prepared,
              shard_reader=ShardReader(shard_dir, crop_root=crop_dir),
              log=lambda *a: None)

    for v in videos:
        with open(tmp_path / 'png_out' / (v + '.emb.pkl'), 'rb') as fp:
            want = fp.read()
        with open(tmp_path / 'shard_out' / (v + '.emb.pkl'), 'rb') as fp:
            got = fp.read()
        assert got == want, v


def test_hbm_cache_training_matches_streamed(tmp_path):
    """Training from the HBM crop cache is batch-for-batch identical to
    the shard-streamed path: same seeds -> same losses."""
    import jax.numpy as jnp

    from vpd_tpu.data.hbm_cache import CacheIndexSource, DeviceCropCache
    from vpd_tpu.train.vpd_loop import VPDTrainer, default_config

    samples, emb_dim, crop_dir = setup_dataset(tmp_path, mask=True)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, log=lambda *a: None)
    train, val = train_val_split(samples)
    cfg = default_config('tennis', emb_dim, num_epochs=2, batch_size=8,
                         img_dim=IMG, encoder_arch='resnet18',
                         learning_rate=1e-3)

    def losses_for(cached):
        import jax
        from vpd_tpu.core.mesh import get_mesh

        mesh = get_mesh(jax.devices()[:1])
        if cached:
            reader = ShardReader(shard_dir, crop_root=crop_dir)
            cache = DeviceCropCache(reader, log=lambda *a: None)
            src = CacheIndexSource(train, crop_dir, IMG, 8,
                                   target_len=32, seed=3, cache=cache)
            vs = CacheIndexSource(val, crop_dir, IMG, 8, target_len=16,
                                  augment=False, seed=4, cache=cache)
        else:
            src = CropBatchSource(train, crop_dir, IMG, 8, target_len=32,
                                  seed=3, shard_dir=shard_dir)
            vs = CropBatchSource(val, crop_dir, IMG, 8, target_len=16,
                                 augment=False, seed=4,
                                 shard_dir=shard_dir)
        tr = VPDTrainer(src, vs, cfg, mesh=mesh, dtype=jnp.float32,
                        seed=0)
        out = []
        for epoch in (1, 2):
            out.append(tr.train_one_epoch(epoch))
        return out

    streamed = losses_for(False)
    cached = losses_for(True)
    for (st, sv), (ct, cv) in zip(streamed, cached):
        np.testing.assert_allclose(ct, st, rtol=1e-5)
        np.testing.assert_allclose(cv, sv, rtol=1e-5)


def test_cache_index_source_rejects_unpacked(tmp_path):
    from vpd_tpu.data.hbm_cache import CacheIndexSource, DeviceCropCache

    samples, _, crop_dir = setup_dataset(tmp_path)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, log=lambda *a: None)
    reader = ShardReader(shard_dir, crop_root=crop_dir)
    cache = DeviceCropCache(reader, log=lambda *a: None)
    bad = samples + [('ghost_video', None, 0, samples[0][3])]
    with pytest.raises(AssertionError):
        CacheIndexSource(bad, crop_dir, IMG, 8, cache=cache)


def test_hbm_cache_multidevice_matches_single(tmp_path):
    """Replicated HBM cache on the 8-device data mesh trains identically
    to the single-device cache (per-chip local gathers, global BN)."""
    import jax
    import jax.numpy as jnp

    from vpd_tpu.core.mesh import get_mesh
    from vpd_tpu.data.hbm_cache import CacheIndexSource, DeviceCropCache
    from vpd_tpu.train.vpd_loop import VPDTrainer, default_config

    samples, emb_dim, crop_dir = setup_dataset(tmp_path, mask=True)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, log=lambda *a: None)
    train, _ = train_val_split(samples)
    cfg = default_config('tennis', emb_dim, num_epochs=1, batch_size=8,
                         img_dim=IMG, encoder_arch='resnet18',
                         learning_rate=1e-3)

    def run(n_dev):
        mesh = get_mesh(jax.devices()[:n_dev])
        reader = ShardReader(shard_dir, crop_root=crop_dir)
        cache = DeviceCropCache(reader, mesh=mesh, log=lambda *a: None)
        src = CacheIndexSource(train, crop_dir, IMG, 8, target_len=24,
                               seed=3, cache=cache)
        tr = VPDTrainer(src, None, cfg, mesh=mesh, dtype=jnp.float32,
                        seed=0)
        return tr.train_one_epoch(1)[0]

    single = run(1)
    multi = run(len(jax.devices()))
    # different shardings pick different conv tilings / reduction orders
    # (same budget as the sharded-extraction equality test)
    np.testing.assert_allclose(multi, single, rtol=1e-4)


def test_hbm_cache_row_sharded_matches_replicated(tmp_path):
    """Row-sharded HBM cache (shard_rows=True): same block-homed batch
    through the shard_map local gather == the replicated cache's step,
    and the sampler homes every batch block on its device's rows."""
    import jax
    import jax.numpy as jnp

    from vpd_tpu.core.mesh import get_mesh, shard_batch
    from vpd_tpu.data.augment import RGB_MEAN_STD
    from vpd_tpu.data.hbm_cache import CacheIndexSource, DeviceCropCache
    from vpd_tpu.models import build_encoder
    from vpd_tpu.train.vpd import create_state, make_cached_train_step

    crop_dir = str(tmp_path / 'crops')
    videos = ['v{}'.format(i) for i in range(4)]
    write_crop_tree(crop_dir, videos, 16, mask=True)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, rows_per_shard=24,
               log=lambda *a: None)  # odd size: blocks straddle files

    rng = np.random.default_rng(0)
    samples = [(v, None, f, rng.normal(size=6).astype(np.float32))
               for v in videos for f in range(16)]

    mesh = get_mesh()
    n = mesh.size
    reader = ShardReader(shard_dir, crop_root=crop_dir)
    cache_r = DeviceCropCache(reader, mesh=mesh, log=lambda *a: None)
    cache_s = DeviceCropCache(reader, mesh=mesh, shard_rows=True,
                              log=lambda *a: None)
    per = cache_s.rows_per_device
    assert per * n >= len(reader)
    for k in cache_s.arrays:  # sharded rows == replicated rows
        np.testing.assert_array_equal(
            np.asarray(cache_s.arrays[k])[:len(reader)],
            np.asarray(cache_r.arrays[k]), err_msg=k)

    src = CacheIndexSource(samples, crop_dir, IMG, 16, target_len=32,
                           seed=3, cache=cache_s)
    batch = src.next_batch()
    homes = (batch['idx'] // per).reshape(n, -1)
    assert all((homes[d] == d).all() for d in range(n)), homes

    model = build_encoder('resnet18', emb_dim=6, dtype=jnp.float32)
    mean, std = RGB_MEAN_STD['tennis']
    state = create_state(model, jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                         1e-3)
    dev_batch = shard_batch(batch, mesh)
    key = jax.random.key(0)
    step_r = make_cached_train_step(model, mean, std, img_dim=IMG,
                                    donate=False)
    step_s = make_cached_train_step(model, mean, std, img_dim=IMG,
                                    donate=False, mesh=mesh,
                                    rows_per_device=per)
    _, m_r = step_r(state, dev_batch, key, cache_r.arrays)
    _, m_s = step_s(state, dev_batch, key, cache_s.arrays)
    # same budget as the other sharding-equality tests (conv tilings)
    np.testing.assert_allclose(float(m_s['emb_loss_sum']),
                               float(m_r['emb_loss_sum']), rtol=1e-4)


def test_hbm_cache_sharded_rejects_tiny_corpus(tmp_path):
    """Too few rows to home samples on every chip -> loud error."""
    import jax

    from vpd_tpu.core.mesh import get_mesh
    from vpd_tpu.data.hbm_cache import CacheIndexSource, DeviceCropCache

    samples, _, crop_dir = setup_dataset(tmp_path)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, log=lambda *a: None)
    mesh = get_mesh()
    if mesh.size < 2:
        pytest.skip('needs a multi-device mesh')
    reader = ShardReader(shard_dir, crop_root=crop_dir)
    cache = DeviceCropCache(reader, mesh=mesh, shard_rows=True,
                            log=lambda *a: None)
    with pytest.raises(AssertionError, match='too small to row-shard'):
        CacheIndexSource(samples, crop_dir, IMG, 8, cache=cache)


def test_cache_source_meta_validation(tmp_path):
    """CacheIndexSource enforces the same shard-meta contract as the
    streamed path (img_dim / flow variant / mask presence) — mismatched
    shards must fail loudly, not train on wrong pixels."""
    from vpd_tpu.data.hbm_cache import CacheIndexSource, DeviceCropCache

    samples, _, crop_dir = setup_dataset(tmp_path)  # no masks
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, use_mask=False,
               log=lambda *a: None)
    reader = ShardReader(shard_dir, crop_root=crop_dir)
    cache = DeviceCropCache(reader, use_mask=False, log=lambda *a: None)
    with pytest.raises(AssertionError, match='img_dim'):
        CacheIndexSource(samples, crop_dir, IMG * 2, 8, cache=cache,
                         use_mask=False)
    with pytest.raises(AssertionError, match='mask'):
        CacheIndexSource(samples, crop_dir, IMG, 8, cache=cache)
    with pytest.raises(AssertionError, match='flow'):
        CacheIndexSource(samples, crop_dir, IMG, 8, cache=cache,
                         use_mask=False, flow_img_name='flow')


def test_cached_step_respects_source_use_mask(tmp_path):
    """Masks present in the shards but use_mask=False at the source:
    the cached trainer must not apply mask augmentation (the
    streamed-vs-cached equality contract keys off the SOURCE config,
    not off what the cache happens to hold)."""
    import jax
    import jax.numpy as jnp

    from vpd_tpu.core.mesh import get_mesh
    from vpd_tpu.data.hbm_cache import CacheIndexSource, DeviceCropCache
    from vpd_tpu.train.vpd_loop import VPDTrainer, default_config

    samples, emb_dim, crop_dir = setup_dataset(tmp_path, mask=True)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, log=lambda *a: None)  # masks in
    train, _ = train_val_split(samples)
    cfg = default_config('tennis', emb_dim, num_epochs=1, batch_size=8,
                         img_dim=IMG, encoder_arch='resnet18',
                         learning_rate=1e-3)
    mesh = get_mesh(jax.devices()[:1])

    src_s = CropBatchSource(train, crop_dir, IMG, 8, target_len=16,
                            use_mask=False, seed=3, shard_dir=shard_dir)
    t_s = VPDTrainer(src_s, None, cfg, mesh=mesh, dtype=jnp.float32,
                     seed=0)
    loss_s = t_s.train_one_epoch(1)[0]

    reader = ShardReader(shard_dir, crop_root=crop_dir)
    cache = DeviceCropCache(reader, log=lambda *a: None)  # masks staged
    src_c = CacheIndexSource(train, crop_dir, IMG, 8, target_len=16,
                             use_mask=False, seed=3, cache=cache)
    t_c = VPDTrainer(src_c, None, cfg, mesh=mesh, dtype=jnp.float32,
                     seed=0)
    loss_c = t_c.train_one_epoch(1)[0]
    np.testing.assert_allclose(loss_c, loss_s, rtol=1e-5)


def test_pack_yuv420_matches_encoder(tmp_path):
    """yuv420-packed shard rows are bit-identical to `encode_yuv420` of
    the raw stream (the no-host-encode extraction contract)."""
    from vpd_tpu.data.upload_codec import encode_yuv420, packed_nbytes

    crop_dir = str(tmp_path / 'crops')
    write_crop_tree(crop_dir, ['v0', 'v1'], 5)
    raw_dir = str(tmp_path / 'raw')
    yuv_dir = str(tmp_path / 'yuv')
    pack_crops(crop_dir, raw_dir, IMG, use_mask=False, rows_per_shard=4,
               log=lambda *a: None)
    pack_crops(crop_dir, yuv_dir, IMG, use_mask=False, rows_per_shard=4,
               codec='yuv420', log=lambda *a: None)

    raw = ShardReader(raw_dir, crop_root=crop_dir)
    yuv = ShardReader(yuv_dir, crop_root=crop_dir)
    assert raw.codec == 'raw' and yuv.codec == 'yuv420'
    assert yuv.meta['codec'] == 'yuv420'
    prefixes = [os.path.join(crop_dir, v, str(f))
                for v in ('v0', 'v1') for f in range(5)]
    rgb_raw = np.zeros((10, IMG, IMG, 3), np.uint8)
    assert raw.fill(prefixes, rgb_raw) == []
    rgb_yuv = np.zeros((10, packed_nbytes(IMG, IMG)), np.uint8)
    assert yuv.fill(prefixes, rgb_yuv) == []
    np.testing.assert_array_equal(rgb_yuv, encode_yuv420(rgb_raw))
    # packed bytes are half the raw bytes
    assert rgb_yuv.nbytes * 2 == rgb_raw.nbytes


def test_fill_or_decode_yuv420_fallback(tmp_path):
    """Unpacked crops fall back to PNG decode + encode, matching the
    packed representation exactly."""
    from vpd_tpu.data.upload_codec import encode_yuv420

    crop_dir = str(tmp_path / 'crops')
    write_crop_tree(crop_dir, ['v0'], 3)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, use_mask=False, codec='yuv420',
               log=lambda *a: None)
    write_crop_tree(crop_dir, ['late'], 1, seed=99)

    reader = ShardReader(shard_dir, crop_root=crop_dir)
    prefixes = [os.path.join(crop_dir, 'v0', '0'),
                os.path.join(crop_dir, 'late', '0')]
    assert reader.rows(prefixes).tolist()[1] == -1
    got, _, _ = fill_or_decode(reader, prefixes, IMG, codec='yuv420')
    want_rgb, _, _ = decode_crop_batch(
        [p + '.png' for p in prefixes], IMG)
    np.testing.assert_array_equal(got, encode_yuv420(want_rgb))
    # codec mismatch fails loudly, not by gathering wrong-shape bytes
    with pytest.raises(AssertionError, match='codec'):
        fill_or_decode(reader, prefixes, IMG)


def test_apply_vpd_yuv420_shards_equal_raw_shards(tmp_path):
    """Extraction from yuv420-packed shards == raw shards + host encode
    (byte-identical .emb.pkl; the packer and the host path share one
    encoder), and lossy shards without the codec error loudly."""
    import jax.numpy as jnp

    from vpd_tpu.infer.apply_vpd import (apply_vpd, load_student_dir,
                                         scan_crop_dir)
    from vpd_tpu.train.vpd_loop import VPDTrainer, default_config

    samples, emb_dim, crop_dir = setup_dataset(tmp_path)
    config = default_config('tennis', emb_dim, num_epochs=1, batch_size=8,
                            img_dim=IMG, encoder_arch='resnet18',
                            checkpoint_frequency=1)
    trainer = VPDTrainer(None, None, config, save_dir=str(tmp_path / 'm'),
                         dtype=jnp.float32)
    trainer.save_config()
    trainer.save_model('best_epoch')

    raw_dir = str(tmp_path / 'raw')
    yuv_dir = str(tmp_path / 'yuv')
    pack_crops(crop_dir, raw_dir, IMG, use_mask=False, log=lambda *a: None)
    pack_crops(crop_dir, yuv_dir, IMG, use_mask=False, codec='yuv420',
               log=lambda *a: None)
    videos, tasks = scan_crop_dir(crop_dir)
    prepared = load_student_dir(str(tmp_path / 'm'))

    apply_vpd(videos, tasks, None, str(tmp_path / 'out_raw'), batch_size=8,
              prepared=prepared, upload_codec='yuv420',
              shard_reader=ShardReader(raw_dir, crop_root=crop_dir),
              log=lambda *a: None)
    apply_vpd(videos, tasks, None, str(tmp_path / 'out_yuv'), batch_size=8,
              prepared=prepared, upload_codec='yuv420',
              shard_reader=ShardReader(yuv_dir, crop_root=crop_dir),
              log=lambda *a: None)
    for v in videos:
        with open(tmp_path / 'out_raw' / (v + '.emb.pkl'), 'rb') as fp:
            want = fp.read()
        with open(tmp_path / 'out_yuv' / (v + '.emb.pkl'), 'rb') as fp:
            got = fp.read()
        assert got == want, v

    with pytest.raises(ValueError, match='upload_codec'):
        apply_vpd(videos, tasks, None, str(tmp_path / 'out_bad'),
                  batch_size=8, prepared=prepared,
                  shard_reader=ShardReader(yuv_dir, crop_root=crop_dir),
                  log=lambda *a: None)


def test_training_rejects_yuv420_shards(tmp_path):
    """The training paths consume raw pixels; lossy extraction shards
    must be rejected at construction, not decoded wrong."""
    from vpd_tpu.data.hbm_cache import DeviceCropCache

    samples, _, crop_dir = setup_dataset(tmp_path)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, use_mask=False, codec='yuv420',
               log=lambda *a: None)
    train, _ = train_val_split(samples)
    with pytest.raises(AssertionError, match='extraction-only'):
        CropBatchSource(train, crop_dir, IMG, batch_size=4,
                        use_mask=False, shard_dir=shard_dir)
    reader = ShardReader(shard_dir, crop_root=crop_dir)
    with pytest.raises(AssertionError, match='extraction-only'):
        DeviceCropCache(reader, use_mask=False, log=lambda *a: None)


def test_shard_reader_relative_crop_root(tmp_path, monkeypatch):
    """Prefixes built from a RELATIVE img_dir must still hit the packed
    index (they used to pass through verbatim and miss every key)."""
    crop_dir = str(tmp_path / 'crops')
    write_crop_tree(crop_dir, ['v0'], 3)
    shard_dir = str(tmp_path / 'shards')
    pack_crops(crop_dir, shard_dir, IMG, use_mask=False,
               log=lambda *a: None)
    monkeypatch.chdir(tmp_path)
    reader = ShardReader('shards', crop_root='crops')
    rel = [os.path.join('crops', 'v0', str(f)) for f in range(3)]
    assert (reader.rows(rel) >= 0).all()
    # bare index keys and absolute prefixes keep working too
    assert (reader.rows(['v0/0']) >= 0).all()
    assert (reader.rows([os.path.join(crop_dir, 'v0', '1')]) >= 0).all()
