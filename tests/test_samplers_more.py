"""Coverage for sampler styles, mesh helpers, and real-data loaders."""

import os

import numpy as np

from synth import make_synth_family, make_synth_emb_videos
from vpd_tpu.core.checkpoint import MovingAvgSelector
from vpd_tpu.core.io import store_pickle
from vpd_tpu.core.mesh import get_mesh, pad_batch_to, replicate, shard_batch
from vpd_tpu.data.crops import CropBatchSource, Prefetcher
from vpd_tpu.data.vipe_sampler import (
    FAMILIES, FusedBatcher, PairwiseSampler, VIPESampler)


def test_nba2k_synth2_style():
    """NBA2K: pose2 and negatives are always synthetic projections."""
    seqs, poses = make_synth_family('nba2k', seed=0)
    sampler = VIPESampler(FAMILIES['nba2k'], seqs, poses, target_len=8,
                          augment_camera=True, seed=0)
    for _ in range(5):
        s = sampler.sample()
        assert s['pose1'].shape == (13, 3)
        assert s['pose2'].shape == (13, 3)
        assert np.isfinite(s['kp_features']).all()
        # extremity rows zeroed is family-dependent; nba2k keeps them
        # (USE_EXTREMITIES=True)


def test_pairwise_sampler():
    # two people sharing the same action and frames
    seqs, _ = make_synth_family('3dpeople', num_seqs=1, seed=1)
    (key, frames) = seqs[0]
    seqs = [(('man01', 'run'), frames), (('woman02', 'run'), frames)]
    sampler = PairwiseSampler(seqs, seed=0)
    s = sampler.sample()
    assert set(s) == {'pose1', 'pose2'}
    assert s['pose1'].shape == (13, 3)

    # fused batching emits has_3d=0 / neg_valid=0 rows for pairwise
    batch = FusedBatcher([sampler], 8).next_batch()
    assert batch['has_3d'].sum() == 0
    assert batch['neg_valid'].sum() == 0


def test_no_hflip_and_no_camera_aug():
    seqs, poses = make_synth_family('human36m', seed=2)
    sampler = VIPESampler(FAMILIES['human36m'], seqs, poses,
                          random_hflip=False, augment_camera=False,
                          target_len=4, seed=0)
    s = sampler.sample()
    assert s['pose1'].shape == (13, 3)


def test_embed_bones_dim():
    seqs, poses = make_synth_family('human36m', seed=3)
    sampler = VIPESampler(FAMILIES['human36m'], seqs, poses,
                          embed_bones=True, target_len=4, seed=0)
    s = sampler.sample()
    assert s['pose1'].shape[0] > 13  # bones appended


def test_mesh_helpers():
    import jax

    mesh = get_mesh()
    assert mesh.size == jax.device_count()
    batch = {'x': np.zeros((16, 4)), 'y': np.zeros(16)}
    sharded = shard_batch(batch, mesh)
    assert sharded['x'].shape == (16, 4)
    rep = replicate({'w': np.ones(3)}, mesh)
    assert np.asarray(rep['w']).tolist() == [1, 1, 1]

    padded = pad_batch_to({'x': np.ones((5, 2))}, 8, pad_mask_key='valid')
    assert padded['x'].shape == (8, 2)
    assert padded['valid'].tolist() == [True] * 5 + [False] * 3


def test_moving_avg_selector():
    sel = MovingAvgSelector(window=2)
    assert sel.update(1.0)          # avg 1.0 -> best
    assert not sel.update(1.2)      # avg 1.1 -> worse
    assert sel.update(0.2)          # avg 0.7 -> best
    assert not sel.update(float('nan'))  # nan never best (reference parity)


def test_prefetcher(tmp_path):
    from PIL import Image

    emb_videos = make_synth_emb_videos(num_videos=1, num_frames=4,
                                       emb_dim=4)
    os.makedirs(tmp_path / 'embs')
    for name, embs in emb_videos.items():
        store_pickle(str(tmp_path / 'embs' / f'{name}.emb.pkl'), embs)
    vdir = tmp_path / 'crops' / 'video0'
    os.makedirs(vdir)
    rng = np.random.default_rng(0)
    for f in range(4):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3),
                                     dtype=np.uint8)).save(
            vdir / f'{f}.png')

    from vpd_tpu.data.crops import scan_emb_dir
    samples, _ = scan_emb_dir(str(tmp_path / 'embs'), min_pose_score=0.)
    src = CropBatchSource(samples, str(tmp_path / 'crops'), 16,
                          batch_size=2, target_len=4, use_mask=False)
    pre = Prefetcher(src)
    b1 = pre.next()
    b2 = pre.next()
    assert b1['rgb'].shape == (2, 16, 16, 3)
    assert b2['emb'].shape[0] == 2
    pre.close()


def test_real_tennis_loader_with_synthetic_embs(tmp_path):
    """Drive load_tennis_data with REAL label/split files + cached video
    metadata, synthesizing emb pickles for a few real clip names."""
    from vpd_tpu.datasets.metadata_cache import load_meta_cache
    from vpd_tpu.datasets.recognition_data import load_tennis_data

    meta = load_meta_cache('tennis')
    # pick clips that appear in the labels file
    from vpd_tpu.datasets.load import load_actions
    actions = load_actions(
        'vpd_tpu/datasets/data/action_dataset/tennis/all.txt')
    base_videos = {a.split(':')[0] for a in actions}
    clips = [v for v in meta if v.rsplit('_', 2)[0] in base_videos][:3]
    assert clips, 'no overlapping clips found'

    rng = np.random.default_rng(0)
    emb_dir = tmp_path / 'embs'
    os.makedirs(emb_dir)
    for clip in clips:
        n = min(meta[clip].num_frames, 50)
        embs = [(f, rng.normal(size=(2, 4)).astype(np.float32), {})
                for f in range(n)]
        store_pickle(str(emb_dir / 'front__{}.emb.pkl'.format(clip)), embs)

    out = load_tennis_data('tennis', str(emb_dir), False, meta,
                           log=lambda *a: None)
    categories = out[0]
    assert len(categories) == 7
    train_embs, train_labels = out[1], out[2]
    test_embs = out[5]
    # every labeled action landed in some split
    total = len(train_embs) + len(out[3]) + len(test_embs)
    assert total > 0
    with_embs = [a for a, e in train_embs.items() if e is not None]
    # at least the actions inside our synthesized clips got windows
    assert all(e is None or e.ndim == 3 for e in train_embs.values())


def test_batched_geometry_matches_per_sample():
    """sample_batch's vectorized geometry == the per-sample functions."""
    from vpd_tpu.geometry import human36m
    from vpd_tpu.geometry.camera import (random_project_coco,
                                         random_project_coco_batch)
    from vpd_tpu.geometry.coco import (normalize_2d_skeleton,
                                       normalize_2d_skeleton_batch)
    from vpd_tpu.geometry.features3d import get_3d_features

    rng = np.random.default_rng(0)
    kps = rng.normal(size=(16, 17, 3)).astype(np.float32)
    flips = rng.integers(0, 2, 16).astype(bool)
    for bones in (False, True):
        b = normalize_2d_skeleton_batch(kps, flips,
                                        include_bone_features=bones)
        s = np.stack([normalize_2d_skeleton(k, f,
                                            include_bone_features=bones)
                      for k, f in zip(kps, flips)])
        np.testing.assert_allclose(b, s, rtol=1e-6, atol=1e-6)

    xyz = rng.normal(size=(1, 17, 3))
    r1, r2 = np.random.default_rng(7), np.random.default_rng(7)
    np.testing.assert_allclose(
        random_project_coco_batch(xyz, r1)[0],
        random_project_coco(xyz[0], r2), rtol=1e-12)

    offs = rng.normal(size=(8, human36m.SPEC.num_edges, 3))
    b = get_3d_features(offs, human36m.SPEC)
    s = np.stack([get_3d_features(o, human36m.SPEC) for o in offs])
    np.testing.assert_allclose(b, s, rtol=1e-9)


def test_sample_batch_matches_sample_distribution():
    """sample_batch: same shapes and statistics as n sample() calls."""
    from tests.synth import make_synth_family

    for fam in ('human36m', 'nba2k'):
        seqs, poses = make_synth_family(fam, seed=0)
        s = VIPESampler(FAMILIES[fam], seqs, poses, target_len=4096)
        out = s.sample_batch(256)
        assert out['pose1'].shape == (256, 13, 3)
        assert np.isfinite(out['pose1']).all()
        assert np.isfinite(out['kp_features']).all()
        # invalid negatives are exact zeros, like sample()
        invalid = out['neg_valid'] == 0
        assert (out['pose_neg'][invalid] == 0).all()

        s2 = VIPESampler(FAMILIES[fam], seqs, poses, target_len=4096,
                         seed=5)
        ref = [s2.sample() for _ in range(256)]
        for k in ('pose1', 'pose2', 'kp_features'):
            assert abs(out[k].mean()
                       - np.mean([r[k] for r in ref])) < 0.06, (fam, k)
        assert abs(out['neg_valid'].mean()
                   - np.mean([r['neg_valid'] for r in ref])) < 0.12


def test_nba2k_camera_aug_forced_on():
    """NBA2kDataset.load_default hardcodes camera augmentation on
    (reference keypoint.py:442-465): --no_camera_aug must not disable
    it for the nba2k family."""
    seqs, poses = make_synth_family('nba2k', seed=4)
    sampler = VIPESampler(FAMILIES['nba2k'], seqs, poses,
                          augment_camera=False, target_len=4, seed=0)
    assert sampler.augment_camera
    off = VIPESampler(FAMILIES['human36m'],
                      *make_synth_family('human36m', seed=4),
                      augment_camera=False, target_len=4, seed=0)
    assert not off.augment_camera


def test_fused_batcher_construction_preserves_sampler_stream():
    """Deriving kp_dims at batcher construction must not advance the
    samplers' RNG: two batchers over identically-seeded samplers draw
    identical batches."""
    def build():
        seqs, poses = make_synth_family('human36m', seed=5)
        return VIPESampler(FAMILIES['human36m'], seqs, poses,
                           target_len=8, seed=7)

    s1, s2 = build(), build()
    b1 = FusedBatcher([s1], 4)
    ref = b1.next_batch()
    b2a = FusedBatcher([s2], 4)   # a second construction over s2's twin
    got = b2a.next_batch()
    np.testing.assert_allclose(got['pose1'], ref['pose1'])
    np.testing.assert_allclose(got['kp_features'], ref['kp_features'])


def test_kp_feature_dim_matches_sample_for_every_family():
    """The static kp_feature_dim formula must equal the width of an
    actual drawn sample's kp_features for each family spec."""
    for fam in FAMILIES:
        seqs, poses = make_synth_family(fam, seed=2)
        s = VIPESampler(FAMILIES[fam], seqs, poses, target_len=4, seed=0)
        drawn = int(np.prod(s.sample()['kp_features'].shape))
        assert s.kp_feature_dim == drawn, (fam, s.kp_feature_dim, drawn)
