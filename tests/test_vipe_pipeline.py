"""Trainer loop + apply_vipe end-to-end on synthetic data (tiny shapes)."""

import gzip
import json
import os
import pickle

import numpy as np

from synth import make_synth_family
from vpd_tpu.data.vipe_sampler import FAMILIES, FusedBatcher, VIPESampler
from vpd_tpu.infer.apply_vipe import apply_vipe
from vpd_tpu.train.vipe_loop import VIPETrainer, default_config


def make_trainer(tmp_path, num_epochs=2):
    samplers, val_samplers = [], []
    for i, fam in enumerate(['human36m']):
        seqs, poses = make_synth_family(fam, seed=i)
        samplers.append(VIPESampler(
            FAMILIES[fam], seqs, poses, target_len=48, seed=i))
        val_samplers.append(VIPESampler(
            FAMILIES[fam], seqs, poses, target_len=16, seed=100 + i))
    train_b = FusedBatcher(samplers, 16)
    val_b = FusedBatcher(val_samplers, 16)

    config = default_config(
        ['human36m'], [(20, 7)], [samplers[0].mean_kp_offset_norms],
        num_epochs=num_epochs, embedding_dim=8,
        encoder_arch=(1, 32), decoder_arch=(1, 32),
        checkpoint_frequency=1)
    return VIPETrainer(train_b, val_b, config,
                       save_dir=str(tmp_path / 'model')), config


def test_trainer_fit_checkpoints_and_resume(tmp_path):
    trainer, config = make_trainer(tmp_path)
    trainer.save_config()
    trainer.fit(log=lambda *a: None)

    save_dir = str(tmp_path / 'model')
    files = os.listdir(save_dir)
    assert 'config.json' in files
    assert 'loss.json' in files
    assert 'best_epoch.encoder.ckpt' in files
    assert 'epoch0002.encoder.ckpt' in files
    assert 'epoch0002.decoder-3d.ckpt' in files
    assert 'epoch0002.optimizer.ckpt' in files

    with open(os.path.join(save_dir, 'loss.json')) as fp:
        losses = json.load(fp)
    assert len(losses) == 2
    assert {'epoch', 'train', 'val', 'dataset_train',
            'dataset_val'} <= set(losses[0])

    # resume restores state and continues from epoch 3
    trainer2, _ = make_trainer(tmp_path)
    start = trainer2.resume()
    assert start == 3
    assert len(trainer2.losses) == 2

    # a dir without optimizer state (serving-only import_torch_model
    # output) still resumes — with fresh Adam moments and a warning,
    # instead of crashing on the missing component
    os.remove(os.path.join(save_dir, 'epoch0002.optimizer.ckpt'))
    trainer3, _ = make_trainer(tmp_path)
    assert trainer3.resume() == 3
    enc2 = trainer2.state.params['encoder']['Dense_0']['kernel']
    enc3 = trainer3.state.params['encoder']['Dense_0']['kernel']
    np.testing.assert_array_equal(np.asarray(enc2), np.asarray(enc3))
    tm, _ = trainer3.train_one_epoch(3)  # trains fine from fresh moments
    assert np.isfinite(tm['loss'])


def write_pose_json(path, num_frames=6, seed=0):
    rng = np.random.default_rng(seed)
    data = []
    for f in range(num_frames):
        dets = []
        for _ in range(rng.integers(1, 3)):
            kp = rng.uniform(0, 100, size=(17, 3))
            kp[:, 2] = rng.uniform(0.6, 1.0, size=17)
            dets.append([0.9, kp.tolist()])
        data.append([f, dets])
    with gzip.open(path, 'wt', encoding='ascii') as fp:
        json.dump(data, fp)


def test_apply_vipe_writes_interchange_pickles(tmp_path):
    trainer, config = make_trainer(tmp_path, num_epochs=1)
    trainer.save_config()
    trainer.fit(log=lambda *a: None)

    pose_dir = tmp_path / 'poses'
    os.makedirs(pose_dir)
    write_pose_json(str(pose_dir / 'vidA.json.gz'), seed=1)
    os.makedirs(pose_dir / 'vidB')
    write_pose_json(str(pose_dir / 'vidB' / 'coco_keypoints.json.gz'), seed=2)

    out_dir = tmp_path / 'embs'
    apply_vipe(str(pose_dir), str(tmp_path / 'model'), str(out_dir),
               log=lambda *a: None)

    for vid in ['vidA', 'vidB']:
        with open(out_dir / '{}.emb.pkl'.format(vid), 'rb') as fp:
            embs = pickle.load(fp)
        assert len(embs) == 6
        frame_num, emb, meta = embs[0]
        assert isinstance(frame_num, int)
        # flip-augmented: rows are (orig, flip) stacks
        assert emb.shape == (2, 8)
        assert emb.dtype == np.float32 or emb.dtype == np.float64
        assert {'kp_score', 'is_mean'} <= set(meta)
        assert np.all(np.isfinite(emb))
        # frames sorted
        assert [e[0] for e in embs] == sorted(e[0] for e in embs)


def test_render_previews(tmp_path):
    trainer, _ = make_trainer(tmp_path, num_epochs=1)
    trainer.save_config()
    trainer.fit(log=lambda *a: None)
    from vpd_tpu.geometry import human36m
    trainer.render_previews(
        trainer.train_batcher.samplers, [human36m.SPEC], epoch=1, count=1,
        log=lambda *a: None)
    out = tmp_path / 'model' / 'epoch0001.preview.mp4'
    assert out.exists() and out.stat().st_size > 0


def test_apply_vipe_no_flip_single_rows(tmp_path):
    trainer, _ = make_trainer(tmp_path, num_epochs=1)
    trainer.save_config()
    trainer.fit(log=lambda *a: None)

    pose_dir = tmp_path / 'poses'
    os.makedirs(pose_dir)
    write_pose_json(str(pose_dir / 'vid.json.gz'), num_frames=3, seed=3)
    out_dir = tmp_path / 'embs'
    apply_vipe(str(pose_dir), str(tmp_path / 'model'), str(out_dir),
               no_flip=True, log=lambda *a: None)
    with open(out_dir / 'vid.emb.pkl', 'rb') as fp:
        embs = pickle.load(fp)
    assert embs[0][1].shape == (8,)


def test_trainer_without_val_batcher(tmp_path):
    """val_batcher=None trains and selects on train metrics instead of
    crashing mid-fit (vipe_loop.train_one_epoch fallback)."""
    seqs, poses = make_synth_family('human36m', seed=0)
    train_b = FusedBatcher([VIPESampler(
        FAMILIES['human36m'], seqs, poses, target_len=32, seed=0)], 16)
    config = default_config(
        ['human36m'], [(20, 7)],
        [train_b.samplers[0].mean_kp_offset_norms],
        num_epochs=1, embedding_dim=8,
        encoder_arch=(1, 32), decoder_arch=(1, 32),
        checkpoint_frequency=1)
    trainer = VIPETrainer(train_b, None, config,
                          save_dir=str(tmp_path / 'model'))
    try:
        trainer.save_config()
        trainer.fit(log=lambda *a: None)
        train_m, val_m = trainer.train_one_epoch(2)
        assert val_m is train_m
    finally:
        trainer.close()
