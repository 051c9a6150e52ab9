"""CLI integration: real entry points driven on synthetic on-disk data."""

import gzip
import json
import os
import pickle

import numpy as np
import pytest

from synth import random_offsets
from vpd_tpu.geometry import human36m, nba2k, people3d
from vpd_tpu.geometry.camera import random_project_offsets


def _gz_json(path, obj):
    with gzip.open(path, 'wt', encoding='ascii') as fp:
        json.dump(obj, fp)


def _make_h36m_tree(root, people=('S1', 'S9'), num_frames=6, seed=0):
    """data/vipe/human3.6m layout: cocopose gz-JSONs + 3D pickle."""
    rng = np.random.default_rng(seed)
    pose_dir = os.path.join(root, 'cocopose')
    os.makedirs(pose_dir)
    poses_3d = {}
    for person in people:
        action = 'Walking'
        offsets = [random_offsets(human36m.SPEC, rng)
                   for _ in range(num_frames)]
        poses_3d[(person, action)] = [
            (np.zeros(3), 0.0, o) for o in offsets]
        frames = []
        for f in range(num_frames):
            kp = random_project_offsets(human36m.SPEC, offsets[f], rng)
            frames.append([f, [[0.9, kp.tolist()]]])
        _gz_json(os.path.join(
            pose_dir, '{}.{}.cam0.json.gz'.format(person, action)), frames)
    pose3d_file = os.path.join(root, 'ground_truth_3d_pose.pkl')
    with open(pose3d_file, 'wb') as fp:
        pickle.dump(poses_3d, fp)
    return pose_dir, pose3d_file


def test_train_vipe_cli(tmp_path, monkeypatch):
    from vpd_tpu.data.vipe_sampler import load_human36m
    from vpd_tpu.tools import train_vipe

    pose_dir, pose3d_file = _make_h36m_tree(str(tmp_path / 'h36m'))
    monkeypatch.setitem(
        train_vipe.LOADERS, 'human36m',
        (load_human36m, pose_dir, pose3d_file))
    # shrink virtual epochs so one epoch is a handful of batches
    from vpd_tpu.data.vipe_sampler import FAMILIES
    monkeypatch.setattr(FAMILIES['human36m'], 'train_target_len', 32,
                        raising=False)
    monkeypatch.setattr(FAMILIES['human36m'], 'val_target_len', 16,
                        raising=False)

    save_dir = str(tmp_path / 'model')
    train_vipe.main(
        dataset=['human36m'], save_dir=save_dir, checkpoint_frequency=1,
        num_epochs=1, learning_rate=1e-3, batch_size=16, embedding_dim=8,
        encoder_arch=(1, 32), decoder_arch=(1, 32), embed_bones=False,
        model_select_contrast=False, model_select_window=1, resume=False,
        no_camera_aug=False, seed=0)
    files = os.listdir(save_dir)
    assert 'config.json' in files and 'loss.json' in files
    assert 'best_epoch.encoder.ckpt' in files

    # resume path: continue for another epoch from the checkpoint
    train_vipe.main(
        dataset=['human36m'], save_dir=save_dir, checkpoint_frequency=1,
        num_epochs=2, learning_rate=1e-3, batch_size=16, embedding_dim=8,
        encoder_arch=(1, 32), decoder_arch=(1, 32), embed_bones=False,
        model_select_contrast=False, model_select_window=1, resume=True,
        no_camera_aug=False, seed=0)
    with open(os.path.join(save_dir, 'loss.json')) as fp:
        assert len(json.load(fp)) == 2


def test_extract_square_crops_cli(tmp_path):
    import cv2

    from vpd_tpu.core.io import encode_png
    from vpd_tpu.tools.extract_square_crops import main as crops_main

    rng = np.random.default_rng(0)
    video_dir = tmp_path / 'videos'
    pose_dir = tmp_path / 'pose'
    os.makedirs(video_dir)
    num_frames = 8
    w, h = 96, 64
    vw = cv2.VideoWriter(str(video_dir / 'vid.mp4'),
                         cv2.VideoWriter_fourcc(*'mp4v'), 10, (w, h))
    for _ in range(num_frames):
        vw.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    vw.release()

    os.makedirs(pose_dir / 'vid')
    boxes = [[f, [20, 10, 30, 40]] for f in range(num_frames)]
    with open(pose_dir / 'vid' / 'boxes.json', 'w') as fp:
        json.dump(boxes, fp)
    mask_img = (rng.random((40, 30)) > 0.5)
    masks = [[f, [[0.9, [20, 10, 30, 40], encode_png(mask_img)]]]
             for f in range(num_frames)]
    _gz_json(str(pose_dir / 'vid' / 'mask.json.gz'), masks)

    out_dir = str(tmp_path / 'crops')
    crops_main(str(pose_dir), str(video_dir), out_dir, dim=32,
               target_fps=None, num_prev_frames=1, no_smooth=False,
               parallelism=1)

    files = os.listdir(os.path.join(out_dir, 'vid'))
    assert '0.png' in files
    assert '0.prev.png' in files
    assert '0.mask.png' in files
    crop = cv2.imread(os.path.join(out_dir, 'vid', '3.png'))
    assert crop.shape == (32, 32, 3)

    # --visualize on a headless host saves the crop strips under .viz/
    # (reference shows a cv2 window, extract_square_crops.py:118-120)
    viz_out = str(tmp_path / 'crops_viz')
    crops_main(str(pose_dir), str(video_dir), viz_out, dim=32,
               target_fps=None, num_prev_frames=1, no_smooth=False,
               parallelism=1, visualize=True)
    viz_dir = os.path.join(viz_out, 'vid', '.viz')
    assert os.path.isdir(viz_dir) and '0.png' in os.listdir(viz_dir)
    strip = cv2.imread(os.path.join(viz_dir, '0.png'))
    assert strip.shape == (32, 64, 3)  # crop + 1 prev, hstacked
    # the hidden .viz dir must be invisible to the shard packer
    from vpd_tpu.data.shards import scan_png_tree
    prefixes = {rel for rel, _ in scan_png_tree(viz_out)}
    assert not any('.viz' in p for p in prefixes) and 'vid/0' in prefixes


def test_preprocess_3d_pose_cli(tmp_path):
    from vpd_tpu.tools.preprocess_3d_pose import main as prep_main

    rng = np.random.default_rng(0)

    # --- nba2k layout
    nba_dir = tmp_path / 'nba2k'
    person_dir = nba_dir / 'alfred'
    os.makedirs(person_dir / 'images' / '2ku')
    j3d = [rng.uniform(-1, 1, (35, 3)) for _ in range(3)]
    for f in range(3):
        (person_dir / 'images' / '2ku' / '{:04d}.png'.format(f)).touch()
    with open(person_dir / 'release_alfred_2ku.pkl', 'wb') as fp:
        pickle.dump({'j3d': j3d}, fp)
    out = str(tmp_path / 'nba2k.pkl')
    prep_main(str(nba_dir), 'nba2k', out, visualize=True,
              visualize_frequency=2)
    with open(out, 'rb') as fp:
        data = pickle.load(fp)
    assert ('alfred',) in data
    # headless --visualize saved front/side previews for frames 0 and 2
    viz = sorted(os.listdir(out + '.viz'))
    assert viz == ['000000.front.png', '000000.side.png',
                   '000002.front.png', '000002.side.png']
    assert data[('alfred',)][0][2].shape == (24, 3)

    # --- amass layout
    amass_dir = tmp_path / 'amass'
    seq_dir = amass_dir / 'CMU_run01'
    os.makedirs(seq_dir)
    np.save(str(seq_dir / 'pose.npy'), rng.uniform(-1, 1, (2, 52, 3)))
    for f in range(2):
        (seq_dir / '{:04d}_img.jpg'.format(f)).touch()
    out = str(tmp_path / 'amass.pkl')
    prep_main(str(amass_dir), 'amass', out)
    with open(out, 'rb') as fp:
        data = pickle.load(fp)
    assert ('CMU', 'run01') in data
    assert data[('CMU', 'run01')][0][2].shape == (21, 3)

    # --- 3dpeople layout
    p3d_dir = tmp_path / '3dpeople'
    cam_dir = p3d_dir / 'man01' / 'walk' / 'camera01'
    os.makedirs(cam_dir)
    for f in (1, 2):
        np.savetxt(str(cam_dir / '{:04d}.txt'.format(f)),
                   rng.uniform(-1, 1, (67, 6)))
    out = str(tmp_path / 'p3d.pkl')
    prep_main(str(p3d_dir), '3dpeople', out)
    with open(out, 'rb') as fp:
        data = pickle.load(fp)
    assert ('man01', 'walk') in data
    assert data[('man01', 'walk')][0][2].shape == (24, 3)


def test_train_vipe_cli_with_workers(tmp_path, monkeypatch):
    """--num_workers path: fork-safe probe + MultiprocessBatcher +
    post-fork mesh creation."""
    from vpd_tpu.data.vipe_sampler import FAMILIES, load_human36m
    from vpd_tpu.tools import train_vipe

    pose_dir, pose3d_file = _make_h36m_tree(str(tmp_path / 'h36m'))
    monkeypatch.setitem(
        train_vipe.LOADERS, 'human36m',
        (load_human36m, pose_dir, pose3d_file))
    monkeypatch.setattr(FAMILIES['human36m'], 'train_target_len', 32,
                        raising=False)
    monkeypatch.setattr(FAMILIES['human36m'], 'val_target_len', 16,
                        raising=False)

    save_dir = str(tmp_path / 'model')
    train_vipe.main(
        dataset=['human36m'], save_dir=save_dir, checkpoint_frequency=1,
        num_epochs=1, learning_rate=1e-3, batch_size=16, embedding_dim=8,
        encoder_arch=(1, 32), decoder_arch=(1, 32), embed_bones=False,
        model_select_contrast=False, model_select_window=1, resume=False,
        no_camera_aug=False, seed=0, num_workers=1)
    files = os.listdir(save_dir)
    assert 'config.json' in files and 'best_epoch.encoder.ckpt' in files
