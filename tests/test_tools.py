"""CLI tool smoke tests: imports, --help, and light end-to-end runs."""

import gzip
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

TOOLS = [
    'train_vipe', 'apply_vipe', 'train_vpd', 'apply_vpd', 'recognize',
    'detect', 'preprocess_3d_pose', 'dummy_2d_features', 'stack_features',
    'extract_square_crops', 'recut_fs_video', 'recut_finegym_video',
    'view_2d_pose', 'plot_losses',
]


@pytest.mark.parametrize('tool', TOOLS)
def test_tool_help(tool):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    result = subprocess.run(
        [sys.executable, '-m', 'vpd_tpu.tools.{}'.format(tool), '--help'],
        capture_output=True, timeout=180, env=env, cwd='/root/repo')
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    assert b'usage' in result.stdout.lower()


def _write_pose_dir(pose_dir, num_videos=1, num_frames=4, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(pose_dir, exist_ok=True)
    for v in range(num_videos):
        data = []
        for f in range(num_frames):
            kp = rng.uniform(0, 100, (17, 3))
            kp[:, 2] = rng.uniform(0.5, 1, 17)
            data.append([f, [[0.9, kp.tolist()]]])
        with gzip.open(os.path.join(pose_dir, 'vid{}.json.gz'.format(v)),
                       'wt', encoding='ascii') as fp:
            json.dump(data, fp)


def test_dummy_2d_and_stack_features(tmp_path):
    pose_dir = str(tmp_path / 'poses')
    _write_pose_dir(pose_dir)

    from vpd_tpu.tools.dummy_2d_features import main as dummy_main
    out1 = str(tmp_path / 'e1')
    dummy_main(pose_dir, out1, no_flip=False)
    with open(os.path.join(out1, 'vid0.emb.pkl'), 'rb') as fp:
        embs = pickle.load(fp)
    assert embs[0][1].shape == (2, 26)  # (orig, flip) x 13 kp x 2 coords
    assert embs[0][2]['is_2d']

    from vpd_tpu.tools.stack_features import main as stack_main
    out2 = str(tmp_path / 'stacked')
    stack_main(out1, out1, out2)
    with open(os.path.join(out2, 'vid0.emb.pkl'), 'rb') as fp:
        stacked = pickle.load(fp)
    assert stacked[0][1].shape == (2, 52)


def test_plot_losses(tmp_path):
    model_dir = tmp_path / 'model'
    os.makedirs(model_dir)
    losses = [{'epoch': i, 'train': 1. / (i + 1), 'val': 1.2 / (i + 1),
               'dataset_train': [('a', 1. / (i + 1))],
               'dataset_val': [('a', 1.2 / (i + 1))]} for i in range(5)]
    with open(model_dir / 'loss.json', 'w') as fp:
        json.dump(losses, fp)

    from vpd_tpu.tools.plot_losses import main as plot_main
    out = str(tmp_path / 'plot.pdf')
    plot_main(str(model_dir), None, out)
    assert os.path.getsize(out) > 0


def test_render_preview():
    from vpd_tpu.geometry import human36m
    from vpd_tpu.geometry.render import render_3d_skeleton_views

    rng = np.random.default_rng(0)
    offsets = rng.normal(size=(20, 3)) * 0.2
    positions = human36m.SPEC.decode_all_positions(offsets)
    im = render_3d_skeleton_views(
        [positions, positions * 1.05], human36m.SPEC, 'test',
        labels=['true', 'pred'])
    assert im.ndim == 3 and im.shape[2] == 3
