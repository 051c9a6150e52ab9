"""EfficientNet backbone + Penn dataset + profiling utilities."""

import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vpd_tpu.core.profiling import StepTimer
from vpd_tpu.data.penn import PennBatchSource, load_penn_crop, scan_penn_dir
from vpd_tpu.models.efficientnet import (
    build_effnet, round_filters, round_repeats)


def test_round_rules():
    # canonical effnet rounding values
    assert round_filters(32, 1.0) == 32
    assert round_filters(32, 1.1) == 32  # b2 stem stays 32
    assert round_filters(32, 1.2) == 40  # b3 stem
    assert round_filters(1280, 1.2) == 1536  # b3 head
    assert round_repeats(3, 1.4) == 5


def test_effnet_forward_and_train_mode(monkeypatch):
    # truncate the block table: full b0 takes minutes to compile on 1 CPU
    import vpd_tpu.models.efficientnet as eff
    monkeypatch.setattr(eff, 'BASE_BLOCKS', eff.BASE_BLOCKS[:3])
    model = build_effnet('effnet0', emb_dim=16, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 5))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 16)

    out2, mutated = model.apply(
        variables, x, train=True, mutable=['batch_stats'],
        rngs={'dropout': jax.random.key(1)})
    assert out2.shape == (2, 16)
    assert mutated['batch_stats']


def test_effnet_student_trains(tmp_path, monkeypatch):
    import vpd_tpu.models.efficientnet as eff
    monkeypatch.setattr(eff, 'BASE_BLOCKS', eff.BASE_BLOCKS[:3])
    from vpd_tpu.train.vpd_loop import VPDTrainer, default_config

    class _Src:
        num_batches = 1

        def __init__(self):
            self.rng = np.random.default_rng(0)

        def next_batch(self):
            return {'rgb': self.rng.integers(0, 255, (8, 32, 32, 3),
                                             dtype=np.uint8),
                    'emb': self.rng.normal(size=(8, 6)).astype(np.float32),
                    'flip': np.zeros(8, bool)}

    config = default_config('tennis', 6, num_epochs=1, batch_size=8,
                            img_dim=32, encoder_arch='effnet0')
    trainer = VPDTrainer(_Src(), None, config, dtype=jnp.float32)
    train_loss, _ = trainer.train_one_epoch(1)
    assert np.isfinite(train_loss)


def _make_penn_dir(tmp_path, num_seqs=2, num_frames=5, emb_dim=4):
    rng = np.random.default_rng(0)
    penn_dir = tmp_path / 'penn'
    frame_dir = penn_dir / 'frames'
    os.makedirs(penn_dir)
    emb_dict, box_dict = {}, {}
    for s in range(num_seqs):
        seq = '{:04d}'.format(s)
        os.makedirs(frame_dir / seq)
        embs, boxes = [], []
        for f in range(num_frames):
            img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                frame_dir / seq / '{:06d}.jpg'.format(f + 1))
            embs.append((f, 0.9,
                         rng.normal(size=(2, emb_dim)).astype(np.float32)))
            boxes.append([10, 10, 30, 40])
        emb_dict[seq] = embs
        box_dict[seq] = boxes
    with open(penn_dir / 'pose_embs.pkl', 'wb') as fp:
        pickle.dump(emb_dict, fp)
    with open(penn_dir / 'boxes.json', 'w') as fp:
        json.dump(box_dict, fp)
    return str(penn_dir), str(frame_dir)


def test_penn_scan_and_batches(tmp_path):
    penn_dir, frame_dir = _make_penn_dir(tmp_path)
    samples, emb_dim = scan_penn_dir(penn_dir)
    assert emb_dim == 4
    assert len(samples) == 2 * 2 * 5  # 2 flip rows per frame

    # motion variant drops first frames and doubles the target
    m_samples, _ = scan_penn_dir(penn_dir, embed_time=True)
    assert len(m_samples) == 2 * 2 * 4
    assert m_samples[0][3].shape == (8,)

    crop = load_penn_crop(frame_dir, samples[0][0], samples[0][1],
                          samples[0][4], 32)
    assert crop.shape == (32, 32, 3)
    flipped = load_penn_crop(frame_dir, samples[0][0], samples[0][1],
                             samples[0][4], 32, flip=True)
    np.testing.assert_array_equal(crop[:, ::-1], flipped)

    src = PennBatchSource(samples, frame_dir, 32, batch_size=4,
                          target_len=8)
    batch = src.next_batch()
    assert batch['rgb'].shape == (4, 32, 32, 3)
    assert batch['emb'].shape == (4, 4)


def test_train_vpd_penn_cli(tmp_path, monkeypatch):
    """The penn ablation end to end through the train_vpd tool
    (reference `train_vpd_model.py:49,162-166`)."""
    import vpd_tpu.tools.train_vpd as tv
    from vpd_tpu.tools.train_vpd import main

    real = tv.make_penn_sources

    def small(*a, **k):  # shrink the 20000/4000 virtual epochs
        tr, va, dim = real(*a, **k)
        tr.target_len, va.target_len = 32, 16
        return tr, va, dim

    monkeypatch.setattr(tv, 'make_penn_sources', small)
    penn_dir, frame_dir = _make_penn_dir(tmp_path)
    save_dir = str(tmp_path / 'model')
    main('penn', save_dir, 1, 1, 8, 5e-4, 32, None, False, 'resnet18',
         5, False, False, None, None, 0, penn_dir=penn_dir,
         penn_frame_dir=frame_dir)
    with open(os.path.join(save_dir, 'config.json')) as fp:
        config = json.load(fp)
    assert config['dataset'] == 'penn' and config['emb_dim'] == 4
    with open(os.path.join(save_dir, 'loss.json')) as fp:
        losses = json.load(fp)
    assert np.isfinite(losses[0]['train']) and np.isfinite(
        losses[0]['val'])


def test_train_vpd_resume_cli(tmp_path, monkeypatch):
    """`--resume` through the train_vpd tool: a second invocation picks up
    at the next epoch and extends loss.json (extends the reference, which
    only resumes the teacher — `train_vpd_model.py` has no resume)."""
    import vpd_tpu.tools.train_vpd as tv
    from vpd_tpu.tools.train_vpd import main

    real = tv.make_penn_sources

    def small(*a, **k):  # shrink the 20000/4000 virtual epochs
        tr, va, dim = real(*a, **k)
        tr.target_len, va.target_len = 32, 16
        return tr, va, dim

    monkeypatch.setattr(tv, 'make_penn_sources', small)
    penn_dir, frame_dir = _make_penn_dir(tmp_path)
    save_dir = str(tmp_path / 'model')
    args = dict(dataset='penn', save_dir=save_dir, checkpoint_frequency=1,
                batch_size=8, learning_rate=5e-4, img_dim=32, flow_img=None,
                motion=False, encoder_arch='resnet18', model_select_window=5,
                pretrained=False, no_test_video=False, min_pose_score=None,
                emb_dir=None, seed=0, penn_dir=penn_dir,
                penn_frame_dir=frame_dir)
    main(num_epochs=1, **args)
    main(num_epochs=2, resume=True, **args)
    with open(os.path.join(save_dir, 'loss.json')) as fp:
        losses = json.load(fp)
    assert [l['epoch'] for l in losses] == [1, 2]
    assert all(np.isfinite(l['train']) for l in losses)


def test_step_timer():
    timer = StepTimer(items_per_step=10, warmup=1)
    timer.start()
    for _ in range(5):
        timer.step()
    s = timer.summary()
    assert s['steps'] == 4
    assert s['items_per_sec'] > 0
