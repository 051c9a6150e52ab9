"""Full-pipeline smoke: teacher -> .emb.pkl -> student -> .emb.pkl -> tasks.

Mirrors BASELINE.json configs[4]: every stage consumes exactly what the
previous stage wrote to disk, using the interchange formats.
"""

import gzip
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from synth import make_synth_family
from vpd_tpu.data.crops import CropBatchSource, scan_emb_dir, train_val_split
from vpd_tpu.data.vipe_sampler import FAMILIES, FusedBatcher, VIPESampler
from vpd_tpu.datasets.load import group_by_frame, load_embs
from vpd_tpu.infer.apply_vipe import apply_vipe
from vpd_tpu.infer.apply_vpd import apply_vpd, scan_crop_dir
from vpd_tpu.tasks.recognize import KnnModel
from vpd_tpu.train.vipe_loop import VIPETrainer
from vpd_tpu.train.vipe_loop import default_config as vipe_config
from vpd_tpu.train.vpd_loop import VPDTrainer
from vpd_tpu.train.vpd_loop import default_config as vpd_config

IMG = 32


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    rng = np.random.default_rng(0)

    # ---- 1. train a tiny VIPE* teacher --------------------------------
    seqs, poses = make_synth_family('human36m', seed=0)
    sampler = VIPESampler(FAMILIES['human36m'], seqs, poses, target_len=32)
    val_sampler = VIPESampler(FAMILIES['human36m'], seqs, poses,
                              target_len=16, seed=9)
    config = vipe_config(['human36m'], [(20, 7)],
                         [sampler.mean_kp_offset_norms], num_epochs=1,
                         embedding_dim=8, encoder_arch=(1, 32),
                         decoder_arch=(1, 32), checkpoint_frequency=1)
    teacher_dir = str(tmp_path / 'teacher')
    trainer = VIPETrainer(FusedBatcher([sampler], 16),
                          FusedBatcher([val_sampler], 16), config,
                          save_dir=teacher_dir)
    trainer.save_config()
    trainer.fit(log=lambda *a: None)

    # ---- 2. teacher extraction on pose JSON ---------------------------
    pose_dir = tmp_path / 'poses'
    os.makedirs(pose_dir)
    num_frames = 12
    for v in range(2):
        data = []
        for f in range(num_frames):
            kp = rng.uniform(0, 100, (17, 3))
            kp[:, 2] = rng.uniform(0.6, 1.0, 17)
            data.append([f, [[0.9, kp.tolist()]]])
        with gzip.open(pose_dir / 'video{}.json.gz'.format(v), 'wt',
                       encoding='ascii') as fp:
            json.dump(data, fp)
    teacher_embs = str(tmp_path / 'teacher_embs')
    apply_vipe(str(pose_dir), teacher_dir, teacher_embs,
               log=lambda *a: None)

    # ---- 3. student distillation from the teacher's pickles -----------
    crop_dir = tmp_path / 'crops'
    for v in range(2):
        vdir = crop_dir / 'video{}'.format(v)
        os.makedirs(vdir)
        for f in range(num_frames):
            Image.fromarray(rng.integers(
                0, 255, (IMG, IMG, 3), dtype=np.uint8)).save(
                vdir / '{}.png'.format(f))

    samples, emb_dim = scan_emb_dir(teacher_embs, min_pose_score=0.0)
    assert emb_dim == 8
    train, val = train_val_split(samples)
    src = CropBatchSource(train, str(crop_dir), IMG, batch_size=8,
                          target_len=16)
    student_dir = str(tmp_path / 'student')
    sconfig = vpd_config('tennis', emb_dim, num_epochs=1, batch_size=8,
                         img_dim=IMG, encoder_arch='resnet18',
                         checkpoint_frequency=1)
    import jax.numpy as jnp
    strainer = VPDTrainer(src, None, sconfig, save_dir=student_dir,
                          dtype=jnp.float32)
    strainer.save_config()
    strainer.fit(log=lambda *a: None)

    # ---- 4. student extraction -----------------------------------------
    videos, tasks = scan_crop_dir(str(crop_dir))
    student_embs = str(tmp_path / 'student_embs')
    apply_vpd(videos, tasks, student_dir, student_embs, model_epoch=1,
              batch_size=16, log=lambda *a: None)

    # ---- 5. downstream: densify + knn recognition ----------------------
    emb_dict = load_embs(student_embs, norm=False, log=lambda *a: None)
    assert set(emb_dict) == {'video0', 'video1'}
    dense, mask = emb_dict['video0']
    assert dense.shape == (num_frames, 2, 8)
    assert mask.all()

    # treat each video as one "action"; 1-NN must retrieve itself
    train_embs = {v: emb_dict[v][0][:, 0, :] for v in emb_dict}
    labels = {'video0': 0, 'video1': 1}
    knn = KnnModel('dtw', train_embs, labels, k=1)
    for v in emb_dict:
        pred, neighbor = knn.predict(train_embs[v])
        assert pred == labels[v]
        assert neighbor == v
