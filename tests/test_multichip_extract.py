"""Multi-chip extraction fan-out + pretrained-head loading."""

import os
import pickle

import jax.numpy as jnp
import numpy as np

from vpd_tpu.core.mesh import get_mesh


def test_sharded_extraction_matches_single_device(tmp_path):
    from test_vpd import setup_dataset, IMG
    from vpd_tpu.data.crops import CropBatchSource, train_val_split
    from vpd_tpu.infer.apply_vpd import apply_vpd, scan_crop_dir
    from vpd_tpu.train.vpd_loop import VPDTrainer, default_config

    samples, emb_dim, crop_dir = setup_dataset(tmp_path)
    src = CropBatchSource(train_val_split(samples)[0], crop_dir, IMG,
                          batch_size=8, target_len=8)
    config = default_config('tennis', emb_dim, num_epochs=1, batch_size=8,
                            img_dim=IMG, encoder_arch='resnet18',
                            checkpoint_frequency=1)
    trainer = VPDTrainer(src, None, config, save_dir=str(tmp_path / 'm'),
                         dtype=jnp.float32)
    trainer.save_config()
    trainer.fit(log=lambda *a: None)

    videos, tasks = scan_crop_dir(crop_dir)
    apply_vpd(videos, tasks, str(tmp_path / 'm'), str(tmp_path / 'o1'),
              model_epoch=1, batch_size=16, log=lambda *a: None)
    apply_vpd(videos, tasks, str(tmp_path / 'm'), str(tmp_path / 'o2'),
              model_epoch=1, batch_size=16, mesh=get_mesh(),
              log=lambda *a: None)

    for vid in videos:
        with open(tmp_path / 'o1' / f'{vid}.emb.pkl', 'rb') as fp:
            e1 = pickle.load(fp)
        with open(tmp_path / 'o2' / f'{vid}.emb.pkl', 'rb') as fp:
            e2 = pickle.load(fp)
        for (f1, a, _), (f2, b, _) in zip(e1, e2):
            assert f1 == f2
            # different shardings pick different conv tilings; compare at
            # the cosine level (well inside the 1e-3 parity budget)
            for ra, rb in zip(np.atleast_2d(a), np.atleast_2d(b)):
                cos = np.dot(ra, rb) / (
                    np.linalg.norm(ra) * np.linalg.norm(rb))
                assert cos > 1 - 1e-4, cos


def test_seq_head_load_weights(tmp_path):
    from test_downstream import _recognition_data
    from vpd_tpu.train.classifier import SeqModelTrainer

    X, y = _recognition_data(per_class=4)
    X, y = list(X.values()), list(y.values())
    trainer = SeqModelTrainer('gru', X, y, hidden_dim=8, batch_size=8,
                              num_epochs=3, min_epochs=1, depth=1)
    path = str(tmp_path / 'head.ckpt')
    trainer.save(path)
    pred_ref = trainer.predict(X[0], full=True)

    # reload into a fresh trainer; training must be skipped
    loaded = SeqModelTrainer('gru', X, y, hidden_dim=8, batch_size=8,
                             num_epochs=3, min_epochs=1, depth=1,
                             load_weights=path)
    np.testing.assert_allclose(loaded.predict(X[0], full=True), pred_ref,
                               atol=1e-6)


def test_apply_vpd_cli_data_parallel(tmp_path, monkeypatch):
    """The tool-level --data_parallel flag: builds the all-devices mesh,
    guards divisibility, writes the same .emb.pkl files."""
    import pytest

    from test_vpd import setup_dataset, IMG
    from vpd_tpu.data.crops import CropBatchSource, train_val_split
    from vpd_tpu.tools import apply_vpd as tool
    from vpd_tpu.tools import paths
    from vpd_tpu.train.vpd_loop import VPDTrainer, default_config

    samples, emb_dim, crop_dir = setup_dataset(tmp_path)
    src = CropBatchSource(train_val_split(samples)[0], crop_dir, IMG,
                          batch_size=8, target_len=8)
    config = default_config('fs', emb_dim, num_epochs=1, batch_size=8,
                            img_dim=IMG, encoder_arch='resnet18',
                            checkpoint_frequency=1)
    trainer = VPDTrainer(src, None, config, save_dir=str(tmp_path / 'm'),
                         dtype=jnp.float32)
    trainer.save_config()
    trainer.fit(log=lambda *a: None)

    monkeypatch.setattr(paths, 'FS_CROP_DIR', crop_dir)
    tool.main(str(tmp_path / 'm'), 'fs', str(tmp_path / 'o_dp'),
              model_epoch=1, jitter=0, no_flip=False, flow_img=None,
              batch_size=16, data_parallel=True)
    vids = [d for d in os.listdir(crop_dir)
            if os.path.isdir(os.path.join(crop_dir, d))]
    assert vids
    for vid in vids:
        assert (tmp_path / 'o_dp' / f'{vid}.emb.pkl').exists()

    with pytest.raises(SystemExit, match='divisible'):
        tool.main(str(tmp_path / 'm'), 'fs', str(tmp_path / 'o_dp2'),
                  model_epoch=1, jitter=0, no_flip=False, flow_img=None,
                  batch_size=9, data_parallel=True)
