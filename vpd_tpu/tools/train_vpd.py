#!/usr/bin/env python3
"""Train the VPD student (CLI parity: reference `train_vpd_model.py`)."""

import argparse
import os

import numpy as np

from ..data.crops import (CropBatchSource, PrefetchedSource, scan_emb_dir,
                          train_val_split)
from ..datasets.eval_splits import get_test_prefixes
from ..train.vpd_loop import VPDTrainer, default_config
from . import paths

DATASETS = ['tennis', 'fs', 'fx', 'diving48', 'penn']

CROP_DIRS = {
    'tennis': paths.TENNIS_CROP_DIR,
    'fs': paths.FS_CROP_DIR,
    'fx': paths.FX_CROP_DIR,
    'diving48': paths.DIVING48_CROP_DIR,
}
ROOT_DIRS = {
    'tennis': paths.TENNIS_ROOT_DIR,
    'fs': paths.FS_ROOT_DIR,
    'fx': paths.FX_ROOT_DIR,
    'diving48': paths.DIVING48_ROOT_DIR,
}


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('dataset', type=str, choices=DATASETS)
    parser.add_argument('--save_dir', type=str, required=True)
    parser.add_argument('--checkpoint_frequency', type=int)
    parser.add_argument('--num_epochs', type=int, default=1000)
    parser.add_argument('--batch_size', type=int, default=100)
    parser.add_argument('--learning_rate', type=float, default=0.0005)
    parser.add_argument('--img_dim', type=int, default=128)
    parser.add_argument('--flow_img', type=str)
    parser.add_argument('--motion', action='store_true')
    parser.add_argument('--encoder_arch', type=str, default='resnet34')
    parser.add_argument('--model_select_window', type=int, default=5)
    parser.add_argument('--pretrained', action='store_true')
    parser.add_argument('--init_weights', type=str,
                        help='torchvision ImageNet state_dict (.pth) to '
                             'initialize the backbone from (required with '
                             '--pretrained; reference models/rgb.py:56-66)')
    parser.add_argument('--no_test_video', action='store_true')
    parser.add_argument('--min_pose_score', type=float)
    parser.add_argument('--emb_dir', type=str)
    parser.add_argument('--penn_dir', type=str,
                        help='Penn Action dir holding pose_embs.pkl + '
                             'boxes.json (required for the penn '
                             'ablation, train_vpd_model.py:49)')
    parser.add_argument('--penn_frame_dir', type=str,
                        help='Penn Action full-frame dir (default '
                             'paths.PENN_FRAME_DIR; the reference '
                             'hardcodes this path)')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--resume', action='store_true',
                        help='continue from the last epoch checkpoint in '
                             '--save_dir (extends the reference, which '
                             'only resumes the teacher); epoch '
                             'checkpoints carry the AdamW moments')
    parser.add_argument('--num_workers', type=int, default=0,
                        help='decode/sample worker processes '
                             '(reference DataLoader num_workers)')
    parser.add_argument('--crop_shards', type=str,
                        help='packed crop-shard dir (tools/pack_crops); '
                             'replaces PNG decode with a memmap gather')
    parser.add_argument('--augment_val', action='store_true',
                        help='augment validation batches like the '
                             'reference does (vpd_dataset/common.py:'
                             '83-108); default is deterministic val '
                             '(QUIRKS.md)')
    parser.add_argument('--hbm_cache', action='store_true',
                        help='stage the packed crop shards in device '
                             'HBM once and gather batches on device '
                             '(requires --crop_shards); replicated per '
                             'chip on multi-device meshes')
    parser.add_argument('--jitter_order', type=str, default='batch',
                        choices=('batch', 'per_sample'),
                        help='color-jitter op-order sampling: one order '
                             'per batch (default, free) or torchvision-'
                             'exact per image (~4x jitter cost; '
                             'QUIRKS.md)')
    parser.add_argument('--hbm_cache_sharded', action='store_true',
                        help='row-shard the HBM cache over the data '
                             'mesh instead of replicating it (for '
                             'corpora beyond one chip\'s HBM; each chip '
                             'trains on its resident rows)')
    return parser.parse_args()


def get_exclude_prefixes(dataset):
    if dataset in ('tennis', 'fs'):
        return get_test_prefixes(dataset)
    if dataset == 'fx':
        from ..datasets import finegym
        return tuple(l.split('_A_')[0] for l in
                     finegym.load_labels(finegym.GYM99_VAL_FILE))
    if dataset == 'diving48':
        from ..datasets import diving48
        return tuple(diving48.load_labels_and_embeddings(
            diving48.DIVING48_V2_TEST_FILE)[0].keys())
    raise NotImplementedError(dataset)


def make_penn_sources(penn_dir, frame_dir, img_dim, batch_size, *,
                      motion=False, min_pose_score=None, seed=0):
    """Penn Action ablation sources (reference PennDataset.load_default,
    `vpd_dataset/single_frame.py:316-358`): scan, 80/20 split (sorted
    like the reference), train augmented / val deterministic with the
    0.2x virtual epoch."""
    from ..data.penn import PennBatchSource, scan_penn_dir

    scan_kw = {'embed_time': motion}
    if min_pose_score is not None:
        scan_kw['min_pose_score'] = min_pose_score
    samples, emb_dim = scan_penn_dir(penn_dir, **scan_kw)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(samples))
    # sklearn train_test_split sizes the test split with ceil
    n_val = int(np.ceil(0.2 * len(samples)))
    val = sorted(samples[i] for i in order[:n_val])
    train = sorted(samples[i] for i in order[n_val:])
    train_src = PennBatchSource(train, frame_dir, img_dim, batch_size,
                                target_len=20000, seed=seed)
    val_src = PennBatchSource(val, frame_dir, img_dim, batch_size,
                              target_len=4000, augment=False,
                              seed=seed + 1)
    return train_src, val_src, emb_dim


def main(dataset, save_dir, checkpoint_frequency, num_epochs, batch_size,
         learning_rate, img_dim, flow_img, motion, encoder_arch,
         model_select_window, pretrained, no_test_video, min_pose_score,
         emb_dir, seed, num_workers=0, init_weights=None,
         crop_shards=None, augment_val=False, hbm_cache=False,
         hbm_cache_sharded=False, penn_dir=None, penn_frame_dir=None,
         resume=False, jitter_order='batch'):
    hbm_cache = hbm_cache or hbm_cache_sharded
    if dataset == 'penn':
        # full-frame on-the-fly crops; no crop dir / shards / flow
        # (reference PennDataset raises NotImplementedError for flow)
        assert penn_dir is not None, 'penn requires --penn_dir'
        assert flow_img is None, 'penn has no optical flow'
        assert not (crop_shards or hbm_cache or num_workers
                    or augment_val), \
            'penn supports none of shards/hbm_cache/workers/augment_val'
        train_src, val_src, emb_dim = make_penn_sources(
            penn_dir, penn_frame_dir or paths.PENN_FRAME_DIR, img_dim,
            batch_size, motion=motion, min_pose_score=min_pose_score,
            seed=seed)
        return _fit(dataset, train_src, val_src, emb_dim, save_dir,
                    checkpoint_frequency, num_epochs, batch_size,
                    learning_rate, img_dim, flow_img, motion,
                    encoder_arch, model_select_window, pretrained,
                    seed, init_weights, augment_val, hbm_cache, resume,
                    jitter_order)

    if emb_dir is None:
        emb_dir = os.path.join(ROOT_DIRS[dataset], 'embs')
    exclude = get_exclude_prefixes(dataset) if no_test_video else None

    samples, emb_dim = scan_emb_dir(
        emb_dir, embed_time=motion, min_pose_score=min_pose_score,
        exclude_prefixes=exclude, tennis_layout=(dataset == 'tennis'))
    train, val = train_val_split(samples, 0.2, seed=seed)

    crop_dir = CROP_DIRS[dataset]
    src_kwargs = {'flow_img_name': flow_img, 'shard_dir': crop_shards}
    if hbm_cache:
        # Stage the packed shards in device HBM once; batches become
        # index gathers on device (data/hbm_cache.py). Decode workers
        # and prefetch upload are irrelevant in this mode.
        assert crop_shards, '--hbm_cache requires --crop_shards'
        assert num_workers == 0, '--hbm_cache needs no decode workers'
        from ..core.mesh import get_mesh as _gm
        from ..data.shards import ShardReader
        from ..data.hbm_cache import CacheIndexSource, DeviceCropCache

        reader = ShardReader(crop_shards, crop_root=crop_dir)
        cache = DeviceCropCache(reader, use_flow=flow_img is not None,
                                mesh=_gm(),
                                shard_rows=hbm_cache_sharded)
        train_src = CacheIndexSource(
            train, crop_dir, img_dim, batch_size, target_len=20000,
            seed=seed, cache=cache, **src_kwargs)
        val_src = CacheIndexSource(
            val, crop_dir, img_dim, batch_size, target_len=4000,
            augment=augment_val, seed=seed + 1, cache=cache, **src_kwargs)
    elif num_workers > 0:
        from ..data.parallel_batcher import MultiprocessBatcher

        def make_train(wid):
            return CropBatchSource(
                train, crop_dir, img_dim, batch_size, target_len=20000,
                seed=seed + 1000 * (wid + 1), **src_kwargs)

        def make_val(wid):
            # augment_val: the reference samples val with flips too
            # (single_frame.py:173 with augment=True)
            return CropBatchSource(
                val, crop_dir, img_dim, batch_size, target_len=4000,
                augment=augment_val, seed=seed + 1 + 1000 * (wid + 1),
                **src_kwargs)

        # workers fork BEFORE the mesh initializes any jax backend
        train_src = MultiprocessBatcher(
            make_train, num_workers, max(1, 20000 // batch_size))
        val_src = MultiprocessBatcher(
            make_val, max(1, num_workers // 2),
            max(1, 4000 // batch_size))
    else:
        train_src = CropBatchSource(
            train, crop_dir, img_dim, batch_size, target_len=20000,
            seed=seed, **src_kwargs)
        val_src = CropBatchSource(
            val, crop_dir, img_dim, batch_size, target_len=4000,
            augment=augment_val, seed=seed + 1, **src_kwargs)

    _fit(dataset, train_src, val_src, emb_dim, save_dir,
         checkpoint_frequency, num_epochs, batch_size, learning_rate,
         img_dim, flow_img, motion, encoder_arch, model_select_window,
         pretrained, seed, init_weights, augment_val, hbm_cache, resume,
         jitter_order)


def _fit(dataset, train_src, val_src, emb_dim, save_dir,
         checkpoint_frequency, num_epochs, batch_size, learning_rate,
         img_dim, flow_img, motion, encoder_arch, model_select_window,
         pretrained, seed, init_weights, augment_val, hbm_cache,
         resume=False, jitter_order='batch'):
    """Shared tail: prefetch placement, config manifest, trainer, fit."""
    # Single-device mesh: pre-shard on the prefetch thread so the H2D
    # upload starts while the previous step is in flight (shard_batch on
    # an already-placed batch is a no-op in the train loop). Multi-device
    # meshes keep main-thread placement: a multi-device device_put racing
    # a running collective deadlocks the CPU backend's rendezvous, and
    # upload overlap matters most on single-chip relay links anyway.
    from ..core.mesh import get_mesh, shard_batch
    mesh = get_mesh()
    if not hbm_cache:  # index batches are ~KB; prefetch buys nothing
        to_device = ((lambda b: shard_batch(b, mesh)) if mesh.size == 1
                     else None)
        train_src = PrefetchedSource(train_src, transform=to_device)
        val_src = PrefetchedSource(val_src, transform=to_device)

    config = default_config(
        dataset, emb_dim, num_epochs=num_epochs, batch_size=batch_size,
        learning_rate=learning_rate, img_dim=img_dim,
        use_flow=flow_img is not None, motion=motion,
        encoder_arch=encoder_arch, pretrained=pretrained,
        model_select_window=model_select_window,
        checkpoint_frequency=checkpoint_frequency,
        augment_val=augment_val, jitter_order=jitter_order)

    trainer = VPDTrainer(train_src, val_src, config, save_dir=save_dir,
                         mesh=mesh, seed=seed,
                         pretrained_weights=init_weights)
    start_epoch = 1
    if resume:
        start_epoch = trainer.resume()
        print('Resuming from epoch', start_epoch)
    else:
        trainer.save_config()
    trainer.fit(start_epoch=start_epoch)
    print('Done!')


if __name__ == '__main__':
    main(**vars(get_args()))
