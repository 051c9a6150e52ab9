#!/usr/bin/env python3
"""Train the VIPE* teacher (CLI parity: reference `train_vipe_model.py`).

Usage: python -m vpd_tpu.tools.train_vipe --dataset 3d --save_dir <dir>
"""

import argparse

import numpy as np

from ..data.vipe_sampler import (
    FAMILIES, FusedBatcher, PairwiseSampler, VIPESampler, load_3dpeople,
    load_amass, load_human36m, load_keyed, load_nba2k)
from ..train.vipe_loop import VIPETrainer, default_config
from . import paths

DATASETS_3D = ['3dpeople', 'human36m', 'nba2k', 'amass']
DATASETS_PAIR = ['3dpeople_pair']
DATASETS = DATASETS_3D + DATASETS_PAIR

LOADERS = {
    'human36m': (load_human36m, paths.HUMAN36M_KEYPOINT_DIR,
                 paths.HUMAN36M_3D_POSE_FILE),
    '3dpeople': (load_3dpeople, paths.PEOPLE_3D_KEYPOINT_DIR,
                 paths.PEOPLE_3D_3D_POSE_FILE),
    'nba2k': (load_nba2k, paths.NBA2K_KEYPOINT_DIR,
              paths.NBA2K_3D_POSE_FILE),
    'amass': (load_amass, paths.AMASS_KEYPOINT_DIR,
              paths.AMASS_3D_POSE_FILE),
}


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataset', type=str, nargs='+')
    parser.add_argument('--save_dir', type=str, required=True)
    parser.add_argument('--checkpoint_frequency', type=int, default=25)
    parser.add_argument('--render_preview_frequency', type=int, default=100)
    parser.add_argument('--num_epochs', type=int, default=500)
    parser.add_argument('--learning_rate', type=float, default=0.0001)
    parser.add_argument('--batch_size', type=int, default=100)
    parser.add_argument('--embedding_dim', type=int, default=32)
    parser.add_argument('--encoder_arch', type=int, nargs=2,
                        default=(2, 1024))
    parser.add_argument('--decoder_arch', type=int, nargs=2, default=(2, 512))
    parser.add_argument('--embed_bones', action='store_true')
    parser.add_argument('--model_select_contrast', action='store_true')
    parser.add_argument('--model_select_window', type=int, default=1)
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--no_camera_aug', action='store_true')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--num_workers', type=int, default=0,
                        help='sampler worker processes '
                             '(reference DataLoader num_workers)')
    parser.add_argument('--tensor_parallel', type=int, default=1,
                        help='model-axis size of a 2-D data x model mesh '
                             '(column-shards the wide FC kernels)')
    return parser.parse_args()


def build_samplers(names, embed_bones, augment_camera, seed):
    train_samplers, val_samplers = [], []
    shapes, norms = [], []
    for i, name in enumerate(names):
        if name == '3dpeople_pair':
            (train_seqs, val_seqs), _ = load_keyed(
                paths.PEOPLE_3D_KEYPOINT_DIR, None, '3dpeople',
                lambda f: tuple(f.split('.', 1)[0].split('__', 1)))
            train_samplers.append(PairwiseSampler(
                train_seqs, embed_bones=embed_bones, seed=seed + i))
            val_samplers.append(PairwiseSampler(
                val_seqs, embed_bones=embed_bones, seed=seed + 100 + i))
            shapes.append(None)
            norms.append(None)
            continue
        loader, pose2d_dir, pose3d_file = LOADERS[name]
        (train_seqs, val_seqs), poses_3d = loader(pose2d_dir, pose3d_file)
        fam = FAMILIES[name]
        train_samplers.append(VIPESampler(
            fam, train_seqs, poses_3d, augment_camera=augment_camera,
            embed_bones=embed_bones, target_len=fam.train_target_len,
            seed=seed + i))
        val_samplers.append(VIPESampler(
            fam, val_seqs, poses_3d, augment_camera=augment_camera,
            embed_bones=embed_bones, target_len=fam.val_target_len,
            seed=seed + 100 + i))
        shapes.append((fam.spec.num_edges, 7))
        norms.append(train_samplers[-1].mean_kp_offset_norms)
    return train_samplers, val_samplers, shapes, norms


def main(dataset, save_dir, checkpoint_frequency, num_epochs, learning_rate,
         batch_size, embedding_dim, encoder_arch, decoder_arch, embed_bones,
         model_select_contrast, model_select_window, resume, no_camera_aug,
         seed, render_preview_frequency=100, num_workers=0,
         tensor_parallel=1):
    if dataset and 'all' in dataset:
        dataset = DATASETS
    elif dataset and '3d' in dataset:
        dataset = DATASETS_3D
    assert dataset, 'no datasets selected'

    if num_workers > 0:
        # Fork safety: MultiprocessBatcher workers must fork BEFORE any
        # jax backend initializes (XLA/libtpu clients are not fork-safe;
        # workers run pure numpy). Probe the device count in a throwaway
        # subprocess so the mesh can be built after the workers fork.
        import subprocess
        import sys

        # The probe subprocess must see the SAME platform config the
        # parent will use post-fork: a fresh process boots with default
        # devices and cannot see in-process jax.config updates (the
        # repo's documented config method), which previously made the
        # probe report 1 device while the parent mesh had 8. Reading
        # config options does not initialize a backend, so this is still
        # fork-safe.
        import jax as _jax_cfg

        probe_lines = ['import jax']
        _plat = _jax_cfg.config.jax_platforms
        if _plat:
            probe_lines.append(
                'jax.config.update("jax_platforms", {!r})'.format(_plat))
        _ncpu = getattr(_jax_cfg.config, 'jax_num_cpu_devices', None)
        if _ncpu is not None and _ncpu > 0:
            probe_lines.append(
                'jax.config.update("jax_num_cpu_devices", {})'.format(
                    int(_ncpu)))
        probe_lines.append('print(jax.device_count())')
        probe = subprocess.run(
            [sys.executable, '-c', '\n'.join(probe_lines)],
            capture_output=True, text=True)
        n_dev = (int(probe.stdout.strip().splitlines()[-1])
                 if probe.returncode == 0 else 1)
        data_div = max(1, n_dev // max(tensor_parallel, 1))
        mesh = None  # built below, after the workers fork
    else:
        if tensor_parallel > 1:
            from ..core.mesh import get_mesh_2d
            mesh = get_mesh_2d(tensor_parallel)
        else:
            from ..core.mesh import get_mesh
            mesh = get_mesh()
        data_div = int(mesh.shape.get('data', 1))

    train_samplers, val_samplers, shapes, norms = build_samplers(
        dataset, embed_bones, not no_camera_aug, seed)
    train_b = FusedBatcher(train_samplers, batch_size, divisor=data_div)
    val_b = FusedBatcher(val_samplers, batch_size, divisor=data_div)
    if num_workers > 0:
        # fork one FusedBatcher per worker; the pose data is shared
        # copy-on-write, only the RNG streams differ per worker
        import copy

        from ..data.parallel_batcher import MultiprocessBatcher

        def make_batcher(samplers, salt):
            def make(wid):
                clones = []
                for si, smp in enumerate(samplers):
                    c = copy.copy(smp)
                    c.rng = np.random.default_rng(
                        seed + salt + 7919 * (wid + 1) + si)
                    clones.append(c)
                return FusedBatcher(clones, batch_size, divisor=data_div)
            return make

        train_b = MultiprocessBatcher(
            make_batcher(train_samplers, 0), num_workers,
            train_b.num_batches, template=train_b)
        val_b = MultiprocessBatcher(
            make_batcher(val_samplers, 104729), max(1, num_workers // 2),
            val_b.num_batches, template=val_b)

    if mesh is None:  # workers have forked; safe to init the backend now
        if tensor_parallel > 1:
            from ..core.mesh import get_mesh_2d
            mesh = get_mesh_2d(tensor_parallel)
        else:
            from ..core.mesh import get_mesh
            mesh = get_mesh()

    data_ax = int(mesh.shape.get('data', 1))
    if train_b.batch_size % data_ax or val_b.batch_size % data_ax:
        raise SystemExit(
            'Batch size {} (train) / {} (val) is not divisible by the '
            "mesh 'data' axis ({} devices). The pre-fork device probe "
            'disagreed with the post-fork mesh; pass a --batch_size '
            'divisible by the device count.'.format(
                train_b.batch_size, val_b.batch_size, data_ax))

    config = default_config(
        dataset, shapes, norms, num_epochs=num_epochs,
        learning_rate=learning_rate, batch_size=batch_size,
        embedding_dim=embedding_dim, encoder_arch=encoder_arch,
        decoder_arch=decoder_arch, embed_bones=embed_bones,
        augment_camera=not no_camera_aug,
        model_select_window=model_select_window,
        checkpoint_frequency=checkpoint_frequency)
    config['model_select_contrast'] = model_select_contrast

    trainer = VIPETrainer(train_b, val_b, config, save_dir=save_dir,
                          mesh=mesh, seed=seed)
    start_epoch = 1
    if resume:
        start_epoch = trainer.resume()
    else:
        trainer.save_config()

    specs = [FAMILIES[n].spec if n in FAMILIES else None for n in dataset]
    try:
        for epoch in range(start_epoch, num_epochs + 1):
            trainer.train_one_epoch(epoch)
            if render_preview_frequency and \
                    epoch % render_preview_frequency == 0:
                trainer.render_previews(train_samplers, specs, epoch)
    finally:
        trainer.close()
    print('Done!')


if __name__ == '__main__':
    main(**vars(get_args()))
