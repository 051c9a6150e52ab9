"""VIPE* training loop: epochs, loss history, checkpoint selection, resume.

Driver parity with reference `train_vipe_model.py:232-425`: config.json
manifest (the contract `apply_vipe` rebuilds models from), loss.json epoch
history with per-dataset breakdown, moving-average-val best checkpoint +
periodic checkpoints, and `--resume` from the last epoch checkpoint.
"""

import os

import jax
import numpy as np

from ..core import checkpoint as ckpt
from ..core.io import load_json, store_json
from ..core.mesh import MODEL_AXIS, apply_tensor_parallel, get_mesh, \
    shard_batch, step_sync_needed
from ..models import FCPoseDecoder, FCResNet
from .vipe import (VIPEModel, create_state, make_eval_step, make_train_step,
                   run_epoch)

ENCODER_DROPOUT = 0.2
DECODER_DROPOUT = 0.0
LIFT_3D_WEIGHT = 1


def build_model(config, kp_dims):
    encoder = FCResNet(
        out_dim=config['embedding_dim'],
        num_blocks=config['encoder_arch'][0],
        hidden_dim=config['encoder_arch'][1],
        dropout=ENCODER_DROPOUT)
    decoder = None
    if any(d > 0 for d in kp_dims):
        # reference decoder: FCPoseDecoder(emb, [h]*n, targets)
        # (`train_vipe_model.py:304-307` with USE_RESNET_DECODER=False),
        # i.e. an (n-1)-layer FCNet trunk + width-h last layer. n == 1 is
        # reference-invalid (module.py:215 asserts len(hidden_dims) >= 2);
        # tiny test configs use it, so pad to the minimum legal depth.
        n, h = config['decoder_arch']
        decoder = FCPoseDecoder(
            hidden_dims=(h,) * max(n, 2),
            target_dims=tuple(max(d, 1) for d in kp_dims),
            dropout=DECODER_DROPOUT)
    return VIPEModel(encoder=encoder, decoder=decoder)


class VIPETrainer:

    def __init__(self, train_batcher, val_batcher, config, save_dir=None,
                 mesh=None, seed=0):
        self.train_batcher = train_batcher
        self.val_batcher = val_batcher
        self.config = dict(config)
        self.save_dir = save_dir
        self.mesh = mesh if mesh is not None else get_mesh()

        self.model = build_model(self.config, train_batcher.kp_dims)
        kp_mask = train_batcher.kp_mask()
        self.state = create_state(
            self.model, train_batcher.next_batch(),
            learning_rate=self.config['learning_rate'], seed=seed)
        if MODEL_AXIS in self.mesh.shape and \
                self.mesh.shape[MODEL_AXIS] > 1:
            # tensor parallelism: wide FC kernels + their AdamW state are
            # column-sharded over the 'model' axis; jit/GSPMD partitions
            # the matmuls and inserts the collectives
            self.state = apply_tensor_parallel(self.state, self.mesh)
        self.train_step = make_train_step(
            self.model, kp_mask, weight_3d=LIFT_3D_WEIGHT)
        self.eval_step = make_eval_step(
            self.model, kp_mask, weight_3d=LIFT_3D_WEIGHT)
        self.rng = jax.random.key(seed + 1)

        if self.mesh.size == 1:
            # Single-device: sample + start the H2D upload on a prefetch
            # thread so the sampler (~20 ms/batch, PERF.md) overlaps the
            # in-flight step instead of serializing with dispatch — the
            # same pattern as the VPD loop. Multi-device meshes keep
            # main-thread placement (a sharded device_put racing a
            # running collective deadlocks the CPU backend's rendezvous,
            # core/mesh.step_sync_needed).
            from ..data.crops import PrefetchedSource

            to_dev = lambda b: shard_batch(b, self.mesh)
            self.train_batcher = PrefetchedSource(
                train_batcher, transform=to_dev)
            if val_batcher is not None:
                self.val_batcher = PrefetchedSource(
                    val_batcher, transform=to_dev)

        self.losses = []
        self.selector = ckpt.MovingAvgSelector(
            self.config.get('model_select_window', 1))

    # -- persistence ------------------------------------------------------

    def save_config(self):
        os.makedirs(self.save_dir, exist_ok=True)
        store_json(os.path.join(self.save_dir, 'config.json'), self.config)

    def _components(self):
        comps = {
            'encoder': {
                'params': self.state.params['encoder'],
                'batch_stats': self.state.batch_stats.get('encoder', {}),
            },
            'optimizer': self.state.opt_state,
        }
        if 'decoder' in self.state.params:
            comps['decoder-3d'] = {
                'params': self.state.params['decoder'],
                'batch_stats': self.state.batch_stats.get('decoder', {}),
            }
        return comps

    def save_model(self, name):
        ckpt.save_bundle(self.save_dir, name, self._components())

    def load_model(self, name):
        targets = self._components()
        # an optimizer component may be absent (a serving-only
        # import_torch_model dir whose torch source had no
        # {name}.optimizer.pt): resume with fresh Adam moments then,
        # rather than crashing — the reference cannot resume such a dir
        # at all (train_vipe_model.py:197-199 load is unconditional)
        has_opt = os.path.exists(os.path.join(
            self.save_dir, '{}.optimizer.ckpt'.format(name)))
        if not has_opt:
            targets.pop('optimizer')
            print('WARNING: {} has no optimizer checkpoint; resuming '
                  'with fresh optimizer state'.format(name))
        loaded = ckpt.load_bundle(self.save_dir, name, targets)
        params = dict(self.state.params)
        stats = dict(self.state.batch_stats)
        params['encoder'] = loaded['encoder']['params']
        if loaded['encoder']['batch_stats']:
            stats['encoder'] = loaded['encoder']['batch_stats']
        if 'decoder-3d' in loaded:
            params['decoder'] = loaded['decoder-3d']['params']
            if loaded['decoder-3d']['batch_stats']:
                stats['decoder'] = loaded['decoder-3d']['batch_stats']
        self.state = self.state.replace(
            params=params, batch_stats=stats,
            opt_state=(loaded['optimizer'] if has_opt
                       else self.state.opt_state))
        if MODEL_AXIS in self.mesh.shape and \
                self.mesh.shape[MODEL_AXIS] > 1:
            # Restored arrays are host numpy (default-placed); re-apply the
            # tensor-parallel placement so resume keeps the sharded AdamW
            # state instead of silently replicating it.
            self.state = apply_tensor_parallel(self.state, self.mesh)

    # -- training ---------------------------------------------------------

    def _run(self, batcher, train):
        def step(state, batch, rng=None):
            batch = shard_batch(batch, self.mesh)
            if train:
                return self.train_step(state, batch, rng)
            return self.eval_step(state, batch)

        sync = step_sync_needed(self.mesh)
        if train:
            return run_epoch(batcher, self.state, step,
                             batcher.num_batches, rng=self.rng, train=True,
                             sync=sync)
        _, metrics = run_epoch(batcher, self.state, step,
                               batcher.num_batches, train=False, sync=sync)
        return self.state, metrics

    def train_one_epoch(self, epoch):
        self.state, train_m = self._run(self.train_batcher, train=True)
        # val_batcher=None is accepted by __init__/close: fall back to
        # train metrics for selection rather than crashing mid-fit
        val_m = (self._run(self.val_batcher, train=False)[1]
                 if self.val_batcher is not None else train_m)

        names = self.config.get('dataset_names')
        per_ds = lambda m: [
            (names[i] if names else str(i), v)
            for i, v in sorted(m['per_dataset'].items())]
        select_key = ('contra' if self.config.get('model_select_contrast')
                      else 'loss')
        self.losses.append({
            'epoch': epoch,
            'train': train_m[select_key], 'val': val_m[select_key],
            'dataset_train': [('contrast', train_m['contra'])]
                             + per_ds(train_m),
            'dataset_val': [('contrast', val_m['contra'])] + per_ds(val_m),
        })
        if self.save_dir:
            store_json(os.path.join(self.save_dir, 'loss.json'), self.losses)

        is_best = self.selector.update(val_m[select_key])
        if self.save_dir:
            if is_best:
                self.save_model('best_epoch')
            freq = self.config.get('checkpoint_frequency', 25)
            if epoch % freq == 0:
                self.save_model('epoch{:04d}'.format(epoch))
        return train_m, val_m

    def fit(self, start_epoch=1, log=print):
        for epoch in range(start_epoch, self.config['num_epochs'] + 1):
            train_m, val_m = self.train_one_epoch(epoch)
            log('Epoch {} - train loss: {:0.5f}, contra: {:0.3f} | '
                'val loss: {:0.5f}, contra: {:0.3f}'.format(
                    epoch, train_m['loss'], train_m['contra'],
                    val_m['loss'], val_m['contra']))

    def close(self):
        """Stop the prefetch threads (a daemon thread blocked inside a
        device_put at interpreter shutdown aborts the process)."""
        for b in (self.train_batcher, self.val_batcher):
            if hasattr(b, 'close'):
                b.close()

    def render_previews(self, samplers, specs, epoch, count=10,
                        log=print):
        """Write true-vs-predicted skeleton preview MP4s.

        Parity with `train_vipe_model.py:63-100,396-411`: for each 3D
        family, decode predicted features back to joint positions and
        render front/side views alongside ground truth.
        """
        import jax.numpy as jnp

        from ..geometry.render import render_3d_skeleton_views, \
            save_video_preview

        def frames():
            for ds_id, (sampler, spec) in enumerate(zip(samplers, specs)):
                if spec is None:
                    continue
                for i in range(min(count, len(sampler.sequences))):
                    for data in sampler.get_sequence(i):
                        norms = data['kp_offset_norms']
                        norms = norms / np.max(norms)
                        true3d = data['kp_offsets'] * norms[:, None]

                        pose = data['pose'].reshape(1, -1)
                        emb = self.model.apply(
                            {'params': self.state.params,
                             'batch_stats': self.state.batch_stats},
                            jnp.asarray(pose), train=False,
                            method='embed')
                        pred = self.model.apply(
                            {'params': self.state.params,
                             'batch_stats': self.state.batch_stats},
                            emb, jnp.array([ds_id]), train=False,
                            method='decode')
                        kp_dim = spec.num_edges * 7
                        pred3d = np.asarray(pred)[0, :kp_dim].reshape(
                            spec.num_edges, 7)[:, :3] * norms[:, None]
                        yield render_3d_skeleton_views(
                            [spec.decode_all_positions(true3d),
                             spec.decode_all_positions(pred3d)],
                            spec,
                            '[{}] {} frame={}'.format(
                                spec.name, data['key'], data['frame']),
                            labels=['true', 'pred'])

        out = os.path.join(self.save_dir,
                           'epoch{:04d}.preview.mp4'.format(epoch))
        save_video_preview(out, frames())
        log('Saved video: {}'.format(out))

    def resume(self):
        """Restore state + loss history from the last epoch checkpoint."""
        last = ckpt.last_checkpoint_epoch(self.save_dir)
        assert last >= 0, 'nothing to resume in {}'.format(self.save_dir)
        self.load_model('epoch{:04d}'.format(last))
        loss_file = os.path.join(self.save_dir, 'loss.json')
        if os.path.exists(loss_file):
            self.losses = [x for x in load_json(loss_file)
                           if x['epoch'] <= last]
            for rec in self.losses:
                self.selector.update(rec['val'])
        return last + 1


def default_config(dataset_names, kp_shapes, mean_norms, num_epochs=500,
                   learning_rate=1e-4, batch_size=100, embedding_dim=32,
                   encoder_arch=(2, 1024), decoder_arch=(2, 512),
                   embed_bones=False, augment_camera=True,
                   model_select_window=1, checkpoint_frequency=25):
    """The config.json manifest (schema parity: train_vipe_model.py:330-344)."""
    return {
        'datasets': [
            {'name': n, '3d_pose_shape': list(s) if s else None,
             'mean_kp_offset_norms': m.tolist() if m is not None else None}
            for n, s, m in zip(dataset_names, kp_shapes, mean_norms)],
        'dataset_names': list(dataset_names),
        'num_epochs': num_epochs,
        'learning_rate': learning_rate,
        'batch_size': batch_size,
        'embedding_dim': embedding_dim,
        'encoder_arch': list(encoder_arch),
        'decoder_arch': list(decoder_arch),
        'embed_bones': embed_bones,
        'augment_camera': augment_camera,
        'model_select_window': model_select_window,
        'checkpoint_frequency': checkpoint_frequency,
    }
