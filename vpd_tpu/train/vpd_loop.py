"""VPD student training loop: epochs, loss.json, best/periodic checkpoints.

Driver parity with reference `train_vpd_model.py:171-281`; config.json is
the manifest `apply_vpd` rebuilds the student from.
"""

import os

import jax
import numpy as np

from ..core import checkpoint as ckpt
from ..core.io import store_json
from ..core.mesh import get_mesh, shard_batch, step_sync_needed
from ..data.augment import RGB_MEAN_STD
from ..models import build_encoder
from .vpd import (MotionHead, VPDStudent, create_state, make_aug_eval_step,
                  make_cached_eval_step, make_cached_train_step,
                  make_eval_step, make_train_step)


def build_student(config, dtype=None):
    import jax.numpy as jnp
    dtype = dtype if dtype is not None else jnp.bfloat16
    arch = config['encoder_arch']
    if 'resnet' in arch:
        encoder = build_encoder(arch, config['emb_dim'], dtype=dtype)
    elif 'effnet' in arch:  # reference models/rgb.py:62-66
        from ..models.efficientnet import build_effnet
        encoder = build_effnet(arch, config['emb_dim'], dtype=dtype)
    else:
        raise NotImplementedError(arch)
    motion = MotionHead(config['emb_dim']) if config['motion'] else None
    return VPDStudent(encoder=encoder, motion=motion)


class VPDTrainer:

    def __init__(self, train_source, val_source, config, save_dir=None,
                 mesh=None, seed=0, dtype=None, pretrained_weights=None):
        self.train_source = train_source
        self.val_source = val_source
        self.config = dict(config)
        self.save_dir = save_dir
        self.mesh = mesh if mesh is not None else get_mesh()

        self.model = build_student(self.config, dtype=dtype)
        img_dim = config['img_dim']
        channels = 5 if config['use_flow'] else 3
        sample = np.zeros((1, img_dim, img_dim, channels), np.float32)
        self.state = create_state(
            self.model, sample, config['learning_rate'], seed=seed)
        if self.config.get('pretrained'):
            self._init_pretrained(pretrained_weights, channels)

        mean, std = config['rgb_mean_std']
        import jax.numpy as jnp
        model_dtype = dtype if dtype is not None else jnp.bfloat16
        # HBM crop cache: sources built from data/hbm_cache carry the
        # device-resident pixel arrays; steps then gather rows on device
        # and batches ship only indices + targets.
        cache = getattr(train_source, 'device_cache', None)
        self.cache = cache.arrays if cache is not None else None
        cache_kw = {}
        # Augmentation inputs follow the SOURCE's configuration: the
        # streamed step body keys off batch contents, but the cached
        # step must be told explicitly or it would apply mask noise
        # whenever the cache happens to hold masks (breaking the
        # streamed-vs-cached equality contract).
        use_mask = getattr(train_source, 'use_mask', True)
        if self.cache is not None:
            assert (cache.mesh == self.mesh
                    or (cache.mesh is None and self.mesh.size == 1)), \
                'multi-device training needs a DeviceCropCache built ' \
                'with the same mesh (cache replicated per chip)'
            assert not self.config.get('augment_val'), \
                'augment_val with the HBM cache is not implemented'
            if val_source is not None:
                assert getattr(val_source, 'device_cache', None) \
                    is cache, \
                    'train and val sources must share one DeviceCropCache'
            if cache.row_sharded:  # shard_map local gather
                cache_kw = {'mesh': cache.mesh,
                            'rows_per_device': cache.rows_per_device}
        # bf16 students augment in bf16 too: the cast merely moves ahead
        # of the encoder, halves the augment block's HBM traffic, and
        # runs the resample matmuls at MXU bf16 rate (+5% step
        # throughput, PERF.md round 3). f32 students keep f32 end-to-end.
        make_train = (make_cached_train_step if self.cache is not None
                      else make_train_step)
        self.train_step = make_train(
            self.model, mean, std, img_dim=img_dim,
            use_flow=config['use_flow'], use_mask=use_mask,
            aug_dtype=model_dtype,
            jitter_order=self.config.get('jitter_order', 'batch'),
            **cache_kw)
        if self.config.get('augment_val'):
            # Reference parity: val batches are augmented too
            # (single_frame.py:354); see QUIRKS.md "Deviations".
            self.eval_step = None
            self.aug_eval_step = make_aug_eval_step(
                self.model, mean, std, img_dim=img_dim,
                use_flow=config['use_flow'], use_mask=use_mask,
                aug_dtype=model_dtype,
                jitter_order=self.config.get('jitter_order', 'batch'))
        else:
            if self.cache is not None:
                self.eval_step = make_cached_eval_step(
                    self.model, mean, std, use_flow=config['use_flow'],
                    **cache_kw)
            else:
                self.eval_step = make_eval_step(
                    self.model, mean, std, use_flow=config['use_flow'])
            self.aug_eval_step = None
        self.rng = jax.random.key(seed + 1)
        self.val_rng = jax.random.key(seed + 2)
        self._val_steps = 0

        self.losses = []
        self.selector = ckpt.MovingAvgSelector(
            self.config.get('model_select_window', 5))

    def _init_pretrained(self, weights_path, num_channels):
        """ImageNet-init the encoder (reference models/rgb.py:56-66).

        The backbone params/batch_stats come from a torchvision state_dict
        converted to NHWC Flax layout, with the stem mean-expanded for
        5-channel (RGB+flow) students; the emb head stays freshly
        initialized (`replace_last_layer`, models/rgb.py:40-43).
        """
        arch = self.config['encoder_arch']
        if 'resnet' not in arch:
            # Reference parity: the effnet path uses
            # EfficientNet.from_name (models/rgb.py:62-66), which IGNORES
            # pretrained — effnet students always train from random init.
            import warnings
            warnings.warn(
                'pretrained=True is ignored for {} (reference parity: '
                'models/rgb.py:62-66 builds effnet with from_name, i.e. '
                'random init)'.format(arch))
            return
        if weights_path is None:
            raise ValueError(
                "pretrained=True requires ImageNet weights: pass "
                "--init_weights <torchvision {} state_dict .pth> (this "
                "environment has no torchvision/network access, so the "
                "file must be supplied; without it the reference "
                "semantics of --pretrained cannot be honored)".format(arch))
        from ..models.torch_compat import (imagenet_init_variables,
                                           load_torch_state_dict)
        sd = (load_torch_state_dict(weights_path)
              if isinstance(weights_path, (str, os.PathLike))
              else weights_path)
        pp, ps = imagenet_init_variables(sd, arch, num_channels)
        params = dict(self.state.params)
        stats = dict(self.state.batch_stats)
        params['encoder'] = {**pp, 'Dense_0': params['encoder']['Dense_0']}
        stats['encoder'] = ps
        self.state = self.state.replace(params=params, batch_stats=stats)

    def save_config(self):
        os.makedirs(self.save_dir, exist_ok=True)
        store_json(os.path.join(self.save_dir, 'config.json'), self.config)

    def _components(self):
        comps = {'encoder': {
            'params': self.state.params['encoder'],
            'batch_stats': self.state.batch_stats.get('encoder', {})}}
        if 'motion' in self.state.params:
            comps['decoder'] = {
                'params': self.state.params['motion'],
                'batch_stats': self.state.batch_stats.get('motion', {})}
        return comps

    def save_model(self, name, with_optimizer=False):
        comps = self._components()
        if with_optimizer:
            # epoch checkpoints (the --resume source) carry the AdamW
            # moments so a resumed run continues the same trajectory;
            # best_epoch stays weights-only (it exists to be served,
            # and moments double its size)
            comps['optimizer'] = self.state.opt_state
        ckpt.save_bundle(self.save_dir, name, comps)

    def _epoch(self, source, train):
        # Metrics stay on device until the epoch ends: a float() per step
        # would force a host sync per dispatch (~27 ms on relay-attached
        # hosts), serializing steps that otherwise pipeline. Multi-device
        # CPU must serialize anyway (collective rendezvous deadlock).
        sync = step_sync_needed(self.mesh)
        metrics = []
        for _ in range(source.num_batches):
            batch = shard_batch(source.next_batch(), self.mesh)
            if train:
                if self.cache is not None:
                    self.state, m = self.train_step(
                        self.state, batch, self.rng, self.cache)
                else:
                    self.state, m = self.train_step(
                        self.state, batch, self.rng)
            elif self.aug_eval_step is not None:
                m = self.aug_eval_step(self.state, batch, self.val_rng,
                                       np.int32(self._val_steps))
                self._val_steps += 1
            elif self.cache is not None:
                m = self.eval_step(self.state, batch, self.cache)
            else:
                m = self.eval_step(self.state, batch)
            if sync:
                jax.block_until_ready(m['emb_loss_sum'])
            metrics.append(m)
        from ..core.metrics import fetch_metrics

        metrics = fetch_metrics(metrics)  # ONE device readback
        total = sum(float(m['emb_loss_sum']) for m in metrics)
        n = sum(float(m['n']) for m in metrics)
        return total / max(n, 1)

    def train_one_epoch(self, epoch):
        train_loss = self._epoch(self.train_source, train=True)
        val_loss = (self._epoch(self.val_source, train=False)
                    if self.val_source is not None else float('nan'))

        self.losses.append({
            'epoch': epoch, 'train': train_loss, 'val': val_loss,
            'dataset_train': [(self.config.get('dataset', ''), train_loss)],
            'dataset_val': [(self.config.get('dataset', ''), val_loss)]})
        if self.save_dir:
            store_json(os.path.join(self.save_dir, 'loss.json'), self.losses)

        is_best = self.selector.update(val_loss)
        if self.save_dir:
            if is_best:
                self.save_model('best_epoch')
            freq = self.config.get('checkpoint_frequency')
            if freq and epoch % freq == 0:
                self.save_model('epoch{:04d}'.format(epoch),
                                with_optimizer=True)
        return train_loss, val_loss

    def fit(self, start_epoch=1, log=print):
        epoch = 0
        for epoch in range(start_epoch, self.config['num_epochs'] + 1):
            train_loss, val_loss = self.train_one_epoch(epoch)
            log('Epoch {} - train loss: {:0.4f} val loss: {:0.4f}'.format(
                epoch, train_loss, val_loss))
        if self.save_dir and epoch:
            self.save_model('epoch{:04d}'.format(epoch),
                            with_optimizer=True)

    def load_model(self, name):
        targets = self._components()
        # epoch checkpoints written by fit() carry the AdamW moments;
        # best_epoch and older/imported dirs are weights-only and resume
        # with fresh optimizer state
        has_opt = os.path.exists(os.path.join(
            self.save_dir, '{}.optimizer.ckpt'.format(name)))
        if has_opt:
            targets['optimizer'] = self.state.opt_state
        loaded = ckpt.load_bundle(self.save_dir, name, targets)
        params = dict(self.state.params)
        stats = dict(self.state.batch_stats)
        params['encoder'] = loaded['encoder']['params']
        if loaded['encoder']['batch_stats']:
            stats['encoder'] = loaded['encoder']['batch_stats']
        if 'decoder' in loaded:
            params['motion'] = loaded['decoder']['params']
            if loaded['decoder']['batch_stats']:
                stats['motion'] = loaded['decoder']['batch_stats']
        self.state = self.state.replace(
            params=params, batch_stats=stats,
            opt_state=(loaded['optimizer'] if has_opt
                       else self.state.opt_state))

    def resume(self):
        """Restore the last epoch checkpoint + loss history; returns the
        next epoch (extends the reference, which only resumes the
        teacher, train_vipe_model.py:202-209)."""
        from ..core.io import load_json

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


def default_config(dataset, emb_dim, num_epochs=1000, batch_size=100,
                   learning_rate=5e-4, img_dim=128, use_flow=False,
                   motion=False, encoder_arch='resnet34', pretrained=False,
                   model_select_window=5, checkpoint_frequency=None,
                   augment_val=False, jitter_order='batch'):
    """Manifest schema parity with `train_vpd_model.py:222-228`.

    `jitter_order` is recorded only when non-default ('per_sample') so
    the manifest stays schema-identical to reference-written configs.
    """
    extra = ({'jitter_order': jitter_order}
             if jitter_order != 'batch' else {})
    return {
        **extra,
        'augment_val': augment_val,
        'dataset': dataset,
        'num_epochs': num_epochs,
        'batch_size': batch_size,
        'learning_rate': learning_rate,
        'img_dim': img_dim,
        'use_flow': use_flow,
        'motion': motion,
        'emb_dim': emb_dim,
        'encoder_arch': encoder_arch,
        'pretrained': pretrained,
        'rgb_mean_std': [list(x) for x in
                         RGB_MEAN_STD['resnet' if pretrained else dataset]],
        'model_select_window': model_select_window,
        'checkpoint_frequency': checkpoint_frequency,
    }
