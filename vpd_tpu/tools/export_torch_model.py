#!/usr/bin/env python3
"""Convert a model directory trained by THIS framework into the
reference's (PyTorch) checkpoint format, so vpd-tpu-trained VIPE*/VPD
encoders serve directly in jhong93/vpd (`apply_vipe_model.py` /
`apply_vpd_model.py` load `{name}.encoder.pt` next to `config.json`,
whose schema the two frameworks share).

The inverse of `tools/import_torch_model.py`: every
`{name}.encoder.ckpt` converts via `models/torch_compat.py`
export helpers (NHWC->NCHW / (I,O)->(O,I) transposes, `batch_stats`
back into BN running buffers + `num_batches_tracked`). VIPE training
state exports too: `decoder-3d` heads unpad out of the multi-head and
the optax AdamW moments become a torch `{name}.optimizer.pt`
(`get_model_params` ordering, `train_vipe_model.py:164-169`), so a run
trained HERE resumes in the reference via its own `--resume` path
(`train_vipe_model.py:186-209`); resume-step parity is oracle-tested.

VPD state_dicts get the reference's 'resnet.' wrapper prefix
(`models/rgb.py:61`); effnet students cannot round-trip (the reference
builds them with efficientnet_pytorch `from_name`, models/rgb.py:62-66,
whose layout this framework does not mirror).
"""

import argparse
import os
import re

import numpy as np

CKPT_RE = re.compile(r'^(best_epoch|epoch\d{4,})\.encoder\.ckpt$')


def _export_vipe_optimizer(raw, comp_sds, config, out_path):
    """Serialized optax.adamw state -> torch AdamW state_dict file.

    raw: the 'optimizer' component loaded without a target — flax
    serializes the chain tuple as {'0': {'count','mu','nu'}, '1': {},
    '2': {}}. Each moment leaf exports through the SAME transposes as
    its parameter; a real torch AdamW over shape-matched dummies
    supplies a complete param_groups entry (so the reference's strict
    `optimizer.load_state_dict` finds every hyperparameter field).

    comp_sds: ordered [(exported param state_dict, moments_to_sd)].
    """
    import torch

    from ..models.torch_compat import torch_param_names

    adam = raw['0']
    step = int(np.asarray(adam['count']))
    sds = []
    for field in ('mu', 'nu'):
        flat = []
        for exported_sd, moments_to_sd in comp_sds:
            msd = moments_to_sd(adam[field])
            flat += [msd[k] for k in torch_param_names(exported_sd)]
        sds.append(flat)
    mus, nus = sds

    dummies = [torch.nn.Parameter(torch.zeros(tuple(m.shape)))
               for m in mus]
    opt = torch.optim.AdamW(dummies, lr=config['learning_rate'])
    state = opt.state_dict()
    state['state'] = {
        i: {'step': torch.tensor(float(step)),
            'exp_avg': torch.from_numpy(np.array(m, copy=True)),
            'exp_avg_sq': torch.from_numpy(np.array(v, copy=True))}
        for i, (m, v) in enumerate(zip(mus, nus))}
    torch.save(state, out_path)


def main(model_dir, out_dir):
    from ..core import checkpoint as ckpt
    from ..core.io import load_json, store_json
    from ..models.torch_compat import (
        export_fcposedecoder_state_dict, export_fcresnet_state_dict,
        export_resnet_state_dict, save_torch_state_dict)

    config = load_json(os.path.join(model_dir, 'config.json'))
    if 'embedding_dim' in config:  # VIPE schema
        kind = 'vipe'

        def convert(enc):
            return export_fcresnet_state_dict(
                enc['params'], enc['batch_stats'],
                config['encoder_arch'][0])

        targets = [
            (d['name'],
             int(np.prod(d['3d_pose_shape'])) if d['3d_pose_shape']
             else 0)
            for d in config['datasets']]
    elif 'use_flow' in config:  # VPD schema
        kind = 'vpd'
        arch = config['encoder_arch']
        if 'resnet' not in arch:
            raise SystemExit(
                'only resnet student exports are supported (got {!r}): '
                'the reference effnet layout (efficientnet_pytorch) has '
                'no counterpart here'.format(arch))

        def convert(enc):
            return export_resnet_state_dict(
                enc['params'], enc['batch_stats'], arch)
    else:
        raise SystemExit(
            'config.json matches neither the VIPE nor the VPD schema')

    names = sorted(m.group(1) for f in os.listdir(model_dir)
                   if (m := CKPT_RE.match(f)))
    if not names:
        raise SystemExit(
            'no {name}.encoder.ckpt checkpoints in ' + model_dir)

    os.makedirs(out_dir, exist_ok=True)
    store_json(os.path.join(out_dir, 'config.json'), config)
    loss_file = os.path.join(model_dir, 'loss.json')
    if os.path.exists(loss_file):
        store_json(os.path.join(out_dir, 'loss.json'),
                   load_json(loss_file))

    for name in names:
        enc = ckpt.load_component(model_dir, name, 'encoder', None)
        enc_sd = convert(enc)
        save_torch_state_dict(
            os.path.join(out_dir, '{}.encoder.pt'.format(name)), enc_sd)
        done = ['encoder']

        if kind == 'vipe':
            dec_path = os.path.join(
                model_dir, '{}.decoder-3d.ckpt'.format(name))
            dec_sd = None
            if os.path.exists(dec_path):
                dec = ckpt.load_component(
                    model_dir, name, 'decoder-3d', None)
                dec_sd = export_fcposedecoder_state_dict(
                    dec['params'], targets)
                save_torch_state_dict(
                    os.path.join(out_dir,
                                 '{}.decoder-3d.pt'.format(name)),
                    dec_sd)
                done.append('decoder-3d')
            opt_path = os.path.join(
                model_dir, '{}.optimizer.ckpt'.format(name))
            if os.path.exists(opt_path):
                raw = ckpt.load_component(
                    model_dir, name, 'optimizer', None)
                comp_sds = [
                    (enc_sd,
                     lambda mu: export_fcresnet_state_dict(
                         mu['encoder'], enc['batch_stats'],
                         config['encoder_arch'][0]))]
                if dec_sd is not None:
                    comp_sds.append(
                        (dec_sd,
                         lambda mu: export_fcposedecoder_state_dict(
                             mu['decoder'], targets)))
                _export_vipe_optimizer(
                    raw, comp_sds, config,
                    os.path.join(out_dir,
                                 '{}.optimizer.pt'.format(name)))
                done.append('optimizer')
        print('exported {} ({} {})'.format(name, kind, '+'.join(done)))
    print('exported {} checkpoint(s) -> {}'.format(len(names), out_dir))


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description=__doc__.split('\n')[0])
    parser.add_argument('model_dir',
                        help='vpd-tpu save_dir (config.json + *.ckpt)')
    parser.add_argument('-o', '--out_dir', required=True,
                        help='reference-format model dir '
                             '(config.json + {name}.encoder.pt)')
    main(**vars(parser.parse_args()))
