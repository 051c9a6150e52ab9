#!/usr/bin/env python3
"""Convert a reference (PyTorch) model directory into this framework's
checkpoint format, so the pre-trained VIPE*/VPD models distributed with
jhong93/vpd (README.md:37-38,102 download links) can be served here
directly by `apply_vipe` / `apply_vpd`.

The reference saves per-component torch state_dicts —
`{name}.encoder.pt` with name in {best_epoch, epochNNNN}
(`train_vipe_model.py:171-183`, `train_vpd_model.py:107-112`) — next to
a `config.json` manifest whose schema this framework shares. This tool
copies the manifest and converts every encoder checkpoint via
`models/torch_compat.py` (NCHW->NHWC / (O,I)->(I,O) transposes, BN
running stats into `batch_stats`); embedding parity of the converted
weights is < 1e-3 cosine (BASELINE.md target; oracle-tested end-to-end
in tests/test_reference_oracle.py, test_import_torch_model_*).

Training state converts too, so `--resume` of a torch run works here
seamlessly: `{name}.decoder-3d.pt` VIPE decoders map onto the padded
multi-head (`train_vipe_model.py:171-183`), `{name}.decoder.pt` VPD
motion heads onto the motion FCNet (`train_vpd_model.py:107-112`), and
`{name}.optimizer.pt` AdamW moments (exp_avg/exp_avg_sq/step, indexed in
`get_model_params` order, `train_vipe_model.py:164-169`) into the optax
AdamW state — each moment transposed exactly like its parameter.
Resume-step parity vs continuing in torch is oracle-tested
(tests/test_reference_oracle.py::test_import_resume_trajectory_oracle).
"""

import argparse
import os
import re

import numpy as np

# {:04d} widens past 9999, so epochs need 4-or-more digits
CKPT_RE = re.compile(r'^(best_epoch|epoch\d{4,})\.encoder\.pt$')


def _motion_fcnet(sd):
    """VPD fcn_time state_dict (plain FCNet Linears) -> motion params."""
    from ..models.torch_compat import _dense
    idx = sorted(int(k.split('.')[1]) for k in sd
                 if k.endswith('.weight'))
    return {'FCNet_0': {
        'Dense_{}'.format(i): {
            'kernel': _dense(sd['layers.{}.weight'.format(j)]),
            'bias': np.asarray(sd['layers.{}.bias'.format(j)])}
        for i, j in enumerate(idx)}}


def _convert_vipe_optimizer(opt_path, comp_sds, config):
    """torch AdamW state -> the optax.adamw state our VIPE trainer saves.

    comp_sds: ordered [(tree_key, state_dict, params_from_sd)] matching
    the reference's `get_model_params` flattening (encoder first, then
    the 3d decoder). Each exp_avg / exp_avg_sq leaf is transformed with
    the SAME converter as its parameter, so the transposed moments stay
    aligned with the transposed weights.
    """
    import jax.numpy as jnp
    import optax
    import torch

    from ..models.torch_compat import torch_param_names

    raw = torch.load(opt_path, map_location='cpu')
    if not (isinstance(raw, dict) and 'param_groups' in raw
            and 'state' in raw and raw['state']
            and all(k in next(iter(raw['state'].values()))
                    for k in ('step', 'exp_avg', 'exp_avg_sq'))):
        print('skipping {}: not a torch AdamW state dict'.format(
            os.path.basename(opt_path)))
        return None
    flat = [i for g in raw['param_groups'] for i in g['params']]
    order = [(key, k) for key, sd, _ in comp_sds
             for k in torch_param_names(sd)]
    if len(flat) != len(order):
        raise SystemExit(
            'optimizer state covers {} params but the checkpoints have '
            '{} — component mismatch'.format(len(flat), len(order)))

    def moments(field):
        tree, pos = {}, 0
        for key, sd, params_from in comp_sds:
            pseudo = dict(sd)  # real buffers; converter output drops them
            for k in torch_param_names(sd):
                # torch materializes AdamW state lazily, only for params
                # that have received a gradient; anything untouched so
                # far resumes with fresh (zero) moments
                ps = raw['state'].get(flat[pos])
                pseudo[k] = (ps[field].numpy() if ps is not None
                             else np.zeros_like(sd[k]))
                pos += 1
            tree[key] = params_from(pseudo)
        return tree

    mu, nu = moments('exp_avg'), moments('exp_avg_sq')
    step = int(next(iter(raw['state'].values()))['step'])
    params = {key: params_from(sd) for key, sd, params_from in comp_sds}
    # mirror train/vipe.py create_state exactly (torch AdamW defaults)
    tx = optax.adamw(config['learning_rate'], b1=0.9, b2=0.999,
                     eps=1e-8, weight_decay=0.01)
    state = tx.init(params)
    return (state[0]._replace(count=jnp.asarray(step, jnp.int32),
                              mu=mu, nu=nu),) + tuple(state[1:])


def main(model_dir, out_dir):
    from ..core import checkpoint as ckpt
    from ..core.io import load_json, store_json
    from ..models.torch_compat import (
        convert_fcposedecoder_state_dict, convert_fcresnet_state_dict,
        convert_resnet_state_dict, load_torch_state_dict)

    config = load_json(os.path.join(model_dir, 'config.json'))
    if 'embedding_dim' in config:  # train_vipe_model.py:330-344 schema
        kind = 'vipe'

        def convert(sd):
            return convert_fcresnet_state_dict(
                sd, config['encoder_arch'][0])

        targets = [
            (d['name'],
             int(np.prod(d['3d_pose_shape'])) if d['3d_pose_shape']
             else 0)
            for d in config['datasets']]
    elif 'use_flow' in config:  # train_vpd_model.py:222-228 schema
        kind = 'vpd'
        arch = config['encoder_arch']
        if 'resnet' not in arch:
            raise SystemExit(
                'only resnet student imports are supported (got {!r}): '
                'the reference effnet students use efficientnet_pytorch '
                'from_name (random init, models/rgb.py:62-66) so there '
                'are no published weights to import'.format(arch))

        def convert(sd):
            return convert_resnet_state_dict(sd, arch)
    else:
        raise SystemExit(
            'config.json matches neither the VIPE nor the VPD schema')

    names = sorted(m.group(1) for f in os.listdir(model_dir)
                   if (m := CKPT_RE.match(f)))
    if not names:
        raise SystemExit('no {name}.encoder.pt checkpoints in ' + model_dir)

    os.makedirs(out_dir, exist_ok=True)
    store_json(os.path.join(out_dir, 'config.json'), config)
    loss_file = os.path.join(model_dir, 'loss.json')
    if os.path.exists(loss_file):  # keeps plot_losses working + resume
        store_json(os.path.join(out_dir, 'loss.json'),
                   load_json(loss_file))

    for name in names:
        enc_sd = load_torch_state_dict(
            os.path.join(model_dir, '{}.encoder.pt'.format(name)))
        params, stats = convert(enc_sd)
        ckpt.save_component(out_dir, name, 'encoder',
                            {'params': params, 'batch_stats': stats})
        done = ['encoder']

        if kind == 'vipe':
            dec_path = os.path.join(
                model_dir, '{}.decoder-3d.pt'.format(name))
            dec_sd = None
            if os.path.exists(dec_path):
                dec_sd = load_torch_state_dict(dec_path)
                dec_params, _ = convert_fcposedecoder_state_dict(
                    dec_sd, targets)
                ckpt.save_component(out_dir, name, 'decoder-3d',
                                    {'params': dec_params,
                                     'batch_stats': {}})
                done.append('decoder-3d')
            opt_path = os.path.join(
                model_dir, '{}.optimizer.pt'.format(name))
            if os.path.exists(opt_path):
                comp_sds = [('encoder', enc_sd,
                             lambda sd: convert(sd)[0])]
                if dec_sd is not None:
                    comp_sds.append(
                        ('decoder', dec_sd,
                         lambda sd: convert_fcposedecoder_state_dict(
                             sd, targets)[0]))
                opt_state = _convert_vipe_optimizer(
                    opt_path, comp_sds, config)
                if opt_state is not None:
                    ckpt.save_component(out_dir, name, 'optimizer',
                                        opt_state)
                    done.append('optimizer')
        elif kind == 'vpd':
            dec_path = os.path.join(
                model_dir, '{}.decoder.pt'.format(name))
            if os.path.exists(dec_path):
                ckpt.save_component(
                    out_dir, name, 'decoder',
                    {'params': _motion_fcnet(
                        load_torch_state_dict(dec_path)),
                     'batch_stats': {}})
                done.append('decoder')
        print('converted {} ({} {})'.format(name, kind, '+'.join(done)))
    print('imported {} checkpoint(s) -> {}'.format(len(names), out_dir))


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description=__doc__.split('\n')[0])
    parser.add_argument('model_dir',
                        help='reference save_dir (config.json + *.pt)')
    parser.add_argument('-o', '--out_dir', required=True,
                        help='converted model dir for apply_vipe/apply_vpd')
    main(**vars(parser.parse_args()))
