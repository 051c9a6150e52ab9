#!/usr/bin/env python3
"""Convert a model directory trained by THIS framework into the
reference's (PyTorch) checkpoint format, so vpd-tpu-trained VIPE*/VPD
encoders serve directly in jhong93/vpd (`apply_vipe_model.py` /
`apply_vpd_model.py` load `{name}.encoder.pt` next to `config.json`,
whose schema the two frameworks share).

The inverse of `tools/import_torch_model.py`: every
`{name}.encoder.ckpt` converts via `models/torch_compat.py`
export helpers (NHWC->NCHW / (I,O)->(O,I) transposes, `batch_stats`
back into BN running buffers + `num_batches_tracked`). Decoder /
optimizer state is training-only on both sides and is not exported (a
converted dir supports extraction there, not seamless --resume).

VPD state_dicts get the reference's 'resnet.' wrapper prefix
(`models/rgb.py:61`); effnet students cannot round-trip (the reference
builds them with efficientnet_pytorch `from_name`, models/rgb.py:62-66,
whose layout this framework does not mirror).
"""

import argparse
import os
import re

CKPT_RE = re.compile(r'^(best_epoch|epoch\d{4,})\.encoder\.ckpt$')


def main(model_dir, out_dir):
    from ..core import checkpoint as ckpt
    from ..core.io import load_json, store_json
    from ..models.torch_compat import (
        export_fcresnet_state_dict, export_resnet_state_dict,
        save_torch_state_dict)

    config = load_json(os.path.join(model_dir, 'config.json'))
    if 'embedding_dim' in config:  # VIPE schema
        kind = 'vipe'

        def convert(enc):
            return export_fcresnet_state_dict(
                enc['params'], enc['batch_stats'],
                config['encoder_arch'][0])
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
        save_torch_state_dict(
            os.path.join(out_dir, '{}.encoder.pt'.format(name)),
            convert(enc))
        print('exported {} ({} encoder)'.format(name, kind))
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
