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

Decoder / optimizer .pt files are training state and are not needed to
apply a model; they are skipped (a converted dir supports extraction
and fine-tune-from-init, not seamless --resume of the torch run).
"""

import argparse
import os
import re

# {:04d} widens past 9999, so epochs need 4-or-more digits
CKPT_RE = re.compile(r'^(best_epoch|epoch\d{4,})\.encoder\.pt$')


def main(model_dir, out_dir):
    from ..core import checkpoint as ckpt
    from ..core.io import load_json, store_json
    from ..models.torch_compat import (
        convert_fcresnet_state_dict, convert_resnet_state_dict,
        load_torch_state_dict)

    config = load_json(os.path.join(model_dir, 'config.json'))
    if 'embedding_dim' in config:  # train_vipe_model.py:330-344 schema
        kind = 'vipe'

        def convert(sd):
            return convert_fcresnet_state_dict(
                sd, config['encoder_arch'][0])
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
    if os.path.exists(loss_file):  # keeps plot_losses working
        store_json(os.path.join(out_dir, 'loss.json'),
                   load_json(loss_file))

    for name in names:
        sd = load_torch_state_dict(
            os.path.join(model_dir, '{}.encoder.pt'.format(name)))
        params, stats = convert(sd)
        ckpt.save_component(out_dir, name, 'encoder',
                            {'params': params, 'batch_stats': stats})
        print('converted {} ({} encoder)'.format(name, kind))
    print('imported {} checkpoint(s) -> {}'.format(len(names), out_dir))


if __name__ == '__main__':
    parser = argparse.ArgumentParser(
        description=__doc__.split('\n')[0])
    parser.add_argument('model_dir',
                        help='reference save_dir (config.json + *.pt)')
    parser.add_argument('-o', '--out_dir', required=True,
                        help='converted model dir for apply_vipe/apply_vpd')
    main(**vars(parser.parse_args()))
