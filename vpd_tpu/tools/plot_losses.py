#!/usr/bin/env python3
"""Plot loss.json training curves (parity: `plot_losses.py`)."""

import argparse
import os
from collections import defaultdict

import numpy as np

from ..core.io import load_json


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('model_dir')
    parser.add_argument('-e', '--max_epoch', type=int)
    parser.add_argument('-o', '--out_file', type=str,
                        help='Save plot instead of showing it')
    parser.add_argument('-p', '--pause', type=int, default=60,
                        help='minutes an interactive window stays open '
                             '(reference plot_losses.py:15,66; only '
                             'used with a display and no --out_file)')
    return parser.parse_args()


def collect_dataset_losses(losses, key):
    datasets = defaultdict(list)
    for l in losses:
        if key in l:
            for d, v in l[key]:
                datasets[d].append((l['epoch'], v))
    return datasets


def smooth(x, window):
    return [float(np.mean(x[max(i - window, 0): i + 1 + window]))
            for i in range(len(x))]


def main(model_dir, max_epoch, out_file, pause=60):
    import matplotlib
    interactive = out_file is None and bool(os.environ.get('DISPLAY'))
    if not interactive:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    losses = load_json(os.path.join(model_dir, 'loss.json'))

    best_val_loss = float('inf')
    best_epoch = None
    for l in losses:
        if l['val'] < best_val_loss:
            best_epoch, best_val_loss = l['epoch'], l['val']
    print('Best epoch:', best_epoch)
    print('Best val loss:', best_val_loss)

    print()
    for i in range(3, 11, 2):  # reference plot_losses.py:50-52
        print('Val loss (smooth: {}):'.format(i),
              min(smooth([l['val'] for l in losses], i)))

    dataset_train = collect_dataset_losses(losses, 'dataset_train')
    dataset_val = collect_dataset_losses(losses, 'dataset_val')
    has_subplots = max(len(dataset_train), len(dataset_val)) > 1

    if has_subplots:
        fig, (main_ax, sub_ax) = plt.subplots(
            2, 1, sharex=True, figsize=(7, 8))
    else:
        fig = plt.figure(figsize=(7, 4))
        main_ax, sub_ax = plt.gca(), None

    epochs, val_losses, train_losses = zip(
        *[(l['epoch'], l['val'], l['train']) for l in losses
          if max_epoch is None or l['epoch'] <= max_epoch])
    main_ax.plot(epochs, train_losses, label='train', lw=1, alpha=0.5)
    main_ax.plot(epochs, val_losses, label='val', lw=1, alpha=0.5)
    main_ax.plot(epochs, smooth(train_losses, 3),
                 label='train (smooth +/-3)', lw=2, linestyle=':')
    main_ax.plot(epochs, smooth(val_losses, 3),
                 label='val (smooth +/-3)', lw=2, linestyle=':')
    main_ax.set_title('Losses: {}'.format(model_dir))
    main_ax.legend(loc='upper right')
    main_ax.set_xlabel('epoch')
    main_ax.set_ylabel('avg_loss')

    if sub_ax is not None:
        for name, vals in sorted(dataset_train.items()):
            x, y = zip(*vals)
            sub_ax.plot(x, y, linestyle=':', label='train ({})'.format(name))
        for name, vals in sorted(dataset_val.items()):
            x, y = zip(*vals)
            sub_ax.plot(x, y, label='val ({})'.format(name))
        sub_ax.set_title('Loss breakdown by dataset')
        sub_ax.legend(loc='upper right')

    plt.tight_layout()
    if interactive:
        # window auto-closes after `pause` minutes (reference :66-67)
        timer = fig.canvas.new_timer(interval=60000 * pause)
        timer.add_callback(plt.close)
        timer.start()
        plt.show()
    else:
        out_file = out_file or os.path.join(model_dir, 'losses.pdf')
        plt.savefig(out_file)
        print('Saved:', out_file)


if __name__ == '__main__':
    main(**vars(get_args()))
