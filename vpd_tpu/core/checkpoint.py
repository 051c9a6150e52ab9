"""Checkpointing with the reference's best/periodic selection semantics.

Role parity with `train_vipe_model.py:171-209` / `train_vpd_model.py:107-112`:
per-component files in a save dir, named ``{name}.{component}.ckpt`` with
name in {'best_epoch', 'epoch%04d'}, plus a ``config.json`` manifest that
the apply scripts rebuild models from. Serialization is flax msgpack of the
host-fetched pytree (single-writer: process 0).
"""

import os
import re

import jax
import numpy as np
from flax import serialization

from .io import _replace_into


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_component(save_dir, name, component, tree):
    """Atomic write: serialize to a temp file in the same directory and
    os.replace into place, so a crash/preemption mid-write can never
    leave a truncated checkpoint where a valid one (e.g. the previous
    best_epoch) used to be — resume and apply always see either the old
    complete file or the new complete file."""
    path = os.path.join(save_dir, '{}.{}.ckpt'.format(name, component))
    data = serialization.to_bytes(_to_host(tree))
    _replace_into(path, lambda fp: fp.write(data), 'wb', fsync=True)
    return path


def load_component(save_dir, name, component, target):
    path = os.path.join(save_dir, '{}.{}.ckpt'.format(name, component))
    with open(path, 'rb') as fp:
        return serialization.from_bytes(target, fp.read())


def save_bundle(save_dir, name, components):
    """Save {component_name: pytree} under one checkpoint name."""
    os.makedirs(save_dir, exist_ok=True)
    for comp, tree in components.items():
        save_component(save_dir, name, comp, tree)


def load_bundle(save_dir, name, targets):
    return {comp: load_component(save_dir, name, comp, target)
            for comp, target in targets.items()}


def last_checkpoint_epoch(save_dir, component='encoder'):
    """Largest epoch N with an epoch%04d.{component}.ckpt present, or -1."""
    last = -1
    # fullmatch: a leftover 'epochNNNN.*.ckpt.tmp' from an interrupted
    # write must not count as a resumable checkpoint
    pattern = re.compile(r'epoch(\d+)\.' + re.escape(component) + r'\.ckpt')
    for fname in os.listdir(save_dir):
        m = pattern.fullmatch(fname)
        if m:
            last = max(last, int(m.group(1)))
    return last


class MovingAvgSelector:
    """Moving-average validation-loss model selection.

    Parity with `get_moving_avg_loss` + best-epoch logic
    (`train_vipe_model.py:228-229,388-423`).
    """

    def __init__(self, window=1):
        self.window = window
        self.history = []
        self.best = float('inf')

    def update(self, val_loss):
        """Record a val loss; returns True if this epoch is a new best."""
        self.history.append(val_loss)
        mv_avg = float(np.mean(self.history[-self.window:]))
        is_best = mv_avg < self.best
        self.best = min(self.best, mv_avg)
        return is_best
