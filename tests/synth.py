"""Synthetic mocap/pose data generators shared by the tests."""

import numpy as np

from vpd_tpu.data.vipe_sampler import FAMILIES
from vpd_tpu.geometry.camera import random_project_offsets


def random_offsets(spec, rng, scale=0.3):
    """Plausible skeleton offsets: random directions, bounded lengths."""
    dirs = rng.normal(size=(spec.num_edges, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    lengths = rng.uniform(0.1, scale, size=(spec.num_edges, 1))
    return (dirs * lengths).astype(np.float32)


def make_synth_family(family_name, num_seqs=3, num_frames=8, num_cameras=2,
                      seed=0):
    """Build (sequences, poses_3d) shaped like the real loaders' output."""
    family = FAMILIES[family_name]
    rng = np.random.default_rng(seed)

    if family_name == 'amass':
        frame_nums = [i * 25 for i in range(num_frames)]
    elif family_name == '3dpeople':
        frame_nums = [i + 1 for i in range(num_frames)]
    else:
        frame_nums = list(range(num_frames))

    sequences = []
    poses_3d = {}
    for s in range(num_seqs):
        key = ('person{}'.format(s), 'action')
        poses_3d[key] = [
            (np.zeros(3), float(rng.uniform(-180, 180)),
             random_offsets(family.spec, rng))
            for _ in range(num_frames)]
        frames = []
        for i, fnum in enumerate(frame_nums):
            offsets = poses_3d[key][min(
                family.pose3d_index(fnum), num_frames - 1)][-1]
            cams = [
                ('cam{}'.format(c),
                 random_project_offsets(family.spec, offsets, rng))
                for c in range(num_cameras)]
            frames.append((fnum, cams))
        sequences.append((key, frames))
    return sequences, poses_3d


def make_synth_emb_videos(num_videos=3, num_frames=40, emb_dim=16,
                          flip_rows=True, seed=0, score=0.9):
    """Synthetic per-video teacher embeddings in .emb.pkl list form."""
    rng = np.random.default_rng(seed)
    videos = {}
    for v in range(num_videos):
        embs = []
        for f in range(num_frames):
            e = rng.normal(size=(2, emb_dim) if flip_rows else (emb_dim,))
            embs.append((f, e.astype(np.float32),
                         {'kp_score': score, 'is_mean': False}))
        videos['video{}'.format(v)] = embs
    return videos


def stub_torchvision_transforms():
    """torchvision.transforms stub so the reference's vpd_dataset modules
    import (they want torchvision at module scope).

    Only Normalize is ever *called* on the deterministic paths the oracle
    tests exercise; it is implemented with the documented torch semantics
    ((x - mean[:, None, None]) / std). ColorJitter / RandomResizedCrop /
    Compose are constructed but never invoked, so they are inert. Extends
    test_reference_oracle.py's torchvision.models stub when present so
    collection order between the oracle files doesn't matter.
    """
    import sys
    import types

    import torch

    tv = sys.modules.get('torchvision')
    if tv is None:
        tv = types.ModuleType('torchvision')
        sys.modules['torchvision'] = tv
    if 'torchvision.transforms' in sys.modules:
        return
    tr = types.ModuleType('torchvision.transforms')

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean) / self.std

    class _Inert:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):  # pragma: no cover - never reached
            raise NotImplementedError('inert torchvision stub called')

    tr.Normalize = Normalize
    tr.ColorJitter = _Inert
    tr.RandomResizedCrop = _Inert
    tr.Compose = _Inert
    tv.transforms = tr
    sys.modules['torchvision.transforms'] = tr
