"""VIPE* teacher feature extraction: pose gz-JSON -> per-video .emb.pkl.

Parity with reference `apply_vipe_model.py`: walks a pose dir (flat
`<video>.json.gz` or nested `<video>/coco_keypoints.json.gz`), normalizes
every detection (+ flipped copy), embeds in fixed-size device batches,
mean-pools multiple detections per frame (flip rows stacked), and writes
the interchange pickle.

TPU-first details: 2D normalization runs *on device* via the batched jax
path (`geometry.coco.normalize_2d_batch`) fused into the same jit as the
encoder; batches are padded to a fixed size so the whole video stream
reuses one compiled program.
"""

import os
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core.io import load_gz_json, load_json, store_pickle
from ..geometry.coco import _normalize_2d_one, pose_input_dim
from ..models import FCResNet
from ..train.vipe import VIPEModel

EMBED_BATCH_SIZE = 256


def iter_pose_videos(pose_dir):
    """Yield (video_name, pose_json_path) for flat or nested layouts."""
    for name in sorted(os.listdir(pose_dir)):
        if name.endswith('.json.gz'):
            yield name[:-len('.json.gz')], os.path.join(pose_dir, name)
        else:
            nested = os.path.join(pose_dir, name, 'coco_keypoints.json.gz')
            if os.path.exists(nested):
                yield name, nested


def collect_video_poses(pose_path, min_score=0, augment_flip=True,
                        invert=False):
    """Parse one video's pose JSON into stacked raw arrays."""
    frames, scores, is_flip, poses = [], [], [], []
    for frame_num, pose_data in load_gz_json(pose_path):
        for score, *_rest, kp in pose_data:
            if score < min_score:
                continue
            kp = np.array(kp, dtype=np.float32)
            if invert:
                kp[:, 1] *= -1
            kp_score = float(np.mean(kp[:, 2]))
            for flip in ((False, True) if augment_flip else (False,)):
                frames.append(frame_num)
                scores.append(kp_score)
                is_flip.append(flip)
                poses.append(kp)
    return (np.array(frames), np.array(scores),
            np.array(is_flip), np.stack(poses) if poses else
            np.zeros((0, 17, 3), np.float32))


def load_model_dir(model_dir, model_epoch=None):
    """Rebuild encoder + weights from a save dir's config.json manifest."""
    config = load_json(os.path.join(model_dir, 'config.json'))
    encoder = FCResNet(
        out_dim=config['embedding_dim'],
        num_blocks=config['encoder_arch'][0],
        hidden_dim=config['encoder_arch'][1])
    model = VIPEModel(encoder=encoder, decoder=None)

    name = ('best_epoch' if model_epoch is None
            else 'epoch{:04d}'.format(model_epoch))
    in_dim = pose_input_dim(config['embed_bones'])
    variables = model.init(jax.random.key(0), {
        'pose1': jnp.zeros((1, in_dim)), 'pose2': jnp.zeros((1, in_dim)),
        'pose_neg': jnp.zeros((1, in_dim)),
        'dataset_id': jnp.zeros((1,), jnp.int32)}, train=False)
    enc = ckpt.load_component(
        model_dir, name, 'encoder',
        {'params': variables['params']['encoder'],
         'batch_stats': variables.get('batch_stats', {}).get('encoder', {})})
    params = dict(variables['params'])
    params['encoder'] = enc['params']
    stats = dict(variables.get('batch_stats', {}))
    if enc['batch_stats']:
        stats['encoder'] = enc['batch_stats']
    return model, {'params': params, 'batch_stats': stats}, config


def make_batched_embed(model, variables, embed_bones):
    """One jitted program: raw (B, 17, 3) + flips -> normalize -> embed."""

    @jax.jit
    def fn(kps, flips):
        normed = jax.vmap(
            lambda kp, fl: _normalize_2d_one(kp, fl, False, embed_bones)
        )(kps, flips)
        n = normed.shape[0]
        return model.apply(variables, normed.reshape(n, -1), train=False,
                           method=VIPEModel.embed)

    def embed(kps, flips):
        n = kps.shape[0]
        out = []
        for i in range(0, n, EMBED_BATCH_SIZE):
            chunk = kps[i:i + EMBED_BATCH_SIZE]
            fchunk = flips[i:i + EMBED_BATCH_SIZE]
            pad = EMBED_BATCH_SIZE - chunk.shape[0]
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0), (0, 0)))
                fchunk = np.pad(fchunk, (0, pad))
            embs = np.asarray(fn(chunk, fchunk))
            out.append(embs[:EMBED_BATCH_SIZE - pad if pad else None])
        return np.concatenate(out) if out else np.zeros((0,))

    return embed


def mean_embs_by_frame(pred_embs, flip):
    """Average multi-detection frames; stack (orig, flip) rows.

    Parity with `apply_vipe_model.py:39-68` including the min-score /
    `is_mean` metadata.
    """
    grouped = defaultdict(list)
    for frame_num, emb, meta in pred_embs:
        grouped[frame_num].append((emb, meta))

    def get_mean(emb_and_metas):
        embs, metas = zip(*emb_and_metas)
        if len(embs) == 1:
            return embs[0], metas[0]
        return np.mean(embs, axis=0), {
            'kp_score': min(m['kp_score'] for m in metas), 'is_mean': True}

    result = []
    for frame_num, emb_and_metas in grouped.items():
        if flip:
            emb, meta = get_mean(
                [x for x in emb_and_metas if not x[1]['is_flip']])
            emb_flip, _ = get_mean(
                [x for x in emb_and_metas if x[1]['is_flip']])
            result.append((frame_num, np.stack((emb, emb_flip)), meta))
        else:
            emb, meta = get_mean(emb_and_metas)
            result.append((frame_num, emb, meta))
    result.sort(key=lambda x: x[0])
    return result


def apply_vipe(pose_dir, model_dir, out_dir, model_epoch=None,
               min_score=0, no_flip=False, invert=False,
               allow_many_per_frame=False, log=print):
    from ..core.pipeline import run_pipelined

    model, variables, config = load_model_dir(model_dir, model_epoch)
    embed = make_batched_embed(model, variables, config['embed_bones'])

    os.makedirs(out_dir, exist_ok=True)

    # Pipeline: the gz-JSON parse of video i+1 runs on a worker thread
    # while video i embeds on device and video i-1's pickle writes —
    # same streaming pattern as apply_vpd (host parse is the bottleneck
    # for the MLP teacher).
    def parse(task):
        _, pose_path = task
        return collect_video_poses(
            pose_path, min_score=min_score, augment_flip=not no_flip,
            invert=invert)

    def compute(parsed):
        frames, scores, is_flip, kps = parsed
        if len(frames) == 0:
            return parsed, None
        return parsed, embed(kps, is_flip)

    def collect(task, result):
        video_name, _ = task
        (frames, scores, is_flip, _), embs_arr = result
        if embs_arr is None:
            return
        embs = [
            (int(frames[j]), embs_arr[j],
             {'kp_score': float(scores[j]), 'is_mean': False,
              'is_flip': bool(is_flip[j])})
            for j in range(len(frames))]
        if not allow_many_per_frame:
            embs = mean_embs_by_frame(embs, not no_flip)
        store_pickle(
            os.path.join(out_dir, '{}.emb.pkl'.format(video_name)), embs)
        log('{}: {} rows'.format(video_name, len(embs)))

    run_pipelined(list(iter_pose_videos(pose_dir)), parse, compute, collect)
