"""fx temporal localization: FineGym annotation -> detect CLI end-to-end.

Parity with reference `detect.py:524-571` (load_fx_data: female FX,
event_id=2) and the `else` dispatch at `detect.py:594`.
"""

import functools
import json
import os
import pickle

import numpy as np

from vpd_tpu.tasks.detect import DATA_CONFIGS, run_localization
from vpd_tpu.tools import detect as tools_detect
from vpd_tpu.utils.video import VideoMetadata

FPS = 25.0
FRAMES = 320


def _annotation():
    """Synthetic FineGym-format annotation: video -> event -> segments."""
    ann = {}
    for v in range(4):
        video = 'YTID{:04d}'.format(v)
        ann[video] = {
            'E_0001': {
                'event': 2,  # female FX
                'segments': {
                    'A_{:04d}'.format(s): {
                        'stages': 1,
                        # seconds; two actions per event video
                        'timestamps': [[2.0 + 5 * s, 4.0 + 5 * s]],
                    } for s in range(2)
                },
            },
            # other event id: must be ignored
            'E_0002': {'event': 4, 'segments': {
                'A_9999': {'stages': 1, 'timestamps': [[1.0, 2.0]]}}},
        }
    # one fx event with no segments: skipped with a log line
    ann['YTID9999'] = {'E_0003': {'event': 2, 'segments': None}}
    return ann


def _metadata(ann):
    meta = {}
    for video, events in ann.items():
        for event, ed in events.items():
            if ed['event'] == 2 and ed['segments'] is not None:
                meta['{}_{}'.format(video, event)] = VideoMetadata(
                    FPS, FRAMES, 640, 360)
    return meta


def test_load_fx_labels(monkeypatch, tmp_path):
    ann = _annotation()
    ann_file = tmp_path / 'finegym_annotation.json'
    ann_file.write_text(json.dumps(ann))
    meta = _metadata(ann)
    monkeypatch.setattr(tools_detect, 'load_video_metadata',
                        lambda *a, **k: meta)

    config = DATA_CONFIGS['fx']
    train, test = tools_detect.load_fx_labels(
        config, annotation_file=str(ann_file), log=lambda *a: None)

    labels = train + test
    # 4 videos x 2 segments; the no-segment event and event_id=4 skipped
    assert len(labels) == 8
    assert {l.video for l in labels} == set(meta)
    # 25% of 4 videos held out
    assert len({l.video for l in test}) == 1
    for l in labels:
        assert l.value == 'action'
        assert l.fps == FPS
        # timestamps [2+5s, 4+5s] sec -> frames (window_before/after = 0)
        assert l.start_frame in (int(FPS * 2.0), int(FPS * 7.0))
        assert l.end_frame == l.start_frame + int(FPS * 2.0)


def test_detect_cli_fx_end_to_end(monkeypatch, tmp_path):
    ann = _annotation()
    ann_file = tmp_path / 'finegym_annotation.json'
    ann_file.write_text(json.dumps(ann))
    meta = _metadata(ann)
    monkeypatch.setattr(tools_detect, 'load_video_metadata',
                        lambda *a, **k: meta)
    from vpd_tpu.datasets import finegym
    monkeypatch.setattr(finegym, 'ANNOTATION_FILE', str(ann_file))

    # sparse .emb.pkl per event video with an action signature inside the
    # labeled windows so the proposal model has something to learn
    rng = np.random.default_rng(0)
    dim = 6
    emb_dir = tmp_path / 'embs'
    os.makedirs(emb_dir)
    for video in meta:
        rows = []
        for f in range(FRAMES):
            sec = f / FPS
            vec = rng.normal(0, 0.3, dim)
            if (2.0 <= sec < 4.0) or (7.0 <= sec < 9.0):
                vec += 2.0
            rows.append((f, vec.astype(np.float32), {}))
        with open(emb_dir / (video + '.emb.pkl'), 'wb') as fp:
            pickle.dump(rows, fp)

    # shrink training so the CLI runs in test time; same code path
    monkeypatch.setattr(
        tools_detect, 'run_localization',
        functools.partial(run_localization, samples_per_epoch=64,
                          seq_len=64, num_epochs=2, min_epochs=1,
                          log=lambda *a: None))

    out_dir = tmp_path / 'out'
    tools_detect.main(
        'fx', k=1, out_dir=str(out_dir), emb_dir=str(emb_dir), n_trials=1,
        algorithm='gru', n_examples=-1, tennis_window=None, norm=False,
        hidden_dim=16, batch_size=16)

    ap = np.load(out_dir / 'ap_table.npy')
    assert ap.shape == (9, 9)  # 9 thresholds x 9 tIoUs (non-tennis)
    assert np.isfinite(ap).all()


def test_localization_schedule_matches_reference():
    """ProposalModel's localization epoch overrides are the reference's
    (detect.py:116-117 forces 200/25 over util/proposal.py's 25/10)."""
    import os
    import re

    import pytest

    ref_path = '/root/reference/detect.py'
    if not os.path.isfile(ref_path):
        pytest.skip('reference tree not available')
    with open(ref_path) as fp:
        ref = dict(re.findall(
            r'(MIN_TRAIN_EPOCHS|NUM_TRAIN_EPOCHS) = (\d+)', fp.read()))
    from vpd_tpu.tasks.detect import ProposalModel

    assert ProposalModel.NUM_TRAIN_EPOCHS == int(ref['NUM_TRAIN_EPOCHS'])
    assert ProposalModel.MIN_TRAIN_EPOCHS == int(ref['MIN_TRAIN_EPOCHS'])
