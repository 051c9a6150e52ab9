"""END-TO-END detection (temporal localization) protocol differential vs
the ACTUAL reference code.

`test_detect_ap_oracle` / `test_get_proposals_oracle` pin the AP math
and proposal extraction piecewise; this module drives the reference's
whole `run_localization` protocol (`detect.py:291-435`) head-to-head
against `vpd_tpu.tasks.detect.run_localization` over one seeded
synthetic corpus, joining:

  * the trial loop + few-shot split filtering
    (`action_dataset/fs/train.localize.{trial}.txt` -> first n videos),
  * proposal extraction at every activation threshold,
  * min/max proposal-length clamping from the TRAIN interval stats,
  * first-retrieval-only TP matching across tIoU in {0.1..0.9},
  * the PR curve -> interpolated AP per (threshold, tIoU) cell,

into one exact-equality proof. The BiGRU scorer itself trains unseeded
torch on the reference side (trajectory parity is pinned separately by
the classifier oracle), so BOTH sides get the same deterministic
injected scorer: with identical per-frame scores, every downstream AP
table cell must match to float precision. Scores are constructed
globally unique so the sort order (reference iterates an unordered
video set) cannot differ.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = '/root/reference'
if not os.path.isdir(REF):
    pytest.skip('reference tree not available', allow_module_level=True)
pytest.importorskip('torch')

if REF not in sys.path:
    sys.path.append(REF)

if 'dtw' not in sys.modules:  # dtw-python is not installed here
    _dtw_stub = types.ModuleType('dtw')
    _dtw_stub.dtw = None
    sys.modules['dtw'] = _dtw_stub

if 'numba' not in sys.modules:  # numba is not installed here; the
    _numba = types.ModuleType('numba')  # reference jits pure-python fns

    def _passthrough_jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda fn: fn

    _numba.jit = _passthrough_jit
    _numba.njit = _passthrough_jit
    sys.modules['numba'] = _numba

T_FRAMES = 240
N_TRIALS = 2
N_EXAMPLES = 3  # few-shot: first 3 videos of each trial's split file


def _make_corpus(seed=31):
    """Train/test Labels + a (T, 1) embedding per video whose column IS
    the per-frame activity score (the injected scorer just reads it).

    Activity spans score in [0.55, 0.95], background in [0.02, 0.45],
    so the threshold sweep (0.1..0.9) produces proposals of varying
    length; a tiny per-(video, frame) ramp makes every score globally
    unique (kills sort-order ties)."""
    from vpd_tpu.tasks.detect import Label

    rng = np.random.default_rng(seed)
    emb_dict, train_examples, test_examples = {}, [], []

    def spans_for(v):
        spans, cursor = [], int(rng.integers(10, 30))
        while cursor < T_FRAMES - 40:
            length = int(rng.integers(12, 30))
            spans.append((cursor, cursor + length))
            cursor += length + int(rng.integers(25, 50))
        return spans

    def add_video(name, sink):
        spans = spans_for(name)
        scores = rng.uniform(0.02, 0.45, T_FRAMES)
        for s, e in spans:
            scores[s:e] = rng.uniform(0.55, 0.95, e - s)
        scores += np.arange(T_FRAMES) * 1e-7 + len(emb_dict) * 1e-9
        emb_dict[name] = scores.astype(np.float64)[:, None]
        for s, e in spans:
            sink.append(Label(name, 'act', s, e, 25.0))

    for i in range(6):
        add_video('train_v{}'.format(i), train_examples)
    for i in range(4):
        add_video('test_v{}'.format(i), test_examples)
    return emb_dict, train_examples, test_examples


class _InjectedScorer:
    """Stands in for ProposalModel on BOTH sides: deterministic scores
    from the shared emb_dict; records the train split it was given so
    the few-shot filtering can be compared side by side."""

    calls = []  # [(tag, [train video names])]
    tag = None

    def __init__(self, arch_type, emb_dict, train_examples, hidden_dim,
                 ensemble_size=1, **kwargs):
        self._embs = emb_dict
        type(self).calls.append(
            (self.tag, sorted(l.video for l in train_examples)))

    def predict(self, video):
        return self._embs[video][:, 0]


def test_protocol_localization(tmp_path, monkeypatch):
    import detect as ref_detect

    from vpd_tpu.tasks import detect as our_detect

    emb_dict, train_examples, test_examples = _make_corpus()

    # premade localization split files where the reference expects them
    # (CWD-relative 'action_dataset/fs/train.localize.{trial}.txt')
    rng = np.random.default_rng(5)
    split_dir = tmp_path / 'action_dataset' / 'fs'
    os.makedirs(split_dir)
    split_files = []
    for trial in range(N_TRIALS):
        order = [l for l in sorted({x.video for x in train_examples})]
        rng.shuffle(order)
        path = split_dir / 'train.localize.{}.txt'.format(trial)
        path.write_text('\n'.join(order) + '\n')
        split_files.append(str(path))
    monkeypatch.chdir(tmp_path)

    class RefScorer(_InjectedScorer):
        calls = []
        tag = 'ref'

    class OurScorer(_InjectedScorer):
        calls = []
        tag = 'ours'

    monkeypatch.setattr(ref_detect, 'ProposalModel', RefScorer)
    monkeypatch.setattr(our_detect, 'ProposalModel', OurScorer)

    captured = []  # reference AP tables via its tabulate() calls
    monkeypatch.setattr(
        ref_detect, 'tabulate',
        lambda rows, headers=None: captured.append((rows, headers)) or '')

    ref_detect.run_localization(
        'fs', dict(emb_dict), list(train_examples), list(test_examples),
        n_examples=N_EXAMPLES, n_trials=N_TRIALS, algorithm='gru', k=1,
        hidden_dim=16, batch_size=None, out_dir=None)

    def few_shot_videos(trial):
        with open(split_files[trial]) as fp:
            return [ln.strip() for ln in fp if ln.strip()]

    our_tables, thresholds = our_detect.run_localization(
        'fs', dict(emb_dict), list(train_examples), list(test_examples),
        n_trials=N_TRIALS, algorithm='gru', k=1, hidden_dim=16,
        few_shot_videos_fn=few_shot_videos, n_examples=N_EXAMPLES,
        log=lambda *a: None)

    # same few-shot filtering: each trial trained on the same subset
    assert len(RefScorer.calls) == len(OurScorer.calls) == N_TRIALS
    for (_, ref_split), (_, our_split) in zip(RefScorer.calls,
                                              OurScorer.calls):
        assert ref_split == our_split
        assert len(set(v.rsplit('_', 1)[0] for v in ref_split)) == 1

    # the reference printed one table per trial + one mean table
    assert len(captured) == N_TRIALS + 1
    t_ious = our_detect.LOC_TEMPORAL_IOUS
    assert np.allclose(thresholds, np.linspace(0.1, 0.9, 9))

    for trial in range(N_TRIALS):
        rows, headers = captured[trial]
        assert headers[0] == 'tIoU'
        assert [float(h.split('@')[1]) for h in headers[1:]] == \
            [pytest.approx(t) for t in thresholds]
        ours = our_tables[trial]  # (n_thresh, n_tiou)
        assert ours.shape == (len(thresholds), len(t_ious))
        for i, row in enumerate(rows):
            assert row[0] == pytest.approx(t_ious[i])
            np.testing.assert_allclose(
                np.asarray(row[1:], np.float64), ours[:, i],
                rtol=0, atol=1e-12)

    # mean table = mean of our per-trial tables
    mean_rows, _ = captured[-1]
    our_mean = np.mean(np.stack(our_tables), axis=0)
    for i, row in enumerate(mean_rows):
        np.testing.assert_allclose(
            np.asarray(row[1:], np.float64), our_mean[:, i],
            rtol=0, atol=1e-12)

    # the protocol actually discriminated: APs vary across thresholds
    # and degrade with tIoU (sanity that the corpus wasn't trivial)
    table = our_tables[0]
    assert table.max() > 0.5
    assert table[:, -1].max() < table.max()


def test_protocol_localization_full_train(tmp_path, monkeypatch):
    """n_examples=-1 (full train set): no split files involved; exact
    AP-table equality again, and both sides trained on all videos."""
    import detect as ref_detect

    from vpd_tpu.tasks import detect as our_detect

    emb_dict, train_examples, test_examples = _make_corpus(seed=77)

    class RefScorer(_InjectedScorer):
        calls = []
        tag = 'ref'

    class OurScorer(_InjectedScorer):
        calls = []
        tag = 'ours'

    monkeypatch.setattr(ref_detect, 'ProposalModel', RefScorer)
    monkeypatch.setattr(our_detect, 'ProposalModel', OurScorer)
    captured = []
    monkeypatch.setattr(
        ref_detect, 'tabulate',
        lambda rows, headers=None: captured.append((rows, headers)) or '')

    ref_detect.run_localization(
        'fs', dict(emb_dict), list(train_examples), list(test_examples),
        n_examples=-1, n_trials=1, algorithm='gru', k=1,
        hidden_dim=16, batch_size=None, out_dir=None)
    our_tables, _ = our_detect.run_localization(
        'fs', dict(emb_dict), list(train_examples), list(test_examples),
        n_trials=1, algorithm='gru', k=1, hidden_dim=16,
        log=lambda *a: None)

    assert RefScorer.calls[0][1] == OurScorer.calls[0][1]
    assert len(set(RefScorer.calls[0][1])) == 6  # every train video

    rows, _ = captured[0]
    for i, row in enumerate(rows):
        np.testing.assert_allclose(
            np.asarray(row[1:], np.float64), our_tables[0][:, i],
            rtol=0, atol=1e-12)
