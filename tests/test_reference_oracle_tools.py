"""Differential tests vs the reference's preprocessing tools as oracle.

Companion to test_reference_oracle.py (models/datasets/tasks); this file
covers the crop-extraction and pose-preprocessing tool chain by importing
the ACTUAL reference code at /root/reference and asserting head-to-head
equality:

  * `util/video.py:100-141` crop_frame (square/pad/zero-fill semantics)
    vs `vpd_tpu.utils.video.crop_frame`, fuzzed incl. out-of-bounds boxes.
  * `extract_square_crops.py:42-53` DelayBuffer ring protocol.
  * `extract_square_crops.py:56-135` extract_crops END TO END on a real
    mp4: byte-identical PNG trees (crops, .prev{k}, masks), incl. box
    union smoothing, target_fps prev gaps, and the score>0.8 mask filter.
  * `vipe_dataset/{human36m,people3d,nba2k,amass}.py` raw skeleton
    loaders (scale, hip-centering, canonical-yaw SVD, theta, parent
    offsets) vs `vpd_tpu.geometry.*.load_raw_skeleton`.
  * `dummy_2d_features.py:24-55` (2D-VPD baseline teacher) end to end:
    identical `.emb.pkl` payloads for flat and nested pose dirs.
  * `vpd_dataset/single_frame.py:361-403` FrameDataset (the extraction
    input path: /255, Normalize, flow decode, flip + x-flow negation,
    variant stacking) vs `data/augment.py` eval_transform_batch +
    flip_batch on identical PNGs (torchvision.transforms stubbed with
    the documented Normalize semantics; everything else is real
    reference code).
  * `stack_features.py:20-43` end to end: identical stacked `.emb.pkl`
    payloads incl. the dp_score-over-kp_score min-score meta rule.
  * `util/eval.py:5-23` save_confusion_matrix: byte-identical rendered
    PNGs (label ordering, normalization x100, formatting).
  * `recut_fs_video.py` / `recut_finegym_video.py`: segment CSV parsing
    and per-clip frame boundaries (int vs floor/ceil), event filtering,
    .mkv fallback, output naming — ffmpeg cut recorded, not executed.
  * `view_2d_pose.py:22-36` draw_keypoints: identical rendered overlays.
  * `plot_losses.py:20-47` smooth / collect_dataset_losses / best-epoch
    print protocol.
  * `util/video.py` get_metadata / decode_frame on a real mp4, and the
    exact ffmpeg argv built by cut_segment / cut_frames (seek-second
    '{}.{}' ms quirk, codec flags, scale-pad filter) — recorded, not run.
  * `apply_vipe_model.py:73-129` VideoDataset: teacher-extraction input
    assembly (flat/nested discovery, min_score filter, y-inversion,
    flip-row duplication) incl. the normalized pose tensors vs our
    on-device batch normalization.
"""

import os
import sys

import numpy as np
import pytest

REF = '/root/reference'
if not os.path.isdir(REF):
    pytest.skip('reference tree not available', allow_module_level=True)
pytest.importorskip('scipy')
cv2 = pytest.importorskip('cv2')

if REF not in sys.path:
    sys.path.append(REF)  # append: never shadows repo/test modules


# ---------------------------------------------------------------------------
# util/video.py crop_frame
# ---------------------------------------------------------------------------

def test_crop_frame_oracle():
    from util.video import crop_frame as ref_crop_frame

    from vpd_tpu.utils.video import crop_frame

    rng = np.random.default_rng(0)
    fh, fw = 73, 97
    frame = rng.integers(0, 255, (fh, fw, 3), dtype=np.uint8)
    for trial in range(200):
        x1, y1 = rng.integers(-30, fw, 2)
        w = int(rng.integers(1, 60))
        h = int(rng.integers(1, 60))
        x2, y2 = x1 + w, y1 + h
        make_square = bool(rng.integers(0, 2))
        pad_kind = trial % 3
        kwargs = {}
        if pad_kind == 1:
            kwargs['pad_px'] = int(rng.integers(0, 30))
        elif pad_kind == 2:
            kwargs['pad_frac'] = float(rng.uniform(0, 0.4))
        # Fully out-of-frame boxes trip the reference's make_square
        # shape assert (negative slice ends); parity includes raising.
        try:
            ref = ref_crop_frame(int(x1), int(y1), int(x2), int(y2), frame,
                                 make_square=make_square, **kwargs)
        except AssertionError:
            with pytest.raises(AssertionError):
                crop_frame(int(x1), int(y1), int(x2), int(y2), frame,
                           make_square=make_square, **kwargs)
            continue
        ours = crop_frame(int(x1), int(y1), int(x2), int(y2), frame,
                          make_square=make_square, **kwargs)
        np.testing.assert_array_equal(ours, ref)


def test_delay_buffer_oracle():
    import extract_square_crops as ref_tool

    from vpd_tpu.tools.extract_square_crops import DelayBuffer

    rng = np.random.default_rng(1)
    for n in (1, 2, 5):
        ours, ref = DelayBuffer(n), ref_tool.DelayBuffer(n)
        for step in range(40):
            x = int(rng.integers(0, 1000))
            ours.push(x)
            ref.push(x)
            for i in range(2 * n):
                assert ours.get(i) == ref.get(i), (n, step, i)


# ---------------------------------------------------------------------------
# extract_square_crops.py end to end (crops + prev + masks, byte-equal)
# ---------------------------------------------------------------------------

def _write_video(path, frames, fps):
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*'mp4v'),
                         fps, (w, h))
    assert vw.isOpened()
    for f in frames:
        vw.write(f)
    vw.release()


def _dir_bytes(d):
    out = {}
    for name in sorted(os.listdir(d)):
        with open(os.path.join(d, name), 'rb') as fp:
            out[name] = fp.read()
    return out


@pytest.mark.parametrize('target_fps,num_prev', [(None, 1), (5, 2)])
def test_extract_crops_oracle(tmp_path, target_fps, num_prev):
    from extract_square_crops import extract_crops as ref_extract

    from vpd_tpu.core.io import encode_png
    from vpd_tpu.tools.extract_square_crops import extract_crops

    rng = np.random.default_rng(2)
    fh, fw, fps = 72, 96, 10.0
    frames = [rng.integers(0, 255, (fh, fw, 3), dtype=np.uint8)
              for _ in range(16)]
    video = tmp_path / 'vid.mp4'
    _write_video(video, frames, fps)

    # boxes (x, y, w, h) with a gap at frame 7 (resets union smoothing
    # via prev_box=None assignment) and float coords (int() conversion)
    box_dict = {}
    for f in [2, 3, 4, 5, 6, 8, 9, 12]:
        x = float(rng.uniform(-5, fw - 20))
        y = float(rng.uniform(-5, fh - 20))
        box_dict[f] = [x, y, float(rng.uniform(8, 40)),
                       float(rng.uniform(8, 30))]

    # masks: scores straddle the 0.8 filter; the sorted max wins
    mask_dict = {}
    for f in [3, 5]:
        entries = []
        for score in (0.7, 0.85, 0.95):
            mw, mh = int(rng.integers(5, 20)), int(rng.integers(5, 20))
            mx = int(rng.integers(0, fw - mw))
            my = int(rng.integers(0, fh - mh))
            raw = encode_png(rng.integers(0, 2, (mh, mw)).astype(bool))
            entries.append([score, [mx, my, mw, mh], raw])
        mask_dict[f] = entries

    out_ref = tmp_path / 'ref_out'
    out_ours = tmp_path / 'our_out'
    out_ref.mkdir()
    out_ours.mkdir()
    ref_extract(str(video), dict(box_dict),
                {k: [list(e) for e in v] for k, v in mask_dict.items()},
                str(out_ref), 32, target_fps, num_prev, True, False)
    extract_crops(str(video), dict(box_dict),
                  {k: [list(e) for e in v] for k, v in mask_dict.items()},
                  str(out_ours), 32, target_fps, num_prev, True)

    ref_files = _dir_bytes(out_ref)
    our_files = _dir_bytes(out_ours)
    assert set(ref_files) == set(our_files)
    assert any(n.endswith('.mask.png') for n in ref_files)
    assert any('.prev' in n for n in ref_files)
    for name, data in ref_files.items():
        assert our_files[name] == data, name


# ---------------------------------------------------------------------------
# raw 3D skeleton loaders (preprocess_3d_pose's per-frame canonicalizers)
# ---------------------------------------------------------------------------

def _fuzz_poses(n, shape, scale, seed):
    rng = np.random.default_rng(seed)
    return [rng.uniform(-scale, scale, shape) for _ in range(n)]


def _assert_loader_equal(ours, ref):
    """theta + offsets must match head-to-head.

    The roots intentionally differ: every reference loader does
    `hips_raw = xyz[0, :]; xyz -= hips_raw`, so the returned root is a
    view zeroed by the in-place subtraction. Downstream unpacks it as
    `_, rotation, abs_kp_offsets` (vipe_dataset/keypoint.py:118) and
    never reads it; ours keeps the true raw root (QUIRKS.md). The test
    pins the quirk so a reference-behavior change would be noticed.
    """
    root_o, theta_o, off_o = ours
    root_r, theta_r, off_r = ref
    np.testing.assert_array_equal(np.asarray(root_r),
                                  np.zeros_like(np.asarray(root_r)))
    assert not np.allclose(root_o, 0.0)  # ours keeps the real root
    assert abs(float(theta_o) - float(theta_r)) < 1e-4
    np.testing.assert_allclose(np.asarray(off_o), np.asarray(off_r),
                               atol=1e-5)


def test_human36m_raw_loader_oracle():
    from vipe_dataset.human36m import load_human36m_skeleton

    from vpd_tpu.geometry import human36m

    for pose in _fuzz_poses(25, 96, 120.0, 3):
        _assert_loader_equal(human36m.load_raw_skeleton(pose),
                             load_human36m_skeleton(pose, False))


def test_nba2k_raw_loader_oracle():
    from vipe_dataset.nba2k import load_nba2k_skeleton

    from vpd_tpu.geometry import nba2k

    for pose in _fuzz_poses(25, (35, 3), 1.2, 4):
        _assert_loader_equal(nba2k.load_raw_skeleton(pose),
                             load_nba2k_skeleton(pose.copy(), False))


def test_amass_raw_loader_oracle():
    from vipe_dataset.amass import load_amass_skeleton

    from vpd_tpu.geometry import amass

    for pose in _fuzz_poses(25, (22, 3), 1.2, 5):
        _assert_loader_equal(amass.load_raw_skeleton(pose),
                             load_amass_skeleton(pose.copy(), False))


def test_people3d_raw_loader_oracle(tmp_path):
    from vipe_dataset.people3d import load_3dpeople_skeleton

    from vpd_tpu.geometry import people3d

    for i, pose in enumerate(_fuzz_poses(10, (67, 6), 1.5, 6)):
        fpath = tmp_path / '{:04d}.txt'.format(i)
        np.savetxt(fpath, pose)
        _assert_loader_equal(people3d.load_raw_skeleton(str(fpath)),
                             load_3dpeople_skeleton(str(fpath), False))


# ---------------------------------------------------------------------------
# dummy_2d_features.py (2D-VPD baseline teacher) end to end
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('no_flip', [False, True])
@pytest.mark.parametrize('nested', [False, True])
def test_dummy_2d_features_oracle(tmp_path, no_flip, nested):
    pytest.importorskip('torch')  # reference normalize_2d_skeleton wants it
    import dummy_2d_features as ref_tool

    from vpd_tpu.core.io import load_pickle, store_gz_json
    from vpd_tpu.tools.dummy_2d_features import main as our_main

    rng = np.random.default_rng(7)
    pose_dir = tmp_path / 'poses'
    pose_dir.mkdir()
    for v in range(2):
        rows = []
        for f in range(0, 12, 2):
            kp = rng.normal(200, 50, (17, 3))
            kp[:, 2] = rng.uniform(0, 1, 17)
            rows.append([f, [[0, None, None, kp.tolist()]]])
        if nested:
            vdir = pose_dir / 'video{}'.format(v)
            vdir.mkdir()
            store_gz_json(str(vdir / 'coco_keypoints.json.gz'), rows)
        else:
            store_gz_json(str(pose_dir / 'video{}.json.gz'.format(v)),
                          rows)

    out_ref = tmp_path / 'ref_out'
    out_ours = tmp_path / 'our_out'
    ref_tool.main(str(pose_dir), str(out_ref), no_flip)
    our_main(str(pose_dir), str(out_ours), no_flip)

    names = sorted(os.listdir(out_ref))
    assert names == sorted(os.listdir(out_ours))
    assert names == ['video0.emb.pkl', 'video1.emb.pkl']
    for name in names:
        ref_embs = load_pickle(str(out_ref / name))
        our_embs = load_pickle(str(out_ours / name))
        assert len(ref_embs) == len(our_embs) == 6
        for (f1, e1, m1), (f2, e2, m2) in zip(ref_embs, our_embs):
            assert f1 == f2
            np.testing.assert_allclose(e2, e1, atol=1e-6)
            assert m1.keys() == m2.keys()
            assert m1['is_2d'] == m2['is_2d']
            assert abs(m1['kp_score'] - m2['kp_score']) < 1e-6


# ---------------------------------------------------------------------------
# vpd_dataset/single_frame.py FrameDataset (extraction input assembly)
# ---------------------------------------------------------------------------

from synth import stub_torchvision_transforms as _stub_torchvision_transforms  # noqa: E402


@pytest.mark.parametrize('use_flow', [False, True])
@pytest.mark.parametrize('flip', [False, True])
def test_frame_dataset_oracle(tmp_path, use_flow, flip):
    pytest.importorskip('torch')
    pytest.importorskip('sklearn')
    _stub_torchvision_transforms()
    from vpd_dataset.common import RGB_MEAN_STD as REF_MEAN_STD
    from vpd_dataset.single_frame import FrameDataset

    import jax.numpy as jnp
    from vpd_tpu.data.augment import (RGB_MEAN_STD, eval_transform_batch,
                                      flip_batch)

    rng = np.random.default_rng(11)
    dim = 32
    rgb = rng.integers(0, 255, (dim, dim, 3), dtype=np.uint8)
    prefix = str(tmp_path / 'v0_000123')
    cv2.imwrite(prefix + '.png', cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    flow = None
    if use_flow:
        flow = rng.integers(0, 255, (dim, dim, 3), dtype=np.uint8)
        cv2.imwrite(prefix + '.flow.png',
                    flow)  # cv2 BGR write/read round-trips channels 0/1

    ds = FrameDataset(
        [('v0', 123, prefix)], dim, REF_MEAN_STD['tennis'],
        augment_jitter=0, augment_flip=flip,
        flow_img_name='flow' if use_flow else None)
    item = ds[0]
    assert item['video'] == 'v0' and item['frame'] == 123
    ref = item['img'].numpy()  # (k, C, H, W)

    mean, std = RGB_MEAN_STD['tennis']
    # cv2 round-trips the flow PNG: imread returns BGR of what imwrite
    # got, and the reference reads its own layout back, so feed the raw
    # array's first two channels the way _load_flow sees them.
    flow_in = (cv2.imread(prefix + '.flow.png')[None] if use_flow
               else None)
    x = eval_transform_batch(
        jnp.asarray(rgb[None]), mean, std,
        flow_u8=jnp.asarray(flow_in) if use_flow else None)
    variants = [x]
    if flip:
        variants.append(flip_batch(x, use_flow))
    ours = np.concatenate([np.asarray(v) for v in variants], axis=0)
    ours = ours.transpose(0, 3, 1, 2)  # NHWC -> reference's NCHW

    assert ref.shape == ours.shape == (
        (2 if flip else 1), (5 if use_flow else 3), dim, dim)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# stack_features.py end to end
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('two_dim', [False, True])
def test_stack_features_oracle(tmp_path, two_dim):
    pytest.importorskip('torch')
    pytest.importorskip('sklearn')
    _stub_torchvision_transforms()
    import stack_features as ref_tool

    from vpd_tpu.core.io import load_pickle, store_pickle
    from vpd_tpu.tools.stack_features import main as our_main

    rng = np.random.default_rng(13)
    d1, d2 = tmp_path / 'd1', tmp_path / 'd2'
    d1.mkdir()
    d2.mkdir()
    shape1 = (3, 8) if two_dim else (8,)
    shape2 = (3, 4) if two_dim else (4,)
    for v in range(2):
        rows1, rows2 = [], []
        for i, f in enumerate(range(0, 9, 3)):
            # metas exercise the dp_score > kp_score > default rule
            meta1 = ({'dp_score': 0.9, 'kp_score': 0.2} if i == 0 else
                     {'kp_score': 0.6} if i == 1 else {})
            meta2 = {'kp_score': 0.4} if i != 2 else {}
            rows1.append((f, rng.normal(size=shape1).astype(np.float32),
                          dict(meta1)))
            rows2.append((f, rng.normal(size=shape2).astype(np.float32),
                          dict(meta2)))
        store_pickle(str(d1 / 'video{}.emb.pkl'.format(v)), rows1)
        store_pickle(str(d2 / 'video{}.emb.pkl'.format(v)), rows2)

    out_ref, out_ours = tmp_path / 'oref', tmp_path / 'oours'
    ref_tool.main(str(d1), str(d2), str(out_ref))
    our_main(str(d1), str(d2), str(out_ours))

    names = sorted(os.listdir(out_ref))
    assert names == sorted(os.listdir(out_ours))
    assert len(names) == 2
    for name in names:
        for (f1, e1, m1), (f2, e2, m2) in zip(
                load_pickle(str(out_ref / name)),
                load_pickle(str(out_ours / name))):
            assert f1 == f2
            assert e1.shape == ((3, 12) if two_dim else (12,))
            np.testing.assert_array_equal(e2, e1)
            assert m1 == m2


# ---------------------------------------------------------------------------
# util/eval.py save_confusion_matrix
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('norm', [None, 'true'])
def test_save_confusion_matrix_oracle(tmp_path, norm):
    mpl = pytest.importorskip('matplotlib')
    mpl.use('Agg')
    pytest.importorskip('sklearn')
    from util.eval import save_confusion_matrix as ref_save

    from vpd_tpu.tasks.eval import save_confusion_matrix

    rng = np.random.default_rng(17)
    classes = ['serve', 'volley', 'lob', 'smash']
    truth = [classes[i] for i in rng.integers(0, 4, 60)]
    pred = [classes[i] for i in rng.integers(0, 4, 60)]
    # PNG (not PDF): matplotlib PDFs embed a creation timestamp
    ref_png = tmp_path / 'ref.png'
    our_png = tmp_path / 'ours.png'
    ref_save(truth, pred, str(ref_png), norm=norm)
    save_confusion_matrix(truth, pred, str(our_png), norm=norm)
    assert our_png.read_bytes() == ref_png.read_bytes()


# ---------------------------------------------------------------------------
# recut tools: segment parsing + frame-boundary computation
# ---------------------------------------------------------------------------

def test_recut_fs_oracle(tmp_path, monkeypatch):
    import recut_fs_video as ref_tool

    from vpd_tpu.tools import recut_fs_video as our_tool

    # parse_duration + load_segments on a synthetic segments.csv
    csv_file = tmp_path / 'segments.csv'
    csv_file.write_text(
        'video,start,end\n'
        'v_a,00:01:30,00:04:05\n'
        'v_a,01:00:00,01:02:59\n'
        'v_b,00:00:07,00:00:31\n')
    ref_segs = ref_tool.load_segments(str(csv_file))
    our_segs = our_tool.load_segments(str(csv_file))
    assert dict(ref_segs) == dict(our_segs)
    assert ref_segs['v_a'] == [(90, 245), (3600, 3779)]

    # recut_single frame boundaries + output naming on a real mp4,
    # with the ffmpeg cut recorded instead of executed
    rng = np.random.default_rng(19)
    video = tmp_path / 'match01.mp4'
    _write_video(video, [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
                         for _ in range(50)], 12.0)
    ref_cuts, our_cuts = [], []

    def record(sink):
        def fake_cut(video_file, meta, out_file, start, end):
            sink.append((os.path.basename(out_file), start, end,
                         round(meta.fps, 4)))
        return fake_cut

    monkeypatch.setattr(ref_tool, 'cut_segment', record(ref_cuts))
    monkeypatch.setattr(our_tool, 'cut_segment', record(our_cuts))
    segs = [(2, 3), (0, 1)]
    ref_tool.recut_single(str(video), segs, str(tmp_path))
    our_tool.recut_single(str(video), segs, str(tmp_path))
    assert ref_cuts == our_cuts
    assert len(ref_cuts) == 2 and ref_cuts[0][1] == 24  # int(2 * 12fps)


def test_recut_finegym_oracle(tmp_path, monkeypatch):
    import recut_finegym_video as ref_tool

    from vpd_tpu.core.io import store_json
    from vpd_tpu.tools import recut_finegym_video as our_tool

    assert ref_tool.EVENT_TYPES == our_tool.EVENT_TYPES

    rng = np.random.default_rng(23)
    frames = [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
              for _ in range(60)]
    _write_video(tmp_path / 'vidA.mp4', frames, 10.0)
    _write_video(tmp_path / 'vidB.mkv', frames, 10.0)  # .mkv fallback

    ann = {
        'vidA': {
            'E_001': {'event': 2, 'timestamps': [[0.54, 2.21]]},
            'E_002': {'event': 3, 'timestamps': [[1.0, 2.0]]},  # filtered
        },
        'vidB': {
            'E_003': {'event': 2, 'timestamps': [[0.0, 4.99]]},
        },
    }
    ann_file = tmp_path / 'ann.json'
    store_json(str(ann_file), ann)
    monkeypatch.setattr(ref_tool, 'ANNOTATION_FILE', str(ann_file))
    monkeypatch.setattr(our_tool, 'ANNOTATION_FILE', str(ann_file))

    ref_cuts, our_cuts = [], []

    def record(sink):
        def fake_cut(video_file, meta, out_file, start, end):
            sink.append((os.path.basename(video_file),
                         os.path.basename(out_file), start, end))
        return fake_cut

    monkeypatch.setattr(ref_tool, 'cut_segment', record(ref_cuts))
    monkeypatch.setattr(our_tool, 'cut_segment', record(our_cuts))
    ref_tool.main(str(tmp_path), 'female_FX', str(tmp_path / 'ref_out'))
    our_tool.main(str(tmp_path), 'female_FX', str(tmp_path / 'our_out'))
    assert ref_cuts == our_cuts
    # floor/ceil frame boundaries at 10 fps
    assert ('vidA.mp4', 'vidA_E_001.mp4', 5, 23) in ref_cuts
    assert ('vidB.mkv', 'vidB_E_003.mp4', 0, 50) in ref_cuts
    assert not any(n == 'vidA_E_002.mp4' for _, n, _s, _e in ref_cuts)


# ---------------------------------------------------------------------------
# view_2d_pose.py draw_keypoints + plot_losses.py helpers
# ---------------------------------------------------------------------------

def test_draw_keypoints_oracle():
    from PIL import Image
    import view_2d_pose as ref_tool

    from vpd_tpu.tools import view_2d_pose as our_tool

    assert tuple(ref_tool.coco_bones) == tuple(our_tool.COCO_BONES)
    rng = np.random.default_rng(29)
    base = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    poses = []
    for _ in range(2):
        kp = rng.uniform(0, 80, (17, 3)).tolist()
        poses.append([0.9, None, kp])  # (score, meta, keypoints) rows

    im_ref = Image.fromarray(base.copy())
    ref_tool.draw_keypoints(im_ref, poses)
    im_ours = Image.fromarray(base.copy())
    our_tool.draw_keypoints(im_ours, poses)
    np.testing.assert_array_equal(np.array(im_ours), np.array(im_ref))


def test_plot_losses_helpers_oracle(tmp_path, capsys):
    mpl = pytest.importorskip('matplotlib')
    mpl.use('Agg')
    import plot_losses as ref_tool

    from vpd_tpu.core.io import store_json
    from vpd_tpu.tools import plot_losses as our_tool

    rng = np.random.default_rng(31)
    xs = rng.normal(5, 1, 40).tolist()
    for w in (1, 3, 5, 9):
        np.testing.assert_allclose(our_tool.smooth(xs, w),
                                   ref_tool.smooth(xs, w), rtol=1e-12)

    losses = []
    for e in range(12):
        losses.append({
            'epoch': e, 'train': float(rng.uniform(1, 3)),
            'val': float(rng.uniform(1, 3)),
            'dataset_train': [['h36m', float(rng.uniform(1, 3))],
                              ['amass', float(rng.uniform(1, 3))]],
            'dataset_val': [['h36m', float(rng.uniform(1, 3))]],
        })
    ref_c = ref_tool.collect_dataset_losses(losses, 'dataset_train')
    our_c = our_tool.collect_dataset_losses(losses, 'dataset_train')
    assert dict(ref_c) == dict(our_c)

    # best-epoch selection protocol: identical printed verdicts on the
    # same loss.json (drive only ours end to end; the reference main
    # ends in an interactive plt.show timer loop)
    store_json(str(tmp_path / 'loss.json'), losses)
    our_tool.main(str(tmp_path), None, str(tmp_path / 'out.png'))
    out = capsys.readouterr().out
    best = min(losses, key=lambda l: l['val'])
    assert 'Best epoch: {}'.format(best['epoch']) in out
    assert 'Best val loss: {}'.format(best['val']) in out
    assert (tmp_path / 'out.png').stat().st_size > 0


# ---------------------------------------------------------------------------
# util/video.py: metadata probe + ffmpeg command construction
# ---------------------------------------------------------------------------

def test_video_metadata_and_ffmpeg_cmd_oracle(tmp_path, monkeypatch):
    import util.video as ref_video

    from vpd_tpu.utils import video as our_video

    rng = np.random.default_rng(37)
    video = tmp_path / 'clip.mp4'
    _write_video(video, [rng.integers(0, 255, (36, 52, 3), dtype=np.uint8)
                         for _ in range(21)], 13.0)

    ref_meta = ref_video.get_metadata(str(video))
    our_meta = our_video.get_metadata(str(video))
    assert (our_meta.fps, our_meta.num_frames, our_meta.width,
            our_meta.height) == (ref_meta.fps, ref_meta.num_frames,
                                 ref_meta.width, ref_meta.height)

    frame_ref = ref_video.decode_frame(str(video), 7)
    frame_ours = our_video.decode_frame(str(video), 7)
    np.testing.assert_array_equal(frame_ours, frame_ref)

    # ffmpeg argv parity (seek-second formatting incl. the '{}.{}' ms
    # quirk, codec flags, scale/pad filter) — commands recorded, not run
    ref_cmds, our_cmds = [], []
    monkeypatch.setattr(ref_video, 'check_call',
                        lambda cmd: ref_cmds.append(list(cmd)))
    monkeypatch.setattr(our_video, 'check_call',
                        lambda cmd: our_cmds.append(list(cmd)))
    for start, end in [(0, 10), (7, 21), (13, 14)]:
        ref_video.cut_segment(str(video), ref_meta, str(tmp_path / 'o.mp4'),
                              start, end)
        our_video.cut_segment(str(video), our_meta, str(tmp_path / 'o.mp4'),
                              start, end, log=lambda *_: None)
    d_ref = tmp_path / 'fr_ref'
    d_our = tmp_path / 'fr_our'
    ref_video.cut_frames(str(video), ref_meta, str(d_ref), 3, 17)
    our_video.cut_frames(str(video), our_meta, str(d_our), 3, 17,
                         log=lambda *_: None)
    norm = [[a.replace(str(d_ref), '<out>') for a in cmd]
            for cmd in ref_cmds]
    ours_norm = [[a.replace(str(d_our), '<out>') for a in cmd]
                 for cmd in our_cmds]
    assert ours_norm == norm


def _stub_torchvision_models_minimal():
    """models.module imports torchvision.models block classes at module
    scope; PoseDataset never instantiates them, so name-only stubs
    suffice. No-op when test_reference_oracle.py's full factory stub is
    already installed (any multi-file pytest run: that stub installs at
    module import, before tests execute)."""
    import types

    tv = sys.modules['torchvision']
    if getattr(tv, 'models', None) is not None:
        return

    class _AnyAttr(types.ModuleType):
        def __getattr__(self, name):  # ENCODER_ARCH factory refs
            return None

    tvm = _AnyAttr('torchvision.models')
    tvr = types.ModuleType('torchvision.models.resnet')
    tvr.BasicBlock = tvr.Bottleneck = tvr.conv1x1 = None
    tvm.resnet = tvr
    tv.models = tvm
    sys.modules['torchvision.models'] = tvm
    sys.modules['torchvision.models.resnet'] = tvr


# ---------------------------------------------------------------------------
# apply_vipe_model.py PoseDataset (teacher-extraction input assembly)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('flip,invert,bones', [
    (True, False, False), (False, True, True)])
def test_apply_vipe_pose_dataset_oracle(tmp_path, flip, invert, bones):
    """`apply_vipe_model.py:73-129` PoseDataset vs our
    collect_video_poses + on-device normalization: flat/nested pose-dir
    discovery, min_score filter, y-inversion, per-row flip duplication,
    and the normalized pose tensors themselves."""
    torch = pytest.importorskip('torch')
    _stub_torchvision_transforms()
    _stub_torchvision_models_minimal()
    import apply_vipe_model as ref_tool

    import jax.numpy as jnp
    from vpd_tpu.core.io import store_gz_json
    from vpd_tpu.geometry.coco import normalize_2d_skeleton_batch
    from vpd_tpu.infer.apply_vipe import (collect_video_poses,
                                          iter_pose_videos)

    rng = np.random.default_rng(41)
    pose_dir = tmp_path / 'poses'
    pose_dir.mkdir()

    def rows():
        out = []
        for f in range(0, 8, 2):
            dets = []
            for score in (0.3, 0.7, 0.95):  # straddles min_score=0.5
                kp = rng.normal(250, 60, (17, 3))
                kp[:, 2] = rng.uniform(0.2, 1, 17)
                dets.append([score, None, kp.tolist()])
            out.append([f, dets])
        return out

    store_gz_json(str(pose_dir / 'flatvid.json.gz'), rows())
    nested = pose_dir / 'nestvid'
    nested.mkdir()
    store_gz_json(str(nested / 'coco_keypoints.json.gz'), rows())

    ds = ref_tool.VideoDataset(str(pose_dir), bones, 0.5, flip, invert)
    ours = {name: collect_video_poses(
        path, min_score=0.5, augment_flip=flip, invert=invert)
        for name, path in iter_pose_videos(str(pose_dir))}
    assert sorted(ours) == sorted(ds.videos[i][0] for i in range(len(ds)))

    for i in range(len(ds)):
        item = ds[i]
        frames, scores, is_flip, kps = ours[item['video']]
        np.testing.assert_array_equal(frames, item['frame'])
        np.testing.assert_allclose(scores, item['score'], rtol=1e-6)
        np.testing.assert_array_equal(is_flip, item['is_flip'])
        normed = np.asarray(normalize_2d_skeleton_batch(
            jnp.asarray(kps), jnp.asarray(is_flip),
            include_bone_features=bones))
        np.testing.assert_allclose(normed, item['pose'].numpy(),
                                   rtol=2e-4, atol=2e-5)
