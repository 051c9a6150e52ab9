"""Golden + property tests for the geometry layer.

Golden tables (flip rows, predecessor-edge rows, extremities) are the
hardcoded values from the reference modules (`vipe_dataset/{human36m,
people3d,nba2k,amass}.py`); the specs must *derive* identical values.
"""

import numpy as np
import pytest

from vpd_tpu.geometry import amass, coco, human36m, nba2k, people3d
from vpd_tpu.geometry.features3d import (
    get_3d_features, is_good_3d_neg_sample, normalize_3d_offsets)

SPECS = {
    'human36m': human36m.SPEC,
    '3dpeople': people3d.SPEC,
    'nba2k': nba2k.SPEC,
    'amass': amass.SPEC,
}

# Reference vipe_dataset/{human36m.py:82, people3d.py:121, nba2k.py:105,
# amass.py:81}
GOLDEN_XFLIP = {
    'human36m': [0, 1, 2, 3, 8, 9, 10, 11, 4, 5, 6, 7,
                 16, 17, 18, 19, 12, 13, 14, 15],
    '3dpeople': [0, 1, 2, 3, 4, 5, 7, 6, 12, 13, 14, 15, 8, 9, 10, 11,
                 20, 21, 22, 23, 16, 17, 18, 19],
    'nba2k': [3, 4, 5, 0, 1, 2, 6, 7, 8, 12, 13, 14, 9, 10, 11,
              19, 20, 21, 22, 15, 16, 17, 18, 23],
    'amass': [0, 1, 2, 3, 4, 9, 10, 11, 12, 5, 6, 7, 8,
              17, 18, 19, 20, 13, 14, 15, 16],
}

# Predecessor edge of each edge, transcribed from the reference
# get_skeleton_parent_cossim dot-pair tables.
GOLDEN_PRED = {
    'human36m': [0, 0, 1, 2, 2, 4, 5, 6, 2, 8, 9, 10,
                 0, 12, 13, 14, 0, 16, 17, 18],
    '3dpeople': [0, 0, 1, 2, 3, 4, 4, 4, 3, 8, 9, 10, 3, 12, 13, 14,
                 0, 16, 17, 18, 0, 20, 21, 22],
    'nba2k': [6, 0, 1, 6, 3, 4, 6, 6, 7, 7, 9, 10, 7, 12, 13,
              2, 2, 8, 17, 5, 5, 8, 21, 8],
    'amass': [0, 0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11,
              2, 13, 14, 15, 2, 17, 18, 19],
}

GOLDEN_EXTREMITIES = {
    'human36m': [7, 11, 15, 19],
    '3dpeople': [5, 6, 7, 19, 23],
    'nba2k': list(range(15, 24)),
    'amass': [4, 8, 12],
}


@pytest.mark.parametrize('name', sorted(SPECS))
def test_xflip_rows_match_reference(name):
    assert list(SPECS[name].xflip_rows) == GOLDEN_XFLIP[name]


@pytest.mark.parametrize('name', sorted(SPECS))
def test_pred_edges_match_reference(name):
    assert list(SPECS[name].pred_edge) == GOLDEN_PRED[name]


@pytest.mark.parametrize('name', sorted(SPECS))
def test_extremities_match_reference(name):
    assert list(SPECS[name].extremity_rows) == GOLDEN_EXTREMITIES[name]


@pytest.mark.parametrize('name', sorted(SPECS))
def test_encode_decode_roundtrip(name):
    spec = SPECS[name]
    rng = np.random.default_rng(0)
    offsets = rng.normal(size=(spec.num_edges, 3))

    # decode via the path matrix == sequential accumulation along the tree
    positions = spec.decode_all_positions(offsets)
    seq = np.zeros_like(positions)
    for e in range(spec.num_edges):
        seq[spec.child_idx[e]] = seq[spec.parent_idx[e]] + offsets[e]
    # edges are not topologically sorted in general; iterate to fixpoint
    for _ in range(spec.num_joints):
        for e in range(spec.num_edges):
            seq[spec.child_idx[e]] = seq[spec.parent_idx[e]] + offsets[e]
    np.testing.assert_allclose(positions, seq, atol=1e-12)

    # encode(decode(x)) == x
    np.testing.assert_allclose(
        spec.encode_offsets(positions), offsets, atol=1e-12)


@pytest.mark.parametrize('name', sorted(SPECS))
def test_flip_is_involution(name):
    spec = SPECS[name]
    rng = np.random.default_rng(1)
    offsets = rng.normal(size=(spec.num_edges, 3))
    np.testing.assert_allclose(
        spec.flip_offsets(spec.flip_offsets(offsets)), offsets)


@pytest.mark.parametrize('name', sorted(SPECS))
def test_parent_cossim_root_edge_is_one(name):
    spec = SPECS[name]
    rng = np.random.default_rng(2)
    normed = normalize_3d_offsets(rng.normal(size=(spec.num_edges, 3)))[0]
    cossim = spec.parent_cossim(normed)
    assert cossim.shape == (spec.num_edges,)
    np.testing.assert_allclose(cossim[spec.root_edge], 1.0)
    assert np.all(np.abs(cossim) <= 1 + 1e-9)


@pytest.mark.parametrize('name', sorted(SPECS))
def test_3d_features_shape_and_extremities(name):
    spec = SPECS[name]
    rng = np.random.default_rng(3)
    offsets = rng.normal(size=(spec.num_edges, 3))
    feats = get_3d_features(offsets, spec, include_extremities=False)
    assert feats.shape == (spec.num_edges, 7)
    assert np.all(feats[list(spec.extremity_rows)] == 0)
    feats_in = get_3d_features(offsets, spec, include_extremities=True)
    assert not np.all(feats_in[list(spec.extremity_rows)] == 0)
    # unit offsets occupy the first 3 columns
    np.testing.assert_allclose(
        np.linalg.norm(feats_in[:, :3], axis=1), 1.0, atol=1e-6)


def test_neg_sample_criterion():
    a = np.eye(3)[np.array([0, 0, 0])]  # 3 edges all +x
    assert not is_good_3d_neg_sample(a, a)
    b = a.copy()
    b[2] = [0, 1, 0]  # 90 degrees away
    assert is_good_3d_neg_sample(a, b)
    assert not is_good_3d_neg_sample(a, b, ignore=[2])


def test_coco_projection_shapes():
    for spec in SPECS.values():
        rng = np.random.default_rng(4)
        offsets = rng.normal(size=(spec.num_edges, 3))
        coco_xyz = spec.project_coco(offsets)
        assert coco_xyz.shape == (17, 3)


def test_normalize_2d_reference_semantics():
    rng = np.random.default_rng(5)
    kp = rng.uniform(0, 100, size=(17, 3)).astype(np.float32)
    out = coco.normalize_2d_skeleton(kp, flip=False)
    assert out.shape == (13, 3)

    # hips midpoint maps to 0: rows 11, 12 are hips; after selection they
    # are rows 7, 8 of the 13-point output
    hips_mid = (out[7, :2] + out[8, :2]) / 2
    np.testing.assert_allclose(hips_mid, 0, atol=1e-5)

    # max pairwise torso distance is exactly 0.5
    torso = np.vstack([out[1:3, :2], out[7:9, :2]])  # shoulders + hips
    dists = [np.linalg.norm(torso[i] - torso[j])
             for i in range(4) for j in range(i + 1, 4)]
    np.testing.assert_allclose(max(dists), 0.5, rtol=1e-5)

    # confidences shifted by -0.5
    np.testing.assert_allclose(
        out[0, 2], kp[0, 2] - 0.5, rtol=1e-5)

    # flip negates x of the mirrored points
    out_flip = coco.normalize_2d_skeleton(kp, flip=True)
    np.testing.assert_allclose(out_flip[0, 1], out[0, 1], rtol=1e-5)
    # nose x is negated (index 0 maps to itself)
    np.testing.assert_allclose(out_flip[0, 0], -out[0, 0], rtol=1e-5)

    # bone features appended
    out_bones = coco.normalize_2d_skeleton(
        kp, flip=False, include_bone_features=True)
    assert out_bones.shape == (13 + coco.NUM_COCO_BONES, 3)
    np.testing.assert_allclose(out_bones[:13], out)


def test_normalize_2d_jax_matches_numpy():
    import jax.numpy as jnp  # noqa: F401
    rng = np.random.default_rng(6)
    kps = rng.uniform(0, 100, size=(8, 17, 3)).astype(np.float32)
    flips = np.array([0, 1] * 4, dtype=bool)

    expected = np.stack([
        coco.normalize_2d_skeleton(kps[i], flips[i],
                                   include_bone_features=True)
        for i in range(8)])
    got = np.asarray(coco.normalize_2d_batch(
        kps, flips, include_bone_features=True))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_zero_torso_guard():
    kp = np.zeros((17, 3), dtype=np.float32)
    out = coco.normalize_2d_skeleton(kp, flip=False)
    assert np.all(np.isfinite(out))
