"""Tests for the raw mocap loaders (canonicalization + offset encoding)."""

import numpy as np

from vpd_tpu.geometry import amass, human36m, nba2k
from vpd_tpu.geometry.orientation import get_canonical_orientation


def test_canonical_orientation_upright():
    # An upright torso: forward should stay in-plane, no spine interpolation.
    rng = np.random.default_rng(0)
    X = np.array([
        [0., 0., 0.], [0.2, 0., 1.5], [-0.2, 0., 1.5],
        [0.15, 0.02, 0.], [-0.15, 0.02, 0.],
    ]) + rng.normal(scale=1e-3, size=(5, 3))
    fwd = get_canonical_orientation(
        X, np.array([0., 1., 0.]), np.array([0., 0., 1.]))
    assert abs(fwd[2]) < 0.5  # mostly horizontal


def test_human36m_loader_canonical():
    rng = np.random.default_rng(1)
    pose = rng.uniform(-100, 100, size=96)
    hips_raw, theta, offsets = human36m.load_raw_skeleton(pose)
    assert hips_raw.shape == (3,)
    assert np.isfinite(theta)
    assert offsets.shape == (20, 3)

    # The rotation only changes yaw: offset z-components and norms must be
    # preserved relative to the raw (scaled, centered) pose.
    xyz = np.array(pose).reshape(-1, 3) / 100
    xyz = xyz - xyz[0]
    raw_pos = np.stack([xyz[human36m._RAW_IDX[j]]
                        for j in human36m.SPEC.joints])
    raw_offsets = human36m.SPEC.encode_offsets(raw_pos)
    np.testing.assert_allclose(
        np.linalg.norm(offsets, axis=1),
        np.linalg.norm(raw_offsets, axis=1), atol=1e-4)
    np.testing.assert_allclose(offsets[:, 2], raw_offsets[:, 2], atol=1e-4)


def test_nba2k_axis_reorder():
    rng = np.random.default_rng(2)
    pose = rng.uniform(-1, 1, size=(35, 3))
    hips_raw, theta, offsets = nba2k.load_raw_skeleton(pose)
    assert offsets.shape == (24, 3)
    np.testing.assert_allclose(hips_raw, pose[0, [2, 0, 1]])


def test_amass_loader():
    rng = np.random.default_rng(3)
    pose = rng.uniform(-1, 1, size=(52, 3))  # SMPL-H has extra hand joints
    root, theta, offsets = amass.load_raw_skeleton(pose)
    assert offsets.shape == (21, 3)
    assert np.isfinite(theta)
