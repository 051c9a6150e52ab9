"""Canonical (view-independent) orientation of a 3D skeleton.

Parity with reference `vipe_dataset/util.py:57-85`: SVD of the torso point
cloud gives forward/up axes; when the torso pitches past 45° the forward
vector interpolates toward the (sign-corrected) spine axis so lying-down
poses stay well-defined.
"""

import numpy as np

Z_UNIT = np.array([0., 0., 1.])


def get_canonical_orientation(X, torso_forward_vec, spine_up_vec,
                              interp_start=45, interp_range=30):
    X_zm = X - np.mean(X, axis=0).flatten()
    _, _, V = np.linalg.svd(X_zm)
    torso_forward_vec = (-V[2, :] if V[2, :].dot(torso_forward_vec) < 0
                         else V[2, :])
    spine_up_vec = -V[0, :] if V[0, :].dot(spine_up_vec) < 0 else V[0, :]

    torso_pitch = np.degrees(np.arcsin(torso_forward_vec[2]))
    if torso_pitch > interp_start:
        if torso_pitch < interp_start + interp_range:
            theta = (torso_pitch - interp_start) / interp_range
            return theta * -spine_up_vec + (1. - theta) * torso_forward_vec
        return -spine_up_vec
    elif torso_pitch < -interp_start:
        if torso_pitch > -interp_start - interp_range:
            theta = (-torso_pitch - interp_start) / interp_range
            return theta * spine_up_vec + (1. - theta) * torso_forward_vec
        return spine_up_vec
    return torso_forward_vec


def canonicalize(xyz, torso_rows, left_row, right_row, neck_vec):
    """Root-center + yaw-align a raw (N, 3) mocap pose.

    Returns ``(xyz_rotated, theta_degrees)`` where theta is the original yaw.
    ``xyz`` must already be root-centered. Mirrors the shared tail of the
    reference loaders (e.g. `vipe_dataset/human36m.py:176-190`).
    """
    forward_vec = get_canonical_orientation(
        xyz[torso_rows, :],
        np.cross(xyz[left_row, :], xyz[right_row, :]),
        neck_vec)
    forward_vec[2] = 0
    forward_vec /= np.linalg.norm(forward_vec)
    lateral_vec = np.cross(Z_UNIT, forward_vec)

    rot_mat = np.array([lateral_vec, forward_vec, Z_UNIT]).T
    theta = np.degrees(np.arccos(lateral_vec[0]))
    if lateral_vec[1] < 0:
        theta = -theta
    return xyz.dot(rot_mat), theta
