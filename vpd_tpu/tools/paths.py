"""Dataset path configuration (parity: `video_dataset_paths.py`,
`vipe_dataset_paths.py`). Override roots with VPD_SPORTS_DIR /
VPD_VIPE_DATA_DIR environment variables.
"""

import os
from os.path import join

SPORTS_ROOT_DIR = os.environ.get('VPD_SPORTS_DIR', 'data/sports')

FS_ROOT_DIR = join(SPORTS_ROOT_DIR, 'fs')
FS_POSE_DIR = join(FS_ROOT_DIR, 'pose')
FS_VIDEO_DIR = join(FS_ROOT_DIR, 'videos')
FS_CROP_DIR = join(FS_ROOT_DIR, 'crops')

FX_ROOT_DIR = join(SPORTS_ROOT_DIR, 'fx')
FX_POSE_DIR = join(FX_ROOT_DIR, 'pose')
FX_VIDEO_DIR = join(FX_ROOT_DIR, 'videos')
FX_CROP_DIR = join(FX_ROOT_DIR, 'crops')

DIVING48_ROOT_DIR = join(SPORTS_ROOT_DIR, 'diving48')
DIVING48_POSE_DIR = join(DIVING48_ROOT_DIR, 'pose')
DIVING48_VIDEO_DIR = join(DIVING48_ROOT_DIR, 'videos')
DIVING48_CROP_DIR = join(DIVING48_ROOT_DIR, 'crops')

TENNIS_ROOT_DIR = join(SPORTS_ROOT_DIR, 'tennis')
TENNIS_POSE_DIR = join(TENNIS_ROOT_DIR, 'pose')
TENNIS_VIDEO_DIR = join(TENNIS_ROOT_DIR, 'videos')
TENNIS_CROP_DIR = join(TENNIS_ROOT_DIR, 'player-crops')

# Penn Action full frames (the reference hardcodes an absolute machine
# path, `vpd_dataset/single_frame.py:278`; here it is env-overridable)
PENN_FRAME_DIR = os.environ.get(
    'VPD_PENN_FRAME_DIR', join(SPORTS_ROOT_DIR, 'penn-action', 'frames'))

VIPE_DATA_DIR = os.environ.get('VPD_VIPE_DATA_DIR', 'data/vipe')

PEOPLE_3D_3D_POSE_FILE = join(VIPE_DATA_DIR, '3dpeople',
                              'ground_truth_3d_pose.pkl')
PEOPLE_3D_KEYPOINT_DIR = join(VIPE_DATA_DIR, '3dpeople', 'cocopose')

HUMAN36M_3D_POSE_FILE = join(VIPE_DATA_DIR, 'human3.6m',
                             'ground_truth_3d_pose.pkl')
HUMAN36M_KEYPOINT_DIR = join(VIPE_DATA_DIR, 'human3.6m', 'cocopose')

NBA2K_3D_POSE_FILE = join(VIPE_DATA_DIR, 'nba2k', 'ground_truth_3d_pose.pkl')
NBA2K_KEYPOINT_DIR = join(VIPE_DATA_DIR, 'nba2k', 'cocopose')

AMASS_3D_POSE_FILE = join(VIPE_DATA_DIR, 'amass', 'ground_truth_3d_pose.pkl')
AMASS_KEYPOINT_DIR = join(VIPE_DATA_DIR, 'amass', 'cocopose')
