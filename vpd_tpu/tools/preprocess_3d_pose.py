#!/usr/bin/env python3
"""Mocap -> canonical (root, theta, offsets) pickle.

CLI parity with reference `preprocess_3d_pose.py`: walks each dataset's raw
layout and re-encodes every frame with the family's raw loader.
"""

import argparse
import os

import numpy as np

from ..core.io import load_pickle, store_pickle
from ..geometry import amass, human36m, nba2k, people3d

DATASETS = ['3dpeople', 'human36m', 'nba2k', 'amass']


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('data_dir')
    parser.add_argument('dataset', choices=DATASETS)
    parser.add_argument('-o', '--out_file', type=str)
    return parser.parse_args()


def process_3dpeople(data_dir):
    result = {}
    for person in sorted(os.listdir(data_dir)):
        person_dir = os.path.join(data_dir, person)
        for action in sorted(os.listdir(person_dir)):
            action_cam_dir = os.path.join(person_dir, action, 'camera01')
            frames = os.listdir(action_cam_dir)
            frame_pose3d = [None] * len(frames)
            for frame in frames:
                frame_no = int(os.path.splitext(frame)[0])
                frame_pose3d[frame_no - 1] = people3d.load_raw_skeleton(
                    os.path.join(action_cam_dir, frame))
            result[(person, action)] = frame_pose3d
    return result


def process_human36m(data_dir):
    import cdflib  # optional dep; only needed for this dataset

    result = {}
    for person in os.listdir(data_dir):
        pose_dir = os.path.join(data_dir, person, 'MyPoseFeatures',
                                'D3_Positions')
        for action_file in os.listdir(pose_dir):
            action = os.path.splitext(action_file)[0]
            cdf_data = cdflib.CDF(os.path.join(pose_dir, action_file))
            raw_poses = cdf_data.varget('Pose').squeeze()
            cdf_data.close()
            result[(person, action)] = [
                human36m.load_raw_skeleton(raw_poses[j, :])
                for j in range(raw_poses.shape[0])]
    return result


def process_nba2k(data_dir):
    result = {}
    for person in os.listdir(data_dir):
        pose_data = load_pickle(os.path.join(
            data_dir, person, 'release_{}_2ku.pkl'.format(person)))
        frames = sorted(os.listdir(
            os.path.join(data_dir, person, 'images', '2ku')))
        j3d = pose_data['j3d']
        assert len(frames) == len(j3d)
        result[(person,)] = [nba2k.load_raw_skeleton(j) for j in j3d]
    return result


def process_amass(data_dir):
    result = {}
    for seq in sorted(os.listdir(data_dir)):
        pose_file = os.path.join(data_dir, seq, 'pose.npy')
        if not os.path.isfile(pose_file):
            continue
        pose_arr = np.load(pose_file)
        frames = sorted({
            f.split('_')[0] for f in os.listdir(os.path.join(data_dir, seq))
            if f.endswith(('jpg', 'png'))})
        assert len(frames) == pose_arr.shape[0], seq
        dataset, action = seq.split('_', 1)
        result[(dataset, action)] = [
            amass.load_raw_skeleton(pose_arr[j]) for j in
            range(pose_arr.shape[0])]
    return result


PROCESSORS = {
    '3dpeople': process_3dpeople,
    'human36m': process_human36m,
    'nba2k': process_nba2k,
    'amass': process_amass,
}


def main(data_dir, dataset, out_file):
    pose3d = PROCESSORS[dataset](data_dir)
    if out_file is not None:
        store_pickle(out_file, pose3d)
    print('Done!')


if __name__ == '__main__':
    main(**vars(get_args()))
