"""Every reference CLI flag must exist on the corresponding tool here.

AST-level diff of argparse `add_argument` calls: the reference tree is
the oracle (strings only — no reference code is executed). Extra flags
on our side are allowed (documented TPU additions); missing ones fail.
"""

import ast
import os

import pytest

REF = '/root/reference'
OURS = os.path.join(os.path.dirname(__file__), '..', 'vpd_tpu', 'tools')

PAIRS = [
    ('train_vipe_model.py', 'train_vipe.py'),
    ('apply_vipe_model.py', 'apply_vipe.py'),
    ('train_vpd_model.py', 'train_vpd.py'),
    ('apply_vpd_model.py', 'apply_vpd.py'),
    ('extract_square_crops.py', 'extract_square_crops.py'),
    ('preprocess_3d_pose.py', 'preprocess_3d_pose.py'),
    ('dummy_2d_features.py', 'dummy_2d_features.py'),
    ('stack_features.py', 'stack_features.py'),
    ('recut_fs_video.py', 'recut_fs_video.py'),
    ('recut_finegym_video.py', 'recut_finegym_video.py'),
    ('view_2d_pose.py', 'view_2d_pose.py'),
    ('plot_losses.py', 'plot_losses.py'),
    ('recognize.py', 'recognize.py'),
    ('detect.py', 'detect.py'),
    ('raft/flow.py', 'compute_flow.py'),
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason='reference tree not available')


def flag_names(path):
    with open(path) as fp:
        tree = ast.parse(fp.read())
    names = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == 'add_argument'):
            names.update(
                a.value for a in node.args
                if isinstance(a, ast.Constant) and isinstance(a.value, str))
    return names


@pytest.mark.parametrize('ref,ours', PAIRS, ids=[p[1] for p in PAIRS])
def test_tool_accepts_every_reference_flag(ref, ours):
    missing = flag_names(os.path.join(REF, ref)) - flag_names(
        os.path.join(OURS, ours))
    assert not missing, '{} lacks reference flags: {}'.format(
        ours, sorted(missing))
