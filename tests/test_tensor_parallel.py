"""Tensor parallelism (data x model mesh) for the VIPE* teacher.

SURVEY.md §2.8: the reference needs only data parallelism for parity;
tensor parallelism is the TPU-idiomatic extra for wide FC encoders.
These tests pin that a (4, 2) data x model mesh trains numerically the
same model as the 1-D data mesh (GSPMD inserts the collectives; no
model-code changes), on 8 virtual CPU devices (conftest).
"""

import sys

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from vpd_tpu.core.mesh import (MODEL_AXIS, apply_tensor_parallel, get_mesh,
                               get_mesh_2d, tensor_parallel_shardings)


def test_get_mesh_2d_shape():
    mesh = get_mesh_2d(2)
    assert mesh.shape['data'] == len(jax.devices()) // 2
    assert mesh.shape[MODEL_AXIS] == 2


def test_tensor_parallel_shardings_rule():
    mesh = get_mesh_2d(2)
    tree = {
        'wide_kernel': np.zeros((48, 64), np.float32),
        'bias': np.zeros(64, np.float32),
        'tiny': np.zeros(3, np.float32),
        'odd': np.zeros((8, 7), np.float32),
        'scalar': np.float32(0),
    }
    specs = tensor_parallel_shardings(tree, mesh)
    assert specs['wide_kernel'].spec == P(None, MODEL_AXIS)
    assert specs['bias'].spec == P(MODEL_AXIS)
    assert specs['tiny'].spec == P()
    assert specs['odd'].spec == P()
    assert specs['scalar'].spec == P()

    placed = apply_tensor_parallel(tree, mesh)
    np.testing.assert_array_equal(
        np.asarray(placed['wide_kernel']), tree['wide_kernel'])


@pytest.mark.slow
def test_vipe_tp_matches_dp():
    sys.path.insert(0, 'tests')
    from synth import make_synth_family

    from vpd_tpu.data.vipe_sampler import FAMILIES, FusedBatcher, \
        VIPESampler
    from vpd_tpu.train.vipe_loop import VIPETrainer
    from vpd_tpu.train.vipe_loop import default_config as vipe_config

    batch = 16
    seqs, poses = make_synth_family('human36m', seed=0)

    def make_trainer(mesh):
        tr = VIPESampler(FAMILIES['human36m'], seqs, poses,
                         target_len=2 * batch, seed=1)
        va = VIPESampler(FAMILIES['human36m'], seqs, poses,
                         target_len=batch, seed=2)
        cfg = vipe_config(['human36m'], [(20, 7)],
                          [tr.mean_kp_offset_norms], num_epochs=1,
                          embedding_dim=8, encoder_arch=(1, 32),
                          decoder_arch=(1, 32))
        return VIPETrainer(FusedBatcher([tr], batch),
                           FusedBatcher([va], batch), cfg, mesh=mesh,
                           seed=0)

    t_dp = make_trainer(get_mesh())
    t_tp = make_trainer(get_mesh_2d(2))

    # TP placement actually sharded the wide kernels
    enc = t_tp.state.params['encoder']
    flat = jax.tree_util.tree_leaves_with_path(enc)
    assert any(
        getattr(v.sharding, 'spec', P())[-1:] == (MODEL_AXIS,)
        for _, v in flat if hasattr(v, 'sharding') and v.ndim >= 1
        and v.shape[-1] % 2 == 0 and v.shape[-1] >= 4)
    # identical initialization
    for a, b in zip(jax.tree_util.tree_leaves(t_dp.state.params),
                    jax.tree_util.tree_leaves(t_tp.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from vpd_tpu.core.mesh import shard_batch

    key = jax.random.key(5)
    for step in range(3):
        b = t_dp.train_batcher.next_batch()
        t_tp.train_batcher.next_batch()  # keep the streams aligned
        t_dp.state, m_dp = t_dp.train_step(
            t_dp.state, shard_batch(b, t_dp.mesh), key)
        t_tp.state, m_tp = t_tp.train_step(
            t_tp.state, shard_batch(b, t_tp.mesh), key)
        # the partitioned program computes the same loss
        np.testing.assert_allclose(float(m_dp['loss_sum']),
                                   float(m_tp['loss_sum']), rtol=1e-5)

    # params track within Adam's fp-noise amplification: a near-zero
    # gradient's SIGN can differ under resharded reduction order and
    # Adam's first steps turn that into ~lr-sized drift — bound it by a
    # few lr (1e-4), not exact equality
    for a, b in zip(jax.tree_util.tree_leaves(t_dp.state.params),
                    jax.tree_util.tree_leaves(t_tp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3)
