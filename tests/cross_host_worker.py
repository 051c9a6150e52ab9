"""Worker for test_cross_host: one process of a 2-host VIPE train step.

Usage: python cross_host_worker.py <process_id> <port> <out_json>
Configures a 4-device CPU backend, joins the 2-process jax.distributed
rendezvous (gloo), and runs one fused VIPE train step over the global
8-device 'data' mesh with this host's half of the batch.
"""

import json
import sys

import jax


def main(pid, port, out_path):
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 4)
    jax.distributed.initialize(
        coordinator_address='localhost:{}'.format(port),
        num_processes=2, process_id=pid)

    import numpy as np

    from synth import make_synth_family
    from vpd_tpu.core.mesh import get_mesh, replicate, shard_batch
    from vpd_tpu.data.vipe_sampler import (FAMILIES, FusedBatcher,
                                           VIPESampler)
    from vpd_tpu.train.vipe import create_state, make_train_step
    from vpd_tpu.train.vipe_loop import build_model, default_config

    mesh = get_mesh()
    assert mesh.size == 8, mesh
    assert jax.process_count() == 2

    seqs, poses = make_synth_family('human36m', seed=0)
    sampler = VIPESampler(FAMILIES['human36m'], seqs, poses, target_len=32)
    batcher = FusedBatcher([sampler], 16)
    batch = batcher.next_batch()  # same seed => identical on both hosts
    half = batch['pose1'].shape[0] // 2
    local = {k: v[pid * half:(pid + 1) * half] for k, v in batch.items()}

    cfg = default_config(
        ['human36m'], [(20, 7)], [sampler.mean_kp_offset_norms],
        num_epochs=1, embedding_dim=8, encoder_arch=(1, 32),
        decoder_arch=(1, 32))
    model = build_model(cfg, batcher.kp_dims)
    state = create_state(model, batch, learning_rate=1e-3, seed=0)
    state = replicate(state, mesh)

    step = make_train_step(model, batcher.kp_mask())
    new_state, metrics = step(state, shard_batch(local, mesh),
                              jax.random.key(0))
    result = {
        'process': pid,
        'loss_sum': float(metrics['loss_sum']),
        'param_sums': [float(np.asarray(leaf).sum()) for leaf in
                       jax.tree_util.tree_leaves(new_state.params)],
    }
    with open(out_path, 'w') as fp:
        json.dump(result, fp)
    print('worker', pid, 'done')


if __name__ == '__main__':
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
