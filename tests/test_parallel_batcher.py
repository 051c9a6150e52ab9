"""MultiprocessBatcher: worker-process batch production + CLI wiring.

Parity target: the reference's DataLoader(num_workers=N) processes
(`train_vpd_model.py:205-212`) — sampling/decode fans out across host
cores, round-robin fan-in keeps the stream deterministic per seed.
"""

import numpy as np
import pytest

from vpd_tpu.data.parallel_batcher import MultiprocessBatcher


class _Source:
    def __init__(self, wid, seed=0):
        self.wid = wid
        self.rng = np.random.default_rng(seed + wid)
        self.count = 0

    def next_batch(self):
        self.count += 1
        return {'wid': np.int32(self.wid),
                'x': self.rng.normal(size=(4, 3)).astype(np.float32)}


def test_round_robin_deterministic():
    with MultiprocessBatcher(_Source, 3, num_batches=6) as mb:
        got = [mb.next_batch() for _ in range(6)]
    # worker order 0,1,2,0,1,2
    assert [int(b['wid']) for b in got] == [0, 1, 2, 0, 1, 2]
    # per-worker streams are the per-seed RNG streams, in order
    for wid in range(3):
        ref = _Source(wid)
        np.testing.assert_array_equal(got[wid]['x'],
                                      ref.next_batch()['x'])
        np.testing.assert_array_equal(got[wid + 3]['x'],
                                      ref.next_batch()['x'])


def test_inline_mode_no_processes():
    mb = MultiprocessBatcher(_Source, 0, num_batches=2)
    assert not mb._procs
    a = mb.next_batch()
    b = mb.next_batch()
    assert int(a['wid']) == 0 and not np.array_equal(a['x'], b['x'])


def test_close_idempotent():
    mb = MultiprocessBatcher(_Source, 2, num_batches=2)
    mb.next_batch()
    mb.close()
    mb.close()
    assert not mb._procs


def test_crop_source_through_workers(tmp_path):
    cv2 = pytest.importorskip('cv2')
    import os

    from vpd_tpu.data.crops import CropBatchSource

    dim = 32
    video_dir = tmp_path / 'vid0'
    os.makedirs(video_dir)
    rng = np.random.default_rng(0)
    samples = []
    for frame in range(4):
        cv2.imwrite(str(video_dir / '{}.png'.format(frame)),
                    rng.integers(0, 256, (dim, dim, 3), np.uint8))
        samples.append(('vid0', None, frame,
                        rng.normal(size=8).astype(np.float32)))

    def make(wid):
        return CropBatchSource(samples, str(tmp_path), dim, 3,
                               use_mask=False, seed=10 + wid)

    with MultiprocessBatcher(make, 2, num_batches=4) as mb:
        batches = [mb.next_batch() for _ in range(4)]
    for b in batches:
        assert b['rgb'].shape == (3, dim, dim, 3) and b['rgb'].any()
    # round-robin: batches 0 and 2 come from worker 0's seeded stream
    ref = make(0)
    np.testing.assert_array_equal(batches[0]['rgb'],
                                  ref.next_batch()['rgb'])
    np.testing.assert_array_equal(batches[2]['rgb'],
                                  ref.next_batch()['rgb'])


def test_train_vipe_cli_with_workers(tmp_path, monkeypatch):
    import os

    from test_cli_integration import _make_h36m_tree

    from vpd_tpu.data.vipe_sampler import FAMILIES, load_human36m
    from vpd_tpu.tools import train_vipe

    pose_dir, pose3d_file = _make_h36m_tree(str(tmp_path / 'h36m'))
    monkeypatch.setitem(
        train_vipe.LOADERS, 'human36m',
        (load_human36m, pose_dir, pose3d_file))
    monkeypatch.setattr(FAMILIES['human36m'], 'train_target_len', 32,
                        raising=False)
    monkeypatch.setattr(FAMILIES['human36m'], 'val_target_len', 16,
                        raising=False)

    save_dir = str(tmp_path / 'model')
    train_vipe.main(
        dataset=['human36m'], save_dir=save_dir, checkpoint_frequency=1,
        num_epochs=1, learning_rate=1e-3, batch_size=16, embedding_dim=8,
        encoder_arch=(1, 32), decoder_arch=(1, 32), embed_bones=False,
        model_select_contrast=False, model_select_window=1, resume=False,
        no_camera_aug=False, seed=0, num_workers=2)
    files = os.listdir(save_dir)
    assert 'config.json' in files and 'loss.json' in files


class _FailingSource:
    def __init__(self, wid):
        self.wid = wid
        self.n = 0

    def next_batch(self):
        self.n += 1
        if self.wid == 1 and self.n == 2:
            raise IOError('corrupt PNG')
        return {'wid': np.int32(self.wid)}


def test_worker_exception_propagates():
    with MultiprocessBatcher(_FailingSource, 2, num_batches=8,
                             depth=1) as mb:
        mb.next_batch()  # w0 batch1
        mb.next_batch()  # w1 batch1
        with pytest.raises(RuntimeError, match='corrupt PNG'):
            for _ in range(6):
                mb.next_batch()


def test_prefetcher_close_joins_blocked_worker():
    """close() unblocks a worker parked on a full queue (r1 weak #5)."""
    import time

    import numpy as np

    from vpd_tpu.data.crops import Prefetcher

    class Source:
        def __init__(self):
            self.n = 0

        def next_batch(self):
            self.n += 1
            return np.zeros(1)

    src = Source()
    p = Prefetcher(src, depth=1)
    time.sleep(0.3)  # queue fills; worker parks in put()
    p.close()
    assert not p.thread.is_alive()
    n_at_close = src.n
    time.sleep(0.3)
    assert src.n == n_at_close  # no decoding continues after close


def test_fused_batcher_divisor_snaps_batch():
    from tests.synth import make_synth_family

    from vpd_tpu.data.vipe_sampler import FAMILIES, FusedBatcher, \
        VIPESampler

    seqs, poses = make_synth_family('human36m', seed=0)
    samplers = [
        VIPESampler(FAMILIES['human36m'], seqs, poses, target_len=33,
                    seed=i) for i in range(3)]
    b = FusedBatcher(samplers, 99, divisor=8)
    assert b.batch_size % 8 == 0
    assert all(r >= 1 for r in b.rows)
    batch = b.next_batch()
    assert batch['pose1'].shape[0] == b.batch_size


def test_prefetched_source_transform_runs_on_worker():
    import threading

    import numpy as np

    from vpd_tpu.data.crops import PrefetchedSource

    class Source:
        num_batches = 4

        def __init__(self):
            self.n = 0

        def next_batch(self):
            self.n += 1
            return {'x': np.full(3, self.n)}

    seen_threads = []

    def transform(b):
        seen_threads.append(threading.current_thread().name)
        return {'x': b['x'] * 2}

    src = PrefetchedSource(Source(), transform=transform)
    got = src.next_batch()
    assert (got['x'] % 2 == 0).all()
    assert all(t != threading.main_thread().name for t in seen_threads)
    src.close()


def test_fetch_metrics_single_readback_roundtrip():
    import jax.numpy as jnp
    import numpy as np

    from vpd_tpu.core.metrics import fetch_metrics

    tree = [{'a': jnp.float32(1.5), 'b': jnp.arange(4, dtype=jnp.int32)},
            {'a': jnp.float32(-2.0), 'b': jnp.ones(4, jnp.float32)}]
    out = fetch_metrics(tree)
    assert isinstance(out[0]['a'], np.ndarray) or np.isscalar(out[0]['a'])
    assert float(out[0]['a']) == 1.5
    np.testing.assert_allclose(np.asarray(out[0]['b']), [0, 1, 2, 3])
    assert float(out[1]['a']) == -2.0
    np.testing.assert_allclose(np.asarray(out[1]['b']), np.ones(4))
    assert fetch_metrics([]) == []


def test_prefetcher_surfaces_worker_errors():
    """A dead prefetch worker must raise in next(), not hang forever."""
    import pytest

    from vpd_tpu.data.crops import Prefetcher

    class Source:
        num_batches = 8

        def __init__(self):
            self.n = 0

        def next_batch(self):
            self.n += 1
            if self.n >= 2:
                raise ValueError('corrupt crop')
            return self.n

    p = Prefetcher(Source(), depth=1)
    try:
        assert p.next() == 1
        with pytest.raises(RuntimeError, match='prefetch worker died'):
            # bounded loop: the old behavior blocked forever in q.get()
            p.next()
    finally:
        p.close()
