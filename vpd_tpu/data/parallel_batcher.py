"""Multiprocess batch production (the reference's DataLoader workers).

The reference parallelizes its host hot loop — per-sample PNG decode and
pose sampling — with DataLoader worker *processes*
(`train_vpd_model.py:205-212`, `train_vipe_model.py:283-288`,
`apply_vpd_model.py:154-157`). This module is the equivalent for this
framework's batch-source protocol (`next_batch()` + `num_batches`):
`MultiprocessBatcher` runs one source per worker process and drains them
round-robin, so the batch stream is deterministic given per-worker seeds
while sampling/decoding scales across host cores. Queues are bounded, so
workers double as prefetchers (decode runs ahead of the device step).

Workers must not touch jax/TPU state — they run pure numpy/cv2, exactly
like the reference's workers.
"""

import multiprocessing as mp
import queue as queue_mod
import traceback

_ERROR = '__vpd_worker_error__'


def _worker_loop(make_source, worker_id, queue):
    try:
        source = make_source(worker_id)
        while True:
            queue.put(source.next_batch())
    except (KeyboardInterrupt, BrokenPipeError, EOFError):
        pass
    except Exception:  # surface the failure instead of hanging the parent
        try:
            queue.put((_ERROR, traceback.format_exc()))
        except Exception:
            pass


class MultiprocessBatcher:
    """Round-robin fan-in over `num_workers` forked batch sources.

    make_source: worker_id -> source with `next_batch()`; the caller
    offsets RNG seeds by worker_id (matching torch's per-worker seeding).
    num_workers=0 runs the source inline (no processes), like
    DataLoader(num_workers=0).
    """

    def __init__(self, make_source, num_workers, num_batches, *, depth=2,
                 template=None):
        """`template`: optional parent-side source instance; attribute
        lookups that the batcher itself lacks (e.g. FusedBatcher.kp_dims
        / kp_mask metadata) are delegated to it."""
        self.num_batches = num_batches
        self._template = template
        self._inline = None
        self._queues = []
        self._procs = []
        self._next = 0
        if num_workers <= 0:
            self._inline = make_source(0)
            return
        ctx = mp.get_context('fork')
        for wid in range(num_workers):
            q = ctx.Queue(maxsize=depth)
            p = ctx.Process(target=_worker_loop,
                            args=(make_source, wid, q), daemon=True)
            p.start()
            self._queues.append(q)
            self._procs.append(p)

    def next_batch(self):
        if self._inline is not None:
            return self._inline.next_batch()
        idx = self._next % len(self._queues)
        self._next += 1
        q, p = self._queues[idx], self._procs[idx]
        while True:
            try:
                item = q.get(timeout=5)
                break
            except queue_mod.Empty:
                if not p.is_alive():  # hard death (signal/OOM)
                    raise RuntimeError(
                        'batch worker {} died (exit code {})'.format(
                            idx, p.exitcode))
        if isinstance(item, tuple) and len(item) == 2 and item[0] == _ERROR:
            raise RuntimeError(
                'batch worker {} failed:\n{}'.format(idx, item[1]))
        return item

    def close(self):
        for p in self._procs:
            p.terminate()
        for p in self._procs:
            p.join(timeout=5)
        for q in self._queues:
            q.close()
        self._procs, self._queues = [], []

    def __getattr__(self, name):
        template = self.__dict__.get('_template')
        if template is not None and not name.startswith('_'):
            return getattr(template, name)
        raise AttributeError(name)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
