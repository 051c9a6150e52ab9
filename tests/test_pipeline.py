"""core/pipeline.run_pipelined: ordering, overlap, and fault paths."""

import threading
import time

import pytest

from vpd_tpu.core.pipeline import run_pipelined


def test_all_chunks_processed_in_order():
    seen = []
    run_pipelined(
        list(range(7)),
        decode=lambda c: c * 10,
        compute=lambda h: h + 1,
        collect=lambda c, d: seen.append((c, d)))
    assert sorted(seen) == [(i, i * 10 + 1) for i in range(7)]
    # compute order is the chunk order; collects may interleave but
    # every chunk pairs with its own device result
    assert [c for c, _ in sorted(seen)] == list(range(7))


def test_decode_runs_ahead_of_compute():
    events = []
    lock = threading.Lock()

    def decode(c):
        with lock:
            events.append(('d', c))
        return c

    def compute(h):
        time.sleep(0.05)  # give the decode-ahead a window
        with lock:
            events.append(('c', h))
        return h

    run_pipelined([0, 1, 2], decode, compute, lambda c, d: None)
    # chunk 1's decode must land before chunk 0's compute finishes
    assert events.index(('d', 1)) < events.index(('c', 0))


def test_empty_chunk_list_is_noop():
    run_pipelined([], decode=None, compute=None, collect=None)


@pytest.mark.parametrize('stage', ['decode', 'compute', 'collect'])
def test_stage_error_propagates(stage):
    """A raise in any stage surfaces to the caller instead of hanging
    the worker pool (the failure mode of a dead pool thread)."""
    boom = RuntimeError('stage failure: ' + stage)

    def decode(c):
        if stage == 'decode' and c == 1:
            raise boom
        return c

    def compute(h):
        if stage == 'compute' and h == 1:
            raise boom
        return h

    def collect(c, d):
        if stage == 'collect' and c == 1:
            raise boom

    with pytest.raises(RuntimeError, match=stage):
        run_pipelined([0, 1, 2, 3], decode, compute, collect)
