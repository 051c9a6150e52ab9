"""Benchmark: VPD student feature-extraction throughput (crops/sec/chip).

The reference pipeline's hot path (`apply_vpd_model.py`, batch 500 on one
GPU). Here: uint8 crop batch (pre-staged in HBM) -> on-device normalize ->
bf16 ResNet-34 -> 32-d embeddings fetched back to host, one jitted
program, measured steady-state on one chip.

NOTE on methodology: on this backend `block_until_ready` does not force
execution (lazy relay), so every timed iteration fetches the embeddings to
host, which is also what real extraction does before writing .emb.pkl.

RESILIENCE: the relay's first compile can take minutes under load (round 2
recorded rc=124 with no output because the old bench compiled a B=8192
program before printing anything). So this bench measures a SMALL batch
first and prints a complete JSON line immediately, then escalates batch
size, reprinting the best-so-far line after each stage — whenever a driver
timeout lands, the tail still holds one valid result. A wall-clock budget
(VPD_BENCH_BUDGET_S, default 480 s) stops escalation before the driver's
own timeout would.

Prints one-or-more JSON lines (LAST line = best measurement):
{"metric", "value", "unit", "vs_baseline"}.
Baseline: 5000 crops/sec/chip (BASELINE.md north star).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE = 5000.0
BUDGET_S = float(os.environ.get('VPD_BENCH_BUDGET_S', '480'))
START = time.perf_counter()


def elapsed():
    return time.perf_counter() - START


def emit(best):
    print(json.dumps({
        'metric': 'student_extract_crops_per_sec_per_chip',
        'value': round(best, 1),
        'unit': 'crops/sec/chip',
        'vs_baseline': round(best / BASELINE, 3),
    }), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vpd_tpu.data.augment import RGB_MEAN_STD, eval_transform_batch
    from vpd_tpu.models import build_encoder

    model = build_encoder('resnet34', emb_dim=32, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 128, 128, 3), jnp.bfloat16))
    mean, std = RGB_MEAN_STD['tennis']

    @jax.jit
    def embed(params, batch_stats, rgb_u8):
        imgs = eval_transform_batch(rgb_u8, mean, std).astype(jnp.bfloat16)
        return model.apply(
            {'params': params, 'batch_stats': batch_stats}, imgs,
            train=False)

    params = variables['params']
    batch_stats = variables['batch_stats']

    rng = np.random.default_rng(0)
    best = 0.0
    depth = 4  # enqueue-ahead amortizes the relay round-trip
    ladder = [(1024, 3), (8192, 4), (16384, 4)]
    if os.environ.get('VPD_BENCH_BATCHES'):  # debug override
        ladder = [(int(b), 3)
                  for b in os.environ['VPD_BENCH_BATCHES'].split(',')]
    for stage, (batch, rounds) in enumerate(ladder):
        # a stage that starts and gets killed mid-flight cannot destroy
        # already-printed lines (the driver keeps the last complete one),
        # so the escalation window can be generous: skip only when the
        # remaining budget clearly cannot fit a warm stage (~120-200 s
        # incl. relay upload of the bigger buffers).
        if stage > 0 and elapsed() > 0.7 * BUDGET_S:
            print('# bench: skipping B={} escalation at {:.0f}s '
                  '(budget {:.0f}s)'.format(batch, elapsed(), BUDGET_S),
                  file=sys.stderr, flush=True)
            break
        try:
            bufs = [jax.device_put(rng.integers(
                0, 255, (batch, 128, 128, 3), dtype=np.uint8))
                for _ in range(depth)]

            # compile + warm (readback forces execution)
            np.asarray(embed(params, batch_stats, bufs[0]))

            times = []
            for _ in range(rounds):
                start = time.perf_counter()
                outs = [embed(params, batch_stats, b) for b in bufs]
                res = [np.asarray(o) for o in outs]
                times.append((time.perf_counter() - start) / depth)
                if elapsed() > BUDGET_S and times:
                    break
            assert all(np.all(np.isfinite(r)) for r in res)
            best = max(best, batch / min(times))
        except AssertionError:
            # non-finite embeddings are a numerics fault, not a relay
            # hiccup: fail the whole bench rather than report the
            # previous stage's number as if everything were fine
            raise
        except Exception as exc:  # keep the previous stage's line valid
            print('# bench: B={} stage failed: {!r}'.format(batch, exc),
                  file=sys.stderr, flush=True)
            if best:
                break
            raise
        emit(best)
        del bufs, outs, res


if __name__ == '__main__':
    main()
