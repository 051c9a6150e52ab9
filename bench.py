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
program before printing anything; round 3 printed the B=1024 line but the
serial escalation then ate the whole budget on the next compile). So this
bench measures a SMALL batch first and prints a complete JSON line
immediately — and, the moment the small rung's program is live, a
background thread starts warming the TOP rung (B=16384). The relay
compiles lazily at first *execution* (AOT .compile() returns in seconds
without compiling), so the warm thread issues a real call + readback; its
queue time overlaps the small rung's timing loop and emit. Escalation then
costs only the timing rounds. Crop buffers are synthesized ON DEVICE
(jitted randint) instead of device_put from host: staging 4x B=16384
uint8 buffers through the dev tunnel would cost minutes of upload for a
bench that only measures the embed program.

A wall-clock budget (VPD_BENCH_BUDGET_S, default 480 s) stops escalation
before the driver's own timeout would; whenever a kill lands, the tail
already holds one valid line. Every rung also emits EAGERLY — a JSON
line goes out after the first timing round and after every improving
round, not only when the rung completes — because relay load can
stretch a single forced readback to minutes (a trivial program was
measured at 343 s round-trip under a bad window); eager emission
halves the round-trips between process start and the first line.

BASELINE.md's metric is "student train + extract", so between the two
extract rungs a TRAIN rung times the fused augment+fwd/bwd+AdamW step
(ResNet-34 bf16, RGB+flow+mask, motion head, B=2048 pre-staged — the
PERF.md "Student training step" config) and prints its own
`student_train_crops_per_sec_per_chip` JSON line. The extract line is
re-emitted right after it so the LAST stdout line is always the extract
metric regardless of where the budget (or the driver's kill) lands.

After the top XLA rung, budget permitting, the same batch is re-timed
through the fused Pallas preprocess (rung 3) and emitted only if it
beats — PERF.md measured it ~7% ahead at B>=4096.

Prints one-or-more JSON lines (LAST line = best EXTRACT measurement):
{"metric", "value", "unit", "vs_baseline"}.
Baseline: 5000 crops/sec/chip (BASELINE.md north star).
"""

import json
import os
import sys
import threading
import time

import numpy as np

BASELINE = 5000.0
BUDGET_S = float(os.environ.get('VPD_BENCH_BUDGET_S', '480'))
START = time.perf_counter()


def elapsed():
    return time.perf_counter() - START


def emit(best, metric='student_extract_crops_per_sec_per_chip'):
    print(json.dumps({
        'metric': metric,
        'value': round(best, 1),
        'unit': 'crops/sec/chip',
        'vs_baseline': round(best / BASELINE, 3),
    }), flush=True)


DEPTH = 4  # enqueue-ahead amortizes the relay round-trip


def train_rung(jax, jnp, batch, rounds, on_rate=None):
    """Fused train step (augment -> fwd/bwd -> AdamW) crops/sec/chip.

    PERF.md's "Student training step" config: ResNet-34 bf16 student,
    RGB+flow+mask inputs, motion head (emb 32 -> target 64), bf16
    augmentation. Batches are synthesized on device; the train state
    chains through every dispatch so the relay cannot memoize repeats,
    and one scalar readback per timing round forces the whole chain.
    """
    from functools import partial

    from vpd_tpu.train.vpd import create_state, make_train_step
    from vpd_tpu.train.vpd_loop import build_student, default_config

    config = default_config('tennis', emb_dim=32, batch_size=batch,
                            use_flow=True, motion=True,
                            encoder_arch='resnet34')
    model = build_student(config)  # bf16 student
    mean, std = config['rgb_mean_std']
    step = make_train_step(model, mean, std, use_flow=True,
                           aug_dtype=jnp.bfloat16)
    state = create_state(model, jnp.zeros((1, 128, 128, 5), jnp.float32),
                         config['learning_rate'])

    @partial(jax.jit, static_argnums=1)
    def synth_batch(key, b):
        ks = jax.random.split(key, 5)
        u8 = lambda k, shape, hi: jax.random.randint(  # noqa: E731
            k, shape, 0, hi, jnp.int32).astype(jnp.uint8)
        return {
            'rgb': u8(ks[0], (b, 128, 128, 3), 256),
            'flow': u8(ks[1], (b, 128, 128, 3), 256),
            'mask': u8(ks[2], (b, 128, 128), 2),
            'emb': jax.random.normal(ks[3], (b, 64), jnp.float32),
            'flip': jax.random.bernoulli(ks[4], 0.5, (b,)),
        }

    batches = [synth_batch(jax.random.key(100 + i), batch)
               for i in range(DEPTH)]
    rng = jax.random.key(7)
    metrics = {}  # bound for the finally even if the first step raises

    try:
        # first execution = the relay compile; readback forces it to run
        state, metrics = step(state, batches[0], rng)
        assert np.isfinite(np.asarray(metrics['emb_loss_sum']))

        best_t = None
        for _ in range(rounds):
            start = time.perf_counter()
            for b in batches:
                state, metrics = step(state, b, rng)
            val = np.asarray(metrics['emb_loss_sum'])  # forces the chain
            dt = (time.perf_counter() - start) / DEPTH
            assert np.isfinite(val), val
            if best_t is None or dt < best_t:
                best_t = dt
                if on_rate is not None:  # eager: see stage_time docstring
                    on_rate(batch / best_t)
            if elapsed() > BUDGET_S:
                break
        return batch / best_t
    finally:
        # Free the train working set (state + moments + DEPTH batches,
        # ~2 GB) DETERMINISTICALLY before the B=16384 extract rung: its
        # execution transients nearly fill HBM, and a probe showed
        # buffers from a finished/failed program lingering long enough
        # to RESOURCE_EXHAUST the next one (B=4096 train OOMs outright
        # on one chip — 2048 is the validated rung size).
        for leaf in jax.tree_util.tree_leaves((state, batches, metrics)):
            if hasattr(leaf, 'delete'):
                leaf.delete()


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

    @jax.jit
    def embed_pallas(params, batch_stats, rgb_u8):
        # the fused Pallas preprocess (PERF.md: ~7% over the XLA path at
        # the large extraction rungs); flip=0 == eval_transform_batch
        from vpd_tpu.ops.pallas.preprocess import preprocess_crops_pallas
        imgs = preprocess_crops_pallas(
            rgb_u8, None, jnp.zeros((rgb_u8.shape[0],), jnp.int32),
            mean, std, interpret=jax.default_backend() != 'tpu')
        return model.apply(
            {'params': params, 'batch_stats': batch_stats}, imgs,
            train=False)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def synth(key, batch):  # on-device uint8 crops; no tunnel upload
        x = jax.random.randint(key, (batch, 128, 128, 3), 0, 256, jnp.int32)
        return x.astype(jnp.uint8)

    params = variables['params']
    batch_stats = variables['batch_stats']

    def stage_setup(batch, fn=embed):
        """Synthesize DEPTH device buffers and warm the embed program.

        The first embed() call of a new batch shape triggers the relay
        compile; the readback forces it to actually run.
        """
        keys = jax.random.split(jax.random.key(batch), DEPTH)
        bufs = [synth(k, batch) for k in keys]
        out = np.asarray(fn(params, batch_stats, bufs[0]))
        assert np.all(np.isfinite(out))
        return bufs

    def stage_time(batch, bufs, rounds, fn=embed, on_rate=None):
        """Time `rounds` dispatch chains; report improvements EAGERLY.

        `on_rate` fires after every round that improves the rung's best
        rate, so a JSON line hits stdout after the FIRST round instead
        of after all of them. Under pathological relay load (a trivial
        program was measured at 343 s round-trip) every forced readback
        costs minutes; emitting eagerly is the difference between the
        driver capturing one valid line and capturing nothing.
        """
        best_t = None
        for _ in range(rounds):
            start = time.perf_counter()
            outs = [fn(params, batch_stats, b) for b in bufs]
            res = [np.asarray(o) for o in outs]
            dt = (time.perf_counter() - start) / DEPTH
            # non-finite embeddings are a numerics fault, not a relay
            # hiccup: fail the bench rather than report a previous
            # stage's number as if everything were fine
            assert all(np.all(np.isfinite(r)) for r in res)
            if best_t is None or dt < best_t:
                best_t = dt
                if on_rate is not None:
                    on_rate(batch / best_t)
            if elapsed() > BUDGET_S:
                break
        return batch / best_t

    # Monotone eager emitter shared by every extract rung: a line goes
    # out the moment any rung's round beats the best-so-far.
    run = {'best': 0.0}

    def emit_improved(rate):
        if rate > run['best']:
            run['best'] = rate
            emit(rate)

    # test knobs: shrink the rungs so the FULL main flow (eager rung 1,
    # train rung, background-warmed top rung, guarded pallas rung) can
    # run off-TPU in CI-ish time; production defaults otherwise
    ladder = [(1024, 3), (16384, 4)]
    if os.environ.get('VPD_BENCH_LADDER'):
        ladder = [tuple(int(v) for v in rung.split(':'))
                  for rung in os.environ['VPD_BENCH_LADDER'].split(',')]
        assert len(ladder) == 2, ladder
    if os.environ.get('VPD_BENCH_BATCHES'):  # debug override (serial)
        for b in os.environ['VPD_BENCH_BATCHES'].split(','):
            bufs = stage_setup(int(b))
            stage_time(int(b), bufs, 3, on_rate=emit_improved)
        return

    small, top = ladder

    # Rung 1: small batch, compile + warm + time + emit ASAP.
    bufs = stage_setup(small[0])

    # The small program is live, so the relay queue is ours: start the
    # top rung's compile+warm on a thread. It overlaps the small timing
    # loop (sub-second) and, crucially, keeps queueing while we emit.
    top_state = {}

    def warm_top():
        try:
            top_state['bufs'] = stage_setup(top[0])
        except Exception as exc:  # noqa: BLE001 - record, decide later
            top_state['error'] = exc

    warm = threading.Thread(target=warm_top, daemon=True)
    warm.start()

    stage_time(small[0], bufs, small[1], on_rate=emit_improved)
    del bufs

    # Train rung (foreground, overlapping the top-extract warm thread's
    # relay queue time): the BASELINE metric is "train + extract". Each
    # improving train round emits a train line immediately FOLLOWED by
    # an extract re-emit, so a kill landing mid-rung still leaves an
    # extract metric as the last stdout line.
    if elapsed() < BUDGET_S - 120.0:
        try:
            def note_train(rate):
                emit(rate, 'student_train_crops_per_sec_per_chip')
                emit(run['best'])
            train_rung(jax, jnp,
                       int(os.environ.get('VPD_BENCH_TRAIN_BATCH', 2048)),
                       3, on_rate=note_train)
        except Exception as exc:  # noqa: BLE001 - extract line stands
            print('# bench: train rung failed: {!r}'.format(exc),
                  file=sys.stderr, flush=True)
            if isinstance(exc, AssertionError):
                raise
    else:
        print('# bench: skipping train rung at {:.0f}s '
              '(budget {:.0f}s)'.format(elapsed(), BUDGET_S),
              file=sys.stderr, flush=True)

    # Rung 2: wait for the background warm within the remaining budget
    # (leave ~60 s to actually time it), then measure.
    warm.join(timeout=max(0.0, BUDGET_S - 60.0 - elapsed()))
    if warm.is_alive():
        print('# bench: top rung B={} still compiling at {:.0f}s '
              '(budget {:.0f}s); keeping small-rung line'.format(
                  top[0], elapsed(), BUDGET_S), file=sys.stderr, flush=True)
        return
    if 'error' in top_state:
        print('# bench: top rung B={} failed: {!r}'.format(
            top[0], top_state['error']), file=sys.stderr, flush=True)
        if isinstance(top_state['error'], AssertionError):
            raise top_state['error']  # numerics fault: do not mask
        return
    stage_time(top[0], top_state['bufs'], top[1], on_rate=emit_improved)

    # Rung 3 (budget permitting): the same top batch through the fused
    # Pallas preprocess — PERF.md measured it ~7% faster at B>=4096.
    # emit_improved fires only when it actually beats the XLA rung, so
    # the tail stays monotone.
    if elapsed() < BUDGET_S - 90.0:
        try:
            out = np.asarray(
                embed_pallas(params, batch_stats, top_state['bufs'][0]))
            assert np.all(np.isfinite(out))
            xla_best = run['best']
            rate = stage_time(top[0], top_state['bufs'], top[1],
                              fn=embed_pallas, on_rate=emit_improved)
            if rate <= xla_best:
                print('# bench: pallas rung {:.1f} <= xla {:.1f}; '
                      'keeping xla line'.format(rate, xla_best),
                      file=sys.stderr, flush=True)
        except AssertionError:
            raise  # numerics fault: do not mask
        except Exception as exc:  # noqa: BLE001 - xla line stands
            print('# bench: pallas rung failed: {!r}'.format(exc),
                  file=sys.stderr, flush=True)
    else:
        print('# bench: skipping pallas rung at {:.0f}s '
              '(budget {:.0f}s)'.format(elapsed(), BUDGET_S),
              file=sys.stderr, flush=True)


if __name__ == '__main__':
    main()
