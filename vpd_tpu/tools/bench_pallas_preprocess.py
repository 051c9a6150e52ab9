"""Probe: Pallas fused preprocess kernel vs the XLA path, on the real chip.

Decides VERDICT item "wire or close the Pallas preprocess kernel"
(`ops/pallas/preprocess.py`, the fused uint8->normalized-bf16 kernel the
BASELINE north star names). Two comparisons at extraction batch sizes:

  (a) preprocess-only programs (scalar-sum readback forces execution);
  (b) preprocess -> ResNet-34 embed programs (embedding readback) — what
      a user would actually get from an `--preprocess pallas` opt-in,
      since XLA fuses the elementwise path into the conv input anyway.

Methodology matches bench.py: crops synthesized ON DEVICE (no tunnel
upload), DEPTH dispatches per timing round with one readback at the end
(the lazy relay does not execute under `block_until_ready`), min over
rounds. Both paths compute identical semantics (equality-checked on chip
first): normalize + flow interleave + per-sample hflip with x-flow
negation -> bf16, i.e. `eval_transform_batch` + `flip_batch` + select
(reference semantics at `vpd_dataset/common.py:52-80`,
`single_frame.py:82-86`).

Usage:
    python -m vpd_tpu.tools.bench_pallas_preprocess --batches 1024,4096
"""

import argparse
import json
import time
from functools import partial

import numpy as np

DEPTH = 4


def _time_chain(run_one, bufs, rounds):
    """min seconds/dispatch over `rounds`, DEPTH dispatches per round."""
    times = []
    for _ in range(rounds):
        start = time.perf_counter()
        outs = [run_one(b) for b in bufs]
        forced = [np.asarray(o) for o in outs]
        times.append((time.perf_counter() - start) / len(bufs))
        assert all(np.all(np.isfinite(f)) for f in forced)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', default='1024,4096')
    ap.add_argument('--block_bs', default='8,32',
                    help='pallas block_b candidates (best is reported)')
    ap.add_argument('--rounds', type=int, default=3)
    ap.add_argument('--img_dim', type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vpd_tpu.data.augment import (RGB_MEAN_STD, eval_transform_batch,
                                      flip_batch)
    from vpd_tpu.models import build_encoder
    from vpd_tpu.ops.pallas.preprocess import preprocess_crops_pallas

    mean, std = RGB_MEAN_STD['tennis']
    s = args.img_dim
    block_bs = [int(b) for b in args.block_bs.split(',')]

    @partial(jax.jit, static_argnums=1)
    def synth(key, b):
        ks = jax.random.split(key, 3)
        u8 = lambda k: jax.random.randint(  # noqa: E731
            k, (b, s, s, 3), 0, 256, jnp.int32).astype(jnp.uint8)
        return (u8(ks[0]), u8(ks[1]),
                jax.random.bernoulli(ks[2], 0.5, (b,)).astype(jnp.int32))

    def xla_pre(rgb, flow, flip):
        x = eval_transform_batch(rgb, mean, std, flow_u8=flow)
        xf = flip_batch(x, True)
        return jnp.where(flip.astype(bool)[:, None, None, None],
                         xf, x).astype(jnp.bfloat16)

    # --- equality on the real chip (small batch, full readback) ---
    rgb, flow, flip = synth(jax.random.key(0), 64)
    want = np.asarray(jax.jit(xla_pre)(rgb, flow, flip)).astype(np.float32)
    got = np.asarray(preprocess_crops_pallas(
        rgb, flow, flip, mean, std, block_b=8)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.02)
    print(f'# equality ok on chip: max|diff|={np.abs(got - want).max():.4f}',
          flush=True)

    xla_pre_sum = jax.jit(
        lambda rgb, flow, flip: xla_pre(rgb, flow, flip)
        .astype(jnp.float32).mean())

    # one encoder for every batch size (the init program is batch-
    # independent; re-running it per rung would re-pay a relay compile)
    model = build_encoder('resnet34', emb_dim=32, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(1),
                           jnp.zeros((1, s, s, 5), jnp.bfloat16))

    def embed(pre, rgb, flow, flip):
        x = pre(rgb, flow, flip)
        return model.apply(variables, x, train=False)

    emb_xla = jax.jit(partial(embed, xla_pre))

    results = []
    for b in (int(x) for x in args.batches.split(',')):
        keys = jax.random.split(jax.random.key(b), DEPTH)
        bufs = [synth(k, b) for k in keys]

        # (a) preprocess-only
        t_xla = _time_chain(lambda bf: xla_pre_sum(*bf), bufs, args.rounds)
        best_pallas, best_bb = float('inf'), None
        for bb in block_bs:
            pal_sum = jax.jit(lambda r, f, fl, _bb=bb: preprocess_crops_pallas(
                r, f, fl, mean, std, block_b=_bb)
                .astype(jnp.float32).mean())
            t = _time_chain(lambda bf: pal_sum(*bf), bufs, args.rounds)
            if t < best_pallas:
                best_pallas, best_bb = t, bb
        row = {'batch': b, 'stage': 'preprocess_only',
               'xla_crops_per_s': round(b / t_xla, 1),
               'pallas_crops_per_s': round(b / best_pallas, 1),
               'pallas_block_b': best_bb,
               'pallas_vs_xla': round(t_xla / best_pallas, 3)}
        print(json.dumps(row), flush=True)
        results.append(row)

        # (b) preprocess -> embed
        emb_pal = jax.jit(partial(
            embed, lambda r, f, fl: preprocess_crops_pallas(
                r, f, fl, mean, std, block_b=best_bb)))
        t_xla = _time_chain(lambda bf: emb_xla(*bf), bufs, args.rounds)
        t_pal = _time_chain(lambda bf: emb_pal(*bf), bufs, args.rounds)
        row = {'batch': b, 'stage': 'preprocess_embed',
               'xla_crops_per_s': round(b / t_xla, 1),
               'pallas_crops_per_s': round(b / t_pal, 1),
               'pallas_block_b': best_bb,
               'pallas_vs_xla': round(t_xla / t_pal, 3)}
        print(json.dumps(row), flush=True)
        results.append(row)

    wins = all(r['pallas_vs_xla'] >= 1.0 for r in results
               if r['stage'] == 'preprocess_embed')
    print(json.dumps({'verdict': 'pallas_wins' if wins else 'xla_wins'}),
          flush=True)


if __name__ == '__main__':
    main()
