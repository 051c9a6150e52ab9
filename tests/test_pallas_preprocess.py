"""Pallas fused preprocessing kernel vs the XLA reference path.

Runs in pallas interpret mode (CPU). The compiled kernel was equality-
checked and timed on the real chip by `tools/bench_pallas_preprocess`
(PERF.md "Fused preprocessing": ~7% faster than XLA end-of-chain at the
B=4096 extraction rung, ~4% slower at B=1024), and ships as the
`--preprocess pallas` opt-in on `tools/apply_vpd`
(`test_extraction_pallas_preprocess` below covers that wiring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpd_tpu.data.augment import eval_transform_batch, flip_batch
from vpd_tpu.ops.pallas.preprocess import preprocess_crops_pallas

MEAN = (0.45, 0.47, 0.46)
STD = (0.13, 0.12, 0.12)


@pytest.mark.parametrize('use_flow', [True, False])
def test_pallas_matches_xla(use_flow):
    rng = np.random.default_rng(0)
    b, s = 16, 32
    rgb = rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8)
    flow = rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8)
    flip = (np.arange(b) % 2).astype(np.int32)

    out = np.asarray(preprocess_crops_pallas(
        rgb, flow if use_flow else None, jnp.asarray(flip), MEAN, STD,
        block_b=8, interpret=True)).astype(np.float32)

    x = np.asarray(eval_transform_batch(
        rgb, MEAN, STD, flow_u8=flow if use_flow else None))
    xf = np.asarray(flip_batch(jnp.asarray(x), use_flow))
    expected = np.where(flip.reshape(-1, 1, 1, 1).astype(bool), xf, x)

    assert out.shape == expected.shape
    # bf16 output rounding
    np.testing.assert_allclose(out, expected, atol=0.02)


@pytest.mark.parametrize('b', [5, 13])
def test_pallas_pads_ragged_batches(b):
    """Batches not divisible by block_b are zero-padded to the grid and
    sliced back — the extraction CLI's default batch (500) is not a
    multiple of 8, and rows must match the block-aligned result."""
    rng = np.random.default_rng(b)
    s = 32
    rgb = rng.integers(0, 255, (16, s, s, 3), dtype=np.uint8)
    flow = rng.integers(0, 255, (16, s, s, 3), dtype=np.uint8)
    flip = (np.arange(16) % 2).astype(np.int32)

    full = np.asarray(preprocess_crops_pallas(
        rgb, flow, jnp.asarray(flip), MEAN, STD, block_b=8,
        interpret=True))
    ragged = np.asarray(preprocess_crops_pallas(
        rgb[:b], flow[:b], jnp.asarray(flip[:b]), MEAN, STD, block_b=8,
        interpret=True))
    assert ragged.shape == (b, s, s, 5)
    np.testing.assert_array_equal(ragged, full[:b])
