"""Pallas TPU kernel: batched DTW (all-pairs, symmetricP2 / symmetric2).

DTW is a sequential DP that XLA scans poorly (one tiny vector op per row
with the carry bounced through HBM). This kernel keeps the whole DP state
in VMEM and lane-packs BT targets per grid cell: a (BQ, BT*L) f32 tile
holds one DP row for BQ*BT pairs, with each 128-lane segment one target.

Per grid cell (q-block x t-block):
  * per DP row i: one (BQ, D) x (D, BT*L) MXU matmul produces the local
    cost row for every pair at once;
  * symmetricP2 rows have no within-row dependency -> pure shifted mins
    (lane rolls masked at segment boundaries with iota);
  * symmetric2's left-to-right dependency collapses to a segment-local
    cumulative min via the (min,+) prefix trick, computed with log2(L)
    masked rolls;
  * the (n-1, m-1) readout is a mask-accumulate, reduced per segment with
    one iota-built (BT*L, BT) 0/1 matmul.

Variable lengths come in as host-precomputed lane vectors (tl per lane,
end-column one-hots, column validity), so the kernel performs no gathers.
Sequence lengths are capped at L (pad/truncate on host; the recognize
pipeline already fps-subsamples long actions).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
SEG = 128  # lanes per target segment == max sequence length


def _shiftb(x, k, lane_mod):
    """Shift lanes right by k with BIG fill, segment-local."""
    if k == 0:
        return x
    rolled = pltpu.roll(x, k, 1)
    return jnp.where(lane_mod < k, BIG, rolled)


def _shift0(x, k, lane_mod):
    """Shift lanes right by k with 0 fill, segment-local."""
    if k == 0:
        return x
    rolled = pltpu.roll(x, k, 1)
    return jnp.where(lane_mod < k, 0., rolled)


def _dtw_kernel(q_ref, t_ref, nt_ref, ql_ref, tl_ref, end_ref,
                valid_ref, out_ref, *, step_pattern, bq, bt, seq_len,
                dim):
    lanes = bt * SEG
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, lanes), 1)
    lane_mod = lane % SEG

    t_flat = t_ref[:]            # (bt*L, D+1); last col is constant 1
    nt = nt_ref[:]               # (bq, bt*L), rows identical
    tl = tl_ref[:]               # (bq, bt*L) int32, tl per lane
    end_onehot = end_ref[:]      # (bq, bt*L) f32, 1 at column tl-1
    col_valid = valid_ref[:]     # (bq, bt*L) f32, 1 where lane_mod < tl
    ql = ql_ref[:]               # (bq, 1) int32

    valid = col_valid > 0
    # loop-carry init derived from an input tensor: a pure jnp.full carry
    # trips a mosaic relayout bug (replicated constant -> concrete layout)
    zeros_row = col_valid * 0.
    big_row = zeros_row + BIG

    def cost_row(i):
        # q rows are [-2*q_i, nq_i], t rows are [t_j, 1], so one matmul
        # yields nq - 2 q.t; adding nt gives the squared distance.
        qi = q_ref[i]            # (bq, D+1); leading-dim dynamic index
        dots = jax.lax.dot_general(
            qi, t_flat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, bt*L)
        sq = jnp.maximum(dots + nt, 0.)
        return jnp.where(valid, jnp.sqrt(sq), BIG)

    def accumulate(final, g, i):
        # contribute g at the end column only on each pair's last row
        contrib = g * end_onehot * ((i == ql - 1).astype(jnp.float32))
        return final + jnp.where(valid, contrib, 0.)

    if step_pattern == 'symmetricP2':

        def body(i, carry):
            g1, g2, g3, d1, d2, final = carry
            dj = cost_row(i)

            diag = _shiftb(g1, 1, lane_mod) + 2. * dj
            p1 = jnp.where(
                (i >= 2) & (lane_mod >= 3),
                _shiftb(g2, 3, lane_mod) + 2. * _shift0(d1, 2, lane_mod)
                + 2. * _shift0(dj, 1, lane_mod) + dj,
                BIG)
            p3 = jnp.where(
                (i >= 3) & (lane_mod >= 2),
                _shiftb(g3, 2, lane_mod) + 2. * _shift0(d2, 1, lane_mod)
                + 2. * d1 + dj,
                BIG)
            g = jnp.minimum(jnp.minimum(diag, p1), p3)
            g = jnp.where((i == 0) & (lane_mod == 0), dj, g)
            g = jnp.where(valid, jnp.minimum(g, BIG), BIG)
            return (g, g1, g2, dj, d1, accumulate(final, g, i))

        init = (big_row,) * 3 + (zeros_row,) * 2 + (zeros_row,)
        final = jax.lax.fori_loop(0, seq_len, body, init)[-1]

    else:  # symmetric2

        def cummin_seg(x):
            shift = 1
            while shift < SEG:
                x = jnp.minimum(x, _shiftb(x, shift, lane_mod))
                shift *= 2
            return x

        def cumsum_seg(x):
            shift = 1
            while shift < SEG:
                x = x + _shift0(x, shift, lane_mod)
                shift *= 2
            return x

        def body(i, carry):
            prev, final = carry
            dj = cost_row(i)
            dj0 = jnp.where(valid, dj, 0.)
            prev_shift = _shiftb(prev, 1, lane_mod)
            c = jnp.where(
                i == 0,
                jnp.where(lane_mod == 0, dj, BIG),
                jnp.minimum(prev_shift + 2. * dj, prev + dj))
            s = cumsum_seg(dj0)
            g = jnp.minimum(s + cummin_seg(c - s), BIG)
            g = jnp.where(valid, g, BIG)
            return (g, accumulate(final, g, i))

        init = (big_row, zeros_row)
        final = jax.lax.fori_loop(0, seq_len, body, init)[1]

    # segment-sum final lanes -> columns [j*bt, (j+1)*bt) of the (bq, T)
    # output row-block, via an iota-built 0/1 matmul carrying the dynamic
    # grid offset (avoids unaligned dynamic stores)
    j = pl.program_id(1)
    t_total = out_ref.shape[1]
    a = jax.lax.broadcasted_iota(jnp.int32, (lanes, t_total), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (lanes, t_total), 1)
    seg = (a // SEG + j * bt == b).astype(jnp.float32)
    contribution = jax.lax.dot_general(
        jnp.minimum(final, BIG), seg,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contribution


@functools.partial(jax.jit,
                   static_argnames=('step_pattern', 'bq', 'bt',
                                    'interpret'))
def _dtw_pallas(q, ql, t_flat, nt_lanes, tl_lanes, end_lanes,
                valid_lanes, step_pattern='symmetricP2', bq=8, bt=16,
                interpret=False):
    L, Q, D = q.shape
    T = t_flat.shape[0] // L
    assert Q % bq == 0 and T % bt == 0, (Q, T, bq, bt)

    kernel = functools.partial(
        _dtw_kernel, step_pattern=step_pattern, bq=bq, bt=bt, seq_len=L,
        dim=D)
    grid = (Q // bq, T // bt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, bq, D), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt * L, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bt * L), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bt * L), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bt * L), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, bt * L), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, T), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, T), jnp.float32),
        interpret=interpret,
    )(q, t_flat, nt_lanes, ql, tl_lanes, end_lanes, valid_lanes)


def dtw_matrix_pallas(queries, q_lens, targets, t_lens,
                      step_pattern='symmetricP2', bq=8, bt=16,
                      interpret=False):
    """All-pairs normalized DTW via the Pallas kernel.

    queries: (Q, L, D), targets: (T, L, D) with L == 128 (pad/truncate);
    returns (Q, T) float32 with +inf for slope-infeasible pairs.
    Q and T are padded up to block multiples internally.
    """
    queries = np.asarray(queries, np.float32)
    targets = np.asarray(targets, np.float32)
    q_lens = np.asarray(q_lens, np.int32)
    t_lens = np.asarray(t_lens, np.int32)
    Q0, L, D = queries.shape
    T0 = targets.shape[0]
    assert L == SEG, 'sequence axis must be padded to {}'.format(SEG)

    Q = -(-Q0 // bq) * bq
    T = -(-T0 // bt) * bt
    q = np.zeros((Q, L, D), np.float32)
    q[:Q0] = queries
    t = np.zeros((T, L, D), np.float32)
    t[:T0] = targets
    ql = np.ones(Q, np.int32)
    ql[:Q0] = q_lens
    tl = np.ones(T, np.int32)
    tl[:T0] = t_lens

    # augment: q rows [-2q, nq]; t rows [t, 1] (one-matmul sq distance)
    q_t = np.ascontiguousarray(q.transpose(1, 0, 2))  # (L, Q, D)
    nq_t = np.sum(q_t * q_t, axis=2, keepdims=True)   # (L, Q, 1)
    q_aug = np.concatenate([-2. * q_t, nq_t], axis=2)
    t_flat = t.reshape(T * L, D)
    t_aug = np.concatenate(
        [t_flat, np.ones((T * L, 1), np.float32)], axis=1)
    def rows(x):  # broadcast a lane vector to bq identical rows
        return np.ascontiguousarray(np.broadcast_to(x, (bq, T * L)))

    nt_lanes = rows(np.sum(t_flat * t_flat, axis=1))
    lane_mod = (np.arange(T * L) % SEG)
    tl_lane = np.repeat(tl, L)
    tl_lanes = rows(tl_lane.astype(np.int32))
    end_lanes = rows((lane_mod == tl_lane - 1).astype(np.float32))
    valid_lanes = rows((lane_mod < tl_lane).astype(np.float32))

    out = np.asarray(_dtw_pallas(
        q_aug, ql.reshape(-1, 1), t_aug, nt_lanes, tl_lanes, end_lanes,
        valid_lanes, step_pattern=step_pattern, bq=bq, bt=bt,
        interpret=interpret))
    raw = out[:Q0, :T0]
    norm = q_lens[:, None] + t_lens[None, :]
    result = raw / norm
    result[raw >= BIG * 0.5] = np.inf
    return result
