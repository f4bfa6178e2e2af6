"""Scores-only local-POA fill (v3) + direction-recompute walker.

PERF.md lever 3: the v2 kernel spends ~25 of ~100 vector ops per row
deriving and packing directions that the traceback reads back later.
v3 drops all of it — the kernel emits only the score planes (the DP
values), and the on-device walker re-derives each step's direction
from the scores with exactly the fill's tie rules (the same
recompute-traceback pattern the pathwise modes use, and the reference
itself uses for pathwise: pathwise_alignment_output.rs:7-184).

Exactness: the stored direction in the plane-based path is a pure
function of (d, u, l) at fill time; recomputing d/u/l from the final
score planes yields the same values, so the derived walk is identical
(validated against the v2/packed path by tests).

Opt-in until A/B-benched on hardware (RECGRAPH_V3=1 or engine call).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring import GAP
from .poa_engine import NEG, O, D, LOW_D, L_DIR, U_DIR
from .pallas_poa import RING, _prefix_max_chain


def _make_scores_kernel(R: int):
    def kernel(
        pred_idx_ref,   # i32[n * Pm] (flat)
        is_start_ref,   # i32[n]
        gnode_ref,      # i32[n]
        codes_ref,      # i32[n]
        nrows_ref,      # i32[1]
        sub_ref,        # [7, Bt, Lp]  table.T[c][seq[j]]
        gseq_ref,       # [Bt, Lp]
        G_ref,          # [Bt, Lp]
        valid_ref,      # [Bt, Lp]
        m_ref,          # out [R, Bt, Lp]
        bv_ref,         # out [Bt, 1]
        bi_ref,         # out [Bt, 1]
        bj_ref,         # out [Bt, 1]
        ring,           # scratch [RING, Bt, Lp]
        acc,            # scratch [2, Bt, Lp]
    ):
        step = pl.program_id(1)
        Bt, Lp = gseq_ref.shape
        Pm = pred_idx_ref.shape[0] // codes_ref.shape[0]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, Lp), 1)
        G = G_ref[:, :]
        valid = valid_ref[:, :] != 0
        nrows = nrows_ref[0]

        @pl.when(step == 0)
        def _():
            bv_ref[:, :] = jnp.zeros((Bt, 1), jnp.int32)
            bi_ref[:, :] = jnp.zeros((Bt, 1), jnp.int32)
            bj_ref[:, :] = jnp.zeros((Bt, 1), jnp.int32)

        for r in range(R):
            i = step * R + r

            @pl.when(i == 0)
            def _():
                m_ref[r] = jnp.zeros((Bt, Lp), jnp.int32)
                ring[0] = jnp.zeros((Bt, Lp), jnp.int32)

            @pl.when((i > 0) & (i < nrows))
            def _():
                code_i = codes_ref[i]
                gnode_i = gnode_ref[i]
                subrow = sub_ref[code_i]
                is_start = is_start_ref[i] != 0

                @pl.when(jnp.logical_not(is_start))
                def _():
                    prow = ring[(i - 1) % RING]
                    acc[1] = prow
                    prow_sh = pltpu.roll(prow, 1, 1)
                    acc[0] = jnp.where(jcol == 0, NEG, prow_sh)

                @pl.when(is_start)
                def _():
                    acc[0] = jnp.full((Bt, Lp), NEG, jnp.int32)
                    acc[1] = jnp.full((Bt, Lp), NEG, jnp.int32)
                    for p in range(Pm):
                        pidx = pred_idx_ref[i * Pm + p]

                        @pl.when(pidx >= 0)
                        def _():
                            prow = ring[jnp.maximum(pidx, 0) % RING]
                            prow = jnp.where(pidx == 0, 0, prow)
                            acc[1] = jnp.maximum(acc[1], prow)
                            prow_sh = pltpu.roll(prow, 1, 1)
                            prow_sh = jnp.where(jcol == 0, NEG, prow_sh)
                            acc[0] = jnp.maximum(acc[0], prow_sh)

                d_val = jnp.where(is_start, jnp.maximum(acc[0], 0), acc[0]) + subrow
                u_val = jnp.where(is_start, jnp.maximum(acc[1], 0), acc[1]) + gnode_i
                A = jnp.maximum(jnp.maximum(d_val, u_val), 0)
                A = jnp.where(jcol == 0, 0, A)
                x = _prefix_max_chain(A - G, jcol, Lp)
                m_row = G + x
                m_row = jnp.where(valid, m_row, NEG)
                m_row = jnp.where(jcol == 0, 0, m_row)
                m_ref[r] = m_row

                row_masked = jnp.where(valid, m_row, NEG)
                rmax = jnp.max(row_masked, axis=1, keepdims=True)
                rarg = jnp.min(
                    jnp.where(row_masked == rmax, jcol, 1 << 28),
                    axis=1, keepdims=True,
                )
                upd = rmax > bv_ref[:, :]
                bv_ref[:, :] = jnp.where(upd, rmax, bv_ref[:, :])
                bi_ref[:, :] = jnp.where(upd, i, bi_ref[:, :])
                bj_ref[:, :] = jnp.where(upd, rarg, bj_ref[:, :])

                ring[i % RING] = m_row

            @pl.when(i >= nrows)
            def _():
                m_ref[r] = jnp.zeros((Bt, Lp), jnp.int32)

    return kernel


_cache: dict = {}


def fill_local_scores(dg, table, seq, L, Bt=None, R=8, interpret=False):
    """Scores-only v3 fill.

    Returns (score[B], best_i[B], best_j[B], m[n_pad, B, Lp]).
    """
    B, Lp = seq.shape
    if Bt is None:
        Bt = min(B, 32)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    n = dg.n
    steps = -(-(n - 1) // R)
    n_pad = steps * R
    key = (n, Lp, Bt, R, B, interpret)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_scores_kernel(R)
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=5,
                    grid=(B // Bt, steps),
                    in_specs=[
                        pl.BlockSpec((7, Bt, Lp), lambda b, s, *_: (0, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lp), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lp), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lp), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec((R, Bt, Lp), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((RING, Bt, Lp), jnp.int32),
                        pltpu.VMEM((2, Bt, Lp), jnp.int32),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, B, Lp), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _cache[key] = fn
    codes7 = jnp.arange(7, dtype=jnp.int32)
    tT = table.T
    sub = tT[codes7][:, seq]
    gseq = table[seq, GAP]
    G = jnp.cumsum(table[seq, GAP], axis=1).astype(jnp.int32)
    jcol = jnp.arange(Lp, dtype=jnp.int32)
    valid = (jcol[None, :] < L[:, None]).astype(jnp.int32)
    gnode = tT[dg.codes, GAP]
    nrows = jnp.asarray([n - 1], dtype=jnp.int32)
    m, bv, bi, bj = fn(
        dg.pred_idx.reshape(-1), dg.node_start.astype(jnp.int32), gnode,
        dg.codes, nrows, sub, gseq, G, valid,
    )
    return bv[:, 0], bi[:, 0], bj[:, 0], m


@functools.partial(jax.jit, static_argnames=("max_steps",))
def walk_local_scores(m, seq, table, node_start, codes, pred_idx,
                      best_i, best_j, max_steps):
    """Direction-recompute traceback over score planes (mode 1).

    m: int32[n_pad, B, Lp] (batch axis 1).  Recomputes the fill's
    d/u/l (including the start-row first-best quirk,
    local_poa.rs:257-293) at each step and emits the same walk the
    packed-plane path produces.
    """
    n_pad, B, Lp = m.shape
    mf = jnp.moveaxis(m, 1, 0).reshape(B, n_pad * Lp)
    bidx = jnp.arange(B)
    Pm = pred_idx.shape[1]
    tT = table.T

    def at(i, j):
        # out-of-range guards: col < 0 reads are masked by callers
        idx = i * Lp + jnp.maximum(j, 0)
        v = jnp.take_along_axis(mf, idx[:, None], axis=1)[:, 0]
        return jnp.where(j >= 0, v, NEG)

    def body(_, st):
        row, col, k, done, dirs, rows = st
        border = (row == 0) | (col == 0)
        active = ~done & ~border
        is_start = node_start[row]
        code_i = codes[row]
        seq_j = jnp.take_along_axis(seq, jnp.maximum(col, 0)[:, None], 1)[:, 0]
        sub = tT[code_i, seq_j]
        gnode = tT[code_i, GAP]
        gseq = table[seq_j, GAP]

        d_pre = jnp.full((B,), NEG, jnp.int32)
        u_pre = jnp.full((B,), NEG, jnp.int32)
        d_arg = jnp.zeros((B,), jnp.int32)
        u_arg = jnp.zeros((B,), jnp.int32)
        for p in range(Pm):
            pidx = pred_idx[row, p]
            ok = pidx >= 0
            ps = jnp.maximum(pidx, 0)
            pv = jnp.where(pidx == 0, 0, at(ps, col))
            upd = ok & (pv > u_pre)
            u_arg = jnp.where(upd, pidx, u_arg)
            u_pre = jnp.where(upd, pv, u_pre)
            pv_sh = jnp.where(pidx == 0, jnp.where(col - 1 >= 0, 0, NEG), at(ps, col - 1))
            upd = ok & (pv_sh > d_pre)
            d_arg = jnp.where(upd, pidx, d_arg)
            d_pre = jnp.where(upd, pv_sh, d_pre)

        d_val = jnp.where(is_start, jnp.maximum(d_pre, 0), d_pre) + sub
        u_val = jnp.where(is_start, jnp.maximum(u_pre, 0), u_pre) + gnode
        d_idx = jnp.where(is_start, jnp.where(d_pre > 0, d_arg, 0), row - 1)
        u_idx = jnp.where(is_start, jnp.where(u_pre > 0, u_arg, 0), row - 1)
        l_val = at(row, col - 1) + gseq

        all_neg = (d_val < 0) & (u_val < 0) & (l_val < 0)
        d_ge_u = d_val >= u_val
        dirD = d_ge_u & (d_val >= l_val)
        dirU = (~d_ge_u) & (u_val >= l_val)
        match = seq_j == code_i
        code = jnp.where(dirD, jnp.where(match, D, LOW_D),
                         jnp.where(dirU, U_DIR, L_DIR))

        emit = active & ~all_neg
        done_new = done | border | all_neg
        dirs = dirs.at[bidx, k].set(jnp.where(emit, code, dirs[bidx, k]))
        rows = rows.at[bidx, k].set(jnp.where(emit, row, rows[bidx, k]))
        row = jnp.where(emit & (dirD | dirU),
                        jnp.where(dirD, d_idx, u_idx), row)
        col = jnp.where(emit & ~dirU, col - 1, col)
        k = k + emit.astype(jnp.int32)
        return row, col, k, done_new, dirs, rows

    z = jnp.zeros((B,), jnp.int32)
    dirs0 = jnp.full((B, max_steps), -1, jnp.int32)
    rows0 = jnp.zeros((B, max_steps), jnp.int32)
    st = (best_i, best_j, z, jnp.zeros((B,), bool), dirs0, rows0)
    row, col, k, done, dirs, rows = jax.lax.fori_loop(0, max_steps, body, st)
    return dirs, rows, k, row, col
