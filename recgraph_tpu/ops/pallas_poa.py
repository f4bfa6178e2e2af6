"""Pallas TPU kernel for the local-POA fill (mode 1).

Speed-of-light design (vs the XLA scan engine in poa_engine):

- the score matrix lives in a VMEM **ring buffer** of the last S graph
  rows, so the per-row predecessor gathers never touch HBM; S is a
  power of two >= the graph's maximum predecessor span (predecessor 0
  is the all-zero row in local mode and is special-cased, so source
  edges don't constrain S);
- HBM traffic per row is only the packed traceback write;
- the in-row L-dependency is a Hillis-Steele (max,+) prefix scan over
  lanes (log2(Lp) shifted maxes) — the closed form of
  m[j] = max(A[j], m[j-1]+gap) (see poa_engine docstring);
- grid = (batch_tiles, graph_rows); TPU grids run sequentially so the
  ring and the best-cell accumulators persist across the row sweep.

Same outputs/tie-breaking as poa_engine._fill_local (reference:
src/local_poa.rs:181-293), validated cell-exact by tests.
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

RING = 256  # must exceed the graph's max predecessor span (checked by caller)


def _prefix_max_chain(x, jcol, Lp):
    """Inclusive prefix max over lanes: x[j] = max_{k<=j} x[k]."""
    k = 1
    while k < Lp:
        sh = pltpu.roll(x, k, 1)
        x = jnp.where(jcol >= k, jnp.maximum(x, sh), x)
        k *= 2
    return x


def _local_kernel(
    pred_idx_ref,   # scalar prefetch i32[n, Pm]
    is_start_ref,   # scalar prefetch i32[n]
    gnode_ref,      # scalar prefetch i32[n]
    codes_ref,      # scalar prefetch i32[n]
    sub_ref,        # [7, Bt, Lp]   table[c][seq[j]]
    eq_ref,         # [7, Bt, Lp]   seq[j] == c
    gseq_ref,       # [Bt, Lp]      table[seq, '-']
    G_ref,          # [Bt, Lp]      cumsum(gseq)
    valid_ref,      # [Bt, Lp]      j < L
    packed_ref,     # out [1, Bt, Lp] (row-major layout [n, B, Lp])
    bv_ref,         # out [Bt, 1]
    bi_ref,         # out [Bt, 1]
    bj_ref,         # out [Bt, 1]
    ring,           # scratch [RING, Bt, Lp]
):
    i = pl.program_id(1)
    Bt, Lp = gseq_ref.shape
    Pm = pred_idx_ref.shape[1]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, Lp), 1)

    @pl.when(i == 0)
    def _():
        packed_ref[0] = jnp.zeros((Bt, Lp), jnp.int32)
        bv_ref[:, :] = jnp.zeros((Bt, 1), jnp.int32)
        bi_ref[:, :] = jnp.zeros((Bt, 1), jnp.int32)
        bj_ref[:, :] = jnp.zeros((Bt, 1), jnp.int32)
        ring[0] = jnp.zeros((Bt, Lp), jnp.int32)

    @pl.when(i > 0)
    def _():
        code_i = codes_ref[i]
        gnode_i = gnode_ref[i]
        is_start = is_start_ref[i] != 0
        subrow = sub_ref[code_i]
        match = eq_ref[code_i] != 0
        gseq = gseq_ref[:, :]
        G = G_ref[:, :]
        valid = valid_ref[:, :] != 0

        # predecessor sweep: running strict-> max keeps the first best,
        # matching the reference's ascending iteration (local_poa.rs:257-293)
        d_pre = jnp.full((Bt, Lp), NEG, jnp.int32)
        u_pre = jnp.full((Bt, Lp), NEG, jnp.int32)
        d_arg = jnp.zeros((Bt, Lp), jnp.int32)
        u_arg = jnp.zeros((Bt, Lp), jnp.int32)
        for p in range(Pm):
            pidx = pred_idx_ref[i, p]
            slot = jnp.maximum(pidx, 0) % RING
            prow = ring[slot]
            prow = jnp.where(pidx == 0, 0, prow)          # row 0 is all zeros
            ok = pidx >= 0
            upd = ok & (prow > u_pre)
            u_arg = jnp.where(upd, pidx, u_arg)
            u_pre = jnp.where(upd, prow, u_pre)
            prow_sh = pltpu.roll(prow, 1, 1)
            prow_sh = jnp.where(jcol == 0, NEG, prow_sh)
            upd = ok & (prow_sh > d_pre)
            d_arg = jnp.where(upd, pidx, d_arg)
            d_pre = jnp.where(upd, prow_sh, d_pre)

        # start-row quirk: running max seeded at 0/row-0
        d_val = jnp.where(is_start, jnp.maximum(d_pre, 0), d_pre) + subrow
        d_idx = jnp.where(is_start, jnp.where(d_pre > 0, d_arg, 0), d_arg)
        u_val = jnp.where(is_start, jnp.maximum(u_pre, 0), u_pre) + gnode_i
        u_idx = jnp.where(is_start, jnp.where(u_pre > 0, u_arg, 0), u_arg)

        # (max,+) prefix chain for the in-row L dependency
        A = jnp.maximum(jnp.maximum(d_val, u_val), 0)
        A = jnp.where(jcol == 0, 0, A)
        x = _prefix_max_chain(A - G, jcol, Lp)
        m_row = G + x
        m_row = jnp.where(valid, m_row, NEG)
        m_row = jnp.where(jcol == 0, 0, m_row)

        # directions (zero floor local_poa.rs:222-233; tie D >= U >= L)
        m_prev = pltpu.roll(m_row, 1, 1)
        m_prev = jnp.where(jcol == 0, NEG, m_prev)
        l_val = m_prev + gseq
        all_neg = (d_val < 0) & (u_val < 0) & (l_val < 0)
        d_ge_u = d_val >= u_val
        dirD = d_ge_u & (d_val >= l_val)
        dirU = (~d_ge_u) & (u_val >= l_val)
        dcode = jnp.where(
            dirD, jnp.where(match, D, LOW_D), jnp.where(dirU, U_DIR, L_DIR)
        )
        pred_sel = jnp.where(dirD, d_idx, jnp.where(dirU, u_idx, i))
        dcode = jnp.where(all_neg, O, dcode)
        pred_sel = jnp.where(all_neg, 0, pred_sel)
        border = (jcol == 0) | ~valid
        dcode = jnp.where(border, O, dcode)
        pred_sel = jnp.where(border, 0, pred_sel)
        packed_ref[0] = pred_sel * 16 + dcode

        # global best, strict > in row-major order
        row_masked = jnp.where(valid, m_row, NEG)
        rmax = jnp.max(row_masked, axis=1, keepdims=True)          # [Bt, 1]
        # first-occurrence argmax (int argmax is unsupported in Mosaic)
        rarg = jnp.min(
            jnp.where(row_masked == rmax, jcol, 1 << 28), axis=1, keepdims=True
        )
        upd = rmax > bv_ref[:, :]
        bv_ref[:, :] = jnp.where(upd, rmax, bv_ref[:, :])
        bi_ref[:, :] = jnp.where(upd, i, bi_ref[:, :])
        bj_ref[:, :] = jnp.where(upd, rarg, bj_ref[:, :])

        ring[i % RING] = m_row


@functools.partial(jax.jit, static_argnames=("n", "Bt", "interpret"))
def _fill_local_pallas(
    pred_idx, is_start, gnode, codes, sub, eq, gseq, G, valid,
    n, Bt, interpret=False,
):
    B, Lp = gseq.shape
    grid = (B // Bt, n - 1)
    out = pl.pallas_call(
        _local_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((7, Bt, Lp), lambda b, i, *_: (0, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((7, Bt, Lp), lambda b, i, *_: (0, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, Lp), lambda b, i, *_: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, Lp), lambda b, i, *_: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, Lp), lambda b, i, *_: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, Bt, Lp), lambda b, i, *_: (i, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 1), lambda b, i, *_: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 1), lambda b, i, *_: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 1), lambda b, i, *_: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((RING, Bt, Lp), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, B, Lp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(pred_idx, is_start, gnode, codes, sub, eq, gseq, G, valid)
    packed, bv, bi, bj = out
    packed = packed.at[n - 1].set(0)  # row n-1 ('F') is never filled
    return bv[:, 0], bi[:, 0], bj[:, 0], packed  # packed is [n, B, Lp]


def max_pred_span(g) -> int:
    """Largest i - pred over explicit predecessors, ignoring pred 0."""
    span = 1
    for i, preds in g.preds.items():
        if i >= g.n - 1:
            continue
        for p in preds:
            if p != 0:
                span = max(span, i - p)
    return span


def fill_local(dg, table, seq, L, Bt=None, interpret=False):
    """Drop-in replacement for poa_engine._fill_local via Pallas.

    Returns (score[B], best_i[B], best_j[B], packed[B, n, Lp]).
    Caller must ensure max_pred_span(graph) < RING.
    """
    B, Lp = seq.shape
    if Bt is None:
        Bt = min(B, 32)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    n = dg.n
    codes7 = jnp.arange(7, dtype=jnp.int32)
    sub = table[codes7][:, seq]                    # [7, B, Lp]
    eq = (seq[None, :, :] == codes7[:, None, None]).astype(jnp.int32)
    gseq = table[seq, GAP]
    G = jnp.cumsum(gseq, axis=1).astype(jnp.int32)
    jcol = jnp.arange(Lp, dtype=jnp.int32)
    valid = (jcol[None, :] < L[:, None]).astype(jnp.int32)
    gnode = table[dg.codes, GAP]
    return _fill_local_pallas(
        dg.pred_idx, dg.node_start.astype(jnp.int32), gnode, dg.codes,
        sub, eq, gseq, G, valid, n=n, Bt=Bt, interpret=interpret,
    )
