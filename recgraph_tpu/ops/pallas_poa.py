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
    pred_idx_ref,   # scalar prefetch i32[n * Pm] (flat: 2-D SMEM pads to 128 lanes)
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
    Pm = pred_idx_ref.shape[0] // codes_ref.shape[0]
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
            pidx = pred_idx_ref[i * Pm + p]
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
    tT = table.T                                   # (seq, lnz) order
    sub = tT[codes7][:, seq]                       # [7, B, Lp]
    eq = (seq[None, :, :] == codes7[:, None, None]).astype(jnp.int32)
    gseq = table[seq, GAP]
    G = jnp.cumsum(gseq, axis=1).astype(jnp.int32)
    jcol = jnp.arange(Lp, dtype=jnp.int32)
    valid = (jcol[None, :] < L[:, None]).astype(jnp.int32)
    gnode = tT[dg.codes, GAP]
    return _fill_local_pallas(
        dg.pred_idx.reshape(-1), dg.node_start.astype(jnp.int32), gnode,
        dg.codes, sub, eq, gseq, G, valid, n=n, Bt=Bt, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# mode 0 — banded global POA (global_abpoa.rs:260-427) as a Pallas kernel
# ---------------------------------------------------------------------------


def _make_global_kernel(sink_rows: tuple, Lp: int):
    """Build the banded-global kernel for a static sink list (F's preds).

    Extra packed lanes: lane Lpo-8 stores the row's band start, lane
    Lpo-7 the band end (avoids separate non-tileable outputs).
    """
    num_sinks = len(sink_rows)

    def kernel(
        pred_idx_ref,   # i32[n * Pm] (flat)
        is_start_ref,   # i32[n]
        gnode_ref,      # i32[n]
        codes_ref,      # i32[n]
        r_ref,          # i32[n]     utils::set_r_values
        minp_ref,       # i32[n]     min predecessor / i-1
        sink_ord_ref,   # i32[n]     ordinal among F's preds, -1 otherwise
        sub_ref,        # [7, Bt, Lpo]
        eq_ref,         # [7, Bt, Lpo]
        gseq_ref,       # [Bt, Lpo]  table[seq, '-']
        gcol0_ref,      # [Bt, Lpo]  table['-', seq] (row 0)
        aux_ref,        # [Bt, 128]  lane0=L, lane1=bta
        packed_ref,     # out [1, Bt, Lpo]
        score_ref,      # out [Bt, 1]
        lrow_ref,       # out [Bt, 1]
        lcol_ref,       # out [Bt, 1]
        ring,           # scratch [RING, Bt, Lpo]
        row0_s,         # scratch [8, Bt, Lpo] (slot 0 = row 0, pinned)
        lefts_s,        # scratch [n_pad, Bt]
        rights_s,       # scratch [n_pad, Bt]
        bsp_s,          # scratch [n_pad, Bt]
        sink_v,         # scratch [8 * ceil(S/8), Bt]  sink values
        sink_c,         # scratch [...same]            sink last columns
    ):
        i = pl.program_id(1)
        Bt, Lpo = gseq_ref.shape
        Pm = pred_idx_ref.shape[0] // codes_ref.shape[0]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, Lpo), 1)
        L = aux_ref[:, 0:1]                               # [Bt, 1]
        bta = aux_ref[:, 1:2]
        NEGc = jnp.int32(NEG)

        def lane_at(row, col):
            """row[b, col[b]] via a masked lane reduction -> [Bt, 1]."""
            return jnp.max(jnp.where(jcol == col, row, NEGc), axis=1, keepdims=True)

        # ---- adaptive band (utils.rs:17-72) ----
        ms = jnp.full((Bt, 1), 1 << 28, jnp.int32)
        me = jnp.full((Bt, 1), NEG, jnp.int32)
        for p in range(Pm):
            pidx = pred_idx_ref[i * Pm + p]
            ok = pidx >= 0
            pb = bsp_s[pl.ds(jnp.maximum(pidx, 0), 1), :]  # [1, Bt]
            pb = jnp.transpose(pb)                          # -> [Bt, 1]
            ms = jnp.where(ok & (pb < ms), pb, ms)
            me = jnp.where(ok & (pb > me), pb, me)
        ms = jnp.where(i == 0, 0, ms + 1)
        me = jnp.where(i == 0, 0, me + 1)
        r_i = r_ref[i]
        left = jnp.maximum(0, jnp.minimum(ms, L - r_i - bta))
        right = jnp.where(
            L > r_i,
            jnp.minimum(L, jnp.maximum(me, L - r_i) + bta),
            jnp.minimum(L, me + bta),
        )
        in_band = (left <= jcol) & (jcol < right)

        code_i = codes_ref[i]
        gnode_i = gnode_ref[i]
        minp = minp_ref[i]
        subrow = sub_ref[code_i]
        match = eq_ref[code_i] != 0
        gseq = gseq_ref[:, :]

        def pred_row(pidx):
            slot = jnp.maximum(pidx, 0) % RING
            prow = ring[slot]
            return jnp.where(pidx == 0, row0_s[0], prow)

        @pl.when(i == 0)
        def _():
            # row 0: L-chain of gap('-', seq[j]) within [0, right0)
            G0 = _plane_cumsum(gcol0_ref[:, :], jcol, Lpo)
            m0 = jnp.where(in_band, G0, NEGc)
            m0 = jnp.where(jcol == 0, 0, m0)
            row0_s[0] = m0
            ring[0] = m0
            masked = jnp.where(in_band, m0, NEGc)
            rmax = jnp.max(masked, axis=1, keepdims=True)
            bsp0 = jnp.max(
                jnp.where((masked == rmax) & in_band, jcol, -1),
                axis=1, keepdims=True,
            )
            lefts_s[pl.ds(0, 1), :] = jnp.transpose(left)
            rights_s[pl.ds(0, 1), :] = jnp.transpose(right)
            bsp_s[pl.ds(0, 1), :] = jnp.transpose(bsp0)
            pk = jnp.where(in_band & (jcol > 0), jnp.int32(L_DIR), jnp.int32(O))
            pk = jnp.where(jcol == Lpo - 8, left, pk)
            pk = jnp.where(jcol == Lpo - 7, right, pk)
            packed_ref[0] = pk
            score_ref[:, :] = jnp.zeros((Bt, 1), jnp.int32)
            lrow_ref[:, :] = jnp.zeros((Bt, 1), jnp.int32)
            lcol_ref[:, :] = jnp.zeros((Bt, 1), jnp.int32)

        @pl.when(i > 0)
        def _():
            # ---- predecessor candidates with band coverage ----
            u_pre = jnp.full((Bt, Lpo), NEG, jnp.int32)
            u_arg = jnp.zeros((Bt, Lpo), jnp.int32)
            d_pre = jnp.full((Bt, Lpo), NEG, jnp.int32)
            d_arg = jnp.zeros((Bt, Lpo), jnp.int32)
            for p in range(Pm):
                pidx = pred_idx_ref[i * Pm + p]
                ok = pidx >= 0
                prow = pred_row(pidx)
                pl_ = jnp.transpose(lefts_s[pl.ds(jnp.maximum(pidx, 0), 1), :])
                pr_ = jnp.transpose(rights_s[pl.ds(jnp.maximum(pidx, 0), 1), :])
                cov_u = ok & (pl_ <= jcol) & (jcol < pr_)
                v = jnp.where(cov_u, prow, NEGc)
                upd = v > u_pre
                u_arg = jnp.where(upd, pidx, u_arg)
                u_pre = jnp.where(upd, v, u_pre)
                prow_sh = pltpu.roll(prow, 1, 1)
                cov_d = ok & (pl_ < jcol) & (jcol <= pr_)
                v = jnp.where(cov_d & (jcol > 0), prow_sh, NEGc)
                upd = v > d_pre
                d_arg = jnp.where(upd, pidx, d_arg)
                d_pre = jnp.where(upd, v, d_pre)

            has_u = u_pre > NEGc // 2
            u_val = jnp.where(has_u, u_pre + gnode_i, gnode_i * (i + jcol))
            u_pred = jnp.where(has_u, u_arg, minp)
            has_d = d_pre > NEGc // 2
            d_fb = gnode_i * (i + left)                    # [Bt, 1]
            d_val = jnp.where(has_d, d_pre + subrow, d_fb)
            d_pred = jnp.where(has_d, d_arg, minp)

            # ---- chain restart values (global_abpoa.rs:74-85,326-378) ----
            A = jnp.maximum(d_val, u_val)
            gseq_left = lane_at(gseq, left)
            l_fb = gseq_left * (i + left)                  # [Bt, 1]
            minp_row = pred_row(minp)
            lefts_minp = jnp.transpose(lefts_s[pl.ds(minp, 1), :])
            base0 = lane_at(minp_row, lefts_minp) + gnode_i
            is_left = jcol == left
            A_left = jnp.where(
                left == 0, base0, jnp.maximum(lane_at(A, left), l_fb)
            )
            A = jnp.where(is_left, A_left, A)
            A = jnp.where(in_band, A, NEGc)

            G = _plane_cumsum(gseq, jcol, Lpo)
            x = _prefix_max_chain(A - G, jcol, Lpo)
            m_row = G + x
            m_row = jnp.where(in_band, m_row, NEGc)

            masked = jnp.where(in_band, m_row, NEGc)
            rmax = jnp.max(masked, axis=1, keepdims=True)
            bsp_i = jnp.max(
                jnp.where((masked == rmax) & in_band, jcol, -1),
                axis=1, keepdims=True,
            )

            # ---- directions (utils.rs:129-140, D >= U >= L) ----
            m_prev = pltpu.roll(m_row, 1, 1)
            m_prev = jnp.where(jcol == 0, NEGc, m_prev)
            l_val = m_prev + gseq
            l_val = jnp.where(is_left, jnp.where(left == 0, NEGc, l_fb), l_val)
            l_pred = jnp.where(jcol > left, i, minp)
            d_ge_u = d_val >= u_val
            dirD = d_ge_u & (d_val >= l_val)
            dirU = (~d_ge_u) & (u_val >= l_val)
            dcode = jnp.where(
                dirD, jnp.where(match, D, LOW_D), jnp.where(dirU, U_DIR, L_DIR)
            )
            pred_sel = jnp.where(dirD, d_pred, jnp.where(dirU, u_pred, l_pred))
            is_base = is_left & (left == 0)
            dcode = jnp.where(is_base, U_DIR, dcode)
            pred_sel = jnp.where(is_base, minp, pred_sel)
            pk = jnp.where(in_band, pred_sel * 16 + dcode, 0)
            pk = jnp.where(jcol == Lpo - 8, left, pk)
            pk = jnp.where(jcol == Lpo - 7, right, pk)
            packed_ref[0] = pk

            ring[i % RING] = m_row
            lefts_s[pl.ds(i, 1), :] = jnp.transpose(left)
            rights_s[pl.ds(i, 1), :] = jnp.transpose(right)
            bsp_s[pl.ds(i, 1), :] = jnp.transpose(bsp_i)

            # ---- sink capture + final selection (":397-405") ----
            so = sink_ord_ref[i]

            @pl.when(so >= 0)
            def _():
                sink_v[pl.ds(so, 1), :] = jnp.transpose(lane_at(m_row, right - 1))
                sink_c[pl.ds(so, 1), :] = jnp.transpose(right - 1)

            @pl.when(i == pl.num_programs(1) - 1)
            def _():
                # candidates in reference order: row n-2 seeds, then F's
                # preds ascending, strict > (first best wins ties)
                best = lane_at(m_row, right - 1)
                brow = jnp.full((Bt, 1), i, jnp.int32)
                bcol = right - 1
                for k in range(num_sinks):
                    v = jnp.transpose(sink_v[pl.ds(k, 1), :])
                    c = jnp.transpose(sink_c[pl.ds(k, 1), :])
                    upd = v > best
                    best = jnp.where(upd, v, best)
                    brow = jnp.where(upd, jnp.int32(sink_rows[k]), brow)
                    bcol = jnp.where(upd, c, bcol)
                score_ref[:, :] = best
                lrow_ref[:, :] = brow
                lcol_ref[:, :] = bcol

    return kernel


_global_kernel_cache: dict = {}


def _fill_global_pallas(
    pred_idx, is_start, gnode, codes, r_values, min_pred, sink_ord,
    sub, eq, gseq, gcol0, aux, sink_rows, n, Bt, interpret=False,
):
    B, Lpo = gseq.shape
    key = (sink_rows, Lpo, n, Bt, B, interpret)
    fn = _global_kernel_cache.get(key)
    if fn is None:
        kernel = _make_global_kernel(sink_rows, Lpo - 8)
        n_pad = (n + 7) // 8 * 8
        sink_pad = (len(sink_rows) + 7) // 8 * 8
        grid = (B // Bt, n - 1)
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=7,
                    grid=grid,
                    in_specs=[
                        pl.BlockSpec((7, Bt, Lpo), lambda b, i, *_: (0, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((7, Bt, Lpo), lambda b, i, *_: (0, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lpo), lambda b, i, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lpo), lambda b, i, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 128), lambda b, i, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec((1, Bt, Lpo), lambda b, i, *_: (i, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, i, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, i, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, i, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((RING, Bt, Lpo), jnp.int32),
                        pltpu.VMEM((8, Bt, Lpo), jnp.int32),
                        pltpu.VMEM((n_pad, Bt), jnp.int32),
                        pltpu.VMEM((n_pad, Bt), jnp.int32),
                        pltpu.VMEM((n_pad, Bt), jnp.int32),
                        pltpu.VMEM((sink_pad, Bt), jnp.int32),
                        pltpu.VMEM((sink_pad, Bt), jnp.int32),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n, B, Lpo), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _global_kernel_cache[key] = fn
    packed, score, lrow, lcol = fn(
        pred_idx, is_start, gnode, codes, r_values, min_pred, sink_ord,
        sub, eq, gseq, gcol0, aux,
    )
    packed = packed.at[n - 1].set(0)
    return score[:, 0], lrow[:, 0], lcol[:, 0], packed


def fill_global(dg, table, seq, L, bta, Bt=None, interpret=False):
    """Pallas banded global-POA fill (mode 0).

    Returns (score[B], last_row[B], last_col_abs[B], packed[n, B, Lpo])
    where packed lanes [0, Lp) are (pred, dir) cells and lanes
    Lpo-8 / Lpo-7 carry the per-row band bounds.
    """
    B, Lp = seq.shape
    if Bt is None:
        Bt = min(B, 32)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    n = dg.n
    Lpo = Lp + 8
    pad = jnp.zeros((B, 8), dtype=jnp.int32)
    codes7 = jnp.arange(7, dtype=jnp.int32)
    sub = jnp.concatenate(
        [table[codes7][:, seq], jnp.zeros((7, B, 8), jnp.int32)], axis=2
    )
    eq = jnp.concatenate(
        [(seq[None] == codes7[:, None, None]).astype(jnp.int32),
         jnp.zeros((7, B, 8), jnp.int32)], axis=2
    )
    gseq = jnp.concatenate([table[seq, GAP], pad], axis=1)
    gcol0 = jnp.concatenate([table[GAP, seq], pad], axis=1)
    aux = jnp.zeros((B, 128), jnp.int32)
    aux = aux.at[:, 0].set(L).at[:, 1].set(jnp.asarray(bta, jnp.int32))
    sink_ord = np.full(n, -1, dtype=np.int32)
    for k, srow in enumerate(dg.sink_rows):
        sink_ord[srow] = k
    gnode = table[dg.codes, GAP]
    return _fill_global_pallas(
        dg.pred_idx.reshape(-1), dg.node_start.astype(jnp.int32), gnode,
        dg.codes, dg.r_values, dg.min_pred, jnp.asarray(sink_ord),
        sub, eq, gseq, gcol0, aux,
        sink_rows=dg.sink_rows, n=n, Bt=Bt, interpret=interpret,
    )


def _plane_cumsum(x, jcol, Lp):
    """Inclusive prefix sum over lanes via log-shift adds."""
    k = 1
    while k < Lp:
        sh = pltpu.roll(x, k, 1)
        x = jnp.where(jcol >= k, x + sh, x)
        k *= 2
    return x
