"""Affine-gap global-POA Pallas fill (mode 2) — Gotoh on the banded DAG.

Same recurrence and outputs as `poa_gap_engine._fill_gap_global`
(gap_global_abpoa.rs:11-250) with the v2-global kernel's structure
(pallas_poa_global2.py: 128-aligned lanes, non-start fast path, R-row
unroll, int16 rings).  The one new idea is the in-row solve:

The XLA engine runs a 2-state (max,+) associative scan for the coupled
    x[j] = max(x[j-1] + e, m[j-1] + o + e),   m[j] = max(c[j], x[j]).
With o <= 0 (the reference's penalties are non-positive), opening a
gap FROM a gap cell is dominated by extending it:
    x[k] + o + e*(j-k)  <=  x[k] + e*(j-k),
so x[j] closes over the plain-cell candidates only:
    x[j] = e*j + cummax_{left <= k < j} S[k],
    S[k] = c[k] + o - e*k   (k > left),
    S[left] = max(m_left + o, x_left) - e*left  (band-start state),
one linear radix-4 lane chain — identical integer values, same tie
semantics (directions re-derive from values exactly as the XLA
engine, including the mode-2 D/L/U cascade and the out-of-range 'u'
quirk, gap_global_abpoa.rs:143-195,153-157).

Cross-row Y candidates need a second ring (y values) and a
first-best sweep over (m[p]+o, y[p]) per covering predecessor; the
fast path reads both from the previous row's scratch.

Pinned bit-exact vs the XLA engine by tests/test_pallas_gap.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .poa_engine import (
    NEG, O, D, LOW_D, L_DIR, U_DIR, X_DIR, Y_DIR, LOW_U,
)
from .pallas_poa import RING

VMEM_BUDGET = 14 * 1024 * 1024
RADIX = 4


def _chain_radix(x, jcol, Lp):
    k = 1
    while k < Lp:
        cands = []
        for m in range(1, RADIX):
            d = m * k
            if d < Lp:
                cands.append(jnp.where(jcol >= d, pltpu.roll(x, d, 1), NEG))
        for c in cands:
            x = jnp.maximum(x, c)
        k *= RADIX
    return x


def _make_kernel(sink_rows, R: int, n: int, ring16: bool, Lb: int,
                 ringc: int, strip: frozenset = frozenset()):
    """strip: TIMING-ONLY ablations (results wrong) — 'chain' (skip the
    in-row (max,+) solve), 'band' (fixed full band, no pred-bsp math),
    'sweep' (skip the start-row pred sweep), 'dirs' (skip the three
    direction-plane packings).  Used by tools/ablate_gap_global.py to
    locate the kernel's floor (the global2/v4 strip playbook, PERF.md).
    Unlike global2 there is no 'edges' knob: this kernel was written
    extraction-free from the start (the r4 edges lesson)."""
    num_sinks = len(sink_rows)
    rdt = jnp.int16 if ring16 else jnp.int32

    def kernel(
        pred_idx_ref,   # i32[n * Pm]
        pred_rank_ref,  # i32[n * Pm] compact end rank per predecessor
        erank_ref,      # i32[n]      end rank of row i (-1 if not an end)
        is_start_ref,   # i32[n]
        codes_ref,      # i32[n]
        r_ref,          # i32[n]
        minp_ref,       # i32[n]
        sink_ord_ref,   # i32[n]
        oe_ref,         # i32[2]  (o, e)
        sub_ref,        # [7, Bt, Lpo]
        seqc_ref,       # [Bt, Lpo]  read codes (-1 pad)
        aux_ref,        # [Bt, 128]  lane0=L, lane1=bta
        packed_ref,     # out [R, Bt, Lpo]
        packedx_ref,    # out [R, Bt, Lpo]
        packedy_ref,    # out [R, Bt, Lpo]
        score_ref,      # out [Bt, 1]
        lrow_ref,       # out [Bt, 1]
        lcol_ref,       # out [Bt, 1]
        ring_m,         # scratch [RING, Bt, Lpo] (rdt)
        ring_y,         # scratch [RING, Bt, Lpo] (rdt)
        row0_s,         # scratch [Bt, Lpo]  (row 0: m == y)
        prev_m,         # scratch [Bt, Lpo] i32
        prev_y,         # scratch [Bt, Lpo] i32
        sweep_s,        # scratch [6, Bt, Lpo]
        lr_s,           # scratch [n_scr, Bt]  left*32768 + right
        bsp_s,          # scratch [n_scr, Bt]
        sink_v,         # scratch [8*ceil(S/8), Bt]
        sink_c,         # scratch [...same]
    ):
        step = pl.program_id(1)
        Bt, Lpo = aux_ref.shape[0], sub_ref.shape[2]
        Pm = pred_idx_ref.shape[0] // codes_ref.shape[0]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, Lpo), 1)
        L = aux_ref[:, 0:1]
        bta = aux_ref[:, 1:2]
        o = oe_ref[0]
        e = oe_ref[1]
        NEGc = jnp.int32(NEG)

        def lane_at(row, col):
            return jnp.max(
                jnp.where(jcol == col, row, NEGc), axis=1, keepdims=True
            )

        @pl.when(step == 0)
        def _():
            # row 0 (gap_global_abpoa.rs:60-66): m = y = o + e*j, 0 at 0
            row0_s[:, :] = jnp.where(jcol == 0, 0, o + e * jcol)

        row0 = row0_s[:, :]

        for r in range(R):
            i = step * R + r
            ii = jnp.minimum(i, n - 1)
            live = i < n - 1

            # ---- adaptive band (same as mode 0) ----
            is_start = (is_start_ref[ii] != 0) & (i > 0) & live
            if "band" in strip:   # timing-only: fixed full band
                left = jnp.zeros((Bt, 1), jnp.int32)
                right = L
            else:
                pb_prev = jnp.transpose(
                    bsp_s[pl.ds(jnp.maximum(i - 1, 0), 1), :]
                )
                ms_s = jnp.full((Bt, 1), 1 << 28, jnp.int32)
                me_s = jnp.full((Bt, 1), NEG, jnp.int32)
                for p in range(Pm):
                    pidx = pred_idx_ref[ii * Pm + p]
                    ok = (pidx >= 0) & is_start
                    pb = jnp.transpose(
                        bsp_s[pl.ds(jnp.maximum(pidx, 0), 1), :]
                    )
                    ms_s = jnp.where(ok & (pb < ms_s), pb, ms_s)
                    me_s = jnp.where(ok & (pb > me_s), pb, me_s)
                ms = jnp.where(is_start, ms_s, pb_prev) + 1
                me = jnp.where(is_start, me_s, pb_prev) + 1
                ms = jnp.where(i == 0, 0, ms)
                me = jnp.where(i == 0, 0, me)
                r_i = r_ref[ii]
                left = jnp.maximum(0, jnp.minimum(ms, L - r_i - bta))
                right = jnp.where(
                    L > r_i,
                    jnp.minimum(L, jnp.maximum(me, L - r_i) + bta),
                    jnp.minimum(L, me + bta),
                )
            in_band = (left <= jcol) & (jcol < right)
            is_left = jcol == left

            code_i = codes_ref[ii]
            minp = minp_ref[ii]
            subrow = sub_ref[code_i]
            match = seqc_ref[:, :] == code_i

            # ---- predecessor candidates ----
            lr_f = jnp.transpose(lr_s[pl.ds(jnp.maximum(i - 1, 0), 1), :])
            pl_f = lr_f // 32768
            pr_f = lr_f % 32768
            cov_f = (pl_f <= jcol) & (jcol < pr_f)
            um_f = jnp.where(cov_f, prev_m[:, :], NEGc)
            uy_f = jnp.where(cov_f, prev_y[:, :], NEGc)
            pm_sh = pltpu.roll(prev_m[:, :], 1, 1)
            cov_d_f = (pl_f < jcol) & (jcol <= pr_f)
            d_f = jnp.where(cov_d_f & (jcol > 0), pm_sh, NEGc)

            def pred_rows(pidx, rank):
                pm = ring_m[jnp.maximum(rank, 0) % ringc].astype(jnp.int32)
                py = ring_y[jnp.maximum(rank, 0) % ringc].astype(jnp.int32)
                pm = jnp.where(pidx == 0, row0, pm)
                py = jnp.where(pidx == 0, row0, py)
                return pm, py

            @pl.when(is_start & ("sweep" not in strip))
            def _():
                um_b = jnp.full((Bt, Lpo), NEG, jnp.int32)
                um_i = jnp.zeros((Bt, Lpo), jnp.int32)
                uy_b = jnp.full((Bt, Lpo), NEG, jnp.int32)
                uy_i = jnp.zeros((Bt, Lpo), jnp.int32)
                d_b = jnp.full((Bt, Lpo), NEG, jnp.int32)
                d_i = jnp.zeros((Bt, Lpo), jnp.int32)
                for p in range(Pm):
                    pidx = pred_idx_ref[ii * Pm + p]
                    ok = pidx >= 0
                    pmv, pyv = pred_rows(pidx, pred_rank_ref[ii * Pm + p])
                    lr_ = jnp.transpose(
                        lr_s[pl.ds(jnp.maximum(pidx, 0), 1), :]
                    )
                    pl_ = lr_ // 32768
                    pr_ = lr_ % 32768
                    cov = ok & (pl_ <= jcol) & (jcol < pr_)
                    v = jnp.where(cov, pmv, NEGc)
                    upd = v > um_b
                    um_i = jnp.where(upd, pidx, um_i)
                    um_b = jnp.where(upd, v, um_b)
                    v = jnp.where(cov, pyv, NEGc)
                    upd = v > uy_b
                    uy_i = jnp.where(upd, pidx, uy_i)
                    uy_b = jnp.where(upd, v, uy_b)
                    pm_s = pltpu.roll(pmv, 1, 1)
                    cd = ok & (pl_ < jcol) & (jcol <= pr_)
                    v = jnp.where(cd & (jcol > 0), pm_s, NEGc)
                    upd = v > d_b
                    d_i = jnp.where(upd, pidx, d_i)
                    d_b = jnp.where(upd, v, d_b)
                sweep_s[0] = um_b
                sweep_s[1] = um_i
                sweep_s[2] = uy_b
                sweep_s[3] = uy_i
                sweep_s[4] = d_b
                sweep_s[5] = d_i

            um_best = jnp.where(is_start, sweep_s[0], um_f)
            um_idx = jnp.where(is_start, sweep_s[1], i - 1)
            uy_best = jnp.where(is_start, sweep_s[2], uy_f)
            uy_idx = jnp.where(is_start, sweep_s[3], i - 1)
            d_best = jnp.where(is_start, sweep_s[4], d_f)
            d_idx = jnp.where(is_start, sweep_s[5], i - 1)

            # ---- Y candidates (":121-141,294-346") ----
            covered = um_best > NEGc // 2
            um_o = um_best + o
            y_fb = 2 * o + e * (minp + 1) + e * jcol
            from_y = uy_best > um_o
            y_row = jnp.where(
                covered, jnp.maximum(um_o, uy_best) + e, y_fb
            )
            u_pred = jnp.where(covered, jnp.where(from_y, uy_idx, um_idx), minp)
            py_code = jnp.where(covered & from_y, Y_DIR, O)
            py_pred = jnp.where(covered & from_y, uy_idx, 0)
            y_row = jnp.where(i == 0, row0, y_row)

            # ---- D candidates ----
            has_d = d_best > NEGc // 2
            d_val = d_best + subrow

            # ---- in-row (M, X) affine solve as a linear chain ----
            c = jnp.maximum(d_val, y_row)
            c = jnp.where(
                has_d | (i == 0), jnp.where(i == 0, row0, c), y_row
            )
            x0_base = o + e * (minp + 1)
            x0_fb = 2 * o + e * (minp + 1) + e * left
            x_left = jnp.where(left == 0, x0_base, x0_fb)
            x_left = jnp.where(i == 0, 0, x_left)
            # m at the left lane, EXTRACTION-FREE (the r4 edges lesson):
            # m_left = left==0 ? x_left : max(c@left, x_left), evaluated
            # elementwise at the is_left lane (c@left IS c there); i==0
            # zeroes it
            m_left = jnp.where(left == 0, x_left, jnp.maximum(c, x_left))
            m_left = jnp.where(i == 0, 0, m_left)
            # S[k] = c[k] + o - e*k (k > left); seed at k == left
            S = c + o - e * jcol
            S = jnp.where(
                is_left, jnp.maximum(m_left + o, x_left) - e * jcol, S
            )
            S = jnp.where(in_band, S, NEGc)
            Sx = S if "chain" in strip else _chain_radix(S, jcol, Lpo)
            # x[j] needs the chain strictly left of j
            x_row = e * jcol + jnp.where(
                jcol == 0, NEGc, pltpu.roll(Sx, 1, 1)
            )
            x_row = jnp.where(is_left, x_left, x_row)
            m_row = jnp.maximum(c, x_row)
            m_row = jnp.where(is_left, m_left, m_row)
            m_row = jnp.where(i == 0, row0, m_row)
            x_row = jnp.where(i == 0, 0, x_row)
            m_row = jnp.where(in_band, m_row, NEGc)
            y_row = jnp.where(in_band, y_row, NEGc)

            if "dirs" in strip:   # timing-only: skip direction packing
                packed_ref[r] = m_row
                packedx_ref[r] = x_row
                packedy_ref[r] = y_row
            else:
                # path_x plane (":99-120")
                x_prev = pltpu.roll(x_row, 1, 1)
                x_prev = jnp.where(jcol == 0, NEGc, x_prev)
                m_prev = pltpu.roll(m_row, 1, 1)
                m_prev = jnp.where(jcol == 0, NEGc, m_prev)
                stay_x = (x_prev > m_prev + o) & ~is_left
                px_code = jnp.where(stay_x, X_DIR, O)
                px_pred = jnp.where(stay_x, i, 0)
                l_pred = jnp.where(is_left, minp, i)

                # ---- M directions: the mode-2 cascade (":143-195") ----
                l_val = x_row
                u_val = y_row
                d_lt_l = d_val < l_val
                l_lt_u = l_val < u_val
                d_lt_u = d_val < u_val
                dir_code_d = jnp.where(
                    d_lt_l,
                    jnp.where(
                        l_lt_u,
                        jnp.where(u_pred == 0, LOW_U, U_DIR),
                        L_DIR,
                    ),
                    jnp.where(d_lt_u, U_DIR, jnp.where(match, D, LOW_D)),
                )
                pred_d = jnp.where(
                    d_lt_l,
                    jnp.where(l_lt_u, u_pred, l_pred),
                    jnp.where(d_lt_u, u_pred, d_idx),
                )
                dir_code_nd = jnp.where(l_lt_u, U_DIR, L_DIR)
                pred_nd = jnp.where(l_lt_u, u_pred, l_pred)
                dcode = jnp.where(has_d, dir_code_d, dir_code_nd)
                pred_sel = jnp.where(has_d, pred_d, pred_nd)
                is_base = is_left & (left == 0) & (i > 0)
                dcode = jnp.where(is_base, U_DIR, dcode)
                pred_sel = jnp.where(is_base, minp, pred_sel)
                dcode = jnp.where(
                    i == 0, jnp.where(jcol == 0, O, L_DIR), dcode
                )
                pred_sel = jnp.where(i == 0, 0, pred_sel)
                pk = jnp.where(in_band, pred_sel * 16 + dcode, 0)
                pk = jnp.where(jcol == Lb, left, pk)
                pk = jnp.where(jcol == Lb + 1, right, pk)
                pk = jnp.where(live, pk, 0)
                pkx = jnp.where(in_band, px_pred * 16 + px_code, 0)
                pky = jnp.where(in_band, py_pred * 16 + py_code, 0)
                pkx = jnp.where((i == 0) | ~live, 0, pkx)
                pky = jnp.where((i == 0) | ~live, 0, pky)
                packed_ref[r] = pk
                packedx_ref[r] = pkx
                packedy_ref[r] = pky

            masked = jnp.where(in_band, m_row, NEGc)
            rmax = jnp.max(masked, axis=1, keepdims=True)
            bsp_i = jnp.max(
                jnp.where((masked == rmax) & in_band, jcol, -1),
                axis=1, keepdims=True,
            )

            m_store = jnp.where(live, m_row, NEGc)
            y_store = jnp.where(live, y_row, NEGc)
            er = erank_ref[ii]

            @pl.when(er >= 0)
            def _():
                if ring16:
                    ring_m[er % ringc] = jnp.clip(
                        m_store, -32768, 32767).astype(rdt)
                    ring_y[er % ringc] = jnp.clip(
                        y_store, -32768, 32767).astype(rdt)
                else:
                    ring_m[er % ringc] = m_store
                    ring_y[er % ringc] = y_store
            prev_m[:, :] = m_store
            prev_y[:, :] = y_store

            iw = jnp.minimum(i, lr_s.shape[0] - 1)
            lr_s[pl.ds(iw, 1), :] = jnp.transpose(left * 32768 + right)
            bsp_s[pl.ds(iw, 1), :] = jnp.transpose(bsp_i)

            so = sink_ord_ref[ii]

            @pl.when((so >= 0) & live)
            def _():
                sink_v[pl.ds(so, 1), :] = jnp.transpose(
                    lane_at(m_row, right - 1)
                )
                sink_c[pl.ds(so, 1), :] = jnp.transpose(right - 1)

            @pl.when(i == n - 2)
            def _():
                best = lane_at(m_row, right - 1)
                brow = jnp.full((Bt, 1), i, jnp.int32)
                bcol = right - 1
                for k in range(num_sinks):
                    v = jnp.transpose(sink_v[pl.ds(k, 1), :])
                    cc = jnp.transpose(sink_c[pl.ds(k, 1), :])
                    upd = v > best
                    best = jnp.where(upd, v, best)
                    brow = jnp.where(upd, jnp.int32(sink_rows[k]), brow)
                    bcol = jnp.where(upd, cc, bcol)
                score_ref[:, :] = best
                lrow_ref[:, :] = brow
                lcol_ref[:, :] = bcol

    return kernel


_cache: dict = {}


def pick_bt(B: int, Lpo: int, ring16: bool, R: int = 2,
            ringc: int = RING) -> int:
    """Words per (Bt x Lpo) element: two compact rings, sub 14 (x2
    buffers), seq codes 2, three packed outs 6R, scratch ~12.  The
    seq-code match (vs the former 7-plane eq table) plus R=2 (output
    double-buffering dominates a three-plane kernel) is what lets the
    kernel reach Bt=128 at Lpo=256.  TPU A/B (B=512, r3): Bt=64/R=8
    28.8 ms, Bt=128/R=4 23.5, Bt=128/R=1 21.4, Bt=128/R=2 20.4
    (5.1 Gcells/s); Bt=256 OOMs."""
    words = 2 * ringc * (0.5 if ring16 else 1.0) + 14 + 2 + 6 * R + 12
    bt = 128
    while bt > 8 and (words * 4 * bt * Lpo > VMEM_BUDGET or bt > B or B % bt):
        bt //= 2
    return bt


def fill_gap_global_v2(dg, table, seq, L, bta, o, e, Bt=None, R=2,
                       interpret=False, ring16=None,
                       strip: frozenset = frozenset()):
    """Pallas mode-2 fill; same outputs as `_fill_gap_global[:8]` with
    band bounds in packed lanes Lp/Lp+1 and [n, B, Lpo] plane layout.

    Requires o <= 0 and e <= 0 (the linear-chain reduction's premise;
    the reference's penalties are non-positive).
    Returns (score, last_row, last_col_abs, packed, packed_x, packed_y).
    """
    B, Lp = seq.shape
    Lpo = -(-(Lp + 8) // 128) * 128
    n = dg.n
    o_i, e_i = int(o), int(e)
    if o_i > 0 or e_i > 0:
        raise ValueError("fill_gap_global_v2 requires non-positive o/e")
    if ring16 is None:
        from .poa_engine import sm_max_entry

        bound = (sm_max_entry(table) + max(-o_i, -e_i)) * (n + Lpo)
        ring16 = bound < 32000
    ringc = 16
    while ringc <= dg.compact_span:
        ringc *= 2
    if Bt is None:
        Bt = pick_bt(B, Lpo, ring16, R, ringc)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    # n_pad must cover n rows (the wrappers slice packed[:n]); with small
    # R, ceil((n-1)/R)*R can fall below n and the .at[n-1] clamp would
    # silently overwrite the last real row
    steps = -(-n // R)
    n_pad = steps * R
    n_scr = -(-(n + 1) // 8) * 8
    sink_rows = dg.sink_rows
    sink_pad = (len(sink_rows) + 7) // 8 * 8

    key = (sink_rows, Lpo, Lp, n, Bt, R, B, interpret, ring16, ringc, strip)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel(sink_rows, R, n, ring16, Lp, ringc, strip)
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=9,
                    grid=(B // Bt, steps),
                    in_specs=[
                        pl.BlockSpec((7, Bt, Lpo), lambda b, s, *_: (0, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lpo), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 128), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec((R, Bt, Lpo), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, Bt, Lpo), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, Bt, Lpo), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((ringc, Bt, Lpo),
                                   jnp.int16 if ring16 else jnp.int32),
                        pltpu.VMEM((ringc, Bt, Lpo),
                                   jnp.int16 if ring16 else jnp.int32),
                        pltpu.VMEM((Bt, Lpo), jnp.int32),
                        pltpu.VMEM((Bt, Lpo), jnp.int32),
                        pltpu.VMEM((Bt, Lpo), jnp.int32),
                        pltpu.VMEM((6, Bt, Lpo), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.VMEM((sink_pad, Bt), jnp.int32),
                        pltpu.VMEM((sink_pad, Bt), jnp.int32),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, B, Lpo), jnp.int32),
                    jax.ShapeDtypeStruct((n_pad, B, Lpo), jnp.int32),
                    jax.ShapeDtypeStruct((n_pad, B, Lpo), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _cache[key] = fn

    codes7 = jnp.arange(7, dtype=jnp.int32)
    sub = jnp.concatenate(
        [table[codes7][:, seq], jnp.zeros((7, B, Lpo - Lp), jnp.int32)],
        axis=2,
    )
    seqc = jnp.concatenate(
        [seq.astype(jnp.int32), jnp.full((B, Lpo - Lp), -1, jnp.int32)],
        axis=1,
    )
    aux = jnp.zeros((B, 128), jnp.int32)
    aux = aux.at[:, 0].set(L).at[:, 1].set(jnp.asarray(bta, jnp.int32))
    sink_ord = np.full(n, -1, dtype=np.int32)
    for k, srow in enumerate(sink_rows):
        sink_ord[srow] = k
    oe = jnp.asarray([o_i, e_i], dtype=jnp.int32)
    packed, packed_x, packed_y, score, lrow, lcol = fn(
        dg.pred_idx.reshape(-1), dg.pred_rank.reshape(-1), dg.erank,
        dg.node_start.astype(jnp.int32),
        dg.codes, dg.r_values, dg.min_pred, jnp.asarray(sink_ord), oe,
        sub, seqc, aux,
    )
    packed = packed[:n].at[n - 1].set(0)
    packed_x = packed_x[:n].at[n - 1].set(0)
    packed_y = packed_y[:n].at[n - 1].set(0)
    return score[:, 0], lrow[:, 0], lcol[:, 0], packed, packed_x, packed_y
