"""Windowed banded affine-gap global-POA Pallas fill — long reads, mode 2.

`pallas_poa_global_win.py`'s window machinery (HBM-resident sequence
planes with per-row [Bt, W] DMAs, tile-uniform 128-quantised window
starts, dynamic-shift realign of predecessor rows, per-read overflow
guard) applied to `pallas_gap_global.py`'s Gotoh recurrence (two rings
m/y, per-pred first-best Y sweep, the o<=0 linear-chain in-row solve,
the mode-2 D/L/U direction cascade, three packed planes).

Two simplifications relative to the mode-0 windowed kernel:

- the gap chain's per-column weights are the uniform extension ``e``
  (not per-char gap scores), so no cumsum planes ride HBM — the chain
  uses ``e * jabs`` arithmetic directly;
- row 0 is closed-form (m = y = o + e*j, 0 at 0), so predecessor reads
  of row 0 regenerate it at the current window instead of realigning a
  stored copy.

Values inside every band are identical to the full-width fill wherever
the overflow guard passes; callers (poa_gap_engine.fill_gap_global_long)
rerun flagged batches at doubled W / full width.  GAF equality pinned by
tests/test_windowed_band.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .poa_engine import NEG, O, D, LOW_D, L_DIR, U_DIR, X_DIR, Y_DIR, LOW_U

# Empirical: Mosaic's actual scoped-vmem for this kernel runs ~2x the
# word model (three double-buffered packed planes + 10 [n_scr, Bt]
# metadata arrays); 6.5M keeps the pick under the 16M hard limit.
VMEM_BUDGET = 13 * 1024 * 1024 // 2
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


def _make_kernel(sink_rows, R: int, n: int, ring: int, W: int, Lfull: int):
    num_sinks = len(sink_rows)

    def kernel(
        pred_idx_ref,   # i32[n * Pm]
        is_start_ref,   # i32[n]
        codes_ref,      # i32[n]
        r_ref,          # i32[n]
        minp_ref,       # i32[n]
        sink_ord_ref,   # i32[n]
        oe_ref,         # i32[2]
        aux_ref,        # [Bt, 128]  lane0=L, lane1=bta
        subf,           # ANY [7, B, Lfull]
        seqcf,          # ANY [B, Lfull]  read codes
        packed_ref,     # out [R, Bt, W]
        packedx_ref,    # out [R, Bt, W]
        packedy_ref,    # out [R, Bt, W]
        score_ref,      # out [Bt, 1]
        lrow_ref,       # out [Bt, 1]
        lcol_ref,       # out [Bt, 1]
        over_ref,       # out [Bt, 1]
        lefts_out,      # out [Bt, n_scr]
        rights_out,     # out [Bt, n_scr]
        ws_out,         # out [Bt, n_scr]
        ring_m,         # scratch [ring, Bt, W] i32
        ring_y,         # scratch [ring, Bt, W] i32
        prev_m,         # scratch [Bt, W]
        prev_y,         # scratch [Bt, W]
        sub_w,          # scratch [Bt, W]
        seqc_w,         # scratch [Bt, W]
        sweep_s,        # scratch [6, Bt, W]
        over_s,         # scratch [Bt, 8]
        lefts_s,        # scratch [n_scr, Bt]
        rights_s,       # scratch [n_scr, Bt]
        bsp_s,          # scratch [n_scr, Bt]
        ws_v,           # scratch [n_scr, Bt]
        wss,            # SMEM scratch [n_scr]
        sink_v,         # scratch [8*ceil(S/8), Bt]
        sink_c,         # scratch [...same]
        dsem,           # DMA sems (2,)
    ):
        step = pl.program_id(1)
        bo = pl.program_id(0) * aux_ref.shape[0]
        Bt = aux_ref.shape[0]
        Pm = pred_idx_ref.shape[0] // codes_ref.shape[0]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, W), 1)
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
            over_s[:, :] = jnp.zeros((Bt, 8), jnp.int32)

        for r in range(R):
            i = step * R + r
            ii = jnp.minimum(i, n - 1)
            live = i < n - 1

            # ---- adaptive band ----
            is_start = (is_start_ref[ii] != 0) & (i > 0) & live
            pb_prev = jnp.transpose(bsp_s[pl.ds(jnp.maximum(i - 1, 0), 1), :])
            ms_s = jnp.full((Bt, 1), 1 << 28, jnp.int32)
            me_s = jnp.full((Bt, 1), NEG, jnp.int32)
            for p in range(Pm):
                pidx = pred_idx_ref[ii * Pm + p]
                ok = (pidx >= 0) & is_start
                pb = jnp.transpose(bsp_s[pl.ds(jnp.maximum(pidx, 0), 1), :])
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

            # tile-uniform window start (see pallas_poa_global_win)
            ws = jnp.minimum(
                ((jnp.min(left) - 1) // 128) * 128, Lfull - W
            )
            ws = jnp.maximum(ws, 0)
            wsa = pl.multiple_of(ws, 128)
            over_s[:, 0:1] = over_s[:, 0:1] | jnp.where(
                (right - ws > W) & live, 1, 0
            )
            wss[ii] = ws
            jabs = ws + jcol
            in_band = (left <= jabs) & (jabs < right)
            is_left = jabs == left

            code_i = codes_ref[ii]
            minp = minp_ref[ii]

            # ---- window DMAs ----
            cps = [
                pltpu.make_async_copy(
                    subf.at[code_i, pl.ds(bo, Bt), pl.ds(wsa, W)],
                    sub_w, dsem.at[0],
                ),
                pltpu.make_async_copy(
                    seqcf.at[pl.ds(bo, Bt), pl.ds(wsa, W)],
                    seqc_w, dsem.at[1],
                ),
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            subrow = sub_w[:, :]
            match = seqc_w[:, :] == code_i

            # row 0 regenerated at the current window (closed form)
            row0 = jnp.where(jabs == 0, 0, o + e * jabs)

            def aligned_row(src, pidx):
                ws_p = wss[jnp.maximum(pidx, 0)]
                d = ws - ws_p
                rolled = pltpu.roll(src, (-d) % W, 1)
                ok = (jcol + d >= 0) & (jcol + d < W)
                return jnp.where(ok, rolled, NEGc)

            def pred_rows(pidx):
                pm = aligned_row(ring_m[jnp.maximum(pidx, 0) % ring], pidx)
                py = aligned_row(ring_y[jnp.maximum(pidx, 0) % ring], pidx)
                pm = jnp.where(pidx == 0, row0, pm)
                py = jnp.where(pidx == 0, row0, py)
                return pm, py

            # ---- predecessor candidates (fast path: i-1) ----
            pl_f = jnp.transpose(lefts_s[pl.ds(jnp.maximum(i - 1, 0), 1), :])
            pr_f = jnp.transpose(rights_s[pl.ds(jnp.maximum(i - 1, 0), 1), :])
            prevm = aligned_row(prev_m[:, :], i - 1)
            prevy = aligned_row(prev_y[:, :], i - 1)
            cov_f = (pl_f <= jabs) & (jabs < pr_f)
            um_f = jnp.where(cov_f, prevm, NEGc)
            uy_f = jnp.where(cov_f, prevy, NEGc)
            pm_sh = jnp.where(jcol == 0, NEGc, pltpu.roll(prevm, 1, 1))
            cov_d_f = (pl_f < jabs) & (jabs <= pr_f)
            d_f = jnp.where(cov_d_f, pm_sh, NEGc)

            @pl.when(is_start)
            def _():
                um_b = jnp.full((Bt, W), NEG, jnp.int32)
                um_i = jnp.zeros((Bt, W), jnp.int32)
                uy_b = jnp.full((Bt, W), NEG, jnp.int32)
                uy_i = jnp.zeros((Bt, W), jnp.int32)
                d_b = jnp.full((Bt, W), NEG, jnp.int32)
                d_i = jnp.zeros((Bt, W), jnp.int32)
                for p in range(Pm):
                    pidx = pred_idx_ref[ii * Pm + p]
                    ok = pidx >= 0
                    pmv, pyv = pred_rows(pidx)
                    pl_ = jnp.transpose(
                        lefts_s[pl.ds(jnp.maximum(pidx, 0), 1), :]
                    )
                    pr_ = jnp.transpose(
                        rights_s[pl.ds(jnp.maximum(pidx, 0), 1), :]
                    )
                    cov = ok & (pl_ <= jabs) & (jabs < pr_)
                    v = jnp.where(cov, pmv, NEGc)
                    upd = v > um_b
                    um_i = jnp.where(upd, pidx, um_i)
                    um_b = jnp.where(upd, v, um_b)
                    v = jnp.where(cov, pyv, NEGc)
                    upd = v > uy_b
                    uy_i = jnp.where(upd, pidx, uy_i)
                    uy_b = jnp.where(upd, v, uy_b)
                    pm_s = jnp.where(jcol == 0, NEGc, pltpu.roll(pmv, 1, 1))
                    cd = ok & (pl_ < jabs) & (jabs <= pr_)
                    v = jnp.where(cd, pm_s, NEGc)
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

            # ---- Y candidates (gap_global_abpoa.rs:121-141,294-346) ----
            covered = um_best > NEGc // 2
            um_o = um_best + o
            y_fb = 2 * o + e * (minp + 1) + e * jabs
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

            # ---- in-row (M, X) affine solve ----
            c = jnp.maximum(d_val, y_row)
            c = jnp.where(
                has_d | (i == 0), jnp.where(i == 0, row0, c), y_row
            )
            x0_base = o + e * (minp + 1)
            x0_fb = 2 * o + e * (minp + 1) + e * left
            x_left = jnp.where(left == 0, x0_base, x0_fb)
            c_left = lane_at(c, left - ws)
            m_left = jnp.where(left == 0, x_left, jnp.maximum(c_left, x_left))
            m_left = jnp.where(i == 0, 0, m_left)
            x_left = jnp.where(i == 0, 0, x_left)
            S = c + o - e * jabs
            S = jnp.where(
                is_left, jnp.maximum(m_left + o, x_left) - e * left, S
            )
            S = jnp.where(in_band, S, NEGc)
            Sx = _chain_radix(S, jcol, W)
            x_row = e * jabs + jnp.where(
                jcol == 0, NEGc, pltpu.roll(Sx, 1, 1)
            )
            x_row = jnp.where(is_left, x_left, x_row)
            m_row = jnp.maximum(c, x_row)
            m_row = jnp.where(is_left, m_left, m_row)
            m_row = jnp.where(i == 0, row0, m_row)
            x_row = jnp.where(i == 0, 0, x_row)
            m_row = jnp.where(in_band, m_row, NEGc)
            y_row = jnp.where(in_band, y_row, NEGc)

            # path_x plane
            x_prev = jnp.where(jcol == 0, NEGc, pltpu.roll(x_row, 1, 1))
            m_prev = jnp.where(jcol == 0, NEGc, pltpu.roll(m_row, 1, 1))
            stay_x = (x_prev > m_prev + o) & ~is_left
            px_code = jnp.where(stay_x, X_DIR, O)
            px_pred = jnp.where(stay_x, i, 0)
            l_pred = jnp.where(is_left, minp, i)

            # ---- M directions: the mode-2 cascade ----
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
            dcode = jnp.where(i == 0, jnp.where(jabs == 0, O, L_DIR), dcode)
            pred_sel = jnp.where(i == 0, 0, pred_sel)
            pk = jnp.where(in_band & live, pred_sel * 16 + dcode, 0)
            pkx = jnp.where(in_band & live, px_pred * 16 + px_code, 0)
            pky = jnp.where(in_band & live, py_pred * 16 + py_code, 0)
            pkx = jnp.where(i == 0, 0, pkx)
            pky = jnp.where(i == 0, 0, pky)
            packed_ref[r] = pk
            packedx_ref[r] = pkx
            packedy_ref[r] = pky

            masked = jnp.where(in_band, m_row, NEGc)
            rmax = jnp.max(masked, axis=1, keepdims=True)
            bsp_i = ws + jnp.max(
                jnp.where((masked == rmax) & in_band, jcol, -1),
                axis=1, keepdims=True,
            )

            m_store = jnp.where(live, m_row, NEGc)
            y_store = jnp.where(live, y_row, NEGc)
            ring_m[i % ring] = m_store
            ring_y[i % ring] = y_store
            prev_m[:, :] = m_store
            prev_y[:, :] = y_store

            iw = jnp.minimum(i, lefts_s.shape[0] - 1)
            lefts_s[pl.ds(iw, 1), :] = jnp.transpose(left)
            rights_s[pl.ds(iw, 1), :] = jnp.transpose(right)
            bsp_s[pl.ds(iw, 1), :] = jnp.transpose(bsp_i)
            ws_v[pl.ds(iw, 1), :] = jnp.full((1, Bt), ws, jnp.int32)

            so = sink_ord_ref[ii]

            @pl.when((so >= 0) & live)
            def _():
                sink_v[pl.ds(so, 1), :] = jnp.transpose(
                    lane_at(m_row, right - 1 - ws)
                )
                sink_c[pl.ds(so, 1), :] = jnp.transpose(right - 1)

            @pl.when(i == n - 2)
            def _():
                best = lane_at(m_row, right - 1 - ws)
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
                over_ref[:, :] = over_s[:, 0:1]
                lefts_out[:, :] = jnp.transpose(lefts_s[:, :])
                rights_out[:, :] = jnp.transpose(rights_s[:, :])
                ws_out[:, :] = jnp.transpose(ws_v[:, :])

    return kernel


_cache: dict = {}


def pick_bt(B: int, W: int, ring: int, n_scr: int, R: int = 2) -> int:
    # two int32 rings + sub/seqc windows + prev 2 + sweep 6 + 6R packed
    # outs (x2 buffers) + band metadata
    words = 2 * ring + 4 + 2 + 6 + 6 * R + (6 * n_scr * 4) / (4 * W)
    bt = 32
    while bt > 8 and (words * 4 * bt * W > VMEM_BUDGET or bt > B or B % bt):
        bt //= 2
    return bt


def fill_gap_global_win(dg, table, seq, L, bta, o, e, W, span, Bt=None,
                        R=2, interpret=False):
    """Pallas windowed mode-2 fill.

    Returns (score, last_row, last_col_abs, packed int32[n, B, W],
    packed_x, packed_y, lefts int32[B, n], rights, ws, over bool[B]);
    callers rerun reads whose ``over`` flag is set at a larger W.
    """
    B, Lp = seq.shape
    o_i, e_i = int(o), int(e)
    if o_i > 0 or e_i > 0:
        raise ValueError("fill_gap_global_win requires non-positive o/e")
    Lfull = -(-Lp // 128) * 128
    if Lfull != Lp:
        from .. import scoring

        seq = jnp.pad(seq, ((0, 0), (0, Lfull - Lp)),
                      constant_values=scoring.N)
    n = dg.n
    # modulo indexing doesn't need a power-of-two depth; a multiple of 4
    # wastes less VMEM (2 rings x W lanes per slot adds up at W >= 1024)
    ring = max(8, -(-(span + 2) // 4) * 4)
    steps = -(-n // R)
    n_pad = steps * R
    n_scr = -(-(n + 1) // 8) * 8
    if Bt is None:
        Bt = pick_bt(B, W, ring, n_scr, R)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    sink_rows = dg.sink_rows
    sink_pad = (len(sink_rows) + 7) // 8 * 8

    key = (sink_rows, W, Lfull, n, Bt, R, B, ring, interpret)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel(sink_rows, R, n, ring, W, Lfull)
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=7,
                    grid=(B // Bt, steps),
                    in_specs=[
                        pl.BlockSpec((Bt, 128), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pl.ANY),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=[
                        pl.BlockSpec((R, Bt, W), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, Bt, W), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, Bt, W), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, n_scr), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, n_scr), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, n_scr), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((ring, Bt, W), jnp.int32),
                        pltpu.VMEM((ring, Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((6, Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, 8), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.SMEM((n_scr,), jnp.int32),
                        pltpu.VMEM((sink_pad, Bt), jnp.int32),
                        pltpu.VMEM((sink_pad, Bt), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, B, W), jnp.int32),
                    jax.ShapeDtypeStruct((n_pad, B, W), jnp.int32),
                    jax.ShapeDtypeStruct((n_pad, B, W), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, n_scr), jnp.int32),
                    jax.ShapeDtypeStruct((B, n_scr), jnp.int32),
                    jax.ShapeDtypeStruct((B, n_scr), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _cache[key] = fn

    codes7 = jnp.arange(7, dtype=jnp.int32)
    subf = table[codes7][:, seq]                       # [7, B, Lfull]
    seqcf = seq.astype(jnp.int32)
    aux = jnp.zeros((B, 128), jnp.int32)
    aux = aux.at[:, 0].set(L).at[:, 1].set(jnp.asarray(bta, jnp.int32))
    sink_ord = np.full(n, -1, dtype=np.int32)
    for k, srow in enumerate(sink_rows):
        sink_ord[srow] = k
    oe = jnp.asarray([o_i, e_i], dtype=jnp.int32)
    (packed, packed_x, packed_y, score, lrow, lcol, over, lefts, rights,
     wsm) = fn(
        dg.pred_idx.reshape(-1), dg.node_start.astype(jnp.int32),
        dg.codes, dg.r_values, dg.min_pred, jnp.asarray(sink_ord), oe,
        aux, subf, seqcf,
    )
    packed = packed[:n].at[n - 1].set(0)
    packed_x = packed_x[:n].at[n - 1].set(0)
    packed_y = packed_y[:n].at[n - 1].set(0)
    return (
        score[:, 0], lrow[:, 0], lcol[:, 0], packed, packed_x, packed_y,
        lefts[:, :n], rights[:, :n], wsm[:, :n], over[:, 0] != 0,
    )
