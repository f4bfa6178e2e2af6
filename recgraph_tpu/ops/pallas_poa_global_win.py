"""Windowed banded global-POA Pallas fill — long reads at TPU speed.

The windowed XLA engine (`poa_engine._fill_global_windowed`) makes
multi-kb mode-0 reads exact in O(band) memory but is per-step
dispatch-bound (~1.5 ms/row on v5e → ~1 read/s at 2.5 kb).  This
kernel is `pallas_poa_global2.py` with O(W)-lane rows:

- full-width sequence planes (sub/eq and the gap cumsums) stay in HBM
  (ANY memory); each row DMAs its [Bt, W] window at the row's window
  start — `make_async_copy` takes the dynamic lane offset that vector
  ops cannot;
- the window start is TILE-uniform (min over the tile's band lefts,
  lane-quantised): predecessor rows then realign with a single
  dynamic-shift `pltpu.roll` (scalar shift = ws_i - ws_p; verified
  supported by Mosaic here), and out-of-window lanes regenerate from
  the band coverage masks exactly like the ring's NEG lanes;
- a per-read guard flags bands that outgrow the window (divergent
  reads in a tile shrink the effective W); callers rerun flagged
  batches through the exact XLA windowed/full engines;
- the predecessor ring depth is the graph's max pred span rounded up
  (long-read pangenome graphs have tiny nodes and spans ~8, so the
  ring is small even at W = 1280), and band metadata (lefts, rights,
  window starts) copies out once per tile from scratch.

Bit-exact vs `_fill_global` wherever the guard passes (same packed
cells, bounds, sink selection); pinned by tests/test_windowed_band.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring import GAP
from .poa_engine import NEG, O, D, LOW_D, L_DIR, U_DIR

# Empirical (r3): Mosaic's actual scoped-vmem runs well above the word
# model at large W x n (22.5M at W=1024/Bt=32/n=4987 vs ~13M modelled);
# halving the budget keeps the pick under the 16M hard limit.
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


def _make_kernel(sink_rows, R: int, n: int, ring: int, W: int, Lfull: int,
                 strip=()):
    """strip: diagnostic section-removal knobs (timing ablations ONLY —
    output is wrong with any knob set): 'dma' fetches the window planes
    only on the first row group, 'roll' skips pred-row realignment,
    'chain' skips the in-row (max,+) chain, 'dirs' skips direction
    packing, 'lane' replaces per-read lane extracts with lane 0."""
    num_sinks = len(sink_rows)

    def kernel(
        pred_idx_ref,   # i32[n * Pm]
        is_start_ref,   # i32[n]
        gnode_ref,      # i32[n]
        codes_ref,      # i32[n]
        r_ref,          # i32[n]
        minp_ref,       # i32[n]
        sink_ord_ref,   # i32[n]
        aux_ref,        # [Bt, 128]  lane0=L, lane1=bta
        subf,           # ANY [7, B, Lfull]
        eqf,            # ANY [7, B, Lfull]
        gplanes,        # ANY [3, B, Lfull]  (gseq, G, G0)
        packed_ref,     # out [R, Bt, W]
        score_ref,      # out [Bt, 1]
        lrow_ref,       # out [Bt, 1]
        lcol_ref,       # out [Bt, 1]
        over_ref,       # out [Bt, 1]
        lefts_out,      # out [Bt, n_scr]
        rights_out,     # out [Bt, n_scr]
        ws_out,         # out [Bt, n_scr]
        ringb,          # scratch [ring, Bt, W] i32
        row0_s,         # scratch [Bt, W]
        prev_s,         # scratch [Bt, W]
        sub_w,          # scratch [Bt, W]
        eq_w,           # scratch [Bt, W]
        g_w,            # scratch [3, Bt, W]
        sweep_s,        # scratch [4, Bt, W]
        over_s,         # scratch [Bt, 8] (lane-padded flag)
        band_s,         # scratch [Bt, 8] (is_start ms/me, no-transpose layout)
        lefts_s,        # scratch [n_scr, Bt]
        rights_s,       # scratch [n_scr, Bt]
        bsp_s,          # scratch [n_scr, Bt]
        ws_v,           # scratch [n_scr, Bt] (VMEM mirror of wss)
        wss,            # SMEM scratch [n_scr]
        sink_v,         # scratch [8*ceil(S/8), Bt]
        sink_c,         # scratch [...same]
        dsem,           # DMA sems (3,)
    ):
        step = pl.program_id(1)
        bo = pl.program_id(0) * aux_ref.shape[0]
        Bt = aux_ref.shape[0]
        Pm = pred_idx_ref.shape[0] // codes_ref.shape[0]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, W), 1)
        L = aux_ref[:, 0:1]
        bta = aux_ref[:, 1:2]
        NEGc = jnp.int32(NEG)

        def lane_at(row, col):
            if "lane" in strip:
                return row[:, 0:1]
            return jnp.max(
                jnp.where(jcol == col, row, NEGc), axis=1, keepdims=True
            )

        @pl.when(step == 0)
        def _():
            over_s[:, :] = jnp.zeros((Bt, 8), jnp.int32)

        # group-entry carry of the previous row's band metadata: the
        # fast path (pred = i-1) then never re-reads + transposes the
        # [n_scr, Bt] scratch (measured: the per-row metadata
        # transposes dominated the kernel's distance to its strip
        # floor)
        ipz = jnp.maximum(step * R - 1, 0)
        pb_prev = jnp.transpose(bsp_s[pl.ds(ipz, 1), :])
        pl_f = jnp.transpose(lefts_s[pl.ds(ipz, 1), :])
        pr_f = jnp.transpose(rights_s[pl.ds(ipz, 1), :])
        for r in range(R):
            i = step * R + r
            ii = jnp.minimum(i, n - 1)
            live = i < n - 1

            # ---- adaptive band ----
            is_start = (is_start_ref[ii] != 0) & (i > 0) & live
            s_any = is_start_ref[ii] != 0

            @pl.when(s_any)
            def _():
                ms_s = jnp.full((Bt, 1), 1 << 28, jnp.int32)
                me_s = jnp.full((Bt, 1), NEG, jnp.int32)
                for p in range(Pm):
                    pidx = pred_idx_ref[ii * Pm + p]
                    ok = pidx >= 0
                    pb = jnp.transpose(
                        bsp_s[pl.ds(jnp.maximum(pidx, 0), 1), :]
                    )
                    ms_s = jnp.where(ok & (pb < ms_s), pb, ms_s)
                    me_s = jnp.where(ok & (pb > me_s), pb, me_s)
                band_s[:, 0:1] = ms_s
                band_s[:, 1:2] = me_s

            ms = jnp.where(is_start, band_s[:, 0:1], pb_prev) + 1
            me = jnp.where(is_start, band_s[:, 1:2], pb_prev) + 1
            ms = jnp.where(i == 0, 0, ms)
            me = jnp.where(i == 0, 0, me)
            r_i = r_ref[ii]
            left = jnp.maximum(0, jnp.minimum(ms, L - r_i - bta))
            right = jnp.where(
                L > r_i,
                jnp.minimum(L, jnp.maximum(me, L - r_i) + bta),
                jnp.minimum(L, me + bta),
            )

            # tile-uniform window start; per-read overflow guard.
            # 128-quantised: DMA lane offsets must be tile-aligned
            # (Mosaic rejects unaligned dynamic lane slices) and it
            # makes every realign roll lane-aligned too.  (min(left)-1)
            # keeps absolute column left-1 inside the window: the
            # band-start cell's D candidate reads it (the XLA engines
            # see it for free at full width)
            ws = jnp.minimum(
                ((jnp.min(left) - 1) // 128) * 128, Lfull - W
            )
            ws = jnp.maximum(ws, 0)
            wsa = pl.multiple_of(ws, 128)   # prove DMA lane alignment
            over_s[:, 0:1] = over_s[:, 0:1] | jnp.where(
                (right - ws > W) & live, 1, 0
            )
            wss[ii] = ws
            jabs = ws + jcol
            in_band = (left <= jabs) & (jabs < right)
            is_left = jabs == left

            code_i = codes_ref[ii]
            gnode_i = gnode_ref[ii]
            minp = minp_ref[ii]

            # ---- window DMAs (sub/eq/g planes from HBM) ----
            cps = [
                pltpu.make_async_copy(
                    subf.at[code_i, pl.ds(bo, Bt), pl.ds(wsa, W)],
                    sub_w, dsem.at[0],
                ),
                pltpu.make_async_copy(
                    eqf.at[code_i, pl.ds(bo, Bt), pl.ds(wsa, W)],
                    eq_w, dsem.at[1],
                ),
                pltpu.make_async_copy(
                    gplanes.at[:, pl.ds(bo, Bt), pl.ds(wsa, W)],
                    g_w, dsem.at[2],
                ),
            ]
            if "dma" in strip:
                if r == 0:
                    @pl.when(step == 0)
                    def _():
                        for cp in cps:
                            cp.start()
                        for cp in cps:
                            cp.wait()
            else:
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
            subrow = sub_w[:, :]
            match = eq_w[:, :] != 0
            gseq = g_w[0]
            G = g_w[1]
            G0 = g_w[2]

            def aligned_row(src, pidx):
                """src row realigned from its window start to ws."""
                if "roll" in strip:
                    return src
                ws_p = wss[jnp.maximum(pidx, 0)]
                d = ws - ws_p
                rolled = pltpu.roll(src, (-d) % W, 1)
                ok = (jcol + d >= 0) & (jcol + d < W)
                return jnp.where(ok, rolled, NEGc)

            # fast path: single pred i-1 (band bounds carried, not read)
            prev = aligned_row(prev_s[:, :], i - 1)
            cov_u = (pl_f <= jabs) & (jabs < pr_f)
            u_pre_f = jnp.where(cov_u, prev, NEGc)
            prev_sh = jnp.where(jcol == 0, NEGc, pltpu.roll(prev, 1, 1))
            cov_d = (pl_f < jabs) & (jabs <= pr_f)
            d_pre_f = jnp.where(cov_d, prev_sh, NEGc)

            def pred_row(pidx):
                prow = ringb[jnp.maximum(pidx, 0) % ring]
                prow = aligned_row(prow, pidx)
                return jnp.where(pidx == 0, aligned_row(row0_s[:, :], 0), prow)

            @pl.when(is_start)
            def _():
                u_pre = jnp.full((Bt, W), NEG, jnp.int32)
                u_arg = jnp.zeros((Bt, W), jnp.int32)
                d_pre = jnp.full((Bt, W), NEG, jnp.int32)
                d_arg = jnp.zeros((Bt, W), jnp.int32)
                for p in range(Pm):
                    pidx = pred_idx_ref[ii * Pm + p]
                    ok = pidx >= 0
                    prow = pred_row(pidx)
                    pl_ = jnp.transpose(
                        lefts_s[pl.ds(jnp.maximum(pidx, 0), 1), :]
                    )
                    pr_ = jnp.transpose(
                        rights_s[pl.ds(jnp.maximum(pidx, 0), 1), :]
                    )
                    cu = ok & (pl_ <= jabs) & (jabs < pr_)
                    v = jnp.where(cu, prow, NEGc)
                    upd = v > u_pre
                    u_arg = jnp.where(upd, pidx, u_arg)
                    u_pre = jnp.where(upd, v, u_pre)
                    prow_sh = jnp.where(
                        jcol == 0, NEGc, pltpu.roll(prow, 1, 1)
                    )
                    cd = ok & (pl_ < jabs) & (jabs <= pr_)
                    v = jnp.where(cd, prow_sh, NEGc)
                    upd = v > d_pre
                    d_arg = jnp.where(upd, pidx, d_arg)
                    d_pre = jnp.where(upd, v, d_pre)
                sweep_s[0] = u_pre
                sweep_s[1] = u_arg
                sweep_s[2] = d_pre
                sweep_s[3] = d_arg

            u_pre = jnp.where(is_start, sweep_s[0], u_pre_f)
            u_arg = jnp.where(is_start, sweep_s[1], i - 1)
            d_pre = jnp.where(is_start, sweep_s[2], d_pre_f)
            d_arg = jnp.where(is_start, sweep_s[3], i - 1)

            has_u = u_pre > NEGc // 2
            u_val = jnp.where(has_u, u_pre + gnode_i, gnode_i * (i + jabs))
            u_pred = jnp.where(has_u, u_arg, minp)
            has_d = d_pre > NEGc // 2
            d_fb = gnode_i * (i + left)
            d_val = jnp.where(has_d, d_pre + subrow, d_fb)
            d_pred = jnp.where(has_d, d_arg, minp)

            # ---- chain restart values ----
            A = jnp.maximum(d_val, u_val)
            gseq_left = lane_at(gseq, left - ws)
            l_fb = gseq_left * (i + left)
            minp_row = pred_row(minp)
            lefts_minp = jnp.transpose(lefts_s[pl.ds(minp, 1), :])
            base0 = lane_at(minp_row, lefts_minp - ws) + gnode_i
            A_left = jnp.where(
                left == 0, base0,
                jnp.maximum(lane_at(A, left - ws), l_fb),
            )
            A = jnp.where(is_left, A_left, A)
            A = jnp.where(i == 0, jnp.where(jabs == 0, 0, NEGc), A)
            A = jnp.where(in_band, A, NEGc)

            Grow = jnp.where(i == 0, G0, G)
            A0row = jnp.where(in_band, Grow, NEGc)
            A0row = jnp.where(jabs == 0, 0, A0row)
            if "chain" in strip:
                m_row = jnp.where(i == 0, A0row, A)
            else:
                m_row = jnp.where(
                    i == 0, A0row, Grow + _chain_radix(A - Grow, jcol, W)
                )
            m_row = jnp.where(in_band, m_row, NEGc)

            masked = jnp.where(in_band, m_row, NEGc)
            rmax = jnp.max(masked, axis=1, keepdims=True)
            bsp_i = ws + jnp.max(
                jnp.where((masked == rmax) & in_band, jcol, -1),
                axis=1, keepdims=True,
            )

            # ---- directions ----
            m_prev = jnp.where(jcol == 0, NEGc, pltpu.roll(m_row, 1, 1))
            l_val = m_prev + gseq
            l_val = jnp.where(
                is_left, jnp.where(left == 0, NEGc, l_fb), l_val
            )
            l_pred = jnp.where(jabs > left, i, minp)
            d_ge_u = d_val >= u_val
            dirD = d_ge_u & (d_val >= l_val)
            dirU = (~d_ge_u) & (u_val >= l_val)
            dcode = jnp.where(
                dirD, jnp.where(match, D, LOW_D), jnp.where(dirU, U_DIR, L_DIR)
            )
            pred_sel = jnp.where(dirD, d_pred, jnp.where(dirU, u_pred, l_pred))
            is_base = is_left & (left == 0) & (i > 0)
            dcode = jnp.where(is_base, U_DIR, dcode)
            pred_sel = jnp.where(is_base, minp, pred_sel)
            dcode = jnp.where(i == 0, jnp.where(jabs == 0, O, L_DIR), dcode)
            pred_sel = jnp.where(i == 0, 0, pred_sel)
            if "dirs" in strip:
                packed_ref[r] = jnp.where(in_band & live, A, 0)
            else:
                pk = jnp.where(in_band & live, pred_sel * 16 + dcode, 0)
                packed_ref[r] = pk

            m_store = jnp.where(live, m_row, NEGc)
            ringb[i % ring] = m_store
            prev_s[:, :] = m_store

            @pl.when(i == 0)
            def _():
                row0_s[:, :] = m_store

            iw = jnp.minimum(i, lefts_s.shape[0] - 1)
            lefts_s[pl.ds(iw, 1), :] = jnp.transpose(left)
            rights_s[pl.ds(iw, 1), :] = jnp.transpose(right)
            bsp_s[pl.ds(iw, 1), :] = jnp.transpose(bsp_i)
            pb_prev, pl_f, pr_f = bsp_i, left, right
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
                    c = jnp.transpose(sink_c[pl.ds(k, 1), :])
                    upd = v > best
                    best = jnp.where(upd, v, best)
                    brow = jnp.where(upd, jnp.int32(sink_rows[k]), brow)
                    bcol = jnp.where(upd, c, bcol)
                score_ref[:, :] = best
                lrow_ref[:, :] = brow
                lcol_ref[:, :] = bcol
                over_ref[:, :] = over_s[:, 0:1]
                lefts_out[:, :] = jnp.transpose(lefts_s[:, :])
                rights_out[:, :] = jnp.transpose(rights_s[:, :])
                ws_out[:, :] = jnp.transpose(ws_v[:, :])

    return kernel


_cache: dict = {}


def pick_bt(B: int, W: int, ring: int, n_scr: int, R: int = 8) -> int:
    words = ring + 14 + 3 * R + (5 * n_scr * 4) / (4 * W)
    bt = 32
    while bt > 8 and (words * 4 * bt * W > VMEM_BUDGET or bt > B or B % bt):
        bt //= 2
    return bt


def fill_global_win(dg, table, seq, L, bta, W, span, Bt=None, R=8,
                    interpret=False, strip=()):
    """Pallas windowed mode-0 fill.

    Returns (score, last_row, last_col_abs, packed int32[n, B, W],
    lefts int32[B, n], rights, ws, over bool[B]); callers must rerun
    reads whose ``over`` flag is set through the exact XLA engines.
    """
    B, Lp = seq.shape
    Lfull = -(-Lp // 128) * 128
    if Lfull != Lp:
        from .. import scoring

        seq = jnp.pad(seq, ((0, 0), (0, Lfull - Lp)),
                      constant_values=scoring.N)
    n = dg.n
    # modulo indexing doesn't need a power-of-two depth; a multiple of 4
    # wastes less VMEM at W >= 1024
    ring = max(8, -(-(span + 2) // 4) * 4)
    steps = -(-(n - 1) // R)
    n_pad = steps * R
    n_scr = -(-(n + 1) // 8) * 8
    if Bt is None:
        Bt = pick_bt(B, W, ring, n_scr, R)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    sink_rows = dg.sink_rows
    sink_pad = (len(sink_rows) + 7) // 8 * 8

    key = (sink_rows, W, Lfull, n, Bt, R, B, ring, interpret, tuple(strip))
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel(sink_rows, R, n, ring, W, Lfull, strip=strip)
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
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=[
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
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((3, Bt, W), jnp.int32),
                        pltpu.VMEM((4, Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, 8), jnp.int32),
                        pltpu.VMEM((Bt, 8), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.SMEM((n_scr,), jnp.int32),
                        pltpu.VMEM((sink_pad, Bt), jnp.int32),
                        pltpu.VMEM((sink_pad, Bt), jnp.int32),
                        pltpu.SemaphoreType.DMA((3,)),
                    ],
                ),
                out_shape=[
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
    eqf = (seq[None] == codes7[:, None, None]).astype(jnp.int32)
    gseq = table[seq, GAP]
    gplanes = jnp.stack(
        [gseq, jnp.cumsum(gseq, axis=1),
         jnp.cumsum(table[GAP, seq], axis=1)]
    )
    aux = jnp.zeros((B, 128), jnp.int32)
    aux = aux.at[:, 0].set(L).at[:, 1].set(jnp.asarray(bta, jnp.int32))
    sink_ord = np.full(n, -1, dtype=np.int32)
    for k, srow in enumerate(sink_rows):
        sink_ord[srow] = k
    gnode = table[dg.codes, GAP]
    packed, score, lrow, lcol, over, lefts, rights, wsm = fn(
        dg.pred_idx.reshape(-1), dg.node_start.astype(jnp.int32), gnode,
        dg.codes, dg.r_values, dg.min_pred, jnp.asarray(sink_ord),
        aux, subf, eqf, gplanes,
    )
    packed = packed[:n].at[n - 1].set(0)
    return (
        score[:, 0], lrow[:, 0], lcol[:, 0], packed,
        lefts[:, :n], rights[:, :n], wsm[:, :n], over[:, 0] != 0,
    )
