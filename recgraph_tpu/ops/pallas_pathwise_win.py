"""Windowed pathwise (mode 4) Pallas fill — long reads at TPU speed.

The XLA windowed engine (`pathwise_window._fill_pathwise_win`) makes
multi-kb mode-4 reads solvable in O(n*P*W) memory, but its per-row
take_along_axis realignment gathers are a slow generic path on TPU
(~18 s per 32-read fill at n=3798/W=256 — BELOW the scalar CPU
baseline).  This kernel runs the same recurrence as one Pallas grid
sweep, combining the two existing kernel families:

- the dense pathwise layout (`pallas_pathwise.py`): paths on sublanes
  ([Bt, P_pad, W]), per-row predecessor-edge GROUP loop (one pred-row
  read + membership select per group), packed (column << 17 | value)
  non-rep replay, HBM output planes as the far-predecessor spill
  store (pathwise pred spans are unbounded);
- the windowed banded machinery (`pallas_poa_global_win.py`): a
  TILE-UNIFORM, 128-quantised window start per row, so predecessor
  realignment is a scalar-shift `pltpu.roll` and the full-width
  sequence planes stay in HBM with per-row [Bt, W] window DMAs.

Window placement follows `_fill_pathwise_win` (centred on the pred
rows' best positions, pulled right to cover column L - rmin), except
the per-read start is replaced by the tile minimum, floor-quantised to
128 lanes.  Placement is a heuristic: the exit-bound accounting (R
accumulates every pred cell stranded by the ACTUAL window sequence
used, plus each row's right-edge cell, normalised by Smax * column) is
done against the windows this kernel chooses, so the caller's guard
(windowed best final STRICTLY beats R + Smax*(L-1) => traceback-visited
cells exact) is sound for it unchanged, and the same W ladder /
full-width fallback applies.  With W covering the whole read the fill
is bit-identical to `pathwise_engine._fill_pathwise` on on-lane,
in-read cells (pinned by tests/test_pallas_pathwise_win.py).

Reference scope: the reference's pathwise DP is full-width
(pathwise_alignment.rs:16) — this is beat-the-reference capability;
exactness is pinned against our own full-width engine through the
guard, exactly like the XLA windowed engine it accelerates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring import GAP
from .pallas_pathwise import _group_meta

NEG = -(1 << 28)
RINGD = 8
OFF = 1 << 16
ENC_MASK = (1 << 17) - 1
RADIX = 2                      # >100-vreg operands: throughput-bound
VMEM_BUDGET = 10 * 1024 * 1024


def _chain(x, jcol, W):
    """Inclusive lane prefix max (radix-2 Kogge-Stone), 3-D operand."""
    k = 1
    while k < W:
        x = jnp.maximum(
            x, jnp.where(jcol >= k, pltpu.roll(x, k, 2), NEG)
        )
        k *= 2
    return x


def _cumsum_lanes(x, jcol, W):
    """Inclusive lane prefix sum over a [Bt, W] window."""
    k = 1
    while k < W:
        x = x + jnp.where(jcol >= k, pltpu.roll(x, k, 1), 0)
        k *= 2
    return x


def _make_kernel(R: int, Gd: int, Bt: int, W: int, Lfull: int,
                 P_pad: int, n_scr: int):
    def kernel(
        grep_ref,       # i32[n_pad * Gd]   group rep path (-1 pad)
        gpred_ref,      # i32[n_pad * Gd]   group pred row (0 pad)
        codes_ref,      # i32[n_pad]
        gnode_ref,      # i32[n_pad]        table[code, '-']
        nrows_ref,      # i32[2]            [n - 1, smax]
        rmin_ref,       # i32[n_pad]
        rep_ref,        # i32[R, P_pad]     rep_of rows (block)
        on_ref,         # i32[R, P_pad]     paths_on rows (block)
        aux_ref,        # [Bt, 128]         lane0 = L
        subf,           # ANY [7, B, Lfull]
        gseqf,          # ANY [B, Lfull]
        out_any,        # out ANY [n_pad, B, P_pad, W]
        ws_out,         # out [Bt, n_scr]
        bound_out,      # out [Bt, 1]
        ring,           # scratch [RINGD, Bt, P_pad, W] i32
        farbuf,         # scratch [2, Bt, P_pad, W] i32
        st_al,          # scratch [Bt, P_pad, W] (multi-group Aq aligned)
        st_sh,          # scratch [Bt, P_pad, W] (multi-group Aq shifted)
        st_ral,         # scratch [Bt, P_pad, W] (multi-group Ar aligned)
        st_rsh,         # scratch [Bt, P_pad, W] (multi-group Ar shifted)
        row0,           # scratch [Bt, W]
        sub_w,          # scratch [Bt, W]
        gseq_w,         # scratch [Bt, W]
        bsp_s,          # scratch [n_scr, Bt]
        ws_v,           # scratch [n_scr, Bt]
        racc,           # scratch [Bt, 8]   exit-bound accumulator
        wss,            # SMEM scratch [n_scr]
        rsem,           # DMA sems (2,)
        wsem,           # DMA sem  ()
        dsem,           # DMA sems (2,)     window-plane fetches
    ):
        step = pl.program_id(1)
        bo = pl.program_id(0) * Bt
        jcol2 = jax.lax.broadcasted_iota(jnp.int32, (Bt, W), 1)
        jcol3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, P_pad, W), 2)
        qiota = jax.lax.broadcasted_iota(jnp.int32, (Bt, P_pad, W), 1)
        L = aux_ref[:, 0:1]                            # [Bt, 1]
        L3 = L[:, :, None]                             # [Bt, 1, 1]
        nrows = nrows_ref[0]
        smax = nrows_ref[1]
        NEGc = jnp.int32(NEG)

        @pl.when(step == 0)
        def _():
            racc[:, :] = jnp.full((Bt, 8), NEG, jnp.int32)
            # rows never written below (n-1 .. pad) read as placement 0
            # and bsp 0, like the XLA engine's zero-initialised arrays
            ws_v[:, :] = jnp.zeros((n_scr, Bt), jnp.int32)
            bsp_s[:, :] = jnp.zeros((n_scr, Bt), jnp.int32)

        for r in range(R):
            i = step * R + r
            ii = jnp.minimum(i, nrows - 1)
            live = (i >= 1) & (i < nrows)
            code_i = codes_ref[ii]
            gap_i = gnode_ref[ii]
            on3 = on_ref[r][None, :, None] != 0
            rep_row_meta = rep_ref[r][None, :, None]   # [1, P_pad, 1]

            # ---- row 0: gap ladder at window start 0 ----
            @pl.when(i == 0)
            def _():
                cp = pltpu.make_async_copy(
                    gseqf.at[pl.ds(bo, Bt), pl.ds(0, W)], gseq_w, dsem.at[1]
                )
                cp.start()
                cp.wait()
                g0 = _cumsum_lanes(gseq_w[:, :], jcol2, W)
                r0 = g0 - jnp.broadcast_to(g0[:, 0:1], (Bt, W))
                row0[:, :] = r0
                ring[0] = jnp.broadcast_to(
                    r0[:, None, :], (Bt, P_pad, W)
                )
                wcp = pltpu.make_async_copy(
                    ring.at[0], out_any.at[0, pl.ds(bo, Bt)], wsem
                )
                wcp.start()
                wcp.wait()
                wss[0] = 0
                # row 0's right-edge cell can L-exit right (XLA R0)
                ledge = jnp.max(
                    jnp.where(jcol2 == W - 1, r0, NEGc), 1, keepdims=True
                )
                r0edge = jnp.where(W - 1 < L, ledge - smax * (W - 1), NEGc)
                racc[:, 0:1] = jnp.maximum(racc[:, 0:1], r0edge)

            # ---- adaptive window (tile-uniform, 128-quantised) ----
            ms = jnp.full((Bt, 1), 1 << 28, jnp.int32)
            me = jnp.full((Bt, 1), NEG, jnp.int32)
            for g in range(Gd):
                pred_g = gpred_ref[ii * Gd + g]
                okg = (grep_ref[ii * Gd + g] >= 0) if g else live
                pb = jnp.transpose(
                    bsp_s[pl.ds(jnp.maximum(pred_g, 0), 1), :]
                )
                ms = jnp.where(okg & (pb < ms), pb, ms)
                me = jnp.where(okg & (pb > me), pb, me)
            center = (ms + me) // 2 + 1
            # + 128 on top of the XLA engine's W/8 margin: the tile
            # start floors to a 128 multiple (DMA lane alignment), and
            # without the pad that shift can eat the whole margin and
            # strand the advancing best frontier — whose normalised
            # exit term is ~0, making the bound vacuous
            rt = jnp.maximum(me + 2, L - rmin_ref[ii] + 2) + W // 8 + 128
            wsd = jnp.maximum(
                jnp.maximum(center - W // 2, rt - W), 0
            )                                          # [Bt, 1]
            ws = jnp.minimum((jnp.min(wsd) // 128) * 128, Lfull - W)
            ws = jnp.maximum(ws, 0)
            ws = jnp.where(i == 0, 0, ws)
            wsa = pl.multiple_of(ws, 128)
            jabs2 = ws + jcol2                         # [Bt, W]
            jabs3 = ws + jcol3
            at0 = jabs3 == 0
            in_read2 = jabs2 < L
            in_read3 = jabs3 < L3

            @pl.when(live)
            def _():
                wss[ii] = ws

            # ---- window DMAs: sub/gseq planes at this row's start ----
            @pl.when(live)
            def _():
                cps = [
                    pltpu.make_async_copy(
                        subf.at[code_i, pl.ds(bo, Bt), pl.ds(wsa, W)],
                        sub_w, dsem.at[0],
                    ),
                    pltpu.make_async_copy(
                        gseqf.at[pl.ds(bo, Bt), pl.ds(wsa, W)],
                        gseq_w, dsem.at[1],
                    ),
                ]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()

            sub3 = sub_w[:, :][:, None, :]
            Gw = _cumsum_lanes(gseq_w[:, :], jcol2, W)
            Gw3 = Gw[:, None, :]

            # ---- predecessor groups: fetch raw plane (pred frame),
            # account stranded cells, realign to this row's frame ----
            def fetch(slot, pred_g):
                far = (pred_g > 0) & (i - pred_g >= RINGD)

                @pl.when(far & live)
                def _():
                    cp = pltpu.make_async_copy(
                        out_any.at[pred_g, pl.ds(bo, Bt)],
                        farbuf.at[slot], rsem.at[slot],
                    )
                    cp.start()
                    cp.wait()

                rr = jnp.where(far, farbuf[slot],
                               ring[jnp.maximum(pred_g, 0) % RINGD])
                return jnp.where(
                    pred_g == 0,
                    jnp.broadcast_to(row0[:, :][:, None, :],
                                     (Bt, P_pad, W)),
                    rr,
                )

            def group_planes(slot, pred_g, rep_g, memb):
                """(Aq_al, Aq_sh, Ar_al, Ar_sh, racc_upd) for a group.

                memb: [1, P_pad, 1] membership mask (None = all paths —
                the single-group fast path).
                """
                rr = fetch(slot, pred_g)
                ws_p = wss[jnp.maximum(pred_g, 0)]
                d = ws - ws_p
                # exit-bound accounting on the RAW plane: cells of this
                # pred stranded by the current window (left of ws, or
                # at/right of its last column), normalised by smax*col
                jabs_p = ws_p + jcol3
                stranded = (
                    ((jabs_p < ws) | (jabs_p >= ws + W - 1))
                    & on3 & (jabs_p < L3)
                )
                if memb is not None:
                    stranded = stranded & memb
                norm = jnp.where(stranded, rr - smax * jabs_p, NEGc)
                rupd = jnp.max(jnp.max(norm, axis=2), axis=1,
                               keepdims=True)
                rep_raw = jnp.max(
                    jnp.where(qiota == rep_g, rr, NEGc), axis=1,
                    keepdims=True,
                )                                      # [Bt, 1, W]

                def align(src, dd):
                    rolled = pltpu.roll(src, (-dd) % W, 2)
                    okc = (jcol3[:, : src.shape[1]] + dd >= 0) & (
                        jcol3[:, : src.shape[1]] + dd < W
                    )
                    return jnp.where(okc, rolled, NEGc)

                return (align(rr, d), align(rr, d - 1),
                        align(rep_raw, d), align(rep_raw, d - 1), rupd)

            pred_0 = gpred_ref[ii * Gd]
            rep_0 = grep_ref[ii * Gd]
            Aq_al, Aq_sh, Ar_al0, Ar_sh0, rupd = group_planes(
                0, pred_0, rep_0, None
            )
            racc[:, 0:1] = jnp.maximum(
                racc[:, 0:1], jnp.where(live, rupd, NEGc)
            )
            Ar_al = jnp.broadcast_to(Ar_al0, (Bt, P_pad, W))
            Ar_sh = jnp.broadcast_to(Ar_sh0, (Bt, P_pad, W))
            if Gd > 1:
                multi = grep_ref[ii * Gd + 1] >= 0

                @pl.when(multi & live)
                def _():
                    st_al[:] = Aq_al
                    st_sh[:] = Aq_sh
                    st_ral[:] = Ar_al
                    st_rsh[:] = Ar_sh
                    for g in range(1, Gd):
                        pred_g = gpred_ref[ii * Gd + g]
                        rep_g = grep_ref[ii * Gd + g]
                        memb = rep_row_meta == rep_g
                        a, s, ra, rs, ru = group_planes(
                            1, pred_g, rep_g, memb
                        )
                        okg = rep_g >= 0
                        st_al[:] = jnp.where(okg & memb, a, st_al[:])
                        st_sh[:] = jnp.where(okg & memb, s, st_sh[:])
                        st_ral[:] = jnp.where(okg & memb, ra, st_ral[:])
                        st_rsh[:] = jnp.where(okg & memb, rs, st_rsh[:])
                        racc[:, 0:1] = jnp.maximum(
                            racc[:, 0:1], jnp.where(okg, ru, NEGc)
                        )

                Aq_al = jnp.where(multi, st_al[:], Aq_al)
                Aq_sh = jnp.where(multi, st_sh[:], Aq_sh)
                Ar_al = jnp.where(multi, st_ral[:], Ar_al)
                Ar_sh = jnp.where(multi, st_rsh[:], Ar_sh)

            # ---- rep solve: (max,+) chain over the window ----
            d_r = Ar_sh + sub3
            u_r = Ar_al + gap_i
            Achain = jnp.maximum(d_r, u_r)
            Achain = jnp.where(at0, Ar_al + gap_i, Achain)
            rep_row = Gw3 + _chain(Achain - Gw3, jcol3, W)
            dirD = rep_row == d_r
            dirU = ~dirD & (rep_row == u_r)
            # jcol==0 restarts the replay chain at the window edge
            # (lost L-runs => underestimate, covered by the guard)
            nonL = dirD | dirU | at0 | (jcol3 == 0)

            # ---- non-rep replay via the packed chain ----
            vD = Aq_sh + sub3
            vU = Aq_al + gap_i
            V = jnp.where(dirD, vD, vU)
            V = jnp.where(at0, Aq_al + gap_i, V)
            # clamp to the packing floor: out-of-window NEGs would
            # otherwise overflow the 17-bit field (pathwise_window:200)
            Vc = jnp.maximum(V - Gw3, -OFF)
            enc = jnp.where(nonL, (jcol3 << 17) | (Vc + OFF), -1)
            enc = _chain(enc, jcol3, W)
            row = Gw3 + (enc & ENC_MASK) - OFF
            row = jnp.where(on3, row, 0)
            row = jnp.where(in_read3, row, NEGc)
            row = jnp.where(live, row, 0)

            # ---- best position (rightmost max over on-lanes) ----
            rowv = jnp.max(jnp.where(on3, row, NEGc), axis=1)  # [Bt, W]
            rowv = jnp.where(in_read2, rowv, NEGc)
            rmaxv = jnp.max(rowv, axis=1, keepdims=True)
            bsp_i = jnp.max(
                jnp.where(rowv == rmaxv, jabs2, -1), axis=1, keepdims=True
            )

            # right-edge cells of THIS row can exit right via an in-row
            # L move
            edge = jnp.where(
                in_read2 & (jcol2 == W - 1), rowv - smax * jabs2, NEGc
            )
            eupd = jnp.max(edge, axis=1, keepdims=True)
            racc[:, 0:1] = jnp.maximum(
                racc[:, 0:1], jnp.where(live, eupd, NEGc)
            )

            # ---- stores ----
            @pl.when(live | (i >= nrows))
            def _():
                ring[i % RINGD] = row
                wcp = pltpu.make_async_copy(
                    ring.at[i % RINGD],
                    out_any.at[jnp.minimum(i, out_any.shape[0] - 1),
                               pl.ds(bo, Bt)],
                    wsem,
                )
                wcp.start()
                wcp.wait()

            @pl.when(live)
            def _():
                iw = jnp.minimum(i, n_scr - 1)
                bsp_s[pl.ds(iw, 1), :] = jnp.transpose(bsp_i)
                ws_v[pl.ds(iw, 1), :] = jnp.full((1, Bt), ws, jnp.int32)

            @pl.when(i == nrows - 1)
            def _():
                bound_out[:, :] = racc[:, 0:1] + smax * (L - 1)
                ws_out[:, :] = jnp.transpose(ws_v[:, :])

    return kernel


_cache: dict = {}


def pick_bt(B: int, P_pad: int, W: int, R: int) -> int:
    # words per (Bt x W) element: ring + farbuf + 4 staging planes on
    # the path axis, plus ~8 row-planes of slack for Mosaic temps
    words = (RINGD + 2 + 4) * P_pad + 8 * P_pad
    bt = 32
    while bt > 8 and (words * 4 * bt * W > VMEM_BUDGET or bt > B or B % bt):
        bt //= 2
    return bt


def fill_pathwise_win_pallas(dg, table, seq, L, W, rmin, Bt=None, R=8,
                             interpret=False):
    """Pallas windowed mode-4 fill; drop-in for
    `pathwise_window._fill_pathwise_win` (same outputs/guard contract,
    tile-uniform window placement).

    Returns (Aw int32[B, P, n, W], ws int32[B, n], bound int32[B]).
    """
    if W % 128:
        raise ValueError(f"W {W} not a multiple of 128")
    B, Lp = seq.shape
    P = dg.paths_number
    P_pad = -(-P // 8) * 8
    Lfull = -(-Lp // 128) * 128
    if Lfull != Lp:
        from .. import scoring

        seq = jnp.pad(seq, ((0, 0), (0, Lfull - Lp)),
                      constant_values=scoring.N)
    if W > Lfull:
        raise ValueError(f"window {W} wider than padded read {Lfull}")
    n = dg.n
    grep, gpred, Gd, steps, n_pad = _group_meta(dg, R)
    n_scr = -(-(n + 1) // 8) * 8
    B0 = B
    if Bt is None:
        Bt = pick_bt(-(-B // 8) * 8, P_pad, W, R)
    if B % Bt:   # chunk tails: pad with read 0, slice off below
        B = -(-B // Bt) * Bt
        seq = jnp.concatenate(
            [seq, jnp.broadcast_to(seq[:1], (B - B0, seq.shape[1]))]
        )
        L = jnp.concatenate([L, jnp.broadcast_to(L[:1], (B - B0,))])

    key = (n, P_pad, W, Lfull, Bt, R, B, Gd, interpret)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel(R, Gd, Bt, W, Lfull, P_pad, n_scr)
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=6,
                    grid=(B // Bt, steps),
                    in_specs=[
                        pl.BlockSpec((R, P_pad), lambda b, s, *_: (s, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, P_pad), lambda b, s, *_: (s, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 128), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pl.ANY),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=[
                        pl.BlockSpec(memory_space=pl.ANY),
                        pl.BlockSpec((Bt, n_scr), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((RINGD, Bt, P_pad, W), jnp.int32),
                        pltpu.VMEM((2, Bt, P_pad, W), jnp.int32),
                        pltpu.VMEM((Bt, P_pad, W), jnp.int32),
                        pltpu.VMEM((Bt, P_pad, W), jnp.int32),
                        pltpu.VMEM((Bt, P_pad, W), jnp.int32),
                        pltpu.VMEM((Bt, P_pad, W), jnp.int32),
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((Bt, W), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.VMEM((n_scr, Bt), jnp.int32),
                        pltpu.VMEM((Bt, 8), jnp.int32),
                        pltpu.SMEM((n_scr,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((2,)),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, B, P_pad, W), jnp.int32),
                    jax.ShapeDtypeStruct((B, n_scr), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _cache[key] = fn

    codes7 = jnp.arange(7, dtype=jnp.int32)
    subf = table[codes7][:, seq]                       # [7, B, Lfull]
    gseqf = table[seq, GAP]
    rep_in = jnp.zeros((n_pad, P_pad), jnp.int32).at[:n, :P].set(
        jnp.asarray(dg.rep_of)
    )
    on_in = jnp.zeros((n_pad, P_pad), jnp.int32).at[:n, :P].set(
        jnp.asarray(dg.paths_on, jnp.int32)
    )
    gnode = jnp.pad(table[dg.codes, GAP], (0, n_pad - n))
    codes = jnp.pad(dg.codes, (0, n_pad - n))
    smax = int(max(0, int(np.max(np.asarray(table)))))
    nrows = jnp.asarray([n - 1, smax], dtype=jnp.int32)
    rmin_in = jnp.zeros(n_pad, jnp.int32).at[:n].set(
        jnp.asarray(rmin, jnp.int32)
    )
    aux = jnp.zeros((B, 128), jnp.int32).at[:, 0].set(L)
    out, wsm, bound = fn(
        jnp.asarray(grep), jnp.asarray(gpred), codes, gnode, nrows,
        rmin_in, rep_in, on_in, aux, subf, gseqf,
    )
    # rows n-1..pad are written as zeros by the grid (live gate), but
    # n-1 may coincide with a pad slot clamp — force it like the XLA
    # engine's untouched zero row
    A = jnp.moveaxis(out[:n, :B0, :P, :].at[n - 1].set(0), 0, 2)
    return A, wsm[:B0, :n], bound[:B0, 0]
