"""Full-Pallas fill for the pathwise affine modes 6/7.

The XLA scan fill (pathwise_gap_engine._fill_gap) is measured ~10-15x
off the HBM roofline on TPU (PERF.md round-4 decomposition: 155 ms of
easy-row floor at ~116 us/row vs a ~10 us/row roofline, plus 93 ms of
per-row lax.cond boundaries and 83 ms of hard-branch staging).  This
kernel runs the ENTIRE fill in one pallas_call:

- grid (batch tiles, row blocks of R); the HBM output planes are the
  row history (the pallas_pathwise_bigp pattern): node-start rows DMA
  their predecessor rows back from the outputs, non-start rows read the
  previous row from VMEM scratch, so no scan carry exists and branch
  boundaries are Mosaic predication (pl.when on scratch) instead of
  XLA cond buffer copies;
- easy rows (97%+) run the closed-form vector program of
  pathwise_gap_engine.easy_row — alpha-lane (max,+) radix-4 chains,
  packed (column << 17 | value) replay for the mask lanes (requires
  the caller's ``fits`` gate);
- hard rows run the literal per-column program (gap.rs:150-539): the
  per-block staging is vectorised over columns in lane layout, then
  transposed into CT-column [*, P, Bt]/[*, MB, Bt] tiles so the
  inherently-sequential fori_loop runs on an in-register [P, Bt]
  state with leading-axis input slices and output stores — the exact
  ops/pallas_gap67_hardrow layout (its lane-masked [Bt, P]
  predecessor measured ~33 us/col; this runs <1 us/col);
- the multi-alpha insertion-order fixups (first-column and per-column)
  run exactly as the scalar spec (gap.rs:133-147, 521-537).

Exactness: bit-identical to _fill_gap on all three planes — pinned by
tests/test_pallas_gap67.py (interpret=True on CPU, example + fuzz
graphs) and by the modes-6/7 CLI goldens on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 28)
OFF = 1 << 16
ENC_MASK = (1 << 17) - 1

# row flag bits (host-packed into rowflags[n])
F_EASY = 1
F_START = 2
F_EDELTA = 4
F_FCAP = 8

# columns per transposed-buffer tile in the hard-row loop: the
# [*, P, Bt] buffers lane-pad Bt to 128, so full-Lp versions cost
# Lp*P*128*4 bytes each (the scoped-VMEM OOM); CT-column tiles bound
# them at CT*P*128*4 while the column chain carries across tiles.
CT = 64

# block flag bits (bflags[n, MB])
BF_VALID = 1
BF_DELTA = 2
BF_CASE1 = 4
BF_FIRST = 8
BF_FIRE = 16
BF_ISA = 32
BF_AFTER = 64


def _chain_radix4(x, jcol, Lp, op="max"):
    """Inclusive prefix max (or sum) over the lane (column) axis."""
    k = 1
    while k < Lp:
        cands = []
        for m in range(1, 4):
            d = m * k
            if d < Lp:
                r = pltpu.roll(x, d, x.ndim - 1)
                cands.append((d, r))
        for d, r in cands:
            if op == "max":
                x = jnp.maximum(x, jnp.where(jcol >= d, r, NEG))
            else:
                x = x + jnp.where(jcol >= d, r, 0)
        k *= 4
    return x


def _make_kernel(R: int, MB: int, Bt: int, P: int, semiglobal: bool,
                 strip: frozenset = frozenset()):
    """strip: DIAGNOSTIC-ONLY section stubs (results wrong) — 'hard'
    (skip the hard-row branch), 'easy' (skip the easy-row program),
    'x0' (zero first column), 'dma' (skip pred-row DMA fetches),
    'init' (skip the step-0 boundary writes), 'commit' (skip the HBM
    row writes), 'colloop' (skip the hard fori_loop).  Used to bisect
    Mosaic compile failures and locate the kernel's floor."""
    def kernel(
        # ---- scalar prefetch (SMEM) ----
        rowflags_ref,   # i32[n_pad]
        pr_ref,         # i32[n_pad]      easy pred row
        eap_ref,        # i32[n_pad]      easy pred alpha
        fap_ref,        # i32[n_pad]      alphas[i-1] (first col, non-start)
        alphas_ref,     # i32[n_pad]
        codes_ref,      # i32[n_pad]
        bpred_ref,      # i32[n_pad * MB]
        bap_ref,        # i32[n_pad * MB]
        btb_ref,        # i32[n_pad * MB]
        bflags_ref,     # i32[n_pad * MB]
        scal_ref,       # i32[8]: [o, e, n-2 (last real row), 0...]
        # ---- VMEM blocks ----
        emask_ref,      # i32[R, P]   common minus row alpha
        fmask_ref,      # i32[R, P]   first-col mask (non-start)
        bmask_ref,      # i32[R, MB, P]
        bmaskq_ref,     # i32[R, MB, P]
        bfix_ref,       # i32[R, MB, P]
        bownid_ref,     # i32[R, P]   owner block per lane (-1 none)
        bhot_ref,       # i32[R, P]   tb[own(p)] == p
        bhotl_ref,      # i32[R, P]   lane is a firing block's tb
        sub_ref,        # i32[7, Bt, Lp]
        # ---- outputs (ANY/HBM) ----
        dm_any,         # [n_pad, B, P, Lp]
        x_any,
        y_any,
        # ---- scratch ----
        prevD, prevY,          # [Bt, P, Lp]
        x0prevn,               # [Bt, P, 1]  prev row's first column
        row0,                  # [Bt, P, Lp]
        predD, predY,          # [Bt, P, Lp] DMA staging
        predX0,                # [Bt, P, 128] narrow first-col staging
        ycs, yfx, dfds,        # [Bt, P, Lp] hard staging
        x0buf,                 # [Bt, P, 1]  (column-constant program)
        outD, outX, outY,      # [Bt, P, Lp] write staging
        uT, dcT,               # [CT, MB, Bt] per-column block strips
        dfdT, ypreT,           # [CT, P, Bt]  per-column owner planes
        xoutT, doutT,          # [CT, P, Bt]  column-loop outputs
        rsem,                  # DMA sems (4,)
        wsem,                  # DMA sems (3,)
    ):
        step = pl.program_id(1)
        bo = pl.program_id(0) * Bt
        Lp = sub_ref.shape[2]
        o = scal_ref[0]
        e = scal_ref[1]
        nlast = scal_ref[2]    # n - 2: the last real row
        jc1 = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1, Lp), 2)
        jcol3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, P, Lp), 2)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, P, Lp), 1)
        j0 = jcol3 == 0

        lane_n = jax.lax.broadcasted_iota(jnp.int32, (Bt, P, 1), 1)
        jc128 = jax.lax.broadcasted_iota(jnp.int32, (Bt, P, 128), 2)

        def subl(v, a):
            """Extract path lane ``a`` (sublane axis) -> [Bt, 1, Lp]."""
            return jnp.max(
                jnp.where(lane3 == a, v, NEG), axis=1, keepdims=True
            )

        def subl_n(v, a):
            """Narrow ([Bt, P, 1]) path-lane extract -> [Bt, 1, 1]."""
            return jnp.max(
                jnp.where(lane_n == a, v, NEG), axis=1, keepdims=True
            )

        @pl.when(step == 0)
        def _():
            # row 0: o + e*j ladder on the row-0 alpha lane (gap.rs:23-33)
            a0 = alphas_ref[0]
            ladder = (o + e * jcol3) * jnp.where(jcol3 >= 1, 1, 0)
            r0 = jnp.where((lane3 == a0) & (jcol3 >= 1), ladder, 0)
            row0[:, :, :] = r0
            prevD[:, :, :] = r0
            prevY[:, :, :] = r0
            x0prevn[:, :, :] = jnp.zeros((Bt, P, 1), jnp.int32)
            outX[:, :, :] = jnp.zeros((Bt, P, Lp), jnp.int32)
            # write rows 0 and n-1 (X row 0 is zeros; row n-1 all zeros)
            if "init" not in strip:
                for dst, src in ((dm_any, row0), (y_any, row0),
                                 (x_any, outX)):
                    cp = pltpu.make_async_copy(
                        src, dst.at[0, pl.ds(bo, Bt)], wsem.at[0]
                    )
                    cp.start()
                    cp.wait()
                for dst in (dm_any, x_any, y_any):
                    cp = pltpu.make_async_copy(
                        outX, dst.at[nlast + 1, pl.ds(bo, Bt)], wsem.at[0]
                    )
                    cp.start()
                    cp.wait()

        def fetch(plane_any, buf, pred, skiprow, sem):
            """DMA row ``pred`` of an output plane into ``buf``.  Row 0
            is served from scratch by the callers, and row ``skiprow``
            (the immediately previous row, whose commit copy may still
            be in flight under the deferred-wait scheme) from the
            prev* scratch — so no fetch ever reads an uncommitted HBM
            row."""
            if "dma" in strip:
                return

            @pl.when((pred > 0) & (pred != skiprow))
            def _():
                cp = pltpu.make_async_copy(
                    plane_any.at[pred, pl.ds(bo, Bt)], buf, rsem.at[sem]
                )
                cp.start()
                cp.wait()

        # ------------------------------------------------------------------
        # row loop
        # ------------------------------------------------------------------
        for r in range(R):
            i = step * R + r
            ii = jnp.minimum(i, nlast)   # clamp tail-pad SMEM reads
            live = (i >= 1) & (i <= nlast)
            flags = jnp.where(live, rowflags_ref[ii], F_EASY)
            ai = alphas_ref[ii]
            is_start = (flags & F_START) != 0
            is_hard = ((flags & F_EASY) == 0) & live
            code_i = codes_ref[ii]
            sub3 = sub_ref[code_i][:, None, :]               # [Bt, 1, Lp]

            # ---- first column -> x0buf (gap.rs:35-147) ----
            # the whole first-column program is column-constant, so it
            # runs on [Bt, P, 1] narrow planes (prev row's first column
            # lives in x0prevn — outX column 0 IS x0 for every row);
            # consumers broadcast the narrow buf where a plane is needed
            if "x0" in strip:
                x0buf[:, :, :] = jnp.zeros((Bt, P, 1), jnp.int32)
            elif semiglobal:
                x0buf[:, :, :] = jnp.zeros((Bt, P, 1), jnp.int32)
            else:
                # both branches run unconditionally on the narrow
                # planes and a select picks one: with the full-plane
                # program this was measured SLOWER than the two
                # pl.whens (commit 2abeb70), but the narrow ops are ~3
                # vregs each and the per-row branch overhead dominated
                # the r4 decomposition — only the pred DMAs stay
                # predicated (start rows with a far pred)
                ap = fap_ref[ii]
                cap = (flags & F_FCAP) != 0
                Xp0n = x0prevn[:, :, :]
                xp_ai = subl_n(Xp0n, ai)
                xp_ap = subl_n(Xp0n, ap)
                x_ai_t = jnp.where(ii == 1, o + e, xp_ai + e)
                x_ai_f = jnp.where(ii == 1, o + e, xp_ai + xp_ap + e)
                x_ai = jnp.where(cap, x_ai_t, x_ai_f)
                xm = jnp.where(cap, Xp0n, Xp0n - xp_ai)
                fm = fmask_ref[r][None, :, None]
                x0_ns = jnp.where(fm != 0, xm, 0)
                x0_ns = jnp.where(lane_n == ai, x_ai, x0_ns)

                x0 = jnp.zeros((Bt, P, 1), jnp.int32)
                for s in range(MB):
                    bf = bflags_ref[ii * MB + s]
                    valid = ((bf & BF_VALID) != 0) & is_start & live
                    pred_s = jnp.where(valid, bpred_ref[ii * MB + s], 0)
                    if "dma" not in strip and "x0dma" not in strip:

                        @pl.when((pred_s > 0) & (pred_s != ii - 1))
                        def _(pred_s=pred_s):
                            cp = pltpu.make_async_copy(
                                x_any.at[pred_s, pl.ds(bo, Bt),
                                         slice(None), pl.ds(0, 128)],
                                predX0, rsem.at[3],
                            )
                            cp.start()
                            cp.wait()

                    pc0 = jnp.max(
                        jnp.where(jc128 == 0, predX0[:, :, :], NEG),
                        axis=2, keepdims=True,
                    )
                    Xp0n = jnp.where(
                        pred_s == 0, jnp.zeros((Bt, P, 1), jnp.int32),
                        jnp.where(pred_s == ii - 1,
                                  x0prevn[:, :, :], pc0))
                    tb_s = btb_ref[ii * MB + s]
                    ap_s = bap_ref[ii * MB + s]
                    d_s = jnp.where((bf & BF_DELTA) != 0, 1, 0)
                    xp_tb = subl_n(Xp0n, tb_s)
                    xp_ap = subl_n(Xp0n, ap_s)
                    x_tb = jnp.where(pred_s == 0, o + e,
                                     xp_tb + d_s * xp_ap + e)
                    xm = Xp0n - d_s * xp_tb
                    mb = bmask_ref[r, s][None, :, None] != 0
                    x0 = jnp.where(valid & mb, xm, x0)
                    x0 = jnp.where(valid & (lane_n == tb_s), x_tb, x0)
                # insertion-order fixup (gap.rs:133-147)
                for s in range(MB):
                    bf = bflags_ref[ii * MB + s]
                    tb_s = btb_ref[ii * MB + s]
                    fire = ((bf & BF_VALID) != 0) & (
                        (bf & BF_FIRST) != 0) & (tb_s != ai) & is_start \
                        & live
                    va = subl_n(x0, tb_s) - subl_n(x0, ai)
                    x0 = jnp.where(fire & (lane_n == tb_s), va, x0)
                    fx = bfix_ref[r, s][None, :, None] != 0
                    x0 = jnp.where(fire & fx, x0 + va, x0)
                x0buf[:, :, :] = jnp.where(is_start, x0, x0_ns)

            x0 = x0buf[:, :, :]                            # [Bt, P, 1]

            # ---- easy pred planes (start rows DMA; others use prev;
            # pred == i-1 reads prev* — see fetch) ----
            pr_i = jnp.where(is_start & ~is_hard & live, pr_ref[ii], 0)
            fetch(dm_any, predD, pr_i, ii - 1, 0)
            fetch(y_any, predY, pr_i, ii - 1, 1)
            use_hbm = is_start & (pr_i > 0) & (pr_i != ii - 1)
            use_prev = ~is_start | (pr_i == ii - 1)
            pD = jnp.where(use_hbm, predD[:, :, :],
                           jnp.where(use_prev, prevD[:, :, :],
                                     row0[:, :, :]))
            pY = jnp.where(use_hbm, predY[:, :, :],
                           jnp.where(use_prev, prevY[:, :, :],
                                     row0[:, :, :]))

            # ---- wait for the previous row's commit copies before the
            # out* staging is rewritten (the copies overlap the first-
            # column + fetch + easy-row compute above/below; row i-1
            # started copies iff it was live, i.e. iff i >= 2 here) ----
            if "commit" not in strip:

                @pl.when((i >= 2) & live)
                def _():
                    for k, (dst, src) in enumerate(
                        ((dm_any, outD), (x_any, outX), (y_any, outY))
                    ):
                        pltpu.make_async_copy(
                            src, dst.at[jnp.maximum(ii - 1, 0),
                                        pl.ds(bo, Bt)], wsem.at[k]
                        ).wait()

            # ---- easy row (pathwise_gap_engine.easy_row) ----
            @pl.when(~is_hard & live & ("easy" not in strip))
            def _():
                ap = eap_ref[ii]
                d32 = jnp.where((flags & F_EDELTA) != 0, 1, 0)
                pD_ap = subl(pD, ap)
                pD_ai = subl(pD, ai)
                pY_ap = subl(pY, ap)
                pY_ai = subl(pY, ai)

                u_y = pY_ap + d32 * pY_ai + e
                u_dpm = pD_ap + d32 * pD_ai + o + e
                usel = u_dpm >= u_y
                y_a = jnp.where(usel, u_dpm, u_y)            # [Bt, 1, Lp]
                Ym = jnp.where(usel, pD - d32 * pD_ai, pY - d32 * pY_ai)

                base = pD_ap + d32 * pD_ai
                d_col = pltpu.roll(base, 1, 2) + sub3        # col 0 unused
                const = jnp.maximum(d_col, y_a)
                x0_ai = subl_n(x0, ai)
                q = const - e * jc1
                q = jnp.where(jc1 == 0,
                              jnp.maximum(x0_ai, x0_ai - o), q)
                M = _chain_radix4(q, jc1, Lp)
                x_a = o + e * jc1 + pltpu.roll(M, 1, 2)
                x_a = jnp.where(jc1 == 0, x0_ai, x_a)
                dpm_a = jnp.maximum(const, x_a)
                dpm_a = jnp.where(jc1 == 0, x0_ai, dpm_a)
                lsel = (dpm_a + o >= x_a).astype(jnp.int32)
                dsel = jnp.where(dpm_a == d_col, 0,
                                 jnp.where(dpm_a == y_a, 1, 2))

                Dmn = pD - d32 * pD_ai
                Dm_sh = pltpu.roll(Dmn, 1, 2)
                Cval = jnp.where(dsel == 0, Dm_sh, Ym)
                Cval = jnp.where(j0, x0, Cval)
                inject = pltpu.roll(lsel, 1, 2) * jnp.where(
                    pltpu.roll(dsel, 1, 2) != 2, 1, 0
                )
                l0 = jnp.max(jnp.where(jc1 == 0, lsel, 0), 2,
                             keepdims=True)
                inject = jnp.where(jc1 == 1, l0, inject)
                inject = jnp.where(jc1 == 0, 0, inject)
                src = _chain_radix4(jnp.where(inject != 0, jc1, 0), jc1, Lp)
                Cval_sh = pltpu.roll(Cval, 1, 2)
                enc = jnp.where(inject != 0,
                                (jc1 << 17) | (Cval_sh + OFF), -1)
                encM = _chain_radix4(enc, jc1, Lp)
                x_m = jnp.where(src == 0, x0, (encM & ENC_MASK) - OFF)
                dpm_m = jnp.where(dsel == 0, Dm_sh,
                                  jnp.where(dsel == 1, Ym, x_m))

                interior = jcol3 >= 1
                la = lane3 == ai
                lm = emask_ref[r][None, :, None] != 0
                outY[:, :, :] = jnp.where(
                    interior & la, y_a,
                    jnp.where(interior & lm, Ym, 0))
                outX[:, :, :] = jnp.where(
                    interior & la, x_a,
                    jnp.where(interior & lm, x_m,
                              jnp.where(~interior, x0, 0)))
                outD[:, :, :] = jnp.where(
                    interior & la, dpm_a,
                    jnp.where(interior & lm, dpm_m,
                              jnp.where(~interior, x0, 0)))

            # ---- hard row (gap.rs:150-539) ----
            if "hard" not in strip:   # (kept even at MB == 1:
                # re-alpha'd rows are hard)

                @pl.when(is_hard)
                def _():
                    own1 = bownid_ref[r][None, :, None]      # [1, P, 1]
                    ycs[:, :, :] = jnp.zeros((Bt, P, Lp), jnp.int32)
                    dfds[:, :, :] = jnp.zeros((Bt, P, Lp), jnp.int32)
                    iota_mb = jax.lax.broadcasted_iota(
                        jnp.int32, (Lp, MB, Bt), 1)
                    uTv = jnp.zeros((Lp, MB, Bt), jnp.int32)
                    dcTv = jnp.zeros((Lp, MB, Bt), jnp.int32)
                    # per-block staging: U/y pass + D candidates
                    for s in range(MB if "stage" not in strip else 0):
                        bf = bflags_ref[ii * MB + s]
                        valid = (bf & BF_VALID) != 0
                        pred_s = jnp.where(valid,
                                           bpred_ref[ii * MB + s], 0)
                        fetch(dm_any, predD, pred_s, ii - 1, 0)
                        fetch(y_any, predY, pred_s, ii - 1, 1)
                        Dp_s = jnp.where(
                            pred_s == 0, row0[:, :, :],
                            jnp.where(pred_s == ii - 1, prevD[:, :, :],
                                      predD[:, :, :]))
                        Yp_s = jnp.where(
                            pred_s == 0, row0[:, :, :],
                            jnp.where(pred_s == ii - 1, prevY[:, :, :],
                                      predY[:, :, :]))
                        tb_s = btb_ref[ii * MB + s]
                        ap_s = bap_ref[ii * MB + s]
                        d_s = jnp.where((bf & BF_DELTA) != 0, 1, 0)
                        yp_tb = subl(Yp_s, tb_s)
                        yp_ap = subl(Yp_s, ap_s)
                        dp_tb = subl(Dp_s, tb_s)
                        dp_ap = subl(Dp_s, ap_s)
                        u_y = yp_ap + d_s * yp_tb + e
                        u_dpm = dp_ap + d_s * dp_tb + o + e
                        usel = u_dpm >= u_y
                        u = jnp.where(usel, u_dpm, u_y)
                        if "ystage" not in strip:
                            case1 = (bf & BF_CASE1) != 0
                            mb = bmask_ref[r, s][None, :, None] != 0
                            # select the INT masks, then compare: a
                            # select between two i1 vectors crashes the
                            # Mosaic compiler (the known i1-select cliff
                            # — interpret does not catch it)
                            elsemask = jnp.where(
                                case1, bmaskq_ref[r, s], bmask_ref[r, s]
                            )[None, :, None] != 0
                            yc = ycs[:, :, :]
                            yc = jnp.where(valid & usel & mb,
                                           Dp_s - d_s * dp_tb, yc)
                            yc = jnp.where(valid & ~usel & elsemask,
                                           Yp_s - d_s * yp_tb, yc)
                            yc = jnp.where(valid & (lane3 == tb_s), u, yc)
                            ycs[:, :, :] = yc
                        # D candidates read pred column j-1; the u/Dc
                        # strips transpose to [Lp, MB, Bt] (one 2-D
                        # transpose per block per row — the column loop
                        # then reads leading-axis slices)
                        Dp_sh = pltpu.roll(Dp_s, 1, 2)
                        dsh_tb = pltpu.roll(dp_tb, 1, 2)
                        dsh_ap = pltpu.roll(dp_ap, 1, 2)
                        if "stripswr" not in strip:
                            uTs = jnp.transpose(u[:, 0, :])      # [Lp,Bt]
                            dcTs = jnp.transpose(
                                (dsh_ap + d_s * dsh_tb + sub3)[:, 0, :]
                            )
                            uTv = jnp.where(
                                iota_mb == s, uTs[:, None, :], uTv)
                            dcTv = jnp.where(
                                iota_mb == s, dcTs[:, None, :], dcTv)
                        if "dstage" not in strip:
                            dfd_s = Dp_sh - d_s * dsh_tb
                            dfds[:, :, :] = jnp.where(
                                valid & (own1 == s), dfd_s, dfds[:, :, :]
                            )
                    # y multi-alpha fixup (gap.rs:521-537); the D select
                    # reads the PRE-fixup y (ycs), as the scalar does
                    y_f = ycs[:, :, :]
                    for s in range(MB if "yfix" not in strip else 0):
                        bf = bflags_ref[ii * MB + s]
                        tb_s = btb_ref[ii * MB + s]
                        fire = ((bf & BF_VALID) != 0) & (
                            (bf & BF_FIRST) != 0) & (tb_s != ai)
                        va = subl(y_f, tb_s) - subl(y_f, ai)
                        y_f = jnp.where(fire & (lane3 == tb_s), va, y_f)
                        fx = bfix_ref[r, s][None, :, None] != 0
                        y_f = jnp.where(fire & fx, y_f + va, y_f)
                    yfx[:, :, :] = y_f

                    # ---- column chain on the in-register [P, Bt] state
                    # (paths on SUBLANES, reads on lanes — the
                    # pallas_gap67_hardrow layout: per-column inputs are
                    # leading-axis slices of the transposed staging, all
                    # extracts are sublane one-hot sums, outputs are
                    # leading-axis stores.  The first version kept P on
                    # lanes and paid ~33 us/col in lane-masked extracts
                    # + full-tile RMW — 290 of the 405 ms fill.)
                    sub_i = jax.lax.broadcasted_iota(jnp.int32, (P, Bt), 0)
                    ai_hotT = sub_i == ai
                    ownT = jnp.transpose(bownid_ref[r : r + 1, :])  # [P,1]
                    hotT = jnp.transpose(bhot_ref[r : r + 1, :]) != 0
                    hotlT = jnp.transpose(bhotl_ref[r : r + 1, :]) != 0
                    x0c = jnp.max(x0, 2)      # [Bt, P] (narrow)
                    x0t = jnp.transpose(x0c)                  # [P, Bt]
                    # column-invariant per-block state, hoisted out of
                    # the fori_loop body (each was recomputed per
                    # column: 3 one-hot planes, a transpose, and the
                    # flag scalars x MB x 255 columns)
                    tb_hots, own_hots, nds = [], [], []
                    isas, afters, fires, infixT = [], [], [], []
                    for s in range(MB):
                        tb_s = btb_ref[ii * MB + s]
                        bf = bflags_ref[ii * MB + s]
                        tb_hots.append(sub_i == tb_s)
                        own_hots.append(ownT == s)
                        nds.append(jnp.where(tb_s != ai, 1, 0))
                        isas.append(jnp.where((bf & BF_ISA) != 0, 1, 0))
                        afters.append(
                            jnp.where((bf & BF_AFTER) != 0, 1, 0))
                        fires.append(
                            jnp.where((bf & BF_FIRE) != 0, 1, 0))
                        infixT.append(jnp.transpose(
                            bfix_ref[r, s : s + 1, :]) != 0)

                    def col(jj, carry):
                        x_row, d_row = carry                  # [P, Bt]
                        u_j = uT[jj]                          # [MB, Bt]
                        dc_j = dcT[jj]
                        dfd_j = dfdT[jj]                      # [P, Bt]
                        ypre_j = ypreT[jj]
                        x_ai = jnp.sum(jnp.where(ai_hotT, x_row, 0), 0,
                                       keepdims=True)
                        d_ai = jnp.sum(jnp.where(ai_hotT, d_row, 0), 0,
                                       keepdims=True)
                        x_new = jnp.zeros_like(x_row)
                        stats = []
                        for s in range(MB):
                            nd_s = nds[s]
                            tb_hot = tb_hots[s]
                            x_tb = jnp.sum(jnp.where(tb_hot, x_row, 0), 0,
                                           keepdims=True)
                            d_tb = jnp.sum(jnp.where(tb_hot, d_row, 0), 0,
                                           keepdims=True)
                            l_x = x_tb + nd_s * x_ai + e
                            l_dpm = d_tb + nd_s * d_ai + o + e
                            lsel = l_dpm >= l_x
                            l_s = jnp.where(lsel, l_dpm, l_x)  # [1, Bt]
                            u_s = u_j[s : s + 1]
                            dc_s = dc_j[s : s + 1]
                            mx_s = jnp.maximum(jnp.maximum(dc_s, u_s), l_s)
                            stats.append((lsel, mx_s, u_s, dc_s))
                            xm = jnp.where(lsel, d_row - nd_s * d_tb,
                                           x_row - nd_s * x_tb)
                            x_new = jnp.where(
                                own_hots[s], jnp.where(hotT, l_s, xm),
                                x_new)
                        d_new = jnp.zeros_like(d_row)
                        for s in range(MB):
                            lsel, mx_s, u_s, dc_s = stats[s]
                            is_d = mx_s == dc_s
                            is_u = jnp.logical_and(
                                jnp.logical_not(is_d), mx_s == u_s)
                            dm = jnp.where(is_d, dfd_j,
                                           jnp.where(is_u, ypre_j, x_new))
                            d_new = jnp.where(
                                own_hots[s], jnp.where(hotT, mx_s, dm),
                                d_new)
                        # per-column multi-alpha fixup
                        d_ai2 = jnp.sum(jnp.where(ai_hotT, d_new, 0), 0,
                                        keepdims=True)
                        x_ai2 = jnp.sum(jnp.where(ai_hotT, x_new, 0), 0,
                                        keepdims=True)
                        va0d, va0x = [], []
                        va_adj_d = jnp.zeros_like(d_ai2)
                        va_adj_x = jnp.zeros_like(x_ai2)
                        for s in range(MB):
                            m_tb_d = jnp.sum(
                                jnp.where(tb_hots[s], d_new, 0), 0,
                                keepdims=True)
                            m_tb_x = jnp.sum(
                                jnp.where(tb_hots[s], x_new, 0), 0,
                                keepdims=True)
                            v0d = m_tb_d - d_ai2
                            v0x = m_tb_x - x_ai2
                            va0d.append(v0d)
                            va0x.append(v0x)
                            va_adj_d = va_adj_d + isas[s] * v0d
                            va_adj_x = va_adj_x + isas[s] * v0x
                        adds_d = jnp.zeros_like(d_new)
                        adds_x = jnp.zeros_like(x_new)
                        hotv_d = jnp.zeros_like(d_new)
                        hotv_x = jnp.zeros_like(x_new)
                        for s in range(MB):
                            vad = (va0d[s] - afters[s] * va_adj_d) * fires[s]
                            vax = (va0x[s] - afters[s] * va_adj_x) * fires[s]
                            adds_d = jnp.where(infixT[s], adds_d + vad,
                                               adds_d)
                            adds_x = jnp.where(infixT[s], adds_x + vax,
                                               adds_x)
                            hotv_d = jnp.where(tb_hots[s], hotv_d + vad,
                                               hotv_d)
                            hotv_x = jnp.where(tb_hots[s], hotv_x + vax,
                                               hotv_x)
                        d_fin = jnp.where(hotlT, hotv_d, d_new + adds_d)
                        x_fin = jnp.where(hotlT, hotv_x, x_new + adds_x)
                        xoutT[jj] = x_fin
                        doutT[jj] = d_fin
                        return x_fin, d_fin

                    carry = (x0t, x0t)
                    for ct in range(Lp // CT):
                        c0 = ct * CT
                        uT[:, :, :] = uTv[c0 : c0 + CT]
                        dcT[:, :, :] = dcTv[c0 : c0 + CT]
                        dfdT[:, :, :] = jnp.transpose(
                            dfds[:, :, c0 : c0 + CT], (2, 1, 0))
                        ypreT[:, :, :] = jnp.transpose(
                            ycs[:, :, c0 : c0 + CT], (2, 1, 0))
                        if ct == 0:
                            xoutT[0] = x0t
                            doutT[0] = x0t
                        if "colloop" not in strip:
                            carry = jax.lax.fori_loop(
                                1 if ct == 0 else 0, CT, col, carry)
                        outX[:, :, c0 : c0 + CT] = jnp.transpose(
                            xoutT[:, :, :], (2, 1, 0))
                        outD[:, :, c0 : c0 + CT] = jnp.transpose(
                            doutT[:, :, :], (2, 1, 0))
                    outY[:, :, :] = jnp.where(j0, 0, yfx[:, :, :])

            # ---- commit: carry scratch + HBM writes ----
            Drow = outD[:, :, :]
            Xrow = outX[:, :, :]
            Yrow = outY[:, :, :]

            @pl.when(live)
            def _():
                prevD[:, :, :] = Drow
                x0prevn[:, :, :] = x0buf[:, :, :]
                prevY[:, :, :] = Yrow
                if "commit" not in strip:
                    # start only — the wait is deferred to the point
                    # the next row rewrites the staging (or the drain
                    # below for the last live row)
                    for k, (dst, src) in enumerate(
                        ((dm_any, outD), (x_any, outX), (y_any, outY))
                    ):
                        pltpu.make_async_copy(
                            src, dst.at[ii, pl.ds(bo, Bt)], wsem.at[k]
                        ).start()

            if "commit" not in strip:

                @pl.when(i == nlast + 1)
                def _():
                    for k, (dst, src) in enumerate(
                        ((dm_any, outD), (x_any, outX), (y_any, outY))
                    ):
                        pltpu.make_async_copy(
                            src, dst.at[nlast, pl.ds(bo, Bt)], wsem.at[k]
                        ).wait()

    return kernel


_cache: dict = {}


def fill_gap67_pallas(xs, table, seq, o, e, semiglobal, interpret=False,
                      Bt=None, R=8, strip: frozenset = frozenset()):
    """Run the full fill; ``xs`` is the host-packed metadata from
    :func:`pack_meta`.  Returns (Dm, X, Y) int32[n, B, P, Lp]."""
    (n, P, MB, rowflags, pr, eap, fap, alphas, codes, bpred, bap, btb,
     bflags, emask, fmask, bmask, bmaskq, bfix, bownid, bhot, bhotl) = xs
    B0, Lp = seq.shape
    # DMA slices need 8-aligned trailing dims: pad the path axis with
    # inert lanes (all masks 0, owner -1 -> those lanes stay 0, matching
    # the engine's untouched-lane convention) and the batch up to the
    # tile size
    P0 = P
    P = -(-P // 8) * 8

    def padp(a, fill=0):
        return np.pad(np.asarray(a), ((0, 0),) * (a.ndim - 1)
                      + ((0, P - P0),), constant_values=fill)

    emask, fmask, bhot, bhotl = (padp(a) for a in
                                 (emask, fmask, bhot, bhotl))
    bmask, bmaskq, bfix = (padp(a) for a in (bmask, bmaskq, bfix))
    bownid = padp(bownid, fill=-1)
    if Bt is None:
        # Scoped-VMEM budget (the 16 MB limit the compiler enforces):
        # 14 [Bt, P, Lp] scratch planes + the double-buffered sub table
        # + the transposed column-tile buffers, whose minor axis is Bt
        # and therefore lane-pads to 128 (Bt-independent cost).
        mb8 = -(-MB // 8) * 8
        tbytes = (2 * CT * mb8 + 4 * CT * P) * 128 * 4
        Bt = 32
        while Bt > 8 and (
            4 * Bt * Lp * (14 * P + 14) + tbytes > 12 * 1024 * 1024
        ):
            Bt //= 2
    Bt = min(Bt, -(-B0 // 8) * 8)
    B = -(-B0 // Bt) * Bt
    if B != B0:
        seq = jnp.concatenate(
            [seq, jnp.broadcast_to(seq[:1], (B - B0, Lp))], axis=0
        )
    steps = -(-n // R)
    n_pad = steps * R

    key = (n, P, MB, B, Lp, Bt, R, bool(semiglobal), interpret, strip)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel(R, MB, Bt, P, bool(semiglobal), strip)
        grid = (B // Bt, steps)
        bspec = lambda shape: pl.BlockSpec(
            shape, lambda b, s, *_: (s,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM)
        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=11,
                grid=grid,
                in_specs=[
                    bspec((R, P)),          # emask
                    bspec((R, P)),          # fmask
                    bspec((R, MB, P)),      # bmask
                    bspec((R, MB, P)),      # bmaskq
                    bspec((R, MB, P)),      # bfix
                    bspec((R, P)),          # bownid
                    bspec((R, P)),          # bhot
                    bspec((R, P)),          # bhotl
                    pl.BlockSpec((7, Bt, Lp), lambda b, s, *_: (0, b, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                scratch_shapes=[
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # prevD
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # prevY
                    pltpu.VMEM((Bt, P, 1), jnp.int32),     # x0prevn
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # row0
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # predD
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # predY
                    pltpu.VMEM((Bt, P, 128), jnp.int32),   # predX0
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # ycs
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # yfx
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # dfds
                    pltpu.VMEM((Bt, P, 1), jnp.int32),     # x0buf
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # outD
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # outX
                    pltpu.VMEM((Bt, P, Lp), jnp.int32),    # outY
                ] + [
                    pltpu.VMEM((CT, MB, Bt), jnp.int32),   # uT
                    pltpu.VMEM((CT, MB, Bt), jnp.int32),   # dcT
                    pltpu.VMEM((CT, P, Bt), jnp.int32),    # dfdT
                    pltpu.VMEM((CT, P, Bt), jnp.int32),    # ypreT
                    pltpu.VMEM((CT, P, Bt), jnp.int32),    # xoutT
                    pltpu.VMEM((CT, P, Bt), jnp.int32),    # doutT
                    pltpu.SemaphoreType.DMA((4,)),
                    pltpu.SemaphoreType.DMA((3,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, B, P, Lp), jnp.int32)
                for _ in range(3)
            ],
            interpret=interpret,
        )
        _cache[key] = fn

    def padn(a, fill=0):
        pad = n_pad - a.shape[0]
        if a.ndim == 1:
            return np.pad(a, (0, pad), constant_values=fill)
        return np.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                      constant_values=fill)

    sub = table[:, seq]                                     # [7, B, Lp]
    scal = jnp.stack([jnp.int32(o), jnp.int32(e), jnp.int32(n - 2),
                      jnp.int32(0), jnp.int32(0), jnp.int32(0),
                      jnp.int32(0), jnp.int32(0)])
    i32 = lambda a: jnp.asarray(padn(np.asarray(a, np.int32)))
    out = fn(
        i32(rowflags), i32(pr), i32(eap), i32(fap), i32(alphas),
        i32(codes),
        jnp.asarray(padn(np.asarray(bpred, np.int32)).reshape(-1)),
        jnp.asarray(padn(np.asarray(bap, np.int32)).reshape(-1)),
        jnp.asarray(padn(np.asarray(btb, np.int32)).reshape(-1)),
        jnp.asarray(padn(np.asarray(bflags, np.int32)).reshape(-1)),
        scal,
        i32(emask), i32(fmask), i32(bmask), i32(bmaskq), i32(bfix),
        jnp.asarray(padn(np.asarray(bownid, np.int32), fill=-1)),
        i32(bhot), i32(bhotl),
        sub,
    )
    Dm, X, Y = (p[:n, :B0, :P0] for p in out)
    return Dm, X, Y


def pack_meta(meta):
    """Pack GapMeta into the kernel's flag/id arrays (host, numpy)."""
    n, P, MB = meta.n, meta.P, meta.maxb
    rowflags = (
        meta.easy.astype(np.int32) * F_EASY
        + meta.node_start.astype(np.int32) * F_START
        + meta.edelta.astype(np.int32) * F_EDELTA
        + meta.fcommon_ap.astype(np.int32) * F_FCAP
    )
    bflags = (
        meta.bvalid.astype(np.int32) * BF_VALID
        + meta.bdelta.astype(np.int32) * BF_DELTA
        + meta.bcase1.astype(np.int32) * BF_CASE1
        + meta.bfirst.astype(np.int32) * BF_FIRST
        + meta.bfire.astype(np.int32) * BF_FIRE
        + meta.bisa.astype(np.int32) * BF_ISA
        + meta.bafter.astype(np.int32) * BF_AFTER
    )
    own = meta.bown                                  # [n, MB, P] bool
    own_any = own.any(axis=1)
    bownid = np.where(own_any, own.argmax(axis=1), -1).astype(np.int32)
    tb_of_own = np.take_along_axis(
        np.asarray(meta.btb), np.maximum(bownid, 0), axis=1
    )
    lanes = np.arange(P)[None, :]
    bhot = (own_any & (tb_of_own == lanes)).astype(np.int32)
    fire = meta.bfire                                # [n, MB]
    oh = meta.btb[:, :, None] == lanes[None]         # [n, MB, P]
    bhotl = ((fire[:, :, None] & oh).any(axis=1)).astype(np.int32)
    return (
        n, P, MB, rowflags, meta.pr, meta.eap, meta.fap, meta.alphas,
        meta.codes, meta.bpred, meta.bap, meta.btb, bflags,
        meta.emask.astype(np.int32), meta.fmask.astype(np.int32),
        meta.bmask.astype(np.int32), meta.bmaskq.astype(np.int32),
        meta.bfixmem.astype(np.int32), bownid,
        bhot, bhotl,
    )


# set True by tests to run the kernel through the Pallas interpreter
INTERPRET = False


def eligible(meta, Lp: int, table, o, e) -> bool:
    """The kernel's preconditions: packed-chain bound (fits), one-hot
    owner maps, disjoint fixmem sets, lane/SMEM budgets."""
    mt = int(np.abs(np.asarray(table)).max())
    fits = 2 * (Lp * (mt + max(abs(o), abs(e))) + abs(o)) < (1 << 16)
    smem = (7 * meta.n + 4 * meta.n * meta.maxb) * 4
    return bool(
        fits
        and meta.P <= 128
        and smem < 420_000
        and (meta.bown.sum(axis=1) <= 1).all()
        and (meta.bfixmem.sum(axis=1) <= 1).all()
    )
