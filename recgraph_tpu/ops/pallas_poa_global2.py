"""Banded global-POA Pallas fill, v2 — the v5 levers applied to mode 0.

Same recurrence and outputs as `pallas_poa.fill_global` (mode-0 fill of
global_abpoa.rs:260-427 with the in-kernel adaptive band of
utils.rs:17-72), restructured with the levers that took the local
kernel from 2.1 to 8.4 Gcells/s (pallas_poa_v5.py, PERF.md):

1. **128-aligned lane extents** — v1 ran at Lpo = Lp + 8 (160 lanes for
   the example corpus), putting every Mosaic roll on the unaligned slow
   path (~3x); v2 pads to a 128 multiple and keeps the band-bound lanes
   (Lpo-8 / Lpo-7) inside the padding.
2. **Hoisted gap cumsums** — v1 recomputed the O(log L) roll-add prefix
   sum of the gap row EVERY row; it is row-invariant (one plane for row
   0, one for the rest), so v2 computes both once per batch tile into
   scratch.
3. **Radix-4 Kogge-Stone chain** for the in-row (max,+) prefix solve
   (these [Bt, Lpo] operands are latency-bound like the local kernel's,
   not throughput-bound like the pathwise kernel's 3-D ones).
4. **Non-start fast path** — rows whose only predecessor is i-1 (the
   vast majority) skip the Pm-wide band/candidate sweeps: the band seed
   is bsp[i-1] + 1 and both U/D candidates come from the previous row,
   kept in a dedicated scratch.
5. **R-row unroll + int16 ring** — R rows per grid step; the RING=256
   predecessor ring stores int16 whenever max|table| * (n + Lpo) fits
   (out-of-band NEG lanes are regenerated from the band masks on read,
   never from ring values, so clipping them is safe).

Outputs match `poa_engine._fill_global` bit-for-bit (same packed cells,
band bounds, first-best sink selection); pinned by
tests/test_pallas_poa.py::test_global_v2*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring import GAP
from .poa_engine import NEG, O, D, LOW_D, L_DIR, U_DIR
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


def _cumsum_lanes(x, jcol, Lp):
    k = 1
    while k < Lp:
        sh = pltpu.roll(x, k, 1)
        x = jnp.where(jcol >= k, x + sh, x)
        k *= 2
    return x


def _make_kernel(sink_rows, R: int, n: int, ring16: bool, Lb: int,
                 ringc: int, strip: frozenset = frozenset(),
                 seg: int = 0, npack: int = 1):
    """strip: TIMING-ONLY ablations (results wrong) — 'chain' (skip the
    (max,+) prefix solve), 'band' (fixed full band, no pred-bsp math),
    'sweep' (skip the start-row pred sweep), 'edges' (skip the
    left-edge/base lane extractions), 'dirs' (skip direction packing).
    Used by tools/ablate_global2.py to locate the kernel's floor
    (the v4/v5 strip-ablation playbook, PERF.md).

    npack > 1 packs that many reads per lane-row (v5's lever, applied
    to the banded kernel): ``seg`` is the per-read lane extent, all
    column indices become segment-local (jloc), band scalars/scratch
    and sink captures go per-segment, and the latency-bound chain
    serialises over npack-times fewer lane-rows."""
    num_sinks = len(sink_rows)
    rdt = jnp.int16 if ring16 else jnp.int32

    def kernel(
        pred_idx_ref,   # i32[n * Pm] (flat)
        pred_rank_ref,  # i32[n * Pm] compact end rank per predecessor
        erank_ref,      # i32[n]      end rank of row i (-1 if not an end)
        minp_rank_ref,  # i32[n]      erank[min_pred] (-1 for non-start rows)
        is_start_ref,   # i32[n]
        gnode_ref,      # i32[n]
        codes_ref,      # i32[n]
        r_ref,          # i32[n]     utils::set_r_values
        minp_ref,       # i32[n]     min predecessor / i-1
        sink_ord_ref,   # i32[n]     ordinal among F's preds, -1 otherwise
        sub_ref,        # [7, Bt, Lpo]
        seqc_ref,       # [Bt, Lpo]  read codes (-1 pad)
        gseq_ref,       # [Bt, Lpo]  table[seq, '-']
        gcol0_ref,      # [Bt, Lpo]  table['-', seq] (row 0)
        aux_ref,        # [Bt, 128]  lanes [0..np)=L, [np..2np)=bta per seg
        packed_ref,     # out [R, Bt, Lpt]
        score_ref,      # out [Bt, npack]
        lrow_ref,       # out [Bt, npack]
        lcol_ref,       # out [Bt, npack]
        ring,           # scratch [ringc, Bt, Lpt] (rdt), end-rank indexed
        row0_s,         # scratch [Bt, Lpt]
        prev_s,         # scratch [Bt, Lpt] (previous row, int32)
        G_s,            # scratch [2, Bt, Lpt] (cumsum gseq / gcol0)
        sweep_s,        # scratch [4, Bt, Lpt] (start-row sweep staging)
        lefts_s,        # scratch [npack * ringc, Bt] end-rank compact
        rights_s,       # scratch [npack * ringc, Bt]   (like the value
        bsp_s,          # scratch [npack * ringc, Bt]    ring: preds are
        lvals_s,        # scratch [npack * ringc, Bt]    always node ends)
        pscal_s,        # scratch [pad8(8*npack), Bt] rows q*2*npack+
                        #   {0: prev row i-1, 1: row 0} * npack + k,
                        #   scalars q in (left, right, bsp, lvals)
        sink_v,         # scratch [npack * 8 * ceil(S/8), Bt]
        sink_c,         # scratch [...same]
    ):
        step = pl.program_id(1)
        Bt, Lpt = gseq_ref.shape
        S = seg if npack > 1 else Lpt
        spad = sink_v.shape[0] // npack
        Pm = pred_idx_ref.shape[0] // codes_ref.shape[0]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, Lpt), 1)
        jloc = jcol % S if npack > 1 else jcol
        segid = jcol // S
        segm = [segid == k for k in range(npack)]
        Ls = [aux_ref[:, k : k + 1] for k in range(npack)]
        btas = [aux_ref[:, npack + k : npack + k + 1]
                for k in range(npack)]
        NEGc = jnp.int32(NEG)

        def expand(vals):
            """Per-segment [Bt, 1] scalars -> [Bt, Lpt] lane plane."""
            out = vals[0]
            for k in range(1, npack):
                out = jnp.where(segm[k], vals[k], out)
            return jnp.broadcast_to(out, (Bt, Lpt)) if npack == 1 else out

        def lane_at(row, col, k):
            """Value of ``row`` at segment-local column ``col`` of
            segment ``k`` -> [Bt, 1]."""
            m = (jloc == col) & segm[k] if npack > 1 else jloc == col
            return jnp.max(
                jnp.where(m, row, NEGc), axis=1, keepdims=True
            )

        def sreg_rank(ref, k, rank):
            """[Bt, 1] read of segment k's compact register file at
            end-rank ``rank`` (callers must special-case row 0)."""
            return jnp.transpose(
                ref[pl.ds(k * ringc + jnp.maximum(rank, 0) % ringc, 1), :]
            )

        SCAL = {"left": (lefts_s, 0), "right": (rights_s, 1),
                "bsp": (bsp_s, 2), "lvals": (lvals_s, 3)}

        def pscal(name, k, slot):
            """[Bt, 1] read of a prev-row (slot 0) / row-0 (slot 1)
            band scalar of segment k."""
            q = SCAL[name][1]
            return jnp.transpose(
                pscal_s[pl.ds(q * 2 * npack + slot * npack + k, 1), :]
            )

        def pred_scal(name, k, pidx, rank):
            """Band scalar of predecessor row ``pidx`` (a node end or
            row 0) for segment k."""
            return jnp.where(
                pidx == 0, pscal(name, k, 1),
                sreg_rank(SCAL[name][0], k, rank),
            )

        @pl.when(step == 0)
        def _():
            G_s[0] = _cumsum_lanes(gseq_ref[:, :], jloc, S)
            G_s[1] = _cumsum_lanes(gcol0_ref[:, :], jloc, S)

        G = G_s[0]
        gseq = gseq_ref[:, :]

        for r in range(R):
            i = step * R + r
            ii = jnp.minimum(i, n - 1)   # clamp tail-pad metadata reads
            live = i < n - 1

            # ---- adaptive band (utils.rs:17-72) ----
            # fast path: the only pred is i-1, so the seed is
            # bsp[i-1]; start rows sweep all preds ([Bt, 1] selects —
            # near-free, so the sweep runs unconditionally masked)
            is_start = (is_start_ref[ii] != 0) & (i > 0) & live
            lefts, rights = [], []
            for k in range(npack):
                if "band" in strip:   # timing-only: fixed full band
                    lefts.append(jnp.zeros((Bt, 1), jnp.int32))
                    rights.append(Ls[k])
                    continue
                pb_prev = pscal("bsp", k, 0)
                ms_s = jnp.full((Bt, 1), 1 << 28, jnp.int32)
                me_s = jnp.full((Bt, 1), NEG, jnp.int32)
                for p in range(Pm):
                    pidx = pred_idx_ref[ii * Pm + p]
                    ok = (pidx >= 0) & is_start
                    pb = pred_scal("bsp", k, pidx,
                                   pred_rank_ref[ii * Pm + p])
                    ms_s = jnp.where(ok & (pb < ms_s), pb, ms_s)
                    me_s = jnp.where(ok & (pb > me_s), pb, me_s)
                ms = jnp.where(is_start, ms_s, pb_prev) + 1
                me = jnp.where(is_start, me_s, pb_prev) + 1
                ms = jnp.where(i == 0, 0, ms)
                me = jnp.where(i == 0, 0, me)
                r_i = r_ref[ii]
                lefts.append(jnp.maximum(
                    0, jnp.minimum(ms, Ls[k] - r_i - btas[k])))
                rights.append(jnp.where(
                    Ls[k] > r_i,
                    jnp.minimum(Ls[k],
                                jnp.maximum(me, Ls[k] - r_i) + btas[k]),
                    jnp.minimum(Ls[k], me + btas[k]),
                ))
            left = expand(lefts)
            right = expand(rights)
            in_band = (left <= jloc) & (jloc < right)

            code_i = codes_ref[ii]
            gnode_i = gnode_ref[ii]
            minp = minp_ref[ii]
            subrow = sub_ref[code_i]
            match = seqc_ref[:, :] == code_i

            # ---- predecessor candidates ----
            # fast path: single pred i-1 (prev_s, int32, band-masked)
            pl_f = expand([pscal("left", k, 0) for k in range(npack)])
            pr_f = expand([pscal("right", k, 0) for k in range(npack)])
            prev = prev_s[:, :]
            cov_u = (pl_f <= jloc) & (jloc < pr_f)
            u_pre_f = jnp.where(cov_u, prev, NEGc)
            prev_sh = pltpu.roll(prev, 1, 1)
            cov_d = (pl_f < jloc) & (jloc <= pr_f)
            d_pre_f = jnp.where(cov_d & (jloc > 0), prev_sh, NEGc)

            def pred_row(pidx, rank):
                prow = ring[jnp.maximum(rank, 0) % ringc].astype(jnp.int32)
                return jnp.where(pidx == 0, row0_s[:, :], prow)

            @pl.when(is_start & ("sweep" not in strip))
            def _():
                # full first-best predecessor sweep (ascending order,
                # global_abpoa.rs:486-566), staged through sweep_s
                u_pre = jnp.full((Bt, Lpt), NEG, jnp.int32)
                u_arg = jnp.zeros((Bt, Lpt), jnp.int32)
                d_pre = jnp.full((Bt, Lpt), NEG, jnp.int32)
                d_arg = jnp.zeros((Bt, Lpt), jnp.int32)
                for p in range(Pm):
                    pidx = pred_idx_ref[ii * Pm + p]
                    ok = pidx >= 0
                    rank_p = pred_rank_ref[ii * Pm + p]
                    prow = pred_row(pidx, rank_p)
                    pl_ = expand([pred_scal("left", k, pidx, rank_p)
                                  for k in range(npack)])
                    pr_ = expand([pred_scal("right", k, pidx, rank_p)
                                  for k in range(npack)])
                    cu = ok & (pl_ <= jloc) & (jloc < pr_)
                    v = jnp.where(cu, prow, NEGc)
                    upd = v > u_pre
                    u_arg = jnp.where(upd, pidx, u_arg)
                    u_pre = jnp.where(upd, v, u_pre)
                    prow_sh = pltpu.roll(prow, 1, 1)
                    cd = ok & (pl_ < jloc) & (jloc <= pr_)
                    v = jnp.where(cd & (jloc > 0), prow_sh, NEGc)
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
            u_val = jnp.where(has_u, u_pre + gnode_i, gnode_i * (i + jloc))
            u_pred = jnp.where(has_u, u_arg, minp)
            has_d = d_pre > NEGc // 2
            d_fb = gnode_i * (i + left)
            d_val = jnp.where(has_d, d_pre + subrow, d_fb)
            d_pred = jnp.where(has_d, d_arg, minp)

            # ---- chain restart values ----
            # the left-edge handling is extraction-free (the r4 edges
            # ablation measured the old lane_at forms at 11.3 of
            # 31.8 ms): l_fb == (gseq * (i + jcol)) AT the left lane,
            # so it merges into A elementwise, and base0 reads the
            # pred row's own left-edge value from the lvals register
            # file instead of re-extracting it from the ring
            A = jnp.maximum(d_val, u_val)
            is_left = jloc == left
            if "edges" in strip:   # timing-only: skip edge handling
                lfb_full = gnode_i * (i + left)
                A = jnp.where(in_band, A, NEGc)
            else:
                lfb_full = gseq * (i + jloc)
                # minp is i-1 for non-start rows (the prev slot) and a
                # node end (or row 0) for start rows (the compact file)
                base0 = expand([
                    jnp.where(is_start,
                              pred_scal("lvals", k, minp,
                                        minp_rank_ref[ii]),
                              pscal("lvals", k, 0))
                    for k in range(npack)]) + gnode_i
                A = jnp.where(
                    is_left,
                    jnp.where(left == 0, base0,
                              jnp.maximum(A, lfb_full)),
                    A,
                )
                A = jnp.where(in_band, A, NEGc)

            Grow = jnp.where(i == 0, G_s[1], G)
            A0row = jnp.where(in_band, Grow, NEGc)
            A0row = jnp.where(jloc == 0, 0, A0row)
            chained = (
                A - Grow if "chain" in strip
                else _chain_radix(A - Grow, jloc, S)
            )
            m_row = jnp.where(i == 0, A0row, Grow + chained)
            m_row = jnp.where(in_band, m_row, NEGc)
            m_row = jnp.where((i == 0) & (jloc == 0), 0, m_row)

            masked = jnp.where(in_band, m_row, NEGc)
            bsps = []
            for k in range(npack):
                mk = jnp.where(segm[k], masked, NEGc)
                rmax_k = jnp.max(mk, axis=1, keepdims=True)
                bsps.append(jnp.max(
                    jnp.where((mk == rmax_k) & in_band & segm[k],
                              jloc, -1),
                    axis=1, keepdims=True,
                ))

            # ---- directions (utils.rs:129-140, D >= U >= L) ----
            if "dirs" in strip:   # timing-only: skip direction packing
                packed_ref[r] = m_row
            else:
                m_prev = pltpu.roll(m_row, 1, 1)
                m_prev = jnp.where(jloc == 0, NEGc, m_prev)
                l_val = m_prev + gseq
                l_val = jnp.where(
                    is_left, jnp.where(left == 0, NEGc, lfb_full), l_val
                )
                l_pred = jnp.where(jloc > left, i, minp)
                d_ge_u = d_val >= u_val
                dirD = d_ge_u & (d_val >= l_val)
                dirU = (~d_ge_u) & (u_val >= l_val)
                dcode = jnp.where(
                    dirD, jnp.where(match, D, LOW_D),
                    jnp.where(dirU, U_DIR, L_DIR)
                )
                pred_sel = jnp.where(
                    dirD, d_pred, jnp.where(dirU, u_pred, l_pred)
                )
                is_base = is_left & (left == 0)
                dcode = jnp.where(is_base, U_DIR, dcode)
                pred_sel = jnp.where(is_base, minp, pred_sel)
                dcode = jnp.where(
                    i == 0, jnp.where(jloc == 0, O, L_DIR), dcode
                )
                pred_sel = jnp.where(i == 0, 0, pred_sel)
                pk = jnp.where(in_band, pred_sel * 16 + dcode, 0)
                pk = jnp.where(i == 0, jnp.where(
                    in_band & (jloc > 0), jnp.int32(L_DIR), jnp.int32(O)
                ), pk)
                pk = jnp.where(jloc == Lb, left, pk)      # caller reads
                pk = jnp.where(jloc == Lb + 1, right, pk)  # bounds Lp/Lp+1
                pk = jnp.where(live, pk, 0)
                packed_ref[r] = pk

            m_store = jnp.where(live, m_row, NEGc)
            er = erank_ref[ii]

            @pl.when(er >= 0)
            def _():
                if ring16:
                    ring[er % ringc] = jnp.clip(
                        m_store, -32768, 32767
                    ).astype(rdt)
                else:
                    ring[er % ringc] = m_store

            prev_s[:, :] = m_store

            @pl.when(i == 0)
            def _():
                row0_s[:, :] = m_store

            for k in range(npack):
                vals = {"left": lefts[k], "right": rights[k],
                        "bsp": bsps[k],
                        "lvals": lane_at(m_row, lefts[k], k)}
                for name, v in vals.items():
                    ref, q = SCAL[name]
                    vt = jnp.transpose(v)
                    pscal_s[pl.ds(q * 2 * npack + k, 1), :] = vt

                    @pl.when(i == 0)
                    def _(ref=ref, q=q, vt=vt, k=k):
                        pscal_s[pl.ds(q * 2 * npack + npack + k, 1),
                                :] = vt

                    @pl.when(er >= 0)
                    def _(ref=ref, vt=vt, k=k):
                        ref[pl.ds(k * ringc + er % ringc, 1), :] = vt

            # ---- sink capture + final selection (":397-405") ----
            so = sink_ord_ref[ii]

            @pl.when((so >= 0) & live)
            def _():
                for k in range(npack):
                    sink_v[pl.ds(k * spad + so, 1), :] = jnp.transpose(
                        lane_at(m_row, rights[k] - 1, k)
                    )
                    sink_c[pl.ds(k * spad + so, 1), :] = jnp.transpose(
                        rights[k] - 1)

            @pl.when(i == n - 2)
            def _():
                for k in range(npack):
                    best = lane_at(m_row, rights[k] - 1, k)
                    brow = jnp.full((Bt, 1), i, jnp.int32)
                    bcol = rights[k] - 1
                    for q in range(num_sinks):
                        v = jnp.transpose(
                            sink_v[pl.ds(k * spad + q, 1), :])
                        c = jnp.transpose(
                            sink_c[pl.ds(k * spad + q, 1), :])
                        upd = v > best
                        best = jnp.where(upd, v, best)
                        brow = jnp.where(
                            upd, jnp.int32(sink_rows[q]), brow)
                        bcol = jnp.where(upd, c, bcol)
                    score_ref[:, k : k + 1] = best
                    lrow_ref[:, k : k + 1] = brow
                    lcol_ref[:, k : k + 1] = bcol

    return kernel


_cache: dict = {}


def pick_bt(B: int, Lpo: int, ring16: bool, R: int = 8,
            ringc: int = RING) -> int:
    """Largest power-of-two batch tile whose VMEM footprint fits.

    Words per (Bt x Lpo) element: ring ringc*(0.5|1), sub 14 + seqc 2
    (x2 buffers), gseq/gcol0/aux ~6, packed out 2R, scratch 8.  The
    seq-code match (vs the former 7-plane eq table) follows the mode-2
    kernel; it is what affords Bt=128 at the packed lane width.
    """
    words = ringc * (0.5 if ring16 else 1.0) + 16 + 6 + 2 * R + 8
    bt = 128
    while bt > 8 and (words * 4 * bt * Lpo > VMEM_BUDGET or bt > B or B % bt):
        bt //= 2
    return bt


def fill_global_v2(dg, table, seq, L, bta, Bt=None, R=8, interpret=False,
                   ring16=None, strip: frozenset = frozenset(), pack=1):
    """Drop-in for pallas_poa.fill_global (same outputs/packed layout).

    Pads lanes to a 128 multiple internally; ``packed`` is returned at
    the padded width [n, B, Lpo] with band bounds in lanes Lp/Lp+1
    (the caller's unpadded width — where fill_global's callers look).

    ``pack`` > 1 packs that many reads per lane-row (B % pack == 0):
    the chain/cumsum guards stop at segment boundaries and every band
    scalar goes per-segment, so per-read results are bit-identical
    while the latency-bound chain serialises over pack-times fewer
    lane-rows (the v5 lever).  Outputs keep per-READ shapes.
    """
    B, Lp = seq.shape
    Lpo = -(-(Lp + 8) // 128) * 128
    n = dg.n
    if pack > 1 and B % pack:
        raise ValueError(f"batch {B} not divisible by pack {pack}")
    if pack > 1 and R == 8:
        # halve the output double-buffer: packed Bt=128 at R=8 sits
        # 208 KB over the 16 MB scoped-VMEM limit (measured); R=4
        # costs ~0.7 ms of extra grid-step overhead per fill instead
        R = 4
    Brows = B // pack
    Lpt = pack * Lpo
    if ring16 is None:
        if isinstance(table, jax.core.Tracer):
            ring16 = False
        else:
            from .poa_engine import sm_max_entry

            ring16 = sm_max_entry(table) * (n + Lpo) < 32000
    ringc = 16
    while ringc <= dg.compact_span:
        ringc *= 2
    if Bt is None:
        Bt = min(pick_bt(Brows, Lpt, ring16, R, ringc), Brows)
    if Brows % Bt:
        raise ValueError(f"batch {Brows} not divisible by tile {Bt}")
    # n_pad must cover n rows (the wrappers slice packed[:n]); with small
    # R, ceil((n-1)/R)*R can fall below n and the .at[n-1] clamp would
    # silently overwrite the last real row
    steps = -(-n // R)
    n_pad = steps * R
    sink_rows = dg.sink_rows
    sink_pad = (len(sink_rows) + 7) // 8 * 8

    key = (sink_rows, Lpo, Lp, n, Bt, R, B, interpret, ring16, ringc,
           strip, pack)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel(sink_rows, R, n, ring16, Lp, ringc, strip,
                              seg=Lpo, npack=pack)
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=10,
                    grid=(Brows // Bt, steps),
                    in_specs=[
                        pl.BlockSpec((7, Bt, Lpt), lambda b, s, *_: (0, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lpt), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lpt), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lpt), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 128), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec((R, Bt, Lpt), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, pack), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, pack), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, pack), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((ringc, Bt, Lpt),
                                   jnp.int16 if ring16 else jnp.int32),
                        pltpu.VMEM((Bt, Lpt), jnp.int32),
                        pltpu.VMEM((Bt, Lpt), jnp.int32),
                        pltpu.VMEM((2, Bt, Lpt), jnp.int32),
                        pltpu.VMEM((4, Bt, Lpt), jnp.int32),
                        pltpu.VMEM((pack * ringc, Bt), jnp.int32),
                        pltpu.VMEM((pack * ringc, Bt), jnp.int32),
                        pltpu.VMEM((pack * ringc, Bt), jnp.int32),
                        pltpu.VMEM((pack * ringc, Bt), jnp.int32),
                        pltpu.VMEM((-(-8 * pack // 8) * 8, Bt),
                                   jnp.int32),
                        pltpu.VMEM((pack * sink_pad, Bt), jnp.int32),
                        pltpu.VMEM((pack * sink_pad, Bt), jnp.int32),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, Brows, Lpt), jnp.int32),
                    jax.ShapeDtypeStruct((Brows, pack), jnp.int32),
                    jax.ShapeDtypeStruct((Brows, pack), jnp.int32),
                    jax.ShapeDtypeStruct((Brows, pack), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _cache[key] = fn

    pad = jnp.zeros((B, Lpo - Lp), dtype=jnp.int32)
    codes7 = jnp.arange(7, dtype=jnp.int32)
    sub = jnp.concatenate(
        [table[codes7][:, seq], jnp.zeros((7, B, Lpo - Lp), jnp.int32)],
        axis=2,
    ).reshape(7, Brows, Lpt)
    seqc = jnp.concatenate(
        [seq.astype(jnp.int32), jnp.full((B, Lpo - Lp), -1, jnp.int32)],
        axis=1,
    ).reshape(Brows, Lpt)
    gseq = jnp.concatenate(
        [table[seq, GAP], pad], axis=1).reshape(Brows, Lpt)
    gcol0 = jnp.concatenate(
        [table[GAP, seq], pad], axis=1).reshape(Brows, Lpt)
    aux = jnp.zeros((Brows, 128), jnp.int32)
    Lr = jnp.asarray(L).reshape(Brows, pack)
    br = jnp.broadcast_to(
        jnp.asarray(bta, jnp.int32).reshape(-1), (B,)
    ).reshape(Brows, pack)
    for k in range(pack):
        aux = aux.at[:, k].set(Lr[:, k])
        aux = aux.at[:, pack + k].set(br[:, k])
    sink_ord = np.full(n, -1, dtype=np.int32)
    for k, srow in enumerate(sink_rows):
        sink_ord[srow] = k
    gnode = table[dg.codes, GAP]
    minp_rank = jnp.take(dg.erank, jnp.maximum(dg.min_pred, 0))
    packed, score, lrow, lcol = fn(
        dg.pred_idx.reshape(-1), dg.pred_rank.reshape(-1), dg.erank,
        minp_rank, dg.node_start.astype(jnp.int32), gnode,
        dg.codes, dg.r_values, dg.min_pred, jnp.asarray(sink_ord),
        sub, seqc, gseq, gcol0, aux,
    )
    packed = packed.reshape(n_pad, B, Lpo)[:n].at[n - 1].set(0)
    return (score.reshape(B), lrow.reshape(B), lcol.reshape(B),
            packed)
