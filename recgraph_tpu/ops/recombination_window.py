"""Windowed O(W)-lane long-read fills for recombination mode 8.

The reference's recombination DP is FULL-width on BOTH matrices
(pathwise_alignment_recombination.rs:129-435 — forward and reverse
pathwise fills of O(n*L*P) each), so multi-kb reads cost 2x the mode-4
memory and work.  This module extends the mode-4 windowed machinery
(ops/pathwise_window, r4) to the mode-8 pair:

* the FORWARD windowed fill is pathwise_window._fill_pathwise_win
  unchanged (mode 8's forward matrix is exactly mode 4's);
* `_fill_pathwise_rev_win` below is its mirror over the reverse graph
  (suffix chains, windows placed right-to-left, restart at j == L-1);
* the split search runs UNCHANGED on full-width per-(row, col) max
  arrays materialised from the windowed planes (`full_from_win`) —
  these carry no P factor, so the memory win stands: 2*O(n*W*P)
  planes + O(n*L) search arrays instead of 2*O(n*L*P) planes;
* `composite_bound` extends the exit-bound guard to the combined
  objective fwd(i,j) + rec + rev(k,j+1): a solution touching ANY
  out-of-window cell is bounded by the per-side normalised exit
  accounts (see below), and a strict win by the windowed best makes
  every cell the traceback visits exact — the caller then emits
  byte-identical GAF, else doubles W and finally reruns full-width
  (same ladder contract as mode 4).

Exactness story (extends PERF.md "Design note: windowed long-read
pathwise"): windowed values lower-bound full-width values on rep
lanes (monotone recurrences + NEG out-of-window reads), with the
documented follower-replay caveat; every windowed value stays bounded
by its lane's plain-DP best.  Exit accounting, forward side
(pathwise_window): R_f >= max over stranded cells of
value - smax*col, so any alignment prefix that leaves the forward
windows satisfies fwd(i, j) <= R_f + smax*j.  Reverse side (here):
R_r >= max over stranded cells of value - smax*(L-1-col), so any
suffix alignment that leaves the reverse windows satisfies
rev(k, j) <= R_r + smax*(L-1-j).  With rec penalties >= 0, any
combined candidate that touches an out-of-window cell is bounded by

    max_j max( [R_f + smax*j]     + G(j+1),
               F(j)               + [R_r + smax*(L-1-j-1)],
               R_f + R_r + smax*(L-1) )

where F/G are the exact windowed per-column maxima of the two
matrices (NEG where no window covers the column), and the no-rec
baseline's escape is bounded by R_f + smax*(L-1) (the mode-4 guard).
Mode 9 (semiglobal-style endings) deliberately has NO windowed
variant, for the mode-5 reason: alignments may start/end at column 0
of any row, which makes the exit bound vacuous
(pathwise_window._fill_pathwise_win docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..scoring import GAP
from .poa_engine import sub_planes, sub_row
from .recombination_engine import SENTINEL, _suffix_cummax

NEG = -(1 << 28)


@functools.partial(jax.jit, static_argnames=("W",))
def _fill_pathwise_rev_win(dgr, table, seq, L, W):
    """Windowed mode-8 reverse fill (mirror of recombination_engine.
    _fill_pathwise_rev, mode8=True).

    seq: the forward '$'-prefixed read int32[B, Lp]; returns
      Awr   int32[B, P, n, W]  windowed reverse scores
      wsr   int32[B, n]        per-row window starts (multiples of 8)
      Rr    int32[B]           normalised exit account: any suffix
                               alignment leaving the windows satisfies
                               rev(k, j) <= Rr + smax*(L-1-j)
    """
    n, P = dgr.n, dgr.paths_number
    B, Lp = seq.shape
    kcol = jnp.arange(W, dtype=jnp.int32)
    jfull = jnp.arange(Lp, dtype=jnp.int32)
    qdiag = jnp.arange(P)
    rev = jnp.roll(seq, -1, axis=1)
    rev = jnp.where(jfull[None, :] == (L - 1)[:, None], SENTINEL, rev)
    in_read_full = jfull[None, :] < L[:, None]
    gseq_full = jnp.where(in_read_full, table[rev, GAP], 0)   # [B, Lp]
    SUBP = sub_planes(table, rev)                             # [A, B, Lp]
    Gs_full = jnp.cumsum(gseq_full[:, ::-1], axis=1)[:, ::-1]  # suffix sums
    smax = jnp.maximum(jnp.max(table), 0)
    OFF = 1 << 16

    def window(arr, ws):
        """arr [B, Lp] -> [B, W] at per-read start ws (clipped)."""
        idx = jnp.minimum(ws[:, None] + kcol[None, :], Lp - 1)
        return jnp.take_along_axis(arr, idx, axis=1)

    def step(carry, xs):
        A, wss, bsp, Rr = carry
        # A flat [n*P, B, W]; wss/bsp [B, n]; Rr [B]
        i, code_i, pvec, rvec, on, qsrc = xs               # [P] each
        gap_i = table[code_i, GAP]
        p_safe = jnp.maximum(pvec, 0)
        r_safe = jnp.maximum(rvec, 0)

        # --- window placement: centred on successor rows' best
        # positions, biased so the leftmost target keeps a margin from
        # the left edge (stranding there fails the guard, correctly) ---
        pred_bsp = bsp[:, p_safe]                          # [B, P]
        onb = on[None, :]
        ms = jnp.min(jnp.where(onb, pred_bsp, 1 << 28), axis=1)
        me = jnp.max(jnp.where(onb, pred_bsp, 0), axis=1)
        center = (ms + me) // 2 - 1
        left_target = jnp.minimum(ms - 2, center) - W // 8
        ws_i = jnp.minimum(center - W // 2, left_target)
        ws_i = jnp.clip(ws_i, 0, jnp.maximum(Lp - W, 0))
        ws_i = (ws_i // 8) * 8                             # [B]
        jabs = ws_i[:, None] + kcol[None, :]               # [B, W]
        in_read = jabs < L[:, None]
        is_last = jabs == (L - 1)[:, None]
        gseq_w = window(gseq_full, ws_i)
        Gs_w = window(Gs_full, ws_i)
        subrow = window(sub_row(SUBP, code_i), ws_i)       # [B, W]

        # --- gather successor windows, realigned to this row's ---
        # flat [n*P, B, W] carry: gather exactly the 2P needed planes
        # (the fwd windowed fill's layout lesson — the leading-axis
        # update stays in place and pred reads stay narrow)
        Aq = jnp.moveaxis(
            A[p_safe * P + jnp.maximum(qsrc, 0)], 0, 1
        )                                                  # [B, P, W]
        Ar = jnp.moveaxis(A[p_safe * P + r_safe], 0, 1)
        ws_p = wss[:, p_safe]                              # [B, P]
        shift = (ws_i[:, None] - ws_p)[:, :, None]         # [B, P, 1]
        idx = shift + kcol                                 # [B, P, W]
        ok = (idx >= 0) & (idx < W)
        idx_c = jnp.clip(idx, 0, W - 1)
        Aq_al = jnp.where(ok, jnp.take_along_axis(Aq, idx_c, axis=2), NEG)
        Ar_al = jnp.where(ok, jnp.take_along_axis(Ar, idx_c, axis=2), NEG)
        # shifted (+1 column, the D read): pred col jabs+1
        okp1 = (idx >= -1) & (idx < W - 1)
        idx_p1 = jnp.clip(idx + 1, 0, W - 1)
        Aq_sh = jnp.where(
            okp1, jnp.take_along_axis(Aq, idx_p1, axis=2), NEG
        )
        Ar_sh = jnp.where(
            okp1, jnp.take_along_axis(Ar, idx_p1, axis=2), NEG
        )

        # --- exit accounting: successor cells whose D/U feeds land
        # outside this row's window (D feeds jabs_p-1, U feeds jabs_p);
        # normalise by smax * (L-1-col) ---
        jabs_p = ws_p[:, :, None] + kcol[None, None, :]    # [B, P, W]
        stranded = (jabs_p <= ws_i[:, None, None]) | (
            jabs_p >= ws_i[:, None, None] + W
        )
        stranded = (
            stranded & onb[:, :, None]
            & (jabs_p >= 1) & (jabs_p < L[:, None, None])
        )
        norm = jnp.where(
            stranded, Aq - smax * (L[:, None, None] - 1 - jabs_p), NEG
        )
        Rr = jnp.maximum(Rr, jnp.max(norm, axis=(1, 2)))

        # --- rep lanes: suffix (max,+) chain over the window ---
        d_r = Ar_sh + subrow[:, None, :]
        u_r = Ar_al + gap_i
        # restart at j == L-1 (mode-8 U-only chain): reads pred col L-1
        lp1 = (L - 1)[:, None] - ws_p                      # [B, P]
        okl = (lp1 >= 0) & (lp1 < W)
        Ar_last = jnp.take_along_axis(
            Ar, jnp.clip(lp1, 0, W - 1)[:, :, None], axis=2
        )[:, :, 0]
        last_r = jnp.where(okl, Ar_last, NEG) + gap_i      # [B, P]
        Achain = jnp.maximum(d_r, u_r)
        Achain = jnp.where(is_last[:, None, :], last_r[:, :, None], Achain)
        Achain = jnp.where(in_read[:, None, :], Achain, NEG)
        rep_row = Gs_w[:, None, :] + _suffix_cummax(Achain - Gs_w[:, None, :])

        dirD = rep_row == d_r
        dirU = ~dirD & (rep_row == u_r)
        # kcol == W-1 restarts the suffix replay chain at the window
        # edge (chains crossing it are lost => underestimate, guarded)
        nonL = (
            dirD | dirU | is_last[:, None, :]
            | (kcol == W - 1)[None, None, :]
        )

        # --- follower replay via the packed suffix chain ---
        vD = Aq_sh + subrow[:, None, :]
        vU = Aq_al + gap_i
        Aq_last = jnp.take_along_axis(
            Aq, jnp.clip(lp1, 0, W - 1)[:, :, None], axis=2
        )[:, :, 0]
        last_q = jnp.where(okl, Aq_last, NEG) + gap_i
        V = jnp.where(dirD, vD, vU)
        V = jnp.where(is_last[:, None, :], last_q[:, :, None], V)
        Vc = jnp.maximum(V - Gs_w[:, None, :], -OFF)
        enc = jnp.where(
            nonL, ((W - kcol)[None, None, :] << 17) | (Vc + OFF), -1
        )
        enc = _suffix_cummax(enc)
        row = Gs_w[:, None, :] + (enc & ((1 << 17) - 1)) - OFF
        row = jnp.where(on[None, :, None], row, 0)
        row = jnp.where((qsrc >= 0)[None, :, None], row, 0)
        row = jnp.where(in_read[:, None, :], row, NEG)
        row = jnp.where((jabs == 0)[:, None, :], 0, row)   # col 0 quirk

        # best position: LEFTmost max over on-lanes (window bias left)
        rowv = jnp.max(jnp.where(on[None, :, None], row, NEG), axis=1)
        rowv = jnp.where(in_read & (jabs >= 1), rowv, NEG)
        bsp_i = ws_i + jnp.argmax(rowv, axis=1).astype(jnp.int32)

        # left-edge cell of THIS row can exit left via in-row moves
        edge = jnp.where(
            (jabs >= 1) & (jabs < L[:, None]) & (kcol == 0)[None, :],
            rowv - smax * (L[:, None] - 1 - jabs), NEG,
        )
        Rr = jnp.maximum(Rr, jnp.max(edge, axis=1))

        A = jax.lax.dynamic_update_slice(
            A, jnp.moveaxis(row, 0, 1).reshape(P, B, W), (i * P, 0, 0)
        )
        wss = jax.lax.dynamic_update_slice(wss, ws_i[:, None], (0, i))
        bsp = jax.lax.dynamic_update_slice(bsp, bsp_i[:, None], (0, i))
        return (A, wss, bsp, Rr), None

    A0 = jnp.zeros((n * P, B, W), dtype=jnp.int32)
    # row n-1: suffix gap chain on every lane, window at the right end
    ws_n1 = jnp.clip((L - W) // 8 * 8, 0, jnp.maximum(Lp - W, 0))
    jabs0 = ws_n1[:, None] + kcol[None, :]
    rn1 = jnp.where(
        (jabs0 > 0) & (jabs0 < L[:, None]), window(Gs_full, ws_n1), 0
    )
    rn1 = jnp.where(jabs0 >= L[:, None], NEG, rn1)
    A0 = jax.lax.dynamic_update_slice(
        A0, jnp.broadcast_to(rn1[None], (P, B, W)), ((n - 1) * P, 0, 0)
    )
    wss0 = jnp.zeros((B, n), dtype=jnp.int32)
    wss0 = wss0.at[:, n - 1].set(ws_n1)
    bsp0 = jnp.zeros((B, n), dtype=jnp.int32)
    bsp0 = bsp0.at[:, n - 1].set((L - 1))
    # row n-1's left-edge cell can exit left
    R0 = jnp.where(
        ws_n1 > 0,
        rn1[:, 0] - smax * (L - 1 - ws_n1),
        jnp.full((B,), NEG, jnp.int32),
    )

    rows = jnp.arange(n - 2, 0, -1, dtype=jnp.int32)
    sl = slice(n - 2, 0, -1)
    qsrc_all = dgr.qsrc_of if dgr.qsrc_of is not None else jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[None], (n, P)
    )
    xs = (rows, dgr.codes[sl], dgr.pred_of[sl], dgr.rep_of[sl],
          dgr.paths_on[sl], qsrc_all[sl])
    (A, wss, bsp, Rr), _ = jax.lax.scan(step, (A0, wss0, bsp0, R0), xs)
    Awr = jnp.transpose(A.reshape(n, P, B, W), (2, 1, 0, 3))
    # row n-1 delta quirk: only the alpha plane keeps the chain
    Awr = Awr.at[:, 1:, n - 1, :].set(0)
    return Awr, wss, Rr


@jax.jit
def full_from_win(Xw, ws, fill):
    """Windowed [B, n, W] + starts -> full-width [B, n, Lp_out] with
    `fill` outside the windows.  Lp_out comes from broadcasting the
    caller-passed `fill` plane [B, 1, Lp] (NEG/False)."""
    B, n, W = Xw.shape
    Lp = fill.shape[-1]
    jfull = jnp.arange(Lp, dtype=jnp.int32)
    idx = jfull[None, None, :] - ws[:, :, None]            # [B, n, Lp]
    ok = (idx >= 0) & (idx < W)
    v = jnp.take_along_axis(Xw, jnp.clip(idx, 0, W - 1), axis=2)
    return jnp.where(ok, v, jnp.broadcast_to(fill, (B, n, Lp)))


@jax.jit
def composite_bound(F, G, Rf, Rr, L, smax):
    """Upper bound on any mode-8 candidate that touches an
    out-of-window cell (see module docstring).

    F/G: int32[B, Lp] exact windowed per-column maxima of the forward /
    reverse matrices over interior rows (NEG where uncovered);
    Rf/Rr: int32[B] normalised exit accounts; returns f32[B].
    """
    B, Lp = F.shape
    j = jnp.arange(Lp, dtype=jnp.int32)
    in_f = (j[None, :] < (L - 1)[:, None]) & (j[None, :] >= 1)
    Gp1 = jnp.roll(G, -1, axis=1).at[:, -1].set(NEG)       # G(j+1)
    t1 = (Rf[:, None] + smax * j[None, :]) + Gp1
    t2 = F + (Rr[:, None] + smax * (L[:, None] - 2 - j[None, :]))
    both = Rf + Rr + smax * (L - 1)
    t = jnp.where(in_f, jnp.maximum(t1, t2), NEG)
    return jnp.maximum(jnp.max(t, axis=1), both).astype(jnp.float32)
