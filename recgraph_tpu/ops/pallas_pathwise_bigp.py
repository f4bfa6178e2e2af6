"""Path-tiled pathwise Pallas fill (modes 4/5) for large path counts.

The base kernel (pallas_pathwise.py) holds a RING-deep full-P history
in VMEM — (RING+7)·P_pad words per (batch-lane, read-column), which
collapses the batch tile to Bt≤4 at P_pad=128 and stops fitting at all
around P_pad≥1024.  Real pangenomes carry 100s-1000s of haplotype
paths (the reference's dense [n, P, L] DP, pathwise_alignment.rs:16,
has the same wall), so this variant tiles the PATH axis:

- the HBM result buffer is the only row history: for each row the
  predecessor row's path-tile slice is DMA'd back per tile (the write
  of row i-1 completes before row i starts, so the read is ordered);
- group representative planes are fetched ONCE per row as 8-sublane
  groups (``repbuf``) and reduced to the rep plane with a masked
  sublane max — a rep path in any tile serves every tile, which is
  what makes the tiles independent (the alpha/group algebra of
  pathwise_meta: a path's row move is decided by its group rep alone);
- VMEM scales with the tile (Pt) not with P: (3·Pt + 8·Gd + O(1))
  words per (lane, column), so Bt=32 holds for arbitrary P.

Per-row HBM traffic is read+write of the full row (the base kernel's
ring skips the read for near preds), so the base kernel stays the
dispatch choice while its ring fits with Bt≥8; this kernel takes over
beyond that (ops/pathwise_engine.fill_pathwise_best).

Exactness: bit-identical to `_fill_pathwise(..., encode_chain=True)`
— same packed (column << 17 | value) replay chain, same gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring import GAP
from .pallas_pathwise import (
    ENC_MASK,
    NEG,
    OFF,
    VMEM_BUDGET,
    _chain_radix4,
    _group_meta,
    _group_meta_rev,
    _suffix_chain,
)


def _make_kernel_bigp(R: int, Gd: int, Bt: int, Pt: int, Nt: int,
                      semiglobal: bool):
    def kernel(
        grep_ref,       # i32[n_pad * Gd]      group rep path (-1 pad)
        gpred_ref,      # i32[n_pad * Gd]      group pred row (0 pad)
        codes_ref,      # i32[n_pad]
        gnode_ref,      # i32[n_pad]           table[code, '-']
        nrows_ref,      # i32[1]               n - 1
        rep_ref,        # i32[R, P_pad]        rep_of rows (block)
        on_ref,         # i32[R, P_pad]        paths_on rows (block)
        sub_ref,        # i32[7, Bt, Lp]       table[c][seq[j]]
        G_ref,          # i32[Bt, Lp]
        out_any,        # out [n_pad, B, P_pad, Lp] (ANY: HBM result)
        inbuf,          # scratch [2, Bt, Pt, Lp] i32 (pred-tile staging)
        aq_scr,         # scratch [Bt, Pt, Lp] i32 (multi-group staging)
        ar_scr,         # scratch [Bt, Pt, Lp] i32
        rowbuf,         # scratch [Bt, Pt, Lp] i32 (write staging)
        repbuf,         # scratch [Gd, Bt, 8, Lp] i32 (rep sublane groups)
        row0,           # scratch [Bt, Lp] i32
        rsem,           # DMA sems (2,)
        repsem,         # DMA sems (Gd,)
        wsem,           # DMA sem  ()
    ):
        step = pl.program_id(1)
        bo = pl.program_id(0) * Bt
        Lp = G_ref.shape[1]
        jcol3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, Pt, Lp), 2)
        q8 = jax.lax.broadcasted_iota(jnp.int32, (Bt, 8, Lp), 1)
        j0 = jcol3 == 0
        G = G_ref[:, :]
        G3 = G[:, None, :]
        nrows = nrows_ref[0]

        @pl.when(step == 0)
        def _():
            # row 0: every path carries the G - G[0] gap chain
            # (pathwise_alignment.rs:46-49)
            row0[:, :] = G - jnp.broadcast_to(G[:, 0:1], (Bt, Lp))

        r0b = row0[:, :][:, None, :]                 # [Bt, 1, Lp]
        for r in range(R):
            i = step * R + r
            code_i = codes_ref[i]
            gap_i = gnode_ref[i]
            sub3 = sub_ref[code_i][:, None, :]           # [Bt, 1, Lp]
            multi = grep_ref[i * Gd + 1] >= 0 if Gd > 1 else False

            # rep planes, once per row: an aligned 8-sublane group
            # around each group's rep path, reduced by masked max
            def fetch_rep(g, guard):
                pred_g = gpred_ref[i * Gd + g]
                rep_g = grep_ref[i * Gd + g]

                @pl.when(guard & (pred_g > 0))
                def _():
                    cp = pltpu.make_async_copy(
                        out_any.at[pred_g, pl.ds(bo, Bt),
                                   pl.ds((rep_g // 8) * 8, 8)],
                        repbuf.at[g], repsem.at[g],
                    )
                    cp.start()
                    cp.wait()

                rr = jnp.where(pred_g == 0, r0b, repbuf[g])
                return jnp.max(
                    jnp.where(q8 == rep_g % 8, rr, NEG), axis=1,
                    keepdims=True,
                )                                        # [Bt, 1, Lp]

            reps = [fetch_rep(0, True)]
            for g in range(1, Gd):
                reps.append(fetch_rep(g, multi))

            for t in range(Nt):
                # predecessor tile: slot-0 group unconditionally (97%+
                # of rows have one pred-edge group; off-path planes are
                # zeroed at the end regardless), rare multi-group rows
                # stage per-group selects through aq/ar scratch
                def fetch(slot, pred_g):
                    @pl.when(pred_g > 0)
                    def _():
                        cp = pltpu.make_async_copy(
                            out_any.at[pred_g, pl.ds(bo, Bt),
                                       pl.ds(t * Pt, Pt)],
                            inbuf.at[slot], rsem.at[slot],
                        )
                        cp.start()
                        cp.wait()

                    return jnp.where(pred_g == 0, r0b, inbuf[slot])

                rep_tile = rep_ref[r, t * Pt : (t + 1) * Pt][None, :, None]
                on_tile = on_ref[r, t * Pt : (t + 1) * Pt][None, :, None]
                pred_0 = gpred_ref[i * Gd]
                Aq = fetch(0, pred_0)
                Ar = jnp.broadcast_to(reps[0], (Bt, Pt, Lp))
                if Gd > 1:

                    @pl.when(multi)
                    def _():
                        aq_scr[:] = Aq
                        ar_scr[:] = Ar
                        for g in range(1, Gd):
                            pred_g = gpred_ref[i * Gd + g]
                            rep_g = grep_ref[i * Gd + g]
                            rr = fetch(1, pred_g)
                            memb = rep_tile == rep_g
                            aq_scr[:] = jnp.where(memb, rr, aq_scr[:])
                            ar_scr[:] = jnp.where(
                                memb, jnp.broadcast_to(
                                    reps[g], (Bt, Pt, Lp)), ar_scr[:]
                            )

                    Aq = jnp.where(multi, aq_scr[:], Aq)
                    Ar = jnp.where(multi, ar_scr[:], Ar)

                # rep solve: (max,+) chain over the rep values
                Ar_sh = jnp.where(j0, NEG, pltpu.roll(Ar, 1, 2))
                d_r = Ar_sh + sub3
                u_r = Ar + gap_i
                Achain = jnp.maximum(d_r, u_r)
                first_r = 0 if semiglobal else Ar + gap_i
                Achain = jnp.where(j0, first_r, Achain)
                rep_row = G3 + _chain_radix4(Achain - G3, jcol3, Lp)

                dirD = rep_row == d_r
                dirU = ~dirD & (rep_row == u_r)
                nonL = dirD | dirU | j0

                # non-rep replay: packed (column << 17 | value) chain
                Aq_sh = jnp.where(j0, NEG, pltpu.roll(Aq, 1, 2))
                vD = Aq_sh + sub3
                vU = Aq + gap_i
                V = jnp.where(dirD, vD, vU)
                first_q = 0 if semiglobal else Aq + gap_i
                V = jnp.where(j0, first_q, V)
                enc = jnp.where(nonL, (jcol3 << 17) | (V - G3 + OFF), -1)
                enc = _chain_radix4(enc, jcol3, Lp)
                row = G3 + (enc & ENC_MASK) - OFF

                live = (i >= 1) & (i < nrows)
                row = jnp.where((on_tile != 0) & live, row, 0)
                row = jnp.where(i == 0, r0b, row)

                # the write must land before the next row reads it
                # back (synchronous, as in the base kernel's ring DMA)
                rowbuf[:] = row
                wcp = pltpu.make_async_copy(
                    rowbuf,
                    out_any.at[i, pl.ds(bo, Bt), pl.ds(t * Pt, Pt)],
                    wsem,
                )
                wcp.start()
                wcp.wait()

    return kernel


def _make_rev_kernel_bigp(R: int, Gd: int, Bt: int, Pt: int, Nt: int,
                          mode8: bool):
    """Path-tiled reverse pathwise fill (modes 8/9); mirrors
    pallas_pathwise._make_rev_kernel with the forward tiling scheme:
    successor rows stream back from the HBM result per tile, rep planes
    fetch once per row as 8-sublane groups, the boundary row n-1 lives
    in scratch (``rowb``)."""

    def kernel(
        grep_ref,       # i32[n_pad_t * Gd]    t-order group rep (-1 pad)
        gpred_ref,      # i32[n_pad_t * Gd]    t-order group SUCC row
        codes_ref,      # i32[n_pad_t]         t-order rev-graph codes
        gnode_ref,      # i32[n_pad_t]
        nrows_ref,      # i32[1]               n - 1
        rep_ref,        # i32[R, P_pad]        t-order rep_of rows
        on_ref,         # i32[R, P_pad]
        sub_ref,        # i32[7, Bt, Lp]       table[c][rev_seq[j]]
        Gs_ref,         # i32[Bt, Lp]          suffix gap sums
        inr_ref,        # i32[Bt, Lp]          j < L
        isl_ref,        # i32[Bt, Lp]          j == L-1
        out_any,        # out [n, B, P_pad, Lp] (ANY; rows 1..n-2)
        inbuf,          # scratch [2, Bt, Pt, Lp] i32
        aq_scr,         # scratch [Bt, Pt, Lp] i32
        ar_scr,         # scratch [Bt, Pt, Lp] i32
        rowbuf,         # scratch [Bt, Pt, Lp] i32
        repbuf,         # scratch [Gd, Bt, 8, Lp] i32
        rowb,           # scratch [Bt, Lp] i32 (boundary row n-1)
        rsem,           # DMA sems (2,)
        repsem,         # DMA sems (Gd,)
        wsem,           # DMA sem  ()
    ):
        step = pl.program_id(1)
        bo = pl.program_id(0) * Bt
        Lp = Gs_ref.shape[1]
        jcol3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, Pt, Lp), 2)
        q8 = jax.lax.broadcasted_iota(jnp.int32, (Bt, 8, Lp), 1)
        jlast = jcol3 == Lp - 1
        Gs = Gs_ref[:, :]
        Gs3 = Gs[:, None, :]
        in_read = inr_ref[:, :][:, None, :] != 0     # [Bt, 1, Lp]
        is_last = isl_ref[:, :][:, None, :] != 0
        nrows = nrows_ref[0]

        @pl.when(step == 0)
        def _():
            # boundary row n-1: suffix gap chain, column 0 and pad 0
            jc2 = jax.lax.broadcasted_iota(jnp.int32, Gs.shape, 1)
            rowb[:, :] = jnp.where(
                (jc2 > 0) & (inr_ref[:, :] != 0), Gs, 0
            )

        rbb = rowb[:, :][:, None, :]                 # [Bt, 1, Lp]
        for r in range(R):
            t = step * R + r
            i = nrows - 1 - t                        # row n-2 .. (desc)
            code_i = codes_ref[t]
            gap_i = gnode_ref[t]
            sub3 = sub_ref[code_i][:, None, :]
            multi = grep_ref[t * Gd + 1] >= 0 if Gd > 1 else False

            def fetch_rep(g, guard):
                succ_g = gpred_ref[t * Gd + g]
                rep_g = grep_ref[t * Gd + g]

                @pl.when(guard & (succ_g < nrows))
                def _():
                    cp = pltpu.make_async_copy(
                        out_any.at[jnp.minimum(succ_g, nrows - 1),
                                   pl.ds(bo, Bt),
                                   pl.ds((rep_g // 8) * 8, 8)],
                        repbuf.at[g], repsem.at[g],
                    )
                    cp.start()
                    cp.wait()

                rr = jnp.where(succ_g == nrows, rbb, repbuf[g])
                return jnp.max(
                    jnp.where(q8 == rep_g % 8, rr, NEG), axis=1,
                    keepdims=True,
                )

            reps = [fetch_rep(0, True)]
            for g in range(1, Gd):
                reps.append(fetch_rep(g, multi))

            for tt in range(Nt):

                def fetch(slot, succ_g):
                    @pl.when(succ_g < nrows)
                    def _():
                        cp = pltpu.make_async_copy(
                            out_any.at[jnp.minimum(succ_g, nrows - 1),
                                       pl.ds(bo, Bt),
                                       pl.ds(tt * Pt, Pt)],
                            inbuf.at[slot], rsem.at[slot],
                        )
                        cp.start()
                        cp.wait()

                    return jnp.where(succ_g == nrows, rbb, inbuf[slot])

                rep_tile = rep_ref[r, tt * Pt : (tt + 1) * Pt][None, :, None]
                on_tile = on_ref[r, tt * Pt : (tt + 1) * Pt][None, :, None]
                succ_0 = gpred_ref[t * Gd]
                Aq = fetch(0, succ_0)
                Ar = jnp.broadcast_to(reps[0], (Bt, Pt, Lp))
                if Gd > 1:

                    @pl.when(multi)
                    def _():
                        aq_scr[:] = Aq
                        ar_scr[:] = Ar
                        for g in range(1, Gd):
                            succ_g = gpred_ref[t * Gd + g]
                            rep_g = grep_ref[t * Gd + g]
                            rr = fetch(1, succ_g)
                            memb = rep_tile == rep_g
                            aq_scr[:] = jnp.where(memb, rr, aq_scr[:])
                            ar_scr[:] = jnp.where(
                                memb, jnp.broadcast_to(
                                    reps[g], (Bt, Pt, Lp)), ar_scr[:]
                            )

                    Aq = jnp.where(multi, aq_scr[:], Aq)
                    Ar = jnp.where(multi, ar_scr[:], Ar)

                # rep solve with suffix chain (rev_align :129-435)
                Ar_sh = jnp.where(jlast, NEG, pltpu.roll(Ar, Lp - 1, 2))
                d_r = Ar_sh + sub3
                u_r = Ar + gap_i
                if mode8:
                    last_r = jnp.max(
                        jnp.where(is_last, Ar, NEG), axis=2, keepdims=True
                    ) + gap_i
                else:
                    last_r = jnp.zeros((Bt, Pt, 1), jnp.int32)
                Achain = jnp.maximum(d_r, u_r)
                Achain = jnp.where(is_last, last_r, Achain)
                Achain = jnp.where(in_read, Achain, NEG)
                rep_row = Gs3 + _suffix_chain(Achain - Gs3, jcol3, Lp)

                dirD = rep_row == d_r
                dirU = ~dirD & (rep_row == u_r)
                nonL = dirD | dirU | is_last

                Aq_sh = jnp.where(jlast, NEG, pltpu.roll(Aq, Lp - 1, 2))
                vD = Aq_sh + sub3
                vU = Aq + gap_i
                if mode8:
                    last_q = jnp.max(
                        jnp.where(is_last, Aq, NEG), axis=2, keepdims=True
                    ) + gap_i
                else:
                    last_q = jnp.zeros((Bt, Pt, 1), jnp.int32)
                V = jnp.where(dirD, vD, vU)
                V = jnp.where(is_last, last_q, V)
                enc = jnp.where(
                    nonL, ((Lp - jcol3) << 17) | (V - Gs3 + OFF), -1
                )
                enc = _suffix_chain(enc, jcol3, Lp)
                row = Gs3 + (enc & ENC_MASK) - OFF

                live = i >= 1
                row = jnp.where((on_tile != 0) & live, row, 0)
                row = jnp.where(in_read, row, 0)
                row = jnp.where(jcol3 == 0, 0, row)  # col 0 never written

                rowbuf[:] = row
                wcp = pltpu.make_async_copy(
                    rowbuf,
                    out_any.at[jnp.maximum(i, 0), pl.ds(bo, Bt),
                               pl.ds(tt * Pt, Pt)],
                    wsem,
                )
                wcp.start()
                wcp.wait()

    return kernel


_cache: dict = {}


def eligible_bigp(dg, table, Lp128: int) -> bool:
    """Same packed-chain + SMEM gates as the base kernel."""
    mx = int(np.abs(np.asarray(table)).max())
    if 2 * Lp128 * mx >= (1 << 16):
        return False
    grep, gpred, Gd, steps, n_pad = _group_meta(dg, 8)
    return n_pad * (2 * Gd + 3) * 4 < 600_000


def pick_bt_bigp(B: int, Pt: int, Lp: int, Gd: int) -> int:
    words = (2 + 2 + 1) * Pt + 8 * Gd + 24
    bt = 32
    while bt > 1 and (words * 4 * bt * Lp > VMEM_BUDGET or bt > B or B % bt):
        bt //= 2
    return bt


def fill_pathwise_bigp(dg, table, seq, semiglobal: bool, R=8, Bt=None,
                       Pt=32, interpret=False):
    """Path-tiled Pallas pathwise fill; returns A int32[B, P, n, Lp128].

    Bit-identical to the base kernel / `_fill_pathwise(...,
    encode_chain=True)` over the first Lp lanes.
    """
    B, Lp = seq.shape
    P = dg.paths_number
    P_pad = -(-P // Pt) * Pt
    Lp128 = -(-Lp // 128) * 128
    if Lp128 != Lp:
        from .. import scoring

        seq = jnp.pad(seq, ((0, 0), (0, Lp128 - Lp)),
                      constant_values=scoring.N)
        Lp = Lp128
    grep, gpred, Gd, steps, n_pad = _group_meta(dg, R)
    Nt = P_pad // Pt
    if Bt is None:
        Bt = pick_bt_bigp(B, Pt, Lp, Gd)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    n = dg.n

    key = (n, Lp, Bt, R, B, Gd, Pt, bool(semiglobal), interpret)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel_bigp(R, Gd, Bt, Pt, Nt, bool(semiglobal))
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=5,
                    grid=(B // Bt, steps),
                    in_specs=[
                        pl.BlockSpec((R, P_pad), lambda b, s, *_: (s, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, P_pad), lambda b, s, *_: (s, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((7, Bt, Lp), lambda b, s, *_: (0, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lp), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((2, Bt, Pt, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Pt, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Pt, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Pt, Lp), jnp.int32),
                        pltpu.VMEM((Gd, Bt, 8, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Lp), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((Gd,)),
                        pltpu.SemaphoreType.DMA(()),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, B, P_pad, Lp), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _cache[key] = fn

    codes7 = jnp.arange(7, dtype=jnp.int32)
    sub = table[codes7][:, seq]                        # [7, B, Lp]
    gseq = table[seq, GAP]
    G = jnp.cumsum(gseq, axis=1)
    rep_in = jnp.zeros((n_pad, P_pad), jnp.int32).at[:n, :P].set(
        jnp.asarray(dg.rep_of)
    )
    on_in = jnp.zeros((n_pad, P_pad), jnp.int32).at[:n, :P].set(
        jnp.asarray(dg.paths_on, jnp.int32)
    )
    gnode = table[dg.codes, GAP]
    gnode = jnp.pad(gnode, (0, n_pad - n))
    codes = jnp.pad(dg.codes, (0, n_pad - n))
    nrows = jnp.asarray([n - 1], dtype=jnp.int32)
    (out,) = fn(
        jnp.asarray(grep), jnp.asarray(gpred), codes, gnode, nrows,
        rep_in, on_in, sub, G,
    )
    return jnp.moveaxis(out[:n, :, :P, :], 0, 2)       # [B, P, n, Lp]


def eligible_rev_bigp(dgr, table, Lp128: int) -> bool:
    """Same gates as the base rev kernel minus the VMEM constraint."""
    mx = int(np.abs(np.asarray(table)).max())
    if 2 * Lp128 * mx >= (1 << 16):
        return False
    if dgr.qsrc_of is not None:
        q = np.asarray(dgr.qsrc_of)
        if (q != np.arange(q.shape[1], dtype=q.dtype)[None]).any():
            return False
    meta = _group_meta_rev(dgr, 8)
    Gd, n_pad_t = meta[5], meta[7]
    return n_pad_t * (2 * Gd + 3) * 4 < 600_000


def fill_pathwise_rev_bigp(dgr, table, seq, L, mode8: bool, R=8, Bt=None,
                           Pt=32, interpret=False):
    """Path-tiled Pallas reverse pathwise fill; returns
    W int32[B, P, n, Lp128], bit-identical to
    `recombination_engine._fill_pathwise_rev(..., encode_chain=True)`
    including the row-(n-1) alpha-only delta quirk and the
    never-written column 0."""
    from ..scoring import SENTINEL

    B, Lp = seq.shape
    P = dgr.paths_number
    P_pad = -(-P // Pt) * Pt
    Lp128 = -(-Lp // 128) * 128
    if Lp128 != Lp:
        from .. import scoring

        seq = jnp.pad(seq, ((0, 0), (0, Lp128 - Lp)),
                      constant_values=scoring.N)
        Lp = Lp128
    grep, gpred, codes_t, rep_t, on_t, Gd, steps, n_pad_t = (
        _group_meta_rev(dgr, R)
    )
    Nt = P_pad // Pt
    if Bt is None:
        Bt = pick_bt_bigp(B, Pt, Lp, Gd)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    n = dgr.n

    key = ("rev", n, Lp, Bt, R, B, Gd, Pt, bool(mode8), interpret)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_rev_kernel_bigp(R, Gd, Bt, Pt, Nt, bool(mode8))
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=5,
                    grid=(B // Bt, steps),
                    in_specs=[
                        pl.BlockSpec((R, P_pad), lambda b, s, *_: (s, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, P_pad), lambda b, s, *_: (s, 0),
                                     memory_space=pltpu.VMEM),
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
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((2, Bt, Pt, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Pt, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Pt, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Pt, Lp), jnp.int32),
                        pltpu.VMEM((Gd, Bt, 8, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Lp), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((Gd,)),
                        pltpu.SemaphoreType.DMA(()),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n, B, P_pad, Lp), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _cache[key] = fn

    # reverse-read planes (get_rev_sequence: drop '$', append 'F')
    jcol = jnp.arange(Lp, dtype=jnp.int32)
    rev = jnp.roll(seq, -1, axis=1)
    rev = jnp.where(jcol[None, :] == (L - 1)[:, None], SENTINEL, rev)
    in_read = (jcol[None, :] < L[:, None])
    gseq = jnp.where(in_read, table[rev, GAP], 0)
    Gs = jnp.cumsum(gseq[:, ::-1], axis=1)[:, ::-1]
    is_last = jcol[None, :] == (L - 1)[:, None]
    codes7 = jnp.arange(7, dtype=jnp.int32)
    sub = table[codes7][:, rev]
    rep_in = jnp.zeros((n_pad_t, P_pad), jnp.int32).at[:, :P].set(
        jnp.asarray(rep_t)
    )
    on_in = jnp.zeros((n_pad_t, P_pad), jnp.int32).at[:, :P].set(
        jnp.asarray(on_t)
    )
    gnode = table[jnp.asarray(codes_t), GAP]
    nrows = jnp.asarray([n - 1], dtype=jnp.int32)
    (out,) = fn(
        jnp.asarray(grep), jnp.asarray(gpred), jnp.asarray(codes_t),
        gnode, nrows, rep_in, on_in, sub, Gs,
        in_read.astype(jnp.int32), is_last.astype(jnp.int32),
    )
    # boundary rows: row 0 zeros; row n-1 keeps the suffix chain only
    # on the alpha plane (the delta-leak quirk)
    rown1 = jnp.where((jcol[None, :] > 0) & in_read, Gs, 0)   # [B, Lp]
    qpad = jnp.arange(P_pad, dtype=jnp.int32)
    out = out.at[0].set(0)
    out = out.at[n - 1].set(
        jnp.where((qpad == 0)[None, :, None], rown1[:, None, :], 0)
    )
    return jnp.moveaxis(out[:, :, :P, :], 0, 2)               # [B,P,n,Lp]
