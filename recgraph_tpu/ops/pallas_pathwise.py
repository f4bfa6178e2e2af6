"""Pathwise (modes 4/5) Pallas fill — fused row scan over path planes.

The XLA scan engine (`pathwise_engine._fill_pathwise`) is per-step
dispatch-bound on TPU: each of the n sequential rows issues ~30 small
ops on [B, P, Lp] tensors (~0.44 ms/row at B=32, ~20x the data's
bandwidth cost).  This kernel fuses the whole row into one Pallas grid
step, with the path axis folded into sublanes:

- layout [Bt, P_pad, Lp]: paths on sublanes (P padded to 8), read
  columns on 128-aligned lanes; both per-row (max,+) chains (the rep
  solve and the non-rep packed replay, pathwise_alignment.rs:18-304)
  are radix-4 Kogge-Stone lane prefixes (pallas_poa_v5.py);
- the per-path predecessor/representative gathers of the XLA engine
  become a loop over the row's predecessor-edge GROUPS (paths sharing
  a pred edge share pred row and rep, graph.pathgraph.pathwise_meta):
  per group one predecessor-row read, a membership-mask select (Aq),
  and a masked sublane max-reduction extracting the rep plane (Ar) —
  no dynamic gathers at all.  Chain rows have one group; node starts
  have one per incoming edge;
- predecessor rows come from a VMEM ring when the span is short (the
  chain-row common case) and are DMA'd back from the HBM result buffer
  otherwise — pathwise graphs have unbounded pred spans (haplotype
  paths skip nodes), so unlike the POA kernels the full matrix IS the
  spill store: the output lives in ANY memory and each finished row is
  DMA'd out as it is produced;
- scores-only output [n_pad, B, P_pad, Lp]: the pathwise walkers
  (device `_walk_pathwise` and the oracle) recompute directions from
  score planes, so no packed-direction plane is materialised.

Exactness: bit-identical to `_fill_pathwise(..., encode_chain=True)`,
including the packed (column << 17 | value) replay chain — the kernel
is only eligible when that encoding fits (2*Lp*max|score| < 2^16),
same gate as the XLA engine; row 0 lives in a dedicated scratch so
pred-row-0 reads never alias the ring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring import GAP

# unlike the 2-D local-POA kernel (latency-bound rolls, radix 4 —
# pallas_poa_v5.py), this kernel's [Bt, P_pad, Lp] operands are >100
# vregs, so the chains are THROUGHPUT-bound: radix 2 moves the least
# data (log2(Lp) rolls+maxes vs 1.5x that for radix 4)
RADIX = 2

NEG = -(1 << 28)
RING = 8                       # VMEM ring depth (near predecessors)
VMEM_BUDGET = 14 * 1024 * 1024
OFF = 1 << 16
ENC_MASK = (1 << 17) - 1


def _chain_radix4(x, jcol, Lp):
    """Inclusive lane prefix max (radix-RADIX Kogge-Stone), 3-D operand."""
    k = 1
    while k < Lp:
        cands = []
        for m in range(1, RADIX):
            d = m * k
            if d < Lp:
                cands.append(jnp.where(jcol >= d, pltpu.roll(x, d, 2), NEG))
        for c in cands:
            x = jnp.maximum(x, c)
        k *= RADIX
    return x


def _make_kernel(R: int, steps: int, Gd: int, Bt: int, semiglobal: bool):
    def kernel(
        grep_ref,       # i32[n_pad * Gd]      group rep path (-1 pad)
        gpred_ref,      # i32[n_pad * Gd]      group pred row (0 pad)
        codes_ref,      # i32[n_pad]
        gnode_ref,      # i32[n_pad]           table[code, '-']
        nrows_ref,      # i32[1]               n - 1
        rep_ref,        # i32[R, P_pad]        rep_of rows (block)
        on_ref,         # i32[R, P_pad]        paths_on rows (block)
        sub_ref,        # i32[7, Bt, Lp]       table[c][seq[j]]
        gseq_ref,       # i32[Bt, Lp]
        G_ref,          # i32[Bt, Lp]
        out_any,        # out [n_pad, B, P_pad, Lp] (ANY: HBM result)
        ring,           # scratch [RING, Bt, P_pad, Lp] i32
        farbuf,         # scratch [2, Bt, P_pad, Lp] i32 (hot/cold slots)
        aq_scr,         # scratch [Bt, P_pad, Lp] i32 (multi-group staging)
        ar_scr,         # scratch [Bt, P_pad, Lp] i32
        row0,           # scratch [Bt, Lp] i32
        rsem,           # DMA sems (2,)
        wsem,           # DMA sem  ()
    ):
        step = pl.program_id(1)
        bo = pl.program_id(0) * Bt
        Lp = gseq_ref.shape[1]
        P_pad = rep_ref.shape[1]
        jcol3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, P_pad, Lp), 2)
        qiota = jax.lax.broadcasted_iota(jnp.int32, (Bt, P_pad, Lp), 1)
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
            live = (i >= 1) & (i < nrows)
            code_i = codes_ref[i]
            gap_i = gnode_ref[i]
            sub3 = sub_ref[code_i][:, None, :]           # [Bt, 1, Lp]
            rep_row_meta = rep_ref[r][None, :, None]     # [1, P_pad, 1]

            # predecessor rows: VMEM ring when the span is short (the
            # common case), DMA'd back from the HBM result otherwise.
            # 97%+ of rows have ONE predecessor-edge group, so slot 0
            # runs unconditionally without membership masks (off-path
            # planes are zeroed at the end regardless); the rare
            # multi-group rows take a pl.when'd loop staged through
            # the aq/ar scratch.
            def fetch(slot, pred_g):
                far = (pred_g > 0) & (i - pred_g >= RING)

                @pl.when(far)
                def _():
                    cp = pltpu.make_async_copy(
                        out_any.at[pred_g, pl.ds(bo, Bt)],
                        farbuf.at[slot], rsem.at[slot],
                    )
                    cp.start()
                    cp.wait()

                rr = jnp.where(far, farbuf[slot], ring[pred_g % RING])
                return jnp.where(pred_g == 0, r0b, rr)

            def repplane(rr, rep_g):
                return jnp.max(
                    jnp.where(qiota == rep_g, rr, NEG), axis=1, keepdims=True
                )

            pred_0 = gpred_ref[i * Gd]
            rep_0 = grep_ref[i * Gd]
            rr0 = fetch(0, pred_0)
            Aq = rr0
            Ar = jnp.broadcast_to(repplane(rr0, rep_0), (Bt, P_pad, Lp))
            if Gd > 1:
                multi = grep_ref[i * Gd + 1] >= 0

                @pl.when(multi)
                def _():
                    aq_scr[:] = Aq
                    ar_scr[:] = Ar
                    for g in range(1, Gd):
                        pred_g = gpred_ref[i * Gd + g]
                        rep_g = grep_ref[i * Gd + g]
                        rr = fetch(1, pred_g)
                        memb = rep_row_meta == rep_g     # [1, P_pad, 1]
                        aq_scr[:] = jnp.where(memb, rr, aq_scr[:])
                        ar_scr[:] = jnp.where(
                            memb, repplane(rr, rep_g), ar_scr[:]
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

            # non-rep replay: packed (column << 17 | value) lane chain
            Aq_sh = jnp.where(j0, NEG, pltpu.roll(Aq, 1, 2))
            vD = Aq_sh + sub3
            vU = Aq + gap_i
            V = jnp.where(dirD, vD, vU)
            first_q = 0 if semiglobal else Aq + gap_i
            V = jnp.where(j0, first_q, V)
            enc = jnp.where(nonL, (jcol3 << 17) | (V - G3 + OFF), -1)
            enc = _chain_radix4(enc, jcol3, Lp)
            row = G3 + (enc & ENC_MASK) - OFF

            on3 = on_ref[r][None, :, None] != 0   # reshape i32, then compare
                                                  # (Mosaic: no 1-bit minor-dim insert)
            row = jnp.where(on3 & live, row, 0)
            row = jnp.where(i == 0, r0b, row)

            ring[i % RING] = row
            wcp = pltpu.make_async_copy(
                ring.at[i % RING], out_any.at[i, pl.ds(bo, Bt)], wsem
            )
            wcp.start()
            wcp.wait()

    return kernel


def _suffix_chain(x, jcol3, Lp):
    """Inclusive lane SUFFIX max: y[j] = max_{k>=j} x[k]."""
    k = 1
    while k < Lp:
        cands = []
        for m in range(1, RADIX):
            d = m * k
            if d < Lp:
                cands.append(
                    jnp.where(jcol3 < Lp - d, pltpu.roll(x, Lp - d, 2), NEG)
                )
        for c in cands:
            x = jnp.maximum(x, c)
        k *= RADIX
    return x


def _make_rev_kernel(R: int, steps: int, Gd: int, Bt: int, mode8: bool):
    """Reverse pathwise fill (recombination_engine._fill_pathwise_rev).

    Rows run n-2..1 (t = 0.. in grid order, i = n-2-t); chains are
    suffix maxes; predecessors are SUCCESSOR rows (already computed at
    larger i = smaller t); the boundary row n-1 (the suffix gap chain,
    rev_align :76-79) lives in scratch like the forward kernel's row 0.
    Rows 0 and n-1 of the result and the row-(n-1) alpha-only quirk
    are composed by the wrapper.
    """

    def kernel(
        grep_ref,       # i32[n_pad * Gd]      t-order group rep (-1 pad)
        gpred_ref,      # i32[n_pad * Gd]      t-order group SUCC row
        codes_ref,      # i32[n_pad]           t-order rev-graph codes
        gnode_ref,      # i32[n_pad]
        nrows_ref,      # i32[1]               n - 1
        rep_ref,        # i32[R, P_pad]        t-order rep_of rows
        on_ref,         # i32[R, P_pad]
        sub_ref,        # i32[7, Bt, Lp]       table[c][rev_seq[j]]
        Gs_ref,         # i32[Bt, Lp]          suffix gap sums
        inr_ref,        # i32[Bt, Lp]          j < L
        isl_ref,        # i32[Bt, Lp]          j == L-1
        out_any,        # out [n_pad, B, P_pad, Lp] (ANY; rows 1..n-2)
        ring,           # scratch [RING, Bt, P_pad, Lp] i32 (t-indexed)
        farbuf,         # scratch [2, Bt, P_pad, Lp] i32
        aq_scr,         # scratch [Bt, P_pad, Lp] i32
        ar_scr,         # scratch [Bt, P_pad, Lp] i32
        rowb,           # scratch [Bt, Lp] i32 (boundary row n-1)
        rsem,           # DMA sems (2,)
        wsem,           # DMA sem  ()
    ):
        step = pl.program_id(1)
        bo = pl.program_id(0) * Bt
        Lp = Gs_ref.shape[1]
        P_pad = rep_ref.shape[1]
        jcol3 = jax.lax.broadcasted_iota(jnp.int32, (Bt, P_pad, Lp), 2)
        qiota = jax.lax.broadcasted_iota(jnp.int32, (Bt, P_pad, Lp), 1)
        jlast = jcol3 == Lp - 1
        Gs = Gs_ref[:, :]
        Gs3 = Gs[:, None, :]
        in_read = inr_ref[:, :][:, None, :] != 0     # [Bt, 1, Lp]
        is_last = isl_ref[:, :][:, None, :] != 0
        nrows = nrows_ref[0]

        @pl.when(step == 0)
        def _():
            # boundary row n-1: suffix gap chain, column 0 and padding 0
            jc2 = jax.lax.broadcasted_iota(jnp.int32, Gs.shape, 1)
            rowb[:, :] = jnp.where(
                (jc2 > 0) & (inr_ref[:, :] != 0), Gs, 0
            )

        rbb = rowb[:, :][:, None, :]                 # [Bt, 1, Lp]
        for r in range(R):
            t = step * R + r
            i = nrows - 1 - t                        # row n-2 .. (desc)
            live = i >= 1
            code_i = codes_ref[t]
            gap_i = gnode_ref[t]
            sub3 = sub_ref[code_i][:, None, :]
            rep_row_meta = rep_ref[r][None, :, None]

            def fetch(slot, succ_g):
                # succ row s computed at t_s = nrows-1-s; far if the
                # t-span exceeds the ring
                t_s = nrows - 1 - succ_g
                far = (succ_g < nrows) & (t - t_s >= RING)

                @pl.when(far)
                def _():
                    cp = pltpu.make_async_copy(
                        out_any.at[succ_g, pl.ds(bo, Bt)],
                        farbuf.at[slot], rsem.at[slot],
                    )
                    cp.start()
                    cp.wait()

                rr = jnp.where(
                    far, farbuf[slot],
                    ring[jnp.maximum(t_s, 0) % RING],
                )
                return jnp.where(succ_g == nrows, rbb, rr)

            def repplane(rr, rep_g):
                return jnp.max(
                    jnp.where(qiota == rep_g, rr, NEG), axis=1, keepdims=True
                )

            succ_0 = gpred_ref[t * Gd]
            rep_0 = grep_ref[t * Gd]
            rr0 = fetch(0, succ_0)
            Aq = rr0
            Ar = jnp.broadcast_to(repplane(rr0, rep_0), (Bt, P_pad, Lp))
            if Gd > 1:
                multi = grep_ref[t * Gd + 1] >= 0

                @pl.when(multi)
                def _():
                    aq_scr[:] = Aq
                    ar_scr[:] = Ar
                    for g in range(1, Gd):
                        succ_g = gpred_ref[t * Gd + g]
                        rep_g = grep_ref[t * Gd + g]
                        rr = fetch(1, succ_g)
                        memb = rep_row_meta == rep_g
                        aq_scr[:] = jnp.where(memb, rr, aq_scr[:])
                        ar_scr[:] = jnp.where(
                            memb, repplane(rr, rep_g), ar_scr[:]
                        )

                Aq = jnp.where(multi, aq_scr[:], Aq)
                Ar = jnp.where(multi, ar_scr[:], Ar)

            # rep solve with suffix chain (rev_align :129-435)
            Ar_sh = jnp.where(jlast, NEG, pltpu.roll(Ar, Lp - 1, 2))
            d_r = Ar_sh + sub3
            u_r = Ar + gap_i
            # restart at j == L-1: mode 8 U-only chain, mode 9 zero
            if mode8:
                last_r = jnp.max(
                    jnp.where(is_last, Ar, NEG), axis=2, keepdims=True
                ) + gap_i
            else:
                last_r = jnp.zeros((Bt, P_pad, 1), jnp.int32)
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
                last_q = jnp.zeros((Bt, P_pad, 1), jnp.int32)
            V = jnp.where(dirD, vD, vU)
            V = jnp.where(is_last, last_q, V)
            # packed suffix chain: (Lp - j) << 17 keys pick the nearest
            # non-L column to the right
            enc = jnp.where(
                nonL, ((Lp - jcol3) << 17) | (V - Gs3 + OFF), -1
            )
            enc = _suffix_chain(enc, jcol3, Lp)
            row = Gs3 + (enc & ENC_MASK) - OFF

            on3 = on_ref[r][None, :, None] != 0
            row = jnp.where(on3 & live, row, 0)
            row = jnp.where(in_read, row, 0)
            row = jnp.where(jcol3 == 0, 0, row)      # column 0 never written

            ring[t % RING] = row
            wcp = pltpu.make_async_copy(
                ring.at[t % RING],
                out_any.at[jnp.maximum(i, 0), pl.ds(bo, Bt)], wsem,
            )
            wcp.start()
            wcp.wait()

    return kernel


_meta_cache: dict[int, tuple] = {}


def _group_meta(dg, R: int):
    """(grep, gpred, Gd, steps, n_pad) per row, padded to R multiples."""
    key = id(dg)
    hit = _meta_cache.get(key)
    if hit is not None and hit[0] == R:
        return hit[1]
    rep = np.asarray(dg.rep_of)
    pred = np.asarray(dg.pred_of)
    on = np.asarray(dg.paths_on)
    n = dg.n
    reps, preds, counts = [], [], []
    for i in range(n):
        pairs = []
        seen = set()
        for q in np.flatnonzero(on[i]):
            t = (int(rep[i, q]), int(pred[i, q]))
            if t not in seen:
                seen.add(t)
                pairs.append(t)
        counts.append(len(pairs))
        reps.append([a for a, _ in pairs])
        preds.append([b for _, b in pairs])
    Gd = max(max(counts[1 : n - 1], default=1), 1)
    # ceil over n (not n-1): guarantees the grid also writes row n-1
    # (zeros, live gate) so the consumer's out[:n] slice is always
    # fully initialised even when (n-1) % R == 0
    steps = -(-n // R)
    n_pad = steps * R
    grep = np.full((n_pad, Gd), -1, np.int32)
    gpred = np.full((n_pad, Gd), 0, np.int32)
    for i in range(1, n - 1):
        grep[i, : counts[i]] = reps[i]
        gpred[i, : counts[i]] = preds[i]
    out = (grep.reshape(-1), gpred.reshape(-1), Gd, steps, n_pad)
    _meta_cache[key] = (R, out)
    return out


def pick_bt(B: int, P_pad: int, Lp: int, Gd: int, R: int) -> int:
    """Largest power-of-two batch tile whose VMEM footprint fits."""
    words = (RING + 2 + 2 + 3) * P_pad + 16  # ring + farbuf + staging + temps
    bt = 32
    while bt > 1 and (words * 4 * bt * Lp > VMEM_BUDGET or bt > B or B % bt):
        bt //= 2
    return bt


_cache: dict = {}


def eligible(dg, table, Lp128: int) -> bool:
    """Kernel gate: the packed-chain encoding fits (same bound as the
    XLA engine's encode_chain) and the metadata fits SMEM."""
    mx = int(np.abs(np.asarray(table)).max())
    if 2 * Lp128 * mx >= (1 << 16):
        return False
    grep, gpred, Gd, steps, n_pad = _group_meta(dg, 8)
    return n_pad * (2 * Gd + 3) * 4 < 600_000


def fill_pathwise_v1(dg, table, seq, semiglobal: bool, R=8, Bt=None,
                     interpret=False):
    """Pallas pathwise fill; returns A int32[B, P, n, Lp128].

    Bit-identical to `_fill_pathwise(..., encode_chain=True)` over the
    first Lp lanes (pad lanes extend the read with N columns, which
    consumers slice off; rows past n-1 are zero).
    """
    B, Lp = seq.shape
    P = dg.paths_number
    P_pad = -(-P // 8) * 8
    Lp128 = -(-Lp // 128) * 128
    if Lp128 != Lp:
        from .. import scoring

        seq = jnp.pad(seq, ((0, 0), (0, Lp128 - Lp)),
                      constant_values=scoring.N)
        Lp = Lp128
    grep, gpred, Gd, steps, n_pad = _group_meta(dg, R)
    if Bt is None:
        Bt = pick_bt(B, P_pad, Lp, Gd, R)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    n = dg.n

    key = (n, Lp, Bt, R, B, Gd, bool(semiglobal), interpret)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel(R, steps, Gd, Bt, bool(semiglobal))
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
                    ],
                    out_specs=[
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((RING, Bt, P_pad, Lp), jnp.int32),
                        pltpu.VMEM((2, Bt, P_pad, Lp), jnp.int32),
                        pltpu.VMEM((Bt, P_pad, Lp), jnp.int32),
                        pltpu.VMEM((Bt, P_pad, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Lp), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
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
    # sub[c] = table[c][seq] — node-code-major, matching the XLA
    # engine's table[code_i][seq] (order matters for asymmetric HOXD)
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
        rep_in, on_in, sub, gseq, G,
    )
    # consumers take [B, P, n, Lp]
    A = jnp.moveaxis(out[:n, :, :P, :], 0, 2)
    return A

_meta_cache_rev: dict[int, tuple] = {}


def _group_meta_rev(dgr, R: int):
    """t-order group metadata for the reverse fill (t = n-2-i).

    ``pred_of`` of the reverse device graph holds SUCCESSOR rows; pads
    use succ n-1 (the boundary scratch) and rep -1 (never a member).
    Returns (grep, gpred, codes_t, gnode_idx_t, rep_t, on_t, Gd,
    steps, n_pad_t).
    """
    key = id(dgr)
    hit = _meta_cache_rev.get(key)
    if hit is not None and hit[0] == R:
        return hit[1]
    rep = np.asarray(dgr.rep_of)
    pred = np.asarray(dgr.pred_of)
    on = np.asarray(dgr.paths_on)
    codes = np.asarray(dgr.codes)
    n = dgr.n
    pairs_of = []
    for i in range(1, n - 1):
        pairs = []
        seen = set()
        for q in np.flatnonzero(on[i]):
            t = (int(rep[i, q]), int(pred[i, q]))
            if t not in seen:
                seen.add(t)
                pairs.append(t)
        pairs_of.append(pairs)
    Gd = max(max((len(p) for p in pairs_of), default=1), 1)
    steps = -(-(n - 2) // R) if n > 2 else 1
    n_pad_t = steps * R
    grep = np.full((n_pad_t, Gd), -1, np.int32)
    gpred = np.full((n_pad_t, Gd), n - 1, np.int32)
    codes_t = np.zeros(n_pad_t, np.int32)
    rep_t = np.zeros((n_pad_t, rep.shape[1]), np.int32)
    on_t = np.zeros((n_pad_t, on.shape[1]), np.int32)
    for i in range(1, n - 1):
        t = n - 2 - i
        p = pairs_of[i - 1]
        grep[t, : len(p)] = [a for a, _ in p]
        gpred[t, : len(p)] = [b for _, b in p]
        codes_t[t] = codes[i]
        rep_t[t] = rep[i]
        on_t[t] = on[i]
    out = (grep.reshape(-1), gpred.reshape(-1), codes_t, rep_t, on_t,
           Gd, steps, n_pad_t)
    _meta_cache_rev[key] = (R, out)
    return out


def eligible_rev(dgr, table, Lp128: int) -> bool:
    mx = int(np.abs(np.asarray(table)).max())
    if 2 * Lp128 * mx >= (1 << 16):
        return False
    if dgr.qsrc_of is not None:
        # delta-leak rows (clone semantics) are handled only by the XLA
        # engine; such graphs are pathological (single-node paths), so
        # the Pallas kernel simply declines them
        q = np.asarray(dgr.qsrc_of)
        if (q != np.arange(q.shape[1], dtype=q.dtype)[None]).any():
            return False
    meta = _group_meta_rev(dgr, 8)
    Gd, _, n_pad_t = meta[5], meta[6], meta[7]
    return n_pad_t * (2 * Gd + 3) * 4 < 600_000


def fill_pathwise_rev_v1(dgr, table, seq, L, mode8: bool, R=8, Bt=None,
                         interpret=False):
    """Pallas reverse pathwise fill; returns W int32[B, P, n, Lp128].

    Bit-identical to `recombination_engine._fill_pathwise_rev(...,
    encode_chain=True)` over the first Lp lanes, including the
    row-(n-1) alpha-only delta quirk and the never-written column 0.
    """
    from ..scoring import SENTINEL

    B, Lp = seq.shape
    P = dgr.paths_number
    P_pad = -(-P // 8) * 8
    Lp128 = -(-Lp // 128) * 128
    if Lp128 != Lp:
        from .. import scoring

        seq = jnp.pad(seq, ((0, 0), (0, Lp128 - Lp)),
                      constant_values=scoring.N)
        Lp = Lp128
    grep, gpred, codes_t, rep_t, on_t, Gd, steps, n_pad_t = (
        _group_meta_rev(dgr, R)
    )
    if Bt is None:
        Bt = pick_bt(B, P_pad, Lp, Gd, R)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    n = dgr.n

    key = ("rev", n, Lp, Bt, R, B, Gd, bool(mode8), interpret)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_rev_kernel(R, steps, Gd, Bt, bool(mode8))
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
                        pltpu.VMEM((RING, Bt, P_pad, Lp), jnp.int32),
                        pltpu.VMEM((2, Bt, P_pad, Lp), jnp.int32),
                        pltpu.VMEM((Bt, P_pad, Lp), jnp.int32),
                        pltpu.VMEM((Bt, P_pad, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Lp), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,)),
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
    # on the alpha plane (the delta-leak quirk, absolute_scores
    # :747-757 / recombination_engine._fill_pathwise_rev tail)
    rown1 = jnp.where((jcol[None, :] > 0) & in_read, Gs, 0)   # [B, Lp]
    qpad = jnp.arange(P_pad, dtype=jnp.int32)
    out = out.at[0].set(0)
    out = out.at[n - 1].set(
        jnp.where((qpad == 0)[None, :, None], rown1[:, None, :], 0)
    )
    return jnp.moveaxis(out[:, :, :P, :], 0, 2)               # [B,P,n,Lp]
