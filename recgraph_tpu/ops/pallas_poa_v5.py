"""Local-POA Pallas fill, v5 — the production TPU kernel.

Same recurrence and outputs as v2/v4 (mode-1 fill of local_poa.rs:180-298
re-designed as a scan over topo-ordered rows with a (max,+) prefix chain
for the in-row L dependency), plus the three levers the v4 ablations
isolated (the chain's cross-lane rolls are LATENCY-bound: per-step cost
is width-independent and triples when the lane extent is not a multiple
of the 128-lane tile):

1. **128-aligned lane extents.** A [Bt, 152] plane already occupies two
   (8, 128) lane tiles physically, so padding reads to Lp % 128 == 0 is
   free in memory and VREG work — but turns every Mosaic lane roll from
   the unaligned slow path (~3.2 us) into an aligned one (~1.1 us).
2. **Radix-4 prefix chain.** The three rolls of a radix-4 Kogge-Stone
   super-step depend only on the previous step's value, so their
   cross-lane latencies overlap: depth ceil(log4 Lp) instead of
   ceil(log2 Lp) for the serial in-row dependency.
3. **Wide batch tiles + int16 ring.** Since per-step cost is
   width-independent, throughput scales ~linearly with the batch tile
   Bt until VMEM runs out.  The dominant buffer is the predecessor ring
   ([RING, Bt, Lp]); local-mode scores are >= 0 and bounded by
   max(table) * L, so when that bound fits int16 the ring is stored
   narrow (NEG clips to -32768, which behaves identically through the
   max(., 0) / compare paths that consume ring rows).

Reference semantics preserved: first-best predecessor sweep order
(local_poa.rs:257-293), zero floor + tie order D >= U >= L
(local_poa.rs:222-233), row-major first-best argmax.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring import GAP
from .poa_engine import NEG, O, D, LOW_D, L_DIR, U_DIR
from .pallas_poa import RING

VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the 16M scoped limit


# Measured on v5e at Lp=256/Bt=64: radix 2 -> 8 super-steps, radix 4 ->
# 4 (12.2 ms/fill), radix 16 -> 2 but issue-bound (14.3 ms).  4 wins.
RADIX = 4


def _chain_radix4(x, jloc, S):
    """Inclusive prefix max over lanes, radix-RADIX Kogge-Stone.

    ``jloc``/``S``: segment-local column index and segment width — with
    read packing (several reads per lane-row) the jloc >= d guards stop
    every roll at segment boundaries, so each read's prefix chain stays
    independent.  Unpacked: jloc = jcol, S = Lp (unchanged maths).
    """
    k = 1
    while k < S:
        cands = []
        for m in range(1, RADIX):
            d = m * k
            if d < S:
                cands.append(jnp.where(jloc >= d, pltpu.roll(x, d, 1), NEG))
        for c in cands:
            x = jnp.maximum(x, c)
        k *= RADIX
    return x


def _make_kernel(R: int, steps: int, ring16: bool, ringc: int,
                 seg: int, npack: int):
    rdt = jnp.int16 if ring16 else jnp.int32

    def kernel(
        pred_idx_ref,   # i32[n * Pm] (flat: 2-D SMEM pads to 128 lanes)
        pred_rank_ref,  # i32[n * Pm] compact end-rank per predecessor
        is_start_ref,   # i32[n]
        gnode_ref,      # i32[n]
        codes_ref,      # i32[n]
        erank_ref,      # i32[n]      end rank of row i (-1 if not an end)
        nrows_ref,      # i32[1]
        sub_ref,        # [7, Bt, Lp]   table[c][seq[j]]
        eq_ref,         # [7, Bt, Lp]   seq[j] == c
        gseq_ref,       # [Bt, Lp]      table[seq, '-']
        G_ref,          # [Bt, Lp]      cumsum(gseq)
        valid_ref,      # [Bt, Lp]      j < L
        packed_ref,     # out [R, Bt, Lp] (row-major layout [n_pad, B, Lp])
        bv_ref,         # out [Bt, 1]
        key_ref,        # out [Bt, 1]   best_i * Lp + best_j
        ring,           # scratch [ringc, Bt, Lp] (rdt), end-rank indexed
        prev,           # scratch [Bt, Lp]
        best,           # scratch [2, Bt, Lp]
        acc,            # scratch [4, Bt, Lp]
    ):
        step = pl.program_id(1)
        Bt, Lp = gseq_ref.shape
        n = codes_ref.shape[0]
        Pm = pred_idx_ref.shape[0] // n
        jcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, Lp), 1)
        jloc = jcol % seg if npack > 1 else jcol
        j0 = jloc == 0
        gseq = gseq_ref[:, :]
        G = G_ref[:, :]
        valid = valid_ref[:, :] != 0
        nrows = nrows_ref[0]

        @pl.when(step == 0)
        def _():
            best[0] = jnp.zeros((Bt, Lp), jnp.int32)
            best[1] = jnp.zeros((Bt, Lp), jnp.int32)
            prev[:, :] = jnp.zeros((Bt, Lp), jnp.int32)

        for r in range(R):
            i = step * R + r
            ii = jnp.minimum(i, n - 1)          # clamp tail-pad metadata reads
            live = (i > 0) & (i < nrows)
            code_i = codes_ref[ii]
            gnode_i = gnode_ref[ii]
            subrow = sub_ref[code_i]
            is_start = (is_start_ref[ii] != 0) & live

            # fast path (unconditional): single predecessor = previous row
            p_row = prev[:, :]
            fast_d = jnp.where(j0, NEG, pltpu.roll(p_row, 1, 1))

            @pl.when(is_start)
            def _():
                # full first-best predecessor sweep (ascending iteration
                # keeps the first best, local_poa.rs:257-293)
                acc[0] = jnp.full((Bt, Lp), NEG, jnp.int32)
                acc[1] = jnp.full((Bt, Lp), NEG, jnp.int32)
                acc[2] = jnp.zeros((Bt, Lp), jnp.int32)
                acc[3] = jnp.zeros((Bt, Lp), jnp.int32)
                for p in range(Pm):
                    pidx = pred_idx_ref[i * Pm + p]
                    rank = pred_rank_ref[i * Pm + p]

                    @pl.when(pidx >= 0)
                    def _():
                        prow = ring[jnp.maximum(rank, 0) % ringc].astype(
                            jnp.int32
                        )
                        prow = jnp.where(pidx == 0, 0, prow)  # row 0 = zeros
                        upd = prow > acc[1]
                        acc[3] = jnp.where(upd, pidx, acc[3])
                        acc[1] = jnp.where(upd, prow, acc[1])
                        prow_sh = pltpu.roll(prow, 1, 1)
                        prow_sh = jnp.where(j0, NEG, prow_sh)
                        upd = prow_sh > acc[0]
                        acc[2] = jnp.where(upd, pidx, acc[2])
                        acc[0] = jnp.where(upd, prow_sh, acc[0])

            d_pre = jnp.where(is_start, acc[0], fast_d)
            u_pre = jnp.where(is_start, acc[1], p_row)

            # start-row quirk: running max seeded at 0/row-0
            d_val = jnp.where(is_start, jnp.maximum(d_pre, 0), d_pre) + subrow
            u_val = jnp.where(is_start, jnp.maximum(u_pre, 0), u_pre) + gnode_i
            d_idx = jnp.where(
                is_start, jnp.where(d_pre > 0, acc[2], 0), i - 1
            )
            u_idx = jnp.where(
                is_start, jnp.where(u_pre > 0, acc[3], 0), i - 1
            )

            # (max,+) prefix chain for the in-row L dependency
            A = jnp.maximum(jnp.maximum(d_val, u_val), 0)
            A = jnp.where(j0, 0, A)
            x = _chain_radix4(A - G, jloc, seg)
            m_row = G + x
            m_row = jnp.where(valid, m_row, NEG)
            m_row = jnp.where(j0, 0, m_row)

            # directions (zero floor local_poa.rs:222-233; tie D >= U >= L)
            m_prev = pltpu.roll(m_row, 1, 1)
            m_prev = jnp.where(j0, NEG, m_prev)
            l_val = m_prev + gseq
            all_neg = (d_val < 0) & (u_val < 0) & (l_val < 0)
            d_ge_u = d_val >= u_val
            dirD = d_ge_u & (d_val >= l_val)
            dirU = (~d_ge_u) & (u_val >= l_val)
            match = eq_ref[code_i] != 0
            dcode = jnp.where(
                dirD, jnp.where(match, D, LOW_D), jnp.where(dirU, U_DIR, L_DIR)
            )
            pred_sel = jnp.where(dirD, d_idx, jnp.where(dirU, u_idx, i))
            border = all_neg | j0 | ~valid | ~live
            dcode = jnp.where(border, O, dcode)
            pred_sel = jnp.where(border, 0, pred_sel)
            packed_ref[r] = pred_sel * 16 + dcode

            # per-lane strict-> best: first row to reach a lane's max wins
            row_masked = jnp.where(valid & live, m_row, NEG)
            upd = row_masked > best[0]
            best[1] = jnp.where(upd, i, best[1])
            best[0] = jnp.where(upd, row_masked, best[0])

            # ring write feeds future start rows; only node-end rows are
            # ever read as predecessors, so only they occupy ring slots
            m_store = jnp.where(live, m_row, 0)
            er = erank_ref[ii]

            @pl.when(er >= 0)
            def _():
                if ring16:
                    ring[er % ringc] = jnp.clip(
                        m_store, -32768, 32767
                    ).astype(rdt)
                else:
                    ring[er % ringc] = m_store

            prev[:, :] = m_store

        @pl.when(step == steps - 1)
        def _():
            bvp = best[0]
            # per-segment (per packed read) reduction; row-major first
            # best: smallest (row, col) among a segment's max lanes
            for s in range(npack):
                in_seg = (jcol >= s * seg) & (jcol < (s + 1) * seg)
                bs = jnp.where(in_seg, bvp, NEG)
                rmax = jnp.max(bs, axis=1, keepdims=True)
                key = jnp.min(
                    jnp.where(bs == rmax, best[1] * Lp + jcol, 1 << 30),
                    axis=1, keepdims=True,
                )
                bv_ref[:, s : s + 1] = rmax
                key_ref[:, s : s + 1] = key

    return kernel


def pick_bt(B: int, Lp: int, ring16: bool, R: int = 8,
            ringc: int = RING) -> int:
    """Largest power-of-two batch tile whose VMEM footprint fits.

    Words per (Bt x Lp) element: ring ringc*(0.5|1), sub+eq 14 (x2
    buffers), ins 3 (x2), packed out R (x2), scratch 7.  The compact
    end-rank ring (ringc ~ 16-32 on pangenome graphs vs the absolute
    ring's 256) is what lets Bt reach 128.
    """
    words = ringc * (0.5 if ring16 else 1.0) + 28 + 6 + 2 * R + 7
    bt = 128
    while bt > 8 and (words * 4 * bt * Lp > VMEM_BUDGET or bt > B or B % bt):
        bt //= 2
    return bt


_cache: dict = {}


def fill_local_v5(dg, table, seq, L, Bt=None, R=8, interpret=False,
                  ring16=None, align=True, pack=1):
    """Drop-in for fill_local_v2 (same outputs and packed layout).

    Pads the lane extent to a multiple of 128 internally (physically
    free, see module docstring); ``packed`` is returned at the padded
    width with batch axis 1 — pad lanes hold O-direction cells that no
    walk can enter (their scores are NEG, never the argmax).

    ``pack`` > 1 packs that many reads per lane-row (segment width =
    the incoming per-read width; pack*width must be a 128 multiple):
    the chain guards stop at segment boundaries, so per-read results
    are unchanged while the latency-bound chain serialises over
    pack-times fewer rows.  Outputs keep per-READ shapes
    (packed[n_pad, B, S]) — the unpack is a free reshape.

    Returns (score[B], best_i[B], best_j[B], packed[n_pad, B, Lp128]).
    """
    B, Lp = seq.shape
    if pack > 1:
        S = Lp
        if (pack * S) % 128 or B % pack:
            raise ValueError(f"pack={pack} needs pack*{S} % 128 == 0 "
                             f"and batch {B} % pack == 0")
        from ..scoring import GAP as _GAP

        codes7 = jnp.arange(7, dtype=jnp.int32)
        tT = table.T
        sub = tT[codes7][:, seq].reshape(7, B // pack, pack * S)
        eq = (
            (seq[None, :, :] == codes7[:, None, None]).astype(jnp.int32)
        ).reshape(7, B // pack, pack * S)
        gseq = table[seq, _GAP]
        G = jnp.cumsum(gseq, axis=1).reshape(B // pack, pack * S)
        gseq = gseq.reshape(B // pack, pack * S)
        jcol1 = jnp.arange(S, dtype=jnp.int32)
        valid = (
            (jcol1[None, :] < L[:, None]).astype(jnp.int32)
        ).reshape(B // pack, pack * S)
        out = _call_v5(
            dg, table, sub, eq, gseq, G, valid, B // pack, pack * S,
            Bt, R, interpret, ring16, seg=S, npack=pack,
        )
        bv, bkey, packed = out
        LpT = pack * S
        bv = bv.reshape(B)
        key = bkey.reshape(B)
        offs = (jnp.arange(B, dtype=jnp.int32) % pack) * S
        best_i = key // LpT
        best_j = key % LpT - offs
        n_pad = packed.shape[0]
        packed = packed.reshape(n_pad, B, S)
        return bv, best_i, best_j, packed
    Lp128 = -(-Lp // 128) * 128 if align else Lp
    if Lp128 != Lp:
        from .. import scoring

        seq = jnp.pad(seq, ((0, 0), (0, Lp128 - Lp)),
                      constant_values=scoring.N)
        Lp = Lp128
    codes7 = jnp.arange(7, dtype=jnp.int32)
    tT = table.T                                   # (seq, lnz) order
    sub = tT[codes7][:, seq]
    eq = (seq[None, :, :] == codes7[:, None, None]).astype(jnp.int32)
    gseq = table[seq, GAP]
    G = jnp.cumsum(gseq, axis=1)
    jcol = jnp.arange(Lp, dtype=jnp.int32)
    valid = (jcol[None, :] < L[:, None]).astype(jnp.int32)
    bv, bkey, packed = _call_v5(
        dg, table, sub, eq, gseq, G, valid, B, Lp, Bt, R, interpret,
        ring16, seg=Lp, npack=1,
    )
    bv = bv[:, 0]
    bkey = bkey[:, 0]
    return bv, bkey // Lp, bkey % Lp, packed


def _call_v5(dg, table, sub, eq, gseq, G, valid, Brows, Lp, Bt, R,
             interpret, ring16, seg, npack):
    """Build/cache the pallas_call and run it on prepared planes.

    Brows: lane-row count (B // npack when packed); Lp: total lane
    extent (npack * seg).  Returns (bv[Brows, npack],
    key[Brows, npack], packed[n_pad, Brows, Lp]).
    """
    if ring16 is None:
        if isinstance(table, jax.core.Tracer):
            ring16 = False      # under an outer jit the bound is unknowable;
        else:                   # callers there pass ring16= explicitly
            ring16 = int(jnp.max(table)) * seg < 32000
    ringc = 16
    while ringc <= dg.compact_span:
        ringc *= 2
    if Bt is None:
        Bt = pick_bt(Brows, Lp, ring16, R, ringc)
    if Brows % Bt:
        raise ValueError(f"batch {Brows} not divisible by tile {Bt}")
    n = dg.n
    # n_pad must cover n rows (the wrappers slice packed[:n]); with small
    # R, ceil((n-1)/R)*R can fall below n and the .at[n-1] clamp would
    # silently overwrite the last real row
    steps = -(-n // R)
    n_pad = steps * R
    key = (n, Lp, Bt, R, Brows, interpret, ring16, ringc, seg, npack)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel(R, steps, ring16, ringc, seg, npack)
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=7,
                    grid=(Brows // Bt, steps),
                    in_specs=[
                        pl.BlockSpec((7, Bt, Lp), lambda b, s, *_: (0, b, 0),
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
                        pl.BlockSpec((R, Bt, Lp), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, npack), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, npack), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((ringc, Bt, Lp),
                                   jnp.int16 if ring16 else jnp.int32),
                        pltpu.VMEM((Bt, Lp), jnp.int32),
                        pltpu.VMEM((2, Bt, Lp), jnp.int32),
                        pltpu.VMEM((4, Bt, Lp), jnp.int32),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, Brows, Lp), jnp.int32),
                    jax.ShapeDtypeStruct((Brows, npack), jnp.int32),
                    jax.ShapeDtypeStruct((Brows, npack), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _cache[key] = fn
    n = dg.n
    tT = table.T
    gnode = tT[dg.codes, GAP]
    nrows = jnp.asarray([n - 1], dtype=jnp.int32)
    packed, bv, bkey = fn(
        dg.pred_idx.reshape(-1), dg.pred_rank.reshape(-1),
        dg.node_start.astype(jnp.int32), gnode, dg.codes, dg.erank, nrows,
        sub, eq, gseq, G, valid,
    )
    return bv, bkey, packed
