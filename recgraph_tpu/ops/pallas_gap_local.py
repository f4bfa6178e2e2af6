"""Affine-gap local-POA Pallas fill (mode 3).

Same recurrence and outputs as `poa_gap_engine._fill_gap_local`
(gap_local_poa.rs:8-129), structured like the other v2 kernels
(128-aligned lanes, non-start fast path, R-row unroll, int16 m/y
rings) with the o<=0 linear-chain reduction of pallas_gap_global.py —
here seeded by the (m,x) = (0,0) state at column 0, so
x[j] = e*j + cummax_{k<j} S[k], S[0] = 0, S[k>0] = c[k] + o - e*k,
m[j] = max(c[j], x[j]), c = max(d, y, 0) (the local zero floor).

Tie semantics preserved exactly: start-row first-best pred argmaxes
with the running-max-from-zero quirk and ties-to-Y (:131-187),
non-start strict-Y (:56-73), X iff x[j-1] > m[j-1]+o (ties M, :40-54),
D >= U >= L with the zero floor (:96-110), and the row-major
first-best global argmax.  Note the (seq, lnz) table-argument order —
opposite to mode 2 (gap_local_poa.rs:57,137; matters for HOXD).

Pinned bit-exact vs the XLA engine by tests/test_pallas_gap.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .poa_engine import NEG, O, D, LOW_D, L_DIR, U_DIR, X_DIR, Y_DIR, M_DIR
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


def _make_kernel(R: int, n: int, ring16: bool, ringc: int, seg: int,
                 npack: int):
    rdt = jnp.int16 if ring16 else jnp.int32

    def kernel(
        pred_idx_ref,
        pred_rank_ref,  # i32[n * Pm] compact end rank per predecessor
        erank_ref,      # i32[n]      end rank of row i (-1 if not an end)   # i32[n * Pm]
        is_start_ref,   # i32[n]
        codes_ref,      # i32[n]
        oe_ref,         # i32[2]  (o, e)
        sub_ref,        # [7, Bt, Lpo]   tT[c][seq] — (seq, lnz) order
        seqc_ref,       # [Bt, Lpo]  read codes
        valid_ref,      # [Bt, Lpo]      j < L
        packed_ref,     # out [R, Bt, Lpo]
        packedx_ref,    # out [R, Bt, Lpo]
        packedy_ref,    # out [R, Bt, Lpo]
        bv_ref,         # out [Bt, npack]
        key_ref,        # out [Bt, npack]  best_i * Lpo + best_j (global)
        ring_m,         # scratch [RING, Bt, Lpo] (rdt)
        ring_y,         # scratch [RING, Bt, Lpo] (rdt)
        prev_m,         # scratch [Bt, Lpo] i32
        prev_y,         # scratch [Bt, Lpo] i32
        sweep_s,        # scratch [6, Bt, Lpo]
        best,           # scratch [2, Bt, Lpo]
    ):
        step = pl.program_id(1)
        Bt, Lpo = valid_ref.shape
        Pm = pred_idx_ref.shape[0] // codes_ref.shape[0]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, Lpo), 1)
        jloc = jcol % seg if npack > 1 else jcol
        j0 = jloc == 0
        o = oe_ref[0]
        e = oe_ref[1]
        valid = valid_ref[:, :] != 0
        NEGc = jnp.int32(NEG)

        @pl.when(step == 0)
        def _():
            best[0] = jnp.full((Bt, Lpo), NEG, jnp.int32)
            best[1] = jnp.zeros((Bt, Lpo), jnp.int32)
            prev_m[:, :] = jnp.zeros((Bt, Lpo), jnp.int32)
            prev_y[:, :] = jnp.zeros((Bt, Lpo), jnp.int32)

        for r in range(R):
            i = step * R + r
            ii = jnp.minimum(i, n - 1)
            live = (i > 0) & (i < n - 1)
            is_start = (is_start_ref[ii] != 0) & live
            code_i = codes_ref[ii]
            subrow = sub_ref[code_i]
            match = seqc_ref[:, :] == code_i

            # ---- predecessor candidates ----
            # non-start fast path (":56-73"): plain i-1, ties differ
            m_up = prev_m[:, :]
            y_up = prev_y[:, :]
            d_val_n = jnp.where(j0, NEGc, pltpu.roll(m_up, 1, 1)) + subrow
            um_n = m_up + o
            uy_n = y_up
            from_y_n = uy_n > um_n                          # strict => Y
            y_row_n = jnp.maximum(um_n, uy_n) + e

            def pred_rows(pidx, rank):
                pm = ring_m[jnp.maximum(rank, 0) % ringc].astype(jnp.int32)
                py = ring_y[jnp.maximum(rank, 0) % ringc].astype(jnp.int32)
                pm = jnp.where(pidx == 0, 0, pm)            # row 0 zeros
                py = jnp.where(pidx == 0, 0, py)
                return pm, py

            @pl.when(is_start)
            def _():
                # start rows (":131-187"): first-best sweeps with the
                # running-max-from-zero quirk; ties => Y
                d_pre = jnp.full((Bt, Lpo), NEG, jnp.int32)
                d_arg = jnp.zeros((Bt, Lpo), jnp.int32)
                um_pre = jnp.full((Bt, Lpo), NEG, jnp.int32)
                um_arg = jnp.zeros((Bt, Lpo), jnp.int32)
                uy_pre = jnp.full((Bt, Lpo), NEG, jnp.int32)
                uy_arg = jnp.zeros((Bt, Lpo), jnp.int32)
                for p in range(Pm):
                    pidx = pred_idx_ref[ii * Pm + p]
                    ok = pidx >= 0
                    pm, py = pred_rows(pidx, pred_rank_ref[ii * Pm + p])
                    pm = jnp.where(ok, pm, NEGc)
                    py = jnp.where(ok, py, NEGc)
                    pm_sh = jnp.where(j0, NEGc, pltpu.roll(pm, 1, 1))
                    pm_sh = jnp.where(ok, pm_sh, NEGc)
                    upd = pm_sh > d_pre
                    d_arg = jnp.where(upd, pidx, d_arg)
                    d_pre = jnp.where(upd, pm_sh, d_pre)
                    upd = pm > um_pre
                    um_arg = jnp.where(upd, pidx, um_arg)
                    um_pre = jnp.where(upd, pm, um_pre)
                    upd = py > uy_pre
                    uy_arg = jnp.where(upd, pidx, uy_arg)
                    uy_pre = jnp.where(upd, py, uy_pre)
                sweep_s[0] = d_pre
                sweep_s[1] = d_arg
                sweep_s[2] = um_pre + o
                sweep_s[3] = um_arg
                sweep_s[4] = uy_pre
                sweep_s[5] = uy_arg

            d_pre_s = sweep_s[0]
            d_val_s = jnp.maximum(d_pre_s, 0) + subrow
            d_idx_s = jnp.where(d_pre_s > 0, sweep_s[1], 0)
            um_pre_s = sweep_s[2]
            um_s = jnp.maximum(um_pre_s, 0)
            um_idx_s = jnp.where(um_pre_s > 0, sweep_s[3], 0)
            uy_pre_s = sweep_s[4]
            uy_s = jnp.maximum(uy_pre_s, 0)
            uy_idx_s = jnp.where(uy_pre_s > 0, sweep_s[5], 0)
            from_m_s = um_s > uy_s                          # ties => Y
            y_row_s = jnp.maximum(um_s, uy_s) + e
            y_idx_s = jnp.where(from_m_s, um_idx_s, uy_idx_s)

            d_val = jnp.where(is_start, d_val_s, d_val_n)
            d_idx = jnp.where(is_start, d_idx_s, i - 1)
            y_row = jnp.where(is_start, y_row_s, y_row_n)
            u_idx = jnp.where(is_start, y_idx_s, i - 1)
            # (int selects only: Mosaic cannot select between i1 vectors)
            code_s = jnp.where(from_m_s, M_DIR, Y_DIR)
            code_n = jnp.where(from_y_n, Y_DIR, M_DIR)
            py_code = jnp.where(is_start, code_s, code_n)
            py_pred = u_idx

            # ---- in-row (M, X) solve: linear chain with zero floor ----
            c = jnp.maximum(jnp.maximum(d_val, y_row), 0)
            S = c + o - e * jloc
            S = jnp.where(j0, 0, S)                         # (m,x)=(0,0) seed
            Sx = _chain_radix(S, jloc, seg)
            x_row = e * jloc + jnp.where(j0, NEGc, pltpu.roll(Sx, 1, 1))
            m_row = jnp.maximum(c, x_row)
            border = (i == 0) | j0 | ~valid
            m_row = jnp.where(border, 0, m_row)
            x_row = jnp.where(border, 0, x_row)
            y_row = jnp.where(border, 0, y_row)

            # path_x (":40-54"): X iff x[j-1] > m[j-1]+o (ties => M)
            x_prev = jnp.where(j0, NEGc, pltpu.roll(x_row, 1, 1))
            m_prev = jnp.where(j0, NEGc, pltpu.roll(m_row, 1, 1))
            stay_x = x_prev > m_prev + o
            px_code = jnp.where(stay_x, X_DIR, M_DIR)
            px_pred = jnp.zeros((Bt, Lpo), jnp.int32) + i

            # ---- M directions with zero floor (":96-110"), D >= U >= L
            l_val = x_row
            u_val = y_row
            all_neg = (d_val < 0) & (u_val < 0) & (l_val < 0)
            d_ge_u = d_val >= u_val
            dirD = d_ge_u & (d_val >= l_val)
            dirU = (~d_ge_u) & (u_val >= l_val)
            dcode = jnp.where(
                dirD, jnp.where(match, D, LOW_D), jnp.where(dirU, U_DIR, L_DIR)
            )
            pred_sel = jnp.where(dirD, d_idx, jnp.where(dirU, u_idx, i))
            dcode = jnp.where(all_neg, O, dcode)
            pred_sel = jnp.where(all_neg, 0, pred_sel)
            dcode = jnp.where(border, O, dcode)
            pred_sel = jnp.where(border, 0, pred_sel)
            packed_ref[r] = jnp.where(live | (i == 0), pred_sel * 16 + dcode, 0)
            packedx_ref[r] = jnp.where(
                border | ~live, 0, px_pred * 16 + px_code
            )
            packedy_ref[r] = jnp.where(
                border | ~live, 0, py_pred * 16 + py_code
            )

            # row-major first-best tracking (strict > per lane)
            row_masked = jnp.where(valid & live, m_row, NEG)
            upd = row_masked > best[0]
            best[1] = jnp.where(upd, i, best[1])
            best[0] = jnp.where(upd, row_masked, best[0])

            m_store = jnp.where(live, m_row, 0)
            y_store = jnp.where(live, y_row, 0)
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

        @pl.when(step == pl.num_programs(1) - 1)
        def _():
            bvp = best[0]
            for s in range(npack):
                in_seg = (jcol >= s * seg) & (jcol < (s + 1) * seg)
                bs = jnp.where(in_seg, bvp, NEG)
                rmax = jnp.max(bs, axis=1, keepdims=True)
                key = jnp.min(
                    jnp.where(bs == rmax, best[1] * Lpo + jcol, 1 << 30),
                    axis=1, keepdims=True,
                )
                bv_ref[:, s : s + 1] = rmax
                key_ref[:, s : s + 1] = key

    return kernel


_cache: dict = {}


def pick_bt(B: int, Lpo: int, ring16: bool, R: int = 8,
            ringc: int = RING) -> int:
    words = 2 * ringc * (0.5 if ring16 else 1.0) + 14 + 4 + 6 * R + 10
    bt = 128
    while bt > 8 and (words * 4 * bt * Lpo > VMEM_BUDGET or bt > B or B % bt):
        bt //= 2
    return bt


def fill_gap_local_v2(dg, table, seq, L, o, e, Bt=None, R=8,
                      interpret=False, ring16=None, pack=1):
    """Pallas mode-3 fill; same outputs as `_fill_gap_local` with
    [n, B, Lpo] plane layout.  Requires o <= 0 and e <= 0.

    ``pack`` > 1 packs that many reads per lane-row (segment width =
    the incoming per-read width, pack*width a 128 multiple) exactly as
    in pallas_poa_v5: segment-local chain guards, per-segment argmax.

    Returns (best_val, best_i, best_j, packed, packed_x, packed_y).
    """
    B, Lp = seq.shape
    if pack > 1:
        if (pack * Lp) % 128 or B % pack:
            raise ValueError(f"pack={pack} needs pack*{Lp} % 128 == 0 "
                             f"and batch {B} % pack == 0")
        seg, Brows, Lpo = Lp, B // pack, pack * Lp
    else:
        seg = Lpo = -(-Lp // 128) * 128
        Brows = B
    n = dg.n
    o_i, e_i = int(o), int(e)
    if o_i > 0 or e_i > 0:
        raise ValueError("fill_gap_local_v2 requires non-positive o/e")
    if pack == 1 and Lpo != Lp:
        from .. import scoring

        seq = jnp.pad(seq, ((0, 0), (0, Lpo - Lp)),
                      constant_values=scoring.N)
    if ring16 is None:
        from .poa_engine import sm_max_entry

        ring16 = (sm_max_entry(table) + max(-o_i, -e_i)) * seg < 32000
    ringc = 16
    while ringc <= dg.compact_span:
        ringc *= 2
    if Bt is None:
        Bt = pick_bt(Brows, Lpo, ring16, R, ringc)
    if Brows % Bt:
        raise ValueError(f"batch {Brows} not divisible by tile {Bt}")
    # n_pad must cover n rows (the wrappers slice packed[:n]); with small
    # R, ceil((n-1)/R)*R can fall below n and the .at[n-1] clamp would
    # silently overwrite the last real row
    steps = -(-n // R)
    n_pad = steps * R

    key = (Lpo, n, Bt, R, Brows, interpret, ring16, ringc, seg, pack)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel(R, n, ring16, ringc, seg, pack)
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=6,
                    grid=(Brows // Bt, steps),
                    in_specs=[
                        pl.BlockSpec((7, Bt, Lpo), lambda b, s, *_: (0, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lpo), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, Lpo), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=[
                        pl.BlockSpec((R, Bt, Lpo), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, Bt, Lpo), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((R, Bt, Lpo), lambda b, s, *_: (s, b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, pack), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, pack), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((ringc, Bt, Lpo),
                                   jnp.int16 if ring16 else jnp.int32),
                        pltpu.VMEM((ringc, Bt, Lpo),
                                   jnp.int16 if ring16 else jnp.int32),
                        pltpu.VMEM((Bt, Lpo), jnp.int32),
                        pltpu.VMEM((Bt, Lpo), jnp.int32),
                        pltpu.VMEM((6, Bt, Lpo), jnp.int32),
                        pltpu.VMEM((2, Bt, Lpo), jnp.int32),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, Brows, Lpo), jnp.int32),
                    jax.ShapeDtypeStruct((n_pad, Brows, Lpo), jnp.int32),
                    jax.ShapeDtypeStruct((n_pad, Brows, Lpo), jnp.int32),
                    jax.ShapeDtypeStruct((Brows, pack), jnp.int32),
                    jax.ShapeDtypeStruct((Brows, pack), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _cache[key] = fn

    codes7 = jnp.arange(7, dtype=jnp.int32)
    # (seq, lnz) argument order (gap_local_poa.rs:57,137)
    sub = table.T[codes7][:, seq]
    seqc = seq.astype(jnp.int32)
    jc = jnp.arange(seg, dtype=jnp.int32)
    valid = (jc[None, :] < L[:, None]).astype(jnp.int32)
    if pack > 1:
        sub = sub.reshape(7, Brows, Lpo)
        seqc = seqc.reshape(Brows, Lpo)
        valid = valid.reshape(Brows, Lpo)
    oe = jnp.asarray([o_i, e_i], dtype=jnp.int32)
    packed, packed_x, packed_y, bv, bkey = fn(
        dg.pred_idx.reshape(-1), dg.pred_rank.reshape(-1), dg.erank,
        dg.node_start.astype(jnp.int32),
        dg.codes, oe, sub, seqc, valid,
    )
    packed = packed[:n].at[n - 1].set(0)
    packed_x = packed_x[:n].at[n - 1].set(0)
    packed_y = packed_y[:n].at[n - 1].set(0)
    if pack > 1:
        packed = packed.reshape(n, B, seg)
        packed_x = packed_x.reshape(n, B, seg)
        packed_y = packed_y.reshape(n, B, seg)
        offs = (jnp.arange(B, dtype=jnp.int32) % pack) * seg
        bvf = bv.reshape(B)
        keyf = bkey.reshape(B)
        return (bvf, keyf // Lpo, keyf % Lpo - offs,
                packed, packed_x, packed_y)
    return bv[:, 0], bkey[:, 0] // Lpo, bkey[:, 0] % Lpo, packed, packed_x, packed_y
