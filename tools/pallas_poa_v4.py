"""Mosaic-overhead-optimised Pallas local-POA kernel (v4).

The v2 kernel is not vector-op bound: stripping all direction/packing
vector work changed per-fill time <1% (PERF.md A/B), so the ~18 us per
8-row grid step is Mosaic scheduling — per-row `pl.when` regions break
software pipelining, and dynamic ring indexing adds scalar->vector
dependencies.  v4 restructures exactly those (same recurrences, outputs
bit-identical to poa_engine._fill_local / local_poa.rs:181-293):

- **branchless interior**: every row is computed unconditionally; the
  row-0 base case, the `i >= nrows` tail pad, and the best-cell update
  are arithmetic masks (`live`), not `pl.when` regions.  The only
  remaining per-row branch is the start-row predecessor sweep, skipped
  at runtime for the ~90% single-pred rows;
- **prev-row scratch**: the fast path reads the previous row from a
  dedicated scratch plane carried across rows/steps instead of a
  dynamically-indexed ring slot (the ring is still written every row so
  start rows can read arbitrary predecessors);
- **deferred best reduction**: per-row strict-> updates keep per-lane
  (score, first-row) planes; the two cross-lane reductions + scalar
  read-modify-writes per row collapse into one reduction at the final
  grid step.  Row-major first-best tie order is preserved by reducing
  the packed key bi*Lp+j among max-score lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scoring import GAP
from .poa_engine import NEG, O, D, LOW_D, L_DIR, U_DIR
from .pallas_poa import RING, _prefix_max_chain


def _chain_cummax(x, jcol, Lp):
    return jax.lax.cummax(x, axis=1)


def _chain_roll(x, jcol, Lp):
    return _prefix_max_chain(x, jcol, Lp)


def _chain_radix4(x, jcol, Lp):
    """Radix-4 Kogge-Stone prefix max: the three rolls per super-step
    depend only on the previous step's x, so their (dominant) cross-lane
    latencies overlap — half the serial depth of the radix-2 chain."""
    k = 1
    while k < Lp:
        cands = [x]
        for d in (k, 2 * k, 3 * k):
            if d < Lp:
                cands.append(jnp.where(jcol >= d, pltpu.roll(x, d, 1), NEG))
        x = cands[0]
        for c in cands[1:]:
            x = jnp.maximum(x, c)
        k *= 4
    return x


_CHAINS = {"roll": _chain_roll, "cummax": _chain_cummax, "radix4": _chain_radix4}


def _make_local_kernel_v4(R: int, steps: int, strip: frozenset = frozenset(),
                          chain: str = "roll"):
    """``strip`` removes named kernel features FOR TIMING ABLATIONS ONLY
    (results become wrong): 'sweep' (start-row pred sweep), 'ringw'
    (ring write), 'chain' (prefix-max chain), 'dynsub' (dynamic
    sub/eq row reads), 'pack' (direction derivation + packing)."""
    def kernel(
        pred_idx_ref,   # i32[n * Pm] (flat)
        is_start_ref,   # i32[n]
        gnode_ref,      # i32[n]
        codes_ref,      # i32[n]
        nrows_ref,      # i32[1]  (= n-1, live bound)
        sub_ref,        # [7, Bt, Lp]
        eq_ref,         # [7, Bt, Lp]
        gseq_ref,       # [Bt, Lp]
        G_ref,          # [Bt, Lp]
        valid_ref,      # [Bt, Lp]
        packed_ref,     # out [R, Bt, Lp]
        bv_ref,         # out [Bt, 1]
        key_ref,        # out [Bt, 1]  bi * Lp + bj of the best cell
        ring,           # scratch [RING, Bt, Lp]
        prev,           # scratch [Bt, Lp]   previous row's m_row
        best,           # scratch [2, Bt, Lp]  per-lane best value / first row
        acc,            # scratch [4, Bt, Lp]  start-row sweep d/u pre+arg
    ):
        step = pl.program_id(1)
        Bt, Lp = gseq_ref.shape
        n = codes_ref.shape[0]
        Pm = pred_idx_ref.shape[0] // n
        jcol = jax.lax.broadcasted_iota(jnp.int32, (Bt, Lp), 1)
        j0 = jcol == 0
        gseq = gseq_ref[:, :]
        G = G_ref[:, :]
        valid = valid_ref[:, :] != 0
        nrows = nrows_ref[0]

        @pl.when(step == 0)
        def _():
            best[0] = jnp.zeros((Bt, Lp), jnp.int32)
            best[1] = jnp.zeros((Bt, Lp), jnp.int32)

        for r in range(R):
            i = step * R + r
            ii = jnp.minimum(i, n - 1)          # clamp tail-pad metadata reads
            live = (i > 0) & (i < nrows)
            code_i = codes_ref[ii]
            gnode_i = gnode_ref[ii]
            subrow = sub_ref[code_i] if "dynsub" not in strip else sub_ref[0]
            is_start = (is_start_ref[ii] != 0) & live

            # fast path (unconditional): single predecessor = previous row
            p_row = prev[:, :]
            fast_d = jnp.where(j0, NEG, pltpu.roll(p_row, 1, 1))

            @pl.when(is_start if "sweep" not in strip else (is_start & False))
            def _():
                # full first-best predecessor sweep (ascending iteration
                # keeps the first best, local_poa.rs:257-293)
                acc[0] = jnp.full((Bt, Lp), NEG, jnp.int32)
                acc[1] = jnp.full((Bt, Lp), NEG, jnp.int32)
                acc[2] = jnp.zeros((Bt, Lp), jnp.int32)
                acc[3] = jnp.zeros((Bt, Lp), jnp.int32)
                for p in range(Pm):
                    pidx = pred_idx_ref[i * Pm + p]

                    @pl.when(pidx >= 0)
                    def _():
                        prow = ring[jnp.maximum(pidx, 0) % RING]
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
            x = (_CHAINS[chain](A - G, jcol, Lp)
                 if "chain" not in strip else A - G)
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
            match = (eq_ref[code_i] if "dynsub" not in strip else eq_ref[0]) != 0
            dcode = jnp.where(
                dirD, jnp.where(match, D, LOW_D), jnp.where(dirU, U_DIR, L_DIR)
            )
            pred_sel = jnp.where(dirD, d_idx, jnp.where(dirU, u_idx, i))
            border = all_neg | j0 | ~valid | ~live
            dcode = jnp.where(border, O, dcode)
            pred_sel = jnp.where(border, 0, pred_sel)
            if "pack" not in strip:
                packed_ref[r] = pred_sel * 16 + dcode
            else:
                packed_ref[r] = m_row

            # per-lane strict-> best: first row to reach a lane's max wins
            row_masked = jnp.where(valid & live, m_row, NEG)
            upd = row_masked > best[0]
            best[1] = jnp.where(upd, i, best[1])
            best[0] = jnp.where(upd, row_masked, best[0])

            # ring write feeds future start rows; pads/row 0 store zeros
            m_store = jnp.where(live, m_row, 0)
            if "ringw" not in strip:
                ring[i % RING] = m_store
            prev[:, :] = m_store

        @pl.when(step == steps - 1)
        def _():
            bvp = best[0]
            rmax = jnp.max(bvp, axis=1, keepdims=True)
            # row-major first best: smallest (row, col) among max lanes
            key = jnp.min(
                jnp.where(bvp == rmax, best[1] * Lp + jcol, 1 << 30),
                axis=1, keepdims=True,
            )
            bv_ref[:, :] = rmax
            key_ref[:, :] = key

    return kernel


_cache: dict = {}


def fill_local_v4(dg, table, seq, L, Bt=None, R=8, interpret=False, strip=frozenset(), chain='roll'):
    """Drop-in for fill_local_v2 (same outputs/layout, v4 kernel).

    Returns (score[B], best_i[B], best_j[B], packed[n_pad, B, Lp]) with
    n_pad = R * ceil((n-1)/R) >= n; rows 0 and >= n-1 are zeroed.
    """
    B, Lp = seq.shape
    if Bt is None:
        Bt = min(B, 32)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    n = dg.n
    steps = -(-(n - 1) // R)
    n_pad = steps * R
    key = (n, Lp, Bt, R, B, interpret, strip, chain)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_local_kernel_v4(R, steps, strip, chain)
        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=5,
                    grid=(B // Bt, steps),
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
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((Bt, 1), lambda b, s, *_: (b, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((RING, Bt, Lp), jnp.int32),
                        pltpu.VMEM((Bt, Lp), jnp.int32),
                        pltpu.VMEM((2, Bt, Lp), jnp.int32),
                        pltpu.VMEM((4, Bt, Lp), jnp.int32),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, B, Lp), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                    jax.ShapeDtypeStruct((B, 1), jnp.int32),
                ],
                interpret=interpret,
            )
        )
        _cache[key] = fn
    codes7 = jnp.arange(7, dtype=jnp.int32)
    tT = table.T                                   # (seq, lnz) order
    sub = tT[codes7][:, seq]
    eq = (seq[None, :, :] == codes7[:, None, None]).astype(jnp.int32)
    gseq = table[seq, GAP]
    G = jnp.cumsum(table[seq, GAP], axis=1)
    jcol = jnp.arange(Lp, dtype=jnp.int32)
    valid = (jcol[None, :] < L[:, None]).astype(jnp.int32)
    gnode = tT[dg.codes, GAP]
    nrows = jnp.asarray([n - 1], dtype=jnp.int32)
    packed, bv, bkey = fn(
        dg.pred_idx.reshape(-1), dg.node_start.astype(jnp.int32), gnode,
        dg.codes, nrows, sub, eq, gseq, G, valid,
    )
    return bv[:, 0], bkey[:, 0] // Lp, bkey[:, 0] % Lp, packed
