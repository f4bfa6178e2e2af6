"""Pallas TPU kernel for the modes-6/7 hard-row column scan.

The hard rows of the pathwise affine fill (pathwise_gap_engine.hard_row,
mirroring pathwise_alignment_gap.rs:150-539) are the one inherently
sequential piece of the modes-6/7 fill: the in-row L/x affine coupling
chains all Lp columns.  As an XLA lax.scan the per-column body costs
~26 us on tiny [B, P]/[B, MB] operands (issue/relayout-bound —
PERF.md round-3 section), putting 34 rows x 255 columns = ~230 of the
302 ms of a 64-read fill there.  This kernel runs the identical column
program in-register: the carry (x_row, d_row int32[P, B]) never leaves
vregs, per-block values are [1, B] rows, and the per-column cost is the
~10^2 VPU ops the program actually needs.

The block structure is collapsed to per-lane maps (host side, already
precomputed by gap_meta for the XLA path): each lane p is written by at
most one owner block own(p) per matrix, so the kernel evaluates every
block's scalar chain (tb/alpha lanes) and scatters the owning block's
formula to the lanes — exactly the owner-one-hot algebra of the XLA
body, reassociated per lane.

Exactness: bit-identical to pathwise_gap_engine.hard_row's lax.scan
(pinned by tests/test_pallas_gap67.py with interpret=True, and by the
modes-6/7 goldens through the CLI on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 28)
TILE = 32            # columns per grid step (input/output pipelining)


def _make_kernel(MB: int, P: int, n_tiles: int, Lpm: int):
    def kernel(
        tb_ref,        # SMEM i32[MBp]   tb lane per block
        nd_ref,        # SMEM i32[MBp]   (tb != alpha) per block
        fire_ref,      # SMEM i32[MBp]   fixup fires per block
        isa_ref,       # SMEM i32[MBp]   block's tb == row alpha pre-adj
        after_ref,     # SMEM i32[MBp]   block ordered after the isa block
        scal_ref,      # SMEM i32[8]     [ai, o, e, Lpm, ...]
        u_ref,         # VMEM [TILE, MBp, B]  U candidates per column
        dc_ref,        # VMEM [TILE, MBp, B]  D candidates per column
        dfd_ref,       # VMEM [TILE, P, B]    owner-collapsed is_d source
        ypre_ref,      # VMEM [TILE, P, B]    is_u source (pre-fixup y)
        lc_ref,        # VMEM [4, P, B]  own_id, hot_lane, fixmem_id, hotl
        x0_ref,        # VMEM [P, B]     column-0 state
        xs_ref,        # out  [TILE, P, B]
        ds_ref,        # out  [TILE, P, B]
        x_st,          # scratch [P, B]
        d_st,          # scratch [P, B]
    ):
        t = pl.program_id(0)
        B = x0_ref.shape[1]
        ai = scal_ref[0]
        o = scal_ref[1]
        e = scal_ref[2]
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)
        ai_hot = sub_i == ai

        own_id = lc_ref[0]
        hot_lane = lc_ref[1] != 0    # tb[own(p)] == p
        fixmem_id = lc_ref[2]
        hotl = lc_ref[3] != 0        # lane is a firing block's tb lane

        @pl.when(t == 0)
        def _():
            x_st[:, :] = x0_ref[:, :]
            d_st[:, :] = x0_ref[:, :]

        def col(jj, carry):
            x_row, d_row = carry
            u_j = u_ref[jj]                       # [MBp, B]
            d_j = dc_ref[jj]
            dfd_j = dfd_ref[jj]                   # [P, B]
            ypre_j = ypre_ref[jj]

            x_ai = jnp.sum(jnp.where(ai_hot, x_row, 0), 0, keepdims=True)
            d_ai = jnp.sum(jnp.where(ai_hot, d_row, 0), 0, keepdims=True)

            x_new = jnp.zeros_like(x_row)
            mxs, lsels = [], []
            for s in range(MB):
                tb_s = tb_ref[s]
                nd_s = nd_ref[s]
                tb_hot = sub_i == tb_s
                x_tb = jnp.sum(jnp.where(tb_hot, x_row, 0), 0, keepdims=True)
                d_tb = jnp.sum(jnp.where(tb_hot, d_row, 0), 0, keepdims=True)
                l_x = x_tb + nd_s * x_ai + e
                l_dpm = d_tb + nd_s * d_ai + o + e
                lsel = l_dpm >= l_x
                l_s = jnp.where(lsel, l_dpm, l_x)            # [1, B]
                mx_s = jnp.maximum(jnp.maximum(d_j[s:s + 1], u_j[s:s + 1]),
                                   l_s)
                mxs.append(mx_s)
                lsels.append((lsel, mx_s, u_j[s:s + 1], d_j[s:s + 1], l_s))
                own_s = own_id == s
                xm = jnp.where(lsel, d_row - nd_s * d_tb,
                               x_row - nd_s * x_tb)          # [P, B]
                x_new = jnp.where(
                    own_s, jnp.where(hot_lane, l_s, xm), x_new
                )

            d_new = jnp.zeros_like(d_row)
            for s in range(MB):
                lsel, mx_s, u_s, d_s, l_s = lsels[s]
                is_d = mx_s == d_s
                is_u = jnp.logical_and(jnp.logical_not(is_d), mx_s == u_s)
                dm = jnp.where(is_d, dfd_j,
                               jnp.where(is_u, ypre_j, x_new))
                own_s = own_id == s
                d_new = jnp.where(
                    own_s, jnp.where(hot_lane, mx_s, dm), d_new
                )

            # multi-alpha fixup (gap.rs:521-537): one correction closes
            # the cascade (fire tb lanes distinct, fixmem group-disjoint)
            d_ai2 = jnp.sum(jnp.where(ai_hot, d_new, 0), 0, keepdims=True)
            x_ai2 = jnp.sum(jnp.where(ai_hot, x_new, 0), 0, keepdims=True)
            va0d, va0x = [], []
            va_adj_d = jnp.zeros_like(d_ai2)
            va_adj_x = jnp.zeros_like(x_ai2)
            for s in range(MB):
                tb_hot = sub_i == tb_ref[s]
                m_tb_d = jnp.sum(jnp.where(tb_hot, d_new, 0), 0,
                                 keepdims=True)
                m_tb_x = jnp.sum(jnp.where(tb_hot, x_new, 0), 0,
                                 keepdims=True)
                v0d = m_tb_d - d_ai2
                v0x = m_tb_x - x_ai2
                va0d.append(v0d)
                va0x.append(v0x)
                va_adj_d = va_adj_d + isa_ref[s] * v0d
                va_adj_x = va_adj_x + isa_ref[s] * v0x
            adds_d = jnp.zeros_like(d_new)
            adds_x = jnp.zeros_like(x_new)
            hotv_d = jnp.zeros_like(d_new)
            hotv_x = jnp.zeros_like(x_new)
            for s in range(MB):
                vad = (va0d[s] - after_ref[s] * va_adj_d) * fire_ref[s]
                vax = (va0x[s] - after_ref[s] * va_adj_x) * fire_ref[s]
                in_fix = fixmem_id == s
                adds_d = jnp.where(in_fix, adds_d + vad, adds_d)
                adds_x = jnp.where(in_fix, adds_x + vax, adds_x)
                tb_hot = sub_i == tb_ref[s]
                hotv_d = jnp.where(tb_hot, hotv_d + vad, hotv_d)
                hotv_x = jnp.where(tb_hot, hotv_x + vax, hotv_x)
            d_fin = jnp.where(hotl, hotv_d, d_new + adds_d)
            x_fin = jnp.where(hotl, hotv_x, x_new + adds_x)

            xs_ref[jj] = x_fin
            ds_ref[jj] = d_fin
            return x_fin, d_fin

        x_row, d_row = jax.lax.fori_loop(
            0, TILE, col, (x_st[:, :], d_st[:, :])
        )
        x_st[:, :] = x_row
        d_st[:, :] = d_row

    return kernel


_cache: dict = {}


# set True by tests to run the kernel through the Pallas interpreter
INTERPRET = False


def hard_cols_lc(U, Dc, Dfd_own, Ypre, lc, x0, tb, nd, fire, isa, after,
                 scal, interpret=False):
    """xs, ds int32[Lpm, P, B] — the post-fixup x/d rows per column.

    lc: int32[4, P, B] lane constants (own_id, hot_lane, fixmem_id,
    hotl); tb/nd/fire/isa/after: int32[MBp] per-block scalars;
    scal: int32[8] = [ai, o, e, Lpm, 0...].
    """
    Lpm, MBp, B = U.shape
    P = x0.shape[0]
    n_tiles = Lpm // TILE
    assert Lpm % TILE == 0
    key = (MBp, P, B, Lpm, interpret)
    fn = _cache.get(key)
    if fn is None:
        kernel = _make_kernel(MBp, P, n_tiles, Lpm)
        fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=6,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((TILE, MBp, B), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, MBp, B), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, P, B), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, P, B), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, P, B), lambda t, *_: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, B), lambda t, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((TILE, P, B), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, P, B), lambda t, *_: (t, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((P, B), jnp.int32),
                    pltpu.VMEM((P, B), jnp.int32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((Lpm, P, B), jnp.int32),
                jax.ShapeDtypeStruct((Lpm, P, B), jnp.int32),
            ],
            interpret=interpret,
        )
        _cache[key] = fn
    return fn(tb, nd, fire, isa, after, scal, U, Dc, Dfd_own, Ypre, lc, x0)
