"""On-device traceback for POA modes 0-3.

The fill kernels produce packed direction planes of size O(n * L) per
read; shipping those to the host dominates end-to-end time (PCIe, or
worse).  This walker replays the traceback ON DEVICE as a batched
`lax.fori_loop` over the packed planes and returns only the compact
walk — O(|alignment|) per read, a ~100x transfer reduction:

    dirs  int32[B, W]   direction code per emitted step, bit 4 set for
                        steps emitted inside an X/Y gap chain
                        (gaf_output.rs:232-248 — chain-interior cells
                        skip the band checks, so the flag lets the host
                        replay both the GAF walk and the band check)
    rows  int32[B, W]   graph row at each step (before the move)
    steps int32[B]      emitted step count
    stop_row/stop_col   where the walk terminated ('O' cell)

Moves in ABSOLUTE read columns (the reference's band-relative
reindexing j + left_row - left_pred collapses to "column unchanged"
in absolute coordinates; D/L decrement the column).

Semantics mirror the four walkers in oracle/gaf_emit.py cell-for-cell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .poa_engine import O, D, LOW_D, L_DIR, U_DIR, X_DIR, Y_DIR

CHAIN_FLAG = 16
HOLE = 31   # non-emitting loop iterations write this code; compacted on host


# --- walk wire format -------------------------------------------------------
# Direction codes fit 5 bits (0..8 plus CHAIN_FLAG=16, max 20), so one
# packed (row << 5 | dir) element replaces the (dirs, rows) int32 pair
# on the device->host link: uint16 when rows fit 11 bits (n <= 2048,
# 4x fewer bytes), else a single int32 (2x).  The r5 stretch phase
# breakdown showed this fetch as the dominant warm-run term.

@jax.jit
def pack_walk16(dirs, rows):
    return ((rows << 5) | dirs).astype(jnp.uint16)


@jax.jit
def pack_walk32(dirs, rows):
    return (rows << 5) | dirs


def unpack_walk(pk):
    import numpy as np

    pk = np.asarray(pk).astype(np.int32)
    return pk & 31, pk >> 5


def compact_walk(dirs_b, rows_b, ns):
    """Strip HOLE columns from one lane's walk and cut to its step
    count (walk buffers are written at the loop-iteration index; gap
    chain transitions leave holes)."""
    import numpy as np

    keep = dirs_b != HOLE
    d = np.ascontiguousarray(dirs_b[keep][:ns])
    r = np.ascontiguousarray(rows_b[keep][:ns])
    return d, r


@functools.partial(jax.jit, static_argnames=("gap", "max_steps"))
def walk_poa(packed, packed_x, packed_y, last_row, last_col_abs, gap,
             max_steps, ws=None, band=None):
    """packed*: int32[B, n, Lp] planes; last_*: int32[B].

    ``ws`` int32[B, n] (optional): per-row window starts for windowed
    planes (poa_engine._fill_global_windowed) — cells are stored at
    lane (col - ws[row]); reads outside the window return 0 (= O),
    matching the full-width plane's out-of-band zeros.

    ``band`` (lefts int32[B, n], rights int32[B, n], seq_len int32[B])
    (optional): runs the band-exhaustion check ON DEVICE, folded into
    the same walk loop (the walker visits exactly the cells the
    native band_check_*_walk replay does), so the host never fetches
    the O(B*n) lefts/rights arrays.  Verdict semantics mirror
    native/gaf_emit.cpp:375-429 (utils.rs band check): first decisive
    cell wins — accept at i==0 or (j==0 and left==0), fail at a band
    border that is not the read border; chain-interior cells (gap
    modes) are skipped.  Also returns query_start = stop_col -
    lefts[stop_row] (stop_col when band is None).
    """
    B, n, Lp = packed.shape
    pf = packed.reshape(B, n * Lp)
    pxf = packed_x.reshape(B, n * Lp) if gap else pf
    pyf = packed_y.reshape(B, n * Lp) if gap else pf
    bidx = jnp.arange(B)

    def cell(flat, row, col):
        if ws is not None:
            rel = col - jnp.take_along_axis(ws, row[:, None], axis=1)[:, 0]
            v = jnp.take_along_axis(
                flat, (row * Lp + jnp.clip(rel, 0, Lp - 1))[:, None], axis=1
            )[:, 0]
            return jnp.where((rel >= 0) & (rel < Lp), v, 0)
        idx = row * Lp + col
        return jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]

    def cond(st):
        # early exit once every read's walk hit its 'O' cell: walks are
        # ~L+mismatches steps while max_steps is the worst-case bound
        # (2(n+Lp)); on the in-order device queue the saved iterations
        # were blocking the NEXT chunk's drain (r5 phase dissection)
        it, row, col, chain, k, done, verdict, dirs, rows = st
        return (it < max_steps) & jnp.any(~done)

    def body(st):
        it, row, col, chain, k, done, verdict, dirs, rows = st
        c = cell(pf, row, col)
        dir_ = c & 15
        pred = c >> 4
        cx = cell(pxf, row, col)
        cy = cell(pyf, row, col)
        px_is_x = (cx & 15) == X_DIR
        py_is_y = (cy & 15) == Y_DIR
        py_pred = cy >> 4

        in_x = chain == 1
        in_y = chain == 2
        dispatch = chain == 0

        is_o = dispatch & (dir_ == O)
        done_new = done | is_o

        # chain continuation / exit
        x_cont = in_x & px_is_x
        x_exit = in_x & ~px_is_x
        y_cont = in_y & py_is_y
        y_exit = in_y & ~py_is_y

        # dispatch moves (gaf_output.rs walkers)
        is_d = dispatch & ((dir_ == D) | (dir_ == LOW_D)) & ~done_new
        is_l = dispatch & (dir_ == L_DIR) & ~done_new
        is_u = dispatch & (dir_ == U_DIR) & ~done_new
        enter_x = is_l & px_is_x & jnp.bool_(gap)
        enter_y = is_u & py_is_y & jnp.bool_(gap)
        plain_l = is_l & ~enter_x
        plain_u = is_u & ~enter_y

        emit = (~done) & (is_d | plain_l | plain_u | enter_x | enter_y
                          | x_cont | y_cont)
        code = jnp.where(is_d, dir_, 0)
        code = jnp.where(plain_l | enter_x, L_DIR, code)
        code = jnp.where(plain_u | enter_y, U_DIR, code)
        code = jnp.where(x_cont, L_DIR + CHAIN_FLAG, code)
        code = jnp.where(y_cont, U_DIR + CHAIN_FLAG, code)

        # write column `it` (an O(B) in-place dynamic_update_slice; the
        # old per-lane scatter at [bidx, k] dominated walk time) —
        # non-emitting iterations (chain exits, post-done) write the
        # HOLE code 31, compacted on the host (unpack_walk_compact)
        dirs = jax.lax.dynamic_update_slice(
            dirs, jnp.where(emit, code, HOLE)[:, None], (0, it)
        )
        rows = jax.lax.dynamic_update_slice(
            rows, jnp.where(emit, row, 0)[:, None], (0, it)
        )

        if band is not None:
            # in-walk band check: this iteration's (row, col) is the
            # replay's cell for step k (or the final 'O' cell at the
            # done transition); verdict 0=unresolved, 1=ok, 2=fail
            lefts, rights, seq_len = band
            done_tr = is_o & ~done
            at_step = emit | done_tr
            if gap:
                at_step = at_step & (
                    done_tr | ((code & CHAIN_FLAG) == 0)
                )
            left = jnp.take_along_axis(lefts, row[:, None], 1)[:, 0]
            right = jnp.take_along_axis(rights, row[:, None], 1)[:, 0]
            jrel = col - left
            acc = (row == 0) | ((jrel == 0) & (left == 0))
            fail = ((jrel == 0) & (left != 0)) | (
                (jrel == right - left - 1) & (right != seq_len)
            )
            new_v = jnp.where(acc, 1, jnp.where(fail, 2, 0))
            verdict = jnp.where(
                (verdict == 0) & at_step & (new_v != 0), new_v, verdict
            )

        col = jnp.where(is_d | plain_l | enter_x | x_cont, col - 1, col)
        row = jnp.where(is_d | plain_u, pred, row)
        row = jnp.where(enter_y | y_cont, py_pred, row)
        chain = jnp.where(enter_x, 1, jnp.where(enter_y, 2, chain))
        chain = jnp.where(x_exit | y_exit, 0, chain)
        k = k + emit.astype(jnp.int32)
        return it + 1, row, col, chain, k, done_new, verdict, dirs, rows

    z = jnp.zeros((B,), jnp.int32)
    dirs0 = jnp.full((B, max_steps), -1, jnp.int32)
    rows0 = jnp.zeros((B, max_steps), jnp.int32)
    st = (jnp.int32(0), last_row, last_col_abs, z, z,
          jnp.zeros((B,), bool), z, dirs0, rows0)
    it, row, col, chain, k, done, verdict, dirs, rows = jax.lax.while_loop(
        cond, body, st
    )
    # `it` is the used buffer extent (holes included) — the drain
    # fetches dirs/rows[:, :it] and compacts on the host
    if band is None:
        return dirs, rows, k, row, col, None, col, it
    lefts = band[0]
    qstart = col - jnp.take_along_axis(lefts, row[:, None], 1)[:, 0]
    return dirs, rows, k, row, col, verdict != 2, qstart, it


def max_walk_steps(n: int, Lp: int) -> int:
    # every emit strictly decreases row or col; chain exits add at most
    # one non-emitting iteration per chain
    return 2 * (n + Lp) + 8
