"""SIMD-semantics oracle for modes 0/1 (the reference's AVX2 path).

On any AVX2-capable x86 host the reference binary dispatches modes 0/1
to ``exec_simd`` (main.rs:58,110), whose observable semantics diverge
from the scalar ``exec`` that the primary oracle (oracle/poa.py) and
the production engines target.  This module is a literal port of that
second semantics so the equality target is pinned *per binary path*,
not just per mode (SURVEY §7.1.3).  Ports:

- mode 0: global_abpoa::exec_simd    (global_abpoa.rs:9-257)
- mode 1: local_poa::exec_simd       (local_poa.rs:9-179)
- GAF:    gaf_of_global_abpoa_simd   (gaf_output.rs:755-861)
          gaf_of_local_poa_simd      (gaf_output.rs:639-753)

Divergences from the scalar path (each cited, each reproduced here):

1. **D/U tie goes to U.**  The vector compare is strict greater
   (``_CMP_GT_OS``, global_abpoa.rs:107,143 / local_poa.rs:50,83):
   on d == u the scalar path picks D (utils::get_max_d_u_l), the SIMD
   path keeps U.  The non-multiple-of-8 scalar *tail* inside exec_simd
   uses the ``m == d`` cascade instead (D wins ties,
   global_abpoa.rs:168-224 / local_poa.rs:112-173), so tie semantics
   differ *within one row* depending on the column's block.
2. **Full-width f32 rows.**  Mode 0 SIMD keeps full-length rows
   initialised to ``2·L·gap`` (global_abpoa.rs:20-21) instead of banded
   storage with out-of-band fallback formulas; the band (widened to a
   multiple of 8, utils.rs:74-98) only limits which columns are
   *computed*.  Out-of-band predecessor reads see the init value, not
   the scalar path's ``gap·(i+j+left)`` fallbacks.
3. **Column 0 is always computed** from the *minimum-index* predecessor
   (global_abpoa.rs:36-46), where the scalar path only fills it when
   ``left == 0``.
4. **f32 path encoding.**  Traceback cells are ``pred + 0.1/0.2/0.3``
   f32 (D/U/L); the emitters decode by formatting the float and
   splitting on '.' (gaf_output.rs:664-669,777-786).  Reproduced
   literally, including the shortest-round-trip formatting.
5. **Band escape emits an empty GAF** (``GAFStruct::new()`` plus a
   *stdout* "band not enough for correct output" line,
   gaf_output.rs:855-858) instead of the scalar path's best-effort GAF
   with a stdout warning.
6. **Local zero clamp asymmetry**: SIMD blocks clamp at ``<= 0``
   (resetting the path cell, local_poa.rs:105-108); the scalar tail
   clamps at ``< 0`` and *start-node tail cells are never clamped*
   (local_poa.rs:126-129 vs the missing clamp in the :130-167 branch).
7. **Mode 1 residue_matches counts every diagonal step** (mismatches
   included, gaf_output.rs:691-697); the scalar emitter counts only
   matches.  Mode 1 SIMD also has no 'd' code: M runs merge matches
   and mismatches.
8. **Local L-block gap uses the block-start character**
   (``read[j]`` at local_poa.rs:98 / global_abpoa.rs:156 where j is
   the 8-block start) — unobservable because every ``(c,'-')`` entry
   is equal by construction (score_matrix.rs:41-42,99-102), but kept
   literal here.

All DP arithmetic is f32; every intermediate is an integer of
magnitude << 2^24, so f32 adds/maxes are exact and the port is
bit-faithful by construction.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..graph.poagraph import PoaGraph, set_ampl_for_row
from ..io.gaf import GafRecord
from ..scoring import GAP, ScoreMatrix, encode
from .gaf_emit import _dedup, build_cigar, node_start, set_cigar_substring

F32 = np.float32
_D_MOVE = F32(0.1)
_U_MOVE = F32(0.2)
_L_MOVE = F32(0.3)


@dataclass
class SimdState:
    score: float                 # f32 best score (integral in practice)
    pathv: np.ndarray            # f32[n, L] packed pred.dir cells
    last_row: int
    last_col: int


def _set_left_right_x64(left: int, right: int, seq_len: int) -> tuple[int, int]:
    """Widen the band to a multiple of 8; mirrors utils.rs:74-98."""
    while (right - left) % 8 != 0:
        if (right - left) % 2 == 0 and right < seq_len:
            right += 1
        elif left > 0:
            left -= 1
        else:
            break
    if left == 0:
        while (right - 1) % 8 != 0 and right < seq_len:
            right += 1
    if right == seq_len:
        while (right - left) % 8 != 0 and left > 1:
            left -= 1
    return left, right


def _ampl_simd(i, p_arr, r_val, bsp, seq_len, bta) -> tuple[int, int]:
    left, right = set_ampl_for_row(i, p_arr, r_val, bsp, seq_len, bta)
    return _set_left_right_x64(left, right, seq_len)


def _decode(val: F32) -> tuple[int, int]:
    """(pred, dir) from a packed f32 cell via the reference's
    format-and-split-on-'.' decode (gaf_output.rs:664-669)."""
    s = np.format_float_positional(F32(val), unique=True, trim="0")
    pred_s, dir_s = s.split(".")
    return int(pred_s), int(dir_s)


# ---------------------------------------------------------------------------
# mode 0 — global POA, SIMD semantics (global_abpoa.rs:9-257)
# ---------------------------------------------------------------------------


def global_simd(seq: str, g: PoaGraph, sm: ScoreMatrix, bta: int) -> SimdState:
    lnz = g.lnz
    n = g.n
    L = len(seq)
    r_values = g.r_values()

    sub = np.asarray(sm.table, dtype=F32)  # sub[lnz, read]
    gap = sub[:, GAP]
    seq_codes = encode(seq).astype(np.int32)
    lnz_codes = encode(lnz).astype(np.int32)

    min_score = F32(2) * F32(L) * F32(sm.get(seq[1], "-"))
    m = np.full((n, L), min_score, dtype=F32)
    pathv = np.full((n, L), F32(-1.0), dtype=F32)

    bsp = [0] * n

    # base cases (global_abpoa.rs:34-62)
    m[0, 0] = F32(0)
    pathv[0, 0] = F32(0.0)
    for i in range(1, n - 1):
        best_p = i - 1 if not g.node_start[i] else min(g.preds[i])
        m[i, 0] = m[best_p, 0] + gap[lnz_codes[i]]
        pathv[i, 0] = F32(best_p) + _U_MOVE
    left0, right0 = _ampl_simd(0, [], int(r_values[0]), bsp, L, bta)
    for j in range(1, right0):
        m[0, j] = m[0, j - 1] + gap[seq_codes[j]]
        pathv[0, j] = _L_MOVE
    ampl0 = (left0, right0)

    for i in range(1, n - 1):
        p_arr = g.preds[i] if g.node_start[i] else []
        left, right = _ampl_simd(i, p_arr, int(r_values[i]), bsp, L, bta)
        best_col = left
        start = 1 if left == 0 else left
        if right == L:
            end = ((right - start) // 8) * 8 + start
        else:
            end = right

        ci = int(lnz_codes[i])
        us_update = gap[ci]
        if end > start:
            cols = np.arange(start, end)
            ds_update = sub[ci, seq_codes[cols]]
            if not g.node_start[i]:
                us = m[i - 1, cols] + us_update
                ds = m[i - 1, cols - 1] + ds_update
                u_pred = np.full(cols.shape, i - 1, dtype=np.int64)
                d_pred = u_pred
            else:
                preds = g.preds[i]
                best_us = m[preds[0], cols].copy()
                best_ds = m[preds[0], cols - 1].copy()
                u_pred = np.full(cols.shape, preds[0], dtype=np.int64)
                d_pred = u_pred.copy()
                for p in preds[1:]:
                    cu = m[p, cols]
                    cd = m[p, cols - 1]
                    tu = cu > best_us
                    best_us = np.where(tu, cu, best_us)
                    u_pred = np.where(tu, p, u_pred)
                    td = cd > best_ds
                    best_ds = np.where(td, cd, best_ds)
                    d_pred = np.where(td, p, d_pred)
                us = best_us + us_update
                ds = best_ds + ds_update
            take_d = ds > us  # strict: ties go to U (divergence 1)
            m[i, cols] = np.where(take_d, ds, us)
            pathv[i, cols] = np.where(
                take_d, d_pred.astype(F32) + _D_MOVE, u_pred.astype(F32) + _U_MOVE
            )
            # left fix-up per 8-block; gap char = block start (divergence 8)
            for jb in range(start, end, 8):
                lgap = gap[seq_codes[jb]]
                for idx in range(jb, jb + 8):
                    lval = m[i, idx - 1] + lgap
                    if lval > m[i, idx]:
                        m[i, idx] = lval
                        pathv[i, idx] = F32(i) + _L_MOVE
                    if m[i, idx] >= m[i, best_col]:
                        best_col = idx
        # scalar tail (global_abpoa.rs:168-224): D >= U >= L cascade
        for j in range(end, right):
            if not g.node_start[i]:
                lv = m[i, j - 1] + gap[seq_codes[j]]
                uv = m[i - 1, j] + us_update
                dv = m[i - 1, j - 1] + sub[ci, seq_codes[j]]
                best = max(lv, uv, dv)
                m[i, j] = best
                if best == dv:
                    pathv[i, j] = F32(i - 1) + _D_MOVE
                elif best == uv:
                    pathv[i, j] = F32(i - 1) + _U_MOVE
                else:
                    pathv[i, j] = F32(i) + _L_MOVE
            else:
                u = d = F32(0)
                u_pred = d_pred = 0
                first = True
                for p in g.preds[i]:
                    if first:
                        u, d, u_pred, d_pred = m[p, j], m[p, j - 1], p, p
                        first = False
                    if m[p, j] > u:
                        u, u_pred = m[p, j], p
                    if m[p, j - 1] > d:
                        d, d_pred = m[p, j - 1], p
                u = u + us_update
                d = d + sub[seq_codes[j], ci]  # (read, lnz) order, :206
                lv = m[i, j - 1] + gap[seq_codes[j]]
                best = max(lv, u, d)
                m[i, j] = best
                if best == d:
                    pathv[i, j] = F32(d_pred) + _D_MOVE
                elif best == u:
                    pathv[i, j] = F32(u_pred) + _U_MOVE
                else:
                    pathv[i, j] = F32(i) + _L_MOVE
            if m[i, j] >= m[i, best_col]:
                best_col = j
        bsp[i] = best_col
    del ampl0

    best_result = F32(0)
    first = True
    last_row = 0
    for p in g.preds[n - 1]:
        if first:
            best_result, last_row, first = m[p, L - 1], p, False
        if m[p, L - 1] > best_result:
            best_result, last_row = m[p, L - 1], p
    return SimdState(float(best_result), pathv, last_row, L - 1)


# ---------------------------------------------------------------------------
# mode 1 — local POA, SIMD semantics (local_poa.rs:9-179)
# ---------------------------------------------------------------------------


def local_simd(seq: str, g: PoaGraph, sm: ScoreMatrix) -> SimdState:
    lnz = g.lnz
    n = g.n
    L = len(seq)

    sub = np.asarray(sm.table, dtype=F32)
    gap = sub[:, GAP]
    seq_codes = encode(seq).astype(np.int32)
    lnz_codes = encode(lnz).astype(np.int32)

    m = np.zeros((n, L), dtype=F32)
    pathv = np.zeros((n, L), dtype=F32)

    max_multiple = (L // 8) * 8 if L % 8 != 0 else L - 8
    best_row = best_col = 0

    for i in range(1, n - 1):
        ci = int(lnz_codes[i])
        us_update = gap[ci]
        end = max_multiple + 1
        if end > 1:
            cols = np.arange(1, end)
            ds_update = sub[ci, seq_codes[cols]]
            if not g.node_start[i]:
                us = m[i - 1, cols] + us_update
                ds = m[i - 1, cols - 1] + ds_update
                u_pred = np.full(cols.shape, i - 1, dtype=np.int64)
                d_pred = u_pred
            else:
                preds = g.preds[i]
                best_us = m[preds[0], cols].copy()
                best_ds = m[preds[0], cols - 1].copy()
                u_pred = np.full(cols.shape, preds[0], dtype=np.int64)
                d_pred = u_pred.copy()
                for p in preds[1:]:
                    cu = m[p, cols]
                    cd = m[p, cols - 1]
                    tu = cu > best_us
                    best_us = np.where(tu, cu, best_us)
                    u_pred = np.where(tu, p, u_pred)
                    td = cd > best_ds
                    best_ds = np.where(td, cd, best_ds)
                    d_pred = np.where(td, p, d_pred)
                us = best_us + us_update
                ds = best_ds + ds_update
            take_d = ds > us  # ties go to U (divergence 1)
            m[i, cols] = np.where(take_d, ds, us)
            pathv[i, cols] = np.where(
                take_d, d_pred.astype(F32) + _D_MOVE, u_pred.astype(F32) + _U_MOVE
            )
            # fix-up: L, zero clamp (<= 0), best (>=) — local_poa.rs:96-111
            row = m[i]
            prow = pathv[i]
            for jb in range(1, end, 8):
                lgap = gap[seq_codes[jb]]
                for idx in range(jb, min(jb + 8, L)):
                    lval = row[idx - 1] + lgap
                    if lval > row[idx]:
                        row[idx] = lval
                        prow[idx] = F32(i) + _L_MOVE
                    if row[idx] <= 0:
                        row[idx] = F32(0)
                        prow[idx] = F32(0)
                    if row[idx] >= m[best_row, best_col]:
                        best_row, best_col = i, idx
        # scalar tail (local_poa.rs:112-173)
        for j in range(max_multiple + 1, L):
            if not g.node_start[i]:
                lv = m[i, j - 1] + gap[seq_codes[j]]
                uv = m[i - 1, j] + us_update
                dv = m[i - 1, j - 1] + sub[ci, seq_codes[j]]
                best = max(lv, uv, dv)
                m[i, j] = best
                if best < 0:
                    m[i, j] = F32(0)
                    pathv[i, j] = F32(0)
                elif best == dv:
                    pathv[i, j] = F32(i - 1) + _D_MOVE
                elif best == uv:
                    pathv[i, j] = F32(i - 1) + _U_MOVE
                else:
                    pathv[i, j] = F32(i) + _L_MOVE
            else:
                # no zero clamp in this branch (divergence 6)
                u = d = F32(0)
                u_pred = d_pred = 0
                first = True
                for p in g.preds[i]:
                    if first:
                        u, d, u_pred, d_pred = m[p, j], m[p, j - 1], p, p
                        first = False
                    if m[p, j] > u:
                        u, u_pred = m[p, j], p
                    if m[p, j - 1] > d:
                        d, d_pred = m[p, j - 1], p
                u = u + us_update
                d = d + sub[seq_codes[j], ci]
                lv = m[i, j - 1] + gap[seq_codes[j]]
                best = max(lv, u, d)
                m[i, j] = best
                if best == d:
                    pathv[i, j] = F32(d_pred) + _D_MOVE
                elif best == u:
                    pathv[i, j] = F32(u_pred) + _U_MOVE
                else:
                    pathv[i, j] = F32(i) + _L_MOVE
            if m[i, j] >= m[best_row, best_col]:
                best_row, best_col = i, j
    return SimdState(float(m[best_row, best_col]), pathv, best_row, best_col)


# ---------------------------------------------------------------------------
# GAF emitters (gaf_output.rs:639-861)
# ---------------------------------------------------------------------------


def _fmt_f32(v: float) -> str:
    """Rust f32 Display: no trailing .0 on integral values."""
    if v == int(v):
        return str(int(v))
    return np.format_float_positional(F32(v), unique=True, trim="0")


def gaf_of_local_poa_simd(
    st: SimdState, sequence: str, seq_name: str, amb_mode: bool, hofp: list[str]
) -> GafRecord:
    """Mirrors gaf_of_local_poa_simd (gaf_output.rs:639-753)."""
    pathv = st.pathv
    col, row = st.last_col, st.last_row

    handle_id_alignment: list[str] = []
    cigars: list[str] = []
    cigar = ""
    count_m = count_i = count_d = 0
    curr_handle = ""
    last_dir = -1
    path_length = 0
    residue_matching = 0

    while pathv[row][col] != 0.0:
        pred, direction = _decode(pathv[row][col])
        if hofp[row] != curr_handle:
            cigar = set_cigar_substring(count_m, count_i, count_d, cigar)
            cigars.insert(0, cigar)
            cigar = ""
            count_m = count_i = count_d = 0
        curr_handle = hofp[row]
        if direction != last_dir:
            cigar = set_cigar_substring(count_m, count_i, count_d, cigar)
            count_m = count_i = count_d = 0
        last_dir = direction

        if direction == 1:
            handle_id_alignment.append(hofp[row])
            row, col = pred, col - 1
            count_m += 1
            path_length += 1
            residue_matching += 1  # counts mismatches too (divergence 7)
        elif direction == 3:
            col -= 1
            count_d += 1
        elif direction == 2:
            handle_id_alignment.append(hofp[row])
            row = pred
            count_i += 1
            path_length += 1
        else:
            raise RuntimeError("impossible value in poa path")
    cigar = set_cigar_substring(count_m, count_i, count_d, cigar)
    cigars.insert(0, cigar)

    handle_id_alignment = _dedup(handle_id_alignment)
    handle_id_alignment.reverse()

    return GafRecord(
        query_name=seq_name,
        query_length=len(sequence) - 1,
        query_start=col,
        query_end=st.last_col,
        strand="-" if amb_mode else "+",
        path=[int(h) for h in handle_id_alignment],
        path_length=path_length,
        path_start=node_start(hofp, row),
        path_end=node_start(hofp, st.last_row),
        residue_matches_number=residue_matching,
        alignment_block_length="*",
        mapping_quality="*",
        comments=",".join(cigars[:-1]),
    )


def gaf_of_global_abpoa_simd(
    st: SimdState,
    sequence: str,
    seq_name: str,
    amb_mode: bool,
    hofp: list[str],
    lnz: str,
) -> GafRecord:
    """Mirrors gaf_of_global_abpoa_simd (gaf_output.rs:755-861).

    On band escape (an uncomputed -1 cell is reached) prints the
    reference's *stdout* diagnostic and returns an empty GAFStruct.
    """
    pathv = st.pathv
    col, row = st.last_col, st.last_row

    handle_id_alignment: list[str] = []
    cigar: list[str] = []
    path_length = 0
    residue_matching = 0
    out_ok = True
    path_sequence: list[str] = []

    while pathv[row][col] != 0.0:
        val = pathv[row][col]
        if val == F32(-1.0):
            out_ok = False
            break
        pred, direction = _decode(val)
        if direction == 1:
            handle_id_alignment.append(hofp[row])
            path_sequence.append(lnz[row])
            row, col = pred, col - 1
            # char compare happens AFTER the move (gaf_output.rs:794-800)
            cigar.append("D" if lnz[row] == sequence[col] else "d")
            path_length += 1
            residue_matching += 1
        elif direction == 3:
            col -= 1
            cigar.append("L")
        elif direction == 2:
            handle_id_alignment.append(hofp[row])
            path_sequence.append(lnz[row])
            row = pred
            cigar.append("U")
            path_length += 1
        else:
            raise RuntimeError("impossible value in poa path")

    if not out_ok:
        print("band not enough for correct output")
        return GafRecord()

    cigar.reverse()
    cigar_out = build_cigar(cigar)
    path_sequence.reverse()
    handle_id_alignment = _dedup(handle_id_alignment)
    handle_id_alignment.reverse()

    return GafRecord(
        query_name=seq_name,
        query_length=len(sequence) - 1,
        query_start=col,
        query_end=st.last_col,
        strand="-" if amb_mode else "+",
        path=[int(h) for h in handle_id_alignment],
        path_length=path_length,
        path_start=node_start(hofp, row),
        path_end=node_start(hofp, st.last_row),
        residue_matches_number=residue_matching,
        alignment_block_length="*",
        mapping_quality="*",
        comments=f"{cigar_out}, score: {_fmt_f32(st.score)}\t"
        + "".join(path_sequence),
    )
