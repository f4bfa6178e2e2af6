"""Batched device kernels for recombination modes 8/9.

Three device phases (reference: src/pathwise_alignment_recombination.rs):

1. forward pathwise fill — reuses pathwise_engine._fill_pathwise
   (mode-4 recurrence for 8, mode-5 for 9; align :436-745);
2. reverse pathwise fill — the same group-semantics fill mirrored over
   the reverse graph (successor edges), scanning rows n-2..1 and
   columns right-to-left with suffix (max,+) chains (rev_align
   :129-435), including the reference's row-(n-1) delta quirk
   (absolute_scores stops before the last row, :747-757) and the
   never-written column 0;
3. split search — best_alignment (:759-873) as a `lax.scan` over the
   recombination column band; each step evaluates the full
   (forward node x reverse node) candidate plane
   m[i,j,fp(i)] + w[k,j,rp(k)] - (R + r*displacement[i,k]) in f32 and
   applies the reference's sequential tie rules (strict improvement, or
   equal score displaced only by the first `onedge` candidate).

Host work is only: baseline best-path selection from the forward final
column, and GAF traceback replay over two extracted score planes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.pathgraph import (
    PathGraph,
    nodes_displacement_matrix,
    pathwise_meta_rev,
)
from ..io.gaf import GafRecord
from ..oracle import recombination as rec_oracle
from ..scoring import GAP, SENTINEL
from .encode import PathDeviceGraph, path_device_graph, encode_reads
from .pathwise_engine import _fill_pathwise, _final_column, _extract_plane

NEG = -(1 << 28)
NEGF = jnp.float32(-3.0e38)


def rev_device_graph(rg: PathGraph) -> PathDeviceGraph:
    cached = rg.__dict__.get("_device_graph_rev")
    if cached is not None:
        return cached
    rep_of, pred_of = pathwise_meta_rev(rg)
    dg = PathDeviceGraph(
        codes=jnp.asarray(rg.codes, dtype=jnp.int32),
        node_start=jnp.asarray(rg.node_start),
        paths_on=jnp.asarray(rg.paths_nodes),
        alphas=jnp.asarray(rg.alphas, dtype=jnp.int32),
        rep_of=jnp.asarray(rep_of),
        pred_of=jnp.asarray(pred_of),
        n=rg.n,
        paths_number=rg.paths_number,
    )
    rg.__dict__["_device_graph_rev"] = dg
    return dg


def _suffix_cummax(x):
    return jax.lax.cummax(x[..., ::-1], axis=x.ndim - 1)[..., ::-1]


@jax.jit
def _fill_pathwise_rev(dg, table, seq, L, mode8):
    """Reverse fill over the reverse graph; returns W int32[B, P, n, Lp].

    ``seq`` is the forward '$'-prefixed read; the reverse read
    (get_rev_sequence: drop '$', append 'F') is derived on device.
    """
    n, P = dg.n, dg.paths_number
    B, Lp = seq.shape
    jcol = jnp.arange(Lp, dtype=jnp.int32)
    rev = jnp.roll(seq, -1, axis=1)
    rev = jnp.where(jcol[None, :] == (L - 1)[:, None], SENTINEL, rev)
    in_read = jcol[None, :] < L[:, None]
    gseq = jnp.where(in_read, table[rev, GAP], 0)          # [B, Lp]
    Gs = jnp.cumsum(gseq[:, ::-1], axis=1)[:, ::-1]        # suffix sums
    is_last = jcol[None, :] == (L - 1)[:, None]

    def step(carry, xs):
        A = carry
        i, code_i, pvec, rvec, on = xs
        gap_i = table[code_i, GAP]
        subrow = table[code_i][rev]
        p_safe = jnp.maximum(pvec, 0)
        r_safe = jnp.maximum(rvec, 0)

        Af = A.reshape(B, P * n, Lp)
        idx_qq = jnp.arange(P, dtype=jnp.int32) * n + p_safe
        idx_rq = r_safe * n + p_safe
        Aq = jnp.take_along_axis(Af, idx_qq[None, :, None], axis=1)
        Ar = jnp.take_along_axis(Af, idx_rq[None, :, None], axis=1)

        Ar_sh = jnp.roll(Ar, -1, axis=2).at[:, :, -1].set(NEG)
        d_r = Ar_sh + subrow[:, None, :]
        u_r = Ar + gap_i
        # restart at j == L-1: mode 8 U-only chain (:156-255), mode 9 zero
        Ar_last = jnp.take_along_axis(Ar, (L - 1)[:, None, None], axis=2)
        last_r = jnp.where(mode8, Ar_last[:, :, 0] + gap_i, 0)
        Achain = jnp.maximum(d_r, u_r)
        Achain = jnp.where(is_last[:, None, :], last_r[:, :, None], Achain)
        Achain = jnp.where(in_read[:, None, :], Achain, NEG)
        rep_row = Gs[:, None, :] + _suffix_cummax(Achain - Gs[:, None, :])

        dirD = rep_row == d_r
        dirU = ~dirD & (rep_row == u_r)
        nonL = dirD | dirU | is_last[:, None, :]

        Aq_sh = jnp.roll(Aq, -1, axis=2).at[:, :, -1].set(NEG)
        vD = Aq_sh + subrow[:, None, :]
        vU = Aq + gap_i
        Aq_last = jnp.take_along_axis(Aq, (L - 1)[:, None, None], axis=2)
        last_q = jnp.where(mode8, Aq_last[:, :, 0] + gap_i, 0)
        V = jnp.where(dirD, vD, vU)
        V = jnp.where(is_last[:, None, :], last_q[:, :, None], V)
        kneg = _suffix_cummax(jnp.where(nonL, -jcol, NEG))
        kidx = jnp.maximum(-kneg, 0)
        Vk = jnp.take_along_axis(V, kidx, axis=2)
        Gk = jnp.take_along_axis(jnp.broadcast_to(Gs[:, None, :], V.shape), kidx, axis=2)
        row = Vk + Gs[:, None, :] - Gk
        row = jnp.where(on[None, :, None], row, 0)
        row = jnp.where(in_read[:, None, :], row, 0)
        row = row.at[:, :, 0].set(0)                      # column 0 never written
        A = jax.lax.dynamic_update_slice(A, row[:, :, None, :], (0, 0, i, 0))
        return A, None

    A0 = jnp.zeros((B, P, n, Lp), dtype=jnp.int32)
    # row n-1: all paths carry the suffix gap chain (rev_align :76-79);
    # column 0 and padding stay 0
    rown1 = jnp.where((jcol[None, :] > 0) & in_read, Gs, 0)
    A0 = A0.at[:, :, n - 1, :].set(rown1[:, None, :])

    rows = jnp.arange(n - 2, 0, -1, dtype=jnp.int32)
    sl = slice(n - 2, 0, -1)
    xs = (rows, dg.codes[sl], dg.pred_of[sl], dg.rep_of[sl], dg.paths_on[sl])
    A, _ = jax.lax.scan(step, A0, xs)
    # row n-1 delta quirk: only the alpha (path 0) plane keeps the chain
    A = A.at[:, 1:, n - 1, :].set(0)
    return A


@jax.jit
def _path_argmax(A):
    """Per-cell best path over ALL P planes; larger path id wins ties.

    Mirrors best_alignment's reversed argmax (:809-830).
    """
    P = A.shape[1]
    rev = A[:, ::-1]
    arg = (P - 1) - rev.argmax(axis=1).astype(jnp.int32)   # [B, n, Lp]
    mx = A.max(axis=1)
    return mx, arg


def _split_search_fn(I):
    @jax.jit
    def run(fmax, farg, vf, rmax, rarg, vr, penalty, diff_node, onedge,
            active, init_best):
        """Sequential column scan of best_alignment (:803-860).

        fmax/farg/vf: int32/int32/bool [B, I, Lp] over interior rows;
        penalty f32[I, I]; active bool[B, Lp]; init_best f32[B].
        Returns (best f32[B], taken bool[B], fen, rsn, fp, rp, rec_col).
        """
        B, _, Lp = fmax.shape

        def step(carry, j):
            best, edge_state, taken, fen, rsn, fp, rp, col = carry
            fv = fmax[:, :, j].astype(jnp.float32)          # [B, I]
            rv = rmax[:, :, j].astype(jnp.float32)
            cand = fv[:, :, None] + rv[:, None, :] - penalty[None]
            valid = (
                diff_node[None]
                & (farg[:, :, j][:, :, None] != rarg[:, :, j][:, None, :])
                & vf[:, :, j][:, :, None]
                & vr[:, :, j][:, None, :]
            )
            cand_v = jnp.where(valid, cand, NEGF).reshape(B, I * I)
            col_max = cand_v.max(axis=1)
            at_max = cand_v == col_max[:, None]
            at_edge = at_max & onedge.reshape(1, I * I)
            edge_any = at_edge.any(axis=1)
            flat_edge = at_edge.argmax(axis=1)
            flat_plain = at_max.argmax(axis=1)
            gt = col_max > best
            eq = col_max == best
            take = active[:, j] & (gt | (eq & ~edge_state & edge_any))
            use_edge = jnp.where(gt, edge_any, True)
            flat = jnp.where(use_edge, flat_edge, flat_plain)
            ii = (flat // I).astype(jnp.int32)
            kk = (flat % I).astype(jnp.int32)
            best = jnp.where(take, col_max, best)
            edge_state = jnp.where(take, use_edge, edge_state)
            taken = taken | take
            fen = jnp.where(take, ii + 1, fen)
            rsn = jnp.where(take, kk + 1, rsn)
            fp = jnp.where(take, jnp.take_along_axis(farg[:, :, j], ii[:, None], 1)[:, 0], fp)
            rp = jnp.where(take, jnp.take_along_axis(rarg[:, :, j], kk[:, None], 1)[:, 0], rp)
            col = jnp.where(take, j, col)
            return (best, edge_state, taken, fen, rsn, fp, rp, col), None

        z = jnp.zeros((B,), jnp.int32)
        carry = (
            init_best,
            jnp.zeros((B,), bool),
            jnp.zeros((B,), bool),
            z, z, z, z, z,
        )
        carry, _ = jax.lax.scan(step, carry, jnp.arange(1, Lp - 1))
        best, edge_state, taken, fen, rsn, fp, rp, col = carry
        return best, taken, fen, rsn, fp, rp, col

    return run


_split_cache: dict[int, object] = {}


def _baseline(mode, finalcol_b, g):
    """No-recombination best score/path (:777-800); first-max tie order."""
    mx = None
    best_path = 0
    if mode == 8:
        for pred, paths in g.preds_and_paths(g.n - 1):
            for path in np.flatnonzero(paths):
                v = finalcol_b[path, pred]
                if mx is None or mx < v:
                    mx = v
                    best_path = int(path)
    else:
        for i in range(g.n - 1):
            for path in range(g.paths_number):
                if g.paths_nodes[i, path]:
                    v = finalcol_b[path, i]
                    if mx is None or mx < v:
                        mx = v
                        best_path = int(path)
    return np.float32(mx), best_path


def run_batch(
    mode, sequences, g, rg, sm, base_rec_cost, multi_rec_cost, rbw,
    chunk_bytes=1 << 29,
) -> list[GafRecord]:
    dg = path_device_graph(g)
    dgr = rev_device_graph(rg)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    n, P = dg.n, dg.paths_number
    I = n - 2

    # displacement penalty plane (pathwise_graph.rs:284-305) and the
    # onedge/diff-node candidate masks (:837,:845-852)
    dms = nodes_displacement_matrix(g, rg)
    ids = g.nodes_id_pos
    interior = np.arange(1, n - 1)
    penalty = (
        np.float32(base_rec_cost)
        + np.float32(multi_rec_cost) * dms[1 : n - 1, 1 : n - 1].astype(np.float32)
    )
    fw_edge = ids[interior] != ids[interior + 1]
    rv_edge = ids[interior] != ids[interior - 1]
    onedge = jnp.asarray(fw_edge[:, None] & rv_edge[None, :])
    diff_node = jnp.asarray(ids[interior][:, None] != ids[interior][None, :])
    penalty = jnp.asarray(penalty)
    paths_on = jnp.asarray(g.paths_nodes)

    split = _split_cache.get(I)
    if split is None:
        split = _split_search_fn(I)
        _split_cache[I] = split

    records: list[GafRecord] = []
    Lp_all = max(len(s) for s in sequences)
    per_read = P * n * Lp_all * 4 * 2
    chunk = max(1, int(chunk_bytes // per_read))
    for c0 in range(0, len(sequences), chunk):
        chunk_seqs = sequences[c0 : c0 + chunk]
        B = len(chunk_seqs)
        seq, L = encode_reads(chunk_seqs, pad_to=Lp_all)
        Af = _fill_pathwise(dg, table, seq, jnp.bool_(mode == 9))
        Ar = _fill_pathwise_rev(dgr, table, seq, L, jnp.bool_(mode == 8))

        finalcol = np.asarray(jax.device_get(_final_column(Af, L)))
        init_best = np.zeros(B, dtype=np.float32)
        base_paths = np.zeros(B, dtype=np.int32)
        for b in range(B):
            init_best[b], base_paths[b] = _baseline(mode, finalcol[b], g)

        fmax, farg = _path_argmax(Af)
        rmax, rarg = _path_argmax(Ar)
        vf = jnp.take_along_axis(
            jnp.broadcast_to(paths_on[None], (B, n, P)), farg, axis=2
        )
        vr = jnp.take_along_axis(
            jnp.broadcast_to(paths_on[None], (B, n, P)), rarg, axis=2
        )
        jcol = np.arange(Lp_all)
        Lnp = np.asarray(jax.device_get(L))
        oob = np.maximum((Lnp * (1.0 - rbw) / 2.0).astype(np.int64), 1)
        active = jnp.asarray(
            (jcol[None, :] >= oob[:, None]) & (jcol[None, :] < (Lnp - oob)[:, None])
        )
        best, taken, fen, rsn, fp, rp, rec_col = (
            np.asarray(jax.device_get(x))
            for x in split(
                fmax[:, 1 : n - 1], farg[:, 1 : n - 1], vf[:, 1 : n - 1],
                rmax[:, 1 : n - 1], rarg[:, 1 : n - 1], vr[:, 1 : n - 1],
                penalty, diff_node, onedge, active,
                jnp.asarray(init_best),
            )
        )

        fp_final = np.where(taken, fp, base_paths)
        rp_final = np.where(taken, rp, base_paths)
        fplanes = np.asarray(
            jax.device_get(_extract_plane(Af, jnp.asarray(fp_final, jnp.int32)))
        )
        rplanes = np.asarray(
            jax.device_get(_extract_plane(Ar, jnp.asarray(rp_final, jnp.int32)))
        )
        del Af, Ar
        for b, s in enumerate(chunk_seqs):
            Lb = len(s)
            fplane = fplanes[b][:, :Lb]
            if fp_final[b] == rp_final[b]:
                bp = int(fp_final[b])
                if mode == 8:
                    end_node = 0
                    for node, paths in g.preds_and_paths(g.n - 1):
                        if paths[bp]:
                            end_node = node
                    records.append(
                        rec_oracle._gaf_no_rec(
                            fplane, g, s, sm, bp, end_node, global_tail=True
                        )
                    )
                else:
                    vals = finalcol[b, bp, 1 : g.n - 1].astype(np.int64)
                    covered = g.paths_nodes[1 : g.n - 1, bp]
                    vals = np.where(covered, vals, np.iinfo(np.int64).min)
                    end_node = 1 + int(vals.argmax())
                    records.append(
                        rec_oracle._gaf_no_rec(
                            fplane, g, s, sm, bp, end_node, global_tail=False
                        )
                    )
            else:
                rplane = rplanes[b][:, :Lb]
                records.append(
                    rec_oracle._gaf_rec(
                        fplane, rplane, g, rg, s, sm,
                        int(fp_final[b]), int(rp_final[b]),
                        int(fen[b]), int(rsn[b]), int(rec_col[b]),
                        (float(best[b]), int(dms[fen[b], rsn[b]])),
                        global_mode=(mode == 8),
                    )
                )
    return records
