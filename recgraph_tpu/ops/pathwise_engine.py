"""Batched device kernels for pathwise modes 4/5.

The reference compresses the per-path DP into alpha-absolute +
delta-vs-alpha form to save scalar work (pathwise_alignment.rs:16-304).
Its observable semantics: at every cell, each haplotype path moves in
the direction chosen by its *group representative* path (the
"common paths" group of its predecessor edge), with tie order
mx==d, mx==u, else l.  The TPU kernel keeps dense per-path *absolute*
scores — provably the same values (the delta algebra telescopes:
q's update under the rep's direction is A[q] <- A[q, pred-cell] + inc)
— which turns the whole row into masked vector ops over the path axis.

Group metadata (rep_of/pred_of) is precompiled by
graph.pathgraph.pathwise_meta.  The in-row L-dependency is again a
(max,+) prefix chain: the rep rows are solved by the cummax trick, the
non-rep rows replay the rep's directions via a segmented chain (gather
at the last non-L column plus a cumulative-gap offset).

Layout: A is int32[B, P, n, Lp] (path-major so per-path predecessor-row
gathers are a flat take_along_axis on the fused (path, row) axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gaf import GafRecord
from ..oracle import pathwise
from ..scoring import GAP
from .encode import path_device_graph, encode_reads

NEG = -(1 << 28)


@jax.jit
def _fill_pathwise(dg, table, seq, semiglobal):
    """Dense absolute pathwise fill.

    Returns A int32[B, P, n, Lp] of per-path absolute scores (0 where a
    path does not cover a node — matching the reference's untouched
    cells, pathwise_alignment.rs:16).
    """
    n, P = dg.n, dg.paths_number
    B, Lp = seq.shape
    jcol = jnp.arange(Lp, dtype=jnp.int32)
    gseq = table[seq, GAP]                                 # [B, Lp]
    G = jnp.cumsum(gseq, axis=1)

    def step(carry, xs):
        A = carry                                          # [B, P, n, Lp]
        i, code_i, pvec, rvec, on = xs                     # [P] each
        gap_i = table[code_i, GAP]
        subrow = table[code_i][seq]                        # [B, Lp]
        p_safe = jnp.maximum(pvec, 0)
        r_safe = jnp.maximum(rvec, 0)

        Af = A.reshape(B, P * n, Lp)
        idx_qq = (jnp.arange(P, dtype=jnp.int32) * n + p_safe)  # A[q, p_q]
        idx_rq = (r_safe * n + p_safe)                          # A[r_q, p_q]
        Aq = jnp.take_along_axis(Af, idx_qq[None, :, None], axis=1)  # [B,P,Lp]
        Ar = jnp.take_along_axis(Af, idx_rq[None, :, None], axis=1)

        # rep rows via the (max,+) chain (pathwise_alignment.rs:18-304)
        Ar_sh = jnp.roll(Ar, 1, axis=2).at[:, :, 0].set(NEG)
        d_r = Ar_sh + subrow[:, None, :]
        u_r = Ar + gap_i
        first_r = jnp.where(semiglobal, 0, Ar[:, :, 0] + gap_i)  # j == 0
        Achain = jnp.maximum(d_r, u_r)
        Achain = Achain.at[:, :, 0].set(first_r)
        rep_row = G[:, None, :] + jax.lax.cummax(Achain - G[:, None, :], axis=2)

        # directions from the rep values (tie order mx==d, mx==u, else L)
        dirD = rep_row == d_r
        dirU = ~dirD & (rep_row == u_r)
        nonL = dirD | dirU | (jcol == 0)[None, None, :]

        # non-rep replay: gather at the last non-L column
        Aq_sh = jnp.roll(Aq, 1, axis=2).at[:, :, 0].set(NEG)
        vD = Aq_sh + subrow[:, None, :]
        vU = Aq + gap_i
        first_q = jnp.where(semiglobal, 0, Aq[:, :, 0] + gap_i)
        V = jnp.where(dirD, vD, vU)
        V = V.at[:, :, 0].set(first_q)
        kidx = jax.lax.cummax(jnp.where(nonL, jcol, -1), axis=2)
        Vk = jnp.take_along_axis(V, kidx, axis=2)
        Gk = jnp.take_along_axis(
            jnp.broadcast_to(G[:, None, :], V.shape), kidx, axis=2
        )
        row = Vk + G[:, None, :] - Gk
        row = jnp.where(on[None, :, None], row, 0)

        A = jax.lax.dynamic_update_slice(A, row[:, :, None, :], (0, 0, i, 0))
        return A, None

    A0 = jnp.zeros((B, P, n, Lp), dtype=jnp.int32)
    # row 0: all paths advance together with sm(seq[j], '-') gaps
    # (pathwise_alignment.rs:46-49)
    row0 = jnp.broadcast_to((G - G[:, :1])[:, None, :], (B, P, Lp))
    A0 = A0.at[:, :, 0, :].set(row0)

    rows = jnp.arange(1, n - 1, dtype=jnp.int32)
    xs = (
        rows,
        dg.codes[1 : n - 1],
        dg.pred_of[1 : n - 1],
        dg.rep_of[1 : n - 1],
        dg.paths_on[1 : n - 1],
    )
    A, _ = jax.lax.scan(step, A0, xs)
    return A


@jax.jit
def _final_column(A, L):
    """A[:, :, :, L-1] per read -> int32[B, P, n]."""
    idx = (L - 1)[:, None, None, None]
    return jnp.take_along_axis(A, idx, axis=3)[..., 0]


@jax.jit
def _extract_plane(A, best_path):
    """A[b, best_path[b], :, :] -> int32[B, n, Lp]."""
    return jnp.take_along_axis(A, best_path[:, None, None, None], axis=1)[:, 0]


def _endings_global(finalcol_b, g):
    """Mirrors final_results_global (pathwise_alignment.rs:305-325)."""
    P = g.paths_number
    results = np.zeros(P, dtype=np.int64)
    ending = np.zeros(P, dtype=np.int64)
    for pred, paths in g.preds_and_paths(g.n - 1):
        for p in np.flatnonzero(paths):
            results[p] = finalcol_b[p, pred]
            ending[p] = pred
    best_path = max(range(P), key=lambda p: (results[p], p))
    return best_path, int(ending[best_path])


def _endings_semiglobal(finalcol_b, g):
    """Mirrors best_ending_node (pathwise_alignment_semiglobal.rs:244-277)."""
    on = g.paths_nodes.T                                   # [P, n]
    vals = np.where(on, finalcol_b, np.iinfo(np.int32).min)
    per_node_best = vals.max(axis=0)                       # [n]
    per_node_path = vals.argmax(axis=0)                    # first max
    inner = per_node_best[1 : g.n - 1]
    node = 1 + int(inner.argmax())                         # first strict max
    return int(per_node_path[node]), node


def run_batch(mode, sequences, g, sm, chunk_bytes=1 << 29) -> list[GafRecord]:
    dg = path_device_graph(g)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    semiglobal = mode == 5
    n, P = dg.n, dg.paths_number
    records = []
    # chunk the batch so A = [B, P, n, Lp] stays under chunk_bytes
    Lp_all = max(len(s) for s in sequences)
    per_read = P * n * Lp_all * 4
    chunk = max(1, int(chunk_bytes // per_read))
    for c0 in range(0, len(sequences), chunk):
        chunk_seqs = sequences[c0 : c0 + chunk]
        seq, L = encode_reads(chunk_seqs, pad_to=Lp_all)
        A = _fill_pathwise(dg, table, seq, jnp.bool_(semiglobal))
        finalcol = np.asarray(jax.device_get(_final_column(A, L)))
        bps, nodes = [], []
        for b in range(len(chunk_seqs)):
            if semiglobal:
                bp, node = _endings_semiglobal(finalcol[b], g)
            else:
                bp, node = _endings_global(finalcol[b], g)
            bps.append(bp)
            nodes.append(node)
        planes = np.asarray(
            jax.device_get(_extract_plane(A, jnp.asarray(bps, dtype=jnp.int32)))
        )
        del A
        for b, s in enumerate(chunk_seqs):
            plane = planes[b][:, : len(s)]
            records.append(
                pathwise.build_alignment(
                    None, g, s, sm, bps[b], nodes[b], not semiglobal, plane=plane
                )
            )
    return records
