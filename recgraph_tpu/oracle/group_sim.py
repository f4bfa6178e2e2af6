"""Independent group-decision simulator for the pathwise DP family.

**Not a port.**  The reference (pathwise_alignment.rs and friends) and
our oracle both use the alpha/delta compression: per node a
representative path ("alpha") stores an absolute score, every other
path stores a delta, and node-start cells juggle per-predecessor
``temp_alpha`` rebasing plus the multi-alpha merge fixup
(pathwise_alignment.rs:233-299).  A transcription error reproduced on
both sides would be invisible to tests that compare the two.

This module re-expresses the *observable* semantics from first
principles, with none of that machinery: plain **absolute** scores and
an explicit **group-follower** rule.

Semantics (derived from pathwise_alignment.rs:5-304, re-checked against
pathwise_alignment_recombination.rs:129-435 for the reverse fill):

- At cell (i, j), the paths covering node-row i are partitioned into
  *groups*: one per predecessor edge (paths(i) AND edge-paths), or a
  single group paths(i) for within-node rows.
- Each group elects a representative r: the predecessor row's alpha if
  it is in the group, else the current node's alpha if in the group,
  else the lowest-numbered group member (the ``temp_alpha`` rule,
  pathwise_alignment.rs:237-241).
- The representative alone makes the D/U/L decision on its own
  absolute scores, with follower tie order D >= U >= L (the ``== d``
  / ``== u`` cascade at :144-151 — the Rust ``max`` of [d,u,l] itself
  is last-max, but only the cascade is observable).
- Every follower q in the group inherits the representative's move:
    abs[i][j][q] = rep_best + (abs[src][q] - abs[src][r])
  where src is the source cell of the chosen move.  Followers do NOT
  make their own choices — this is what makes the compression lossy
  and the semantics non-obvious.
- The delta/merge fixups of the reference are exactly the bookkeeping
  needed to represent this rule with one absolute slot per node; they
  cancel out here.

Equality of this simulator with the oracle's delta-form fill (converted
to absolutes) over all covered (i, j, path) cells is therefore an
independent check of the whole alpha/delta implementation, on general
graphs where paths share nodes (the case the brute-force checker cannot
cover exactly).  See tests/test_group_semantics.py.
"""

from __future__ import annotations

import numpy as np

from ..graph.pathgraph import PathGraph
from ..scoring import ScoreMatrix

# Uncovered (node, path) slots never hold a meaningful value; keep them
# at a poison value so any accidental read corrupts loudly.
POISON = np.int64(-(10**15))


def _groups(g: PathGraph, i: int) -> list[tuple[int, np.ndarray, int]]:
    """[(pred_row, member_mask, representative)] for node-row i."""
    pn = g.paths_nodes
    alphas = g.alphas
    if not g.node_start[i]:
        common = pn[i] & pn[i - 1]
        # within a node the path set and alpha are constant, so the
        # pred row's alpha is always a member (the reference's
        # ``!common[ap]`` branch is unreachable here)
        return [(i - 1, common, alphas[i - 1])]
    out = []
    for p, p_paths in g.preds_and_paths(i):
        common = pn[i] & p_paths
        if not common.any():
            continue
        ap = alphas[p]
        if ap < g.paths_number and common[ap]:
            r = ap
        elif common[alphas[i]]:
            r = alphas[i]
        else:
            r = int(np.flatnonzero(common)[0])
        out.append((p, common, r))
    return out


def fill_abs(seq: str, g: PathGraph, sm: ScoreMatrix, semiglobal: bool) -> np.ndarray:
    """Absolute per-path DP via explicit group simulation (forward).

    Returns int64[n, L, P]; uncovered slots hold POISON.  Covered slots
    must equal oracle.pathwise.absolute(oracle.pathwise.fill(...)).
    """
    lnz = g.lnz
    n = g.n
    L = len(seq)
    P = g.paths_number
    pn = g.paths_nodes

    A = np.full((n, L, P), POISON, dtype=np.int64)

    cov0 = pn[0]
    A[0, 0, cov0] = 0
    for j in range(1, L):
        A[0, j, cov0] = A[0, j - 1, cov0] + sm.get(seq[j], "-")

    for i in range(1, n - 1):
        gap_i = sm.get(lnz[i], "-")
        groups = _groups(g, i)
        if semiglobal:
            A[i, 0, pn[i]] = 0
        else:
            for p, members, r in groups:
                rep_best = A[p, 0, r] + gap_i
                A[i, 0, members] = rep_best + (A[p, 0, members] - A[p, 0, r])
        for j in range(1, L):
            sub = sm.get(lnz[i], seq[j])
            gap_j = sm.get(seq[j], "-")
            for p, members, r in groups:
                d = A[p, j - 1, r] + sub
                u = A[p, j, r] + gap_i
                l = A[i, j - 1, r] + gap_j
                best = max(d, u, l)
                if best == d:
                    src_i, src_j = p, j - 1
                elif best == u:
                    src_i, src_j = p, j
                else:
                    src_i, src_j = i, j - 1
                A[i, j, members] = best + (A[src_i, src_j, members] - A[src_i, src_j, r])
    return A


def final_global(A: np.ndarray, g: PathGraph) -> tuple[np.ndarray, int]:
    """(per-path final scores, best path) — mode-4 ending over F's pred
    edges (pathwise_alignment.rs:305-325), on absolute scores."""
    P = g.paths_number
    results = np.zeros(P, dtype=np.int64)
    last = A.shape[1] - 1
    for pred, paths in g.preds_and_paths(g.n - 1):
        for path in np.flatnonzero(paths):
            results[path] = A[pred, last, path]
    best_path = max(range(P), key=lambda p: (results[p], p))
    return results, best_path


def best_ending_semiglobal(A: np.ndarray, g: PathGraph) -> tuple[int, int, int]:
    """(node, path, score) — mode-5 ending scan
    (pathwise_alignment_semiglobal.rs:244-277) on absolute scores:
    first-max over paths within a node, first-max over nodes."""
    mx = None
    ending_node = chosen_path = 0
    last = A.shape[1] - 1
    for i in range(1, g.n - 1):
        best = None
        for path in np.flatnonzero(g.paths_nodes[i]):
            s = A[i, last, path]
            if best is None or best[0] < s:
                best = (s, int(path))
        if mx is None or best[0] > mx:
            mx, ending_node, chosen_path = best[0], i, best[1]
    return ending_node, chosen_path, int(mx)


# ---------------------------------------------------------------------------
# reverse fill (modes 8/9's second DP over the reverse graph)
# ---------------------------------------------------------------------------


def _groups_rev(rg: PathGraph, i: int) -> list[tuple[int, np.ndarray, int]]:
    """Groups for the reverse fill: predecessors are successors (rows
    > i) of the reverse graph; within-node rows follow row i+1."""
    pn = rg.paths_nodes
    alphas = rg.alphas
    if not rg.node_start[i]:
        return [(i + 1, pn[i] & pn[i + 1], alphas[i + 1])]
    out = []
    for p, p_paths in rg.preds_and_paths(i):
        common = pn[i] & p_paths
        if not common.any():
            continue
        ap = alphas[p]
        if ap < rg.paths_number and common[ap]:
            r = ap
        elif common[alphas[i]]:
            r = alphas[i]
        else:
            r = int(np.flatnonzero(common)[0])
        out.append((p, common, r))
    return out


def fill_abs_rev(
    rev_seq: str, rg: PathGraph, sm: ScoreMatrix, semiglobal: bool
) -> np.ndarray:
    """Absolute reverse DP via group simulation; mirrors
    rev_align (pathwise_alignment_recombination.rs:129-435) with the
    same group-follower semantics, bottom-right to top-left.
    ``semiglobal`` True = mode 9 (last column zeroed).  Column 0 is
    never written (stays POISON), as in the reference."""
    lnz = rg.lnz
    n = rg.n
    L = len(rev_seq)
    pn = rg.paths_nodes

    A = np.full((n, L, rg.paths_number), POISON, dtype=np.int64)

    covn = pn[n - 1]
    A[n - 1, L - 1, covn] = 0
    for j in range(L - 2, 0, -1):
        A[n - 1, j, covn] = A[n - 1, j + 1, covn] + sm.get(rev_seq[j], "-")

    for i in range(n - 2, 0, -1):
        gap_i = sm.get(lnz[i], "-")
        groups = _groups_rev(rg, i)
        if semiglobal:
            A[i, L - 1, pn[i]] = 0
        else:
            for p, members, r in groups:
                rep_best = A[p, L - 1, r] + gap_i
                A[i, L - 1, members] = rep_best + (
                    A[p, L - 1, members] - A[p, L - 1, r]
                )
        for j in range(L - 2, 0, -1):
            sub = sm.get(lnz[i], rev_seq[j])
            gap_j = sm.get(rev_seq[j], "-")
            for p, members, r in groups:
                d = A[p, j + 1, r] + sub
                u = A[p, j, r] + gap_i
                l = A[i, j + 1, r] + gap_j
                best = max(d, u, l)
                if best == d:
                    src_i, src_j = p, j + 1
                elif best == u:
                    src_i, src_j = p, j
                else:
                    src_i, src_j = i, j + 1
                A[i, j, members] = best + (A[src_i, src_j, members] - A[src_i, src_j, r])
    return A


# ---------------------------------------------------------------------------
# affine fill (modes 6/7) — group simulation over three absolute planes
# ---------------------------------------------------------------------------


def fill_abs_gap(
    seq: str, g: PathGraph, sm: ScoreMatrix, o: int, e: int, semiglobal: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(Ad, Ax, Ay) absolute planes via explicit group simulation.

    Mirrors the observable semantics of pathwise_alignment_gap{,_semi}.rs
    with the same group-follower rule as :func:`fill_abs`, applied to
    all three planes.  Boundary quirks kept as-is: the x plane is never
    written on row 0 (absolute 0, not -inf), the y plane never on
    column 0; gap-open candidates win >= ties over extensions.
    """
    lnz = g.lnz
    n = g.n
    L = len(seq)
    P = g.paths_number
    pn = g.paths_nodes

    Ad = np.full((n, L, P), POISON, dtype=np.int64)
    Ax = np.full((n, L, P), POISON, dtype=np.int64)
    Ay = np.full((n, L, P), POISON, dtype=np.int64)

    cov0 = pn[0]
    Ad[0, 0, cov0] = 0
    Ax[0, 0, cov0] = 0
    Ay[0, 0, cov0] = 0
    for j in range(1, L):
        Ay[0, j, cov0] = o + e * j
        Ad[0, j, cov0] = o + e * j
        Ax[0, j, cov0] = 0  # x never written on row 0 (quirk)

    for i in range(1, n - 1):
        groups = _groups(g, i)
        cov = pn[i]
        if semiglobal:
            Ad[i, 0, cov] = 0
            Ax[i, 0, cov] = 0
            Ay[i, 0, cov] = 0
        else:
            for p, members, r in groups:
                # first-column x: open at the boundary (i == 1 for
                # within-node rows, p == 0 for node starts), else extend
                if p == 0 or (not g.node_start[i] and i == 1):
                    Ax[i, 0, members] = o + e
                else:
                    rep_x = Ax[p, 0, r] + e
                    Ax[i, 0, members] = rep_x + (Ax[p, 0, members] - Ax[p, 0, r])
            Ad[i, 0, cov] = Ax[i, 0, cov]
            Ay[i, 0, cov] = 0  # y never written on column 0 (quirk)
        for j in range(1, L):
            sub = sm.get(lnz[i], seq[j])
            for p, members, r in groups:
                # y plane (graph gap): open from dpm vs extend, >= to open
                u_dpm = Ad[p, j, r] + o + e
                u_y = Ay[p, j, r] + e
                if u_dpm >= u_y:
                    Ay[i, j, members] = u_dpm + (Ad[p, j, members] - Ad[p, j, r])
                else:
                    Ay[i, j, members] = u_y + (Ay[p, j, members] - Ay[p, j, r])
                # x plane (read gap)
                l_dpm = Ad[i, j - 1, r] + o + e
                l_x = Ax[i, j - 1, r] + e
                if l_dpm >= l_x:
                    Ax[i, j, members] = l_dpm + (Ad[i, j - 1, members] - Ad[i, j - 1, r])
                else:
                    Ax[i, j, members] = l_x + (Ax[i, j - 1, members] - Ax[i, j - 1, r])
                # m plane: D >= U >= L follower cascade
                d = Ad[p, j - 1, r] + sub
                u = Ay[i, j, r]
                l = Ax[i, j, r]
                best = max(d, u, l)
                if best == d:
                    Ad[i, j, members] = best + (Ad[p, j - 1, members] - Ad[p, j - 1, r])
                elif best == u:
                    Ad[i, j, members] = Ay[i, j, members]
                else:
                    Ad[i, j, members] = Ax[i, j, members]
    return Ad, Ax, Ay


def best_ending_gap_semi(Ad: np.ndarray, g: PathGraph) -> tuple[int, int]:
    """Mode-7 ending scan (gap_semi.rs:446-473) on absolute scores.

    Quirks kept: scans row 0 too, and the per-node argmax runs over
    ALL path slots — uncovered slots count as score 0 (their delta
    cells are never written), and the tuple max prefers the larger
    path id on ties."""
    mx = None
    ending_node = chosen_path = 0
    last = Ad.shape[1] - 1
    for i in range(g.n - 1):
        scores = np.zeros(g.paths_number, dtype=np.int64)
        cov = g.paths_nodes[i]
        scores[cov] = Ad[i, last, cov]
        best_path = max(range(g.paths_number), key=lambda p: (scores[p], p))
        if mx is None or scores[best_path] > mx:
            mx = scores[best_path]
            ending_node = i
            chosen_path = best_path
    return ending_node, chosen_path
