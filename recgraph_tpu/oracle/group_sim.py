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
