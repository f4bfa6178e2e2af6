"""Independent validation of the alpha/delta group semantics (VERDICT r2 #2).

The oracle's pathwise fills are literal ports of the reference's
delta-compressed recurrences — a misreading reproduced in both the port
and the device engines would pass every golden.  oracle/group_sim.py
re-derives the observable semantics from first principles (absolute
scores, explicit per-group follower rule, no delta arrays, no alpha
rebasing, no merge fixup).  Here we fuzz the two against each other on
general multi-path graphs where paths share nodes — exactly the regime
the brute-force path-enumeration checker can only bound, not pin.

Covered: forward fill global/semiglobal (modes 4/5 and the forward
half of 8/9), reverse fill (modes 8/9's second half), the affine
three-plane fill (modes 6/7), the mode-4/6 per-path ending rule and
the mode-5/7 best-ending scans (incl. mode 7's row-0 + uncovered-slot
quirks).
"""

import random

import numpy as np
import pytest

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.oracle import group_sim, pathwise, pathwise_gap, recombination
from recgraph_tpu.scoring import ScoreMatrix

from test_fuzz_random_graphs import random_gfa, random_read

SM = ScoreMatrix.match_mismatch(2, -4)
SEEDS_PER_CHUNK = 25
N_CHUNKS = 10  # 250 seeds total


def _covered_equal(A_sim, dpm_abs, g):
    """Assert sim == oracle on every covered (i, j, path) slot."""
    for i in range(g.n - 1):
        cov = g.paths_nodes[i]
        if not cov.any():
            continue
        np.testing.assert_array_equal(
            A_sim[i][:, cov], dpm_abs[i][:, cov], err_msg=f"fwd row {i}"
        )


@pytest.mark.parametrize("chunk", range(N_CHUNKS))
def test_group_sim_matches_oracle_fwd_and_rev(chunk):
    stats = {"realpha": 0, "multigroup": 0, "shared": 0}
    for s in range(SEEDS_PER_CHUNK):
        seed = chunk * SEEDS_PER_CHUNK + s
        rng = random.Random(1000 + seed)
        gfa = random_gfa(
            rng, n_nodes=rng.randint(6, 14), n_paths=rng.randint(2, 6), cover_all=True
        )
        read = random_read(rng, gfa)
        g = PathGraph.from_gfa(gfa)
        rg = g.reverse()

        # corpus must actually exercise the hard branches
        for i in range(1, g.n - 1):
            if g.node_start[i]:
                grps = group_sim._groups(g, i)
                if len(grps) > 1:
                    stats["multigroup"] += 1
                for p, _, r in grps:
                    if r != g.alphas[p]:
                        stats["realpha"] += 1
        counts = g.paths_nodes[1 : g.n - 1].sum(axis=1)
        if (counts > 1).any():
            stats["shared"] += 1

        # forward, global (mode 4 / mode 8 forward half)
        dpm = pathwise.fill(read, g, SM, semiglobal=False)
        oabs = pathwise.absolute(dpm, g)
        A = group_sim.fill_abs(read, g, SM, semiglobal=False)
        _covered_equal(A, oabs, g)

        results_o, _, best_o = pathwise.final_results_global(dpm, g)
        results_s, best_s = group_sim.final_global(A, g)
        np.testing.assert_array_equal(results_s, results_o)
        assert best_s == best_o

        # forward, semiglobal (mode 5 / mode 9 forward half)
        dpm5 = pathwise.fill(read, g, SM, semiglobal=True)
        oabs5 = pathwise.absolute(dpm5, g)
        A5 = group_sim.fill_abs(read, g, SM, semiglobal=True)
        _covered_equal(A5, oabs5, g)
        node_o, path_o = pathwise.best_ending_node_semiglobal(dpm5, g)
        node_s, path_s, _ = group_sim.best_ending_semiglobal(A5, g)
        assert (node_s, path_s) == (node_o, path_o)

        # reverse fills (modes 8 and 9); the oracle returns absolutes
        rev_seq = recombination.get_rev_sequence(read)
        for mode in (8, 9):
            w_o = recombination.rev_align(mode, rev_seq, rg, SM)
            A_r = group_sim.fill_abs_rev(rev_seq, rg, SM, semiglobal=(mode == 9))
            L = len(rev_seq)
            j1 = L - 1 if mode == 9 else L
            for i in range(1, rg.n - 1):
                cov = rg.paths_nodes[i]
                if not cov.any():
                    continue
                np.testing.assert_array_equal(
                    A_r[i, 1:j1][:, cov],
                    w_o[i, 1:j1][:, cov],
                    err_msg=f"rev row {i} mode {mode} seed {seed}",
                )
            # row n-1 stays delta-form in the oracle (absolute_scores
            # skips the last row, recombination.rs:747-757): only the
            # alpha column holds an absolute value there
            a_last = rg.alphas[rg.n - 1]
            np.testing.assert_array_equal(
                A_r[rg.n - 1, 1:j1, a_last], w_o[rg.n - 1, 1:j1, a_last]
            )
    # the random corpus must include path-sharing graphs and the
    # re-alpha / multi-group branches, else this test proves nothing
    assert stats["shared"] == SEEDS_PER_CHUNK
    assert stats["multigroup"] > 0
    assert stats["realpha"] > 0


@pytest.mark.parametrize("chunk", range(N_CHUNKS))
def test_group_sim_matches_oracle_gap67(chunk):
    """Affine (modes 6/7) group simulation vs the oracle's delta-form
    fill, all three planes, cell-exact on covered slots, plus the
    mode-6 final per-path scores and the mode-7 ending-scan quirks
    (row 0 included, uncovered slots counted as 0)."""
    O, E = -4, -2
    for s in range(SEEDS_PER_CHUNK):
        seed = chunk * SEEDS_PER_CHUNK + s
        rng = random.Random(7000 + seed)
        gfa = random_gfa(
            rng, n_nodes=rng.randint(6, 14), n_paths=rng.randint(2, 6), cover_all=True
        )
        read = random_read(rng, gfa)
        g = PathGraph.from_gfa(gfa)

        for semiglobal in (False, True):
            dpm, x, y = pathwise_gap.fill(read, g, SM, O, E, semiglobal)
            Ad, Ax, Ay = group_sim.fill_abs_gap(read, g, SM, O, E, semiglobal)
            for plane_o, plane_s, name in ((dpm, Ad, "m"), (x, Ax, "x"), (y, Ay, "y")):
                oabs = pathwise.absolute(plane_o, g)
                for i in range(g.n - 1):
                    cov = g.paths_nodes[i]
                    if not cov.any():
                        continue
                    np.testing.assert_array_equal(
                        plane_s[i][:, cov],
                        oabs[i][:, cov],
                        err_msg=f"{name} row {i} semi={semiglobal} seed {seed}",
                    )
            if semiglobal:
                node_o, path_o = pathwise_gap.best_ending_node_gap_semi(dpm, g)
                node_s, path_s = group_sim.best_ending_gap_semi(Ad, g)
                assert (node_s, path_s) == (node_o, path_o), f"seed {seed}"
            else:
                results_s, best_s = group_sim.final_global(Ad, g)
                last = dpm.shape[1] - 1
                results_o = np.zeros(g.paths_number, dtype=np.int64)
                for pred, paths in g.preds_and_paths(g.n - 1):
                    ap = g.alphas[pred]
                    for path in np.flatnonzero(paths):
                        if path == ap:
                            results_o[path] = dpm[pred, last, path]
                        else:
                            results_o[path] = dpm[pred, last, path] + dpm[pred, last, ap]
                np.testing.assert_array_equal(results_s, results_o)
                assert best_s == max(
                    range(g.paths_number), key=lambda p: (results_o[p], p)
                )
