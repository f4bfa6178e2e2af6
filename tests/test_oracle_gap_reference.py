"""Exact ports of the reference's gap_global_abpoa unit tests.

Mirrors gap_global_abpoa.rs:456-757 (7 tests) with the same graphs,
reads, scores (o, e, bta) and expected values.  The affine kernels read
only substitution entries from the matrix — gap costs come from o/e —
so the uniform match/mismatch table stands in for the reference's
sparse HashMaps.

Each case also runs through the device engine, pinning it to the same
scores.
"""

from conftest import make_poa_graph, simple_score_matrix

from recgraph_tpu.oracle import poa
from recgraph_tpu.ops import poa_engine


def _both(seq, g, o, e, bta):
    sm = simple_score_matrix(1, -1)
    st_o = poa.gap_global_banded(seq, g, sm, o, e, bta)
    st_d = poa_engine.run_batch(2, [seq], g, sm, o, e, [bta])[0]
    assert st_o.score == st_d.score
    return st_o.score


def test1_linear():
    g = make_poa_graph("$AAAAF", {1: [0], 5: [4]})
    assert _both("$AAAA", g, -4, -1, 3) == 4


def test_gap_correctly_considered():
    g = make_poa_graph("$AACAAAF", {1: [0], 3: [2], 4: [2], 5: [3, 4], 7: [6]})
    assert _both("$AACAAC", g, -4, -1, 3) == 0


def test_multiple_starts():
    g = make_poa_graph(
        "$ACACCAAF",
        {1: [0], 2: [0], 3: [1, 2], 4: [1, 2], 5: [3, 4], 8: [7]},
    )
    assert _both("$CACAA", g, -4, -1, 3) == 5


def test_multiple_ends():
    g = make_poa_graph(
        "$ACACCAACF",
        {1: [0], 2: [0], 3: [1, 2], 4: [1, 2], 5: [3, 4], 7: [6], 8: [6], 9: [7, 8]},
    )
    assert _both("$CACAA", g, -4, -1, 3) == 5


def test_gap_poa_same_result_as_normal_if_o_0():
    g = make_poa_graph("$AACAAAF", {1: [0], 3: [2], 4: [2], 5: [3, 4], 7: [6]})
    assert _both("$AACAAC", g, 0, -1, 5) == 4


def test_gap_open_only_once_if_penalty_high():
    g = make_poa_graph("$ACACAF", {1: [0], 6: [5]})
    assert _both("$AAA", g, -100, -1, 10) == -101


def test_sequence_longer_than_graph():
    g = make_poa_graph("$AAAAAF", {1: [0], 6: [5]})
    assert _both("$AAAAAAAAA", g, -4, -1, 7) == -3
