"""Oracle POA score tests ported from the reference unit tests."""

from conftest import make_poa_graph, simple_score_matrix

from recgraph_tpu.oracle import poa


def test_global_linear():
    # mirrors global_abpoa.rs:576-610 (test1)
    g = make_poa_graph("$AAAAF", {1: [0], 5: [4]})
    st = poa.global_banded("$AAAA", g, simple_score_matrix(), 100)
    assert st.score == 4


def test_global_bubble():
    # mirrors global_abpoa.rs:611-655 (test2)
    g = make_poa_graph(
        "$AACAAAF", {1: [0], 3: [2], 4: [2], 5: [3, 4], 7: [6]}
    )
    st = poa.global_banded("$AACAA", g, simple_score_matrix(), 4)
    assert st.score == 5


def test_global_multiple_starts():
    # mirrors global_abpoa.rs:656-702
    g = make_poa_graph(
        "$ACACCAAF",
        {1: [0], 2: [0], 3: [1, 2], 4: [1, 2], 5: [3, 4], 8: [7]},
    )
    st = poa.global_banded("$CACAA", g, simple_score_matrix(), 4)
    assert st.score == 5


def test_global_multiple_ends():
    # mirrors global_abpoa.rs:704-754
    g = make_poa_graph(
        "$ACACCAACF",
        {1: [0], 2: [0], 3: [1, 2], 4: [1, 2], 5: [3, 4], 7: [6], 8: [6], 9: [7, 8]},
    )
    st = poa.global_banded("$CACAA", g, simple_score_matrix(), 4)
    assert st.score == 5


def test_local_substrings():
    # mirrors local_poa.rs:303-338
    g = make_poa_graph("$GGCCCGGF", {1: [0], 8: [7]})
    st = poa.local_full("$AACCCAA", g, simple_score_matrix())
    assert st.score == 3


def test_local_best_predecessor():
    # mirrors local_poa.rs:340-377
    g = make_poa_graph("$GGGCCCGGF", {1: [0], 6: [3], 9: [5, 8]})
    st = poa.local_full("$AACCCAA", g, simple_score_matrix())
    assert st.score == 2


def test_gap_global_equals_linear_when_o_zero():
    # mirrors gap_global_abpoa.rs:642 family: with o=0 affine == linear
    g = make_poa_graph(
        "$AACAAAF", {1: [0], 3: [2], 4: [2], 5: [3, 4], 7: [6]}
    )
    sm = simple_score_matrix()
    lin = poa.global_banded("$AACAA", g, sm, 100)
    aff = poa.gap_global_banded("$AACAA", g, sm, 0, -1, 100)
    assert aff.score == lin.score


def test_gap_global_single_opening_under_high_penalty():
    # long deletion should open one gap: affine >> linear
    g = make_poa_graph("$" + "A" * 10 + "F", {1: [0], 11: [10]})
    sm = simple_score_matrix(2, -4)
    aff = poa.gap_global_banded("$AA", g, sm, -4, -1, 100)
    # 2 matches + one gap open + 8 extensions = 4 - 4 - 8 = -8
    assert aff.score == -8


def test_gap_read_longer_than_graph():
    # mirrors gap_global_abpoa.rs:722 family
    g = make_poa_graph("$AAF", {1: [0], 3: [2]})
    sm = simple_score_matrix(2, -4)
    aff = poa.gap_global_banded("$AAAA", g, sm, -4, -1, 100)
    assert aff.score == 2 * 2 - 4 - 1 - 1  # 2 matches, open + 2 ext


def test_gap_local_positive_region():
    g = make_poa_graph("$GGCCCGGF", {1: [0], 8: [7]})
    st = poa.gap_local_full("$AACCCAA", g, simple_score_matrix(), -2, -1)
    assert st.score == 3
