"""Exact ports of the reference's graph-construction unit tests.

- graph.rs:186-259 (LnzGraph construction, reverse mode, handle map)
- pathwise_graph.rs:356-545 (PathGraph, multiple starts/ends, reverse,
  PredHash path sets)

Non-ACGT marker segments in the reference tests ("B", "H") are replaced
with valid bases; the assertions touched only their structure, never
their characters.
"""

import numpy as np

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.graph.poagraph import PoaGraph
from recgraph_tpu.io.gfa import Gfa, GfaPath


def _gfa(segments, edges, paths=()):
    g = Gfa()
    g.segments = dict(segments)
    g.edges = list(edges)
    g.paths = [GfaPath(str(i), list(p)) for i, p in enumerate(paths)]
    return g


def test_graph_struct_correctly_created():
    # graph.rs:193-210
    g = PoaGraph.from_gfa(
        _gfa({1: "A", 2: "T", 3: "C", 4: "G"}, [(1, 2), (2, 3), (3, 4)])
    )
    assert g.node_start[1] and g.node_start[5]
    assert g.preds[1] == [0]
    assert g.preds[5] == [4]
    assert g.lnz == "$ATCGF"


def test_rev_graph_struct_correctly_created():
    # graph.rs:211-229: reversed order + complemented bases
    g = PoaGraph.from_gfa(
        _gfa({1: "A", 2: "T", 3: "C", 4: "G"}, [(1, 2), (2, 3), (3, 4)]),
        amb_mode=True,
    )
    assert g.node_start[1] and g.node_start[5]
    assert g.preds[1] == [0]
    assert g.preds[5] == [4]
    assert g.lnz == "$CGATF"


def test_handle_id_from_lnz_pos_and_sorted_handles():
    # graph.rs:231-259
    g = PoaGraph.from_gfa(
        _gfa(
            {1: "A", 2: "TA", 3: "CGG", 4: "G", 5: "TCCCC"},
            [(1, 2), (1, 3), (3, 4), (3, 5)],
        )
    )
    # consecutive handle ordinals per position (reference builds them
    # by counting node starts; our handle_pos stores GFA ids directly)
    expect = {1: "1", 2: "2", 4: "3", 6: "3", 7: "4", 12: "5"}
    for pos, hid in expect.items():
        assert g.handle_pos[pos] == hid


def test_pathwise_graph_correctly_created():
    # pathwise_graph.rs:363-404
    g = PathGraph.from_gfa(
        _gfa(
            {1: "A", 2: "T", 3: "C", 4: "G"},
            [(1, 2), (1, 3), (2, 4), (3, 4)],
            paths=[[1, 2, 4], [1, 3, 4]],
        )
    )
    assert g.paths_number == 2
    assert g.lnz == "$ATCGF"
    assert g.node_start[2]
    assert g.paths_nodes[2][0] and not g.paths_nodes[2][1]
    assert g.paths_nodes[0].all() and g.paths_nodes[5].all()


def test_multiple_starts_and_ends_pathwise():
    # pathwise_graph.rs:405-449 ("B"/"H" -> "A"/"G")
    g = PathGraph.from_gfa(
        _gfa(
            {1: "A", 2: "A", 3: "T", 4: "C", 5: "G", 6: "G"},
            [(1, 3), (1, 4), (3, 5), (4, 5), (2, 6)],
            paths=[[1, 3, 5], [1, 4, 5], [2, 6]],
        )
    )
    assert g.paths_number == 3
    assert g.paths_nodes[3][0] and not g.paths_nodes[3][1]
    assert g.paths_nodes[0].all() and g.paths_nodes[7].all()


def test_reverse_pathwise_graph_correctly_created():
    # pathwise_graph.rs:451-492
    g = PathGraph.from_gfa(
        _gfa(
            {1: "A", 2: "T", 3: "C", 4: "G"},
            [(1, 2), (1, 3), (2, 4), (3, 4)],
            paths=[[1, 2, 4], [1, 3, 4]],
        ),
        is_reversed=True,
    )
    assert g.paths_number == 2
    assert g.lnz == "$CGATF"
    assert g.node_start[2]
    assert (not g.paths_nodes[2][0]) and g.paths_nodes[2][1]
    assert g.paths_nodes[3][0] and not g.paths_nodes[3][1]
    assert g.paths_nodes[0].all() and g.paths_nodes[5].all()


def test_pred_hash_struct():
    # pathwise_graph.rs:494-544
    g = PathGraph.from_gfa(
        _gfa(
            {1: "A", 2: "A", 3: "T", 4: "C", 5: "G", 6: "G"},
            [(1, 3), (1, 4), (3, 5), (4, 5), (2, 6)],
            paths=[[1, 3, 5], [1, 4, 5], [2, 6]],
        )
    )
    preds = g.preds_and_paths(5)
    assert len(preds) == 2
    for pred, paths in preds:
        if pred == 3:
            assert paths[0] and not paths[1] and not paths[2]
        elif pred == 4:
            assert not paths[0] and paths[1] and not paths[2]
        else:
            raise AssertionError(pred)
