"""GFA '-' orientation support (round-1 verdict item #5).

The reference accepts '-' link/path orientations through handlegraph;
what it *does* with them (see io/gfa.py docstring):

- path step orientations are ignored (only handle.id() is read,
  pathwise_graph.rs:196-233);
- an L line ``a ao b bo`` contributes pred(b) += a iff bo == '+' and
  pred(a) += b iff ao == '-' to the forward graph (left-edge iteration
  of forward handles, graph.rs:75-88); sequences are never flipped by
  links (forward handles are linearised, graph.rs:47-52).

Consequence: ``L a - b -`` is exactly the flipped spelling of
``L b + a +`` — common in real pangenome GFAs — and a graph written
with such lines must produce byte-identical GAF to its all-'+' twin.
"""

import random

import pytest

from recgraph_tpu.graph.pathgraph import PathGraph, nodes_displacement_matrix
from recgraph_tpu.graph.poagraph import PoaGraph
from recgraph_tpu.io import gfa as gfa_mod
from recgraph_tpu.io.gfa import Gfa, GfaPath, parse_gfa
from recgraph_tpu.oracle import gaf_emit, pathwise, poa, recombination as ro
from recgraph_tpu.ops import pathwise_engine, poa_engine, recombination_engine
from recgraph_tpu.scoring import ScoreMatrix


def write_gfa(path, segments, links, paths):
    with open(path, "w") as fh:
        fh.write("H\tVN:Z:1.0\n")
        for nid, seq in segments.items():
            fh.write(f"S\t{nid}\t{seq}\n")
        for a, ao, b, bo in links:
            fh.write(f"L\t{a}\t{ao}\t{b}\t{bo}\t0M\n")
        for name, steps in paths:
            fh.write(f"P\t{name}\t{steps}\t*\n")


def test_parse_minus_semantics(tmp_path):
    segs = {1: "ACG", 2: "TT", 3: "GC", 4: "A"}
    links = [
        (1, "+", 2, "+"),   # plain: pred(2) += 1
        (3, "-", 2, "-"),   # flipped spelling of 2->3: pred(3) += 2
        (4, "-", 3, "-"),   # flipped spelling of 3->4: pred(4) += 3
        (1, "+", 4, "-"),   # invisible to the forward graph (quirk)
    ]
    p = tmp_path / "g.gfa"
    write_gfa(p, segs, links, [("p0", "1+,2-,3-,4+")])
    g = parse_gfa(str(p))
    assert g.oriented_edges is not None
    preds = g.predecessors()
    assert preds == {1: [], 2: [1], 3: [2], 4: [3]}
    # flipped (amb-strand) graph: the '+ -' line becomes visible
    succs = g.successors()
    assert succs == {1: [2, 4], 2: [3], 3: [4], 4: [1]}
    # path step orientations ignored
    assert g.paths[0].nodes == [1, 2, 3, 4]


def test_minus_written_graph_matches_plus_twin(tmp_path):
    """A chain written entirely in flipped-L form must give byte-identical
    GAF to the all-'+' twin across all engines and modes."""
    segs = {1: "ACGT", 2: "TGA", 3: "CCA", 4: "GAT"}
    plus_links = [(1, "+", 2, "+"), (2, "+", 3, "+"), (1, "+", 3, "+"),
                  (3, "+", 4, "+")]
    minus_links = [(2, "-", 1, "-"), (3, "-", 2, "-"), (3, "-", 1, "-"),
                   (4, "-", 3, "-")]
    paths = [("p0", "1+,2+,3+,4+"), ("p1", "1-,3-,4-")]
    pa = tmp_path / "plus.gfa"
    pb = tmp_path / "minus.gfa"
    write_gfa(pa, segs, plus_links, paths)
    write_gfa(pb, segs, minus_links, paths)
    ga, gb = parse_gfa(str(pa)), parse_gfa(str(pb))
    assert gb.oriented_edges is not None

    sm = ScoreMatrix.create("none", 2, -4)
    reads = ["$ACGTTGACCAGAT", "$ACGCCAGA", "$TTTT"]
    btas = [int(1 + 0.1 * len(s)) for s in reads]

    # POA modes through engine + oracle on both spellings
    gpa, gpb = PoaGraph.from_gfa(ga), PoaGraph.from_gfa(gb)
    assert gpa.preds == gpb.preds and gpa.lnz == gpb.lnz
    emitters = {0: gaf_emit.gaf_of_global_abpoa, 1: gaf_emit.gaf_of_local_poa,
                2: gaf_emit.gaf_of_gap_abpoa, 3: gaf_emit.gaf_of_gap_local_poa}
    for mode in (0, 1, 2, 3):
        sa = poa_engine.run_batch(mode, reads, gpa, sm, -4, -2, btas)
        sb = poa_engine.run_batch(mode, reads, gpb, sm, -4, -2, btas)
        for i, s in enumerate(reads):
            ra = emitters[mode](sa[i], s, "r", False, gpa.handle_pos).to_string()
            rb = emitters[mode](sb[i], s, "r", False, gpb.handle_pos).to_string()
            assert ra == rb, f"mode {mode} read {i}"

    # pathwise + recombination modes
    pga, pgb = PathGraph.from_gfa(ga), PathGraph.from_gfa(gb)
    for mode in (4, 5):
        ra = pathwise_engine.run_batch(mode, reads, pga, sm)
        rb = pathwise_engine.run_batch(mode, reads, pgb, sm)
        for i in range(len(reads)):
            assert ra[i].to_string() == rb[i].to_string(), f"mode {mode} read {i}"
    rga, rgb = pga.reverse(), pgb.reverse()
    for mode in (8, 9):
        ra = recombination_engine.run_batch(mode, reads, pga, rga, sm, 4, 0.1, 1.0)
        rb = recombination_engine.run_batch(mode, reads, pgb, rgb, sm, 4, 0.1, 1.0)
        for i in range(len(reads)):
            assert ra[i].to_string() == rb[i].to_string(), f"mode {mode} read {i}"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_flipped_edge_roundtrip(tmp_path, seed):
    """Random DAGs with random edges re-spelled in '-' form parse to the
    same predecessor structure and oracle GAF as the '+' original."""
    import sys

    sys.path.insert(0, "tests")
    from test_fuzz_random_graphs import random_gfa, random_read

    rng = random.Random(500 + seed)
    gfa = random_gfa(rng, n_nodes=10, n_paths=3, cover_all=True)
    links_plus = [(a, "+", b, "+") for a, b in gfa.edges]
    links_mix = [
        (b, "-", a, "-") if rng.random() < 0.5 else (a, "+", b, "+")
        for a, b in gfa.edges
    ]
    paths = [
        (p.name, ",".join(
            f"{n}{'-' if rng.random() < 0.3 else '+'}" for n in p.nodes
        ))
        for p in gfa.paths
    ]
    pa, pb = tmp_path / "a.gfa", tmp_path / "b.gfa"
    write_gfa(pa, gfa.segments, links_plus, paths)
    write_gfa(pb, gfa.segments, links_mix, paths)
    ga, gb = parse_gfa(str(pa)), parse_gfa(str(pb))
    assert ga.predecessors() == gb.predecessors()
    assert ga.successors() == gb.successors()
    sm = ScoreMatrix.match_mismatch(2, -4)
    gpa, gpb = PoaGraph.from_gfa(ga), PoaGraph.from_gfa(gb)
    read = random_read(rng, gfa)
    ra = poa.local_full(read, gpa, sm)
    rb = poa.local_full(read, gpb, sm)
    assert gaf_emit.gaf_of_local_poa(ra, read, "r", False, gpa.handle_pos).to_string() == \
        gaf_emit.gaf_of_local_poa(rb, read, "r", False, gpb.handle_pos).to_string()
