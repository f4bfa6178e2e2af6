"""Scoring-matrix and IO tests, ported from the reference unit tests."""

import os

from recgraph_tpu import scoring
from recgraph_tpu.io import fasta, gfa

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "recgraph_tpu", "data")


def test_match_mis_matrix_correct():
    # mirrors score_matrix.rs:109-116
    sm = scoring.ScoreMatrix.match_mismatch(10, -10)
    assert sm.get("A", "A") == 10
    assert sm.get("A", "C") == -10
    assert sm.get("N", "N") == -10
    assert sm.get("A", "-") == -20  # gap = 2 * mismatch


def test_hoxd_correct():
    # mirrors score_matrix.rs:117-130
    d70 = scoring.ScoreMatrix.from_mtx_file(os.path.join(DATA, "HOXD70.mtx"))
    d55 = scoring.ScoreMatrix.from_mtx_file(os.path.join(DATA, "HOXD55.mtx"))
    assert d70.get("A", "A") == 91
    assert d70.get("T", "G") == -144
    assert d55.get("A", "A") == 91
    assert d55.get("T", "G") == -90
    assert d70.get("A", "-") == -200


def test_rev_and_compl():
    # mirrors sequences.rs:85-100
    assert fasta.rev_and_compl("$AAT") == "$ATT"
    assert fasta.rev_and_compl("$ATCGN") == "$NCGAT"


def test_fasta_reader(tmp_path):
    p = tmp_path / "r.fa"
    p.write_text(">a\nacg-t\nACGT\n>b\nTT\n")
    seqs, names = fasta.get_sequences(str(p))
    assert names == ["a", "b"]
    assert seqs == ["$ACGNTACGT", "$TT"]


def test_gfa_parse(example_paths):
    _, gfa_path = example_paths
    g = gfa.parse_gfa(gfa_path)
    assert len(g.segments) == 140
    assert len(g.edges) == 214
    assert len(g.paths) == 23
    total_bases = sum(len(s) for s in g.segments.values())
    assert total_bases == 1329
