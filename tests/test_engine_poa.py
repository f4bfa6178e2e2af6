"""Device-engine POA modes 0-3 vs the scalar oracle (GAF equality).

The oracle is the validated spec of the reference kernels (see
tests/test_oracle_poa.py); these tests pin the device engines to it
bit-for-bit, including traceback, band bookkeeping and tie-breaking.
"""

import pytest

from recgraph_tpu.graph.poagraph import PoaGraph
from recgraph_tpu.io import fasta, gfa
from recgraph_tpu.oracle import gaf_emit, poa
from recgraph_tpu.ops import poa_engine
from recgraph_tpu.scoring import ScoreMatrix

N_READS = 4


@pytest.fixture(scope="module")
def corpus(example_paths):
    reads_fa, graph_gfa = example_paths
    seqs, names = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    sm = ScoreMatrix.create("none", 2, -4)
    return seqs[:N_READS], names[:N_READS], g, sm


def _btas(seqs):
    return [int(1 + 0.01 * len(s)) for s in seqs]


def test_mode0_gaf_equal(corpus):
    seqs, names, g, sm = corpus
    states = poa_engine.run_batch(0, seqs, g, sm, -4, -2, _btas(seqs))
    for i, s in enumerate(seqs):
        st_o = poa.global_banded(s, g, sm, _btas(seqs)[i])
        r_o = gaf_emit.gaf_of_global_abpoa(st_o, s, names[i], False, g.handle_pos)
        r_d = gaf_emit.gaf_of_global_abpoa(states[i], s, names[i], False, g.handle_pos)
        assert r_o.to_string() == r_d.to_string()
        assert st_o.band_check_ok == states[i].band_check_ok


def test_mode1_gaf_equal(corpus):
    seqs, names, g, sm = corpus
    states = poa_engine.run_batch(1, seqs, g, sm, -4, -2, _btas(seqs))
    for i, s in enumerate(seqs):
        st_o = poa.local_full(s, g, sm)
        r_o = gaf_emit.gaf_of_local_poa(st_o, s, names[i], False, g.handle_pos)
        r_d = gaf_emit.gaf_of_local_poa(states[i], s, names[i], False, g.handle_pos)
        assert r_o.to_string() == r_d.to_string()


def test_mode1_hoxd70(example_paths):
    """-m 1 with the HOXD70 matrix (-t), a BASELINE.json config.

    HOXD70 as shipped is *asymmetric* (T->G = -144 vs G->T = -114) and
    the scalar local kernels score as (seq, lnz) — the full corpus is
    needed to exercise the asymmetric cells (read 27 regressed once).
    """
    reads_fa, graph_gfa = example_paths
    seqs, names = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    sm = ScoreMatrix.create("HOXD70", 2, -4)
    states = poa_engine.run_batch(1, seqs, g, sm, -4, -2, _btas(seqs))
    for i, s in enumerate(seqs):
        st_o = poa.local_full(s, g, sm)
        r_o = gaf_emit.gaf_of_local_poa(st_o, s, names[i], False, g.handle_pos)
        r_d = gaf_emit.gaf_of_local_poa(states[i], s, names[i], False, g.handle_pos)
        assert r_o.to_string() == r_d.to_string()


def test_mode3_hoxd70(example_paths):
    """Affine local with the asymmetric HOXD70 table."""
    reads_fa, graph_gfa = example_paths
    seqs, names = fasta.get_sequences(reads_fa)
    seqs, names = seqs[20:36], names[20:36]
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    sm = ScoreMatrix.create("HOXD70", 2, -4)
    states = poa_engine.run_batch(3, seqs, g, sm, -4, -2, _btas(seqs))
    for i, s in enumerate(seqs):
        st_o = poa.gap_local_full(s, g, sm, -4, -2)
        r_o = gaf_emit.gaf_of_gap_local_poa(st_o, s, names[i], False, g.handle_pos)
        r_d = gaf_emit.gaf_of_gap_local_poa(states[i], s, names[i], False, g.handle_pos)
        assert r_o.to_string() == r_d.to_string()


def test_mode2_gaf_equal(corpus):
    seqs, names, g, sm = corpus
    states = poa_engine.run_batch(2, seqs, g, sm, -4, -2, _btas(seqs))
    for i, s in enumerate(seqs):
        st_o = poa.gap_global_banded(s, g, sm, -4, -2, _btas(seqs)[i])
        r_o = gaf_emit.gaf_of_gap_abpoa(st_o, s, names[i], False, g.handle_pos)
        r_d = gaf_emit.gaf_of_gap_abpoa(states[i], s, names[i], False, g.handle_pos)
        assert r_o.to_string() == r_d.to_string()
        assert st_o.band_check_ok == states[i].band_check_ok


def test_mode3_gaf_equal(corpus):
    seqs, names, g, sm = corpus
    states = poa_engine.run_batch(3, seqs, g, sm, -4, -2, _btas(seqs))
    for i, s in enumerate(seqs):
        st_o = poa.gap_local_full(s, g, sm, -4, -2)
        r_o = gaf_emit.gaf_of_gap_local_poa(st_o, s, names[i], False, g.handle_pos)
        r_d = gaf_emit.gaf_of_gap_local_poa(states[i], s, names[i], False, g.handle_pos)
        assert r_o.to_string() == r_d.to_string()


def test_chunked_walk_runner_odd_sizes(monkeypatch, example_paths):
    """The depth-2 chunk pipeline handles ragged final chunks."""
    from recgraph_tpu import native

    if native.load() is None:
        import pytest

        pytest.skip("no native lib")
    from recgraph_tpu.align.pipeline import _hofp_ids

    reads_fa, graph_gfa = example_paths
    seqs, names = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    sm = ScoreMatrix.create("none", 2, -4)
    monkeypatch.setattr(poa_engine, "CHUNK_READS", 7)
    sub = seqs[:17]                     # chunks of 7, 7, 3
    btas = [2] * 17
    walks = poa_engine.run_batch_walks(1, sub, g, sm, -4, -2, btas)
    planes = poa_engine.run_batch(1, sub, g, sm, -4, -2, btas)
    hof = _hofp_ids(g)
    for i, (w, p) in enumerate(zip(walks, planes)):
        tail = native.gaf_emit_poa_walk(
            w.dirs, w.rows, w.stop_row, w.query_start, w.last_row,
            w.last_col_abs, hof, len(sub[i]), False,
        )
        ref = gaf_emit.gaf_of_local_poa(p, sub[i], "r", False, g.handle_pos)
        assert f"r\t{tail}" == ref.to_string()
