"""Device pathwise engines (modes 4/5/8/9) vs the scalar oracle."""

import numpy as np
import pytest

from recgraph_tpu.graph.pathgraph import PathGraph, nodes_displacement_matrix
from recgraph_tpu.io import fasta, gfa
from recgraph_tpu.oracle import pathwise, recombination as ro
from recgraph_tpu.ops import pathwise_engine, recombination_engine
from recgraph_tpu.scoring import ScoreMatrix

N_READS = 3


@pytest.fixture(scope="module")
def corpus(example_paths):
    reads_fa, graph_gfa = example_paths
    seqs, names = fasta.get_sequences(reads_fa)
    parsed = gfa.parse_gfa(graph_gfa)
    g = PathGraph.from_gfa(parsed)
    sm = ScoreMatrix.create("none", 2, -4)
    return seqs[:N_READS], names[:N_READS], g, sm


@pytest.mark.parametrize("mode", [4, 5])
def test_pathwise_gaf_equal(corpus, mode):
    seqs, names, g, sm = corpus
    recs = pathwise_engine.run_batch(mode, seqs, g, sm)
    fn = pathwise.exec_global if mode == 4 else pathwise.exec_semiglobal
    for i, s in enumerate(seqs):
        r_o = fn(s, g, sm)
        r_o.query_name = names[i]
        recs[i].query_name = names[i]
        assert r_o.to_string() == recs[i].to_string()


@pytest.mark.parametrize("mode", [8, 9])
def test_recombination_gaf_equal(corpus, mode):
    seqs, names, g, sm = corpus
    rg = g.reverse()
    dms = nodes_displacement_matrix(g, rg)
    recs = recombination_engine.run_batch(mode, seqs, g, rg, sm, 4, 0.1, 1.0)
    for i, s in enumerate(seqs):
        r_o = ro.exec_mode(mode, s, g, rg, sm, 4, 0.1, dms, 1.0)
        r_o.query_name = names[i]
        recs[i].query_name = names[i]
        assert r_o.to_string() == recs[i].to_string()


def test_recombination_param_sweep(corpus):
    """-R/-r/-B sweep config from BASELINE.json on one read."""
    seqs, names, g, sm = corpus
    rg = g.reverse()
    dms = nodes_displacement_matrix(g, rg)
    sub = seqs[:1]
    for brc, mrc, rbw in [(10, 2.0, 0.5), (0, 0.0, 0.9)]:
        recs = recombination_engine.run_batch(8, sub, g, rg, sm, brc, mrc, rbw)
        r_o = ro.exec_mode(8, sub[0], g, rg, sm, brc, mrc, dms, rbw)
        r_o.query_name = names[0]
        recs[0].query_name = names[0]
        assert r_o.to_string() == recs[0].to_string()


def test_rev_fill_matrix_equal(corpus):
    """Reverse fill matrices cell-exact vs rev_align (both modes)."""
    import jax
    import jax.numpy as jnp

    from recgraph_tpu.ops.encode import encode_reads

    seqs, _, g, sm = corpus
    rg = g.reverse()
    dgr = recombination_engine.rev_device_graph(rg)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(seqs[:2])
    for mode in (8, 9):
        Ar = np.asarray(
            jax.device_get(
                recombination_engine._fill_pathwise_rev(
                    dgr, table, seq, L, jnp.bool_(mode == 8)
                )
            )
        )
        for b in range(2):
            W = ro.rev_align(mode, ro.get_rev_sequence(seqs[b]), rg, sm)
            Wd = Ar[b].transpose(1, 2, 0)[:, : W.shape[1], :]
            assert np.array_equal(W, Wd)


@pytest.mark.parametrize("mode", [4, 5])
def test_pathwise_device_walk(corpus, mode):
    """On-device traceback path == oracle, incl. mixed read lengths."""
    seqs, names, g, sm = corpus
    mixed = [seqs[0], seqs[1][:80], seqs[2]]
    recs = pathwise_engine.run_batch_walks(mode, mixed, g, sm)
    fn = pathwise.exec_global if mode == 4 else pathwise.exec_semiglobal
    for i, s in enumerate(mixed):
        assert fn(s, g, sm).to_string() == recs[i].to_string()


@pytest.mark.parametrize("mode", [8, 9])
def test_recombination_device_walk(corpus, mode):
    """Modes 8/9 on-device traceback == oracle (rec and no-rec cases)."""
    seqs, names, g, sm = corpus
    rg = g.reverse()
    dms = nodes_displacement_matrix(g, rg)
    for brc, mrc, rbw in [(4, 0.1, 1.0), (0, 0.0, 0.9)]:
        recs = recombination_engine.run_batch_walks(
            mode, seqs, g, rg, sm, brc, mrc, rbw
        )
        for i, s in enumerate(seqs):
            r_o = ro.exec_mode(mode, s, g, rg, sm, brc, mrc, dms, rbw)
            assert r_o.to_string() == recs[i].to_string()


def test_split_search_guided_exact(corpus, monkeypatch):
    """The bound-guided split search (default) must evaluate only a
    subset of columns AND byte-match the full column scan.

    Exactness argument in recombination_engine._run_split_guided: any
    skipped column's 4-sign upper bound is below the final per-read
    maximum, so it could never be taken; evaluated columns replay the
    exact take/tie chain.
    """
    seqs, names, g, sm = corpus
    rg = g.reverse()
    evaluated = {}
    orig = recombination_engine._run_split_guided

    def spy(*a, **k):
        out = orig(*a, **k)
        evaluated["ran"] = True
        return out

    monkeypatch.setattr(recombination_engine, "_run_split_guided", spy)
    guided = recombination_engine.run_batch_walks(
        8, seqs, g, rg, sm, 4, 0.1, 0.3
    )
    assert evaluated.get("ran"), "guided search never engaged"
    monkeypatch.setenv("RECGRAPH_SPLIT_FULL", "1")
    full = recombination_engine.run_batch_walks(8, seqs, g, rg, sm, 4, 0.1, 0.3)
    assert [r.to_string() for r in guided] == [r.to_string() for r in full]


def test_split_search_pruning_exact(corpus, monkeypatch):
    """The legacy full-scan path's candidate-column pruning
    (_candidate_columns) must still engage and leave the GAF unchanged
    (it remains the RECGRAPH_SPLIT_FULL cross-check path)."""
    seqs, names, g, sm = corpus
    rg = g.reverse()
    monkeypatch.setenv("RECGRAPH_SPLIT_FULL", "1")
    engaged = {}
    orig = recombination_engine._candidate_columns

    def spy(*a, **k):
        out = orig(*a, **k)
        engaged["cols"] = out
        return out

    monkeypatch.setattr(recombination_engine, "_candidate_columns", spy)
    pruned = recombination_engine.run_batch_walks(
        8, seqs, g, rg, sm, 4, 0.1, 0.3
    )
    assert engaged["cols"] is not None, "pruning never engaged"
    monkeypatch.setattr(
        recombination_engine, "_candidate_columns", lambda *a, **k: None
    )
    full = recombination_engine.run_batch_walks(8, seqs, g, rg, sm, 4, 0.1, 0.3)
    assert [r.to_string() for r in pruned] == [r.to_string() for r in full]


def test_split_search_chunked_exact(corpus, monkeypatch):
    """The chunked candidate plane (full-scan cross-check path) must
    reproduce the single-chunk scan exactly, including
    first-best/edge ties."""
    seqs, names, g, sm = corpus
    rg = g.reverse()
    monkeypatch.setenv("RECGRAPH_SPLIT_FULL", "1")
    full = recombination_engine.run_batch_walks(8, seqs, g, rg, sm, 4, 0.1, 0.5)
    monkeypatch.setattr(
        recombination_engine, "_get_split",
        lambda I, B: recombination_engine._split_search_fn(I, Tc=128),
    )
    chunked = recombination_engine.run_batch_walks(
        8, seqs, g, rg, sm, 4, 0.1, 0.5
    )
    assert [r.to_string() for r in chunked] == [r.to_string() for r in full]


def test_split_search_no_dense_planes(corpus, monkeypatch):
    """The modes-8/9 device path must never materialise the O(n^2)
    displacement matrix (guided split computes penalty chunks from the
    O(n) dfs/dfe vectors; the GAF comment displacement comes from the
    same vectors).  Feasibility at 10^5-node scale depends on this."""
    seqs, names, g, sm = corpus
    rg = g.reverse()
    import recgraph_tpu.ops.recombination_engine as re_mod

    def boom(*a, **k):
        raise AssertionError("dense displacement matrix materialised")

    monkeypatch.setattr(re_mod, "nodes_displacement_matrix", boom)
    recs = re_mod.run_batch_walks(8, seqs[:4], g, rg, sm, 4, 0.1, 1.0)
    dms = nodes_displacement_matrix(g, rg)
    for i, s in enumerate(seqs[:4]):
        r_o = ro.exec_mode(8, s, g, rg, sm, 4, 0.1, dms, 1.0)
        assert r_o.to_string() == recs[i].to_string()


def test_split_search_midsize_graph_oracle_identical(tmp_path):
    """Mode 8 on a ~4k-row synthetic pangenome, device vs oracle —
    exercises the guided split + O(n) geometry well past the example
    corpus size (a 31k-row graph runs the same path; its ~11.5 GB of
    dense planes made it infeasible before)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic import make

    d = str(tmp_path)
    make(d, n_back=1200, n_reads=2, seed=7)
    from recgraph_tpu.io import fasta, gfa

    parsed = gfa.parse_gfa(os.path.join(d, "graph.gfa"))
    g = PathGraph.from_gfa(parsed)
    rg = g.reverse()
    sm = ScoreMatrix.create("none", 2, -4)
    seqs, _ = fasta.get_sequences(os.path.join(d, "reads.fa"))
    recs = recombination_engine.run_batch_walks(8, seqs[:1], g, rg, sm, 4, 0.1, 0.5)
    dms = nodes_displacement_matrix(g, rg)
    r_o = ro.exec_mode(8, seqs[0], g, rg, sm, 4, 0.1, dms, 0.5)
    assert r_o.to_string() == recs[0].to_string()
