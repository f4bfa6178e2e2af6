"""Pallas hard-row column-chain kernel (modes 6/7) vs the XLA scan.

The kernel (ops/pallas_gap67_hardrow) must reproduce the hard rows of
the delta-form fill bit-for-bit; interpret=True runs it on CPU, pinned
against the engine with the kernel disabled (the exact XLA scan).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.io import fasta, gfa
from recgraph_tpu.ops import pallas_gap67_hardrow as pg67
from recgraph_tpu.ops import pathwise_gap_engine as pge
from recgraph_tpu.ops.encode import encode_reads
from recgraph_tpu.scoring import ScoreMatrix


def _planes(g, sm, seq, o, e, semiglobal, pallas, monkeypatch):
    monkeypatch.setattr(pg67, "INTERPRET", pallas)
    if pallas:
        monkeypatch.delenv("RECGRAPH_NO_PALLAS67", raising=False)
    else:
        monkeypatch.setenv("RECGRAPH_NO_PALLAS67", "1")
    Dm, X, Y = pge.fill_gap_device(g, sm, seq, o, e, semiglobal)
    return np.asarray(Dm), np.asarray(X), np.asarray(Y)


@pytest.mark.parametrize("semiglobal", [False, True])
def test_hardrow_kernel_bit_exact_example(example_paths, semiglobal,
                                          monkeypatch):
    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    seqs = seqs[:6]
    g = PathGraph.from_gfa(gfa.parse_gfa(graph_gfa), is_reversed=False)
    sm = ScoreMatrix.create("none", 2, -4)
    seq, L = encode_reads(seqs)
    ref = _planes(g, sm, seq, -4, -2, semiglobal, False, monkeypatch)
    got = _planes(g, sm, seq, -4, -2, semiglobal, True, monkeypatch)
    for a, b, name in zip(ref, got, "DXY"):
        assert (a == b).all(), (
            f"{name} differs at {np.argwhere(a != b)[:5]}"
        )


def test_hardrow_kernel_bit_exact_fuzz(monkeypatch):
    from make_synthetic import make
    import tempfile

    sm = ScoreMatrix.create("none", 2, -4)
    for seed in (7,):
        with tempfile.TemporaryDirectory() as d:
            make(d, n_back=60, n_reads=4, seed=seed, n_paths=6)
            g = PathGraph.from_gfa(
                gfa.parse_gfa(os.path.join(d, "graph.gfa")),
                is_reversed=False,
            )
            seqs, _ = fasta.get_sequences(os.path.join(d, "reads.fa"))
        seq, L = encode_reads(seqs[:4])
        ref = _planes(g, sm, seq, -3, -1, False, False, monkeypatch)
        got = _planes(g, sm, seq, -3, -1, False, True, monkeypatch)
        for a, b, name in zip(ref, got, "DXY"):
            assert (a == b).all(), f"seed {seed} {name}"


def _planes_full(g, sm, seq, o, e, semiglobal, pallas, monkeypatch):
    from recgraph_tpu.ops import pallas_gap67_fill as pgf

    monkeypatch.setattr(pgf, "INTERPRET", pallas)
    if pallas:
        monkeypatch.delenv("RECGRAPH_NO_PALLAS67", raising=False)
    else:
        monkeypatch.setenv("RECGRAPH_NO_PALLAS67", "1")
    Dm, X, Y = pge.fill_gap_device(g, sm, seq, o, e, semiglobal)
    return np.asarray(Dm), np.asarray(X), np.asarray(Y)


@pytest.mark.parametrize("semiglobal", [False, True])
def test_full_fill_kernel_bit_exact_example(example_paths, semiglobal,
                                            monkeypatch):
    """The full-Pallas fill (pallas_gap67_fill) vs the XLA scan."""
    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    seqs = seqs[:8]
    g = PathGraph.from_gfa(gfa.parse_gfa(graph_gfa), is_reversed=False)
    sm = ScoreMatrix.create("none", 2, -4)
    seq, L = encode_reads(seqs, pad_to=256)
    ref = _planes_full(g, sm, seq, -4, -2, semiglobal, False, monkeypatch)
    got = _planes_full(g, sm, seq, -4, -2, semiglobal, True, monkeypatch)
    from recgraph_tpu.metrics import FALLBACKS
    assert FALLBACKS.get("gap67_pallas_fill", 0) == 0
    for a, b, name in zip(ref, got, "DXY"):
        assert (a == b).all(), (
            f"{name} differs: {np.argwhere(a != b)[:8]}"
        )


def test_full_fill_kernel_bit_exact_fuzz(monkeypatch):
    from make_synthetic import make
    import tempfile

    sm = ScoreMatrix.create("none", 2, -4)
    for seed in (7,):
        with tempfile.TemporaryDirectory() as d:
            make(d, n_back=60, n_reads=8, seed=seed, n_paths=6)
            g = PathGraph.from_gfa(
                gfa.parse_gfa(os.path.join(d, "graph.gfa")),
                is_reversed=False,
            )
            seqs, _ = fasta.get_sequences(os.path.join(d, "reads.fa"))
        seq, L = encode_reads(seqs[:8], pad_to=128)
        ref = _planes_full(g, sm, seq, -3, -1, False, False, monkeypatch)
        got = _planes_full(g, sm, seq, -3, -1, False, True, monkeypatch)
        from recgraph_tpu.metrics import FALLBACKS
        assert FALLBACKS.get("gap67_pallas_fill", 0) == 0
        for a, b, name in zip(ref, got, "DXY"):
            assert (a == b).all(), f"seed {seed} {name}"


def test_full_fill_kernel_random_dags(monkeypatch):
    """Random covered DAGs (multi-pred nodes, partial-coverage paths ->
    re-alphas / multi-group rows), asymmetric HOXD70 scoring, varied
    gap params, both modes: the full-Pallas fill stays bit-exact."""
    import random

    from recgraph_tpu.ops import pallas_gap67_fill as pgf
    from test_fuzz_random_graphs import random_gfa, random_read

    hox = ScoreMatrix.create("HOXD70.mtx", 2, -4)
    none = ScoreMatrix.create("none", 2, -4)
    done = 0
    for seed in range(40):
        rng = random.Random(1000 + seed)
        gfa_obj = random_gfa(rng, n_nodes=16, n_paths=4, cover_all=True)
        g = PathGraph.from_gfa(gfa_obj)
        try:
            pge.gap_meta(g)
        except pge.RejectedGraph:
            continue
        reads = [random_read(rng, gfa_obj) for _ in range(8)]
        seq, L = encode_reads(reads, pad_to=128)
        sm, o, e = [(none, -4, -2), (hox, -200, -2), (none, -3, -1)][seed % 3]
        semi = seed % 2 == 1
        if not pgf.eligible(pge.gap_meta(g), 128, sm.table, o, e):
            continue
        ref = _planes_full(g, sm, seq, o, e, semi, False, monkeypatch)
        got = _planes_full(g, sm, seq, o, e, semi, True, monkeypatch)
        from recgraph_tpu.metrics import FALLBACKS
        assert FALLBACKS.get("gap67_pallas_fill", 0) == 0
        for a, b, name in zip(ref, got, "DXY"):
            assert (a == b).all(), (
                f"seed {seed} {name}: {np.argwhere(a != b)[:5]}"
            )
        done += 1
        if done >= 10:
            break
    assert done >= 6, f"only {done} eligible fuzz graphs"
