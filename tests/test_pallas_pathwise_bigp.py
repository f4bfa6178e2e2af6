"""Path-tiled pathwise kernel (large P) vs the XLA scan engine.

Covers SURVEY §7.4.3 / VERDICT r2 item 7: the dense per-path DP of the
reference (pathwise_alignment.rs:16) at pangenome path counts.  The
P=126 corpus comes from tools/make_synthetic (126 haplotype paths over
a bubbled backbone), i.e. paths share nodes heavily — the regime where
the alpha/group semantics actually bite.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.io import fasta, gfa
from recgraph_tpu.ops import pallas_pathwise_bigp, pathwise_engine
from recgraph_tpu.ops.encode import encode_reads, path_device_graph
from recgraph_tpu.scoring import ScoreMatrix


@pytest.fixture(scope="module")
def p126(tmp_path_factory):
    from make_synthetic import make

    out = tmp_path_factory.mktemp("p126")
    make(str(out), n_back=80, n_reads=8, seed=7, n_paths=126)
    seqs, _ = fasta.get_sequences(str(out / "reads.fa"))
    g = PathGraph.from_gfa(gfa.parse_gfa(str(out / "graph.gfa")))
    sm = ScoreMatrix.create("none", 2, -4)
    return seqs[:4], g, sm


@pytest.mark.parametrize("semiglobal", [False, True])
def test_bigp_bit_exact_p126(p126, semiglobal):
    seqs, g, sm = p126
    dg = path_device_graph(g)
    assert dg.paths_number == 126
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(seqs, pad_to=256)
    assert pallas_pathwise_bigp.eligible_bigp(dg, sm.table, seq.shape[1])
    ref = np.asarray(
        pathwise_engine._fill_pathwise(dg, table, seq, jnp.bool_(semiglobal))
    )
    got = np.asarray(
        pallas_pathwise_bigp.fill_pathwise_bigp(
            dg, table, seq, semiglobal, interpret=True
        )
    )
    assert (ref == got).all()


@pytest.mark.parametrize("mode8", [True, False])
def test_bigp_rev_bit_exact_p126(p126, mode8):
    from recgraph_tpu.ops import recombination_engine

    seqs, g, sm = p126
    rg = g.reverse()
    dgr = recombination_engine.rev_device_graph(rg)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(seqs, pad_to=256)
    assert pallas_pathwise_bigp.eligible_rev_bigp(dgr, sm.table, seq.shape[1])
    ref = np.asarray(
        recombination_engine._fill_pathwise_rev(dgr, table, seq, L,
                                                jnp.bool_(mode8))
    )
    got = np.asarray(
        pallas_pathwise_bigp.fill_pathwise_rev_bigp(
            dgr, table, seq, L, mode8, interpret=True
        )
    )
    assert (ref == got).all()


def test_bigp_bit_exact_small_p(example_paths):
    """Single-tile degenerate case (P=23 -> one 32-path tile)."""
    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PathGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    sm = ScoreMatrix.create("none", 2, -4)
    dg = path_device_graph(g)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(seqs[:8])
    ref = np.asarray(
        pathwise_engine._fill_pathwise(dg, table, seq, jnp.bool_(False))
    )
    got = np.asarray(
        pallas_pathwise_bigp.fill_pathwise_bigp(
            dg, table, seq, False, interpret=True
        )
    )
    assert (ref == got[:, :, :, : ref.shape[3]]).all()
