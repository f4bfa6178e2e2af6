"""Pallas pathwise kernel vs the XLA scan engine (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.io import fasta, gfa
from recgraph_tpu.ops import pallas_pathwise, pathwise_engine
from recgraph_tpu.ops.encode import encode_reads
from recgraph_tpu.scoring import ScoreMatrix


@pytest.fixture(scope="module")
def corpus(example_paths):
    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    parsed = gfa.parse_gfa(graph_gfa)
    g = PathGraph.from_gfa(parsed)
    sm = ScoreMatrix.create("none", 2, -4)
    return seqs[:8], g, sm


@pytest.mark.parametrize("semiglobal", [False, True])
def test_pallas_pathwise_bit_exact(corpus, semiglobal):
    seqs, g, sm = corpus
    dg = pathwise_engine.path_device_graph(g)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(seqs)
    assert pallas_pathwise.eligible(dg, sm.table, -(-seq.shape[1] // 128) * 128)
    ref = np.asarray(
        pathwise_engine._fill_pathwise(dg, table, seq, jnp.bool_(semiglobal))
    )
    got = np.asarray(
        pallas_pathwise.fill_pathwise_v1(dg, table, seq, semiglobal,
                                         interpret=True)
    )
    assert (ref == got[:, :, :, : ref.shape[3]]).all()


@pytest.mark.parametrize("mode8", [True, False])
def test_pallas_pathwise_rev_bit_exact(corpus, mode8):
    from recgraph_tpu.ops import recombination_engine

    seqs, g, sm = corpus
    rg = g.reverse()
    dgr = recombination_engine.rev_device_graph(rg)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(seqs)
    ref = np.asarray(
        recombination_engine._fill_pathwise_rev(dgr, table, seq, L,
                                                jnp.bool_(mode8))
    )
    got = np.asarray(
        pallas_pathwise.fill_pathwise_rev_v1(dgr, table, seq, L, mode8,
                                             interpret=True)
    )
    assert (ref == got[:, :, :, : ref.shape[3]]).all()
