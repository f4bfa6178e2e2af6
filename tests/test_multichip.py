"""Multi-chip sharding: shard_map over the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recgraph_tpu.graph.poagraph import PoaGraph
from recgraph_tpu.io import fasta, gfa
from recgraph_tpu.ops import poa_engine
from recgraph_tpu.ops.encode import encode_reads, poa_device_graph
from recgraph_tpu.parallel import make_mesh, sharded_poa_fill
from recgraph_tpu.scoring import ScoreMatrix


@pytest.fixture(scope="module")
def problem(example_paths):
    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seqs = seqs[:8]
    seq, L = encode_reads(seqs)
    bta = jnp.asarray([int(1 + 0.01 * len(s)) for s in seqs], dtype=jnp.int32)
    return dg, table, seq, L, bta


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_mode0_matches_single_device(problem):
    dg, table, seq, L, bta = problem
    mesh = make_mesh(8)
    fill = sharded_poa_fill(mesh, mode=0)
    out_sharded = fill(dg, table, seq, L, bta)
    out_single = poa_engine._fill_global(dg, table, seq, L, bta)
    for a, b in zip(out_sharded, out_single):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_mode1_matches_single_device(problem):
    dg, table, seq, L, bta = problem
    mesh = make_mesh(8)
    fill = sharded_poa_fill(mesh, mode=1)
    out_sharded = fill(dg, table, seq, L)
    out_single = poa_engine._fill_local(dg, table, seq, L)
    for a, b in zip(out_sharded, out_single):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
