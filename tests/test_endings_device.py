"""Device endings reductions (modes 4/5) vs the host oracle versions.

r5 moved _endings_global/_endings_semiglobal onto the device (the
[B, P, n] final-column fetch was the dominant mode-4 e2e transfer);
ties are the risk — the oracle picks the HIGHEST path index for the
global max-over-(results, p) and FIRST maxima elsewhere.  Fuzz with
small value ranges so ties are dense."""

import numpy as np
import pytest

import jax.numpy as jnp

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.io import gfa
from recgraph_tpu.ops import pathwise_engine as pe


@pytest.fixture(scope="module")
def graph(example_paths):
    _, graph_gfa = example_paths
    return PathGraph.from_gfa(gfa.parse_gfa(graph_gfa), is_reversed=False)


def test_endings_global_dev_fuzz(graph):
    g = graph
    rng = np.random.default_rng(7)
    P, n = g.paths_number, g.n
    fc = rng.integers(-3, 4, size=(64, P, n)).astype(np.int32)
    bp_d, node_d, sc_d = pe._endings_global_dev(
        jnp.asarray(fc), *pe._end_meta(g)
    )
    bp_d, node_d, sc_d = map(np.asarray, (bp_d, node_d, sc_d))
    for b in range(fc.shape[0]):
        bp, node = pe._endings_global(fc[b], g)
        assert (int(bp_d[b]), int(node_d[b])) == (bp, node), b
        # oracle scores read results[bp] (0 for unassigned paths)
        assert int(sc_d[b]) in (int(fc[b, bp, node]), 0)


def test_endings_semiglobal_dev_fuzz(graph):
    g = graph
    rng = np.random.default_rng(11)
    P, n = g.paths_number, g.n
    fc = rng.integers(-3, 4, size=(64, P, n)).astype(np.int32)
    on = jnp.asarray(g.paths_nodes.T)
    bp_d, node_d, sc_d = pe._endings_semiglobal_dev(jnp.asarray(fc), on)
    bp_d, node_d, sc_d = map(np.asarray, (bp_d, node_d, sc_d))
    for b in range(fc.shape[0]):
        bp, node = pe._endings_semiglobal(fc[b], g)
        assert (int(bp_d[b]), int(node_d[b])) == (bp, node), b
        assert int(sc_d[b]) == int(fc[b, bp, node])
