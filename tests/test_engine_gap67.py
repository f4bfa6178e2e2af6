"""Device engine for modes 6/7 vs the scalar oracle.

The full-corpus pipeline goldens (test_goldens.test_golden_mode67_*)
already pin the device path end to end; these tests add cell-level
delta-form equality (dpm/x/y) and exec-level equality on random DAGs
whose multi-pred start rows / re-alpha'd blocks the example corpus
under-exercises.
"""

import random

import numpy as np
import pytest

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.oracle import pathwise_gap as og
from recgraph_tpu.ops import pathwise_gap_engine as ge
from recgraph_tpu.ops.encode import encode_reads
from recgraph_tpu.scoring import ScoreMatrix

from test_fuzz_random_graphs import random_gfa, random_read


def _assert_fill_equal(g, sm, reads, o, e, semi):
    seq, _ = encode_reads(reads)
    meta = ge.gap_meta(g)
    Dm, X, Y = ge.fill_gap_device(g, sm, seq, o, e, semi, meta)
    Dm, X, Y = np.asarray(Dm), np.asarray(X), np.asarray(Y)
    for b, s in enumerate(reads):
        Ls = len(s)
        ref = og.fill_fast(s, g, sm, o, e, semi)
        for dev, r in zip((Dm, X, Y), ref):
            np.testing.assert_array_equal(
                dev[:, b, :, :Ls].transpose(0, 2, 1), r
            )


@pytest.mark.parametrize("semi", [False, True])
def test_gap67_device_fill_example(example_graph_small, semi):
    g, sm, reads = example_graph_small
    _assert_fill_equal(g, sm, reads, -4, -2, semi)


@pytest.mark.parametrize("semi", [False, True])
def test_gap67_device_walk_vs_plane_walk(example_graph_small, semi):
    """The on-device walk (_walk_gap) vs the host plane walk
    (walk_gap_planes, the readable spec of the same state machine) —
    both must produce the oracle's exact lines."""
    import jax

    g, sm, reads = example_graph_small
    o, e = -4, -2
    mode = 7 if semi else 6
    device = ge.run_batch(mode, reads, g, sm, o, e)
    meta = ge.gap_meta(g)
    seq, _ = encode_reads(reads)
    Dm, X, Y = ge.fill_gap_device(g, sm, seq, o, e, semi, meta)
    finalcol = np.asarray(jax.device_get(ge.final_gap_column(
        Dm, jnp_lengths(reads))))
    bps, nodes = [], []
    for b in range(len(reads)):
        if semi:
            node, bp = ge._endings_gap_semi(finalcol[b], g)
        else:
            bp, node = ge._endings_gap_global(finalcol[b], g), 0
        bps.append(bp)
        nodes.append(node)
    planes = jax.device_get(ge.extract_gap_planes(
        Dm, X, Y, jnp_arr(meta.alphas), jnp_arr(bps)
    ))
    for b, s in enumerate(reads):
        pl = tuple(np.asarray(p[b][:, : len(s)]) for p in planes)
        line = ge.walk_gap_planes(pl, g, bps[b], semi, nodes[b])
        assert (bps[b], line) == device[b]


def jnp_arr(x):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(x, dtype=np.int32))


def jnp_lengths(reads):
    import jax.numpy as jnp

    return jnp.asarray([len(s) for s in reads], dtype=jnp.int32)


@pytest.mark.parametrize("seed", [1, 2])
def test_gap67_device_fuzz(seed):
    rng = random.Random(1000 + seed)
    gfa = random_gfa(rng, cover_all=True)
    g = PathGraph.from_gfa(gfa)
    sm = ScoreMatrix.match_mismatch(2, -4)
    reads = [random_read(rng, gfa) for _ in range(2)]
    o, e = -4, -2
    for semi in (False, True):
        _assert_fill_equal(g, sm, reads, o, e, semi)
        try:
            res = ge.run_batch(7 if semi else 6, reads, g, sm, o, e)
        except RuntimeError:
            # degenerate input: the reference's traceback would hang
            # (semiglobal best path not covering the walk); the device
            # walk surfaces it instead
            continue
        for b, s in enumerate(reads):
            ref = (og.exec_gap_semiglobal if semi else og.exec_gap_global)(
                s, g, sm, o, e
            )
            assert res[b] == ref


@pytest.fixture(scope="module")
def example_graph_small():
    import os

    from recgraph_tpu.io import fasta, gfa

    root = os.path.join(os.path.dirname(__file__), "..")
    parsed = gfa.parse_gfa(os.path.join(root, "example", "graph.gfa"))
    g = PathGraph.from_gfa(parsed)
    sm = ScoreMatrix.create("none", 2, -4)
    seqs, _ = fasta.get_sequences(os.path.join(root, "example", "reads.fa"))
    return g, sm, seqs[:2]
