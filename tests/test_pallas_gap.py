"""Pallas affine-gap global kernel (mode 2) vs the XLA engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from recgraph_tpu.graph.poagraph import PoaGraph
from recgraph_tpu.io import fasta, gfa
from recgraph_tpu.ops import pallas_gap_global, poa_gap_engine
from recgraph_tpu.ops.encode import encode_reads, encode_read_aux, poa_device_graph
from recgraph_tpu.scoring import ScoreMatrix


@pytest.mark.parametrize("oe", [(-4, -2), (0, -1)])
def test_gap_global_v2_bit_exact(example_paths, oe):
    o, e = oe
    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(seqs[:8])
    Lp = seq.shape[1]
    bta = encode_read_aux([100] * 8)
    ref = [
        np.asarray(x)
        for x in poa_gap_engine._fill_gap_global(
            dg, table, seq, L, bta, jnp.int32(o), jnp.int32(e)
        )[:8]
    ]
    sc, lr, lc, pk, px, py, lf, rt = ref
    for ring16 in (True, False):
        got = [
            np.asarray(x)
            for x in pallas_gap_global.fill_gap_global_v2(
                dg, table, seq, L, bta, o, e, Bt=8, interpret=True,
                ring16=ring16,
            )
        ]
        assert (sc == got[0]).all()
        assert (lr == got[1]).all() and (lc == got[2]).all()
        assert (lf[:, : dg.n - 1] == got[3][: dg.n - 1, :, Lp].T).all()
        assert (rt[:, : dg.n - 1] == got[3][: dg.n - 1, :, Lp + 1].T).all()
        for b in range(8):
            for i in range(dg.n - 1):
                l, r = lf[b, i], rt[b, i]
                if r > l:
                    assert (pk[b, i, l:r] == got[3][i, b, l:r]).all(), (b, i)
                    assert (px[b, i, l:r] == got[4][i, b, l:r]).all(), (b, i)
                    assert (py[b, i, l:r] == got[5][i, b, l:r]).all(), (b, i)


@pytest.mark.parametrize("oe", [(-4, -2), (0, -1)])
def test_gap_local_v2_bit_exact(example_paths, oe):
    from recgraph_tpu.ops import pallas_gap_local

    o, e = oe
    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(seqs[:8])
    Lp = seq.shape[1]
    ref = [
        np.asarray(x)
        for x in poa_gap_engine._fill_gap_local(
            dg, table, seq, L, jnp.int32(o), jnp.int32(e)
        )
    ]
    for ring16 in (True, False):
        got = [
            np.asarray(x)
            for x in pallas_gap_local.fill_gap_local_v2(
                dg, table, seq, L, o, e, Bt=8, interpret=True, ring16=ring16
            )
        ]
        assert (ref[0] == got[0]).all()
        assert (ref[1] == got[1]).all() and (ref[2] == got[2]).all()
        for k in (3, 4, 5):
            assert (ref[k] == got[k].transpose(1, 0, 2)[:, :, :Lp]).all(), k


def test_gap_local_v2_packed(example_paths):
    """Two reads per lane-row (the dispatched configuration) must match
    the XLA engine bit-for-bit, full-length and mixed-length."""
    from recgraph_tpu.ops import pallas_gap_local

    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    for reads, S in ((seqs[:8], 192), ([s[:90] for s in seqs[:4]]
                                       + [s[:50] for s in seqs[4:8]], 128)):
        seq, L = encode_reads(reads, pad_to=S)
        ref = [
            np.asarray(x)
            for x in poa_gap_engine._fill_gap_local(
                dg, table, seq, L, jnp.int32(-4), jnp.int32(-2)
            )
        ]
        got = [
            np.asarray(x)
            for x in pallas_gap_local.fill_gap_local_v2(
                dg, table, seq, L, -4, -2, Bt=4, interpret=True, pack=2
            )
        ]
        assert (ref[0] == got[0]).all()
        assert (ref[1] == got[1]).all() and (ref[2] == got[2]).all()
        for k in (3, 4, 5):
            assert (ref[k] == got[k].transpose(1, 0, 2)).all(), k
