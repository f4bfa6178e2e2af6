"""Pallas local-POA kernel vs the XLA scan engine (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from recgraph_tpu.graph.poagraph import PoaGraph
from recgraph_tpu.io import fasta, gfa
from recgraph_tpu.oracle import gaf_emit
from recgraph_tpu.ops import pallas_poa, poa_engine
from recgraph_tpu.ops.encode import encode_reads, poa_device_graph
from recgraph_tpu.scoring import ScoreMatrix


def test_pallas_local_matches_xla(example_paths):
    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    assert pallas_poa.max_pred_span(g) < pallas_poa.RING
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    reads = seqs[:8]
    seq, L = encode_reads(reads)

    bv, bi, bj, packed = pallas_poa.fill_local(
        dg, table, seq, L, Bt=8, interpret=True
    )
    bv2, bi2, bj2, packed2 = poa_engine._fill_local(dg, table, seq, L)
    np.testing.assert_array_equal(np.asarray(bv), np.asarray(bv2))
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi2))
    np.testing.assert_array_equal(np.asarray(bj), np.asarray(bj2))
    np.testing.assert_array_equal(
        np.asarray(packed).transpose(1, 0, 2), np.asarray(packed2)
    )


def test_pallas_global_matches_xla(example_paths):
    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    reads = seqs[:8]
    seq, L = encode_reads(reads)
    Lp = seq.shape[1]
    bta = jnp.asarray([int(1 + 0.01 * len(s)) for s in reads], jnp.int32)

    score, lrow, lcol, packed = pallas_poa.fill_global(
        dg, table, seq, L, bta, Bt=8, interpret=True
    )
    s2, lr2, lc2, packed2, lefts2, rights2 = poa_engine._fill_global(
        dg, table, seq, L, bta
    )
    np.testing.assert_array_equal(np.asarray(score), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(lrow), np.asarray(lr2))
    np.testing.assert_array_equal(np.asarray(lcol), np.asarray(lc2))
    pk = np.asarray(packed).transpose(1, 0, 2)
    np.testing.assert_array_equal(pk[:, :, :Lp], np.asarray(packed2))
    np.testing.assert_array_equal(pk[:, :, Lp], np.asarray(lefts2))
    np.testing.assert_array_equal(pk[:, :, Lp + 1], np.asarray(rights2))


def test_pallas_local_v2_matches_xla_both_dtypes(example_paths):
    from recgraph_tpu.ops import pallas_poa_v2

    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(seqs[:8])
    bv2, bi2, bj2, packed2 = poa_engine._fill_local(dg, table, seq, L)
    for dt in (jnp.int32, jnp.int16):
        bv, bi, bj, packed = pallas_poa_v2.fill_local_v2(
            dg, table, seq, L, Bt=8, R=8, interpret=True, dtype=dt
        )
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(bv2))
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi2))
        np.testing.assert_array_equal(np.asarray(bj), np.asarray(bj2))
        pk = np.asarray(packed)[: g.n].astype(np.int32).transpose(1, 0, 2)
        np.testing.assert_array_equal(pk, np.asarray(packed2))


def test_batch_padding_matches_unpadded(example_paths):
    """fill_local_best pads non-multiple-of-8 batches before the Pallas
    kernel; the padded+sliced results must equal the unpadded fill."""
    from recgraph_tpu.ops import pallas_poa_v2
    from recgraph_tpu.ops.poa_engine import _pad_batch

    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    B = 12
    seq, L = encode_reads(seqs[:B])
    Bp = -(-B // 8) * 8
    seq_p, L_p = _pad_batch((seq, L), B, Bp)
    assert seq_p.shape[0] == Bp
    np.testing.assert_array_equal(np.asarray(seq_p[:B]), np.asarray(seq))
    bv, bi, bj, packed = pallas_poa_v2.fill_local_v2(
        dg, table, seq_p, L_p, Bt=8, R=8, interpret=True
    )
    bv2, bi2, bj2, packed2 = poa_engine._fill_local(dg, table, seq, L)
    np.testing.assert_array_equal(np.asarray(bv[:B]), np.asarray(bv2))
    np.testing.assert_array_equal(np.asarray(bi[:B]), np.asarray(bi2))
    np.testing.assert_array_equal(np.asarray(bj[:B]), np.asarray(bj2))
    pk = np.asarray(packed[:, :B])[: g.n].transpose(1, 0, 2)
    np.testing.assert_array_equal(pk, np.asarray(packed2))


def test_pallas_local_v5_matches_xla(example_paths):
    """v5 (128-aligned lanes + radix-4 chain + int16/int32 ring) must be
    bit-identical to the XLA fill; pad lanes must be O cells."""
    from recgraph_tpu.ops import pallas_poa_v5

    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    reads = seqs[:8]
    seq, L = encode_reads(reads)
    for smname in ("none", "HOXD70"):
        sm = ScoreMatrix.create(smname, 2, -4)
        table = jnp.asarray(sm.table, dtype=jnp.int32)
        ref = poa_engine._fill_local(dg, table, seq, L)
        for ring16 in (False, True):
            out = pallas_poa_v5.fill_local_v5(
                dg, table, seq, L, Bt=8, interpret=True, ring16=ring16
            )
            np.testing.assert_array_equal(ref[0], out[0])
            np.testing.assert_array_equal(ref[1], out[1])
            np.testing.assert_array_equal(ref[2], out[2])
            rp, op = np.asarray(ref[3]), np.asarray(out[3])
            n, Lp = dg.n, rp.shape[2]
            np.testing.assert_array_equal(
                np.transpose(op[:n, :, :Lp], (1, 0, 2)), rp[:, :n]
            )
            assert (op[:, :, Lp:] % 16 == 0).all()  # pad lanes: O direction


def test_pallas_local_v5_packed(example_paths):
    """Two reads packed per lane-row (the dispatched configuration:
    64-granulated per-read width) must be bit-identical to the XLA
    fill — segment guards keep the prefix chains independent."""
    from recgraph_tpu.ops import pallas_poa_v5

    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    # full-length reads at S=192 and mixed lengths at S=128
    # one ring dtype per config (both dtypes are covered by the
    # unpacked v5 test and the v5 fuzz; fewer distinct compiles keeps
    # the serial suite under the XLA-CPU compile-accumulation limit)
    for (reads, S), ring16 in (((seqs[:8], 192), True),
                               (([s[:100] for s in seqs[:4]]
                                 + [s[:60] for s in seqs[4:8]], 128), False)):
        seq, L = encode_reads(reads, pad_to=S)
        ref = poa_engine._fill_local(dg, table, seq, L)
        out = pallas_poa_v5.fill_local_v5(
            dg, table, seq, L, Bt=4, interpret=True, ring16=ring16,
            pack=2,
        )
        np.testing.assert_array_equal(ref[0], out[0])
        np.testing.assert_array_equal(ref[1], out[1])
        np.testing.assert_array_equal(ref[2], out[2])
        rp, op = np.asarray(ref[3]), np.asarray(out[3])
        n = dg.n
        np.testing.assert_array_equal(
            np.transpose(op[:n], (1, 0, 2)), rp[:, :n]
        )


def test_global_v2_bit_exact(example_paths):
    """pallas_poa_global2 vs the XLA engine, both ring widths."""
    from recgraph_tpu.ops import pallas_poa_global2
    from recgraph_tpu.ops.encode import encode_read_aux

    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(seqs[:8])
    Lp = seq.shape[1]
    bta = encode_read_aux([100] * 8)
    ref = [np.asarray(x) for x in poa_engine._fill_global(dg, table, seq, L, bta)]
    sc, lf, rt = ref[0], ref[4], ref[5]
    for ring16 in (True, False):
        got = [
            np.asarray(x)
            for x in pallas_poa_global2.fill_global_v2(
                dg, table, seq, L, bta, Bt=8, interpret=True, ring16=ring16
            )
        ]
        assert (sc == got[0]).all() and (ref[1] == got[1]).all()
        assert (ref[2] == got[2]).all()
        pk2 = got[3]
        assert (lf[:, : dg.n - 1] == pk2[: dg.n - 1, :, Lp].T).all()
        assert (rt[:, : dg.n - 1] == pk2[: dg.n - 1, :, Lp + 1].T).all()
        for b in range(8):
            for i in range(dg.n - 1):
                l, r = lf[b, i], rt[b, i]
                if r > l:
                    assert (ref[3][b, i, l:r] == pk2[i, b, l:r]).all(), (b, i)


def test_global_v2_packed(example_paths):
    """Two reads packed per lane-row in the banded global kernel must
    be bit-identical to the XLA fill — segment-local jloc guards keep
    the chains/cumsums independent and every band scalar (left/right/
    bsp/lvals, sink captures) goes per-segment.  Mixed lengths cover
    the per-segment L/band interplay."""
    from recgraph_tpu.ops import pallas_poa_global2
    from recgraph_tpu.ops.encode import encode_read_aux

    reads_fa, graph_gfa = example_paths
    seqs, _ = fasta.get_sequences(reads_fa)
    g = PoaGraph.from_gfa(gfa.parse_gfa(graph_gfa))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    for reads in (seqs[:8],
                  [s[:100] for s in seqs[:4]] + [s[:60] for s in seqs[4:8]]):
        seq, L = encode_reads(reads)
        Lp = seq.shape[1]
        bta = encode_read_aux([100] * 8)
        ref = [np.asarray(x)
               for x in poa_engine._fill_global(dg, table, seq, L, bta)]
        got = [np.asarray(x)
               for x in pallas_poa_global2.fill_global_v2(
                   dg, table, seq, L, bta, Bt=4, interpret=True, pack=2)]
        assert (ref[0] == got[0]).all() and (ref[1] == got[1]).all()
        assert (ref[2] == got[2]).all()
        lf, rt = ref[4], ref[5]
        pk2 = got[3]
        assert (lf[:, : dg.n - 1] == pk2[: dg.n - 1, :, Lp].T).all()
        assert (rt[:, : dg.n - 1] == pk2[: dg.n - 1, :, Lp + 1].T).all()
        for b in range(8):
            for i in range(dg.n - 1):
                left, r = lf[b, i], rt[b, i]
                if r > left:
                    assert (ref[3][b, i, left:r]
                            == pk2[i, b, left:r]).all(), (b, i)
