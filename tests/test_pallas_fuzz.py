"""Interpret-mode fuzz for the Pallas kernels vs their XLA engines.

The golden/CLI tests exercise the Pallas kernels only on the example
graph; random DAGs hit the structure the kernels specialise on —
multi-group pathwise rows (Gd > 1 staging), far-predecessor DMAs,
multi-pred start-row sweeps — so each kernel is pinned bit-exact here
on a few seeds too.  (On-TPU dispatch is byte-pinned by the golden CLI
runs; interpret semantics are identical.)
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.graph.poagraph import PoaGraph
from recgraph_tpu.ops import (
    pallas_gap_global,
    pallas_gap_local,
    pallas_pathwise,
    pallas_poa_global2,
    pathwise_engine,
    poa_engine,
    poa_gap_engine,
    recombination_engine,
)
from recgraph_tpu.ops.encode import (
    encode_reads, encode_read_aux, path_device_graph, poa_device_graph,
)
from recgraph_tpu.scoring import ScoreMatrix

from test_fuzz_random_graphs import random_gfa, random_read

SEEDS = [101, 202]


def _setup(seed, n_nodes=24, n_paths=4):
    rng = random.Random(seed)
    gfa = random_gfa(rng, n_nodes=n_nodes, n_paths=n_paths, cover_all=True)
    reads = [random_read(rng, gfa) for _ in range(8)]
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seq, L = encode_reads(reads)
    return gfa, reads, sm, table, seq, L


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_pallas_global_v2(seed):
    gfa, reads, sm, table, seq, L = _setup(seed)
    g = PoaGraph.from_gfa(gfa)
    dg = poa_device_graph(g)
    bta = encode_read_aux([100] * len(reads))
    ref = [np.asarray(x) for x in poa_engine._fill_global(dg, table, seq, L, bta)]
    got = [
        np.asarray(x)
        for x in pallas_poa_global2.fill_global_v2(
            dg, table, seq, L, bta, Bt=8, interpret=True
        )
    ]
    assert (ref[0] == got[0]).all() and (ref[1] == got[1]).all()
    lf, rt = ref[4], ref[5]
    for b in range(len(reads)):
        for i in range(dg.n - 1):
            l, r = lf[b, i], rt[b, i]
            if r > l:
                assert (ref[3][b, i, l:r] == got[3][i, b, l:r]).all(), (b, i)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_pallas_gap_kernels(seed):
    gfa, reads, sm, table, seq, L = _setup(seed)
    g = PoaGraph.from_gfa(gfa)
    dg = poa_device_graph(g)
    bta = encode_read_aux([100] * len(reads))
    Lp = seq.shape[1]
    ref = [
        np.asarray(x)
        for x in poa_gap_engine._fill_gap_global(
            dg, table, seq, L, bta, jnp.int32(-4), jnp.int32(-2)
        )[:8]
    ]
    got = [
        np.asarray(x)
        for x in pallas_gap_global.fill_gap_global_v2(
            dg, table, seq, L, bta, -4, -2, Bt=8, interpret=True
        )
    ]
    assert (ref[0] == got[0]).all()
    lf, rt = ref[6], ref[7]
    for b in range(len(reads)):
        for i in range(dg.n - 1):
            l, r = lf[b, i], rt[b, i]
            if r > l:
                for k, kk in ((3, 3), (4, 4), (5, 5)):
                    assert (ref[k][b, i, l:r] == got[kk][i, b, l:r]).all()

    ref3 = [
        np.asarray(x)
        for x in poa_gap_engine._fill_gap_local(
            dg, table, seq, L, jnp.int32(-4), jnp.int32(-2)
        )
    ]
    got3 = [
        np.asarray(x)
        for x in pallas_gap_local.fill_gap_local_v2(
            dg, table, seq, L, -4, -2, Bt=8, interpret=True
        )
    ]
    assert (ref3[0] == got3[0]).all()
    assert (ref3[1] == got3[1]).all() and (ref3[2] == got3[2]).all()
    for k in (3, 4, 5):
        assert (ref3[k] == got3[k].transpose(1, 0, 2)[:, :, :Lp]).all()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_pallas_pathwise(seed):
    gfa, reads, sm, table, seq, L = _setup(seed)
    pg = PathGraph.from_gfa(gfa)
    pdg = path_device_graph(pg)
    for semi in (False, True):
        ref = np.asarray(
            pathwise_engine._fill_pathwise(pdg, table, seq, jnp.bool_(semi))
        )
        got = np.asarray(
            pallas_pathwise.fill_pathwise_v1(pdg, table, seq, semi,
                                             interpret=True)
        )
        assert (ref == got[:, :, :, : ref.shape[3]]).all(), semi

    rg = pg.reverse()
    try:
        dgr = recombination_engine.rev_device_graph(rg)
    except NotImplementedError:
        pytest.skip("reverse-fill edge case graph")
    for mode8 in (True, False):
        ref = np.asarray(
            recombination_engine._fill_pathwise_rev(
                dgr, table, seq, L, jnp.bool_(mode8)
            )
        )
        got = np.asarray(
            pallas_pathwise.fill_pathwise_rev_v1(
                dgr, table, seq, L, mode8, interpret=True
            )
        )
        assert (ref == got[:, :, :, : ref.shape[3]]).all(), mode8


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_pallas_local_v5(seed):
    """v5 (compact end-rank ring) on random DAGs, unpacked and with two
    reads packed per lane-row — random graphs randomise the end-rank
    structure and the segment contents."""
    from recgraph_tpu.ops import pallas_poa_v5

    gfa, reads, sm, table, seq, L = _setup(seed)
    g = PoaGraph.from_gfa(gfa)
    dg = poa_device_graph(g)
    ref = [np.asarray(x) for x in poa_engine._fill_local(dg, table, seq, L)]
    Lp = seq.shape[1]
    got = [
        np.asarray(x)
        for x in pallas_poa_v5.fill_local_v5(
            dg, table, seq, L, Bt=8, interpret=True
        )
    ]
    assert (ref[0] == got[0]).all()
    assert (ref[1] == got[1]).all() and (ref[2] == got[2]).all()
    Lpo = got[3].shape[2]
    assert (ref[3] == got[3][: dg.n].transpose(1, 0, 2)[:, :, :Lp]).all()

    # packed: per-read width padded to 64, two per row
    S = -(-Lp // 64) * 64
    seqp, Lp_ = encode_reads(reads, pad_to=S)
    refp = [np.asarray(x) for x in poa_engine._fill_local(dg, table, seqp, Lp_)]
    gotp = [
        np.asarray(x)
        for x in pallas_poa_v5.fill_local_v5(
            dg, table, seqp, Lp_, Bt=4, interpret=True, pack=2
        )
    ]
    assert (refp[0] == gotp[0]).all()
    assert (refp[1] == gotp[1]).all() and (refp[2] == gotp[2]).all()
    assert (refp[3] == gotp[3][: dg.n].transpose(1, 0, 2)).all()
