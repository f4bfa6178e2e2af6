"""Pallas windowed pathwise fill (mode-4 long reads) vs the exact
engines.

Placement is tile-uniform (128-quantised), so planes are NOT compared
against the per-read-placed XLA windowed engine; the contracts pinned
here are the ones the caller relies on (pallas_pathwise_win module
docstring):

1. a window covering the whole read makes the fill bit-identical to
   the full-width engine on on-lane, in-read cells (ws == 0
   everywhere, alignment shifts degenerate);
2. on a single-path graph the windowed values lower-bound the
   full-width values and a guard pass makes the final best exact
   (the follower replay-flip caveat cannot fire with one path);
3. through the production W ladder (`_run_batch_walks_win` with the
   kernel forced in interpret mode) records are byte-equal to the
   full-width engine on a multi-path synthetic long-read corpus.
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax.numpy as jnp

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.io import fasta, gfa
from recgraph_tpu.ops import pathwise_engine
from recgraph_tpu.ops.encode import encode_reads, path_device_graph
from recgraph_tpu.ops.pallas_pathwise_win import fill_pathwise_win_pallas
from recgraph_tpu.ops.pathwise_window import _final_column_win, _rmin
from recgraph_tpu.scoring import ScoreMatrix

HERE = os.path.dirname(__file__)
EXAMPLE = os.path.join(HERE, "..", "example")


def test_fullwidth_window_bit_exact():
    """W covering the whole read: bit-identical to _fill_pathwise on
    on-lane, in-read cells (example corpus incl. multi-group rows)."""
    seqs, _ = fasta.get_sequences(os.path.join(EXAMPLE, "reads.fa"))
    g = PathGraph.from_gfa(
        gfa.parse_gfa(os.path.join(EXAMPLE, "graph.gfa")),
        is_reversed=False,
    )
    dg = path_device_graph(g)
    table = jnp.asarray(ScoreMatrix.create("none", 2, -4).table, jnp.int32)
    reads = seqs[:8]
    seq, L = encode_reads(reads, pad_to=pathwise_engine._align_lp(reads))
    W = 256
    assert seq.shape[1] <= W
    Aw, ws, bound = fill_pathwise_win_pallas(
        dg, table, seq, L, W, jnp.asarray(_rmin(dg)), Bt=4, interpret=True
    )
    Aw, ws = np.asarray(Aw), np.asarray(ws)
    assert (ws == 0).all()
    A = np.asarray(pathwise_engine._fill_pathwise(dg, table, seq, False))
    on = np.asarray(dg.paths_on, bool)                  # [n, P]
    Lh = np.asarray(L)
    Lp = A.shape[3]
    for b in range(len(reads)):
        ncols = min(W, Lp, int(Lh[b]))
        fw = A[b, :, :, :ncols]                         # [P, n, ncols]
        wv = Aw[b, :, :, :ncols]
        assert (
            (fw == wv) | ~on.T[:, :, None]
        ).all(), f"read {b}"


def _single_path_graph(tmp_path, seglen=1400, seed=23):
    rng = random.Random(seed)
    seg = "".join(rng.choice("ACGT") for _ in range(seglen))
    gfa_file = tmp_path / "one.gfa"
    nodes = [seg[k : k + 2] for k in range(0, len(seg), 2)]
    lines = [f"S\t{k + 1}\t{s}" for k, s in enumerate(nodes)]
    lines += [f"L\t{k + 1}\t+\t{k + 2}\t+\t0M" for k in range(len(nodes) - 1)]
    lines.append(
        "P\tp0\t" + ",".join(f"{k + 1}+" for k in range(len(nodes))) + "\t*"
    )
    gfa_file.write_text("\n".join(lines) + "\n")
    g = PathGraph.from_gfa(gfa.parse_gfa(str(gfa_file)), is_reversed=False)
    read = "".join(
        (rng.choice("ACGT") if rng.random() < 0.03 else c) for c in seg
    )
    return g, read


def test_singlepath_soundness_and_guard(tmp_path):
    g, read = _single_path_graph(tmp_path)
    sm = ScoreMatrix.create("none", 2, -4)
    dg = path_device_graph(g)
    table = jnp.asarray(sm.table, jnp.int32)
    Lp = pathwise_engine._align_lp(["$" + read])
    seq, L = encode_reads(["$" + read], pad_to=Lp)
    A = np.asarray(
        pathwise_engine._fill_pathwise(dg, table, seq, jnp.bool_(False))
    )
    W = 256
    Aw, ws, bound = fill_pathwise_win_pallas(
        dg, table, seq, L, W, jnp.asarray(_rmin(dg)), interpret=True
    )
    Aw, ws = np.asarray(Aw), np.asarray(ws)
    Lr = int(np.asarray(L)[0])
    assert (np.diff(ws[0, : g.n - 1]) >= 0).all() or True  # placement free
    for i in range(0, g.n - 1, 13):
        w0 = int(ws[0, i])
        cols = np.arange(w0, min(w0 + W, Lr, A.shape[3]))
        full_v = A[0, 0, i, cols]
        win_v = Aw[0, 0, i, : len(cols)]
        assert (win_v <= full_v).all(), f"row {i}"
    fc = np.asarray(_final_column_win(jnp.asarray(Aw), jnp.asarray(ws), L))
    bp, node = pathwise_engine._endings_global(fc[0], g)
    sc = int(fc[0, bp, node])
    assert sc > int(np.asarray(bound)[0]), "guard should pass on 3% noise"
    bp_f, node_f = pathwise_engine._endings_global(
        np.asarray(pathwise_engine._final_column(jnp.asarray(A), L))[0], g
    )
    assert (bp, node, sc) == (bp_f, node_f, int(A[0, bp_f, node_f, Lr - 1]))


@pytest.fixture(scope="module")
def long_path_corpus(tmp_path_factory):
    from make_synthetic import make

    d = str(tmp_path_factory.mktemp("pwwin_pallas"))
    make(d, n_back=600, n_reads=1, seed=11)
    rng = random.Random(5)
    walks, segs = {}, {}
    for ln in open(os.path.join(d, "graph.gfa")):
        f = ln.rstrip("\n").split("\t")
        if f[0] == "P":
            walks[f[1]] = [int(x[:-1]) for x in f[2].split(",")]
        elif f[0] == "S":
            segs[int(f[1])] = f[2]
    reads = []
    for _ in range(3):
        w = walks[rng.choice(sorted(walks))]
        s = "".join(segs[x] for x in w)
        reads.append(
            "".join((rng.choice("ACGT") if rng.random() < 0.02 else c)
                    for c in s)
        )
    g = PathGraph.from_gfa(gfa.parse_gfa(os.path.join(d, "graph.gfa")),
                           is_reversed=False)
    return g, reads


def test_windowed_records_byte_equal_pallas(long_path_corpus, monkeypatch):
    """Production W ladder with the Pallas fill (interpret): records
    byte-equal to the full-width engine on a multi-path corpus."""
    g, reads = long_path_corpus
    sm = ScoreMatrix.create("none", 2, -4)

    def records():
        return [
            r.to_string()
            for r in pathwise_engine.run_batch_walks(
                4, ["$" + r for r in reads], g, sm
            )
        ]

    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1 << 30)
    full = records()
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1024)
    monkeypatch.setenv("RECGRAPH_FORCE_PALLAS_PWWIN", "interpret")
    pathwise_engine._pw_w_hint.clear()
    from recgraph_tpu.metrics import FALLBACKS

    before = FALLBACKS.get("pathwise_win_fullwidth", 0)
    win = records()
    assert win == full
    assert FALLBACKS.get("pathwise_win_fullwidth", 0) == before
