"""Windowed long-read pathwise engine (mode 4) vs the exact full-width fill.

The reference's pathwise DP is FULL-width (pathwise_alignment.rs:16 —
O(n*L*P) memory); the windowed engine (ops/pathwise_window) is
beat-the-reference capability, so exactness is pinned against our own
full-width engine: record byte-equality through run_batch_walks, the
lower-bound soundness invariant of the windowed plane, and the ladder /
full-width fallback plumbing.
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax.numpy as jnp

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.io import gfa
from recgraph_tpu.ops import pathwise_engine
from recgraph_tpu.ops.encode import encode_reads, path_device_graph
from recgraph_tpu.ops.pathwise_window import (
    _fill_pathwise_win,
    _final_column_win,
    _rmin,
)
from recgraph_tpu.scoring import ScoreMatrix


def _records(mode, reads, g, sm):
    return [
        r.to_string()
        for r in pathwise_engine.run_batch_walks(
            mode, ["$" + r for r in reads], g, sm
        )
    ]


@pytest.fixture(scope="module")
def long_path_corpus(tmp_path_factory):
    """~1.9 kb graph with full-span haplotype reads (>= LONG_READ_LP)."""
    from make_synthetic import make

    d = str(tmp_path_factory.mktemp("pwwin"))
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
            "".join((rng.choice("ACGT") if rng.random() < 0.02 else c) for c in s)
        )
    assert min(len(r) for r in reads) + 1 >= pathwise_engine.LONG_READ_LP
    g = PathGraph.from_gfa(gfa.parse_gfa(os.path.join(d, "graph.gfa")),
                           is_reversed=False)
    return g, reads


def test_windowed_records_byte_equal(long_path_corpus, monkeypatch):
    g, reads = long_path_corpus
    sm = ScoreMatrix.create("none", 2, -4)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1 << 30)
    full = _records(4, reads, g, sm)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1024)
    pathwise_engine._pw_w_hint.clear()
    from recgraph_tpu.metrics import FALLBACKS

    before = FALLBACKS.get("pathwise_win_fullwidth", 0)
    win = _records(4, reads, g, sm)
    assert win == full
    # the guard passed (no full-width rerun) and the W hint settled
    assert FALLBACKS.get("pathwise_win_fullwidth", 0) == before
    key = pathwise_engine._graph_hint_key(g, path_device_graph(g))
    assert pathwise_engine._pw_w_hint.get(key, 0) >= 256


def test_w_hint_keyed_by_graph_identity():
    """Two different graphs with the SAME row count must not share a
    settled-width hint (r4 ADVICE: the hint was keyed by dg.n only)."""
    import types

    g1 = types.SimpleNamespace(codes=np.arange(64, dtype=np.int32))
    g2 = types.SimpleNamespace(codes=np.arange(64, dtype=np.int32)[::-1].copy())
    dg = types.SimpleNamespace(n=64, paths_number=3)
    k1 = pathwise_engine._graph_hint_key(g1, dg)
    k2 = pathwise_engine._graph_hint_key(g2, dg)
    assert k1 != k2
    # and the same graph content maps to the same key across objects
    g3 = types.SimpleNamespace(codes=np.arange(64, dtype=np.int32))
    assert pathwise_engine._graph_hint_key(g3, dg) == k1


def test_windowed_plane_lower_bounds_full(tmp_path):
    """Soundness invariant of the chain/window/clamp arithmetic: on a
    SINGLE-path graph (no follower lanes exist, so the replay-flip
    caveat cannot fire) the in-window windowed values never exceed the
    full-width values, and a guard pass makes the final best exact.
    Multi-path graphs are covered by the record-level tests instead —
    there a follower replay flip can push values either way
    (pathwise_window module docstring caveat)."""
    rng = random.Random(23)
    seg = "".join(rng.choice("ACGT") for _ in range(1400))
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
    sm = ScoreMatrix.create("none", 2, -4)
    dg = path_device_graph(g)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    Lp = pathwise_engine._align_lp(["$" + read])
    seq, L = encode_reads(["$" + read], pad_to=Lp)
    A = np.asarray(
        pathwise_engine._fill_pathwise(dg, table, seq, jnp.bool_(False))
    )                                                       # [1, 1, n, Lp]
    W = 256
    Aw, ws, bound = _fill_pathwise_win(
        dg, table, seq, L, W, jnp.asarray(_rmin(dg))
    )
    Aw, ws = np.asarray(Aw), np.asarray(ws)                 # [1,1,n,W],[1,n]
    Lr = int(np.asarray(L)[0])
    for i in range(0, g.n - 1, 13):                         # sampled rows
        w0 = int(ws[0, i])
        cols = np.arange(w0, min(w0 + W, Lr))
        full_v = A[0, 0, i, cols]
        win_v = Aw[0, 0, i, : len(cols)]
        assert (win_v <= full_v).all(), f"row {i}"
    # and the final best is exact when the guard passes
    fc = np.asarray(_final_column_win(jnp.asarray(Aw), jnp.asarray(ws), L))
    bp, node = pathwise_engine._endings_global(fc[0], g)
    sc = int(fc[0, bp, node])
    assert sc > int(np.asarray(bound)[0]), "guard should pass on 3% noise"
    bp_f, node_f = pathwise_engine._endings_global(
        np.asarray(pathwise_engine._final_column(jnp.asarray(A), L))[0], g
    )
    assert (bp, node, sc) == (bp_f, node_f, int(A[0, bp_f, node_f, Lr - 1]))


def test_mixed_short_and_long_batch(long_path_corpus, monkeypatch):
    """Short reads riding a long-read batch stay byte-identical (their
    windows cover them whole; the guard passes trivially)."""
    g, reads = long_path_corpus
    sm = ScoreMatrix.create("none", 2, -4)
    rng = random.Random(7)
    short = [r[100:250] for r in reads[:2]]
    mixed = [reads[0], short[0], short[1]]
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1 << 30)
    full = _records(4, mixed, g, sm)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1024)
    pathwise_engine._pw_w_hint.clear()
    assert _records(4, mixed, g, sm) == full


def test_overflow_scores_route_full_width(long_path_corpus, monkeypatch):
    """When 2*Lp*max|score| >= 2^16, the windowed fill's 17-bit packed
    replay would overflow into the column field and decode as an
    OVERESTIMATE, defeating the exit-bound guard (r4 ADVICE, high).
    Such batches must never reach the windowed engine."""
    g, reads = long_path_corpus
    sm = ScoreMatrix.create("none", 1000, -2000)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1024)

    def boom(*a, **k):
        raise AssertionError("overflow batch reached the windowed engine")

    monkeypatch.setattr(pathwise_engine, "_run_batch_walks_win", boom)
    recs = _records(4, reads[:1], g, sm)
    assert len(recs) == 1


def test_ladder_rechunks_at_doubled_width(long_path_corpus, monkeypatch):
    """Every windowed fill call must respect the plane budget even after
    W doubles (r4 ADVICE, medium: the ladder reran the whole W0-sized
    chunk at up to ~Lp/2, a ~Lp/(4*W0)x budget blowout)."""
    import recgraph_tpu.ops.pathwise_window as pw

    g, reads = long_path_corpus
    sm = ScoreMatrix.create("none", 2, -4)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1 << 30)
    full = _records(4, reads, g, sm)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1024)
    pathwise_engine._pw_w_hint.clear()
    orig = pw._fill_pathwise_win
    calls = []

    def spy(dg, table, seq, L, W, rmin=None):
        calls.append((seq.shape[0], W))
        Aw, ws, bound = orig(dg, table, seq, L, W, rmin)
        if W < 1024:   # force the ladder to climb to W=1024
            return Aw, ws, bound + (1 << 20)
        return Aw, ws, bound

    monkeypatch.setattr(pw, "_fill_pathwise_win", spy)
    P, n = g.paths_number, g.n
    # 3 reads/chunk at the W0=256 planning width; 1 read at W=1024
    chunk_bytes = P * n * 512 * 4 * 3
    win = [
        r.to_string()
        for r in pathwise_engine.run_batch_walks(
            4, ["$" + r for r in reads], g, sm, chunk_bytes=chunk_bytes
        )
    ]
    assert win == full
    assert {W for _, W in calls} == {256, 512, 1024}
    for B, W in calls:
        assert B * P * n * W * 4 <= max(chunk_bytes, P * n * W * 4), (B, W)


def test_ladder_fullwidth_fallback_plumbing(long_path_corpus, monkeypatch):
    """Guard failure at every W must rerun through the exact full-width
    engine, counted in metrics — forced here by an unbeatable bound."""
    import recgraph_tpu.ops.pathwise_window as pw

    g, reads = long_path_corpus
    sm = ScoreMatrix.create("none", 2, -4)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1 << 30)
    full = _records(4, reads[:2], g, sm)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1024)
    pathwise_engine._pw_w_hint.clear()
    orig = pw._fill_pathwise_win

    def poisoned(dg, table, seq, L, W, rmin=None):
        Aw, ws, bound = orig(dg, table, seq, L, W, rmin)
        return Aw, ws, bound + (1 << 20)
    monkeypatch.setattr(pw, "_fill_pathwise_win", poisoned)
    from recgraph_tpu.metrics import FALLBACKS

    before = FALLBACKS.get("pathwise_win_fullwidth", 0)
    win = _records(4, reads[:2], g, sm)
    assert win == full
    assert FALLBACKS.get("pathwise_win_fullwidth", 0) == before + 2
    FALLBACKS["pathwise_win_fullwidth"] = before


def test_mode5_never_windowed(long_path_corpus, monkeypatch):
    """Mode 5 has no windowed variant by design (vacuous exit bound for
    column-0 starts — pathwise_window._fill_pathwise_win docstring)."""
    import recgraph_tpu.ops.pathwise_window as pw

    g, reads = long_path_corpus
    sm = ScoreMatrix.create("none", 2, -4)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1024)

    def boom(*a, **k):
        raise AssertionError("mode 5 must not dispatch the windowed fill")
    monkeypatch.setattr(pw, "_fill_pathwise_win", boom)
    recs = _records(5, reads[:1], g, sm)
    assert len(recs) == 1


def test_windowed_fuzz_vs_full(monkeypatch):
    """Random shared-node path graphs, medium reads, windowed gate
    forced low: records stay byte-equal to the full-width engine."""
    from make_synthetic import make
    import tempfile

    sm = ScoreMatrix.create("none", 2, -4)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 256)
    for seed in (3, 19):
        rng = random.Random(seed)
        with tempfile.TemporaryDirectory() as d:
            make(d, n_back=160, n_reads=1, seed=seed, n_paths=5)
            walks, segs = {}, {}
            for ln in open(os.path.join(d, "graph.gfa")):
                f = ln.rstrip("\n").split("\t")
                if f[0] == "P":
                    walks[f[1]] = [int(x[:-1]) for x in f[2].split(",")]
                elif f[0] == "S":
                    segs[int(f[1])] = f[2]
            g = PathGraph.from_gfa(
                gfa.parse_gfa(os.path.join(d, "graph.gfa")), is_reversed=False
            )
        reads = []
        for _ in range(4):
            w = walks[rng.choice(sorted(walks))]
            s = "".join(segs[x] for x in w)
            reads.append(
                "".join(
                    (rng.choice("ACGT") if rng.random() < 0.03 else c)
                    for c in s
                )
            )
        assert max(len(r) for r in reads) + 1 >= 256
        monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 1 << 30)
        full = _records(4, reads, g, sm)
        monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 256)
        pathwise_engine._pw_w_hint.clear()
        assert _records(4, reads, g, sm) == full, f"seed {seed}"
