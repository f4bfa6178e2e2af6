"""Opt-in windowed long-read mode 8 (ops/recombination_window).

The windowed pair is gated behind RECGRAPH_REC_WINDOW=1 (see the
run_batch_walks gate comment: windowed follower cells can over- AND
under-estimate, so the default long-read mode-8 path stays full-width).
Pinned here:

- the gate: without the env var, long reads run full-width (trivially
  byte-equal);
- the reverse windowed fill is EXACT at full coverage (W >= Lp);
- with the env var, pure-haplotype long reads ride the windowed pair
  byte-equal to full-width, and the guard/rescore machinery demotes
  anything it cannot certify to the full-width fallback (output stays
  valid GAF with a verified score either way).
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax
import jax.numpy as jnp

from recgraph_tpu.graph.pathgraph import PathGraph
from recgraph_tpu.io import gfa
from recgraph_tpu.ops import (
    pathwise_engine,
    recombination_engine as rec,
    recombination_window as rw,
)
from recgraph_tpu.ops.encode import encode_reads
from recgraph_tpu.scoring import ScoreMatrix


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from make_synthetic import make

    d = str(tmp_path_factory.mktemp("recwin"))
    make(d, n_back=250, n_reads=1, seed=11)
    rng = random.Random(5)
    walks, segs = {}, {}
    for ln in open(os.path.join(d, "graph.gfa")):
        f = ln.rstrip("\n").split("\t")
        if f[0] == "P":
            walks[f[1]] = [int(x[:-1]) for x in f[2].split(",")]
        elif f[0] == "S":
            segs[int(f[1])] = f[2]
    keys = sorted(walks)
    pure, glued = [], []
    for k in range(4):
        s = "".join(segs[x] for x in walks[keys[k % len(keys)]])
        pure.append("$" + "".join(
            (rng.choice("ACGT") if rng.random() < 0.02 else c) for c in s
        ))
        s1 = "".join(segs[x] for x in walks[keys[k % len(keys)]])
        s2 = "".join(segs[x] for x in walks[keys[(k + 1) % len(keys)]])
        s = s1[: len(s1) // 2] + s2[len(s2) // 2 :]
        glued.append("$" + "".join(
            (rng.choice("ACGT") if rng.random() < 0.02 else c) for c in s
        ))
    g = PathGraph.from_gfa(
        gfa.parse_gfa(os.path.join(d, "graph.gfa")), is_reversed=False
    )
    return g, g.reverse(), pure, glued


def _records(reads, g, rg, sm, **kw):
    return [
        r.to_string()
        for r in rec.run_batch_walks(8, reads, g, rg, sm, 4, 0.1, 1.0, **kw)
    ]


def test_rev_windowed_fill_exact_at_full_coverage(corpus):
    g, rg, pure, glued = corpus
    dgr = rec.rev_device_graph(rg)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    reads = (pure + glued)[:4]
    seq, L = encode_reads(reads, pad_to=512)
    full = np.asarray(
        rec._fill_pathwise_rev(dgr, table, seq, L, jnp.bool_(True))
    )
    Awr, wsr, Rr = rw._fill_pathwise_rev_win(dgr, table, seq, L, 512)
    Awr = np.asarray(Awr)
    assert (np.asarray(wsr) == 0).all()
    for b in range(len(reads)):
        Lr = int(np.asarray(L)[b])
        np.testing.assert_array_equal(
            Awr[b, :, :, 1:Lr], full[b, :, :, 1:Lr]
        )


def test_gate_defaults_to_full_width(corpus, monkeypatch):
    g, rg, pure, glued = corpus
    sm = ScoreMatrix.create("none", 2, -4)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 256)
    monkeypatch.delenv("RECGRAPH_REC_WINDOW", raising=False)

    def boom(*a, **k):
        raise AssertionError("windowed mode-8 ran without the opt-in env")

    monkeypatch.setattr(rec, "_run_batch_walks_win8", boom)
    recs = _records(pure[:2], g, rg, sm)
    assert len(recs) == 2


def test_windowed_pure_haplotype_byte_equal(corpus, monkeypatch):
    g, rg, pure, glued = corpus
    sm = ScoreMatrix.create("none", 2, -4)
    full = _records(pure, g, rg, sm, no_window=True)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 256)
    monkeypatch.setenv("RECGRAPH_REC_WINDOW", "1")
    pathwise_engine._pw_w_hint.clear()
    win = _records(pure, g, rg, sm)
    assert win == full


def test_windowed_glued_reads_stay_valid(corpus, monkeypatch):
    """Glued-haplotype recombinants exercise the guard/rescore
    demotion machinery: every record must either match full-width or
    be a valid verified-score alignment (the documented opt-in
    contract); the demotion counters must account for the rest."""
    from recgraph_tpu.metrics import FALLBACKS

    g, rg, pure, glued = corpus
    sm = ScoreMatrix.create("none", 2, -4)
    full = _records(glued, g, rg, sm, no_window=True)
    monkeypatch.setattr(pathwise_engine, "LONG_READ_LP", 256)
    monkeypatch.setenv("RECGRAPH_REC_WINDOW", "1")
    pathwise_engine._pw_w_hint.clear()
    win = _records(glued, g, rg, sm)
    assert len(win) == len(full)
    for w in win:
        f = w.split("\t")
        assert len(f) >= 13 and f[4] == "+"
