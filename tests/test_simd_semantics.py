"""SIMD-path semantics of the reference binary (modes 0/1).

On AVX2 hosts the reference dispatches modes 0/1 to ``exec_simd``
(main.rs:58,110), whose tie rules / band handling diverge from the
scalar path our goldens and production engines pin (see
oracle/poa_simd.py's docstring for the cited divergence list).  These
tests pin the SIMD variant as a second oracle and enumerate exactly
where the two binary paths disagree on the example corpus, so
BASELINE.md can state the equality target per mode.
"""

import os

import numpy as np
import pytest

from recgraph_tpu.align.pipeline import _hofp_ids
from recgraph_tpu.graph.poagraph import PoaGraph
from recgraph_tpu.io import fasta, gfa
from recgraph_tpu.oracle import gaf_emit, poa, poa_simd
from recgraph_tpu.scoring import ScoreMatrix

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def corpus():
    seqs, names = fasta.get_sequences(os.path.join(ROOT, "example", "reads.fa"))
    g = PoaGraph.from_gfa(gfa.parse_gfa(os.path.join(ROOT, "example", "graph.gfa")))
    sm = ScoreMatrix.create("none", 2, -4)
    return seqs, names, g, sm, _hofp_ids(g)


# Reads whose mode-1 GAF is byte-identical under scalar and SIMD
# semantics (no mismatch in the alignment, no affected tie).  Every
# other read diverges — mostly via divergence 7 (SIMD residue_matches
# counts mismatching diagonal steps) plus tie-order path differences.
MODE1_SAME = {17, 47, 50}


def test_mode1_simd_divergence_set(corpus):
    """Enumerate scalar-vs-SIMD GAF divergence for mode 1 on example/;
    scores must agree everywhere (tie rules never change a max)."""
    seqs, names, g, sm, hofp = corpus
    golden = open(os.path.join(ROOT, "tests", "goldens", "mode1_simd.gaf")).read().splitlines()
    same = set()
    for k, (s, nm) in enumerate(zip(seqs, names)):
        st_simd = poa_simd.local_simd(s, g, sm)
        st_sc = poa.local_full(s, g, sm)
        assert int(st_simd.score) == int(st_sc.score)
        line_simd = poa_simd.gaf_of_local_poa_simd(st_simd, s, nm, False, hofp).to_string()
        line_sc = gaf_emit.gaf_of_local_poa(st_sc, s, nm, False, hofp).to_string()
        assert line_simd == golden[k]
        if line_simd == line_sc:
            same.add(k)
    assert same == MODE1_SAME


def test_mode0_simd_default_band_escapes(corpus):
    """With default -b 1 -f 0.01 the reference's AVX2 mode 0 emits an
    EMPTY GAF for every read of the example corpus: its full-width
    min_score-initialised rows steer the 8-widened band differently
    from the scalar fallback formulas, and the traceback escapes the
    computed corridor (gaf_output.rs:777-780 then 855-858).  The
    scalar path (our golden target) emits real alignments."""
    seqs, names, g, sm, hofp = corpus
    for k in range(0, len(seqs), 7):
        s, nm = seqs[k], names[k]
        bta = int(1 + 0.01 * len(s))
        st_simd = poa_simd.global_simd(s, g, sm, bta)
        st_sc = poa.global_banded(s, g, sm, bta)
        rec = poa_simd.gaf_of_global_abpoa_simd(st_simd, s, nm, False, hofp, g.lnz)
        assert rec.query_name == "" and rec.path == [0]  # GAFStruct::new()
        assert int(st_simd.score) != int(st_sc.score)


def test_mode0_simd_full_band_scores_match_scalar(corpus):
    """Port validation: when the band covers the whole matrix the two
    paths compute the same DP maxima (tie rules cannot change a max,
    and no fallback/min_score read ever fires), so scores must be
    equal and no walk may escape."""
    seqs, names, g, sm, hofp = corpus
    for k in range(0, len(seqs), 11):
        s, nm = seqs[k], names[k]
        st_simd = poa_simd.global_simd(s, g, sm, 5000)
        st_sc = poa.global_banded(s, g, sm, 5000)
        assert int(st_simd.score) == int(st_sc.score)
        rec = poa_simd.gaf_of_global_abpoa_simd(st_simd, s, nm, False, hofp, g.lnz)
        assert rec.query_name == nm


def _tiny_graph(nodes, edges):
    """Build a PoaGraph from (id, seq) nodes + (from, to) edges."""
    from recgraph_tpu.io.gfa import Gfa

    gfa = Gfa()
    gfa.segments = {i: s for i, s in nodes}
    gfa.edges = list(edges)
    return PoaGraph.from_gfa(gfa)


def test_d_u_tie_goes_to_u_in_simd_block():
    """Divergence 1: on d == u the scalar path takes D
    (utils::get_max_d_u_l), the SIMD block takes U (strict
    _CMP_GT_OS at local_poa.rs:50).  A mismatch (-1) equals
    gap+gap/2 fodder with gap = -2, producing d == u cells."""
    g = _tiny_graph([(1, "ACGT"), (2, "ACGT")], [(1, 2)])
    sm = ScoreMatrix.match_mismatch(2, -1)  # gap = 2*mis = -2
    seq = "$" + "AATAAGGT"  # 9 chars -> one full SIMD block (cols 1-8)
    st_sc = poa.local_full(seq, g, sm)
    st_simd = poa_simd.local_simd(seq, g, sm)
    assert int(st_sc.score) == int(st_simd.score)
    n, L = g.n, len(seq)
    sc_dirs = [[d for (_, d) in row] for row in st_sc.path]
    hits = []
    for i in range(1, n - 1):
        for j in range(1, L):
            v = st_simd.pathv[i, j]
            d_simd = 0 if v == 0.0 else poa_simd._decode(v)[1]
            if d_simd == 2 and sc_dirs[i][j] in ("D", "d"):
                hits.append((i, j))
    assert hits, "no D->U tie divergence found on the tie construction"


def test_f32_path_decode_roundtrip():
    """Divergence 4: the f32 pred.dir encoding decodes via shortest
    round-trip formatting + split on '.'; exact for all pred values in
    our graphs' range."""
    for pred in [0, 1, 7, 57, 1330, 9999, 100000]:
        for dcode, move in ((1, poa_simd._D_MOVE), (2, poa_simd._U_MOVE), (3, poa_simd._L_MOVE)):
            v = np.float32(np.float32(pred) + move)
            p, d = poa_simd._decode(v)
            assert (p, d) == (pred, dcode)
