"""Golden GAF regression tests.

tests/goldens/*.gaf are the oracle's outputs for the BASELINE.json
configs on the example corpus (generated once; the oracle is the
validated port of the reference's per-cell semantics).  The production
jax engine must reproduce them byte-for-byte.
"""

import contextlib
import io
import os

import pytest

from recgraph_tpu.align.pipeline import Options, run

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

CONFIGS = {
    "mode0": dict(alignment_mode=0),
    "mode1": dict(alignment_mode=1),
    "mode1_hoxd70": dict(alignment_mode=1, matrix="HOXD70"),
    "mode2": dict(alignment_mode=2),
    "mode3": dict(alignment_mode=3),
    "mode4": dict(alignment_mode=4),
    "mode5": dict(alignment_mode=5),
}

SLOW_CONFIGS = {
    "mode8": dict(alignment_mode=8),
    "mode9": dict(alignment_mode=9),
    "mode8_R10_r2_B05": dict(
        alignment_mode=8, base_rec_cost=10, multi_rec_cost=2.0,
        rec_band_width=0.5,
    ),
}


def _run_engine(example_paths, **kw):
    reads_fa, graph_gfa = example_paths
    buf = io.StringIO()
    err = io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(err):
        run(
            Options(
                sequence_path=reads_fa, graph_path=graph_gfa, engine="jax", **kw
            )
        )
    # the goldens must be produced by the DEVICE engine, not a silent
    # oracle fallback (e.g. the r2 mesh-padding bug disabled the modes
    # 6/7 device path on multi-device hosts while the golden still passed)
    assert "device path unavailable" not in err.getvalue(), err.getvalue()
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(example_paths, name):
    golden = os.path.join(GOLDEN_DIR, f"{name}.gaf")
    if not os.path.exists(golden):
        pytest.skip("golden not generated")
    got = _run_engine(example_paths, **CONFIGS[name])
    assert got == open(golden).read()


@pytest.mark.parametrize("name", sorted(SLOW_CONFIGS))
def test_golden_recombination(example_paths, name):
    golden = os.path.join(GOLDEN_DIR, f"{name}.gaf")
    if not os.path.exists(golden):
        pytest.skip("golden not generated")
    got = _run_engine(example_paths, **SLOW_CONFIGS[name])
    assert got == open(golden).read()


@pytest.mark.parametrize("mode", [6, 7])
def test_golden_mode67_cigar_output(example_paths, mode):
    """Modes 6/7 print CIGAR + best-path lines for the FULL corpus
    (shape mirrors pathwise_alignment_gap.rs:563-573).

    Golden provenance (end-to-end chain, BASELINE.md):
    1. the first 6 reads were cross-checked against the r01 scalar
       per-cell ``fill`` (the literal port of the reference recurrence);
    2. ``fill_fast`` (which generated the full-corpus golden) is pinned
       cell-identical to scalar ``fill`` on random covered DAGs every
       run (test_fuzz_gap_fill_fast, 5 seeds x 2 reads x global/semi);
    3. since r3 the alpha/delta observables themselves are validated
       against a first-principles group-follower simulator on 250
       fuzz graphs (tests/test_group_semantics.py) — independent of
       any port's reading of the reference;
    4. the production device engine (pathwise_gap_engine) is asserted
       fallback-free here and byte-equal to this golden."""
    golden = os.path.join(GOLDEN_DIR, f"mode{mode}_full.txt")
    if not os.path.exists(golden):
        pytest.skip("golden not generated")
    got = _run_engine(example_paths, alignment_mode=mode)
    assert got == open(golden).read()
