"""Reproducible wide fuzz sweep: device engines vs the scalar oracle.

    python tools/fuzz_sweep.py [n_seeds] [start_seed]

Runs the same property checks as tests/test_fuzz_random_graphs.py over
a much wider seed range.  Each chunk of seeds runs in a fresh
subprocess: long-lived XLA-CPU processes that compile many hundreds of
distinct tiny shapes can eventually segfault in fusion codegen
(CLAUDE.md "Known upstream issues"), and recycling the process keeps
the sweep healthy.  This script is the reproducible form of the
"wide fuzz" coverage claim in STATUS.md.
"""

import subprocess
import sys

CHUNK = 25

_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")  # env alone is ignored (CLAUDE.md)
import random, sys
sys.path.insert(0, "tests")
from test_fuzz_random_graphs import random_gfa, random_read
from recgraph_tpu.graph.pathgraph import PathGraph, nodes_displacement_matrix
from recgraph_tpu.graph.poagraph import PoaGraph
from recgraph_tpu.oracle import gaf_emit, pathwise, poa, recombination as ro
from recgraph_tpu.ops import pathwise_engine, poa_engine, recombination_engine
from recgraph_tpu.scoring import ScoreMatrix

start, stop = int(sys.argv[1]), int(sys.argv[2])
fails = 0
for seed in range(start, stop):
    rng = random.Random(seed)
    gfa = random_gfa(rng, n_nodes=rng.choice([8, 12, 16, 24]),
                     n_paths=rng.choice([2, 3, 4]), cover_all=True)
    gp = PoaGraph.from_gfa(gfa)
    g = PathGraph.from_gfa(gfa)
    rg = g.reverse()
    sm = (ScoreMatrix.create("HOXD70", 2, -4) if seed % 2
          else ScoreMatrix.match_mismatch(2, -4))
    sm_mm = ScoreMatrix.match_mismatch(2, -4)
    reads = [random_read(rng, gfa) for _ in range(2)]
    btas = [int(1 + 0.1 * len(s)) for s in reads]
    emitters = {0: gaf_emit.gaf_of_global_abpoa, 1: gaf_emit.gaf_of_local_poa,
                2: gaf_emit.gaf_of_gap_abpoa, 3: gaf_emit.gaf_of_gap_local_poa}
    oracles = {
        0: lambda s, i: poa.global_banded(s, gp, sm, btas[i]),
        1: lambda s, i: poa.local_full(s, gp, sm),
        2: lambda s, i: poa.gap_global_banded(s, gp, sm, -4, -2, btas[i]),
        3: lambda s, i: poa.gap_local_full(s, gp, sm, -4, -2),
    }
    try:
        for mode in (0, 1, 2, 3):
            states = poa_engine.run_batch(mode, reads, gp, sm, -4, -2, btas)
            for i, s in enumerate(reads):
                st_o = oracles[mode](s, i)
                assert st_o.band_check_ok == states[i].band_check_ok, (seed, mode, i)
                if mode in (0, 2) and not st_o.band_check_ok:
                    continue
                r_o = emitters[mode](st_o, s, "r", False, gp.handle_pos).to_string()
                r_d = emitters[mode](states[i], s, "r", False, gp.handle_pos).to_string()
                assert r_o == r_d, (seed, mode, i)
        for mode in (4, 5):
            recs = pathwise_engine.run_batch(mode, reads, g, sm_mm)
            fn = pathwise.exec_global if mode == 4 else pathwise.exec_semiglobal
            for i, s in enumerate(reads):
                assert fn(s, g, sm_mm).to_string() == recs[i].to_string(), (seed, mode, i)
        dms = nodes_displacement_matrix(g, rg)
        for mode in (8, 9):
            recs = recombination_engine.run_batch(mode, reads, g, rg, sm_mm, 4, 0.1, 1.0)
            for i, s in enumerate(reads):
                r_o = ro.exec_mode(mode, s, g, rg, sm_mm, 4, 0.1, dms, 1.0)
                assert r_o.to_string() == recs[i].to_string(), (seed, mode, i)
    except AssertionError as e:
        print(f"FAIL {e.args[0] if e.args else seed}", flush=True)
        fails += 1
print(f"chunk {start}-{stop - 1}: {'OK' if not fails else f'{fails} FAILS'}",
      flush=True)
sys.exit(1 if fails else 0)
"""


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rc = 0
    for c in range(start, start + n_seeds, CHUNK):
        stop = min(c + CHUNK, start + n_seeds)
        p = subprocess.run(
            [sys.executable, "-c", _WORKER, str(c), str(stop)],
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        )
        rc |= p.returncode
    print("sweep done:", "OK" if rc == 0 else "FAILURES")
    sys.exit(rc)


if __name__ == "__main__":
    main()
