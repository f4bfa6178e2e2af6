"""A/B: pathwise fill at large P — XLA scan vs base Pallas vs path-tiled.

    python tools/bench_bigp.py [which] [B] [Lp]

which: all | xla | base | bigp (one per process keeps the remote-compile
helper happy when the tunnel is degraded).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def slope_time(make_fn, iters=3, k_hi=4):
    t = {}
    for k in (1, k_hi):
        fn = make_fn(k)
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        t[k] = (time.perf_counter() - t0) / iters
    return max((t[k_hi] - t[1]) / (k_hi - 1), 1e-9)


def main(which="all", B=32, Lp=256):
    from make_synthetic import make

    from recgraph_tpu.graph.pathgraph import PathGraph
    from recgraph_tpu.io import fasta, gfa
    from recgraph_tpu.ops import pallas_pathwise, pallas_pathwise_bigp
    from recgraph_tpu.ops import pathwise_engine as pe
    from recgraph_tpu.ops.encode import encode_reads, path_device_graph
    from recgraph_tpu.scoring import ScoreMatrix

    outdir = "/tmp/bench_p126"
    if not os.path.exists(os.path.join(outdir, "graph.gfa")):
        make(outdir, n_back=80, n_reads=64, seed=7, n_paths=126)
    seqs, _ = fasta.get_sequences(os.path.join(outdir, "reads.fa"))
    g = PathGraph.from_gfa(gfa.parse_gfa(os.path.join(outdir, "graph.gfa")))
    dg = path_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    seqs = (seqs * ((B // len(seqs)) + 1))[:B]
    seq, L = encode_reads(seqs, pad_to=Lp)
    P = dg.paths_number
    cells = B * (dg.n - 1) * Lp * P
    print(f"# n={dg.n} P={P} B={B} Lp={Lp} dev={jax.devices()[0].platform}",
          file=sys.stderr)

    def run(tag, fill):
        def chained(k):
            @jax.jit
            def fn(seq):
                tot = jnp.int32(0)
                s = seq
                for _ in range(k):
                    A = fill(s)
                    tot = tot + jnp.sum(A) + A.reshape(-1)[12345]
                    s = jnp.roll(seq, tot & 3, axis=0)
                return tot

            return lambda: int(fn(seq))

        dt = slope_time(chained)
        print(f"{tag}: {cells / dt / 1e9:.2f} Gcells/s  per-fill {dt*1e3:.1f} ms")

    if which in ("all", "xla"):
        run("xla ", lambda s: pe._fill_pathwise(dg, table, s, jnp.bool_(False),
                                                encode_chain=True))
    if which in ("all", "base"):
        run("base", lambda s: pallas_pathwise.fill_pathwise_v1(
            dg, table, s, False))
    if which in ("all", "bigp"):
        run("bigp", lambda s: pallas_pathwise_bigp.fill_pathwise_bigp(
            dg, table, s, False))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "all",
        int(sys.argv[2]) if len(sys.argv) > 2 else 32,
        int(sys.argv[3]) if len(sys.argv) > 3 else 256,
    )
