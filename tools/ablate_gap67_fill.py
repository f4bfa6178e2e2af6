"""Strip-ablation of the full-Pallas modes-6/7 fill on TPU.

Usage: timeout 560 python tools/ablate_gap67_fill.py [B] [variants...]
  variants: full -hard -easy -commit -dma -x0 -colloop -stage -init
  (default: full -hard -easy -commit -colloop)

Timing-only section stubs (results wrong); chained-slope timing as in
bench.py.  Locates where the measured 122.7 ms (vs the ~35-55 ms
architectural budget, PERF.md) actually goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    variants = sys.argv[2:] or ["full", "-hard", "-easy", "-commit",
                                "-colloop"]
    probe = jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert float(probe) == 512.0, "tunnel probe failed"
    print(f"# probe ok, device={jax.devices()[0].platform}", flush=True)

    from recgraph_tpu.graph.pathgraph import PathGraph
    from recgraph_tpu.io import fasta, gfa
    from recgraph_tpu.ops import pathwise_engine
    from recgraph_tpu.ops import pathwise_gap_engine as pge
    from recgraph_tpu.ops import pallas_gap67_fill as pgf
    from recgraph_tpu.ops.encode import encode_reads
    from recgraph_tpu.scoring import ScoreMatrix

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    seqs, _ = fasta.get_sequences(os.path.join(root, "example", "reads.fa"))
    g = PathGraph.from_gfa(
        gfa.parse_gfa(os.path.join(root, "example", "graph.gfa")),
        is_reversed=False)
    sm = ScoreMatrix.create("none", 2, -4)
    meta = pge.gap_meta(g)
    xs = pgf.pack_meta(meta)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    reads = (seqs * ((B // len(seqs)) + 1))[:B]
    seq, _ = encode_reads(reads, pad_to=pathwise_engine._align_lp(reads))
    cells = 3 * B * meta.n * seq.shape[1] * meta.P
    print(f"# B={B} n={meta.n} P={meta.P} Lp={seq.shape[1]}", flush=True)

    for name in variants:
        strip = frozenset() if name == "full" else frozenset(
            name[1:].split(","))

        def chained(k):
            @jax.jit
            def fn(seq):
                tot = jnp.int32(0)
                s = seq
                for _ in range(k):
                    Dm, X, Y = pgf.fill_gap67_pallas(
                        xs, table, s, -4, -2, False, strip=strip)
                    tot = (tot + Dm.reshape(-1)[123] + X.reshape(-1)[456]
                           + jnp.max(Y[-2, :, :, -1]))
                    s = jnp.roll(seq, tot & 3, axis=0)
                return tot
            return lambda: int(fn(seq))

        try:
            t = {}
            for k in (1, 4):
                fn = chained(k)
                v = fn()
                t0 = time.perf_counter()
                for _ in range(3):
                    fn()
                t[k] = (time.perf_counter() - t0) / 3
            dt = max((t[4] - t[1]) / 3, 1e-9)
            print(f"{name}: per-fill {dt*1e3:.1f} ms  {cells/dt/1e9:.2f} "
                  f"Gcells/s  (t1={t[1]*1e3:.0f} t4={t[4]*1e3:.0f}) "
                  f"check={v}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED ({str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
