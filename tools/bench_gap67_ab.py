"""A/B timing of the modes-6/7 fill variants on the attached TPU.

Usage: timeout 560 python tools/bench_gap67_ab.py [B] [variants...]
  variants: pallas (full-Pallas fill), hardrow (XLA scan + Pallas
  hard-row kernel), xla (pure XLA scan)   (default: pallas hardrow xla)

Chained-slope timing (see bench.py).  RECGRAPH_NO_PALLAS67 disables
both Pallas paths; pallas_gap67_fill.INTERPRET is never set here.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    variants = sys.argv[2:] or ["pallas", "hardrow", "xla"]
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
    reads = (seqs * ((B // len(seqs)) + 1))[:B]
    seq, _ = encode_reads(reads, pad_to=pathwise_engine._align_lp(reads))
    cells = 3 * B * meta.n * seq.shape[1] * meta.P
    print(f"# B={B} n={meta.n} P={meta.P} Lp={seq.shape[1]}", flush=True)

    ENVS = {
        "pallas": {},
        "hardrow": {"RECGRAPH_NO_PALLAS67_FILL": "1"},
        "xla": {"RECGRAPH_NO_PALLAS67": "1"},
    }
    for name in variants:
        for k in ("RECGRAPH_NO_PALLAS67", "RECGRAPH_NO_PALLAS67_FILL"):
            os.environ.pop(k, None)
        os.environ.update(ENVS[name])

        def chained(k):
            @jax.jit
            def fn(seq):
                tot = jnp.int32(0)
                s = seq
                for _ in range(k):
                    Dm, X, Y = pge.fill_gap_device(g, sm, s, -4, -2, False,
                                                   meta)
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
