"""Strip-ablation of the mode-0 banded global Pallas kernel on TPU.

Usage: timeout 540 python tools/ablate_global2.py [batch] [variants...]
  variants: full -chain -band -sweep -edges -dirs -all r4 r16 (default all)

Timing-only ablations (results wrong); chained-slope timing as in
bench.py.  Locates the kernel's floor so the distance-to-floor claim in
PERF.md is measured, not guessed (VERDICT r3 weak #2 / next #2).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    variants = sys.argv[2:] or [
        "full", "-chain", "-band", "-sweep", "-edges", "-dirs", "-all",
        "r4", "r16",
    ]

    from recgraph_tpu.graph.poagraph import PoaGraph
    from recgraph_tpu.io import fasta, gfa
    from recgraph_tpu.ops import pallas_poa_global2
    from recgraph_tpu.ops.encode import encode_reads, poa_device_graph
    from recgraph_tpu.scoring import ScoreMatrix

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    seqs, _ = fasta.get_sequences(os.path.join(root, "example", "reads.fa"))
    g = PoaGraph.from_gfa(gfa.parse_gfa(os.path.join(root, "example", "graph.gfa")))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    reads = (seqs * ((batch // len(seqs)) + 1))[:batch]
    seq, L = encode_reads(reads)
    Lp = seq.shape[1]
    bta = jnp.asarray([int(1 + 0.01 * len(s)) for s in reads], jnp.int32)
    cells = batch * (dg.n - 1) * Lp
    print(f"# device={jax.devices()[0].platform} batch={batch} n={dg.n} Lp={Lp}",
          flush=True)

    STRIPS = {
        "full": frozenset(),
        "-chain": frozenset({"chain"}),
        "-band": frozenset({"band"}),
        "-sweep": frozenset({"sweep"}),
        "-edges": frozenset({"edges"}),
        "-dirs": frozenset({"dirs"}),
        "-all": frozenset({"chain", "band", "sweep", "edges", "dirs"}),
    }

    probe = jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert float(probe) == 512.0, "tunnel probe failed"
    print("# probe ok", flush=True)

    for name in variants:
        kw = {}
        if name in STRIPS:
            kw["strip"] = STRIPS[name]
        elif name == "r4":
            kw["R"] = 4
        elif name == "r16":
            kw["R"] = 16
        elif name == "pack2":
            kw["pack"] = 2
        elif name.startswith("pack2-"):
            # pack2-all, or pack2-chain,band (strip the named sections)
            kw["pack"] = 2
            parts = name[len("pack2-"):].split(",")
            kw["strip"] = (STRIPS["-all"] if parts == ["all"]
                           else frozenset(parts))
        else:
            print(f"# unknown variant {name}", flush=True)
            continue

        def chained(k):
            @jax.jit
            def fn(seq, L):
                tot = jnp.int32(0)
                s = seq
                for _ in range(k):
                    out = pallas_poa_global2.fill_global_v2(
                        dg, table, s, L, bta, **kw
                    )
                    tot = tot + jnp.sum(out[0]) + out[3].reshape(-1)[12345]
                    s = jnp.roll(seq, tot & 3, axis=0)
                return tot

            return lambda: int(fn(seq, L))

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
            print(
                f"{name}: per-fill {dt*1e3:.1f} ms  {cells/dt/1e9:.2f} "
                f"Gcells/s  (t1={t[1]*1e3:.0f}ms t4={t[4]*1e3:.0f}ms) "
                f"check={v}", flush=True,
            )
        except Exception as e:
            print(f"{name}: FAILED ({str(e)[:90]})", flush=True)


if __name__ == "__main__":
    main()
