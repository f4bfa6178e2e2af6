"""A/B timing of local-POA Pallas kernel variants on the attached TPU.

Usage: timeout 400 python tools/bench_kernel_ab.py [batch] [variants...]
  variants: v1 v2 v4 v4r16 v4r32 xla (default: v2 v4)

Chained-slope timing (see bench.py): per-fill cost is the slope between
1 and k data-dependent fills inside one jitted program ending in a
scalar fetch — `block_until_ready` on this tunnel returns early, and
per-call transfer latency would otherwise dominate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    variants = sys.argv[2:] or ["v2", "v4"]

    from recgraph_tpu.graph.poagraph import PoaGraph
    from recgraph_tpu.io import fasta, gfa
    from recgraph_tpu.ops import pallas_poa, pallas_poa_v2, pallas_poa_v5, poa_engine

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pallas_poa_v4  # superseded ablation kernel, lives in tools/
    from recgraph_tpu.ops.encode import encode_reads, poa_device_graph
    from recgraph_tpu.scoring import ScoreMatrix

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    seqs, _ = fasta.get_sequences(os.path.join(root, "example", "reads.fa"))
    g = PoaGraph.from_gfa(gfa.parse_gfa(os.path.join(root, "example", "graph.gfa")))
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)
    reads = (seqs * ((batch // len(seqs)) + 1))[:batch]
    pad_to = int(os.environ.get("AB_PAD_TO", "0")) or None
    if pad_to:
        reads = [r[:pad_to] for r in reads]
    seq, L = encode_reads(reads, pad_to=pad_to)
    Lp = seq.shape[1]
    cells = batch * (dg.n - 1) * Lp
    print(f"# device={jax.devices()[0].platform} batch={batch} n={dg.n} Lp={Lp}",
          flush=True)

    FILLS = {
        "v1": lambda s, l, Bt: pallas_poa.fill_local(dg, table, s, l, Bt=Bt),
        "v2": lambda s, l, Bt: pallas_poa_v2.fill_local_v2(dg, table, s, l, Bt=Bt),
        "v4": lambda s, l, Bt: pallas_poa_v4.fill_local_v4(dg, table, s, l, Bt=Bt),
        "v4r16": lambda s, l, Bt: pallas_poa_v4.fill_local_v4(
            dg, table, s, l, Bt=Bt, R=16),
        "v4r32": lambda s, l, Bt: pallas_poa_v4.fill_local_v4(
            dg, table, s, l, Bt=Bt, R=32),
        "xla": lambda s, l, Bt: poa_engine._fill_local(dg, table, s, l),
    }
    # timing-only ablations (results wrong; measure where the cycles go)
    for flag in ("sweep", "ringw", "chain", "dynsub", "pack"):
        FILLS[f"v4-{flag}"] = (
            lambda s, l, Bt, f=flag: pallas_poa_v4.fill_local_v4(
                dg, table, s, l, Bt=Bt, strip=frozenset({f})))
    FILLS["v4cummax"] = lambda s, l, Bt: pallas_poa_v4.fill_local_v4(
        dg, table, s, l, Bt=Bt, chain="cummax")
    FILLS["v4radix4"] = lambda s, l, Bt: pallas_poa_v4.fill_local_v4(
        dg, table, s, l, Bt=Bt, chain="radix4")
    FILLS["v5"] = lambda s, l, Bt: pallas_poa_v5.fill_local_v5(dg, table, s, l, ring16=True)
    FILLS["v5bt32"] = lambda s, l, Bt: pallas_poa_v5.fill_local_v5(
        dg, table, s, l, Bt=32, ring16=True)
    FILLS["v5r16"] = lambda s, l, Bt: pallas_poa_v5.fill_local_v5(
        dg, table, s, l, R=16, ring16=True)
    FILLS["v5r4"] = lambda s, l, Bt: pallas_poa_v5.fill_local_v5(
        dg, table, s, l, R=4, ring16=True)
    FILLS["v4-all"] = lambda s, l, Bt: pallas_poa_v4.fill_local_v4(
        dg, table, s, l, Bt=Bt,
        strip=frozenset({"sweep", "ringw", "chain", "dynsub", "pack"}))
    FILLS["v4onlychain"] = lambda s, l, Bt: pallas_poa_v4.fill_local_v4(
        dg, table, s, l, Bt=Bt,
        strip=frozenset({"sweep", "ringw", "dynsub", "pack"}))

    # tiny probe first: a wedged tunnel should fail fast, not after compiles
    probe = jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert float(probe) == 512.0, "tunnel probe failed"
    print("# probe ok", flush=True)

    for name in variants:
        fill = FILLS[name]
        Bt = int(os.environ.get("AB_BT", "32"))

        def chained(k):
            @jax.jit
            def fn(seq, L):
                tot = jnp.int32(0)
                s = seq
                for _ in range(k):
                    out = fill(s, L, Bt)
                    tot = tot + jnp.sum(out[0]) + out[3].reshape(-1)[12345]
                    s = jnp.roll(seq, tot & 3, axis=0)
                return tot

            return lambda: int(fn(seq, L))

        t = {}
        for k in (1, 4):
            fn = chained(k)
            v = fn()  # compile + warmup
            t0 = time.perf_counter()
            for _ in range(3):
                fn()
            t[k] = (time.perf_counter() - t0) / 3
        dt = max((t[4] - t[1]) / 3, 1e-9)
        print(f"{name}: per-fill {dt*1e3:.1f} ms  {cells/dt/1e9:.2f} Gcells/s  "
              f"(t1={t[1]*1e3:.0f}ms t4={t[4]*1e3:.0f}ms) check={v}", flush=True)


if __name__ == "__main__":
    main()
