"""Benchmark: DP cells/s of the device engines on the example corpus.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gcells/s", "vs_baseline": N}

Timing methodology: the per-fill cost is the *slope* between one and
k chained, data-dependent fills inside a single jitted program, ending
in a scalar fetch.  This is robust against two failure modes observed
on tunnelled PJRT backends: `block_until_ready` returning before the
computation materialises (which inflates throughput ~30x), and tens of
milliseconds of per-call transfer latency (which deflates it).

Baseline: the reference's AVX2 local-POA kernel (local_poa.rs:9-179) is
an 8-lane f32 row DP on one CPU core; no published numbers exist
(BASELINE.md), so we use 1.0 Gcells/s as a generous estimate of its
throughput — vs_baseline is therefore cells/s in that unit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_GCELLS = 1.0  # estimated Rust AVX2 single-core local-POA Gcells/s


def main(batch: int = 512, iters: int = 3) -> None:
    from recgraph_tpu.graph.poagraph import PoaGraph
    from recgraph_tpu.io import fasta, gfa
    from recgraph_tpu.ops import poa_engine
    from recgraph_tpu.ops.encode import encode_reads, poa_device_graph
    from recgraph_tpu.scoring import ScoreMatrix

    root = os.path.dirname(os.path.abspath(__file__))
    seqs, _ = fasta.get_sequences(os.path.join(root, "example", "reads.fa"))
    parsed = gfa.parse_gfa(os.path.join(root, "example", "graph.gfa"))
    g = PoaGraph.from_gfa(parsed)
    dg = poa_device_graph(g)
    sm = ScoreMatrix.create("none", 2, -4)
    table = jnp.asarray(sm.table, dtype=jnp.int32)

    reads = (seqs * ((batch // len(seqs)) + 1))[:batch]
    seq, L = encode_reads(reads)
    Lp = seq.shape[1]
    cells = batch * (dg.n - 1) * Lp

    def chained(k):
        @jax.jit
        def fn(seq, L):
            tot = jnp.int32(0)
            s = seq
            for _ in range(k):
                out = poa_engine.fill_local_best(dg, table, s, L, g)
                tot = tot + jnp.sum(out[0]) + out[3].reshape(-1)[12345]
                s = jnp.roll(seq, tot & 3, axis=0)  # data dependency
            return tot

        return fn

    k_hi = 4
    t = {}
    for k in (1, k_hi):
        fn = chained(k)
        int(fn(seq, L))  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            int(fn(seq, L))
        t[k] = (time.perf_counter() - t0) / iters
    dt = max((t[k_hi] - t[1]) / (k_hi - 1), 1e-9)

    gcells = cells / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "local_poa_dp_throughput",
                "value": round(gcells, 3),
                "unit": "Gcells/s",
                "vs_baseline": round(gcells / BASELINE_GCELLS, 3),
            }
        )
    )
    print(
        f"# batch={batch} n={dg.n} Lp={Lp} per-fill={dt*1e3:.1f}ms "
        f"reads/s={batch/dt:.0f} device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


def _bench_child(platform, batch, iters, q):
    import jax as _jax

    if platform:
        _jax.config.update("jax_platforms", platform)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(batch, iters)
    q.put(buf.getvalue())


def _run_guarded(batch, iters, timeout_s=300):
    """Run the bench in a child process with a watchdog.

    The dev TPU tunnel can wedge indefinitely; the driver must still get
    a JSON line.  On timeout/failure, re-run on the CPU backend.
    """
    import multiprocessing as mp

    ctx = mp.get_context("spawn")

    # CPU fallback uses a smaller batch so it fits its own watchdog
    for platform, b, t_s in ((None, batch, timeout_s), ("cpu", min(batch, 128), timeout_s)):
        q = ctx.Queue()
        p = ctx.Process(target=_bench_child, args=(platform, b, iters, q))
        p.start()
        p.join(t_s)
        if p.is_alive():
            p.terminate()
            p.join(10)
            print(
                f"# bench attempt on {platform or 'default'} timed out",
                file=sys.stderr,
            )
            continue
        if p.exitcode == 0 and not q.empty():
            print(q.get(), end="")
            return
    print(
        json.dumps(
            {
                "metric": "local_poa_dp_throughput",
                "value": 0.0,
                "unit": "Gcells/s",
                "vs_baseline": 0.0,
            }
        )
    )


if __name__ == "__main__":
    _run_guarded(
        batch=int(sys.argv[1]) if len(sys.argv) > 1 else 512,
        iters=int(sys.argv[2]) if len(sys.argv) > 2 else 3,
    )
