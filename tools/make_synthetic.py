"""Generate a synthetic pangenome + read corpus (BASELINE stretch config).

    python tools/make_synthetic.py OUTDIR [n_backbone] [n_reads] [seed]

Backbone of 1-3 bp nodes with ~55% biallelic bubbles, 8 haplotype
paths, and mutated 150 bp read windows sampled from the paths.
"""

import os
import random
import sys


def make(outdir, n_back=700, n_reads=10000, seed=42, n_paths=8):
    rng = random.Random(seed)
    os.makedirs(outdir, exist_ok=True)
    lines, edges, backbone = [], [], []
    nid = 0
    for _ in range(n_back):
        nid += 1
        a = nid
        lines.append(
            f"S\t{a}\t" + "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 3)))
        )
        if rng.random() < 0.55:
            nid += 1
            lines.append(
                f"S\t{nid}\t"
                + "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 3)))
            )
            backbone.append((a, nid))
        else:
            backbone.append((a,))
    for g1, g2 in zip(backbone, backbone[1:]):
        for x in g1:
            for y in g2:
                edges.append(f"L\t{x}\t+\t{y}\t+\t0M")
    paths = []
    for p in range(n_paths):
        walk = [rng.choice(g) for g in backbone]
        paths.append(walk)
    # cover every node: the pathwise modes (like the reference) index
    # alphas and crash on uncovered nodes
    covered = {x for w in paths for x in w}
    for g1 in backbone:
        for x in g1:
            if x not in covered:
                walk = [x if x in g2 else rng.choice(g2) for g2 in backbone]
                paths.append(walk)
                covered.update(walk)
    for p, walk in enumerate(paths):
        lines.append(f"P\tp{p}\t" + ",".join(f"{x}+" for x in walk) + "\t*")
    with open(os.path.join(outdir, "graph.gfa"), "w") as fh:
        fh.write("\n".join(lines + edges) + "\n")
    seqs = {}
    for ln in lines:
        f = ln.split("\t")
        if f[0] == "S":
            seqs[int(f[1])] = f[2]
    with open(os.path.join(outdir, "reads.fa"), "w") as fh:
        for r in range(n_reads):
            walk = paths[rng.randrange(len(paths))]
            s = "".join(seqs[x] for x in walk)
            start = rng.randrange(max(1, len(s) - 160))
            frag = s[start : start + 150]
            frag = "".join(
                (rng.choice("ACGT") if rng.random() < 0.02 else c) for c in frag
            )
            fh.write(f">r{r}\n{frag}\n")
    print(f"{outdir}: {nid} nodes, {sum(len(v) for v in seqs.values())} bases, "
          f"{n_reads} reads")


if __name__ == "__main__":
    make(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/big",
        int(sys.argv[2]) if len(sys.argv) > 2 else 700,
        int(sys.argv[3]) if len(sys.argv) > 3 else 10000,
        int(sys.argv[4]) if len(sys.argv) > 4 else 42,
        int(sys.argv[5]) if len(sys.argv) > 5 else 8,
    )
