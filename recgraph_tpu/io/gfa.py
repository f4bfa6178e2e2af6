"""Minimal GFA1 parser.

The reference consumes GFA through the `gfa` + `handlegraph` crates
(reference: src/graph.rs:11-17, src/pathwise_graph.rs:127-133) with
integer segment names (`GFA<usize, ()>`).  We parse the same subset
directly:

- ``S <id> <seq>``            segments (integer ids, DNA sequence)
- ``L <a> <ao> <b> <bo> <ov>`` links (edges); only '+' orientations are
  supported, matching the reference's pathwise TODO
  (pathwise_graph.rs:9 "only working with every path on + or -").
- ``P <name> <a+,b+,...> ...`` paths (haplotypes), in file order; the
  path id is the P-line index, matching HashGraph path-handle creation
  order (pathwise_graph.rs:176-178).

Node iteration everywhere downstream is by *numerically sorted id*
(graph.rs:32-33 `sorted_handles.sort()`), and the reference requires ids
to be in topological order (graph.rs:10).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class GfaPath:
    name: str
    nodes: list[int]


@dataclass
class Gfa:
    """In-memory GFA: segments, edges, haplotype paths."""

    segments: dict[int, str] = field(default_factory=dict)
    edges: list[tuple[int, int]] = field(default_factory=list)
    paths: list[GfaPath] = field(default_factory=list)

    @property
    def sorted_ids(self) -> list[int]:
        return sorted(self.segments)

    def predecessors(self) -> dict[int, list[int]]:
        """node id -> predecessor node ids, in edge-insertion order."""
        preds: dict[int, list[int]] = {nid: [] for nid in self.segments}
        for a, b in self.edges:
            if a not in preds[b]:
                preds[b].append(a)
        return preds

    def successors(self) -> dict[int, list[int]]:
        succs: dict[int, list[int]] = {nid: [] for nid in self.segments}
        for a, b in self.edges:
            if b not in succs[a]:
                succs[a].append(b)
        return succs


def parse_gfa(path: str) -> Gfa:
    gfa = Gfa()
    with open(path) as fh:
        for raw in fh:
            line = raw.rstrip("\n")
            if not line:
                continue
            fields = line.split("\t")
            tag = fields[0]
            if tag == "S":
                if len(fields) < 3:
                    raise ValueError(f"bad S line: {line!r}")
                gfa.segments[int(fields[1])] = fields[2].upper()
            elif tag == "L":
                if len(fields) < 5:
                    raise ValueError(f"bad L line: {line!r}")
                a, ao, b, bo = fields[1], fields[2], fields[3], fields[4]
                if ao != "+" or bo != "+":
                    raise NotImplementedError(
                        "only '+' link orientations are supported"
                    )
                gfa.edges.append((int(a), int(b)))
            elif tag == "P":
                if len(fields) < 3:
                    raise ValueError(f"bad P line: {line!r}")
                nodes = []
                for step in fields[2].split(","):
                    if not step:
                        continue
                    orient = step[-1]
                    if orient not in "+-":
                        raise ValueError(f"bad path step: {step!r}")
                    if orient == "-":
                        raise NotImplementedError(
                            "only '+' path orientations are supported"
                        )
                    nodes.append(int(step[:-1]))
                gfa.paths.append(GfaPath(fields[1], nodes))
            # H and other lines ignored
    return gfa
