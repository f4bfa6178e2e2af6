"""Library API + CLI surface tests (modes 6/7 output, amb-strand, -o)."""

import io
import os
import sys

import pytest

from recgraph_tpu import api
from recgraph_tpu.align.pipeline import Options, run
from recgraph_tpu.io import fasta, gfa


@pytest.fixture(scope="module")
def parsed(example_paths):
    reads_fa, graph_gfa = example_paths
    seqs, names = fasta.get_sequences(reads_fa)
    return seqs, names, gfa.parse_gfa(graph_gfa), reads_fa, graph_gfa


def test_api_align_global_no_gap(parsed):
    seqs, _, g, _, _ = parsed
    raw_read = seqs[0][1:]  # api takes the raw read, no '$'
    rec = api.align_global_no_gap(raw_read, g)
    assert rec.query_length == len(raw_read)
    assert rec.path  # non-empty node walk
    s = rec.to_string()
    assert s.count("\t") >= 11


def test_api_local_and_gap_modes(parsed):
    seqs, _, g, _, _ = parsed
    raw_read = seqs[1][1:]
    for fn in (api.align_local_no_gap,):
        rec = fn(raw_read, g)
        assert rec.path
    rec = api.align_global_gap(raw_read, g, o=-4, e=-2)
    assert rec.path
    rec = api.align_local_gap(raw_read, g, o=-4, e=-2)
    assert rec.path


def _run_cli(capsys, argv_opts):
    opts = Options(**argv_opts)
    run(opts)
    return capsys.readouterr().out


def test_mode6_7_print_cigar(parsed, capsys, example_paths):
    """Modes 6/7 print CIGAR + best-path lines (pathwise_alignment_gap.rs:563-573)."""
    reads_fa, graph_gfa = example_paths
    # restrict to 2 reads via a temp fasta for speed
    seqs, names = fasta.get_sequences(reads_fa)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as fh:
        for i in range(2):
            fh.write(f">{names[i]}\n{seqs[i][1:]}\n")
        tmp = fh.name
    try:
        out = _run_cli(
            capsys,
            dict(sequence_path=tmp, graph_path=graph_gfa, alignment_mode=6),
        )
        lines = out.strip().splitlines()
        assert len(lines) == 4
        assert lines[1].startswith("Best path sequence 0: ")
        assert lines[3].startswith("Best path sequence 1: ")
        out = _run_cli(
            capsys,
            dict(sequence_path=tmp, graph_path=graph_gfa, alignment_mode=7),
        )
        assert "Best path sequence 0: " in out
    finally:
        os.unlink(tmp)


def test_out_file_and_amb_strand(parsed, tmp_path, example_paths):
    """-o writes a file; -s true exercises the reverse-graph retry path."""
    reads_fa, graph_gfa = example_paths
    seqs, names = fasta.get_sequences(reads_fa)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as fh:
        for i in range(2):
            fh.write(f">{names[i]}\n{seqs[i][1:]}\n")
        tmp = fh.name
    outf = str(tmp_path / "out.gaf")
    try:
        run(
            Options(
                sequence_path=tmp,
                graph_path=graph_gfa,
                alignment_mode=1,
                amb_strand=True,
                out_file=outf,
            )
        )
        lines = open(outf).read().strip().splitlines()
        assert len(lines) == 2
        for ln in lines:
            assert ln.split("\t")[0] in names[:2]
    finally:
        os.unlink(tmp)


def test_mode4_out_file_truncation_quirk(parsed, tmp_path, example_paths):
    """Modes 4-9 pass 0-based read numbers to write_gaf; with -o the
    file is truncated when number == 1, i.e. at the SECOND read
    (utils.rs:200-219 + main.rs:260) — a reference quirk we preserve."""
    reads_fa, graph_gfa = example_paths
    seqs, names = fasta.get_sequences(reads_fa)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as fh:
        for i in range(3):
            fh.write(f">{names[i]}\n{seqs[i][1:]}\n")
        tmp = fh.name
    outf = str(tmp_path / "out4.gaf")
    try:
        run(
            Options(
                sequence_path=tmp, graph_path=graph_gfa, alignment_mode=4,
                out_file=outf,
            )
        )
        lines = open(outf).read().strip().splitlines()
        # read 0 wrote, read 1 truncated, read 2 appended -> reads 1..2
        assert len(lines) == 2
        assert lines[0].split("\t")[0] == names[1]
        assert lines[1].split("\t")[0] == names[2]
    finally:
        os.unlink(tmp)
