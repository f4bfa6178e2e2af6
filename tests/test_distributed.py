"""Multi-host read sharding: a real two-process jax.distributed run.

Each worker process initialises the process group, takes its
host_read_slice of the corpus, aligns it on its local (CPU) devices and
writes a .part<k> file; the merged output must equal a single-process
run.  This exercises parallel/distributed.py end-to-end the way a
multi-host TPU job would use it (one process per host).
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]

from recgraph_tpu.parallel import distributed
distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2

from recgraph_tpu.align.pipeline import Options, run
from recgraph_tpu.io import fasta

seqs, _ = fasta.get_sequences("example/reads.fa")
sl = distributed.host_read_slice(len(seqs))

# write this host's slice of reads to a temp fasta, align, emit part file
import tempfile
names_seqs = list(zip(*fasta.get_sequences("example/reads.fa")))
with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as fh:
    for s, n in list(zip(*fasta.get_sequences("example/reads.fa")))[sl]:
        fh.write(f">{n}\n{s[1:]}\n")
    tmp = fh.name
run(Options(sequence_path=tmp, graph_path="example/graph.gfa",
            alignment_mode=1, out_file=f"{out}.part{pid}"))
print("worker", pid, "done")
"""


def test_two_process_sharded_run(tmp_path, example_paths):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()
    out = str(tmp_path / "out.gaf")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(k), out],
            cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for k in range(2)
    ]
    for p in procs:
        try:
            so, se = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, se.decode()[-2000:]

    from recgraph_tpu.parallel.distributed import merge_host_outputs

    merge_host_outputs(out, 2)

    # reference: single-process run over the whole corpus
    import contextlib
    import io

    from recgraph_tpu.align.pipeline import Options, run

    reads_fa, graph_gfa = example_paths
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run(Options(sequence_path=reads_fa, graph_path=graph_gfa,
                    alignment_mode=1))
    assert open(out).read() == buf.getvalue()
