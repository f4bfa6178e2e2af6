"""Multi-host read sharding through the production CLI.

Two worker processes each run the real CLI entry point with
``--num-processes/--process-id/--coordinator`` (pipeline._setup_parallel
initialises jax.distributed, takes the host's read slice, writes
``<out>.part<k>``; process 0 merges after the barrier).  The merged
output must equal a single-process run byte-for-byte.
"""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The production CLI, with the platform pinned to CPU first (the axon
# TPU plugin overrides JAX_PLATFORMS at import; config.update wins).
WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from recgraph_tpu.cli import main
main(sys.argv[1:])
"""


def _spawn_workers(tmp_path, out, mode_args):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(script), *mode_args,
                "example/reads.fa", "example/graph.gfa",
                "-o", out,
                "--num-processes", "2",
                "--process-id", str(k),
                "--coordinator", addr,
            ],
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


def test_two_process_cli_run(tmp_path, example_paths):
    out = str(tmp_path / "out.gaf")
    _spawn_workers(tmp_path, out, ["-m", "1"])

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
    # per-host part files exist (written before the merge)
    assert os.path.exists(out + ".part0") and os.path.exists(out + ".part1")
