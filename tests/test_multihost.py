"""Cross-PROCESS sharded lookup (2 simulated hosts x 4 devices): both comm
strategies must survive jax.distributed + Gloo collectives, with the
all_to_all path staying bit-exact.  Subprocess-based — the demo IS the
test (tools/multihost_demo.py)."""

import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(560)
def test_two_process_sharded_lookup():
    port = _free_port()
    proc = subprocess.run(
        [
            sys.executable, "-m", "recom_tpu.tools.multihost_demo",
            "--spawn", "2", "--coordinator", f"localhost:{port}",
        ],
        capture_output=True, timeout=540,
    )
    text = proc.stdout.decode() + proc.stderr.decode()
    assert proc.returncode == 0, text[-3000:]
    assert "MULTIHOST OK" in text
