"""Server startup smoke check (reference: main.py --dry-run)."""
import os
import subprocess
import sys

import pytest


def test_main_dry_run(tmp_path):
    import socket

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    free_port = sock.getsockname()[1]
    sock.close()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["EASEVOICE_PORT"] = str(free_port)
    env["EASEVOICE_TRAINER_NAMESPACES_ROOT"] = str(tmp_path / "ns")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (repo_root + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else repo_root)
    proc = subprocess.run(
        [sys.executable, "-m", "easevoice_trainer_tpu.main", "--dry-run"],
        capture_output=True, timeout=240, env=env, cwd=str(tmp_path),
        text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dry-run: server started OK" in proc.stderr + proc.stdout
