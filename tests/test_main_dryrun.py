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


@pytest.mark.slow
def test_dryrun_real_geometry():
    """Opt-in slow pass: full real-geometry (192/768 s2, 24-layer GPT)
    multichip dryrun on 8 virtual CPU devices.  Takes several minutes;
    run with ``pytest -m slow``.  Kept out of the driver's dryrun budget
    (MULTICHIP_r03 regression) by the EASEVOICE_DRYRUN_REAL=0 default in
    __graft_entry__._dryrun_real_geometry."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", EASEVOICE_DRYRUN_REAL="1")
    env["PYTHONPATH"] = (repo_root + os.pathsep + env["PYTHONPATH"]
                         if env.get("PYTHONPATH") else repo_root)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo_root, "__graft_entry__.py"),
         "dryrun", "8"],
        capture_output=True, timeout=1200, env=env, cwd=repo_root, text=True)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-2000:]
    assert "real-geometry s2" in out
