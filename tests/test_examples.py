"""The shipped examples must stay runnable (reference parity:
examples/test_model.py + the Readme.md:66-125 API walkthrough)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=480):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )


@pytest.mark.parametrize("script", ["quickstart.py", "test_model.py"])
def test_example_cli_wiring(script):
    r = _run(script, "--help", timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "--cpu" in r.stdout


@pytest.mark.slow
def test_quickstart_runs_offline(tmp_path):
    r = _run("quickstart.py", "--cpu", "--tiny", "--out", str(tmp_path))
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "reconstruction (physical units)" in r.stdout
    assert (tmp_path / "CRA5" / "2024" / "2024-06-01T00:00:00.bin").exists()
    assert (tmp_path / "vis" / "2024-06-01T00:00:00_reconstruction.png").exists()


@pytest.mark.slow
def test_zoo_example_runs(tmp_path):
    r = _run("test_model.py", "--cpu")
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "bmshj2018-factorized" in r.stdout
    assert "VAEformer" in r.stdout
