"""Example scripts: argparse surfaces stay importable and well-formed."""

import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parents[1] / "examples"


@pytest.mark.parametrize(
    "script",
    [
        "train_vqgan.py",
        "train_maskgit.py",
        "sample.py",
        "tokenize_dataset.py",
        "smoke_e2e.py",
        "edit_image.py",
        "serve.py",
        "fsdp_memory_report.py",
    ],
)
def test_example_help(script):
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / script), "--help"],
        capture_output=True,
        text=True,
        timeout=240,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "usage:" in out.stdout
