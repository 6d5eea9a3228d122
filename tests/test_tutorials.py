"""Execute every tutorial script end-to-end.

The analog of the reference's nbdev CI, which runs every notebook cell and
fails on any exception (SURVEY §4) — each tutorial is a living integration
test with its own assertions. Run in subprocesses so each script controls
its own platform/XLA flags exactly as a user would experience it.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

TUTORIALS = sorted(
    (Path(__file__).resolve().parent.parent / "tutorials").glob("*.py")
)


@pytest.mark.slow
@pytest.mark.parametrize("script", TUTORIALS, ids=lambda p: p.stem)
def test_tutorial_runs(script):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # each script sets what it needs
    proc = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
    )
    assert proc.returncode == 0, (
        f"{script.name} failed\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-3000:]}"
    )
    assert "all checks passed" in proc.stdout
