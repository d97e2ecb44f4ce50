"""Smoke for examples/lakehouse_pipeline.py: the end-to-end storage/
serving composition — snapshot table as system of record, exactly-once
streaming MERGE ingest, CDC-driven incremental index sync with a
no-drift equality proof, then compaction/time-travel/vacuum.  The
script asserts internally; this smoke just proves it runs clean as a
subprocess the way a user would."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_lakehouse_pipeline_example_runs():
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "lakehouse_pipeline.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "no-drift proof" in out.stdout
    assert "lakehouse pipeline OK" in out.stdout
