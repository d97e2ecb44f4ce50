"""Smoke for examples/telemetry_pipeline.py: the event-analytics flow
runs as a real subprocess (own driver JVM) and reports sane numbers."""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_telemetry_pipeline_example_runs():
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "telemetry_pipeline.py")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    m = {k: int(v) for k, v in re.findall(r"(\w+)=(\d+)(?:\s|$)", out)}
    # 1000 events / 15 users at sf0.001: every stage must see data
    assert m["n_sessions"] > 0
    assert m["signup"] >= m["click"] >= m["purchase"] > 0
    assert m["grid_rows"] > m["carried_forward"] > 0   # grid ⊃ observed bins
    assert m["n_islands"] > 0 and m["mad_outliers"] > 0
    assert m["events_with_order"] > 0
    assert "transition_after_signup" in out
