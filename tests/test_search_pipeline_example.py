"""Smoke for examples/search_pipeline.py: the end-to-end retrieval/
serving flow runs as a real subprocess (own driver JVM) — its internal
assertions (stored-index ≡ from-corpus, stored-ANN ≡ in-memory IVF)
make it a correctness check, not just a liveness probe."""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_search_pipeline_example_runs():
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "search_pipeline.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = {
        k: int(v) for k, v in re.findall(r"(\w+)=(\d+)", proc.stdout)
    }
    assert m.get("n_scored", 0) > 0
    assert m.get("n_deleted", 0) > 0
    assert m.get("n_docs", 0) > 0 and m.get("n_terms") == 3
    assert m.get("n_results", 0) > 0
    assert m.get("n_fused") == 10
