"""Smoke for examples/corpus_pipeline.py: the end-to-end LLM
training-data flow runs as a real subprocess (own driver JVM) and
reports sane numbers."""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_corpus_pipeline_example_runs():
    # --bloom routes decontamination through the broadcast-bloom prune;
    # output must be identical to the exact join (pytest-pinned at the
    # operator level), so the same assertions hold
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "corpus_pipeline.py"), "--bloom"],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    m = {
        k: int(v)
        for k, v in re.findall(r"(\w+)=(\d+)(?:\s|$)", out)
        if k in ("docs", "train", "clean_eval", "n_contam", "packs")
    }
    assert m["docs"] == 500
    # dedup + split partition the corpus; nothing vanishes silently
    assert 0 < m["train"] < 500 and 0 < m["clean_eval"] < 100
    assert m["packs"] > 0
    fill = float(re.search(r"avg_fill=([\d.]+)", out).group(1))
    assert 0.5 < fill <= 1.0  # greedy packing actually fills packs
    # round-5 observability steps: quality funnel, span report, drift
    fun = {k: int(v) for k, v in re.findall(r"(pass_\w+)=(\d+)", out)}
    assert fun and all(0 <= v <= m["docs"] for v in fun.values())
    assert int(re.search(r"n_spans=(\d+)", out).group(1)) > 0
    assert re.search(r"max_drift source=\S+ kl=[\d.]+", out)
