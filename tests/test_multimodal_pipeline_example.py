"""Smoke for examples/multimodal_pipeline.py: the end-to-end media
curation flow runs as a real subprocess (own driver JVM) and reports
sane numbers — including the corrupt-payload rejects and the
cluster-representative cut."""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_multimodal_pipeline_example_runs():
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / "multimodal_pipeline.py")],
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
        if k
        in (
            "images",
            "decoded",
            "rejects",
            "image_pairs",
            "image_kept",
            "audio_clips",
            "audio_pairs",
            "profile_rows",
            "media_ok",
        )
    }
    assert m["images"] == 500
    # every 89th payload is deliberately truncated; the decoder skips
    assert m["rejects"] == 6 and m["decoded"] == 494
    # near-dup families exist and the representative cut is real
    assert m["image_pairs"] > 0 and 0 < m["image_kept"] < m["decoded"]
    assert m["audio_clips"] == 500 and m["audio_pairs"] > 0
    # the cross-modal profile covers every doc; media_ok == decoded
    assert m["profile_rows"] == 500 and m["media_ok"] == 494
    q = float(re.search(r"avg_quality=([\d.]+)", out).group(1))
    assert 0.0 < q <= 1.0
