"""The build-once capstone fixture cache (VERDICT r15 #6 + ADVICE
r15): content-aware fingerprints (a regenerated testdata at IDENTICAL
row counts must miss the cache) and an atomic first-writer-wins
publish (the check-then-rename race is gone — a losing builder
discards its dir and serves the winner's)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
    _capstone_cache,
    _sf_print,
)


def _write_docs(path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
            }
        ),
        path,
    )


def test_sf_print_misses_on_content_change_at_equal_rowcount(tmp_path):
    sf_a = tmp_path / "a"
    sf_b = tmp_path / "b"
    sf_a.mkdir()
    sf_b.mkdir()
    _write_docs(str(sf_a / "documents.parquet"), ["alpha", "beta", "gamma"])
    # same row COUNT, same schema, different content
    _write_docs(str(sf_b / "documents.parquet"), ["alpha", "beta", "DELTA!"])
    pa_ = _sf_print(None, str(sf_a), "documents")
    pb_ = _sf_print(None, str(sf_b), "documents")
    assert pa_ != pb_
    # and identical content at the same path fingerprints identically
    assert pa_ == _sf_print(None, str(sf_a), "documents")


def test_cache_builds_once_then_serves(tmp_path):
    calls = []

    def build(work):
        calls.append(work)
        with open(os.path.join(work, "artifact"), "w") as f:
            f.write("built")

    fp = f"{tmp_path}:unit-test-build-once"
    p1 = _capstone_cache("unit_once", fp, build)
    p2 = _capstone_cache("unit_once", fp, build)
    assert p1 == p2
    assert len(calls) == 1
    with open(os.path.join(p1, "artifact")) as f:
        assert f.read() == "built"


def test_cache_publish_race_loser_discards_and_serves_winner(tmp_path):
    """A competitor publishing BETWEEN our existence check and our
    publish (the ADVICE r15 race window) must win: os.link is atomic,
    the loser's dir is removed, and the loser returns the winner's
    path."""
    import hashlib
    import tempfile

    from fiware_cosmos_orion_flink_connector_examples_spark.plans import (
        extensions as ext,
    )

    fp = f"{tmp_path}:unit-test-race"
    name = "unit_race"
    key = hashlib.md5(
        f"{name}:{fp}:{ext._FIXTURE_VERSION}".encode()
    ).hexdigest()[:12]
    ptr = os.path.join(
        tempfile.gettempdir(), f"sg_capstone_{name}_{key}.ptr"
    )
    winner_dir = str(tmp_path / "winner")
    os.makedirs(winner_dir)

    loser_dirs = []

    def build(work):
        loser_dirs.append(work)
        # simulate the competitor winning while we were building
        with open(ptr + ".tmp", "w") as f:
            f.write(winner_dir)
        os.rename(ptr + ".tmp", ptr)

    try:
        got = _capstone_cache(name, fp, build)
        assert got == winner_dir
        assert loser_dirs and not os.path.isdir(loser_dirs[0])  # no leak
    finally:
        if os.path.isfile(ptr):
            os.remove(ptr)
