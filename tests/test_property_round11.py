"""Round-11 property pins: ADVICE-r10 fixes and the round's new
operators."""

from __future__ import annotations


def test_model_lru_bounds_and_refreshes():
    """_ModelLRU (ADVICE r10: the module-level model memos were
    unbounded): inserts past cap evict least-recently-used, hits
    refresh recency, and the public get/setitem contract matches the
    plain-dict usage in pca_fit / kmeans_fit_sample."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators.similarity import (
        _ModelLRU,
    )

    lru = _ModelLRU(cap=3)
    for i in range(3):
        lru[("k", i)] = [i]
    assert len(lru) == 3
    # refresh ("k", 0) then insert a fourth: ("k", 1) is the LRU victim
    assert lru.get(("k", 0)) == [0]
    lru[("k", 3)] = [3]
    assert len(lru) == 3
    assert lru.get(("k", 1)) is None
    assert lru.get(("k", 0)) == [0] and lru.get(("k", 3)) == [3]
    # empty-list values survive the `is not None` hit convention the
    # quantizer cache relies on (empty corpus memoizes [])
    lru[("k", "empty")] = []
    assert lru.get(("k", "empty")) == [] and lru.get(("k", "empty")) is not None
