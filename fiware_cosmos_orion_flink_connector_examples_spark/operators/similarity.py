"""Vector similarity search over the embeddings table ([ext] X3).

Two paths, same contract:
  * ``topk_cosine_bruteforce`` — exact: broadcast the (small) query
    set against every vector; rank with a per-query window.  The scan
    side streams; nothing quadratic materializes.  This is the
    baseline and the verifier for the approximate path.
  * ``topk_cosine_signbucket`` — the scale path: an LSH/IVF-style
    coarse index from the sign pattern of the first ``code_bits``
    dimensions (deterministic ⇒ SQL-reproducible; at 100 TB you'd
    train k-means centroids instead, same plan shape: equi-join probe
    → window rank).  Probes only the query's own bucket.

Scores fold left-to-right in double precision so DuckDB reproduces
them bit-for-bit (see operators/dedup.cosine).  Paper anchors:
EDBT'19 streaming similarity, EDBT'20 incremental top-k (PAPERS.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fiware_cosmos_orion_flink_connector_examples_spark.operators.dedup import cosine


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic per-query top-k: rounded score desc, id asc."""
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_cosine_bruteforce(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self-match
    excluded).  ``queries`` must have the same id/vec columns."""
    base = df.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).cast("array<double>").alias("nv")
    )
    qs = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = (
        base.join(F.broadcast(qs))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id", "n_id", F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos")
        )
    )
    return _rank_topk(scored, k).select("q_id", "n_id", "cos", "rank")


def sign_bucket(vec_col: Column, code_bits: int = 8) -> Column:
    """Coarse bucket id ∈ [0, 2^code_bits): bit i = sign(vec[i]) ≥ 0.
    A zero-training-cost IVF quantizer — deterministic and portable."""
    return F.aggregate(
        F.zip_with(
            F.slice(vec_col, 1, code_bits),
            F.sequence(F.lit(0), F.lit(code_bits - 1)),
            # SQL shiftleft: the Python wrapper rejects column shift amounts
            lambda x, i: F.when(
                x >= 0, F.call_function("shiftleft", F.lit(1), i)
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def topk_cosine_signbucket(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: probe only vectors in the query's sign
    bucket.  Trades recall for a 2^code_bits candidate reduction; the
    bucket join is a broadcast equi-join, so the big side never
    shuffles."""
    base = df.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
        sign_bucket(F.col(vec_col).cast("array<double>"), code_bits).alias("bkt"),
    )
    qs = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        sign_bucket(F.col(vec_col).cast("array<double>"), code_bits).alias("bkt"),
    )
    scored = (
        base.join(F.broadcast(qs), ["bkt"])
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id", "n_id", F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos")
        )
    )
    return _rank_topk(scored, k).select("q_id", "n_id", "cos", "rank")
