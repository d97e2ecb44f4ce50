"""Round-8 scale + cache-discipline smokes (VERDICT r7 #5/#6):

1. dedup_image_phash's decode+band-join path at >=100k images (the
   r7 smoke debt): synthetic 16x16 BMP/PNG corpus via spark.range,
   one Arrow decode pass -> aHash -> 8 banded equi-joins.
2. dedup_audio_fingerprint's decode+FFT path at 100k WAV clips.
3. One-session smoke pack: the queries that historically held
   session-lived persists, run 3x in ONE session with NO
   clearCache — with caching.eagerly the per-iteration time must stay
   flat and the cached-RDD count must return to ~0 after each query
   (the late-query inflation SCALING.md:497 measured is gone).

Run: python tools/round8_smoke.py [n_images_thousands] [--bpe]
(--bpe adds the 2M-doc BPE span-removal smoke.)
Numbers land in SCALING.md round 8.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from fiware_cosmos_orion_flink_connector_examples_spark.operators import (
    dedup,
    multimodal,
)
from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark


def media_smoke(spark, n_images: int) -> None:
    """Synthetic image corpus straight from spark.range (same pixel
    arithmetic as plans.extensions._synth_image_media, no parquet
    dependency), through the REAL decode -> aHash -> banded join."""
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
        _synth_image_media,
    )

    docs = spark.range(n_images).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    t0 = time.time()
    media = _synth_image_media(docs)
    hashes = multimodal.image_phash(media)
    n_pairs = dedup.hash_dup_pairs(hashes, "media_id", "phash", max_hamming=6).count()
    print(
        f"image_phash smoke: {n_images} images -> {n_pairs} pairs "
        f"{time.time() - t0:.1f}s",
        flush=True,
    )
    spark.catalog.clearCache()


def audio_smoke(spark, n_clips: int) -> None:
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
        _synth_audio_media,
    )

    docs = spark.range(n_clips).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    t0 = time.time()
    media = _synth_audio_media(docs)
    fps = multimodal.audio_fingerprint(media)
    n_pairs = dedup.hash_dup_pairs(fps, "media_id", "afp", max_hamming=6).count()
    print(
        f"audio_fp smoke: {n_clips} clips -> {n_pairs} pairs "
        f"{time.time() - t0:.1f}s",
        flush=True,
    )
    spark.catalog.clearCache()


def one_session_pack(spark, sf_dir: str = "/root/testdata/sf0.1") -> None:
    """3 iterations x the persist-bearing queries, NO clearCache."""
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )

    names = [
        "source_unigram_kl",
        "events_funnel_conversion",
        "dup_matrix_by_source",
        "dedup_image_phash",
        "text_unigram_logprob",
        # late r8: the NB classifier and bigram LM persist their
        # vocab-sized count tables (session-lived by the
        # unigram_logprob precedent) — pack membership proves the
        # accumulation stays bounded and per-iteration time flat.
        "quality_nb_classifier",
        "text_bigram_logprob",
        # r9: the KN rungs persist their type tables (uni/bcw, plus
        # tcw/ctx for the trigram); ccnet re-enters kn_bigram's
        # persists through the dedup join — the pack proves the
        # session-lived set reaches a fixed point, not a leak.
        "text_bigram_logprob_kn",
        "text_trigram_logprob_kn",
        "corpus_curate_ccnet",
    ]
    for it in range(3):
        row = {"iter": it}
        for name in names:
            t0 = time.time()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            row[name] = round(time.time() - t0, 2)
        row["cached_rdds"] = len(
            spark.sparkContext._jsc.sc().getRDDStorageInfo()
        )
        print(json.dumps(row), flush=True)


def main() -> None:
    # args: [n_images_thousands] [--bpe]
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(pos[0]) if pos else 200
    spark = get_spark(app_name="round8_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    media_smoke(spark, k * 1000)
    audio_smoke(spark, 100_000)
    one_session_pack(spark)
    if "--bpe" in sys.argv:
        bpe_span_smoke(spark)


def bpe_span_smoke(spark, n_docs: int = 2_000_000, hot_frac: int = 10) -> None:
    """The BPE span-REMOVAL path at 100x the bench corpus: same hot-
    boilerplate fixture as tools/scale_smoke.span_dedup_smoke but with
    punctuation-bearing text (so BPE pre-tokens differ from \\S+) and
    the FULL remove path (cut tail included), n=4 subword grams —
    proving the int64 token-id gram shuffle + linear cut tail hold at
    ~30M token rows with a 200k-deep hot posting list."""
    from fiware_cosmos_orion_flink_connector_examples_spark.operators.dedup import (
        remove_repeated_spans_bpe,
    )

    uniq = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(8)),
            lambda i: F.concat(F.lit("t"), F.xxhash64(F.col("id"), i)),
        ),
        " ",
    )
    boiler = F.lit("Click here, accept all cookies. Terms apply!")
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % hot_frac == 0, F.concat(uniq, F.lit(" "), boiler))
        .otherwise(uniq)
        .alias("text"),
    )
    t0 = time.time()
    remove_repeated_spans_bpe(docs, "doc_id", "text", n=4).write.format(
        "noop"
    ).mode("overwrite").save()
    print(
        f"bpe span removal ({n_docs // 1_000_000}M docs, hot df="
        f"{n_docs // hot_frac}) {time.time() - t0:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
