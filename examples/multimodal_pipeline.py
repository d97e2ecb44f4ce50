"""The multimodal curation flow end to end on the testdata tables —
the media half of the training-data pipeline (no reference analog;
composes the round-7/8 [ext] media operators):

  documents → synthetic image corpus (every 89th payload truncated —
  the corrupt-blob reality) → REAL decode (BMP/PNG) → metadata +
  feature report → perceptual hash (aHash) → banded Hamming pair
  join → connected components → one representative per near-dup
  cluster;  the SAME band join dedups an audio corpus via the
  spectral WAV fingerprint;  finally the cross-modal profile joins
  text quality × embedding QC × media status into one per-doc frame.

Run: python examples/multimodal_pipeline.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from fiware_cosmos_orion_flink_connector_examples_spark.operators import (
        dedup,
        multimodal,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.extensions import (
        _synth_audio_media,
        _synth_image_media,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.plans.registry import (
        QUERIES,
    )
    from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark
    from fiware_cosmos_orion_flink_connector_examples_spark.sources.tables import (
        load_table,
    )

    spark = get_spark(app_name="multimodal-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf_dir, "documents")

    # 1. synthesize the media corpus (every 89th image truncated: real
    # crawls carry corrupt blobs; the decoder must skip, not die)
    images = _synth_image_media(docs, corrupt_mod=89)
    n_images = images.count()

    # 2. metadata + real decode feature report (one Arrow pass)
    hashes = multimodal.image_phash(images)
    n_decoded = hashes.count()
    print(f"images={n_images} decoded={n_decoded} rejects={n_images - n_decoded}")

    # 3. near-dup pairs via banded Hamming join, then one
    # representative per connected component (lowest media_id wins)
    pairs = dedup.hash_dup_pairs(hashes, "media_id", "phash", max_hamming=6)
    n_pairs = pairs.count()
    clusters = dedup.connected_components(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id"))
    kept = n_decoded - losers.count()
    print(f"image_pairs={n_pairs} image_kept={kept}")

    # 4. audio: same band join, different fingerprint (spectral WAV)
    afp = multimodal.audio_fingerprint(_synth_audio_media(docs))
    audio_pairs = dedup.hash_dup_pairs(afp, "media_id", "afp", max_hamming=6)
    print(f"audio_clips={afp.count()} audio_pairs={audio_pairs.count()}")

    # 5. the cross-modal per-doc profile (text × vectors × media)
    prof = QUERIES["crossmodal_doc_profile"].fn(spark, args.sf_dir)
    summary = prof.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("media_ok").cast("int")).alias("media_ok"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.round(F.avg("emb_norm"), 4).alias("avg_emb_norm"),
    ).first()
    print(
        f"profile_rows={summary['rows']} media_ok={summary['media_ok']} "
        f"avg_quality={summary['avg_quality']} avg_emb_norm={summary['avg_emb_norm']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
