"""Shared scaffolding for the example scripts: receiver + stream +
console/HTTP sink wiring."""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from fiware_cosmos_orion_flink_connector_examples_spark.session import get_spark  # noqa: E402
from fiware_cosmos_orion_flink_connector_examples_spark.sources.ngsi_http import (  # noqa: E402
    NgsiHttpReceiver,
    register_orion_source,
)


def base_args(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--port", type=int, default=9001, help="HTTP notification port")
    p.add_argument("--spool", default=None, help="spool dir (default: temp)")
    return p


def start(args):
    """Returns (spark, notifications stream DF, receiver)."""
    spool = args.spool or tempfile.mkdtemp(prefix="ngsi_spool_")
    receiver = NgsiHttpReceiver(spool, port=args.port).start()
    print(f"listening for NGSI notifications on :{receiver.port}, spool={spool}")
    spark = get_spark(app_name="ngsi-example")
    spark.sparkContext.setLogLevel("WARN")
    register_orion_source(spark)
    stream = spark.readStream.format("orion_http").option("spool_dir", spool).load()
    return spark, stream, receiver


def run_until_interrupt(query, receiver):
    try:
        query.awaitTermination()
    except KeyboardInterrupt:
        query.stop()
    finally:
        receiver.stop()
