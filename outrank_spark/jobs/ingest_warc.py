"""spark-submit CLI: raw Common-Crawl WARC archives -> pages table.

The missing first mile: every pipeline in this engine (ranking,
sketch builds, corpus cleaning) reads the north-rule pages table
``(url, warc_ts, html, text, lang)``; this job produces that table
from raw ``.warc`` / ``.warc.gz`` archives in one command::

    spark-submit --py-files outrank_spark.zip jobs/ingest_warc.py \
        --input /crawls/2024-03 --output /tables/pages \
        --reader stream --partition_by day --url_dedup latest

    python -m outrank_spark.jobs.ingest_warc --input ./archives \
        --output ./pages_parquet

Design:

- reader ``stream`` (default): bounded-memory path-per-task parsing
  (sources/warc.read_warc_stream) for local/NFS storage;
  ``binaryfile`` for object stores (whole-archive Arrow cells).
- ``--partition_by day`` lays the parquet out as
  ``crawl_date=YYYY-MM-DD/`` so downstream time-window scans prune
  partitions (100 TB contract: a day-sliced query never touches other
  days' files); ``none`` writes flat.
- ``--url_dedup latest`` keeps only the newest capture per url (one
  window over the url shuffle — recrawl handling); ``none`` keeps
  every capture.
- output format ``parquet`` (in-sandbox) or ``iceberg`` (production;
  raises the same actionable jar-missing message as
  read_pages_table when the DataSource is absent).

Prints ONE JSON line: ``{"pages": N, "output": ..., "sec": ...}``.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession, Window, functions as F


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="ingest_warc",
        description="WARC/WET archives -> north-rule pages table",
    )
    ap.add_argument("--input", required=True,
                    help="dir (or glob) of .warc/.warc.gz archives")
    ap.add_argument("--output", required=True,
                    help="output table path")
    ap.add_argument("--reader", choices=("stream", "binaryfile"),
                    default="stream")
    ap.add_argument("--partition_by", choices=("day", "none"),
                    default="day")
    ap.add_argument("--url_dedup", choices=("latest", "none"),
                    default="none")
    ap.add_argument("--output_format", choices=("parquet", "iceberg"),
                    default="parquet")
    ap.add_argument("--mode", choices=("overwrite", "append"),
                    default="overwrite")
    ap.add_argument("--spark_master", default=None)
    ap.add_argument("--shuffle_partitions", type=int, default=None)
    return ap


def ingest(spark: SparkSession, args) -> int:
    from outrank_spark.sources.warc import pages_from_warc

    pages = pages_from_warc(spark, args.input, reader=args.reader)
    if args.url_dedup == "latest":
        w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
        pages = (
            pages.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn")
        )
    if args.partition_by == "day":
        pages = pages.withColumn(
            "crawl_date", F.date_format("warc_ts", "yyyy-MM-dd"))

    writer = pages.write.mode(args.mode)
    if args.partition_by == "day":
        writer = writer.partitionBy("crawl_date")
    if args.output_format == "iceberg":
        try:
            writer.format("iceberg").save(args.output)
        except Exception as exc:  # mirror read_pages_table's guidance
            msg = str(exc)
            if ("Failed to find" in msg or "ClassNotFound" in msg
                    or "DATA_SOURCE_NOT_FOUND" in msg):
                raise RuntimeError(
                    "Iceberg DataSource unavailable — submit with "
                    "--packages org.apache.iceberg:iceberg-spark-"
                    "runtime-<spark-version>; parquet stand-in: "
                    "--output_format parquet",
                ) from exc
            raise
    else:
        writer.parquet(args.output)
    return spark.read.parquet(args.output).count() \
        if args.output_format == "parquet" else -1


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    builder = SparkSession.builder.appName("outrank-spark-ingest-warc")
    if args.spark_master:
        builder = builder.master(args.spark_master)
    spark = builder.getOrCreate()
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(args.shuffle_partitions))
    t0 = time.time()
    try:
        n = ingest(spark, args)
    finally:
        spark.stop()
    print(json.dumps({"pages": n, "output": args.output,
                      "sec": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    sys.exit(main())
