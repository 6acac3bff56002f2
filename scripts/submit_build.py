"""spark-submit entry point for the index build (north rule: runs via
``spark-submit --py-files lucene_7_x_9_x_spark.zip scripts/submit_build.py``
on a multi-executor cluster).

Examples
--------
Package and submit::

    cd /root/repo && zip -qr /tmp/engine.zip lucene_7_x_9_x_spark
    spark-submit --py-files /tmp/engine.zip scripts/submit_build.py \
        --corpus /data/corpus_parquet --out /data/index \
        --id-cols repo,path,commit --text-col content \
        --segments 4096 --batches 16 --resume

The job is resumable: re-submitting with --resume skips batches whose
checkpoint is already committed (SURVEY.md §7.2 M4).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="parquet path / Iceberg table of the corpus")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--id-cols", default="repo,path,commit")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--segments", type=int, default=None)
    ap.add_argument("--batches", type=int, default=1)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--iceberg", action="store_true",
                    help="read the corpus via the Iceberg catalog "
                         "(spark.read.format('iceberg'))")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("lucene-spark-index-build") \
        .getOrCreate()
    from lucene_7_x_9_x_spark.index import build_index

    if args.iceberg:
        corpus = spark.read.format("iceberg").load(args.corpus)
    else:
        corpus = spark.read.parquet(args.corpus)

    idx = build_index(
        spark, corpus, args.out,
        id_cols=args.id_cols.split(","), text_col=args.text_col,
        num_segments=args.segments, num_batches=args.batches,
        resume=args.resume, with_positions=not args.no_positions)
    print(json.dumps({"stats": idx.stats,
                      "checkpoints": idx.checkpoints()}, indent=2))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
