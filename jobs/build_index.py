"""spark-submit entry: build (or resume) a DINT index over a corpus.

Usage (local test):
    python jobs/build_index.py --corpus synth:10000 --out /tmp/idx

Cluster (north rule shape):
    spark-submit --py-files dint_spark.zip jobs/build_index.py \
        --corpus <parquet-or-iceberg-path> --out <dir> [--codec single_packed_dint]

The job only calls getOrCreate() — master/executors come from
spark-submit; local runs fall back to the engine's tuned local profile.
Prints one JSON line with build metrics (stage lineage is on disk under
<out>/_lineage/).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet path or synth:<n_docs>")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--codec", default="single_packed_dint",
        help="codec name, 'auto' (serving objective: single — multi "
        "decode measured 1.4-3.4x query wall), or 'auto_space' "
        "(multi_packed_dint once postings >= MULTI_PACKED_MIN_POSTINGS "
        "— build/dint_build.py chooser)",
    )
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is None and "SPARK_ENV_LOADED" not in os.environ:
        from dint_spark.session import get_spark

        spark = get_spark("dint_build")
    else:  # under spark-submit: respect the submitted conf
        spark = SparkSession.builder.getOrCreate()

    from dint_spark.corpus import synth_corpus, with_doc_ids
    from dint_spark.index.builder import IndexBuilder

    if args.corpus.startswith("synth:"):
        n = int(args.corpus.split(":", 1)[1])
        corpus = with_doc_ids(synth_corpus(spark, n, seed=args.seed))
    else:
        corpus = spark.read.parquet(args.corpus)
        if "doc_id" not in corpus.columns:
            corpus = with_doc_ids(corpus)

    result = IndexBuilder(spark, args.out, codec_name=args.codec).build(corpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
