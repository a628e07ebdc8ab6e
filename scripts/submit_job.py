"""spark-submit entry point — the north rule's deployment shape, for real.

The rule says the pipeline "runs via spark-submit --py-files on a
multi-executor cluster"; ``session.build_session`` models that with
``addPyFile`` inside one process, but this script IS the submitted job:

    spark-submit --master <cluster> --py-files web_scraper_v1_spark.zip \
        scripts/submit_job.py --corpus-dir DIR --n-pages N --out result.json

It deliberately does NOT sys.path-insert the repo: every
``web_scraper_v1_spark`` import (driver side and inside the pandas-UDF
closures on Python workers) must resolve from the ``--py-files`` archive,
exactly as on a cluster where the repo checkout does not exist on any
executor. ``tests/test_submit.py`` gates this end-to-end with a scrubbed
PYTHONPATH and a neutral cwd, and checks the wave's text checksum against
an in-process run (byte-identical extraction through the deployment path).

On a real cluster the only changes are ``--master yarn|k8s://...`` plus
executor sizing flags; the job body is untouched (it takes whatever
SparkSession spark-submit built — it sets no master itself).
"""

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from web_scraper_v1_spark.plans.throughput import fetch_parse_wave
from web_scraper_v1_spark.sources import corpus as C


def wave_summary(df):
    """One-row order-insensitive summary of a parsed wave: row count, byte
    total, and a bit_xor checksum over (url, text) — byte-identical
    extracted text is exactly what the north rule's per-row invariant
    demands, folded to one comparable int64."""
    return df.agg(
        F.count("*").alias("urls_parsed"),
        F.sum("page_bytes").alias("page_bytes"),
        F.bit_xor(
            F.xxhash64(F.col("url"), F.col("text"), F.col("fingerprint"))
        ).alias("text_checksum"),
    ).collect()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus-dir", required=True)
    ap.add_argument("--n-pages", type=int, default=2000)
    ap.add_argument("--n-seeds", type=int, default=0, help="0 = n_pages")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    # the session spark-submit configured (master/executors/memory all come
    # from the submit command line, never from job code)
    spark = SparkSession.builder.appName("wsv1_submit_wave").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    C.materialize_corpus(
        args.corpus_dir,
        n_pages=args.n_pages,
        n_seeds=args.n_seeds or args.n_pages,
    )
    pages = C.read_pages(spark, args.corpus_dir)
    seeds = C.read_seeds(spark, args.corpus_dir)

    t0 = time.monotonic()
    row = wave_summary(
        fetch_parse_wave(spark, seeds, pages, parse_features=True)
    )
    elapsed = time.monotonic() - t0

    result = {
        "urls_parsed": row["urls_parsed"],
        "page_bytes": row["page_bytes"],
        "text_checksum": row["text_checksum"],
        "seconds": round(elapsed, 3),
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
