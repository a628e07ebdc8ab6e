"""Per-round benchmark: runs the headline queries from the driver contract
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": 0.1}

Each query is forced end-to-end with a noop-format write (full
materialization, no driver collect). Set SPARK_GRAFT_BENCH_QUERIES to a
comma list to subset; scripts/scaling_bench.py reuses run_bench() at two
parallelism levels for the N-vs-4N scaling-efficiency evidence (BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # crawl pipeline slice + frontier ops
    "crawl_slice",
    "per_host_wave",
    "seen_anti_join_urls",
    "url_canonicalize",
    # relational core
    "groupby_agg",
    "window_topk",
    "broadcast_join",
    "anti_join_seen",
    "rollup_metrics",
    "topk_global",
    "json_decode",
    # text / training-data layer
    "token_count",
    "quality_score",
    "lang_id",
    "fingerprint_md5",
    "dedup_exact",
    "ngram_jaccard_dedup",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "ann_bruteforce",
    "ann_lsh",
    "multimodal_features",
    "winnow_fingerprint",
]


def run_bench(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    from web_scraper_v1_spark import queries as Q

    qs = Q.queries()
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = HEADLINE
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if subset:
        names = [n.strip() for n in subset.split(",") if n.strip()]

    from web_scraper_v1_spark.session import build_session

    spark = build_session("bench")
    # warm the JVM/session once with a trivial job so per-query timings
    # measure the queries, not sandbox startup
    spark.range(1000).count()

    timings = run_bench(spark, sf_dir, names)
    total = round(sum(timings.values()), 3)
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cores": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
