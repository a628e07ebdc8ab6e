"""Two-parallelism scaling evidence for the TRAINING-DATA layer (the crawl
wave's evidence lives in scaling_bench.py): MinHash+LSH near-dup dedup over
a generated document corpus at two pinned core counts, same input, fresh
JVMs, median of 3, efficiency = (tp_hi / tp_lo) / (hi / lo).

The corpus is generated deterministically IN SPARK (Arrow kernel: per-doc
words drawn from a 4k vocabulary by splitmix64 of (doc_id, position)) and
materialized to parquet once per size, with ~6% planted near-dup pairs
(97% word overlap -> Jaccard well above the 0.8 threshold) and no exact
dups. Usage:

    python scripts/dedup_scaling_bench.py [n_docs]        # both runs
    python scripts/dedup_scaling_bench.py --run CORES DIR N
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# module-top so pandas_udf type-hint inference works under
# `from __future__ import annotations` (string hints can't resolve a
# function-local import — see BENCH.md round-2 notes)
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORDS_PER_DOC = 120
VOCAB = 4096
NEARDUP_EVERY = 17  # doc_id % 17 == 3 gets a planted near-dup twin


def materialize_documents(out_dir: str, n_docs: int) -> None:
    """Write ``documents.parquet`` (doc_id, text): base docs plus a
    perturbed twin (+n_docs id offset, every 30th word replaced) for every
    NEARDUP_EVERY-th base doc. One Arrow kernel, fully parallel."""
    from pyspark.sql import functions as F

    from web_scraper_v1_spark.session import build_session

    spark = build_session("dedup_corpus_gen", cores=8)

    @F.pandas_udf("string")
    def _gen_text(ids: pd.Series) -> pd.Series:
        base = ids.to_numpy() % n_docs  # twin shares the base's words
        is_twin = (ids.to_numpy() >= n_docs).astype(np.uint64)
        pos = np.arange(WORDS_PER_DOC, dtype=np.uint64)
        z = (
            base[:, None].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + pos[None, :] * np.uint64(0xBF58476D1CE4E5B9)
        )
        z ^= z >> np.uint64(30)
        z *= np.uint64(0x94D049BB133111EB)
        w = (z ^ (z >> np.uint64(31))) % np.uint64(VOCAB)
        # twins: every 30th word shifted by 1 (~3% of positions -> Jaccard
        # over distinct 3-gram shingles ~0.85-0.92, above the 0.8 gate)
        w = (w + is_twin[:, None] * (pos[None, :] % np.uint64(30) == 0)) % (
            np.uint64(VOCAB)
        )
        return pd.Series(
            [" ".join(f"w{int(x)}" for x in row) for row in w]
        )

    base = spark.range(0, n_docs).select(F.col("id").alias("doc_id"))
    twins = (
        spark.range(0, n_docs)
        .filter(F.col("id") % NEARDUP_EVERY == 3)
        .select((F.col("id") + n_docs).alias("doc_id"))
    )
    docs = (
        base.unionByName(twins)
        .repartition(64, "doc_id")
        .withColumn("text", _gen_text(F.col("doc_id")))
    )
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    spark.stop()


def one_run(cores: int, corpus_dir: str, n_docs: int) -> None:
    from web_scraper_v1_spark.operators import dedup as DD
    from web_scraper_v1_spark.session import build_session

    spark = build_session(
        f"dedup_scaling_{cores}",
        cores=cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 << 20),
            "spark.local.dir": "/dev/shm/spark-local-dedup",
        },
    )
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    n_in = docs.count()

    def run_once() -> int:
        n = DD.minhash_lsh_pairs(docs, threshold=0.8).count()
        DD.release_all()  # cold shingles/signatures every timed run
        return n

    n_pairs = run_once()  # warm: JVM JIT, Python worker pool
    times = []
    for _ in range(3):
        t0 = time.monotonic()
        n_pairs = run_once()
        times.append(time.monotonic() - t0)
    dt = sorted(times)[1]
    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_in,
                "n_pairs": n_pairs,
                "seconds": round(dt, 2),
                "docs_per_sec": round(n_in / dt, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        one_run(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    corpus_dir = f"/tmp/dedup_corpus_{n_docs}_{WORDS_PER_DOC}_{VOCAB}"
    if not os.path.exists(os.path.join(corpus_dir, "documents.parquet")):
        t0 = time.monotonic()
        materialize_documents(corpus_dir, n_docs)
        print(
            f"corpus: {n_docs} docs in {time.monotonic()-t0:.1f}s",
            file=sys.stderr,
        )

    levels = tuple(
        int(c)
        for c in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "2,8").split(",")
    )
    results = {}
    for cores in levels:
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            sys.executable, os.path.abspath(__file__),
            "--run", str(cores), corpus_dir, str(n_docs),
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(proc.stdout, proc.stderr, file=sys.stderr)
            sys.exit(1)
        results[cores] = json.loads(line[-1])
        print(line[-1])

    for lo, hi in zip(levels, levels[1:]):
        tp_lo = results[lo]["docs_per_sec"]
        tp_hi = results[hi]["docs_per_sec"]
        eff = round(tp_hi / tp_lo / (hi / lo), 3)
        print(
            json.dumps(
                {
                    "metric": f"dedup_scaling_efficiency_{lo}_to_{hi}",
                    "value": eff,
                    f"docs_per_sec_{lo}": tp_lo,
                    f"docs_per_sec_{hi}": tp_hi,
                    "n_docs": n_docs,
                    "target": 0.8,
                }
            )
        )


if __name__ == "__main__":
    main()
