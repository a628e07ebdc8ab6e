"""Top-k ranked retrieval over a stored BM25 index with max-score
(WAND-family) pruning.

The reference has no retrieval at all (its only text processing is
prefix-strip extraction, /root/reference/internal/parser/
receiver_response_parser.go:18-37); ``queries.bm25_score`` covers the
scan-side "score everything" shape. This module adds the SERVING shape —
the one an index actually exists for (Broder et al., "Efficient query
evaluation using a two-level retrieval process", CIKM 2003, and Turtle &
Flood's max-score — both public):

* the index stores tf postings ``partitionBy(term)`` (one directory per
  inverted list — a query's scan touches only its terms' partitions,
  plan-asserted), per-doc lengths, and per-term statistics INCLUDING the
  term's maximum possible BM25 contribution, frozen at build time with
  the corpus stats (the production trade: stats refresh on rebuild);
* query time computes each candidate's score UPPER BOUND as one integer
  sum of its matched terms' stored max-contributions — no doc-length
  join, no float math;
* a seed threshold θ = the k-th best EXACT score among the rarest
  term's postings (any subset's k-th best under-estimates the global
  k-th best, so pruning ``ub < θ`` is lossless — ties kept by ``>=``);
* only survivors pay the doc-length join and exact scoring.

At 10^10 docs the win is that the expensive stage (dl join + scoring +
global top-k) runs on the survivor set, not the candidate union, and the
posting scan itself is partition-pruned to |Q| lists. All score
arithmetic mirrors ``queries.q_bm25_score`` operation-for-operation
(integer parts-per-billion contributions), so the DuckDB oracle scores
the raw corpus and must agree hash-exactly with the pruned index path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_scraper_v1_spark.functions import text as TX

K1 = 1.2
B = 0.75


def _contrib_ppb(tf, dl, df, n, sum_dl):
    """round(idf * tf_fraction * 1e9) — the exact operation order of
    queries.q_bm25_score's ``contrib`` (and its oracle), applied to
    row-level columns instead of per-term columns."""
    tf = tf.cast("double")
    idf = ((n - df) + F.lit(0.5)) / (df + F.lit(0.5))
    denom = tf + (
        F.lit(K1)
        * (F.lit(0.25) + (F.lit(B) * (dl.cast("double") / (sum_dl / n))))
    )
    frac = (tf * F.lit(2.2)) / denom
    return F.round((idf * frac) * F.lit(1e9)).cast("long")


def bm25_index_write(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the retrieval index: ``postings/`` (term, doc_id, tf —
    partitionBy(term), the inverted-list layout), ``doclens/`` (doc_id,
    dl), ``termstats/`` (term, df, max_contrib_ppb) and a 1-row
    ``stats/`` (n, sum_dl). max_contrib_ppb is the term's largest
    possible per-doc contribution under the frozen corpus stats — the
    max-score bound served back at query time."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), TX.tokens(F.col(text_col)).alias("w")
    ).persist()
    try:
        doclens = toks.select(
            "doc_id", F.size("w").cast("long").alias("dl")
        )
        doclens.write.mode("overwrite").parquet(f"{path}/doclens")
        postings = (
            toks.select("doc_id", F.explode("w").alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count("*").cast("long").alias("tf"))
        )
        postings.write.mode("overwrite").partitionBy("term").parquet(
            f"{path}/postings"
        )
        stats = doclens.agg(
            F.count("*").cast("double").alias("n"),
            F.sum("dl").cast("double").alias("sum_dl"),
        )
        stats.coalesce(1).write.mode("overwrite").json(f"{path}/stats")
        n, sum_dl = [
            (float(r["n"]), float(r["sum_dl"])) for r in stats.collect()
        ][0]
        post = docs.sparkSession.read.parquet(f"{path}/postings")
        dls = docs.sparkSession.read.parquet(f"{path}/doclens")
        per_term = post.groupBy("term").agg(
            F.count("*").cast("double").alias("df")
        )
        scored = (
            post.join(dls, "doc_id")
            .join(per_term, "term")
            .withColumn(
                "c",
                _contrib_ppb(
                    F.col("tf"), F.col("dl"), F.col("df"),
                    F.lit(n), F.lit(sum_dl),
                ),
            )
        )
        (
            scored.groupBy("term")
            .agg(
                F.first("df").alias("df"),
                F.max("c").cast("long").alias("max_contrib_ppb"),
            )
            .write.mode("overwrite")
            .parquet(f"{path}/termstats")
        )
    finally:
        toks.unpersist()


def bm25_wand_topk(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 20,
) -> DataFrame:
    """Ranked top-k for one term query against the stored index, with
    lossless max-score pruning. Returns (doc_id, rank, score_ppb)."""
    post = spark.read.parquet(f"{path}/postings").where(
        F.col("term").isin(list(terms))
    )
    tstats = spark.read.parquet(f"{path}/termstats").where(
        F.col("term").isin(list(terms))
    )
    srow = spark.read.json(f"{path}/stats").collect()[0]
    n, sum_dl = float(srow["n"]), float(srow["sum_dl"])
    doclens = spark.read.parquet(f"{path}/doclens")

    annotated = post.join(F.broadcast(tstats), "term")
    ub = annotated.groupBy("doc_id").agg(
        F.sum("max_contrib_ppb").cast("long").alias("ub_ppb")
    )

    # seed threshold: exact scores of the RAREST term's postings — a
    # subset, so its k-th best can only under-estimate the global k-th
    trows = sorted(
        ((float(r["df"]), r["term"]) for r in tstats.collect())
    )
    rarest = trows[0][1] if trows else None
    theta = None
    if rarest is not None:
        seed_docs = post.where(F.col("term") == rarest).select("doc_id")
        seed_scores = (
            annotated.join(seed_docs, "doc_id", "left_semi")
            .join(doclens, "doc_id")
            .withColumn(
                "c",
                _contrib_ppb(
                    F.col("tf"), F.col("dl"), F.col("df"),
                    F.lit(n), F.lit(sum_dl),
                ),
            )
            .groupBy("doc_id")
            .agg(F.sum("c").cast("long").alias("s"))
            .orderBy(F.col("s").desc())
            .limit(k)
            .collect()
        )
        if len(seed_scores) == k:
            theta = min(r["s"] for r in seed_scores)

    survivors = ub if theta is None else ub.filter(
        F.col("ub_ppb") >= F.lit(theta)
    )
    exact = (
        annotated.join(survivors.select("doc_id"), "doc_id", "left_semi")
        .join(doclens, "doc_id")
        .withColumn(
            "c",
            _contrib_ppb(
                F.col("tf"), F.col("dl"), F.col("df"),
                F.lit(n), F.lit(sum_dl),
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("score_ppb"))
    )
    # TakeOrdered top-k first (distributed, no corpus-wide single
    # partition); the rank window then runs over <= k rows
    top = exact.orderBy(
        F.col("score_ppb").desc(), F.col("doc_id").asc()
    ).limit(k)
    w = Window.orderBy(F.col("score_ppb").desc(), F.col("doc_id").asc())
    return top.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("doc_id", "rank", "score_ppb")
