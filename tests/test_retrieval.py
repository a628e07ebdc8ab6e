"""Stored-index BM25 retrieval with max-score pruning
(operators/retrieval.py): losslessness vs exhaustive scoring, the prune
actually pruning, and the inverted-list partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_v1_spark.operators import retrieval as RT

SF = "/root/testdata/sf0.001"
TERMS = ["spark", "window", "hash", "merge"]


def _exhaustive_topk(spark, docs, terms, k):
    """Independent exhaustive ranking: per-doc integer score over ALL
    candidate docs (>= 1 query term), no index, no pruning."""
    from web_scraper_v1_spark.functions import text as TX

    tok = TX.tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        F.size(tok).cast("long").alias("dl"),
        *[
            (F.size(tok) - F.size(F.array_remove(tok, t)))
            .cast("long")
            .alias(f"tf_{t}")
            for t in terms
        ],
    )
    stats = base.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("dl").cast("double").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df_{t}")
            for t in terms
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for t in terms:
        c = RT._contrib_ppb(
            F.col(f"tf_{t}"), F.col("dl"), F.col(f"df_{t}"),
            F.col("n"), F.col("sum_dl"),
        )
        score = c if score is None else score + c
    cand = None
    for t in terms:
        p = F.col(f"tf_{t}") > 0
        cand = p if cand is None else cand | p
    rows = (
        scored.filter(cand)
        .select("doc_id", score.alias("s"))
        .orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(k)
        .collect()
    )
    return [(r.doc_id, r.s) for r in rows]


def test_wand_topk_matches_exhaustive(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "idx")
    RT.bm25_index_write(docs, path)
    got = [
        (r.doc_id, r.score_ppb)
        for r in RT.bm25_wand_topk(spark, path, TERMS, k=20).collect()
    ]
    assert got == _exhaustive_topk(spark, docs, TERMS, 20)


def test_wand_prunes_skewed_corpus(spark, tmp_path):
    """A rare term whose postings dominate the ranking must let the
    max-score bound prune the common-term-only tail: survivors of the
    ub >= theta screen are a strict subset of the candidate union, and
    the result is still exactly the exhaustive top-k."""
    rows = []
    # 10 docs with the rare high-idf term (short docs -> high scores)
    for i in range(10):
        rows.append((i, "rare common filler" + (" pad%d" % i)))
    # 200 docs with only the common term, diluted
    for i in range(10, 210):
        rows.append((i, "common " + " ".join(f"x{j}" for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "idx")
    RT.bm25_index_write(docs, path)
    terms = ["rare", "common"]
    k = 5

    got = [
        (r.doc_id, r.score_ppb)
        for r in RT.bm25_wand_topk(spark, path, terms, k=k).collect()
    ]
    assert got == _exhaustive_topk(spark, docs, terms, k)

    # re-derive the screen the operator applied and check it bit
    post = spark.read.parquet(f"{path}/postings").where(
        F.col("term").isin(terms)
    )
    tstats = spark.read.parquet(f"{path}/termstats").where(
        F.col("term").isin(terms)
    )
    n_candidates = post.select("doc_id").distinct().count()
    ub = (
        post.join(F.broadcast(tstats), "term")
        .groupBy("doc_id")
        .agg(F.sum("max_contrib_ppb").cast("long").alias("ub_ppb"))
    )
    theta = min(s for _, s in _exhaustive_topk(spark, docs, ["rare"], k))
    n_survivors = ub.filter(F.col("ub_ppb") >= theta).count()
    assert n_candidates == 210
    assert n_survivors < n_candidates / 4  # the common tail is pruned


def test_wand_posting_scan_is_partition_pruned(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "idx")
    RT.bm25_index_write(docs, path)
    post = spark.read.parquet(f"{path}/postings").where(
        F.col("term").isin(TERMS)
    )
    plan = post._sc._jvm.PythonSQLUtils.explainString(
        post._jdf.queryExecution(), "formatted"
    )
    # the term filter must land in the scan's partition filters, not a
    # post-scan Filter over every inverted list
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "term" in seg and "IN" in seg.upper()
