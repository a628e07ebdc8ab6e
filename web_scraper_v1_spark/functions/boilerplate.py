"""Boilerplate / main-content block classification (jusText-style).

The reference's extraction is prefix-stripping only
(/root/reference/internal/parser/receiver_response_parser.go:18-37) — it has
no notion of boilerplate. A web-text training pipeline needs main-content
extraction as a first-class stage: C4 keeps only lines that look like prose,
and jusText (Pomikálek 2011, public) / trafilatura classify each block by
link density, stopword density, and length, then re-classify ambiguous
blocks from their context. This module implements that two-pass block
classifier Spark-first:

* pass 1 (context-free) is pure built-in Column arithmetic over exploded
  fixed-width token blocks — all comparisons are integer cross-multiplies
  (``link_cnt * 5 > n_tok`` for the 0.2 density threshold), so the DuckDB
  oracle replay is bit-exact with no float thresholds;
* pass 2 (context-sensitive) resolves every ``short``/``neargood`` block to
  the nearest *decided* (good/bad) neighbour classes via two
  doc-partitioned windows (``last(..., ignorenulls)`` over the preceding
  rows, ``first(...)`` over the following) — one narrow exchange keyed by
  doc id, no iteration, no Python.

Scale shape: the corpus tokenizes and explodes ONCE; the only exchange is
the (doc_id) partitioning for the context windows, and blocks of one
document are bounded by document size, so there is no corpus-wide hot key
(unlike the segment-dedup exchange, which keys on segment content).

The synthetic corpus is plain text, so "blocks" are deterministic
non-overlapping 10-word windows (the classifier is agnostic to the
segmenter), "anchor text" is a fixed marker-token set standing in for
<a>-tag tokens, and the stopword list is corpus-adapted — exactly the
derived-input discipline the crawl queries use (queries._derived_urls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from web_scraper_v1_spark.functions import text as TX

# Tokens standing in for anchor (link) text in the synthetic corpus.
LINK_TOKENS: tuple[str, ...] = ("spark", "stream", "vector")
# Corpus-adapted stopword list for the density features (the natural-text
# list, TX.STOPWORDS_EN, barely intersects the synthetic vocabulary).
CTX_STOPWORDS: tuple[str, ...] = ("a", "the", "value", "table")

BLOCK_WORDS = 10
# jusText-shaped thresholds, integer-encoded: density d compared as
# cnt * DEN > n_tok  <=>  cnt / n_tok > 1 / DEN.
MAX_LINK_DEN = 5      # link density > 1/5 -> bad
STOP_HIGH_DEN = 5     # stopword density >= 1/5 -> good-ish
STOP_LOW_DEN = 10     # stopword density >= 1/10 -> neargood
LENGTH_LOW = 40       # chars; below -> short (or bad if any link)
LENGTH_HIGH = 50      # chars; high-stopword blocks above -> good


def _in_list(arr: str, words: tuple[str, ...]) -> F.Column:
    lit = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({arr}, x -> x IN ({lit})))").cast("int")


def classify_blocks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_text: bool = False,
) -> DataFrame:
    """Two-pass jusText-style block classification. Returns one row per
    block: (doc_id, block_idx, n_tok, chars, stop_cnt, link_cnt, cls,
    cls_final) — all integers and strings, hash-stable against the SQL
    oracle. ``cls`` is the context-free class (good/neargood/short/bad);
    ``cls_final`` resolves short/neargood from the nearest decided
    neighbours (either side good -> good, else bad; document edges count
    as bad, jusText's edge rule)."""
    blocks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            TX.tokens(F.col(text_col)).alias("tok"),
        )
        .filter(F.size("tok") >= 1)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, CAST((size(tok) + 9) DIV 10"
                    " AS INT) - 1),"
                    f" i -> slice(tok, i * {BLOCK_WORDS} + 1,"
                    f" {BLOCK_WORDS}))"
                )
            ).alias("block_idx", "lw"),
        )
    )
    feat = blocks.select(
        "doc_id",
        F.col("block_idx").cast("long").alias("block_idx"),
        F.size("lw").cast("int").alias("n_tok"),
        F.length(F.array_join("lw", " ")).cast("int").alias("chars"),
        _in_list("lw", CTX_STOPWORDS).alias("stop_cnt"),
        _in_list("lw", LINK_TOKENS).alias("link_cnt"),
        *(
            [F.array_join("lw", " ").alias("btxt")]
            if keep_text
            else []
        ),
    )
    cls = (
        F.when(F.col("link_cnt") * MAX_LINK_DEN > F.col("n_tok"), "bad")
        .when(
            F.col("chars") < LENGTH_LOW,
            F.when(F.col("link_cnt") > 0, "bad").otherwise("short"),
        )
        .when(
            F.col("stop_cnt") * STOP_HIGH_DEN >= F.col("n_tok"),
            F.when(F.col("chars") > LENGTH_HIGH, "good").otherwise(
                "neargood"
            ),
        )
        .when(F.col("stop_cnt") * STOP_LOW_DEN >= F.col("n_tok"), "neargood")
        .otherwise("bad")
    )
    classified = feat.withColumn("cls", cls)
    decided = F.when(
        F.col("cls").isin("good", "bad"), F.col("cls")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("block_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("doc_id")
        .orderBy("block_idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ctx_prev = F.coalesce(
        F.last(decided, ignorenulls=True).over(w_prev), F.lit("bad")
    )
    ctx_next = F.coalesce(
        F.first(decided, ignorenulls=True).over(w_next), F.lit("bad")
    )
    cls_final = F.when(
        F.col("cls").isin("good", "bad"), F.col("cls")
    ).otherwise(
        F.when(
            (ctx_prev == "good") | (ctx_next == "good"), "good"
        ).otherwise("bad")
    )
    return classified.withColumn("cls_final", cls_final)
