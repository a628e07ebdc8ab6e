"""Distributed BPE (byte-pair-encoding) vocabulary training — the
tokenizer-training stage of a training-data pipeline, run where the data
is instead of funneling a 100 TB corpus through a single-node trainer.

The reference has no tokenizer stage at all (it stores raw extracted
text, /root/reference/internal/scraper/service.go); a corpus engine that
feeds LLM training needs the merge table learned ON the corpus. The
algorithm is the public Sennrich et al. 2016 procedure: start from
characters, repeatedly merge the most-frequent adjacent symbol pair.

The distributed shape (the part that matters at 100 TB):

* the CORPUS is scanned exactly once — one groupBy(word) producing the
  weighted vocabulary (10^7-10^8 distinct words at web scale, vs 10^13
  tokens of corpus; the classic trainer trick of collapsing the corpus
  to (word, freq) before any merge work, same as the public HF
  tokenizers trainer);
* each merge round is one map-side-combinable pair count over the
  vocabulary's adjacent symbol pairs plus a TakeOrdered(1) argmax — the
  only driver traffic is ONE row per round (the winning pair), the same
  per-round-scalar discipline as the k-means and PageRank loops;
* the merge application is a pure column expression (literal
  ``replace`` on the symbol string — non-overlapping left-to-right,
  which IS the BPE greedy merge order), so successive vocab generations
  never leave the executors.

Symbols ride in a ``' | '``-joined string; a pair (a, b) occurs iff
``a || ' | ' || b`` occurs, and ``replace`` of that pattern with
``a || b`` merges every non-overlapping occurrence left-to-right —
bit-identical semantics in Spark and DuckDB, so the oracle replays every
round exactly (ties broken by (count DESC, left ASC, right ASC)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_v1_spark.functions import text as TX

_SYM_SEP = " | "


def weighted_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, sym) — the corpus collapsed to its weighted
    vocabulary, each word exploded to a character symbol string. The one
    and only corpus scan of the trainer."""
    return (
        docs.select(F.explode(TX.tokens(F.col(text_col))).alias("word"))
        # empty words would make sequence(1, length(word)) DESCEND
        # (sequence(1, 0) == [1, 0] — the phantom-segment bug class)
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn(
            "sym",
            F.expr(
                "array_join(transform(sequence(1, length(word)),"
                f" i -> substring(word, i, 1)), '{_SYM_SEP}')"
            ),
        )
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair weighted counts over the current symbol strings.
    Guarded for single-symbol words (``sequence(1, 0)`` would descend)."""
    l = F.split(F.col("sym"), r" \| ")
    return (
        vocab.select("freq", l.alias("l"))
        .where(F.size("l") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(l) - 1),"
                    " i -> struct(element_at(l, i) AS a,"
                    " element_at(l, i + 1) AS b))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("c"))
    )


def train_bpe_merges(
    docs: DataFrame, text_col: str = "text", num_merges: int = 6
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Runs ``num_merges`` BPE rounds; returns (merge table rows, final
    vocab frame). Merge rows are (round, left, right, pair_count); the
    final vocab frame carries each word's merged symbol string (used by
    the encode path — encoding a document is a broadcast join against
    this table, never a re-derivation)."""
    vocab = weighted_vocab(docs, text_col).persist()
    persisted = [vocab]
    merges: list[tuple[int, str, str, int]] = []
    cur = vocab
    for r in range(1, num_merges + 1):
        best = (
            pair_counts(cur)
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], best[0]["c"]
        merges.append((r, a, b, int(c)))
        cur = cur.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f"{a}{_SYM_SEP}{b}"),
                F.lit(a + b),
            ),
        ).persist()
        persisted.append(cur)
    for p in persisted[:-1]:
        p.unpersist()
    return merges, cur


def release(final_vocab: DataFrame) -> None:
    final_vocab.unpersist()
