"""The throughput-carrying fetch+parse pipeline, isolated for benchmarks.

This is one maximal crawl wave — the path the north-rule metric ("URLs
fetched+parsed/sec") measures: seeds -> canonicalize/hash/dedup -> seen-set
anti-join (bloom prefilter + exact) -> fetch-as-join against the page corpus
-> vectorized extraction UDF -> parse-side features (golden text,
fingerprint, byte counts). No driver-side loops, no global-order trace (that
is round bookkeeping, politeness-bounded by design — see plans/crawl.py);
every stage here is partition-parallel, so throughput should scale ~linearly
with cores, which scripts/scaling_bench.py certifies at local[8] vs
local[32] (sandbox stand-in for N vs 4N executors).

Shuffle inventory (by design, the minimum for a big wave):
1. seed dedup window (hash by canonical_url);
2. the frontier x pages equi-join — both sides hash by canonical_url, and
   crucially the pages side ships only (canonical_url, head, page_bytes):
   the raw body column NEVER enters an exchange (a big wave cannot
   broadcast — at small politeness-bounded waves plans/crawl.py uses the
   broadcast variant instead);
3. the final tiny metrics aggregation.
The Arrow UDFs (extraction over the JVM-pruned head; sketching over the
extracted text) run post-join on the shuffle partitioning — their
parallelism is exactly spark.sql.shuffle.partitions, and they are never
co-resident with a parquet scan in one stage (see the in-code note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web_scraper_v1_spark.functions import text as TX
from web_scraper_v1_spark.functions.extraction import (
    extract_receiver_response,
    golden_text,
)
from web_scraper_v1_spark.functions import urls as U
from web_scraper_v1_spark.operators.dedup import _hash_shingles
from web_scraper_v1_spark.operators.frontier import prepare_seeds
from web_scraper_v1_spark.operators.seen import SeenSet

_BIT_IDX = np.arange(64, dtype=np.uint64)
_BIT_VAL = (np.uint64(1) << _BIT_IDX).astype(np.uint64)
_WINNOW_POWERS = np.power(
    np.uint64(257), np.arange(8, dtype=np.uint64)[::-1], dtype=np.uint64
)


from pyspark.sql import types as T  # noqa: E402

PARSE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("simhash", T.LongType()),
        T.StructField("n_shingles", T.IntegerType()),
        T.StructField("n_winnow", T.IntegerType()),
    ]
)


@F.pandas_udf(PARSE_FEATURES_SCHEMA)
def parse_features_udf(texts: pd.Series) -> pd.DataFrame:
    """Parse-side sketching in ONE Arrow pass per batch — the features a
    crawl-to-training-data pipeline computes at parse time (so dedup runs
    without re-reading 100 TB of bodies): word-3-gram shingle set ->
    64-bit SimHash bit-vote sketch, plus winnowing k-gram fingerprint count
    (Schleimer et al.). Bundling them into a single UDF keeps one
    JVM<->Python round-trip per batch instead of three."""
    simhash = np.zeros(len(texts), dtype=np.int64)
    n_sh = np.zeros(len(texts), dtype=np.int32)
    n_win = np.zeros(len(texts), dtype=np.int32)
    for i, t in enumerate(texts):
        if t is None:
            continue
        norm = " ".join(t.strip().lower().split())
        w = norm.split()
        shingles = list(
            dict.fromkeys(
                " ".join(w[j : j + 3]) for j in range(len(w) - 2)
            )
        )
        n_sh[i] = len(shingles)
        if shingles:
            h = _hash_shingles(shingles)
            bits = (h[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)
            votes = bits.sum(axis=0) * 2 > len(h)
            simhash[i] = _BIT_VAL[votes].sum(dtype=np.uint64).astype(np.int64)
        b = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
        if len(b) >= 8:
            wins = np.lib.stride_tricks.sliding_window_view(b, 8)
            kh = (wins.astype(np.uint64) * _WINNOW_POWERS).sum(
                axis=1, dtype=np.uint64
            )
            if len(kh) >= 4:
                picks = np.lib.stride_tricks.sliding_window_view(kh, 4).min(
                    axis=1
                )
            else:
                picks = kh
            n_win[i] = len(np.unique(picks))
    return pd.DataFrame(
        {"simhash": simhash, "n_shingles": n_sh, "n_winnow": n_win}
    )


def fetch_parse_wave(
    spark,
    seeds: DataFrame,
    pages: DataFrame,
    seen: DataFrame | None = None,
    use_bloom: bool = True,
    seen_set: SeenSet | None = None,
    parse_features: bool = False,
) -> DataFrame:
    """One full fetch+parse wave; returns the parsed results DataFrame
    (url, user_agent, ip_address, forwarded_host, text, fingerprint,
    page_bytes). Pass a prebuilt ``seen_set`` to model steady state — the
    engine maintains the bloom incrementally across rounds
    (plans/crawl.py), it does not rebuild it per wave.
    ``parse_features=True`` adds the parse-side sketching stage (simhash /
    shingle / winnow counts over the page body) that a training-data
    pipeline runs at crawl time."""
    prepared = prepare_seeds(seeds, batch_size=1 << 62)
    return fetch_parse_from_frontier(
        spark,
        prepared,
        pages,
        seen=seen,
        use_bloom=use_bloom,
        seen_set=seen_set,
        parse_features=parse_features,
    )


def fetch_parse_from_frontier(
    spark,
    prepared: DataFrame,
    pages: DataFrame,
    seen: DataFrame | None = None,
    use_bloom: bool = True,
    seen_set: SeenSet | None = None,
    parse_features: bool = False,
) -> DataFrame:
    """Steady-state entry: the frontier is ALREADY prepared (canonicalized,
    hashed, deduped) — in the engine it lives in committed snapshots
    (plans/crawl.py), so per-wave work starts at seen-set filtering, not at
    re-preparing the whole frontier."""
    if seen_set is None and seen is not None:
        seen_set = SeenSet(spark, n_bits=1 << 24, use_bloom=use_bloom)
        seen_set.load(seen)
    if seen_set is not None:
        prepared = seen_set.filter_new(prepared)

    # -- KEY PLAN SHAPE -------------------------------------------------
    # (a) The raw page bodies (the 100 TB column) never enter a shuffle:
    #     the scan projects (canonical_url, head, page_bytes) where
    #     ``head`` is the leading prefix lines cut JVM-side — valid for
    #     the receiver corpus format (fields lead; parse_error <=> fewer
    #     than 3 lines total). The generic full-body path stays in
    #     functions/extraction.py and is what the byte-parity gate runs.
    # (b) Scan stages are pure JVM (codegen'd project + the runtime
    #     Bloom-filter the optimizer injects from the wave side of the
    #     join, spark.sql.optimizer.runtime.bloomFilter.enabled); Python
    #     never runs inside a parquet-scan stage — measured pathological
    #     under this sandbox's VM at high task counts, and on a real
    #     cluster it would couple scan IO with UDF CPU in one stage.
    # (c) The Arrow UDFs (extraction, then sketching over the EXTRACTED
    #     text — what a training-data pipeline sketches) run in the
    #     post-join stage, fed ~200 B rows from the shuffle.
    # the 3-line head always fits in the leading 512 bytes of the receiver
    # corpus format (UA line <= ~130 B incl. the 2-byte Cyrillic pair, IP +
    # host lines far less), so cut BINARY-side before decoding — charset
    # decode is per-byte work and bodies are KBs (measured 1.6x on the
    # head projection at 3M pages; a mid-codepoint cut can only land in
    # line >= 4, which substring_index discards). The generic full-body
    # path in functions/extraction.py remains the byte-parity gate.
    pages_head = pages.select(
        U.canonicalize(F.col("url")).alias("canonical_url"),
        F.substring_index(
            F.decode(F.substring(F.col("html"), 1, 512), "UTF-8"), "\n", 3
        ).alias("head"),
        F.octet_length("html").alias("page_bytes"),
    )
    fetched = pages_head.join(
        prepared.select("canonical_url"), "canonical_url"
    )
    parsed = fetched.withColumn(
        "r", extract_receiver_response(F.encode("head", "UTF-8"))
    ).filter(~F.col("r.parse_error"))
    txt = golden_text(F.col("r"))
    out = parsed.select(
        F.col("canonical_url").alias("url"),
        F.col("r.user_agent").alias("user_agent"),
        F.col("r.ip_address").alias("ip_address"),
        F.col("r.forwarded_host").alias("forwarded_host"),
        txt.alias("text"),
        F.md5(F.encode(txt, "UTF-8")).alias("fingerprint"),
        "page_bytes",
        *(
            [parse_features_udf(txt).alias("features")]
            if parse_features
            else []
        ),
    )
    return out
