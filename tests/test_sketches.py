"""Mergeable sketches (operators/sketches.py): HLL accuracy + register-max
merge semantics, CMS one-sided error, and the fixed-state-size guarantees
that make both sketches the 10^10-row answer to distinct/frequency counting
(the exchange carries the sketch, never the corpus)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from web_scraper_v1_spark.operators import sketches as SK


def _keys(spark, n: int, start: int = 0):
    return spark.range(start, start + n).select(
        F.col("id").cast("string").alias("k"), F.lit("g").alias("grp")
    )


def test_hll_register_state_is_bounded(spark):
    """However many input rows, the sketch is <= m register rows."""
    regs = SK.hll_registers(_keys(spark, 50_000), F.col("k"), ["grp"])
    assert regs.count() <= SK.HLL_M


def test_hll_estimate_accuracy(spark):
    """Standard error for m=4096 is ~1.04/sqrt(m) = 1.6%; allow 5% on one
    fixed draw."""
    for n in (500, 10_000):
        regs = SK.hll_registers(_keys(spark, n), F.col("k"), ["grp"])
        est = SK.hll_estimate(regs, ["grp"]).collect()[0]
        assert abs(est["hll_corrected"] - n) / n < 0.05, (n, est)


def test_hll_merge_equals_rebuild(spark):
    """Register-wise max of two halves' sketches == the sketch of the
    union — the incremental-crawl property, exact on the full register
    state (not just the estimate)."""
    a = _keys(spark, 6_000)
    b = _keys(spark, 6_000, start=3_000)  # overlapping halves
    merged = SK.hll_merge(
        SK.hll_registers(a, F.col("k"), ["grp"]).unionByName(
            SK.hll_registers(b, F.col("k"), ["grp"])
        ),
        ["grp"],
    )
    whole = SK.hll_registers(
        a.unionByName(b).distinct(), F.col("k"), ["grp"]
    )
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_hll_linear_counting_small_range(spark):
    """At n << m the raw estimator biases; the corrected column must use
    linear counting m*ln(m/V) and land within 2% at n=200."""
    regs = SK.hll_registers(_keys(spark, 200), F.col("k"), ["grp"])
    est = SK.hll_estimate(regs, ["grp"]).collect()[0]
    assert est["zero_regs"] > 0
    expect = round(SK.HLL_M * math.log(SK.HLL_M / est["zero_regs"]))
    assert est["hll_corrected"] == expect
    assert abs(est["hll_corrected"] - 200) <= 4


def test_cms_never_underestimates_and_is_tight(spark):
    """One-sided error: est >= exact for EVERY key; with 1000 distinct
    keys in w=2048 buckets the overestimate stays small."""
    rows = spark.range(10_000).select(
        (F.col("id") % 1000).cast("string").alias("k")
    )
    counters = SK.cms_build(rows, F.col("k"))
    keys = rows.groupBy("k").agg(F.count("*").alias("exact_n"))
    est = SK.cms_probe(counters, keys, F.col("k")).collect()
    assert len(est) == 1000
    assert all(r["est_n"] >= r["exact_n"] for r in est)
    # total inflation bounded: mean overestimate < 2x the theoretical
    # eps*N = (e/w)*N expectation per row pair (generous fixed-draw slack)
    over = sum(r["est_n"] - r["exact_n"] for r in est) / len(est)
    assert over < 2 * (math.e / SK.CMS_W) * 10_000


def test_cms_counter_table_is_fixed_size(spark):
    counters = SK.cms_build(
        spark.range(30_000).select(F.col("id").cast("string").alias("k")),
        F.col("k"),
    )
    assert counters.count() <= SK.CMS_D * SK.CMS_W


def test_cms_probe_broadcasts_counters(spark):
    """The probe join must broadcast the fixed-size counter table — the
    corpus side never reshuffles."""
    rows = spark.range(2_000).select(F.col("id").cast("string").alias("k"))
    counters = SK.cms_build(rows, F.col("k"))
    probe = SK.cms_probe(
        counters, rows.select("k").distinct(), F.col("k")
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cms_unseen_key_reads_zero(spark):
    """A probe key the build never saw must estimate 0 when its buckets
    are empty (left join + coalesce) — and never error on missing
    counter rows."""
    rows = spark.range(10).select(F.col("id").cast("string").alias("k"))
    counters = SK.cms_build(rows, F.col("k"))
    unseen = spark.createDataFrame(
        [("never-seen-key-xyz",)], "k string"
    )
    got = SK.cms_probe(counters, unseen, F.col("k")).collect()
    assert len(got) == 1
    # 10 keys in 4x2048 buckets: the odds every one of this key's 4
    # buckets collides are nil, so min reads an empty bucket -> 0
    assert got[0]["est_n"] == 0


def test_hll_null_keys_ignored(spark):
    """NULL keys must not corrupt the register state (count-distinct
    semantics): sketch(with NULLs) == sketch(without)."""
    clean = _keys(spark, 500)
    dirty = clean.unionByName(
        spark.range(3).select(
            F.lit(None).cast("string").alias("k"), F.lit("g").alias("grp")
        )
    )
    a = SK.hll_registers(clean, F.col("k"), ["grp"])
    b = SK.hll_registers(dirty, F.col("k"), ["grp"])
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0
