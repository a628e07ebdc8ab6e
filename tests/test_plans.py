"""Physical-plan quality gates: the properties that make the engine viable
at 100 TB are asserted on the optimized plans, not just trusted.

* predicate pushdown reaches the parquet scan (PushedFilters);
* column pruning keeps ReadSchema to what the query needs;
* the small dimension side of the fetch-as-join is BroadcastHashJoin
  (the 100 TB fact side must never shuffle for it);
* aggregations are map-side partial (partial_* before the Exchange);
* the big-wave frontier x pages join is a shuffle join ON THE JOIN KEY only
  (no extra exchanges).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_scraper_v1_spark import queries as Q

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    df = Q.queries()["filter_predicate"](spark, SF)
    plan = plan_of(df)
    assert "PushedFilters:" in plan
    assert "o_totalprice" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_column_pruning(spark):
    df = Q.queries()["scan_project"](spark, SF)
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "c_name" in read_schema
    # unused columns must not be read
    assert "c_nationkey" not in read_schema


def test_broadcast_join_small_dim(spark):
    df = Q.queries()["broadcast_join"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_partial_aggregation(spark):
    df = Q.queries()["groupby_agg"](spark, SF)
    plan = plan_of(df)
    # map-side combine before the exchange
    assert "partial_sum" in plan or "partial_count" in plan


def test_crawl_slice_broadcasts_wave(spark):
    """The politeness-bounded wave is broadcast against the corpus — the
    corpus side (100 TB at scale) must not shuffle for the fetch join."""
    df = Q.queries()["crawl_slice"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_unbounded_wave_is_never_broadcast(spark, tmp_path):
    """With no politeness budget the selected wave can be the ENTIRE
    pending frontier — the engine must NOT hint a broadcast of it (a
    config-dependent OOM at 10^10 URLs). Auto-broadcast is disabled here
    so any BroadcastExchange in the plan could only come from a hint."""
    from web_scraper_v1_spark.plans.crawl import CrawlEngine

    wave = spark.range(0, 1000).selectExpr(
        "concat('https://h', id % 7, '.com/p/', id) as canonical_url",
        "id as queue_seq",
    )
    pages = spark.range(0, 1000).selectExpr(
        "concat('https://h', id % 7, '.com/p/', id) as canonical_url",
        "cast(concat('body', id) as binary) as html",
    )
    unbounded = CrawlEngine(spark, str(tmp_path / "wj_unbounded"))
    bounded = CrawlEngine(spark, str(tmp_path / "wj_bounded"), host_budget=3)
    assert not unbounded.broadcast_wave
    assert bounded.broadcast_wave
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_u = plan_of(unbounded._wave_join(pages, wave)[0])
        plan_b = plan_of(bounded._wave_join(pages, wave)[0])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastExchange" not in plan_u
    # the budget-bounded wave is still hint-broadcast (corpus never shuffles)
    assert "BroadcastHashJoin" in plan_b
    df = Q.queries()["anti_join_seen"](spark, SF)
    plan = plan_of(df)
    assert "LeftAnti" in plan


def test_embedding_neardup_has_no_cartesian_product(spark):
    """The registered near-dup query must be the bucketed sign-LSH plan —
    no cross join anywhere (the all-pairs baseline is test-only)."""
    df = Q.queries()["embedding_neardup"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_neardup_t09_bands_prune_subquadratically(spark):
    """The production-regime entry (t=0.9, r=8-bit bands) must actually
    PRUNE: the band-bucket candidate set over the registered query's own
    augmented corpus stays a small fraction of all pairs (the t=0.45
    stress twin is documented as unprunable; this one is the shape a real
    pipeline runs), while still containing every planted >=0.9 pair."""
    from web_scraper_v1_spark.operators.similarity import lsh_signatures

    df = Q.queries()["embedding_neardup_t09"](spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    base = spark.read.parquet(f"{SF}/embeddings.parquet").selectExpr(
        "vec_id", "cast(embedding as array<double>) as embedding"
    )
    twins = base.filter("vec_id < 25").selectExpr(
        "vec_id + 1000000 as vec_id",
        "transform(embedding, (x, i) -> "
        "x + 0.05D * element_at(embedding, ((i + 1) % 64) + 1)) as embedding",
    )
    aug = base.unionByName(twins)
    n = aug.count()
    sigs = lsh_signatures(aug, dim=64, n_planes=32)
    buckets = sigs.select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> struct("
                "cast(b as int) as band, "
                "shiftrightunsigned(sig, cast(b * 8 as int)) & 255"
                " as band_key))"
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.band_key")
    la = buckets.select("band", "band_key", F.col("id").alias("id_a"))
    lb = buckets.select("band", "band_key", F.col("id").alias("id_b"))
    cand = (
        la.join(lb, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    all_pairs = n * (n - 1) // 2
    assert cand >= 25  # every planted pair is a candidate
    assert cand < 0.05 * all_pairs, (cand, all_pairs)


def test_neardup_verify_join_does_not_force_vector_broadcast(spark):
    """The near-dup verifier's vector lookups must be size-driven, never
    hint-broadcast: an unbounded embedding table cannot ship to every
    executor. With auto-broadcast disabled, any BroadcastExchange left in
    the plan could only come from a hint."""
    from web_scraper_v1_spark.operators.similarity import lsh_neardup_pairs

    embs = spark.range(0, 500).selectExpr(
        "id as vec_id",
        "transform(sequence(1, 8), j -> cast(pmod(id * j, 97) as float))"
        " as embedding",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(lsh_neardup_pairs(embs, dim=8, threshold=0.9))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastExchange" not in plan
    assert "CartesianProduct" not in plan


def test_global_prefix_sum_has_no_single_partition_stage(spark):
    """Trace sequencing must never execute a single-partition global sort:
    the prefix sum is range-partitioned + per-partition windows + a driver
    prefix of per-partition totals (operators/ordering.py)."""
    from web_scraper_v1_spark.operators import ordering
    from web_scraper_v1_spark.operators.ordering import global_prefix_sum

    df = spark.range(0, 10_000).selectExpr(
        "id as queue_seq", "cast(id % 3 as int) as priority",
        "cast(1 + id % 4 as int) as n_attempts",
    )
    out = global_prefix_sum(
        df, ("priority", "queue_seq"), F.col("n_attempts"), "_start",
        num_partitions=8,
    )
    plan = plan_of(out)
    assert "SinglePartition" not in plan
    assert "Window" in plan  # the per-partition windows are still windows

    # value parity vs the naive global-window cumsum
    rows = {
        (r.priority, r.queue_seq): r._start for r in out.collect()
    }
    ordered = sorted(rows, key=lambda t: t)
    acc = 0
    for prio, seq in ordered:
        assert rows[(prio, seq)] == acc, (prio, seq)
        acc += 1 + seq % 4
    ordering.release_cached()


def test_whole_stage_codegen_relational(spark):
    """The relational core runs inside whole-stage codegen spans (the
    formatted mode hides codegen ids under AdaptiveSparkPlan, so ask for
    the codegen explain explicitly)."""
    df = Q.queries()["groupby_agg"](spark, SF)
    df.collect()  # let AQE finalize stages
    executed = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark operators fused into WholeStageCodegen stage n
    assert "*(" in executed


def test_ann_ivf_corpus_never_shuffles_before_probe_join(spark):
    """IVF plan shape: centroid assignment is one Arrow-kernel map over
    the corpus (behind a single decoupling repartition — never co-resident
    with the scan), the probe side is the ONLY broadcast (queries x
    n_probe rows), and nothing is a cartesian product. With auto-broadcast
    disabled, any BroadcastExchange can only be the intended hints."""
    from web_scraper_v1_spark.operators.similarity import ivf_ann_topk

    embs = spark.range(0, 500).selectExpr(
        "id as vec_id",
        "transform(sequence(1, 8), j -> cast(pmod(id * j, 97) as float))"
        " as embedding",
    )
    qids = embs.select("vec_id").filter(F.col("vec_id") < 5)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(
            ivf_ann_topk(embs, qids, dim=8, k=3, n_centroids=4, n_probe=2)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly the two intended broadcasts survive (query-id semi side and
    # the probe set) — the corpus relation itself is never broadcast, and
    # the only exchange after the corpus scan is the final top-k window's.
    # "BroadcastExchange (" matches tree nodes only (the formatted detail
    # section re-prints each node as "(N) BroadcastExchange").
    assert plan.count("BroadcastExchange (") == 2, plan.count(
        "BroadcastExchange ("
    )


def test_sessionize_single_shuffle(spark):
    """Sessionization's whole pipeline — lag window, running-sum window,
    (user_id, session_num) aggregation — must run on ONE exchange: the
    windows share the hash-by-user_id sort, and
    HashPartitioning(user_id) satisfies the aggregation's clustering on
    (user_id, session_num) (subset rule), so no second shuffle appears.
    At 100 TB the only data movement is the initial repartition by user."""
    plan = plan_of(Q.queries()["sessionize"](spark, SF))
    assert plan.count("Exchange (") == 1, plan
    # map-side partial aggregation before the final one
    assert "partial_min" in plan or "partial_count" in plan


def test_decontaminate_broadcasts_eval_side_only(spark):
    """Decontamination's train-side shingle stream must flow scan ->
    explode -> broadcast hash join with NO exchange before the join (the
    eval relation is the broadcast); the only data shuffle is the
    (train, eval) aggregation over actual contamination hits."""
    plan = plan_of(Q.queries()["decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    # exactly one broadcast (eval shingles) and one shuffle (final agg)
    assert plan.count("BroadcastExchange (") == 1, plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    # the shuffle is the aggregation's, fed by a partial aggregate
    assert "partial_count" in plan


def test_dedup_stream_batch_single_shuffle(spark):
    """The watermark-dedup batch twin moves data ONCE (hash by url for
    the collect_list agg); the greedy TTL fold runs over the per-url
    occurrence arrays with no further exchange — at 100 TB the operator
    costs one shuffle of (url, ts) pairs, nothing else."""
    plan = plan_of(Q.queries()["dedup_stream_batch"](spark, SF))
    assert plan.count("Exchange (") == 1, plan
    assert "partial_collect_list" in plan or "collect_list" in plan


def test_decontaminate_hashed_equals_string_plan(spark):
    """The xxhash64-shingle decontamination (the >=10^7-shingle
    eval-suite shape: 8 B/key broadcast instead of ~50 B strings) must
    return exactly the string plan's rows — hashing changes the join key
    width, never the values — and keep the same broadcast-eval-only
    plan shape with the hash computed before the join (no extra
    exchange)."""
    string_rows = sorted(
        tuple(r)
        for r in Q.queries()["decontaminate"](spark, SF).collect()
    )
    hashed_rows = sorted(
        tuple(r)
        for r in Q.queries()["decontaminate_hashed"](spark, SF).collect()
    )
    assert hashed_rows == string_rows
    assert len(hashed_rows) > 0

    plan = plan_of(Q.queries()["decontaminate_hashed"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("BroadcastExchange (") == 1, plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "xxhash64" in plan


def test_unigram_surprisal_token_stream_never_shuffles(spark):
    """The scoring pass reads the token stream once: vocab (TakeOrdered
    top-K) and the one-row total reach it as broadcasts, so the only
    exchanges are the map-side-combined token-count aggregation (model
    training) and the final (doc_id) aggregation — nothing repartitions
    the 100 TB token stream itself for scoring."""
    plan = plan_of(Q.queries()["unigram_surprisal"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan  # map-side combine before every exchange


def test_segment_dedup_single_scan(spark):
    """The corpus is tokenized and exploded ONCE: corpus-wide segment
    counts come from a count window over the segment partitioning, so
    the plan has exactly one parquet scan and two hash exchanges (seg,
    then doc_id) — no join-back re-scan, no cartesian shape."""
    plan = plan_of(Q.queries()["segment_dedup"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # formatted explain prints each node twice (tree + details): one
    # scan node == two mentions
    assert plan.count("Scan parquet") == 2, plan
    assert plan.count("Arguments: hashpartitioning") == 2, plan


def test_segment_dedup_hashed_exchange_key_width(spark):
    """The skew-guarded variant's exchanges are keyed on the 8-byte
    xxhash64(seg), never on the segment STRING: the string is hashed in
    the scan-side projection, counts are a map-side-partial groupBy (the
    reduce side of a boilerplate segment receives partial rows, not
    occurrences), and the join-back is an AQE-skew-splittable equi-join
    — no count window over raw segments anywhere."""
    plan = plan_of(Q.queries()["segment_dedup_hashed"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    # every hash exchange keys on seg_h or doc_id — none on seg#
    assert "hashpartitioning(seg#" not in plan, plan
    assert "hashpartitioning(seg_h#" in plan, plan
    # two-phase count: map-side partial before the exchange
    assert "partial_count" in plan, plan
    # the string variant's count window is gone from this plan
    assert "Window" not in plan, plan


def test_recrawl_delta_generation_join_on_key(spark):
    """The generation diff is a full-outer equi-join on the url key plus
    one tiny per-host aggregation — two exchanges of generation rows,
    one of host rows, nothing else."""
    plan = plan_of(Q.queries()["recrawl_delta"](spark, SF))
    assert "FullOuter" in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Arguments: hashpartitioning") == 3, plan


def test_registry_contract_consistency():
    """The driver-contract wiring cannot silently drift: every bench
    headline name resolves in the registry, every registered query has an
    oracle, and the self-maintaining export order (sorted by
    last-driver-verified round from the CORRECTNESS_r*.json artifacts)
    actually places every never/least-recently-verified and
    refactored-this-round name inside the driver harness's 50-query
    window."""
    import bench
    from web_scraper_v1_spark.queries import (
        _REVERIFY,
        _last_driver_verified,
    )

    qs = Q.queries()
    oracles = Q.oracle_sql()
    assert set(bench.HEADLINE) <= set(qs), set(bench.HEADLINE) - set(qs)
    assert set(oracles) == set(qs)  # every query oracle-gated
    assert _REVERIFY <= set(qs)
    last = _last_driver_verified()
    order = list(qs)
    rounds_seen = sorted({last.get(n, 0) for n in order})
    # the export order is non-decreasing in last-verified round (0 =
    # never verified or refactored this round), so the driver's window
    # always covers the stalest queries first
    eff = [0 if n in _REVERIFY else last.get(n, 0) for n in order]
    assert eff == sorted(eff), eff
    # every PREVIOUSLY-verified query that has since gone >=2 rounds
    # without a driver row must fit in the checked window — that is the
    # enforceable rotation guarantee. Never-verified queries (new this
    # round) are NOT staleness violations: when more than 50 land in one
    # round the cap makes all-at-once coverage pigeonhole-impossible,
    # and the ordering assertion above already guarantees they occupy
    # the head of the window before anything fresher. A previously-green
    # query crowded past the window by new arrivals IS flagged here.
    if rounds_seen:
        newest = rounds_seen[-1]
        stale = [
            n
            for n in order
            if n in last and last[n] <= newest - 2
        ]
        assert all(order.index(n) < 50 for n in stale), (
            f"{len(stale)} stale previously-verified queries exceed "
            "the 50-query window"
        )


def test_shuffle_shards_never_single_partition(spark):
    """The epoch reshuffle is a per-shard window sort behind one hash
    exchange on the shard key — never a global (SinglePartition) sort."""
    plan = plan_of(Q.queries()["shuffle_shards"](spark, SF))
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan


def test_pack_sequences_single_shard_exchange(spark):
    """Sequence packing shares shuffle_shards' scale shape: one hash
    exchange on the shard key, per-shard window work, no global sort."""
    plan = plan_of(Q.queries()["pack_sequences"](spark, SF))
    assert "SinglePartition" not in plan, plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan


def test_dsir_select_bucket_join_is_broadcast(spark):
    """The <=256-row bucket table must broadcast onto the compacted
    per-(doc,bucket) counts — a shuffle join here would re-exchange the
    whole feature stream at 100 TB — and the top-k is TakeOrdered, not a
    global sort. Both feature passes read the persisted compact frame
    (InMemoryTableScan), so the token stream is hashed exactly once."""
    plan = plan_of(Q.queries()["dsir_select"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "InMemoryTableScan" in plan, plan


def test_domain_frequency_cap_single_exchange(spark):
    """host_cnt and the md5 rank come from the SAME window partitioning:
    exactly one hash exchange (keyed by host), no groupBy-count +
    join-back double scan."""
    plan = plan_of(Q.queries()["domain_frequency_cap"](spark, SF))
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "Join" not in plan, plan


def test_dup_span_stats_no_joinback_rescan(spark):
    """Gram document-frequency is the dense_rank/max window pair, not a
    groupBy + join-back: the corpus tokenizes once into the persisted
    marked frame (both downstream reads are InMemoryTableScans) and the
    only joins left are the per-doc totals x runs merge (broadcastable
    at any scale: one row per doc)."""
    plan = plan_of(Q.queries()["dup_span_stats"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_mixture_token_budget_single_exchange(spark):
    """The greedy budget fill is one cumulative window per source
    partition: a single hash exchange, no global sort, no SinglePartition
    stage (the cut is per-source, never corpus-wide)."""
    plan = plan_of(Q.queries()["mixture_token_budget"](spark, SF))
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dup_span_remove_no_rescan_no_smj(spark):
    """Duplication and ownership both come from windows over the one gram
    exchange (no groupBy + join-back); the cover join is an equi-join on
    (doc_id, tp) — no cartesian, no sort-merge join forced by a
    mis-shaped key, no single-partition stage."""
    plan = plan_of(Q.queries()["dup_span_remove"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_gopher_filter_single_stage_no_shuffle(spark):
    """Every Gopher statistic folds over the in-row token array: the whole
    filter is one codegen'd map over the scan — no exchange, no explode
    blow-up, no Python."""
    plan = plan_of(Q.queries()["gopher_quality_filter"](spark, SF))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "codegen id" in plan, plan


def test_quality_classifier_broadcast_model(spark):
    """Linear-model inference ships the 256-row weight table to the data:
    the weight join must be broadcast-hash (a shuffle join would
    re-exchange the whole compacted feature stream at 100 TB) and both
    aggregations map-side partial."""
    plan = plan_of(Q.queries()["quality_classifier"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_semdedup_broadcast_reps_no_pairs(spark):
    """SemDeDup's scale contract: the representative table (<= 2^n_bits
    rows by construction) broadcasts onto the corpus — one scan, a
    broadcast-hash join, and NO pairwise structure anywhere (no
    CartesianProduct, no corpus-side SortMergeJoin)."""
    plan = plan_of(Q.queries()["semdedup"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_image_ahash_no_shuffle_before_hash(spark):
    """The perceptual-dedup contract: payload binaries are hashed inside
    the Arrow batch (mapInPandas on the scan side), so the only exchange
    in the plan is the 8-byte ahash groupBy — the wide payload column
    must never appear in an Exchange's schema."""
    plan = plan_of(Q.queries()["image_neardup_ahash"](spark, SF))
    assert "SortMergeJoin" not in plan, plan
    assert "partial_count" in plan, plan
    # exactly one exchange: the post-hash aggregation, keyed by ahash
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    ex_arg = plan.split("Arguments: hashpartitioning(")[1].split("\n")[0]
    assert "ahash" in ex_arg and "payload" not in ex_arg, ex_arg


def test_video_frame_sample_partition_preserving(spark):
    """Frame sampling fans out INSIDE the Arrow batch: the whole query is
    scan -> synthesize -> mapInPandas with no exchange at all."""
    plan = plan_of(Q.queries()["video_frame_sample"](spark, SF))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_blocklist_filter_broadcasts_list_side(spark):
    """The blocklist joins the URL stream as broadcast-hash keyed by host
    — the 100 TB fact side must never shuffle for the cheapest cut in
    the pipeline."""
    plan = plan_of(Q.queries()["url_blocklist_filter"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_doc_embedding_pool_broadcast_table_partial_agg(spark):
    """Embedding lookup ships the table to the data (broadcast-hash) and
    pooling is map-side partial; the corpus never shuffles wider than the
    pooled int64 columns."""
    plan = plan_of(Q.queries()["doc_embedding_pool"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_sum" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_selection_manifest_composition_shape(spark):
    """The selection capstone composes five stages without inventing new
    shuffle shapes: broadcast joins for the small sides, window exchanges
    for cap/budget, no cartesian, no single-partition stage, and no
    sort-merge join forced anywhere."""
    plan = plan_of(Q.queries()["selection_manifest"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_anchor_text_agg_aggregate_argmax_no_window(spark):
    """Anchor aggregation keys every exchange on the url and resolves the
    dominant anchor with a min(struct) AGGREGATE, not a per-URL window —
    no Sort over the edge stream, no cartesian shape, and the final
    hosts x top join is host-bounded."""
    plan = plan_of(Q.queries()["anchor_text_agg"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "partial_count" in plan, plan
    assert "Window" not in plan, plan


def test_bigram_surprisal_stream_never_shuffles_for_scoring(spark):
    """Like unigram_surprisal: scoring reaches the bigram stream only as
    broadcasts (top-K vocab via TakeOrdered, continuation counts, one-row
    total) — no sort-merge join repartitions the 100 TB stream."""
    plan = plan_of(Q.queries()["bigram_surprisal"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan, plan


def test_crawl_budget_alloc_broadcast_alloc_table(spark):
    """The allocation table returns to the frontier as a broadcast-hash
    join; the only corpus-wide exchange is the per-host selection window.
    SinglePartition appears only on host-cardinality/one-row tables (the
    largest-remainder rank over |hosts| rows), never on the corpus."""
    plan = plan_of(Q.queries()["crawl_budget_alloc"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_crawl_budget_alloc_largest_remainder_exact(spark):
    """Allocations match a pure-Python largest-remainder reference and sum
    to exactly B=200 — the exact-int64 div/mod arithmetic cannot drift."""
    rows = Q.queries()["crawl_budget_alloc"](spark, SF).collect()
    alloc_by_host = {}
    per_host_rns = {}
    for r in rows:
        alloc_by_host[r.host] = r.alloc
        per_host_rns.setdefault(r.host, []).append(r.rn)
    # python reference from the same docs table
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    import collections

    s = collections.Counter()
    n_docs = collections.Counter()
    for r in docs:
        host = r.doc_id % 37
        s[host] += len(r.text.strip().lower().split())
        n_docs[host] += 1
    S = sum(s.values())
    base = {h: (200 * v) // S for h, v in s.items()}
    rem = {h: (200 * v) % S for h, v in s.items()}
    leftover = 200 - sum(base.values())
    order = sorted(s, key=lambda h: (-rem[h], h))
    ref = {
        h: base[h] + (1 if i < leftover else 0)
        for i, h in enumerate(order)
    }
    assert sum(ref.values()) == 200
    # hosts absent from the result got a zero allocation; present hosts
    # carry exactly the reference allocation
    for h, a in alloc_by_host.items():
        assert a == ref[h], (h, a, ref[h])
    for h in set(ref) - set(alloc_by_host):
        assert ref[h] == 0, (h, ref[h])
    # each host keeps its first min(alloc, available) URLs, ranks 1..k
    for h, rns in per_host_rns.items():
        k = min(ref[h], n_docs[h])
        assert sorted(rns) == list(range(1, k + 1))
    assert sum(len(v) for v in per_host_rns.values()) == sum(
        min(ref[h], n_docs[h]) for h in ref
    )


def test_bigram_pairs_lambda_reads_bound_array(spark):
    """Regression gate for the O(tokens^2) inlining bug: the pair
    transform's element_at lambda must read the materialized `arr`
    attribute, never the split expression itself — inlined, every
    element access re-runs the regex tokenization (measured 13.8 s vs
    2.0 s warm at sf0.1)."""
    import re

    plan = plan_of(Q.queries()["bigram_surprisal"](spark, SF))
    assert "arr#" in plan, plan
    heads = re.findall(r"transform\(.*?lambdafunction", plan)
    assert heads and not any("split(" in h for h in heads), plan


def test_url_trap_detect_single_exchange(spark):
    """Trap counting and representative ranking share ONE hash exchange
    on (host, template) — the count window and the rank window must not
    each repartition."""
    plan = plan_of(Q.queries()["url_trap_detect"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, plan
    assert "hashpartitioning(host" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_frontier_compact_combinable_agg_no_window(spark):
    """Snapshot compaction folds latest-state-per-url with a map-side
    partial max_by AGGREGATE — never a row_number window (which would
    sort every url's generation run) and never more than the one
    url-keyed exchange."""
    plan = plan_of(Q.queries()["frontier_compact"](spark, SF))
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan, plan
    assert "SinglePartition" not in plan, plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, plan


def test_hll_distinct_sketch_sized_exchanges(spark):
    """The HLL plan's aggregates are all map-side partial (the exchange
    carries register rows, never raw keys) and the exact-count
    comparison side joins back as a BROADCAST."""
    plan = plan_of(Q.queries()["hll_distinct"](spark, SF))
    assert "partial_max" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sus_sample_no_single_partition_global_cumsum(spark):
    """The token-weighted systematic sampler's GLOBAL cumulative sum
    must ride the two-phase global_prefix_sum (range partition +
    per-bucket windows + driver offsets), never a global-ORDER-BY
    window: every Window is hash-partitioned, and the only
    SinglePartition exchange is the scalar corpus-total aggregate
    (whose exchange carries one partial-sum row per task — the bm25
    one-row-stat shape, scale-safe by construction)."""
    from web_scraper_v1_spark.operators import ordering

    plan = plan_of(Q.queries()["sus_sample"](spark, SF))
    assert plan.count("SinglePartition") == 1, plan
    assert "Window" in plan, plan
    assert "rangepartitioning" in plan, plan  # phase 1 of the prefix sum
    assert "hashpartitioning(_pid" in plan, plan  # phase 2 windows
    ordering.release_cached()


def test_phrase_search_probe_prunes_term_partitions(spark):
    """The phrase probe must touch only the queried terms' inverted
    lists: the stored postings are partitionBy(term) parquet, so the
    scan's PartitionFilters carry the term predicate (partition pruning,
    not a full-index read), and the corpus text column never appears in
    the probe plan — query-time serving reads the index, not the
    documents."""
    df = Q.queries()["phrase_search"](spark, SF)
    plan = plan_of(df)
    assert "PartitionFilters:" in plan, plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "term" in pf, plan
    # probe never rescans the corpus: no documents.parquet scan, no text
    assert "documents.parquet" not in plan
    assert "text" not in plan.split("== Physical Plan ==")[-1]


def test_rendezvous_shard_zero_shuffle(spark):
    """HRW assignment is a per-row array expression: the whole query
    (both the W=16 and W=20 argmaxes) must compile to a single scan
    stage with NO exchange of any kind."""
    df = Q.queries()["rendezvous_shard"](spark, SF)
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, plan
    assert "Generate" not in tree, plan  # no explode either


def test_shard_balance_no_single_partition(spark):
    """The global size rank must ride the two-phase prefix sum: range
    partitioning for the total order, never a SinglePartition window."""
    from web_scraper_v1_spark.operators import ordering

    df = Q.queries()["shard_balance_snake"](spark, SF)
    plan = plan_of(df).lower()
    assert "singlepartition" not in plan, plan
    assert "rangepartitioning" in plan, plan
    ordering.release_cached()


def test_script_detect_zero_shuffle(spark):
    """Script classification is per-row regex arithmetic in-scan: the
    plan must contain no Exchange at all and stay in codegen."""
    plan = plan_of(Q.queries()["script_detect"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, plan
    # '*' prefixes mark operators fused into a WholeStageCodegen stage
    assert "codegen id" in plan, plan


def test_wfq_schedule_single_host_exchange(spark):
    """WFQ's only exchange is the per-host cumulative window; wave
    assignment is arithmetic — no global sort, no SinglePartition."""
    plan = plan_of(Q.queries()["wfq_schedule"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, plan
    assert "hashpartitioning(host" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_soft404_single_scan_single_exchange(spark):
    """Dup-counting is a count window over the ONE (host, body-hash)
    exchange — a single corpus scan (no self-join that would re-pay the
    scan + md5 + phrase regex on a probe side), the url_trap_detect
    shape."""
    plan = plan_of(Q.queries()["soft404_detect"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, plan
    assert tree.count("Scan parquet") == 1, plan
    assert "hashpartitioning(host" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_focused_crawl_topic_broadcast(spark):
    """The topic lexicon joins the exploded anchor words as a broadcast
    hash join — the word stream must never shuffle for lexicon lookup."""
    plan = plan_of(Q.queries()["focused_crawl_priority"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_canonical_select_argmax_aggregate_not_window(spark):
    """The per-cluster canonical argmax must be a map-side-combinable
    min(struct) aggregate; the only windows in the plan belong to the
    upstream component computation, never to a per-cluster sort of the
    labeled corpus (partial_min proves the combine)."""
    from web_scraper_v1_spark.operators import dedup as DD

    try:
        plan = plan_of(Q.queries()["canonical_select"](spark, SF))
        assert "partial_min" in plan, plan
        assert "SinglePartition" not in plan, plan
    finally:
        # plan construction executes the pair/component jobs, which
        # persist the posting-list frame — don't leak it into the rest
        # of the session (the ordering.release_cached() convention)
        DD.release_cached()


def test_ccnet_buckets_no_single_partition_rank(spark):
    """The global surprisal rank must ride the two-phase prefix sum
    (range partitioning), never a SinglePartition ORDER-BY window; the
    tercile count n arrives as a broadcast one-row aggregate."""
    from web_scraper_v1_spark.operators import ordering

    import re

    try:
        plan = plan_of(Q.queries()["ccnet_buckets"](spark, SF))
        # phase 1 + phase 2 of the prefix sum are present
        assert "rangepartitioning" in plan, plan
        assert "hashpartitioning(_pid" in plan, plan
        # the tercile count arrives broadcast
        assert "BroadcastExchange" in plan, plan
        # every SinglePartition exchange is a scalar/top-K aggregate
        # (vocab limit, n_total, n) — NONE may feed a Sort/Window pair
        # (that would be the global-ORDER-BY rank this test forbids)
        tree = plan.split("\n\n")[0]
        single_ids = {
            m.group(1)
            for m in re.finditer(r"\((\d+)\) Exchange", plan)
            if "SinglePartition"
            in plan.split(f"({m.group(1)}) Exchange")[1].split("(")[0]
        }
        lines = tree.split("\n")
        for i, ln in enumerate(lines):
            m = re.search(r"(?:Sort) \((\d+)\)", ln)
            if not m:
                continue
            # the exchange directly under a Sort must not be 1-partition
            for nxt in lines[i + 1 : i + 2]:
                em = re.search(r"Exchange \((\d+)\)", nxt)
                if em:
                    assert em.group(1) not in single_ids, plan
    finally:
        ordering.release_cached()


def test_canonical_link_collapse_single_scan_single_exchange(spark):
    """rel=canonical extraction is in-scan regex; the only exchange is
    the count window on canonical_url (the soft404 shape)."""
    plan = plan_of(Q.queries()["canonical_link_collapse"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1, plan
    assert tree.count("Scan parquet") == 1, plan
    assert "SinglePartition" not in plan, plan


def test_cdx_surt_range_prefix_filter_is_pushed(spark):
    """The stored-CDX prefix lookup must reach the parquet scan as a
    pushed StartsWith so range partitions that cannot contain the prefix
    are pruned by min-max stats at 100 TB."""
    df = Q.queries()["cdx_surt_range"](spark, SF)
    plan = plan_of(df)
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "StartsWith(surt" in pushed


def test_runtime_bloom_filter_join_injects_on_selective_dim(spark):
    """Catalyst's runtime bloom-filter join (a free win the reference
    cannot express): a selective filter on the small side of a
    shuffle join injects might_contain(xxhash64(key)) into the fact
    scan, so at 100 TB most frontier rows are dropped before the
    exchange. Sandbox tables sit below the default creation/application
    size thresholds, so the test lowers them explicitly — at production
    scale the defaults fire on their own."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".creationSideThreshold": "100MB",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        fact = spark.read.parquet(f"{SF}/lineitem.parquet")
        dim = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_totalprice") > 500000
        )
        j = fact.join(dim, fact.l_orderkey == dim.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        plan = plan_of(j)
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_key_partitions(spark):
    """AQE's runtime skew-join handling (the second half of the north
    rule's skew story next to explicit salting): a hot join key must be
    re-planned as SortMergeJoin(skew=true) at runtime. Sandbox-scale
    inputs sit under the default skew thresholds, so the test lowers
    them; at 100 TB one hot host crosses the defaults on its own."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(0, 200000)
            .select((F.col("id") * 0).alias("k"), F.col("id").alias("v"))
            .union(
                spark.range(0, 20000).select(
                    (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
                )
            )
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").select(F.sum(F.col("v") + F.col("w")))
        j.collect()  # AQE re-plans at runtime; inspect the executed plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_content_extract_single_scan_single_exchange(spark):
    """The block classifier reads the corpus once and exchanges once (the
    doc_id partitioning shared by both context windows) — pass 2 must
    not re-scan or re-shuffle."""
    plan = plan_of(Q.queries()["content_extract"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Scan parquet") == 2, plan  # one node: tree+details
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "SinglePartition" not in plan, plan


def test_containment_pairs_never_cartesian(spark):
    """The directed-containment candidate generation is a posting-list
    equi-join keyed by shingle — any corpus-side cartesian/nested-loop
    shape would be quadratic at scale."""
    plan = plan_of(Q.queries()["containment_dedup"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
