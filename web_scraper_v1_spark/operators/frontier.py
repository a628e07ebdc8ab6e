"""Frontier operators: seed preparation, robots filtering, and the
politeness-bounded per-host wave selection.

The reference's frontier is a mutex'd FIFO slice with cond-var dequeue
(/root/reference/internal/taskqueue/queue.go:40-61). Its ordering is
wall-clock dependent; the engine replaces it with *deterministic sort keys*
(SURVEY.md §4): every task carries ``queue_seq`` (its global enqueue index),
and a wave is the per-host top-k by ``queue_seq`` — a window-ranked priority
queue that reproduces the sequential FIFO trace while running fully
parallel.

Skew (SURVEY.md §7 hard part (e)): one hot host would funnel its entire
pending set through a single window partition. ``per_host_topk`` is
two-phase: phase 1 ranks within (host, salt-bucket) partitions and keeps
only k rows per bucket, bounding the exact phase-2 window to k*salt rows
per host — salting the shuffle without breaking per-host ordering, since
phase 1 never drops any row that could be in the true per-host top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from web_scraper_v1_spark.functions import urls as U


def prepare_seeds(seeds: DataFrame, batch_size: int) -> DataFrame:
    """Canonicalize, hash, first-occurrence dedup (O17), and assign each
    task its arrival round (the transmitter enqueues batch_size tasks
    between barriers, cmd/transmitter/main.go:179-187).

    ``queue_seq`` is derived from the task_id ordinal (``task-{i}``,
    1-based) — the deterministic global enqueue order. Dedup keeps the
    earliest occurrence per canonical URL (window by url, min queue_seq),
    matching the simulator's enqueue-time dedup.

    ``priority`` (SURVEY.md §1.3 frontier schema) is carried through
    (null/missing -> 0); lower values run first within a round.
    ``depth`` is carried through (missing -> 0) for link-discovery growth.
    """
    if "priority" not in seeds.columns:
        seeds = seeds.withColumn("priority", F.lit(0))
    if "depth" not in seeds.columns:
        seeds = seeds.withColumn("depth", F.lit(0))
    prepared = (
        seeds.withColumn(
            "queue_seq",
            F.element_at(F.split("task_id", "-"), -1).cast("long") - 1,
        )
        .withColumn("priority", F.coalesce(F.col("priority"), F.lit(0)).cast("int"))
        .withColumn("depth", F.coalesce(F.col("depth"), F.lit(0)).cast("int"))
        .withColumn("canonical_url", U.canonicalize(F.col("url")))
        .withColumn("url_hash", U.url_hash(F.col("canonical_url")))
        .withColumn("host", U.host(F.col("url")))
        .withColumn("path", U.path(F.col("url")))
        .withColumn(
            "arrival_round", (F.col("queue_seq") / batch_size).cast("int")
        )
    )
    w = Window.partitionBy("canonical_url").orderBy("queue_seq")
    return (
        prepared.withColumn("_occ", F.row_number().over(w))
        .filter(F.col("_occ") == 1)
        .drop("_occ")
    )


def apply_robots(tasks: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Adds ``robots_blocked`` boolean and ``crawl_delay_s`` (null when the
    host has no robots row or the table carries no delay). Robots tables
    are tiny relative to the frontier (one row per host) — broadcast join,
    no shuffle on the frontier side. Prefix semantics: blocked iff any
    disallow prefix prefixes the URL path."""
    if robots is None:
        return tasks.withColumn("robots_blocked", F.lit(False)).withColumn(
            "crawl_delay_s", F.lit(None).cast("double")
        )
    delay = (
        F.col("crawl_delay_s").cast("double")
        if "crawl_delay_s" in robots.columns
        else F.lit(None).cast("double")
    )
    r = robots.select(
        "host",
        F.col("disallow_prefixes").alias("_disallow"),
        delay.alias("_delay"),
    )
    joined = tasks.join(F.broadcast(r), "host", "left")
    blocked = F.when(
        F.col("_disallow").isNull(), F.lit(False)
    ).otherwise(
        F.exists("_disallow", lambda p: F.col("path").startswith(p))
    )
    return (
        joined.withColumn("robots_blocked", blocked)
        .withColumn("crawl_delay_s", F.col("_delay"))
        .drop("_disallow", "_delay")
    )


def apply_robots_rep(
    tasks: DataFrame,
    rules: DataFrame,
    path_col: str = "path",
) -> DataFrame:
    """Spec-grade REP matching (RFC 9309 / Google's robots.txt rules):
    per-host allow/disallow rules with ``*`` wildcards and ``$`` end
    anchors, precedence = LONGEST pattern wins, allow beats disallow on
    a length tie. Adds ``allowed`` boolean; no matching rule = allowed.

    ``rules`` schema: (host, rule_type 'allow'|'disallow', pattern,
    regex nullable) — ``regex`` is the anchored translation for wildcard
    patterns and NULL for plain prefixes, which take the ``startswith``
    fast path (pure codegen, no per-row regex compile). Real robots
    files are overwhelmingly plain prefixes, so at 10^10 URLs the regex
    slow path only runs for the rare wildcard rules.

    The whole precedence fold is ONE exact-integer max: score =
    2*len(pattern) + is_allow, verdict = max(score over matching rules)
    is odd (or no rule matched at all). Rules collapse to ONE array row
    per host and broadcast, so the frontier side takes a broadcast join
    plus a per-row fold — ZERO shuffle (a join-explode + re-aggregate
    shape would shuffle all 10^10 frontier rows to regroup; a per-row
    fold over a ~4-element rules array costs microseconds instead).
    The fold is a higher-order function (interpreted, not codegen) — fine
    here because it runs once per URL over a tiny array, unlike the
    per-token kernels BENCH.md §3 moved to Arrow.
    """
    per_host = rules.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.col("pattern"),
                F.col("regex"),
                (
                    F.length("pattern") * 2
                    + (F.col("rule_type") == "allow").cast("int")
                ).alias("score"),
            )
        ).alias("_rules")
    )
    joined = tasks.join(F.broadcast(per_host), "host", "left")
    verdict = F.expr(
        f"""
        CASE WHEN _rules IS NULL THEN true
        ELSE COALESCE(
          array_max(transform(
            filter(_rules, r -> CASE WHEN r.regex IS NULL
                                 THEN startswith({path_col}, r.pattern)
                                 ELSE {path_col} RLIKE r.regex END),
            r -> r.score)) % 2 = 1,
          true)
        END
        """
    )
    return joined.withColumn("allowed", verdict).drop("_rules")


def per_host_topk(
    tasks: DataFrame,
    k: int | None,
    order_cols: tuple[str, ...] = ("queue_seq",),
    salt_buckets: int = 16,
    budget_col: str | None = None,
) -> DataFrame:
    """Politeness wave selection: adds ``selected`` boolean — True for the
    first *budget* tasks per host in deterministic order.

    The per-host budget is ``least(k, tasks[budget_col])``: ``k`` is a
    global cap (None = uncapped), ``budget_col`` a per-row column holding
    the host's crawl-delay-derived token budget (must be constant within a
    host; null = unlimited). With both None every task is selected.

    Two-phase salted ranking defeats host skew: the exact per-host window
    (phase 2) sees at most budget*salt_buckets rows per host instead of
    the host's whole pending set. (Correct for any per-host-constant
    budget b: the true per-host top-b is contained in the union of the
    per-(host, salt) top-b sets, so phase 1 never drops a selectable row.)
    """
    if k is None and budget_col is None:
        return tasks.withColumn("selected", F.lit(True))
    parts = [F.lit(k)] if k is not None else []
    if budget_col is not None:
        parts.append(F.col(budget_col))
    # F.least skips nulls, so an unlimited (null) budget_col falls back to k
    bud = parts[0] if len(parts) == 1 else F.least(*parts)
    order = [F.col(c) for c in order_cols]
    if salt_buckets > 1:
        w1 = Window.partitionBy(
            "host", F.pmod(F.col("url_hash"), F.lit(salt_buckets))
        ).orderBy(*order)
        pre = tasks.withColumn("_rn1", F.row_number().over(w1))
        keep = bud.isNull() | (F.col("_rn1") <= bud)
        survivors = pre.filter(keep).drop("_rn1")
        overflow = pre.filter(~keep).drop("_rn1").withColumn(
            "selected", F.lit(False)
        )
    else:
        survivors = tasks
        overflow = None
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked = survivors.withColumn("_rn2", F.row_number().over(w2))
    out = ranked.withColumn(
        "selected", bud.isNull() | (F.col("_rn2") <= bud)
    ).drop("_rn2")
    if overflow is not None:
        out = out.unionByName(overflow)
    return out


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    n_workers: int,
    out_col: str = "worker",
) -> DataFrame:
    """Highest-random-weight (rendezvous / HRW) assignment of each row's
    ``key_col`` to one of ``n_workers`` — the host-to-fetcher shard map a
    crawl fleet needs when the fleet RESIZES. The reference distributes
    work by whoever dequeues next (/root/reference/internal/taskqueue/
    queue.go:52-61, any worker takes any task), which scatters a host's
    fetches across the fleet and defeats per-host connection reuse and
    politeness accounting; a sharded fleet instead pins each host to one
    worker. The naive pin ``hash(key) % W`` remaps ~(W-1)/W of ALL keys
    when W changes; HRW (Thaler & Ravishankar 1998, the public algorithm
    behind consistent-hashing fleets) moves only the keys whose argmax
    weight now lands on a new worker — an expected W_new-W_old / W_new
    fraction — and every moved key lands on a NEW worker, never shuffled
    between survivors.

    Zero-shuffle by construction: the argmax over workers is a per-row
    array expression — ``array_max(transform(sequence(0, W-1), w ->
    struct(weight(key, w), -w)))`` — entirely inside whole-stage codegen;
    no explode, no join, no exchange (plan-gated in tests/test_plans.py).
    The weight is the engine-portable 48-bit md5 nibble fold
    (``conv(md5(key || ':' || w)[:12], 16, 10)``; ties break to the
    smallest worker via the negated-worker struct field) so a DuckDB
    oracle replays the assignment bit-exactly. W is a constant — a fetch
    fleet is O(10^3) — so the cost is W md5 calls per key, evaluated once
    per DISTINCT key upstream in production (the host table, not the URL
    table); fleets with W large enough to hurt use the same paper's
    skeleton-tree variant.
    """
    key = F.col(key_col)
    best = F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_workers - 1)),
            lambda w: F.struct(
                F.conv(
                    F.substring(
                        F.md5(F.concat(key, F.lit(":"), w.cast("string"))),
                        1,
                        12,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("wt"),
                (-w).alias("nw"),
            ),
        )
    )
    return df.withColumn(out_col, (-best["nw"]).cast("int"))
