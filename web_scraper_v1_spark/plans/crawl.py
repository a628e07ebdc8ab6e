"""The crawl engine: a driver-side round loop where each round is one Spark
job pipeline — the declarative replacement for the reference's transmitter
loop (/root/reference/cmd/transmitter/main.go:173-218):

    frontier pending  (seeds ⟕anti processed, Bloom-prefiltered)
      → robots broadcast-join
      → per-host window top-k (politeness budget, salted vs skew)
      → "fetch" = join against the page corpus (O7: the sandbox fetch is a
         join; a live fetch would be pooled HTTP in mapInPandas)
      → vectorized extraction UDF (O8, byte-identical)
      → retry expansion (O6: attempts column + posexplode — deterministic
         failures re-emit retry_limit attempt rows, exhausted -> dropped)
      → append trace / seen / results / processed snapshots + lineage

Batch barriers (queue.go:64-71 / worker_manager.go:131-138) become Spark
action boundaries: one committed round == one drained batch. The identity
epoch counter increments once per round where the reference rotates Tor
identity (main.go:201-218) — control plane only, recorded in lineage.

Crash safety / resume: all writes land as uncommitted snapshot dirs and are
published atomically by the manifest commit at the end of the round; a rerun
resumes from the last committed round and reproduces the identical final
state (pytest-gated).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from web_scraper_v1_spark.functions import urls as U
from web_scraper_v1_spark.functions.extraction import extract_receiver_response
from web_scraper_v1_spark.operators.frontier import (
    apply_robots,
    per_host_topk,
    prepare_seeds,
)
from web_scraper_v1_spark.operators.seen import SeenSet
from web_scraper_v1_spark.sources.snapshots import SnapshotStore

TRACE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("identity_epoch", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("outcome", T.StringType(), False),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("user_agent", T.StringType(), True),
        T.StructField("ip_address", T.StringType(), True),
        T.StructField("forwarded_host", T.StringType(), True),
        T.StructField("round", T.IntegerType(), False),
    ]
)

PROCESSED_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("outcome", T.StringType(), False),
    ]
)


@dataclass
class RoundStats:
    round: int
    wave_size: int
    fetched: int
    dropped: int
    robots_blocked: int
    deferred: int
    attempts: int
    bytes_fetched: int
    seq_start: int
    seq_end: int
    duration_s: float


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        run_dir: str,
        batch_size: int = 3,
        retry_limit: int = 3,
        host_budget: int | None = None,
        salt_buckets: int = 16,
        use_bloom: bool = True,
        bloom_bits: int = 1 << 23,
        recrawl_after: int | None = None,
    ):
        self.spark = spark
        self.store = SnapshotStore(run_dir)
        self.store.clean_orphans()
        self.batch_size = batch_size
        self.retry_limit = retry_limit
        self.host_budget = host_budget
        self.salt_buckets = salt_buckets
        # TTL semantics (in_memory.go:51-61): a processed URL older than
        # ``recrawl_after`` rounds expires from the live seen view, so it
        # re-enters pending and is refetched — the engine's recrawl policy.
        # The Bloom keeps expired keys (harmless: maybe-seen rows go
        # through the exact join against the TTL-filtered live set, so
        # exactness is preserved).
        self.recrawl_after = recrawl_after
        self.processed_set = SeenSet(
            spark, n_bits=bloom_bits, use_bloom=use_bloom
        )

    # -- state ------------------------------------------------------------
    def _load_state(self) -> tuple[int, int]:
        """Returns (next_round, next_seq) from committed lineage."""
        rounds = self.store.rounds()
        if not rounds:
            return 0, 0
        last = max(rounds, key=lambda m: m["round"])
        return last["round"] + 1, last["seq_end"] + 1

    def trace(self) -> DataFrame:
        return self.store.read(self.spark, "trace", TRACE_SCHEMA)

    def seen(self) -> DataFrame:
        return self.store.read(self.spark, "seen", SEEN_SCHEMA)

    def results(self) -> DataFrame:
        return self.store.read(self.spark, "results", RESULTS_SCHEMA)

    def processed(self) -> DataFrame:
        return self.store.read(self.spark, "processed", PROCESSED_SCHEMA)

    def _processed_live(self, r: int) -> DataFrame:
        """The seen view effective for round ``r``: everything processed,
        minus TTL-expired rows when a recrawl policy is set."""
        df = self.processed()
        if self.recrawl_after is not None:
            df = df.filter(F.col("round") > r - self.recrawl_after)
        return df.select("url_hash", "url")

    # -- run ---------------------------------------------------------------
    def run(
        self,
        seeds: DataFrame,
        pages: DataFrame,
        robots: DataFrame | None = None,
        max_rounds: int = 10_000,
    ) -> list[RoundStats]:
        prepared = prepare_seeds(seeds, self.batch_size).cache()
        max_arrival = (
            prepared.agg(F.max("arrival_round")).collect()[0][0] or 0
        )
        # the fetch universe, canonical-keyed; urls are unique by corpus
        # construction (one row per page)
        pages_prepared = pages.select(
            U.canonicalize(F.col("url")).alias("canonical_url"),
            F.col("html"),
            F.octet_length(F.col("html")).alias("page_bytes"),
        )

        next_round, next_seq = self._load_state()
        self.processed_set.load(self._processed_live(next_round))

        stats: list[RoundStats] = []
        r = next_round
        while r < max_rounds:
            if r != next_round:
                # refresh the exact seen side for THIS round from committed
                # snapshots (keeps the logical plan flat across rounds, and
                # applies TTL expiry even across empty rounds); the bloom is
                # maintained incrementally inside _run_round
                self.processed_set.set_exact(self._processed_live(r))
            pending = self.processed_set.filter_new(
                prepared.filter(F.col("arrival_round") <= F.lit(r))
            )
            st = self._run_round(r, next_seq, pending, pages_prepared, robots)
            if st is None:
                if r > max_arrival and self.recrawl_after is None:
                    break
                # empty round before all seeds have arrived (or between a
                # fetch and its TTL expiry under a recrawl policy): commit
                # nothing, advance; with recrawl_after set, max_rounds is
                # the crawl horizon (matches the simulator's empty-batch
                # no-op)
                r += 1
                continue
            stats.append(st)
            next_seq = st.seq_end + 1
            r += 1
        prepared.unpersist()
        return stats

    def _run_round(
        self,
        r: int,
        seq_base: int,
        pending: DataFrame,
        pages_prepared: DataFrame,
        robots: DataFrame | None,
    ) -> RoundStats | None:
        t0 = time.monotonic()
        checked = apply_robots(pending, robots)
        ranked = per_host_topk(
            checked.filter(~F.col("robots_blocked")),
            self.host_budget,
            salt_buckets=self.salt_buckets,
        )
        selected = ranked.filter(F.col("selected")).drop("selected").cache()
        n_selected = selected.count()
        blocked = checked.filter(F.col("robots_blocked"))
        n_deferred = 0
        if self.host_budget is not None:
            n_deferred = ranked.filter(~F.col("selected")).count()

        # -- fetch = join wave against the corpus. The wave is politeness-
        # bounded (small); broadcast it so the 100 TB corpus never shuffles:
        # an inner broadcast-hash join finds hits, misses come from a
        # broadcast anti-join of the wave against the hit keys.
        hits = (
            pages_prepared.join(
                F.broadcast(selected), "canonical_url", "inner"
            )
            if n_selected
            else None
        )
        if hits is not None:
            parsed = hits.withColumn(
                "r", extract_receiver_response(F.col("html"))
            ).select(
                "queue_seq",
                "canonical_url",
                "url_hash",
                "host",
                "page_bytes",
                F.col("r.user_agent").alias("user_agent"),
                F.col("r.ip_address").alias("ip_address"),
                F.col("r.forwarded_host").alias("forwarded_host"),
                F.col("r.parse_error").alias("parse_error"),
            ).cache()
            hit_keys = parsed.select("canonical_url")
            misses = selected.join(
                F.broadcast(hit_keys), "canonical_url", "left_anti"
            ).select(
                "queue_seq",
                "canonical_url",
                "url_hash",
                "host",
                F.lit(None).cast("long").alias("page_bytes"),
                F.lit(None).cast("string").alias("user_agent"),
                F.lit(None).cast("string").alias("ip_address"),
                F.lit(None).cast("string").alias("forwarded_host"),
                F.lit(True).alias("parse_error"),
            )
            fetch_rows = parsed.unionByName(misses)
        else:
            fetch_rows = None

        # -- task rows: one per finalized task, with its attempt count.
        # fetch-or-parse failure => retried then dropped (deterministic
        # sandbox: every retry fails identically), worker.go:81-95.
        common = [
            "queue_seq",
            "canonical_url",
            "url_hash",
            "host",
            "outcome_kind",
            "n_attempts",
            "user_agent",
            "ip_address",
            "forwarded_host",
            "page_bytes",
        ]
        parts = []
        if fetch_rows is not None:
            ok = ~F.col("parse_error")
            parts.append(
                fetch_rows.withColumn(
                    "outcome_kind",
                    F.when(ok, F.lit("fetched")).otherwise(F.lit("failing")),
                )
                .withColumn(
                    "n_attempts",
                    F.when(ok, F.lit(1)).otherwise(F.lit(self.retry_limit)),
                )
                .select(*common)
            )
        blocked_rows = blocked.select(
            "queue_seq",
            "canonical_url",
            "url_hash",
            "host",
            F.lit("blocked").alias("outcome_kind"),
            F.lit(1).alias("n_attempts"),
            F.lit(None).cast("string").alias("user_agent"),
            F.lit(None).cast("string").alias("ip_address"),
            F.lit(None).cast("string").alias("forwarded_host"),
            F.lit(None).cast("long").alias("page_bytes"),
        )
        parts.append(blocked_rows)
        task_rows = parts[0]
        for p in parts[1:]:
            task_rows = task_rows.unionByName(p)
        task_rows = task_rows.cache()

        n_tasks = task_rows.count()
        if n_tasks == 0:
            selected.unpersist()
            task_rows.unpersist()
            return None

        # -- global sequential trace (queue order). The window is over the
        # wave only (politeness-bounded), not the frontier; at cluster scale
        # this single-partition sort is the one deliberately serial step,
        # and it sorts k*hosts rows, not 10^10.
        w = Window.orderBy("queue_seq")
        start = F.coalesce(
            F.sum("n_attempts").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        exploded = (
            task_rows.withColumn("_start", start)
            .select(
                "*",
                F.posexplode(F.sequence(F.lit(1), F.col("n_attempts"))).alias(
                    "_i", "attempt"
                ),
            )
            .withColumn(
                "outcome",
                F.when(F.col("outcome_kind") == "fetched", F.lit("fetched"))
                .when(F.col("outcome_kind") == "blocked", F.lit("robots_blocked"))
                .when(
                    F.col("attempt") < F.lit(self.retry_limit),
                    F.lit("failed"),
                )
                .otherwise(F.lit("dropped")),
            )
            .withColumn(
                "seq",
                F.lit(seq_base) + F.col("_start") + F.col("attempt") - 1,
            )
        )
        trace_df = exploded.select(
            F.col("seq").cast("long"),
            F.lit(r).cast("int").alias("round"),
            F.lit(r).cast("int").alias("identity_epoch"),
            F.col("canonical_url").alias("url"),
            "host",
            F.col("attempt").cast("int"),
            "outcome",
        )

        seen_df = (
            task_rows.filter(F.col("outcome_kind") == "fetched")
            .select(
                "url_hash",
                F.col("canonical_url").alias("url"),
                F.lit(r).cast("int").alias("round"),
            )
        )
        results_df = task_rows.filter(
            F.col("outcome_kind") == "fetched"
        ).select(
            F.col("canonical_url").alias("url"),
            "user_agent",
            "ip_address",
            "forwarded_host",
            F.lit(r).cast("int").alias("round"),
        )
        processed_df = task_rows.select(
            "url_hash",
            F.col("canonical_url").alias("url"),
            F.lit(r).cast("int").alias("round"),
            F.when(F.col("outcome_kind") == "fetched", "fetched")
            .when(F.col("outcome_kind") == "blocked", "robots_blocked")
            .otherwise("dropped")
            .alias("outcome"),
        )

        # -- metrics (one small aggregation pass over the cached wave)
        agg = task_rows.groupBy("outcome_kind").agg(
            F.count("*").alias("n"),
            F.sum("n_attempts").alias("att"),
            F.sum(F.coalesce("page_bytes", F.lit(0))).alias("bytes"),
        ).collect()
        by_kind = {row.outcome_kind: row for row in agg}
        n_fetched = by_kind.get("fetched").n if "fetched" in by_kind else 0
        n_dropped = by_kind.get("failing").n if "failing" in by_kind else 0
        n_blocked = by_kind.get("blocked").n if "blocked" in by_kind else 0
        n_attempts = sum(row.att for row in agg)
        n_bytes = sum(row.bytes for row in agg)
        part_hist = {
            str(row[0]): row[1]
            for row in task_rows.groupBy(F.spark_partition_id())
            .count()
            .collect()
        }

        # -- write snapshots (invisible until the manifest commit below)
        tables = {
            "trace": self.store.write_snapshot(trace_df, "trace", r),
            "processed": self.store.write_snapshot(processed_df, "processed", r),
        }
        if n_fetched:
            tables["seen"] = self.store.write_snapshot(seen_df, "seen", r)
            tables["results"] = self.store.write_snapshot(results_df, "results", r)

        st = RoundStats(
            round=r,
            wave_size=n_tasks,
            fetched=n_fetched,
            dropped=n_dropped,
            robots_blocked=n_blocked,
            deferred=n_deferred,
            attempts=n_attempts,
            bytes_fetched=n_bytes,
            seq_start=seq_base,
            seq_end=seq_base + n_attempts - 1,
            duration_s=round(time.monotonic() - t0, 3),
        )
        self.store.commit_round(
            r,
            tables,
            meta={
                "identity_epoch": r,
                "wave_size": st.wave_size,
                "fetched": st.fetched,
                "dropped": st.dropped,
                "robots_blocked": st.robots_blocked,
                "deferred": st.deferred,
                "attempts": st.attempts,
                "bytes_fetched": st.bytes_fetched,
                "seq_start": st.seq_start,
                "seq_end": st.seq_end,
                "duration_s": st.duration_s,
                "partition_histogram": part_hist,
            },
        )
        # fold the round's finalized keys into the bloom (distributed build
        # over the bounded wave, driver-side OR-merge)
        self.processed_set.add(processed_df)

        selected.unpersist()
        if fetch_rows is not None:
            parsed.unpersist()
        task_rows.unpersist()
        return st
