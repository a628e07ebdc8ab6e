"""Structured Streaming analog of the reference's RabbitMQ message plane.

The reference publishes each parsed record as JSON onto a queue (O9,
/root/reference/internal/message/publisher/rabbitmq_publisher.go:55-85) and
consumes it with auto-ack at-most-once semantics, skipping malformed
payloads (O10, internal/message/consumer/rabbitmq_consumer.go:52-91). Here:

* publish  -> ``encode_results`` (to_json of the record struct) appended as
  files under a stream directory — the queue is a file source, which is how
  an Iceberg-backed deployment would expose append snapshots to
  ``readStream``;
* consume  -> ``read_results_stream`` + ``decode_results``: schema'd
  from_json in PERMISSIVE mode; malformed payloads decode to null and are
  dropped (exactly the consumer's log-and-skip at rabbitmq_consumer.go:84-87
  — but with exactly-once file-source semantics instead of auto-ack
  at-most-once);
* windowed metrics -> ``host_rate_metrics``: event-time window + watermark
  (late fetch records beyond the watermark are dropped deterministically);
* custom stateful operator -> ``cumulative_host_counts``:
  ``applyInPandasWithState`` keeping a per-host running URL count — the
  streaming twin of the TTL cache's per-key mutable state (O16,
  internal/cache/in_memory.go:51-87).

Tests drive everything with ``trigger(availableNow=True)`` so streams are
deterministic and bounded (no wall-clock dependence).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RESULT_MSG_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("user_agent", T.StringType(), True),
        T.StructField("ip_address", T.StringType(), True),
        T.StructField("forwarded_host", T.StringType(), True),
        T.StructField("fetch_ts", T.TimestampType(), False),
    ]
)


def encode_results(results: DataFrame) -> DataFrame:
    """Publisher analog: one JSON document per record (O9's
    json.Marshal), as a single ``value`` column."""
    return results.select(
        F.to_json(F.struct(*[F.col(f.name) for f in RESULT_MSG_SCHEMA]))
        .alias("value")
    )


def read_results_stream(spark: SparkSession, queue_dir: str) -> DataFrame:
    """Consumer source: the appended message files as an unbounded stream
    (maxFilesPerTrigger bounds per-micro-batch work at scale)."""
    return (
        spark.readStream.schema("value STRING")
        .option("maxFilesPerTrigger", 64)
        .text(queue_dir)
    )


def decode_results(stream: DataFrame) -> DataFrame:
    """Consumer decode: from_json (PERMISSIVE -> null on malformed) then
    drop undecodable rows — the log-and-skip at
    rabbitmq_consumer.go:84-87."""
    parsed = stream.select(
        F.from_json("value", RESULT_MSG_SCHEMA).alias("m")
    )
    return parsed.filter(F.col("m").isNotNull() & F.col("m.url").isNotNull()).select("m.*")


def host_rate_metrics(
    decoded: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time windowed fetch-rate per host with a watermark for late
    records — the streaming version of the per-round metrics table (O24).

    Consumption contract: in ``update`` output mode a window's row is
    re-emitted by EVERY micro-batch that touches it (counts are monotone
    per (window_start, host)), so consumers must keep the LAST update per
    key — max(n_urls) — never sum emissions across batches. Append mode
    emits once per finalized window but withholds windows the watermark
    has not passed at stream end. Also valid on a BATCH DataFrame (the
    watermark node is eliminated), which is how the oracle-gated
    ``host_rate_window`` registry query runs this exact plan."""
    host = F.substring_index(
        F.substring_index("url", "://", -1), "/", 1
    ).alias("host")
    return (
        decoded.withWatermark("fetch_ts", watermark)
        .groupBy(F.window("fetch_ts", window_duration).alias("w"), host)
        .agg(F.count("*").alias("n_urls"))
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "n_urls",
        )
    )


def session_metrics(
    decoded: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-host SESSION windows (gap-of-inactivity close) with a
    watermark — Spark's native ``session_window`` on the fetch stream:
    the streaming counterpart of the registry's ``sessionize`` query
    (which builds the same semantics from lag + running-sum windows over
    the batch events table; a pytest asserts the two constructions agree
    on identical input). Append mode emits a session once the watermark
    passes its close; state is per-(host, open-session), merged by the
    engine when late events bridge two open sessions.

    Also valid on a batch DataFrame (watermark node eliminated), which is
    how the twin-agreement test runs this exact plan."""
    host = F.substring_index(
        F.substring_index("url", "://", -1), "/", 1
    ).alias("host")
    return (
        decoded.withWatermark("fetch_ts", watermark)
        .groupBy(F.session_window("fetch_ts", gap).alias("w"), host)
        .agg(F.count("*").alias("n_urls"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "host",
            "n_urls",
        )
    )


def dedup_stream(decoded: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact URL dedup across micro-batches — the seen set
    (O16/O17) as a streaming operator. ``dropDuplicatesWithinWatermark``
    keeps per-URL state only until the watermark passes the record's event
    time, so state is bounded by the stream's lateness horizon instead of
    growing with every URL ever seen (the streaming analog of the rotating
    Bloom generations in ``operators/seen.py``: a re-fetch separated by
    more than the horizon is treated as fresh — exactly the TTL-recrawl
    semantics, O16's expiry). First occurrence wins; later duplicates are
    dropped whichever micro-batch they arrive in."""
    return decoded.withWatermark("fetch_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def dedup_stream_batch(decoded: DataFrame, horizon_s: int = 300) -> DataFrame:
    """Batch twin of ``dedup_stream`` with the state-expiry axis made
    explicit: per url, occurrences in event-time order, keep the first;
    keep a later occurrence iff its ``fetch_ts`` is at least ``horizon_s``
    after the LAST KEPT occurrence (TTL re-admission — the recrawl
    semantics of the rotating seen set, O16 expiry); drop it otherwise.
    Returns the kept (url, fetch_ts) records.

    Correspondence contract with the streaming operator (the same band
    Spark documents for ``dropDuplicatesWithinWatermark``): duplicates
    within the watermark delay ``D`` of the last kept record are dedup-
    GUARANTEED; occurrences more than ~2D later are re-admit-guaranteed
    (the watermark has provably passed the state's expiry by the time
    they arrive); between D and 2D the streaming outcome depends on
    micro-batch boundaries. tests/test_streaming.py drives the real
    streaming operator one-record-per-micro-batch over input whose gaps
    avoid the ambiguous band and asserts equality with this twin.

    Plan shape: one shuffle keyed by url (collect_list of that url's
    occurrence timestamps — bounded by the per-URL duplicate count, the
    same boundedness the streaming state relies on), then a JVM
    ``aggregate`` fold building the greedy kept-anchor list. The fold is
    interpreted per element, but per-url occurrence arrays are tiny;
    nothing here is per-row Python."""
    occ = decoded.groupBy("url").agg(
        F.array_sort(
            F.collect_list(F.col("fetch_ts").cast("double"))
        ).alias("ts_all")
    )
    kept = F.aggregate(
        F.col("ts_all"),
        F.array().cast("array<double>"),
        lambda acc, t: F.when(
            (F.size(acc) == F.lit(0))
            | (t >= F.element_at(acc, -1) + F.lit(float(horizon_s))),
            F.concat(acc, F.array(t)),
        ).otherwise(acc),
    )
    return occ.select("url", F.explode(kept).alias("t")).select(
        "url", F.col("t").cast("timestamp").alias("fetch_ts")
    )


_STATE_SCHEMA = "total LONG"
_OUT_SCHEMA = "host STRING, batch_urls LONG, total_urls LONG"


def _update_host_count(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    (total,) = state.get if state.exists else (0,)
    total += n
    state.update((total,))
    yield pd.DataFrame(
        {"host": [key[0]], "batch_urls": [n], "total_urls": [total]}
    )


def cumulative_host_counts(decoded: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-host cumulative URL counts
    via applyInPandasWithState (Arrow-batched state updates; the per-key
    mutable map of the reference's cache, O16, as managed stream state)."""
    host = F.substring_index(
        F.substring_index("url", "://", -1), "/", 1
    ).alias("host")
    return (
        decoded.select(host, "url")
        .groupBy("host")
        .applyInPandasWithState(
            _update_host_count,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cumulative_host_counts_batch(
    decoded: DataFrame, window_duration: str = "1 minute"
) -> DataFrame:
    """Batch twin of ``cumulative_host_counts`` with the micro-batch axis
    made explicit: each event-time window is one "batch", and every
    (window, host) row carries that batch's count plus the per-host
    cumulative total THROUGH it — exactly the (host, batch_urls,
    total_urls) contract the stateful operator emits per micro-batch (its
    GroupState total after batch k == this row's total_urls at window k).
    Pure window machinery: per-host partitions, running sum — no
    SinglePartition stage, scale-safe; oracle-gated as the
    ``host_cumulative`` registry query."""
    host = F.substring_index(
        F.substring_index("url", "://", -1), "/", 1
    ).alias("host")
    per_batch = (
        decoded.groupBy(F.window("fetch_ts", window_duration).alias("w"), host)
        .agg(F.count("*").alias("batch_urls"))
        .select(F.col("w.start").alias("window_start"), "host", "batch_urls")
    )
    running = F.sum("batch_urls").over(
        Window.partitionBy("host")
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_batch.select(
        "window_start",
        "host",
        "batch_urls",
        running.cast("long").alias("total_urls"),
    )


def stream_to_snapshots(
    decoded: DataFrame,
    store,
    checkpoint_dir: str,
    table: str = "results",
) -> list:
    """Production sink path: drain the decoded stream into a
    ``SnapshotStore`` with ONE atomically-committed snapshot round per
    micro-batch — the consume->store leg of the reference's pipeline
    (rabbitmq_consumer -> mongo SaveJob, O10+O11) with exactly-once
    delivery instead of auto-ack at-most-once.

    Exactly-once: foreachBatch alone is at-least-once (a crash between
    sink write and checkpoint advance replays the batch). Each commit
    therefore records its micro-batch id in the round's lineage row, and
    a replayed batch id is skipped — write_snapshot overwrites the orphan
    dir from the failed attempt and the manifest rename is atomic, so
    every batch lands in the manifest exactly once whatever the crash
    point. Round ids continue from the store's committed history, which
    interleaves stream batches with engine crawl rounds. Returns the
    committed round records. Bounded here with availableNow (tests /
    drain jobs); a live deployment starts the same query without the
    trigger."""
    committed = {
        r["batch_id"]
        for r in store.rounds()
        if r.get("stream_table") == table
    }

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed:
            return
        rid = store.last_round() + 1
        path = store.write_snapshot(batch_df, table, rid)
        n = batch_df.sparkSession.read.parquet(path).count()
        store.commit_round(
            rid,
            {table: path},
            {"stream_table": table, "batch_id": batch_id, "rows": n},
        )
        committed.add(batch_id)

    q = (
        decoded.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [
        r for r in store.rounds() if r.get("stream_table") == table
    ]


def run_to_sink(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str,
    output_mode: str = "update",
) -> list:
    """Drain the stream deterministically (availableNow) into an in-memory
    sink; returns collected rows. Test/drive helper — production would
    writeStream to an Iceberg/parquet sink with the same checkpointing."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}").collect()
