"""Structured Streaming message-plane tests (O9/O10 analog): JSON
encode/decode roundtrip with skip-on-error, watermarked windowed metrics,
and the applyInPandasWithState cumulative-count operator. All streams are
driven with availableNow triggers — bounded and deterministic."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from web_scraper_v1_spark.streaming.results_stream import (
    RESULT_MSG_SCHEMA,
    cumulative_host_counts,
    decode_results,
    encode_results,
    host_rate_metrics,
    read_results_stream,
    run_to_sink,
)

T0 = dt.datetime(2024, 12, 7, 0, 0, 0)


@pytest.fixture(scope="module")
def queue_dir(spark, tmp_path_factory):
    """Publish two batches of messages (plus malformed payloads) to the
    file-source 'queue'."""
    qdir = str(tmp_path_factory.mktemp("queue"))
    rows = [
        (
            f"http://host{i % 3}.example.com/p/{i}",
            f"UA-{i}",
            f"10.0.0.{i}",
            f"host{i % 3}.example.com",
            T0 + dt.timedelta(seconds=20 * i),
        )
        for i in range(30)
    ]
    results = spark.createDataFrame(rows, RESULT_MSG_SCHEMA)
    encode_results(results.filter(F.col("url").endswith("0") == False)).write.mode(
        "append"
    ).text(qdir)
    encode_results(results.filter(F.col("url").endswith("0"))).write.mode(
        "append"
    ).text(qdir)
    # malformed payloads -> must be skipped (rabbitmq_consumer.go:84-87)
    spark.createDataFrame(
        [("not json at all",), ('{"half": ',), ("",)], "value string"
    ).write.mode("append").text(qdir)
    return qdir


def test_decode_roundtrip_skips_malformed(spark, queue_dir, tmp_path):
    stream = read_results_stream(spark, queue_dir)
    decoded = decode_results(stream)
    rows = run_to_sink(decoded, str(tmp_path / "ck1"), "decoded_sink")
    assert len(rows) == 30  # all valid messages, zero malformed survivors
    urls = {r.url for r in rows}
    assert len(urls) == 30
    assert all(r.user_agent.startswith("UA-") for r in rows)


def test_windowed_host_metrics(spark, queue_dir, tmp_path):
    stream = decode_results(read_results_stream(spark, queue_dir))
    metrics = host_rate_metrics(stream, "1 minute", "2 minutes")
    rows = run_to_sink(metrics, str(tmp_path / "ck2"), "metrics_sink")
    # update-mode contract: a window may be emitted once per micro-batch
    # that updates it (counts are monotone) — keep the LAST update per
    # (window_start, host), never sum raw emissions
    final: dict[tuple, int] = {}
    for r in rows:
        k = (r.window_start, r.host)
        final[k] = max(final.get(k, 0), r.n_urls)
    # 30 msgs at 20s spacing = 600s span -> 10 one-minute windows x 3 hosts
    assert sum(final.values()) == 30
    assert {h for _, h in final} == {
        "host0.example.com", "host1.example.com", "host2.example.com",
    }
    for v in final.values():
        assert v <= 3  # 3 msgs/min spread over 3 hosts


def test_stateful_cumulative_counts(spark, queue_dir, tmp_path):
    stream = decode_results(read_results_stream(spark, queue_dir))
    counts = cumulative_host_counts(stream)
    rows = run_to_sink(
        counts, str(tmp_path / "ck3"), "state_sink", output_mode="append"
    )
    # per host, the LAST emitted total must equal its overall message count
    final: dict[str, int] = {}
    for r in rows:
        final[r.host] = max(final.get(r.host, 0), r.total_urls)
    assert final == {
        "host0.example.com": 10,
        "host1.example.com": 10,
        "host2.example.com": 10,
    }


def test_stateful_totals_equal_batch_twin(spark, queue_dir, tmp_path):
    """The stateful operator's final per-host totals must equal the
    oracle-gated batch twin's last-window totals on the same input (the
    twin is the ``host_cumulative`` registry query's plan)."""
    from web_scraper_v1_spark.streaming.results_stream import (
        cumulative_host_counts_batch,
    )

    stream = decode_results(read_results_stream(spark, queue_dir))
    rows = run_to_sink(
        cumulative_host_counts(stream),
        str(tmp_path / "ck4"),
        "state_sink2",
        output_mode="append",
    )
    stream_final: dict[str, int] = {}
    for r in rows:
        stream_final[r.host] = max(stream_final.get(r.host, 0), r.total_urls)

    batch_decoded = decode_results(
        spark.read.text(queue_dir)
    )
    twin = cumulative_host_counts_batch(batch_decoded).collect()
    twin_final: dict[str, int] = {}
    for r in twin:
        twin_final[r.host] = max(twin_final.get(r.host, 0), r.total_urls)
    assert stream_final == twin_final
    # and the twin's running sums are internally consistent
    per_host = {}
    for r in sorted(twin, key=lambda r: (r.host, r.window_start)):
        per_host[r.host] = per_host.get(r.host, 0) + r.batch_urls
        assert r.total_urls == per_host[r.host]


def test_streaming_session_windows_merge_and_close(spark, tmp_path):
    """session_metrics: events within the gap merge into one session
    (start..last+gap), a gap opens a new one, and append mode emits
    exactly the sessions the final watermark has passed."""
    from web_scraper_v1_spark.streaming.results_stream import session_metrics

    qdir = str(tmp_path / "sess_q")
    secs = [0, 10, 20, 200]
    rows = [
        (
            "http://a.example.com/p", "UA", "ip", "a.example.com",
            T0 + dt.timedelta(seconds=s),
        )
        for s in secs
    ] + [
        # far-future flush event advances the watermark past every
        # session above, so availableNow emits them all deterministically
        (
            "http://z.example.com/p", "UA", "ip", "z.example.com",
            T0 + dt.timedelta(seconds=10_000),
        )
    ]
    encode_results(spark.createDataFrame(rows, RESULT_MSG_SCHEMA)).write.mode(
        "append"
    ).text(qdir)
    stream = decode_results(read_results_stream(spark, qdir))
    out = run_to_sink(
        session_metrics(stream, gap="45 seconds", watermark="1 seconds"),
        str(tmp_path / "ck_sess"),
        "sess_sink",
        output_mode="append",
    )
    a = {
        (r.session_start, r.session_end, r.n_urls)
        for r in out
        if r.host == "a.example.com"
    }
    assert a == {
        (T0, T0 + dt.timedelta(seconds=65), 3),       # 0,10,20 merged
        (
            T0 + dt.timedelta(seconds=200),
            T0 + dt.timedelta(seconds=245),
            1,
        ),
    }
    # the flush session itself is NOT emitted (watermark never passed it)
    assert not any(r.host == "z.example.com" for r in out)


def test_session_window_batch_twin_agrees(spark):
    """The native session_window construction must agree exactly with the
    lag/running-sum construction the oracle-gated ``sessionize`` query
    uses, on identical input — two independent derivations of the same
    semantics."""
    import itertools

    from pyspark.sql import Window
    from web_scraper_v1_spark.streaming.results_stream import session_metrics

    # deterministic irregular spacing: host i%5, cumulative gaps cycle
    # through 7..97s so some consecutive per-host deltas exceed the gap
    rows = []
    t = {h: 0 for h in range(5)}
    for i, step in enumerate(itertools.islice(itertools.cycle(
        [7, 31, 55, 97, 13, 61, 5, 43, 89, 23]
    ), 200)):
        h = i % 5
        t[h] += step * 3
        rows.append(
            (
                f"http://h{h}.example.com/{i}", "UA", "ip", "fh",
                T0 + dt.timedelta(seconds=t[h]),
            )
        )
    df = spark.createDataFrame(rows, RESULT_MSG_SCHEMA)
    gap_s = 120
    native = {
        (r.host, r.session_start, r.session_end, r.n_urls)
        for r in session_metrics(df, gap=f"{gap_s} seconds").collect()
    }

    host = F.substring_index(
        F.substring_index("url", "://", -1), "/", 1
    ).alias("host")
    w = Window.partitionBy("host").orderBy("fetch_ts")
    gap = F.col("fetch_ts").cast("long") - F.lag(
        F.col("fetch_ts").cast("long")
    ).over(w)
    tagged = df.select(host, "fetch_ts").withColumn(
        "session_num",
        F.sum(
            F.when(gap.isNull() | (gap >= gap_s), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    twin = {
        (
            r.host,
            r.session_start,
            r.session_end + dt.timedelta(seconds=gap_s),
            r.n_urls,
        )
        for r in tagged.groupBy("host", "session_num")
        .agg(
            F.min("fetch_ts").alias("session_start"),
            F.max("fetch_ts").alias("session_end"),
            F.count("*").alias("n_urls"),
        )
        .collect()
    }
    assert len(native) > 20  # the spacing actually splits sessions
    assert native == twin


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    """dedup_stream drops a URL re-published in a LATER micro-batch (state
    carried across batches), keeping the first occurrence."""
    from web_scraper_v1_spark.streaming.results_stream import dedup_stream

    qdir = str(tmp_path / "dupqueue")
    rows = [
        (
            f"http://host{i % 2}.example.com/p/{i % 5}",  # 5 distinct urls/host-pair
            f"UA-{i}",
            f"10.0.0.{i}",
            f"host{i % 2}.example.com",
            T0 + dt.timedelta(seconds=i),
        )
        for i in range(20)  # each url appears twice per file batch
    ]
    df = spark.createDataFrame(rows, RESULT_MSG_SCHEMA)
    # two physical files -> maxFilesPerTrigger=1 forces >=2 micro-batches,
    # and every url in the second file already appeared in the first
    first = df.orderBy("fetch_ts").limit(10).coalesce(1)
    second = df.orderBy("fetch_ts", ascending=False).limit(10).coalesce(1)
    encode_results(first).write.mode("append").text(qdir)
    encode_results(second).write.mode("append").text(qdir)

    stream = (
        spark.readStream.schema("value STRING")
        .option("maxFilesPerTrigger", 1)
        .text(qdir)
    )
    deduped = dedup_stream(decode_results(stream))
    out = run_to_sink(
        deduped, str(tmp_path / "ckdd"), "dedup_sink", output_mode="append"
    )
    urls = [r["url"] for r in out]
    n_distinct = df.select("url").distinct().count()
    assert len(urls) == len(set(urls)) == n_distinct
    # first-occurrence wins: surviving fetch_ts is the min per url
    expect_first = {
        r["url"]: r["min_ts"]
        for r in df.groupBy("url").agg(F.min("fetch_ts").alias("min_ts")).collect()
    }
    got = {r["url"]: r["fetch_ts"] for r in out}
    assert got == expect_first


def test_streaming_dedup_equals_batch_twin_with_ttl_readmission(
    spark, tmp_path
):
    """The real streaming dedup (dropDuplicatesWithinWatermark, delay D)
    must equal the oracle-gated batch twin ``dedup_stream_batch``
    (greedy TTL re-admission, horizon D) on input whose gaps avoid the
    watermark-ambiguous band: duplicates either within D of the last
    kept occurrence (drop guaranteed both sides) or far enough past it
    that an intervening batch has provably advanced the watermark beyond
    the state's expiry (re-admission guaranteed both sides). One record
    per micro-batch in event-time order makes watermark advance
    deterministic."""
    from web_scraper_v1_spark.streaming.results_stream import (
        dedup_stream,
        dedup_stream_batch,
    )

    qdir = str(tmp_path / "ttlqueue")
    secs_urls = [
        (0, "a"),    # first occurrence -> kept
        (10, "b"),   # kept
        (20, "d"),   # kept
        (50, "a"),   # 50s after a@0 < D=100 -> dropped (guaranteed band)
        (70, "d"),   # 50s after d@20 < D -> dropped
        (250, "c"),  # kept; advances the watermark to 150 > a's state
                     # expiry (0 + 100)
        (260, "e"),  # kept; state CLEANUP runs at the END of a batch, so
                     # this extra batch (processed with wm=150) is what
                     # actually evicts a's expired state
        (400, "a"),  # re-admitted: state gone both by twin (400 >= 100
                     # after last kept 0) and by streaming (wm > 100)
    ]
    for s, u in secs_urls:
        row = [(
            f"http://{u}.example.com/p", "UA", "ip", f"{u}.example.com",
            T0 + dt.timedelta(seconds=s),
        )]
        encode_results(
            spark.createDataFrame(row, RESULT_MSG_SCHEMA)
        ).coalesce(1).write.mode("append").text(qdir)

    stream = (
        spark.readStream.schema("value STRING")
        .option("maxFilesPerTrigger", 1)
        .text(qdir)
    )
    out = run_to_sink(
        dedup_stream(decode_results(stream), watermark="100 seconds"),
        str(tmp_path / "ckttl"),
        "ttl_dedup_sink",
        output_mode="append",
    )
    streaming_kept = {(r.url, r.fetch_ts) for r in out}

    twin = dedup_stream_batch(
        decode_results(spark.read.text(qdir)), horizon_s=100
    ).collect()
    twin_kept = {(r.url, r.fetch_ts) for r in twin}

    expected = {
        (f"http://{u}.example.com/p", T0 + dt.timedelta(seconds=s))
        for s, u in [
            (0, "a"), (10, "b"), (20, "d"), (250, "c"), (260, "e"),
            (400, "a"),
        ]
    }
    assert twin_kept == expected
    assert streaming_kept == expected


def test_stream_to_snapshots_exactly_once(spark, tmp_path):
    """Micro-batches land as atomically-committed snapshot rounds:
    one round per batch, resumable without duplicates, time-travelable."""
    from web_scraper_v1_spark.sources.snapshots import SnapshotStore
    from web_scraper_v1_spark.streaming.results_stream import (
        stream_to_snapshots,
    )

    qdir = str(tmp_path / "queue")
    ck = str(tmp_path / "ck")
    store = SnapshotStore(str(tmp_path / "run"))
    rows = [
        (
            f"http://h{i % 2}.ex.com/p/{i}",
            f"UA-{i}",
            f"10.0.0.{i}",
            f"h{i % 2}.ex.com",
            T0 + dt.timedelta(seconds=i),
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, RESULT_MSG_SCHEMA)
    encode_results(df.filter(F.col("url").substr(-1, 1) < "5").coalesce(1)).write.mode(
        "append"
    ).text(qdir)
    encode_results(df.filter(F.col("url").substr(-1, 1) >= "5").coalesce(1)).write.mode(
        "append"
    ).text(qdir)

    def drain():
        stream = (
            spark.readStream.schema("value STRING")
            .option("maxFilesPerTrigger", 1)
            .text(qdir)
        )
        return stream_to_snapshots(decode_results(stream), store, ck)

    committed = drain()
    assert len(committed) >= 2  # one round per micro-batch
    read_back = store.read(spark, "results", RESULT_MSG_SCHEMA)
    assert read_back.count() == 20
    assert {r["url"] for r in read_back.collect()} == {r[0] for r in rows}

    # time travel: after the FIRST stream round only its batch is visible
    first = committed[0]
    as_of = store.read_as_of(
        spark, "results", RESULT_MSG_SCHEMA, first["round"]
    )
    assert as_of.count() == first["rows"] < 20

    # resume with the same checkpoint: already-committed batches are
    # replay-skipped, only the NEW file lands — exactly once end-to-end
    encode_results(
        df.limit(3).select(
            F.concat(F.col("url"), F.lit("/new")).alias("url"),
            "user_agent", "ip_address", "forwarded_host", "fetch_ts",
        )
    ).coalesce(1).write.mode("append").text(qdir)
    store2 = SnapshotStore(str(tmp_path / "run"))  # fresh manifest load
    stream = (
        spark.readStream.schema("value STRING")
        .option("maxFilesPerTrigger", 1)
        .text(qdir)
    )
    stream_to_snapshots(decode_results(stream), store2, ck)
    total = store2.read(spark, "results", RESULT_MSG_SCHEMA).count()
    assert total == 23  # 20 originals exactly once + 3 new
