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
