"""WARC container layer: encode/parse exactness, parser robustness on the
inputs real Common Crawl segments throw at a reader (bodies containing
record delimiters, interleaved non-response records, truncated tails,
corrupt gzip members), the binaryFile ingestion path, and the plan shapes
(encode = ONE exchange on the segment key; parse = NO shuffle)."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from web_scraper_v1_spark.sources import warc as W

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_date", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _pages(spark, payloads: dict[str, bytes]):
    rows = [
        (u, "2026-01-05T12:00:00Z", p) for u, p in sorted(payloads.items())
    ]
    return spark.createDataFrame(rows, PAGE_SCHEMA)


def _roundtrip(spark, payloads: dict[str, bytes], **enc_kwargs):
    segs = W.encode_warc_segments(
        _pages(spark, payloads), n_segments=3, **enc_kwargs
    )
    recs = W.parse_warc_segments(
        segs, compressed=enc_kwargs.get("compress", True)
    )
    out = {
        r["url"]: (r["status"], r["mime"], bytes(r["payload"]))
        for r in recs.collect()
    }
    return out


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_exact(spark, compress):
    payloads = {
        f"http://h{i % 3}.example.com/p/{i}": f"<p>body {i}</p>".encode()
        for i in range(40)
    }
    out = _roundtrip(spark, payloads, compress=compress)
    assert set(out) == set(payloads)
    for u, p in payloads.items():
        assert out[u] == (200, "text/html", p)


def test_payload_with_delimiters_cannot_desync(spark):
    """Content-Length-driven walk: a body containing CRLFCRLF, a fake
    record header, and a fake HTTP status line must come back verbatim
    and must not split or corrupt its neighbors."""
    evil = (
        b"x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: 999999\r\n\r\nHTTP/1.1 500 Broken\r\n\r\ny"
    )
    payloads = {
        "http://a.example.com/1": b"before",
        "http://a.example.com/2": evil,
        "http://a.example.com/3": b"after",
    }
    out = _roundtrip(spark, payloads)
    assert len(out) == 3
    assert out["http://a.example.com/2"] == (200, "text/html", evil)
    assert out["http://a.example.com/3"] == (200, "text/html", b"after")


def test_non_response_records_skipped(spark):
    """Each segment carries warcinfo + request records; only responses
    surface (filtered by WARC-Type, not position)."""
    payloads = {f"http://b.example.com/{i}": b"x" * i for i in range(1, 6)}
    segs = W.encode_warc_segments(
        _pages(spark, payloads), n_segments=1, with_requests=True
    )
    recs = W.parse_warc_segments(segs).collect()
    assert len(recs) == 5
    assert all(r["status"] == 200 for r in recs)


def test_truncated_tail_dropped_not_crashed():
    rec1 = W.build_response_record(
        "http://c.example.com/1", "2026-01-05T12:00:00Z", b"ok"
    )
    rec2 = W.build_response_record(
        "http://c.example.com/2", "2026-01-05T12:00:00Z", b"lost"
    )
    truncated = rec1 + rec2[: len(rec2) - 10]
    got = list(W._iter_warc_records(truncated))
    assert len(got) == 1
    assert got[0]["fields"]["warc-target-uri"] == "http://c.example.com/1"


def test_corrupt_gzip_member_costs_only_the_tail():
    rec1 = W._gzip_member(
        W.build_response_record(
            "http://d.example.com/1", "2026-01-05T12:00:00Z", b"ok"
        )
    )
    blob = rec1 + b"\x1f\x8b\x08CORRUPT-MEMBER-BYTES"
    raws = list(W._split_gzip_members(blob))
    assert len(raws) == 1
    got = list(W._iter_warc_records(raws[0]))
    assert len(got) == 1


def test_negative_content_length_terminates():
    """Regression: a negative Content-Length must not walk pos backward
    (previously an infinite loop re-yielding the same record)."""
    evil = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: -33\r\n\r\nHTTP/1.1 200 OK\r\n\r\nx\r\n\r\n"
    )
    assert list(W._iter_warc_records(evil)) == []


def test_crlf_url_escaped_no_header_injection(spark):
    """Regression: a URL carrying raw CR/LF (attacker-influenced input)
    must not terminate the header block early and drop the rest of the
    segment — it comes back percent-escaped, neighbors intact."""
    evil_url = "http://h.example.com/a\r\n\r\nWARC-Injected: yes"
    payloads = {
        "http://h.example.com/1": b"one",
        evil_url: b"two",
        "http://h.example.com/3": b"three",
    }
    segs = W.encode_warc_segments(
        _pages(spark, payloads), n_segments=1, compress=False
    )
    recs = W.parse_warc_segments(segs, compressed=False).collect()
    got = {r["url"]: bytes(r["payload"]) for r in recs}
    assert len(got) == 3
    assert got["http://h.example.com/a%0D%0A%0D%0AWARC-Injected: yes"] == b"two"
    assert got["http://h.example.com/3"] == b"three"


def test_gzip_split_multichunk_member():
    """A member whose COMPRESSED size exceeds the 1 MiB feed chunk must
    reassemble exactly across chunk boundaries."""
    import hashlib

    # ~2.5 MiB of incompressible deterministic bytes
    raw = b"".join(
        hashlib.sha256(i.to_bytes(4, "big")).digest() for i in range(80000)
    )
    blob = W._gzip_member(raw) + W._gzip_member(b"tail")
    assert len(blob) > W._GZIP_CHUNK  # the test premise: >1 chunk
    got = list(W._split_gzip_members(blob))
    assert got == [raw, b"tail"]


def test_binaryfile_ingestion_path(spark, tmp_path):
    """The 100 TB read path: real *.warc.gz objects on disk, binaryFile
    scan, streaming parse."""
    payloads = {
        f"http://e.example.com/{i}": f"doc {i}".encode() for i in range(20)
    }
    segs = W.encode_warc_segments(
        _pages(spark, payloads), n_segments=4
    ).collect()
    for row in segs:
        with open(tmp_path / f"seg-{row['segment_id']}.warc.gz", "wb") as fh:
            fh.write(bytes(row["warc"]))
    recs = W.read_warc_files(spark, str(tmp_path) + "/*.warc.gz")
    got = {r["url"]: bytes(r["payload"]) for r in recs.collect()}
    assert got == payloads


def test_write_warc_dir_roundtrip(spark, tmp_path):
    """The archive half: encode -> executor-side file write ->
    binaryFile re-ingest recovers every page exactly."""
    payloads = {
        f"http://w.example.com/{i}": f"page {i}".encode() for i in range(30)
    }
    segs = W.encode_warc_segments(_pages(spark, payloads), n_segments=5)
    out = str(tmp_path / "archive")
    n_files = W.write_warc_dir(segs, out)
    assert n_files == segs.select("segment_id").distinct().count()
    recs = W.read_warc_files(spark, out + "/*.warc.gz")
    got = {r["url"]: bytes(r["payload"]) for r in recs.collect()}
    assert got == payloads


def test_gzip_members_are_independent(spark):
    """Common Crawl's layout contract: every record is its own gzip
    member, so a reader can resync mid-file — gunzip of any suffix
    starting at a member boundary succeeds."""
    payloads = {f"http://f.example.com/{i}": b"z" * 100 for i in range(6)}
    segs = W.encode_warc_segments(
        _pages(spark, payloads), n_segments=1, with_requests=False
    ).collect()
    blob = bytes(segs[0]["warc"])
    # locate member boundaries by streaming decompression
    offsets, pos = [], 0
    import zlib

    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        d.decompress(blob[pos:])
        offsets.append(pos)
        pos = len(blob) - len(d.unused_data)
    assert len(offsets) == 7  # warcinfo + 6 responses
    # resync from the 4th member: the suffix parses standalone
    tail_raws = list(W._split_gzip_members(blob[offsets[3] :]))
    recs = [r for raw in tail_raws for r in W._iter_warc_records(raw)]
    assert len(recs) == 4
    assert gzip.decompress(blob[offsets[3] : offsets[4]])  # plain gunzip ok


def test_surt_key(spark):
    df = spark.createDataFrame(
        [("http://host3.example.com/doc/7",), ("https://example.com",)],
        ["url"],
    ).select(W.surt_key(F.col("url")).alias("surt"))
    got = [r["surt"] for r in df.collect()]
    assert got == ["com,example,host3)/doc/7", "com,example)"]


def test_encode_single_exchange_parse_no_shuffle(spark):
    """Plan gates: encode shuffles exactly once (the segment key);
    parse adds NO exchange on top of it."""
    from tests.test_plans import plan_of

    pages = _pages(spark, {f"http://g.example.com/{i}": b"x" for i in range(8)})
    segs = W.encode_warc_segments(pages, n_segments=2)
    parsed = W.parse_warc_segments(segs)
    plan = plan_of(parsed)
    tree = plan.split("\n\n")[0]  # formatted output repeats nodes in detail
    assert tree.count("Exchange") == 1, plan
    assert "hashpartitioning(segment_id" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_write_warc_dir_reused_dir_counts_this_call(spark, tmp_path):
    """Archiving into a dir holding leftovers from a wider previous run
    must report THIS call's segment count, not the directory total."""
    payloads = {f"http://w.example.com/{i}": b"x" for i in range(20)}
    out = str(tmp_path / "arch")
    n1 = W.write_warc_dir(
        W.encode_warc_segments(_pages(spark, payloads), n_segments=8), out
    )
    n2 = W.write_warc_dir(
        W.encode_warc_segments(_pages(spark, payloads), n_segments=5), out
    )
    assert (n1, n2) == (8, 5)
