"""WARC segment source/sink: the Common-Crawl container format.

No reference counterpart (mguley/web-scraper-v1 fetches live HTML and
stores flat JSON records, internal/useragent + internal/scraper); this is
the ingestion leg a Common-Crawl-style pipeline needs — the north rule's
input is "Iceberg table of Common-Crawl-style web pages", and the way
those pages exist upstream is WARC.

Layout follows ISO 28500 / the Common Crawl convention exactly where it
matters for scale:

* A **segment** is one blob of concatenated WARC records — the unit a real
  deployment writes as one ~1 GiB ``*.warc.gz`` object. Per-record
  compression is **independent gzip members** (Common Crawl's actual
  layout): a reader can resynchronize at any member boundary, so a segment
  never has to be decompressed as one stream and a corrupt record costs
  one record, not the file.
* ``encode_warc_segments`` shuffles ONCE on the segment key
  (``applyInPandas`` group = one output blob); records within a segment
  are ordered by url so the blob bytes are deterministic.
* ``parse_warc_segments`` is a streaming ``mapInPandas`` kernel: it walks
  each blob record-by-record driven by ``Content-Length`` (never by
  delimiter scanning, so payloads containing ``\\r\\n\\r\\n`` or even the
  bytes ``WARC/1.0`` cannot confuse it), keeps at most one record in
  memory beyond the blob, skips non-``response`` records (warcinfo,
  request, metadata), and drops a truncated trailing record instead of
  crashing. No shuffle: parallelism = number of segment rows, which at
  100 TB is the number of WARC files (~100k) — exactly the task
  granularity Spark's ``binaryFile`` reader produces via
  ``read_warc_files``.

At 100 TB the plan shape is: binaryFile scan (one task per segment object,
no shuffle) -> mapInPandas parse (CPU-bound, Arrow-batched) -> whatever
relational pipeline follows. The only shuffle the container layer ever
introduces is the encode-side groupBy(segment_id), and that is the
write path, not the read path.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = b"\r\n"

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("warc", T.BinaryType(), False),
    ]
)

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _record_id(url: str) -> str:
    """Deterministic WARC-Record-ID (uuid-shaped, md5-derived)."""
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def _header_value(v: str) -> str:
    """CR/LF percent-escaped: a crawl URL is attacker-influenced, and a
    raw CR/LF in a header value would terminate the header block early
    (WARC header injection), desyncing the record framing on parse.
    Only CR/LF are escaped — they are illegal in URIs, so legitimate
    percent-encoded URLs pass through byte-identically."""
    return v.replace("\r", "%0D").replace("\n", "%0A")


def _warc_record(
    warc_type: str,
    headers: list[tuple[str, str]],
    block: bytes,
) -> bytes:
    head = [b"WARC/1.0"]
    head.append(b"WARC-Type: " + warc_type.encode("ascii"))
    for k, v in headers:
        head.append(k.encode("ascii") + b": " + _header_value(v).encode("utf-8"))
    head.append(b"Content-Length: " + str(len(block)).encode("ascii"))
    return CRLF.join(head) + CRLF + CRLF + block + CRLF + CRLF


def _gzip_member(raw: bytes) -> bytes:
    # mtime=0 so the member bytes are deterministic.
    return gzip.compress(raw, compresslevel=6, mtime=0)


def build_response_record(
    url: str, warc_date: str, payload: bytes, mime: str = "text/html"
) -> bytes:
    """One WARC response record wrapping an HTTP/1.1 200 response."""
    http = (
        b"HTTP/1.1 200 OK" + CRLF
        + b"Content-Type: " + mime.encode("ascii")
        + b"; charset=utf-8" + CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii")
        + CRLF + CRLF + payload
    )
    return _warc_record(
        "response",
        [
            ("WARC-Target-URI", url),
            ("WARC-Date", warc_date),
            ("WARC-Record-ID", _record_id(url)),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http,
    )


def build_request_record(url: str, warc_date: str) -> bytes:
    """The request twin Common Crawl interleaves with responses — exists
    so the parser provably filters on WARC-Type instead of position."""
    host = url.split("/", 3)[2] if "://" in url else ""
    path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
    http = (
        b"GET " + path.encode("utf-8") + b" HTTP/1.1" + CRLF
        + b"Host: " + host.encode("utf-8") + CRLF + CRLF
    )
    return _warc_record(
        "request",
        [
            ("WARC-Target-URI", url),
            ("WARC-Date", warc_date),
            ("WARC-Record-ID", _record_id(url + "#request")),
            ("Content-Type", "application/http; msgtype=request"),
        ],
        http,
    )


def build_warcinfo_record(segment_id: int) -> bytes:
    info = (
        b"software: web_scraper_v1_spark" + CRLF
        + b"format: WARC File Format 1.0" + CRLF
        + b"segment: " + str(segment_id).encode("ascii") + CRLF
    )
    return _warc_record(
        "warcinfo",
        [
            ("WARC-Date", "2026-01-01T00:00:00Z"),
            ("WARC-Record-ID", _record_id(f"warcinfo:{segment_id}")),
            ("Content-Type", "application/warc-fields"),
        ],
        info,
    )


def encode_warc_segments(
    pages: DataFrame,
    n_segments: int,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    compress: bool = True,
    with_requests: bool = True,
) -> DataFrame:
    """(url, warc_date, payload) -> (segment_id, warc) blobs.

    One shuffle (the groupBy on segment_id); each segment blob starts with
    a warcinfo record and carries request+response pairs in url order, each
    record its own gzip member when ``compress`` (the Common Crawl layout).
    """
    keyed = pages.select(
        F.abs(F.xxhash64(F.col(url_col)) % n_segments).alias("segment_id"),
        F.col(url_col).alias("url"),
        F.col(date_col).alias("warc_date"),
        F.col(payload_col).alias("payload"),
    )

    def _build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(key[0])
        pdf = pdf.sort_values("url")
        parts = [build_warcinfo_record(seg)]
        for url, date, payload in zip(
            pdf["url"], pdf["warc_date"], pdf["payload"]
        ):
            if with_requests:
                parts.append(build_request_record(url, date))
            parts.append(
                build_response_record(url, date, bytes(payload))
            )
        if compress:
            blob = b"".join(_gzip_member(p) for p in parts)
        else:
            blob = b"".join(parts)
        return pd.DataFrame({"segment_id": [seg], "warc": [blob]})

    return keyed.groupBy("segment_id").applyInPandas(_build, SEGMENT_SCHEMA)


_GZIP_CHUNK = 1 << 20


def _split_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of independent gzip members one at a
    time, feeding fixed-size chunks through a memoryview — per-member
    cost is proportional to the MEMBER, not the remaining segment, so a
    1 GiB segment of ~100k members costs ~1 GiB of byte traffic, not
    O(members x segment)."""
    mv = memoryview(blob)
    pos = 0
    n = len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out: list[bytes] = []
        p = pos
        try:
            while p < n and not d.eof:
                chunk = mv[p : p + _GZIP_CHUNK]
                out.append(d.decompress(chunk))
                p += len(chunk)
        except zlib.error:
            return  # corrupt tail: costs the remaining members only
        if not d.eof:
            return  # truncated final member
        yield b"".join(out)
        # unused_data = bytes of the final chunk past this member's end
        pos = p - len(d.unused_data)


def _iter_warc_records(raw: bytes) -> Iterator[dict]:
    """Walk concatenated (already-decompressed) WARC records.

    Content-Length-driven: the payload is sliced by byte count, so bodies
    containing CRLFCRLF or 'WARC/1.0' cannot desynchronize the walk. A
    truncated trailing record is dropped, not raised.
    """
    pos = 0
    n = len(raw)
    while pos < n:
        # Skip inter-record padding.
        while pos < n and raw[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        head_end = raw.find(CRLF + CRLF, pos)
        if head_end < 0:
            return
        head = raw[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return  # desynchronized: stop rather than guess
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(":")
            if sep:
                fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            return
        if clen < 0:
            return  # negative length would walk pos backward: bail
        block_start = head_end + 4
        if block_start + clen > n:
            return  # truncated trailing record
        yield {
            "fields": fields,
            "block": raw[block_start : block_start + clen],
        }
        pos = block_start + clen


def _parse_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    head_end = block.find(CRLF + CRLF)
    if head_end < 0:
        return None, None, b""
    head = block[:head_end].decode("utf-8", "replace")
    lines = head.split("\r\n")
    status: int | None = None
    mime: str | None = None
    parts = lines[0].split(" ", 2)
    if len(parts) >= 2 and parts[0].startswith("HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    for ln in lines[1:]:
        k, sep, v = ln.partition(":")
        if sep and k.strip().lower() == "content-type":
            mime = v.strip().split(";", 1)[0].strip()
    return status, mime, block[head_end + 4 :]


def parse_warc_segments(
    segments: DataFrame,
    blob_col: str = "warc",
    compressed: bool = True,
) -> DataFrame:
    """(.., warc binary) -> one row per response record.

    Streaming mapInPandas; no shuffle — each input row (segment) parses
    independently, so a binaryFile scan of 100k segment objects fans out
    to 100k tasks with nothing exchanged.
    """

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("url", "warc_date", "status", "mime", "payload")}
            for blob in pdf[blob_col]:
                blob = bytes(blob)
                if compressed:
                    raws = _split_gzip_members(blob)
                else:
                    raws = iter((blob,))
                for raw in raws:
                    for rec in _iter_warc_records(raw):
                        f = rec["fields"]
                        if f.get("warc-type") != "response":
                            continue
                        status, mime, payload = _parse_http_response(
                            rec["block"]
                        )
                        rows["url"].append(f.get("warc-target-uri"))
                        rows["warc_date"].append(f.get("warc-date"))
                        rows["status"].append(status)
                        rows["mime"].append(mime)
                        rows["payload"].append(payload)
            yield pd.DataFrame(
                {
                    "url": pd.Series(rows["url"], dtype="object"),
                    "warc_date": pd.Series(rows["warc_date"], dtype="object"),
                    "status": pd.Series(rows["status"], dtype="Int32"),
                    "mime": pd.Series(rows["mime"], dtype="object"),
                    "payload": pd.Series(rows["payload"], dtype="object"),
                }
            )

    return segments.mapInPandas(_parse, RECORD_SCHEMA)


def read_warc_files(spark, path_glob: str, compressed: bool = True) -> DataFrame:
    """Ingest real ``*.warc`` / ``*.warc.gz`` objects: binaryFile scan
    (one task per file, predicate/pathGlob pruned by the source) ->
    streaming parse. This is the 100 TB read path."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", path_glob.rsplit("/", 1)[-1])
        .load(path_glob.rsplit("/", 1)[0])
        .select(F.col("content").alias("warc"))
    )
    return parse_warc_segments(files, compressed=compressed)


def write_warc_dir(segments: DataFrame, out_dir: str) -> int:
    """Archive segment blobs as real ``seg-<id>.warc.gz`` objects,
    written EXECUTOR-SIDE (foreachPartition): no segment bytes ever
    transit the driver, so archiving scales with the cluster exactly
    like the encode that produced the blobs. Deterministic names keyed
    by segment_id; returns the number of segment files THIS call wrote
    (one per distinct segment_id — counted from the input, not from a
    directory listing, so archiving into a reused out_dir cannot
    overcount leftovers). On a cluster ``out_dir`` is shared storage
    (the sandbox twin is a local path); writes go through a temp-name +
    atomic rename so a killed task cannot leave a torn segment
    visible."""
    import os

    def _write(rows) -> None:
        import os
        import uuid

        os.makedirs(out_dir, exist_ok=True)
        for row in rows:
            seg, blob = row["segment_id"], bytes(row["warc"])
            final = os.path.join(out_dir, f"seg-{seg}.warc.gz")
            tmp = final + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, final)

    os.makedirs(out_dir, exist_ok=True)
    blobs = segments.select("segment_id", "warc").persist()
    try:
        blobs.foreachPartition(_write)
        return blobs.select("segment_id").distinct().count()
    finally:
        blobs.unpersist()


def surt_key(url_col):
    """SURT-style capture-index key (Common Crawl CDX convention):
    host labels reversed and comma-joined, then ')' + path. Pure JVM
    column expressions — no Python in the key path."""
    no_scheme = F.regexp_replace(url_col, r"^[a-zA-Z]+://", "")
    host = F.regexp_extract(no_scheme, r"^([^/]*)", 1)
    path = F.regexp_replace(no_scheme, r"^[^/]*", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, F.lit(")"), path)
