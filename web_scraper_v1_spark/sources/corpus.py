"""Synthetic corpus materialization + Spark readers.

The corpus tables follow ``BASELINE.json`` ``input_hint`` (pages table of
Common-Crawl-style rows) and FIXTURES.md §1-3. Generation is pure-Python
deterministic (web_scraper_v1_spark.fixtures) and written with pyarrow so
the fixture bytes never depend on Spark itself; Spark only *reads* them —
mirroring how the real system would read Iceberg tables it didn't create.

Explicit StructType schemas everywhere (never inference) — the reference's
compile-time Go structs (internal/model/*.go) map to fixed schemas so Arrow
UDF outputs stay stable and byte-comparable (SURVEY.md §1.3).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from web_scraper_v1_spark import fixtures

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("task_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), True),
        T.StructField("depth", T.IntegerType(), True),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_s", T.DoubleType(), True),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), True),
        T.StructField("fetched_ts", T.TimestampType(), True),
    ]
)

_PAGES_ARROW = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

_SEEDS_ARROW = pa.schema(
    [
        pa.field("task_id", pa.string(), nullable=False),
        pa.field("url", pa.string(), nullable=False),
        pa.field("priority", pa.int32()),
        pa.field("depth", pa.int32()),
    ]
)

_ROBOTS_ARROW = pa.schema(
    [
        pa.field("host", pa.string(), nullable=False),
        pa.field("crawl_delay_s", pa.float64()),
        pa.field("disallow_prefixes", pa.list_(pa.string())),
        pa.field("fetched_ts", pa.timestamp("us", tz="UTC")),
    ]
)


def _write(rows: list[dict], schema: pa.Schema, path: str) -> None:
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    table = pa.Table.from_pydict(cols, schema=schema)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # small row groups keep single-file fixtures splittable: a one-row-group
    # file caps the Spark scan at one task regardless of
    # files.maxPartitionBytes (measured: it serializes the bench's scan)
    pq.write_table(table, path, row_group_size=16384)


def materialize_corpus(
    out_dir: str,
    n_pages: int = 1000,
    n_seeds: int = 60,
    n_hosts: int = 10,
    filler_lines: int = 0,
) -> dict[str, str]:
    """Write pages/seeds/robots parquet under ``out_dir``; returns paths.
    Idempotent for a given (n_pages, n_seeds, n_hosts)."""
    paths = {
        "pages": os.path.join(out_dir, "pages.parquet"),
        "seeds": os.path.join(out_dir, "seeds.parquet"),
        "robots": os.path.join(out_dir, "robots.parquet"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    _write(
        fixtures.generate_pages(n_pages, n_hosts, filler_lines),
        _PAGES_ARROW,
        paths["pages"],
    )
    _write(
        fixtures.generate_seeds(n_seeds, n_pages, n_hosts),
        _SEEDS_ARROW,
        paths["seeds"],
    )
    _write(fixtures.generate_robots(n_hosts), _ROBOTS_ARROW, paths["robots"])
    return paths


def read_pages(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.read.schema(PAGES_SCHEMA).parquet(
        os.path.join(corpus_dir, "pages.parquet")
    )


def read_seeds(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.read.schema(SEEDS_SCHEMA).parquet(
        os.path.join(corpus_dir, "seeds.parquet")
    )


def read_robots(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.read.schema(ROBOTS_SCHEMA).parquet(
        os.path.join(corpus_dir, "robots.parquet")
    )
