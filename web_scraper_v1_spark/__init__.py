"""web_scraper_v1_spark — a from-scratch PySpark-native crawl frontier +
fetch scheduler with the data-processing capabilities of the Go reference
``mguley/web-scraper-v1`` (see SURVEY.md), re-expressed as DataFrame /
vectorized-Arrow-UDF computations over snapshot (Iceberg-style) tables.

Not a port: the reference's goroutine worker pools, mutex'd FIFO queues and
RabbitMQ/Mongo plumbing are replaced by Spark's own scheduler, window-ranked
deterministic priority queues, anti-join seen-sets with Bloom prefilters,
and append-only parquet snapshot tables with a committed manifest.
"""

__version__ = "0.1.0"
