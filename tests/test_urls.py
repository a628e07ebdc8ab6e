"""Spark canonicalize/host/path column exprs must byte-match the pure-Python
twins in fixtures.py (the engine's dedup keys depend on it)."""

from pyspark.sql import functions as F

from web_scraper_v1_spark import fixtures as fx
from web_scraper_v1_spark.functions import urls as U

ADVERSARIAL = [
    "HTTPS://Host0.Example.COM:443/page/1",
    "http://a.com:80/x?q=1",
    "http://a.com:8080/x",
    "https://a.com",
    "https://a.com/x#frag",
    "https://a.com/x?",
    "  https://a.com/x ",
    "not a url",
    "https://user@a.com/x",
    "https://user@Host3.com:444/p?a=b#c",
    "ftp://Files.example.com/pub",
    "https://host0.example.com/page/999?x=Y&z=%20",
    "http://a.com/?",
    "http://a.com/#",
    "https://a.com:443",
]


def test_spark_canonicalize_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in ADVERSARIAL], "url string")
    rows = df.select(
        "url",
        U.canonicalize(F.col("url")).alias("canon"),
        U.host(F.col("url")).alias("host"),
        U.path(F.col("url")).alias("path"),
    ).collect()
    for r in rows:
        assert r.canon == fx.canonicalize_url(r.url), r.url
        assert r.host == fx.host_of(r.url), r.url
        assert r.path == fx.path_of(r.url), r.url


def test_url_hash_is_stable_and_distinct(spark):
    df = spark.createDataFrame(
        [(fx.page_url(i, 10),) for i in range(1000)], "url string"
    )
    hashed = df.select(U.url_hash(U.canonicalize(F.col("url"))).alias("h"))
    n = hashed.distinct().count()
    assert n == 1000  # no collisions at this scale
    # deterministic across evaluations
    a = sorted(r.h for r in hashed.collect())
    b = sorted(r.h for r in hashed.collect())
    assert a == b
