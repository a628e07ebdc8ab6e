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


def test_canonicalize_property_grid(spark):
    """Combinatorial property check over the URL component space:
    (1) Spark == pure-Python twin on every combination, (2) canonicalize
    is IDEMPOTENT (dedup keys must be stable under re-canonicalization —
    a frontier row written by one round and re-read by another passes
    through the function again), (3) canonical invariants hold: lowercase
    scheme/authority, no default port, no bare trailing '?', non-empty
    path for URL-shaped inputs."""
    import itertools

    schemes = ["http", "HTTPS", "ftp", ""]
    hosts = ["Host0.Example.COM", "a.com", "user@B.org"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/x/Y", "/page/1"]
    queries = ["", "?", "?q=1&Z=%20"]
    frags = ["", "#Frag"]
    urls = []
    for s, h, po, pa, q, f in itertools.product(
        schemes, hosts, ports, paths, queries, frags
    ):
        u = f"{s}://{h}{po}{pa}{q}{f}" if s else f"{h}{po}{pa}{q}{f}"
        urls.append(u)
        urls.append(f"  {u} ")  # whitespace wrapper
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        U.canonicalize(F.col("url")).alias("c1"),
        U.canonicalize(U.canonicalize(F.col("url"))).alias("c2"),
    ).collect()
    for r in rows:
        expect = fx.canonicalize_url(r.url)
        assert r.c1 == expect, (r.url, r.c1, expect)
        # idempotence, both engines
        assert r.c2 == r.c1, (r.url, r.c1, r.c2)
        assert fx.canonicalize_url(expect) == expect, r.url
        if "://" in r.c1:
            scheme, rest = r.c1.split("://", 1)
            assert scheme == scheme.lower()
            authority = rest.split("/", 1)[0]
            assert authority == authority.lower()
            assert not (scheme == "http" and authority.endswith(":80"))
            assert not (scheme == "https" and authority.endswith(":443"))
            assert not r.c1.endswith("?")
            assert "#" not in r.c1
            assert "/" in rest or not rest, r.c1  # path present


# ---------------------------------------------------------------------------
# REP (RFC 9309) robots matching: precedence edge cases + plan shape
# ---------------------------------------------------------------------------


def _rep_verdicts(spark, rules_rows, paths):
    from pyspark.sql import types as T

    from web_scraper_v1_spark.operators.frontier import apply_robots_rep

    rules_schema = T.StructType(
        [
            T.StructField("host", T.StringType(), False),
            T.StructField("rule_type", T.StringType(), False),
            T.StructField("pattern", T.StringType(), False),
            T.StructField("regex", T.StringType(), True),
        ]
    )
    rules = spark.createDataFrame(rules_rows, rules_schema)
    tasks = spark.createDataFrame(
        [("h", p) for p in paths],
        T.StructType(
            [
                T.StructField("host", T.StringType(), False),
                T.StructField("path", T.StringType(), False),
            ]
        ),
    )
    out = apply_robots_rep(tasks, rules)
    return {r["path"]: r["allowed"] for r in out.collect()}


def test_rep_longest_match_and_carveout(spark):
    rules = [
        ("h", "disallow", "/a", None),
        ("h", "allow", "/a/public", None),
    ]
    got = _rep_verdicts(spark, rules, ["/a/x", "/a/public/y", "/b"])
    assert got == {"/a/x": False, "/a/public/y": True, "/b": True}


def test_rep_allow_wins_length_tie(spark):
    rules = [
        ("h", "disallow", "/page", None),
        ("h", "allow", "/page", None),
    ]
    got = _rep_verdicts(spark, rules, ["/page/1"])
    assert got == {"/page/1": True}


def test_rep_wildcard_and_anchor(spark):
    rules = [
        ("h", "disallow", "/*.pdf$", r"^/.*\.pdf$"),
    ]
    got = _rep_verdicts(spark, rules, ["/x/a.pdf", "/x/a.pdfz", "/x/a.txt"])
    assert got == {"/x/a.pdf": False, "/x/a.pdfz": True, "/x/a.txt": True}


def test_rep_wildcard_outranks_shorter_allow(spark):
    # '/doc/*7$' (len 8, disallow) must beat '/doc/12' (len 7, allow)
    rules = [
        ("h", "disallow", "/doc/1", None),
        ("h", "allow", "/doc/12", None),
        ("h", "disallow", "/doc/*7$", "^/doc/.*7$"),
    ]
    got = _rep_verdicts(spark, rules, ["/doc/123", "/doc/127", "/doc/17"])
    assert got == {"/doc/123": True, "/doc/127": False, "/doc/17": False}


def test_rep_unknown_host_default_allow(spark):
    from pyspark.sql import types as T

    from web_scraper_v1_spark.operators.frontier import apply_robots_rep

    rules = spark.createDataFrame(
        [("other", "disallow", "/", None)],
        T.StructType(
            [
                T.StructField("host", T.StringType(), False),
                T.StructField("rule_type", T.StringType(), False),
                T.StructField("pattern", T.StringType(), False),
                T.StructField("regex", T.StringType(), True),
            ]
        ),
    )
    tasks = spark.createDataFrame(
        [("h", "/x")],
        T.StructType(
            [
                T.StructField("host", T.StringType(), False),
                T.StructField("path", T.StringType(), False),
            ]
        ),
    )
    out = apply_robots_rep(tasks, rules).collect()
    assert out[0]["allowed"] is True


def test_rep_plan_broadcast_no_frontier_shuffle(spark):
    """The rules side broadcasts; the frontier side takes NO exchange for
    the verdict (the fold is per-row, not a join-explode + regroup)."""
    from tests.test_plans import SF, plan_of

    from web_scraper_v1_spark import queries as Q

    plan = plan_of(Q.queries()["robots_rep_match"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    tree = plan.split("\n\n")[0]
    # exchanges allowed only under the broadcast (rules) subtree: the
    # distinct-hosts build; the probe side above the join must be
    # exchange-free
    probe_side = tree.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in probe_side, plan


PSL_CASES = [
    # (host, public_suffix, registered_domain)
    ("example.com", "com", "example.com"),
    ("www.shop.co.uk", "co.uk", "shop.co.uk"),
    ("a.b.github.io", "github.io", "b.github.io"),
    # wildcard rule '*.ck': any single label under ck is itself a suffix
    ("foo.ck", "foo.ck", None),
    ("bar.foo.ck", "foo.ck", "bar.foo.ck"),
    # exception rule '!www.ck' shrinks the wildcard match by one label
    ("www.ck", "ck", "www.ck"),
    ("deep.school.k12.tx.us", "k12.tx.us", "school.k12.tx.us"),
    # no rule matches -> default public suffix is the last label
    ("unknownhost.zz", "zz", "unknownhost.zz"),
    # host IS a public suffix -> no registered domain
    ("com", "com", None),
    ("co.uk", "co.uk", None),
]


def test_psl_extract_rule_kinds(spark):
    """publicsuffix.org semantics: plain rules, '*.' wildcard, '!'
    exception, longest-match precedence, default single-label suffix,
    NULL registered_domain when the host IS a suffix."""
    df = spark.createDataFrame(
        [(h,) for h, _, _ in PSL_CASES], "host string"
    )
    got = {
        r["host"]: (r["public_suffix"], r["registered_domain"])
        for r in U.psl_extract(df).collect()
    }
    assert len(got) == len(PSL_CASES)
    for host, ps, rd in PSL_CASES:
        assert got[host] == (ps, rd), (host, got[host], (ps, rd))


def test_psl_extract_broadcasts_rules_single_agg(spark):
    """Plan shape: the rule table is the ONLY broadcast, and the single
    exchange is the hash-partitioned partial aggregation on the row key
    (no rejoin of the input, no SinglePartition)."""
    from tests.test_plans import plan_of

    df = spark.createDataFrame(
        [(h,) for h, _, _ in PSL_CASES], "host string"
    )
    plan = plan_of(U.psl_extract(df))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "SinglePartition" not in plan
    tree = plan.split("\n\n")[0]
    n_exch = sum(
        1
        for ln in tree.splitlines()
        if "Exchange (" in ln and "BroadcastExchange" not in ln
    )
    assert n_exch == 1, plan
