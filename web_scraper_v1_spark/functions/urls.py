"""URL column expressions: canonicalization, host/path extraction, 64-bit
URL hashing.

The reference uses URLs verbatim (no canonicalization anywhere; tasks carry
the raw string, /root/reference/internal/taskqueue/queue.go:9-12). The
engine defines a canonical form so dedup/seen-set membership is stable; the
pure-Python twin in ``fixtures.canonicalize_url`` must match byte-for-byte
(pytest-gated).

Everything here is built-in Column expressions — JVM-side, whole-stage
codegen, zero Python — so canonicalize+hash of 10^10 URLs is a single
codegen'd projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Same regex as fixtures._URL_RX; kept to constructs with identical
# semantics in Java and Python regex engines.
_RX = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def canonicalize(url: Column) -> Column:
    """Lowercase scheme+authority, strip default port, empty path -> '/',
    drop fragment and bare trailing '?'. Non-URL strings pass through
    trimmed (matching fixtures.canonicalize_url)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _RX, 1))
    auth = F.lower(F.regexp_extract(u, _RX, 2))
    path = F.regexp_extract(u, _RX, 3)
    query = F.regexp_extract(u, _RX, 4)

    auth = (
        F.when(
            (scheme == "http") & auth.endswith(":80"),
            F.substring(auth, 1, F.length(auth) - 3),
        )
        .when(
            (scheme == "https") & auth.endswith(":443"),
            F.substring(auth, 1, F.length(auth) - 4),
        )
        .otherwise(auth)
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(query == "?", F.lit("")).otherwise(query)
    canon = F.concat(scheme, F.lit("://"), auth, path, query)
    return F.when(scheme == "", u).otherwise(canon)


def host(url: Column) -> Column:
    """Host of a canonical URL: authority minus userinfo minus port."""
    auth = F.lower(F.regexp_extract(F.trim(url), _RX, 2))
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.element_at(F.split(no_user, ":"), 1)


def path(url: Column) -> Column:
    p = F.regexp_extract(F.trim(url), _RX, 3)
    m = F.regexp_extract(F.trim(url), _RX, 1)
    return F.when(m == "", F.lit("")).when(p == "", F.lit("/")).otherwise(p)


# Public-Suffix-List-style rule set (publicsuffix.org algorithm, public
# spec): plain rules match their own labels, '*.' rules match any single
# label in the starred position, '!' exception rules override and shrink
# the match by one label. The list here is a deterministic fixture subset
# exercising all three rule kinds; production swaps in the full PSL dump
# (~9k rules — still broadcast-trivial).
PSL_RULES = [
    "com",
    "org",
    "net",
    "uk",
    "co.uk",
    "jp",
    "ac.jp",
    "io",
    "github.io",
    "us",
    "tx.us",
    "k12.tx.us",
    "*.ck",
    "!www.ck",
]


def psl_extract(df, host_col: str = "host", key_cols=("host",),
                rules=None):
    """Public suffix + registered domain (eTLD+1) per row of ``df``,
    keyed by ``key_cols`` — the grouping a polite crawler actually needs
    (per-REGISTERED-DOMAIN budgets; 'a.github.io' and 'b.github.io' are
    different sites, 'www.shop.co.uk' and 'shop.co.uk' are the same).
    The reference schedules per raw hostname only
    (/root/reference/internal/scraper/service.go worker loop).

    Plan (scale story first): hosts have <= ~5 labels, so each row emits
    at most 2*min(n_labels, max_rule_labels) candidate suffix strings
    (exact last-k + wildcard '*.'+last-(k-1)); candidates equi-join the
    broadcast rule table (exact keys and '*.' keys are disjoint string
    spaces, so ONE hash join covers all three rule kinds), and one
    map-side-combinable groupBy per key applies PSL precedence
    (exception beats all, else longest rule, else default 1 label). No
    rejoin to the input: the host string rides through the aggregate and
    is re-split for the final slice. One shuffle total, rule table
    broadcast, everything whole-stage-codegen Column ops."""
    rules = PSL_RULES if rules is None else rules
    rows = []
    for rule in rules:
        if rule.startswith("!"):
            key, kind = rule[1:], "e"
        elif rule.startswith("*."):
            key, kind = rule, "w"
        else:
            key, kind = rule, "n"
        rows.append((key, kind, len(key.split("."))))
    rule_df = df.sparkSession.createDataFrame(
        rows, "key string, kind string, rl int"
    )
    kmax = max(r[2] for r in rows)

    key_cols = list(key_cols)
    lab = (
        df.select(*key_cols, F.col(host_col).alias("_h"))
        .withColumn("_l", F.split("_h", r"\."))
        .withColumn("_n", F.size("_l"))
    )
    k = F.col("_k")
    n = F.col("_n")
    exact = F.array_join(F.slice("_l", n - k + F.lit(1), k), ".")
    wild = F.when(
        k >= 2,
        F.concat(
            F.lit("*."),
            F.array_join(F.slice("_l", n - k + F.lit(2), k - F.lit(1)), "."),
        ),
    )
    cand = (
        lab.withColumn(
            "_k",
            F.explode(F.sequence(F.lit(1), F.least(n, F.lit(kmax)))),
        )
        .withColumn("_c", F.explode(F.array(exact, wild)))
        .where(F.col("_c").isNotNull())
    )
    matched = cand.join(
        F.broadcast(rule_df), cand["_c"] == rule_df["key"], "left"
    )
    agg = matched.groupBy(*key_cols).agg(
        F.max("_h").alias("_h"),
        F.max("_n").alias("_n"),
        F.max(F.when(F.col("kind") == "e", F.col("rl") - 1)).alias("_exc"),
        F.max(F.when(F.col("kind") != "e", F.col("rl"))).alias("_norm"),
    )
    psl = F.coalesce("_exc", "_norm", F.lit(1))
    relab = agg.withColumn("_l", F.split("_h", r"\.")).withColumn(
        "_ps", psl.cast("int")
    )
    n = F.col("_n")
    ps = F.col("_ps")
    return relab.select(
        *key_cols,
        F.col("_h").alias(host_col),
        F.array_join(F.slice("_l", n - ps + F.lit(1), ps), ".").alias(
            "public_suffix"
        ),
        F.when(
            n > ps,
            F.array_join(F.slice("_l", n - ps, ps + F.lit(1)), "."),
        ).alias("registered_domain"),
    )


def url_hash(canonical_url: Column) -> Column:
    """64-bit frontier key: xxhash64 of the canonical URL (north rule:
    'canonicalized URL -> xxhash64'). Collision note: at 10^10 URLs the
    birthday bound gives ~2.7e-3 expected colliding pairs per 10^10 over a
    64-bit space aggregate — the exact seen-set join keys on (url_hash, url)
    where byte-exactness matters."""
    return F.xxhash64(canonical_url)
