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


def url_hash(canonical_url: Column) -> Column:
    """64-bit frontier key: xxhash64 of the canonical URL (north rule:
    'canonicalized URL -> xxhash64'). Collision note: at 10^10 URLs the
    birthday bound gives ~2.7e-3 expected colliding pairs per 10^10 over a
    64-bit space aggregate — the exact seen-set join keys on (url_hash, url)
    where byte-exactness matters."""
    return F.xxhash64(canonical_url)
