"""Approximate-nearest-neighbor search over an embedding column.

No reference counterpart (the reference carries only flat strings,
/root/reference/internal/model/job.go:8-14) — this is the training-data
pipeline layer a 100 TB web-text engine needs alongside dedup.

Three paths:
* brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the full corpus, JVM-side dot products via
  zip_with/aggregate, per-query window top-k. Linear in corpus size,
  perfectly partition-parallel, zero Python.
* sign-LSH bucketed top-k — the scale path: H hash-derived pseudo-random
  hyperplanes give every vector an H-bit signature; candidates are vectors
  sharing >= (H - max_flips) signature bits with the query (banded match on
  signature prefixes), scored exactly within buckets. Recall is tunable via
  H/max_flips; at 10^10 vectors the bucket join replaces the full scan.
* IVF (inverted-file) bucketed top-k — the other canonical scale path:
  a tiny coarse quantizer (C centroid vectors) partitions the corpus into
  C inverted lists; a query exactly scores only the lists of its n_probe
  nearest centroids. Quantizer "training" here is a deterministic sample
  (smallest md5(id)) so the whole algorithm is SQL-oracle-checkable; the
  k-means seam for real deployments is documented on ``ivf_centroids``.

Determinism: hyperplane components derive from md5 of (plane, dim) — no RNG
state, so every run and every engine sees the same planes (Workflow-style
restriction: nothing here depends on wall clock or random seeds).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


# returnType as a DataType OBJECT: a DDL string would be parsed at import
# time, which requires an active SparkContext this module must not assume
@F.pandas_udf(T.DoubleType())
def _cosine_fold_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine that replays the JVM ``aggregate`` fold's
    EXACT IEEE operation order (sequential adds over dimensions, then
    dot / (sqrt(na) * sqrt(nb))) — bit-identical to the interpreted
    higher-order-function expression it replaces, so downstream
    ``F.round(.., 4)`` and the DuckDB oracle agree unchanged, at Arrow
    kernel speed (~20x on large candidate sets: one numpy op per
    dimension per batch instead of an interpreted lambda per row)."""
    if len(va) == 0:
        return pd.Series(np.zeros(0))
    A = np.stack(va.to_numpy())
    B = np.stack(vb.to_numpy())
    dot = np.zeros(len(A))
    na = np.zeros(len(A))
    nb = np.zeros(len(A))
    for d in range(A.shape[1]):
        dot = dot + A[:, d] * B[:, d]
        na = na + A[:, d] * A[:, d]
        nb = nb + B[:, d] * B[:, d]
    return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embs: DataFrame,
    query_ids: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (default: the
    query set IS ``query_ids`` joined back to ``embs``). The query side is
    broadcast (small); the corpus never shuffles — the only exchange is the
    per-query top-k aggregation, and ranking ties break on rounded score
    then neighbor id so results are engine-portable."""
    v = _as_double(vec_col)
    base = embs.select(
        F.col(id_col).alias("id"), v.alias("v"), _norm(v).alias("norm")
    )
    queries = base
    if query_ids is not None:
        queries = base.join(
            F.broadcast(query_ids.select(F.col(id_col).alias("id"))), "id"
        )
    q = queries.select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        base.join(F.broadcast(q))
        .filter(F.col("id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qv"), F.col("v"))
                / (F.col("qnorm") * F.col("norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            F.round("cosine", 4).alias("cosine"),
        )
    )


def hyperplanes(dim: int, n_planes: int = 16) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) maps
    md5(p:d) to [-1, 1). Pure function of (dim, n_planes)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).digest()
            u = int.from_bytes(h[:8], "big") / 2**64  # [0,1)
            row.append(2.0 * u - 1.0)
        planes.append(row)
    return planes


def lsh_signatures(
    embs: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """n_planes-bit sign signature per vector, computed JVM-side against a
    literal plane matrix (the planes are tiny constants baked into the
    plan — nothing is shuffled or broadcast)."""
    v = _as_double(vec_col)
    planes = hyperplanes(dim, n_planes)
    bits = []
    for p, row in enumerate(planes):
        plane = F.array(*[F.lit(c) for c in row])
        bits.append(
            F.when(_dot(v, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return embs.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        _norm(v).alias("norm"),
        sig.cast("long").alias("sig"),
    )


def lsh_neardup_pairs(
    embs: DataFrame,
    dim: int,
    threshold: float = 0.45,
    n_planes: int = 32,
    bands: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via sign-LSH banding + exact within-bucket
    verification — the de-quadratic replacement for the all-pairs
    ``operators/dedup.embedding_neardup_pairs`` baseline (which survives as
    the test-only oracle twin). Plan shape: band-bucket equi-join, NEVER a
    cross join; the exact cosine runs only on bucket-colliding candidates.

    Screen recall: a pair at cosine t collides per band with probability
    p(t)^r where p(t) = 1 - acos(t)/pi and r = n_planes/bands; miss
    probability = (1 - p^r)^bands. The defaults (r=2, b=16) give per-pair
    miss ~1.6e-4 at the adversarially LOW t=0.45 the registered query uses
    (planes are deterministic, so recall is verified empirically against
    the exact baseline in pytest). At real near-dup thresholds (t >= 0.9)
    raise r (e.g. r=8) for a hard bucket prune; at t=0.45 the angular
    radius is 63 degrees and NO sign-LSH parameterization prunes random
    pairs asymptotically — the structure (bucketed join, exact verify)
    is what transfers to scale, with the threshold regime documented."""
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    sigs = lsh_signatures(embs, dim, n_planes, id_col, vec_col)
    band_structs = F.expr(
        f"transform(sequence(0, {bands - 1}), b -> struct("
        "cast(b as int) as band, "
        f"shiftrightunsigned(sig, cast(b * {bits_per_band} as int))"
        f" & {mask} as band_key))"
    )
    buckets = sigs.select(
        "id", F.explode(band_structs).alias("bk")
    ).select("id", "bk.band", "bk.band_key")
    la = buckets.select("band", "band_key", F.col("id").alias("id_a"))
    lb = buckets.select("band", "band_key", F.col("id").alias("id_b"))
    candidates = (
        la.join(lb, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # vector lookup sides are one row per VECTOR (not per pair), and are
    # deliberately NOT hint-broadcast: an unbounded embedding table (10^8+
    # rows x 64 doubles) cannot ship to every executor. These are plain
    # equi-joins on id — Spark's cost-based broadcast threshold picks
    # broadcast-hash automatically when the vector relation's statistics
    # are small (the sandbox corpus), and AQE falls back to a shuffle join
    # (skew-aware) when they are not; candidates carry only (id_a, id_b)
    # into the exchanges, never vector payloads.
    base = sigs.select("id", "v")
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            # Arrow fold kernel (bit-identical to the JVM aggregate fold);
            # rounding stays JVM-side so oracle semantics are untouched
            "cosine",
            F.round(_cosine_fold_udf(F.col("va"), F.col("vb")), 4),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def lsh_ann_topk(
    embs: DataFrame,
    query_ids: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates are corpus vectors sharing at least
    one signature *band* (n_planes/bands bits) with the query — the
    multi-probe analog of the MinHash band trick. Exact cosine is computed
    only inside buckets; at 10^10 vectors the band join touches a small
    corpus slice per query instead of a full scan. Approximate => no SQL
    oracle; the pytest gate checks recall against cosine_topk instead."""
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    sigs = lsh_signatures(embs, dim, n_planes, id_col, vec_col)
    band_structs = F.expr(
        f"transform(sequence(0, {bands - 1}), b -> struct("
        "cast(b as int) as band, "
        f"shiftrightunsigned(sig, cast(b * {bits_per_band} as int))"
        f" & {mask} as band_key))"
    )
    buckets = sigs.select(
        "id", "v", "norm", F.explode(band_structs).alias("bk")
    ).select("id", "v", "norm", "bk.band", "bk.band_key")
    qside = (
        buckets.join(
            F.broadcast(query_ids.select(F.col(id_col).alias("id"))), "id"
        )
        .select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            "band",
            "band_key",
        )
    )
    candidates = (
        buckets.join(F.broadcast(qside), ["band", "band_key"])
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "qv", "qnorm", "id", "v", "norm")
        .dropDuplicates(["query_id", "id"])
    )
    scored = candidates.withColumn(
        "cosine",
        F.round(
            _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            F.round("cosine", 4).alias("cosine"),
        )
    )


def ivf_centroids(
    embs: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse-quantizer "training": the ``n_centroids``
    corpus vectors with the smallest ``md5(id)`` — an order-free
    pseudo-random sample (a TakeOrdered, no full sort materialization).

    This is the training seam of a real IVF index: at 10^10 vectors run
    ``ivf_centroids_kmeans`` instead (distributed Lloyd iterations over a
    deterministic id-hash sample), and C grows to ~sqrt(N) (e.g. 4096 x
    64 doubles = 2 MB — still trivially driver/broadcast sized). The
    sampled quantizer keeps the whole algorithm a pure
    function of the data, so the DuckDB oracle can replay it end-to-end;
    float-mean nondeterminism is exactly what it avoids.

    Returns driver-side ``[(cid, vector)]`` — the quantizer is tiny model
    state applied as literal map expressions downstream (the IVF analog of
    ``lsh_signatures``' literal plane matrix)."""
    v = _as_double(vec_col)
    rows = (
        embs.select(F.col(id_col).alias("id"), v.alias("v"))
        .orderBy(F.md5(F.col("id").cast("string")), "id")
        .limit(n_centroids)
        .collect()
    )
    return [(int(r["id"]), [float(x) for x in r["v"]]) for r in rows]


def ivf_centroids_kmeans(
    embs: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    train_mod: int | None = None,
    exact_int: bool = False,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means refinement of the sampled quantizer — the
    documented training seam of ``ivf_centroids``, now real. Lloyd
    iterations, each one fully distributed:

    * assign: nearest centroid by cosine via the same literal-expression
      map the query path uses (no shuffle, no Python on the scan);
    * update: one ``groupBy(cid)`` with ``dim`` map-side-combined ``SUM``
      columns + a count — the only exchange is C x (dim+1) partial rows
      per partition (64 sum exprs stays under the codegen maxFields
      cliff this VM measures at >100 aggregate expressions);
    * the driver sees only the C new centroids per iteration.

    ``train_mod=m`` trains on the deterministic id-hash sample
    ``pmod(xxhash64(id), m) == 0`` — at 10^10 vectors the quantizer is
    trained on ~N/m rows (standard IVF practice: a few million samples
    suffice for C ~ sqrt(N) lists) while assignment still covers every
    row. Empty clusters keep their previous centroid.

    The DEFAULT float path is not oracle-gated, deliberately:
    cross-partition float-sum order makes the means nondeterministic in
    the last ulps, which can flip a knife-edge assignment — exactly what
    the md5-sampled quantizer avoids for the registry's value-hash gate.
    Quality is pytest-gated instead (recall vs the exact baseline,
    sampled-vs-kmeans comparison).

    ``exact_int=True`` removes that nondeterminism with the PageRank
    trick (operators/graph.py:96-104): each coordinate is quantized to
    an int64 at 1e-9 resolution BEFORE the per-cluster sum, and the sum
    runs over decimal(38,0) (exact at any row count — int64 itself would
    overflow a per-dimension sum around 10^10 rows), so the trained
    centroids are bit-identical under ANY partitioning/combine order —
    pytest-gated by training under different shuffle-partition counts.
    The 1e-9 quantization error per summed coordinate is far below any
    effect on quantizer quality."""
    v = _as_double(vec_col)
    base = embs.select(F.col(id_col).alias("id"), v.alias("v"))
    if train_mod is not None:
        base = base.filter(
            F.pmod(F.xxhash64(F.col("id")), F.lit(train_mod)) == 0
        )
    # one exchange before the Arrow assignment kernel keeps Python out of
    # the parquet-scan stage (BENCH.md §4); paid once, the frame persists
    # across all n_iter assignment passes
    base = base.repartition(F.col("id")).persist()
    try:
        cents = ivf_centroids(embs, n_centroids, id_col, vec_col)
        for _ in range(n_iter):
            arr = _centroid_score_array(cents, F.col("v"))
            assigned = base.withColumn(
                "cid", (-F.array_max(arr)["nid"]).cast("long")
            )
            if exact_int:
                sums = assigned.groupBy("cid").agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(
                            F.round(
                                F.element_at("v", d + 1) * F.lit(1e9)
                            )
                            .cast("long")
                            .cast("decimal(38,0)")
                        ).alias(f"s{d}")
                        for d in range(dim)
                    ],
                )
                # exact integer sums -> one float division per centroid
                # coordinate on the driver: identical inputs, identical
                # op order, bit-identical means
                new = {
                    int(r["cid"]): [
                        int(r[f"s{d}"]) / int(r["n"]) / 1e9
                        for d in range(dim)
                    ]
                    for r in sums.collect()
                }
            else:
                sums = assigned.groupBy("cid").agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(F.element_at("v", d + 1)).alias(f"s{d}")
                        for d in range(dim)
                    ],
                )
                new = {
                    int(r["cid"]): [
                        float(r[f"s{d}"]) / int(r["n"]) for d in range(dim)
                    ]
                    for r in sums.collect()
                }
            cents = [(cid, new.get(cid, cv)) for cid, cv in cents]
    finally:
        base.unpersist()
    return cents


def _ivf_scores_udf(centroids: list[tuple[int, list[float]]]):
    """Arrow kernel computing each row's raw cosine against every centroid
    (array<double>, one entry per centroid in input order), replaying the
    EXACT IEEE op order of the JVM ``aggregate`` fold / DuckDB
    ``list_dot_product`` (sequential adds over dimensions, vectorized over
    rows and centroids — the ``_cosine_fold_udf`` pattern), so downstream
    JVM ``F.round(c, 6)`` and the SQL oracle agree bit-for-bit. Centroid
    norms are likewise folded sequentially at closure-build time.

    This replaces a literal-expression formulation (C centroids x dim
    literals inlined into one expression tree): that tree cost ~1000 py4j
    calls to build, defeated codegen (aggregate lambdas are interpreted),
    and paid C interpreted 64-element folds per row — measured 5-16 s for
    2k vectors at sf0.1 vs well under a second here."""
    M = np.array([cv for _, cv in centroids], dtype=np.float64)
    cnorms = np.empty(len(centroids))
    for j, (_cid, cv) in enumerate(centroids):
        s = 0.0
        for x in cv:
            s += x * x
        cnorms[j] = math.sqrt(s)

    @F.pandas_udf("array<double>")
    def _scores(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series(np.zeros(0)).astype(object)
        A = np.stack(vs.to_numpy())
        n = len(A)
        na = np.zeros(n)
        dots = np.zeros((n, len(M)))
        for d in range(A.shape[1]):
            na = na + A[:, d] * A[:, d]
            dots = dots + A[:, d, None] * M[None, :, d]
        c = dots / (np.sqrt(na)[:, None] * cnorms[None, :])
        return pd.Series(list(c))

    return _scores


def _centroid_score_array(centroids: list[tuple[int, list[float]]], vec_col):
    """Array<struct<c: double, nid: long>> of per-centroid rounded cosines
    for ``vec_col``, with ``nid = -cid`` so that struct ordering
    (c asc, nid asc) == (cosine asc, cid desc): ``array_max`` picks
    (best cosine, lowest cid) and a reversed ``array_sort`` yields the
    probe order (cosine desc, cid asc) — the oracle's
    ``ORDER BY c6 DESC, cid``. Raw cosines come from the Arrow fold
    kernel (``_ivf_scores_udf``); rounding stays JVM-side so oracle
    semantics are untouched."""
    negs = F.array(
        *[F.lit(-int(cid)).cast("long") for cid, _ in centroids]
    )
    scores = _ivf_scores_udf(centroids)(vec_col)
    return F.transform(
        scores,
        lambda c, i: F.struct(
            F.round(c, 6).alias("c"),
            F.element_at(negs, i + F.lit(1)).alias("nid"),
        ),
    )


def ivf_ann_topk(
    embs: DataFrame,
    query_ids: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: every corpus vector is assigned to its
    nearest centroid (one Arrow-kernel map — the bit-identical fold, see
    ``_ivf_scores_udf``); each query exactly scores only the vectors whose
    assigned centroid is among the query's ``n_probe`` nearest centroids.

    Plan shape at scale: the corpus is scanned once, exchanged once (to
    keep the Arrow assignment kernel out of the scan stage — BENCH.md §4;
    at 10^10 vectors the assignment is instead written once as a
    partition column, host-bucket style, and probing becomes partition
    pruning with no per-query assignment work at all), assigned, and
    equi-joined against the tiny broadcast probe set (queries x n_probe
    rows); the remaining exchange on the big side is the per-query top-k
    window over the ~n_probe/C corpus slice.

    Deterministic (sampled quantizer, md5-ordered) => the oracle replays
    the identical algorithm in SQL; recall vs the exact baseline is
    additionally pytest-gated."""
    v = _as_double(vec_col)
    base = embs.select(
        F.col(id_col).alias("id"), v.alias("v"), _norm(v).alias("norm")
    ).repartition(F.col("id"))
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(embs, n_centroids, id_col, vec_col)
    )
    arr = _centroid_score_array(cents, F.col("v"))
    assigned = base.withColumn(
        "cid", (-F.array_max(arr)["nid"]).cast("long")
    )
    probes = (
        base.join(
            F.broadcast(query_ids.select(F.col(id_col).alias("id"))), "id"
        )
        .select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            F.explode(
                F.slice(F.reverse(F.array_sort(arr)), 1, n_probe)
            ).alias("probe"),
        )
        .select(
            "query_id",
            "qv",
            "qnorm",
            (-F.col("probe.nid")).cast("long").alias("cid"),
        )
    )
    # a corpus vector has exactly ONE assigned cid and probe cids are
    # distinct per query, so the equi-join yields each (query, candidate)
    # pair at most once — no dedup stage needed
    candidates = assigned.join(F.broadcast(probes), "cid").filter(
        F.col("id") != F.col("query_id")
    )
    return _exact_rerank(candidates, k)


def _exact_rerank(candidates: DataFrame, k: int) -> DataFrame:
    """Exact cosine re-rank of (query_id, qv, qnorm, id, v, norm)
    candidate pairs to per-query top-k — the shared tail of the in-flight
    (ivf_ann_topk) and stored-index (ivf_probe_topk) IVF paths."""
    scored = candidates.withColumn(
        "cosine",
        F.round(
            _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            # single rounding (the 6-decimal score itself): a second
            # round-to-4 can land on a .5 tie where Spark (HALF_UP) and
            # DuckDB disagree — observed at c6=0.27795 on the sf0.01 corpus
            F.col("cosine"),
        )
    )


def ivf_index_write(
    embs: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF inverted index: the corpus is assigned ONCE and
    written ``partitionBy("cid")`` — one directory per inverted list.
    This is the 10^10-vector deployment shape ivf_ann_topk's docstring
    describes: assignment cost is paid at ingest, and every probe
    afterwards is partition pruning (``ivf_probe_topk``), no per-query
    assignment work at all. Returns the centroid list (the quantizer —
    persist it with the index; it is a few KB)."""
    v = _as_double(vec_col)
    base = embs.select(
        F.col(id_col).alias("id"), v.alias("v"), _norm(v).alias("norm")
    ).repartition(F.col("id"))
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(embs, n_centroids, id_col, vec_col)
    )
    arr = _centroid_score_array(cents, F.col("v"))
    assigned = base.withColumn(
        "cid", (-F.array_max(arr)["nid"]).cast("long")
    )
    assigned.write.mode("overwrite").partitionBy("cid").parquet(path)
    return cents


def ivf_probe_topk(
    spark,
    index_path: str,
    embs: DataFrame,
    query_ids: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a STORED IVF index (``ivf_index_write``): the probe-cid
    set is computed on the tiny query side with the SAME scoring kernel
    and probe ordering as ivf_ann_topk (so both paths return identical
    results — pytest-gated), collected (queries x n_probe ids, driver-
    trivial), and pushed into the index read as a literal ``cid IN (...)``
    PARTITION filter: Spark lists and reads only the probed inverted-list
    directories — ~n_probe/C of the corpus — which a plan test asserts.
    The rest is the shared exact re-rank."""
    v = _as_double(vec_col)
    qbase = embs.select(
        F.col(id_col).alias("id"), v.alias("v"), _norm(v).alias("norm")
    ).join(F.broadcast(query_ids.select(F.col(id_col).alias("id"))), "id")
    arr = _centroid_score_array(centroids, F.col("v"))
    probes = (
        qbase.select(
            F.col("id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            F.explode(
                F.slice(F.reverse(F.array_sort(arr)), 1, n_probe)
            ).alias("probe"),
        )
        .select(
            "query_id",
            "qv",
            "qnorm",
            (-F.col("probe.nid")).cast("long").alias("cid"),
        )
    )
    # The probe set is driver-trivial (queries x n_probe rows): collect it
    # ONCE and rebuild it as a literal frame, so the probe-cid extraction
    # and the candidates join share one computation with no persisted
    # block left behind (a .persist() here leaked one cached frame per
    # call — nothing ever unpersisted it).
    probe_rows = probes.collect()
    probe_cids = sorted({r.cid for r in probe_rows})
    probes = spark.createDataFrame(
        probe_rows,
        "query_id long, qv array<double>, qnorm double, cid long",
    )
    idx = spark.read.parquet(index_path).filter(
        F.col("cid").isin(probe_cids)
    )
    candidates = idx.join(F.broadcast(probes), "cid").filter(
        F.col("id") != F.col("query_id")
    )
    return _exact_rerank(candidates, k)


def semdedup_bucket_expr(
    dim: int = 64, n_bits: int = 8, idx: str = "element_at(e, {})"
) -> str:
    """Deterministic engine-portable cluster surrogate for SemDeDup: bit i
    of the bucket id is (e[i] > e[i + dim/2]) — a fixed coordinate-
    contrast hyperplane. The CASE WHEN arithmetic is shared between
    engines but the 1-based array access is NOT textual: Spark's ``e[i]``
    brackets are ZERO-based while DuckDB's are one-based, so the caller
    picks the accessor — ``element_at(e, {})`` (Spark, default) or
    ``e[{}]`` (DuckDB oracle). Production would cluster with
    ``ivf_centroids_kmeans(exact_int=True)`` instead; the surrogate keeps
    the whole algorithm SQL-oracle-checkable, like the ``ivf_centroids``
    sampling quantizer."""
    half = dim // 2
    return " + ".join(
        "(CASE WHEN {a} > {b} THEN {v} ELSE 0 END)".format(
            a=idx.format(i), b=idx.format(i + half), v=1 << (i - 1)
        )
        for i in range(1, n_bits + 1)
    )


def semdedup_keep(
    embs: DataFrame,
    dim: int = 64,
    threshold: float = 0.9,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): cluster the embedding space,
    then inside each cluster drop every member whose cosine to the
    cluster REPRESENTATIVE (smallest id) reaches the threshold — linear
    in corpus size, unlike pairwise near-dup. Per member: (vec_id,
    bucket, rep_id, cosine-to-rep rounded to 4, keep).

    Shape at 100 TB: bucketing is a narrow projection (no shuffle); the
    representative table is at most 2^n_bits rows (256 here) of
    64-double vectors — broadcast by construction however large the
    corpus — so the scoring pass is one broadcast-hash join + a per-row
    JVM cosine fold: a single scan, no pairwise blow-up, no
    CartesianProduct (asserted in tests/test_plans.py). The known recall
    trade (a near-dup pair split across two clusters is missed) is the
    published algorithm's own property, not an approximation added here.
    """
    v = embs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    bk = v.withColumn(
        "bucket", F.expr(semdedup_bucket_expr(dim, n_bits)).cast("long")
    )
    # representative id AND its vector from ONE aggregation: min over
    # (vec_id, e) structs orders by vec_id (unique), so no second
    # corpus-wide join is needed to fetch the rep's embedding
    reps = bk.groupBy("bucket").agg(
        F.min(F.struct("vec_id", "e")).alias("r")
    ).select(
        "bucket",
        F.col("r.vec_id").alias("rep_id"),
        F.col("r.e").alias("re"),
    )
    scored = bk.join(F.broadcast(reps), "bucket").withColumn(
        "cosine",
        F.round(
            _dot(F.col("e"), F.col("re"))
            / (_norm(F.col("e")) * _norm(F.col("re"))),
            4,
        ),
    )
    return scored.select(
        "vec_id",
        "bucket",
        "rep_id",
        "cosine",
        (
            (F.col("vec_id") == F.col("rep_id"))
            | (F.col("cosine") < F.lit(threshold))
        ).alias("keep"),
    )


def pq_codebooks(
    embs: DataFrame,
    n_sub: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 — public):
    the vector space is split into ``n_sub`` orthogonal subspaces and
    each gets its own ``ks``-entry codeword table. Training reuses the
    deterministic md5-ordered sample that trains the coarse quantizer
    (``ivf_centroids``): codebook m = the sample vectors' m-th
    subvectors, so the whole model is a pure function of the data and
    the DuckDB oracle can re-derive it (codeword j == the j-th sample in
    md5 order). At 10^10 vectors each codebook trains with per-subspace
    k-means instead (the ``ivf_centroids_kmeans`` seam, run n_sub times
    on slices); sampling keeps the bench algorithm replayable.

    Vectors are L2-NORMALIZED before slicing (and the corpus is
    normalized before encoding): the ADC score approximates <q, x-hat>,
    which ranks like cosine only when every candidate has unit norm —
    on raw vectors the reconstruction favours large-norm candidates and
    recall collapses (measured 0.17 -> 0.55 on the sandbox corpus).
    Normalization is sequential-fold arithmetic in both engines, so
    oracle parity is preserved.

    Returns ``codebooks[m][j] = subvector`` — driver-side literal model
    state (n_sub * ks * sub_dim doubles, a few KB)."""
    import math

    sample = ivf_centroids(embs, ks, id_col, vec_col)
    dim = len(sample[0][1])
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible into {n_sub} subspaces")
    sd = dim // n_sub
    normed = []
    for _, vec in sample:
        # left-to-right sum == the SQL list_dot_product fold
        s = 0.0
        for y in vec:
            s += y * y
        nrm = math.sqrt(s)
        normed.append([x / nrm for x in vec])
    return [
        [vec[m * sd:(m + 1) * sd] for vec in normed]
        for m in range(n_sub)
    ]


def _fold_sum(pairs):
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def _pq_d2_udf(codebooks: list[list[list[float]]]):
    """Arrow kernel computing every (subspace, codeword) squared L2
    distance of a vector batch in one numpy pass — replaying the JVM
    fold's EXACT sequential per-dimension IEEE order (the
    ``_cosine_fold_udf`` discipline), so downstream round6 + argmin and
    the DuckDB oracle agree bit-for-bit. The literal-expression
    encoding this replaces built n_sub x ks interpreted folds per row
    (128 aggregates at the defaults) and fell off the fast path:
    measured 7.8 s -> 0.9 s for ann_ivfpq at sf0.1."""
    cbs = [np.asarray(c, dtype=np.float64) for c in codebooks]

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.DoubleType())))
    def kernel(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series(np.zeros(0, dtype=object))
        X = np.stack(v.to_numpy())
        off = 0
        per_sub = []
        for cb in cbs:
            sd = cb.shape[1]
            Xm = X[:, off:off + sd]
            off += sd
            d2 = np.zeros((len(X), cb.shape[0]))
            for d in range(sd):
                diff = Xm[:, d:d + 1] - cb[None, :, d]
                d2 = d2 + diff * diff
            per_sub.append(d2)
        arr = np.stack(per_sub, axis=1)  # rows x n_sub x ks
        return pd.Series([[list(s) for s in row] for row in arr])

    return kernel


def pq_codes(vec_col, codebooks: list[list[list[float]]]):
    """array<int> PQ code of a vector column: per subspace the codeword
    index minimizing round6(L2²), ties to the smallest index. The d2
    table comes from the Arrow kernel (one numpy pass per batch);
    rounding and the argmin tie-break stay JVM-side so oracle semantics
    are untouched."""
    d2s = _pq_d2_udf(codebooks)(vec_col)
    return F.transform(
        d2s,
        lambda sub: F.array_min(
            F.transform(
                sub,
                lambda d, j: F.struct(
                    F.round(d, 6).alias("d"), j.cast("int").alias("j")
                ),
            )
        )["j"],
    )


def _pq_dot_udf(codebooks: list[list[list[float]]]):
    """Arrow kernel for the query-side ADC dot table: raw
    <q_m, codeword> doubles in the JVM fold's sequential per-dimension
    order. Execution cost is trivial (query rows only); the point is
    PLAN cost — the literal-expression version put n_sub x ks fold
    expressions into the plan and Catalyst analysis dominated the query
    (~3 s of the 5-7 s fresh-plan ann_ivfpq runs)."""
    cbs = [np.asarray(c, dtype=np.float64) for c in codebooks]

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.DoubleType())))
    def kernel(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series(np.zeros(0, dtype=object))
        X = np.stack(v.to_numpy())
        off = 0
        per_sub = []
        for cb in cbs:
            sd = cb.shape[1]
            Xm = X[:, off:off + sd]
            off += sd
            dot = np.zeros((len(X), cb.shape[0]))
            for d in range(sd):
                dot = dot + Xm[:, d:d + 1] * cb[None, :, d]
            per_sub.append(dot)
        arr = np.stack(per_sub, axis=1)
        return pd.Series([[list(s) for s in row] for row in arr])

    return kernel


def pq_adc_weights(vec_col, codebooks: list[list[list[float]]]):
    """array<array<bigint>> asymmetric-distance table of a QUERY vector:
    weights[m][j] = round(1e6 * <q_m, codebook[m][j]>) — integer-scaled
    so the per-candidate ADC score is an exact int64 sum (order-free,
    bit-identical in both engines). Dots come from the Arrow kernel;
    the x1e6 round stays JVM-side for oracle-identical semantics."""
    dots = _pq_dot_udf(codebooks)(vec_col)
    return F.transform(
        dots,
        lambda sub: F.transform(
            sub,
            lambda d: F.round(d * F.lit(1000000.0)).cast("long"),
        ),
    )


def ivfpq_ann_topk(
    embs: DataFrame,
    query_ids: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_sub: int = 8,
    ks: int = 16,
    rerank_r: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k — the memory-compressed production ANN
    shape (FAISS's IVFPQ index, Jégou et al. 2011): the coarse quantizer
    restricts each query to n_probe inverted lists (exactly
    ``ivf_ann_topk``'s probe path); candidates are scored from their
    ``n_sub``-byte PQ codes via an asymmetric-distance-computation (ADC)
    table lookup — the candidate's FULL vector is never touched in the
    wide scoring pass; only the ADC top-``rerank_r`` per query fetch
    their real vectors for an exact cosine re-rank (FAISS's refine
    stage). At 10^10 x 64 dims the scored index is 8 bytes/vector
    instead of 256 — it fits in cluster RAM — and the re-rank join
    touches queries x R rows, driver-trivial by construction.

    Plan shape: corpus scanned once, exchanged once, assigned (cid) and
    encoded (codes) by literal map expressions; the tiny probe set
    (queries x n_probe, carrying each query's integer ADC table)
    broadcasts; the ADC score is one fold over zip_with(codes, weights)
    — int64 end to end, so ADC ranking (and therefore the re-rank
    candidate set) is hash-exact against the oracle's replay. Recall vs
    the exact baseline is pytest-gated."""
    v = _as_double(vec_col)
    cents = ivf_centroids(embs, n_centroids, id_col, vec_col)
    cbs = pq_codebooks(embs, n_sub, ks, id_col, vec_col)
    base = embs.select(F.col(id_col).alias("id"), v.alias("v")).repartition(
        F.col("id")
    )
    arr = _centroid_score_array(cents, F.col("v"))
    # unit-normalize before encoding (see pq_codebooks): ADC then ranks
    # like cosine; the coarse assignment stays on the raw vector (cosine
    # is normalization-invariant, keeping probe parity with ann_ivf)
    nv = F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    assigned = (
        base.withColumn("nrm", _norm(F.col("v")))
        .withColumn("cid", (-F.array_max(arr)["nid"]).cast("long"))
        .withColumn("codes", pq_codes(nv, cbs))
        .drop("v", "nrm")
    )
    probes = (
        base.join(
            F.broadcast(query_ids.select(F.col(id_col).alias("id"))), "id"
        )
        .select(
            F.col("id").alias("query_id"),
            pq_adc_weights(F.col("v"), cbs).alias("w"),
            F.explode(
                F.slice(F.reverse(F.array_sort(arr)), 1, n_probe)
            ).alias("probe"),
        )
        .select(
            "query_id",
            "w",
            (-F.col("probe.nid")).cast("long").alias("cid"),
        )
    )
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("id") != F.col("query_id"))
        .withColumn(
            "adc_x1e6",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("w"),
                    lambda c, wm: F.element_at(wm, c + F.lit(1)),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_x1e6").desc(), F.col("id").asc()
    )
    shortlist = (
        scored.withColumn("rank_adc", F.row_number().over(w))
        .filter(F.col("rank_adc") <= rerank_r)
        .select("query_id", "id", "adc_x1e6")
    )
    # refine: exact cosine over the queries x R shortlist only
    qv = base.join(
        F.broadcast(query_ids.select(F.col(id_col).alias("id"))), "id"
    ).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qnorm"),
    )
    cv = base.select("id", "v", _norm(F.col("v")).alias("norm"))
    refined = shortlist.join(F.broadcast(qv), "query_id").join(cv, "id")
    return _exact_rerank(refined, k)


def ivfpq_index_write(
    embs: DataFrame,
    path: str,
    n_centroids: int = 16,
    n_sub: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], list[list[list[float]]]]:
    """Materialize the IVF-PQ index: every corpus vector is assigned and
    PQ-encoded ONCE, and only (id, codes) lands in the partitioned store
    — ``partitionBy(cid)``, one directory per inverted list, n_sub
    small-int codes per row instead of the vector (the 8-vs-256-bytes
    point of PQ; the raw vectors stay in the base table and are touched
    only by the refine join). Returns (centroids, codebooks) — the
    quantizer model, a few KB of driver state to persist beside the
    index."""
    cents = ivf_centroids(embs, n_centroids, id_col, vec_col)
    cbs = pq_codebooks(embs, n_sub, ks, id_col, vec_col)
    v = _as_double(vec_col)
    base = embs.select(F.col(id_col).alias("id"), v.alias("v")).repartition(
        F.col("id")
    )
    arr = _centroid_score_array(cents, F.col("v"))
    nv = F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    (
        base.withColumn("nrm", _norm(F.col("v")))
        .withColumn("cid", (-F.array_max(arr)["nid"]).cast("long"))
        .withColumn("codes", pq_codes(nv, cbs))
        .select("cid", "id", "codes")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(path)
    )
    return cents, cbs


def ivfpq_probe_topk(
    spark,
    index_path: str,
    embs: DataFrame,
    query_ids: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 4,
    rerank_r: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over the STORED IVF-PQ index: probe cids are computed on the
    tiny query side (same kernel + ordering as the in-flight path, so the
    two return identical rows — pytest-gated) and pushed into the index
    read as a literal partition filter; candidates score by integer ADC
    from their stored codes alone, and only the ADC top-``rerank_r``
    fetch real vectors from the base table for the exact refine."""
    v = _as_double(vec_col)
    qbase = embs.select(
        F.col(id_col).alias("id"), v.alias("v")
    ).join(F.broadcast(query_ids.select(F.col(id_col).alias("id"))), "id")
    arr = _centroid_score_array(centroids, F.col("v"))
    probes = qbase.select(
        F.col("id").alias("query_id"),
        pq_adc_weights(F.col("v"), codebooks).alias("w"),
        F.explode(
            F.slice(F.reverse(F.array_sort(arr)), 1, n_probe)
        ).alias("probe"),
    ).select(
        "query_id", "w", (-F.col("probe.nid")).cast("long").alias("cid")
    )
    probe_rows = probes.collect()
    probe_cids = sorted({r.cid for r in probe_rows})
    probes = spark.createDataFrame(
        probe_rows, "query_id long, w array<array<bigint>>, cid long"
    )
    idx = spark.read.parquet(index_path).filter(
        F.col("cid").isin(probe_cids)
    )
    scored = (
        idx.join(F.broadcast(probes), "cid")
        .filter(F.col("id") != F.col("query_id"))
        .withColumn(
            "adc_x1e6",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("w"),
                    lambda c, wm: F.element_at(wm, c + F.lit(1)),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_x1e6").desc(), F.col("id").asc()
    )
    shortlist = (
        scored.withColumn("rank_adc", F.row_number().over(w))
        .filter(F.col("rank_adc") <= rerank_r)
        .select("query_id", "id")
    )
    base = embs.select(F.col(id_col).alias("id"), v.alias("v"))
    qv = base.join(
        F.broadcast(query_ids.select(F.col(id_col).alias("id"))), "id"
    ).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qnorm"),
    )
    cv = base.select("id", "v", _norm(F.col("v")).alias("norm"))
    refined = shortlist.join(F.broadcast(qv), "query_id").join(cv, "id")
    return _exact_rerank(refined, k)
