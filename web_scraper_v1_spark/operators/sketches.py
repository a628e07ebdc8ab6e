"""Mergeable cardinality/frequency sketches: HyperLogLog + Count-Min.

The reference has no counterpart (its dedup story is the in-memory TTL map,
/root/reference/internal/cache/in_memory.go:9-109, and even that is not
wired into the live loop); these exist for the north rule's 10^10-URL
frontier, where the two questions a crawl scheduler asks constantly —
"how many DISTINCT urls has this frontier/host seen" and "which hosts/keys
dominate the traffic" — cannot be answered with `count(distinct ...)` or a
full groupBy at 10^10 rows per wave without a corpus-wide shuffle:

* **HyperLogLog** (Flajolet et al. 2007, public): distinct-count with a
  FIXED 2^p-register state per group. The Spark plan is two hash
  aggregates — ``groupBy(group, register).max(rho)`` (map-side partial max
  collapses each task's contribution to <= m rows, so the exchange carries
  <= m * n_groups rows no matter how many trillions of inputs) and a
  <=m-row fold per group. Registers are MERGEABLE by max: sketches built
  per-partition / per-day / per-crawl-epoch combine without rescanning
  (``hll_merge``), the property the frontier's incremental cadence needs.
* **Count-Min** (Cormode & Muthukrishnan 2005, public): heavy-hitter
  frequency estimation in d x w integer counters. Build is one map-side
  combinable groupBy over (seed, bucket) — the counter table is <= d*w
  rows TOTAL (constant, corpus-size independent), so the probe side
  BROADCASTS it; estimating any key's frequency never shuffles the corpus
  again. One-sided error by construction: est >= exact always,
  overestimate bounded by (e/w) * total_count per row pair.

Determinism contract (what lets DuckDB replay the estimate bit-for-bit):
every hash bit comes from md5 over the SAME string bytes in both engines;
register index and rho are pure integer/string ops (hex-slice casts,
``bin`` + ``instr``); the harmonic denominator is kept EXACT as
sum(2^(53-M_j)) in decimal(38,0) (every term is an integer <= 2^53 —
never a float), so the only floating-point steps are one literal/S
division and the linear-counting ln, both evaluated from identical
operands in both engines. CMS is integer-exact end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# HLL geometry: p=12 -> m=4096 registers; the md5-derived hash gives
# 12 register bits + 52 rho bits (rho in [1, 53]; 53 = "all 52 zero").
HLL_P = 12
HLL_M = 1 << HLL_P
_RHO_BITS = 52
_RHO_MAX = _RHO_BITS + 1
# 2^53: largest per-register term of the scaled harmonic sum
_POW53 = 1 << 53
# alpha_m * m^2 * 2^53 as ONE literal double, so the estimate is a single
# IEEE division by double(S) in both engines (m >= 128 alpha formula)
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(_POW53)
# below 2.5*m the raw estimator biases high and linear counting over the
# empty-register count is the published correction
_SMALL_RANGE = 2.5 * HLL_M


def _hex_slice_to_long(hx: Column, start: int, length: int) -> Column:
    """Integer value of md5-hex chars [start, start+length) — JVM-side
    ``conv``; DuckDB twin is ``('0x' || substr(hx, start, length))::BIGINT``."""
    return F.conv(F.substring(hx, start, length), 16, 10).cast("bigint")


def hll_registers(df: DataFrame, key: Column, groups: list[str]) -> DataFrame:
    """Stage 1: per-(group, register) max rho — the ENTIRE sketch state.

    Output is <= m rows per group regardless of input size; the groupBy is
    map-side partially aggregated, so at 10^10 rows each task emits at most
    m * (groups per task) rows into the exchange. ``key`` must already be
    a string column (hash bytes = utf8 of that string in both engines).
    NULL keys are ignored — count(distinct) semantics; without the filter
    a NULL would land a phantom reg=NULL register row that inflates the
    register count while contributing nothing to the harmonic sum."""
    df = df.filter(key.isNotNull())
    hx = F.md5(key.cast("binary"))
    v = _hex_slice_to_long(hx, HLL_P // 4 + 1, 13)
    rho = F.when(v == 0, F.lit(_RHO_MAX)).otherwise(
        F.instr(F.lpad(F.bin(v), _RHO_BITS, "0"), "1")
    )
    return (
        df.select(
            *groups,
            _hex_slice_to_long(hx, 1, HLL_P // 4).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy(*groups, "reg")
        .agg(F.max("rho").alias("mr"))
    )


def hll_merge(registers: DataFrame, groups: list[str]) -> DataFrame:
    """Combine sketches by register-wise max — union semantics without
    touching the raw data again (per-epoch/per-partition sketches fold
    into a global one). ``groups`` is the POST-merge grouping (may be
    empty for a single global sketch)."""
    return registers.groupBy(*groups, "reg").agg(F.max("mr").alias("mr"))


def hll_estimate(registers: DataFrame, groups: list[str]) -> DataFrame:
    """Stage 2: fold <= m register rows per group into the estimate.

    Returns per group: ``zero_regs`` (empty registers), ``s_scaled``
    (EXACT decimal sum(2^(53-M_j)), absent registers contributing 2^53),
    ``hll_est`` (raw estimator) and ``hll_corrected`` (linear-counting
    small-range correction applied when it should be). The integer state
    columns make the row hash-gateable independent of any float step."""
    # SQL shiftleft (the Python wrapper only takes literal bit counts);
    # every term is an exact integer <= 2^53
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RHO_MAX} - mr)")
    folded = registers.groupBy(*groups).agg(
        (F.lit(HLL_M) - F.count("*")).cast("int").alias("zero_regs"),
        (
            F.sum(term.cast("decimal(38,0)"))
            + (F.lit(HLL_M) - F.count("*")).cast("decimal(38,0)")
            * F.lit(_POW53).cast("decimal(38,0)")
        ).alias("s_scaled"),
    )
    raw = F.lit(HLL_NUMER) / F.col("s_scaled").cast("double")
    corrected = F.when(
        (F.col("zero_regs") > 0) & (raw <= F.lit(_SMALL_RANGE)),
        F.round(
            F.lit(float(HLL_M))
            * F.log(F.lit(float(HLL_M)) / F.col("zero_regs").cast("double"))
        ),
    ).otherwise(F.round(raw))
    return folded.select(
        *groups,
        "zero_regs",
        "s_scaled",
        F.round(raw).cast("bigint").alias("hll_est"),
        corrected.cast("bigint").alias("hll_corrected"),
    )


# Count-Min geometry: d=4 independent rows x w=2048 buckets. 4 hex chars
# give 16 uniform bits; 65536 is an exact multiple of 2048, so the mod
# keeps uniformity.
CMS_D = 4
CMS_W = 2048


def cms_bucket(seed: Column, key: Column) -> Column:
    """Row-``seed`` bucket of ``key`` (string column): md5 over the
    "seed:key" bytes, 16 hash bits mod w. Pure JVM expressions."""
    hx = F.md5(F.concat(seed.cast("string"), F.lit(":"), key).cast("binary"))
    return (_hex_slice_to_long(hx, 1, 4) % CMS_W).alias("bucket")


def cms_build(df: DataFrame, key: Column) -> DataFrame:
    """d x w counter table (<= 8192 rows TOTAL, corpus-size independent):
    explode d seeds per row, one map-side-combinable count per (seed,
    bucket). At 10^10 inputs the exchange still carries <= d*w rows per
    task — the sketch, not the data."""
    seeds = F.array([F.lit(i) for i in range(CMS_D)])
    items = df.select(key.alias("k"), F.explode(seeds).alias("seed"))
    return (
        items.select("seed", cms_bucket(F.col("seed"), F.col("k")))
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_probe(counters: DataFrame, keys: DataFrame, key: Column) -> DataFrame:
    """Estimate every probe key's frequency: min over the d row counters.
    ``counters`` is broadcast (fixed d*w size), so probing N candidate
    keys is one broadcast-hash join + a d-row min per key — the corpus is
    never touched. LEFT join + coalesce(0): a probe key the build never
    saw may hash into empty buckets, and an empty bucket reads 0 (the
    correct CMS answer for it), not a dropped row. Output: probe columns
    + ``est_n``."""
    seeds = F.array([F.lit(i) for i in range(CMS_D)])
    probes = keys.select(
        "*", F.explode(seeds).alias("seed")
    ).select("*", cms_bucket(F.col("seed"), key))
    return (
        probes.join(F.broadcast(counters), ["seed", "bucket"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
    )
