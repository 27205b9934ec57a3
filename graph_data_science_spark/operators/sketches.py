"""Mergeable corpus-statistics sketches — distinct counts and quantiles
without a global shuffle of raw values.

At 100 TB the basic corpus questions ("how many distinct documents /
shingles / urls per language?", "what is the p99 document length per
source?") cannot afford exact global aggregation of the raw value space.
The industry answer is MERGEABLE sketches: fixed-size summaries that
combine associatively, so partitions (or daily increments) sketch
independently and merge with a tiny shuffle.

This module implements two, both DETERMINISTIC (hash-seeded, no RNG, no
float-sum order dependence in any hashed state) and therefore fully
SQL-oracle-able — unlike Spark's built-in approx_count_distinct /
approx_percentile, whose sketch state is opaque and whose results are not
reproducible across engines:

- **HyperLogLog** (Flajolet et al. 2007, the public algorithm): the hash
  is the engine-standard md5-top-60-bits (``embeddings._u01`` family), the
  register state is ``(group, reg, rho)`` with rho = leading-zero rank —
  EXACT integers, mergeable by ``max`` per register (union = groupBy-max,
  the associative merge that makes incremental corpus accounting free).
  The estimator keeps the 2^-rho sum as a SCALED EXACT INTEGER
  (Σ 2^(53−rho): rho ≤ 61−p ≤ 53 for p ≥ 8, total ≤ m·2^53 ≤ 2^62 for
  p ≤ 9), so the harmonic-mean denominator is bit-identical in any engine
  and any aggregation order for p ∈ [8, 9] (other p fall back to a float
  sum of exact powers — still deterministic per aggregation tree);
  only the final α·m²/S division and the small-range ln() correction are
  float (ROUND(·,4) — the same cross-engine posture as kmeans).
- **Log2 histogram**: bin = bit-length of the non-negative integer value
  (0 → bin 0), counts exact — the mergeable shape for long-tailed size
  distributions. Quantiles interpolate linearly inside the winning bin;
  per-group state is ≤ 64 rows, so the quantile window never sees more
  than 64 rows per partition key.

Standard error for HLL is 1.04/sqrt(2^p): p=9 → ~4.6%, p=12 → ~1.6%
(p ∈ [8, 9] keeps the exact-integer denominator — hence the default p=9
for oracle-checked paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TWO60 = float(1 << 60)


def _h60(col, seed: int) -> F.Column:
    """Engine-standard 60-bit hash as a LONG (md5 top 60 bits of
    'value:seed' — the integer form of embeddings._u01)."""
    s = F.concat_ws(":", col.cast("string"), F.lit(int(seed)).cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 9,
    seed: int = 42,
) -> DataFrame:
    """HLL register state → (group, reg, rho): reg = top p hash bits,
    rho = leading-zero rank of the remaining 60−p bits, max-merged.
    Mergeable: the union of two corpora's registers is groupBy-max."""
    if not (4 <= p <= 16):
        raise ValueError(f"p={p} out of range [4, 16]")
    h = _h60(F.col(value_col), seed)
    wbits = 60 - p
    w = F.pmod(h, F.lit(1 << wbits))
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1)
    return (df.select(
        F.col(group_col).alias("group"),
        # exact integer op — a float division would misround above 2^53
        F.shiftright(h, wbits).alias("reg"),
        rho.cast("long").alias("rho"))
        .groupBy("group", "reg").agg(F.max("rho").alias("rho")))


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Union sketches from independent scans/increments: max per register."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy("group", "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = 9) -> DataFrame:
    """(group, approx_distinct): bias-corrected HLL estimate, ROUND 4.

    The 2^-rho harmonic sum rides as Σ 2^(53−rho) — an exact int64 for
    p ∈ [8, 9] — plus V·2^53 for the absent (zero) registers, so the
    denominator is aggregation-order independent there."""
    m = 1 << p
    a = _alpha(m)
    scale_bits, scale = 53, float(1 << 53)
    term = F.pow(F.lit(2.0), F.lit(scale_bits) - F.col("rho"))
    if 8 <= p <= 9:
        # exact-integer denominator: rho ≤ 61−p ≤ 53, so 2^(53−rho) is an
        # int ≥ 1 and the total Σ + V·2^53 ≤ m·2^53 ≤ 2^62 — no overflow,
        # no float-sum order dependence. Other p keep the float sum of
        # the same exact powers (order-dependent at ulp level only).
        term = term.cast("long")
    agg = registers.groupBy("group").agg(
        F.sum(term).alias("_s"), F.count(F.lit(1)).alias("_nz"))
    v = F.lit(m) - F.col("_nz")                        # zero registers
    s_total = F.col("_s").cast("double") + v.cast("double") * F.lit(scale)
    raw = F.lit(a * m * m * scale) / s_total
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), small).otherwise(raw)
    return agg.select("group", F.round(est, 4).alias("approx_distinct"))


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 9,
    seed: int = 42,
) -> DataFrame:
    """approx COUNT(DISTINCT value) per group via HLL (module doc)."""
    return hll_estimate(hll_registers(df, group_col, value_col, p, seed), p)


def log_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """(group, bin, cnt): log2 bins of a non-negative integer column —
    bin = bit_length(value) (0 → 0), covering [2^(b−1), 2^b). Exact
    counts; mergeable by sum."""
    v = F.col(value_col).cast("long")
    b = F.when(v <= 0, F.lit(0)).otherwise(F.length(F.bin(v))).alias("bin")
    return (df.select(F.col(group_col).alias("group"), b)
            .groupBy("group", "bin").agg(F.count(F.lit(1)).alias("cnt")))


def histogram_quantiles(
    hist: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """(group, q, est): per-group quantiles interpolated inside the log2
    winning bin — est = lo + width · (q·total − cum_below) / cnt with
    lo = 2^(b−1) (b=0 → the exact value 0), ROUND 6. The window only ever
    orders the ≤64-row per-group bin table."""
    w = Window.partitionBy("group").orderBy("bin")
    cum = (hist
           .withColumn("_cum", F.sum("cnt").over(w))
           .withColumn("_tot", F.sum("cnt").over(Window.partitionBy("group"))))
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double")
    j = cum.join(F.broadcast(qdf),
                 F.col("_cum") >= F.col("q") * F.col("_tot"))
    first = (j.groupBy("group", "q")
             .agg(F.min(F.struct("bin", "cnt", "_cum", "_tot")).alias("_b"))
             .select("group", "q", F.col("_b.bin").alias("bin"),
                     F.col("_b.cnt").alias("cnt"),
                     F.col("_b._cum").alias("cum"),
                     F.col("_b._tot").alias("tot")))
    lo = F.when(F.col("bin") == 0, F.lit(0.0)).otherwise(
        F.pow(F.lit(2.0), F.col("bin") - 1))
    width = F.when(F.col("bin") == 0, F.lit(0.0)).otherwise(
        F.pow(F.lit(2.0), F.col("bin") - 1))
    before = F.col("cum") - F.col("cnt")
    est = lo + width * (F.col("q") * F.col("tot") - before) / F.col("cnt")
    return first.select("group", "q", F.round(est, 6).alias("est"))
