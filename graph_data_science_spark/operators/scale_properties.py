"""Property scalers — ``gds.scaleProperties`` analog.

Reference: algo/src/main/java/org/neo4j/gds/scaleproperties/ScaleProperties.java
and the scaler set used by PageRank (algo/.../pagerank/PageRankAlgorithm.java:84-110):
MinMax, Mean, Max, Log, Center, StdScore, L1Norm, L2Norm, None.

Each scaler is one global aggregate (computed in the same Catalyst plan via a
broadcast cross join — no driver round-trip) plus column arithmetic; all
JVM-side, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALERS = ("NONE", "MINMAX", "MEAN", "MAX", "LOG", "CENTER", "STDSCORE", "L1NORM", "L2NORM")


def apply_scaler(df: DataFrame, column: str, scaler: str) -> DataFrame:
    """Return ``df`` with ``column`` scaled in place."""
    s = scaler.upper().replace("_", "")
    c = F.col(column)
    others = [x for x in df.columns if x != column]
    if s == "NONE":
        return df
    if s == "LOG":
        return df.select(*others, F.log(c).alias(column))
    agg_map = {
        "MINMAX": [F.min(c).alias("_lo"), F.max(c).alias("_hi")],
        "MEAN": [F.avg(c).alias("_avg"), F.min(c).alias("_lo"), F.max(c).alias("_hi")],
        "MAX": [F.max(F.abs(c)).alias("_absmax")],
        "CENTER": [F.avg(c).alias("_avg")],
        "STDSCORE": [F.avg(c).alias("_avg"), F.stddev_pop(c).alias("_std")],
        "L1NORM": [F.sum(F.abs(c)).alias("_l1")],
        "L2NORM": [F.sqrt(F.sum(c * c)).alias("_l2")],
    }
    if s not in agg_map:
        raise ValueError(f"unknown scaler {scaler!r}; one of {SCALERS}")
    stats = df.agg(*agg_map[s])
    out = df.crossJoin(F.broadcast(stats))
    zero = F.lit(0.0)
    if s == "MINMAX":
        rng = F.col("_hi") - F.col("_lo")
        expr = F.when(rng == 0, zero).otherwise((c - F.col("_lo")) / rng)
    elif s == "MEAN":
        rng = F.col("_hi") - F.col("_lo")
        expr = F.when(rng == 0, zero).otherwise((c - F.col("_avg")) / rng)
    elif s == "MAX":
        expr = F.when(F.col("_absmax") == 0, zero).otherwise(c / F.col("_absmax"))
    elif s == "CENTER":
        expr = c - F.col("_avg")
    elif s == "STDSCORE":
        expr = F.when(F.col("_std") == 0, zero).otherwise((c - F.col("_avg")) / F.col("_std"))
    elif s == "L1NORM":
        expr = F.when(F.col("_l1") == 0, zero).otherwise(c / F.col("_l1"))
    else:  # L2NORM
        expr = F.when(F.col("_l2") == 0, zero).otherwise(c / F.col("_l2"))
    return out.select(*others, expr.alias(column))
