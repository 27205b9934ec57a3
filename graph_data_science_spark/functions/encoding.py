"""``gds.alpha.ml.oneHotEncoding`` analog — Column-level one-hot encoder.

Reference: alpha/alpha-proc/src/main/java/org/neo4j/gds/functions/
OneHotEncodingFunc.java:34-53 — null availableValues → empty list; null
selectedValues → all-zeros; else 1 at every index whose available value is
a member of the selected set.

Pure ``pyspark.sql.functions`` array transform — whole-stage codegen, no
Python in the hot path; at 100 TB this is a per-row projection with zero
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def one_hot_encoding(available: Column, selected: Column) -> Column:
    """One-hot ``array<long>`` over ``available``, 1 where the value is in
    ``selected`` (reference null semantics preserved)."""
    zeros = F.transform(available, lambda _: F.lit(0).cast("long"))
    hot = F.transform(
        available,
        lambda v: F.when(F.array_contains(selected, v), F.lit(1))
        .otherwise(F.lit(0)).cast("long"))
    return (
        F.when(available.isNull(), F.lit([]).cast("array<long>"))
        .when(selected.isNull(), zeros)
        .otherwise(hot)
    )
