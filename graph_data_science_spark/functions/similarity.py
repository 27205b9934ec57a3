"""``gds.similarity.*`` vector functions as native Column expressions.

Reference analog: ``algo/.../similarity/SimilaritiesFunc.java:41-119`` (the
@UserFunction surface: jaccard / cosine / pearson / euclideanDistance /
euclidean / overlap over two collection vectors) with kernels from
``core/.../utils/Intersections.java:137-180``.

Spark-first: each function is a pure Catalyst expression built from
higher-order array functions (``zip_with`` / ``aggregate`` / ``filter``) —
no UDF, no Python in the hot path, whole-stage-codegen'd JVM arithmetic.
At 100 TB these run inside the scan's codegen stage: a projection over a
parquet column pair, no shuffle, no Arrow transfer. Inputs may be any
numeric array type; every function casts to ``array<double>`` first (the
reference coerces List<Number> → double[] the same way).

Edge-case parity with the reference:

- ``cosine``/``pearson``/``euclidean_distance`` require equal non-zero
  lengths (the reference throws; here unequal lengths yield NULL from
  ``zip_with`` arithmetic on the missing tail — callers that want the
  throw can assert lengths, and the oracle queries operate on fixed-width
  embeddings where the cases coincide).
- ``pearson`` maps the NaN of a zero-variance vector to 0.0
  (Intersections.java:161); ``cosine`` keeps Java's NaN for zero-norm
  input (SimilaritiesFunc delegates straight to Intersections.cosine).
- ``jaccard`` is MULTISET jaccard (duplicates count,
  SimilaritiesFunc.java "A jaccard implementation that supports
  duplicates"): intersection = Σ_v min(count1(v), count2(v)); union =
  len1 + len2 − intersection; nulls inside either vector are dropped
  first; comparison is on double value (1 == 1.0); empty ∪ empty → 1.0
  and a NULL vector column → 0.0 (both reference goldens).
- ``overlap`` is |distinct ∩| / min(len1, len2), 0.0 when the
  denominator is 0.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _vec(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def _num(v: Column | str) -> Column:
    """Numeric-kernel view: nulls inside the vector coerce to 0.0
    (SimilaritiesFunc.getDoubleValue maps null → 0 before Intersections —
    its own goldens: cosine([null,1,3],[1,null,2]) == cosine([0,1,3],[1,0,2]))."""
    return F.transform(_vec(v), lambda x: F.coalesce(x, F.lit(0.0)))


def _clean(c: Column) -> Column:
    """Drop nulls inside the vector (SimilaritiesFunc removeIf(IS_NULL) —
    the set/multiset kernels jaccard & overlap, unlike the numeric ones)."""
    return F.filter(c, lambda x: x.isNotNull())


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _sq_norm(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(v1: Column | str, v2: Column | str) -> Column:
    """``gds.similarity.cosine`` — dot(v1,v2) / √(‖v1‖²·‖v2‖²).

    Zero-norm input yields NaN (Java's 0/0), guarded behind a lazy CASE so
    ANSI mode (Spark 4 default) doesn't raise DIVIDE_BY_ZERO instead."""
    a, b = _num(v1), _num(v2)
    den = F.sqrt(_sq_norm(a) * _sq_norm(b))
    return (
        F.when(den == 0.0, F.lit(float("nan")))
        .otherwise(_dot(a, b) / den)
        .alias("cosine")
    )


def pearson(v1: Column | str, v2: Column | str) -> Column:
    """``gds.similarity.pearson`` — centered cosine; NaN (zero variance) → 0."""
    a, b = _num(v1), _num(v2)
    n = F.size(a).cast("double")
    ma, mb = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x) / n, \
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x) / n
    da = F.transform(a, lambda x: x - ma)
    db = F.transform(b, lambda x: x - mb)
    # zero variance → Java NaN → 0.0 (Intersections.java:161); the CASE is
    # lazy so ANSI mode never sees the /0 (NULL den = unequal lengths → NULL)
    den = F.sqrt(_sq_norm(da) * _sq_norm(db))
    return (
        F.when(den == 0.0, F.lit(0.0))
        .otherwise(_dot(da, db) / den)
        .alias("pearson")
    )


def euclidean_distance(v1: Column | str, v2: Column | str) -> Column:
    """``gds.similarity.euclideanDistance`` — √Σ(v1ᵢ−v2ᵢ)²."""
    a, b = _num(v1), _num(v2)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    ).alias("euclidean_distance")


def euclidean(v1: Column | str, v2: Column | str) -> Column:
    """``gds.similarity.euclidean`` — 1 / (1 + euclideanDistance)."""
    return (F.lit(1.0) / (F.lit(1.0) + euclidean_distance(v1, v2))).alias(
        "euclidean"
    )


def jaccard(v1: Column | str, v2: Column | str) -> Column:
    """``gds.similarity.jaccard`` — multiset Jaccard over double values."""
    a, b = _clean(_vec(v1)), _clean(_vec(v2))
    values = F.array_distinct(F.concat(a, b))
    inter = F.aggregate(
        values,
        F.lit(0),
        lambda acc, v: acc
        + F.least(
            F.size(F.filter(a, lambda x: x == v)),
            F.size(F.filter(b, lambda x: x == v)),
        ),
    ).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    # empty ∪ empty → 1.0, the reference's own golden
    # (SimilaritiesFuncTest.listsWithDuplicates last case); a NULL input
    # column → 0.0 (jaccardSimilarity's null guard)
    return (
        F.when(a.isNull() | b.isNull(), F.lit(0.0))
        .when(union == 0.0, F.lit(1.0))
        .otherwise(inter / union)
        .alias("jaccard")
    )


def overlap(v1: Column | str, v2: Column | str) -> Column:
    """``gds.similarity.overlap`` — |distinct ∩| / min(len1, len2).

    Denominator parity: the reference takes min over the null-cleaned list
    LENGTHS (duplicates included), while the intersection is a set
    (SimilaritiesFunc.java:98-119 — HashSet ∩, List.size() denominator).
    """
    a, b = _clean(_vec(v1)), _clean(_vec(v2))
    inter = F.size(F.array_intersect(a, b)).cast("double")
    denom = F.least(F.size(a), F.size(b)).cast("double")
    return (
        F.when(F.coalesce(denom, F.lit(0.0)) == 0.0, F.lit(0.0))
        .otherwise(inter / denom)
        .alias("overlap")
    )
