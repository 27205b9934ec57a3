"""gds.similarity.* Column functions vs the reference's own goldens.

Every expected value below is lifted from
algo/src/test/java/.../SimilaritiesFuncTest.java so the Spark expressions
reproduce the @UserFunction semantics bit-for-bit (incl. null handling:
numeric kernels coerce in-vector nulls to 0.0, set kernels drop them).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.functions import (
    cosine,
    euclidean,
    euclidean_distance,
    jaccard,
    overlap,
    pearson,
)


def _one(spark, fn, v1, v2):
    df = spark.createDataFrame(
        [(v1, v2)], "v1 array<double>, v2 array<double>")
    return df.select(fn("v1", "v2").alias("x")).collect()[0]["x"]


def test_cosine_opposite_directions(spark):
    assert _one(spark, cosine, [1.0, 1.0], [-1.0, -1.0]) == pytest.approx(-1.0)


def test_cosine_with_nulls(spark):
    # getDoubleValue(null) -> 0: cosine([0,1,3],[1,0,2]) = 6/sqrt(50)
    got = _one(spark, cosine, [None, 1.0, 3.0], [1.0, None, 2.0])
    assert got == pytest.approx(0.8485, abs=1e-3)


def test_euclidean_with_nulls(spark):
    d = _one(spark, euclidean_distance, [None, 1.0, 3.0], [1.0, None, 2.0])
    assert d == pytest.approx(math.sqrt(3), abs=1e-3)
    s = _one(spark, euclidean, [None, 1.0, 3.0], [1.0, None, 2.0])
    assert s == pytest.approx(0.3660, abs=1e-3)


def test_pearson_with_nulls_and_zero_variance(spark):
    got = _one(spark, pearson, [None, 1.0, 3.0], [1.0, None, 2.0])
    assert got == pytest.approx(0.6546, abs=1e-3)
    # zero variance -> NaN in the ratio -> 0.0 (Intersections.java:161)
    assert _one(spark, pearson, [2.0, 2.0], [1.0, 3.0]) == 0.0


JACCARD_GOLDENS = [
    ([1.0, 1.0], [1.0, 2.0], 1 / 3),
    ([1.0, 1.0, 2.0], [1.0, 3.0, 3.0], 1 / 5),
    ([1.0, 2.0], [2.0, 1.0], 1.0),
    ([16605.0, 16605.0, 16605.0, 150672.0],
     [16605.0, 16605.0, 150672.0, 16605.0], 1.0),
    ([4159.0, 4159.0, 4159.0, 4159.0],
     [4159.0, 4159.0, 4159.0, 1337.0], 3 / 5),
    ([4159.0, 1337.0, 1337.0, 1337.0],
     [1337.0, 4159.0, 4159.0, 4159.0], 2 / 6),
    ([1.0, 2.0, 2.0], [2.0, 2.0, 3.0], 2 / 4),
    ([None, 2.0, 2.0], [2.0, 2.0, None, None], 1.0),
    ([], [], 1.0),
    ([None, 1.0, 3.0], [1.0, None, 2.0], 1 / 3),
]


@pytest.mark.parametrize("v1,v2,want", JACCARD_GOLDENS)
def test_jaccard_multiset_goldens(spark, v1, v2, want):
    assert _one(spark, jaccard, v1, v2) == pytest.approx(want)


def test_jaccard_null_column_is_zero(spark):
    df = spark.createDataFrame(
        [([1.0], None)], "v1 array<double>, v2 array<double>")
    assert df.select(jaccard("v1", "v2").alias("x")).collect()[0]["x"] == 0.0


def test_overlap_with_nulls_and_duplicate_denominator(spark):
    # reference golden: [null,1,3] vs [1,null,2] -> |{1}| / min(2,2) = 0.5
    assert _one(spark, overlap, [None, 1.0, 3.0], [1.0, None, 2.0]) == 0.5
    # denominator is the LIST length (duplicates), intersection is a set
    assert _one(spark, overlap, [1.0, 1.0, 2.0], [1.0, 2.0, 3.0]) == \
        pytest.approx(2 / 3)
    assert _one(spark, overlap, [], [1.0]) == 0.0


def test_functions_are_codegen_expressions(spark):
    """No Python UDF in the plan — the whole point of the Column surface."""
    df = spark.createDataFrame(
        [([1.0, 2.0], [2.0, 1.0])], "v1 array<double>, v2 array<double>")
    plan = df.select(
        cosine("v1", "v2"), pearson("v1", "v2"), jaccard("v1", "v2"),
        overlap("v1", "v2"), euclidean("v1", "v2"),
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_one_hot_encoding_reference_null_semantics(spark):
    """OneHotEncodingFunc.java:38-52 — null available → []; null selected
    → zeros; else membership indicator per index."""
    from graph_data_science_spark.functions import one_hot_encoding

    df = spark.createDataFrame(
        [(0, ["a", "b", "c"], ["b"]),
         (1, ["a", "b", "c"], None),
         (2, None, ["a"]),
         (3, ["a", "b"], ["a", "b", "z"]),
         (4, ["a", "a", "b"], ["a"])],          # duplicate available values
        "id long, av array<string>, sel array<string>")
    out = {r["id"]: r["oh"] for r in df.select(
        "id", one_hot_encoding(F.col("av"), F.col("sel")).alias("oh")
    ).collect()}
    assert out == {0: [0, 1, 0], 1: [0, 0, 0], 2: [],
                   3: [1, 1], 4: [1, 1, 0]}
