"""gds.util.* parity (IsFiniteFunc / AsNodeFunc / NodePropertyFunc)."""

import math

from pyspark.sql import functions as F

from graph_data_science_spark.functions.util import (
    as_node,
    as_nodes,
    infinity,
    is_finite,
    is_infinite,
    nan,
    node_property,
    version,
)
from graph_data_science_spark.graph import Graph


def _graph(spark):
    nodes = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
        ["node_id", "name", "score"])
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    return Graph(nodes=nodes, edges=edges)


def test_is_finite_reference_semantics(spark):
    """IsFiniteFunc.java:29-37: isFinite false for NULL/NaN/±Inf;
    isInfinite is its EXACT complement (NULL -> true)."""
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("inf")), (3, float("-inf")),
         (4, float("nan")), (5, None)],
        "id long, v double")
    rows = {r["id"]: (r["f"], r["i"]) for r in df.select(
        "id", is_finite("v").alias("f"), is_infinite("v").alias("i")
    ).collect()}
    assert rows == {1: (True, False), 2: (False, True), 3: (False, True),
                    4: (False, True), 5: (False, True)}


def test_constants(spark):
    r = spark.range(1).select(infinity().alias("inf"), nan().alias("nan")) \
        .first()
    assert r["inf"] == float("inf") and math.isnan(r["nan"])
    assert isinstance(version(), str) and version()


def test_as_node_attaches_row_or_null(spark):
    g = _graph(spark)
    df = spark.createDataFrame([(1,), (99,)], ["node_id"])
    out = {r["node_id"]: (r["node_name"], r["node_score"])
           for r in as_node(g, df).collect()}
    assert out[1] == ("a", 1.5)
    assert out[99] == (None, None)   # 'null if none exists'


def test_as_nodes_ordered_and_drops_missing(spark):
    g = _graph(spark)
    df = spark.createDataFrame(
        [(10, [3, 1, 99]), (11, [])], "id long, ids array<long>")
    out = {r["id"]: r["nodes"] for r in as_nodes(g, df, "ids").collect()}
    assert [n["node_id"] for n in out[10]] == [3, 1]   # order kept, 99 gone
    assert [n["name"] for n in out[10]] == ["c", "a"]
    assert out[11] == []                               # 'empty list'


def test_node_property(spark):
    g = _graph(spark)
    assert node_property(g, 2, "score") == 2.5
    assert node_property(g, 99, "score") is None
    try:
        node_property(g, 1, "nope")
        assert False
    except ValueError:
        pass


def test_as_nodes_preserves_row_multiplicity(spark):
    """Reference asNodes is strictly per-row: duplicate payload rows must
    stay duplicates, and a df whose ONLY column is ids_col must still
    yield one output row per input row (regression: payload-column
    groupBy collapsed both cases)."""
    g = _graph(spark)
    dup = spark.createDataFrame(
        [(10, [1]), (10, [1]), (10, [2])], "id long, ids array<long>")
    rows = as_nodes(g, dup, "ids").collect()
    assert len(rows) == 3
    got = sorted((r["id"], tuple(n["node_id"] for n in r["nodes"]))
                 for r in rows)
    assert got == [(10, (1,)), (10, (1,)), (10, (2,))]

    only = spark.createDataFrame([([1],), ([2, 3],), ([1],)],
                                 "ids array<long>")
    out = sorted(tuple(n["node_id"] for n in r["nodes"])
                 for r in as_nodes(g, only, "ids").collect())
    assert out == [(1,), (1,), (2, 3)]
