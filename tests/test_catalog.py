"""Catalog lifecycle: project/aggregate/mutate + parquet & CSV round trips."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import GraphCatalog
from graph_data_science_spark.graph import UNDIRECTED, edges_from_tuples


@pytest.fixture()
def catalog(spark):
    return GraphCatalog(spark)


def test_project_aggregation_sum(spark, catalog):
    edges = edges_from_tuples(
        spark, [(0, 1, 2.0), (0, 1, 3.0), (1, 2, 1.0)], weighted=True)
    g = catalog.project("g", edges, aggregation="SUM")
    got = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert got == {(0, 1): 5.0, (1, 2): 1.0}
    assert catalog.exists("g")
    catalog.drop("g")
    assert not catalog.exists("g")


def test_project_undirected(spark, catalog):
    edges = edges_from_tuples(spark, [(0, 1)])
    g = catalog.project("u", edges, orientation=UNDIRECTED)
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == {(0, 1), (1, 0)}


def test_mutate_and_stream_properties(spark, catalog):
    edges = edges_from_tuples(spark, [(0, 1), (1, 2)])
    catalog.project("m", edges)
    vals = spark.createDataFrame([(0, 1.5), (1, 2.5), (2, 3.5)],
                                 "node_id long, score double")
    catalog.mutate("m", vals, "score")
    got = {r["node_id"]: r["score"]
           for r in catalog.stream_node_properties("m", ["score"]).collect()}
    assert got == {0: 1.5, 1: 2.5, 2: 3.5}
    catalog.drop_node_properties("m", ["score"])
    assert "score" not in catalog.get("m").nodes.columns


def test_csv_round_trip(spark, catalog, tmp_path):
    edges = edges_from_tuples(spark, [(0, 1, 2.5), (1, 2, 0.5)], weighted=True)
    nodes = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")],
                                  "node_id long, name string")
    catalog.project("c", edges, nodes)
    catalog.write_csv("c", str(tmp_path / "exp"))
    g2 = catalog.read_csv("c2", str(tmp_path / "exp"))
    assert g2.nodes.schema == catalog.get("c").nodes.schema
    assert sorted(map(tuple, g2.edges.collect())) == sorted(
        map(tuple, catalog.get("c").edges.collect()))


def test_parquet_round_trip(spark, catalog, tmp_path):
    edges = edges_from_tuples(spark, [(7, 8)])
    catalog.project("p", edges)
    catalog.write_parquet("p", str(tmp_path / "pq"))
    g2 = catalog.read_parquet("p2", str(tmp_path / "pq"))
    assert sorted(map(tuple, g2.edges.collect())) == [(7, 8)]


def test_project_sql(spark, catalog):
    spark.createDataFrame([(0, 1), (1, 2)], "a long, b long").createOrReplaceTempView("raw")
    g = catalog.project_sql(
        "s",
        "SELECT DISTINCT a AS node_id FROM raw UNION SELECT b FROM raw",
        "SELECT a AS src, b AS dst FROM raw",
    )
    assert g.edges.count() == 2


def test_list_detail_degree_distribution(spark, catalog):
    # out-degrees: 0→3, 1→1, 2→0 (isolated target still counts as a node)
    edges = edges_from_tuples(spark, [(0, 1), (0, 2), (0, 0), (1, 2)])
    catalog.project("d", edges)
    info = catalog.list_detail("d", exact=True)
    assert info["graphName"] == "d"
    assert info["nodeCount"] == 3 and info["relationshipCount"] == 4
    dist = info["degreeDistribution"]
    assert dist["n"] == 3
    assert dist["min_score"] == 0.0 and dist["max_score"] == 3.0
    assert dist["p50"] == 1.0
    # approx mode: same keys, counts still exact
    sketch = catalog.list_detail("d")["degreeDistribution"]
    assert sketch.keys() == dist.keys()
    assert sketch["n"] == 3
