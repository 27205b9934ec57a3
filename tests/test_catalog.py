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


def _typed_catalog(spark, catalog):
    edges = spark.createDataFrame(
        [(0, 1, "CALLS", 1.0), (1, 2, "CALLS", 2.0), (2, 0, "IMPORTS", 3.0)],
        "src long, dst long, rel_type string, weight double")
    catalog.project("t", edges)
    return catalog


def test_stream_relationships_typed_and_filtered(spark, catalog):
    _typed_catalog(spark, catalog)
    got = {(r["src"], r["dst"], r["rel_type"])
           for r in catalog.stream_relationships("t").collect()}
    assert got == {(0, 1, "CALLS"), (1, 2, "CALLS"), (2, 0, "IMPORTS")}
    only = {r["rel_type"] for r in
            catalog.stream_relationships("t", ["IMPORTS"]).collect()}
    assert only == {"IMPORTS"}


def test_stream_relationships_untyped_gets_catchall(spark, catalog):
    catalog.project("u", edges_from_tuples(spark, [(0, 1)]))
    rows = catalog.stream_relationships("u").collect()
    assert [r["rel_type"] for r in rows] == ["__ALL__"]


def test_stream_relationship_properties_long_format(spark, catalog):
    _typed_catalog(spark, catalog)
    rows = catalog.stream_relationship_properties("t", ["weight"]).collect()
    assert len(rows) == 3
    assert {r["relationship_property"] for r in rows} == {"weight"}
    got = {(r["src"], r["dst"]): r["property_value"] for r in rows}
    assert got[(2, 0)] == 3.0
    with pytest.raises(KeyError):
        catalog.stream_relationship_properties("t", ["nope"])


def test_drop_relationships_type_and_last_type_guard(spark, catalog):
    _typed_catalog(spark, catalog)
    g = catalog.drop_relationships("t", "IMPORTS")
    assert g.edges.count() == 2
    assert {r["rel_type"] for r in g.edges.select("rel_type").collect()} == \
        {"CALLS"}
    with pytest.raises(ValueError):
        catalog.drop_relationships("t", "CALLS")  # last remaining type
    with pytest.raises(KeyError):
        catalog.drop_relationships("t", "IMPORTS")  # already gone


def test_write_relationships_parquet(spark, catalog, tmp_path):
    _typed_catalog(spark, catalog)
    path = str(tmp_path / "rels")
    catalog.write_relationships("t", path, rel_type="CALLS",
                                property="weight")
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert set(back.columns) == {"src", "dst", "weight"}


def test_mutate_and_write_node_label(spark, catalog, tmp_path):
    catalog.project("n", edges_from_tuples(spark, [(0, 1), (1, 2)]))
    g = catalog.mutate_node_label("n", "Hub", "node_id <= 1")
    got = {r["node_id"]: list(r["labels"]) for r in g.nodes.collect()}
    assert got == {0: ["Hub"], 1: ["Hub"], 2: []}
    # idempotent + second label unions
    catalog.mutate_node_label("n", "Hub", "node_id <= 1")
    g = catalog.mutate_node_label("n", "Big", "node_id = 0")
    got = {r["node_id"]: sorted(r["labels"]) for r in g.nodes.collect()}
    assert got == {0: ["Big", "Hub"], 1: ["Hub"], 2: []}
    path = str(tmp_path / "labels")
    catalog.write_node_label("n", path, "Hub", "node_id <= 1")
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert {r["label"] for r in back.collect()} == {"Hub"}


def test_graph_properties_lifecycle(spark, catalog):
    catalog.project("p", edges_from_tuples(spark, [(0, 1)]))
    catalog.set_graph_property("p", "sampleRatio", 0.25)
    catalog.set_graph_property("p", "origin", "rwr")
    rows = catalog.stream_graph_properties("p")
    assert rows == [{"propertyName": "origin", "propertyValue": "rwr"},
                    {"propertyName": "sampleRatio", "propertyValue": 0.25}]
    catalog.drop_graph_properties("p", ["origin"])
    assert catalog.stream_graph_properties("p") == [
        {"propertyName": "sampleRatio", "propertyValue": 0.25}]
    with pytest.raises(KeyError):
        catalog.drop_graph_properties("p", ["origin"])
    # drop(name) clears graph properties with the entry
    catalog.drop("p")
    catalog.project("p", edges_from_tuples(spark, [(0, 1)]))
    assert catalog.stream_graph_properties("p") == []


def test_memory_usage_admission(spark, catalog):
    catalog.project("mu", edges_from_tuples(spark, [(0, 1), (1, 2)]))
    got = catalog.memory_usage("mu")
    assert got["nodeCount"] == 3 and got["relationshipCount"] == 2
    assert got["totalBytes"] == got["nodeBytes"] + got["relationshipBytes"]
    assert got["nodeBytes"] > 0 and got["fitsExecutors"] is True
    # a graph that cannot fit a 1-byte executor is rejected
    assert catalog.memory_usage("mu", executor_memory_bytes=1)[
        "fitsExecutors"] is False


def test_list_progress_reads_manifests(spark, catalog, tmp_path):
    from graph_data_science_spark.graph import graph_from_edges
    from graph_data_science_spark.operators.pagerank import pagerank

    root = str(tmp_path / "runs")
    g = graph_from_edges(spark, edges_from_tuples(spark, [(0, 1), (1, 0)]))
    pagerank(g, max_iterations=3, checkpoint_dir=f"{root}/pr")
    rows = catalog.list_progress(root)
    assert len(rows) == 1
    assert rows[0]["manifest"]["algorithm"] == "pagerank"
    assert rows[0]["lastSuperstep"] is not None
    assert catalog.list_progress(str(tmp_path / "missing")) == []
