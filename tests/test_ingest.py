"""F0 end-to-end: synthesize source-repo table → parse imports → link graph
→ PageRank — the full ingest slice with the sha256 per-row invariant."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph import graph_from_edges
from graph_data_science_spark.operators.pagerank import pagerank
from graph_data_science_spark.sources.edge_extraction import build_link_graph
from graph_data_science_spark.sources.repo_source import (
    file_key,
    synthesize_repo_table,
    verify_content_sha,
)
from tests.fixtures import F1_EDGES, F1_EXPECTED


@pytest.fixture(scope="module")
def repo_table(spark):
    edges = spark.createDataFrame(F1_EDGES, "src long, dst long")
    return synthesize_repo_table(spark, edges, n_files=11).persist()


def test_sha256_invariant(spark, repo_table):
    recorded = repo_table.select("repo", "path", "commit", "content_sha256")
    source = repo_table.drop("content_sha256")
    assert verify_content_sha(source, recorded) == 0
    # and a tampered row is caught
    tampered = source.withColumn(
        "content",
        F.when(F.col("path") == "src/m0.py", F.concat(F.col("content"), F.lit("x")))
        .otherwise(F.col("content")),
    )
    assert verify_content_sha(tampered, recorded) == 1


def test_extracted_edges_match_planted(spark, repo_table):
    id_map, nodes, edges = build_link_graph(repo_table.drop("content_sha256"))
    key_to_id = {r["orig_key"]: r["node_id"] for r in id_map.collect()}
    file_to_node = {i: key_to_id[file_key(i)] for i in range(11)}
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    want = {(file_to_node[a], file_to_node[b]) for a, b in F1_EDGES}
    assert got == want


def test_ingest_to_pagerank_end_to_end(spark, repo_table):
    id_map, nodes, edges = build_link_graph(repo_table.drop("content_sha256"))
    g = graph_from_edges(spark, edges, nodes.select("node_id"))
    res = pagerank(g, tolerance=0.0, max_iterations=41)
    scores = {r["node_id"]: r["score"] for r in res.scores.collect()}
    key_to_id = {r["orig_key"]: r["node_id"] for r in id_map.collect()}
    for i, want in F1_EXPECTED.items():
        assert scores[key_to_id[file_key(i)]] == pytest.approx(want, abs=1e-5)


def test_repo_granularity(spark, repo_table):
    # 11 files / 16-per-repo → single repo, self-edges dropped → empty
    id_map, nodes, edges = build_link_graph(
        repo_table.drop("content_sha256"), granularity="repo")
    assert edges.count() == 0
    assert nodes.count() == 1
