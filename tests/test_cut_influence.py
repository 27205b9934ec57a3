"""maxkcut, hashgnn, CELF influence maximization."""

from graph_data_science_spark.graph import edges_from_tuples, graph_from_edges
from graph_data_science_spark.operators.cut import maxkcut
from graph_data_science_spark.operators.embeddings import hashgnn
from graph_data_science_spark.operators.influence import (
    influence_maximization_celf,
)
from tests.conftest import rows_to_dict


def test_maxkcut_star_isolates_hub(spark):
    # star 0-(1..4): the optimal 2-cut puts the hub alone (cut = 4);
    # strict-improvement single moves reach it from the node%2 init
    edges = edges_from_tuples(
        spark, [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (0, 4, 1.0)],
        weighted=True)
    g = graph_from_edges(spark, edges)
    res = maxkcut(g, k=2, max_iterations=6)
    got = rows_to_dict(res.assignment, "node_id", "community")
    assert got[1] == got[2] == got[3] == got[4]
    assert got[0] != got[1]
    assert res.cut_weight == 4.0
    assert res.converged


def test_hashgnn_deterministic_and_neighbor_sensitive(spark):
    edges = edges_from_tuples(
        spark, [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2)])
    g = graph_from_edges(spark, edges)
    a = sorted((r["node_id"], r["slot"], r["feature"])
               for r in hashgnn(g, seed=9).collect())
    b = sorted((r["node_id"], r["slot"], r["feature"])
               for r in hashgnn(g, seed=9).collect())
    assert a == b and len(a) > 0
    per_node = {}
    for n, s, f in a:
        per_node.setdefault(n, {})[s] = f
    # every node fills every slot
    assert all(len(v) == 8 for v in per_node.values())


def test_celf_picks_high_influence_seed_first(spark):
    # star: 0 → 1..9 plus an isolated tail 20→21 — node 0 dominates
    edges = edges_from_tuples(
        spark, [(0, i) for i in range(1, 10)] + [(20, 21)])
    g = graph_from_edges(spark, edges)
    res = influence_maximization_celf(
        g, k=2, propagation_probability=0.9,
        monte_carlo_simulations=4, candidate_pool=5).collect()
    ranked = sorted((r["rank"], r["node_id"], r["spread"]) for r in res)
    assert ranked[0][1] == 0          # hub chosen first
    assert ranked[0][2] > 5           # activates most of the star
    assert ranked[1][2] >= ranked[0][2]  # spread monotone in seed set


def test_celf_argmax_is_distributed(spark, monkeypatch):
    # the greedy round's argmax must reach the driver as ONE row per round
    # (TakeOrderedAndProject after the taken anti-join), never a full
    # per-candidate gains collect — the 10^8-node-pool scale hazard the
    # round-4 review flagged. Spy on DataFrame.collect: the largest batch
    # any call returns during CELF must be 1 row.
    # patch the concrete class — pyspark.sql.DataFrame is the dispatch
    # facade on this Spark build and instance calls don't route through it
    from pyspark.sql.classic.dataframe import DataFrame

    sizes = []
    orig = DataFrame.collect

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy)
    edges = edges_from_tuples(
        spark, [(0, i) for i in range(1, 10)] + [(20, 21), (21, 22)])
    g = graph_from_edges(spark, edges)
    res = influence_maximization_celf(
        g, k=3, propagation_probability=0.9,
        monte_carlo_simulations=4, candidate_pool=6)
    monkeypatch.setattr(DataFrame, "collect", orig)
    assert res.count() == 3
    assert sizes and max(sizes) <= 1
