"""SCC — trim + coloring + backward sweep."""

from graph_data_science_spark.graph import edges_from_tuples, graph_from_edges
from graph_data_science_spark.operators.scc import scc
from tests.conftest import rows_to_dict


def test_scc_two_cycles_and_bridge(spark):
    # cycle {0,1,2}, cycle {3,4}, bridge 2→3, tail 4→5
    edges = edges_from_tuples(
        spark, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3), (4, 5)])
    g = graph_from_edges(spark, edges)
    got = rows_to_dict(scc(g), "node_id", "component")
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3
    assert got[5] == 5


def test_scc_dag_is_all_singletons(spark):
    edges = edges_from_tuples(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    g = graph_from_edges(spark, edges)
    got = rows_to_dict(scc(g), "node_id", "component")
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_scc_nested_chain_of_cycles(spark):
    # three 2-cycles chained: {0,1} -> {2,3} -> {4,5}
    edges = edges_from_tuples(
        spark, [(0, 1), (1, 0), (2, 3), (3, 2), (4, 5), (5, 4),
                (1, 2), (3, 4)])
    g = graph_from_edges(spark, edges)
    got = rows_to_dict(scc(g), "node_id", "component")
    assert got[0] == got[1] == 0
    assert got[2] == got[3] == 2
    assert got[4] == got[5] == 4
