"""Memory estimation surface — the ``.estimate`` mode analog.

Reference: memory-usage/.../MemoryEstimations.java + per-algorithm
``memoryEstimation()`` factories; e.g. WCC's published expectations
(algo/src/test/java/org/neo4j/gds/wcc/WccTest.java:229-250):
unseeded = 64 + 8·n bytes (one HugeLongArray of community ids), seeded/
incremental = 104 + 16·n (+ paging overhead above 2^28 elements).

Two estimators per algorithm:

- ``*_reference_bytes``: the reference's single-machine array model —
  reproduced exactly for the published WCC constants (the test asserts
  them) and to leading order (8–16 B/node) elsewhere. This is the
  apples-to-apples number for "would the reference fit this in RAM".
- ``*_spark_bytes``: THIS engine's model — per-superstep vertex-state rows
  (columnar, ~8 B per long/double column + ~20% Tungsten overhead) and
  shuffle volume per superstep. The admission-control story at 100 TB: an
  operator is runnable when per-partition state = state_bytes /
  shuffle_partitions fits executor memory, and the per-superstep shuffle is
  message_bytes — both linear functions a planner can check BEFORE running.
"""

from __future__ import annotations

_ROW_OVERHEAD = 1.2  # Tungsten/UnsafeRow ~20% over raw column widths


def _state(n_rows: int, n_cols: int) -> int:
    return int(n_rows * n_cols * 8 * _ROW_OVERHEAD)


def wcc_reference_bytes(node_count: int, seeded: bool = False) -> int:
    """Exact reproduction of Wcc.memoryEstimation (WccTest.java:229-250)
    below the paging threshold: 64 + 8n unseeded, 104 + 16n seeded."""
    if seeded:
        return 104 + 16 * node_count
    return 64 + 8 * node_count


def wcc_spark_bytes(node_count: int, edge_count: int) -> dict:
    return {
        "state_bytes": _state(node_count, 3),       # node_id, component, active
        "message_bytes_per_superstep": _state(edge_count, 2),
        "cached_edges_bytes": _state(2 * edge_count, 2),  # mirrored
    }


def pagerank_spark_bytes(node_count: int, edge_count: int,
                         weighted: bool = False) -> dict:
    return {
        "state_bytes": _state(node_count, 5),  # id, degree, rank, delta, active
        "message_bytes_per_superstep": _state(edge_count, 2),
        "cached_edges_bytes": _state(edge_count, 3 if weighted else 2),
    }


def label_propagation_spark_bytes(node_count: int, edge_count: int) -> dict:
    return {
        "state_bytes": _state(node_count, 4),
        # tally shuffle carries (node, label, weight) per edge
        "message_bytes_per_superstep": _state(edge_count, 3),
        "cached_edges_bytes": _state(edge_count, 3),
    }


def triangle_count_spark_bytes(node_count: int, edge_count: int,
                               max_degree_after_orientation: int | None = None
                               ) -> dict:
    # wedge volume bounds the shuffle: Σ C(out_deg, 2) ≤ E · max_out_deg / 2;
    # degree orientation caps out_deg at ~sqrt(2E)
    cap = max_degree_after_orientation or int((2 * edge_count) ** 0.5) + 1
    return {
        "cached_edges_bytes": _state(edge_count, 3),
        "wedge_shuffle_bytes_upper": _state(edge_count * cap // 2, 3),
    }


def louvain_spark_bytes(node_count: int, edge_count: int) -> dict:
    return {
        "state_bytes": _state(node_count, 2),
        "adjacency_bytes": _state(2 * edge_count, 3),
        "message_bytes_per_subround": _state(2 * edge_count, 3),
    }


def fits_executors(state_bytes: int, shuffle_partitions: int,
                   executor_memory_bytes: int, headroom: float = 0.5) -> bool:
    """Admission check: does the biggest per-partition slice of superstep
    state fit in one executor's usable memory?"""
    return state_bytes / max(1, shuffle_partitions) <= executor_memory_bytes * headroom


def pagerank_reference_bytes(node_count: int) -> int:
    """Reference Pregel PageRank estimate, anchored to the published doc
    example — 8 nodes / 14 rels → 696 bytes (doc/modules/ROOT/pages/
    algorithms/page-rank.adoc .estimate table; structure Pregel.java:91-108):
    496 B fixed object graph + 24 B/node (1 HugeDoubleArray node value +
    2 ReducingMessenger arrays) + one 8 B vote-bit word per 64 nodes."""
    import math
    return 496 + 24 * node_count + 8 * max(1, math.ceil(node_count / 64))


def bfs_spark_bytes(node_count: int, edge_count: int) -> dict:
    return {
        "state_bytes": _state(node_count, 3),       # id, dist, active
        "message_bytes_per_superstep": _state(edge_count, 2),
        "cached_edges_bytes": _state(edge_count, 2),
    }


def sssp_spark_bytes(node_count: int, edge_count: int) -> dict:
    return {
        "state_bytes": _state(node_count, 4),       # id, dist, pred, active
        "message_bytes_per_superstep": _state(edge_count, 3),
        "cached_edges_bytes": _state(edge_count, 3),
    }


def betweenness_spark_bytes(node_count: int, edge_count: int,
                            sources: int, diameter_hint: int = 20) -> dict:
    """MSBFS state is O(reached (source, node) pairs) — the inherent
    Brandes bound; ``sources`` caps it (sampling is the scale posture)."""
    pairs = sources * node_count
    return {
        "state_bytes_upper": _state(pairs, 4),      # s, v, dist, sigma
        "message_bytes_per_level_upper": _state(sources * edge_count, 3),
        "levels": diameter_hint,
    }


def fastrp_spark_bytes(node_count: int, edge_count: int,
                       embedding_dim: int) -> dict:
    return {
        "state_bytes": _state(node_count * embedding_dim, 3),  # long format
        "message_bytes_per_iteration": _state(edge_count * embedding_dim, 3),
        "cached_edges_bytes": _state(edge_count, 3),
    }


def node_similarity_spark_bytes(node_count: int, edge_count: int,
                                max_neighbor_frequency: int | None = None
                                ) -> dict:
    """Pair volume = Σ over shared neighbors of C(in_deg, 2); the hot-
    neighbor cap bounds in_deg — without it a single 10^6-degree hub emits
    10^12 pairs (why the cap defaults on at scale)."""
    cap = max_neighbor_frequency or int((2 * edge_count) ** 0.5) + 1
    return {
        "neighbor_sets_bytes": _state(edge_count, 2),
        "pair_shuffle_bytes_upper": _state(edge_count * cap // 2, 3),
    }


def knn_spark_bytes(node_count: int, dim: int, k: int,
                    method: str = "nn_descent") -> dict:
    if method == "exact":
        return {
            "tile_bytes": _state(node_count * dim, 1),
            "pair_compute": node_count * node_count,  # dot products, not bytes
        }
    return {
        "list_state_bytes": _state(node_count * k, 2),
        "candidates_per_round": node_count * k * k,
        "vector_join_bytes_per_round": _state(node_count * k * k * dim, 1),
    }


def kcore_spark_bytes(node_count: int, edge_count: int) -> dict:
    return {
        "state_bytes": _state(node_count, 3),
        "message_bytes_per_round": _state(2 * edge_count, 2),
        "cached_edges_bytes": _state(2 * edge_count, 2),
    }


def scc_spark_bytes(node_count: int, edge_count: int) -> dict:
    # forward + backward reach labels per round
    return {
        "state_bytes": _state(node_count, 4),
        "message_bytes_per_round": _state(2 * edge_count, 2),
        "cached_edges_bytes": _state(2 * edge_count, 2),
    }


def hits_spark_bytes(node_count: int, edge_count: int) -> dict:
    return {
        "state_bytes": _state(node_count, 3),       # id, hub, auth
        "message_bytes_per_iteration": _state(2 * edge_count, 2),
        "cached_edges_bytes": _state(edge_count, 2),
    }


def minhash_spark_bytes(doc_count: int, num_hashes: int, bands: int) -> dict:
    return {
        "signature_bytes": _state(doc_count * num_hashes, 2),
        "band_shuffle_bytes": _state(doc_count * bands, 3),
    }


_SPARK_ESTIMATORS = {
    "wcc": wcc_spark_bytes,
    "pagerank": pagerank_spark_bytes,
    "label_propagation": label_propagation_spark_bytes,
    "triangle_count": triangle_count_spark_bytes,
    "louvain": louvain_spark_bytes,
    "bfs": bfs_spark_bytes,
    "sssp": sssp_spark_bytes,
    "betweenness": betweenness_spark_bytes,
    "fastrp": fastrp_spark_bytes,
    "node_similarity": node_similarity_spark_bytes,
    "knn": knn_spark_bytes,
    "k_core": kcore_spark_bytes,
    "scc": scc_spark_bytes,
    "hits": hits_spark_bytes,
    "minhash": minhash_spark_bytes,
}


def estimate(algorithm: str, executor_memory_bytes: int | None = None,
             shuffle_partitions: int = 32, headroom: float = 0.6,
             **kwargs) -> dict:
    """Uniform ``.estimate`` dispatcher (the reference's one-per-proc
    ``*.estimate`` surface, model-catalog style): returns the Spark-engine
    byte model for ``algorithm``; reference single-machine models are
    included under ``reference_bytes`` where the reference publishes
    constants (WCC, PageRank).

    Pass ``executor_memory_bytes`` (+ ``shuffle_partitions``/``headroom``)
    to fold the ADMISSION CHECK into the result: ``fits_executors`` is True
    when the largest per-partition slice of the superstep state fits one
    executor — the go/no-go the reference's estimate-then-run flow gates on
    (memory-usage/MemoryEstimations.java → MemoryGuard)."""
    if algorithm not in _SPARK_ESTIMATORS:
        raise ValueError(
            f"no estimator for {algorithm!r}; have {sorted(_SPARK_ESTIMATORS)}")
    out = dict(_SPARK_ESTIMATORS[algorithm](**kwargs))
    if executor_memory_bytes is not None:
        state = max((v for k, v in out.items()
                     if isinstance(v, int) and "state" in k), default=0)
        out["fits_executors"] = fits_executors(
            state, shuffle_partitions, executor_memory_bytes, headroom)
    if algorithm == "wcc":
        out["reference_bytes"] = wcc_reference_bytes(kwargs["node_count"])
    elif algorithm == "pagerank":
        out["reference_bytes"] = pagerank_reference_bytes(kwargs["node_count"])
    return out
