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
