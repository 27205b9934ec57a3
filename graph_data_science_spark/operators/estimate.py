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


#: nominal per-value widths for schema-driven table sizing (bytes).
#: variable-width types get the planning-time nominal the reference's
#: MemoryUsage.java uses for its own unknowable fields.
_TYPE_WIDTH = {
    "byte": 1, "short": 2, "integer": 4, "long": 8, "float": 4,
    "double": 8, "boolean": 1, "date": 4, "timestamp": 8,
    "timestamp_ntz": 8, "string": 24,
}


def table_bytes(n_rows: int, schema) -> int:
    """Estimated in-memory bytes of a DataFrame: Σ field widths ×
    rows × Tungsten row overhead. Containers (array/map/struct) count a
    nominal 64 B — the admission check wants the right ORDER, not the
    allocator's truth (same posture as the reference's MemoryEstimations
    RANGE results)."""
    width = sum(
        _TYPE_WIDTH.get(f.dataType.typeName(), 64) for f in schema.fields)
    return int(n_rows * width * _ROW_OVERHEAD)


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


def degree_spark_bytes(node_count: int, edge_count: int) -> dict:
    return {
        "state_bytes": _state(node_count, 2),
        "shuffle_bytes": _state(edge_count, 2),  # one partial-agg pass
    }


def msbfs_spark_bytes(node_count: int, edge_count: int,
                      sources: int | None = None,
                      diameter_hint: int = 20) -> dict:
    """Closeness / harmonic / allShortestPaths: lane-column MSBFS — state is
    O(reached (source, node) pairs), the inherent all-pairs bound."""
    s = sources or node_count
    return {
        "state_bytes_upper": _state(s * node_count, 3),  # s, v, dist
        "message_bytes_per_level_upper": _state(s * edge_count, 2),
        "levels": diameter_hint,
    }


def celf_spark_bytes(node_count: int, edge_count: int, seed_set_size: int = 3,
                     mc_rounds: int = 8, candidate_pool: int = 64) -> dict:
    return {
        "cascade_state_bytes": _state(mc_rounds * node_count, 3),  # lane BFS
        "message_bytes_per_level": _state(mc_rounds * edge_count, 2),
        "driver_rows_per_rank": candidate_pool,  # only gains reach the driver
    }


def community_metrics_spark_bytes(node_count: int, edge_count: int) -> dict:
    """modularity / conductance: two E-sized partial-agg passes."""
    return {
        "state_bytes": _state(node_count, 2),
        "shuffle_bytes": _state(edge_count, 3),
    }


def coloring_spark_bytes(node_count: int, edge_count: int) -> dict:
    """k1coloring / maxkcut: per-round conflict-resolution messages."""
    return {
        "state_bytes": _state(node_count, 3),
        "message_bytes_per_round": _state(2 * edge_count, 2),
        "cached_edges_bytes": _state(2 * edge_count, 2),
    }


def kmeans_spark_bytes(vector_count: int, dim: int, k: int) -> dict:
    return {
        "state_bytes": _state(vector_count, dim + 1),
        "centroid_broadcast_bytes": int(k * dim * 8),  # per iteration
        "partial_agg_bytes": _state(k, dim + 1),       # map-side combined
    }


def hll_spark_bytes(group_count: int, p: int = 9) -> dict:
    """HLL sketches (operators/sketches.py): state is group_count · 2^p
    registers MAX — the whole point is that it does not grow with rows."""
    return {
        "state_bytes_upper": _state(group_count * (1 << p), 3),
        "merge_shuffle_bytes_upper": _state(group_count * (1 << p), 3),
    }


def histogram_spark_bytes(group_count: int, bins: int = 64) -> dict:
    return {
        "state_bytes_upper": _state(group_count * bins, 3),
        "quantile_window_rows": group_count * bins,
    }


def pq_spark_bytes(vector_count: int, dim: int, m: int = 4,
                   k: int = 16, n_queries: int = 1) -> dict:
    """Product quantization (operators/pq.py): training state is the
    long-format sample, codes are m small ints per vector (the compression
    that makes 10^9-vector ANN scannable), ADC tables are Q·m·k doubles."""
    sub_dim = max(1, dim // m)
    return {
        "state_bytes": _state(vector_count, m + 1),      # codes table
        "codebook_broadcast_bytes": int(m * k * sub_dim * 8),
        "adc_table_bytes": int(n_queries * m * k * 8),
        "adc_scan_rows": int(vector_count * m),          # explode factor
    }


def hashgnn_spark_bytes(node_count: int, edge_count: int,
                        embedding_bits: int = 64, iterations: int = 2) -> dict:
    words = max(1, embedding_bits // 64)
    return {
        "state_bytes": _state(node_count, words + 1),
        "message_bytes_per_iteration": _state(edge_count, words + 1),
        "iterations": iterations,
    }


def graphsage_spark_bytes(node_count: int, edge_count: int, dim: int,
                          layers: int = 2) -> dict:
    return {
        "feature_state_bytes": _state(node_count, dim + 1),
        "gather_bytes_per_layer": _state(edge_count, dim + 1),
        "layers": layers,
    }


def random_walks_spark_bytes(node_count: int, edge_count: int,
                             walks_per_node: int = 2,
                             walk_length: int = 4) -> dict:
    return {
        "walk_state_bytes": _state(node_count * walks_per_node, walk_length + 2),
        "message_bytes_per_step": _state(node_count * walks_per_node, 3),
        "cached_edges_bytes": _state(edge_count, 3),
    }


def leiden_spark_bytes(node_count: int, edge_count: int) -> dict:
    out = dict(louvain_spark_bytes(node_count, edge_count))
    # γ/θ refinement adds a WCC pass per level over intra-community edges
    out["refinement_bytes_per_level"] = _state(node_count, 3)
    return out


def dijkstra_spark_bytes(node_count: int, edge_count: int) -> dict:
    out = dict(sssp_spark_bytes(node_count, edge_count))
    # path reconstruction: predecessor chain walk, one row per path node
    out["path_bytes_upper"] = _state(node_count, 2)
    return out


def spanning_tree_spark_bytes(node_count: int, edge_count: int) -> dict:
    """Borůvka: O(log n) rounds of min-edge selection + component merge."""
    import math
    return {
        "state_bytes": _state(node_count, 3),
        "message_bytes_per_round": _state(2 * edge_count, 3),
        "rounds_upper": max(1, math.ceil(math.log2(max(2, node_count)))),
    }


def collapse_path_spark_bytes(node_count: int, edge_count: int,
                              length: int = 2) -> dict:
    """k-hop self-join: output ≤ E · avg_deg^(k-1); degree cap bounds it."""
    avg_deg = max(1.0, edge_count / max(1, node_count))
    return {
        "cached_edges_bytes": _state(edge_count, 2),
        "output_bytes_upper": int(_state(edge_count, 2) * avg_deg ** (length - 1)),
    }


def scale_properties_spark_bytes(row_count: int, n_props: int = 1) -> dict:
    return {
        "state_bytes": _state(row_count, n_props + 1),
        "stats_broadcast_bytes": int(n_props * 6 * 8),  # min/max/mean/std/p50...
    }


def text_scan_spark_bytes(doc_count: int, avg_doc_bytes: int = 4096) -> dict:
    """token_count / quality_score / language_id / fingerprint: one linear
    scan, no shuffle of document bodies (aggregates only)."""
    return {
        "scan_bytes": int(doc_count * avg_doc_bytes),
        "state_bytes": _state(doc_count, 3),
    }


def exact_dedup_spark_bytes(doc_count: int) -> dict:
    return {
        "state_bytes": _state(doc_count, 2),       # (hash, doc_id)
        "shuffle_bytes": _state(doc_count, 2),
    }


def simhash_spark_bytes(doc_count: int, avg_doc_bytes: int = 4096,
                        bits: int = 64) -> dict:
    return {
        "scan_bytes": int(doc_count * avg_doc_bytes),
        "state_bytes": _state(doc_count, max(1, bits // 64) + 1),
    }


def ngram_jaccard_spark_bytes(doc_count: int, avg_shingles: int = 64,
                              hot_shingle_cap: int | None = None) -> dict:
    cap = hot_shingle_cap or int((doc_count * avg_shingles) ** 0.5) + 1
    return {
        "shingle_bytes": _state(doc_count * avg_shingles, 2),
        "pair_shuffle_bytes_upper": _state(doc_count * avg_shingles * cap // 2, 3),
    }


def cosine_topk_spark_bytes(vector_count: int, dim: int, k: int,
                            tile: int = 4096) -> dict:
    """Tiled GEMM: executor-resident tile pairs, partial top-k per tile."""
    return {
        "tile_bytes": int(tile * dim * 8 * 2),     # one tile pair in memory
        "partial_topk_bytes": _state(vector_count * k, 3),
        "pair_compute": vector_count * vector_count,  # dots, not bytes
    }


def cosine_topk_ivf_spark_bytes(vector_count: int, dim: int, k: int,
                                n_clusters: int = 256,
                                n_probe: int = 8) -> dict:
    per_bucket = max(1, vector_count // max(1, n_clusters))
    return {
        "centroid_broadcast_bytes": int(n_clusters * dim * 8),
        "probe_join_bytes": _state(vector_count * n_probe, dim + 2),
        "pair_compute": vector_count * n_probe * per_bucket,
    }


def near_dup_clusters_spark_bytes(doc_count: int, num_hashes: int = 8,
                                  bands: int = 4,
                                  avg_pairs_per_doc: float = 1.0) -> dict:
    """MinHash signatures + banded LSH pair-gen + WCC over the pair graph
    (operators/pipeline_ops.py:near_duplicate_clusters). In the near-dup
    regime the pair graph is sparse — ``avg_pairs_per_doc`` edges per doc —
    so WCC state is per-doc, never per-pair-squared."""
    mh = minhash_spark_bytes(doc_count, num_hashes, bands)
    pair_edges = int(doc_count * avg_pairs_per_doc)
    wcc = wcc_spark_bytes(doc_count, pair_edges)
    return {
        "signature_bytes": mh["signature_bytes"],
        "band_shuffle_bytes": mh["band_shuffle_bytes"],
        "wcc_state_bytes": wcc["state_bytes"],
        "wcc_message_bytes_per_superstep": wcc["message_bytes_per_superstep"],
        "state_bytes": mh["signature_bytes"] + wcc["state_bytes"],
    }


def corpus_vocabulary_spark_bytes(doc_count: int, avg_tokens: int = 512,
                                  vocab_size: int = 1_000_000) -> dict:
    """Two partial-aggregatable groupBys over exploded tokens
    (pipeline_ops.py:corpus_vocabulary): the shuffle carries one
    (token, partial-count) row per distinct token per map partition —
    vocab-sized, not occurrence-sized."""
    return {
        "token_scan_bytes": _state(doc_count * avg_tokens, 2),
        "shuffle_bytes": _state(vocab_size, 3),
        "state_bytes": _state(vocab_size, 3),
    }


def tfidf_spark_bytes(doc_count: int, avg_tokens: int = 512,
                      vocab_size: int = 1_000_000, k: int = 5) -> dict:
    """tf groupBy (occurrence-sized shuffle, partial-agg combined) + a
    broadcast of the df table + per-doc top-k (pipeline_ops.py:
    tf_idf_top_terms)."""
    return {
        "tf_shuffle_bytes": _state(doc_count * avg_tokens, 3),
        "df_broadcast_bytes": _state(vocab_size, 2),
        "state_bytes": _state(doc_count * k, 3),
    }


def decontaminate_spark_bytes(train_doc_count: int,
                              eval_doc_count: int = 1000,
                              avg_shingles: int = 64) -> dict:
    """Broadcast semi-join of train shingles against the (small) eval-set
    shingle table (pipeline_ops.py:decontaminate); admission hinges on the
    broadcast side fitting one executor, never on the train side."""
    return {
        "train_shingle_scan_bytes": _state(train_doc_count * avg_shingles, 2),
        "eval_broadcast_bytes": _state(eval_doc_count * avg_shingles, 1),
        "state_bytes": _state(train_doc_count, 2),
    }


def sessionize_spark_bytes(event_count: int, user_count: int) -> dict:
    return {
        "state_bytes": _state(user_count, 4),  # open session per key (bounded)
        "shuffle_bytes": _state(event_count, 3),
    }


def windowed_counts_spark_bytes(event_count: int, windows: int,
                                keys: int) -> dict:
    return {
        "state_bytes": _state(windows * keys, 3),
        "shuffle_bytes": _state(event_count, 2),  # map-side pre-aggregated
    }


_SPARK_ESTIMATORS = {
    "wcc": wcc_spark_bytes,
    "pagerank": pagerank_spark_bytes,
    "article_rank": pagerank_spark_bytes,     # same delta-push state/shuffle
    "eigenvector": pagerank_spark_bytes,
    "label_propagation": label_propagation_spark_bytes,
    "triangle_count": triangle_count_spark_bytes,
    "louvain": louvain_spark_bytes,
    "modularity_optimization": louvain_spark_bytes,
    "leiden": leiden_spark_bytes,
    "bfs": bfs_spark_bytes,
    "dfs": bfs_spark_bytes,                   # same frontier state shape
    "sssp": sssp_spark_bytes,
    "dijkstra": dijkstra_spark_bytes,
    "astar": dijkstra_spark_bytes,
    "yens": dijkstra_spark_bytes,             # K sequential dijkstra passes
    "dag_levels": bfs_spark_bytes,
    "dag_longest_path": sssp_spark_bytes,     # max-plus relaxation, same state
    "betweenness": betweenness_spark_bytes,
    "closeness": msbfs_spark_bytes,
    "harmonic": msbfs_spark_bytes,
    "all_shortest_paths": msbfs_spark_bytes,
    "celf": celf_spark_bytes,
    "degree": degree_spark_bytes,
    "modularity": community_metrics_spark_bytes,
    "conductance": community_metrics_spark_bytes,
    "k1coloring": coloring_spark_bytes,
    "maxkcut": coloring_spark_bytes,
    "kmeans": kmeans_spark_bytes,
    "pq": pq_spark_bytes,
    "hll": hll_spark_bytes,
    "histogram": histogram_spark_bytes,
    "hashgnn": hashgnn_spark_bytes,
    "graphsage": graphsage_spark_bytes,
    "fastrp": fastrp_spark_bytes,
    "random_walks": random_walks_spark_bytes,
    "node2vec": random_walks_spark_bytes,     # walks dominate; SGNS is O(n·d)
    "node_similarity": node_similarity_spark_bytes,
    "knn": knn_spark_bytes,
    "k_core": kcore_spark_bytes,
    "scc": scc_spark_bytes,
    "hits": hits_spark_bytes,
    "minhash": minhash_spark_bytes,
    "spanning_tree": spanning_tree_spark_bytes,
    "collapse_path": collapse_path_spark_bytes,
    "scale_properties": scale_properties_spark_bytes,
    "text_scan": text_scan_spark_bytes,
    "exact_dedup": exact_dedup_spark_bytes,
    "simhash": simhash_spark_bytes,
    "ngram_jaccard": ngram_jaccard_spark_bytes,
    "cosine_topk": cosine_topk_spark_bytes,
    "cosine_topk_ivf": cosine_topk_ivf_spark_bytes,
    "sessionize": sessionize_spark_bytes,
    "windowed_counts": windowed_counts_spark_bytes,
    "near_dup_clusters": near_dup_clusters_spark_bytes,
    "corpus_vocabulary": corpus_vocabulary_spark_bytes,
    "tfidf": tfidf_spark_bytes,
    "decontaminate": decontaminate_spark_bytes,
}

#: every __spark_entry__.queries() key → its estimator family; the breadth
#: contract the reference meets with one memoryEstimation() per proc
#: (memory-usage/.../MemoryEstimations.java) — tested for full coverage
ESTIMATOR_FOR_QUERY = {
    "pagerank": "pagerank", "pagerank_weighted": "pagerank",
    "article_rank": "article_rank", "eigenvector": "eigenvector",
    "wcc": "wcc", "wcc_threshold": "wcc",
    "label_propagation": "label_propagation",
    "label_propagation_weighted": "label_propagation",
    "label_propagation_gds_order": "label_propagation",
    "triangle_count": "triangle_count", "triangle_global": "triangle_count",
    "local_clustering_coefficient": "triangle_count",
    "degree_out": "degree", "degree_in_weighted": "degree",
    "node_similarity": "node_similarity",
    "louvain": "louvain", "louvain_distributed": "louvain",
    "modularity_optimization": "modularity_optimization",
    "leiden": "leiden", "hits": "hits",
    "modularity_nation": "modularity", "conductance_nation": "conductance",
    "collapse_path_2": "collapse_path",
    "astar": "astar", "dag_longest_path": "dag_longest_path",
    "betweenness": "betweenness", "closeness": "closeness",
    "closeness_wf": "closeness", "harmonic": "harmonic",
    "all_shortest_paths": "all_shortest_paths",
    "shortest_path_dijkstra": "dijkstra", "yens_k3": "yens",
    "scc": "scc", "fastrp": "fastrp",
    "random_walks": "random_walks", "random_walks_biased": "random_walks",
    "kmeans": "kmeans", "pq_codes": "pq", "pq_topk": "pq",
    "ivfpq_topk": "pq",
    "prepare_training_data": "near_dup_clusters",
    "hll_registers_lang": "hll", "hll_lang_distinct": "hll",
    "nchars_quantiles": "histogram",
    "k1coloring": "k1coloring", "maxkcut": "maxkcut",
    "hashgnn": "hashgnn", "graphsage": "graphsage", "celf": "celf",
    "bfs": "bfs", "dfs": "dfs", "sssp_weighted": "sssp",
    "dag_levels": "dag_levels", "k_core_3": "k_core", "coreness": "k_core",
    "scale_minmax": "scale_properties",
    "events_sessionize": "sessionize",
    "events_windowed_counts": "windowed_counts",
    "token_count": "text_scan", "token_count_bpe": "text_scan",
    "quality_score": "text_scan", "language_id": "text_scan",
    "fingerprint": "text_scan", "exact_duplicates": "exact_dedup",
    "minhash_signatures": "minhash", "minhash_lsh_pairs": "minhash",
    "ngram_jaccard_pairs": "ngram_jaccard", "simhash": "simhash",
    "embedding_cosine_topk": "cosine_topk",
    "embedding_near_duplicates": "cosine_topk",
    "embedding_cosine_topk_ivf": "cosine_topk_ivf",
    "knn_embeddings": "knn",
    # round-4: filtered exact knn runs the tiled-GEMM kernel on the
    # filtered index/query sides; the descent variant shares knn's
    # list-state shape (the target list doubles per-node list state, a
    # constant factor inside the same family)
    "knn_filtered": "cosine_topk",
    "knn_filtered_nn_descent": "knn",
    # round-4: deterministic leiden runs the same multilevel state as leiden
    "leiden_deterministic": "leiden",
    "spanning_tree": "spanning_tree", "sample_cnarw": "random_walks",
    "near_duplicate_clusters": "near_dup_clusters",
    "corpus_vocabulary": "corpus_vocabulary",
    "tfidf_top_terms": "tfidf",
    "decontaminate": "decontaminate",
    "hash_split": "text_scan",               # one linear scan + hash, per-doc state
    # pack_sequences: one doc-count-sized token-tally agg + a sharded
    # prefix-sum window — the corpus_vocabulary single-shuffle shape
    "pack_sequences": "corpus_vocabulary",
    # per-row hash/regex decisions: linear scan, no shuffle, no state
    "stratified_sample": "text_scan",
    "regex_scan": "text_scan",
    "one_hot_lang": "text_scan",
    # hashing-trick featurizer: one occurrence-sized partial-aggregatable
    # groupBy — the corpus_vocabulary shuffle shape with a dim-bounded key
    "hashed_features": "corpus_vocabulary",
    # learned quality filter: featurize + per-iteration scalar agg (d+1
    # doubles to the driver) + broadcast-weight scoring scan
    "quality_classifier_scores": "corpus_vocabulary",
    "dag_topological_sort": "dag_levels",    # same level-relaxation kernel
    "sssp_delta": "sssp",                    # same state; banded frontier schedule
    # round-5 negative-weight Bellman-Ford: per-node (dist, pred) state —
    # the sssp frontier-relaxation shape with one extra long column; the
    # cycle-recovery phase runs over the (tiny) affected/landed subsets
    "bellman_ford_negative": "sssp",
    "bellman_ford_cycles": "sssp",
    # two occurrence-sized map-side-combinable n-gram aggs — the
    # corpus_vocabulary shuffle shape
    "repetition_stats": "corpus_vocabulary",
    # stats distributions ride the underlying algorithm's state: the added
    # rollup is one partial agg whose merge state is the percentile buffer
    "pagerank_stats": "pagerank",
    "wcc_stats": "wcc",
    # gds.similarity.* Column functions: one linear scan, per-row array
    # arithmetic — the text_scan shape (no shuffle, no state)
    "similarity_functions_vec": "text_scan",
    "similarity_functions_set": "text_scan",
    # linkprediction pair scorers: the wedge join's shuffle profile is the
    # node_similarity intersect shape (pair-keyed partial agg over N(a)∩N(b))
    "link_prediction": "node_similarity",
    # holdout split: linear scan + hash tag; negatives are a bounded
    # generate→anti-join (candidate volume O(n_negative), not O(V²))
    "split_relationships": "text_scan",
    # SLLPA: LPA superstep shape with an array<long>[maxIterations] state
    # column riding the same shuffle
    "sllpa": "label_propagation",
    # PMI-lift collocations: two occurrence-sized map-side-combinable aggs
    # + a driver-merged distributed top-k — the corpus_vocabulary shape
    "bigram_collocations": "corpus_vocabulary",
    # random-hyperplane signatures: one linear projection scan, no shuffle
    "embedding_lsh_buckets": "text_scan",
    # banded bucket join over (band, bucket) keys + per-candidate verify —
    # the minhash LSH band-join shuffle profile
    "embedding_lsh_pairs": "minhash",
    # BPE train: per-round pair counts are occurrence-sized partial aggs
    # over the DISTINCT-WORD table (vocabulary-scale state) — the
    # corpus_vocabulary shuffle shape, ×n_merges rounds; encode is a scan
    "bpe_token_count": "corpus_vocabulary",
    # id encoding adds a broadcast vocab join + one groupBy(doc)
    # re-assembly over the encoded stream — same vocabulary-sized state
    "bpe_encode_ids": "corpus_vocabulary",
    # segment-level exact dedup: segment-hash first-occurrence agg +
    # keeper join + per-doc reassembly — occurrence-sized partial aggs,
    # shuffle keys are (hash, ids) not text: the corpus_vocabulary shape
    "segment_dedup": "corpus_vocabulary",
    # BM25 top-k: postings agg (term, doc tf) + per-query accumulate +
    # distributed top-k — two occurrence-sized map-side-combinable aggs
    "bm25_topk": "corpus_vocabulary",
    # PII redaction: chained regexp_replace in one codegen scan, no shuffle
    "regex_redact": "text_scan",
    # keep-policy dedup: the clusters op's plan + one cluster-keyed argmax
    # agg — the minhash/WCC composite's byte shape dominates
    "near_duplicate_keep": "minhash",
    # shuffle-shards: one row_number window partitioned by shard — shuffle
    # keys are (shard), state per task is one counter: the text_scan byte
    # shape with a single hash exchange
    "shuffle_shards": "text_scan",
    # token-budget sample: token-count scan + n_buckets-row driver prefix +
    # within-bucket window — per-task state is one running sum; the
    # text_scan byte shape with a single hash exchange
    "token_budget_sample": "text_scan",
    # exact-substring dedup: position-shingle hash counts are
    # occurrence-sized map-side-combinable aggs (shuffle rows carry a
    # 16-byte hash + ids, never text); the islands window partitions by
    # doc over the duplicated-position subset only — corpus_vocabulary
    # byte shape for both the span table and the removal pass
    "duplicate_spans": "corpus_vocabulary",
    "remove_duplicate_spans": "corpus_vocabulary",
    # Stupid-Backoff LM: the count table is vocabulary-sized (Heaps' law)
    # and built by partial-aggregatable groupBys; scoring joins the
    # position stream against it — corpus_vocabulary byte shape for the
    # model, one more occurrence-sized shuffle for the score join
    "lm_score": "corpus_vocabulary",
    # bucketing adds one range-bucketed row_number window over the scored
    # table (driver state: range_buckets counters) — same byte shape
    "lm_buckets": "corpus_vocabulary",
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
