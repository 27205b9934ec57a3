"""CSR-packed per-partition gather-scatter — the Arrow fast path.

The north-star architecture names two execution strategies for the superstep
kernel; this module is the second:

1. ``mode="join"`` (operators/*.py default): edges ⋈ state shuffle join +
   partial-aggregated sum. Scale-correct at 10^12 edges — state never
   leaves the cluster — but each superstep pays 2-3 shuffles of fixed cost.

2. ``mode="csr"`` (here): **vertex state held as NumPy arrays** (driver +
   broadcast), edges streamed per partition as Arrow batches into a
   vectorized bincount scatter. This is exactly the reference's
   shared-memory execution model (HugeDoubleArray state + per-thread node
   partitions, pregel/.../PartitionedComputer.java) re-expressed on Spark:
   a superstep is one ``mapInArrow`` pass over the cached edge partitions
   plus an O(n) driver combine — no shuffle at all. Valid while vertex
   state fits in memory (n × 8 B — 2 GB at 250M nodes), the same bound the
   single-node reference lives under; beyond that, use mode="join".

Per-partition work is pure NumPy: ``contrib = v[src_idx] (* w)`` then
``np.bincount(dst_idx, weights=contrib, minlength=n)`` — the CSR gather +
scatter fused, no per-row Python. Dense-index translation
(``np.searchsorted`` over the sorted node-id vector) runs once per
partition and is memoized in the Python worker process (workers are reused
across supersteps), so steady-state supersteps only move the 8 B/node
message vector.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame


class CsrEngine:
    """Holds the packed edge partitions + sorted id vector for one graph and
    runs broadcast-gather-scatter supersteps against driver-side state.

    Packing (once): edges → dense-index translation (searchsorted over the
    sorted id vector) → raw little-endian byte blocks, one record per
    partition, persisted as a pickled Python RDD. A superstep pass then
    streams only those bytes (no columnar→Arrow re-encode per pass) into the
    bincount kernel and collects ≤ n disjoint partials (edges are
    dst-partitioned, so partitions scatter into disjoint slot ranges)."""

    def __init__(self, graph, weighted: bool = False, num_partitions: int | None = None):
        from pyspark import StorageLevel
        from pyspark.sql import functions as F

        self.spark = graph.nodes.sparkSession
        sc = self.spark.sparkContext
        self.weighted = weighted

        # Arrow collect, not Row collect: at 8M nodes, materializing Python
        # Row objects is tens of seconds of SERIAL driver time paid equally
        # at every parallelism level — a pure constant against the N → 4N
        # efficiency ratio. toArrow() lands the ids as one columnar buffer.
        ids = np.sort(
            graph.nodes.select("node_id").toArrow().column("node_id")
            .to_numpy(zero_copy_only=False).astype("int64"))
        self.ids = ids
        self.n = len(ids)
        bc_ids = sc.broadcast(ids)

        cols = ["src", "dst"] + (["weight"] if weighted else [])
        e = graph.edges.select(*cols)
        if weighted:
            e = e.where(F.col("weight") > 0.0)
        if num_partitions is None:
            num_partitions = sc.defaultParallelism
        # partitioned by DST: each partition's scatter output (nonzero dst
        # slots) is disjoint from every other partition's, so the per-pass
        # driver collect is ≤ n rows total instead of Σ per-partition
        # distinct dsts (measured 6× less traffic on a 14M-edge graph)
        parted = e.repartition(num_partitions, "dst")
        weighted_k = weighted

        def translate(idv, values):
            """searchsorted + membership check: an endpoint absent from
            graph.nodes must be DROPPED (mirrors join-mode's inner join on
            state), not silently mapped to a neighboring slot or slot n."""
            pos = np.searchsorted(idv, values)
            ok = np.take(idv, np.clip(pos, 0, len(idv) - 1)) == values
            return pos, ok

        def pack(batches):
            srcs, dsts, ws = [], [], []
            idv = bc_ids.value
            for b in batches:
                sp, sok = translate(idv, b.column(0).to_numpy())
                dp, dok = translate(idv, b.column(1).to_numpy())
                keep = sok & dok
                srcs.append(sp[keep])
                dsts.append(dp[keep])
                if weighted_k:
                    ws.append(b.column(2).to_numpy().astype("float64")[keep])
            s = np.concatenate(srcs) if srcs else np.empty(0, "int64")
            d = np.concatenate(dsts) if dsts else np.empty(0, "int64")
            w = (np.concatenate(ws) if ws else np.empty(0, "float64")) if weighted_k else None
            # int32 indices: n < 2^31 always holds in csr mode (state must
            # fit in memory) — halves the per-pass stream volume
            yield (s.astype("<i4").tobytes(), d.astype("<i4").tobytes(),
                   w.tobytes() if weighted_k else b"")

        # mapInArrow → one packed record per partition, then down to an RDD
        packed = parted.mapInArrow(
            lambda batches: iter([pa.RecordBatch.from_arrays(
                [pa.array([t[0]], pa.binary()), pa.array([t[1]], pa.binary()),
                 pa.array([t[2]], pa.binary())],
                names=["s", "d", "w"],
            ) for t in pack(batches)]),
            schema="s binary, d binary, w binary",
        )
        self._blocks = packed.rdd.map(
            lambda r: (bytes(r["s"]), bytes(r["d"]), bytes(r["w"]))
        ).persist(StorageLevel.MEMORY_ONLY)
        self.edge_count = self._blocks.map(lambda t: len(t[0]) // 4).sum()

    # -- one pass over edges applying make_dense(src_idx, dst_idx, w, n) -----
    def _pass(self, make_dense) -> np.ndarray:
        weighted, n = self.weighted, self.n

        def kernel(block):
            sb, db, wb = block
            s_idx = np.frombuffer(sb, dtype="<i4")
            d_idx = np.frombuffer(db, dtype="<i4")
            w = np.frombuffer(wb, dtype="float64") if weighted else None
            dense = make_dense(s_idx, d_idx, w, n)
            nz = np.nonzero(dense)[0]
            return (nz.astype("<i4").tobytes(), dense[nz].tobytes())

        parts = self._blocks.map(kernel).collect()
        dense = np.zeros(n)
        for ib, vb in parts:
            idx = np.frombuffer(ib, dtype="<i4")
            if len(idx):
                # disjoint slot ranges per partition → plain assignment-add
                dense[idx] += np.frombuffer(vb, dtype="float64")
        return dense

    def out_degrees(self) -> np.ndarray:
        weighted = self.weighted

        def make(s_idx, d_idx, w, n):
            return np.bincount(s_idx, weights=w if weighted else None,
                               minlength=n).astype("float64")

        return self._pass(make)

    def scatter_sum(self, per_source: np.ndarray) -> np.ndarray:
        """msg[dst] = Σ per_source[src] (× weight) — one broadcast + one
        mapInArrow pass + driver combine. The combiner/ReducingMessenger."""
        sc = self.spark.sparkContext
        bc = sc.broadcast(per_source)
        weighted = self.weighted
        try:
            def make(s_idx, d_idx, w, n):
                contrib = bc.value[s_idx]
                if weighted:
                    contrib = contrib * w
                return np.bincount(d_idx, weights=contrib, minlength=n)

            return self._pass(make)
        finally:
            bc.unpersist()

    def scores_df(self, values: np.ndarray, col: str = "score") -> DataFrame:
        import pandas as pd

        return self.spark.createDataFrame(
            pd.DataFrame({"node_id": self.ids, col: values}))

    def close(self) -> None:
        self._blocks.unpersist()


def pagerank_csr(graph, damping_factor=0.85, tolerance=1e-7, max_iterations=20,
                 weighted=False, source_nodes=None):
    """Delta-push PageRank on the CSR engine — identical recurrence to
    operators/pagerank.py (PageRankComputation.java:59-108), vertex state in
    NumPy. Returns (scores_df, ran_iterations, converged, metrics)."""
    import time

    t0 = time.monotonic()
    eng = CsrEngine(graph, weighted=weighted)
    t_build = time.monotonic()
    n = eng.n
    alpha = 1.0 - damping_factor
    deg = eng.out_degrees()
    t_deg = time.monotonic()

    if source_nodes is not None:
        rank = np.zeros(n)
        want = np.array(sorted(set(int(s) for s in source_nodes)), dtype="int64")
        pos = np.searchsorted(eng.ids, want)
        # membership check: searchsorted alone returns an insertion point for
        # UNKNOWN ids (out-of-range → IndexError, mid-range → silently seeds
        # the wrong node). Unknown sources are dropped — join-mode parity
        # (operators/pagerank.py uses isin).
        valid = (pos < n) & (eng.ids[np.minimum(pos, n - 1)] == want)
        rank[pos[valid]] = alpha
    else:
        rank = np.full(n, alpha)
    delta = rank.copy()
    # phase walls let the scaling bench attribute non-scaling time: pack =
    # the dst-repartition shuffle + index translation (distributed, scales),
    # degrees/superstep = broadcast + pass + driver combine (the per-pass
    # driver constant is the csr mode's serial fraction)
    metrics = [{"phase": "pack", "wall_ms": round((t_build - t0) * 1e3, 1)},
               {"phase": "degrees", "wall_ms": round((t_deg - t_build) * 1e3, 1)}]
    converged = False
    ran = 1  # the send-only initial superstep counts (Pregel.java:172-210)
    safe_deg = np.where(deg > 0, deg, 1.0)
    for _ in range(max_iterations - 1):
        send_mask = delta > tolerance
        if not send_mask.any():
            converged = True
            break
        t_s = time.monotonic()
        per_source = np.where(send_mask & (deg > 0), delta / safe_deg, 0.0)
        msg = eng.scatter_sum(per_source)
        delta = damping_factor * msg
        rank = rank + delta
        ran += 1
        metrics.append({"superstep": ran - 1, "delta_max": float(delta.max()),
                        "rank_sum": float(rank.sum()),
                        "wall_ms": round((time.monotonic() - t_s) * 1e3, 1)})
    else:
        converged = not (delta > tolerance).any()
    scores = eng.scores_df(rank)
    eng.close()
    return scores, ran, converged, metrics
