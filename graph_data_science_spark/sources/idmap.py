"""IdMap: original node keys ↔ dense internal ids ``[0, nodeCount)``.

Reference analog: core/src/main/java/org/neo4j/gds/api/IdMap.java:34 and
ArrayIdMap (core/.../loading/ArrayIdMap.java:43 — forward paged array,
reverse sparse array). Dense ids are what make per-partition CSR packing and
min-id component semantics well defined.

Scale notes: the naive ``row_number()`` over an unpartitioned window funnels
every key through ONE task — unusable at 10^12 keys. ``assign_dense_ids``
instead range-partitions the distinct keys, computes per-partition counts
(one small collect ~ O(#partitions)), and stamps ids inside ``mapInPandas``
with cumulative offsets — two distributed passes, no single-task bottleneck,
and ids are globally ordered by key (so WCC's min-component-id is
deterministic for a given key ordering).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def assign_dense_ids(keys: DataFrame, key_col: str = "orig_key",
                     num_partitions: int | None = None) -> DataFrame:
    """Return ``(node_id: long, <key_col>)`` with dense ids 0..n-1 ordered by key.

    ``keys`` may contain duplicates; they are dropped.
    """
    distinct = keys.select(key_col).distinct()
    if num_partitions is None:
        num_partitions = max(distinct.sparkSession.sparkContext.defaultParallelism, 8)
    parted = distinct.repartitionByRange(num_partitions, key_col).sortWithinPartitions(key_col)
    parted = parted.withColumn("_pid", F.spark_partition_id())
    parted.persist()
    counts = {r["_pid"]: r["cnt"] for r in
              parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition: rows arrive sorted by key; id = offset + local index
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            off = offsets[int(pdf["_pid"].iloc[0])]
            ids = pd.RangeIndex(off + local, off + local + len(pdf))
            local += len(pdf)
            yield pd.DataFrame({"node_id": ids.astype("int64"), key_col: pdf[key_col]})

    out = parted.mapInPandas(stamp, schema=f"node_id long, {key_col} string")
    out = out.persist()
    out.count()
    parted.unpersist()
    return out


def map_edges_to_ids(edges: DataFrame, id_map: DataFrame,
                     src_col: str = "src_key", dst_col: str = "dst_key",
                     key_col: str = "orig_key") -> DataFrame:
    """Replace original keys with dense ids via two hash joins.

    At scale the id_map is large; both joins shuffle on the key — the same
    cost profile as the reference's two-phase relationship import
    (core/.../loading/ScanningRelationshipsImporter.java:38). Edges whose
    endpoint keys are unknown are dropped (inner joins), matching the
    reference's skip-unmapped behavior at projection.
    """
    extra = [c for c in edges.columns if c not in (src_col, dst_col)]
    m_src = id_map.select(F.col(key_col).alias(src_col), F.col("node_id").alias("src"))
    m_dst = id_map.select(F.col(key_col).alias(dst_col), F.col("node_id").alias("dst"))
    return (
        edges.join(m_src, src_col, "inner")
        .join(m_dst, dst_col, "inner")
        .select("src", "dst", *extra)
    )
