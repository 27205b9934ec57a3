"""Incremental link-graph ingestion: Structured Streaming over the
source-repository table → edge-delta stream.

The batch projection (sources/edge_extraction.build_link_graph — the
``gds.graph.project`` analog) re-reads the whole repo table; at 10^12 files
the realistic operating mode is INCREMENTAL: new/changed files land in a
drop zone (cloud storage / an Iceberg append snapshot) and only their
references are parsed and merged into the edge table. The reference has no
streaming story (its nearest analog is re-projection); this is the
Spark-native capability a live corpus needs.

Design (all append-safe — no streaming aggregation state):

- ``stream_references``: ``readStream`` micro-batches flow through the SAME
  vectorized ``mapInPandas`` parser as the batch path (one parser, two
  execution modes — Structured Streaming supports mapInPandas natively).
- resolution + id mapping are STREAM-STATIC inner joins against the
  definitions table and dense id map built by the last full projection
  (stream-static joins need no watermark). At 100 TB both sides are
  broadcast-or-bucket joins against slowly-changing indexes.
- per micro-batch, ``foreachBatch`` aggregates the batch's references into
  ``(src, dst, weight)`` DELTAS and appends them to the delta directory.
  Weights are reference COUNTS, which compose over batches by summation —
  ``merged = deltas.groupBy(src, dst).sum(weight)`` equals the batch
  projection exactly (verified by test). References to keys missing from
  the static id map (files never seen by a full projection) are appended
  to a ``pending/`` side channel instead of silently dropped; a periodic
  full projection drains it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from graph_data_science_spark.sources.edge_extraction import (
    definitions_table,
    extract_references,
)


def stream_references(repos_stream: DataFrame, defs: DataFrame) -> DataFrame:
    """Streaming (src_key, dst_key) resolved reference pairs.

    ``repos_stream`` is a streaming DataFrame with the input_hint schema
    (repo, path, commit, lang, content); ``defs`` is the STATIC definitions
    table from the last full projection. Pure map + stream-static inner
    join — append-mode safe, no state store."""
    refs = extract_references(repos_stream)
    return refs.join(defs, refs.ref_module == defs.module, "inner").select(
        F.col("src_key"), F.col("def_key").alias("dst_key"))


def run_incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    repos_static: DataFrame,
    id_map: DataFrame,
    schema: str = "repo string, path string, commit string, lang string, "
                  "content string",
    max_files_per_trigger: int | None = None,
):
    """Drain ``input_dir`` (parquet drop zone of repo-table rows) into
    ``out_dir/deltas`` (src, dst, weight) + ``out_dir/pending`` (unresolved
    src_key/dst_key pairs), using an ``availableNow`` trigger — the batch
    twin of a continuously-running ingest. Returns after the drain.

    ``repos_static``/``id_map``: the definitions + dense-id indexes from
    the last full projection (static join sides)."""
    defs = definitions_table(repos_static)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    resolved = stream_references(stream, defs)

    src_ids = id_map.select(F.col("orig_key").alias("src_key"),
                            F.col("node_id").alias("src"))
    dst_ids = id_map.select(F.col("orig_key").alias("dst_key"),
                            F.col("node_id").alias("dst"))
    deltas_dir = os.path.join(out_dir, "deltas")
    pending_dir = os.path.join(out_dir, "pending")

    def sink(batch: DataFrame, batch_id: int) -> None:
        b = batch.persist()
        try:
            mapped = (b.join(src_ids, "src_key").join(dst_ids, "dst_key")
                      .groupBy("src", "dst")
                      .agg(F.count(F.lit(1)).cast("double").alias("weight")))
            mapped.write.mode("append").parquet(deltas_dir)
            unresolved = (b.join(src_ids, "src_key", "left_anti")
                          .unionByName(b.join(dst_ids, "dst_key", "left_anti"))
                          .dropDuplicates(["src_key", "dst_key"]))
            if not unresolved.isEmpty():
                unresolved.write.mode("append").parquet(pending_dir)
        finally:
            b.unpersist()

    q = (resolved.writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return deltas_dir, pending_dir


def merge_deltas(spark: SparkSession, deltas_dir: str) -> DataFrame:
    """Fold the appended deltas into the current edge table:
    reference-count weights compose by summation."""
    return (spark.read.parquet(deltas_dir)
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight")))


def run_streaming_pagerank(
    spark: SparkSession,
    edge_delta_dir: str,
    state_dir: str,
    damping_factor: float = 0.85,
    tolerance: float = 1e-7,
    max_iterations: int = 50,
    schema: str = "src long, dst long",
) -> DataFrame:
    """Maintain PageRank scores over a continuously-growing link graph:
    ``readStream`` over an edge drop zone → per micro-batch, append the
    batch to the accumulated edge table and WARM-START
    :func:`~graph_data_science_spark.operators.pagerank.pagerank_incremental`
    from the previous batch's converged scores. The push frontier per
    batch is proportional to the batch's blast radius, not the graph —
    the operating mode a 10¹²-edge live corpus needs (full recompute per
    ingest batch re-pushes the whole message volume).

    Duplicate (src, dst) arrivals collapse to one link (the unweighted
    projection's set semantics). Scores persist under
    ``state_dir/scores-{0,1}`` (alternating slots, batch-parity —
    reading the previous slot while writing the next is safe because the
    slots never alias) with a ``_latest`` marker, so a later drain
    resumes from the last converged state like the Pregel checkpoint
    story. Returns the final ``(node_id, score)`` DataFrame.

    Batch-equivalence invariant (tested): after draining N batches the
    scores match a from-scratch :func:`pagerank` on the union of all
    batches to within the push tolerance."""
    import json

    from graph_data_science_spark.graph import Graph
    from graph_data_science_spark.operators.pagerank import (
        pagerank_incremental)

    edges_dir = os.path.join(state_dir, "edges")
    marker = os.path.join(state_dir, "_latest")

    def _slot(i: int) -> str:
        return os.path.join(state_dir, f"scores-{i % 2}")

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(edges_dir)
        edges = (spark.read.parquet(edges_dir)
                 .dropDuplicates(["src", "dst"]))
        nodes = (edges.select(F.col("src").alias("node_id"))
                 .unionByName(edges.select(F.col("dst").alias("node_id")))
                 .distinct())
        if os.path.exists(marker):
            with open(marker) as fh:
                prev_slot = json.load(fh)["slot"]
            prev = spark.read.parquet(_slot(prev_slot))
            next_slot = prev_slot + 1
        else:
            prev = spark.createDataFrame([], "node_id long, score double")
            next_slot = 0
        res = pagerank_incremental(
            Graph(nodes=nodes, edges=edges), prev,
            damping_factor=damping_factor, tolerance=tolerance,
            max_iterations=max_iterations)
        res.scores.write.mode("overwrite").parquet(_slot(next_slot))
        with open(marker, "w") as fh:
            json.dump({"slot": next_slot, "batch_id": int(batch_id),
                       "converged": bool(res.converged),
                       "ran_iterations": int(res.ran_iterations)}, fh)

    q = (spark.readStream.schema(schema).parquet(edge_delta_dir)
         .writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    import json as _json
    with open(marker) as fh:
        slot = _json.load(fh)["slot"]
    return spark.read.parquet(_slot(slot))


def run_streaming_wcc(
    spark: SparkSession,
    edge_delta_dir: str,
    state_dir: str,
    threshold: float | None = None,
    schema: str = "src long, dst long",
) -> DataFrame:
    """Maintain WCC labels over a continuously-growing link graph:
    ``readStream`` over an edge drop zone → per micro-batch,
    :func:`~graph_data_science_spark.operators.wcc.wcc_incremental` merges
    the batch into the previous labels via its contracted-component graph.

    Unlike :func:`run_streaming_pagerank` this maintainer never accumulates
    or re-reads the edge table at all — components only ever merge, so the
    converged ``(node_id, component)`` labels are a SUFFICIENT summary of
    every edge seen so far. Per batch it reads the label table once and the
    batch once; state lives under ``state_dir/labels-{0,1}`` (alternating
    slots + ``_latest`` marker, the same resume contract as the pagerank
    maintainer). Returns the final ``(node_id, component)`` DataFrame.

    Batch-equivalence invariant (tested): after draining N batches the
    labels equal a from-scratch :func:`wcc` on the union of all batches,
    under ANY split of the edges into batches.
    """
    import json

    from graph_data_science_spark.operators.wcc import wcc_incremental

    marker = os.path.join(state_dir, "_latest")

    def _slot(i: int) -> str:
        return os.path.join(state_dir, f"labels-{i % 2}")

    def sink(batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(marker):
            with open(marker) as fh:
                prev_slot = json.load(fh)["slot"]
            prev = spark.read.parquet(_slot(prev_slot))
            next_slot = prev_slot + 1
        else:
            prev = spark.createDataFrame([], "node_id long, component long")
            next_slot = 0
        res = wcc_incremental(prev, batch, threshold=threshold)
        res.components.write.mode("overwrite").parquet(_slot(next_slot))
        with open(marker, "w") as fh:
            json.dump({"slot": next_slot, "batch_id": int(batch_id),
                       "converged": bool(res.converged),
                       "ran_iterations": int(res.ran_iterations)}, fh)

    q = (spark.readStream.schema(schema).parquet(edge_delta_dir)
         .writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    with open(marker) as fh:
        slot = json.load(fh)["slot"]
    return spark.read.parquet(_slot(slot))


def run_streaming_triangle_count(
    spark: SparkSession,
    edge_delta_dir: str,
    state_dir: str,
    schema: str = "src long, dst long",
) -> int:
    """Maintain the global triangle count over a continuously-growing link
    graph: ``readStream`` over an edge drop zone → per micro-batch,
    :func:`~graph_data_science_spark.operators.triangle.triangle_count_delta`
    counts only the triangles the batch CLOSES (cost = the batch's blast
    radius, Σ deg over batch endpoints), then the canonicalized new edges
    append to the accumulated simple-edge table.

    State: ``state_dir/edges`` (canonical src<dst parquet, append-only —
    dedup is enforced by the per-batch anti-join before append) plus a
    ``_latest`` JSON marker carrying the running total and per-batch
    deltas, the same resume contract as the pagerank/wcc maintainers.
    Returns the final global triangle count.

    Batch-equivalence invariant (tested): after draining N batches the
    total equals a from-scratch :func:`triangle_count` on the union of all
    batches, under ANY split of the edges into batches."""
    import json

    from graph_data_science_spark.operators.triangle import (
        canonicalize_batch, triangle_count_delta)

    edges_dir = os.path.join(state_dir, "edges")
    marker = os.path.join(state_dir, "_latest")

    def sink(batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(marker):
            with open(marker) as fh:
                st = json.load(fh)
            old = spark.read.parquet(edges_dir)
        else:
            st = {"triangles": 0, "deltas": []}
            old = spark.createDataFrame([], "src long, dst long")
        delta = triangle_count_delta(old, batch)
        new_e = (canonicalize_batch(batch)
                 .join(old, ["src", "dst"], "left_anti"))
        new_e.write.mode("append").parquet(edges_dir)
        st["triangles"] += delta
        st["deltas"].append({"batch_id": int(batch_id), "delta": int(delta)})
        with open(marker, "w") as fh:
            json.dump(st, fh)

    q = (spark.readStream.schema(schema).parquet(edge_delta_dir)
         .writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    import json as _json
    with open(marker) as fh:
        return int(_json.load(fh)["triangles"])


def _run_slot_maintainer(
    spark: SparkSession,
    delta_dir: str,
    state_dir: str,
    fresh_fn,
    merge_fn,
    slot_prefix: str,
    schema: str,
) -> DataFrame:
    """Shared drop-zone maintainer: ``readStream`` → per micro-batch,
    ``fresh_fn(batch)`` summarized and ``merge_fn(prev, fresh)``-merged
    into alternating parquet slots + a ``_latest`` marker (the
    pagerank/wcc maintainers' resume contract).

    Replay-safe for NON-idempotent merges: ``foreachBatch`` is
    at-least-once (a crash between the slot write and the stream
    checkpoint's offset commit redelivers the batch), so the sink skips
    any ``batch_id`` at or below the marker's — without this guard a
    sum-merge would double-count the replayed batch's contribution
    (a max-merge like HLL's survives replay by accident; the guard makes
    both exact by construction). Batch ids are monotonic per stream
    checkpoint, which lives beside the slots in ``state_dir``.

    An empty drop zone (zero micro-batches, no marker) returns
    ``fresh_fn`` of an empty batch — the correctly-typed empty summary —
    instead of crashing on the missing marker."""
    import json

    marker = os.path.join(state_dir, "_latest")

    def _slot(i: int) -> str:
        return os.path.join(state_dir, f"{slot_prefix}-{i % 2}")

    def sink(batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(marker):
            with open(marker) as fh:
                st = json.load(fh)
            if int(batch_id) <= int(st["batch_id"]):
                return  # at-least-once replay of an already-merged batch
            prev = spark.read.parquet(_slot(st["slot"]))
            merged = merge_fn(prev, fresh_fn(batch))
            next_slot = st["slot"] + 1
        else:
            merged = fresh_fn(batch)
            next_slot = 0
        merged.write.mode("overwrite").parquet(_slot(next_slot))
        with open(marker, "w") as fh:
            json.dump({"slot": next_slot, "batch_id": int(batch_id)}, fh)

    q = (spark.readStream.schema(schema).parquet(delta_dir)
         .writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    if not os.path.exists(marker):
        return fresh_fn(spark.createDataFrame([], schema))
    with open(marker) as fh:
        slot = json.load(fh)["slot"]
    return spark.read.parquet(_slot(slot))


def run_streaming_hll(
    spark: SparkSession,
    doc_delta_dir: str,
    state_dir: str,
    group_col: str = "lang",
    value_col: str = "text",
    p: int = 9,
    seed: int = 42,
    schema: str = "doc_id long, text string, lang string",
) -> DataFrame:
    """Maintain per-group approx-distinct registers over a continuously
    growing corpus: ``readStream`` over a document drop zone → per
    micro-batch, sketch the batch and max-merge it into the persisted
    register store (operators/sketches.py module doc — the merge IS the
    associative HLL union, so the store is a sufficient summary of every
    value ever seen; batch-equivalence is exact, not approximate-on-top-
    of-approximate).

    State = ``state_dir/regs-{0,1}`` alternating parquet slots + a
    ``_latest`` marker (``_run_slot_maintainer``); the store is at most
    groups·2^p rows regardless of corpus size. Returns the final
    (group, reg, rho) registers — feed to
    :func:`~...sketches.hll_estimate` for counts.
    """
    from graph_data_science_spark.operators.sketches import (
        hll_merge, hll_registers)

    return _run_slot_maintainer(
        spark, doc_delta_dir, state_dir,
        lambda b: hll_registers(b, group_col, value_col, p, seed),
        hll_merge, "regs", schema)


def run_streaming_lm_counts(
    spark: SparkSession,
    doc_delta_dir: str,
    state_dir: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    schema: str = "doc_id long, text string, lang string",
) -> DataFrame:
    """Maintain the Stupid-Backoff LM count table over a continuously
    growing reference corpus: ``readStream`` over a document drop zone →
    per micro-batch, count the batch's n-grams and integer-sum-merge them
    into the persisted model store (operators/lm.py — Stupid Backoff
    needs no renormalization, so the merge IS exact model training:
    ``merge(counts(A), counts(B)) == counts(A ∪ B)`` bit-for-bit, the
    pytest-pinned ngram_lm_merge property).

    Same state contract as the HLL maintainer (``_run_slot_maintainer``,
    including the at-least-once replay guard — CRITICAL here because the
    integer-sum merge is NOT idempotent, unlike HLL's max-merge: a
    replayed batch would double-count its n-grams). The store stays
    vocabulary-sized (Heaps' law) regardless of corpus size. Returns the
    final (k, ctx, word, cnt) table — pass it to
    :func:`~...lm.ngram_lm_score` as ``counts``.
    """
    from graph_data_science_spark.operators.lm import (
        ngram_lm_counts, ngram_lm_merge)

    return _run_slot_maintainer(
        spark, doc_delta_dir, state_dir,
        lambda b: ngram_lm_counts(b, n=n, text_col=text_col, id_col=id_col),
        ngram_lm_merge, "counts", schema)
