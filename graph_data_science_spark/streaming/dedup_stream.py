"""Incremental near-duplicate detection: Structured Streaming over newly
arriving documents, checked against the static corpus's LSH band index.

The batch dedup ladder (operators/dedup.py) re-reads the whole corpus; at
100 TB the realistic operating mode for a LIVE corpus is incremental — new
documents land in a drop zone and each micro-batch is checked against the
(slowly-changing) index of everything already ingested, so duplicates are
rejected before they ever enter the training set.

Design (append-safe — no streaming aggregation state):

- ``minhash_signature_col`` / ``band_hash_col``: the MinHash signature and
  band hashes computed as PER-ROW higher-order array expressions (nested
  ``transform`` + ``array_min``/``array_sort``) instead of the batch path's
  explode→groupBy. Bit-identical to ``dedup.minhash_signatures`` /
  the band hashes inside ``dedup.minhash_lsh_pairs`` (verified by test) —
  one definition of the hash family, two execution shapes. Per-row means
  NO shuffle and no streaming-aggregation state: a plain map over the
  stream.
- ``build_corpus_band_index``: the static side — (doc_id, band, bh) for the
  ingested corpus, written once per full ingest (parquet, partitionable by
  band at scale).
- ``stream_near_dup_candidates``: stream-static inner join of the new
  docs' exploded band hashes against the index (needs no watermark). At
  100 TB the join key is (band, bh) — the index side is bucket-joinable
  and the stream side is micro-batch-sized.
- ``run_incremental_dedup``: availableNow drain; per micro-batch,
  ``foreachBatch`` dedupes the (new_doc, corpus_doc) candidates ACROSS
  bands (a batch-local distinct — the only dedup state needed, since each
  new doc is seen in exactly one micro-batch) and appends decisions.

Verified: streamed decisions over any micro-batch split equal the batch
LSH pairs between the new docs and the corpus (test_streaming_dedup).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from graph_data_science_spark.operators.dedup import _MH_P, _word_shingles


def minhash_signature_col(text_col: Column, num_hashes: int = 8,
                          shingle_n: int = 3) -> Column:
    """Per-row MinHash signature: array<long> of length ``num_hashes``.

    Element h = MIN over shingles of the integer universal family
    ``(a_h·base + b_h) mod P`` with base = one md5 per shingle — the SAME
    family as ``dedup.minhash_signatures`` (bit-identical, verified by
    test), expressed as nested array transforms so it needs no
    explode/groupBy; the base digest is hoisted so each shingle hashes
    once regardless of ``num_hashes``.
    """
    shingles = _word_shingles(text_col, shingle_n)
    bases = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
        .cast("long") % _MH_P)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda h: F.array_min(F.transform(
            bases,
            lambda base: ((((h + 1) * F.lit(2654435761)) % _MH_P) * base
                          + (((h + 1) * F.lit(40503)) % _MH_P)) % _MH_P)),
    )


def band_hash_col(sig: Column, num_hashes: int = 8, bands: int = 4) -> Column:
    """Per-row LSH band hashes: array<string> of length ``bands``.

    Band b = md5 of the ','-joined LEXICOGRAPHICALLY SORTED "h=minhash"
    strings of its rows — byte-identical to the batch path's
    ``string_agg(... ORDER BY ...)`` construction in
    ``dedup.minhash_lsh_pairs``.
    """
    r = num_hashes // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(F.concat_ws(",", F.array_sort(F.transform(
            F.sequence(b * r, (b + 1) * r - 1),
            lambda h: F.concat_ws(
                "=", h.cast("string"), F.element_at(sig, h + 1)))))),
    )


def band_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               num_hashes: int = 8, bands: int = 4,
               shingle_n: int = 3) -> DataFrame:
    """(doc_id, band, bh) rows via the per-row kernel — works on batch AND
    streaming DataFrames (stateless: map + posexplode only)."""
    sig = minhash_signature_col(F.col(text_col), num_hashes, shingle_n)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(band_hash_col(sig, num_hashes, bands)).alias("band", "bh"),
    )


def build_corpus_band_index(corpus: DataFrame, **kw) -> DataFrame:
    """The static index side: band table of the already-ingested corpus."""
    return band_table(corpus, **kw)


def stream_near_dup_candidates(docs_stream: DataFrame, corpus_index: DataFrame,
                               num_hashes: int = 8, bands: int = 4,
                               shingle_n: int = 3) -> DataFrame:
    """Streaming (doc_id, dup_of) candidates: new docs sharing any LSH band
    hash with a corpus doc. May contain per-band repeats — the sink (or
    ``run_incremental_dedup``) dedupes within the micro-batch."""
    new_bands = band_table(docs_stream, num_hashes=num_hashes, bands=bands,
                           shingle_n=shingle_n)
    idx = corpus_index.select(
        "band", "bh", F.col("doc_id").alias("dup_of"))
    return (new_bands.join(idx, ["band", "bh"])
            .where(F.col("doc_id") != F.col("dup_of"))
            .select("doc_id", "dup_of"))


def run_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    corpus: DataFrame,
    schema: str = "doc_id long, text string",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_files_per_trigger: int | None = None,
) -> str:
    """Drain ``input_dir`` (parquet drop zone of new documents) into
    ``out_dir/dup_decisions`` — distinct (doc_id, dup_of) rows naming, for
    each new document, every corpus document it near-duplicates. New docs
    with no row are clean. Returns the decisions directory.

    availableNow trigger: the batch twin of a continuously-running dedup
    gate. Each new doc appears in exactly one micro-batch, so the
    batch-local distinct is a complete dedup of its candidates.
    """
    index = build_corpus_band_index(
        corpus, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
    ).persist()
    index.count()  # materialize once; every micro-batch reuses it

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    cands = stream_near_dup_candidates(
        stream, index, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n)

    decisions_dir = os.path.join(out_dir, "dup_decisions")

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.distinct().write.mode("append").parquet(decisions_dir)

    q = (cands.writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    index.unpersist()
    return decisions_dir
