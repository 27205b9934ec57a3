"""Incremental near-dup detection: the per-row LSH kernel must equal the
batch explode→groupBy kernel bit-for-bit, and streamed decisions must equal
the batch LSH pairs between new docs and the corpus for any micro-batch
split."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
)
from graph_data_science_spark.streaming.dedup_stream import (
    band_table,
    minhash_signature_col,
    run_incremental_dedup,
)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="gds_dedup_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _corpus(spark, n=40, start=0):
    # template families with per-doc perturbation — realistic near-dup mix
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa", "lam", "mu"]
    rows = []
    for i in range(start, start + n):
        base = i % 3
        ws = list(words[base: base + 8])
        ws[i % 8] = words[(i * 5) % len(words)]
        rows.append((i, " ".join(ws)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_per_row_kernel_equals_batch_minhash(spark):
    docs = _corpus(spark, n=25)
    per_row = docs.select(
        "doc_id",
        F.posexplode(minhash_signature_col(F.col("text"), 8, 3))
        .alias("h", "minhash"),
    )
    got = {(r["doc_id"], r["h"]): r["minhash"] for r in per_row.collect()}
    want = {(r["doc_id"], r["h"]): r["minhash"]
            for r in minhash_signatures(docs, num_hashes=8).collect()}
    assert got == want


def test_per_row_band_hashes_match_batch_pairs(spark):
    """Joining the per-row band tables of two doc sets must produce exactly
    the batch LSH pairs restricted to cross pairs — i.e. the band hash
    strings are byte-identical to the batch construction."""
    docs = _corpus(spark, n=30)
    bt = band_table(docs).persist()
    got = set(
        (min(r["a"], r["b"]), max(r["a"], r["b"]))
        for r in (bt.alias("x").join(bt.alias("y"), ["band", "bh"])
                  .where(F.col("x.doc_id") < F.col("y.doc_id"))
                  .select(F.col("x.doc_id").alias("a"),
                          F.col("y.doc_id").alias("b"))
                  .distinct().collect()))
    want = set((r["a"], r["b"])
               for r in minhash_lsh_pairs(docs, num_hashes=8, bands=4).collect())
    bt.unpersist()
    assert got == want


def test_streamed_decisions_equal_batch_cross_pairs(spark, workdir):
    corpus = _corpus(spark, n=40, start=0).persist()
    new_docs = _corpus(spark, n=20, start=40).persist()

    drop = os.path.join(workdir, "drop")
    new_docs.repartition(4).write.mode("overwrite").parquet(drop)
    decisions_dir = run_incremental_dedup(
        spark, drop, os.path.join(workdir, "out"), corpus,
        max_files_per_trigger=1)  # force several micro-batches

    got = set((r["doc_id"], r["dup_of"]) for r in
              spark.read.parquet(decisions_dir).collect())

    # batch reference: LSH pairs over corpus ∪ new, restricted to cross pairs
    both = corpus.unionByName(new_docs)
    pairs = minhash_lsh_pairs(both, num_hashes=8, bands=4)
    want = set()
    for r in pairs.collect():
        a, b = r["a"], r["b"]
        if a < 40 <= b:
            want.add((b, a))   # (new doc, corpus doc)
    corpus.unpersist()
    new_docs.unpersist()
    assert got == want and len(want) > 0
