"""Embedding LSH (exact-integer random-hyperplane banding) + PMI-lift
collocations: determinism, containment/recall vs the exact kernel, and
known-answer fixtures. The DuckDB value-level oracles live in
tests/test_entry_oracle.py via __spark_entry__."""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.dedup import (
    embedding_lsh_buckets,
    embedding_lsh_pairs,
    embedding_near_duplicates,
)
from graph_data_science_spark.operators.pipeline_ops import bigram_collocations


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture(scope="module")
def near_dup_vecs(spark):
    # three tight clusters plus isolated points: rotations of a base vector
    # by small angles (high cosine) vs orthogonal directions
    base = [
        (0, _unit([1.0, 0.2, 0.1, 0.05])),
        (1, _unit([1.0, 0.21, 0.1, 0.05])),     # ~dup of 0
        (2, _unit([1.0, 0.2, 0.11, 0.05])),     # ~dup of 0
        (3, _unit([0.05, 1.0, 0.3, 0.2])),
        (4, _unit([0.05, 1.0, 0.31, 0.2])),     # ~dup of 3
        (5, _unit([0.2, 0.05, 1.0, 0.4])),
        (6, _unit([0.2, 0.05, 1.0, 0.41])),     # ~dup of 5
        (7, _unit([-1.0, 0.3, -0.2, 0.6])),     # isolated
        (8, _unit([0.3, -1.0, 0.25, -0.5])),    # isolated
    ]
    return base


def test_lsh_buckets_deterministic_across_parallelism(spark, near_dup_vecs):
    vecs = _vecs(spark, near_dup_vecs)
    a = embedding_lsh_buckets(vecs, n_bits=16, bands=4)
    b = embedding_lsh_buckets(vecs.repartition(7), n_bits=16, bands=4)
    ra = {(r["vec_id"], r["band"]): r["bucket"] for r in a.collect()}
    rb = {(r["vec_id"], r["band"]): r["bucket"] for r in b.collect()}
    assert ra == rb
    # every vector emits exactly `bands` rows
    assert len(ra) == len(near_dup_vecs) * 4


def test_lsh_near_dups_share_buckets(spark, near_dup_vecs):
    vecs = _vecs(spark, near_dup_vecs)
    pairs = {(r["doc_a"], r["doc_b"])
             for r in embedding_lsh_pairs(
                 vecs, threshold=0.99, n_bits=16, bands=4).collect()}
    # the three planted near-dup pairs collide in at least one 4-bit band
    # (tiny angles flip almost no sign bits)
    assert {(0, 1), (0, 2), (3, 4), (5, 6)} <= pairs


def test_lsh_pairs_subset_of_exact_with_equal_cosines(spark, near_dup_vecs):
    vecs = _vecs(spark, near_dup_vecs)
    t = 0.9
    approx = {(r["doc_a"], r["doc_b"]): r["cosine"]
              for r in embedding_lsh_pairs(vecs, threshold=t).collect()}
    exact = {(r["doc_a"], r["doc_b"]): r["cosine"]
             for r in embedding_near_duplicates(vecs, threshold=t).collect()}
    # precision 1: every verified colliding pair is a true above-threshold
    # pair, with the identical rounded cosine
    for k, v in approx.items():
        assert k in exact and abs(v - exact[k]) < 1e-9
    # recall on this fixture: the planted pairs all survive banding
    assert set(approx) == set(exact)


def test_lsh_recall_on_sf0001_embeddings(spark):
    import os
    sf_dir = os.environ.get("GDS_TEST_SF_DIR", "/root/testdata/sf0.001")
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    t = 0.3
    approx = {(r["doc_a"], r["doc_b"])
              for r in embedding_lsh_pairs(vecs, threshold=t).collect()}
    exact = {(r["doc_a"], r["doc_b"])
             for r in embedding_near_duplicates(vecs, threshold=t).collect()}
    assert approx <= exact
    # banding recall at cosine 0.3 with 4×4-bit bands is ~0.45 in theory
    # ((1-θ/π)^4 per band); require a conservative floor and non-emptiness
    assert len(exact) > 0
    recall = len(approx) / len(exact)
    assert recall >= 0.25, f"recall {recall:.3f} below floor"


def test_bigram_collocations_known_answer(spark):
    docs = spark.createDataFrame(
        [
            (0, "new york new york city"),
            (1, "san francisco and new york"),
            (2, "york new haven and san francisco"),
            (3, "the city and the haven"),
        ],
        "doc_id long, text string",
    )
    out = bigram_collocations(docs, top_k=5, min_count=2).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in out}
    # counts: "new york" ×3, "san francisco" ×2, "york new" ×2, "and the" ×1…
    assert by_pair[("new", "york")]["pair_count"] == 3
    assert by_pair[("san", "francisco")]["pair_count"] == 2
    # unigrams: new=4 york=4 san=2 francisco=2; T1=21 tokens, T2=17 bigrams
    # lift(san francisco) = (2/17)/((2/21)*(2/21)) — the rarest pair wins
    sf = by_pair[("san", "francisco")]
    expected = (2 / 17) / ((2 / 21) * (2 / 21))
    assert abs(sf["lift"] - round(expected, 6)) < 1e-9
    # ranks are 1..n, ordered by (lift desc, w1, w2), all pair_count >= 2
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))
    lifts = [r["lift"] for r in sorted(out, key=lambda r: r["rank"])]
    assert lifts == sorted(lifts, reverse=True)
    assert all(r["pair_count"] >= 2 for r in out)


def test_bigram_collocations_deterministic_across_parallelism(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{i % 3} tok{(i + 1) % 7}")
         for i in range(50)],
        "doc_id long, text string",
    )
    a = bigram_collocations(docs, top_k=10, min_count=2).collect()
    b = bigram_collocations(docs.repartition(9), top_k=10, min_count=2).collect()
    ka = [(r["w1"], r["w2"], r["pair_count"], r["lift"], r["rank"]) for r in a]
    kb = [(r["w1"], r["w2"], r["pair_count"], r["lift"], r["rank"]) for r in b]
    assert sorted(ka) == sorted(kb)
