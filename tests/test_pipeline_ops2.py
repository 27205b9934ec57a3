"""Session-6 corpus ops: regex_redact, shuffle_shards, token_budget_sample.

The sf-table DuckDB value-hash oracles live in test_entry_oracle.py /
the driver gate; these tests pin the SEMANTIC contracts on crafted inputs:
sequential redaction, shard-concatenation = global permutation, and budget
monotonicity / exactness of the two-level prefix sum.
"""

from pyspark.sql import functions as F

from graph_data_science_spark.operators.pipeline_ops import (
    regex_redact,
    shuffle_shards,
    token_budget_sample,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_regex_redact_replaces_and_counts(spark):
    docs = _docs(spark, [
        "mail me at Bob.Smith@example.com or 10.0.0.1",
        "card 1234567890123456 twice 9876543210",
        "nothing here",
    ])
    got = {r["doc_id"]: r for r in regex_redact(docs).collect()}
    assert got[0]["redacted"] == "mail me at <EMAIL> or <IP>"
    assert got[0]["n_redacted"] == 2
    assert got[1]["redacted"] == "card <NUM> twice <NUM>"
    assert got[1]["n_redacted"] == 2
    assert got[2]["redacted"] == "nothing here"
    assert got[2]["n_redacted"] == 0


def test_regex_redact_sequential_order(spark):
    # digit_run applies BEFORE ipv4 (sorted-name order), so a 9+-digit run
    # inside a dotted quad is consumed first — the sequential contract
    docs = _docs(spark, ["123456789.1.1.1"])
    row = regex_redact(docs).collect()[0]
    assert row["redacted"] == "<NUM>.1.1.1"
    assert row["n_redacted"] == 1


def test_shuffle_shards_is_a_permutation_in_global_order(spark):
    from graph_data_science_spark.operators.embeddings import _u01

    docs = spark.range(200).select(F.col("id").alias("doc_id"),
                                   F.lit("x").alias("text"))
    out = shuffle_shards(docs, n_shards=4).collect()
    assert len(out) == 200
    assert sorted(r["doc_id"] for r in out) == list(range(200))
    # every shard's pos is 1..len(shard) (contiguous rank)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # concatenating shards 0..N-1 in pos order reproduces the global
    # u-order permutation (range-bucketed key ⇒ shards are contiguous spans)
    concat = [r["doc_id"] for r in sorted(out, key=lambda r: (r["shard"], r["pos"]))]
    us = {r["doc_id"]: r["u"] for r in docs.select(
        "doc_id", _u01(F.col("doc_id"), F.lit("shuffle"), F.lit(42)).alias("u")
    ).collect()}
    assert concat == sorted(range(200), key=lambda i: (us[i], i))
    # deterministic across partitionings
    again = shuffle_shards(docs.repartition(7), n_shards=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_token_budget_sample_exact_prefix(spark):
    texts = [f"w{i} " * (i + 1) for i in range(50)]  # doc i has i+1 tokens
    docs = _docs(spark, [t.strip() for t in texts])
    out = token_budget_sample(docs, budget_tokens=100, n_buckets=8)
    rows = out.collect()
    assert {r["doc_id"]: r["n_tokens"] for r in rows} == {
        i: i + 1 for i in range(50)}
    # kept set == greedy prefix of the deterministic order (single-pass ref)
    from graph_data_science_spark.operators.embeddings import _u01
    us = {r["doc_id"]: r["u"] for r in docs.select(
        "doc_id", _u01(F.col("doc_id"), F.lit("budget"), F.lit(42)).alias("u")
    ).collect()}
    order = sorted(range(50), key=lambda i: (us[i], i))
    acc, expect = 0, {}
    for i in order:
        expect[i] = acc < 100
        acc += i + 1
    assert {r["doc_id"]: r["kept"] for r in rows} == expect


def test_token_budget_monotone_in_budget(spark):
    docs = _docs(spark, [f"t{i} token word" for i in range(30)])
    small = {r["doc_id"] for r in
             token_budget_sample(docs, 20, n_buckets=4).collect() if r["kept"]}
    big = {r["doc_id"] for r in
           token_budget_sample(docs, 60, n_buckets=4).collect() if r["kept"]}
    assert small <= big
    # bucket count never changes the decision (two-level sum is exact)
    other = {r["doc_id"] for r in
             token_budget_sample(docs, 20, n_buckets=13).collect() if r["kept"]}
    assert other == small


def test_near_duplicate_keep_longest(spark):
    from graph_data_science_spark.operators.pipeline_ops import (
        near_duplicate_keep)

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, base, len(base)),
            (1, base + " extra", len(base) + 6),       # longest near-dup
            (2, base + " other", len(base) + 6),       # same length: id tie
            (3, "completely different words entirely unrelated text", 50),
        ],
        "doc_id long, text string, n_chars long",
    )
    got = {r["doc_id"]: r for r in
           near_duplicate_keep(docs, num_hashes=8, bands=4).collect()}
    cluster = {got[i]["cluster_id"] for i in (0, 1, 2)}
    assert len(cluster) == 1          # the three near-dups share a cluster
    assert not got[0]["kept"]         # shortest loses
    assert got[1]["kept"]             # longest, lowest id on the tie
    assert not got[2]["kept"]
    assert got[3]["kept"]             # singleton keeps itself


def test_prepare_training_data_composition(spark):
    from graph_data_science_spark.operators.pipeline_ops import (
        decontaminate, near_duplicate_keep, prepare_training_data)
    from graph_data_science_spark.operators.text import quality_score

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").localCheckpoint()
    seqs, manifest = prepare_training_data(docs, quality_threshold=0.5)
    rows = seqs.collect()

    # manifest is a monotone funnel starting at the corpus size
    assert manifest["input"] == docs.count()
    assert (manifest["input"] >= manifest["quality"]
            >= manifest["dedup"] >= manifest["decontaminated"] > 0)
    # one row per (doc, sequence) PLACEMENT — a doc straddling sequence
    # boundaries emits several; distinct docs = the funnel's survivors
    assert len({r["doc_id"] for r in rows}) == manifest["decontaminated"]

    # every emitted doc individually passes each stage's own operator
    ids = {r["doc_id"] for r in rows}
    ok_q = {r["doc_id"] for r in quality_score(docs).where(
        "quality >= 0.5").collect()}
    assert ids <= ok_q
    surv1 = docs.join(spark.createDataFrame(
        [(i,) for i in sorted(ok_q)], "doc_id long"), "doc_id", "left_semi")
    kept = {r["doc_id"] for r in near_duplicate_keep(surv1).where(
        "kept").collect()}
    assert ids <= kept
    # deterministic: second run identical
    seqs2, manifest2 = prepare_training_data(docs, quality_threshold=0.5)
    assert manifest2 == manifest
    assert {tuple(r) for r in seqs2.collect()} == {tuple(r) for r in rows}


def test_prepare_training_data_optional_stages(spark):
    """The session-8 optional stages: CCNet LM bucket filter + duplicate
    span removal compose into the journey, tighten the funnel, and stay
    consistent with their standalone operators."""
    from graph_data_science_spark.operators.dedup import (
        remove_duplicate_spans)
    from graph_data_science_spark.operators.lm import lm_perplexity_buckets
    from graph_data_science_spark.operators.pipeline_ops import (
        prepare_training_data)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").localCheckpoint()
    seqs, manifest = prepare_training_data(
        docs, quality_threshold=0.5,
        lm_keep_buckets=2, lm_n_buckets=3, remove_spans_k=8)

    # funnel extends monotonically through the LM stage
    assert (manifest["decontaminated"] >= manifest["lm_filtered"] > 0)
    assert manifest["span_tokens_removed"] >= 0
    # ~2/3 of the decontaminated docs survive a keep-2-of-3 bucket cut
    assert manifest["lm_filtered"] <= manifest["decontaminated"]

    ids = {r["doc_id"] for r in seqs.collect()}
    assert len(ids) == manifest["lm_filtered"]

    # base journey unchanged when the optional stages are off
    _, base_manifest = prepare_training_data(docs, quality_threshold=0.5)
    assert "lm_filtered" not in base_manifest
    assert "span_tokens_removed" not in base_manifest
