"""Stupid-Backoff n-gram LM scoring vs a pure-Python reference."""

import math

import pytest

from graph_data_science_spark.operators.lm import (
    BOS,
    ngram_lm_counts,
    ngram_lm_score,
)


def _half_up(x, digits):
    """Spark/DuckDB ROUND semantics: HALF_UP on the shortest-decimal
    expansion (BigDecimal.valueOf) — Python's round() is banker's and
    diverges at exact .5 boundaries (e.g. a 2-token doc whose micro sum
    is odd)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _ref_scores(train_rows, score_rows, n=3, alpha=0.4):
    """Independent reference: same formula, dict-based."""
    from collections import Counter

    def toks(t):
        return " ".join(t.lower().split()).split(" ") if t.strip() else []

    counts = [Counter() for _ in range(n + 1)]  # counts[k]
    for _, t in train_rows:
        ts = toks(t)
        p = [BOS] * (n - 1) + ts
        for i, w in enumerate(ts):
            counts[1][w] += 1
            for k in range(2, n + 1):
                ctx = " ".join(p[i + n - k: i + n - 1])
                counts[k][(ctx, w)] += 1
    ctx_tot = [None, None] + [Counter() for _ in range(2, n + 1)]
    for k in range(2, n + 1):
        for (ctx, _w), c in counts[k].items():
            ctx_tot[k][ctx] += c
    n_total = sum(counts[1].values())

    out = {}
    for d, t in score_rows:
        ts = toks(t)
        p = [BOS] * (n - 1) + ts
        micros = []
        for i, w in enumerate(ts):
            s = (counts[1].get(w, 0) + 1.0) / (n_total + 1.0)
            for k in range(2, n + 1):
                ctx = " ".join(p[i + n - k: i + n - 1])
                c = counts[k].get((ctx, w))
                if c:
                    s = c / ctx_tot[k][ctx]
                else:
                    s = alpha * s
            micros.append(int(_half_up(math.log(s) * 1e6, 0)))
        if micros:
            out[d] = (len(micros),
                      _half_up(sum(micros) / len(micros) / 1e6, 6))
        else:
            out[d] = (0, 0.0)
    return out


ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "a dog ran in the park"),
    (4, "the cat sat on the mat again and again"),
    (5, ""),
    # review findings 1-2: trim strips only spaces, so non-space
    # whitespace must neither create phantom '' tokens (doc 7) nor turn a
    # whitespace-only doc into scored tokens (doc 6)
    (6, "\n\t"),
    (7, "\nthe cat"),
]


def test_self_scored_matches_reference(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_scored"], r["lm_score"])
           for r in ngram_lm_score(df).collect()}
    assert got == _ref_scores(ROWS, ROWS)


def test_counts_table_shape(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    c = ngram_lm_counts(df, n=3)
    rows = c.collect()
    # unigram total == token count
    n1 = sum(r["cnt"] for r in rows if r["k"] == 1)
    assert n1 == sum(len(t.split()) for _, t in ROWS)
    # every order-k context total equals order-k occurrence total
    for k in (2, 3):
        assert sum(r["cnt"] for r in rows if r["k"] == k) == n1


def test_train_score_split_and_oov(spark):
    train = spark.createDataFrame(ROWS[:4], ["doc_id", "text"])
    score = spark.createDataFrame(
        [(10, "the cat sat on the mat"),        # fully in-distribution
         (11, "zz yy xx ww vv uu")],            # all OOV
        ["doc_id", "text"])
    counts = ngram_lm_counts(train)
    got = {r["doc_id"]: r for r in
           ngram_lm_score(score, counts=counts).collect()}
    ref = _ref_scores(ROWS[:4], [(10, "the cat sat on the mat"),
                                 (11, "zz yy xx ww vv uu")])
    for d in (10, 11):
        assert (got[d]["n_scored"], got[d]["lm_score"]) == ref[d]
    # the in-distribution doc scores strictly better than the OOV doc
    assert got[10]["lm_score"] > got[11]["lm_score"]


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    a = {r["doc_id"]: r["lm_score"]
         for r in ngram_lm_score(df.repartition(1)).collect()}
    b = {r["doc_id"]: r["lm_score"]
         for r in ngram_lm_score(df.repartition(7, "doc_id")).collect()}
    assert a == b


def test_bigram_order(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_scored"], r["lm_score"])
           for r in ngram_lm_score(df, n=2).collect()}
    assert got == _ref_scores(ROWS, ROWS, n=2)


def test_empty_doc_scores_zero(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in ngram_lm_score(df).collect()}
    assert got[5]["n_scored"] == 0 and got[5]["lm_score"] == 0.0
    # whitespace-only doc contributes nothing; leading \n adds no '' token
    assert got[6]["n_scored"] == 0 and got[6]["lm_score"] == 0.0
    assert got[7]["n_scored"] == 2


def test_merge_equals_union_counts(spark):
    from graph_data_science_spark.operators.lm import ngram_lm_merge

    d1 = spark.createDataFrame(ROWS[:2], ["doc_id", "text"])
    d2 = spark.createDataFrame(ROWS[2:], ["doc_id", "text"])
    whole = spark.createDataFrame(ROWS, ["doc_id", "text"])
    merged = {(r["k"], r["ctx"], r["word"]): r["cnt"]
              for r in ngram_lm_merge(
                  ngram_lm_counts(d1), ngram_lm_counts(d2)).collect()}
    direct = {(r["k"], r["ctx"], r["word"]): r["cnt"]
              for r in ngram_lm_counts(whole).collect()}
    assert merged == direct


def _ref_ntile(scores, B):
    """NTILE over (lm_score DESC, doc_id ASC): first n%B buckets get one
    extra row."""
    ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ordered)
    q, rem = divmod(n, B)
    out, r = {}, 0
    for b in range(1, B + 1):
        size = q + (1 if b <= rem else 0)
        for _ in range(size):
            out[ordered[r][0]] = b
            r += 1
    return out


@pytest.mark.parametrize("B", [2, 3, 5])
def test_perplexity_buckets_match_ntile(spark, B):
    from graph_data_science_spark.operators.lm import lm_perplexity_buckets

    rows = ROWS + [(16, "the cat sat"), (17, "park ran dog a"),
                   (18, "on the mat the cat sat")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["bucket"]
           for r in lm_perplexity_buckets(df, n_buckets=B).collect()}
    scores = {d: s for d, (ns, s) in _ref_scores(rows, rows).items() if ns > 0}
    assert got == _ref_ntile(scores, B)


def test_perplexity_buckets_excludes_empty_docs(spark):
    from graph_data_science_spark.operators.lm import lm_perplexity_buckets

    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = lm_perplexity_buckets(df, n_buckets=3).collect()
    ids = {r["doc_id"] for r in got}
    assert 5 not in ids and 6 not in ids   # empty + whitespace-only docs
    assert len(got) == 5


def test_perplexity_buckets_equal_counts(spark):
    from graph_data_science_spark.operators.lm import lm_perplexity_buckets

    rows = [(i, f"tok{i % 4} alpha beta tok{i % 7} gamma") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = lm_perplexity_buckets(df, n_buckets=3).collect()
    from collections import Counter
    sizes = Counter(r["bucket"] for r in got)
    assert sorted(sizes.keys()) == [1, 2, 3]
    assert all(v == 10 for v in sizes.values())


def test_streaming_lm_counts_match_batch_training(spark, tmp_path):
    """Drain two document drops through the streaming maintainer: the
    persisted count table must equal one-pass batch training on the union
    EXACTLY (integer-sum merge is associative — exact model training,
    not an approximation)."""
    import os

    from graph_data_science_spark.streaming.ingest import (
        run_streaming_lm_counts)

    drop = os.path.join(str(tmp_path), "lm_drop")
    state = os.path.join(str(tmp_path), "lm_state")
    df = spark.createDataFrame(
        [(d, t, "en") for d, t in ROWS], ["doc_id", "text", "lang"])
    half1 = df.where("doc_id % 2 = 0")
    half2 = df.where("doc_id % 2 = 1")

    half1.write.mode("append").parquet(drop)
    s1 = {(r["k"], r["ctx"], r["word"]): r["cnt"]
          for r in run_streaming_lm_counts(spark, drop, state).collect()}
    want1 = {(r["k"], r["ctx"], r["word"]): r["cnt"]
             for r in ngram_lm_counts(half1).collect()}
    assert s1 == want1

    half2.write.mode("append").parquet(drop)
    s2 = {(r["k"], r["ctx"], r["word"]): r["cnt"]
          for r in run_streaming_lm_counts(spark, drop, state).collect()}
    want2 = {(r["k"], r["ctx"], r["word"]): r["cnt"]
             for r in ngram_lm_counts(df).collect()}
    assert s2 == want2

    # and the maintained model scores identically to batch self-training
    got = {r["doc_id"]: r["lm_score"] for r in ngram_lm_score(
        df, counts=run_streaming_lm_counts(spark, drop, state)).collect()}
    want = {r["doc_id"]: r["lm_score"] for r in ngram_lm_score(df).collect()}
    assert got == want


def test_streaming_lm_replay_guard(spark, tmp_path):
    """foreachBatch is at-least-once: simulate redelivery by wiping the
    stream checkpoint (offsets lost) while keeping the state slots — the
    redelivered batch must be SKIPPED, not sum-merged a second time
    (sum-merge is not idempotent; without the guard every cnt doubles)."""
    import os
    import shutil

    from graph_data_science_spark.streaming.ingest import (
        run_streaming_lm_counts)

    drop = os.path.join(str(tmp_path), "drop")
    state = os.path.join(str(tmp_path), "state")
    df = spark.createDataFrame(
        [(d, t, "en") for d, t in ROWS], ["doc_id", "text", "lang"])
    df.write.mode("append").parquet(drop)

    c1 = {(r["k"], r["ctx"], r["word"]): r["cnt"]
          for r in run_streaming_lm_counts(spark, drop, state).collect()}
    shutil.rmtree(os.path.join(state, "_checkpoint"))  # lose the offsets
    c2 = {(r["k"], r["ctx"], r["word"]): r["cnt"]
          for r in run_streaming_lm_counts(spark, drop, state).collect()}
    assert c2 == c1  # replayed batch skipped — no double counting


def test_streaming_lm_empty_drop_zone(spark, tmp_path):
    import os

    from graph_data_science_spark.streaming.ingest import (
        run_streaming_lm_counts)

    drop = os.path.join(str(tmp_path), "empty_drop")
    state = os.path.join(str(tmp_path), "empty_state")
    os.makedirs(drop)
    out = run_streaming_lm_counts(spark, drop, state)
    assert out.columns == ["k", "ctx", "word", "cnt"]
    assert out.count() == 0
