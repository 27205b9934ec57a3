"""n-gram language-model quality scoring (the CCNet/KenLM filter axis).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model trained on a clean reference corpus; documents far
from the reference distribution are filtered or bucketed. This module is
that filter re-expressed Spark-first with **Stupid Backoff** (Brants et
al. 2007, "Large Language Models in Machine Translation") instead of
Kneser-Ney: Stupid Backoff was designed exactly for the distributed
count-table setting — scores are plain count ratios with a fixed backoff
multiplier α, no discount normalization pass, so the "model" is just a
mergeable (context, word, count) table.

    S(w | ctx_n)   = c(ctx_n w) / c(ctx_n)            if c(ctx_n w) > 0
                   = α · S(w | ctx_{n-1})             otherwise
    S(w)           = (c(w) + 1) / (N + 1)             (add-one unigram floor,
                                                       OOV-safe)

Determinism discipline (docs/SCALE_NOTES.md §17): each position's
ln-score is quantized to an integer micro-nat (`round(ln(S)·10⁶)`) BEFORE
aggregation, so the per-document sum is an integer sum — identical at any
partition count, summation order, or engine. The float ops feeding it
(count ratios, α products, `ln`) are single IEEE expressions evaluated
identically by Spark and DuckDB (the tfidf/bm25 oracles already pin
`ln` cross-engine).

Scale plan (100 TB posture): the count table is *vocabulary*-sized
(Heaps' law — ~10⁷-10⁸ distinct n-grams at corpus scale, vs ~10¹¹ token
occurrences), built with partial-aggregatable groupBys whose shuffle rows
carry (ctx, word, cnt) — map-side combine collapses each partition's
repeats first. Scoring joins the position stream against the count table
on (ctx, word); at reference-corpus scale (the CCNet posture: train on a
curated subset) the table broadcasts, otherwise it shuffle-joins — both
linear. No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graph_data_science_spark.operators.dedup import _norm

#: BOS padding token — one char outside any normalized token alphabet
#: (normalization collapses whitespace; \\x01 never appears in text tokens).
BOS = "\x01"


def _positions(docs: DataFrame, n: int, text_col: str,
               id_col: str) -> DataFrame:
    """(doc_id, i, w, ctx2..ctxn): one row per token position with its
    (k-1)-word contexts for k = 2..n, BOS-padded at the document start.

    Empty tokens are filtered (the corpus-wide convention, e.g.
    token_budget_sample): text whose normalization is all-whitespace
    contributes nothing, and leading non-space whitespace (\\n, \\t —
    which trim does not strip) cannot smuggle a phantom '' token into the
    model. The SQL oracle applies the identical ``list_filter``."""
    ws = F.filter(F.split(_norm(F.col(text_col)), " "), lambda t: t != "")
    base = (
        docs.select(F.col(id_col).alias("doc_id"), ws.alias("_ws"))
        .where(F.size("_ws") > 0)
        .withColumn("_p", F.concat(
            F.array_repeat(F.lit(BOS), n - 1), F.col("_ws")))
    )
    pos = base.select(
        "doc_id", "_p", F.posexplode("_ws").alias("i", "w"))
    # context of order k (k-1 words): 0-based padded slice [i+n-k, i+n-2],
    # 1-based F.slice start = i + n - k + 1
    ctx_cols = [
        F.concat_ws(" ", F.slice(
            F.col("_p"), F.col("i") + (n - k + 1), k - 1)).alias(f"ctx{k}")
        for k in range(2, n + 1)
    ]
    return pos.select("doc_id", "i", "w", *ctx_cols)


def ngram_lm_counts(docs: DataFrame, n: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Train the count table → long format ``(k, ctx, word, cnt)`` for
    k = 1..n (``ctx = ''`` at k=1). This IS the model artifact: persist it
    once over the reference corpus, reuse it across scoring runs, merge
    increments by summing cnt (Stupid Backoff needs no renormalization —
    the Brants et al. distributed-LM property)."""
    pos = _positions(docs, n, text_col, id_col)
    parts = [
        pos.groupBy(F.col("w").alias("word")).agg(
            F.count(F.lit(1)).alias("cnt"))
        .select(F.lit(1).alias("k"), F.lit("").alias("ctx"), "word", "cnt")
    ]
    for k in range(2, n + 1):
        parts.append(
            pos.groupBy(F.col(f"ctx{k}").alias("ctx"),
                        F.col("w").alias("word"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(k).alias("k"), "ctx", "word", "cnt"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ngram_lm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two count tables (e.g. daily increments) → one count table.
    Stupid Backoff scores are pure count ratios, so merging is an exact
    integer sum — ``counts(A ∪ B) == merge(counts(A), counts(B))``
    bit-for-bit (pytest-pinned), the same persisted-artifact posture as
    ``sketches.hll_merge``."""
    return (a.unionByName(b)
            .groupBy("k", "ctx", "word")
            .agg(F.sum("cnt").alias("cnt")))


def ngram_lm_score(docs: DataFrame, counts: DataFrame | None = None,
                   n: int = 3, alpha: float = 0.4, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Score documents against the count table → ``(doc_id, n_scored,
    lm_score)`` where ``lm_score`` is the mean ln Stupid-Backoff score per
    token (≤ 0; closer to 0 = more reference-like; CCNet's perplexity
    ranking is ``exp(-lm_score)``-monotone). ``counts=None`` self-trains
    on ``docs`` (the oracle/gate configuration); the CCNet posture passes
    a table trained on a curated reference corpus.

    Documents with no tokens score ``(0, 0.0)``. Aggregation is an
    integer sum of per-position micro-nats — order-independent by
    construction (module docstring)."""
    if counts is None:
        # materialize the vocabulary-sized table once: the scalar N action
        # and the five scoring-join branches all read the cached copy
        # instead of re-aggregating the corpus per reference (exchange
        # reuse does not span actions). Single eager checkpoint — terminal
        # materialization, not a chained truncation.
        counts = ngram_lm_counts(
            docs, n=n, text_col=text_col, id_col=id_col
        ).localCheckpoint(eager=True)
    pos = _positions(docs, n, text_col, id_col)

    uni = counts.where(F.col("k") == 1).select(
        F.col("word").alias("w"), F.col("cnt").alias("_c1"))
    n_total = counts.where(F.col("k") == 1).agg(F.sum("cnt")).first()[0] or 0

    scored = pos.join(uni, "w", "left")
    for k in range(2, n + 1):
        ck = counts.where(F.col("k") == k).select(
            F.col("ctx").alias(f"ctx{k}"), F.col("word").alias("w"),
            F.col("cnt").alias(f"_c{k}"))
        tk = counts.where(F.col("k") == k).groupBy(
            F.col("ctx").alias(f"ctx{k}")).agg(
            F.sum("cnt").alias(f"_t{k}"))
        scored = (scored
                  .join(ck, ["w", f"ctx{k}"], "left")
                  .join(tk, f"ctx{k}", "left"))

    # Stupid Backoff, highest order first; operand order mirrored exactly
    # in the SQL oracle (alpha * (CASE ... ELSE alpha * uni END))
    a = float(alpha)
    s = (F.coalesce(F.col("_c1"), F.lit(0)).cast("double") + 1.0) / (
        float(n_total) + 1.0)
    for k in range(2, n + 1):
        s = F.when(
            F.col(f"_c{k}").isNotNull(),
            F.col(f"_c{k}").cast("double") / F.col(f"_t{k}").cast("double"),
        ).otherwise(F.lit(a) * s)

    micro = F.round(F.log(s) * F.lit(1000000.0), 0).cast("long")
    per_doc = (scored.select("doc_id", micro.alias("_m"))
               .groupBy("doc_id")
               .agg(F.sum("_m").alias("_sum"),
                    F.count(F.lit(1)).alias("n_scored")))
    all_ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return (
        all_ids.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_scored", F.lit(0)).cast("long").alias("n_scored"),
            F.coalesce(
                F.round(F.col("_sum").cast("double")
                        / F.col("n_scored") / 1000000.0, 6),
                F.lit(0.0)).alias("lm_score"),
        )
    )


def lm_perplexity_buckets(docs: DataFrame, counts: DataFrame | None = None,
                          n_buckets: int = 3, n: int = 3,
                          alpha: float = 0.4, text_col: str = "text",
                          id_col: str = "doc_id",
                          range_buckets: int = 64) -> DataFrame:
    """CCNet's head/middle/tail split → ``(doc_id, lm_score, bucket)``,
    ``bucket ∈ 1..n_buckets`` with 1 = most reference-like (lowest
    perplexity). Exactly SQL ``NTILE(n_buckets) OVER (ORDER BY lm_score
    DESC, doc_id)`` — equal-count buckets, the first ``n mod B`` buckets
    one row larger — over documents with at least one scored token.

    Scale plan (SCALE_NOTES §21 discipline — an ORDER BY in the semantics
    never implies an ORDER BY in the plan): the global rank decomposes
    two-level. The order key range-buckets by score (ties share a bucket,
    so bucket boundaries respect the total order), per-bucket counts come
    to the driver (``range_buckets`` rows), their exclusive prefix
    returns as a broadcast join, and the within-bucket ``row_number``
    window partitions by bucket. The NTILE boundary arithmetic is exact
    integer math on driver-known (n, B) literals — no floats anywhere in
    the rank→bucket map.
    """
    from graph_data_science_spark.plans.partitioning import (
        bucketed_exclusive_prefix)

    B = int(n_buckets)
    scored = (
        ngram_lm_score(docs, counts=counts, n=n, alpha=alpha,
                       text_col=text_col, id_col=id_col)
        .where(F.col("n_scored") > 0)
        .select("doc_id", "lm_score",
                (-F.col("lm_score")).alias("_key"))
    )
    scored = scored.localCheckpoint(eager=True)  # 3 actions, 1 materialization
    stats = scored.agg(
        F.min("_key").alias("lo"), F.max("_key").alias("hi"),
        F.count(F.lit(1)).alias("n")).first()
    total = int(stats["n"] or 0)
    if total == 0:
        return scored.select("doc_id", "lm_score",
                             F.lit(0).cast("int").alias("bucket"))
    lo, hi = float(stats["lo"]), float(stats["hi"])
    rb = int(range_buckets)
    if hi > lo:
        b = F.least(
            F.floor((F.col("_key") - lo) / (hi - lo) * rb).cast("long"),
            F.lit(rb - 1))
    else:
        b = F.lit(0).cast("long")
    ranked = (
        bucketed_exclusive_prefix(
            scored.withColumn("_b", b), "_b", ["_key", "doc_id"], rb,
            value=None, out="_r0")
        .select("doc_id", "lm_score",
                (F.col("_r0") + 1).alias("_r"))
    )
    # NTILE(B) over n rows: first rem = n % B buckets hold q+1 = n//B + 1
    # rows; ceil(a/b) = (a + b - 1) div b on positive longs
    q, rem = divmod(total, B)
    head = rem * (q + 1)
    if q == 0:
        # n < B: every row is its own bucket (NTILE gives ranks 1..n)
        bucket = F.col("_r")
    else:
        # integer ceil without floats: ceil(a/b) = (a + b - 1) DIV b
        bucket = F.when(
            F.col("_r") <= head,
            F.expr(f"CAST((_r + {q}) DIV {q + 1} AS INT)"),
        ).otherwise(
            F.expr(f"CAST({rem} + (_r - {head} + {q - 1}) DIV {q} AS INT)"))
    return ranked.select(
        "doc_id", "lm_score",
        bucket.cast("int").alias("bucket"))
