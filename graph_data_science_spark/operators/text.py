"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

These are the large-scale-corpus operators a 100 TB training-data pipeline
needs on top of the graph suite (the ``documents`` table is the target).
Every function is pure ``pyspark.sql.functions`` — whole-stage codegen, no
Python in the hot path — and every definition has an exactly-matching ANSI
SQL oracle in ``__spark_entry__.py`` (portability constraint: only
constructs with identical semantics in Spark SQL and DuckDB — regexp_replace,
split on ``\\s+``, md5, length, lower).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: tiny per-language stopword marker lists for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def _tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count → ``(doc_id, n_tokens)``. Empty/blank text → 0."""
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(c)) == 0, F.lit(0))
        .otherwise(F.size(_tokens(c)))
        .cast("long")
        .alias("n_tokens"),
    )


def token_count_bpe_ish(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish sub-token count: splits on whitespace AND word/punct/digit
    boundaries (the usual pre-tokenizer regex shape) → ``(doc_id, n_subtokens)``.
    """
    c = F.col(text_col)
    # count matches of: word runs | digit runs | single non-space punctuation
    pattern = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return docs.select(
        "doc_id",
        F.coalesce(F.regexp_count(c, F.lit(pattern)), F.lit(0))
        .cast("long")
        .alias("n_subtokens"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality → ``(doc_id, n_chars, n_tokens, alpha_ratio,
    space_ratio, mean_token_len, quality)``.

    quality = clamp01(0.3·lenScore + 0.4·alphaRatio + 0.3·tokenLenScore):
    - lenScore: 1 when 200 ≤ n_chars ≤ 8000, linearly down to 0 outside
    - tokenLenScore: 1 when mean token length in [3, 10]
    All doubles rounded to 6dp for cross-engine stability.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(_tokens(c)))
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    spaces = F.length(F.regexp_replace(c, r"[^ ]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    space_ratio = F.when(n_chars > 0, spaces / n_chars).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tokens > 0, (alpha + F.lit(0.0)) / n_tokens).otherwise(F.lit(0.0))
    len_score = F.when(n_chars < 200, n_chars / F.lit(200.0)).when(
        n_chars > 8000, F.greatest(F.lit(0.0), 1 - (n_chars - 8000) / F.lit(8000.0))
    ).otherwise(F.lit(1.0))
    tok_score = (
        F.when(mean_tok < 3, mean_tok / F.lit(3.0))
        .when(mean_tok > 10, F.greatest(F.lit(0.0), 1 - (mean_tok - 10) / F.lit(10.0)))
        .otherwise(F.lit(1.0))
    )
    quality = F.least(
        F.lit(1.0),
        F.greatest(F.lit(0.0), 0.3 * len_score + 0.4 * alpha_ratio + 0.3 * tok_score),
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(space_ratio, 6).alias("space_ratio"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language heuristic → ``(doc_id, lang_pred, lang_hits)``.

    Counts whole-word marker hits per language on the lowered text; argmax,
    ties → lexicographically smallest language code; no hits → 'und'.
    """
    c = F.lower(F.col(text_col))
    hit_cols = []
    for lang, words in sorted(LANG_MARKERS.items()):
        pat = r"\b(" + "|".join(words) + r")\b"
        hit_cols.append(
            F.coalesce(F.regexp_count(c, F.lit(pat)), F.lit(0)).alias(f"_h_{lang}")
        )
    scored = docs.select("doc_id", *hit_cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_h_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in langs:  # first match in sorted order wins ties
        pred = pred.when(F.col(f"_h_{l}") == best, F.lit(l))
    return scored.select(
        "doc_id",
        pred.alias("lang_pred"),
        best.cast("long").alias("lang_hits"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", ngram: int = 5) -> DataFrame:
    """Winnowing-style document fingerprint → ``(doc_id, fingerprint)``.

    Normalize (lower, collapse whitespace) → word ``ngram``-shingles → md5
    per shingle → the lexicographically smallest hash is the fingerprint
    (a 1-minhash; identical docs → identical fingerprint, near-identical
    docs usually share it). Documents shorter than ``ngram`` words fall
    back to md5 of the normalized text.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    words = F.split(norm, " ")
    n = F.size(words)
    shingles = F.expr(
        f"transform(sequence(0, size(split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' ')) - {ngram}), "
        f"i -> concat_ws(' ', slice(split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' '), i + 1, {ngram})))"
    )
    return docs.select(
        "doc_id",
        F.when(
            n >= ngram,
            F.array_min(F.transform(shingles, lambda s: F.md5(s))),
        )
        .otherwise(F.md5(norm))
        .alias("fingerprint"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals →
    ``(doc_id, n_words, distinct_word_frac, top_bigram_frac,
    dup_5gram_frac)`` — the standard pre-training repetition filters
    (Rae et al. 2021 "Scaling Language Models" §A1.1: fraction of
    duplicate n-grams / characters in the most common n-gram), re-expressed
    on the whitespace tokenizer every other text op here shares.

    - ``distinct_word_frac``: |distinct words| / |words| (low = repetitive)
    - ``top_bigram_frac``: occurrences of the most frequent word 2-gram /
      total 2-grams
    - ``dup_5gram_frac``: 1 − |distinct 5-grams| / |5-grams| (fraction of
      5-gram occurrences that are repeats)

    All three are ROUND(…, 6) for engine-portable equality. Docs with too
    few words for an n-gram level report 0.0 there.

    Spark plan: the per-word signals stay inside one projection
    (``array_distinct`` on the split array — no explode, no shuffle); the
    two n-gram levels each explode to (doc_id, md5(gram)) and partial-agg
    count — shuffle rows carry a 32-byte hash + doc_id, never text. At
    100 TB this is two occurrence-sized map-side-combinable aggs, the same
    shape as corpus_vocabulary; n_chars never moves after the map side.
    """
    t = F.trim(F.col(text_col))
    words = F.split(t, r"\s+")
    n = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(words))

    base = docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.when(n > 0,
               F.round(F.size(F.array_distinct(words))
                       / n.cast("double"), 6))
        .otherwise(F.lit(0.0)).alias("distinct_word_frac"),
        words.alias("_ws"),
    )

    def _gram_frac(k: int, agg: str, out: str) -> DataFrame:
        grams = F.expr(
            f"transform(sequence(0, size(split(trim({text_col}), '\\\\s+')) - {k}), "
            f"i -> md5(concat_ws(' ', slice(split(trim({text_col}), '\\\\s+'), i + 1, {k}))))")
        # guard: sequence(0, negative) descends in Spark, producing bogus
        # partial slices — docs shorter than k words have no k-grams
        ex = (docs.where(F.size(F.split(F.trim(F.col(text_col)),
                                        r"\s+")) >= k)
              .select("doc_id", F.explode(grams).alias("_g"))
              .groupBy("doc_id", "_g").agg(F.count(F.lit(1)).alias("_c")))
        per = ex.groupBy("doc_id").agg(
            F.max("_c").alias("_mx"), F.sum("_c").alias("_tot"),
            F.count(F.lit(1)).alias("_dst"))
        if agg == "top":
            val = F.col("_mx") / F.col("_tot")
        else:  # dup
            val = F.lit(1.0) - F.col("_dst") / F.col("_tot")
        return per.select("doc_id", F.round(val, 6).alias(out))

    bg = _gram_frac(2, "top", "top_bigram_frac")
    g5 = _gram_frac(5, "dup", "dup_5gram_frac")
    return (base.join(bg, "doc_id", "left").join(g5, "doc_id", "left")
            .select("doc_id", "n_words", "distinct_word_frac",
                    F.coalesce("top_bigram_frac", F.lit(0.0))
                    .alias("top_bigram_frac"),
                    F.coalesce("dup_5gram_frac", F.lit(0.0))
                    .alias("dup_5gram_frac")))
