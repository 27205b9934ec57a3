"""Text analysis + dedup operators: deterministic expectations on small docs."""

import pytest

from graph_data_science_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from graph_data_science_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
    token_count_bpe_ish,
)
from tests.conftest import rows_to_dict

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),       # exact dup of 0
    (2, "THE  quick   brown fox jumps over the lazy dog "),   # dup after norm
    (3, "the quick brown fox jumps over the sleepy dog"),     # near dup
    (4, "el perro y el gato de la casa que hay"),
    (5, ""),
    (6, "completely different content about spark engines"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_count(docs):
    got = rows_to_dict(token_count(docs), "doc_id", "n_tokens")
    assert got == {0: 9, 1: 9, 2: 9, 3: 9, 4: 10, 5: 0, 6: 6}


def test_token_count_bpe_ish(spark):
    df = spark.createDataFrame(
        [(0, "hello, world! x2"), (1, "")], "doc_id long, text string"
    )
    got = rows_to_dict(token_count_bpe_ish(df), "doc_id", "n_subtokens")
    # hello , world ! x 2 → 6
    assert got == {0: 6, 1: 0}


def test_exact_duplicates(docs):
    got = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in exact_duplicates(docs).collect()}
    assert got[0] == (0, 3) and got[1] == (0, 3) and got[2] == (0, 3)
    assert got[3] == (3, 1)
    assert got[6] == (6, 1)


def test_quality_score(docs):
    rows = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert rows[5]["n_tokens"] == 0 and rows[5]["quality"] <= 0.3
    assert 0.0 <= rows[0]["quality"] <= 1.0
    assert rows[0]["alpha_ratio"] > 0.7


def test_language_id(docs):
    got = rows_to_dict(language_id(docs), "doc_id", "lang_pred")
    assert got[0] == "en"
    assert got[4] == "es"
    assert got[5] == "und"


def test_fingerprint_dups_share(docs):
    got = rows_to_dict(fingerprint(docs), "doc_id", "fingerprint")
    assert got[0] == got[1] == got[2]
    assert got[0] != got[6]


def test_minhash_signature_shape(docs):
    sig = minhash_signatures(docs, num_hashes=8).collect()
    by_doc = {}
    for r in sig:
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    assert all(v == set(range(8)) for v in by_doc.values())


def test_minhash_lsh_finds_exact_dups(docs):
    pairs = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, num_hashes=8, bands=4).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert (0, 6) not in pairs


def test_ngram_jaccard(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == 1.0
    assert 0.2 <= pairs[(0, 3)] < 1.0
    assert (0, 6) not in pairs


def test_simhash_near_dups_close(docs):
    got = rows_to_dict(simhash(docs, bits=32), "doc_id", "simhash")
    assert got[0] == got[1] == got[2]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(got[0], got[3]) <= 12   # near dup: small distance
    assert hamming(got[0], got[6]) >= hamming(got[0], got[3])


def test_embedding_near_duplicates(spark):
    from graph_data_science_spark.operators.dedup import embedding_near_duplicates

    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]),
         (1, [0.999, 0.01, 0.0]),   # near-dup of 0
         (2, [0.0, 1.0, 0.0]),
         (3, [0.0, 0.98, 0.2]),     # near-dup of 2
         (4, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>")
    got = {(r["doc_a"], r["doc_b"]): r["cosine"]
           for r in embedding_near_duplicates(vecs, threshold=0.95).collect()}
    assert set(got) == {(0, 1), (2, 3)}
    assert all(c >= 0.95 for c in got.values())
    # each unordered pair appears exactly once (mirror tiles filter)
    assert len(got) == 2


# ---- repetition_stats -------------------------------------------------------

def test_repetition_stats_goldens(spark):
    from graph_data_science_spark.operators.text import repetition_stats
    docs = spark.createDataFrame(
        [(1, "a b a b a b"),
         (2, "x y z"),
         (3, "one two three four five one two three four five"),
         (4, ""),
         (5, "solo")],
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    # doc 1: 6 words / 2 distinct; bigrams 'a b'x3 'b a'x2 -> 3/5; both
    # 5-grams distinct
    assert got[1]["n_words"] == 6
    assert got[1]["distinct_word_frac"] == 0.333333
    assert got[1]["top_bigram_frac"] == 0.6
    assert got[1]["dup_5gram_frac"] == 0.0
    # doc 3: repeated 5-word phrase -> 6 5-grams, 5 distinct
    assert got[3]["dup_5gram_frac"] == 0.166667
    assert got[3]["top_bigram_frac"] == 0.222222
    # short/empty docs: n-gram levels report 0.0, never NULL or garbage
    assert got[4] == {"doc_id": 4, "n_words": 0, "distinct_word_frac": 0.0,
                      "top_bigram_frac": 0.0, "dup_5gram_frac": 0.0}
    assert got[5]["n_words"] == 1 and got[5]["top_bigram_frac"] == 0.0


def test_repetition_stats_flags_repetitive_doc(spark):
    from graph_data_science_spark.operators.text import repetition_stats
    docs = spark.createDataFrame(
        [(1, "spam " * 200), (2, " ".join(f"w{i}" for i in range(200)))],
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["dup_5gram_frac"] > 0.9 and got[1]["top_bigram_frac"] > 0.9
    assert got[2]["dup_5gram_frac"] == 0.0 and got[2]["distinct_word_frac"] == 1.0


# -- segment-level exact dedup (round-3 session-5) ---------------------------

def test_segment_dedup_drops_repeated_segments(spark):
    from graph_data_science_spark.operators.dedup import segment_dedup

    # window=3: doc 0 = [a b c][d e f]; doc 1 repeats segment "a b c" then
    # has a fresh one; doc 2 repeats its own first segment internally
    rows = [
        (0, "a b c d e f"),
        (1, "a b c x y z"),
        (2, "p q r p q r"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in segment_dedup(docs, window=3).collect()}

    assert out[0]["kept_text"] == "a b c d e f"
    assert (out[0]["segs_total"], out[0]["segs_kept"]) == (2, 2)
    # doc 1's first segment already occurred in doc 0
    assert out[1]["kept_text"] == "x y z"
    assert (out[1]["segs_total"], out[1]["segs_kept"]) == (2, 1)
    # within-doc repeat: only the first instance survives
    assert out[2]["kept_text"] == "p q r"
    assert (out[2]["segs_total"], out[2]["segs_kept"]) == (2, 1)


def test_segment_dedup_short_doc_and_order(spark):
    from graph_data_science_spark.operators.dedup import segment_dedup

    rows = [
        (10, "one two"),                    # shorter than the window
        (11, "one two"),                    # exact duplicate doc
        (12, "seg1 seg1 seg1 tail bit"),    # partial tail segment kept in order
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in segment_dedup(docs, window=3).collect()}
    assert out[10]["kept_text"] == "one two"
    assert (out[11]["kept_text"], out[11]["segs_kept"]) == ("", 0)
    # reassembly preserves segment order (idx 0 then the 2-token tail)
    assert out[12]["kept_text"] == "seg1 seg1 seg1 tail bit"


# -- BM25 retrieval (round-3 session-5) --------------------------------------

def test_bm25_ranks_matching_docs(spark):
    from graph_data_science_spark.operators.pipeline_ops import bm25_topk

    rows = [
        (0, "spark spark spark join"),          # high tf for 'spark'
        (1, "spark filler filler filler filler filler filler filler"),  # long, 1 hit
        (2, "window merge"),                    # matches two query terms
        (3, "nothing relevant here at all"),    # no match -> excluded
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    res = bm25_topk(docs, ["spark", "window", "merge"], top_k=10).collect()
    by_id = {r["doc_id"]: r for r in res}

    assert 3 not in by_id                       # non-matching doc excluded
    assert by_id[2]["matched_terms"] == 2
    assert by_id[0]["matched_terms"] == 1
    # rarer terms (window/merge: df=1) in a short doc outrank the common term
    assert by_id[2]["rank"] == 1
    # higher tf and shorter length beat a single hit in a long doc
    assert by_id[0]["score"] > by_id[1]["score"]
    # ranks are 1..n dense in score order
    ranks = sorted(r["rank"] for r in res)
    assert ranks == list(range(1, len(res) + 1))


def test_bm25_topk_truncates_and_breaks_ties_by_id(spark):
    from graph_data_science_spark.operators.pipeline_ops import bm25_topk

    # four identical docs -> identical scores; tie-break by doc_id asc
    rows = [(i, "alpha beta") for i in range(4)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    res = bm25_topk(docs, ["alpha"], top_k=2).orderBy("rank").collect()
    assert [r["doc_id"] for r in res] == [0, 1]
    assert [r["rank"] for r in res] == [1, 2]
