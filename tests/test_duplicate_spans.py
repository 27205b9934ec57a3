"""Exact-substring (duplicate-span) detection and removal.

Reference frame: Lee et al. 2022 exact-substring dedup at k-token shingle
granularity (see dedup.duplicate_spans docstring); keeper rule shared with
segment_dedup (corpus-first min (doc_id, pos)).
"""

import pytest

from graph_data_science_spark.operators.dedup import (
    duplicate_spans,
    remove_duplicate_spans,
)

BOILER = "this program is free software you can redistribute it"  # 9 tokens


def _docs(spark):
    rows = [
        # boilerplate at offset 0
        (1, BOILER + " alpha beta gamma delta epsilon zeta"),
        # same boilerplate at a different offset
        (2, "one two three " + BOILER + " something else entirely here"),
        # unique text, no duplication
        (3, "totally unique words nowhere else in this corpus at all ok"),
        # shorter than k tokens -> contributes nothing
        (4, "tiny doc"),
        # internal repetition: the same 8-token run twice in ONE doc
        (5, "x1 x2 x3 x4 x5 x6 x7 x8 sep x1 x2 x3 x4 x5 x6 x7 x8"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _brute_spans(rows, k, min_count=2):
    """Independent pure-Python reference."""
    from collections import Counter

    toks = {d: t.lower().split() for d, t in rows}
    occ = Counter()
    positions = {}
    for d, ts in toks.items():
        positions[d] = []
        for p in range(len(ts) - k + 1):
            h = " ".join(ts[p:p + k])
            occ[h] += 1
            positions[d].append((p, h))
    spans = []
    for d, ps in positions.items():
        dup = sorted(p for p, h in ps if occ[h] >= min_count)
        cur_start, prev_p = None, None
        for p in dup:
            if prev_p is not None and p > prev_p + k:  # island break
                spans.append((d, cur_start, prev_p + k - 1))
                cur_start = p
            elif prev_p is None:
                cur_start = p
            prev_p = p
        if prev_p is not None:
            spans.append((d, cur_start, prev_p + k - 1))
    return sorted(spans)


def test_spans_match_brute_force(spark):
    k = 8
    rows = [(r["doc_id"], r["text"]) for r in _docs(spark).collect()]
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(_docs(spark), k=k).collect())
    assert got == _brute_spans(rows, k)


def test_spans_detect_shared_boilerplate(spark):
    out = {r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
           for r in duplicate_spans(_docs(spark), k=8).collect()}
    # doc 1: BOILER tokens 0..8 (9 tokens, two overlapping 8-shingles merge)
    assert out[1] == (0, 8, 9)
    # doc 2: BOILER at offset 3 -> tokens 3..11
    assert out[2] == (3, 11, 9)
    # doc 5: both copies of the repeated 8-run are duplicated windows
    assert 5 in out
    # unique + tiny docs never appear
    assert 3 not in out and 4 not in out


def test_adjacent_windows_merge_into_one_span(spark):
    # two docs sharing a 12-token run: 5 overlapping 8-shingles -> ONE span
    run = "a b c d e f g h i j k l"
    df = spark.createDataFrame(
        [(1, run + " tail1 t2 t3"), (2, "head " + run)], ["doc_id", "text"])
    spans = duplicate_spans(df, k=8).collect()
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == 1 for v in per_doc.values())
    assert per_doc[1][0]["span_tokens"] == 12
    assert per_doc[2][0]["span_start"] == 1


def test_removal_keeps_corpus_first_occurrence(spark):
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(_docs(spark), k=8).collect()}
    # doc 1 is the corpus-first occurrence of the boilerplate shingles ->
    # both its windows are exempt -> nothing removed
    assert out[1]["tokens_removed"] == 0
    assert out[1]["clean_text"].startswith("this program is free")
    # doc 2's copy is removed
    assert out[2]["tokens_removed"] == 9
    assert out[2]["clean_text"] == "one two three something else entirely here"
    # unique docs untouched
    assert out[3]["tokens_removed"] == 0
    assert out[4]["tokens_removed"] == 0
    # doc 5: the first copy (pos 0) is corpus-first and exempt; the second
    # copy (pos 9..16) is removed
    assert out[5]["tokens_removed"] == 8
    assert out[5]["clean_text"] == "x1 x2 x3 x4 x5 x6 x7 x8 sep"


def test_token_accounting(spark):
    for r in remove_duplicate_spans(_docs(spark), k=8).collect():
        assert r["tokens_total"] >= r["tokens_removed"] >= 0
        kept = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert kept == r["tokens_total"] - r["tokens_removed"]


def test_min_count_threshold(spark):
    # with min_count=3 the two-occurrence boilerplate is no longer hot
    assert duplicate_spans(_docs(spark), k=8, min_count=3).count() == 0


@pytest.mark.parametrize("k", [4, 8])
def test_random_docs_match_brute_force(spark, k):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(rng.choice(vocab) for _ in range(k + 3))
    rows = []
    for d in range(12):
        n = rng.randint(2, 25)
        words = [rng.choice(vocab) for _ in range(n)]
        if d % 3 == 0:
            at = rng.randint(0, len(words))
            words[at:at] = shared.split()
        rows.append((d, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted((r["doc_id"], r["span_start"], r["span_end"])
                 for r in duplicate_spans(df, k=k).collect())
    assert got == _brute_spans(rows, k)
