"""Deduplication suite for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash, and n-gram Jaccard — the standard near-dup ladder for 100 TB
corpora. All hashing is md5-based so every operator has a bit-identical
DuckDB oracle (md5 hex strings order lexicographically the same everywhere;
minhash over hex strings is a valid uniform min).

Scale notes:
- exact dedup is one partial-aggregated ``groupBy(md5(text))`` — the combiner
  collapses dups map-side, so shuffle volume is #distinct rows.
- MinHash signatures are computed via explode(shingles) →
  ``groupBy(doc, hash_idx).min`` — both aggs partial-aggregatable; the LSH
  band join shuffles only (band_id, band_hash) pairs, never text.
- n-gram Jaccard joins docs on shared shingles; its cost is bounded by
  dropping shingles that occur in too many docs (``max_shingle_freq``) —
  the classic hot-shingle (boilerplate) skew guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: normalize: lower + collapse runs of whitespace to one space + trim
def _norm(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def _word_shingles(col: Column, n: int) -> Column:
    """Distinct word n-gram shingles of the normalized text (array<string>)."""
    words = F.split(_norm(col), " ")
    return F.array_distinct(
        F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            ),
        ).otherwise(F.array(_norm(col)))
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash → ``(doc_id, canonical_id, group_size)``.

    ``canonical_id`` = min id among rows with identical normalized text;
    a row is a duplicate iff ``doc_id != canonical_id``.
    """
    hashed = docs.select(id_col, F.md5(_norm(F.col(text_col))).alias("_h"))
    groups = hashed.groupBy("_h").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        hashed.join(groups, "_h")
        .select(F.col(id_col).alias("doc_id"), "canonical_id", "group_size")
    )


#: prime modulus of the integer minhash family. 2^31−1 (Mersenne prime):
#: a_k, base < P ⇒ a_k·base < 2^62, still exact int64 on both engines.
#: A small P is a collision hazard, not just lost precision — with m
#: shingles per doc, unrelated docs share a per-hash minimum with
#: probability ~m/P, inflating estimated Jaccard and LSH candidate pairs;
#: at m ~ 1e5 the old P = 1,000,003 made that ~10%.
_MH_P = 2_147_483_647


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 16,
                       shingle_n: int = 3) -> DataFrame:
    """MinHash signature rows → ``(doc_id, h (hash index), minhash)``.

    The classic universal family, hashed ONCE per shingle: ``base =
    int(md5(shingle)[:15 hex]) mod P`` and ``h_k = (a_k·base + b_k) mod
    P`` with ``a_k = (k+1)·2654435761 mod P``, ``b_k = (k+1)·40503 mod
    P`` (P = 2,147,483,647, the Mersenne prime 2^31−1). Rounds 1-3 computed ``md5(k || shingle)``
    per hash index — k× the hashing work; at 10¹² documents with a
    production-sized family (k = 128) that multiplier IS the signature
    job, so deriving the family from one digest is the scale fix, not a
    micro-optimization. All arithmetic is exact int64, bit-identical on
    any engine with md5 + 64-bit integers (the DuckDB oracle mirrors it
    via ``CAST('0x' || SUBSTRING(md5(s),1,15) AS BIGINT)``).
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    base = sh.select(
        "doc_id",
        (F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
         .cast("long") % _MH_P).alias("_base"),
    )
    ks = base.select(
        "doc_id", "_base",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h"),
    )
    a = ((F.col("h") + 1) * F.lit(2654435761)) % _MH_P
    b = ((F.col("h") + 1) * F.lit(40503)) % _MH_P
    return ks.select(
        "doc_id", "h",
        ((a * F.col("_base") + b) % _MH_P).alias("_hv"),
    ).groupBy("doc_id", "h").agg(F.min("_hv").alias("minhash"))


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 16,
                      bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """LSH candidate pairs → ``(a, b)`` with a < b, distinct.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows; docs
    sharing any band hash are candidates (standard banding: P(candidate) =
    1-(1-J^r)^b).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    banded = sig.withColumn("band", (F.col("h") / rows_per_band).cast("int"))
    band_hash = banded.groupBy("doc_id", "band").agg(
        F.md5(F.concat_ws(",", F.array_sort(F.collect_list(
            F.concat_ws("=", F.col("h").cast("string"), F.col("minhash"))
        )))).alias("bh")
    )
    left = band_hash.select(F.col("doc_id").alias("a"), "band", "bh")
    right = band_hash.select(F.col("doc_id").alias("b"), "band", "bh")
    return (
        left.join(right, ["band", "bh"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.2,
                        max_shingle_freq: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs → ``(a, b, jaccard)`` with a < b,
    ``jaccard`` rounded to 6dp, pairs with jaccard ≥ threshold.

    ``max_shingle_freq`` drops shingles appearing in more than that many docs
    before the pair join (boilerplate/hot-key guard — changes results, use
    only when the corpus demands it; default None = exact).
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if max_shingle_freq is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            hot.where(F.col("df") <= max_shingle_freq).select("shingle"),
            "shingle", "left_semi",
        )
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sb")), "b")
        .select(
            "a", "b",
            F.round(F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")), 6)
            .alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32, shingle_n: int = 2) -> DataFrame:
    """SimHash → ``(doc_id, simhash)`` over word shingles.

    Shingle hash = first 15 hex chars of md5 as a 60-bit int (portable:
    Spark ``conv(hex,16,10)`` == DuckDB ``CAST('0x'||hex AS BIGINT)``); bit b
    of the simhash is the majority vote of shingle bit b (sum of ±1 > 0).
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).distinct()
    h = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long").alias("hv"),
    )
    bitted = h.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        F.col("hv"),
    ).select(
        "doc_id", "bit",
        F.when(F.expr("(hv >> bit) & 1") == 1, F.lit(1))
        .otherwise(F.lit(-1)).alias("vote"),
    )
    return (
        bitted.groupBy("doc_id", "bit").agg(F.sum("vote").alias("s"))
        .groupBy("doc_id")
        .agg(F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
            .otherwise(F.lit(0))
        ).alias("simhash"))
    )


def embedding_near_duplicates(
    vecs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_shards: int | None = None,
    query_blocks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs → ``(doc_a, doc_b, cosine)``
    with ``doc_a < doc_b`` and rounded cosine ≥ ``threshold``.

    The embedding leg of the near-dup ladder (exact hash → MinHash/SimHash
    text similarity → semantic similarity). EXACT kernel on the same
    executor-resident tiled GEMM blocks as ``similarity.cosine_topk``
    (``_pack_side``): every (query-block × index-shard) tile computes one
    numpy GEMM and emits only the above-threshold ordered pairs — the
    driver never holds a matrix, and the shuffle carries only surviving
    pairs. Each unordered pair is evaluated in exactly one emitting tile
    (the ``qid < iid`` mask; the mirror tile filters it out).

    Scale posture: exact all-pairs is O(n²) dot products — the
    oracle-able baseline, right up to ~10⁷ vectors. At 10⁹ use
    ``similarity.knn_nn_descent`` or ``cosine_topk_ivf`` as a candidate
    prefilter and keep this threshold test as the verifier on the
    candidate pairs.
    """
    import pickle

    import numpy as np
    import pandas as pd

    from graph_data_science_spark.operators.similarity import _pack_side

    spark = vecs.sparkSession
    par = spark.sparkContext.defaultParallelism
    n_shards = int(index_shards or par)
    n_qblocks = int(query_blocks or par)
    t = float(threshold)

    index_packed = _pack_side(vecs, id_col, vec_col, n_shards, "_shard").select(
        "_shard", F.col("_ids").alias("_iids"), F.col("_mat").alias("_imat"))
    query_packed = _pack_side(vecs, id_col, vec_col, n_qblocks, "_qblock").select(
        "_qblock", F.col("_ids").alias("_qids"), F.col("_mat").alias("_qmat"))
    tiles = query_packed.crossJoin(index_packed).repartition(
        max(n_shards, par), "_qblock", "_shard")

    def gemm(batches):
        for pdf in batches:
            for r in range(len(pdf)):
                row = pdf.iloc[r]
                qids = pickle.loads(row["_qids"])
                qmat = pickle.loads(row["_qmat"])
                iids = pickle.loads(row["_iids"])
                imat = pickle.loads(row["_imat"])
                sims = np.round(qmat @ imat.T, 6)
                qq, ii = np.meshgrid(qids, iids, indexing="ij")
                mask = (qq < ii) & (sims >= t)
                if mask.any():
                    yield pd.DataFrame({
                        "doc_a": qq[mask], "doc_b": ii[mask],
                        "cosine": sims[mask]})

    return tiles.mapInPandas(
        gemm, schema="doc_a long, doc_b long, cosine double")


def embedding_lsh_buckets(
    vecs: DataFrame,
    n_bits: int = 16,
    bands: int = 4,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH over an embedding column → ``(vec_id, band,
    bucket)`` — the SCALE path for semantic near-dup / ANN candidate
    generation (vs the exact tiled GEMM of ``embedding_near_duplicates``).

    Sign-of-projection LSH (Charikar, STOC'02): bit j is the sign of the
    dot product with pseudo-random hyperplane j; the ``n_bits`` signature is
    split into ``bands`` independent band buckets (LSH banding — two vectors
    are candidates when ANY band matches; with 4 bands × 4 bits a cosine-0.9
    pair collides with p ≈ 0.95).

    Everything is EXACT INTEGER arithmetic so the DuckDB oracle is
    bit-identical at any summation order: embeddings are quantized
    ``floor(x * quant)`` (float→double exact, floor has no rounding ties),
    hyperplane components are hash-derived integers
    ``(j*2654435761 + d*40503) % 1000003 - 500001``, and the projection is a
    bigint dot product — no float summation anywhere near a sign decision.

    Scale: one narrow projection (no shuffle) producing ``bands`` rows per
    vector; candidate joins shuffle only (band, bucket, id). Reference
    analog: similarity/knn/Knn.java approximate contract, re-expressed as
    data-parallel hashing instead of graph descent.
    """
    if n_bits % bands != 0:
        raise ValueError("n_bits must divide evenly into bands")
    bpb = n_bits // bands
    q = vecs.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"transform({vec_col}, x -> "
               f"cast(floor(cast(x as double) * {int(quant)}) as bigint))"
               ).alias("_q"),
    )
    banded = q.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        F.col("_q"),
    )
    bucket = F.expr(f"""
      cast(aggregate(
        sequence(0, {bpb - 1}),
        cast(0 as bigint),
        (acc, b) -> acc + if(
          aggregate(
            zip_with(_q, sequence(1, size(_q)), (qi, d) ->
              qi * (((band * {bpb} + b) * 2654435761 + d * 40503) % 1000003
                    - 500001)),
            cast(0 as bigint), (a, v) -> a + v) > 0,
          shiftleft(cast(1 as bigint), b), cast(0 as bigint))) as bigint)
    """)
    return banded.select("vec_id", F.col("band").cast("long").alias("band"),
                         bucket.alias("bucket"))


def embedding_lsh_pairs(
    vecs: DataFrame,
    threshold: float = 0.85,
    n_bits: int = 16,
    bands: int = 4,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed semantic near-dup pairs → ``(doc_a, doc_b, cosine)``
    with ``doc_a < doc_b`` and rounded cosine ≥ ``threshold``.

    Candidates = pairs sharing any (band, bucket) from
    :func:`embedding_lsh_buckets`; each candidate pair is then verified with
    the exact cosine (same rounded-6dp contract as ``embedding_near_
    duplicates``, whose output this approximates with banding-recall
    guarantees — the recall test lives in tests/test_functions_similarity).

    Scale: never all-pairs — the join shuffles (band, bucket) keys, the
    verify step touches only colliding pairs, and a hot bucket is bounded by
    the band width (add bits per band to split it). This is the path the
    exact GEMM kernel can't walk at 10⁹ vectors.
    """
    b = embedding_lsh_buckets(vecs, n_bits, bands, quant, id_col, vec_col)
    cand = (
        b.alias("l")
        .join(b.alias("r"),
              (F.col("l.band") == F.col("r.band"))
              & (F.col("l.bucket") == F.col("r.bucket"))
              & (F.col("l.vec_id") < F.col("r.vec_id")))
        .select(F.col("l.vec_id").alias("doc_a"),
                F.col("r.vec_id").alias("doc_b"))
        .distinct()
    )
    e = vecs.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_e"))
    dot = ("aggregate(zip_with(_ea, _eb, (x, y) -> "
           "cast(x as double) * cast(y as double)), "
           "cast(0.0 as double), (a, v) -> a + v)")
    norm = (lambda col: f"sqrt(aggregate(zip_with({col}, {col}, (x, y) -> "
            f"cast(x as double) * cast(y as double)), "
            f"cast(0.0 as double), (a, v) -> a + v))")
    return (
        cand.join(e.withColumnRenamed("_id", "doc_a")
                   .withColumnRenamed("_e", "_ea"), "doc_a")
        .join(e.withColumnRenamed("_id", "doc_b")
               .withColumnRenamed("_e", "_eb"), "doc_b")
        .select("doc_a", "doc_b",
                F.expr(f"round(({dot}) / ({norm('_ea')} * {norm('_eb')}), 6)")
                .alias("cosine"))
        .where(F.col("cosine") >= float(threshold))
        .select("doc_a", "doc_b", "cosine")
    )


def segment_dedup(docs: DataFrame, window: int = 20, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Segment-level exact dedup → ``(doc_id, kept_text, segs_total,
    segs_kept)`` — the RefinedWeb/CCNet "line dedup" pass generalized to a
    corpus without line structure: the normalized token stream is chunked
    into consecutive ``window``-token segments and every segment whose
    content already occurred EARLIER in the corpus (ordered by
    ``(doc_id, seg_idx)``) is dropped; each document's surviving segments
    are reassembled in order. Repeats of a segment *within* one document
    dedup too (only the first instance survives) — exact-segment semantics.

    Deterministic: the keeper of each segment group is ``min (doc_id,
    seg_idx)``; reassembly sorts by ``seg_idx``. No floats anywhere.

    Scale plan: segments are hashed with md5, so the first-occurrence
    aggregation is a partial-aggregatable ``groupBy(hash).min(struct(id,
    idx))`` whose shuffle volume is (hash, ids) — never segment text; the
    keeper join then shuffles segments once by hash; reassembly is one more
    ``groupBy(doc_id)`` with ``array_sort ∘ collect_list`` (bounded by
    tokens/``window`` segments per doc). Compare: exact_duplicates (whole-
    document granularity) and minhash_lsh_pairs (near-dup granularity).
    """
    w = int(window)
    ws = F.split(_norm(F.col(text_col)), " ")
    n_segs = F.ceil(F.size(ws) / F.lit(float(w))).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(n_segs, F.lit(1)) - 1),
        lambda i: F.concat_ws(" ", F.slice(ws, i * w + 1, w)),
    )
    segs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(seg_arr).alias("seg_idx", "seg"),
    ).withColumn("_h", F.md5(F.col("seg")))

    first = segs.groupBy("_h").agg(
        F.min(F.struct(F.col("doc_id"), F.col("seg_idx"))).alias("_f"))
    kept = (
        segs.join(first, "_h")
        .where((F.col("doc_id") == F.col("_f.doc_id"))
               & (F.col("seg_idx") == F.col("_f.seg_idx")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("segs_kept"),
            F.concat_ws(" ", F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda x: x["seg"])).alias("kept_text"),
        )
    )
    totals = segs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("segs_total"))
    return (
        totals.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
            F.col("segs_total").cast("long").alias("segs_total"),
            F.coalesce("segs_kept", F.lit(0)).cast("long").alias("segs_kept"),
        )
    )


def _shingle_positions(docs: DataFrame, k: int, text_col: str,
                       id_col: str) -> DataFrame:
    """(doc_id, pos, _h): md5 of the k-token window starting at token
    ``pos`` (0-based over the normalized token stream), one row per
    position — NOT deduplicated, unlike :func:`_word_shingles` (span
    detection needs every occurrence). Docs with fewer than ``k`` tokens
    contribute nothing."""
    ws = F.split(_norm(F.col(text_col)), " ")
    return (
        docs.select(F.col(id_col).alias("doc_id"), ws.alias("_ws"))
        .where(F.size("_ws") >= k)
        .select(
            "doc_id",
            F.posexplode(F.transform(
                F.sequence(F.lit(0), F.size("_ws") - k),
                lambda i: F.md5(F.concat_ws(" ", F.slice("_ws", i + 1, k))),
            )).alias("pos", "_h"),
        )
    )


def duplicate_spans(docs: DataFrame, k: int = 8, min_count: int = 2,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Maximal duplicated token spans → ``(doc_id, span_start, span_end,
    span_tokens)`` — the exact-substring dedup axis (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") at
    ``k``-token shingle granularity, without the suffix array: a token
    window is *duplicated* when its ``k``-shingle hash occurs at least
    ``min_count`` times corpus-wide (counting every (doc, pos) occurrence,
    within-doc repeats included), and overlapping/adjacent duplicated
    windows in one document merge into maximal spans (positions p, p'
    merge iff p' ≤ p + k). Completes the dedup ladder between
    :func:`segment_dedup` (fixed-boundary exact segments) and
    :func:`minhash_lsh_pairs` (whole-doc near-dup): it finds repeated
    *substrings* at arbitrary offsets — license headers, boilerplate,
    copy-pasted functions.

    Scale plan (100 TB posture): shuffle rows are (16-byte hash, doc, pos)
    — text never leaves the first projection; the hot-hash filter is a
    partial-aggregatable count (map-side combine collapses each
    partition's repeats); the islands merge windows by ``doc_id`` only —
    never a global sort — and its input is just the duplicated positions,
    a near-dup-density-sized set, not the corpus.
    """
    kk, mc = int(k), int(min_count)
    from pyspark.sql.window import Window

    pos = _shingle_positions(docs, kk, text_col, id_col)
    hot = (pos.groupBy("_h").agg(F.count(F.lit(1)).alias("_c"))
           .where(F.col("_c") >= mc).select("_h"))
    dup = pos.join(hot, "_h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        dup
        .withColumn("_brk", F.when(
            F.col("pos") > F.lag("pos").over(w) + kk, 1).otherwise(0))
        .withColumn("_isl", F.sum("_brk").over(w))
    )
    return (
        isl.groupBy("doc_id", "_isl")
        .agg(F.min("pos").alias("_s"), (F.max("pos") + kk - 1).alias("_e"))
        .select(
            "doc_id",
            F.col("_s").cast("int").alias("span_start"),
            F.col("_e").cast("int").alias("span_end"),
            (F.col("_e") - F.col("_s") + 1).cast("int").alias("span_tokens"),
        )
    )


def remove_duplicate_spans(docs: DataFrame, k: int = 8, min_count: int = 2,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Cut duplicated spans, keeping the corpus-first occurrence →
    ``(doc_id, clean_text, tokens_total, tokens_removed)``.

    The exemption rule makes removal information-preserving and
    deterministic: for each hot shingle hash the single corpus-first
    occurrence — min ``(doc_id, pos)``, the :func:`segment_dedup`
    keeper rule — is exempt; every other duplicated window merges into
    spans (same islands rule as :func:`duplicate_spans`) whose tokens are
    dropped, and the surviving tokens are reassembled in order. The
    guarantee is per-shingle: the corpus-first occurrence of each
    duplicated window is never itself removed, though a DIFFERENT hot
    shingle's non-exempt span may overlap and truncate it — so an intact
    copy of a longer duplicated substring need not survive verbatim.

    The reassembly never explodes tokens: each doc's span list (a small
    array) joins back to the token array and a codegen'd
    ``filter(transform(...))`` drops covered positions — no shuffle
    carries text except the final projection.
    """
    kk, mc = int(k), int(min_count)
    from pyspark.sql.window import Window

    pos = _shingle_positions(docs, kk, text_col, id_col)
    hot = (pos.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min(F.struct("doc_id", "pos")).alias("_f"),
    ).where(F.col("_c") >= mc).select("_h", "_f"))
    dup = (pos.join(hot, "_h")
           .where(~((F.col("doc_id") == F.col("_f.doc_id"))
                    & (F.col("pos") == F.col("_f.pos"))))
           .select("doc_id", "pos"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        dup
        .withColumn("_brk", F.when(
            F.col("pos") > F.lag("pos").over(w) + kk, 1).otherwise(0))
        .withColumn("_isl", F.sum("_brk").over(w))
        .groupBy("doc_id", "_isl")
        .agg(F.min("pos").alias("s"), (F.max("pos") + kk - 1).alias("e"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("_spans"))
    )
    ws = F.split(_norm(F.col(text_col)), " ")
    base = docs.select(F.col(id_col).alias("doc_id"), ws.alias("_ws"))
    joined = base.join(spans, "doc_id", "left").withColumn(
        "_spans", F.coalesce("_spans", F.array()))
    indexed = F.transform(
        F.col("_ws"), lambda t, i: F.struct(t.alias("t"), i.alias("i")))
    kept = F.filter(indexed, lambda x: ~F.exists(
        F.col("_spans"),
        lambda s: (x["i"] >= s["s"]) & (x["i"] <= s["e"])))
    return joined.select(
        "doc_id",
        F.concat_ws(" ", F.transform(kept, lambda x: x["t"])).alias(
            "clean_text"),
        F.size("_ws").cast("long").alias("tokens_total"),
        (F.size("_ws") - F.size(kept)).cast("long").alias("tokens_removed"),
    )
