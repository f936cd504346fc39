"""Deduplication operators over the `documents` table (SURVEY §2 #10-14).

All hashing follows the cross-engine contract in functions/text.py (md5-prefix
base hash, universal hashes mod 2^31−1) so every operator has an exact DuckDB
oracle twin.

Scale shapes (100 TB):
- minhash: explode shingles → groupBy(doc) relies on map-side partial `min`,
  so the shuffle carries O(docs · K) rows, not O(shingles).
- banded LSH self-join shuffles on (band, signature); AQE skew-join splits
  hot buckets.
- n-gram Jaccard join uses lossless prefix filtering (PPJoin-style): only
  the globally-rarest prefix grams of each doc participate in the candidate
  join, shrinking candidates by orders of magnitude at equal results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import io
from ..constants import (
    CONTAIN_TAU,
    INCR_MOD,
    MINHASH_BAND_ROWS,
    MINHASH_JACCARD_TAU,
    MINHASH_K,
    NGRAM_JACCARD_TAU,
    NGRAM_N,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
)
from ..functions.text import md5_hash60, tokens, universal_hash, word_shingles
from ..session import configure


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    # widen: every operator here full-scans and then does heavy per-row
    # expression work (shingle explode + hashing) — parallelize it even
    # when the input is one row group.
    # r13 (opt guide §2.4): pin isnotnull(doc_id) at the source. Joins on
    # doc_id infer it into THEIR branch's scan while non-join branches skip
    # it, so the shingle/signature subtrees of the self-join families
    # canonicalized UNEQUAL and ReuseExchange never fired — the before-plan
    # of dedup_minhash_canonical re-computed the documents scan 17× (zero
    # ReusedExchange). doc_id is never null, so results are unchanged; with
    # every branch carrying the same filter the duplicated pipelines
    # collapse into exchange reuses.
    return io.table(spark, sf_dir, "documents", widen=True).where(
        F.col("doc_id").isNotNull()
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash; canonical = min doc_id."""
    docs = _docs(spark, sf_dir)
    return docs.groupBy(F.md5("text").alias("content_md5")).agg(
        F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_copies")
    )


# ---- minhash ----------------------------------------------------------------


def _shingle_hashes(docs: DataFrame, tokenizer: str | None = None) -> DataFrame:
    """(doc_id, h) — one row per distinct word-3-shingle, h = 60-bit hash.

    Minhash is a set signature (min over duplicates is the min), and the
    Jaccard verify sets are distinct-ified anyway, so deduping shingles
    *inside the array* before explode is semantics-free and cuts the
    explode + md5 volume by the per-doc repeat factor.

    Tokenization goes through the functions.text seam (r7): the default
    emits the identical F.split expression; ENN_TOKENIZER=char switches the
    whole minhash family to CJK-style character shingles coherently. An
    explicit `tokenizer` overrides the env var for this plan only (r8)."""
    toks = tokens(F.col("text"), tokenizer)
    with_sh = docs.where(F.size(toks) >= 3).select(
        "doc_id", F.explode(F.array_distinct(word_shingles(toks))).alias("s")
    )
    return with_sh.select("doc_id", md5_hash60(F.col("s")).alias("h"))


def minhash_signatures(
    spark: SparkSession, sf_dir: str, tokenizer: str | None = None
) -> DataFrame:
    """K=16 minhash signature per doc, one column per hash function."""
    sh = _shingle_hashes(_docs(spark, sf_dir), tokenizer)
    aggs = [
        F.min(universal_hash(F.col("h"), j)).alias(f"mh_{j}") for j in range(MINHASH_K)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #146: minhash signatures over CHARACTER 3-shingles — the
    tokenizer seam's non-default path as a first-class gated query (how the
    minhash family runs on a CJK-style corpus with no word delimiters).

    Implementation IS minhash_signatures with the seam's built-in char
    tokenizer selected explicitly (r8: a `tokenizer=` parameter threaded
    through functions.text.tokens — no process-global env mutation during
    plan construction, so concurrent plan builds can't observe it): every
    non-space character is a token, shingling/hashing/min-agg identical, so
    the whole plan stays codegen (the char tokenizer is a higher-order
    filter, not a UDF). The DuckDB oracle mirrors the char split
    independently (oracles_text.minhash_signatures_char).

    Output: (doc_id, mh_0..mh_15) — same shape as the word-shingle twin."""
    return minhash_signatures(spark, sf_dir, tokenizer="char")


def _jaccard_on(cand: DataFrame, ds: DataFrame, tau: float, a="doc_a", b="doc_b") -> DataFrame:
    """Exact Jaccard verification of candidate pairs against distinct-element
    sets ds(doc_id, g). Returns (doc_a, doc_b, jaccard) filtered to >= tau."""
    sz = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ga = ds.select(F.col("doc_id").alias(a), "g")
    gb = ds.select(F.col("doc_id").alias(b), "g")
    # join gb on (doc, gram) TOGETHER: keeps it a hash join on both keys;
    # joining on doc alone would explode to |cand|·|A|·|B| rows first
    inter = (
        cand.join(ga, a)
        .join(gb, [b, "g"])
        .groupBy(a, b)
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sz.select(F.col("doc_id").alias(a), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias(b), F.col("n").alias("nb"))
    return (
        inter.join(sa, a)
        .join(sb, b)
        .select(
            a,
            b,
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= tau)
    )


def _minhash_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bval) — banded signature blocking keys.

    One posexplode pass, not a 4-way union: union branches re-evaluate the
    signature subtree (or at best hit a reused exchange) — measured ~2×."""
    n_bands = MINHASH_K // MINHASH_BAND_ROWS
    band_vals = [
        F.concat_ws(
            "_", *[F.col(f"mh_{bi * MINHASH_BAND_ROWS + r}") for r in range(MINHASH_BAND_ROWS)]
        )
        for bi in range(n_bands)
    ]
    return sig.select("doc_id", F.posexplode(F.array(*band_vals)).alias("band", "bval"))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded minhash LSH candidates → exact Jaccard verify ≥ τ.
    Hot bands above MAX_BUCKET are dropped before the pair self-join
    (functions/blocking.py; mirrored in the oracle).

    Output: (doc_a, doc_b, jaccard)."""
    from ..functions.blocking import capped_bucket_pairs

    docs = _docs(spark, sf_dir)
    # the shingle pass feeds both the signatures and the verify sets; with
    # the zip_with shingle expression it is cheap enough that re-running it
    # beats a cache round-trip (persist leaks across lazy query results)
    sh = _shingle_hashes(docs)
    sig = sh.groupBy("doc_id").agg(
        *[F.min(universal_hash(F.col("h"), j)).alias(f"mh_{j}") for j in range(MINHASH_K)]
    )
    cand = capped_bucket_pairs(_minhash_bands(sig), ["band", "bval"], "doc_id")
    ds = sh.select("doc_id", F.col("h").alias("g")).distinct()
    return _jaccard_on(cand, ds, MINHASH_JACCARD_TAU)


# ---- simhash ----------------------------------------------------------------


def _simhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, sb_0..sb_3) — 64-bit simhash over word unigrams (with
    multiplicity), represented as 4 disjoint 16-bit band values: bit i set
    iff sum over tokens of ±1 (by token-hash bit i) is positive. Band values
    (not one 64-bit integer) avoid signed-bit-63 pitfalls on both engines,
    are exactly the blocking keys, and hamming(a, b) = Σ_band
    popcount(band_a XOR band_b). Pure integer math — deterministic on any
    partitioning. Token bits 0-59 come from md5 hex chars 1-15 (the shared
    md5_hash60 contract); bits 60-63 from hex char 16."""
    from ..constants import SIMHASH_BAND_BITS

    # md5 is materialized ONCE per token occurrence (both 60-bit and top-4
    # extractions read the same hex column); a groupBy-(doc,token) collapse
    # before the bit sums was tried and is SLOWER here — the extra token
    # shuffle costs more than the duplicate-token savings (measured 3.3 →
    # 4.9s at sf0.1), so the 64 bit-sum aggregates run per occurrence with
    # map-side partial aggregation and the only shuffle carries 64 ints/doc
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
    tok = tok.select("doc_id", F.md5(F.col("t")).alias("m")).select(
        "doc_id",
        F.conv(F.substring(F.col("m"), 1, 15), 16, 10).cast("long").alias("h_lo"),
        F.conv(F.substring(F.col("m"), 16, 1), 16, 10).cast("long").alias("h_hi"),
    )

    def bit(i: int):
        src, off = ("h_lo", i) if i < 60 else ("h_hi", i - 60)
        return F.shiftright(F.col(src), off).bitwiseAND(F.lit(1))

    aggs = [
        F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"s_{i}")
        for i in range(SIMHASH_BITS)
    ]
    g = tok.groupBy("doc_id").agg(*aggs)
    band_cols = []
    for b in range(SIMHASH_BANDS):
        val = None
        for j in range(SIMHASH_BAND_BITS):
            i = b * SIMHASH_BAND_BITS + j
            term = F.when(F.col(f"s_{i}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            val = term if val is None else val + term
        band_cols.append(val.cast("int").alias(f"sb_{b}"))
    return g.select("doc_id", *band_cols)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at hamming ≤ 3 via 16-bit-band blocking (pigeonhole:
    ≤3 flipped bits leave ≥1 of 4 bands intact → blocking alone is
    lossless; the MAX_BUCKET hot-band cap is the one documented
    approximation, mirrored exactly in the oracle).

    Output: (doc_a, doc_b, hamming)."""
    from ..functions.blocking import capped_bucket_pairs

    # persist: the signature table feeds three plan branches (band explode
    # + both pair-gather sides); uncached, the token-explode + 64 bit-sum
    # aggregation runs three times (measured 5.1 → 3.8s at sf0.1). At scale
    # this is the standard "materialize the signatures" step — N rows of 5
    # ints, MEMORY_AND_DISK, dwarfed by the token stream it replaces.
    sims = _simhash_bands(_docs(spark, sf_dir)).persist()
    # one posexplode pass over the 4 bands (see dedup_minhash_lsh)
    bands = sims.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"sb_{b}") for b in range(SIMHASH_BANDS)])).alias(
            "band", "bval"
        ),
    )
    cand = capped_bucket_pairs(bands, ["band", "bval"], "doc_id")
    sa = sims.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"sb_{b}").alias(f"a_{b}") for b in range(SIMHASH_BANDS)]
    )
    sb = sims.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"sb_{b}").alias(f"b_{b}") for b in range(SIMHASH_BANDS)]
    )
    ham = None
    for b in range(SIMHASH_BANDS):
        term = F.bit_count(F.col(f"a_{b}").bitwiseXOR(F.col(f"b_{b}")))
        ham = term if ham is None else ham + term
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


# ---- char n-gram jaccard join ----------------------------------------------


def ngram_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-4-gram Jaccard set-similarity join ≥ τ (PPJoin-lite).

    Two lossless prunes before verification:
    - prefix filter: each doc keeps only its |A| − ceil(τ·|A|) + 1
      globally-rarest grams as join keys (any pair with jaccard ≥ τ must
      collide on those);
    - length filter: jaccard ≥ τ forces τ·|A| ≤ |B| ≤ |A|/τ.
    Verification computes exact Jaccard on full distinct-gram sets, so
    results equal the brute-force oracle exactly.

    Word grams (not char grams) keep the key space sparse/zipfian — prefix
    filtering collapses when the gram vocabulary is small.

    Output: (doc_a, doc_b, jaccard)."""
    docs = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))  # r7 tokenizer seam (default bit-identical)
    grams = docs.where(F.size(toks) >= NGRAM_N).select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(toks, NGRAM_N))).alias("g"),
    )
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    sized = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ordered = (
        grams.join(dfreq, "g")
        .withColumn("pos", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "g")))
        .join(sized, "doc_id")
    )
    prefix = ordered.where(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(NGRAM_JACCARD_TAU) * F.col("n")) + 1
    ).select("doc_id", "g", "n")
    pa = prefix.select(F.col("doc_id").alias("doc_a"), "g", F.col("n").alias("na"))
    pb = prefix.select(F.col("doc_id").alias("doc_b"), "g", F.col("n").alias("nb"))
    cand = (
        pa.join(pb, "g")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("nb") >= F.ceil(F.lit(NGRAM_JACCARD_TAU) * F.col("na")))
            & (F.col("nb") <= F.floor(F.col("na") / F.lit(NGRAM_JACCARD_TAU)))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _jaccard_on(cand, grams, NGRAM_JACCARD_TAU)


def containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram CONTAINMENT join: pairs (a, b) with
    |grams(a) ∩ grams(b)| / |grams(a)| ≥ CONTAIN_TAU, a ≠ b — the
    asymmetric variant of ngram_jaccard_join. Jaccard misses the curation
    case this exists for: a short doc quoted wholesale inside a much larger
    one (containment 1.0, jaccard ≈ |A|/|B| → 0).

    Prune logic (both lossless, so results equal the brute-force oracle):
    - prefix filter, containment form: overlap ≥ t = ceil(τ·|A|) forces any
      qualifying B to hit one of A's (|A| − t + 1) globally-rarest grams
      (pigeonhole on A's suffix). Only the PROBE side prefixes; the indexed
      side keeps every gram because containment puts no upper bound on |B|.
      Prefix grams are by construction the rarest, so candidate volume is
      Σ_prefix-gram df(g) — small — even though B is un-prefixed.
    - length filter: overlap ≤ |B| forces |B| ≥ ceil(τ·|A|).
    Verification computes exact containment on full distinct-gram sets.

    Output: (doc_a, doc_b, containment) — doc_a is the contained side."""
    docs = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))  # r7 tokenizer seam (default bit-identical)
    grams = docs.where(F.size(toks) >= NGRAM_N).select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(toks, NGRAM_N))).alias("g"),
    )
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    sized = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ordered = (
        grams.join(dfreq, "g")
        .withColumn("pos", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "g")))
        .join(sized, "doc_id")
    )
    prefix = ordered.where(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(CONTAIN_TAU) * F.col("n")) + 1
    ).select(F.col("doc_id").alias("doc_a"), "g", F.col("n").alias("na"))
    idx = grams.join(sized, "doc_id").select(
        F.col("doc_id").alias("doc_b"), "g", F.col("n").alias("nb")
    )
    cand = (
        prefix.join(idx, "g")
        .where(
            (F.col("doc_a") != F.col("doc_b"))
            & (F.col("nb") >= F.ceil(F.lit(CONTAIN_TAU) * F.col("na")))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), "g")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sized.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    return (
        inter.join(sa, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("inter") / F.col("na"), 6).alias("containment"),
        )
        .where(F.col("containment") >= CONTAIN_TAU)
    )


def _dup_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, pos) for every stride-1 DUPSPAN_W-token window whose text
    occurs ≥ DUPSPAN_MIN_FREQ times corpus-wide (Lee et al. 2022 exact
    substring dedup, window-granular).

    Plan shape: one narrow scan → posexplode sliding windows (output ∝
    corpus tokens · 1, each window string W tokens — the unavoidable
    suffix-array-substitute cost), then ONE exchange on the window string
    with an analytic count — no second groupBy+join pass over the
    corpus-sized side. The duplicated-position stream that survives the
    filter is ∝ the corpus's duplicated mass, not its size.

    Measured (r7, 500k docs / 21.6M windows, interleaved both orders,
    identical output): this analytic-window form 119.7/151.1 s vs a
    groupBy(win)+left-semi-join alternative 230.5/397.4 s — the window's
    per-partition sort is cheaper than the alternative's second
    window-stream materialization (wins is consumed twice there) plus its
    extra exchange, and the frequent-window set of a duplicated corpus is
    too large to assume broadcastable anyway."""
    from ..constants import DUPSPAN_MIN_FREQ, DUPSPAN_W

    toks = F.split(F.col("text"), " ")
    starts = F.when(
        F.size(toks) >= DUPSPAN_W,
        F.sequence(F.lit(0), F.size(toks) - DUPSPAN_W),
    ).otherwise(F.array().cast("array<int>"))
    win_arr = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, DUPSPAN_W))
    )
    wins = docs.select("doc_id", F.posexplode(win_arr).alias("pos", "win"))
    n_w = Window.partitionBy("win")
    return (
        wins.withColumn("n", F.count(F.lit(1)).over(n_w))
        .where(F.col("n") >= DUPSPAN_MIN_FREQ)
        .select("doc_id", "pos")
    )


def _dup_islands(positions: DataFrame) -> DataFrame:
    """Merge duplicated window positions into maximal token spans.

    Two windows [p, p+W) and [q, q+W), p ≤ q, cover a contiguous token
    region iff q ≤ p+W, so a position starts a NEW span exactly when it
    exceeds max(previous pos)+W. Classic gaps-and-islands over one
    exchange on doc_id; the island id is a running sum of start flags.

    Output: (doc_id, span_start, span_len) — token indices, end-exclusive
    length covering every duplicated window in the island."""
    from ..constants import DUPSPAN_W

    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max = F.max("pos").over(w_prev)
    flagged = positions.withColumn(
        "new_span",
        F.when(prev_max.isNull() | (F.col("pos") > prev_max + DUPSPAN_W), 1).otherwise(0),
    ).withColumn("span_id", F.sum("new_span").over(w_run))
    return flagged.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(DUPSPAN_W) - F.min("pos")).alias("span_len"),
    )


def dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-corpus duplicated substring spans per document —
    the exact-substring dedup artifact of Lee et al. 2022 (SURVEY §2 #141),
    the span-granular step doc-level minhash and disjoint-segment
    boilerplate_scrub both miss (a 12-token quote inside an otherwise
    unique doc is invisible to both).

    Output: (doc_id, span_start, span_len, span_text) — one row per
    maximal duplicated span; docs without duplicated windows emit nothing.
    span_text is recovered by ONE join of the KB-per-doc span list back to
    the narrow corpus scan on doc_id (not by carrying window strings
    through the merge shuffles)."""
    docs = _docs(spark, sf_dir)
    spans = _dup_islands(_dup_positions(docs))
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    return spans.join(toks, "doc_id").select(
        "doc_id",
        "span_start",
        "span_len",
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("span_start") + 1, F.col("span_len"))
        ).alias("span_text"),
    )


def dup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut every maximal duplicated span (dup_spans) out of the corpus —
    the scrub half of Lee et al. 2022 (SURVEY §2 #142): keep each doc's
    tokens that no duplicated window covers, preserving original order.

    The per-doc span list is KB-sized, so it aggregates to an array and
    joins back to the narrow corpus scan on doc_id; the keep/drop decision
    runs as a higher-order filter in whole-stage codegen (O(n_tok · n_spans)
    per doc, both small), never in Python.

    Output: (doc_id, clean_text, n_tokens_kept, n_tokens_removed) — one row
    per document (clean_text = '' when spans cover everything: count
    accounting beats silent row loss for a curation audit trail)."""
    docs = _docs(spark, sf_dir)
    spans = (
        _dup_islands(_dup_positions(docs))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("span_start", "span_len")).alias("spans"))
    )
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    joined = toks.join(spans, "doc_id", "left").withColumn(
        "kept",
        F.filter(
            F.arrays_zip(
                F.sequence(F.lit(0), F.size(F.col("toks")) - 1).alias("i"),
                F.col("toks").alias("t"),
            ),
            lambda z: ~F.exists(
                F.coalesce(
                    F.col("spans"),
                    F.array().cast("array<struct<span_start:int,span_len:int>>"),
                ),
                lambda s: (z["i"] >= s["span_start"])
                & (z["i"] < s["span_start"] + s["span_len"]),
            ),
        ),
    )
    return joined.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform(F.col("kept"), lambda z: z["t"])
        ).alias("clean_text"),
        F.size(F.col("kept")).cast("long").alias("n_tokens_kept"),
        (F.size(F.col("toks")) - F.size(F.col("kept")))
        .cast("long")
        .alias("n_tokens_removed"),
    )


def dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #145: the per-source corpus-duplication DASHBOARD — the
    corpus-health twin of index_stats (index health). One row per source
    with the numbers a curation operator reads before choosing thresholds:
    how much of each source is exact-duplicate mass, how much near-dup
    mass (minhash-canonical, same keep/drop rule the pipeline applies),
    and the token volume at stake.

    Plan: one narrow docs scan computes (source, md5, token count) per
    doc; the near-dup side joins dedup_minhash_canonical on doc_id (its
    cost IS the minhash pipeline, shared bucketing and all); one groupBy
    on the KB-sized source key space with map-side combine. A doc counts
    as near-dup when its canonical is another doc — attribution is to
    the doc's OWN source even when the canonical lives elsewhere (the
    drop happens in this source; cross-source pairs are why source_mix
    exists).

    exact_dup_docs and near_dup_docs OVERLAP — an exact duplicate of a
    ≥3-token doc is also a minhash near-duplicate (identical text ⇒
    identical shingle set ⇒ canonical_id != doc_id). r8 adds the DISJOINT
    column the overlap note used to warn about: near_only_dup_docs counts
    docs flagged by the near-dup rule that are NOT exact duplicates, so
    exact_dup_docs + near_only_dup_docs is the union dup mass and the
    dashboard is summable. A doc is "exact dup" when it is not its
    (source, text-hash) group's min doc_id — per group of size g that is
    g-1 docs, so the flag sums to exactly the old count-minus-distinct
    exact_dup_docs.

    Output: (source, n_docs, exact_dup_docs, near_dup_docs,
    near_only_dup_docs, tokens_total, near_dup_ratio)."""
    docs = _docs(spark, sf_dir)
    canon = dedup_minhash_canonical(spark, sf_dir).select(
        "doc_id", "canonical_id"
    )
    per_doc = (
        docs.select(
            "doc_id",
            "source",
            F.md5(F.col("text")).alias("h"),
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        )
        .withColumn(
            "is_exact_dup",
            F.col("doc_id") != F.min("doc_id").over(Window.partitionBy("source", "h")),
        )
        .join(canon, "doc_id")
    )
    near = F.col("canonical_id") != F.col("doc_id")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct("h")).alias("exact_dup_docs"),
        F.sum(F.when(near, 1).otherwise(0)).alias("near_dup_docs"),
        F.sum(F.when(near & ~F.col("is_exact_dup"), 1).otherwise(0)).alias(
            "near_only_dup_docs"
        ),
        F.sum("n_tok").cast("long").alias("tokens_total"),
        F.round(
            F.sum(F.when(near, 1).otherwise(0)) / F.count(F.lit(1)), 4
        ).alias("near_dup_ratio"),
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dedup — the curation step a growing corpus runs
    daily: a small NEW batch (doc_id % INCR_MOD == 0, the synthetic delta,
    same device as index_upsert's UPSERT_MOD) is checked against the OLD
    corpus; output is every verified (new_id, old_id, jaccard ≥ τ) pair,
    i.e. the new docs to drop before ingestion.

    Scale shape — the whole point of the incremental form: the old corpus's
    band table is the persisted index of a real deployment and NEVER
    shuffles here; the new side (corpus/INCR_MOD docs × n_bands rows) is
    broadcast to it, so the per-batch cost is one old-corpus scan with a
    map-side hash probe, not a self-join. No MAX_BUCKET cap: the pair count
    is bounded per NEW doc by its band values' document frequency, and the
    batch is small by definition (the self-join family caps because there
    the blowup is corpus × corpus).

    Output: (new_id, old_id, jaccard)."""
    docs = _docs(spark, sf_dir)
    sh = _shingle_hashes(docs)
    sig = sh.groupBy("doc_id").agg(
        *[F.min(universal_hash(F.col("h"), j)).alias(f"mh_{j}") for j in range(MINHASH_K)]
    )
    bands = _minhash_bands(sig)
    is_new = F.col("doc_id") % INCR_MOD == 0
    new_b = bands.where(is_new).select(F.col("doc_id").alias("new_id"), "band", "bval")
    old_b = bands.where(~is_new).select(F.col("doc_id").alias("old_id"), "band", "bval")
    cand = (
        old_b.join(F.broadcast(new_b), ["band", "bval"])
        .select("new_id", "old_id")
        .distinct()
    )
    ds = sh.select("doc_id", F.col("h").alias("g")).distinct()
    return _jaccard_on(cand, ds, MINHASH_JACCARD_TAU, a="new_id", b="old_id")


def dedup_minhash_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision a pipeline actually applies: canonical
    representative per doc = min doc_id over its verified near-duplicates
    (single hop, deterministic; docs with no dup map to themselves).

    Output: (doc_id, canonical_id, n_dups)."""
    docs = _docs(spark, sf_dir)
    # localCheckpoint: `near` feeds BOTH sides of the symmetrization union —
    # the same r10 decision as dedup_embedding_cosine's (knn.py): without it
    # the post-exchange verify tails of the whole minhash pipeline run once
    # per branch (exchange reuse only dedups up to the last Exchange). The
    # pair set is KB-bounded (verified candidates above tau). r13.
    near = dedup_minhash_lsh(spark, sf_dir).localCheckpoint()
    sym = (
        near.select(F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("other"))
        .unionAll(near.select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("other")))
        .unionAll(docs.select("doc_id", F.col("doc_id").alias("other")))
    )
    return sym.groupBy("doc_id").agg(
        F.min("other").alias("canonical_id"),
        (F.count(F.lit(1)) - 1).alias("n_dups"),
    )


def _star_phase(e: DataFrame, large: bool) -> DataFrame:
    """One alternating-star phase over an undirected edge set (doc_a, doc_b).

    Per node u with min-incident m(u) = min(neighbors ∪ {u}):
    - large-star rewires u's STRICTLY LARGER neighbors to m(u);
    - small-star rewires u's ≤ neighbors to m(u);
    and u itself connects to m(u). Self-loops drop; the result is distinct.
    Both phases preserve connectivity (every rewired edge goes through u's
    star) and only ever point edges at smaller ids."""
    # no distinct on the symmetrized view: the min-aggregate below is
    # duplicate-insensitive (map-side combine collapses them) and the
    # rewired output is distinct-ed anyway — one less exchange per phase
    sym = e.unionAll(
        e.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    m = sym.groupBy("doc_a").agg(F.min("doc_b").alias("mn")).select(
        "doc_a", F.least(F.col("mn"), F.col("doc_a")).alias("mn")
    )
    cond = F.col("doc_b") > F.col("doc_a") if large else F.col("doc_b") <= F.col("doc_a")
    rewired = (
        sym.join(m, "doc_a")
        .where(cond)
        .select(F.col("doc_b").alias("doc_a"), F.col("mn").alias("doc_b"))
    )
    self_edge = m.select(F.col("doc_a"), F.col("mn").alias("doc_b"))
    return (
        rewired.unionAll(self_edge)
        .where(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )


def _connected_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """Min-label connected components via ALTERNATING STARS (the
    large-star/small-star algorithm of Kiveris et al., "Connected
    Components in MapReduce and Beyond") — each round rewires the edge set
    itself toward star graphs centered at component minima, converging in
    O(log² n) rounds with small constants (prototype: 4-6 rounds on random
    graphs, 13 on a 3000-hop path; the previous propagate+jump loop took 36
    rounds on the sf0.1 embedding graph, and round COUNT is the wall-clock
    driver because each round is a fixed-cost materialization barrier).
    Chain-like template corpora — the adversarial case at 100 TB — are
    exactly what the star rewiring compresses fastest.

    nodes: (doc_id,); edges: (doc_a, doc_b), treated as undirected.
    Output: (doc_id, cluster_id) with cluster_id = min doc_id reachable."""
    # LAZY checkpoint (r13 opt §5): the plan is truncated at call time
    # either way (the Dataset wraps the checkpoint RDD immediately); eager
    # only adds a separate materialization job. The n_e count() below is
    # the first action, so it materializes the checkpoint AND returns the
    # size in ONE job instead of two.
    sym0 = edges.unionAll(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint(eager=False)
    # only edge-incident nodes can get a non-self label; everything else is
    # a singleton cluster emitted directly — on a mostly-unique corpus the
    # star loop then runs over a small fraction of N
    incident = sym0.select(F.col("doc_a").alias("doc_id")).distinct()
    singletons = nodes.join(incident, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    e = sym0
    n_e = e.count()
    for _ in range(max_rounds):
        # one large-star + one small-star per materialization round; the
        # phases compose lazily (no self-referencing subtree, unlike the
        # old pointer-jump), so only the round result is checkpointed —
        # LAZILY: the count() is the round's single materializing job
        # (eager checkpoint + count was two driver-sequential jobs/round)
        e2 = _star_phase(_star_phase(e, large=True), large=False).localCheckpoint(eager=False)
        # convergence: both sets are distinct, so equal size + empty
        # one-sided difference ⇒ equal sets (the exceptAll job only runs
        # when sizes match; isEmpty short-circuits on the first diff row)
        n_e2 = e2.count()
        changed = n_e2 != n_e or not e2.exceptAll(e).isEmpty()
        e, n_e = e2, n_e2
        if not changed:
            break
    # fixpoint edge set = stars: (member, component-min) for every non-min
    # member; minima label themselves
    gather = e.unionAll(e.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
    labels = (
        gather.groupBy("doc_a")
        .agg(F.min("doc_b").alias("mn"))
        .select(
            F.col("doc_a").alias("doc_id"),
            F.least(F.col("mn"), F.col("doc_a")).alias("cluster_id"),
        )
    )
    return labels.unionByName(singletons)


def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the verified minhash near-dup graph —
    the TRANSITIVE closure dedup_minhash_canonical deliberately stops short
    of (single-hop): a chain a~b~c collapses to one cluster here.
    Delegates to _connected_components (min-label propagation + pointer
    doubling, O(log diameter) rounds — see its docstring).

    Output: (doc_id, cluster_id) with cluster_id = min doc_id reachable.
    """
    docs = _docs(spark, sf_dir)
    near = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return _connected_components(docs.select("doc_id"), near)


def minhash_est_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-based Jaccard ESTIMATE for the banded candidate pairs:
    est = (# agreeing minhash components) / K. This is what runs at 100 TB
    when exact verification (a gram-set join) is too expensive — the
    estimator needs only the 2·K-integer signatures.

    Output: (doc_a, doc_b, est_jaccard) for every banded candidate pair."""
    from ..functions.blocking import capped_bucket_pairs

    docs = _docs(spark, sf_dir)
    sh = _shingle_hashes(docs)
    # persist: sig feeds three branches (bands + both gather sides); each
    # uncached recompute replays the full shingle explode — the dominant
    # scan at scale. N × (K+1) ints, MEMORY_AND_DISK.
    sig = sh.groupBy("doc_id").agg(
        *[F.min(universal_hash(F.col("h"), j)).alias(f"mh_{j}") for j in range(MINHASH_K)]
    ).persist()
    cand = capped_bucket_pairs(_minhash_bands(sig), ["band", "bval"], "doc_id")
    sa = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(f"mh_{j}").alias(f"a_{j}") for j in range(MINHASH_K)])
    sb = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(f"mh_{j}").alias(f"b_{j}") for j in range(MINHASH_K)])
    agree = None
    for j in range(MINHASH_K):
        t = F.when(F.col(f"a_{j}") == F.col(f"b_{j}"), 1).otherwise(0)
        agree = t if agree is None else agree + t
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(agree / F.lit(float(MINHASH_K)), 6).alias("est_jaccard"),
        )
    )
