"""Text-analysis operators over `documents` (SURVEY §2 #16-19).

Everything is a pure Catalyst expression (JVM, codegen) — no Python in the
hot path — and every float output is rounded at the edge so the DuckDB
oracles match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..constants import LANG_MARKERS, STOPWORDS_EN, TOKEN_REGEX
from ..functions.text import fingerprint
from ..session import configure


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    # widen: full-scan + heavy per-row expression work (see io.table)
    return io.table(spark, sf_dir, "documents", widen=True)


def _count_in(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def _lang_pred(toks: Column) -> tuple[Column, Column]:
    """(predicted language, best score) — shared by lang_id and the composed
    corpus_clean so the composition stays a single-scan plan."""
    scores = {lang: _count_in(toks, words) for lang, words in LANG_MARKERS}
    best = F.greatest(*scores.values())
    pred = None
    for lang, _ in reversed(LANG_MARKERS):
        cond = F.when(scores[lang] == best, F.lit(lang))
        pred = cond.otherwise(pred) if pred is not None else cond
    return pred, best


def _quality_cols(toks: Column) -> dict[str, Column]:
    """Quality feature columns keyed by output name — shared by
    quality_score and corpus_clean (same single-scan rationale).

    r5 reformulations, measured at 500k docs (see BASELINE.md):
    - punct count via length(translate(text, <allowed chars>, '')) — a
      per-char map lookup, identical per-char semantics to
      regexp_count('[^a-z0-9 ]') but 21× faster (17.3 s → 0.8 s; the
      regex automaton was THE quality_score constant, not the stopword
      HOF the r4 verdict guessed — measured, 0 value mismatches).
    - token-length sum = n_chars - (n_tok - 1): splitting on every single
      space yields exactly n_tok parts whose content length is the text
      minus the n_tok-1 separators, for any text (empty tokens included),
      so the transform+aggregate HOF pass drops out entirely.
    The stopword membership HOF stays: measured equal (1.3 s) to a
    string-replace counting trick, so the simpler formulation wins."""
    n_tok = F.size(toks)
    n_chars = F.length("text")
    stop_ratio = F.round(_count_in(toks, STOPWORDS_EN) / n_tok, 6)
    punct_ratio = F.round(
        F.length(F.translate("text", "abcdefghijklmnopqrstuvwxyz0123456789 ", ""))
        / n_chars,
        6,
    )
    tok_len_sum = n_chars - n_tok + 1
    quality = F.round(
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio),
        6,
    )
    return {
        "n_tokens": n_tok.cast("int"),
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "mean_tok_len": F.round(tok_len_sum / n_tok, 6),
        "quality": quality,
    }


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic; ties break in LANG_MARKERS order.

    Output: (doc_id, lang_pred, best_score)."""
    docs = _docs(spark, sf_dir)
    pred, best = _lang_pred(F.split(F.col("text"), " "))
    return docs.select(
        "doc_id", pred.alias("lang_pred"), best.cast("int").alias("best_score")
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc quality features + a blended score in [0,1].

    Output: (doc_id, n_tokens, stop_ratio, punct_ratio, mean_tok_len, quality)."""
    docs = _docs(spark, sf_dir)
    cols = _quality_cols(F.split(F.col("text"), " "))
    return docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace, regex (BPE-ish word/symbol) and distinct token counts.

    Output: (doc_id, ws_tokens, re_tokens, uniq_tokens)."""
    from ..functions.text import tokens

    docs = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))  # r7 tokenizer seam (default bit-identical)
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("ws_tokens"),
        F.regexp_count("text", F.lit(TOKEN_REGEX)).cast("int").alias("re_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("uniq_tokens"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling hash of the token stream.

    Output: (doc_id, fingerprint)."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return docs.select("doc_id", fingerprint(toks).alias("fingerprint"))


def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the standard prep step that turns
    documents into training-sized pieces (CHUNK_TOKENS window, CHUNK_STRIDE
    stride). One narrow pass: starts are a sequence, chunks a transform over
    slices, exploded with their ordinal as chunk_id. Output grows ~n_tokens/
    stride per doc; no shuffle at all."""
    from ..constants import CHUNK_STRIDE, CHUNK_TOKENS

    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(CHUNK_STRIDE))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, CHUNK_TOKENS))
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_text")
    ).withColumn("n_tokens", F.size(F.split(F.col("chunk_text"), " ")))


def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end pipeline query: materialize the clean training
    corpus — exact-dedup keep-first ∧ language == CORPUS_LANG ∧ quality ≥ τ.

    This is what the whole operator suite exists for; it composes #10 (exact
    dedup), #16 (lang-id), and #17 (quality) in ONE single-scan plan: the
    lang/quality expressions are inlined over the same scan that feeds the
    dedup window, so the only shuffle is the window exchange on the content
    hash (the previous keep⋈quality⋈lang formulation cost 3 scans + 2
    doc_id joins — measured ~2.5×). Output: (doc_id, lang_pred, quality,
    n_tokens)."""
    from pyspark.sql.window import Window

    from ..constants import CORPUS_LANG, CORPUS_QUALITY_TAU

    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    pred, _ = _lang_pred(toks)
    cols = _quality_cols(toks)
    w = Window.partitionBy(F.md5("text"))
    return (
        docs.withColumn("canonical_id", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("canonical_id"))
        .select(
            "doc_id",
            pred.alias("lang_pred"),
            cols["quality"].alias("quality"),
            cols["n_tokens"].alias("n_tokens"),
        )
        .where(
            (F.col("lang_pred") == CORPUS_LANG)
            & (F.col("quality") >= CORPUS_QUALITY_TAU)
        )
    )


def corpus_curate_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE curation funnel in one declarative plan — the flagship
    pipeline a training-data team runs end-to-end: exact-dedup keep-first →
    language gate → quality gate → Gopher repetition gate → benchmark
    decontamination → per-source contribution cap → the final corpus
    manifest.

    Composition shape (100 TB): one documents scan feeds the dedup window
    with the lang/quality expressions inlined (corpus_clean's single-scan
    trick); the repetition and contamination DROP-lists are computed from
    the SURVIVORS' gram streams — filter-first, so the expensive explodes
    run on the thinned corpus — and applied as broadcast anti-joins (a
    drop-list is small by construction; broadcasting it costs nothing and
    the corpus never shuffles for it); the source cap is the final window.
    The shuffles that remain (content-hash window, two doc-keyed gram
    aggregations with map-side partials, source window) are each forced by
    their semantics.

    Output: (doc_id, source, quality, n_tokens, rk)."""
    from pyspark.sql.window import Window

    from ..constants import (
        CORPUS_LANG,
        CORPUS_QUALITY_TAU,
        CURATE_REP_MAX,
        DECONTAM_MOD,
        DECONTAM_N,
        REP_NGRAM,
        SOURCE_CAP,
    )
    from ..functions.text import word_shingles

    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    pred, _ = _lang_pred(toks)
    cols = _quality_cols(toks)
    w = Window.partitionBy(F.md5("text"))
    surv = (
        docs.withColumn("canonical_id", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("canonical_id"))
        .select(
            "doc_id",
            "source",
            "text",
            pred.alias("lang_pred"),
            cols["quality"].alias("quality"),
            cols["n_tokens"].alias("n_tokens"),
        )
        .where(
            (F.col("lang_pred") == CORPUS_LANG)
            & (F.col("quality") >= CORPUS_QUALITY_TAU)
        )
        # three downstream branches (repetition, contamination, kept) read
        # the survivors; materialize once instead of re-running the scan +
        # dedup window + gate expressions per branch (measured 2.8 → 2.2 s
        # at sf0.1). localCheckpoint, not persist: blocks are dropped with
        # the RDD instead of pinning the session (the r2 ivf lesson).
        .localCheckpoint(eager=True)
    )
    stoks = F.split(F.col("text"), " ")
    # Gopher gate: dup-bigram ratio over survivors only (keep multiplicity)
    per_gram = (
        surv.where(F.size(stoks) >= REP_NGRAM)
        .select("doc_id", F.explode(word_shingles(stoks, REP_NGRAM)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rep_bad = (
        per_gram.groupBy("doc_id")
        .agg(F.sum("c").alias("ng"), F.count(F.lit(1)).alias("dg"))
        .where(F.round(F.lit(1.0) - F.col("dg") / F.col("ng"), 6) > CURATE_REP_MAX)
        .select("doc_id")
    )
    # decontamination: benchmark grams come from the FULL corpus (the
    # held-out docs are dropped from the output regardless of dedup fate)
    gtoks = F.split(F.col("text"), " ")
    bench = (
        docs.where((F.col("doc_id") % DECONTAM_MOD == 0) & (F.size(gtoks) >= DECONTAM_N))
        .select(F.explode(F.array_distinct(word_shingles(gtoks, DECONTAM_N))).alias("g"))
        .distinct()
    )
    contam = (
        surv.where(F.size(stoks) >= DECONTAM_N)
        .select("doc_id", F.explode(F.array_distinct(word_shingles(stoks, DECONTAM_N))).alias("g"))
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    kept = (
        surv.where(F.col("doc_id") % DECONTAM_MOD != 0)
        .join(F.broadcast(rep_bad), "doc_id", "left_anti")
        .join(F.broadcast(contam), "doc_id", "left_anti")
    )
    wcap = Window.partitionBy("source").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    return (
        kept.withColumn("rk", F.row_number().over(wcap).cast("int"))
        .where(F.col("rk") <= SOURCE_CAP)
        .select("doc_id", "source", "quality", "n_tokens", "rk")
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every training-data pipeline runs
    before packaging: emails and long digit runs (phone/account-shaped) are
    replaced with a redaction token. Narrow regexp pass, no shuffle; the
    patterns are RE2∩Java-regex compatible so the DuckDB oracle applies the
    identical automaton. Output carries the scrubbed text's md5 (not the
    text itself) plus match counts, keeping the result compact and still
    fully content-determined.

    Output: (doc_id, n_emails, n_longnums, scrubbed_md5)."""
    from ..constants import PII_EMAIL_RE, PII_LONGNUM_RE, PII_REDACTION

    docs = _docs(spark, sf_dir)
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", PII_EMAIL_RE, PII_REDACTION),
        PII_LONGNUM_RE,
        PII_REDACTION,
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("text", F.lit(PII_LONGNUM_RE)).cast("int").alias("n_longnums"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling: keep docs whose 60-bit content
    hash lands in the first SAMPLE_KEEP of SAMPLE_BUCKETS buckets — the
    reproducible down-sampling primitive (same doc → same decision on any
    cluster, any partitioning, any day). Narrow filter, fully pushed work.

    Output: (doc_id, sample_bucket)."""
    from ..constants import SAMPLE_BUCKETS, SAMPLE_KEEP
    from ..functions.text import md5_hash60

    docs = _docs(spark, sf_dir)
    bucket = F.pmod(md5_hash60(F.col("text")), F.lit(SAMPLE_BUCKETS))
    return docs.select("doc_id", bucket.cast("int").alias("sample_bucket")).where(
        F.col("sample_bucket") < SAMPLE_KEEP
    )


def source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data MIXING toward a target distribution: down-sample each source to
    an equal share of the corpus (rate_s = min(1, (N/|sources|)/n_s)),
    deterministically by content hash — the "re-weight the crawl mix"
    operation every pretraining run does, as one reproducible query.

    Unlike source_cap (hard top-K per source), this preserves a uniform
    RANDOM-looking but deterministic subset per source, so token statistics
    stay unbiased. Rates are integer ppm computed with pure IEEE
    double-multiply/divide + floor — bit-identical across engines; the
    keep decision is the shared 60-bit md5 hash mod 1e6 < rate_ppm (same
    doc → same decision on any cluster, any day).

    Scale shape: per-source counts are |sources| rows → broadcast back;
    the corpus itself never shuffles — scan, hash, filter.

    Output: (doc_id, source, rate_ppm) for kept docs."""
    from ..functions.text import md5_hash60

    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    tot = docs.agg(
        F.count(F.lit(1)).alias("total"), F.countDistinct("source").alias("nsrc")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1_000_000).cast("bigint"),
            F.floor(
                F.col("total") * F.lit(1_000_000.0) / (F.col("nsrc") * F.col("n_s"))
            ).cast("bigint"),
        ).alias("rate_ppm"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .where(F.pmod(md5_hash60(F.col("text")), F.lit(1_000_000)) < F.col("rate_ppm"))
        .select("doc_id", "source", "rate_ppm")
    )


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition metrics — the quality filter
    that catches boilerplate/spam the cross-doc dedup family can't see:
    repeated tokens and repeated bigrams WITHIN one document.

    Scale shape: one explode of per-doc bigrams, then two groupBy stages that
    both partial-aggregate map-side and key on doc_id — the shuffle carries
    O(docs · distinct-bigrams-per-doc) rows and stays co-partitioned across
    the two aggregations (no second exchange).

    Output: (doc_id, n_bigrams, dup_bigram_ratio, top_bigram_share,
    dup_token_ratio), ratios rounded at the edge."""
    from ..constants import REP_NGRAM
    from ..functions.text import word_shingles

    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    base = docs.where(F.size(toks) >= REP_NGRAM).select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("u_tok"),
        # keep multiplicity: repetition is exactly what we're measuring
        F.explode(word_shingles(toks, REP_NGRAM)).alias("g"),
    )
    per_gram = base.groupBy("doc_id", "n_tok", "u_tok", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_gram.groupBy("doc_id", "n_tok", "u_tok")
        .agg(
            F.sum("c").alias("ng"),
            F.count(F.lit(1)).alias("dg"),
            F.max("c").alias("mx"),
        )
        .select(
            "doc_id",
            F.col("ng").cast("int").alias("n_bigrams"),
            F.round(F.lit(1.0) - F.col("dg") / F.col("ng"), 6).alias("dup_bigram_ratio"),
            F.round(F.col("mx") / F.col("ng"), 6).alias("top_bigram_share"),
            F.round(F.lit(1.0) - F.col("u_tok") / F.col("n_tok"), 6).alias("dup_token_ratio"),
        )
    )


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag training docs sharing any word
    DECONTAM_N-gram with the held-out "benchmark" set (docs whose id ≡ 0 mod
    DECONTAM_MOD stand in for the eval suite; in production the benchmark
    grams arrive as a side input).

    Scale shape: the benchmark gram set is tiny relative to the corpus
    (|benchmarks| ≪ |docs|) → built once, distinct-ified, and BROADCAST into
    the training-side gram stream — no shuffle of the corpus at all; the
    per-doc count partial-aggregates map-side.

    Output: (doc_id, n_shared_grams) — only contaminated docs."""
    from ..constants import DECONTAM_MOD, DECONTAM_N
    from ..functions.text import word_shingles

    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    grams = docs.where(F.size(toks) >= DECONTAM_N).select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(toks, DECONTAM_N))).alias("g"),
    )
    bench = (
        grams.where(F.col("doc_id") % DECONTAM_MOD == 0).select("g").distinct()
    )
    return (
        grams.where(F.col("doc_id") % DECONTAM_MOD != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequencies: how many vocabulary tokens appear in exactly
    df documents — the corpus-health curve (Zipf tail vs boilerplate head)
    monitoring reads. Two partial-aggregated shuffles over tiny keyspaces.

    Output: (df, n_tokens)."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token")
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return dfreq.groupBy("df").agg(F.count(F.lit(1)).alias("n_tokens"))


def idf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token inverse document frequency over the corpus — the weighting
    table TF-IDF retrieval and rare-token quality heuristics read from.

    idf = ln(N / df), df = docs containing the token. One explode of
    per-doc DISTINCT tokens (array_distinct before explode keeps the shuffle
    at O(docs·vocab_per_doc), not O(tokens)), one count per token. Output:
    (token, df, idf) rounded at the edge."""
    docs = _docs(spark, sf_dir)
    n_docs = docs.count()  # driver-side scalar: one cheap count job, the
    # alternative (crossJoin with a count agg) shuffles every row for no gain
    tok = docs.select(
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "token",
            "df",
            F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("idf"),
        )
    )


def corpus_to_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation-to-training handoff in ONE Catalyst plan:
    corpus_clean's survivors (exact-dedup keep-first ∧ language ∧ quality)
    flow straight into seq_pack's sharded concat-and-chunk packing — the
    end-to-end "raw crawl → fixed-length training sequences" pipeline query.

    Composition is the point: the packer reuses the n_tokens the clean pass
    already computed (no re-tokenization, no extra scan), so the whole
    pipeline is one documents scan + two keyed exchanges (content-hash
    window for dedup, shard window for the running sum). At 100 TB those
    are exactly the two shuffles you cannot avoid and nothing else.

    Output: (doc_id, shard, n_tokens, seq_first, seq_offset)."""
    from pyspark.sql.window import Window

    from ..constants import PACK_LEN, PACK_SHARDS

    survivors = corpus_clean(spark, sf_dir)
    base = survivors.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).cast("int").alias("shard"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(cum / PACK_LEN).cast("int").alias("seq_first"),
        F.pmod(cum, F.lit(PACK_LEN)).cast("int").alias("seq_offset"),
    )


def seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the concat-and-chunk step that turns a curated
    corpus into fixed-length training sequences: documents are concatenated
    in a deterministic order and the token stream is cut every PACK_LEN
    tokens; each doc learns which sequence(s) it lands in and at what offset.

    Scale shape: a GLOBAL ordered cumsum would serialize the corpus through
    one partition, so packing is sharded — doc_id % PACK_SHARDS picks an
    independent packing stream and the running-sum window partitions on the
    shard. One exchange (by shard), sort within shard, pure Catalyst window
    after; at 1000 executors you raise PACK_SHARDS, not the algorithm.
    Training runs shuffle shards anyway, so cross-shard order is free to give
    up.

    Output: (doc_id, shard, n_tokens, seq_first, seq_last, seq_offset)."""
    from pyspark.sql.window import Window

    from ..constants import PACK_LEN, PACK_SHARDS

    configure(spark)
    # no widen: the shard exchange below redistributes the scan anyway
    docs = io.table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).cast("int").alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(cum / PACK_LEN).cast("int").alias("seq_first"),
        F.floor((cum + F.col("n_tokens") - 1) / PACK_LEN).cast("int").alias(
            "seq_last"
        ),
        F.pmod(cum, F.lit(PACK_LEN)).cast("int").alias("seq_offset"),
    )


def source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contribution cap — keep at most SOURCE_CAP docs from any
    one source (longest first, doc_id tiebreak), the diversity guard that
    stops one crawl domain from dominating the training mix.

    Scale shape: one exchange keyed on source, a per-source sort bounded by
    row_number's early-out (rows past the cap never leave the sort), output
    bounded at sources x CAP. A mega-source skews its one partition; AQE
    splits the exchange and the sort spills — the cap itself bounds what
    survives. Pure Catalyst, no joins.

    Output: (doc_id, source, n_chars, rk)."""
    from pyspark.sql.window import Window

    from ..constants import SOURCE_CAP

    configure(spark)
    # no widen: reads 3 narrow columns (never `text`) and goes straight
    # into the source-keyed exchange
    docs = io.table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= SOURCE_CAP)
    )


def quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-percentile gate — keep each language's top half
    by blended quality score. Fixed thresholds (corpus_clean's tau) drift as
    the mix shifts; a percentile gate self-calibrates per language, which is
    how production pipelines actually budget quality cuts across languages.

    Scale shape: the score is the same single-scan Catalyst expression as
    quality_score; the gate is one exchange keyed on lang + a within-language
    sort for percent_rank (ties broken by doc_id, so the rank — and the
    result — is deterministic). At 100 TB a full per-lang sort is a real
    range-sort; the documented relaxation is approx_percentile to pick the
    cut value in one aggregate, trading exactness for no sort — kept exact
    here because the oracle gate demands bit-equality.

    Output: (doc_id, lang, quality, pr)."""
    from pyspark.sql.window import Window

    from ..constants import QUALITY_PCT

    docs = _docs(spark, sf_dir)
    cols = _quality_cols(F.split(F.col("text"), " "))
    scored = docs.select("doc_id", "lang", cols["quality"].alias("quality"))
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    return (
        scored.withColumn("pr", F.round(F.percent_rank().over(w), 6))
        .where(F.col("pr") >= QUALITY_PCT)
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: a FIXED quota of docs per language, selected by
    content-hash order — the "equal representation" mix step (contrast:
    corpus_sample keeps a global %, source_cap prefers long docs). Hash
    order makes the pick unbiased w.r.t. any corpus ordering and
    reproducible on any cluster.

    Scale shape: one exchange keyed on lang + a per-stratum sort bounded by
    row_number's early-out. Languages are few and large → per-stratum
    volume is the skew axis; the documented relaxation at 100 TB is a
    two-level quota (hash-bucket pre-sample per stratum, then exact top-up)
    — kept single-pass exact here for the oracle.

    Output: (doc_id, lang, pick_rank)."""
    from pyspark.sql.window import Window

    from ..constants import STRATA_QUOTA

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.md5("text"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).cast("int").alias("pick_rank"))
        .where(F.col("pick_rank") <= STRATA_QUOTA)
    )


def doc_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the perplexity-style quality signal:
    train token → -ln(count/total) over the corpus in one aggregate, then
    score each doc by mean token NLL. High-NLL docs are gibberish/outliers;
    low-NLL docs are boilerplate — both tails get cut in real pipelines.

    Determinism contract: per-token NLL is rounded at LM_ROUND then summed
    as decimal (order-free), so the result is bit-stable on any
    partitioning and matches DuckDB exactly.

    Scale shape: token explode → vocab aggregate (map-side partial); the
    vocab table is tiny (words follow Zipf — even web-scale vocab is MBs)
    and BROADCASTS into the scoring join, so the only real shuffle is the
    per-doc aggregation keyed on doc_id.

    Output: (doc_id, n_tokens, avg_nll)."""
    from ..constants import DEC, LM_ROUND

    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    total = tok.count()  # driver-side scalar (same rationale as idf_scores)
    vocab = tok.groupBy("token").agg(
        F.round(-F.log(F.count(F.lit(1)) / F.lit(float(total))), LM_ROUND).alias("nll")
    )
    return (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # exact decimal sum (order-free) → double division at the edge:
            # identical arithmetic on both engines
            F.round(
                F.sum(F.col("nll").cast(DEC)).cast("double") / F.count(F.lit(1)),
                LM_ROUND,
            ).alias("avg_nll"),
        )
    )


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the lang_id heuristic against the corpus's
    ground-truth `lang` column — the evaluation rollup a pipeline publishes
    when it ships a classifier (per-cell counts; precision/recall are
    ratios of these cells).

    Single scan: the prediction is the same Catalyst expression as lang_id
    inlined over the scan, and the matrix is a tiny groupBy — no joins.

    Output: (lang_true, lang_pred, n_docs)."""
    docs = _docs(spark, sf_dir)
    pred, _ = _lang_pred(F.split(F.col("text"), " "))
    return (
        docs.select(F.col("lang").alias("lang_true"), pred.alias("lang_pred"))
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal — the CCNet/RefinedWeb "line
    dedup" curation step (drop lines shared across many pages: headers,
    nav bars, license blurbs), re-expressed over this corpus's flat text
    as fixed SEG_TOKENS non-overlapping token windows (the corpus has no
    newline structure; the unit is a config choice, the plan is not).

    Plan shape, chosen for the 100 TB case:
    1. one narrow scan → posexplode segments (output ∝ corpus tokens);
    2. groupBy(segment) count rides map-side partial aggregation, then
       keeps ONLY segments with freq ≥ BOILER_MIN_FREQ — the boilerplate
       VOCABULARY, which is tiny relative to the corpus by Zipf (the whole
       point of the step is that few distinct segments repeat widely);
    3. broadcast LEFT ANTI join segments against that vocabulary — the
       corpus-sized side never shuffles on the segment key a second time;
       if a pathological corpus ever grew the vocabulary past the
       broadcast ceiling, dropping the hint degrades this to a plain
       shuffled anti-join with identical semantics (AQE re-plans it);
    4. reassemble per doc: collect kept (seg_id, seg) structs, array_sort
       restores document order, array_join concatenates — grouping by the
       original partition key doc_id, so one exchange.

    Docs whose every segment is boilerplate survive with clean_text = ''
    (count accounting beats silent row loss for a curation audit trail).

    Output: (doc_id, clean_text, n_kept, n_removed)."""
    from ..constants import BOILER_MIN_FREQ, SEG_TOKENS

    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(SEG_TOKENS))
    seg_arr = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, SEG_TOKENS))
    )
    segs = docs.select("doc_id", F.posexplode(seg_arr).alias("seg_id", "seg"))
    boiler = (
        segs.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= BOILER_MIN_FREQ)
        .select("seg")
    )
    kept = segs.join(F.broadcast(boiler), "seg", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_id", "seg"))),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    # per-doc totals come from a second NARROW docs scan (size of the
    # segment array — no explode, no exchange), not a groupBy over the
    # exploded corpus
    totals = docs.select("doc_id", F.size(seg_arr).alias("n_seg"))
    return totals.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_seg") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )
