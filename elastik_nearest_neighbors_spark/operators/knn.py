"""kNN operators: exact brute-force and LSH-accelerated ANN search.

`ann_search_lsh` is the reference's `GET .../_aknn_search?k1&k2` re-expressed
as a batch of queries:
1. candidates = index entries sharing ≥1 (table, hash) bucket with the query;
   ranked by number of matching tables (ES term-match score), top-k1,
   tie-broken by neighbor id;
2. exact euclidean re-rank of the k1 candidates, top-k2.

Scale shape (100 TB): the query side is small → broadcast; candidate
generation is a broadcast hash join against the exploded index (index never
shuffles); match counts partial-aggregate map-side; re-rank touches ≤ Q·k1
rows. Exact kNN avoids the Q×N shuffle entirely via per-partition top-k
(mapInPandas) before a tiny global top-k.

Determinism: distances rounded to DIST_ROUND decimals before ranking; all
ties broken by neighbor id. Self-matches are excluded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import io
from ..constants import ANN_K1, ANN_K2, DIST_ROUND, KNN_K, N_QUERIES
from ..functions.vector import as_double, euclidean
from ..session import configure
from .lsh import LshModel, build_index, explode_hashes


def _partial_topk(scored: DataFrame, val_col: str, k: int, ascending: bool) -> DataFrame:
    """Per-partition top-k before the final window — since r13 a NO-OP:
    Spark ≥3.5 inserts a native WindowGroupLimit (Partial before the
    exchange, Final after) for `row_number() ≤ k` windows, which is exactly
    the pre-shuffle shrink the old mapInPandas fold did — minus a full
    JVM→Arrow→pandas→JVM round trip of the N·Q scored stream (guide §4.1:
    the r13 before-plans show BOTH the Python fold AND the redundant native
    WindowGroupLimit pair around the shuffle). Kept as a seam (and for the
    explanation) so every corpus-wide scorer documents where its partial
    top-k lives; callers' windows all order by (val, neighbor_id), which
    is what lets the native group-limit keep the exact global top-k."""
    return scored


def knn_exact(
    index_df: DataFrame,
    query_df: DataFrame,
    k: int = KNN_K,
    metric: str = "euclidean",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact kNN of each query against the index (self excluded).

    Output: (query_id, neighbor_id, distance|cosine) — top-k per query.
    """
    q = query_df.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    idx = index_df.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("nv")
    )
    if metric == "euclidean":
        val, val_col, asc = euclidean(F.col("qv"), F.col("nv")), "distance", True
    elif metric == "cosine":
        # norms are per-vector, not per-pair: compute each once in the narrow
        # scan (N + Q evaluations instead of N·Q) and divide at the pair.
        # dot/(|q|·|n|) is the same float expression cosine() expands to, so
        # values are bit-identical to the naive form.
        from ..functions.vector import dot, l2_norm

        q = q.withColumn("qn", l2_norm(F.col("qv")))
        idx = idx.withColumn("nn", l2_norm(F.col("nv")))
        val, val_col, asc = (
            dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")),
            "cosine",
            False,
        )
    elif metric == "dot":
        # max inner product search (MIPS) — the retrieval metric for
        # unnormalized embedding models
        from ..functions.vector import dot

        val, val_col, asc = dot(F.col("qv"), F.col("nv")), "dot", False
    else:
        raise ValueError(metric)
    scored = (
        idx.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(val, DIST_ROUND).alias(val_col))
    )
    local = _partial_topk(scored, val_col, k, asc)
    order = [F.col(val_col).asc() if asc else F.col(val_col).desc(), F.col("neighbor_id").asc()]
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        local.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def rank_term_matches(
    counts: DataFrame,
    index_df: DataFrame,
    query_df: DataFrame,
    k1: int = ANN_K1,
    k2: int = ANN_K2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Shared tail of every `_aknn_search`-shaped query: term-match counts
    (query_id, neighbor_id, n_match) → top-k1 by match count → exact
    euclidean re-rank → top-k2. The re-rank gather broadcasts the query
    side; only ≤ Q·k1 index vectors are touched."""
    w1 = Window.partitionBy("query_id").orderBy(F.desc("n_match"), F.asc("neighbor_id"))
    k1_sel = counts.withColumn("rn", F.row_number().over(w1)).where(F.col("rn") <= k1).drop("rn")

    nvec = index_df.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("nv"))
    qvec = query_df.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    # broadcast the ≤ Q·k1 candidate list, STREAM the index side: without
    # the hint Catalyst broadcasts nvec (the whole corpus — tiny parquet
    # stats at bench SFs, a full-corpus shuffle-or-OOM at 100 TB) and the
    # gather inverts into corpus-ships-to-candidates
    scored = (
        F.broadcast(k1_sel).join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "n_match",
            F.round(euclidean(F.col("qv"), F.col("nv")), DIST_ROUND).alias("distance"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k2)
        .drop("rn")
    )


def ann_search_lsh(
    index_df: DataFrame,
    query_df: DataFrame,
    model: LshModel,
    k1: int = ANN_K1,
    k2: int = ANN_K2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reference `_aknn_search`: bucket term-match top-k1 → exact re-rank top-k2.

    Output: (query_id, neighbor_id, n_match, distance).
    """
    # measured: persisting the hashed index costs more (materialize + cached
    # read, and cached subtrees opt out of AQE) than the single Arrow-batched
    # hash pass it would save — the index side is consumed exactly once here
    idx_hashed = build_index(index_df, model, vec_col, id_col).select(id_col, "hashes")
    q_hashed = build_index(query_df, model, vec_col, id_col)

    idx_exp = explode_hashes(idx_hashed, id_col, "neighbor_id")
    q_exp = explode_hashes(q_hashed, id_col, "query_id")

    counts = (
        idx_exp.join(F.broadcast(q_exp), ["tbl", "hash"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    return rank_term_matches(counts, index_df, query_df, k1, k2, id_col, vec_col)


# ---- registry entries (spark, sf_dir) → DataFrame ---------------------------


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure(spark)
    # widen: the hash pandas_udf and distance expressions are the cost here,
    # and a single-row-group scan would pin them to one core (see io.table)
    return io.table(spark, sf_dir, "embeddings", widen=True)


_MODEL_CACHE: dict[str, LshModel] = {}


def _model_for(emb: DataFrame, sf_dir: str) -> LshModel:
    """Per-sf model cache. Uses the same driver-side pyarrow fit as the
    oracle builder (oracles_vector.lsh_model_for) — one source of truth,
    bit-identical on both sides, and no Spark job just to collect the
    KB-sized sample. (LshModel.fit_df remains the API for fitting from an
    arbitrary DataFrame, e.g. the streaming path.)"""
    from ..oracles_vector import lsh_model_for

    m = _MODEL_CACHE.get(sf_dir)
    if m is None:
        m = _MODEL_CACHE[sf_dir] = lsh_model_for(sf_dir)
    return m


def lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #1: the index itself — per-vector table hashes, exploded."""
    emb = _emb(spark, sf_dir)
    model = _model_for(emb, sf_dir)
    return explode_hashes(build_index(emb, model), "vec_id", "vec_id").select(
        "vec_id", F.col("tbl").cast("int").alias("tbl"), "hash"
    )


def ann_search_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    model = _model_for(emb, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return ann_search_lsh(emb, queries, model)


def ann_search_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH search (Lv et al., VLDB'07): each query probes, per
    table, its own bucket PLUS the LSH_MULTIPROBE buckets reached by
    flipping the lowest-|margin| bits — the recall knob that costs extra
    bucket LOOKUPS instead of extra tables: the index is untouched (same
    size, same single hash pass) and only the broadcast query side grows
    ×(1+P). A neighbor still matches at most one probed bucket per table
    (hashes differ), so n_match keeps its ≤T semantics and the k1/k2
    ranking tail is shared with the base search.

    Output: (query_id, neighbor_id, n_match, distance) top-ANN_K2."""
    from ..constants import LSH_MULTIPROBE

    emb = _emb(spark, sf_dir)
    model = _model_for(emb, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    idx_exp = explode_hashes(build_index(emb, model), "vec_id", "neighbor_id")
    step = 1 + LSH_MULTIPROBE
    qp = queries.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(model.probe_hash_udf(LSH_MULTIPROBE)(F.col("embedding"))).alias(
            "pos", "hash"
        ),
    ).select("query_id", (F.col("pos") / step).cast("int").alias("tbl"), "hash")
    counts = (
        idx_exp.join(F.broadcast(qp), ["tbl", "hash"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    return rank_term_matches(counts, emb, queries)


def ann_recall_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k2 of multi-probe LSH vs exact kNN — the lift over the base
    single-probe recall (ann_recall) is the knob's value, regression-guarded
    in tests."""
    ann = ann_search_lsh_multiprobe(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_of(ann, exact_ground_truth(spark, sf_dir))


def ann_search_lsh_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #99: `_aknn_search` composed with a metadata predicate —
    the ES host runs the hash term-match alongside ordinary query filters,
    so a production user's first request is "top-k neighbors WHERE <attr>".

    PRE-filter semantics (the correct composition): the label predicate is
    applied to the index side BEFORE candidate generation, so hashing,
    term-match and re-rank only touch qualifying vectors, and the top-k2 is
    the top-k2 of the filtered universe — post-filtering an unfiltered
    top-k2 would under-fill k whenever the predicate is selective.

    Scale shape: the filter lands in the parquet scan (PushedFilters —
    plan-contract tested; the index side is loaded un-widened precisely so
    no repartition sits between scan and filter), then the same
    broadcast-join candidate generation as ann_search_lsh. At 100 TB with a
    label-partitioned store this becomes partition pruning for free."""
    from ..constants import ANN_FILTER_LABEL

    emb = _emb(spark, sf_dir)
    model = _model_for(emb, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    filtered = io.table(spark, sf_dir, "embeddings").where(
        F.col("label") == ANN_FILTER_LABEL
    )
    return ann_search_lsh(filtered, queries, model)


def semantic_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic DOCUMENT retrieval — the composition a RAG / retrieval user
    runs: ANN over the document-backed subset of the vector space, top-k
    joined back to the documents table for metadata. The index side is a
    left-semi join against document ids (at 100 TB both sides are large and
    co-partition on the id; here Catalyst broadcasts the smaller), and the
    final metadata join touches only the Q·k result rows — the documents
    scan is joined against a broadcast of the ANSWER, never shuffled.

    Output: (query_id, doc_id, n_match, distance, source)."""
    emb = _emb(spark, sf_dir)
    model = _model_for(emb, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    docs = io.table(spark, sf_dir, "documents")
    indexed = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    topk = ann_search_lsh(indexed, queries, model)
    return topk.join(
        docs.select("doc_id", "source"), topk["neighbor_id"] == F.col("doc_id")
    ).select("query_id", "doc_id", "n_match", "distance", "source")


def knn_exact_euclidean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return knn_exact(emb, emb.where(F.col("vec_id") < N_QUERIES), metric="euclidean")


def knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-set kNN JOIN: every vector of one class (label =
    ANN_FILTER_LABEL) against the index of all OTHER classes — the batch
    "for each row of table A, its k nearest in table B" operator (label
    transfer, cross-dataset linkage, retrieval-augmentation joins). Unlike
    the canonical 8-query search entries, the query side here is a whole
    table slice, exercising the per-partition top-k path at Q ≈ N/10.

    Scale bound, stated honestly: this is the classic BLOCK strategy for a
    brute-force kNN join — broadcast the smaller side, per-partition top-k
    before the single shuffle — and it is exact and optimal while the query
    slice fits executor memory (here Q·D·8 bytes). When BOTH sides are at
    the 100 TB scale, exact kNN join is O(|A|·|B|) no matter the plan; the
    engine's answer at that point is the IVF-scoped approximate form
    (knn_graph's list-bounded pair step, with A and B assigned to the same
    coarse quantizer), trading the documented Voronoi-boundary recall loss
    for a Σ m² bound."""
    from ..constants import ANN_FILTER_LABEL

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("label") == ANN_FILTER_LABEL)
    idx = emb.where(F.col("label") != ANN_FILTER_LABEL)
    return knn_exact(idx, q, metric="euclidean")


def knn_exact_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return knn_exact(emb, emb.where(F.col("vec_id") < N_QUERIES), metric="cosine")


# exact-kNN ground truth, materialized once per (SparkContext, sf_dir): five
# recall queries (LSH/IVF/PQ/SQ8/sweep) grade against the SAME ground truth,
# and the brute-force kNN subtree is the most expensive part of each — the
# cache is a localCheckpoint of Q·k rows (KB-sized), same amortization class
# as _MODEL_CACHE and the persisted index stores.
_GT_CACHE: dict[tuple[str, str], DataFrame] = {}


def exact_ground_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id) exact euclidean top-k for the canonical query
    set — already localCheckpoint-ed; callers must NOT re-checkpoint."""
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _GT_CACHE.get(key)
    if df is None:
        df = (
            knn_exact_euclidean_q(spark, sf_dir)
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=True)
        )
        _GT_CACHE[key] = df
    return df


def _recall_of(ann: DataFrame, exact: DataFrame) -> DataFrame:
    """(query_id, recall): |ann ∩ exact| / |exact| per query, rounded 4.

    `exact` must arrive materialized (exact_ground_truth) — it feeds two
    branches (intersect + the per-query denominator) and would otherwise
    execute its whole kNN subtree twice. `ann` feeds exactly one consumer
    since the r10 broadcast rewrite, so the eager checkpoint it used to get
    here (a full barrier job per recall key, 11 keys + the families union)
    was pure overhead — removed r13 (opt guide §5: checkpoint only what is
    reused)."""
    # both sides are distinct (query_id, neighbor_id) rank lists bounded
    # by Q·k rows, so the intersection is an inner join on both columns —
    # broadcast, not the SortMergeJoin-with-two-Exchanges that .intersect
    # compiles to (r10 plan census: every recall twin carried smj=2)
    hits = (
        ann.join(F.broadcast(exact.select("query_id", "neighbor_id")),
                 ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall"),
        )
    )


def ann_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k2 of LSH ANN vs exact kNN, per query (quality metric the
    reference's benchmarks report)."""
    ann = ann_search_lsh_q(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_of(ann, exact_ground_truth(spark, sf_dir))


def ann_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #46: the reference's published evaluation GRID — recall@k2
    as a function of BOTH index params, nb_tables T and nb_bits_per_table B,
    evaluated on prefixes of the one fitted model (no refit: each table's
    hyperplanes are independent, and within a table the first-B-hyperplane
    hash equals `hash % 2^B` because hashes are LSB-first bit-packed —
    LshModel.subset_bits).

    Per-query rows (n_tables, n_bits, query_id, recall): no cross-row float
    aggregation, so the output is bit-stable across engines.

    ONE hash pass feeds the whole T×B grid: the B axis is derived per index
    entry by pmod (explode ×|B|, a narrow projection — no rehash), the bucket
    join runs once on (n_bits, tbl, phash), and the single aggregation emits
    every T prefix's match count at once (sum of tbl < T per pair, a match
    for prefix T being a match for every larger prefix). The sweep axes are
    then EXPLODED so rank → re-rank → recall run as ONE plan whose windows
    partition by (n_tables, n_bits, query_id) — one pipeline for all 12 grid
    points instead of 12 unioned branches re-walking the same shape."""
    from ..constants import LSH_SWEEP_BITS, LSH_SWEEP_TABLES

    emb = _emb(spark, sf_dir)
    model = _model_for(emb, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    exact = exact_ground_truth(spark, sf_dir)

    idx_exp = explode_hashes(
        build_index(emb, model).select("vec_id", "hashes"), "vec_id", "neighbor_id"
    )
    q_exp = explode_hashes(build_index(queries, model), "vec_id", "query_id")

    def with_bit_prefixes(df: DataFrame, id_name: str) -> DataFrame:
        """(id, tbl, hash) → (id, tbl, n_bits, phash) for every B prefix."""
        return df.select(
            id_name,
            "tbl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).cast("int").alias("n_bits"),
                            (F.col("hash") % F.lit(1 << b)).alias("phash"),
                        )
                        for b in LSH_SWEEP_BITS
                    ]
                )
            ).alias("s"),
        ).select(id_name, "tbl", "s.n_bits", "s.phash")

    counts_all = with_bit_prefixes(idx_exp, "neighbor_id").join(
        F.broadcast(with_bit_prefixes(q_exp, "query_id")), ["n_bits", "tbl", "phash"]
    ).where(F.col("neighbor_id") != F.col("query_id")).groupBy(
        "n_bits", "query_id", "neighbor_id"
    ).agg(
        *[
            F.sum(F.when(F.col("tbl") < t, 1).otherwise(0)).alias(f"m_{t}")
            for t in LSH_SWEEP_TABLES
        ]
    )
    swept = counts_all.select(
        "n_bits",
        "query_id",
        "neighbor_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("int").alias("n_tables"),
                        F.col(f"m_{t}").alias("n_match"),
                    )
                    for t in LSH_SWEEP_TABLES
                ]
            )
        ).alias("s"),
    ).select("s.n_tables", "n_bits", "query_id", "neighbor_id", "s.n_match").where(
        F.col("n_match") > 0
    )
    w1 = Window.partitionBy("n_tables", "n_bits", "query_id").orderBy(
        F.desc("n_match"), F.asc("neighbor_id")
    )
    k1_sel = swept.withColumn("rn", F.row_number().over(w1)).where(
        F.col("rn") <= ANN_K1
    ).drop("rn")
    nvec = emb.select(F.col("vec_id").alias("neighbor_id"), as_double(F.col("embedding")).alias("nv"))
    qvec = queries.select(F.col("vec_id").alias("query_id"), as_double(F.col("embedding")).alias("qv"))
    # broadcast the grid-bounded shortlist (|sweep grid|·Q·K1 rows), not
    # the corpus — same §3 build-side fix as rank_term_matches
    scored = (
        F.broadcast(k1_sel).join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "n_tables",
            "n_bits",
            "query_id",
            "neighbor_id",
            F.round(euclidean(F.col("qv"), F.col("nv")), DIST_ROUND).alias("distance"),
        )
    )
    w2 = Window.partitionBy("n_tables", "n_bits", "query_id").orderBy(
        F.asc("distance"), F.asc("neighbor_id")
    )
    ann = (
        scored.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= ANN_K2)
        .select("n_tables", "n_bits", "query_id", "neighbor_id")
    )
    hits = ann.join(F.broadcast(exact), ["query_id", "neighbor_id"]).groupBy(
        "n_tables", "n_bits", "query_id"
    ).agg(F.count(F.lit(1)).alias("n_hit"))
    denom = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    grid = denom.crossJoin(
        spark.createDataFrame(
            [(int(t), int(b)) for t in LSH_SWEEP_TABLES for b in LSH_SWEEP_BITS],
            "n_tables int, n_bits int",
        )
    )
    return grid.join(hits, ["n_tables", "n_bits", "query_id"], "left").select(
        "n_tables",
        "n_bits",
        "query_id",
        F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4).alias(
            "recall"
        ),
    )


def _lsh_pairs(emb: DataFrame, sf_dir: str) -> DataFrame:
    """Distinct candidate pairs (vec_a < vec_b) sharing ≥1 LSH bucket.

    At scale: self-join shuffles on (tbl, hash); AQE skew-join splits hot
    buckets, and the MAX_BUCKET cap (functions/blocking.py) drops
    pathological mega-buckets before the quadratic pair step — the cap is
    deterministic and mirrored exactly by the DuckDB oracle.
    """
    from ..functions.blocking import capped_bucket_pairs

    model = _model_for(emb, sf_dir)
    # no persist: the self-join reads the hash pass twice, but re-running the
    # vectorized matmul is cheaper than a cache round-trip (measured), and a
    # query function can never unpersist what its lazy result still references
    exp = explode_hashes(
        build_index(emb, model).select("vec_id", "hashes"), "vec_id", "vec_id"
    )
    return capped_bucket_pairs(exp, ["tbl", "hash"], "vec_id", a="vec_a", b="vec_b")


def _pairs_with_cosine(emb: DataFrame, pairs: DataFrame) -> DataFrame:
    """Gather-join the two vectors of each pair and score cosine.

    Norms are computed once per vector in the narrow scan (N evaluations),
    not per pair (P evaluations, P >> N) — measured 4-5× faster on the
    pair-verify stage with bit-identical output (dot/(|a|·|b|) is exactly
    what cosine() expands to)."""
    from ..functions.vector import dot, l2_norm

    en = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    ea = en.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    eb = en.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), DIST_ROUND
            ).alias("cosine"),
        )
    )


def similarity_join_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #6: all-pairs near-neighbor join via shared LSH buckets."""
    from ..constants import COSINE_JOIN_TAU

    emb = _emb(spark, sf_dir)
    scored = _pairs_with_cosine(emb, _lsh_pairs(emb, sf_dir))
    return scored.where(F.col("cosine") >= COSINE_JOIN_TAU)


def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #15: canonical representative per vector = min id over its
    cosine-near-duplicates (single-hop, deterministic)."""
    from ..constants import COSINE_JOIN_TAU

    emb = _emb(spark, sf_dir)
    # localCheckpoint: `near` feeds BOTH sides of the symmetrization
    # union — without it the whole hash→bucket→pair→cosine pipeline runs
    # twice (r10 plan audit caught the duplicated subtree when this key
    # joined the bench headline). The pair set is KB-bounded (bucketed
    # candidates above tau), so the materialization is cheap.
    near = (
        _pairs_with_cosine(emb, _lsh_pairs(emb, sf_dir))
        .where(F.col("cosine") >= COSINE_JOIN_TAU)
        .localCheckpoint()
    )
    sym = (
        near.select(F.col("vec_a").alias("vec_id"), F.col("vec_b").alias("other"))
        .unionAll(near.select(F.col("vec_b").alias("vec_id"), F.col("vec_a").alias("other")))
        .unionAll(emb.select("vec_id", F.col("vec_id").alias("other")))
    )
    return sym.groupBy("vec_id").agg(F.min("other").alias("canonical_id"))


def vector_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #5: the vector function family over the embeddings table."""
    from ..functions.vector import dot, l2_norm

    emb = _emb(spark, sf_dir)
    v = as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.round(l2_norm(v), DIST_ROUND).alias("l2_norm"),
        F.round(dot(v, v), DIST_ROUND).alias("self_dot"),
        F.size("embedding").alias("dim"),
    )


def knn_exact_mips_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #38: exact max-inner-product top-k (third metric family)."""
    emb = _emb(spark, sf_dir)
    return knn_exact(emb, emb.where(F.col("vec_id") < N_QUERIES), metric="dot")


# (tbl, bucket) probe set of a FIXED query batch, per (context, sf_dir,
# batch tag): each batch is deterministic, so its ≤ Q·T probe directories
# are too — computing them is a full Spark job (hash UDF + distinct +
# collect, measured 0.8 s of the 3.3 s store search at sf0.1) that repeat
# searches need not re-pay. The canonical batch caches under "canonical";
# index_upsert/index_delete pass their own tags for their (equally
# deterministic) derived query tables; an untagged non-canonical emb
# bypasses the cache.
_PROBE_PARTS_CACHE: dict[tuple[str, str, str], list] = {}


def search_lsh_store(
    spark: SparkSession,
    sf_dir: str,
    store: str,
    emb: DataFrame | None = None,
    parts_tag: str | None = None,
) -> DataFrame:
    """Search through a persisted (tbl, bucket)-partitioned LSH store at
    `store`: hash the query batch, read back ONLY its own (tbl, bucket)
    directories via explicit partition paths, term-match-count, re-rank.
    Shared by the batch-built store (ann_search_lsh_store), the
    streaming-appended store (streaming/ingest.streaming_index_store), the
    compacted store, and the upserted store (which passes the UPDATED
    vector table as `emb`) — one search path, four index producers."""
    from ..sources.index_store import DEFAULT_HASH_BUCKETS, load_lsh_partitions

    canonical = emb is None
    if canonical:
        emb = _emb(spark, sf_dir)
        parts_tag = "canonical"
    model = _model_for(_emb(spark, sf_dir), sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    q_exp = explode_hashes(build_index(queries, model), "vec_id", "query_id")
    # the query batch's (tbl, bucket) set: ≤ Q·T entries, KB-sized — the
    # same justified driver-side collect as the IVF probe list
    cache_key = (
        (spark.sparkContext.applicationId, sf_dir, parts_tag) if parts_tag else None
    )
    parts = _PROBE_PARTS_CACHE.get(cache_key) if cache_key else None
    if parts is None:
        parts = [
            (r.tbl, r.bucket)
            for r in q_exp.select(
                "tbl", F.pmod("hash", F.lit(DEFAULT_HASH_BUCKETS)).alias("bucket")
            )
            .distinct()
            .collect()
        ]
        if cache_key:
            _PROBE_PARTS_CACHE[cache_key] = parts
    idx_exp = load_lsh_partitions(spark, store, parts).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    counts = (
        idx_exp.join(F.broadcast(q_exp), ["tbl", "hash"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    return rank_term_matches(counts, emb, queries)


def ann_search_lsh_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH search through the PERSISTED index layout — the reference's
    actual workflow (index once into ES, search many times), Spark-native:
    the exploded index is written partitioned by (tbl, bucket=pmod(hash,n))
    once per process (sources/index_store), and each query batch reads back
    ONLY its own (tbl, bucket) directories via literal partition filters.
    Results are identical to the in-memory ann_search_lsh — same oracle —
    proving the pruned store path is lossless (mirror of ann_search_ivf_store
    for the IVF family). At 100 TB a batch of Q queries touches ≤ Q·T of
    the T·n_buckets directories instead of the whole index."""
    from ..sources.index_store import save_lsh_index

    out = io.scratch_dir("lsh_store", sf_dir)
    store = io.fs_join(out, "data")
    if not io.fs_exists(spark, io.fs_join(store, "_SUCCESS")):
        save_lsh_index(lsh_index(spark, sf_dir), store)
    return search_lsh_store(spark, sf_dir, store)


def _updated_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'after-update' vector table: vectors with vec_id % UPSERT_MOD == 0
    have every component doubled (exact in IEEE — both engines transform the
    identical doubles); everything else unchanged."""
    from ..constants import UPSERT_MOD

    emb = _emb(spark, sf_dir)
    doubled = F.transform(as_double(F.col("embedding")), lambda x: x * F.lit(2.0))
    return emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % UPSERT_MOD == 0, doubled).otherwise(
            as_double(F.col("embedding"))
        ),
    )


def index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index UPDATE-in-place — the third index-maintenance mode next to
    streaming append (streaming_index_store) and compaction
    (streaming_index_compact): a batch of changed vectors is re-hashed and
    the store is patched via DYNAMIC PARTITION OVERWRITE — only the
    (tbl, bucket) directories that held or now hold a changed vector are
    rewritten (old rows minus changed ids, plus the re-hashed rows); the
    untouched directories' files are not read or written. Touched
    directories whose rows were ALL changed vectors and that receive no
    re-hashed row end up with zero surviving rows — dynamic overwrite skips
    empty partitions, so those are deleted explicitly (otherwise their
    stale old-hash files would survive and a changed vector could match
    under both hashes). Searching the patched store returns exactly what a
    full rebuild on the updated table would — the oracle recomputes that
    rebuild in SQL. Idempotent: re-runs rewrite the same dirs to the same
    content.

    At 100 TB this is the daily reality of an index: a delta of D changed
    vectors touches ≤ D·T directories of the T·n_buckets total."""
    from ..sources.index_store import (
        DEFAULT_HASH_BUCKETS,
        partition_key_filter,
        pruned_dynamic_overwrite,
        save_lsh_index,
    )
    from ..constants import UPSERT_MOD

    emb = _emb(spark, sf_dir)
    model = _model_for(emb, sf_dir)
    memb = _updated_emb(spark, sf_dir)
    out = io.scratch_dir("lsh_upsert", sf_dir)
    store = io.fs_join(out, "data")
    marker = io.fs_join(out, "UPSERTED")
    if not io.fs_exists(spark, io.fs_join(store, "_SUCCESS")):
        save_lsh_index(lsh_index(spark, sf_dir), store)
    if not io.fs_exists(spark, marker):
        changed_old = explode_hashes(
            build_index(emb.where(F.col("vec_id") % UPSERT_MOD == 0), model),
            "vec_id",
            "vec_id",
        )
        changed_new = explode_hashes(
            build_index(memb.where(F.col("vec_id") % UPSERT_MOD == 0), model),
            "vec_id",
            "vec_id",
        )
        bucket = lambda df: df.select(
            "vec_id",
            F.col("tbl").cast("int").alias("tbl"),
            "hash",
            F.pmod("hash", F.lit(DEFAULT_HASH_BUCKETS)).cast("int").alias("bucket"),
        )
        old_b, new_b = bucket(changed_old), bucket(changed_new)
        parts = [
            (r.tbl, r.bucket)
            for r in old_b.select("tbl", "bucket")
            .union(new_b.select("tbl", "bucket"))
            .distinct()
            .collect()
        ]
        # packed-key IN over the partition columns (partition_key_filter):
        # stays a PartitionFilter without the O(dirs)-deep OR-tree that
        # load_lsh_partitions' literal list would build here — a ~6% delta
        # × T tables touches most buckets at this scale
        existing = (
            io.read_parquet(spark, store)
            .where(partition_key_filter(["tbl", "bucket"], parts))
            .select("vec_id", "tbl", "hash", "bucket")
        )
        patched = existing.where(F.col("vec_id") % UPSERT_MOD != 0).unionByName(new_b)
        pruned_dynamic_overwrite(spark, store, patched, ["tbl", "bucket"], parts)
        io.fs_touch(spark, marker)
    # the updated table is deterministic per sf_dir, so its probe set is
    # cacheable under its own tag (repeat searches skip the collect job)
    return search_lsh_store(spark, sf_dir, store, emb=memb, parts_tag="upsert")


def index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index DELETE-in-place (r9, #152) — ivf_delete's LSH twin, making
    the maintenance matrix symmetric on both layouts (LSH: append /
    compact / upsert / DELETE; IVF: store / upsert / delete): the purged
    ids (vec_id % DELETE_MOD == DELETE_REM, the id-set GDPR shape) are
    dropped from ONLY the (tbl, bucket) directories that held one —
    found by re-hashing just the doomed vectors — via the same packed-key
    PartitionFilter read + dynamic partition overwrite as index_upsert; a
    directory left with zero surviving rows is deleted explicitly (its
    stale files would otherwise keep matching). Searching the patched
    store with the surviving table equals a full rebuild on the filtered
    corpus, which the oracle recomputes in SQL; a purged QUERY id
    contributes no output rows — rebuild semantics. Idempotent.

    At 100 TB: deleting D ids touches ≤ D·T of the T·n_buckets
    directories — the same bound as the upsert delta; the search path is
    the unchanged literal-PartitionFilter probing.

    Output: (query_id, neighbor_id, n_match, distance)."""
    from ..constants import DELETE_MOD, DELETE_REM
    from ..sources.index_store import (
        DEFAULT_HASH_BUCKETS,
        partition_key_filter,
        pruned_dynamic_overwrite,
        save_lsh_index,
    )

    emb = _emb(spark, sf_dir)
    model = _model_for(emb, sf_dir)
    out = io.scratch_dir("lsh_delete", sf_dir)
    store = io.fs_join(out, "data")
    marker = io.fs_join(out, "DELETED")
    if not io.fs_exists(spark, io.fs_join(store, "_SUCCESS")):
        save_lsh_index(lsh_index(spark, sf_dir), store)
    doomed_pred = F.col("vec_id") % DELETE_MOD == DELETE_REM
    if not io.fs_exists(spark, marker):
        doomed = explode_hashes(
            build_index(emb.where(doomed_pred), model), "vec_id", "vec_id"
        ).select(
            "vec_id",
            F.col("tbl").cast("int").alias("tbl"),
            F.pmod("hash", F.lit(DEFAULT_HASH_BUCKETS)).cast("int").alias("bucket"),
        )
        parts = [
            (r.tbl, r.bucket) for r in doomed.select("tbl", "bucket").distinct().collect()
        ]
        existing = (
            io.read_parquet(spark, store)
            .where(partition_key_filter(["tbl", "bucket"], parts))
            .select("vec_id", "tbl", "hash", "bucket")
        )
        patched = existing.where(~doomed_pred)
        pruned_dynamic_overwrite(spark, store, patched, ["tbl", "bucket"], parts)
        io.fs_touch(spark, marker)
    # deterministic surviving-id query batch → cacheable probe set
    return search_lsh_store(
        spark, sf_dir, store, emb=emb.where(~doomed_pred), parts_tag="delete"
    )


def label_centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #41: per-label centroid of the embedding column — the
    vector-aggregate pattern (class prototypes / coarse init for IVF).

    Shape: posexplode to (label, dim, val) → decimal sum per (label, dim)
    (exact, order-insensitive → deterministic on any partitioning). Output
    is LONG format — one row per (label, dim) — so the result is flat
    scalars, directly comparable/canonicalizable by any harness (array
    columns are not), and the shuffle carries labels × dims aggregated
    rows, not vectors. Reassembling the array is a trivial collect_list
    downstream if a consumer wants it."""
    from ..constants import DEC

    emb = _emb(spark, sf_dir)
    exploded = emb.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("dim", "v")
    )
    # exact decimal SUM (order-insensitive), then a single double division:
    # decimal/int division rounds differently across engines at the last
    # digit; double division of identical inputs is bit-identical
    return exploded.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.col("v").cast(DEC)).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean")
    )


_FAMILY_RECALL_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def ann_recall_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #144: the cross-FAMILY quality dashboard — mean recall@k
    of every ANN family at its gated configuration, one row per family,
    in ONE result set. This is the table an index operator reads to pick
    a family for a deployment (the per-family recall keys grade each
    family alone; this one makes the comparison a query instead of a
    spreadsheet).

    Cost shape: all families share the ONE cached exact ground truth
    (exact_ground_truth's localCheckpoint) and the cached quantizer/LSH
    models, so the plan is the union of the family SEARCHES only; each
    branch's output is Q rows and the union is KB-sized.

    Mean = decimal-exact sum of the 4-decimal per-query recalls divided
    by the query count in double — bit-stable across engines (same DEC
    route as the money aggregates).

    r7: each family's per-query recall frame is localCheckpointed into a
    per-process memo on first use (keyed (sf_dir, family); testdata is
    immutable within a process, like the model caches). A dashboard is
    refreshed repeatedly in one session — repeat invocations union 11
    KB-sized checkpointed frames instead of re-running 11 searches.

    Output: (family, recall) — one row per family, recall rounded 4."""
    from . import graph, ivf, pq

    fams: list[tuple[str, object]] = [
        ("lsh", lambda: ann_recall_q(spark, sf_dir)),
        ("lsh_multiprobe", lambda: ann_recall_lsh_multiprobe(spark, sf_dir)),
        ("ivf", lambda: ivf.ann_recall_ivf_q(spark, sf_dir)),
        ("pq", lambda: pq.ann_recall_pq(spark, sf_dir)),
        ("ivfpq", lambda: pq.ann_recall_ivfpq(spark, sf_dir)),
        ("ivfpq_refined", lambda: pq.ann_recall_ivfpq_refined(spark, sf_dir)),
        ("sq8", lambda: pq.ann_recall_sq8(spark, sf_dir)),
        ("graph", lambda: graph.ann_recall_graph_q(spark, sf_dir)),
        ("graph_beam", lambda: graph.ann_recall_graph_beam_q(spark, sf_dir)),
        ("matryoshka", lambda: ann_recall_matryoshka(spark, sf_dir)),
        ("bitsign", lambda: pq.ann_recall_bitsign(spark, sf_dir)),
    ]
    app = spark.sparkContext.applicationId
    missing = [
        (name, build)
        for name, build in fams
        if (app, sf_dir, name) not in _FAMILY_RECALL_MEMO
    ]
    if len(missing) > 1:
        # r13 (opt guide §2.6, overlap independent jobs): the cold cost of
        # this key was a SEQUENTIAL chain of 11 family searches — each
        # build() ends in an eager localCheckpoint barrier, so the driver
        # submitted one family's jobs only after the previous family's
        # straggler tail drained, leaving most cores idle (measured ≈ the
        # sum of the individual per-family recall keys, 27.5 s at sf0.1).
        # The searches are mutually independent, so build them from a small
        # thread pool and let each family's tasks back-fill the others'
        # tails. Two guards keep this result-identical to the sequential
        # path: (a) every dependency SHARED between families (ground truth,
        # the lazy model/assignment/edge caches — plain dicts, which two
        # concurrent misses would each recompute) is warmed once up front;
        # (b) each thread writes only its own memo key, and the frames are
        # deterministic, so the union below sees the same rows either way.
        from concurrent.futures import ThreadPoolExecutor

        exact_ground_truth(spark, sf_dir)  # every family's _recall_of
        _model_for(_emb(spark, sf_dir), sf_dir)  # lsh/multiprobe/matryoshka
        ivf.model_for(sf_dir)  # ivf seeds + the pq/graph families
        ivf.list_assignments(spark, sf_dir)
        pq.model_for(sf_dir)  # pq, ivfpq, ivfpq_refined
        graph.graph_edges(spark, sf_dir)  # graph, graph_beam (+ its model)

        def _build(nb) -> None:
            name, build = nb
            # eager KB-sized checkpoint: the frame is Q rows; the search it
            # runs is exactly what the un-memoized union ran here anyway
            _FAMILY_RECALL_MEMO[(app, sf_dir, name)] = build().localCheckpoint()

        import os as _os

        # default 2 (r14): the r13 default of 12 was tuned under co-tenant
        # load and refuted by the driver's own 32-core run (19.8 s ->
        # 160.0 s — twelve concurrent job chains multiply shuffle/write
        # churn exactly when the host shows I/O pressure, and each chain's
        # stall multiplies the others'). r14 idle-host A/B at 32 cores
        # (fresh session per run, 3 interleaved pairs): 12 is ~10% faster
        # cold (16.6/19.5/18.7 s vs 19.0/21.8/20.5 s for 2) — a small
        # upside against a catastrophic loaded-host downside. Two in
        # flight is the guide's §2.6 recommendation: one family's
        # straggler tail back-fills with the next family's tasks, with
        # bounded concurrent churn. Env-tunable for other cluster shapes.
        workers = max(1, int(_os.environ.get("ENN_FAMILY_RECALL_THREADS", "2")))
        with ThreadPoolExecutor(max_workers=workers) as tp:
            list(tp.map(_build, missing))
    parts = []
    for name, build in fams:
        # r8: applicationId in the key, matching every sibling cache
        # (graph.py/ivf.py model caches) — a localCheckpoint dies with its
        # SparkContext, so a restarted session must rebuild, not reuse.
        memo_key = (app, sf_dir, name)
        df = _FAMILY_RECALL_MEMO.get(memo_key)
        if df is None:
            df = _FAMILY_RECALL_MEMO[memo_key] = build().localCheckpoint()
        parts.append(df.select(F.lit(name).alias("family"), "recall"))
    un = parts[0]
    for p in parts[1:]:
        un = un.unionAll(p)
    return un.groupBy("family").agg(
        F.round(
            F.sum(F.col("recall").cast("decimal(10,4)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("recall")
    )


def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #143: k-NN majority-vote label prediction for the query
    batch — the classification consumer of the exact-kNN kernel (the
    reference's labeled-corpus use case: given an image's neighbors,
    predict its class; aknn_search returns neighbors, this closes the loop
    to a decision).

    Shape: exact cosine top-KNN_K per query (broadcast Q against the
    corpus — no corpus shuffle), then a KB-sized vote: join the Q·k
    neighbor list to the narrow (vec_id, label) projection, count votes
    per (query, label), rank votes desc with label asc as the
    deterministic tie-break. Everything after the kNN kernel is
    Q·k-sized, so the plan's cost IS the kernel's.

    Output: (query_id, true_label, pred_label, votes, correct)."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    nn = knn_exact(emb, queries, metric="cosine")
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label"))
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes")
    )
    truth = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return pred.join(truth, "query_id").select(
        "query_id",
        "true_label",
        "pred_label",
        "votes",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )


def range_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) search: ALL neighbors within euclidean RANGE_RADIUS of
    each canonical query — the fixed-radius twin of top-k retrieval (FAISS
    `range_search`; the reference exposes only top-k, so this is the natural
    completion of the search family).

    Scale shape: broadcast the query batch against the index scan and keep
    rows passing the radius predicate — a narrow filter with NO ranking, so
    unlike top-k there is no shuffle at all: the plan is scan → broadcast
    NLJ → filter, embarrassingly parallel at any data size.

    Output: (query_id, neighbor_id, distance ≤ RANGE_RADIUS)."""
    from ..constants import RANGE_RADIUS

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), as_double(F.col("embedding")).alias("qv")
    )
    idx = emb.select(
        F.col("vec_id").alias("neighbor_id"), as_double(F.col("embedding")).alias("nv")
    )
    return (
        idx.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(euclidean(F.col("qv"), F.col("nv")), DIST_ROUND).alias("distance"),
        )
        .where(F.col("distance") <= RANGE_RADIUS)
    )


def ann_search_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRL-style (Matryoshka Representation Learning) two-stage ANN: coarse
    rank on the first MRL_DIMS dims of the embedding → top-MRL_K1 shortlist
    per query → exact full-dim re-rank → top-ANN_K2. The dimension-prefix
    shortlist is the fourth coarse scorer next to LSH term-match, IVF lists
    and PQ ADC, with the same k1/k2 two-stage contract as the reference's
    `_aknn_search`.

    Scale shape: stage 1 is the only corpus-wide scan and touches MRL_DIMS/D
    of the vector payload (a real MRL deployment stores the prefix as its
    own column, making this a column-pruned scan — here the slice happens
    post-read, the plan shape is the same); _partial_topk folds N·Q coarse
    rows to ≤ Q·K1 per partition before any shuffle; stage 2 gathers only
    Q·K1 full vectors (hash-join point lookups) for the exact distances.

    Output: (query_id, neighbor_id, coarse_distance, distance)."""
    from ..constants import MRL_DIMS, MRL_K1

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_QUERIES)
    pre = lambda c: as_double(F.slice(F.col(c), 1, MRL_DIMS))  # noqa: E731
    qpre = q.select(F.col("vec_id").alias("query_id"), pre("embedding").alias("qv"))
    npre = emb.select(F.col("vec_id").alias("neighbor_id"), pre("embedding").alias("nv"))
    scored = npre.join(
        F.broadcast(qpre), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(euclidean(F.col("qv"), F.col("nv")), DIST_ROUND).alias("coarse_distance"),
    )
    local = _partial_topk(scored, "coarse_distance", MRL_K1, True)
    w1 = Window.partitionBy("query_id").orderBy(
        F.asc("coarse_distance"), F.asc("neighbor_id")
    )
    shortlist = (
        local.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= MRL_K1)
        .drop("rn")
    )
    nvec = emb.select(
        F.col("vec_id").alias("neighbor_id"), as_double(F.col("embedding")).alias("nvf")
    )
    qvec = q.select(
        F.col("vec_id").alias("query_id"), as_double(F.col("embedding")).alias("qvf")
    )
    # broadcast the ≤ Q·MRL_K1 shortlist, stream the full-dim corpus scan
    # (§3 build-side fix; without the hint Catalyst broadcasts the corpus)
    full = F.broadcast(shortlist).join(nvec, "neighbor_id").join(F.broadcast(qvec), "query_id").select(
        "query_id",
        "neighbor_id",
        "coarse_distance",
        F.round(euclidean(F.col("qvf"), F.col("nvf")), DIST_ROUND).alias("distance"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("neighbor_id"))
    return (
        full.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= ANN_K2)
        .drop("rn")
    )


def ann_recall_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of the dimension-prefix two-stage search vs exact kNN on the
    shared metric — where the MRL coarse scorer sits on the quality axis
    against LSH/IVF/PQ at the same re-rank budget."""
    ann = ann_search_matryoshka(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_of(ann, exact_ground_truth(spark, sf_dir))
