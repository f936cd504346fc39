"""Physical-plan contracts: the scale properties each operator is designed
around must be visible in the plan, not just claimed in docstrings."""

from __future__ import annotations

from pyspark.sql import functions as F

from elastik_nearest_neighbors_spark import io, plans, sources
from elastik_nearest_neighbors_spark.operators import analytics, ivf, knn
from tests.conftest import SF_SMALL


def test_q6_filters_reach_scan(spark):
    pf = plans.pushed_filters(analytics.q6_revenue_delta(spark, SF_SMALL))
    s = " ".join(pf)
    assert "l_shipdate" in s and "l_discount" in s and "l_quantity" in s, pf


def test_q3_broadcasts_hinted_dim_only(spark):
    # With size-based broadcasts disabled, only HINTED broadcasts remain in
    # the plan — this asserts the operator hints customer (a real dim) and
    # does NOT hint orders (a date-filtered fact that grows with scale; at
    # test size Catalyst would happily broadcast it on stats, which is fine
    # adaptively but must not be forced).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = analytics.q3_shipping_priority(spark, SF_SMALL)
        plan = plans.formatted_plan(df)
        # formatted explain names each node twice (tree + details): exactly
        # one BroadcastHashJoin node == 2 string hits
        assert plans.broadcast_join_count(df) == 2, plan
        assert "c_custkey" in plan
        # the fact join shuffles on orderkey
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ann_search_broadcasts_query_side(spark):
    from elastik_nearest_neighbors_spark.operators.lsh import LshModel

    emb = io.table(spark, SF_SMALL, "embeddings")
    model = LshModel.fit_df(emb)
    df = knn.ann_search_lsh(emb, emb.where(F.col("vec_id") < 8), model)
    # both the candidate join and the re-rank gather broadcast the query side
    assert plans.broadcast_join_count(df) >= 2, plans.formatted_plan(df)


def test_lsh_index_store_partition_prunes(spark, tmp_path):
    from elastik_nearest_neighbors_spark.operators import knn as knn_ops

    path = str(tmp_path / "lsh_idx")
    exploded = knn_ops.lsh_index(spark, SF_SMALL)
    sources.save_lsh_index(exploded, path)
    row = exploded.limit(1).collect()[0]
    one = sources.load_lsh_bucket(spark, path, row.tbl, row.hash)
    assert plans.partition_filters(one), plans.formatted_plan(one)
    # pruned read returns exactly the full-scan answer
    expect = exploded.where((F.col("tbl") == row.tbl) & (F.col("hash") == row.hash)).count()
    assert one.count() == expect > 0


def test_lsh_store_search_partition_prunes_and_matches(spark):
    from elastik_nearest_neighbors_spark.operators import knn as knn_ops

    df = knn_ops.ann_search_lsh_store(spark, SF_SMALL)
    # the store read must carry literal (tbl, bucket) PartitionFilters
    assert plans.partition_filters(df), plans.formatted_plan(df)
    # and the pruned path returns exactly the in-memory search's answer
    expect = knn_ops.ann_search_lsh_q(spark, SF_SMALL)
    assert df.exceptAll(expect).count() == 0 and expect.exceptAll(df).count() == 0


def test_graph_store_search_partition_prunes_and_matches(spark):
    from elastik_nearest_neighbors_spark.operators import graph

    df = graph.ann_search_graph_store(spark, SF_SMALL)
    # the persisted edge read must carry literal bucket PartitionFilters
    assert plans.partition_filters(df), plans.formatted_plan(df)
    # and the pruned path returns exactly the in-memory search's answer
    expect = graph.ann_search_graph_q(spark, SF_SMALL)
    assert df.exceptAll(expect).count() == 0 and expect.exceptAll(df).count() == 0


def test_ivfpq_store_search_partition_prunes_and_matches(spark):
    from elastik_nearest_neighbors_spark.operators import pq as pq_ops

    df = pq_ops.ann_search_ivfpq_store(spark, SF_SMALL)
    # the persisted code read must carry literal list_id PartitionFilters,
    # and the scan must read codes only — never the embedding column
    assert plans.partition_filters(df), plans.formatted_plan(df)
    # and the pruned store path returns exactly the in-memory IVFPQ answer
    expect = pq_ops.ann_search_ivfpq(spark, SF_SMALL)
    assert df.exceptAll(expect).count() == 0 and expect.exceptAll(df).count() == 0


def test_maintenance_search_paths_partition_prune(spark):
    """r10 (#153-#155): the patched-store searches keep the same pruned
    plan as their read-only store siblings — a delete/upsert must not
    silently degrade serving to a full store scan."""
    from elastik_nearest_neighbors_spark.operators import graph
    from elastik_nearest_neighbors_spark.operators import pq as pq_ops

    for fn in (pq_ops.ivfpq_delete, pq_ops.ivfpq_upsert, graph.graph_delete, graph.graph_rebuild):
        df = fn(spark, SF_SMALL)
        assert plans.partition_filters(df), (fn.__name__, plans.formatted_plan(df))


def test_ivf_index_store_partition_prunes(spark, tmp_path):
    path = str(tmp_path / "ivf_idx")
    assigned = ivf.ivf_index(spark, SF_SMALL)
    sources.save_ivf_index(assigned, path)
    probes = [0, 1, 2, 3]
    sub = sources.load_ivf_lists(spark, path, probes)
    assert plans.partition_filters(sub), plans.formatted_plan(sub)
    assert sub.count() == assigned.where(F.col("list_id").isin(probes)).count() > 0


def test_knn_exact_has_no_cartesian_shuffle(spark):
    # the Q×N score pass must stay narrow: query side broadcast, partial
    # top-k before the only shuffle (the final per-query window)
    emb = io.table(spark, SF_SMALL, "embeddings")
    df = knn.knn_exact(emb, emb.where(F.col("vec_id") < 8))
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan
    # the != self-match predicate makes this a broadcast NESTED-LOOP join —
    # still the right shape: tiny query side broadcast, index never shuffles
    assert "BroadcastNestedLoopJoin" in plan or plans.broadcast_join_count(df) >= 1, plan


def test_q5_dims_broadcast_facts_shuffle_once(spark):
    df = analytics.q5_local_supplier_volume(spark, SF_SMALL)
    # every dim join broadcasts; the only exchanges are the fact join on
    # orderkey and the final aggregation
    assert plans.broadcast_join_count(df) >= 3, plans.formatted_plan(df)
    assert plans.shuffle_count(df) <= 3, plans.formatted_plan(df)


def test_minhash_partial_aggregates_map_side(spark):
    from elastik_nearest_neighbors_spark.operators import dedup

    plan = plans.formatted_plan(dedup.minhash_signatures(spark, SF_SMALL))
    # the shuffle must carry O(docs·K) partial mins, not O(shingles) rows
    assert plan.count("partial_min") >= 16, plan


def test_doc_chunk_is_narrow(spark):
    from elastik_nearest_neighbors_spark.operators import textops

    plan = plans.formatted_plan(textops.doc_chunk(spark, SF_SMALL))
    # no keyed shuffle at all — the only Exchange allowed is the small-file
    # widen round-robin (a no-op at scale; see io.table)
    assert "hashpartitioning" not in plan, plan


def test_q4_uses_semi_join(spark):
    plan = plans.formatted_plan(analytics.q4_order_priority(spark, SF_SMALL))
    assert "LeftSemi" in plan, plan


def test_asof_join_single_user_shuffle(spark):
    df = analytics.events_asof_join(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    # union + carry-forward: no join node at all, one window shuffle on user_id
    assert "Join" not in plan, plan


def test_q10_joins_customer_after_aggregation(spark):
    # the customer dim must join the aggregated per-custkey rows, not the
    # fact rows: the BroadcastHashJoin has to sit ABOVE the HashAggregate
    # in the plan tree (details section lists children before parents)
    df = analytics.q10_returned_revenue(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    tree = plan.split("\n\n")[0]
    agg_line = min(i for i, l in enumerate(tree.splitlines()) if "HashAggregate" in l)
    join_line = min(i for i, l in enumerate(tree.splitlines()) if "BroadcastHashJoin" in l)
    assert join_line < agg_line, tree  # tree prints top-down: join above agg


def test_q18_aggregates_before_join(spark):
    df = analytics.q18_large_orders(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    first_join = min(i for i, l in enumerate(lines) if "Join" in l)
    # at least one HashAggregate below (after) the first join in top-down
    # print order = the quantity aggregation runs before the join
    assert any("HashAggregate" in l for l in lines[first_join:]), tree


def test_events_funnel_single_shuffle_no_join(spark):
    df = analytics.events_funnel(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert "Join" not in plan, plan


def test_dup_clusters_transitive(spark):
    """dedup_minhash_canonical is single-hop; dup_clusters must close chains:
    every edge's two endpoints end in the same cluster, and clusters are
    closed under the canonical map."""
    from elastik_nearest_neighbors_spark.operators import dedup

    labels = {r.doc_id: r.cluster_id for r in dedup.dup_clusters(spark, SF_SMALL).collect()}
    pairs = dedup.dedup_minhash_lsh(spark, SF_SMALL).collect()
    assert pairs, "no near-dup pairs at this SF — test proves nothing"
    for r in pairs:
        assert labels[r.doc_a] == labels[r.doc_b]
    # cluster ids are fixpoints: label(label(v)) == label(v)
    assert all(labels[c] == c for c in set(labels.values()))


def test_q19_broadcasts_part_no_fact_shuffle(spark):
    """q19: part (brand-prefiltered dim) broadcasts; the lineitem side goes
    scan → broadcast join → 1-row aggregate with no fact exchange besides
    the final single-partition reduce."""
    df = analytics.q19_disjunctive_revenue(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert plans.broadcast_join_count(df) >= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_q13_aggregates_orders_before_join(spark):
    """q13: orders reduce to per-custkey counts BEFORE the customer join —
    a HashAggregate must appear below the join in the plan tree."""
    df = analytics.q13_customer_distribution(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    first_join = next(i for i, l in enumerate(lines) if "Join" in l)
    assert any("HashAggregate" in l for l in lines[first_join:]), tree


def test_sales_rollup_single_scan(spark):
    """rollup = grouping-sets expansion inside ONE aggregation over ONE scan
    (no union of per-granularity scans)."""
    df = analytics.sales_rollup(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    # formatted explain names each node twice (tree line + details section)
    assert plan.count("Scan parquet") == 2, plan
    assert "Expand" in plan and "Union" not in plan, plan


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """decontaminate: the benchmark gram set broadcasts into the corpus gram
    stream — the corpus side must not shuffle for the join."""
    from elastik_nearest_neighbors_spark.operators import textops

    df = textops.decontaminate(spark, SF_SMALL)
    assert plans.broadcast_join_count(df) >= 1, plans.formatted_plan(df)


def test_dedup_semantic_pairs_match_brute_force_within_list(spark):
    """Within-list pair generation is exact: every brute-force cosine≥τ pair
    whose endpoints share an IVF list appears in the output."""
    from elastik_nearest_neighbors_spark.constants import SEMDEDUP_TAU
    from elastik_nearest_neighbors_spark.functions.vector import as_double, cosine
    from elastik_nearest_neighbors_spark.operators import ivf as ivf_ops
    from elastik_nearest_neighbors_spark.operators.graph import graph_model_for

    got = {
        (r.vec_a, r.vec_b)
        for r in ivf_ops.dedup_semantic(spark, SF_SMALL).collect()
    }
    assigned = ivf_ops.build_ivf_index(
        io.table(spark, SF_SMALL, "embeddings"), graph_model_for(SF_SMALL)
    ).select("vec_id", "list_id")
    emb = io.table(spark, SF_SMALL, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    a = assigned.join(emb, "vec_id").select(
        F.col("vec_id").alias("vec_a"), F.col("list_id"), F.col("v").alias("va")
    )
    b = assigned.join(emb, "vec_id").select(
        F.col("vec_id").alias("vec_b"), F.col("list_id"), F.col("v").alias("vb")
    )
    brute = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, "list_id")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(F.round(cosine(F.col("va"), F.col("vb")), 6) >= SEMDEDUP_TAU)
        .collect()
    }
    assert got == brute


def test_range_search_no_keyed_shuffle(spark):
    """range_search is scan → broadcast NLJ → filter: no ranking, so no
    keyed Exchange may appear anywhere in the plan."""
    from elastik_nearest_neighbors_spark.operators import knn as knn_ops

    df = knn_ops.range_search_q(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert "hashpartitioning" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_knn_graph_degree_and_shape(spark):
    """knn_graph: per-vector out-degree ≤ K, no cartesian product (the pair
    step is a hash join on list_id)."""
    from elastik_nearest_neighbors_spark.constants import KNN_GRAPH_K
    from elastik_nearest_neighbors_spark.operators import ivf as ivf_ops

    df = ivf_ops.knn_graph(spark, SF_SMALL)
    assert "CartesianProduct" not in plans.formatted_plan(df)
    deg = df.groupBy("vec_a").count().agg(F.max("count")).collect()[0][0]
    assert deg <= KNN_GRAPH_K
    # every vector with ≥1 co-listed neighbor appears
    assert df.select("vec_a").distinct().count() > 0


def test_sq8_codes_bounded_and_reconstruction_tight(spark):
    """sq8: codes within [0, 255]; reconstruction error within half a
    quantization step of the per-dim range."""
    from elastik_nearest_neighbors_spark.constants import SQ8_LEVELS
    from elastik_nearest_neighbors_spark.operators import pq as pq_ops

    df = pq_ops.sq8_quantize(spark, SF_SMALL)
    row = df.agg(
        F.min("code").alias("lo"),
        F.max("code").alias("hi"),
        F.max(F.abs("err_micros")).alias("e"),
    ).collect()[0]
    assert 0 <= row.lo and row.hi <= SQ8_LEVELS
    # half-step bound: per-dim ranges here are ~2.2 → step ≈ 0.0086 = 8600 µ
    assert row.e <= 20_000


def test_source_mix_corpus_never_shuffles_for_rates(spark):
    """source_mix: the per-source rates join must broadcast — the corpus
    scan-filter path carries no sort-merge join."""
    from elastik_nearest_neighbors_spark.operators import textops

    df = textops.source_mix(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plans.broadcast_join_count(df) >= 1, plan


def test_rolling_7d_single_exchange(spark):
    """events_rolling_7d: one user-keyed exchange feeds the RANGE window —
    no joins, no second shuffle."""
    from elastik_nearest_neighbors_spark.operators import analytics

    df = analytics.events_rolling_7d(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    # one Exchange node (formatted plans name each node twice: tree + detail)
    assert plans.shuffle_count(df) <= 2, plan
    assert plan.count("+- Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_semantic_doc_search_doc_join_is_broadcast(spark):
    """semantic_doc_search: the final metadata join must broadcast the
    Q·k answer against the documents scan, never sort-merge it."""
    from elastik_nearest_neighbors_spark.operators import knn as knn_ops

    df = knn_ops.semantic_doc_search(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plans.broadcast_join_count(df) >= 2, plan


def test_curate_full_gates_are_broadcast(spark):
    """corpus_curate_full: repetition/contamination drop-lists and the
    benchmark gram set must apply as broadcast joins — the corpus side must
    never sort-merge for a gate."""
    from elastik_nearest_neighbors_spark.operators import textops

    df = textops.corpus_curate_full(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plans.broadcast_join_count(df) >= 3, plan


def test_compacted_store_one_file_per_dir(spark):
    """streaming_index_compact: after compaction every (tbl, bucket)
    directory holds exactly one parquet file — the open/footer-cost
    invariant the pruned search path assumes."""
    import os

    from elastik_nearest_neighbors_spark import io as enn_io
    from elastik_nearest_neighbors_spark.streaming.ingest import streaming_index_compact

    df = streaming_index_compact(spark, SF_SMALL)
    assert df.count() > 0
    root = os.path.join(enn_io.scratch_dir("lsh_stream_store_compact", SF_SMALL), "data")
    for tbl_dir in os.listdir(root):
        if not tbl_dir.startswith("tbl="):
            continue
        for bucket_dir in os.listdir(os.path.join(root, tbl_dir)):
            files = [
                f
                for f in os.listdir(os.path.join(root, tbl_dir, bucket_dir))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (tbl_dir, bucket_dir, files)


def test_ivfpq_reads_codes_not_vectors(spark):
    """IVFPQ: the ranking side must join codes, never gather raw embedding
    arrays — at scale this is the 128× scan saving. The plan should show no
    scan of the embedding column on the candidate/ranking path beyond the
    KB-sized query side."""
    from elastik_nearest_neighbors_spark.operators import pq as pq_ops

    df = pq_ops.ann_search_ivfpq(spark, SF_SMALL)
    assert plans.broadcast_join_count(df) >= 2  # probes + distance table
    assert "CartesianProduct" not in plans.formatted_plan(df)


def test_bm25_corpus_path_is_join_free(spark):
    """BM25: the query side is folded into literal token→idf maps, so the
    scoring path over the corpus must contain NO join of any kind (the
    74M-row term-match of the first cut) and no cartesian — the only
    exchanges are the final top-k's."""
    from elastik_nearest_neighbors_spark.operators import search as s

    df = s.bm25_doc_search(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    for op in ("Join", "CartesianProduct"):
        assert op not in plan, op


def test_filtered_ann_pushes_label_to_scan(spark):
    """Filtered ANN: the metadata predicate must reach the index-side
    parquet scan (pre-filtering at candidate generation), not sit above the
    term-match join as a post-filter."""
    from elastik_nearest_neighbors_spark.operators import knn as knn_ops

    df = knn_ops.ann_search_lsh_filtered(spark, SF_SMALL)
    pushed = plans.pushed_filters(df)
    assert any("label" in f for f in pushed), pushed
    # and the candidate-generation join stays broadcast (query side small)
    assert plans.broadcast_join_count(df) >= 1


def test_q17_part_and_threshold_broadcast(spark):
    """q17: both the brand part filter and the per-part avg-qty threshold
    broadcast — the fact side must never sort-merge."""
    df = analytics.q17_small_quantity_revenue(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plans.broadcast_join_count(df) >= 2, plan


def test_q22_uses_anti_join(spark):
    plan = plans.formatted_plan(analytics.q22_dormant_customers(spark, SF_SMALL))
    assert "LeftAnti" in plan, plan


def test_q8_dims_broadcast_facts_shuffle_once(spark):
    df = analytics.q8_market_share(spark, SF_SMALL)
    assert plans.broadcast_join_count(df) >= 2, plans.formatted_plan(df)
    assert plans.shuffle_count(df) <= 3, plans.formatted_plan(df)


def test_events_sliding_window_partial_agg(spark):
    """The 4×-window expansion must sit below a partial aggregation, so the
    shuffle carries (window, partial) rows — not 4× the events."""
    df = analytics.events_sliding_window(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert "partial" in plan, plan


def test_events_user_ltv_prefix_sums_close(spark):
    """The last running value per user equals the user's total (decimal
    prefix sums are consistent with the global aggregate)."""
    from pyspark.sql.window import Window

    df = analytics.events_user_ltv(spark, SF_SMALL)
    last = df.groupBy("user_id").agg(F.max("cum_value").alias("got"))
    ev = io.table(spark, SF_SMALL, "events")
    tot = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("want")
    )
    bad = last.join(tot, "user_id").where(
        F.abs(F.col("got") - F.col("want")) > 1e-6
    )
    assert bad.count() == 0


def test_lang_confusion_totals(spark):
    from elastik_nearest_neighbors_spark.operators import textops

    df = textops.lang_confusion(spark, SF_SMALL)
    n = df.agg(F.sum("n_docs")).collect()[0][0]
    assert n == io.table(spark, SF_SMALL, "documents").count()


def test_bucketed_join_no_orderkey_exchange(spark):
    """The whole point of the bucketed layout: both scans come up bucketed
    and the forced sort-merge join runs with no exchange on the join key —
    the only Exchange in the plan is the final priority aggregate."""
    df = analytics.bucketed_join_revenue(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2, plan
    assert "hashpartitioning(l_orderkey" not in plan
    assert "hashpartitioning(o_orderkey" not in plan


def test_q21_single_lineitem_scan(spark):
    """The classic Q21 is a triple lineitem self-join; the aggregate
    formulation must touch lineitem exactly once."""
    import re

    df = analytics.q21_waiting_supplier(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert len(re.findall(r"lineitem\.parquet", plan)) == 1, plan


def test_seq_pack_single_shard_exchange(spark):
    """Packing must parallelize: exactly one exchange, keyed on the shard —
    a global-order cumsum (single partition) would show an extra sort-only
    Exchange with no hashpartitioning(shard...)."""
    from elastik_nearest_neighbors_spark.operators import textops

    df = textops.seq_pack(spark, SF_SMALL)
    assert plans.shuffle_count(df) == 2  # one Exchange (tree + detail line)
    assert "hashpartitioning(shard" in plans.formatted_plan(df)


def test_seq_pack_offsets_consistent(spark):
    """Within a shard, each doc's cumsum-derived start equals the previous
    doc's start + its tokens (the packed stream has no gaps or overlaps)."""
    from pyspark.sql.window import Window

    from elastik_nearest_neighbors_spark.constants import PACK_LEN
    from elastik_nearest_neighbors_spark.operators import textops

    df = textops.seq_pack(spark, SF_SMALL)
    start = (F.col("seq_first").cast("bigint") * PACK_LEN + F.col("seq_offset"))
    w = Window.partitionBy("shard").orderBy("doc_id")
    chk = df.select(
        "shard",
        "doc_id",
        start.alias("start"),
        (start + F.col("n_tokens")).alias("end"),
    ).withColumn("prev_end", F.lag("end").over(w))
    bad = chk.where(
        F.col("prev_end").isNotNull() & (F.col("start") != F.col("prev_end"))
    )
    assert bad.count() == 0


def test_corpus_to_sequences_single_scan(spark):
    """The composed clean→pack pipeline must stay one documents scan with
    exactly the two keyed exchanges (dedup window + shard window) plus the
    widen repartition — a naive compose would rescan per stage."""
    import re

    from elastik_nearest_neighbors_spark.operators import textops

    df = textops.corpus_to_sequences(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    assert len(re.findall(r"documents\.parquet", plan)) == 1, plan
    assert plan.count("hashpartitioning(") <= 4  # 2 keyed exchanges × 2 mentions


def test_source_cap_single_exchange_and_bound(spark):
    from elastik_nearest_neighbors_spark.constants import SOURCE_CAP
    from elastik_nearest_neighbors_spark.operators import textops

    df = textops.source_cap(spark, SF_SMALL)
    assert plans.shuffle_count(df) == 2  # one Exchange: hash by source
    per_src = df.groupBy("source").count()
    assert per_src.agg(F.max("count")).collect()[0][0] <= SOURCE_CAP


def test_bm25_join_path_broadcasts_query_terms(spark):
    """The large-Q BM25 path must broadcast the query-term relation (the
    corpus postings never shuffle to meet the queries) and keep exactly
    one aggregation exchange — on the matched (query, doc) pairs."""
    from elastik_nearest_neighbors_spark.operators import search as s

    docs = s._docs(spark, SF_SMALL)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = s.bm25_scores(docs, max_literal_q=0)  # force the join path
        plan = plans.formatted_plan(df)
        assert plans.broadcast_join_count(df) >= 1, plan
        assert "SortMergeJoin" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_phrase_join_path_is_broadcast_nlj(spark):
    """Above the literal threshold the phrase predicate rides a
    BroadcastNestedLoopJoin — O(1) plan size in Q, corpus streamed once,
    never a cartesian shuffle."""
    from elastik_nearest_neighbors_spark.operators import search as s

    df = s.phrase_match_impl(spark, SF_SMALL, max_literal_q=0)
    plan = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q2_broadcasts_part_below_aggregate(spark):
    """q2 (r9 fix): the broadcast part filter and the region-supplier
    semi-join must execute UNDER the (partkey, suppkey) MIN aggregation —
    in top-down print order the deepest BroadcastHashJoin sits below every
    HashAggregate, so the one real shuffle carries only the pruned pairs."""
    df = analytics.q2_min_cost_supplier(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    agg_lines = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    bj_lines = [i for i, l in enumerate(lines) if "BroadcastHashJoin" in l]
    assert agg_lines and bj_lines, tree
    assert max(bj_lines) > max(agg_lines), tree  # a broadcast join below ALL aggs
    assert any("LeftSemi" in l for l in lines), tree  # supplier prune is a semi-join
    assert "SortMergeJoin" not in plan, plan


def test_q20_merge_join_reuses_aggregation_partitioning(spark):
    """q20 (r9 plan audit): the avail-vs-shipped join of the two
    (partkey, suppkey) aggregates must REUSE their aggregation
    partitioning — a SortMergeJoin fed by Sort directly over each final
    HashAggregate, with no extra Exchange between aggregate and join.
    Non-broadcast exchanges in the whole plan: exactly the two partial→
    final aggregation shuffles plus the KB-sized candidate distinct."""
    df = analytics.q20_potential_promotion(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" in tree, tree
    shuffles = sum(
        1 for l in tree.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    )
    assert shuffles == 3, tree


def test_hash_udfs_not_duplicated_by_filter_pushdown(spark):
    """r13 optimization (guide §4.4): explode over an array-returning Arrow
    UDF used to evaluate the UDF TWICE per side — Catalyst inferred a
    size()>0 filter from the Generate and pushed it below the widen
    repartition, duplicating the (deterministic) UDF onto the 1-task
    pre-repartition scan. The UDF factories are non-deterministic-marked
    now; exactly one ArrowEvalPython per hashed side must remain."""
    import re

    df = knn.ann_search_lsh_q(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    n = len(re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M))
    assert n == 2, plan  # one _hash per side (index + queries)

    df2 = ivf.ann_search_ivf_q(spark, SF_SMALL)
    plan2 = plans.formatted_plan(df2)
    n2 = len(re.findall(r"^\(\d+\) ArrowEvalPython", plan2, re.M))
    assert n2 == 2, plan2  # one _assign (index) + one _probe (queries)
