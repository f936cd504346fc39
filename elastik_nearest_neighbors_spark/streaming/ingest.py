"""Structured Streaming operators (SURVEY §2 #8).

The reference ingests vectors continuously (Kafka consumer → batched
`_aknn_index` calls). Spark-first equivalent: `readStream` file source →
the same vectorized LSH hash UDF → `writeStream` parquet index. The hash
pass is stateless/narrow, so streaming and batch share the exact operator.

`streaming_events_hourly` is the streaming twin of analytics.events_hourly:
watermarked tumbling-window aggregation (late data handled by the 1h
watermark at scale; availableNow here drains the backlog and stops).

Gate wiring: wherever the drained stream's output provably equals a batch
query's rows (streaming_index, streaming_sliding_window, streaming_ann_search,
streaming_index_store, streaming_sessionize, streaming_dedup_state), the
batch DuckDB oracle gates the streaming path too. The one inherently
streaming-shaped output (streaming_sessionize_append's watermark prefix)
stays rows-only under its own key, but its CONTRACT is hash-gated by
streaming_sessionize_check (r9): closed prefix == batch sessionizer rows,
reduced to oracle-checkable scalars.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..constants import DEC
from ..operators.lsh import build_index
from ..session import configure


def _event_time(df: DataFrame) -> DataFrame:
    """Normalize `ts` to TIMESTAMP — delegates to io.normalize_ts, the one
    shared copy of the nanos-long / NTZ handling (incl. its UTC guard)."""
    return io.normalize_ts(df, "ts")


# How many files the multi-batch source splits the input into; with
# maxFilesPerTrigger=1 an availableNow drain provably runs this many
# micro-batches (the single-file testdata would otherwise collapse every
# "incremental" proof into one batch).
STREAM_SPLIT_FILES = 4


def _split_source(batch: DataFrame, out: str, n: int = STREAM_SPLIT_FILES) -> str:
    """Write `batch` once as n parquet files under `out`/src and return the
    path — the stand-in for a directory that accumulated n ingest drops."""
    src_dir = f"{out}/src"
    if not io.fs_exists(batch.sparkSession, io.fs_join(src_dir, "_SUCCESS")):
        batch.repartition(n).write.mode("overwrite").parquet(src_dir)
    return src_dir


def _drain(q, timeout: int = 300) -> None:
    """Block until the availableNow drain finishes, failing LOUDLY on
    timeout: awaitTermination returns False when the clock runs out while
    the stream is still writing, and silently proceeding would read a
    partial sink (the parquet-sink sessionizer at sf10+ is the case that
    motivated this — r9 ADVICE). Stop the straggler before raising so the
    JVM doesn't keep appending behind the failure."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"streaming drain timed out after {timeout}s "
            f"(query id {q.id}); sink is incomplete — not reading it back"
        )


def _record_batches(q, out: str) -> None:
    """Persist how many non-empty micro-batches the FIRST build ran (the
    checkpointed re-invocation is a no-op and must not overwrite it)."""
    path = io.fs_join(out, "NUM_BATCHES")
    if io.is_uri(out):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if not io.fs_exists(spark, path):
            n = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
            io.fs_write_text(spark, path, str(n))
        return
    import os

    if not os.path.exists(path):
        n = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
        with open(path, "w") as fh:
            fh.write(str(n))


def streaming_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream vectors in, hash incrementally, append to a parquet index.

    Output is the EXPLODED index (vec_id, tbl, hash) — flat scalar columns,
    identical row set to the batch `lsh_index` query (same model fit, same
    hash expressions), so the batch oracle gates this streaming path too.
    The model comes from the same driver-side deterministic fit as the
    oracle builder (bit-identical to LshModel.fit_df on the same rows)."""
    from ..operators.lsh import explode_hashes
    from ..oracles_vector import lsh_model_for

    configure(spark)
    batch = io.table(spark, sf_dir, "embeddings")
    model = lsh_model_for(sf_dir)
    out = io.scratch_dir("stream_idx", sf_dir)
    src = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(_split_source(batch, out))
    )
    hashed = build_index(src, model).select("vec_id", "hashes")
    exploded = explode_hashes(hashed, "vec_id", "vec_id").select(
        "vec_id", F.col("tbl").cast("int").alias("tbl"), "hash"
    )
    q = (
        exploded.writeStream.format("parquet")
        .option("path", f"{out}/data")
        .option("checkpointLocation", f"{out}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 300)
    _record_batches(q, out)
    return spark.read.parquet(f"{out}/data")


def _ensure_stream_store(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process) the stream-appended (tbl, bucket)-partitioned
    LSH store and return its path. The source is split into
    STREAM_SPLIT_FILES files and rate-limited to one file per trigger, so
    the availableNow drain PROVABLY runs multiple micro-batches (recorded
    in `out`/NUM_BATCHES, asserted >1 in tests) — each micro-batch is
    hashed and APPENDED via foreachBatch, clustered on the partition keys
    before the write (one file per touched directory per batch — the same
    write shape save_lsh_index uses); the checkpoint makes re-invocations
    no-ops instead of duplicate appends, which is the exactly-once
    contract the oracle then certifies content-wise."""
    from ..operators.lsh import explode_hashes
    from ..oracles_vector import lsh_model_for
    from ..sources.index_store import DEFAULT_HASH_BUCKETS

    configure(spark)
    batch = io.table(spark, sf_dir, "embeddings")
    model = lsh_model_for(sf_dir)
    out = io.scratch_dir("lsh_stream_store", sf_dir)
    store = f"{out}/data"
    src = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(_split_source(batch, out))
    )
    hashed = build_index(src, model).select("vec_id", "hashes")
    exploded = explode_hashes(hashed, "vec_id", "vec_id").select(
        "vec_id",
        F.col("tbl").cast("int").alias("tbl"),
        "hash",
        F.pmod("hash", F.lit(DEFAULT_HASH_BUCKETS)).cast("int").alias("bucket"),
    )

    def _append(bdf: DataFrame, _bid: int) -> None:
        from ..sources.index_store import clustered

        (
            clustered(bdf, "tbl", "bucket")
            .write.mode("append")
            .partitionBy("tbl", "bucket")
            .parquet(store)
        )

    q = (
        exploded.writeStream.foreachBatch(_append)
        .option("checkpointLocation", f"{out}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 300)
    _record_batches(q, out)
    return store


def streaming_index_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL online workflow, Spark-native: vectors stream
    in, each micro-batch is appended into the (tbl, bucket)-partitioned
    store, and searches read through the store's partition pruning — index
    maintenance and serving on the same layout. After the stream drains,
    the store holds exactly the batch index content, so the batch
    ann_search_lsh oracle gates this whole path end-to-end
    (stream → store → pruned search)."""
    from ..operators.knn import search_lsh_store

    return search_lsh_store(spark, sf_dir, _ensure_stream_store(spark, sf_dir))


def streaming_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store COMPACTION — the maintenance half of continuous ingestion: a
    long-running appender leaves O(micro-batches) small files per (tbl,
    bucket) directory, and at 100 TB the open/footer cost of those files
    (not the bytes) comes to dominate every pruned read. Compaction
    rewrites the store clustered on its partition keys — one file per
    directory, content-identical by construction — and the search through
    the compacted store returns exactly the batch ann_search_lsh result,
    which is this entry's oracle. tests assert the one-file-per-directory
    invariant."""
    from ..operators.knn import search_lsh_store
    from ..sources.index_store import compact_lsh_store

    store = _ensure_stream_store(spark, sf_dir)
    cout = io.scratch_dir("lsh_stream_store_compact", sf_dir)
    compacted = f"{cout}/data"
    if not io.fs_exists(spark, io.fs_join(compacted, "_SUCCESS")):
        compact_lsh_store(spark, store, compacted)
    return search_lsh_store(spark, sf_dir, compacted)


def streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked hourly tumbling-window counts over the events stream."""
    configure(spark)
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # ts arrives as nanos-long (see session.configure) — same conversion as io.table
    ev = _event_time(src)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )
    name = f"enn_stream_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 300)
    return spark.sql(
        f"""SELECT date_format(win.start, 'yyyy-MM-dd HH:mm:ss') AS hour_ts,
                   event_type, n_events, sum_value
            FROM {name}"""
    )


def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min gap) per user — the streaming twin
    of analytics.events_sessionize, using the built-in session_window state
    store. Complete mode + availableNow here; at scale this runs append mode
    with a watermark so closed sessions emit incrementally and state stays
    bounded by the open-session count."""
    configure(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = _event_time(src)
    agg = ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )
    name = f"enn_stream_sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 300)
    return spark.sql(
        f"""SELECT user_id,
                   date_format(win.start, 'yyyy-MM-dd HH:mm:ss') AS session_start,
                   n_events, sum_value
            FROM {name}"""
    )


def streaming_sessionize_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode watermarked session windows — the BOUNDED-STATE shape a
    100 TB deployment runs: a session is emitted exactly once, when the
    event-time watermark (max ts − 30 min) passes its window end (last
    event + 30 min gap), and its state is dropped at that moment. State
    therefore holds only the open sessions, not the whole history that
    complete-mode (streaming_sessionize) accumulates.

    Rows-only in the gate by design: the emitted set is the watermark-closed
    PREFIX of the batch result, which tests/test_operators.py asserts
    exactly (closed sessions equal the batch sessionizer's rows); the
    contract is additionally hash-gated by streaming_sessionize_check.

    Sink (r9): parquet, not memory. This is the ONE streaming entry whose
    output is data-sized (O(closed sessions) ∝ events), and the memory
    sink collects every emitted row to the driver — measured blowing
    spark.driver.maxResultSize at sf10 (10M events). The append-mode
    parquet sink keeps the emission distributed (each micro-batch's tasks
    write their own files; the driver sees only commit metadata), exactly
    what a 100 TB deployment does, and the returned DataFrame is the
    read-back of that store. Re-invocations in one process reuse the
    checkpoint: the availableNow drain sees no new files and the
    read-back returns the identical rows (idempotent, like the
    maintenance ops)."""
    configure(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = _event_time(src)
    agg = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    out = io.scratch_dir("sess_append", sf_dir)
    data = io.fs_join(out, "data")
    ckpt = io.fs_join(out, "ckpt")
    q = (
        agg.writeStream.format("parquet")
        .option("path", data)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 600)
    return spark.read.parquet(data).select(
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    )


def streaming_sessionize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated twin of streaming_sessionize_append (r9, the
    events_approx_distinct_check pattern, SURVEY §2 #150): the append-mode
    emitted SET is engine-shaped (a watermark prefix — rows-only on its own
    gate), but its CONTRACT is deterministic and SQL-assertable: the
    emitted sessions are exactly the batch sessionizer's rows whose window
    end (last event + gap) the final watermark (max event ts − gap) passed.

    This side drains the real append-mode stream, recomputes the closed
    prefix from the batch lag-sessionizer (same decimal-exact aggregates),
    and full-outer-joins the two on ALL five output columns; the oracle
    computes the same closed-prefix scalars in SQL and emits literal zeros
    for the mismatch counts — so the value-hash matches iff the streaming
    state machine emitted precisely the closed set with identical
    aggregates. Together the two entries gate the bounded-state scale path
    AND its emit-exactly-once claim.

    Output 1 row: (n_sessions, n_users, total_events, only_stream,
    only_batch)."""
    from pyspark.sql.window import Window

    from ..constants import SESSION_GAP_MS

    configure(spark)
    streamed = streaming_sessionize_append(spark, sf_dir)
    ev = io.table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.unix_millis("ts").alias("ms"),
        F.col("value").cast(DEC).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ms", "ts")
    new_sess = F.when(
        F.lag("ms").over(w).isNull()
        | ((F.col("ms") - F.lag("ms").over(w)) > SESSION_GAP_MS),
        1,
    ).otherwise(0)
    sess = ev.withColumn(
        "sess_id", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    batch = sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("start_ts"),
        F.max("ms").alias("end_ms_raw"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").cast("double").alias("sum_value"),
    )
    wm = ev.agg((F.max("ms") - F.lit(SESSION_GAP_MS)).alias("wm_ms"))
    closed = (
        batch.join(F.broadcast(wm))
        .where(F.col("end_ms_raw") + F.lit(SESSION_GAP_MS) <= F.col("wm_ms"))
        .select(
            "user_id",
            F.date_format("start_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(
                F.timestamp_millis(F.col("end_ms_raw") + F.lit(SESSION_GAP_MS)),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    keys = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    j = (
        streamed.select(*keys)
        .withColumn("in_s", F.lit(1))
        .join(closed.select(*keys).withColumn("in_b", F.lit(1)), keys, "full_outer")
    )
    return j.agg(
        F.sum(F.coalesce("in_s", F.lit(0))).alias("n_sessions"),
        F.count_distinct(F.when(F.col("in_s") == 1, F.col("user_id"))).alias("n_users"),
        F.sum(F.when(F.col("in_s") == 1, F.col("n_events")).otherwise(0)).alias(
            "total_events"
        ),
        F.sum(
            F.when(F.col("in_s").isNotNull() & F.col("in_b").isNull(), 1).otherwise(0)
        ).alias("only_stream"),
        F.sum(
            F.when(F.col("in_b").isNotNull() & F.col("in_s").isNull(), 1).otherwise(0)
        ).alias("only_batch"),
    )


def streaming_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with explicit state (applyInPandasWithState):
    keyed by content hash, state = canonical (min) doc_id seen so far; each
    hash is emitted once, on first sight. The custom-stateful-operator path
    for semantics the built-in streaming aggregates can't express (emit-once
    with arbitrary per-key state). State size = one bigint per distinct
    content hash — at 100 TB this is RocksDB-backed and sharded by the
    groupBy hash partitioning."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import pandas as pd

    configure(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    keyed = src.select(F.md5("text").alias("content_md5"), "doc_id").groupBy("content_md5")

    def dedup_fn(key, pdfs, state: GroupState):
        first = not state.exists
        best = None if first else state.get[0]
        for pdf in pdfs:
            m = int(pdf.doc_id.min())
            best = m if best is None or m < best else best
        state.update((best,))
        if first:
            yield pd.DataFrame({"content_md5": [key[0]], "canonical_id": [best]})

    out = keyed.applyInPandasWithState(
        dedup_fn,
        "content_md5 string, canonical_id bigint",
        "canonical_id bigint",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    name = f"enn_stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 300)
    return spark.sql(f"SELECT content_md5, canonical_id FROM {name}")


def streaming_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online ANN serving, streaming-native: a stream of query vectors is
    hashed with the same UDF, stream-static joined against the static hashed
    index on (tbl, hash), and match counts are aggregated statefully
    (complete mode). The final top-k1 → exact re-rank → top-k2 runs batch-
    side over the sink (rank windows aren't available inside a stream), so
    the output is IDENTICAL to the batch ann_search_lsh — same oracle.

    At scale: the static side is the partitioned index store; the stream
    side is small per microbatch; state = one counter per live (query,
    candidate) pair, dropped once the query's answer is emitted."""
    from ..constants import N_QUERIES
    from ..operators.knn import rank_term_matches
    from ..operators.lsh import build_index, explode_hashes
    from ..oracles_vector import lsh_model_for

    configure(spark)
    emb = io.table(spark, sf_dir, "embeddings")
    model = lsh_model_for(sf_dir)
    idx_exp = explode_hashes(
        build_index(emb, model).select("vec_id", "hashes"), "vec_id", "neighbor_id"
    )

    src = (
        spark.readStream.schema(emb.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    ).where(F.col("vec_id") < N_QUERIES)
    q_exp = explode_hashes(build_index(src, model), "vec_id", "query_id")

    counts = (
        q_exp.join(idx_exp, ["tbl", "hash"])  # stream-static join, stateless
        .where(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    name = f"enn_stream_ann_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 300)

    sunk = spark.sql(f"SELECT query_id, neighbor_id, n_match FROM {name}")
    return rank_term_matches(sunk, emb, emb.where(F.col("vec_id") < N_QUERIES))


def streaming_graph_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online graph-expanded ANN serving — the graph twin of
    streaming_ann_search: a stream of query vectors is assigned to its
    nearest IVF list with the same Arrow UDF, stream-static joined against
    the static list membership, and scored against the members — all
    STATELESS (no streaming aggregation at all: one row per (query,
    member) candidate lands in the sink). The rank-bearing tail (top
    GRAPH_SEED_K seeds → 1-hop expansion along the static edge table →
    exact rerank) runs batch-side over the sink, so the output is
    IDENTICAL to the batch ann_search_graph — same oracle.

    At scale: the static sides are the list-partitioned assignment and the
    vec_a-bucketed edge store; per micro-batch work is queries × one list's
    members — no state to size, no watermark to tune."""
    from ..constants import N_QUERIES
    from ..functions.vector import as_double, euclidean
    from ..operators.graph import _expand_and_rerank, graph_edges
    from ..operators.ivf import list_assignments, model_for
    from ..constants import DIST_ROUND

    configure(spark)
    emb = io.table(spark, sf_dir, "embeddings")
    model = model_for(sf_dir)
    members = list_assignments(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"), "list_id"
    )
    nvec = emb.select(F.col("vec_id").alias("neighbor_id"), as_double(F.col("embedding")).alias("nv"))

    src = (
        spark.readStream.schema(emb.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    ).where(F.col("vec_id") < N_QUERIES)
    probes = src.select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
        F.explode(model.probe_udf(1)(F.col("embedding"))).alias("list_id"),
    )
    scored = (
        probes.join(members, "list_id")  # stream-static join, stateless
        .where(F.col("neighbor_id") != F.col("query_id"))
        .join(nvec, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(euclidean(F.col("qv"), F.col("nv")), DIST_ROUND).alias("distance"),
        )
    )
    name = f"enn_stream_graph_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 300)
    from ..constants import GRAPH_SEED_K
    from pyspark.sql.window import Window

    sunk = spark.sql(f"SELECT query_id, neighbor_id, distance FROM {name}")
    w = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("neighbor_id"))
    seeds = (
        sunk.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= GRAPH_SEED_K)
        .select("query_id", "neighbor_id")
    )
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return _expand_and_rerank(emb, queries, seeds, graph_edges(spark, sf_dir))


def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of analytics.events_sliding_window: watermarked
    hopping 1h/15m windows over the event stream. Complete mode +
    availableNow over the static file replays the whole history, so the
    output is row-identical to the batch query and is gated by the SAME
    DuckDB oracle. In production this runs append mode: the watermark
    closes each window 1h after its end and state holds only the ≤ 4 open
    windows' partials."""
    configure(spark)
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = _event_time(src)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )
    name = f"enn_stream_slide_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 300)
    return spark.sql(
        f"""SELECT date_format(win.start, 'yyyy-MM-dd HH:mm:ss') AS window_start,
                   n_events, sum_value
            FROM {name}"""
    )


# ---- Kafka source variant (the reference's production ingestion path) ----

KAFKA_BOOTSTRAP_ENV = "ENN_KAFKA_BOOTSTRAP"
VECTOR_JSON_SCHEMA = "vec_id bigint, embedding array<double>"


def kafka_source_options(bootstrap: str, topic: str) -> dict[str, str]:
    """The exact option set handed to the kafka connector — split out so
    the broker-less contract test pins it (the wiring can't rot silently
    even though no broker/connector ships in this sandbox)."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": "earliest",
    }


def parse_vector_payload(raw: DataFrame) -> DataFrame:
    """kafka `value` (binary JSON {vec_id, embedding}) → typed rows. Pure
    projection, shared verbatim by the streaming source and the contract
    test (which feeds it a batch frame of to_json payloads and asserts a
    bit-exact double round-trip — Spark's to_json emits shortest-repr
    doubles, which from_json parses back exactly)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), VECTOR_JSON_SCHEMA).alias("v")
    ).select("v.*")


def kafka_vector_source(spark: SparkSession, topic: str = "vectors") -> DataFrame:
    """The reference's actual ingestion source (Kafka consumer → batched
    `_aknn_index`): Structured Streaming's kafka connector with JSON
    {vec_id, embedding} payloads. Enabled by ENN_KAFKA_BOOTSTRAP=host:port —
    no broker ships in this sandbox, so the multi-file split source above
    stands in for incremental arrival in the gated entries. The swap is
    source-only: everything downstream of the returned DataFrame (hash UDF,
    exploded append, store layout, checkpointing) is identical."""
    import os

    bootstrap = os.environ.get(KAFKA_BOOTSTRAP_ENV)
    if not bootstrap:
        raise RuntimeError(
            f"Kafka source disabled: set {KAFKA_BOOTSTRAP_ENV}=host:port"
        )
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap, topic).items():
        reader = reader.option(k, v)
    return parse_vector_payload(reader.load())


def streaming_index_kafka(
    spark: SparkSession, sf_dir: str, topic: str = "vectors"
) -> DataFrame:
    """streaming_index with the Kafka source swapped in — same model, same
    hash pass, same exploded parquet sink; exactly-once from Kafka offsets
    plus the checkpointed file sink. Test is skipped unless a broker is
    configured (tests/test_operators.py)."""
    from ..operators.lsh import explode_hashes
    from ..oracles_vector import lsh_model_for

    configure(spark)
    model = lsh_model_for(sf_dir)
    hashed = build_index(kafka_vector_source(spark, topic), model).select(
        "vec_id", "hashes"
    )
    exploded = explode_hashes(hashed, "vec_id", "vec_id").select(
        "vec_id", F.col("tbl").cast("int").alias("tbl"), "hash"
    )
    out = io.scratch_dir("stream_idx_kafka", sf_dir)
    q = (
        exploded.writeStream.format("parquet")
        .option("path", f"{out}/data")
        .option("checkpointLocation", f"{out}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, 300)
    return spark.read.parquet(f"{out}/data")
