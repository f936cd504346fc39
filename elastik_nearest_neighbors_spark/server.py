"""EsAknn-shaped HTTP serving surface (SURVEY §1; API-level citation — the
/root/reference checkout is empty).

The reference IS an HTTP service: an Elasticsearch plugin exposing three
endpoints. `api.py` provides the programmatic facade; this module puts the
actual wire protocol in front of it, with the reference's endpoint paths,
parameter names and document field names, using only the Python stdlib
(`http.server` — no new dependencies):

  POST /_aknn_create
      {"_id": <model name>, "nb_tables": T, "nb_bits_per_table": B,
       "nb_dimensions": D?, "docs": [{"_id": i,
       "_source": {"_aknn_vector": [...]}}, ...]}
      → fit the T×B midpoint-hyperplane model from the posted sample
      (the reference posts an explicit 2·T·B sample in the body) and
      store it BY NAME in the AknnModelRegistry catalog.

  POST /_aknn_index
      {"model": <model name>, "_index": <index name>, "docs": [...]}
      → hash the batch against the named model (Arrow-batched, narrow)
      and APPEND (_id, _aknn_vector, hashes) to the index's parquet
      store — hashes are stored WITH the docs, so search never needs
      the model, exactly like the plugin.

  GET /{index}/{id}/_aknn_search?k1=<int>&k2=<int>
      → read the STORED doc's hashes, term-match top-k1, exact
      euclidean re-rank, top-k2; response in the ES search shape:
      {"timed_out": false, "hits": {"total": k, "hits":
        [{"_id": ..., "_score": <distance>, "n_match": ...}, ...]}}

  GET /_aknn_models → {"models": [...]} (catalog listing).

  DELETE /{index}/{id} (r12) → remove one stored document (200
      "deleted" / 404 "not_found" — ES delete-by-id parity); bulk form
      POST /_aknn_delete {"_index": ..., "ids": [...]} → {"deleted": n}.
      Store mode patches only the doomed ids' term/docs directories
      (knn.index_delete's pruned-dynamic-overwrite pattern).

  DELETE /{index} (r12) → drop the whole index (ES delete-index), and
      the recovery path for a torn index (see below).

  POST /_aknn_index with "refresh": false (r12) + POST /_aknn_refresh
      {"_index": ...} → ES near-real-time semantics: a refresh=false
      batch is HASHED and staged (one narrow append, no store jobs) but
      not searchable; /_aknn_refresh merges everything staged into the
      live store in ONE replace-on-index pass (last staged occurrence of
      an id wins, exactly ES op order). This is the wire BULK-LOAD path:
      per-request cost drops from ~8 store jobs to one append, and the
      merge pays the batch store builder's clustered writes once
      (measured on the 200k-vector step-up — BASELINE.md r12).

Every mutation runs under a per-index dirty marker: parquet has no
transaction log, so a crash mid-commit could leave a half-overwritten
flat dir or mutually-inconsistent docs/ and terms/ — the marker turns
that into a DETECTED state (search and further mutations answer 503
TornIndexError; DELETE /{index} + re-index recovers) instead of silent
recall loss.

Deployment shape: the server is a DRIVER-side facade — each request plans
a Spark job over the parquet-backed index (candidate generation is the
broadcast hash join; the corpus never shuffles per query). Two store
layouts behind the SAME wire protocol, selected by a constructor flag
(r10 verdict item 2 — previously the pruned mode was promised in prose
only):

- flat (default): one parquet dir per index; every search scans it.
  Right for small indexes — zero layout overhead.
- store_backed=True: the 100 TB layout. `/_aknn_index` appends the
  hashed docs under `docs/` partitioned by id_bucket =
  pmod(xxhash64(_id), n) (doc-by-id lookup prunes to ONE directory) and
  the exploded terms under `terms/` partitioned by
  (tbl, bucket = pmod(hash, n)) — exactly sources.index_store's layout,
  read back through its load_lsh_partitions. A search touches ≤ T of
  the T·n_buckets term directories plus one docs directory; only the
  ≤ k1-candidate re-rank gather reads the docs table un-pruned (the
  same shape the gated batch ann_search_lsh_store pays).
  tests/test_server.py asserts the PartitionFilters in the served plan.

Registry entries `aknn_http_search` (flat) and `aknn_http_search_store`
(pruned) drive all three endpoints over a real localhost socket and gate
the round-trip against the shared ann_search_lsh oracle.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .api import (
    ID_FIELD,
    VECTOR_FIELD,
    AknnModelRegistry,
    aknn_index,
    aknn_search,
)
from .constants import ANN_K1, ANN_K2, LSH_BITS, LSH_TABLES


def _refresh_bulk_rows() -> int:
    """Staged-row count above which /_aknn_refresh merges fully
    distributed (constants.REFRESH_BULK_ROWS; ENN_REFRESH_BULK_ROWS lets
    tests force the bulk path on a KB-sized staging)."""
    from .constants import REFRESH_BULK_ROWS

    env = os.environ.get("ENN_REFRESH_BULK_ROWS")
    return int(env) if env else REFRESH_BULK_ROWS


class TornIndexError(RuntimeError):
    """A mutation crashed mid-commit and the on-disk index may be torn
    (multi-file parquet has no transaction log). Raised instead of serving
    possibly-inconsistent results; mapped to HTTP 503. Recovery: drop the
    index (DELETE /{index}) and re-index."""


class AknnHttpServer:
    """Three-endpoint EsAknn server over a SparkSession.

    Binds 127.0.0.1 on an ephemeral port (`.port` after construction);
    `start()` serves on a daemon thread, `stop()` shuts down cleanly.
    Spark calls are serialized under one lock — the driver facade is the
    concurrency bottleneck by design (scale-out serving replicates the
    driver behind a load balancer, each replica reading the same store).
    """

    def __init__(self, spark: SparkSession, root: str, store_backed: bool = False):
        self.spark = spark
        self.root = root
        self.store_backed = store_backed
        self.registry = AknnModelRegistry(os.path.join(root, "models"))
        # per-index docs/terms DataFrames, invalidated on append: a
        # DataFrame's FileIndex snapshots the directory listing, so reusing
        # one across searches skips the per-request re-list + footer read
        # of the partitioned stores (measured ~2× per-search latency in
        # store mode). Searches prune the SNAPSHOT via PartitionFilters —
        # for a long-lived server this is the right 100 TB trade: one
        # listing amortized over every request, versus load_lsh_partitions'
        # per-call explicit-directory read, which is built for one-shot
        # batch jobs. An append makes the snapshot stale, so index() drops
        # the entries.
        self._docs_cache: dict[str, DataFrame] = {}
        self._terms_cache: dict[str, DataFrame] = {}
        # base path -> parquet schema for _pruned_dirs_df: a schema-less
        # read pays a one-task footer-inference Spark job per call, which
        # on the msearch point-update path is pure driver latency (guide
        # §5). Keyed by store base path; popped with the sibling caches on
        # every mutation/drop, so a recreated index with a different
        # mapping can never see a stale schema.
        self._pruned_schema: dict[str, object] = {}
        # next batch_seq per index for refresh=false staging; a cache miss
        # re-derives it from the staged parquet (max+1), so staged batches
        # survive a server restart with their order intact
        self._staging_seq: dict[str, int] = {}
        # pinned _id dtype per index (r12): the type is IMMUTABLE once the
        # first batch lands (that's the pinning rule), so unlike the
        # snapshot caches it survives mutations — without it every point
        # update re-listed the whole docs store just to re-learn a fact
        # that cannot change. Cleared only by drop_index.
        self._id_type_cache: dict[str, str] = {}
        # staged-only twin (an index that exists only as refresh=false
        # staging pins from its first STAGED batch); cleared on refresh
        # (the live store takes over) and on drop_index
        self._staged_id_type: dict[str, str] = {}
        # doc-by-id lookup cache (r12): a store-mode search is two Spark
        # jobs — fetch the stored query doc, then rank its candidates; a
        # repeated GET of the same doc (the ES hot-query reality) need not
        # re-run the fetch. Invalidated per-index on every mutation,
        # exactly like the snapshot caches; FIFO-capped so a scan over
        # many distinct ids can't grow it unboundedly.
        self._doc_cache: dict[tuple, list] = {}
        # indexes with a mutation in flight (all ops serialize under the
        # lock): their own dirty marker must not trip _check_clean when a
        # snapshot cache misses mid-mutation
        self._mutating: set[str] = set()
        self._lock = threading.RLock()
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(self))
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def start(self) -> "AknnHttpServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    # ---- endpoint logic (HTTP-independent; the handler is a thin shim) ----

    def _index_path(self, index: str) -> str:
        import re

        if not re.fullmatch(r"[A-Za-z0-9._-]+", index):
            raise ValueError(f"bad index name: {index!r}")
        return os.path.join(self.root, "indexes", index)

    def _docs_df(self, docs: list[dict]) -> DataFrame:
        rows = [(d[ID_FIELD], [float(x) for x in d["_source"][VECTOR_FIELD]]) for d in docs]
        id_type = "bigint" if all(isinstance(r[0], int) for r in rows) else "string"
        return self.spark.createDataFrame(
            rows, f"{ID_FIELD} {id_type}, {VECTOR_FIELD} array<double>"
        )

    def _docs_path(self, index: str) -> str:
        """Where the (_id, _aknn_vector, hashes) doc rows live for `index` —
        the flat dir itself, or the store layout's docs/ side."""
        path = self._index_path(index)
        return os.path.join(path, "docs") if self.store_backed else path

    def _stored_id_type(self, index: str) -> str | None:
        """The _id dtype already persisted for this index, or None if the
        index has no data yet. Reads through the docs snapshot cache — a
        pre-append snapshot has the same schema, and a fresh
        spark.read.parquet here would re-list the partitioned store on
        every append batch (the exact cost the caches exist to avoid).
        LIVE store only — staged (unrefreshed) batches don't count; use
        _pinned_id_type where they must."""
        from . import io

        t = self._id_type_cache.get(index)
        if t is not None:
            return t
        if index not in self._docs_cache and not io.fs_isdir(
            self.spark, self._docs_path(index)
        ):
            return None
        t = dict(self._cached_docs(index).dtypes)[ID_FIELD]
        self._id_type_cache[index] = t
        return t

    def _pinned_id_type(self, index: str) -> str | None:
        """The _id dtype the index is committed to: the live store's, or —
        for an index that so far exists only as refresh=false staging —
        the staging schema's (the FIRST staged batch pins, like the first
        indexed batch does, or the merge would hit a schema split)."""
        from . import io

        t = self._stored_id_type(index)
        if t is not None:
            return t
        t = self._staged_id_type.get(index)
        if t is not None:
            return t
        sp = self._staging_path(index)
        if io.fs_isdir(self.spark, sp):
            t = dict(self.spark.read.parquet(sp).dtypes)[ID_FIELD]
            self._staged_id_type[index] = t
        return t

    def _pin_id_type(self, index: str, docs: DataFrame) -> DataFrame:
        """ADVICE r10: _docs_df infers the _id type PER BATCH (bigint iff
        every id is an int), so a later string-id batch would append string
        _id files next to bigint ones and break every subsequent search on
        schema merge. The id type is pinned by the index's FIRST batch:
        later int-id batches against a string-pinned index are cast
        (lossless), a string-id batch against a bigint-pinned index is
        rejected with a 400 (the caller's ids don't round-trip)."""
        pinned = self._pinned_id_type(index)
        batch = dict(docs.dtypes)[ID_FIELD]
        if pinned is None or pinned == batch:
            return docs
        if pinned == "string":
            return docs.withColumn(ID_FIELD, F.col(ID_FIELD).cast("string"))
        raise ValueError(
            f"index {index!r} pins {ID_FIELD} type {pinned}; "
            f"batch has {batch} ids — re-index under a new index name"
        )

    def create(self, body: dict) -> dict:
        name = body["_id"]
        nb_tables = int(body.get("nb_tables", LSH_TABLES))
        nb_bits = int(body.get("nb_bits_per_table", LSH_BITS))
        with self._lock:
            self.registry.create(
                name,
                self._docs_df(body["docs"]),
                nb_tables=nb_tables,
                nb_bits_per_table=nb_bits,
                nb_dimensions=body.get("nb_dimensions"),
            )
        return {
            "acknowledged": True,
            "_id": name,
            "nb_tables": nb_tables,
            "nb_bits_per_table": nb_bits,
        }

    def index(self, body: dict) -> dict:
        from .sources.index_store import DEFAULT_HASH_BUCKETS

        with self._lock:
            model = self.registry.get(body["model"])
            name = body["_index"]
            # ES semantics (the reference host's): indexing an existing _id
            # REPLACES the stored document, it does not append a duplicate.
            # Within one batch, the last occurrence of an id wins (ES
            # applies index ops in order); against the store, replaced ids'
            # rows are dropped in the SAME write that lands the new ones.
            posted = list({d[ID_FIELD]: d for d in body["docs"]}.values())
            docs = self._pin_id_type(name, self._docs_df(posted))
            # hash + materialize BEFORE touching the store: a replace must
            # not destroy the stored doc when the incoming one is invalid
            # (wrong dimension etc. — the hash matmul fails HERE, with the
            # store untouched and the dirty marker unset)
            hashed = aknn_index(docs, model)
            if self.store_backed:
                hashed = hashed.withColumn(
                    "id_bucket",
                    F.pmod(F.xxhash64(F.col(ID_FIELD)), F.lit(DEFAULT_HASH_BUCKETS)),
                )
            if body.get("refresh", True) is False:
                # bulk-load path: hash + ONE narrow staging append, no
                # store jobs; /_aknn_refresh merges. No checkpoint needed —
                # the append itself materializes (and validates) the batch,
                # and a failed append commits nothing (parquet job commit)
                self._stage(name, hashed)
                return {
                    "acknowledged": True,
                    "_index": name,
                    "staged": len(body["docs"]),
                }
            hashed = hashed.localCheckpoint(eager=True)
            ids = [d[ID_FIELD] for d in posted]
            if dict(docs.dtypes)[ID_FIELD] == "string":
                # _pin_id_type may have cast an int batch onto a string-
                # pinned index; mirror that cast on the raw posted ids
                ids = [str(i) for i in ids]
            self._mutate(
                name,
                self._replace_store if self.store_backed else self._replace_flat,
                name,
                ids,
                hashed,
            )
        return {"acknowledged": True, "_index": body["_index"], "indexed": len(body["docs"])}

    # ---- torn-write detection (ADVICE r11): parquet has no transaction
    # log, so a crash mid-mutation can leave a half-overwritten flat dir or
    # mutually-inconsistent docs/ and terms/. Every mutation runs under a
    # marker; a surviving marker turns silent recall loss into a refused,
    # diagnosable state. ----

    def _dirty_marker(self, index: str) -> str:
        # '#' is outside the legal index-name alphabet (_index_path), so
        # the marker can never collide with another index's data directory
        return os.path.join(self.root, "indexes", f"{index}#dirty")

    def _check_clean(self, index: str) -> None:
        from . import io

        if index in self._mutating:
            return
        if io.fs_exists(self.spark, self._dirty_marker(index)):
            raise TornIndexError(
                f"index {index!r} has a torn write (a mutation crashed "
                "mid-commit); refusing to serve possibly-inconsistent "
                f"results — drop it (DELETE /{index}) and re-index"
            )

    def _mutate(self, index: str, fn, *args):
        """Run a store mutation under the torn-write marker: set it, run,
        clear it only on success. The marker sits OUTSIDE the data dir (a
        flat-mode overwrite deletes the whole index dir first — a marker
        inside it would vanish with the files it guards). Snapshot caches
        are dropped in all cases: a failure after files were rewritten
        must not leave them pointing at deleted parquet."""
        from . import io

        self._check_clean(index)
        marker = self._dirty_marker(index)
        io.fs_touch(self.spark, marker)
        self._mutating.add(index)
        try:
            out = fn(*args)
        finally:
            self._mutating.discard(index)
            self._docs_cache.pop(index, None)
            self._terms_cache.pop(index, None)
            for k in [k for k in self._pruned_schema if self._index_path(index) in k]:
                del self._pruned_schema[k]
            for k in [k for k in self._doc_cache if k[0] == index]:
                del self._doc_cache[k]
        io.fs_delete(self.spark, marker)
        return out

    def _ids_df(self, ids: list, id_type: str) -> DataFrame:
        return self.spark.createDataFrame([(i,) for i in ids], f"{ID_FIELD} {id_type}")

    def _pruned_dirs_df(self, base: str, part_cols: list[str], keys) -> DataFrame | None:
        """Rows of exactly the named partition directories, read via
        EXPLICIT paths + basePath (r12): a mutation previously re-read the
        store through a fresh full snapshot (its FileIndex lists ALL
        T·n_buckets + n_buckets directories) because the previous mutation
        dropped the caches — the listing, not the data, dominated the
        point-update latency. Directories that don't exist are skipped
        (manifest-level probe); None = none of them do. The snapshot
        caches stay what they are good at: amortizing ONE listing over
        many searches."""
        from . import io

        dirs = []
        for k in keys:
            k = k if isinstance(k, (tuple, list)) else (k,)
            d = io.fs_join(base, *[f"{c}={int(v)}" for c, v in zip(part_cols, k)])
            if io.fs_isdir(self.spark, d):
                dirs.append(d)
        if not dirs:
            return None
        schema = self._pruned_schema.get(base)
        reader = self.spark.read.option("basePath", base)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(*dirs)
        if schema is None:
            self._pruned_schema[base] = df.schema
        return df

    def _replace_flat(self, index: str, ids: list, hashed: DataFrame) -> None:
        """Flat-mode replace-on-index, FUSED (r12): one overwrite writes
        survivors ∪ new batch, so the stored doc has no absent window
        between a purge and an append (r11 purged then appended — two
        writes and a crash between them lost the old doc for good; now a
        crash leaves either the old dir or a detected-dirty one). An
        all-new batch stays a plain append."""
        path = self._index_path(index)
        if self._stored_id_type(index) is None:
            hashed.write.mode("append").parquet(path)
            return
        ids_df = self._ids_df(ids, dict(hashed.dtypes)[ID_FIELD])
        existing = self._cached_docs(index)
        doomed = existing.join(F.broadcast(ids_df), ID_FIELD, "left_semi")
        if not doomed.limit(1).count():
            hashed.write.mode("append").parquet(path)
            return
        patched = (
            existing.join(F.broadcast(ids_df), ID_FIELD, "left_anti")
            .unionByName(hashed)
            .localCheckpoint()
        )
        patched.write.mode("overwrite").parquet(path)

    def _replace_store(self, index: str, ids: list, hashed: DataFrame) -> None:
        """Store-mode replace-on-index, FUSED purge+append (r12): each
        side (terms/, docs/) transitions old→new in ONE pruned dynamic
        overwrite carrying survivors ∪ new rows, instead of r11's purge
        overwrite followed by an append — fewer Spark jobs per request
        (the serving keys' cost is per-request driver overhead, r11
        verdict) and no window where a replaced doc is absent. Bounds
        unchanged: ≤ |batch| id_bucket docs dirs, ≤ |batch|·T (tbl,
        bucket) term dirs (old ∪ new hashes), everything else untouched."""
        from .operators.lsh import explode_hashes
        from .sources.index_store import (
            DEFAULT_HASH_BUCKETS,
            partition_key_filter,
            pruned_dynamic_overwrite,
        )

        n = DEFAULT_HASH_BUCKETS
        path = self._index_path(index)
        if self._stored_id_type(index) is None:
            self._append_store(index, hashed)
            return
        # ONE collect over the checkpointed batch gives the pruning all it
        # needs driver-side: the ids' docs buckets and the NEW hashes'
        # term directories (≤ |batch|·T ints — no vectors)
        brows = hashed.select("id_bucket", "hashes").collect()
        buckets = sorted({int(r.id_bucket) for r in brows})
        new_parts = {(t, int(h) % n) for r in brows for t, h in enumerate(r.hashes)}
        ids_df = self._ids_df(ids, dict(hashed.dtypes)[ID_FIELD])
        # r12: the batch's ids can only live in its own id_bucket dirs —
        # read exactly those via explicit paths (no store-wide listing;
        # see _pruned_dirs_df)
        pruned = self._pruned_dirs_df(
            os.path.join(path, "docs"), ["id_bucket"], buckets
        )
        if pruned is None:
            self._append_store(index, hashed)
            return
        # the overlap probe doubles as doomed-terms discovery: the stored
        # hashes of the replaced ids name the term dirs to patch (fused
        # from r11's three jobs — doomed checkpoint, limit-count, parts
        # collect)
        doomed_rows = (
            pruned.join(F.broadcast(ids_df), ID_FIELD, "left_semi")
            .select("hashes")
            .collect()
        )
        if not doomed_rows:
            self._append_store(index, hashed)
            return
        doomed_parts = {
            (t, int(h) % n) for r in doomed_rows for t, h in enumerate(r.hashes)
        }
        touched = sorted(doomed_parts | new_parts)
        # terms side: survivors of EVERY touched dir ∪ the new batch's
        # terms — a new-only dir must fold its existing rows in too, or
        # the dynamic overwrite would drop them. Explicit-dir read of the
        # touched dirs only (the partition_key_filter predicate stays on
        # top as the correctness guard, same as load_lsh_partitions).
        terms = self._pruned_dirs_df(os.path.join(path, "terms"), ["tbl", "bucket"], touched)
        new_terms = explode_hashes(
            hashed.select(ID_FIELD, "hashes"), ID_FIELD, "vec_id"
        ).select(
            "vec_id",
            F.col("tbl").cast("int").alias("tbl"),
            "hash",
            F.pmod(F.col("hash"), F.lit(n)).cast("int").alias("bucket"),
        )
        live_terms = new_terms
        if terms is not None:
            live_terms = (
                terms.where(partition_key_filter(["tbl", "bucket"], touched))
                .select(
                    "vec_id",
                    F.col("tbl").cast("int").alias("tbl"),
                    "hash",
                    F.col("bucket").cast("int").alias("bucket"),
                )
                .join(
                    F.broadcast(ids_df.select(F.col(ID_FIELD).alias("vec_id"))),
                    "vec_id",
                    "left_anti",
                )
                .unionByName(new_terms)
            )
        # a doomed-only term dir (old hash no new doc shares) can empty, so
        # the emptied-dir sweep stays ON unless the new parts cover it
        pruned_dynamic_overwrite(
            self.spark,
            os.path.join(path, "terms"),
            live_terms,
            ["tbl", "bucket"],
            touched,
            assume_live=doomed_parts <= new_parts,
        )
        # docs side: the new rows land in exactly the probed buckets
        # (id_bucket is a function of _id), so one overwrite covers purge
        # and append, no touched directory can empty (assume_live), and
        # the emptied-dir job is skipped
        live_docs = pruned.join(F.broadcast(ids_df), ID_FIELD, "left_anti").unionByName(
            hashed.withColumn(
                "id_bucket", F.col("id_bucket").cast(dict(pruned.dtypes)["id_bucket"])
            )
        )
        pruned_dynamic_overwrite(
            self.spark,
            os.path.join(path, "docs"),
            live_docs,
            ["id_bucket"],
            buckets,
            assume_live=True,
        )

    def _replace_flat_bulk(self, index: str, latest: DataFrame) -> None:
        """Flat-mode whole-corpus merge for bulk refreshes: survivors via
        a distributed anti-join against the staged-id DATAFRAME (no
        broadcast of an O(corpus) id set), one overwrite."""
        path = self._index_path(index)
        if self._stored_id_type(index) is None:
            latest.write.mode("overwrite").parquet(path)
            return
        ids_df = latest.select(ID_FIELD)
        patched = (
            self._cached_docs(index)
            .join(ids_df, ID_FIELD, "left_anti")
            .unionByName(latest)
            .localCheckpoint()
        )
        patched.write.mode("overwrite").parquet(path)

    def _replace_store_bulk(self, index: str, latest: DataFrame) -> None:
        """Store-mode whole-store merge for bulk refreshes (r13, ADVICE
        r12): when the staged batch is corpus-sized, per-id pruning is
        pointless (it touches ~every directory anyway) and collecting the
        staged ids/hashes driver-side is O(corpus) driver memory. Merge
        fully distributed instead: survivors = live rows anti-joined
        against the staged-id DataFrame, unioned with the staged rows,
        clustered sibling-write + swap per side (docs/ by id_bucket,
        terms/ by (tbl, bucket)) under the caller's torn-write marker.
        Content is row-identical to the pruned patch path — the gated
        drive asserts it by forcing the threshold down — and the swapped
        store lands compacted (one file per directory) for free."""
        from .operators.lsh import explode_hashes
        from .sources.index_store import DEFAULT_HASH_BUCKETS, clustered_overwrite_swap

        n = DEFAULT_HASH_BUCKETS
        path = self._index_path(index)
        new_terms = explode_hashes(
            latest.select(ID_FIELD, "hashes"), ID_FIELD, "vec_id"
        ).select(
            "vec_id",
            F.col("tbl").cast("int").alias("tbl"),
            "hash",
            F.pmod(F.col("hash"), F.lit(n)).cast("int").alias("bucket"),
        )
        if self._stored_id_type(index) is None:
            live_docs, live_terms = latest, new_terms
        else:
            ids_df = latest.select(ID_FIELD)
            existing = self._cached_docs(index)
            live_docs = (
                existing.join(ids_df, ID_FIELD, "left_anti")
                .unionByName(
                    latest.withColumn(
                        "id_bucket",
                        F.col("id_bucket").cast(dict(existing.dtypes)["id_bucket"]),
                    )
                )
            )
            live_terms = (
                self._cached_terms(index)
                .select(
                    "vec_id",
                    F.col("tbl").cast("int").alias("tbl"),
                    "hash",
                    F.col("bucket").cast("int").alias("bucket"),
                )
                .join(
                    ids_df.select(F.col(ID_FIELD).alias("vec_id")),
                    "vec_id",
                    "left_anti",
                )
                .unionByName(new_terms)
            )
        clustered_overwrite_swap(
            self.spark, os.path.join(path, "docs"), live_docs, ["id_bucket"]
        )
        clustered_overwrite_swap(
            self.spark, os.path.join(path, "terms"), live_terms, ["tbl", "bucket"]
        )

    # ---- refresh=false staging + /_aknn_refresh (r12, ES NRT parity):
    # staged batches are hashed but NOT searchable/deletable until refresh
    # — exactly ES's near-real-time contract. Staging lives OUTSIDE the
    # data dir ('#' is outside the legal index-name alphabet, like the
    # dirty marker) so flat-mode reads and overwrites never see it. ----

    def _staging_path(self, index: str) -> str:
        return os.path.join(self.root, "indexes", f"{index}#staging")

    def _stage(self, index: str, hashed: DataFrame) -> None:
        from . import io

        self._check_clean(index)
        path = self._staging_path(index)
        seq = self._staging_seq.get(index)
        if seq is None:
            seq = 0
            if io.fs_isdir(self.spark, path):
                row = self.spark.read.parquet(path).agg(F.max("batch_seq")).first()
                seq = int(row[0] or 0) + 1
        hashed.withColumn("batch_seq", F.lit(seq).cast("long")).write.mode(
            "append"
        ).parquet(path)
        self._staging_seq[index] = seq + 1
        self._staged_id_type.setdefault(index, dict(hashed.dtypes)[ID_FIELD])

    def refresh(self, index: str) -> dict:
        """POST /_aknn_refresh — merge everything staged into the live
        store in one replace-on-index pass. The last staged occurrence of
        an id wins (batch_seq rank — ES applies index ops in order); the
        merge runs under the dirty marker like any mutation, and staging
        is deleted only after both sides commit, so a crash either leaves
        the staged batches intact (re-refresh) or a detected-torn index
        (drop + re-index — drop_index clears staging too)."""
        from . import io
        from pyspark.sql import Window

        with self._lock:
            path = self._staging_path(index)
            if not io.fs_isdir(self.spark, path):
                return {"_index": index, "refreshed": True, "merged": 0}
            staged = self.spark.read.parquet(path)
            w = Window.partitionBy(ID_FIELD).orderBy(F.desc("batch_seq"))
            latest = (
                staged.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .drop("rn", "batch_seq")
                .localCheckpoint(eager=True)
            )
            n_staged = latest.count()
            if n_staged > _refresh_bulk_rows():
                # corpus-sized merge (r13, ADVICE r12): never collect the
                # staged ids — distributed anti-join + clustered swap
                def _merge_bulk() -> None:
                    (
                        self._replace_store_bulk
                        if self.store_backed
                        else self._replace_flat_bulk
                    )(index, latest)
                    io.fs_delete(self.spark, path)

                self._mutate(index, _merge_bulk)
                self._staging_seq.pop(index, None)
                self._staged_id_type.pop(index, None)
                return {"_index": index, "refreshed": True, "merged": n_staged}
            ids = [r[0] for r in latest.select(ID_FIELD).collect()]

            def _merge() -> None:
                (self._replace_store if self.store_backed else self._replace_flat)(
                    index, ids, latest
                )
                io.fs_delete(self.spark, path)

            self._mutate(index, _merge)
            self._staging_seq.pop(index, None)
            self._staged_id_type.pop(index, None)
            return {"_index": index, "refreshed": True, "merged": len(ids)}

    def compact(self, index: str) -> dict:
        """POST /_aknn_compact — rewrite the index's accumulated append
        files into the canonical one-file-per-directory clustered layout
        (r13, the r12 verdict's wire-compaction item: every append-mode
        mutation leaves one file per touched directory, and 40-50 files
        per directory was the measured cost floor of the upsert/delete
        serving drives). Runs compact_in_place on docs/ (by id_bucket)
        and terms/ (by (tbl, bucket)) under the torn-write marker; served
        rows are unchanged — same content, same partition values, fewer
        files — so the gated results are identical by construction. Flat
        mode stores are a single overwrite layout already: acknowledged,
        nothing to do."""
        from . import io
        from .sources.index_store import compact_in_place

        with self._lock:
            if not io.fs_isdir(self.spark, self._docs_path(index)):
                raise ValueError(f"no such index: {index!r}")
            if not self.store_backed:
                return {"_index": index, "acknowledged": True, "compacted": False}

            def _run() -> None:
                compact_in_place(self.spark, self._docs_path(index), ["id_bucket"])
                compact_in_place(
                    self.spark,
                    os.path.join(self._index_path(index), "terms"),
                    ["tbl", "bucket"],
                )

            self._mutate(index, _run)
            return {"_index": index, "acknowledged": True, "compacted": True}

    def delete_ids(self, index: str, raw_ids: list) -> int:
        """Bulk document delete — ES DELETE-parity (r11 verdict item 1):
        the purge half of replace-on-index with no append, shared by the
        single-doc DELETE /{index}/{id} endpoint and the bulk POST
        /_aknn_delete. Ids are coerced to the index's pinned _id type (a
        non-numeric id cannot exist in a bigint-pinned index — it counts
        as not-found, like any unknown doc). Returns the number of stored
        docs actually removed (0 → HTTP 404 at the wire)."""
        with self._lock:
            pinned = self._stored_id_type(index)
            if pinned is None:
                return 0
            ids = []
            for i in raw_ids:
                if pinned == "string":
                    ids.append(str(i))
                else:
                    try:
                        ids.append(int(i))
                    except (TypeError, ValueError):
                        pass
            if not ids:
                return 0
            return self._mutate(
                index,
                self._delete_store if self.store_backed else self._delete_flat,
                index,
                ids,
                pinned,
            )

    def _delete_flat(self, index: str, ids: list, id_type: str) -> int:
        existing = self._cached_docs(index)
        ids_df = self._ids_df(ids, id_type)
        n_doomed = existing.join(F.broadcast(ids_df), ID_FIELD, "left_semi").count()
        if not n_doomed:
            return 0
        survivors = existing.join(
            F.broadcast(ids_df), ID_FIELD, "left_anti"
        ).localCheckpoint()
        # deleting the last doc leaves a legal empty (schema-only) dir
        survivors.write.mode("overwrite").parquet(self._index_path(index))
        return n_doomed

    def _delete_store(self, index: str, ids: list, id_type: str) -> int:
        """knn.index_delete's pattern behind the wire: the doomed ids'
        stored hashes name the term dirs, their id_buckets the docs dirs;
        both sides are patched via pruned dynamic overwrite and a
        directory emptied by the purge is removed (index_store helper)."""
        from .sources.index_store import (
            DEFAULT_HASH_BUCKETS,
            partition_key_filter,
            pruned_dynamic_overwrite,
        )

        n = DEFAULT_HASH_BUCKETS
        path = self._index_path(index)
        ids_df = self._ids_df(ids, id_type)
        buckets = [
            int(r.id_bucket)
            for r in ids_df.select(
                F.pmod(F.xxhash64(F.col(ID_FIELD)), F.lit(n)).alias("id_bucket")
            )
            .distinct()
            .collect()
        ]
        # explicit-dir reads throughout (r12, see _pruned_dirs_df): the
        # doomed ids can only live in their own id_bucket dirs, and the
        # doomed terms only in the stored hashes' (tbl, bucket) dirs
        pruned = self._pruned_dirs_df(
            os.path.join(path, "docs"), ["id_bucket"], buckets
        )
        if pruned is None:
            return 0
        doomed_rows = (
            pruned.join(F.broadcast(ids_df), ID_FIELD, "left_semi")
            .select("hashes", "id_bucket")
            .collect()
        )
        if not doomed_rows:
            return 0
        doomed_parts = sorted(
            {(t, int(h) % n) for r in doomed_rows for t, h in enumerate(r.hashes)}
        )
        doomed_buckets = sorted({int(r.id_bucket) for r in doomed_rows})
        terms = self._pruned_dirs_df(
            os.path.join(path, "terms"), ["tbl", "bucket"], doomed_parts
        )
        if terms is not None:
            live_terms = (
                terms.where(partition_key_filter(["tbl", "bucket"], doomed_parts))
                .select("vec_id", "tbl", "hash", "bucket")
                .join(
                    F.broadcast(ids_df.select(F.col(ID_FIELD).alias("vec_id"))),
                    "vec_id",
                    "left_anti",
                )
            )
            pruned_dynamic_overwrite(
                self.spark, os.path.join(path, "terms"), live_terms, ["tbl", "bucket"], doomed_parts
            )
        live_docs = pruned.where(F.col("id_bucket").isin(doomed_buckets)).join(
            F.broadcast(ids_df), ID_FIELD, "left_anti"
        )
        pruned_dynamic_overwrite(
            self.spark, os.path.join(path, "docs"), live_docs, ["id_bucket"], doomed_buckets
        )
        return len(doomed_rows)

    def drop_index(self, index: str) -> bool:
        """DELETE /{index} — ES's delete-index, and the documented recovery
        path for a torn index: data dir and dirty marker both go (so this
        must NOT itself refuse on dirty)."""
        from . import io

        with self._lock:
            path = self._index_path(index)
            existed = io.fs_isdir(self.spark, path)
            io.fs_delete(self.spark, path)
            io.fs_delete(self.spark, self._dirty_marker(index))
            io.fs_delete(self.spark, self._staging_path(index))
            self._staging_seq.pop(index, None)
            self._staged_id_type.pop(index, None)
            self._id_type_cache.pop(index, None)
            self._docs_cache.pop(index, None)
            self._terms_cache.pop(index, None)
            for k in [k for k in self._pruned_schema if self._index_path(index) in k]:
                del self._pruned_schema[k]
            for k in [k for k in self._doc_cache if k[0] == index]:
                del self._doc_cache[k]
        return existed

    def _append_store(self, index: str, hashed: DataFrame) -> None:
        """Append one all-new /_aknn_index batch into the partition-pruned
        layout: docs/ partitioned by id_bucket (doc-by-id lookup = one
        directory), terms/ partitioned by (tbl, bucket) —
        sources.index_store's exact LSH layout (id column stored under its
        vec_id name so load_lsh_partitions reads it back verbatim).
        `hashed` arrives with id_bucket already computed (index() adds it
        before the checkpoint). Per-batch appends accumulate one file per
        touched directory per batch — the compaction story is
        streaming_index_compact's, unchanged."""
        from .operators.lsh import explode_hashes
        from .sources.index_store import DEFAULT_HASH_BUCKETS, clustered

        path = self._index_path(index)
        (
            clustered(hashed, "id_bucket")
            .write.mode("append")
            .partitionBy("id_bucket")
            .parquet(os.path.join(path, "docs"))
        )
        terms = explode_hashes(
            hashed.select(ID_FIELD, "hashes"), ID_FIELD, "vec_id"
        ).withColumn("bucket", F.pmod(F.col("hash"), F.lit(DEFAULT_HASH_BUCKETS)))
        (
            clustered(terms, "tbl", "bucket")
            .write.mode("append")
            .partitionBy("tbl", "bucket")
            .parquet(os.path.join(path, "terms"))
        )

    def _cached_docs(self, index: str) -> DataFrame:
        df = self._docs_cache.get(index)
        if df is None:
            # cache miss is the one per-mutation re-entry point (every
            # mutation pops the caches), so the torn-write check here
            # covers all serving paths at zero cost to cached requests
            self._check_clean(index)
            df = self.spark.read.parquet(self._docs_path(index))
            self._docs_cache[index] = df
        return df

    def _cached_terms(self, index: str) -> DataFrame:
        df = self._terms_cache.get(index)
        if df is None:
            self._check_clean(index)
            df = self.spark.read.parquet(os.path.join(self._index_path(index), "terms"))
            self._terms_cache[index] = df
        return df

    def _query_doc_df(self, index: str, doc_id) -> DataFrame:
        """The stored query doc, read from its SINGLE id_bucket directory:
        xxhash64(lit) constant-folds, so the bucket predicate lands in the
        scan's PartitionFilters (asserted by tests/test_server.py). The lit
        is cast to the pinned id type — xxhash64 is type-sensitive, so an
        int literal probing a bigint-written bucket column must hash as
        bigint."""
        from .sources.index_store import DEFAULT_HASH_BUCKETS

        docs = self._cached_docs(index)
        qlit = F.lit(doc_id).cast(dict(docs.dtypes)[ID_FIELD])
        return docs.where(
            (F.col("id_bucket") == F.pmod(F.xxhash64(qlit), F.lit(DEFAULT_HASH_BUCKETS)))
            & (F.col(ID_FIELD) == qlit)
        )

    def _coerce_ids(self, id_type: str, doc_ids: list) -> list:
        """Wire ids coerced to the pinned id type; a non-numeric id probing
        a bigint-pinned index cannot exist there — it keeps the 200 /
        zero-hits contract and is simply dropped from the Spark-side
        batch (the response builder emits its empty hit list)."""
        if id_type != "bigint":
            return list(doc_ids)
        out = []
        for d in doc_ids:
            try:
                out.append(int(d))
            except ValueError:
                continue
        return out

    def _msearch_store(self, index: str, doc_ids: list, k1: int, k2: int) -> DataFrame:
        """The pruned serving read (store_backed mode) for a BATCH of query
        ids, returned BEFORE the collect so tests can assert its physical
        plan: the query docs come from their ≤ |batch| id_bucket
        directories (xxhash64(lit) folds per id to a literal
        PartitionFilter, OR-ed), candidates from the ≤ Q·T probed
        (tbl, bucket) term directories of the cached terms snapshot; only
        the ≤ Q·k1 re-rank vector gather touches docs/ un-pruned.

        r13 (the r12 verdict's job-count item): batching is where the
        per-request fixed driver cost goes away — Q queries share ONE
        stored-doc fetch job and ONE ranked-collect job instead of Q of
        each, and per-query results are bit-identical to the single-id
        path because every rank window partitions by query_id."""
        from .operators.knn import rank_term_matches
        from .sources.index_store import DEFAULT_HASH_BUCKETS

        n = DEFAULT_HASH_BUCKETS
        docs = self._cached_docs(index)
        id_type = dict(docs.dtypes)[ID_FIELD]
        empty = f"query_id {id_type}, neighbor_id {id_type}, n_match bigint, distance double"
        ids = self._coerce_ids(id_type, doc_ids)
        missing = [d for d in ids if (index, d) not in self._doc_cache]
        if missing:
            # ONE pruned read for every cache miss: OR of the single-id
            # shape (id_bucket == folded-literal) & (id == literal), so
            # partition pruning still sees only literal bucket equalities
            pred = None
            for d in missing:
                qlit = F.lit(d).cast(id_type)
                c = (
                    F.col("id_bucket")
                    == F.pmod(F.xxhash64(qlit), F.lit(DEFAULT_HASH_BUCKETS))
                ) & (F.col(ID_FIELD) == qlit)
                pred = c if pred is None else pred | c
            got: dict = {d: [] for d in missing}
            for r in docs.where(pred).collect():
                got[r[ID_FIELD]].append(r)
            for d in missing:
                if len(self._doc_cache) >= 4096:  # FIFO cap
                    self._doc_cache.pop(next(iter(self._doc_cache)))
                self._doc_cache[(index, d)] = got[d]
        found = [(d, self._doc_cache[(index, d)][0]) for d in ids if self._doc_cache[(index, d)]]
        if not found:
            # wire-protocol parity with flat mode: an unknown doc id is a
            # 200 with zero hits there (aknn_search over an empty query
            # set), so the pruned layout must not turn it into a 400
            return self.spark.createDataFrame([], empty)
        q_exp = self.spark.createDataFrame(
            [(d, t, int(h)) for d, q in found for t, h in enumerate(q["hashes"])],
            f"query_id {id_type}, tbl int, hash bigint",
        )
        # prune the cached terms snapshot to the ≤ Q·T probed (tbl, bucket)
        # directories — same packed-key IN PartitionFilters shape as
        # load_lsh_partitions, without its per-call listing (see the
        # _terms_cache note in __init__); deduped across queries sharing
        # buckets. (r13: was an OR-of-literals tree — building that
        # ~Q·T-way Column tree cost seconds of py4j round-trips per
        # msearch batch at T=16; packed IN is one expression.)
        from .sources.index_store import partition_key_filter

        pairs = sorted({(t, int(h) % n) for _d, q in found for t, h in enumerate(q["hashes"])})
        idx_exp = (
            self._cached_terms(index)
            .where(partition_key_filter(["tbl", "bucket"], pairs))
            .select(F.col("vec_id").alias("neighbor_id"), "tbl", "hash")
        )
        counts = (
            idx_exp.join(F.broadcast(q_exp), ["tbl", "hash"])
            .where(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.count(F.lit(1)).alias("n_match"))
        )
        query_df = self.spark.createDataFrame(
            [(d, list(q[VECTOR_FIELD])) for d, q in found],
            f"{ID_FIELD} {id_type}, {VECTOR_FIELD} array<double>",
        )
        return rank_term_matches(
            counts, docs, query_df, k1, k2, ID_FIELD, VECTOR_FIELD
        )

    def _search_store(self, index: str, doc_id, k1: int, k2: int) -> DataFrame:
        """Single-id form of _msearch_store (kept as the plan-contract
        surface tests/test_server.py asserts on)."""
        return self._msearch_store(index, [doc_id], k1, k2)

    def msearch(self, index: str, doc_ids: list, k1: int = ANN_K1, k2: int = ANN_K2) -> dict:
        """Batched search — ES `_msearch` parity, JSON-body form: one
        response per requested id, in request order, each identical to the
        single-id GET's payload. Q queries cost ONE ranked-collect job
        (plus one batched stored-doc fetch on cache miss) instead of Q."""
        with self._lock:
            rows = []
            id_type = dict(self._cached_docs(index).dtypes)[ID_FIELD]
            if self.store_backed:
                ranked = self._msearch_store(index, doc_ids, k1, k2)
            else:
                coerced = self._coerce_ids(id_type, doc_ids)
                ranked = (
                    aknn_search(self._cached_docs(index), coerced, k1, k2)
                    if coerced
                    else None
                )
            if ranked is not None:
                rows = ranked.orderBy(
                    F.asc("query_id"), F.asc("distance"), F.asc("neighbor_id")
                ).collect()
        by_qid: dict = {}
        for r in rows:
            by_qid.setdefault(r.query_id, []).append(r)
        responses = []
        for d in doc_ids:
            keyed = self._coerce_ids(id_type, [d])
            hits = by_qid.get(keyed[0], []) if keyed else []
            responses.append(
                {
                    "timed_out": False,
                    "hits": {
                        "total": len(hits),
                        "hits": [
                            {"_id": r.neighbor_id, "_score": r.distance, "n_match": r.n_match}
                            for r in hits
                        ],
                    },
                }
            )
        return {"responses": responses}

    def search(self, index: str, doc_id, k1: int = ANN_K1, k2: int = ANN_K2) -> dict:
        return self.msearch(index, [doc_id], k1, k2)["responses"][0]

    def get_doc(self, index: str, doc_id) -> dict | None:
        """ES GET /{index}/{id} parity (r13, #163): the stored document's
        source vector, or None → the handler's 404. Store mode reads the
        id's single pruned id_bucket directory through the same per-id
        cache the serving path warms; flat mode filters the cached
        snapshot. JSON round-trips the doubles exactly, so the wire doc
        equals the stored doc bit-for-bit."""
        with self._lock:
            docs = self._cached_docs(index)
            id_type = dict(docs.dtypes)[ID_FIELD]
            ids = self._coerce_ids(id_type, [doc_id])
            if not ids:
                return None
            d = ids[0]
            if self.store_backed:
                ck = (index, d)
                qrows = self._doc_cache.get(ck)
                if qrows is None:
                    qrows = self._query_doc_df(index, d).collect()
                    if len(self._doc_cache) >= 4096:  # FIFO cap
                        self._doc_cache.pop(next(iter(self._doc_cache)))
                    self._doc_cache[ck] = qrows
            else:
                qrows = docs.where(
                    F.col(ID_FIELD) == F.lit(d).cast(id_type)
                ).collect()
            if not qrows:
                return None
            q = qrows[0]
            return {
                "_index": index,
                "_id": q[ID_FIELD],
                "found": True,
                "_source": {VECTOR_FIELD: list(q[VECTOR_FIELD])},
            }

    def models(self) -> dict:
        return {"models": self.registry.names()}


def _make_handler(server: AknnHttpServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args) -> None:  # keep test output clean
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", "0"))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_POST(self) -> None:
            try:
                if self.path == "/_aknn_create":
                    self._reply(200, server.create(self._body()))
                elif self.path == "/_aknn_index":
                    self._reply(200, server.index(self._body()))
                elif self.path == "/_aknn_delete":
                    body = self._body()
                    n = server.delete_ids(body["_index"], body["ids"])
                    self._reply(200, {"_index": body["_index"], "deleted": n})
                elif self.path == "/_aknn_refresh":
                    self._reply(200, server.refresh(self._body()["_index"]))
                elif self.path == "/_aknn_compact":
                    self._reply(200, server.compact(self._body()["_index"]))
                elif self.path.endswith("/_aknn_msearch"):
                    # ES _msearch parity (JSON-body form): POST
                    # /{index}/_aknn_msearch {"ids": [...], "k1":, "k2":}
                    parts = [p for p in self.path.split("/") if p]
                    if len(parts) != 2:
                        self._reply(404, {"error": f"no such endpoint: {self.path}"})
                        return
                    body = self._body()
                    self._reply(
                        200,
                        server.msearch(
                            parts[0],
                            body["ids"],
                            int(body.get("k1", ANN_K1)),
                            int(body.get("k2", ANN_K2)),
                        ),
                    )
                else:
                    self._reply(404, {"error": f"no such endpoint: {self.path}"})
            except TornIndexError as exc:
                self._reply(503, {"error": f"{type(exc).__name__}: {exc}"})
            except Exception as exc:  # noqa: BLE001 — wire boundary
                self._reply(400, {"error": f"{type(exc).__name__}: {exc}"})

        def do_GET(self) -> None:
            try:
                from urllib.parse import parse_qs, urlparse

                parsed = urlparse(self.path)
                parts = [p for p in parsed.path.split("/") if p]
                if parsed.path == "/_aknn_models":
                    self._reply(200, server.models())
                elif len(parts) == 3 and parts[2] == "_aknn_search":
                    q = parse_qs(parsed.query)
                    self._reply(
                        200,
                        server.search(
                            parts[0],
                            parts[1],
                            int(q.get("k1", [ANN_K1])[0]),
                            int(q.get("k2", [ANN_K2])[0]),
                        ),
                    )
                elif len(parts) == 2 and not parts[1].startswith("_"):
                    # ES doc-GET parity: GET /{index}/{id} → stored doc
                    doc = server.get_doc(parts[0], parts[1])
                    if doc is None:
                        self._reply(
                            404,
                            {"_index": parts[0], "_id": parts[1], "found": False},
                        )
                    else:
                        self._reply(200, doc)
                else:
                    self._reply(404, {"error": f"no such endpoint: {self.path}"})
            except TornIndexError as exc:
                self._reply(503, {"error": f"{type(exc).__name__}: {exc}"})
            except Exception as exc:  # noqa: BLE001 — wire boundary
                self._reply(400, {"error": f"{type(exc).__name__}: {exc}"})

        def do_DELETE(self) -> None:
            # ES wire parity: DELETE /{index} drops the index (also the
            # torn-write recovery path); DELETE /{index}/{id} deletes one
            # document with 200 deleted / 404 not_found semantics
            try:
                parts = [p for p in self.path.split("/") if p]
                if len(parts) == 1:
                    found = server.drop_index(parts[0])
                    self._reply(200 if found else 404, {"acknowledged": found})
                elif len(parts) == 2:
                    n = server.delete_ids(parts[0], [parts[1]])
                    self._reply(
                        200 if n else 404,
                        {
                            "_index": parts[0],
                            "_id": parts[1],
                            "result": "deleted" if n else "not_found",
                        },
                    )
                else:
                    self._reply(404, {"error": f"no such endpoint: {self.path}"})
            except TornIndexError as exc:
                self._reply(503, {"error": f"{type(exc).__name__}: {exc}"})
            except Exception as exc:  # noqa: BLE001 — wire boundary
                self._reply(400, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


# server + indexed store, once per (SparkContext, sf_dir, mode) — the
# facade's create+index phase is index MAINTENANCE; repeat calls measure
# serving
_SERVER_CACHE: dict[tuple, AknnHttpServer] = {}


def _http_post(port: int, path: str, payload: dict) -> dict:
    from urllib.request import Request, urlopen

    req = Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urlopen(req) as resp:
        out = json.loads(resp.read())
    if "error" in out:
        raise RuntimeError(f"{path}: {out['error']}")
    return out


def _http_get(port: int, path: str) -> dict:
    from urllib.request import urlopen

    with urlopen(f"http://127.0.0.1:{port}{path}") as resp:
        out = json.loads(resp.read())
    if "error" in out:
        raise RuntimeError(f"{path}: {out['error']}")
    return out


def aknn_http_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (SURVEY §2 #156): the three HTTP endpoints driven
    over a real localhost socket — model fit via POST /_aknn_create (the
    canonical 2·T·B sample posted in the body), the full embeddings table
    POSTed through /_aknn_index in batches, and the canonical query ids
    searched via GET /{index}/{id}/_aknn_search — then the JSON hit lists
    reassembled into the (query_id, neighbor_id, n_match, distance)
    frame. Gated by the shared ann_search_lsh oracle: the wire round-trip
    (JSON floats both directions — exact, shortest-repr) must be
    bit-identical to the in-memory search path."""
    return _drive_endpoints(spark, sf_dir, store_backed=False)


def aknn_http_search_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (SURVEY §2 #157, r11): the SAME three endpoints and
    the same wire payloads served from the partition-pruned store layout
    (store_backed=True — docs/ by id_bucket, terms/ by (tbl, bucket)).
    Gated by the same shared ann_search_lsh oracle as the flat-mode twin:
    the pruned serving path must be bit-identical to the in-memory search,
    proving the 100 TB layout is lossless behind an unchanged protocol."""
    return _drive_endpoints(spark, sf_dir, store_backed=True)


def aknn_http_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (SURVEY §2 #160, r11): the reference's REPLACE
    semantics over the wire. An ES index op with an existing _id replaces
    the stored document — so `/_aknn_index` purges incoming ids from the
    store before appending (pruned dynamic overwrite of the ≤ |batch|
    docs directories and the doomed ids' term directories in store mode).
    The drive posts the full table, then RE-POSTS the canonical update set
    (vec_id % UPSERT_MOD == 0, every component doubled — IEEE-exact, and
    JSON round-trips doubles exactly) through the same endpoint against
    the pruned store layout, then searches. Gated by the index_upsert
    oracle: the wire replace must equal a full index rebuild on the
    updated table, so a leaked stale row (hash or vector) from the
    replaced docs fails the hash gate."""
    from .constants import UPSERT_MOD

    def update(docs: list[dict]) -> list[dict]:
        return [
            {
                ID_FIELD: d[ID_FIELD],
                "_source": {
                    VECTOR_FIELD: [2.0 * x for x in d["_source"][VECTOR_FIELD]]
                },
            }
            for d in docs
            if d[ID_FIELD] % UPSERT_MOD == 0
        ]

    return _drive_endpoints(
        spark, sf_dir, store_backed=True, tag="upsert", repost=update
    )


def aknn_http_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (SURVEY §2 #161, r12): ES document-DELETE parity —
    the last wire CRUD gap (r11 verdict item 1; ES serves DELETE
    /{index}/{id} natively, and a GDPR purge hits it immediately). The
    drive posts the full table into the pruned store layout, bulk-deletes
    the canonical purge set (vec_id % DELETE_MOD == DELETE_REM) over the
    wire via POST /_aknn_delete — the single-doc DELETE /{index}/{id}
    endpoint runs the same delete_ids path with 200 deleted / 404
    not_found semantics, unit-tested both modes — then searches every
    canonical query id. Gated by the shared index_delete oracle: the wire
    purge must equal a full rebuild on the filtered corpus; a purged QUERY
    id returns zero hits (unknown-id semantics) and so contributes no rows
    — exactly rebuild semantics."""
    from .constants import DELETE_MOD, DELETE_REM

    def purge(port: int, docs: list[dict]) -> None:
        doomed = [
            d[ID_FIELD] for d in docs if d[ID_FIELD] % DELETE_MOD == DELETE_REM
        ]
        out = _http_post(port, "/_aknn_delete", {"_index": "vectors", "ids": doomed})
        if out["deleted"] != len(doomed):
            raise RuntimeError(
                f"wire delete removed {out['deleted']} of {len(doomed)} docs"
            )

    return _drive_endpoints(spark, sf_dir, store_backed=True, tag="delete", mutate=purge)


def aknn_http_doc_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (SURVEY §2 #163, r13): ES document-GET parity —
    GET /{index}/{id} returns the stored doc from its single pruned
    id_bucket directory (the exact read + per-id cache the serving path
    uses), 404 for an unknown id. The drive reuses the store-backed
    search server's built index (shared _SERVER_CACHE key — no second
    load), GETs every canonical query id plus one unknown id (asserted
    404, contributing no rows), and explodes the JSON vectors to
    (vec_id, dim, x) rows. Gated directly against the embeddings
    parquet: JSON round-trips doubles exactly, so a stored-vector byte
    flip anywhere in hash/append/compact fails the hash gate."""
    import urllib.error

    from .constants import N_QUERIES

    srv = _ensure_server(spark, sf_dir, store_backed=True)
    rows = []
    for qid in range(N_QUERIES):
        res = _http_get(srv.port, f"/vectors/{qid}")
        assert res["found"] is True and res["_id"] == qid
        for i, x in enumerate(res["_source"][VECTOR_FIELD]):
            rows.append((qid, i, float(x)))
    try:
        _http_get(srv.port, "/vectors/987654321")
        raise RuntimeError("unknown id must 404")
    except urllib.error.HTTPError as e:
        if e.code != 404:
            raise
    return spark.createDataFrame(rows, "vec_id bigint, dim int, x double")


def aknn_http_bulk_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (SURVEY §2 #162, r12): ES refresh-semantics bulk
    loading over the wire — the answer to r11's honest 749 s / 200k wire
    ingest number. Every /_aknn_index batch is posted with
    "refresh": false (hash + ONE narrow staging append per request — no
    probe/purge/partitioned-write jobs), then a single POST /_aknn_refresh
    merges the staged batches into the pruned store layout through the
    batch builder's clustered writes, with last-occurrence-of-an-id-wins
    across batches (ES op order). Gated by the shared ann_search_lsh
    oracle like the other serving keys: searches over the bulk-loaded
    store must be bit-identical to the in-memory search path, so a doc
    lost (or duplicated) anywhere in stage → merge fails the hash gate."""
    return _drive_endpoints(spark, sf_dir, store_backed=True, tag="bulk", bulk=True)


def _ensure_server(
    spark: SparkSession,
    sf_dir: str,
    store_backed: bool,
    tag: str | None = None,
    repost=None,
    mutate=None,
    bulk: bool = False,
) -> AknnHttpServer:
    """Build (or reuse from _SERVER_CACHE) the drive server for one
    (mode, tag) — create + index + optional mutate + compact. Split out
    of _drive_endpoints (r13) so non-search drives (doc GET) share the
    same built store instead of paying a second load."""
    from . import io
    from .session import configure

    configure(spark)
    key = (spark.sparkContext.applicationId, sf_dir, store_backed, tag)
    srv = _SERVER_CACHE.get(key)
    if srv is None:
        kind = f"aknn_http_{tag}" if tag else (
            "aknn_http_store" if store_backed else "aknn_http"
        )
        srv = AknnHttpServer(
            spark, io.scratch_dir(kind, sf_dir), store_backed=store_backed
        ).start()
        try:
            emb = io.table(spark, sf_dir, "embeddings", widen=True)
            docs = [
                {ID_FIELD: int(r.vec_id), "_source": {VECTOR_FIELD: list(r.embedding)}}
                for r in emb.select("vec_id", "embedding").orderBy("vec_id").collect()
            ]
            need = 2 * LSH_TABLES * LSH_BITS
            _http_post(srv.port, "/_aknn_create", {"_id": "default", "docs": docs[:need]})
            batches = [docs[i : i + 5000] for i in range(0, len(docs), 5000)]
            if repost is not None:
                batches += [b for b in (repost(docs[i : i + 5000]) for i in range(0, len(docs), 5000)) if b]
            for batch in batches:
                payload = {"model": "default", "_index": "vectors", "docs": batch}
                if bulk:
                    payload["refresh"] = False
                _http_post(srv.port, "/_aknn_index", payload)
            if bulk:
                _http_post(srv.port, "/_aknn_refresh", {"_index": "vectors"})
            if mutate is not None:
                mutate(srv.port, docs)
            if store_backed:
                # r13: close the maintenance loop the r12 verdict flagged —
                # the batched appends (and any purge/replace churn) leave
                # one file per touched directory per request; a real
                # operator compacts after a load, so the drives do too.
                # Served rows are unchanged (same oracle gates them).
                _http_post(srv.port, "/_aknn_compact", {"_index": "vectors"})
        except BaseException:
            # ADVICE r11: never cache a partially-built server — a same-
            # session retry would skip indexing and gate against a partial
            # store with a confusing oracle mismatch instead of this error
            srv.stop()
            raise
        _SERVER_CACHE[key] = srv
    return srv


def _drive_endpoints(
    spark: SparkSession,
    sf_dir: str,
    store_backed: bool,
    tag: str | None = None,
    repost=None,
    mutate=None,
    bulk: bool = False,
) -> DataFrame:
    from .constants import N_QUERIES

    srv = _ensure_server(spark, sf_dir, store_backed, tag, repost, mutate, bulk)
    # r13: the canonical queries go over the wire as ONE _aknn_msearch
    # request — Q queries share one ranked-collect job instead of paying
    # Q × fixed per-request driver cost (the r12 verdict's job-count
    # item); per-query payloads are identical to the per-id GET's (the
    # endpoint is unit-tested equal both modes), so the gate is unchanged
    rows = []
    res = _http_post(
        srv.port,
        "/vectors/_aknn_msearch",
        {"ids": list(range(N_QUERIES)), "k1": ANN_K1, "k2": ANN_K2},
    )
    for qid, r in zip(range(N_QUERIES), res["responses"]):
        for h in r["hits"]["hits"]:
            rows.append((qid, h["_id"], h["n_match"], h["_score"]))
    return spark.createDataFrame(
        rows, "query_id bigint, neighbor_id bigint, n_match bigint, distance double"
    )
