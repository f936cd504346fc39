"""HTTP serving-layer contracts beyond the basic endpoint test
(tests/test_operators.py::test_aknn_http_server_endpoints): the r11
store-backed mode (flat vs pruned layout equivalence + PartitionFilters in
the served plan) and the id-type pinning rule (ADVICE r10)."""

from __future__ import annotations

import json as _json
import tempfile
import urllib.error
import urllib.request

from elastik_nearest_neighbors_spark import io as eio
from elastik_nearest_neighbors_spark import plans
from elastik_nearest_neighbors_spark.server import AknnHttpServer, _http_get, _http_post
from tests.conftest import SF_SMALL


def _sample_docs(spark, n=300):
    emb = eio.table(spark, SF_SMALL, "embeddings", widen=True)
    return [
        {"_id": int(r.vec_id), "_source": {"_aknn_vector": list(r.embedding)}}
        for r in emb.select("vec_id", "embedding").orderBy("vec_id").limit(n).collect()
    ]


def _serve(spark, docs, store_backed, batches=1, sample=None):
    """sample: the /_aknn_create fit docs — defaults to docs[:24], but a
    comparison server indexing MUTATED docs must fit from the SAME sample
    as its twin, or the two servers hold different LSH models and any
    result equality is a data coincidence."""
    srv = AknnHttpServer(
        spark, tempfile.mkdtemp(prefix="enn_http_test_"), store_backed=store_backed
    ).start()
    _http_post(
        srv.port,
        "/_aknn_create",
        {"_id": "m", "nb_tables": 4, "nb_bits_per_table": 3,
         "docs": (sample if sample is not None else docs[:24])},
    )
    step = max(1, len(docs) // batches)
    for i in range(0, len(docs), step):
        _http_post(
            srv.port,
            "/_aknn_index",
            {"model": "m", "_index": "idx", "docs": docs[i : i + step]},
        )
    return srv


def test_http_store_mode_matches_flat_and_prunes(spark):
    """r11 (#157): the store-backed server must return byte-identical wire
    responses to the flat server (same model, same docs, MULTI-batch append
    on the store side), and its serving plan must carry PartitionFilters on
    both pruned reads (terms by (tbl, bucket), query doc by id_bucket)."""
    docs = _sample_docs(spark)
    flat = _serve(spark, docs, store_backed=False)
    store = _serve(spark, docs, store_backed=True, batches=3)
    try:
        for qid in (docs[0]["_id"], docs[7]["_id"], docs[123]["_id"]):
            a = _http_get(flat.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
            b = _http_get(store.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
            assert a == b, (qid, a, b)
        # the pruned plans: literal PartitionFilters on BOTH store reads —
        # candidate terms by (tbl, bucket), query doc by id_bucket
        df = store._search_store("idx", docs[0]["_id"], 50, 5)
        pf = " ".join(plans.partition_filters(df))
        assert "tbl" in pf and "bucket" in pf, plans.formatted_plan(df)
        qdf = store._query_doc_df("idx", docs[0]["_id"])
        qpf = " ".join(plans.partition_filters(qdf))
        assert "id_bucket" in qpf and "=" in qpf, plans.formatted_plan(qdf)
    finally:
        flat.stop()
        store.stop()


def _post_raw(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=_json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req)


def test_http_index_id_type_pinned(spark):
    """ADVICE r10: the index's FIRST batch pins the _id type. A string-id
    batch against a bigint-pinned index must 400 (not append a torn
    schema); an int-id batch against a string-pinned index is cast and
    stays searchable."""
    docs = _sample_docs(spark, n=64)
    for store_backed in (False, True):
        srv = _serve(spark, docs[:32], store_backed=store_backed)
        try:
            bad = [{"_id": f"doc-{i}", "_source": d["_source"]} for i, d in enumerate(docs[32:48])]
            try:
                _post_raw(srv.port, "/_aknn_index", {"model": "m", "_index": "idx", "docs": bad})
                raise AssertionError("expected 400 for string ids on bigint-pinned index")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "pins _id type bigint" in _json.loads(e.read())["error"]
            # the rejected batch must not have corrupted the store
            res = _http_get(srv.port, f"/idx/{docs[0]['_id']}/_aknn_search?k1=50&k2=5")
            assert res["hits"]["total"] == 5

            # string-pinned index: first batch has a string id -> later
            # all-int batches are cast losslessly and searchable
            first = [dict(docs[0], _id="s-0")] + docs[1:8]
            _http_post(srv.port, "/_aknn_index", {"model": "m", "_index": "sidx", "docs": first})
            _http_post(srv.port, "/_aknn_index", {"model": "m", "_index": "sidx", "docs": docs[8:32]})
            res = _http_get(srv.port, "/sidx/s-0/_aknn_search?k1=50&k2=5")
            assert res["hits"]["total"] == 5
            res2 = _http_get(srv.port, f"/sidx/{docs[9]['_id']}/_aknn_search?k1=50&k2=5")
            assert res2["hits"]["total"] == 5
        finally:
            srv.stop()


def test_http_index_replaces_by_id(spark):
    """r11 (#160): ES replace-on-index semantics — re-posting an _id must
    replace the stored doc in BOTH modes, and the result must equal a
    fresh server indexed with the final state; within a batch the last
    occurrence wins."""
    docs = _sample_docs(spark, n=96)
    moved = [
        {"_id": d["_id"],
         "_source": {"_aknn_vector": [2.0 * x for x in d["_source"]["_aknn_vector"]]}}
        for d in docs[:16]
    ]
    final = moved + docs[16:]
    for store_backed in (False, True):
        srv = _serve(spark, docs, store_backed=store_backed, batches=2)
        # the reference server indexes the FINAL state but must fit its
        # model from the same original sample as srv (review r11: fitting
        # from `final` gives a different model, and equality would hold
        # only by data coincidence)
        fresh = _serve(spark, final, store_backed=store_backed, batches=2, sample=docs[:24])
        try:
            # re-post the moved docs; also exercise last-wins within batch
            # (a stale copy of each doc precedes its moved version)
            _http_post(srv.port, "/_aknn_index",
                       {"model": "m", "_index": "idx", "docs": docs[:16] + moved})
            for qid in (docs[0]["_id"], docs[5]["_id"], docs[40]["_id"]):
                a = _http_get(srv.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
                b = _http_get(fresh.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
                assert a == b, (store_backed, qid, a, b)
        finally:
            srv.stop()
            fresh.stop()


def test_http_unknown_doc_is_200_empty_in_both_modes(spark):
    """r11: an unknown doc id must be a 200 with zero hits in BOTH modes
    (the pruned layout previously turned it into a 400 KeyError)."""
    docs = _sample_docs(spark, n=32)
    for store_backed in (False, True):
        srv = _serve(spark, docs, store_backed=store_backed)
        try:
            res = _http_get(srv.port, "/idx/999999/_aknn_search?k1=50&k2=5")
            assert res == {"timed_out": False, "hits": {"total": 0, "hits": []}}, res
        finally:
            srv.stop()


def test_http_failed_repost_preserves_stored_doc(spark):
    """r11 review: a replace must NOT destroy on failure — a re-post whose
    vector has the wrong dimension 400s with the store (and the old doc)
    intact, in both modes."""
    docs = _sample_docs(spark, n=32)
    for store_backed in (False, True):
        srv = _serve(spark, docs, store_backed=store_backed)
        try:
            before = _http_get(srv.port, f"/idx/{docs[0]['_id']}/_aknn_search?k1=50&k2=5")
            bad = [{"_id": docs[0]["_id"], "_source": {"_aknn_vector": [1.0, 2.0]}}]
            try:
                _post_raw(srv.port, "/_aknn_index", {"model": "m", "_index": "idx", "docs": bad})
                raise AssertionError("expected 400 for wrong-dimension vector")
            except urllib.error.HTTPError as e:
                assert e.code == 400
            after = _http_get(srv.port, f"/idx/{docs[0]['_id']}/_aknn_search?k1=50&k2=5")
            assert after == before, (store_backed, before, after)
        finally:
            srv.stop()


def test_http_non_numeric_unknown_id_is_200_empty(spark):
    """r11 review: a NON-NUMERIC unknown id on a bigint-pinned index must
    also take the 200/zero-hits path (not a 400 from int())."""
    docs = _sample_docs(spark, n=32)
    for store_backed in (False, True):
        srv = _serve(spark, docs, store_backed=store_backed)
        try:
            res = _http_get(srv.port, "/idx/not-a-number/_aknn_search?k1=50&k2=5")
            assert res == {"timed_out": False, "hits": {"total": 0, "hits": []}}, res
        finally:
            srv.stop()


def _delete_raw(port, path):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", method="DELETE")
    return urllib.request.urlopen(req)


def test_http_delete_doc_200_404_and_matches_fresh(spark):
    """r12 (#161): DELETE /{index}/{id} removes the stored doc (200
    result:deleted), a repeat or unknown id is a 404 result:not_found, and
    post-delete searches equal a fresh server indexed without the doc —
    in BOTH modes."""
    docs = _sample_docs(spark, n=96)
    victim = docs[3]["_id"]
    for store_backed in (False, True):
        srv = _serve(spark, docs, store_backed=store_backed, batches=2)
        fresh = _serve(
            spark,
            [d for d in docs if d["_id"] != victim],
            store_backed=store_backed,
            sample=docs[:24],
        )
        try:
            res = _json.loads(_delete_raw(srv.port, f"/idx/{victim}").read())
            assert res["result"] == "deleted", res
            for bad in (victim, 999999, "not-a-number"):
                try:
                    _delete_raw(srv.port, f"/idx/{bad}")
                    raise AssertionError(f"expected 404 deleting {bad!r}")
                except urllib.error.HTTPError as e:
                    assert e.code == 404
                    assert _json.loads(e.read())["result"] == "not_found"
            # deleted doc searches as unknown: 200 with zero hits
            res = _http_get(srv.port, f"/idx/{victim}/_aknn_search?k1=50&k2=5")
            assert res["hits"]["total"] == 0, res
            # remaining corpus serves exactly like a never-indexed-it twin
            for qid in (docs[0]["_id"], docs[40]["_id"]):
                a = _http_get(srv.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
                b = _http_get(fresh.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
                assert a == b, (store_backed, qid, a, b)
        finally:
            srv.stop()
            fresh.stop()


def test_http_bulk_delete_empties_directories(spark):
    """r12: POST /_aknn_delete purges a whole id set in one request and
    reports the count; in store mode a docs id_bucket directory emptied by
    the purge is physically removed (the index_store helper's emptied-dir
    contract) while surviving buckets keep serving."""
    import os as _os

    from pyspark.sql import functions as F

    docs = _sample_docs(spark, n=64)
    srv = _serve(spark, docs, store_backed=True, batches=2)
    try:
        stored = srv._cached_docs("idx").select("_id", "id_bucket").collect()
        by_bucket: dict[int, list] = {}
        for r in stored:
            by_bucket.setdefault(int(r.id_bucket), []).append(r._id)
        # kill every doc of one bucket (plus one from another: the bulk
        # request spans buckets) -> that directory must vanish
        doomed_bucket = min(by_bucket)
        other_bucket = max(by_bucket)
        assert doomed_bucket != other_bucket
        doomed = by_bucket[doomed_bucket] + by_bucket[other_bucket][:1]
        out = _http_post(srv.port, "/_aknn_delete", {"_index": "idx", "ids": doomed})
        assert out["deleted"] == len(doomed), (out, len(doomed))
        ddir = _os.path.join(srv._docs_path("idx"), f"id_bucket={doomed_bucket}")
        assert not _os.path.isdir(ddir), "emptied id_bucket dir must be removed"
        survivor = next(i for i in by_bucket[other_bucket] if i not in doomed)
        res = _http_get(srv.port, f"/idx/{survivor}/_aknn_search?k1=50&k2=5")
        assert res["hits"]["total"] == 5
        # no purged id may reappear as a neighbor
        assert not set(h["_id"] for h in res["hits"]["hits"]) & set(doomed)
        # idempotent: the same bulk request now deletes nothing
        assert _http_post(srv.port, "/_aknn_delete", {"_index": "idx", "ids": doomed})["deleted"] == 0
    finally:
        srv.stop()


def test_http_torn_marker_503_and_drop_recovers(spark):
    """r12 (ADVICE r11): a surviving dirty marker (crash mid-mutation) must
    turn every serving and mutating request into a DETECTED 503, not
    silently-served recall loss; DELETE /{index} is the recovery path —
    it drops data + marker and a re-index serves again. Both modes."""
    docs = _sample_docs(spark, n=32)
    for store_backed in (False, True):
        srv = _serve(spark, docs, store_backed=store_backed)
        try:
            qid = docs[0]["_id"]
            assert _http_get(srv.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")["hits"]["total"] == 5
            # simulate the crash: marker on disk, snapshot caches gone
            # (every real mutation pops them before the marker could stay)
            open(srv._dirty_marker("idx"), "w").close()
            srv._docs_cache.clear()
            srv._terms_cache.clear()
            for req in (
                lambda: _http_get(srv.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5"),
                lambda: _post_raw(srv.port, "/_aknn_index", {"model": "m", "_index": "idx", "docs": docs[:4]}),
                lambda: _delete_raw(srv.port, f"/idx/{qid}"),
            ):
                try:
                    req()
                    raise AssertionError("expected 503 on a torn index")
                except urllib.error.HTTPError as e:
                    assert e.code == 503, e.code
                    assert "TornIndexError" in _json.loads(e.read())["error"]
            # recovery: drop the index (works WHILE torn), then re-index
            assert _json.loads(_delete_raw(srv.port, "/idx").read())["acknowledged"]
            _http_post(srv.port, "/_aknn_index", {"model": "m", "_index": "idx", "docs": docs})
            assert _http_get(srv.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")["hits"]["total"] == 5
            # a successful mutation leaves no marker behind
            import os as _os

            assert not _os.path.exists(srv._dirty_marker("idx"))
        finally:
            srv.stop()


def test_http_bulk_ingest_stage_refresh(spark):
    """r12 (#162): refresh=false stages without touching the live store
    (searches keep serving the pre-stage state — ES NRT), /_aknn_refresh
    merges with last-staged-occurrence-of-an-id-wins across batches, the
    merged server equals a fresh immediate-mode twin indexed with the
    final state, and an empty refresh is a no-op. Both modes."""
    docs = _sample_docs(spark, n=96)
    moved = [
        {"_id": d["_id"],
         "_source": {"_aknn_vector": [2.0 * x for x in d["_source"]["_aknn_vector"]]}}
        for d in docs[:16]
    ]
    stale = [
        {"_id": d["_id"],
         "_source": {"_aknn_vector": [3.0 * x for x in d["_source"]["_aknn_vector"]]}}
        for d in docs[:8]
    ]
    final = moved + docs[16:]
    for store_backed in (False, True):
        srv = _serve(spark, docs, store_backed=store_backed, batches=2)
        fresh = _serve(spark, final, store_backed=store_backed, batches=2, sample=docs[:24])
        try:
            qid = docs[0]["_id"]
            before = _http_get(srv.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
            # stage two batches: the stale versions first, the real moved
            # versions second — refresh must apply the LATER batch
            for batch in (stale, moved):
                out = _http_post(
                    srv.port,
                    "/_aknn_index",
                    {"model": "m", "_index": "idx", "docs": batch, "refresh": False},
                )
                assert out["staged"] == len(batch), out
            # staged batches are invisible until refresh (ES NRT)
            assert _http_get(srv.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5") == before
            out = _http_post(srv.port, "/_aknn_refresh", {"_index": "idx"})
            assert out["merged"] == len(moved), out
            for q in (docs[0]["_id"], docs[5]["_id"], docs[40]["_id"]):
                a = _http_get(srv.port, f"/idx/{q}/_aknn_search?k1=50&k2=5")
                b = _http_get(fresh.port, f"/idx/{q}/_aknn_search?k1=50&k2=5")
                assert a == b, (store_backed, q, a, b)
            # nothing staged -> refresh is a cheap no-op
            assert _http_post(srv.port, "/_aknn_refresh", {"_index": "idx"})["merged"] == 0
        finally:
            srv.stop()
            fresh.stop()


def test_http_bulk_staging_survives_restart_and_drop_clears_it(spark):
    """r12 (#162): staged batches live on disk with their batch_seq, so a
    NEW server over the same root re-derives the sequence (later staged
    batches still win) and can refresh work staged before the restart;
    DELETE /{index} clears staging too. Also: an index that exists ONLY
    as staging pins the _id type for later staged batches."""
    import tempfile as _tempfile

    docs = _sample_docs(spark, n=48)
    moved = [
        {"_id": d["_id"],
         "_source": {"_aknn_vector": [2.0 * x for x in d["_source"]["_aknn_vector"]]}}
        for d in docs[:8]
    ]
    root = _tempfile.mkdtemp(prefix="enn_http_test_")
    srv = AknnHttpServer(spark, root, store_backed=True).start()
    try:
        _http_post(srv.port, "/_aknn_create",
                   {"_id": "m", "nb_tables": 4, "nb_bits_per_table": 3, "docs": docs[:24]})
        _http_post(srv.port, "/_aknn_index",
                   {"model": "m", "_index": "idx", "docs": docs, "refresh": False})
        # staged-only index pins the id type: a string-id staged batch 400s
        try:
            _post_raw(srv.port, "/_aknn_index",
                      {"model": "m", "_index": "idx", "refresh": False,
                       "docs": [{"_id": "s-0", "_source": docs[0]["_source"]}]})
            raise AssertionError("expected 400 for string ids on bigint-staged index")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()
    srv2 = AknnHttpServer(spark, root, store_backed=True).start()
    fresh = _serve(spark, moved + docs[8:], store_backed=True, sample=docs[:24])
    try:
        # staged AFTER the restart, must still sort after the first batch
        _http_post(srv2.port, "/_aknn_index",
                   {"model": "m", "_index": "idx", "docs": moved, "refresh": False})
        assert _http_post(srv2.port, "/_aknn_refresh", {"_index": "idx"})["merged"] == len(docs)
        for q in (docs[0]["_id"], docs[20]["_id"]):
            a = _http_get(srv2.port, f"/idx/{q}/_aknn_search?k1=50&k2=5")
            b = _http_get(fresh.port, f"/idx/{q}/_aknn_search?k1=50&k2=5")
            assert a == b, (q, a, b)
        # drop clears staging alongside data + marker
        _http_post(srv2.port, "/_aknn_index",
                   {"model": "m", "_index": "idx", "docs": docs[:4], "refresh": False})
        assert _json.loads(_delete_raw(srv2.port, "/idx").read())["acknowledged"]
        assert _http_post(srv2.port, "/_aknn_refresh", {"_index": "idx"})["merged"] == 0
    finally:
        srv2.stop()
        fresh.stop()


def test_http_concurrent_searches_during_mutations(spark):
    """r12 (r11 verdict stretch 8): the ThreadingHTTPServer + shared
    SparkSession serving claim under an actual race — search GETs fired
    continuously from several threads WHILE the main thread replaces and
    deletes docs. Every response must be a well-formed 200 equal to either
    the pre- or post-mutation state (the RLock serializes Spark work), and
    the store must end exactly at the post-state."""
    import threading as _threading

    docs = _sample_docs(spark, n=64)
    moved = [
        {"_id": d["_id"],
         "_source": {"_aknn_vector": [2.0 * x for x in d["_source"]["_aknn_vector"]]}}
        for d in docs[:8]
    ]
    srv = _serve(spark, docs, store_backed=True, batches=2)
    # twins for the two post-mutation states, built up front so every
    # racing response can be checked against a LINEARIZABLE state:
    # s1 = initial, s2 = after the replace, s3 = after the delete
    mid = _serve(spark, moved + docs[8:], store_backed=True, sample=docs[:24])
    post = _serve(
        spark,
        [d for d in (moved + docs[8:]) if d["_id"] != docs[9]["_id"]],
        store_backed=True,
        sample=docs[:24],
    )
    try:
        qid = docs[40]["_id"]
        states = [_http_get(srv.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")]
        for twin in (mid, post):
            s = _http_get(twin.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
            if s not in states:
                states.append(s)
        results: list = []
        errors: list = []
        stop = _threading.Event()

        def hammer():
            while not stop.is_set():
                try:
                    results.append(
                        _http_get(srv.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
                    )
                except Exception as exc:  # noqa: BLE001 — collected for assert
                    errors.append(exc)

        threads = [_threading.Thread(target=hammer) for _ in range(4)]
        for t in threads:
            t.start()
        try:
            _http_post(srv.port, "/_aknn_index",
                       {"model": "m", "_index": "idx", "docs": moved})
            _http_post(srv.port, "/_aknn_delete",
                       {"_index": "idx", "ids": [docs[9]["_id"]]})
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=120)
        assert not errors, errors[:3]
        assert results, "no concurrent search completed"
        bad = [r for r in results if r not in states]
        assert not bad, ("racing search returned a non-linearizable state", bad[:2])
        # the store settles at exactly the post-state twin
        for q in (docs[0]["_id"], docs[40]["_id"]):
            a = _http_get(srv.port, f"/idx/{q}/_aknn_search?k1=50&k2=5")
            b = _http_get(post.port, f"/idx/{q}/_aknn_search?k1=50&k2=5")
            assert a == b, (q, a, b)
    finally:
        srv.stop()
        mid.stop()
        post.stop()


def test_http_msearch_matches_per_id_both_modes(spark):
    """r13 (the r12 verdict's job-count item): POST /{index}/_aknn_msearch
    must return, per id and in request order, exactly the per-id GET's
    payload — in both serving modes — with unknown and non-numeric ids
    keeping the 200/zero-hits contract inside a batch; and the batched
    store plan must keep literal PartitionFilters on the pruned reads."""
    from elastik_nearest_neighbors_spark import plans

    docs = _sample_docs(spark)
    for mode in (False, True):
        srv = _serve(spark, docs, store_backed=mode, batches=2 if mode else 1)
        try:
            ids = [docs[0]["_id"], 99999999, docs[7]["_id"], "zzz", docs[123]["_id"]]
            out = _http_post(
                srv.port, "/idx/_aknn_msearch", {"ids": ids, "k1": 50, "k2": 5}
            )
            assert len(out["responses"]) == len(ids)
            for d, r in zip(ids, out["responses"]):
                single = _http_get(srv.port, f"/idx/{d}/_aknn_search?k1=50&k2=5")
                assert r == single, (mode, d)
            assert out["responses"][1]["hits"]["total"] == 0
            assert out["responses"][3]["hits"]["total"] == 0
            assert out["responses"][0]["hits"]["total"] > 0
            if mode:
                df = srv._msearch_store("idx", [docs[0]["_id"], docs[7]["_id"]], 50, 5)
                pf = " ".join(plans.partition_filters(df))
                assert "tbl" in pf and "bucket" in pf, plans.formatted_plan(df)
        finally:
            srv.stop()


def test_http_compact_shrinks_files_and_preserves_results(spark):
    """r13 (#163 wire compaction): POST /_aknn_compact must rewrite a
    multi-batch store's docs/ and terms/ into one file per partition
    directory with byte-identical search responses, report compacted:
    False on a flat-mode index (single-overwrite layout already), and
    400 an unknown index."""
    import glob
    import os

    docs = _sample_docs(spark)
    srv = _serve(spark, docs, store_backed=True, batches=5)
    try:
        qids = [docs[0]["_id"], docs[7]["_id"], docs[123]["_id"]]
        before = [
            _http_get(srv.port, f"/idx/{q}/_aknn_search?k1=50&k2=5") for q in qids
        ]

        def max_files(sub):
            dirs = [
                d
                for d, _s, files in os.walk(os.path.join(srv.root, "indexes", "idx", sub))
                if any(f.endswith(".parquet") for f in files)
                for _ in [None]
            ]
            return max(
                len(glob.glob(os.path.join(d, "*.parquet"))) for d in dirs
            )

        assert max_files("terms") > 1  # the appends really did accumulate
        out = _http_post(srv.port, "/_aknn_compact", {"_index": "idx"})
        assert out == {"_index": "idx", "acknowledged": True, "compacted": True}
        assert max_files("terms") == 1
        assert max_files("docs") == 1
        after = [
            _http_get(srv.port, f"/idx/{q}/_aknn_search?k1=50&k2=5") for q in qids
        ]
        assert before == after
        try:
            _http_post(srv.port, "/_aknn_compact", {"_index": "nope"})
            raise AssertionError("unknown index must 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()

    flat = _serve(spark, docs[:60], store_backed=False)
    try:
        out = _http_post(flat.port, "/_aknn_compact", {"_index": "idx"})
        assert out["compacted"] is False
    finally:
        flat.stop()


def test_http_refresh_bulk_merge_path_matches_pruned(spark, monkeypatch):
    """r13 (ADVICE r12): with ENN_REFRESH_BULK_ROWS forced to 1 the
    refresh merge runs the fully distributed whole-store path (no
    driver-side id list) — wire responses must equal a fresh
    immediate-mode twin indexed with the final state, in both modes,
    including replace-of-existing + brand-new ids; and the swapped store
    lands compacted (one file per directory)."""
    import glob
    import os

    docs = _sample_docs(spark, n=96)
    moved = [
        {"_id": d["_id"],
         "_source": {"_aknn_vector": [2.0 * x for x in d["_source"]["_aknn_vector"]]}}
        for d in docs[:16]
    ]
    extra = [
        {"_id": 900000 + i,
         "_source": {"_aknn_vector": d["_source"]["_aknn_vector"]}}
        for i, d in enumerate(docs[:8])
    ]
    final = moved + docs[16:] + extra
    monkeypatch.setenv("ENN_REFRESH_BULK_ROWS", "1")
    for store_backed in (False, True):
        srv = _serve(spark, docs, store_backed=store_backed, batches=2)
        fresh = _serve(spark, final, store_backed=store_backed, batches=2, sample=docs[:24])
        try:
            out = _http_post(
                srv.port,
                "/_aknn_index",
                {"model": "m", "_index": "idx", "docs": moved + extra, "refresh": False},
            )
            assert out["staged"] == len(moved) + len(extra), out
            out = _http_post(srv.port, "/_aknn_refresh", {"_index": "idx"})
            assert out["merged"] == len(moved) + len(extra), out
            for q in (docs[0]["_id"], docs[40]["_id"], extra[0]["_id"]):
                a = _http_get(srv.port, f"/idx/{q}/_aknn_search?k1=50&k2=5")
                b = _http_get(fresh.port, f"/idx/{q}/_aknn_search?k1=50&k2=5")
                assert a == b, (store_backed, q, a, b)
            if store_backed:
                for sub in ("docs", "terms"):
                    base = os.path.join(srv.root, "indexes", "idx", sub)
                    for d, _s, files in os.walk(base):
                        pq = [f for f in files if f.endswith(".parquet")]
                        assert len(pq) <= 1, (sub, d, pq)
        finally:
            srv.stop()
            fresh.stop()


def test_http_doc_get_200_404_both_modes(spark):
    """r13 (#163): GET /{index}/{id} returns the stored doc (found: true,
    exact vector round-trip) and 404s an unknown or non-numeric id, in
    both store modes."""
    docs = _sample_docs(spark, n=48)
    for store_backed in (False, True):
        srv = _serve(spark, docs, store_backed=store_backed)
        try:
            d = docs[7]
            res = _http_get(srv.port, f"/idx/{d['_id']}")
            assert res["found"] is True and res["_id"] == d["_id"]
            assert res["_source"]["_aknn_vector"] == d["_source"]["_aknn_vector"]
            for missing in ("999999", "zzz"):
                try:
                    urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/idx/{missing}")
                    raise AssertionError("unknown id must 404")
                except urllib.error.HTTPError as e:
                    assert e.code == 404
                    assert _json.loads(e.read())["found"] is False
        finally:
            srv.stop()


def test_http_concurrent_mutations_on_different_indexes(spark):
    """r13 (r12 verdict stretch 7): concurrent mutations on DIFFERENT
    indexes — the `_mutating` set, staging-seq dict, and snapshot caches
    are shared state keyed by index name. Two threads replace/delete on
    their own index while searches hammer both; every response must be
    well-formed and each index must end exactly at its own fresh-twin
    state (no cross-index bleed)."""
    import threading as _threading

    docs = _sample_docs(spark, n=48)
    srv = AknnHttpServer(
        spark, tempfile.mkdtemp(prefix="enn_http_test_"), store_backed=True
    ).start()
    _http_post(srv.port, "/_aknn_create",
               {"_id": "m", "nb_tables": 4, "nb_bits_per_table": 3, "docs": docs[:24]})
    for idx in ("ia", "ib"):
        _http_post(srv.port, "/_aknn_index", {"model": "m", "_index": idx, "docs": docs})
    moved = [
        {"_id": d["_id"],
         "_source": {"_aknn_vector": [2.0 * x for x in d["_source"]["_aknn_vector"]]}}
        for d in docs[:6]
    ]
    doomed_a, doomed_b = docs[9]["_id"], docs[11]["_id"]
    twin_a = _serve(spark, [d for d in (moved + docs[6:]) if d["_id"] != doomed_a],
                    store_backed=True, sample=docs[:24])
    twin_b = _serve(spark, [d for d in (moved + docs[6:]) if d["_id"] != doomed_b],
                    store_backed=True, sample=docs[:24])
    errors: list = []

    def mutate(idx, doomed):
        try:
            _http_post(srv.port, "/_aknn_index", {"model": "m", "_index": idx, "docs": moved})
            _http_post(srv.port, "/_aknn_delete", {"_index": idx, "ids": [doomed]})
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    try:
        ta = _threading.Thread(target=mutate, args=("ia", doomed_a))
        tb = _threading.Thread(target=mutate, args=("ib", doomed_b))
        ta.start(); tb.start(); ta.join(); tb.join()
        assert not errors, errors
        qid = docs[40]["_id"]
        for idx, twin in (("ia", twin_a), ("ib", twin_b)):
            a = _http_get(srv.port, f"/{idx}/{qid}/_aknn_search?k1=50&k2=5")
            b = _http_get(twin.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
            assert a == b, (idx, a, b)
    finally:
        srv.stop(); twin_a.stop(); twin_b.stop()


def test_http_refresh_racing_bulk_stage(spark):
    """r13 (r12 verdict stretch 7): a /_aknn_refresh racing a refresh=false
    stage on the SAME index must linearize — the staged batch lands either
    in that refresh or in the next one, never lost or torn. After the
    final refresh the index equals the fresh twin of all docs."""
    import threading as _threading

    docs = _sample_docs(spark, n=48)
    srv = _serve(spark, docs[:24], store_backed=True)
    twin = _serve(spark, docs, store_backed=True, sample=docs[:24])
    errors: list = []

    def stage(batch):
        try:
            _http_post(srv.port, "/_aknn_index",
                       {"model": "m", "_index": "idx", "docs": batch, "refresh": False})
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def refresh():
        try:
            _http_post(srv.port, "/_aknn_refresh", {"_index": "idx"})
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    try:
        threads = [
            _threading.Thread(target=stage, args=(docs[24:36],)),
            _threading.Thread(target=refresh),
            _threading.Thread(target=stage, args=(docs[36:],)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        _http_post(srv.port, "/_aknn_refresh", {"_index": "idx"})  # drain stragglers
        qid = docs[30]["_id"]
        a = _http_get(srv.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
        b = _http_get(twin.port, f"/idx/{qid}/_aknn_search?k1=50&k2=5")
        assert a == b, (a, b)
    finally:
        srv.stop(); twin.stop()
