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
