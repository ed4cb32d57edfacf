"""BlackLab Server analog (server.py): HTTP endpoints mirroring the
reference's URL surface (SURVEY.md §3.2; wslib WebserviceRequestHandler)
plus the BlsCache-analog SearchCache (dedupe + LRU + max-age,
doc/technical/blacklab-internals.md:163-193)."""

import json
import threading
import urllib.request

import pytest

from blacklab_spark import bcql


@pytest.fixture(scope="module")
def srv(spark, tiny_index):
    from blacklab_spark.server import BlackLabServer

    s = BlackLabServer({"tiny": tiny_index}, port=0).start()
    yield s
    s.stop()


def get(srv, path):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}{path}", timeout=120
        ) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_server_info(srv):
    st, body = get(srv, "/blacklab-server")
    assert st == 200
    assert body["indices"]["tiny"]["documentCount"] == 6


def test_corpus_info(srv):
    st, body = get(srv, "/blacklab-server/tiny")
    assert st == 200
    assert body["documentCount"] == 6
    assert "word" in body["annotatedFields"]["contents"]["annotations"]
    assert "url" in body["metadataFields"]


def test_hits_window_and_docinfos(srv, tiny_index):
    st, body = get(srv, '/blacklab-server/tiny/hits?patt=%22the%22&number=2')
    assert st == 200
    want_total = bcql.find(tiny_index, '"the"').count()
    s = body["summary"]
    assert s["numberOfHits"] == want_total
    assert s["actualWindowSize"] == 2 and s["windowHasNext"] is (want_total > 2)
    assert len(body["hits"]) == 2
    h0 = body["hits"][0]
    assert [w.lower() for w in h0["match"]["word"]] == ["the"]
    assert h0["docPid"] in body["docInfos"]
    assert body["docInfos"][h0["docPid"]]["lengthInTokens"] > 0


def test_hits_sorted_by_right_context(srv):
    st, body = get(
        srv, '/blacklab-server/tiny/hits?patt=%22the%22&sort=right&number=50'
    )
    assert st == 200
    rights = [" ".join(h["right"]["word"]) for h in body["hits"]]
    assert rights == sorted(rights)


def test_hits_grouped_by_match(srv, tiny_index):
    st, body = get(
        srv,
        '/blacklab-server/tiny/hits?patt=%5B%5D&group=hit&number=5',
    )  # patt=[]
    assert st == 200
    groups = body["hitGroups"]
    assert groups and body["summary"]["numberOfGroups"] >= len(groups)
    # sorted by size desc
    sizes = [g["size"] for g in groups]
    assert sizes == sorted(sizes, reverse=True)
    total = bcql.find(tiny_index, "[]").count()
    assert sum(g["size"] for g in groups) <= total


def test_hits_capture_groups_in_response(srv):
    st, body = get(
        srv, '/blacklab-server/tiny/hits?patt=A%3A%22the%22%20%22quick%22'
    )  # A:"the" "quick"
    assert st == 200
    assert body["hits"]
    for h in body["hits"]:
        assert h["captureGroups"]["A"]["end"] - h["captureGroups"]["A"]["start"] == 1


def test_docs_endpoint(srv, tiny_index):
    st, body = get(srv, '/blacklab-server/tiny/docs?patt=%22the%22')
    assert st == 200
    want = {
        str(r["doc_id"]): r["n_hits"]
        for r in bcql.find(tiny_index, '"the"')
        .groupBy("doc_id").count().withColumnRenamed("count", "n_hits")
        .collect()
    }
    got = {d["docPid"]: d["numberOfHits"] for d in body["docs"]}
    assert got == want


def test_doc_info_and_contents(srv):
    st, body = get(srv, "/blacklab-server/tiny/docs/0?contents=true")
    assert st == 200
    assert body["docPid"] == "0"
    assert body["docInfo"]["lengthInTokens"] > 0
    assert isinstance(body["contents"], str) and body["contents"]


def test_termfreq(srv, tiny_index):
    st, body = get(srv, "/blacklab-server/tiny/termfreq?number=5")
    assert st == 200
    tf = body["termFreq"]
    assert len(tf) == 5
    want = {
        r["term"]: r["cf"]
        for r in tiny_index.term_freqs().orderBy("term").collect()
    }
    for t, cf in tf.items():
        assert want[t] == cf


def test_metadata_filter(srv, tiny_index):
    st, body = get(
        srv,
        "/blacklab-server/tiny/hits?patt=%22the%22&filter=doc_id%20%3C%202",
    )
    assert st == 200
    assert all(int(h["docPid"]) < 2 for h in body["hits"])


def test_errors(srv):
    st, body = get(srv, "/blacklab-server/nope/hits?patt=%22x%22")
    assert st == 404
    st, body = get(srv, "/blacklab-server/tiny/hits")  # missing patt
    assert st == 400
    st, body = get(srv, "/blacklab-server/tiny/hits?patt=%22the%22&sort=bogus")
    assert st == 400


def test_cache_hit_and_info(srv):
    # unique param set -> first call misses, second hits
    path = '/blacklab-server/tiny/hits?patt=%22quick%22&number=3'
    get(srv, "/blacklab-server/cache-clear")
    _, info0 = get(srv, "/blacklab-server/cache-info")
    _, a = get(srv, path)
    _, info1 = get(srv, "/blacklab-server/cache-info")
    _, b = get(srv, path)
    _, info2 = get(srv, "/blacklab-server/cache-info")
    assert a["hits"] == b["hits"] and a["summary"]["numberOfHits"] == b["summary"]["numberOfHits"]
    assert info1["misses"] == info0["misses"] + 1
    assert info2["hits"] == info1["hits"] + 1
    assert info2["numberOfSearches"] >= 1


def test_cache_dedupes_inflight(spark, tiny_index):
    """BlsCache semantics: identical concurrent searches share ONE
    execution."""
    from blacklab_spark.server import SearchCache

    cache = SearchCache()
    calls = []
    gate = threading.Event()

    def compute():
        calls.append(1)
        gate.wait(5)
        return {"n": 42}

    out = [None, None]

    def worker(i):
        out[i] = cache.get_or_compute(("k",), compute)

    t1 = threading.Thread(target=worker, args=(0,))
    t2 = threading.Thread(target=worker, args=(1,))
    t1.start(); t2.start()
    gate.set()
    t1.join(10); t2.join(10)
    assert out[0] == out[1] == {"n": 42}
    assert len(calls) == 1
    assert cache.hits == 1 and cache.misses == 1


def test_cache_lru_eviction():
    from blacklab_spark.server import SearchCache

    cache = SearchCache(max_entries=2)
    for i in range(4):
        cache.get_or_compute((i,), lambda i=i: {"i": i})
    assert len(cache._entries) == 2
    # oldest evicted: recomputing key 0 is a miss again
    m0 = cache.misses
    cache.get_or_compute((0,), lambda: {"i": 0})
    assert cache.misses == m0 + 1
