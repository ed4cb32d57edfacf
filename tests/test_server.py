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


# ---------------------------------------------------------------------------
# round-5 endpoint surface: autocomplete / fields / parse-pattern / relations
# / snippet / input-formats / status / colloc / docs-grouped / csv
# ---------------------------------------------------------------------------


def get_raw(srv, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}{path}", timeout=120
    ) as r:
        return r.status, r.headers.get("Content-Type"), r.read().decode()


def test_autocomplete_annotation(srv, tiny_index):
    st, terms = get(srv, "/blacklab-server/tiny/autocomplete/contents/word?term=th")
    assert st == 200
    assert isinstance(terms, list) and terms
    assert all(t.startswith("th") for t in terms)
    assert terms == sorted(terms) and len(terms) <= 30
    # parity with the dictionary: every folded dict term with the prefix
    from pyspark.sql import functions as F

    want = {
        r["term_fold"]
        for r in tiny_index.terms_df.filter(
            (F.col("annot") == "word") & F.col("term_fold").startswith("th")
        ).collect()
    }
    assert set(terms) == set(sorted(want)[:30])


def test_autocomplete_metadata_and_errors(srv):
    st, vals = get(srv, "/blacklab-server/tiny/autocomplete/lang?term=e")
    assert st == 200 and all(v.startswith("e") for v in vals)
    # annotated field without annotation -> 400 (reference BadRequest)
    st, _ = get(srv, "/blacklab-server/tiny/autocomplete/contents?term=th")
    assert st == 400
    # missing term param -> 400
    st, _ = get(srv, "/blacklab-server/tiny/autocomplete/lang")
    assert st == 400
    st, _ = get(srv, "/blacklab-server/tiny/autocomplete/nosuchfield?term=x")
    assert st == 404


def test_field_info_metadata(srv, tiny_index):
    st, body = get(srv, "/blacklab-server/tiny/fields/lang")
    assert st == 200
    assert body["isAnnotatedField"] is False
    assert body["valueListComplete"] is True
    assert sum(body["fieldValues"].values()) == tiny_index.n_docs


def test_field_info_annotated_and_missing(srv, tiny_index):
    st, body = get(srv, "/blacklab-server/tiny/fields/contents")
    assert st == 200 and body["isAnnotatedField"] is True
    assert set(body["annotations"]) == set(tiny_index.annotations)
    st, _ = get(srv, "/blacklab-server/tiny/fields/nosuch")
    assert st == 404


def test_parse_pattern(srv):
    st, body = get(srv, "/blacklab-server/parse-pattern?patt=%22the%22%20%5Bpos%3D%22N.%2A%22%5D")
    assert st == 200
    assert body["params"]["pattlang"] == "bcql"
    assert "json" in body["parsed"] and "bcql" in body["parsed"]
    # the serialized CQL reparses to the same IR (reference parse-pattern
    # round-trip property)
    tp = bcql.parse(body["parsed"]["bcql"])
    # normalize through json (tuples -> lists) like the HTTP layer did
    assert json.loads(json.dumps(bcql.to_dict(tp), default=str)) == body["parsed"]["json"]
    # unparseable pattern -> error entry, not a 500
    st, body = get(srv, "/blacklab-server/parse-pattern?patt=%22unclosed")
    assert st == 200 and "error" in body["parsed"]


def test_relations_endpoint(srv):
    st, body = get(srv, "/blacklab-server/tiny/relations")
    assert st == 200
    assert "relations" in body and isinstance(body["relations"], dict)


def test_doc_snippet(srv, tiny_index):
    row = tiny_index.docs.select("doc_id", "tokens").limit(1).collect()[0]
    pid = str(row["doc_id"])
    st, body = get(
        srv,
        f"/blacklab-server/tiny/docs/{pid}/snippet?hitstart=1&hitend=2&wordsaroundhit=1",
    )
    assert st == 200
    assert body["match"]["word"] == [row["tokens"][1]]
    assert body["left"]["word"] == [row["tokens"][0]]
    # wordstart/wordend form: the range is the match, no context
    st, body = get(
        srv, f"/blacklab-server/tiny/docs/{pid}/snippet?wordstart=0&wordend=2"
    )
    assert st == 200
    assert body["match"]["word"] == list(row["tokens"][:2])
    assert body["left"]["word"] == []
    st, _ = get(srv, f"/blacklab-server/tiny/docs/{pid}/snippet")
    assert st == 400


def test_input_formats(srv):
    st, body = get(srv, "/blacklab-server/input-formats")
    assert st == 200
    fmts = body["supportedInputFormats"]
    for name in ("conllu", "folia", "sketch-wpl", "tsv", "chat", "parquet"):
        assert name in fmts and fmts[name]["description"]


def test_corpus_status(srv, tiny_index):
    st, body = get(srv, "/blacklab-server/tiny/status")
    assert st == 200
    assert body["status"] == "available"
    assert body["documentCount"] == tiny_index.n_docs
    assert body["tokenCount"] == tiny_index.sum_dl


def test_hits_collocations(srv, tiny_index):
    from blacklab_spark import results

    st, body = get(
        srv,
        '/blacklab-server/tiny/hits?patt=%22the%22&calc=colloc&wordsaroundhit=2&number=5',
    )
    assert st == 200
    tf = body["tokenFrequencies"]
    assert tf and len(tf) <= 5
    hits = bcql.find(tiny_index, '"the"')
    want = {
        r["term"]: r["n"]
        for r in results.collocations(tiny_index, hits, context=2).collect()
    }
    for term, n in tf.items():
        assert want[term] == n
    assert list(tf.values()) == sorted(tf.values(), reverse=True)


def test_docs_grouped_by_field(srv, tiny_index):
    st, body = get(
        srv, "/blacklab-server/tiny/docs?patt=%22the%22&group=field:lang"
    )
    assert st == 200
    groups = body["docGroups"]
    assert groups and body["summary"]["numberOfGroups"] == len(groups)
    from blacklab_spark import results

    hits = bcql.find(tiny_index, '"the"')
    want_docs = results.doc_results(hits).count()
    assert sum(g["size"] for g in groups) == want_docs
    st, _ = get(srv, "/blacklab-server/tiny/docs?patt=%22the%22&group=bogus")
    assert st == 400


def test_hits_csv_output(srv):
    st, ctype, text = get_raw(
        srv, '/blacklab-server/tiny/hits?patt=%22the%22&number=3&outputformat=csv'
    )
    assert st == 200 and ctype == "text/csv"
    lines = text.strip().split("\n")
    assert lines[0] == "docPid,start,end,left_context,match,right_context"
    assert len(lines) == 4
    assert all(line.split(",")[4].lower().find("the") >= 0 for line in lines[1:])


def test_docs_csv_output(srv):
    st, ctype, text = get_raw(
        srv, '/blacklab-server/tiny/docs?patt=%22the%22&outputformat=csv'
    )
    assert st == 200 and ctype == "text/csv"
    assert text.startswith("docPid,numberOfHits\n")


# ---------------------------------------------------------------------------
# index management: create / add-to-index / delete (user corpora)
# ---------------------------------------------------------------------------


def req(srv, method, path, body=None):
    r = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=body, method=method
    )
    try:
        with urllib.request.urlopen(r, timeout=300) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def wsrv(spark, tmp_path):
    from blacklab_spark.server import BlackLabServer

    s = BlackLabServer({}, port=0, writable_root=str(tmp_path), spark=spark).start()
    yield s
    s.stop()


def jsonl(docs):
    return "\n".join(json.dumps(d) for d in docs).encode()


def test_create_add_query_lifecycle(wsrv):
    st, body = req(wsrv, "POST", "/blacklab-server?name=mine")
    assert st == 201 and body["status"] == "SUCCESS"
    # empty corpus: listed, status empty, queries rejected with 400
    st, info = req(wsrv, "GET", "/blacklab-server")
    assert info["indices"]["mine"]["status"] == "empty"
    st, stat = req(wsrv, "GET", "/blacklab-server/mine/status")
    assert st == 200 and stat["documentCount"] == 0
    st, _ = req(wsrv, "GET", "/blacklab-server/mine/hits?patt=%22the%22")
    assert st == 400
    # add 3 documents
    st, body = req(wsrv, "POST", "/blacklab-server/mine/docs", jsonl([
        {"url": "u1", "text": "the quick brown fox", "lang": "en"},
        {"url": "u2", "text": "the lazy dog sleeps"},
        {"text": "no url document the end"},
    ]))
    assert st == 200 and body["documentsAdded"] == 3
    st, hits = req(wsrv, "GET", "/blacklab-server/mine/hits?patt=%22the%22&number=10")
    assert st == 200 and hits["summary"]["numberOfHits"] == 3
    # incremental add -> new delta segment, cache invalidated, counts grow
    st, body = req(wsrv, "POST", "/blacklab-server/mine/docs", jsonl([
        {"url": "u4", "text": "the fourth document"},
    ]))
    assert st == 200
    st, hits = req(wsrv, "GET", "/blacklab-server/mine/hits?patt=%22the%22&number=10")
    assert hits["summary"]["numberOfHits"] == 4
    st, info = req(wsrv, "GET", "/blacklab-server/mine")
    assert info["documentCount"] == 4
    # doc ids continue across segments: all 4 docs distinct
    assert len({h["docPid"] for h in hits["hits"]}) == 4


def test_delete_corpus(wsrv):
    req(wsrv, "POST", "/blacklab-server?name=gone")
    req(wsrv, "POST", "/blacklab-server/gone/docs", jsonl([{"text": "bye world"}]))
    st, _ = req(wsrv, "DELETE", "/blacklab-server/gone")
    assert st == 200
    st, _ = req(wsrv, "GET", "/blacklab-server/gone")
    assert st == 404


def test_management_validation(wsrv):
    st, _ = req(wsrv, "POST", "/blacklab-server")  # no name
    assert st == 400
    st, _ = req(wsrv, "POST", "/blacklab-server?name=../evil")
    assert st == 400
    req(wsrv, "POST", "/blacklab-server?name=dup")
    st, _ = req(wsrv, "POST", "/blacklab-server?name=dup")
    assert st == 400
    st, _ = req(wsrv, "POST", "/blacklab-server/dup/docs", b"not json\n")
    assert st == 400
    st, _ = req(wsrv, "POST", "/blacklab-server/dup/docs", jsonl([{"lang": "en"}]))
    assert st == 400  # missing text
    st, _ = req(wsrv, "POST", "/blacklab-server/nosuch/docs", jsonl([{"text": "x"}]))
    assert st == 404


def test_management_disabled_on_readonly_server(srv):
    st, body = req(srv, "POST", "/blacklab-server?name=nope")
    assert st == 403
    st, _ = req(srv, "DELETE", "/blacklab-server/tiny")
    assert st == 403


def test_hits_viewgroup(srv, tiny_index):
    """group= + viewgroup= returns the hits INSIDE one group; sizes agree
    with the grouped response and every hit's match text is the identity."""
    st, grouped = get(srv, '/blacklab-server/tiny/hits?patt=%5B%5D&group=hit&number=3')
    assert st == 200 and grouped["hitGroups"]
    g0 = grouped["hitGroups"][0]
    from urllib.parse import quote

    st, body = get(
        srv,
        f'/blacklab-server/tiny/hits?patt=%5B%5D&group=hit'
        f'&viewgroup={quote(g0["identity"])}&number=100',
    )
    assert st == 200
    assert body["summary"]["numberOfHits"] == g0["size"]
    for h in body["hits"]:
        assert " ".join(w.lower() for w in h["match"]["word"]) == g0["identity"]
    # metadata-field group view
    st, body = get(
        srv,
        '/blacklab-server/tiny/hits?patt=%22the%22&group=field:lang&viewgroup=en&number=100',
    )
    assert st == 200
    docs_en = {
        str(r["doc_id"])
        for r in tiny_index.docs.filter("lang = 'en'").select("doc_id").collect()
    }
    assert body["hits"] and all(h["docPid"] in docs_en for h in body["hits"])


def test_hitfiltercrit_hitfilterval(srv, tiny_index):
    """BLS hit-property filter: keep only hits whose property equals the
    given value — here, hits of "the" whose RIGHT neighbor is 'quick'."""
    st, body = get(
        srv,
        '/blacklab-server/tiny/hits?patt=%22the%22'
        '&hitfiltercrit=wordright&hitfilterval=quick&number=50',
    )
    assert st == 200 and body["hits"]
    for h in body["hits"]:
        assert h["right"]["word"][0].lower() == "quick"
    want = bcql.find(tiny_index, '"the" "quick"').count()
    assert body["summary"]["numberOfHits"] == want


def test_waitfortotal_false_async_count(srv, tiny_index):
    """BLS async counting: waitfortotal=false returns the window right away
    (stillCounting may be true); polling converges to the exact total; the
    default (wait) behavior is unchanged."""
    import time as _t

    path = (
        '/blacklab-server/tiny/hits?patt=%22aap%22&number=3&waitfortotal=false'
    )
    get(srv, "/blacklab-server/cache-clear")
    st, body = get(srv, path)
    assert st == 200 and len(body["hits"]) == 3
    assert body["summary"]["stillCounting"] in (True, False)
    want = bcql.find(tiny_index, '"aap"').count()
    deadline = _t.time() + 60
    while body["summary"]["stillCounting"] and _t.time() < deadline:
        _t.sleep(0.3)
        st, body = get(srv, path)
    assert body["summary"]["stillCounting"] is False
    assert body["summary"]["numberOfHits"] == want
    # sync default still exact on first response
    st, body = get(srv, '/blacklab-server/tiny/hits?patt=%22aap%22&number=3')
    assert body["summary"]["stillCounting"] is False
    assert body["summary"]["numberOfHits"] == want


def test_unknown_capture_group_is_400(srv):
    st, _ = get(srv, '/blacklab-server/tiny/hits?patt=%22the%22&group=capture:NOPE')
    assert st == 400
    st, _ = get(
        srv,
        '/blacklab-server/tiny/hits?patt=%22the%22&group=hit&viewgroup=x'
        '&hitfiltercrit=capture:NOPE&hitfilterval=x',
    )
    assert st == 400


def test_group_sort_identity_and_inverted_size(srv):
    # sort=identity: ascending group key (reference HitGroupPropertyIdentity
    # default); -identity inverts
    st, body = get(
        srv, '/blacklab-server/tiny/hits?patt=%5B%5D&group=hit&sort=identity&number=10'
    )
    assert st == 200
    idents = [g["identity"] for g in body["hitGroups"]]
    assert idents == sorted(idents)
    st, body = get(
        srv, '/blacklab-server/tiny/hits?patt=%5B%5D&group=hit&sort=-identity&number=10'
    )
    assert st == 200
    assert [g["identity"] for g in body["hitGroups"]] == sorted(
        [g["identity"] for g in body["hitGroups"]], reverse=True
    )
    # sort=size descending by default (HitGroupPropertySize
    # sortDescendingByDefault=true); -size inverts to ascending
    st, body = get(
        srv, '/blacklab-server/tiny/hits?patt=%5B%5D&group=hit&sort=-size&number=10'
    )
    assert st == 200
    sizes = [g["size"] for g in body["hitGroups"]]
    assert sizes == sorted(sizes)
    st, _ = get(
        srv, '/blacklab-server/tiny/hits?patt=%5B%5D&group=hit&sort=bogus'
    )
    assert st == 400


def test_docs_sort_by_field_and_pid(srv, tiny_index):
    st, body = get(
        srv, '/blacklab-server/tiny/docs?patt=%22the%22&sort=field:url&number=50'
    )
    assert st == 200
    urls = [d["docInfo"]["pid"] for d in body["docs"]]
    assert urls == sorted(urls)
    st, body = get(
        srv, '/blacklab-server/tiny/docs?patt=%22the%22&sort=-field:url&number=50'
    )
    assert st == 200
    urls = [d["docInfo"]["pid"] for d in body["docs"]]
    assert urls == sorted(urls, reverse=True)
    st, body = get(srv, '/blacklab-server/tiny/docs?sort=-pid&number=50')
    assert st == 200
    pids = [int(d["docPid"]) for d in body["docs"]]
    assert pids == sorted(pids, reverse=True)
    st, _ = get(srv, '/blacklab-server/tiny/docs?sort=field:nope')
    assert st == 400
    st, _ = get(srv, '/blacklab-server/tiny/docs?sort=bogus')
    assert st == 400


def test_termfreq_filtered(srv, tiny_index):
    # a filter matching every doc must reproduce the dictionary-backed stats
    st, body = get(
        srv,
        "/blacklab-server/tiny/termfreq?number=1000&sensitive=true"
        "&filter=doc_id%20%3E%3D%200",
    )
    assert st == 200
    want = {
        r["term"]: r["cf"]
        for r in tiny_index.term_freqs(fold=False).collect()
    }
    assert body["termFreq"] == {
        t: c for t, c in sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    }
    # a restricting filter: recompute directly over the forward index
    st, body = get(
        srv,
        "/blacklab-server/tiny/termfreq?number=1000&sensitive=true"
        "&filter=doc_id%20%3C%202",
    )
    assert st == 200
    import pyspark.sql.functions as F

    want = {
        r["term"]: r["cf"]
        for r in tiny_index.docs.filter("doc_id < 2")
        .select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
        .collect()
    }
    assert body["termFreq"] == want


def test_termfreq_filtered_folded_lemma(spark, tiny_index_annot):
    """Folded non-word layers map each token through the dictionary fold."""
    from blacklab_spark import server as bls

    body = bls.op_termfreq(
        tiny_index_annot,
        {"filter": "doc_id >= 0", "annotation": "lemma", "number": "1000"},
    )
    want = {
        r["term"]: r["cf"]
        for r in tiny_index_annot.term_freqs(fold=True, annot="lemma").collect()
    }
    assert body["termFreq"] == want


FMT_YAML = b"""
displayName: Test letters
baseFormat: xml-config
documentPath: letter
inlineTags: [p, s]
metadata:
  lang: language
"""

LETTERS_XML = (
    "<letters>"
    "<letter><language>nl</language><p>the quick brown fox</p></letter>"
    "<letter><language>en</language><p>jumps over the lazy dog</p></letter>"
    "</letters>"
).encode()


def test_add_format_validation(wsrv):
    st, _ = req(wsrv, "POST", "/blacklab-server/input-formats/bad%20name", FMT_YAML)
    assert st == 400
    st, _ = req(wsrv, "POST", "/blacklab-server/input-formats/jsonl", FMT_YAML)
    assert st == 400  # built-in names are reserved
    st, _ = req(wsrv, "POST", "/blacklab-server/input-formats/f1", b"[not: a: mapping")
    assert st == 400  # YAML syntax error
    st, _ = req(wsrv, "POST", "/blacklab-server/input-formats/f1", b"- just\n- a list\n")
    assert st == 400  # not a mapping
    st, _ = req(
        wsrv, "POST", "/blacklab-server/input-formats/f1",
        b"documentPath: '//xpath/selector'\n",
    )
    assert st == 400  # xml-config base takes plain tag names only
    st, _ = req(
        wsrv, "POST", "/blacklab-server/input-formats/f1",
        b"metadata: {author: creator}\n",
    )
    assert st == 400  # unrepresentable metadata target


def test_add_format_list_detail_delete(wsrv):
    st, body = req(wsrv, "POST", "/blacklab-server/input-formats/letters", FMT_YAML)
    assert st == 201 and body["status"] == "SUCCESS"
    st, body = req(wsrv, "GET", "/blacklab-server/input-formats")
    fmts = body["supportedInputFormats"]
    assert "letters" in fmts and fmts["letters"]["configurationBased"] is True
    assert fmts["letters"]["displayName"] == "Test letters"
    st, body = req(wsrv, "GET", "/blacklab-server/input-formats/letters")
    assert st == 200 and body["configFile"]["documentPath"] == "letter"
    # built-in detail still resolves; unknown 404s
    st, body = req(wsrv, "GET", "/blacklab-server/input-formats/jsonl")
    assert st == 200 and body["configurationBased"] is False
    st, _ = req(wsrv, "GET", "/blacklab-server/input-formats/nope")
    assert st == 404
    # delete: builtin forbidden, user format gone afterwards
    st, _ = req(wsrv, "DELETE", "/blacklab-server/input-formats/jsonl")
    assert st == 403
    st, _ = req(wsrv, "DELETE", "/blacklab-server/input-formats/letters")
    assert st == 200
    st, body = req(wsrv, "GET", "/blacklab-server/input-formats")
    assert "letters" not in body["supportedInputFormats"]
    st, _ = req(wsrv, "DELETE", "/blacklab-server/input-formats/letters")
    assert st == 404


def test_add_to_index_with_user_format(wsrv):
    req(wsrv, "POST", "/blacklab-server/input-formats/letters", FMT_YAML)
    req(wsrv, "POST", "/blacklab-server?name=mail")
    st, body = req(wsrv, "POST", "/blacklab-server/mail/docs?format=letters", LETTERS_XML)
    assert st == 200 and body["documentsAdded"] == 2
    # the format's documentPath split the body; metadata lang came from <language>
    st, body = req(wsrv, "GET", "/blacklab-server/mail/docs")
    assert st == 200 and len(body["docs"]) == 2
    langs = sorted(d["docInfo"]["lang"] for d in body["docs"])
    assert langs == ["en", "nl"]
    # hits across both docs; config'd inline tag <p> is queryable
    st, body = req(wsrv, "GET", '/blacklab-server/mail/hits?patt=%22the%22')
    assert st == 200 and body["summary"]["numberOfHits"] == 2
    st, body = req(
        wsrv, "GET",
        '/blacklab-server/mail/hits?patt=%22fox%22%20within%20%3Cp/%3E',
    )
    assert st == 200 and body["summary"]["numberOfHits"] == 1
    # unregistered format name on add -> 400
    st, _ = req(wsrv, "POST", "/blacklab-server/mail/docs?format=nope", LETTERS_XML)
    assert st == 400


def test_user_formats_persist_across_restart(spark, tmp_path):
    from blacklab_spark.server import BlackLabServer

    s1 = BlackLabServer({}, port=0, writable_root=str(tmp_path), spark=spark).start()
    st, _ = req(s1, "POST", "/blacklab-server/input-formats/letters", FMT_YAML)
    assert st == 201
    s1.stop()
    s2 = BlackLabServer({}, port=0, writable_root=str(tmp_path), spark=spark).start()
    try:
        st, body = req(s2, "GET", "/blacklab-server/input-formats/letters")
        assert st == 200 and body["configFile"]["documentPath"] == "letter"
    finally:
        s2.stop()


def test_docs_ranked_bm25(srv, tiny_index):
    """docs?patt=&sort=bm25: the window is the engine's topk_spans ranking
    (whole pattern = one scored BM25 unit), scores included per doc."""
    st, body = get(srv, '/blacklab-server/tiny/docs?patt=%22the%22&sort=bm25&number=3')
    assert st == 200
    from blacklab_spark import bcql

    hits = bcql.find(tiny_index, '"the"')
    want = tiny_index.topk_spans(hits, k=3).orderBy("rank").collect()
    assert [d["docPid"] for d in body["docs"]] == [str(r["doc_id"]) for r in want]
    for d, r in zip(body["docs"], want):
        assert abs(d["score"] - r["score"]) < 1e-6
        assert d["numberOfHits"] >= 1
    # bm25 without a pattern is a client error, not a 500
    st, body = get(srv, "/blacklab-server/tiny/docs?sort=bm25")
    assert st == 400


def test_docs_ranked_bm25_no_matches(srv):
    """bm25 over a pattern with zero hits: empty window, 200, no crash."""
    st, body = get(srv, '/blacklab-server/tiny/docs?patt=%22zzznotaword%22&sort=bm25')
    assert st == 200
    assert body["docs"] == []


def test_xml_output_format(srv, tiny_index):
    """outputformat=xml on any endpoint: well-formed BLS-shaped XML whose
    hit count and context words match the JSON payload."""
    import xml.etree.ElementTree as ET

    url = f"http://127.0.0.1:{srv.port}/blacklab-server/tiny/hits?patt=%22the%22"
    with urllib.request.urlopen(url + "&outputformat=xml", timeout=120) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/xml"
        root = ET.fromstring(r.read())
    assert root.tag == "blacklabResponse"
    _, body = get(srv, "/blacklab-server/tiny/hits?patt=%22the%22")
    xml_hits = root.find("hits").findall("hit")
    assert len(xml_hits) == len(body["hits"])
    jwords = body["hits"][0]["match"]["word"]
    xwords = [w.text for w in xml_hits[0].find("match").find("word").findall("w")]
    assert xwords == jwords
    # grouped + docs + server-info render too (generic writer-level path)
    for p in (
        "/blacklab-server/tiny/hits?patt=%22the%22&group=hit",
        "/blacklab-server/tiny/docs?patt=%22the%22",
        "/blacklab-server",
    ):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}{p}"
            + ("&" if "?" in p else "?") + "outputformat=xml", timeout=120
        ) as r:
            ET.fromstring(r.read())  # well-formed
    # errors honor the requested format as well
    try:
        urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/blacklab-server/tiny/docs"
            "?sort=bm25&outputformat=xml", timeout=120
        )
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        root = ET.fromstring(e.read())
        assert root.find("error/code").text == "BAD_REQUEST"
