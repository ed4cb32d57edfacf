"""Results-pipeline operator tests (SURVEY.md §2.4) on the tiny corpus."""

from blacklab_spark import results as R


def test_sort_hits_by_match(tiny_index):
    hits = tiny_index.term_hits("quick").unionByName(tiny_index.term_hits("brown"))
    out = R.sort_hits(tiny_index, hits, by="match").collect()
    keys = [r.doc_id for r in out]
    # brown hits (b...) sort before quick hits (q...)
    assert len(out) == 5
    assert keys[:2] == [0, 2]  # the two 'brown's first


def test_sort_hits_by_after(tiny_index):
    # "quick" hits ordered by following context: 'blue hare' < 'brown fox'
    hits = tiny_index.term_hits("quick")
    out = R.sort_hits(tiny_index, hits, by="after").collect()
    assert (out[0].doc_id, out[0].start) == (2, 6)  # quick blue hare


def test_window_hits(tiny_index):
    hits = tiny_index.term_hits("aap")  # 21 hits over docs 1 and 5
    w = R.window_hits(hits, 2, 3).collect()
    assert len(w) == 3
    all_sorted = sorted(
        (r.doc_id, r.start) for r in hits.collect()
    )
    assert [(r.doc_id, r.start) for r in w] == all_sorted[2:5]


def test_sample_hits_deterministic(tiny_index):
    hits = tiny_index.term_hits("aap")
    s1 = {(r.doc_id, r.start) for r in R.sample_hits(hits, n=5, seed=7).collect()}
    s2 = {(r.doc_id, r.start) for r in R.sample_hits(hits, n=5, seed=7).collect()}
    assert s1 == s2 and len(s1) == 5


def test_group_hits_by_text(tiny_index):
    hits = tiny_index.or_hits(["quick", "brown"])
    g = {r.group_key: r.size for r in R.group_hits_by_text(tiny_index, hits).collect()}
    assert g == {"quick": 3, "brown": 2}


def test_group_hits_by_metadata(tiny_index):
    hits = tiny_index.term_hits("the")
    g = {r.lang: r.size for r in R.group_hits_by_metadata(tiny_index, hits, "lang").collect()}
    assert g == {"en": 5}


def test_doc_results_and_facets(tiny_index):
    hits = tiny_index.term_hits("aap")
    dr = {r.doc_id: r.n_hits for r in R.doc_results(hits).collect()}
    assert dr == {1: 5, 5: 16}
    f = R.facets(tiny_index, hits.select("doc_id"), ["lang"]).collect()
    assert {(r.lang, r.n_docs) for r in f} == {("en", 2)}


def test_collocations(tiny_index):
    hits = tiny_index.term_hits("quick")  # contexts around quick
    c = {r.term: r.n for r in R.collocations(tiny_index, hits, context=1).collect()}
    # neighbors: the_,brown (doc0); the_,brown + the_,blue (doc2)
    assert c["the"] == 3 and c["brown"] == 2 and c["blue"] == 1


def test_filter_hits_by_metadata(tiny_index):
    hits = tiny_index.term_hits("aap")
    out = R.filter_hits_by_metadata(tiny_index, hits, "doc_len > 12")
    assert {r.doc_id for r in out.collect()} == {5}


def test_sort_hits_by_metadata(tiny_index):
    # HitPropertyDocumentStoredField: order by the docs `lang` field (all
    # 'und' in tiny -> falls back to doc order), then by a field with
    # variation: url differs per doc
    hits = tiny_index.term_hits("quick")
    out = R.sort_hits(tiny_index, hits, by="metadata:url").collect()
    urls = None
    docs = [r.doc_id for r in out]
    assert docs == sorted(docs)  # urls rank like doc ids in the fixture
    _ = urls


def test_sort_hits_by_capture(tiny_index):
    from blacklab_spark import bcql

    # A: captures the token after 'quick' -> sort by captured text:
    # 'blue' < 'brown'
    hits = bcql.find(tiny_index, '"quick" A:[]')
    out = R.sort_hits(tiny_index, hits, by="capture:A").collect()
    first = out[0]
    assert (first.doc_id, first.A_start) == (2, 7)  # 'blue'
    # capture columns survive the sort
    assert {"A_start", "A_end"} <= set(out[0].asDict())


def test_group_sort_filter_window(tiny_index):
    hits = tiny_index.or_hits(["quick", "brown", "aap"])
    groups = R.group_hits_by_text(tiny_index, hits)
    by_size = R.sort_groups(groups, by="size").collect()
    sizes = [r.size for r in by_size]
    assert sizes == sorted(sizes, reverse=True)
    big = R.filter_groups(groups, min_size=3).collect()
    assert all(r.size >= 3 for r in big)
    # window over the size-sorted list pages consistently
    w = R.window_groups(groups, 1, 2, by="size").collect()
    assert [r.group_key for r in w] == [r.group_key for r in by_size[1:3]]


def test_sort_hits_multiple_properties(tiny_index):
    # HitPropertyMultiple: primary key metadata:url (doc order), secondary
    # the match text — quick/brown hits order by doc first, then text
    hits = tiny_index.or_hits(["quick", "brown"])
    out = R.sort_hits(tiny_index, hits, by=["metadata:url", "match"]).collect()
    seq = [(r.doc_id, r.start) for r in out]
    by_doc_then_text = sorted(
        seq,
        key=lambda t: (t[0],),
    )
    assert [t[0] for t in seq] == [t[0] for t in by_doc_then_text]
    # within doc 0, 'brown' (pos 2) sorts before 'quick' (pos 1)
    d0 = [t for t in seq if t[0] == 0]
    assert d0 == [(0, 2), (0, 1)]
    # single-string by= keeps working identically
    a = [(r.doc_id, r.start) for r in R.sort_hits(tiny_index, hits, by="match").collect()]
    b = [(r.doc_id, r.start) for r in R.sort_hits(tiny_index, hits, by=["match"]).collect()]
    assert a == b
