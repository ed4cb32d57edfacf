"""The reference's HTTP golden-response query set, replayed over our server
(SURVEY.md §5.3: test/test/hits.js:52-89 drives a dockerized BlackLab Server
and diffs saved JSON goldens). Same structure here, adapted to the tiny
fixture's vocabulary: every reference query shape runs over HTTP and the
response is checked against the engine API run in-process (our golden), so
the HTTP layer can never drift from the engine."""

import json
import urllib.request
from urllib.parse import quote

import pytest

from blacklab_spark import bcql


@pytest.fixture(scope="module")
def asrv(spark, tiny_index_annot):
    from blacklab_spark.server import BlackLabServer

    s = BlackLabServer({"annot": tiny_index_annot}, port=0).start()
    yield s
    s.stop()


def hits(srv, patt, extra=""):
    url = f"http://127.0.0.1:{srv.port}/blacklab-server/annot/hits?patt={quote(patt)}&number=1000{extra}"
    with urllib.request.urlopen(url, timeout=120) as r:
        return json.loads(r.read())


def spans(body):
    return {(int(h["docPid"]), h["start"], h["end"]) for h in body["hits"]}


def engine_spans(ix, patt):
    return {
        (r["doc_id"], r["start"], r["end"])
        for r in bcql.find(ix, patt).select("doc_id", "start", "end").collect()
    }


# hits.js:52-89 query shapes, one test per shape ---------------------------


def test_ref_q_single_term(asrv, tiny_index_annot):
    body = hits(asrv, '"the"')
    assert spans(body) == engine_spans(tiny_index_annot, '"the"')
    assert body["summary"]["numberOfHits"] == len(spans(body))


def test_ref_q_term_then_lemma(asrv, tiny_index_annot):
    # reference: "a" [lemma="successful"]
    patt = '"the" [lemma="quick"]'
    assert spans(hits(asrv, patt)) == engine_spans(tiny_index_annot, patt)
    assert spans(hits(asrv, patt))  # non-empty on the fixture


def test_ref_q_fi_variants(asrv, tiny_index_annot):
    # reference: _FI1/_FI2 forward-index matching variants must equal the
    # plain sequence
    plain = engine_spans(tiny_index_annot, '"quick" "brown"')
    assert spans(hits(asrv, '_FI1("quick", "brown")')) == plain
    assert spans(hits(asrv, '_FI2("quick", "brown")')) == plain


def test_ref_q_capture_any(asrv, tiny_index_annot):
    # reference: "one" A:[]
    body = hits(asrv, '"the" A:[]')
    assert spans(body) == engine_spans(tiny_index_annot, '"the" A:[]')
    for h in body["hits"]:
        assert h["captureGroups"]["A"]["end"] - h["captureGroups"]["A"]["start"] == 1
        assert h["captureGroups"]["A"]["start"] == h["start"] + 1


def test_ref_q_any_token(asrv, tiny_index_annot):
    body = hits(asrv, "[]")
    assert body["summary"]["numberOfHits"] == bcql.find(tiny_index_annot, "[]").count()


def test_ref_q_regex_alternation_equals_or(asrv, tiny_index_annot):
    # reference: "two|four" vs "two"|"four" — identical result sets
    a = spans(hits(asrv, '"quick|lazy"'))
    b = spans(hits(asrv, '"quick"|"lazy"'))
    assert a == b and a
    assert a == engine_spans(tiny_index_annot, '"quick|lazy"')


def test_ref_q_lemma_and_word(asrv, tiny_index_annot):
    # reference: [lemma="be" & word="are"]
    patt = '[lemma="jump" & word="jumps"]'
    assert spans(hits(asrv, patt)) == engine_spans(tiny_index_annot, patt)
    assert spans(hits(asrv, patt))


def test_ref_q_lemma_and_not_word(asrv, tiny_index_annot):
    # reference: [lemma="be" & word!="are"]
    patt = '[pos="nn" & word!="dog"]'
    got = spans(hits(asrv, patt))
    assert got == engine_spans(tiny_index_annot, patt)
    # and the negation really excluded something
    assert got < engine_spans(tiny_index_annot, '[pos="nn"]')


def test_ref_q_tag_containing(asrv, tiny_index_annot):
    # reference: <u/> containing "good"
    patt = '<s/> containing "quick"'
    got = spans(hits(asrv, patt))
    assert got == engine_spans(tiny_index_annot, patt)
    assert got


def test_ref_q_seq_within_tag(asrv, tiny_index_annot):
    # reference: "very" "good" within <u/>
    patt = '"quick" "brown" within <s/>'
    assert spans(hits(asrv, patt)) == engine_spans(tiny_index_annot, patt)


def test_ref_q_grouped_view(asrv, tiny_index_annot):
    # reference: grouped views (hits-grouped goldens)
    body = hits(asrv, '"the" []', "&group=hit")
    got = {g["identity"]: g["size"] for g in body["hitGroups"]}
    from blacklab_spark import results

    want = {
        r["group_key"]: r["size"]
        for r in results.group_hits_by_text(
            tiny_index_annot, bcql.find(tiny_index_annot, '"the" []'), part="match"
        ).collect()
    }
    assert got == dict(sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)])


def test_ref_q_facets_docs_grouped(asrv, tiny_index_annot):
    # reference: facets / docs-grouped goldens
    url = (
        f"http://127.0.0.1:{asrv.port}/blacklab-server/annot/docs?"
        f"patt={quote(chr(34) + 'the' + chr(34))}&group=field:lang"
    )
    with urllib.request.urlopen(url, timeout=120) as r:
        body = json.loads(r.read())
    from blacklab_spark import results

    d = results.doc_results(bcql.find(tiny_index_annot, '"the"'))
    want = {
        str(r["lang"]): r["cnt"]
        for r in d.join(tiny_index_annot.docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang").count().withColumnRenamed("count", "cnt").collect()
    }
    assert {g["identity"]: g["size"] for g in body["docGroups"]} == want


def test_ref_q_csv(asrv):
    # reference: CSV goldens (hits-csv)
    url = (
        f"http://127.0.0.1:{asrv.port}/blacklab-server/annot/hits?"
        f"patt={quote(chr(34) + 'the' + chr(34))}&outputformat=csv&number=1000"
    )
    with urllib.request.urlopen(url, timeout=120) as r:
        assert r.headers.get("Content-Type") == "text/csv"
        lines = r.read().decode().strip().split("\n")
    body = hits(asrv, '"the"')
    assert len(lines) - 1 == body["summary"]["numberOfHits"]


def test_ref_q_termfreq_sensitive_insensitive(asrv, tiny_index_annot):
    # reference: term-freq sensitive/insensitive goldens
    def tf(sens):
        url = (
            f"http://127.0.0.1:{asrv.port}/blacklab-server/annot/termfreq?"
            f"number=1000&sensitive={sens}"
        )
        with urllib.request.urlopen(url, timeout=120) as r:
            return json.loads(r.read())["termFreq"]

    sens, insens = tf("true"), tf("false")
    # "The" occurrences: sensitive keeps the/The distinct, insensitive folds
    assert insens["the"] == sens.get("the", 0) + sens.get("The", 0)
    assert sum(sens.values()) == sum(insens.values())


# --------------------------------------------------------------------------
# property: HTTP hit list == engine hit set for random patterns (the
# golden-response idea generalized; derandomized so green == property held)
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from blacklab_spark.bcql import (
    TPAnyToken,
    TPCapture,
    TPOr,
    TPRepetition,
    TPSequence,
    TPTerm,
    to_cql,
)

_VOCAB = ["the", "quick", "mier", "aap", "fox", "zzz_miss"]
_terms = st.builds(TPTerm, term=st.sampled_from(_VOCAB), sensitive=st.just(False))
_leaf = st.one_of(_terms, st.builds(TPAnyToken, mn=st.just(1), mx=st.just(1)))
_trees = st.recursive(
    _leaf,
    lambda c: st.one_of(
        st.builds(TPSequence, parts=st.lists(c, min_size=2, max_size=2)),
        st.builds(TPOr, clauses=st.lists(c, min_size=2, max_size=2)),
        st.builds(TPCapture, name=st.just("A"), clause=c),
        st.builds(
            TPRepetition, clause=_terms,
            mn=st.just(1), mx=st.integers(min_value=1, max_value=2),
        ),
    ),
    max_leaves=4,
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tp=_trees)
def test_http_matches_engine_on_random_patterns(asrv, tiny_index_annot, tp):
    patt = to_cql(tp)
    assert spans(hits(asrv, patt)) == engine_spans(tiny_index_annot, patt), patt


def test_kwic_carries_all_annotation_layers(asrv, tiny_index_annot):
    """The reference's Kwic carries every annotation per token
    (Kwic.java): word + lemma + pos arrays in left/match/right."""
    body = hits(asrv, '"jumps"')
    assert body["hits"]
    h = body["hits"][0]
    for part in ("left", "match", "right"):
        assert set(h[part]) == {"word", "lemma", "pos"}
        assert len(h[part]["lemma"]) == len(h[part]["word"])
        assert len(h[part]["pos"]) == len(h[part]["word"])
    assert h["match"]["word"] == ["jumps"]
    assert h["match"]["lemma"] == ["jump"]
    assert h["match"]["pos"] == ["nn"]  # pos_fold: only -ing maps to vb
