"""Global constraint `::` (MatchFilter) + capture-text grouping tests."""

import pytest

from blacklab_spark import bcql
from blacklab_spark import results as R


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.select("doc_id", "start", "end").collect()}


def test_constraint_word_equals_literal(tiny_index):
    # A:[] "quick" :: A.word = "the"  — the token before quick must be 'the'
    got = hs(bcql.find(tiny_index, 'A:[] "quick" :: A.word = "the"'))
    assert got == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_constraint_capture_vs_capture(tiny_index):
    # two captured any-tokens with equal words, adjacent: doc1 has
    # "mier mier" and "aap aap" runs, doc5 aap-aap everywhere
    got = hs(bcql.find(tiny_index, 'A:[] B:[] :: A.word = B.word'))
    assert (1, 3, 5) in got and (5, 0, 2) in got
    assert all(d in (1, 5) for d, _, _ in got)


def test_constraint_position_function(tiny_index):
    got = hs(bcql.find(tiny_index, '"the" A:[] :: start(A) >= 6'))
    # 'the' at doc0 pos6 -> A at 7; doc2 none (the@5 -> A@6 ok >=6!)
    assert got == {(0, 6, 8), (2, 5, 7)}


def test_constraint_boolean(tiny_index):
    got = hs(bcql.find(tiny_index, 'A:[] "quick" :: A.word = "the" | A.word = "and"'))
    # 'and the quick'? doc2: and@4 the@5 quick@6 -> A='the' only precedes quick
    assert got == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_constraint_parse_error():
    with pytest.raises(ValueError):
        bcql.parse('"a" :: A.foo = "x"')  # unknown annot (lemma/pos now parse)


def test_group_by_capture(tiny_index):
    df = bcql.find(tiny_index, '"the" A:[]')
    g = {r.group_key: r.size for r in R.group_hits_by_capture(tiny_index, df, "A").collect()}
    # tokens after 'the': quick(doc0@0), lazy(doc0@6), quick(doc2@0),
    # quick(doc2@5), wind(doc3@1)
    assert g == {"quick": 3, "lazy": 1, "wind": 1}
