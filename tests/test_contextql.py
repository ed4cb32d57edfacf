"""ContextQL (SRU CQL) — the reference's second query language
(contextql.jj + ContextualQueryLanguageParser.java), over the same IR."""

import pytest

from blacklab_spark import bcql, contextql


def hs(df):
    return {
        (r["doc_id"], r["start"], r["end"])
        for r in df.select("doc_id", "start", "end").collect()
    }


def test_bare_term_equals_bcql(tiny_index):
    assert hs(contextql.find(tiny_index, "quick")) == hs(
        bcql.find(tiny_index, '"quick"')
    )


def test_wildcards(tiny_index):
    assert hs(contextql.find(tiny_index, "qu*")) == hs(bcql.find(tiny_index, '"quick"'))
    assert hs(contextql.find(tiny_index, "th?")) == hs(bcql.find(tiny_index, '"the"'))


def test_phrase_value(tiny_index):
    got = hs(contextql.find(tiny_index, '"the quick"'))
    assert got == hs(bcql.find(tiny_index, '"the" "quick"'))


def test_annotation_index(tiny_index_annot):
    # lemma = ... routes to the lemma layer (contents.<annot> resolution)
    got = hs(contextql.find(tiny_index_annot, 'lemma = "jump"'))
    assert got == hs(bcql.find(tiny_index_annot, '[lemma="jump"]'))


def test_boolean_or_and_not(tiny_index):
    got = hs(contextql.find(tiny_index, "quick or lazy"))
    assert got == hs(bcql.find(tiny_index, '"quick" | "lazy"'))
    # token-level AND of different terms is empty (same-span semantics,
    # CompleteQuery.and "NOTE: token-level and!")
    assert hs(contextql.find(tiny_index, "quick and lazy")) == set()
    # AND-NOT: b-words minus brown
    got = hs(contextql.find(tiny_index, "b* not brown"))
    expect = hs(bcql.find(tiny_index, '"b.*"')) - hs(bcql.find(tiny_index, '"brown"'))
    assert got == expect and got


def test_metadata_filter(tiny_index):
    # url is doc metadata -> semi-join filter on the docs table
    got = hs(contextql.find(tiny_index, 'quick and url = "*page/0"'))
    assert got == {(0, 1, 2)}
    # filter-only query returns matching doc ids
    docs = {r["doc_id"] for r in contextql.find(tiny_index, 'lang = "en"').collect()}
    assert docs == {0, 1, 2, 3, 4, 5}


def test_parens_grouping(tiny_index):
    got = hs(contextql.find(tiny_index, "(quick or lazy) and url = \"*page/0\""))
    assert got == {(0, 1, 2), (0, 7, 8)}


def test_metadata_wildcard_crosses_spaces(tiny_index):
    # metadata values may contain spaces ('2024-01-01 00:00:03'); wildcards
    # must match the whole value, unlike token-level contents wildcards
    docs = {
        r["doc_id"] for r in contextql.find(tiny_index, 'warc_ts = "2024*"').collect()
    }
    assert docs == {0, 1, 2, 3, 4, 5}


def test_empty_term_rejected():
    with pytest.raises(ValueError, match="empty search term"):
        contextql.parse('word = ""')


def test_unsupported_forms():
    with pytest.raises(ValueError, match="prox"):
        contextql.parse("quick prox lazy")
    with pytest.raises(ValueError, match="relation"):
        contextql.parse("lang > en")
    with pytest.raises(ValueError, match="cannot OR"):
        contextql.parse("quick or lang = en")
