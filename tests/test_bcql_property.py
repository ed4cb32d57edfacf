"""Property-based BCQL serializer/parser tests (hypothesis): random
TextPattern trees must survive to_dict/from_dict exactly, and
parse(to_cql(...)) must be a normalization fixpoint — mirrors the
reference's parser test strategy (TestCorpusQueryLanguageParser) with
generated rather than enumerated inputs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from blacklab_spark.bcql import (
    ANNOTS,
    TPAnd,
    TPAnyToken,
    TPCapture,
    TPNotTerm,
    TPOr,
    TPRepetition,
    TPSequence,
    TPTags,
    TPTerm,
    from_dict,
    parse,
    to_cql,
    to_dict,
)

# terms include regex metachars and accents: the serializer must quote them
# and the parser's TERM-vs-REGEX simplification must stay stable
term_text = st.text(
    alphabet="abcxyzABC019éÉ.*?", min_size=1, max_size=6
).filter(lambda s: s.strip() == s and s != "")

terms = st.builds(
    TPTerm,
    term=term_text,
    sensitive=st.booleans(),
    annot=st.sampled_from(ANNOTS),
)

any_tokens = st.integers(min_value=0, max_value=3).flatmap(
    lambda mn: st.builds(
        TPAnyToken,
        mn=st.just(max(mn, 1)),
        mx=st.integers(min_value=max(mn, 1), max_value=4),
    )
)

tags = st.builds(
    TPTags,
    name=st.sampled_from(["s", "p", "head"]),
    attrs=st.lists(
        st.tuples(st.sampled_from(["class", "id"]), st.sampled_from(["a", "b1"])),
        max_size=1,
        unique_by=lambda kv: kv[0],
    ).map(tuple),
    adjust=st.sampled_from(["full", "leading"]),
)

leaf = st.one_of(terms, any_tokens, tags, st.builds(TPNotTerm, inner=terms))


def _rep(children):
    return st.builds(
        TPRepetition,
        clause=children,
        mn=st.integers(min_value=0, max_value=2),
        mx=st.one_of(st.none(), st.integers(min_value=3, max_value=5)),
    )


trees = st.recursive(
    leaf,
    lambda c: st.one_of(
        st.builds(TPSequence, parts=st.lists(c, min_size=2, max_size=3)),
        st.builds(TPOr, clauses=st.lists(c, min_size=2, max_size=3)),
        st.builds(TPAnd, clauses=st.lists(c, min_size=2, max_size=2)),
        _rep(c),
        st.builds(
            TPCapture, name=st.sampled_from(["A", "B", "Grp"]), clause=c
        ),
    ),
    max_leaves=8,
)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(trees)
def test_dict_roundtrip_exact(tp):
    assert from_dict(to_dict(tp)) == tp


@settings(max_examples=300, deadline=None, derandomize=True)
@given(trees)
def test_cql_roundtrip_normalization_fixpoint(tp):
    """to_cql(parse(to_cql(tp))) reproduces the SAME pattern: after one
    parse (which may normalize, e.g. a quoted 'a.b' term parses as a
    regex), the cql<->tree mapping must be stable."""
    cql = to_cql(tp)
    tp1 = parse(cql)
    cql2 = to_cql(tp1)
    tp2 = parse(cql2)
    assert tp1 == tp2, f"{cql!r} -> {tp1} but {cql2!r} -> {tp2}"


def test_unbounded_anytoken_serializes_parseable():
    """TPAnyToken(mx=None) must serialize to the grammar's {n,} form (was
    '[]{1,None}', which failed to re-parse)."""
    for mn in (0, 1, 2):
        tp = TPAnyToken(mn, None)
        cql = to_cql(tp)
        tp1 = parse(cql)
        assert to_cql(parse(to_cql(tp1))) == to_cql(tp1)
