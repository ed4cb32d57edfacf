"""Guarantees-invariance fuzz: the SpanGuarantees-driven physical choices
(semi-join AND, dedupe skips, step-w runs kernel) must be RESULT-invariant —
compiling any random pattern with all guarantees suppressed (every claim
conservative: fixed_len=None, unique=False) must give the same hit multiset
as the optimized compile. This is the property the reference's guarantee
framework promises (SpanGuarantees.java:22-67: guarantees only ever license
skipping provably redundant work)."""

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from blacklab_spark import bcql
from blacklab_spark.bcql import (
    Guarantees,
    TPAnd,
    TPAnyToken,
    TPCapture,
    TPNotTerm,
    TPOr,
    TPRepetition,
    TPSequence,
    TPTerm,
)

# fixture vocabulary (tiny corpus, tests/test_spans.py header) + misses
VOCAB = ["the", "quick", "mier", "aap", "noot", "fox", "zzz_miss"]

terms = st.builds(
    TPTerm, term=st.sampled_from(VOCAB), sensitive=st.just(False)
)
leaf = st.one_of(
    terms,
    st.builds(TPAnyToken, mn=st.just(1), mx=st.just(1)),
    st.builds(TPNotTerm, inner=terms),
)

trees = st.recursive(
    leaf,
    lambda c: st.one_of(
        st.builds(TPSequence, parts=st.lists(c, min_size=2, max_size=2)),
        st.builds(TPOr, clauses=st.lists(c, min_size=2, max_size=2)),
        st.builds(TPAnd, clauses=st.lists(c, min_size=2, max_size=2)),
        st.builds(
            TPRepetition,
            clause=c,
            mn=st.integers(min_value=1, max_value=2),
            mx=st.one_of(st.none(), st.integers(min_value=2, max_value=3)),
        ),
        st.builds(TPCapture, name=st.just("A"), clause=c),
    ),
    max_leaves=4,
)


def _hits(df):
    return sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in df.select("doc_id", "start", "end").collect()
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,  # a green run must mean the property held, not a kind RNG
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tp=trees)
# the r4 verdict's minimized crasher: duplicate capture name in a sequence —
# `"the" (A:"the" A:"quick")` used to raise AMBIGUOUS_REFERENCE b.A_start
@example(
    tp=TPSequence(
        [
            TPTerm("the"),
            TPSequence(
                [TPCapture("A", TPTerm("the")), TPCapture("A", TPTerm("quick"))]
            ),
        ]
    )
)
def test_guarantees_never_change_results(tiny_index, monkeypatch, tp):
    optimized = _hits(bcql.compile_pattern(tiny_index, tp))
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(bcql, "guarantees", lambda _tp: Guarantees(None, False))
        conservative = _hits(bcql.compile_pattern(tiny_index, tp))
    assert optimized == conservative, bcql.to_cql(tp)
