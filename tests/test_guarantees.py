"""Generalized SpanGuarantees (reference SpanGuarantees.java:22-67): the
unique/fixed-len flags propagate through every combinator and drive physical
choices — semi join instead of Intersect for AND, no dropDuplicates after
AND-NOT, dedupe-free repetition — asserted both on result correctness and on
the physical plan (no dedupe exchange in provably-unique plans)."""

from blacklab_spark import bcql


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.collect()}


def test_sequence_one_variable_part_unique():
    g = bcql.guarantees
    # one variable-length gap among fixed unique parts: span determines chain
    assert g(bcql.parse('"a" []{1,3} "b"')).unique is True
    assert g(bcql.parse('"a" "b"{1,3} "c"')).unique is True
    # two variable parts: same span reachable with different interior splits
    assert g(bcql.parse('"a" []{1,3} "b" []{1,3} "c"')).unique is False
    # empty-matching variable part: conservative
    assert g(bcql.parse('"a" "b"? "c"')).unique is False


def test_relmatch_fieldoverride_guarantees():
    g = bcql.guarantees
    assert g(bcql.parse('_ -nsubj-> _ ; -obj-> _')).unique is True
    assert g(bcql.parse('@field=nl "x"')) == bcql.Guarantees(1, True)


def test_and_semi_join_no_intersect(tiny_index):
    # both sides unique -> semi join, no Intersect / dedupe aggregate
    df = bcql.find(tiny_index, '"aap" & "noot"')
    p = plan_of(df)
    assert "Intersect" not in p
    assert "Aggregate" not in p


def test_and_not_no_dedupe_exchange(tiny_index):
    # unique include -> exceptAll without the trailing dropDuplicates.
    # exceptAll itself lowers to one sum-based aggregate pair in Spark, so
    # the assertion is on the DELTA: the compiled plan must carry exactly
    # the dedupe-free shape (same aggregate count as an explicit
    # dedupe=False and strictly fewer than dedupe=True)
    from blacklab_spark import spans as S

    a = tiny_index.term_hits("aap")
    b = tiny_index.term_hits("noot")
    n_free = plan_of(S.and_not(a, b, dedupe=False)).count("HashAggregate")
    n_dedupe = plan_of(S.and_not(a, b, dedupe=True)).count("HashAggregate")
    assert n_free < n_dedupe
    df = bcql.find(tiny_index, '_andnot("aap", "noot")')
    assert plan_of(df).count("HashAggregate") == n_free


def test_multi_combinator_unique_plan(tiny_index):
    # provably-unique multi-combinator plan (OR fast path union + AND semi
    # join + fixed-len repetition): end-to-end free of dedupe exchanges
    df = bcql.find(tiny_index, '("aap" | "noot") & "aap"{1,1}')
    p = plan_of(df)
    assert "Intersect" not in p
    assert "Aggregate" not in p


def test_and_semi_join_matches_intersect(tiny_index):
    from blacklab_spark import spans as S

    a = tiny_index.term_hits("aap")
    b = tiny_index.term_hits("aap")
    ref = hs(S.and_spans(a, b))
    assert hs(S.and_spans(a, b, a_unique=True)) == ref
    assert hs(S.and_spans(a, b, b_unique=True)) == ref
    got = hs(bcql.find(tiny_index, '"aap" & "aap"'))
    assert got == ref and got


def test_and_not_results_match(tiny_index):
    from blacklab_spark import spans as S

    a = tiny_index.term_hits("aap")
    b = tiny_index.term_hits("noot")
    assert hs(S.and_not(a, b, dedupe=False)) == hs(S.and_not(a, b, dedupe=True))
