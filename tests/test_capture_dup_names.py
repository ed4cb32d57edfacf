"""Duplicate capture names must NOT crash: the reference keeps ONE
match-info slot per name and a later capture overwrites the earlier one
(HitQueryContext.registerMatchInfo, HitQueryContext.java:88-100 — "already
registered, reuse"). Minimized r4-verdict crasher: `"the" (A:"the" A:"quick")`
raised AnalysisException AMBIGUOUS_REFERENCE b.A_start."""

from blacklab_spark import bcql
from blacklab_spark import spans as S


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def test_dup_capture_in_sequence(tiny_index):
    """A:"the" A:"quick" — single A slot, later clause (quick) wins."""
    out = bcql.compile_pattern(tiny_index, bcql.parse('A:"the" A:"quick"'))
    assert out.columns.count("A_start") == 1 and out.columns.count("A_end") == 1
    got = _rows(out, "doc_id", "start", "end", "A_start", "A_end")
    # "the quick" at (0,0,2) (2,0,2) (2,5,7); A = the LATER capture = quick
    assert got == {(0, 0, 2, 1, 2), (2, 0, 2, 1, 2), (2, 5, 7, 6, 7)}


def test_dup_capture_minimized_verdict_example(tiny_index):
    """The exact minimized fuzz crasher from the r4 verdict."""
    out = bcql.compile_pattern(
        tiny_index, bcql.parse('"the" (A:"the" A:"quick")')
    )
    got = _rows(out, "doc_id", "start", "end", "A_start", "A_end")
    # spans equal plain `"the" "the" "quick"`; A = quick's token
    plain = bcql.compile_pattern(tiny_index, bcql.parse('"the" "the" "quick"'))
    assert {(d, s, e) for d, s, e, *_ in got} == _rows(
        plain, "doc_id", "start", "end"
    )
    assert all(ae - as_ == 1 for *_, as_, ae in got)


def test_dup_capture_in_or(tiny_index):
    """(A:"the" | A:"quick") — one A column, each branch fills its own."""
    out = bcql.compile_pattern(tiny_index, bcql.parse('A:"the" | A:"quick"'))
    assert out.columns.count("A_start") == 1
    got = _rows(out, "doc_id", "start", "end", "A_start", "A_end")
    the = _rows(tiny_index.term_hits("the"), "doc_id", "start", "end")
    quick = _rows(tiny_index.term_hits("quick"), "doc_id", "start", "end")
    assert {(d, s, e) for d, s, e, *_ in got} == the | quick
    assert all(a == s and b == e for _, s, e, a, b in got)


def test_dup_capture_in_and(tiny_index):
    out = bcql.compile_pattern(tiny_index, bcql.parse('A:"the" & A:"the"'))
    assert out.columns.count("A_start") == 1
    got = _rows(out, "doc_id", "start", "end", "A_start", "A_end")
    the = _rows(tiny_index.term_hits("the"), "doc_id", "start", "end")
    assert {(d, s, e) for d, s, e, *_ in got} == the


def test_dup_capture_in_repetition(tiny_index):
    """(A:"the" A:"quick"){1,2} — the coalesced clause repeats cleanly and
    the per-iteration capture list records the LATER capture per iteration."""
    out = bcql.compile_pattern(
        tiny_index, bcql.parse('(A:"the" A:"quick"){1,2}')
    )
    assert out.count() >= 3  # at least the {1} chains
    spans_col = [c for c in out.columns if c.endswith("_spans")]
    assert spans_col == ["A_spans"]
    for r in out.select("A_spans").collect():
        assert all(sp.end - sp.start == 1 for sp in r.A_spans)


def test_dup_capture_downstream_sort_group(tiny_index):
    """The r4 failure mode was the NEXT combinator blowing up on ambiguous
    columns — make sure sorting/grouping on the capture works now."""
    from pyspark.sql import functions as F

    out = bcql.compile_pattern(tiny_index, bcql.parse('A:"the" A:"quick"'))
    g = (
        out.groupBy("A_start")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("A_start")
        .collect()
    )
    assert [(r.A_start, r.n) for r in g] == [(1, 2), (6, 1)]


def test_nested_same_name_capture(tiny_index):
    """A:(A:"the") — outer overwrites inner; same span here, no crash."""
    out = bcql.compile_pattern(tiny_index, bcql.parse('A:(A:"the")'))
    assert out.columns.count("A_start") == 1
    got = _rows(out, "doc_id", "start", "end", "A_start", "A_end")
    assert all(a == s and b == e for _, s, e, a, b in got)
