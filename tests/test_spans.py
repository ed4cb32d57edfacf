"""Span-algebra operator tests over the tiny fixture corpus — mirrors the
reference's per-operator Spans tests on explicit mock data
(core/src/test/java/.../search/lucene/TestSpans*.java, SURVEY.md §5.1).

Tiny corpus token layout (doc_id == i, FIXTURES.md tier A):
  0: The quick brown fox jumps over the lazy dog          (9 tokens, 1 sentence)
  1: noot mier aap mier mier mier noot noot aap aap aap aap (12)
  2: The quick brown fox and the quick blue hare          (9)
  3: May the wind always be at your back                  (8)
  4: (empty)                                              (0)
  5: aap x16                                              (16)
"""

import pytest

from blacklab_spark import spans as S


def hits_set(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.collect()}


def test_sequence_adjacent(tiny_index):
    the = tiny_index.term_hits("the")
    quick = tiny_index.term_hits("quick")
    got = hits_set(S.sequence(the, quick))
    assert got == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_sequence_with_gap(tiny_index):
    # "the" []{1,2} "fox": docs 0 and 2 both have the(0) .. fox(3), gap 2
    the = tiny_index.term_hits("the")
    fox = tiny_index.term_hits("fox")
    got = hits_set(S.sequence(the, fox, gap_min=1, gap_max=2))
    assert got == {(0, 0, 4), (2, 0, 4)}


def test_repetition(tiny_index):
    # mier at doc1 positions 1,3,4,5 -> runs of 2: (3,5),(4,6); of 3: (3,6)
    mier = tiny_index.term_hits("mier")
    got = hits_set(S.repetition(mier, 2, 3))
    assert got == {(1, 3, 5), (1, 4, 6), (1, 3, 6)}


def test_repetition_includes_min_one(tiny_index):
    mier = tiny_index.term_hits("mier")
    got = hits_set(S.repetition(mier, 1, 2))
    singles = {(1, 1, 2), (1, 3, 4), (1, 4, 5), (1, 5, 6)}
    doubles = {(1, 3, 5), (1, 4, 6)}
    assert got == singles | doubles


def test_repetition_per_iteration_captures(tiny_index):
    """Captures inside a repetition record per-iteration span LISTS
    (reference repetition match-info lists, SpansRepetition.java:8-21):
    (A:"mier"){2} returns A_spans = [iter1 span, iter2 span]."""
    mier = S.capture(tiny_index.term_hits("mier"), "A")
    out = S.repetition(mier, 2, 2)
    rows = {
        (r["doc_id"], r["start"], r["end"]): [tuple(s) for s in r["A_spans"]]
        for r in out.collect()
    }
    assert rows == {
        (1, 3, 5): [(3, 4), (4, 5)],
        (1, 4, 6): [(4, 5), (5, 6)],
    }
    # variable count: each emitted length carries exactly its iterations
    out2 = S.repetition(mier, 1, 3)
    lens = {
        (r["doc_id"], r["start"], r["end"]): len(r["A_spans"])
        for r in out2.collect()
    }
    assert lens[(1, 3, 6)] == 3 and lens[(1, 1, 2)] == 1 and lens[(1, 3, 5)] == 2
    # unbounded path keeps the lists too
    out3 = S.repetition(mier, 2, None)
    rows3 = {
        (r["doc_id"], r["start"], r["end"]): [tuple(s) for s in r["A_spans"]]
        for r in out3.collect()
    }
    assert rows3[(1, 3, 6)] == [(3, 4), (4, 5), (5, 6)]


def test_repetition_capture_via_bcql(tiny_index):
    """End-to-end: (A:"mier"){2} through the compiler takes the general
    repetition path (not the capture-dropping token-runs kernel) and
    surfaces A_spans."""
    from blacklab_spark import bcql

    df = bcql.find(tiny_index, '(A:"mier"){2}')
    assert "A_spans" in df.columns
    rows = {
        (r["doc_id"], r["start"], r["end"]): [tuple(s) for s in r["A_spans"]]
        for r in df.collect()
    }
    assert rows == {
        (1, 3, 5): [(3, 4), (4, 5)],
        (1, 4, 6): [(4, 5), (5, 6)],
    }
    # ALL-matches span semantics unchanged vs the capture-free query
    assert hits_set(bcql.find(tiny_index, '"mier"{2}')) == {(1, 3, 5), (1, 4, 6)}


def test_any_token_counts(tiny_index):
    # bigrams per doc: len-1 when len>=2
    got = S.any_token(tiny_index.doc_lens(), 2, 2).count()
    assert got == 8 + 11 + 8 + 7 + 0 + 15


def test_expand_right_clamps(tiny_index):
    lazy = tiny_index.term_hits("lazy")  # doc0 pos 7, doc_len 9
    got = hits_set(S.expand(lazy, tiny_index.doc_lens(), "right", 1, 3))
    assert got == {(0, 7, 9)}  # +2/+3 would pass doc end


def test_expand_left(tiny_index):
    quick = tiny_index.term_hits("quick")  # doc0:1, doc2:1,6
    got = hits_set(S.expand(quick, tiny_index.doc_lens(), "left", 1, 1))
    assert got == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_not_spans(tiny_index):
    aap = tiny_index.term_hits("aap")
    got = S.not_spans(tiny_index.doc_lens(), aap)
    assert got.count() == (9 + 12 + 9 + 8 + 0 + 16) - (5 + 16)
    assert hits_set(got.filter("doc_id = 1")) == {
        (1, p, p + 1) for p in (0, 1, 3, 4, 5, 6, 7)
    }


def test_position_filter_within_containing(tiny_index, spark):
    quick = tiny_index.term_hits("quick")
    filt = spark.createDataFrame([(2, 4, 9)], "doc_id long, start int, end int")
    assert hits_set(S.within(quick, filt)) == {(2, 6, 7)}
    assert hits_set(S.within(quick, filt, invert=True)) == {(0, 1, 2), (2, 1, 2)}
    big = S.sequence(tiny_index.term_hits("the"), quick)  # the-quick bigrams
    small = tiny_index.term_hits("quick")
    assert hits_set(S.containing(big, small)) == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_position_filter_edge_ops(tiny_index, spark):
    quick = tiny_index.term_hits("quick")
    f = spark.createDataFrame([(2, 6, 8)], "doc_id long, start int, end int")
    assert hits_set(S.position_filter(quick, f, "starts_at")) == {(2, 6, 7)}
    g = spark.createDataFrame([(0, 0, 2)], "doc_id long, start int, end int")
    assert hits_set(S.position_filter(quick, g, "ends_at")) == {(0, 1, 2)}
    assert hits_set(S.position_filter(quick, g, "matches")) == set()


def test_edge_and_length_filter(tiny_index):
    bi = S.sequence(tiny_index.term_hits("the"), tiny_index.term_hits("quick"))
    lead = hits_set(S.edge(bi))
    assert lead == {(0, 0, 0), (2, 0, 0), (2, 5, 5)}
    trail = hits_set(S.edge(bi, trailing=True))
    assert trail == {(0, 2, 2), (2, 2, 2), (2, 7, 7)}
    assert S.filter_by_length(bi, 2, 2).count() == 3
    assert S.filter_by_length(bi, 3, 9).count() == 0


def test_and_or_andnot_spans(tiny_index):
    the = tiny_index.term_hits("the")
    quick = tiny_index.term_hits("quick")
    assert hits_set(S.and_spans(the, the)) == hits_set(the)
    assert S.and_spans(the, quick).count() == 0
    assert hits_set(S.or_spans(the, quick)) == hits_set(the) | hits_set(quick)
    assert hits_set(S.and_not(S.or_spans(the, quick), quick)) == hits_set(the)


def test_capture_rides_through_sequence(tiny_index):
    the = S.capture(tiny_index.term_hits("the"), "A")
    quick = tiny_index.term_hits("quick")
    out = S.sequence(the, quick)
    rows = {(r.doc_id, r.start, r.end, r.A_start, r.A_end) for r in out.collect()}
    assert rows == {(0, 0, 2, 0, 1), (2, 0, 2, 0, 1), (2, 5, 7, 5, 6)}


def test_constrained_global(tiny_index):
    """A:[] 'quick' :: A.word = 'the'  — token-array indexing (the reference
    verifies via forward index, SpanQueryConstrained.java:18-25)."""
    from pyspark.sql import functions as F

    any1 = S.any_token(tiny_index.doc_lens(), 1, 1)
    seq = S.sequence(S.capture(any1, "A"), tiny_index.term_hits("quick"))
    toks = tiny_index.docs.select("doc_id", "tokens_fold")

    out = seq.join(toks, "doc_id").filter(
        F.element_at("tokens_fold", F.col("A_start") + 1) == "the"
    )
    got = {(r.doc_id, r.start, r.end) for r in out.collect()}
    assert got == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_sentence_tag_hits(tiny_index):
    # each tiny doc is one sentence (single trailing period), doc4 empty
    got = hits_set(tiny_index.tag_hits("s"))
    assert got == {(0, 0, 9), (1, 0, 12), (2, 0, 9), (3, 0, 8), (5, 0, 16)}


def test_within_sentence(tiny_index):
    seq = S.sequence(tiny_index.term_hits("the"), tiny_index.term_hits("quick"))
    got = hits_set(S.within(seq, tiny_index.tag_hits("s")))
    assert got == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_unknown_tag_raises(tiny_index):
    with pytest.raises(ValueError):
        tiny_index.tag_hits("u")


def _brute_chains(hits, mn, mx):
    """Independent oracle for repetition: DFS over explicit adjacency."""
    hs = list(hits)
    out = set()

    def ext(d, s0, e, k):
        if k >= mn and (mx is None or k <= mx):
            out.add((d, s0, e))
        if mx is not None and k >= mx:
            return
        for d2, s2, e2 in hs:
            if d2 == d and s2 == e:
                ext(d, s0, e2, k + 1)

    for d, s, e in hs:
        ext(d, s, e, 1)
    return out


def test_repetition_multitoken_fixed_runs_kernel(tiny_index):
    """('aap' 'aap'){n,} — a FIXED-LENGTH multi-token clause — must agree
    with the brute-force chain oracle. The compiler routes this to the
    step-w gaps-and-islands kernel (no self-joins, no driver fixpoint);
    overlapping phrase hits in different start-residue classes mod 2 must
    not break each other's runs."""
    from blacklab_spark import bcql

    aap = tiny_index.term_hits("aap")
    pair_hits = hits_set(S.sequence(aap, aap))
    for mn, mx in [(2, 2), (2, None), (1, 3), (3, None)]:
        q = f'("aap" "aap"){{{mn},{mx if mx is not None else ""}}}'
        got = hits_set(bcql.find(tiny_index, q))
        assert got == _brute_chains(pair_hits, mn, mx), (mn, mx)


def test_repetition_token_runs_step_residue_classes(spark):
    """Direct kernel test: dense overlapping fixed-length-2 hits at starts
    0,1,2 — only the step-2-apart pair (0,2) chains; the start-1 hit in the
    other residue class must not split that run. Plan is join-free."""
    h = spark.createDataFrame(
        [(0, 0, 2), (0, 1, 3), (0, 2, 4)], "doc_id long, start int, end int"
    )
    out = S.repetition_token_runs(h, 2, None, step=2)
    assert hits_set(out) == {(0, 0, 4)}
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    # step=1 fallback still the old single-token behavior
    h1 = spark.createDataFrame(
        [(0, 3, 4), (0, 4, 5), (0, 5, 6), (0, 9, 10)],
        "doc_id long, start int, end int",
    )
    assert hits_set(S.repetition_token_runs(h1, 2, None)) == {
        (0, 3, 5), (0, 4, 6), (0, 3, 6),
    }


def test_repetition_doubling_long_run(spark):
    """Unbounded repetition over a 40-hit run with captures exercises the
    prefix-doubling fixpoint (O(log L) rounds): all 820 sub-chains, each
    carrying exactly per-iteration capture spans in chain order."""
    rows = [(0, i, i + 1, i, i + 1) for i in range(40)]
    h = spark.createDataFrame(
        rows, "doc_id long, start int, end int, A_start int, A_end int"
    )
    out = S.repetition(h, 1, None).collect()
    assert len(out) == 40 * 41 // 2
    by_span = {(r["doc_id"], r["start"], r["end"]): r["A_spans"] for r in out}
    assert [tuple(s) for s in by_span[(0, 0, 40)]] == [
        (i, i + 1) for i in range(40)
    ]
    assert [tuple(s) for s in by_span[(0, 17, 20)]] == [(17, 18), (18, 19), (19, 20)]
