"""Forward-index sequence verification (FiSeq / ClauseCombinerNfa analog,
SURVEY.md §4.3) + snippet/ngram-filter additions."""

from blacklab_spark import bcql
from blacklab_spark import spans as S


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.select("doc_id", "start", "end").collect()}


def test_verify_adjacent_right_equals_join_path(tiny_index):
    # "the" ++ regex neighbor: both strategies must agree
    anchor = tiny_index.term_hits("the")
    via_verify = S.verify_adjacent(anchor, tiny_index.docs, "l.*y", "right")
    via_join = S.sequence(anchor, tiny_index.regex_hits("l.*y"))
    assert hs(via_verify) == hs(via_join) == {(0, 6, 8)}


def test_verify_adjacent_left(tiny_index):
    anchor = tiny_index.term_hits("fox")
    via_verify = S.verify_adjacent(anchor, tiny_index.docs, "b.*n", "left")
    via_join = S.sequence(tiny_index.regex_hits("b.*n"), anchor)
    assert hs(via_verify) == hs(via_join) == {(0, 2, 4), (2, 2, 4)}


def test_bcql_regex_sequence_correct_regardless_of_path(tiny_index):
    # cost model picks a path; both must produce the join-path answer
    assert hs(bcql.find(tiny_index, '"the" "qu.*k"')) == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}
    assert hs(bcql.find(tiny_index, '"b.*n" "fox"')) == {(0, 2, 4), (2, 2, 4)}


def test_cost_model_stats(tiny_index):
    # 'aap' df: docs 1 and 5 -> 2; regex a.* matches aap/always/and/at
    assert tiny_index.term_df("aap") == 2
    nv, tdf = tiny_index.regex_stats("aap")
    assert nv == 1 and tdf == 2


def test_filter_ngrams(tiny_index):
    sent = tiny_index.tag_hits("s")
    bigrams_in_doc3 = S.filter_ngrams(
        tiny_index.doc_lens(), sent.filter("doc_id = 3"), 2, 2, "within"
    )
    assert bigrams_in_doc3.count() == 7  # 8 tokens -> 7 bigrams


def test_snippet_and_contents(tiny_index):
    s = tiny_index.snippet(0, 7, 8, context=2)
    assert s["match"] == "lazy"
    assert s["left"] == "over the" and s["right"] == "dog"
    text = tiny_index.doc_contents(0)
    assert text is not None and text.startswith("The quick brown fox")
