"""BCQL end-to-end golden tests on the tiny corpus — mirrors the reference's
TestSearches golden-query style (core/.../search/TestSearches.java:61-134) and
the integration query set shapes (test/test/hits.js:52-89).

Tiny corpus (doc_id == i):
  0: The quick brown fox jumps over the lazy dog   (9)
  1: noot mier aap mier mier mier noot noot aap aap aap aap (12)
  2: The quick brown fox and the quick blue hare   (9)
  3: May the wind always be at your back           (8)
  4: (empty)
  5: aap x16
"""

import pytest

from blacklab_spark import bcql


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.select("doc_id", "start", "end").collect()}


def q(ix, s):
    return hs(bcql.find(ix, s))


def test_single_term(tiny_index):
    assert q(tiny_index, '"the"') == {(0, 0, 1), (0, 6, 7), (2, 0, 1), (2, 5, 6), (3, 1, 2)}


def test_term_case_sensitive_flag(tiny_index):
    # %c: only the capitalized surface form matches
    assert q(tiny_index, '"The"%c') == {(0, 0, 1), (2, 0, 1)}
    assert q(tiny_index, '"the"%c') == {(0, 6, 7), (2, 5, 6), (3, 1, 2)}


def test_regex_term(tiny_index):
    assert q(tiny_index, '"qu.*k"') == {(0, 1, 2), (2, 1, 2), (2, 6, 7)}


def test_or_of_terms(tiny_index):
    # "two|four" shape (hits.js): regex alternation == explicit boolean or
    assert q(tiny_index, '"noot|mier"') == q(tiny_index, '"noot" | "mier"')
    assert len(q(tiny_index, '"noot|mier"')) == 7


def test_phrase_sequence(tiny_index):
    assert q(tiny_index, '"the" "quick"') == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_sequence_three_terms(tiny_index):
    assert q(tiny_index, '"the" "quick" "brown"') == {(0, 0, 3), (2, 0, 3)}


def test_token_constraint(tiny_index):
    assert q(tiny_index, '[word="fox"]') == {(0, 3, 4), (2, 3, 4)}


def test_token_constraint_neq(tiny_index):
    # [word!="aap"]: every non-aap token position
    got = q(tiny_index, '[word!="aap"]')
    assert len(got) == (9 + 12 + 9 + 8 + 0 + 16) - (5 + 16)
    assert (5, 0, 1) not in got


def test_any_token_gap(tiny_index):
    assert q(tiny_index, '"the" []{1,2} "fox"') == {(0, 0, 4), (2, 0, 4)}


def test_leading_any_token(tiny_index):
    assert q(tiny_index, '[] "quick"') == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_trailing_any_token(tiny_index):
    assert q(tiny_index, '"lazy" []') == {(0, 7, 9)}


def test_repetition(tiny_index):
    assert q(tiny_index, '"mier"{2,3}') == {(1, 3, 5), (1, 4, 6), (1, 3, 6)}


def test_optional_clause(tiny_index):
    # "quick" "blue"? "hare" -> with/without alternatives (EmptyClauseAlts)
    assert q(tiny_index, '"quick" "blue"? "hare"') == {(2, 6, 9)}
    assert q(tiny_index, '"quick" "brown"? "fox"') == {(0, 1, 4), (2, 1, 4)}


def test_capture_group(tiny_index):
    # "one" A:[] shape (hits.js): capture the token after "over"
    df = bcql.find(tiny_index, '"over" A:[]')
    rows = {(r.doc_id, r.start, r.end, r.A_start, r.A_end) for r in df.collect()}
    assert rows == {(0, 5, 7, 6, 7)}


def test_within_sentence(tiny_index):
    assert q(tiny_index, '("the" "quick") within <s/>') == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_containing(tiny_index):
    # sentences containing "wind"
    assert q(tiny_index, '<s/> containing "wind"') == {(3, 0, 8)}


def test_and_of_patterns(tiny_index):
    assert q(tiny_index, '"the" & "the"') == q(tiny_index, '"the"')
    assert q(tiny_index, '"the" & "quick"') == set()


def test_parse_errors(tiny_index):
    with pytest.raises(ValueError):
        bcql.parse('"unclosed')
    with pytest.raises(ValueError):
        bcql.parse('[foo="x"]')  # unknown annotation (lemma/pos now parse)
    with pytest.raises(ValueError):
        bcql.parse('"a" )')


def test_ast_shapes():
    tp = bcql.parse('"a" [word="b"]{2,3} | "c"')
    assert isinstance(tp, bcql.TPOr)
    seq = tp.clauses[0]
    assert isinstance(seq, bcql.TPSequence)
    assert isinstance(seq.parts[1], bcql.TPRepetition)
    assert seq.parts[1].mn == 2 and seq.parts[1].mx == 3
    # {1,1} elides (TrivialRep)
    assert isinstance(bcql.parse('"a"{1,1}'), bcql.TPTerm)
