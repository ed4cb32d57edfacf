"""Annotated ingestion end-to-end (reference: DocIndexerCoNLLU + the
TestIndex corpus where lemma/pos come WITH the input): CoNLL-U files ->
annotated pages -> index -> the reference's own fixture queries
([lemma="be" & word="are"] hits.js:65, '"a" [lemma="successful"]' hits.js:53,
dependency relations)."""

import pytest
from pyspark.sql import functions as F

from blacklab_spark import bcql

CONLLU = """\
# newdoc id = d0
# sent_id = 1
1\tThe\tthe\tDET\t_\t_\t2\tdet\t_\t_
2\tresults\tresult\tNOUN\t_\t_\t3\tnsubj\t_\t_
3\tare\tbe\tAUX\t_\t_\t0\troot\t_\t_
4\ta\ta\tDET\t_\t_\t6\tdet\t_\t_
5\tsuccessful\tsuccessful\tADJ\t_\t_\t6\tamod\t_\t_
6\ttest\ttest\tNOUN\t_\t_\t3\tattr\t_\t_
7\t.\t.\tPUNCT\t_\t_\t3\tpunct\t_\t_

# sent_id = 2
1\tIt\tit\tPRON\t_\t_\t2\tnsubj\t_\t_
2\tis\tbe\tAUX\t_\t_\t0\troot\t_\t_
3\tdone\tdo\tVERB\t_\t_\t2\txcomp\t_\t_

# newdoc id = d1
# sent_id = 1
1\tThey\tthey\tPRON\t_\t_\t2\tnsubj\t_\t_
2\twere\tbe\tAUX\t_\t_\t0\troot\t_\t_
3\tsuccessful\tsuccessful\tADJ\t_\t_\t2\tacomp\t_\t_
"""


@pytest.fixture(scope="module")
def conllu_index(spark, tmp_path_factory):
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index
    from blacklab_spark.sources import pages_from_conllu

    d = tmp_path_factory.mktemp("conllu")
    (d / "corpus.conllu").write_text(CONLLU)
    pages = pages_from_conllu(spark, str(d))
    out = str(tmp_path_factory.mktemp("ix_conllu"))
    build_index(
        spark, pages, out, n_shards=2, block_size=4,
        annotations=("word", "lemma", "pos"),
    )
    return Index(spark, out)


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.select("doc_id", "start", "end").collect()}


def test_input_layers_recorded(conllu_index):
    assert conllu_index.segments[0].meta["input_layers"] == ["lemma", "pos"]
    assert conllu_index.n_docs == 2


def test_lemma_and_word_conjunction(conllu_index):
    # the reference fixture: [lemma="be" & word="are"] (hits.js:65)
    got = hs(bcql.find(conllu_index, '[lemma="be" & word="are"]'))
    assert got == {(0, 2, 3)}
    # and the negated variant (hits.js:66)
    got2 = hs(bcql.find(conllu_index, '[lemma="be" & word!="are"]'))
    assert got2 == {(0, 8, 9), (1, 1, 2)}  # is@8 doc0, were@1 doc1


def test_sequence_with_input_lemma(conllu_index):
    # the reference fixture: '"a" [lemma="successful"]' (hits.js:53)
    got = hs(bcql.find(conllu_index, '"a" [lemma="successful"]'))
    assert got == {(0, 3, 5)}


def test_input_pos_layer(conllu_index):
    got = hs(bcql.find(conllu_index, '[pos="AUX"]'))
    assert got == {(0, 2, 3), (0, 8, 9), (1, 1, 2)}


def test_input_sentence_spans(conllu_index):
    sents = hs(conllu_index.tag_hits("s"))
    assert sents == {(0, 0, 7), (0, 7, 10), (1, 0, 3)}
    # phrase may not cross sentence boundary
    got = hs(bcql.find(conllu_index, '[pos="PUNCT"] "It" within <s/>'))
    assert got == set()


def test_input_dependency_relations(conllu_index):
    # 2-nsubj->: 'results' is nsubj of 'are' (head 3 -> src=[2,3), tgt=[1,2))
    got = hs(bcql.find(conllu_index, '_ -nsubj-> _'))
    assert got == {(0, 1, 3), (0, 7, 9), (1, 0, 2)}
    src_mode = hs(bcql.find(conllu_index, 'rspan(_ -nsubj-> "results", "source")'))
    assert src_mode == {(0, 2, 3)}  # 'are'


def test_child_relation_list(conllu_index):
    # `;` child list (cql.jj:289-290 -> TextPatternRelationMatch): the shared
    # source must carry ALL listed child relations; result = source span
    got = hs(bcql.find(conllu_index, '_ -nsubj-> _ ; -attr-> _'))
    assert got == {(0, 2, 3)}  # 'are' governs both nsubj and attr
    got = hs(bcql.find(conllu_index, '_ -nsubj-> _ ; -acomp-> _'))
    assert got == {(1, 1, 2)}  # 'were'
    got = hs(bcql.find(conllu_index, '_ -nsubj-> "results" ; -punct-> _'))
    assert got == {(0, 2, 3)}
    got = hs(bcql.find(conllu_index, '_ -nsubj-> _ ; -nope-> _'))
    assert got == set()
    tp = bcql.parse('_ -nsubj-> _ ; -attr-> _')
    assert isinstance(tp, bcql.TPRelMatch)
    assert bcql.from_dict(bcql.to_dict(tp)) == tp
    assert bcql.parse(bcql.to_cql(tp)) == tp


def test_unique_relations_required(conllu_index):
    # SpansAndMultiUniqueRelations.java:308-319: each clause must be
    # satisfied by a DISTINCT relation. 'are' governs exactly one nsubj
    # edge, so a two-clause list both naming nsubj can never match ...
    assert hs(bcql.find(conllu_index, '_ -nsubj-> _ ; -nsubj-> _')) == set()
    # ... and regex types whose only common witness is that single edge
    # (ns.* and .*j both match nsubj alone here) must not match either
    assert hs(bcql.find(conllu_index, '_ -ns.*-> _ ; -.*j-> _')) == set()
    # distinct edges (nsubj + attr) still satisfy overlapping regexes:
    # clause1 takes attr, clause2 must take nsubj
    got = hs(bcql.find(conllu_index, '_ -n.*|attr-> _ ; -n.*-> _'))
    assert (0, 2, 3) in got


def test_settings_relationclass(conllu_index):
    # @rc= / @relationclass= set the default relation class for bare types
    # (TextPatternSettings.java:33-40); CoNLL-U relations carry class 'dep',
    # so qualifying with the right class is a no-op and a wrong class (or a
    # wrong explicit `cls::type`) matches nothing
    base = hs(bcql.find(conllu_index, '_ -nsubj-> _'))
    assert base
    assert hs(bcql.find(conllu_index, '@rc=dep _ -nsubj-> _')) == base
    assert hs(bcql.find(conllu_index, '@relationclass=dep _ -nsubj-> _')) == base
    assert hs(bcql.find(conllu_index, '_ -dep::nsubj-> _')) == base
    assert hs(bcql.find(conllu_index, '@rc=foo _ -nsubj-> _')) == set()
    assert hs(bcql.find(conllu_index, '_ -foo::nsubj-> _')) == set()
    # explicit cls::type wins over the setting
    assert hs(bcql.find(conllu_index, '@rc=foo _ -dep::nsubj-> _')) == base
    # the qualified spelling round-trips
    tp = bcql.parse('_ -dep::nsubj-> _')
    assert bcql.parse(bcql.to_cql(tp)) == tp
    assert bcql.from_dict(bcql.to_dict(tp)) == tp
    # child lists inherit the default class
    assert hs(bcql.find(conllu_index, '@rc=foo _ -n.*|attr-> _ ; -n.*-> _')) == set()


def test_rmatch_full_span_mode(conllu_index):
    # rmatch() over whole relation queries ANDs the clauses' OWN (full)
    # spans (XFRelations.java:137-142): nsubj at 'are' spans (1,3), attr
    # spans (2,6) — they never coincide, unlike the source-mode `;` list
    tp = bcql.parse('rmatch(_ -nsubj-> _, _ -attr-> _)')
    assert isinstance(tp, bcql.TPRelMatch) and tp.child_mode == "full"
    assert bcql.from_dict(bcql.to_dict(tp)) == tp
    assert bcql.parse(bcql.to_cql(tp)) == tp
    assert hs(bcql.find(conllu_index, 'rmatch(_ -nsubj-> _, _ -attr-> _)')) == set()


def test_rmatch_function(conllu_index):
    # rmatch(c1, c2, ...): AND over relation clauses (XFRelations.rmatch);
    # equivalent to the `;` child-list on source-mode spans
    got = hs(bcql.find(
        conllu_index,
        'rmatch(rspan(_ -nsubj-> _, "source"), rspan(_ -attr-> _, "source"))',
    ))
    assert got == hs(bcql.find(conllu_index, '_ -nsubj-> _ ; -attr-> _'))
    assert got == {(0, 2, 3)}


def test_rcapture_relations_in_span(conllu_index):
    # rcapture(<s/>, "rels", "nsubj"): every sentence span carries the list
    # of nsubj relations it contains (XFRelations.rcapture)
    rows = bcql.find(conllu_index, 'rcapture(<s/>, "rels", "nsubj")').collect()
    got = {(r["doc_id"], r["start"], r["end"]): r["rels"] for r in rows}
    assert set(got) == {(0, 0, 7), (0, 7, 10), (1, 0, 3)}
    assert all(len(v) == 1 and v[0]["rtype"] == "nsubj" for v in got.values())
    # no matching relations -> empty list, hits kept
    rows = bcql.find(conllu_index, 'rcapture(<s/>, "rels", "nope")').collect()
    assert len(rows) == 3 and all(r["rels"] == [] for r in rows)
    # serialization roundtrip
    tp = bcql.parse('rcapture(<s/>, "rels", "nsubj")')
    assert bcql.from_dict(bcql.to_dict(tp)) == tp
    assert bcql.parse(bcql.to_cql(tp)) == tp


def test_rcapture2_within_capture_group(conllu_index):
    # rcapture2: relations inside the NAMED capture's span, not the hit span.
    # A:<s/> [] — hit = sentence + 1 token, A = the sentence; relations are
    # collected within A only (same sets as per-sentence rcapture).
    rows = bcql.find(
        conllu_index, 'rcapture2(A:<s/> [], "A", "rels", "nsubj")'
    ).collect()
    assert rows and all(
        len(r["rels"]) == 1 and r["rels"][0]["rtype"] == "nsubj" for r in rows
    )
    # unknown capture name fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no capture group"):
        bcql.find(conllu_index, 'rcapture2(<s/>, "NOPE", "rels")').collect()
    # serialization roundtrip
    tp = bcql.parse('rcapture2(A:<s/>, "A", "rels", "nsubj")')
    assert bcql.from_dict(bcql.to_dict(tp)) == tp
    assert bcql.parse(bcql.to_cql(tp)) == tp


def test_punct_tokens_preserved(conllu_index):
    # input token streams keep punctuation tokens (position parity with the
    # reference's annotated corpora)
    assert hs(conllu_index.term_hits(".", fold=False)) == {(0, 6, 7)}


def test_compact_preserves_annotated_streams(spark, tmp_path_factory, conllu_index):
    """Compacting an annotated-input index must not re-tokenize: punctuation
    tokens, input lemma/pos, sentence spans and relations all survive."""
    import json
    import shutil

    from blacklab_spark.build import compact
    from blacklab_spark.query import Index

    src_dir = conllu_index.dir
    out = str(tmp_path_factory.mktemp("ix_conllu_compact"))
    shutil.copytree(src_dir, out, dirs_exist_ok=True)
    compact(spark, out, n_shards=2, block_size=4)
    ix2 = Index(spark, out)
    assert hs(ix2.term_hits(".", fold=False)) == {(0, 6, 7)}  # punct survives
    assert hs(bcql.find(ix2, '[lemma="be" & word="are"]')) == {(0, 2, 3)}
    assert hs(ix2.tag_hits("s")) == {(0, 0, 7), (0, 7, 10), (1, 0, 3)}
    assert hs(bcql.find(ix2, '_ -nsubj-> _')) == {(0, 1, 3), (0, 7, 9), (1, 0, 2)}
