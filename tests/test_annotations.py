"""Annotation layers (lemma/pos): build + query end-to-end.

Mirrors the reference's multi-annotation data model (one parallel layer per
annotation, AnnotatedFieldWriter.java:20-44) and its fixture queries
([pos='nou'] TestSearches.java:80; [lemma='be' & word='are'] hits.js:65-66).
Tiny corpus doc 0: the quick brown fox jumps over the lazy dog
  lemma: jumps->jump (strip -s); pos: the->stop, others nn.
"""

import pytest

from blacklab_spark import bcql
from blacklab_spark.tokenize import lemma_fold, pos_fold


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.select("doc_id", "start", "end").collect()}


@pytest.fixture(scope="module")
def annot_index(spark, tmp_path_factory):
    from blacklab_spark.build import build_index
    from blacklab_spark.fixtures import pages_df
    from blacklab_spark.query import Index

    out = str(tmp_path_factory.mktemp("ix_annot"))
    build_index(
        spark, pages_df(spark, "tiny"), out, n_shards=2, block_size=4,
        annotations=("word", "lemma", "pos"),
    )
    return Index(spark, out)


def test_tagger_rules():
    assert lemma_fold("jumps") == "jump"
    assert lemma_fold("running") == "runn"  # -s rule is checked first? no: -s doesn't match
    assert lemma_fold("filter") == "filt"
    assert lemma_fold("glass") == "glass"  # -ss excluded
    assert lemma_fold("is") == "is"  # too short
    assert pos_fold("the") == "stop"
    assert pos_fold("42") == "num"
    assert pos_fold("jumping") == "vb"
    assert pos_fold("dog") == "nn"


def test_lemma_select(annot_index):
    # [lemma="jump"] hits the surface token "jumps" (doc 0, pos 4)
    assert hs(bcql.find(annot_index, '[lemma="jump"]')) == {(0, 4, 5)}


def test_pos_select(annot_index):
    # [pos="stop"] = the(x5) + and(doc2@4) + at(? 'at' not in stoplist) ...
    got = hs(bcql.find(annot_index, '[pos="stop"]'))
    # the: (0,0),(0,6),(2,0),(2,5),(3,1); and: (2,4); at: no; be: no
    assert got == {(0, 0, 1), (0, 6, 7), (2, 0, 1), (2, 5, 6), (3, 1, 2), (2, 4, 5)}


def test_token_and_across_layers(annot_index):
    # [pos="stop" & word="the"] — token-level conjunction of two layers
    got = hs(bcql.find(annot_index, '[pos="stop" & word="the"]'))
    assert got == {(0, 0, 1), (0, 6, 7), (2, 0, 1), (2, 5, 6), (3, 1, 2)}


def test_lemma_in_sequence(annot_index):
    # "the" [lemma="lazy"] — mirrors '"a" [lemma="successful"]' (hits.js:53)
    got = hs(bcql.find(annot_index, '"the" [lemma="lazy"]'))
    assert got == {(0, 6, 8)}


def test_constraint_lemma_deref(annot_index):
    # capture deref through the lemma layer's forward index
    got = hs(bcql.find(annot_index, '"the" A:[] :: A.lemma = "quick"'))
    assert got == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_unknown_annot_raises(annot_index):
    with pytest.raises(ValueError, match="unknown annotation"):
        bcql.find(annot_index, '[foo="x"]')


def test_missing_layer_raises(tiny_index):
    # tiny_index is built word-only; lemma queries must fail loudly
    with pytest.raises(ValueError, match="not indexed"):
        bcql.find(tiny_index, '[lemma="jump"]')


def test_word_results_unchanged_with_layers(annot_index, tiny_index):
    for q in ('"the"', '"fox" []', '[word!="aap"]'):
        assert hs(bcql.find(annot_index, q)) == hs(bcql.find(tiny_index, q))
