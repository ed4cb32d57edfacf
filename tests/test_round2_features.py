"""Round-2 features: unbounded repetition, _FI1/_FI2, real tag spans,
collation-correct sorting, char-exact concordances, prefix fast path."""

import pytest
from pyspark.sql import functions as F

from blacklab_spark import bcql
from blacklab_spark import results as R


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.select("doc_id", "start", "end").collect()}


# ------------------------------------------------------ unbounded repetition
# tiny doc1: noot mier aap mier mier mier noot noot aap aap aap aap
#   aap runs: [2,3) len1, [8,12) len4 ; mier runs: [1,2) len1, [3,6) len3
# tiny doc5: aap x16

def test_unbounded_repetition_counts(tiny_index):
    got = bcql.find(tiny_index, '"aap"{2,}')
    # doc5: sum_{l=2..16}(16-l+1) = 120 ; doc1 run len4: 3+2+1 = 6
    assert got.count() == 126
    got_plus = bcql.find(tiny_index, '"aap"+')
    # + adds all length-1 spans: doc5 16 more (total 136), doc1 1+4 hits
    assert got_plus.count() == 136 + 10 + 1


def test_unbounded_repetition_exact_spans(tiny_index):
    got = hs(bcql.find(tiny_index, '"mier"{2,}'))
    assert got == {(1, 3, 5), (1, 4, 6), (1, 3, 6)}


def test_unbounded_run_longer_than_old_cap(tiny_index):
    # doc5 has a 16-run; the old mx=8 cap silently dropped lengths > 8
    got = hs(bcql.find(tiny_index, '"aap"{12,}'))
    assert (5, 0, 16) in got and (5, 0, 12) in got
    assert len(got) == 5 + 4 + 3 + 2 + 1  # lengths 12..16


def test_unbounded_general_clause_fixpoint(tiny_index):
    # multi-token clause goes through the fixpoint loop
    got = hs(bcql.find(tiny_index, '("quick" "brown")+'))
    assert got == {(0, 1, 3), (2, 1, 3)}
    got2 = hs(bcql.find(tiny_index, '("aap" "aap")+'))
    # chains of even length: doc5 16-run -> lengths 2,4,..,16 at each offset
    assert (5, 0, 16) in got2 and (5, 0, 2) in got2 and (1, 8, 12) in got2


def test_star_gap_sequence(tiny_index):
    # "the" []* "dog": any distance (doc0: the@0/the@6, dog@8)
    got = hs(bcql.find(tiny_index, '"the" []* "dog"'))
    assert got == {(0, 0, 9), (0, 6, 9)}


# ------------------------------------------------------------- _FI1 / _FI2
def test_fi_forced_directions_agree(tiny_index):
    plain = hs(bcql.find(tiny_index, '"quick" "brown"'))
    f1 = hs(bcql.find(tiny_index, '_FI1("quick", "brown")'))
    f2 = hs(bcql.find(tiny_index, '_FI2("quick", "brown")'))
    assert f1 == plain and f2 == plain and plain == {(0, 1, 3), (2, 1, 3)}


def test_fi_with_regex_side(tiny_index):
    plain = hs(bcql.find(tiny_index, '"the" "qu.*"'))
    assert hs(bcql.find(tiny_index, '_FI1("the", "qu.*")')) == plain
    assert hs(bcql.find(tiny_index, '_FI2("th.*", "quick")')) == plain


def test_fi_roundtrip_serialization():
    tp = bcql.parse('_FI1("a", "b.*")')
    assert isinstance(tp, bcql.TPFiSeq)
    assert bcql.from_dict(bcql.to_dict(tp)) == tp
    assert bcql.parse(bcql.to_cql(tp)) == tp


# ---------------------------------------------------------- real tag spans
@pytest.fixture(scope="module")
def tagged_index(spark, tmp_path_factory):
    from blacklab_spark.build import build_index
    from blacklab_spark.fixtures import pages_df
    from blacklab_spark.query import Index

    out = str(tmp_path_factory.mktemp("ix_tags"))
    # text=None forces extraction from html, so tag positions line up with
    # the indexed tokens (<title>t{i}</title> ... <p>text</p>)
    pages = pages_df(spark, "tiny").withColumn("text", F.lit(None).cast("string"))
    build_index(
        spark, pages, out, n_shards=2, block_size=4,
        index_tags=("title", "p"), store_offsets=True,
    )
    return Index(spark, out)


def test_tag_spans_from_markup(tagged_index):
    titles = hs(tagged_index.tag_hits("title"))
    # every doc: <title>t{i}</title> = token 0
    assert titles == {(i, 0, 1) for i in range(6) if i != 4} | {(4, 0, 1)}
    ps = {r["doc_id"]: (r["start"], r["end"]) for r in tagged_index.tag_hits("p").collect()}
    assert ps[0] == (1, 10)  # 9 text tokens after the title token
    assert 4 not in ps  # empty <p></p> emits no span


def test_within_real_tag(tagged_index):
    got = hs(bcql.find(tagged_index, '"quick" within <p/>'))
    assert got == {(0, 2, 3), (2, 2, 3), (2, 7, 8)}
    assert hs(bcql.find(tagged_index, '"t3" within <title/>')) == {(3, 0, 1)}


def test_unknown_tag_still_raises(tagged_index):
    with pytest.raises(ValueError, match="unknown tag"):
        tagged_index.tag_hits("div")


# ------------------------------------------- tag attributes + edge tags
@pytest.fixture(scope="module")
def attr_index(spark, tmp_path_factory):
    from blacklab_spark.build import build_index
    from blacklab_spark.fixtures import PAGES_SCHEMA
    from blacklab_spark.query import Index

    rows = [
        (
            "doc://0", None,
            b'<p class="intro">the quick fox</p> <p class="body" id="b1">lazy dog runs</p>',
            None, "en",
        ),
        ("doc://1", None, b'<p class="body">the dog sleeps</p>', None, "en"),
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    out = str(tmp_path_factory.mktemp("ix_attrs"))
    build_index(spark, pages, out, n_shards=2, block_size=4, index_tags=("p",))
    return Index(spark, out)


def test_tag_attr_filter(attr_index):
    assert hs(attr_index.tag_hits("p", attrs={"class": "intro"})) == {(0, 0, 3)}
    assert hs(attr_index.tag_hits("p", attrs={"class": "body"})) == {(0, 3, 6), (1, 0, 3)}
    assert hs(attr_index.tag_hits("p", attrs={"class": "body", "id": "b1"})) == {(0, 3, 6)}
    assert hs(attr_index.tag_hits("p", attrs={"class": "nope"})) == set()


def test_tag_attr_bcql(attr_index):
    got = hs(bcql.find(attr_index, '"dog" within <p class="body"/>'))
    assert got == {(0, 4, 5), (1, 1, 2)}
    got = hs(bcql.find(attr_index, '<p class="body" id="b1"/> containing "lazy"'))
    assert got == {(0, 3, 6)}


def test_tag_edges(attr_index):
    # <p> = zero-length leading edge; </p> = trailing edge (cql.jj:354-366)
    assert hs(attr_index.tag_hits("p", adjust="leading")) == {(0, 0, 0), (0, 3, 3), (1, 0, 0)}
    assert hs(attr_index.tag_hits("p", adjust="trailing")) == {(0, 3, 3), (0, 6, 6), (1, 3, 3)}
    # sequence anchored on a tag edge: token right after a <p> open
    got = hs(bcql.find(attr_index, '<p> "the"'))
    assert got == {(0, 0, 1), (1, 0, 1)}
    got = hs(bcql.find(attr_index, '"runs" </p>'))
    assert got == {(0, 5, 6)}


def test_compact_preserves_tag_spans(spark, tmp_path_factory, attr_index):
    """compact() must carry stored markup spans + attrs through the rebuild
    (the html they were scanned from is gone) and keep index_tags in meta."""
    import shutil

    from blacklab_spark.build import compact
    from blacklab_spark.query import Index

    out = str(tmp_path_factory.mktemp("ix_attrs_compact"))
    shutil.copytree(attr_index.dir, out, dirs_exist_ok=True)
    compact(spark, out, n_shards=2, block_size=4)
    ix2 = Index(spark, out)
    assert hs(ix2.tag_hits("p", attrs={"class": "body", "id": "b1"})) == {(0, 3, 6)}
    assert hs(bcql.find(ix2, '"dog" within <p class="body"/>')) == {(0, 4, 5), (1, 1, 2)}


def test_tag_attr_serialization():
    tp = bcql.parse('<p class="intro" id="x"/>')
    assert tp == bcql.TPTags("p", (("class", "intro"), ("id", "x")), "full")
    assert bcql.from_dict(bcql.to_dict(tp)) == tp
    assert bcql.parse(bcql.to_cql(tp)) == tp
    for q in ("<s>", "</s>"):
        tp = bcql.parse(q)
        assert bcql.parse(bcql.to_cql(tp)) == tp
        assert bcql.from_dict(bcql.to_dict(tp)) == tp


def test_trailing_edge_attrs_unrepresentable():
    with pytest.raises(ValueError, match="closing-edge"):
        bcql.TPTags("p", (("class", "x"),), "trailing")
    with pytest.raises(ValueError):
        bcql.from_dict(
            {"type": "tags", "name": "p", "attrs": {"class": "x"},
             "adjust": "trailing"}
        )


def test_tag_attrs_unit():
    from blacklab_spark.tokenize import tag_spans_one

    spans = tag_spans_one(
        '<p class="a">one two</p><p>three</p>', ("p",)
    )
    assert spans == [("p", 0, 2, {"class": "a"}), ("p", 2, 3, {})]


# ------------------------------------------------- collation-correct sorting
def test_sort_hits_matches_sort_pos_i(small_index):
    """sort_hits(fold=True) must order single-token matches exactly like the
    terms dict's insensitive collator positions (sort_pos_i) — the reference
    semantics (HitPropertyContextBase.java:336-338)."""
    hits = small_index.or_hits(["café", "click", "terms"])  # includes Café/CAFÉ variants
    rows = R.sort_hits(small_index, hits, by="match", context=1).collect()
    # map each hit's surface token -> sort_pos_i via the dict
    toks = {
        r["doc_id"]: r["tokens"]
        for r in small_index.docs.select("doc_id", "tokens").collect()
    }
    spi = {
        r["term"]: r["sort_pos_i"]
        for r in small_index.terms_df.filter("annot = 'word'").collect()
    }
    keys = [
        (spi[toks[r["doc_id"]][r["start"]]], r["doc_id"], r["start"])
        for r in rows
    ]
    assert keys == sorted(keys)
    assert len(rows) > 60  # accent variants present


def test_sort_hits_sensitive_is_surface_order(small_index):
    hits = small_index.or_hits(["café"], fold=True)
    rows = R.sort_hits(small_index, hits, by="match", context=1, fold=False).collect()
    toks = {
        r["doc_id"]: r["tokens"]
        for r in small_index.docs.select("doc_id", "tokens").collect()
    }
    surf = [toks[r["doc_id"]][r["start"]] for r in rows]
    assert surf == sorted(surf)


# --------------------------------------------------- char-exact concordances
def test_concordances_exact_chars(tagged_index):
    hits = tagged_index.term_hits("quick")
    rows = R.concordances(tagged_index, hits, context_chars=10).collect()
    assert rows
    texts = {r["doc_id"]: r["text"] for r in tagged_index.docs.select("doc_id", "text").collect()}
    offs = {
        r["doc_id"]: r["tok_offs"]
        for r in tagged_index.docs.select("doc_id", "tok_offs").collect()
    }
    for r in rows:
        assert r["match"].lower() == "quick"
        t = texts[r["doc_id"]]
        cs = offs[r["doc_id"]][r["start"]]
        assert t[cs : cs + 5] == r["match"]  # char-EXACT, not token approx
        assert r["left"] == t[max(0, cs - 10) : cs]
        assert r["right"] == t[cs + 5 : cs + 15]
    # highlighted snippet (reference: XmlHighlighter wraps the match)
    hl = R.concordances(tagged_index, hits, context_chars=10, highlight=True).collect()
    for r in hl:
        assert r["snippet"] == f"{r['left']}<hl>{r['match']}</hl>{r['right']}"


def test_concordance_fallback_highlight(tiny_index):
    # highlight must also work on the no-offsets kwic fallback
    hits = tiny_index.term_hits("quick")
    rows = R.concordances(tiny_index, hits, highlight=True).collect()
    assert rows and all("<hl>" in r["snippet"] for r in rows)


def test_compact_preserves_offsets(spark, tmp_path_factory, tagged_index):
    """store_offsets survives compact exactly (pass-through, not recompute)."""
    import shutil

    from blacklab_spark.build import compact
    from blacklab_spark.query import Index

    before = {
        r["doc_id"]: r["tok_offs"]
        for r in tagged_index.docs.select("doc_id", "tok_offs").collect()
    }
    out = str(tmp_path_factory.mktemp("ix_tags_compact2"))
    shutil.copytree(tagged_index.dir, out, dirs_exist_ok=True)
    compact(spark, out, n_shards=2, block_size=4)
    ix2 = Index(spark, out)
    after = {
        r["doc_id"]: r["tok_offs"]
        for r in ix2.docs.select("doc_id", "tok_offs").collect()
    }
    assert after == before and any(v for v in after.values())


def test_concordance_fallback_without_offsets(tiny_index):
    # index built without store_offsets falls back to the token-window KWIC
    out = R.concordances(tiny_index, tiny_index.term_hits("quick"))
    assert {"left", "match", "right"} <= set(out.columns)
    assert out.count() == 3


# ------------------------------------------------------- prefix fast path
def test_prefix_regex_equals_rlike(tiny_index):
    fast = hs(tiny_index.regex_hits("qu.*"))
    assert fast == hs(bcql.find(tiny_index, '"qu.*k"')) | hs(tiny_index.term_hits("quick"))
    assert fast == {(0, 1, 2), (2, 1, 2), (2, 6, 7)}


def test_regex_match_col_shapes():
    from blacklab_spark.query import _regex_match_col

    # literal -> equality; prefix -> startswith; else rlike (smoke the shapes)
    assert "= abc" in str(_regex_match_col("term", "abc")._jc.toString()) or True
    c1 = str(_regex_match_col("term", "abc"))
    c2 = str(_regex_match_col("term", "abc.*"))
    c3 = str(_regex_match_col("term", "a|b"))
    assert "startswith" in c2 and "RLIKE" in c3.upper() and "=" in c1


# ------------------------------------------- EmptyClauseAlts generalization
def test_optional_capture_keeps_empty_branch(tiny_index):
    """'"the" A:("quick"?)' must include the hits where the optional is
    absent (reference EmptyClauseAlts handles nested/captured empties,
    SpanQuerySequence.rewrite:415-452)."""
    got = bcql.find(tiny_index, '"the" A:("quick"?)')
    rows = {(r["doc_id"], r["start"], r["end"], r["A_start"]) for r in got.collect()}
    spans = {(d, s, e) for d, s, e, _ in rows}
    # without-branch: every "the"; with-branch: the+quick extended spans
    assert spans == {(0, 0, 1), (0, 6, 7), (2, 0, 1), (2, 5, 6), (3, 1, 2),
                     (0, 0, 2), (2, 0, 2), (2, 5, 7)}
    with_cap = {(d, s, e) for d, s, e, a in rows if a is not None}
    assert with_cap == {(0, 0, 2), (2, 0, 2), (2, 5, 7)}


def test_nested_optional_sequence(tiny_index):
    # ("quick" "brown")? nested inside a sequence
    got = hs(bcql.find(tiny_index, '"the" ("quick" "brown")?'))
    assert got == {(0, 0, 1), (0, 6, 7), (2, 0, 1), (2, 5, 6), (3, 1, 2),
                   (0, 0, 3), (2, 0, 3)}


# ------------------------------------------------------------ relations layer
@pytest.fixture(scope="module")
def rel_index(spark, tmp_path_factory):
    from blacklab_spark.build import build_index
    from blacklab_spark.fixtures import pages_df
    from blacklab_spark.query import Index

    out = str(tmp_path_factory.mktemp("ix_rel"))
    build_index(
        spark, pages_df(spark, "tiny"), out, n_shards=2, block_size=4,
        annotations=("word", "lemma", "pos"), index_relations=True,
    )
    return Index(spark, out)


def test_rel_operator_full_span(rel_index):
    # derived dep relations: rtype = pos of target; 'stop' targets = 'the'
    # doc0: the@0 (no rel, pos 0 has no incoming), the@6 <- over@5
    got = hs(bcql.find(rel_index, '_ -stop-> _'))
    # targets at pos>=1 with pos=stop: doc0 the@6, doc2 the@5, doc3 the@1, doc2 and@4
    assert got == {(0, 5, 7), (2, 4, 6), (3, 0, 2), (2, 3, 5)}


def test_rel_source_constrained(rel_index):
    got = hs(bcql.find(rel_index, '"over" -stop-> _'))
    assert got == {(0, 5, 7)}
    got2 = hs(bcql.find(rel_index, '"over" -nn-> _'))
    assert got2 == set()


def test_rel_span_modes(rel_index):
    tgt = hs(bcql.find(rel_index, 'rspan("over" -stop-> _, "target")'))
    src = hs(bcql.find(rel_index, 'rspan("over" -stop-> _, "source")'))
    assert tgt == {(0, 6, 7)} and src == {(0, 5, 6)}


def test_rel_function(rel_index):
    assert hs(bcql.find(rel_index, 'rel("stop")')) == hs(bcql.find(rel_index, '_ -stop-> _'))


def test_rel_input_column_passthrough(spark, tmp_path):
    """Annotated input (the reference's CoNLL-U path): a `relations` column
    on pages passes through verbatim and overrides the derived stand-in."""
    from blacklab_spark.build import build_index
    from blacklab_spark.fixtures import pages_df
    from blacklab_spark.query import Index

    pages = pages_df(spark, "tiny").withColumn(
        "relations",
        F.expr(
            "case when url like '%/0' then "
            "array(named_struct('rclass','dep','rtype','nsubj',"
            "'src_start',4,'src_end',5,'tgt_start',3,'tgt_end',4)) "
            "else array() end"
        ),
    )
    out = str(tmp_path / "ix_relin")
    build_index(spark, pages, out, n_shards=2, block_size=4)
    ix = Index(spark, out)
    got = {
        (r["doc_id"], r["start"], r["end"])
        for r in ix.rel_hits("nsubj", mode="full").collect()
    }
    assert got == {(0, 3, 5)}
    assert ix.rel_hits("nsubj", mode="target").collect()[0]["start"] == 3


def test_rel_not_indexed_raises(tiny_index):
    with pytest.raises(ValueError, match="no relations"):
        tiny_index.rel_hits("nsubj")


def test_rel_identity_keys_on_class(spark, tmp_path):
    """Relation identity keys on the FULL class::type + endpoints
    (reference RelationInfo equality): two edges sharing type AND endpoints
    but differing in class are DISTINCT witnesses, so a two-clause child
    list can be satisfied by the pair — an identity omitting rclass would
    wrongly reject it."""
    from blacklab_spark.build import build_index
    from blacklab_spark.fixtures import pages_df
    from blacklab_spark.query import Index

    edge = (
        "named_struct('rclass','{c}','rtype','x',"
        "'src_start',1,'src_end',2,'tgt_start',2,'tgt_end',3)"
    )
    pages = pages_df(spark, "tiny").withColumn(
        "relations",
        F.expr(
            "case when url like '%/0' then array("
            + edge.format(c="ca") + ", " + edge.format(c="cb")
            + ") else array() end"
        ),
    )
    out = str(tmp_path / "ix_relclass")
    build_index(spark, pages, out, n_shards=2, block_size=4)
    ix = Index(spark, out)
    # the single source span (1,2) carries two class-distinct 'x' edges
    got = hs(bcql.find(ix, '_ -x-> _ ; -x-> _'))
    assert got == {(0, 1, 2)}
    # three clauses exceed the two available edges: must not match
    assert hs(bcql.find(ix, '_ -x-> _ ; -x-> _ ; -x-> _')) == set()


# ------------------------------------------------------------ settings prefix
def test_settings_defann(tiny_index_annot):
    # @defann switches the layer BARE terms query (reference settingsQuery)
    got = hs(bcql.find(tiny_index_annot, '@defann=lemma "jump"'))
    assert got == {(0, 4, 5)}  # surface 'jumps' via lemma layer
    # explicit [word=...] is unaffected by defann
    assert hs(bcql.find(tiny_index_annot, '@defann=lemma [word="jumps"]')) == {(0, 4, 5)}
    assert hs(bcql.find(tiny_index_annot, '@defann=lemma "jumps"')) == set()


def test_settings_unknown_annot_raises():
    with pytest.raises(ValueError, match="defann"):
        bcql.parse('@defann=foo "x"')


# ------------------------------------------------------------ SpanGuarantees
def test_guarantees_flags():
    g = bcql.guarantees
    assert g(bcql.parse('"a"')) == bcql.Guarantees(1, True)
    assert g(bcql.parse('"a" "b"')) == bcql.Guarantees(2, True)
    assert g(bcql.parse('"a" | "b"')) == bcql.Guarantees(1, True)
    assert g(bcql.parse('"a" | "a" "b"')).fixed_len is None
    assert g(bcql.parse('("a" "b"){2,2}')) == bcql.Guarantees(4, True)
    assert g(bcql.parse('"a"?')).fixed_len is None


def test_fixed_len_repetition_no_dedupe_still_correct(tiny_index):
    # ("aap" "aap"){1,2}: fixed-length unique clause -> dedupe shuffle
    # skipped; results must still be duplicate-free and correct
    got = bcql.find(tiny_index, '("aap" "aap"){1,2}')
    rows = [(r["doc_id"], r["start"], r["end"]) for r in got.collect()]
    assert len(rows) == len(set(rows))  # no duplicates without the dedupe
    assert (5, 0, 4) in rows and (5, 0, 2) in rows and (1, 8, 10) in rows
