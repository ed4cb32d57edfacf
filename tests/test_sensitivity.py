"""ci/di partial-sensitivity variants (reference MatchSensitivity.java:12-17,
82-95): `%c`-only = case-sensitive + diacritics-INsensitive (di), `%d`-only =
diacritics-sensitive + case-INsensitive (ci), `%cd` = fully sensitive,
no flags = fully insensitive. Flag combination mirrors MatchSensitivity.get
(c/d turn a sensitivity ON, C/D force it OFF, legacy s/i set both)."""

import pytest

from blacklab_spark import bcql


@pytest.fixture(scope="module")
def accent_index(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    pages = spark.createDataFrame(
        [("doc://0", "Café café cafe CAFE Cafe pêche")],
        "url string, text string",
    ).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("und").alias("lang"),
    )
    out = str(tmp_path_factory.mktemp("ix_accent"))
    build_index(spark, pages, out, n_shards=1, block_size=4)
    return Index(spark, out)


def hs(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.collect()}


def pos(ix, q):
    return {s for (_, s, _e) in hs(bcql.find(ix, q))}


# token positions: Café=0 café=1 cafe=2 CAFE=3 Cafe=4 pêche=5


def test_insensitive_default(accent_index):
    assert pos(accent_index, '"café"') == {0, 1, 2, 3, 4}


def test_fully_sensitive_cd(accent_index):
    assert pos(accent_index, '"café"%cd') == {1}
    assert pos(accent_index, '"Café"%cd') == {0}


def test_c_only_is_diacritics_insensitive(accent_index):
    # %c: case must match, accents are stripped (DIACRITICS_INSENSITIVE):
    # di('Café') = 'Cafe' -> matches Café and Cafe, not café/cafe/CAFE
    assert pos(accent_index, '"Café"%c') == {0, 4}
    assert pos(accent_index, '"cafe"%c') == {1, 2}
    assert pos(accent_index, '"CAFE"%c') == {3}


def test_d_only_is_case_insensitive(accent_index):
    # %d: accents must match, case is folded (CASE_INSENSITIVE):
    # ci('café') = 'café' -> matches Café and café only
    assert pos(accent_index, '"café"%d') == {0, 1}
    assert pos(accent_index, '"cafe"%d') == {2, 3, 4}
    assert pos(accent_index, '"pÊche"%d') == {5}


def test_uppercase_flags_force_off(accent_index):
    # %cD == %c (D forces diacritics-insensitive, already the default with c)
    assert pos(accent_index, '"Café"%cD') == pos(accent_index, '"Café"%c')
    # %cC ends case-insensitive -> full i
    assert pos(accent_index, '"café"%cC') == {0, 1, 2, 3, 4}


def test_regex_ci(accent_index):
    # ci regex: (?i) against the surface term — diacritics significant
    assert pos(accent_index, '"cafe|zzz"%d') == {2, 3, 4}
    assert pos(accent_index, '"café|zzz"%d') == {0, 1}


def test_regex_di(accent_index):
    # di regex: pattern against the accent-stripped surface term (JVM-side
    # translate map, tokenize.di_translate_args) — case significant
    assert pos(accent_index, '"cafe|zzz"%c') == {1, 2}
    assert pos(accent_index, '"Cafe|zzz"%c') == {0, 4}
    assert pos(accent_index, '"CAFE|zzz"%c') == {3}
    # an accented pattern is desensitized too (reference optInsensitive)
    assert pos(accent_index, '"café|zzz"%c') == {1, 2}
    assert pos(accent_index, '"pe.he"%c') == {5}
    # prefix-rewrite path through the translated column
    assert pos(accent_index, '"pec.*"%c') == {5}


def test_di_translate_parity():
    # the Spark translate() map reproduces accent_fold_token exactly over
    # the tokenizer-reachable ranges
    from blacklab_spark.tokenize import accent_fold_token, di_translate_args

    src, dst = di_translate_args()
    table = {ord(s): (dst[i] if i < len(dst) else None) for i, s in enumerate(src)}
    # includes combining marks INSIDE the scanned ranges (ADVICE r4: Cyrillic
    # U+0483 titlo folds to '' and must be deleted, not passed through)
    for w in [
        "Café", "pêche", "ÀÉÎÕÜ", "ǘǎ", "Ёжик", "άλφα", "naïve", "plain",
        "сло҃во", "а҆б́в",
    ]:
        assert w.translate(table) == accent_fold_token(w)

    # exhaustive single-char parity over every scanned-range codepoint whose
    # fold is length <= 1 (multi-char decompositions documented divergence)
    for lo, hi in [(0x00C0, 0x024F), (0x0370, 0x03FF), (0x0400, 0x04FF), (0x1E00, 0x1FFF)]:
        for cp in range(lo, hi + 1):
            ch = chr(cp)
            folded = accent_fold_token(ch)
            if len(folded) <= 1:
                assert ch.translate(table) == folded, hex(cp)


def test_or_fast_path_respects_sens(accent_index):
    # same-sens term disjunction routes through one postings union
    assert pos(accent_index, '"Café"%c | "CAFE"%c') == {0, 3, 4}
    # mixed-sens clauses still combine correctly (no fast path)
    assert pos(accent_index, '"Café"%cd | "CAFE"%c') == {0, 3}


def test_serialization_roundtrip():
    for q in ('"café"%c', '"café"%d', '"café"%cd', '"café"'):
        tp = bcql.parse(q)
        assert bcql.parse(bcql.to_cql(tp)) == tp
        assert bcql.from_dict(bcql.to_dict(tp)) == tp
