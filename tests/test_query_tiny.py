"""Operator goldens on the 6-doc hand-written corpus vs the pinned oracle
(mirrors the reference's TestSearches golden style,
core/src/test/java/nl/inl/blacklab/search/TestSearches.java:61-134)."""


def hits(df):
    return sorted((r["doc_id"], r["start"], r["end"]) for r in df.collect())


def test_term(tiny_index, tiny_oracle):
    assert hits(tiny_index.term_hits("the")) == tiny_oracle.term_hits("the")


def test_term_sensitive(tiny_index, tiny_oracle):
    # 'The' occurs at doc starts; sensitive search must distinguish
    got = hits(tiny_index.term_hits("The", fold=False))
    assert got == tiny_oracle.term_hits("The", fold=False)
    assert got != tiny_oracle.term_hits("the", fold=False)


def test_or(tiny_index, tiny_oracle):
    assert hits(tiny_index.or_hits(["fox", "hare"])) == tiny_oracle.or_hits("fox", "hare")


def test_regex(tiny_index, tiny_oracle):
    assert hits(tiny_index.regex_hits("qu.*k")) == tiny_oracle.regex_hits("qu.*k")


def test_phrase(tiny_index, tiny_oracle):
    assert hits(tiny_index.phrase_hits(["quick", "brown"])) == tiny_oracle.phrase_hits(
        "quick", "brown"
    )


def test_phrase_repeated_term(tiny_index, tiny_oracle):
    # doc 1: 'mier mier mier' -> overlapping self-phrase matches
    assert hits(tiny_index.phrase_hits(["mier", "mier"])) == tiny_oracle.phrase_hits(
        "mier", "mier"
    )


def test_near(tiny_index, tiny_oracle):
    assert hits(tiny_index.near_hits("quick", "fox", 0, 3)) == tiny_oracle.near_hits(
        "quick", "fox", 0, 3
    )


def test_near_unordered(tiny_index, tiny_oracle):
    got = hits(tiny_index.near_hits("fox", "quick", 0, 3, ordered=False))
    assert got == tiny_oracle.near_hits("fox", "quick", 0, 3, ordered=False)


def test_and_docs(tiny_index, tiny_oracle):
    got = sorted(r["doc_id"] for r in tiny_index.and_docs(["quick", "lazy"]).collect())
    assert got == tiny_oracle.and_docs("quick", "lazy")


def test_and_not(tiny_index, tiny_oracle):
    got = sorted(r["doc_id"] for r in tiny_index.and_not_docs("quick", "lazy").collect())
    assert got == tiny_oracle.and_not_docs("quick", "lazy")


def test_count(tiny_index, tiny_oracle):
    assert tiny_index.count_hits("aap") == tiny_oracle.count_hits("aap")


def test_colloc(tiny_index, tiny_oracle):
    got = {r["next_tok"]: r["n"] for r in tiny_index.next_token_freq("quick").collect()}
    assert got == tiny_oracle.next_token_freq("quick")


def test_topk_single(tiny_index, tiny_oracle):
    got = [(r["rank"], r["doc_id"], r["score"]) for r in tiny_index.topk(["the"], k=3).orderBy("rank").collect()]
    exp = tiny_oracle.topk(["the"], k=3)
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exp]
    assert all(abs(a[2] - b[2]) < 1e-12 for a, b in zip(got, exp))


def test_topk_tf_saturation(tiny_index, tiny_oracle):
    # doc 5 is 16x 'aap': saturation must not let it dwarf everything wrongly
    got = [(r["rank"], r["doc_id"], r["score"]) for r in tiny_index.topk(["aap"], k=3).orderBy("rank").collect()]
    exp = tiny_oracle.topk(["aap"], k=3)
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exp]
    assert all(abs(a[2] - b[2]) < 1e-12 for a, b in zip(got, exp))


def test_empty_result(tiny_index):
    assert tiny_index.term_hits("zzzznotaterm").count() == 0
    assert tiny_index.topk(["zzzznotaterm"], k=5).count() == 0


def test_kwic(tiny_index):
    rows = tiny_index.kwic(tiny_index.term_hits("lazy"), context=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["left"], r["match"], r["right"]) == ("over the", "lazy", "dog")
