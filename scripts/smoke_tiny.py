"""Smoke: build + query tier A vs oracle."""
import tempfile

from blacklab_spark.build import build_index
from blacklab_spark.fixtures import pages_df, pages_pdf
from blacklab_spark.oracle import OracleIndex
from blacklab_spark.query import Index
from blacklab_spark.session import get_spark

spark = get_spark("local[8]")
tmp = tempfile.mkdtemp()
pages = pages_df(spark, "tiny")
meta = build_index(spark, pages, tmp, n_shards=2, block_size=4)
print("meta:", meta)
ix = Index(spark, tmp)
o = OracleIndex.build(pages_pdf("tiny"))

h = sorted(tuple(r) for r in ix.term_hits("the").collect())
print("engine the:", h)
assert h == o.term_hits("the"), (h, o.term_hits("the"))

ph = sorted(tuple(r) for r in ix.phrase_hits(["quick", "brown"]).collect())
assert ph == o.phrase_hits("quick", "brown"), ph
print("phrase ok", ph)

nr = sorted(tuple(r) for r in ix.near_hits("quick", "fox", 0, 3).collect())
assert nr == o.near_hits("quick", "fox", 0, 3), nr
print("near ok", nr)

tk = [(r["rank"], r["doc_id"], r["score"]) for r in ix.topk(["the"], k=3).orderBy("rank").collect()]
print("engine topk:", tk)
print("oracle topk:", o.topk(["the"], k=3))
for (r1, d1, s1), (r2, d2, s2) in zip(tk, o.topk(["the"], k=3)):
    assert r1 == r2 and d1 == d2 and abs(s1 - s2) < 1e-12, (r1, d1, s1, r2, d2, s2)
print("topk rank-identical")

mk = [(r["rank"], r["doc_id"], r["score"]) for r in ix.topk(["quick", "brown", "fox"], k=5).orderBy("rank").collect()]
for (r1, d1, s1), (r2, d2, s2) in zip(mk, o.topk(["quick", "brown", "fox"], k=5)):
    assert r1 == r2 and d1 == d2 and abs(s1 - s2) < 1e-12, (mk, o.topk(["quick", "brown", "fox"], k=5))
print("multi topk rank-identical")

ad = sorted(r["doc_id"] for r in ix.and_docs(["quick", "lazy"]).collect())
assert ad == o.and_docs("quick", "lazy"), ad
an = sorted(r["doc_id"] for r in ix.and_not_docs("quick", "lazy").collect())
assert an == o.and_not_docs("quick", "lazy"), an
print("and/andnot ok", ad, an)
assert ix.count_hits("the") == o.count_hits("the")
print("count ok:", ix.count_hits("the"))

oh = sorted(tuple(r) for r in ix.or_hits(["fox", "hare"]).collect())
assert oh == o.or_hits("fox", "hare"), oh
print("or ok", oh)

rh = sorted(tuple(r) for r in ix.regex_hits("qu.*k").collect())
assert rh == o.regex_hits("qu.*k"), rh
print("regex ok", rh)

ntf = {r["next_tok"]: r["n"] for r in ix.next_token_freq("quick").collect()}
assert ntf == o.next_token_freq("quick"), (ntf, o.next_token_freq("quick"))
print("colloc ok", ntf)

kw = ix.kwic(ix.term_hits("lazy"), context=2).collect()
print("kwic:", [(r["left"], r["match"], r["right"]) for r in kw])

spark.stop()
print("ALL TINY SMOKE PASSED")
