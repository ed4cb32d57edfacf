"""Physical-plan assertions: the plan properties PLANS.md claims, checked
mechanically against .explain output (run per round after engine changes).

Asserts:
1. term posting fetch: term_id PushedFilters reach the parquet scan, and the
   positions column is pruned for scoring queries
2. no CartesianProduct / BroadcastNestedLoopJoin in any dd_*/sim_* plan
3. the hit-window / top-k paths contain no single-partition WindowExec
4. regex path: no driver-collected IN-list (no in(term_id, [...]) literal
   explosion), join against the dict instead
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from blacklab_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> None:
    spark = get_spark("local[8]", app_name="audit_plans", shuffle_partitions=8)
    from blacklab_spark import entry_queries as E

    ix = E.get_index(spark, SF)
    failures = []

    def check(name, ok, detail=""):
        print(f"{'OK  ' if ok else 'FAIL'} {name}")
        if not ok:
            failures.append((name, detail))

    # 1. pushdown + column pruning on the scoring path
    p = plan_of(ix.topk(["table"], k=10))
    check("topk term_id pushdown", "PushedFilters: [" in p and "term_id" in p.split("PushedFilters:")[1][:200], p[:500])
    scan = [seg for seg in p.split("Scan parquet") if "postings" in seg[:300]]
    check("topk positions pruned", all("positions" not in s.split("ReadSchema")[1][:400] for s in scan if "ReadSchema" in s))

    # 2. no cartesian products in pipeline ops
    qs = E.build_queries()
    for name in ("dd_emb_neardup", "dd_lsh_pairs", "dd_ngram_jaccard", "sim_ann_lsh", "sim_ann_multiprobe", "sim_cosine_topk", "txt_chunk_dedup", "txt_gopher_rep", "dd_url_canon", "dd_lsh_cluster", "txt_substr_dedup", "web_pagerank", "txt_decontam"):
        p = plan_of(qs[name](spark, SF))
        bad = "CartesianProduct" in p
        # BroadcastNestedLoopJoin is acceptable ONLY against a 1-row broadcast
        # (the query vector / query bucket); flag joins of two big sides
        if "BroadcastNestedLoopJoin" in p and name.startswith("dd_"):
            bad = True
        check(f"{name} no cartesian", not bad, p[:800])

    # 3. no single-partition WindowExec in window/topk paths
    from blacklab_spark import results as R

    hits = ix.term_hits("table")
    for nm, df in (
        ("window_hits", R.window_hits(hits, 20, 20)),
        ("topk", ix.topk(["table", "vector"], k=10)),
        ("sorted_window", qs["rs_sorted_window"](spark, SF)),
    ):
        p = plan_of(df)
        check(f"{nm} no global window", "Window" not in p or "PartitionBy" in p, p[:600])

    # 4. regex path: dict join, no IN-list explosion
    p = plan_of(ix.regex_hits("s.*n"))
    check("regex no IN-list", "term_id IN (" not in p and "BroadcastHashJoin" in p, p[:800])

    # 5b. parallel-field term query: posting-backed (term_id pushdown on the
    #     f_<field> postings; no forward-index scan of the par_<field> column)
    pix = E.get_parallel_index(spark, SF)
    p = plan_of(pix.parallel_term_hits("nl", term="tablex"))
    check(
        "parallel term posting-backed",
        "PushedFilters: [" in p
        and "term_id" in p.split("PushedFilters:")[1][:200]
        and "par_nl" not in p,
        p[:800],
    )

    # 5. alignment operator: doc_id equijoins (no cartesian), semi joins only
    p = plan_of(qs["ix_align"](spark, SF))
    check(
        "ix_align no cartesian",
        "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p,
        p[:800],
    )
    # 6. tag-attr query: no cartesian either (semi join against tag spans)
    p = plan_of(qs["ix_tag_attr"](spark, SF))
    check(
        "ix_tag_attr no cartesian",
        "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p,
        p[:800],
    )

    # 7. ranked span queries: bounded top-k (TakeOrderedAndProject), no
    #    cartesian; BNLJ only for the 1-row df broadcast
    import re as _re

    p = plan_of(ix.topk_phrase(["fast", "sort"], k=10))
    # formatted plans print each node twice (tree + details): count node
    # headers, not substring hits — exactly ONE BNLJ (the 1-row df
    # broadcast) is the allowed shape
    n_bnlj = len(_re.findall(r"\) BroadcastNestedLoopJoin", p))
    check(
        "topk_phrase bounded + no cartesian",
        "TakeOrderedAndProject" in p and "CartesianProduct" not in p
        and n_bnlj <= 1,
        p[:800],
    )
    p = plan_of(ix.topk_and(["table", "vector"], k=10))
    check(
        "topk_and no cartesian, no global window",
        "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
        and ("Window" not in p or "PartitionBy" in p),
        p[:800],
    )

    print(f"\n{len(failures)} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
