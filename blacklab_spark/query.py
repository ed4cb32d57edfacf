"""Query engine over the built index: span queries + BM25 top-k (block-max).

Execution model (SURVEY.md §3.1 mapped to Spark): the reference runs one
iterator tree per Lucene segment on a thread pool
(engine/.../results/HitsFromQuery.java:111-145); here each *shard* (a
contiguous doc-id range of posting blocks) is one task — postings for the
query's terms are filtered with predicate pushdown (term_id is in the parquet
sort order, so row groups prune), grouped by shard, and a vectorized numpy
kernel runs per shard with NO shuffle of posting data. Global top-k is a
`orderBy().limit(k)` over n_shards × k candidate rows.

Sensitivity: postings are built over surface terms; an insensitive (folded)
query expands to the OR of its surface variants via the terms dict — the same
move as the reference's BLSpanMultiTermQueryWrapper term expansion
(engine/.../search/lucene/BLSpanMultiTermQueryWrapper.java:46-52).
"""

from __future__ import annotations

import json
import os
import re
import weakref
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import B, K1
from .codec import decode_ints, delta_decode, delta_decode_segmented
from .oracle.engine import byte4_to_int
from .tokenize import accent_fold_token, case_fold_token, fold_token

HITS_SCHEMA = "doc_id long, start int, end int"
SCORE_SCHEMA = "doc_id long, score double"

# quantized doc-length lookup (Lucene SmallFloat byte norms, see oracle)
_QTABLE = np.unique(np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64))


def quantize_dl(dl: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(_QTABLE, dl, side="right") - 1
    return _QTABLE[np.clip(idx, 0, len(_QTABLE) - 1)]


@dataclass
class Segment:
    name: str
    meta: dict
    postings: DataFrame
    docs: DataFrame
    terms: DataFrame


# live Index instances per index dir — segment merges delete source segment
# dirs after the registry commit, so in-process readers must reload or their
# lazy DataFrames point at removed parquet paths (ADVICE r4). Weak refs: the
# registry never keeps an Index alive.
_OPEN_INDEXES: "weakref.WeakSet[Index]" = weakref.WeakSet()


def invalidate_open_indexes(out_dir: str) -> int:
    """Reload every live in-process Index over `out_dir` (called by
    build.merge_segments after it removes merged-away source segments).
    Cross-PROCESS readers must re-open the index after compaction — that
    contract is documented on merge_segments."""
    n = 0
    for ix in list(_OPEN_INDEXES):
        if os.path.abspath(ix.dir) == os.path.abspath(out_dir):
            ix.reload()
            n += 1
    return n


class Index:
    """Open a built index (possibly multiple delta segments) for querying."""

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.dir = out_dir
        self._load()
        _OPEN_INDEXES.add(self)

    def reload(self) -> None:
        """Re-read the segment registry (after a merge/compaction replaced
        segments underneath this reader)."""
        self._load()

    def _load(self) -> None:
        spark, out_dir = self.spark, self.dir
        with open(os.path.join(out_dir, "segments.json")) as f:
            seg_names = json.load(f)["segments"]
        self.segments: list[Segment] = []
        for s in seg_names:
            base = f"{out_dir}/segments/{s}"
            with open(f"{base}/meta.json") as mf:
                meta = json.load(mf)
            # format >= 12 tags every posting blob with its codec byte; an
            # untagged (pre-12) blob would decode as garbage under tag
            # dispatch, so refuse loudly instead of silently mis-decoding
            if meta.get("format_version", 0) < 12:
                raise ValueError(
                    f"segment {s!r} has format_version "
                    f"{meta.get('format_version')} (< 12, untagged posting "
                    "blobs); rebuild or compact() the index with this version"
                )
            self.segments.append(
                Segment(
                    s,
                    meta,
                    spark.read.parquet(f"{base}/postings"),
                    spark.read.parquet(f"{base}/docs"),
                    spark.read.parquet(f"{base}/terms"),
                )
            )
        # global corpus stats: doc sets of segments are disjoint, so stats add
        self.n_docs = sum(s.meta["n_docs"] for s in self.segments)
        self.annotations = tuple(self.segments[0].meta.get("annotations", ["word"]))
        self.sum_dl = sum(s.meta["sum_dl"] for s in self.segments)
        self.avgdl = self.sum_dl / max(1, self.n_docs)
        # any segment with multi-value positions voids the one-token-per-
        # position premise: term/or/regex hit producers then dedupe spans so
        # downstream SpanGuarantees uniqueness claims stay valid
        # CONSERVATIVE fallback when the key is absent (ADVICE r4): assume
        # multi-value, always dedupe — an extra shuffle on a hand-edited
        # meta, never silent duplicate hits. (Pre-12 segments are refused at
        # load above, so absence here means a tampered v12 meta.)
        self.has_mv = any(s.meta.get("multi_value", True) for s in self.segments)

    # ------------------------------------------------------------- helpers --
    def _check_annot(self, annot: str) -> None:
        if annot in self.annotations:
            return
        # parallel-field postings live under annot `f_<field>` (reference:
        # each parallel version is an annotated field of its own,
        # SpansOverrideField.java:5-10)
        if annot.startswith("f_") and self._parallel_postings_ok(annot[2:]):
            return
        raise ValueError(
            f"annotation {annot!r} is not indexed (index has "
            f"{list(self.annotations)}; build with annotations=(...))"
        )

    def _parallel_postings_ok(self, field: str) -> bool:
        """True when EVERY segment carries posting lists for this parallel
        field (format >= 9 builds them; older segments fall back to the
        forward-index scan)."""
        return bool(self.segments) and all(
            field in s.meta.get("parallel_fields", [])
            and s.meta.get("format_version", 0) >= 9
            for s in self.segments
        )

    @property
    def docs(self) -> DataFrame:
        d = self.segments[0].docs
        for s in self.segments[1:]:
            d = d.unionByName(s.docs)
        # the build stores tokens_fold = NULL when identical to tokens
        # (most docs in lowercase web text), and tokens_lemma = NULL when
        # identical to the effective fold — reconstitute transparently
        d = d.withColumn("tokens_fold", F.coalesce("tokens_fold", "tokens"))
        if "lemma" in self.annotations:
            d = d.withColumn("tokens_lemma", F.coalesce("tokens_lemma", "tokens_fold"))
        return d

    @property
    def terms_df(self) -> DataFrame:
        t = self.segments[0].terms
        for s in self.segments[1:]:
            t = t.unionByName(s.terms)
        return t

    def resolve(
        self, terms: list[str], fold: bool = True, annot: str = "word",
        sens: str | None = None,
    ) -> list[pd.DataFrame]:
        """Per segment: (term_id, qidx, df) for each query term, qidx in
        sorted folded order (fixes the float association order vs the oracle).
        Returns list aligned with self.segments; also attaches .attrs['df']
        mapping qidx -> global df. annot selects the annotation layer
        (reference: annotation select, cql.jj:625-637); every layer folds
        its term_fold, so non-word layers match insensitively by default
        (the reference's i-only sensitivity for them).

        sens overrides fold with one of the reference's four sensitivity
        variants (MatchSensitivity.java:12-17): 's'/'i' behave like
        fold=False/True; 'ci' (lowercase only) and 'di' (accent strip only)
        pre-filter the dict on the full fold — a superset of any partial
        fold — then apply the partial desensitize to the tiny candidate set
        in pandas. df for ci/di groups is the sum of member surface dfs
        (exact unless one doc holds >1 surface variant of the same partial
        fold — the reference with a dedicated ci/di-indexed field stores
        exact counts; divergence documented)."""
        self._check_annot(annot)
        if sens == "s":
            sens, fold = None, False
        elif sens == "i":
            sens, fold = None, True
        if sens in ("ci", "di"):
            vf = case_fold_token if sens == "ci" else accent_fold_token
            qs = sorted({vf(t) for t in terms})
            base = sorted({fold_token(t) for t in terms})
            qidx = {q: i for i, q in enumerate(qs)}
            frames = [
                seg.terms.filter(
                    (F.col("annot") == annot) & F.col("term_fold").isin(base)
                ).select(F.lit(i).alias("_seg"), "term_id", "term", "df")
                for i, seg in enumerate(self.segments)
            ]
            u = frames[0]
            for f in frames[1:]:
                u = u.unionByName(f)
            allr = u.toPandas()
            allr["_v"] = allr["term"].map(vf)
            allr = allr[allr["_v"].isin(qs)]
            out, gdf = [], {}
            for i in range(len(self.segments)):
                rows = allr[allr["_seg"] == i].drop(columns=["_seg"]).copy()
                rows["qidx"] = rows["_v"].map(qidx)
                out.append(rows)
                for q, grp in rows.groupby("qidx"):
                    gdf[q] = gdf.get(q, 0) + int(grp["df"].sum())
            for r in out:
                r.attrs["gdf"] = gdf
                r.attrs["n_q"] = len(qs)
            return out
        if fold:
            qs = sorted({fold_token(t) for t in terms})
            col = "term_fold"
        else:
            qs = sorted(set(terms))
            col = "term"
        qidx = {q: i for i, q in enumerate(qs)}
        frames = [
            seg.terms.filter((F.col("annot") == annot) & F.col(col).isin(qs))
            .select(F.lit(i).alias("_seg"), "term_id", col, "df", "fold_df")
            for i, seg in enumerate(self.segments)
        ]
        u = frames[0]
        for f in frames[1:]:
            u = u.unionByName(f)
        allr = u.toPandas()  # ONE Spark job for all segments, not one each
        out, gdf = [], {}
        dfc = "fold_df" if fold else "df"
        for i in range(len(self.segments)):
            rows = allr[allr["_seg"] == i].drop(columns=["_seg"]).copy()
            rows["qidx"] = rows[col].map(qidx)
            out.append(rows)
            for q, grp in rows.groupby("qidx"):
                # within a segment, fold_df is already the distinct-doc count
                # over all variants; across segments doc sets are disjoint
                gdf[q] = gdf.get(q, 0) + int(grp[dfc].iloc[0])
        for r in out:
            r.attrs["gdf"] = gdf
            r.attrs["n_q"] = len(qs)
        return out

    def resolve_terms(
        self, qs: list[str], fold: bool = True, annot: str = "word"
    ) -> list[pd.DataFrame]:
        """Per-segment (term_id, key) rows for the given already-folded term
        strings — ONE Spark job for all segments (the same union trick as
        resolve()), so driver job count stays O(1) in segment count even on
        an uncompacted many-segment index. Callers map key -> their own qidx
        (phrase position, yes/no flag, ...)."""
        self._check_annot(annot)
        col = "term_fold" if fold else "term"
        uniq = sorted(set(qs))
        frames = [
            seg.terms.filter((F.col("annot") == annot) & F.col(col).isin(uniq))
            .select(F.lit(i).alias("_seg"), "term_id", F.col(col).alias("key"))
            for i, seg in enumerate(self.segments)
        ]
        u = frames[0]
        for f in frames[1:]:
            u = u.unionByName(f)
        allr = u.toPandas()
        return [
            allr[allr["_seg"] == i].drop(columns=["_seg"]).reset_index(drop=True)
            for i in range(len(self.segments))
        ]

    def _postings_for(self, seg: Segment, tids: pd.DataFrame, need_pos: bool) -> DataFrame:
        cols = [
            "shard", "term_id", "doc_count", "first_doc", "last_doc",
            "max_tf", "min_dl", "doc_ids", "tfs", "dls",
        ] + (["positions"] if need_pos else [])
        p = seg.postings.select(*cols).filter(
            F.col("term_id").isin([int(t) for t in tids["term_id"]])
        )
        qmap = self.spark.createDataFrame(tids[["term_id", "qidx"]])
        return p.join(F.broadcast(qmap), "term_id")

    # ----------------------------------------------------------- span ops ---
    def term_hits(
        self, term: str, fold: bool = True, annot: str = "word",
        sens: str | None = None,
    ) -> DataFrame:
        return self.or_hits([term], fold=fold, annot=annot, sens=sens)

    def or_hits(
        self, terms: list[str], fold: bool = True, annot: str = "word",
        sens: str | None = None,
    ) -> DataFrame:
        """Union of single-term position hits (reference: BLSpanOrQuery).

        No dedupe on single-value indexes: distinct surface terms cannot
        share a (doc, pos) — one token per position — and resolve() dedupes
        query terms. This is the SpanGuarantees move
        (SpanGuarantees.java:22-67): provable uniqueness skips a real
        shuffle. On a multi-value index (meta.multi_value) a position CAN
        carry two matching values, so the producer dedupes here to keep the
        uniqueness claim true for every downstream physical choice."""
        parts = []
        for seg, tids in zip(self.segments, self.resolve(terms, fold, annot, sens=sens)):
            if len(tids):
                parts.append(_hits_explode(self._postings_for(seg, tids, True)))
        return self._mv_unique(self._union(parts, HITS_SCHEMA))

    def regex_hits(
        self, pattern: str, fold: bool = True, annot: str = "word",
        sens: str | None = None,
    ) -> DataFrame:
        """Regex over the dict -> postings union (unique by the same argument
        as or_hits: matching term_ids are distinct).

        Term matching stays JVM-side: the dict rows matching the regex join
        postings on term_id (broadcast — matched ids are dict-scale-tiny
        relative to postings even for broad patterns). No toPandas round-trip
        and no plan-exploding IN-list: a 10^9-term dict never touches the
        driver. Trade-off vs the exact-term path: the join loses parquet
        row-group pruning on term_id, the cost the reference pays too when it
        expands a multi-term query (BLSpanMultiTermQueryWrapper.java:46-52).

        sens selects a sensitivity variant (MatchSensitivity.java:12-17):
        'ci' matches case-insensitively via the regex engine's (?i) flag
        against the SURFACE term (diacritics must match exactly); 'di'
        matches the pattern against the accent-stripped surface term,
        computed JVM-side with a pinned translate() map
        (tokenize.di_translate_args — exact parity with
        accent_fold_token), so no di dict column is stored."""
        from .tokenize import di_translate_args

        self._check_annot(annot)
        if sens == "s":
            sens, fold = None, False
        elif sens == "i":
            sens, fold = None, True
        if sens == "ci":
            col, pattern = "term", f"(?i)(?:{pattern})"
        elif sens == "di":
            src, dst = di_translate_args()
            col = F.translate(F.col("term"), src, dst)
            # the reference desensitizes the pattern VALUE too
            # (TextPatternRegex via optInsensitive); accent-strip leaves
            # ASCII regex metachars untouched
            pattern = accent_fold_token(pattern)
        else:
            col = "term_fold" if fold else "term"
        parts = []
        for seg in self.segments:
            m = (
                seg.terms.filter(
                    (F.col("annot") == annot) & _regex_match_col(col, pattern)
                ).select("term_id")
            )
            p = seg.postings.select(
                "shard", "term_id", "doc_count", "max_tf", "min_dl",
                "doc_ids", "tfs", "dls", "positions",
            ).join(F.broadcast(m), "term_id").withColumn("qidx", F.lit(0))
            parts.append(_hits_explode(p))
        return self._mv_unique(self._union(parts, HITS_SCHEMA))

    def term_df(self, term: str, fold: bool = True, annot: str = "word") -> int:
        """Global document frequency from the terms dict (cost model input —
        the analog of the reference's reverseMatchingCost term stats,
        BLSpanQuery.java:289-303)."""
        col = "term_fold" if fold else "term"
        q = fold_token(term) if fold else term
        dfc = "fold_df" if fold else "df"
        parts = [
            seg.terms.filter((F.col("annot") == annot) & (F.col(col) == q)).agg(
                F.max(dfc).alias("v")
            )
            for seg in self.segments
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return sum(int(r["v"] or 0) for r in u.collect())  # one job

    def regex_stats(self, pattern: str, fold: bool = True) -> tuple[int, int]:
        """(n matching terms, total df) for a regex over the dict — the cost
        of the postings path for an expanded multi-term query."""
        col = "term_fold" if fold else "term"
        parts = [
            seg.terms.filter((F.col("annot") == "word") & _regex_match_col(col, pattern))
            .agg(F.count("*").alias("n"), F.sum("df").alias("d"))
            for seg in self.segments
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        rows = u.collect()  # one job
        return sum(int(r["n"] or 0) for r in rows), sum(int(r["d"] or 0) for r in rows)

    def fuzzy_hits(
        self, term: str, max_edits: int = 1, fold: bool = True,
        prefix_length: int = 0, transpositions: bool = True,
    ) -> DataFrame:
        """Edit-distance term match (reference: SpanFuzzyQuery,
        engine/.../search/lucene/SpanFuzzyQuery.java:29-34, delegating to
        Lucene FuzzyQuery): expand over the terms dict, then union the
        posting lists — JVM-side join like regex_hits, no driver round-trip.

        Lucene FuzzyQuery parity: `prefix_length` chars must match exactly
        (a sargable startswith over the sorted dict) and the edit distance
        applies to the remainder; `transpositions=True` (Lucene's default)
        counts an adjacent swap as ONE edit (OSA / restricted
        Damerau-Levenshtein, the automaton Lucene builds). The OSA check
        runs as an Arrow-batched filter over the tiny candidate set that a
        JVM levenshtein band (lev <= 2*max_edits >= osa-qualifying lev)
        pre-selects — postings never see non-candidates."""
        col = "term_fold" if fold else "term"
        q = fold_token(term) if fold else term
        pre, q_suf = q[:prefix_length], q[prefix_length:]
        suf = F.substring(F.col(col), prefix_length + 1, 2**30) if prefix_length else F.col(col)
        # lev(osa<=k pair) <= 2k: each transposition costs <=2 plain edits
        band = 2 * max_edits if transpositions else max_edits
        cond = F.levenshtein(suf, F.lit(q_suf)) <= band
        if prefix_length:
            cond = F.col(col).startswith(pre) & cond
        parts = []
        for seg in self.segments:
            m = seg.terms.filter((F.col("annot") == "word") & cond)
            if transpositions and max_edits > 0:
                okf = _osa_filter_udf(q_suf, max_edits, prefix_length)
                m = m.filter(okf(F.col(col)))
            m = m.select("term_id").dropDuplicates(["term_id"])
            p = seg.postings.select(
                "shard", "term_id", "doc_count", "max_tf", "min_dl",
                "doc_ids", "tfs", "dls", "positions",
            ).join(F.broadcast(m), "term_id").withColumn("qidx", F.lit(0))
            parts.append(_hits_explode(p))
        return self._mv_unique(self._union(parts, HITS_SCHEMA))

    def phrase_hits(self, terms: list[str], fold: bool = True) -> DataFrame:
        """Exact consecutive sequence (reference: SpanQuerySequence,
        engine/.../search/lucene/SpanQuerySequence.java:33-49): intersect
        posting positions with offset checks, shard-local."""
        qs = [fold_token(t) if fold else t for t in terms]
        parts = []
        for seg, rows in zip(self.segments, self.resolve_terms(qs, fold)):
            # qidx = position in the phrase (terms may repeat)
            frames = []
            for i, q in enumerate(qs):
                sub = rows[rows["key"] == q][["term_id"]].copy()
                sub["qidx"] = i
                frames.append(sub)
            tids = pd.concat(frames) if frames else pd.DataFrame(columns=["term_id", "qidx"])
            if len(tids) == 0 or tids["qidx"].nunique() < len(qs):
                continue  # some phrase term missing in this segment
            p = self._postings_for(seg, tids, True)
            k = len(qs)
            parts.append(
                p.groupBy("shard").applyInPandas(_phrase_kernel(k), HITS_SCHEMA)
            )
        return self._mv_unique(self._union(parts, HITS_SCHEMA))

    def near_hits(self, a: str, b: str, min_gap=0, max_gap=3, ordered=True, fold=True) -> DataFrame:
        """Proximity (reference: SpansSequenceWithGap semantics,
        engine/.../search/lucene/SpansSequenceWithGap.java:13-57)."""
        parts = []
        qa = fold_token(a) if fold else a
        qb = fold_token(b) if fold else b
        for seg, rows in zip(self.segments, self.resolve_terms([qa, qb], fold)):
            ta = rows[rows["key"] == qa][["term_id"]].assign(qidx=0)
            tb = rows[rows["key"] == qb][["term_id"]].assign(qidx=1)
            if len(ta) == 0 or len(tb) == 0:
                continue
            tids = pd.concat([ta, tb])
            p = self._postings_for(seg, tids, True)
            parts.append(
                p.groupBy("shard").applyInPandas(
                    _near_kernel(min_gap, max_gap, ordered), HITS_SCHEMA
                )
            )
        return self._mv_unique(self._union(parts, HITS_SCHEMA))

    def and_docs(self, terms: list[str], fold: bool = True) -> DataFrame:
        """Docs containing ALL terms (doc-level conjunction; reference:
        SpanQueryAnd doc matching, engine/.../search/lucene/SpanQueryAnd.java:6-11)."""
        parts = []
        n_q = len({fold_token(t) if fold else t for t in terms})
        for seg, tids in zip(self.segments, self.resolve(terms, fold)):
            if len(tids) == 0 or tids["qidx"].nunique() < n_q:
                continue  # a term is absent from this whole segment
            p = self._postings_for(seg, tids, False)
            parts.append(
                p.groupBy("shard").applyInPandas(_docset_kernel("and", n_q), "doc_id long")
            )
        return self._union(parts, "doc_id long")

    def and_not_docs(self, yes: str, no: str, fold: bool = True) -> DataFrame:
        """Docs with `yes` and without `no` (reference: SpanQueryAndNot,
        engine/.../search/lucene/SpanQueryAndNot.java:29-33)."""
        qy = fold_token(yes) if fold else yes
        qn = fold_token(no) if fold else no
        parts = []
        for seg, rows in zip(self.segments, self.resolve_terms([qy, qn], fold)):
            ty = rows[rows["key"] == qy][["term_id"]].assign(qidx=0)
            tn = rows[rows["key"] == qn][["term_id"]].assign(qidx=1)
            if len(ty) == 0:
                continue
            tids = pd.concat([ty, tn])
            p = self._postings_for(seg, tids, False)
            parts.append(
                p.groupBy("shard").applyInPandas(_docset_kernel("andnot", 2), "doc_id long")
            )
        return self._union(parts, "doc_id long")

    def count_hits(self, term: str, fold: bool = True) -> int:
        """Total occurrences — answered from the terms dict alone (the
        reference reads term stats the same way, LuceneUtil.termFrequencies)."""
        col = "term_fold" if fold else "term"
        q = fold_token(term) if fold else term
        parts = [
            seg.terms.filter((F.col("annot") == "word") & (F.col(col) == q)).agg(
                F.sum("cf").alias("cf")
            )
            for seg in self.segments
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return sum(int(r["cf"] or 0) for r in u.collect())  # one job

    # ------------------------------------------------------------- ranking --
    def topk(
        self,
        terms: list[str],
        k: int = 10,
        fold: bool = True,
        quantize: bool = True,
        where_lang: str | None = None,
    ) -> DataFrame:
        """BM25 top-k: shard-local scoring kernels (block-max skipping for
        single-term queries) + global orderBy(score desc, doc_id).limit(k)."""
        avgdl = self.avgdl
        n = self.n_docs
        parts = []
        for seg, tids in zip(self.segments, self.resolve(terms, fold)):
            if len(tids) == 0:
                continue
            gdf = tids.attrs["gdf"]
            idf = {q: float(np.log(1.0 + (n - d + 0.5) / (d + 0.5))) for q, d in gdf.items()}
            p = self._postings_for(seg, tids, False)
            if where_lang is None:
                parts.append(
                    p.groupBy("shard").applyInPandas(
                        _score_kernel(idf, avgdl, k, quantize), SCORE_SCHEMA
                    )
                )
            else:
                allowed = seg.docs.filter(F.col("lang") == where_lang).select("shard", "doc_id")
                parts.append(
                    p.groupby("shard")
                    .cogroup(allowed.groupby("shard"))
                    .applyInPandas(
                        _score_kernel_filtered(idf, avgdl, k, quantize), SCORE_SCHEMA
                    )
                )
        scored = self._union(parts, SCORE_SCHEMA)
        from .rank import rank_head

        top = rank_head(scored, [("score", False), ("doc_id", True)], 0, k, "rank")
        urls = self.docs.select("doc_id", "url")
        return top.join(urls, "doc_id").select("rank", "doc_id", "url", "score")

    def topk_and(
        self, terms: list[str], k: int = 10, fold: bool = True, quantize: bool = True
    ) -> DataFrame:
        """Conjunctive (AND) ranked top-k: BM25 sum over the query terms
        for docs containing ALL of them — the posting-list-intersection
        ranked query next to the disjunctive WAND path. Doc ids are
        segment-partitioned, so the conjunctive doc set is exact per
        segment: the docset kernel computes it from the same postings and
        feeds the filtered scoring kernel as the allowed set (the
        block-max walk stays exact under a doc filter — see
        _score_kernel_filtered)."""
        avgdl = self.avgdl
        n = self.n_docs
        n_q = len({fold_token(t) if fold else t for t in terms})
        parts = []
        for seg, tids in zip(self.segments, self.resolve(terms, fold)):
            if len(tids) == 0 or tids["qidx"].nunique() < n_q:
                continue  # a term is absent from this segment: no AND docs
            gdf = tids.attrs["gdf"]
            idf = {q: float(np.log(1.0 + (n - d + 0.5) / (d + 0.5))) for q, d in gdf.items()}
            p = self._postings_for(seg, tids, False)
            and_ids = p.groupBy("shard").applyInPandas(
                _docset_kernel("and", n_q), "doc_id long"
            )
            allowed = seg.docs.select("shard", "doc_id").join(
                and_ids, "doc_id", "left_semi"
            )
            parts.append(
                p.groupby("shard")
                .cogroup(allowed.groupby("shard"))
                .applyInPandas(
                    _score_kernel_filtered(idf, avgdl, k, quantize), SCORE_SCHEMA
                )
            )
        scored = self._union(parts, SCORE_SCHEMA)
        from .rank import rank_head

        top = rank_head(scored, [("score", False), ("doc_id", True)], 0, k, "rank")
        urls = self.docs.select("doc_id", "url")
        return top.join(urls, "doc_id").select("rank", "doc_id", "url", "score")

    def topk_spans(self, hits: DataFrame, k: int = 10) -> DataFrame:
        """BM25 top-k over an ARBITRARY span query's hits — the ranked
        phrase / proximity queries the north star names next to term
        queries (reference analog: Lucene scoring over BLSpanQuery hits,
        e.g. SpanQuerySequence under a scoring collector). Compositional:
        any producer (phrase_hits, near_hits, a full BCQL pattern) supplies
        positions; here tf(doc) = hit count and df = docs with >=1 hit, so
        the whole phrase/pattern acts as one scored "term".

        Declarative plan, 100x-safe: one groupBy(doc_id) over the hits
        (they are already shard-produced), df via a 1-row broadcast
        cross-join (no driver collect), doc_len equi-join, then
        TakeOrderedAndProject for the bounded top-k. Scores use exact doc
        lengths (no stored block-max is involved in live span scoring, so
        there is no quantized-norm parity to preserve)."""
        from .rank import rank_head

        # materialize tf: BOTH the df-count branch and the scoring branch
        # read it, and without a materialization Spark re-evaluates the
        # whole hits subtree (span joins/kernels — the expensive part) once
        # per branch (no ReusedExchange across the agg shapes; measured
        # 2.8s -> 1.0s on the bench entry). tf is one row per MATCHING doc
        # (doc_id + count), a tiny spill-safe footprint even at 100 TB.
        # localCheckpoint, NOT persist: persist registers in the
        # CacheManager and never auto-evicts, so a long-lived server
        # session running many distinct ranked-span queries would leak
        # cached plans; checkpoint blocks are GC-managed (ContextCleaner
        # frees them when the DataFrame goes unreachable).
        tf = hits.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("double").alias("tf")
        ).localCheckpoint()
        stats = tf.agg(F.count(F.lit(1)).cast("double").alias("df"))
        n = float(self.n_docs)
        avgdl = float(self.avgdl)
        dl = self.docs.select("doc_id", F.col("doc_len").cast("double").alias("dl"))
        idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
        scored = (
            tf.join(F.broadcast(stats))
            .join(dl, "doc_id")
            .select(
                "doc_id",
                (
                    idf
                    * (F.col("tf") / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / avgdl)))
                    * (K1 + 1)
                ).alias("score"),
            )
        )
        top = rank_head(scored, [("score", False), ("doc_id", True)], 0, k, "rank")
        urls = self.docs.select("doc_id", "url")
        return top.join(urls, "doc_id").select("rank", "doc_id", "url", "score")

    def topk_phrase(self, words: list[str], k: int = 10, fold: bool = True) -> DataFrame:
        """Ranked exact-phrase query: BM25 where the phrase is the unit."""
        return self.topk_spans(self.phrase_hits(words, fold=fold), k)

    def topk_near(
        self, a: str, b: str, min_gap: int, max_gap: int, k: int = 10,
        fold: bool = True, ordered: bool = True,
    ) -> DataFrame:
        """Proximity-ranked query: BM25 where tf counts within-window
        co-occurrences of the two terms."""
        return self.topk_spans(
            self.near_hits(a, b, min_gap, max_gap, ordered=ordered, fold=fold), k
        )

    # ----------------------------------------------------------- span algebra --
    def doc_lens(self) -> DataFrame:
        return self.docs.select("doc_id", "doc_len")

    def tag_hits(
        self, name: str = "s", attrs: dict | None = None, adjust: str = "full"
    ) -> DataFrame:
        """Inline-tag spans (reference: <s/> tag queries, cql.jj:348-391).
        's' is derived from punctuation at tokenize time (docs.sents); other
        tags come from real markup recorded at build time when the build ran
        with index_tags=(...) (reference: per-format tag config,
        integrated.md:34-123).

        attrs filters on opening-tag attributes (exact match on every pair,
        reference: TextPatternTags attr map). adjust selects 'full' (the
        whole span, `<s/>`), 'leading' (zero-length span at the open tag,
        `<s>`) or 'trailing' (zero-length span at the close tag, `</s>`) —
        reference TextPatternTags.Adjust, cql.jj:354-366."""
        if adjust not in ("full", "leading", "trailing"):
            raise ValueError(f"adjust must be full|leading|trailing, got {adjust!r}")
        indexed = set()
        for s in self.segments:
            indexed |= set(s.meta.get("index_tags", []))
        if name == "s" and "s" not in indexed:
            if attrs:
                raise ValueError(
                    "attribute filters need real indexed tags; derived 's' "
                    "sentence spans carry no attributes"
                )
            out = self.docs.select("doc_id", F.explode("sents").alias("se")).select(
                "doc_id",
                F.col("se")[0].cast("int").alias("start"),
                F.col("se")[1].cast("int").alias("end"),
            )
        else:
            if name not in indexed:
                raise ValueError(
                    f"unknown tag: {name!r} (indexed tags: ['s'] + {sorted(indexed)}; "
                    "build with index_tags=(...) to record markup spans)"
                )
            t = self.docs.select("doc_id", F.explode("tags").alias("t")).filter(
                F.col("t.name") == name
            )
            for k, v in (attrs or {}).items():
                t = t.filter(F.col("t.attrs").getItem(k) == v)
            out = t.select(
                "doc_id",
                F.col("t.start").cast("int").alias("start"),
                F.col("t.end").cast("int").alias("end"),
            )
        if adjust == "leading":
            out = out.select("doc_id", "start", F.col("start").alias("end"))
        elif adjust == "trailing":
            out = out.select("doc_id", F.col("end").alias("start"), "end")
        return out

    def rel_spans(self, include_alignments: bool = False) -> DataFrame:
        """All indexed relations, exploded (reference: SpanQueryRelations
        matches relation terms + decodes payloads, SpanQueryRelations.java:
        28-34; ours live as a typed per-doc column — SURVEY.md §1.1 mapping).
        Columns: doc_id, rclass, rtype, src_start, src_end, tgt_start, tgt_end.

        Cross-field alignment relations (rclass 'al:<field>', target
        positions in a PARALLEL field's token space) are excluded by default:
        a dependency-relation query must never mix token spaces (the
        reference separates these by relation class the same way). Pass
        include_alignments=True to get everything (alignment_hits filters
        its own class)."""
        if not any(s.meta.get("index_relations") for s in self.segments):
            raise ValueError(
                "no relations indexed (build with index_relations=True or "
                "provide a `relations` input column)"
            )
        out = self.docs.select("doc_id", F.explode("relations").alias("r")).select(
            "doc_id",
            F.col("r.rclass").alias("rclass"),
            F.col("r.rtype").alias("rtype"),
            F.col("r.src_start").alias("src_start"),
            F.col("r.src_end").alias("src_end"),
            F.col("r.tgt_start").alias("tgt_start"),
            F.col("r.tgt_end").alias("tgt_end"),
        )
        if not include_alignments:
            out = out.filter(~F.col("rclass").startswith("al:"))
        return out

    def rel_hits(
        self,
        rtype: str | None = None,
        rclass: str | None = None,
        mode: str = "full",
        with_identity: bool = False,
    ) -> DataFrame:
        """Relation matches as span hits. mode selects the returned span
        (reference span modes, SpanQueryRelations.java:28-34 /
        SpanQueryRelationSpanAdjust): 'source' | 'target' | 'full'. Source
        and target spans always ride along as capture columns.

        with_identity=True adds a `rel_id` struct column carrying the
        relation's identity (rtype + both spans) — the analog of the
        reference's RelationInfo equality, which the unique-relations AND
        (SpansAndMultiUniqueRelations.java:308-319) compares clause matches
        by."""
        r = self.rel_spans()
        # `cls::type` spellings carry the relation class inside the type
        # string (RelationUtil.fullTypeRegex, CLASS_TYPE_SEPARATOR '::');
        # both halves match as regexes, like the reference's full-type regex
        if rtype is not None and "::" in rtype:
            cls, rtype = rtype.split("::", 1)
            if rclass is None:
                rclass = cls
        if rtype is not None and rtype != "":
            r = r.filter(_regex_match_col("rtype", rtype))
        if rclass is not None:
            r = r.filter(_regex_match_col("rclass", rclass))
        if mode == "source":
            s, e = F.col("src_start"), F.col("src_end")
        elif mode == "target":
            s, e = F.col("tgt_start"), F.col("tgt_end")
        elif mode == "full":
            s = F.least("src_start", "tgt_start")
            e = F.greatest("src_end", "tgt_end")
        else:
            raise ValueError(f"unknown relation span mode {mode!r}")
        cols = [
            F.col("doc_id"), s.cast("int").alias("start"), e.cast("int").alias("end"),
            F.col("src_start").alias("source_start"), F.col("src_end").alias("source_end"),
            F.col("tgt_start").alias("target_start"), F.col("tgt_end").alias("target_end"),
        ]
        if with_identity:
            # relation identity keys on the FULL class::type plus endpoints
            # (reference RelationInfo equality): omitting rclass would make
            # two same-typed edges of different classes compare equal and
            # wrongly fail the unique-relations inequality check
            cols.append(
                F.struct(
                    "rclass", "rtype", "src_start", "src_end",
                    "tgt_start", "tgt_end",
                ).alias("rel_id")
            )
        return r.select(*cols)

    def capture_relations(
        self, hits: DataFrame, name: str = "captured_rels",
        rtype: str | None = None, rclass: str | None = None,
        within_capture: str | None = None,
    ) -> DataFrame:
        """Capture all relations inside each hit span as a LIST column
        `name` (reference: rcapture() -> SpanQueryCaptureRelationsWithinSpan,
        XFRelations.java:147-163): array of (rtype, src_start, src_end,
        tgt_start, tgt_end) structs, empty when none. One groupBy over the
        hit keys; the relation join is a doc_id equijoin.

        within_capture restricts to relations inside the named capture
        group's span instead of the whole hit (reference: rcapture2 ->
        rcaptureWithinCapture, XFRelations.java:165-185)."""
        rels = self.rel_spans()
        if rtype is not None:
            rels = rels.filter(_regex_match_col("rtype", rtype))
        if rclass is not None:
            rels = rels.filter(F.col("rclass") == rclass)
        r = rels.select(
            F.col("doc_id").alias("r_doc"), "rtype",
            "src_start", "src_end", "tgt_start", "tgt_end",
            F.least("src_start", "tgt_start").alias("r_lo"),
            F.greatest("src_end", "tgt_end").alias("r_hi"),
        )
        if within_capture is None:
            lo, hi = hits["start"], hits["end"]
        else:
            cs, ce = f"{within_capture}_start", f"{within_capture}_end"
            if cs not in hits.columns or ce not in hits.columns:
                raise ValueError(
                    f"no capture group {within_capture!r} in hits "
                    f"(columns: {hits.columns})"
                )
            lo, hi = hits[cs], hits[ce]
        j = hits.join(
            r,
            (hits["doc_id"] == F.col("r_doc"))
            & (F.col("r_lo") >= lo)
            & (F.col("r_hi") <= hi),
            "inner",
        )
        lists = j.groupBy(*[hits[c] for c in hits.columns]).agg(
            F.collect_list(
                F.struct("rtype", "src_start", "src_end", "tgt_start", "tgt_end")
            ).alias(name)
        )
        # keep hits containing no relations, with an empty list
        out = hits.join(lists, list(hits.columns), "left")
        return out.withColumn(
            name, F.coalesce(F.col(name), F.array().cast(lists.schema[name].dataType))
        )

    # ---------------------------------------------------- parallel corpora --
    def parallel_fields(self) -> list[str]:
        """Parallel document versions stored in this index (reference:
        parallel corpora, one annotated field per version)."""
        out: set[str] = set()
        for s in self.segments:
            out |= set(s.meta.get("parallel_fields", []))
        return sorted(out)

    def _par_tokens_col(self, field: str):
        """Token-stream column for a parallel field: top-level `par_<field>`
        (format >= 9, column-prunable) or the legacy `parallel` map item."""
        if f"par_{field}" in self.docs.columns:
            return F.col(f"par_{field}")
        return F.col("parallel").getItem(field)

    def parallel_term_hits(
        self, field: str, term: str | None = None, regex: str | None = None,
        fold: bool = True,
    ) -> DataFrame:
        """Single-token hits in a parallel field's token stream (positions in
        THAT field's token space). Format >= 9 indexes build real posting
        lists per parallel field (annot `f_<field>` — term dict with fold
        columns, term-clustered parquet layout, same pruning as the main
        field), so this is posting-backed exactly like the main field
        (reference: SpansOverrideField.java:5-10 — the overridden field is a
        full annotated field). Older segments fall back to a forward-index
        scan of the stored stream with lower()-only folding (the historical
        v1 behavior)."""
        if field not in self.parallel_fields():
            raise ValueError(
                f"unknown parallel field {field!r} (have {self.parallel_fields()})"
            )
        if self._parallel_postings_ok(field):
            annot = f"f_{field}"
            if term is not None:
                return self.term_hits(term, fold=fold, annot=annot)
            if regex is not None:
                return self.regex_hits(regex, fold=fold, annot=annot)
            raise ValueError("parallel_term_hits: pass term= or regex=")
        toks = self.docs.select(
            "doc_id", F.posexplode(self._par_tokens_col(field)).alias("pos", "tok")
        )
        col = F.lower(F.col("tok")) if fold else F.col("tok")
        if term is not None:
            toks = toks.filter(col == (term.lower() if fold else term))
        elif regex is not None:
            # fold the COLUMN, never the pattern (lowercasing a pattern
            # corrupts classes like \W and \p{L}); same contract as the
            # main-field path, which matches the pattern verbatim on term_fold
            toks = toks.filter(col.rlike(f"^(?:{regex})$"))
        return toks.select(
            "doc_id", F.col("pos").cast("int").alias("start"),
            (F.col("pos") + 1).cast("int").alias("end"),
        )

    def alignment_hits(
        self,
        src_hits: DataFrame,
        field: str,
        tgt_hits: DataFrame | None = None,
        rtype: str | None = None,
        capture: str | None = None,
        optional: bool = False,
    ) -> DataFrame:
        """The `==>field` alignment operator (reference: alignment relations
        between parallel fields, RelationOperatorInfo.java:25-70 +
        SpanQueryCaptureRelationsBetweenSpans): keep source hits having >= 1
        alignment relation (rclass 'al:<field>') whose source span overlaps
        the hit and whose target span overlaps a target-pattern hit in the
        parallel field (any target when tgt_hits is None).

        Without `capture`: semi joins — source hits never duplicate; capture
        columns ride through. With `capture`: the enclosing span of the
        matched relations' targets is added as `{capture}_start/_end`
        (positions in the PARALLEL field's token space — the reference
        captures the matched alignment relations for translated
        concordances); costs one groupBy over the hit keys.

        optional (`==>field?`, reference optionalMatch): source hits are kept
        even without a matching alignment; with `capture`, unmatched hits get
        NULL capture columns."""
        rels = self.rel_spans(include_alignments=True).filter(
            F.col("rclass") == f"al:{field}"
        )
        if rtype is not None:
            rels = rels.filter(_regex_match_col("rtype", rtype))
        if tgt_hits is not None:
            t = tgt_hits.select(
                F.col("doc_id").alias("t_doc"), F.col("start").alias("t_s"),
                F.col("end").alias("t_e"),
            )
            rels = rels.join(
                t,
                (F.col("doc_id") == F.col("t_doc"))
                & (F.col("tgt_start") < F.col("t_e"))
                & (F.col("t_s") < F.col("tgt_end")),
                "left_semi",
            )
        r = rels.select(
            F.col("doc_id").alias("r_doc"), F.col("src_start").alias("r_s"),
            F.col("src_end").alias("r_e"), "tgt_start", "tgt_end",
        )
        cond = (
            (src_hits["doc_id"] == F.col("r_doc"))
            & (F.col("r_s") < src_hits["end"])
            & (src_hits["start"] < F.col("r_e"))
        )
        if capture is None:
            # optional without capture adds no information: every source hit
            # is kept whether or not an alignment matched
            return src_hits if optional else src_hits.join(r, cond, "left_semi")
        return (
            src_hits.join(r, cond, "left" if optional else "inner")
            .groupBy(*[src_hits[c] for c in src_hits.columns])
            .agg(
                F.min("tgt_start").cast("int").alias(f"{capture}_start"),
                F.max("tgt_end").cast("int").alias(f"{capture}_end"),
            )
        )

    def seq_hits(self, hit_dfs: list[DataFrame], gap_min: int = 0, gap_max: int = 0) -> DataFrame:
        """General sequence over arbitrary hit frames (SpanQuerySequence);
        the term-only fast path is phrase_hits (posting intersection)."""
        from . import spans as S

        out = hit_dfs[0]
        for nxt in hit_dfs[1:]:
            out = S.sequence(out, nxt, gap_min, gap_max)
        return out

    # ---------------------------------------------------- forward-index ops --
    def kwic(self, hits: DataFrame, context: int = 5, col: str = "tokens") -> DataFrame:
        """Keyword-in-context from the docs token arrays — the reference reads
        its forward index for this (engine/.../results/Kwics.java:25-37); here
        the forward index is a colocated column, so it's an array slice.
        `col` selects the annotation layer's forward-index column (tokens /
        tokens_lemma / tokens_pos) — the reference's KWIC carries every
        annotation per token (Kwic.java: all annotations in context)."""
        d = self.docs.select("doc_id", F.col(col).alias("tokens"))
        h = hits.join(d, "doc_id")
        left_from = F.greatest(F.lit(1), F.col("start") + 1 - context)
        return h.select(
            "doc_id",
            "start",
            "end",
            F.array_join(
                F.slice(F.col("tokens"), left_from, F.col("start") + 1 - left_from), " "
            ).alias("left"),
            F.array_join(
                F.slice(F.col("tokens"), F.col("start") + 1, F.col("end") - F.col("start")), " "
            ).alias("match"),
            F.array_join(
                F.slice(
                    F.col("tokens"),
                    F.col("end") + 1,
                    F.least(F.lit(context), F.size("tokens") - F.col("end")),
                ),
                " ",
            ).alias("right"),
        )

    def snippet(self, doc_id: int, start: int, end: int, context: int = 5) -> dict:
        """Single-hit snippet (reference: WebserviceRequestHandler.opDocSnippet,
        wslib/.../WebserviceRequestHandler.java:211): token context + the
        stored text. Driver-side convenience over one doc row."""
        h = self.spark.createDataFrame(
            [(doc_id, start, end)], "doc_id long, start int, end int"
        )
        row = self.kwic(h, context).collect()
        return row[0].asDict() if row else {}

    def doc_contents(self, doc_id: int) -> str | None:
        """Original document text from the content store (docs.text column —
        reference: search/DocUtil.java over the content store)."""
        r = self.docs.filter(F.col("doc_id") == doc_id).select("text").collect()
        return r[0]["text"] if r else None

    def next_token_freq(self, term: str, fold: bool = True) -> DataFrame:
        """Collocation fast path: frequency of the token after each hit —
        a plain groupBy over forward-index arrays (the reference's
        HitGroupsTokenFrequencies fast path, results/HitGroupsTokenFrequencies.java:8-13)."""
        hits = self.term_hits(term, fold)
        col = "tokens_fold" if fold else "tokens"
        d = self.docs.select("doc_id", col)
        return (
            hits.join(d, "doc_id")
            .select(F.try_element_at(F.col(col), F.col("end") + 1).alias("next_tok"))
            .filter(F.col("next_tok").isNotNull())
            .groupBy("next_tok")
            .agg(F.count("*").alias("n"))
        )

    def term_freqs(self, fold: bool = True, annot: str = "word") -> DataFrame:
        if fold:
            # fold_cf is replicated across a fold's variant rows WITHIN a
            # segment (max collapses the copies), but segment doc sets are
            # disjoint, so ACROSS segments the per-segment counts must add —
            # a single max over the unioned rows would return the largest
            # segment's count instead of the total.
            parts = [
                seg.terms.filter(F.col("annot") == annot)
                .groupBy(F.col("term_fold").alias("term"))
                .agg(F.max("fold_cf").alias("cf_seg"))
                for seg in self.segments
            ]
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            return u.groupBy("term").agg(F.sum("cf_seg").alias("cf"))
        return (
            self.terms_df.filter(F.col("annot") == annot)
            .groupBy("term").agg(F.sum("cf").alias("cf"))
        )

    def _union(self, parts: list[DataFrame], schema: str) -> DataFrame:
        if not parts:
            return self.spark.createDataFrame([], schema)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def _mv_unique(self, hits: DataFrame) -> DataFrame:
        """Span dedupe applied ONLY on multi-value indexes: a position
        carrying secondary values can satisfy one term/regex/phrase slot
        through two values, repeating a (doc, start, end) span. Single-value
        indexes (the common case) skip the shuffle entirely — the no-dedupe
        SpanGuarantees fast paths stay intact there."""
        if not self.has_mv:
            return hits
        return hits.dropDuplicates(["doc_id", "start", "end"])


# ------------------------------------------------------------ numpy kernels --
_RX_LITERAL = re.compile(r"^[0-9A-Za-z\u00c0-\u024f]+$")
_RX_PREFIX = re.compile(r"^([0-9A-Za-z\u00c0-\u024f]+)\.[*+]$")


def osa_distance(a: str, b: str, cap: int) -> int:
    """Optimal-string-alignment (restricted Damerau-Levenshtein) distance —
    the metric of Lucene's transpositions=true fuzzy automaton: one edit per
    adjacent swap, no edits inside a swapped pair. Returns cap+1 early when
    the length gap alone exceeds cap."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ai == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if i > 1 and j > 1 and ai == b[j - 2] and a[i - 2] == b[j - 1]:
                v = min(v, prev2[j - 2] + 1)
            cur[j] = v
        prev2, prev = prev, cur
    return prev[lb]


def _osa_filter_udf(q_suf: str, max_edits: int, prefix_length: int):
    """Arrow-batched boolean filter: OSA(term_suffix, query_suffix) <=
    max_edits. Runs only on the JVM levenshtein band's survivors — a
    dict-scale trickle, never postings."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def ok(terms: pd.Series) -> pd.Series:
        suf = terms.str.slice(prefix_length) if prefix_length else terms
        return suf.map(lambda t: osa_distance(t, q_suf, max_edits) <= max_edits)

    return ok


def _regex_match_col(col, pattern: str):
    """SimplestMatcher rewrite (reference TextPatternRegex.rewriteForQuery,
    TextPatternRegex.java:73-98): REGEX -> TERM equality / PREFIX startswith
    fast paths over the sorted dict before falling back to rlike — equality
    and prefix predicates are sargable string ops, no per-row regex engine.
    `col` is a column name or a Column expression (e.g. the di accent-fold
    translate)."""
    c = F.col(col) if isinstance(col, str) else col
    if _RX_LITERAL.match(pattern):
        return c == pattern
    m = _RX_PREFIX.match(pattern)
    if m:
        pre = m.group(1)
        p = c.startswith(pre)
        return p if pattern.endswith("*") else p & (F.length(c) > len(pre))
    return c.rlike(f"^(?:{pattern})$")


def _decode_group(pdf: pd.DataFrame, need_pos: bool):
    """Decode all block rows of one shard into flat arrays.

    Returns (qidx, doc, tf, dl[, pos arrays]) where pos is aligned with
    per-doc tf segments (positions of doc i occupy a tf[i]-long slice)."""
    qs, ds, ts, ls, ps = [], [], [], [], []
    for r in pdf.itertuples(index=False):
        docs = delta_decode(decode_ints(r.doc_ids))
        tfs = decode_ints(r.tfs)
        dls = decode_ints(r.dls)
        qs.append(np.full(len(docs), r.qidx, dtype=np.int64))
        ds.append(docs)
        ts.append(tfs)
        ls.append(dls)
        if need_pos:
            ps.append(delta_decode_segmented(decode_ints(r.positions), tfs))
    if not ds:
        z = np.empty(0, np.int64)
        return (z, z, z, z, z) if need_pos else (z, z, z, z)
    out = (np.concatenate(qs), np.concatenate(ds), np.concatenate(ts), np.concatenate(ls))
    return out + (np.concatenate(ps),) if need_pos else out


def _hits_explode(postings: DataFrame) -> DataFrame:
    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            _, doc, tf, _, pos = _decode_group(pdf, True)
            docs_rep = np.repeat(doc, tf)
            yield pd.DataFrame(
                {"doc_id": docs_rep, "start": pos.astype(np.int32),
                 "end": (pos + 1).astype(np.int32)}
            )

    return postings.mapInPandas(kernel, HITS_SCHEMA)


def _expand_positions(qidx, doc, tf, pos):
    """(qidx, doc) per position row."""
    return np.repeat(qidx, tf), np.repeat(doc, tf), pos


def _phrase_kernel(k: int):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        qidx, doc, tf, _, pos = _decode_group(pdf, True)
        if len(doc) == 0:
            return pd.DataFrame(columns=["doc_id", "start", "end"])
        q_r, d_r, p_r = _expand_positions(qidx, doc, tf, pos)
        # local dense doc index so composite keys fit in int64 at any scale
        udocs, dloc = np.unique(d_r, return_inverse=True)
        M = np.int64(1) << 32
        cur = None  # composite keys of candidate phrase START positions
        for i in range(k):
            sel = q_r == i
            keys = dloc[sel] * M + (p_r[sel] - i)
            keys = np.unique(keys)
            cur = keys if cur is None else cur[np.isin(cur, keys, assume_unique=True)]
            if len(cur) == 0:
                break
        if cur is None or len(cur) == 0:
            return pd.DataFrame(columns=["doc_id", "start", "end"])
        d_out = udocs[(cur // M).astype(np.int64)]
        s_out = (cur % M).astype(np.int32)
        return pd.DataFrame({"doc_id": d_out, "start": s_out, "end": s_out + k})

    return kernel


def _near_kernel(min_gap: int, max_gap: int, ordered: bool):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        qidx, doc, tf, _, pos = _decode_group(pdf, True)
        if len(doc) == 0:
            return pd.DataFrame(columns=["doc_id", "start", "end"])
        q_r, d_r, p_r = _expand_positions(qidx, doc, tf, pos)
        udocs, dloc = np.unique(d_r, return_inverse=True)
        M = np.int64(1) << 32

        def pairs(qa, qb):
            """spans a..b where gap = b.pos - (a.pos+1) in [min,max]."""
            a_sel, b_sel = q_r == qa, q_r == qb
            ka = np.sort(dloc[a_sel] * M + p_r[a_sel])
            kb = np.sort(dloc[b_sel] * M + p_r[b_sel])
            lo = np.searchsorted(kb, ka + 1 + min_gap, side="left")
            hi = np.searchsorted(kb, ka + 1 + max_gap, side="right")
            cnt = hi - lo
            src = np.repeat(np.arange(len(ka)), cnt)
            offs = np.arange(cnt.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            tgt = lo[src] + offs
            d_out = udocs[(ka[src] // M).astype(np.int64)]
            s_out = (ka[src] % M).astype(np.int32)
            e_out = (kb[tgt] % M).astype(np.int32) + 1
            # guard: same doc (keys in same doc block)
            ok = (kb[tgt] // M) == (ka[src] // M)
            return d_out[ok], s_out[ok], e_out[ok]

        d1, s1, e1 = pairs(0, 1)
        if ordered:
            d_out, s_out, e_out = d1, s1, e1
        else:
            d2, s2, e2 = pairs(1, 0)
            d_out = np.concatenate([d1, d2])
            s_out = np.concatenate([s1, s2])
            e_out = np.concatenate([e1, e2])
        out = pd.DataFrame({"doc_id": d_out, "start": s_out, "end": e_out})
        return out.drop_duplicates()

    return kernel


def _docset_kernel(op: str, n_q: int):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        qidx, doc, _, _ = _decode_group(pdf, False)
        if len(doc) == 0:
            return pd.DataFrame(columns=["doc_id"])
        if op == "and":
            cur = None
            for i in range(n_q):
                s = np.unique(doc[qidx == i])
                cur = s if cur is None else np.intersect1d(cur, s, assume_unique=True)
            out = cur if cur is not None else np.empty(0, np.int64)
        else:  # andnot: qidx 0 minus qidx 1
            yes = np.unique(doc[qidx == 0])
            no = np.unique(doc[qidx == 1])
            out = np.setdiff1d(yes, no, assume_unique=True)
        return pd.DataFrame({"doc_id": out})

    return kernel


def _score_arrays(qidx, doc, tf, dl, idf: dict, avgdl: float, quantize: bool):
    """Exact BM25 with the oracle's float association order (qidx asc)."""
    if len(doc) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    if quantize:
        dl = quantize_dl(dl)
    # merge variant term_ids sharing a qidx: sum tf per (doc, qidx)
    order = np.lexsort((qidx, doc))
    doc, qidx, tf, dl = doc[order], qidx[order], tf[order], dl[order]
    change = np.empty(len(doc), dtype=bool)
    change[0] = True
    np.logical_or(doc[1:] != doc[:-1], qidx[1:] != qidx[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    tf_sum = np.add.reduceat(tf, starts)
    doc_g, qidx_g, dl_g = doc[starts], qidx[starts], dl[starts]
    idf_arr = np.zeros(max(idf.keys()) + 1 if idf else 1, dtype=np.float64)
    for q, v in idf.items():
        idf_arr[q] = v
    tf_f = tf_sum.astype(np.float64)
    tfnorm = tf_f / (tf_f + K1 * (1 - B + B * dl_g.astype(np.float64) / avgdl))
    contrib = idf_arr[qidx_g] * tfnorm * (K1 + 1)
    # sum per doc in qidx order (rows already sorted by (doc, qidx))
    dchange = np.empty(len(doc_g), dtype=bool)
    dchange[0] = True
    np.not_equal(doc_g[1:], doc_g[:-1], out=dchange[1:])
    dstarts = np.flatnonzero(dchange)
    scores = np.add.reduceat(contrib, dstarts)
    return doc_g[dstarts], scores


def _term_contribs(qidx, doc, tf, dl, idf: dict, avgdl: float, quantize: bool):
    """Exact per-(term, doc) BM25 contributions (variant tfs merged per doc
    first). Returns {qidx: (docs ascending, contributions)} — the tight
    'already-decoded term' bound source for the WAND skip test."""
    out: dict[int, tuple] = {}
    if len(doc) == 0:
        return out
    if quantize:
        dl = quantize_dl(dl)
    order = np.lexsort((qidx, doc))
    doc, qidx, tf, dl = doc[order], qidx[order], tf[order], dl[order]
    change = np.empty(len(doc), dtype=bool)
    change[0] = True
    np.logical_or(doc[1:] != doc[:-1], qidx[1:] != qidx[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    tf_sum = np.add.reduceat(tf, starts).astype(np.float64)
    doc_g, qidx_g, dl_g = doc[starts], qidx[starts], dl[starts]
    idf_arr = np.zeros(max(idf.keys()) + 1 if idf else 1, dtype=np.float64)
    for q, v in idf.items():
        idf_arr[q] = v
    contrib = (
        idf_arr[qidx_g] * (K1 + 1) * tf_sum
        / (tf_sum + K1 * (1 - B + B * dl_g.astype(np.float64) / avgdl))
    )
    for q in np.unique(qidx_g):
        m = qidx_g == q
        out[int(q)] = (doc_g[m], contrib[m])  # doc order preserved (asc)
    return out


def _wand_multi(
    pdf: pd.DataFrame,
    idf: dict,
    avgdl: float,
    k: int,
    quantize: bool,
    allowed: np.ndarray | None = None,
):
    """Multi-term block-max WAND (BASELINE.json names it; reference analog:
    the lazy bounded fetch in HitsFromQuery.java:155-236 + per-block max
    impact stats stored at build). Exact top-k with block skipping:

    1. SEED: decode every block of the highest-idf term (plus any term with
       >1 surface variant in this shard, whose per-block bounds would not be
       additive); kth partial score = theta, a LOWER bound on the true kth.
    2. PRUNE: for each remaining term's block b, upper-bound the total score
       any doc in b could reach: UB(b) + sum over other terms' max block UB
       *restricted to terms whose doc ranges overlap b*. Blocks provably
       under theta are skipped — the doc-range alignment with the rare
       term's postings is what makes common-term blocks skippable.
    3. VERIFY: partial scores are lower bounds; per doc, slack = sum of UBs
       of skipped blocks whose doc range contains it. Docs with
       score + slack >= theta get their skipped blocks decoded (exact).

    Returns (docs, scores, n_blocks, n_decoded). Correctness does not depend
    on the bounds being tight — loose bounds only decode more.

    `allowed` (sorted doc ids) restricts the RESULT to a doc filter while
    keeping the walk exact: blocks whose doc range holds no allowed doc are
    dropped before anything decodes, and theta/scores compute over allowed
    docs only (a disallowed high-scorer must not raise the skip threshold).
    Block bounds stay unmasked — an upper bound over all docs of a block
    upper-bounds its allowed subset."""
    if allowed is not None and len(pdf):
        fd0 = pdf["first_doc"].to_numpy(np.int64)
        ld0 = pdf["last_doc"].to_numpy(np.int64)
        has = np.searchsorted(allowed, ld0, side="right") > np.searchsorted(
            allowed, fd0, side="left"
        )
        pdf = pdf[has]
        if len(pdf) == 0:
            z = np.empty(0, np.int64)
            return z, np.empty(0, np.float64), 0, 0
    qidx = pdf["qidx"].to_numpy(np.int64)
    tids = pdf["term_id"].to_numpy(np.int64)
    mt = pdf["max_tf"].to_numpy(np.float64)
    ml = pdf["min_dl"].to_numpy(np.int64)
    if quantize:
        ml = quantize_dl(ml)
    fd = pdf["first_doc"].to_numpy(np.int64)
    ld = pdf["last_doc"].to_numpy(np.int64)
    idf_row = np.array([idf.get(int(q), 0.0) for q in qidx])
    ub = idf_row * (K1 + 1) * mt / (mt + K1 * (1 - B + B * ml.astype(np.float64) / avgdl))
    n_blocks = len(pdf)

    # terms with >1 surface variant in this shard: per-block bounds are not
    # additive across variants (tf sums before normalization) — just decode
    q_variants = pd.DataFrame({"q": qidx, "t": tids}).groupby("q")["t"].nunique()
    multi_var = {int(q) for q, n in q_variants.items() if n > 1}
    present = sorted(set(int(q) for q in qidx))
    seed_q = max(present, key=lambda q: (idf.get(q, 0.0), -q))
    decode_mask = np.isin(qidx, [seed_q] + sorted(multi_var))

    def decode_rows(mask):
        if not mask.any():
            z = np.empty(0, np.int64)
            return z, z, z, z
        return _decode_group(pdf.iloc[np.flatnonzero(mask)], False)

    acc = [decode_rows(decode_mask)]

    def score_acc():
        qs = np.concatenate([a[0] for a in acc])
        ds = np.concatenate([a[1] for a in acc])
        ts = np.concatenate([a[2] for a in acc])
        ls = np.concatenate([a[3] for a in acc])
        if allowed is not None:
            m = np.isin(ds, allowed)
            qs, ds, ts, ls = qs[m], ds[m], ts[m], ls[m]
        return _score_arrays(qs, ds, ts, ls, idf, avgdl, quantize)

    d0, s0 = score_acc()
    theta = np.partition(s0, -k)[-k] if len(s0) >= k else -np.inf

    remaining = [q for q in present if q != seed_q and q not in multi_var]
    skipped_rows: list[int] = []
    if np.isfinite(theta):
        # decoded terms: exact per-(term, doc) contributions — the skip test
        # then aligns with the seed term's ACTUAL docs (the WAND move), not
        # its block ranges, which typically span the whole shard
        dq, dd, dt, dl_ = acc[0]
        dec_contrib = _term_contribs(dq, dd, dt, dl_, idf, avgdl, quantize)
        # non-decoded terms: sorted block ranges for a coarse overlap bound
        ranges = {}
        for q in remaining:
            rows_q = np.flatnonzero(qidx == q)
            o = np.argsort(fd[rows_q], kind="stable")
            rq = rows_q[o]
            ranges[q] = (fd[rq], ld[rq], float(ub[rq].max()) if len(rq) else 0.0)
        for q in remaining:
            rows_q = np.flatnonzero(qidx == q)
            other = np.zeros(len(rows_q))
            for q2, (docs2, con2) in dec_contrib.items():
                lo = np.searchsorted(docs2, fd[rows_q], side="left")
                hi = np.searchsorted(docs2, ld[rows_q], side="right")
                # max exact contribution of q2 among docs inside each block's
                # doc range (0 when the range holds no q2 doc); vectorized
                # via reduceat over interleaved (lo, hi) pairs — even slots
                # are the [lo, hi) maxima, odd slots are inter-pair junk.
                # A sentinel keeps hi == len(con2) a valid reduceat index.
                mx = np.zeros(len(rows_q))
                nz = hi > lo
                if nz.any():
                    ext = np.append(con2, 0.0)
                    idx = np.empty(2 * int(nz.sum()), np.int64)
                    idx[0::2] = lo[nz]
                    idx[1::2] = hi[nz]
                    mx[nz] = np.maximum.reduceat(ext, idx)[0::2]
                other += mx
            for q2 in remaining:
                if q2 == q:
                    continue
                f2, l2, mx2 = ranges[q2]
                if len(f2) == 0:
                    continue
                # block [fd,ld] overlaps some q2 block iff a q2 block starts
                # <= ld and that run reaches >= fd
                i = np.searchsorted(f2, ld[rows_q], side="right")
                has = np.zeros(len(rows_q), dtype=bool)
                nz = i > 0
                if nz.any():
                    cummax_l2 = np.maximum.accumulate(l2)
                    has[nz] = cummax_l2[i[nz] - 1] >= fd[rows_q[nz]]
                other += np.where(has, mx2, 0.0)
            keep = ub[rows_q] + other >= theta  # keep ties (doc_id break)
            decode_mask[rows_q[keep]] = True
            skipped_rows.extend(rows_q[~keep].tolist())
            if keep.any():
                m = np.zeros(n_blocks, dtype=bool)
                m[rows_q[keep]] = True
                acc.append(decode_rows(m))
    else:
        decode_mask[:] = True
        acc = [decode_rows(decode_mask)]

    docs_c, scores_c = score_acc()
    if skipped_rows and len(scores_c):
        theta2 = (
            np.partition(scores_c, -k)[-k] if len(scores_c) >= k else -np.inf
        )
        # vectorized over the whole skipped set (can be ~all blocks at scale:
        # skipping most blocks is the point of WAND) — searchsorted per array,
        # then a diff-array (+ub at lo, -ub at hi, cumsum) instead of a
        # per-block Python slice-add
        skipped = np.asarray(skipped_rows, dtype=np.int64)
        lo = np.searchsorted(docs_c, fd[skipped], side="left")
        hi = np.searchsorted(docs_c, ld[skipped], side="right")
        nd1 = len(docs_c) + 1
        diff = np.bincount(lo, weights=ub[skipped], minlength=nd1) - np.bincount(
            hi, weights=ub[skipped], minlength=nd1
        )
        slack = np.cumsum(diff[:-1])
        cand = scores_c + slack >= theta2
        if cand.any():
            cd = docs_c[cand]
            need = skipped[
                np.searchsorted(cd, fd[skipped], "left")
                < np.searchsorted(cd, ld[skipped], "right")
            ]
            if len(need):
                m = np.zeros(n_blocks, dtype=bool)
                m[need] = True
                decode_mask |= m
                acc.append(decode_rows(m))
                docs_c, scores_c = score_acc()
    return docs_c, scores_c, n_blocks, int(decode_mask.sum())


def _local_topk(docs: np.ndarray, scores: np.ndarray, k: int) -> pd.DataFrame:
    if len(docs) > k:
        # top-k by (score desc, doc asc)
        idx = np.lexsort((docs, -scores))[:k]
        docs, scores = docs[idx], scores[idx]
    return pd.DataFrame({"doc_id": docs, "score": scores})


def _score_kernel(idf: dict, avgdl: float, k: int, quantize: bool):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=["doc_id", "score"])
        # block-max skipping is valid only when each doc appears in exactly one
        # block: one query term AND one surface variant (one posting list)
        if len(idf) == 1 and pdf["term_id"].nunique() == 1:
            # block-max skipping: process blocks in upper-bound-desc order,
            # stop when the bound can't beat the current kth score
            q = next(iter(idf))
            mt = pdf["max_tf"].to_numpy(np.float64)
            # the bound must be computed over the SAME dl transform the scorer
            # uses: quantize_dl rounds DOWN, so a raw min_dl bound could sit
            # BELOW a block's true max score and wrongly prune it. quantize_dl
            # is monotone, so quantize_dl(min_dl) is a valid per-block min.
            ml_i = pdf["min_dl"].to_numpy(np.int64)
            if quantize:
                ml_i = quantize_dl(ml_i)
            ml = ml_i.astype(np.float64)
            bound = idf[q] * (K1 + 1) * mt / (mt + K1 * (1 - B + B * ml / avgdl))
            order = np.argsort(-bound)
            # decode in bound-descending CHUNKS, not block-at-a-time: one
            # pandas slice + one _decode_group per chunk is ~6x cheaper than
            # per-block iloc (measured 24ms -> 4ms on a 24-block head-term
            # shard), and the skip test between chunks keeps the pruning —
            # at most CHUNK-1 extra blocks decode vs the exact walk
            best_docs, best_scores = [], []
            kth = -np.inf
            n_seen = 0
            ci, chunk = 0, 4  # ramp 4 -> 32: tail terms stop after one tiny chunk
            while ci < len(order):
                take = order[ci : ci + chunk]
                ci += chunk
                chunk = 32
                if n_seen >= k:
                    # keep ties (>=): a block bounding exactly kth can hold a
                    # doc tying the kth score with a smaller doc_id (the
                    # global tie-break), same rule as _wand_multi's theta
                    take = take[bound[take] >= kth]
                    if len(take) == 0:
                        break
                rows = pdf.iloc[take]
                qx, dc, tf, dl = _decode_group(rows, False)
                d, s = _score_arrays(qx, dc, tf, dl, idf, avgdl, quantize)
                best_docs.append(d)
                best_scores.append(s)
                n_seen += len(d)
                if n_seen >= k:
                    allsc = np.concatenate(best_scores)
                    kth = np.partition(allsc, -k)[-k] if len(allsc) >= k else -np.inf
            if not best_docs:
                return pd.DataFrame(columns=["doc_id", "score"])
            return _local_topk(np.concatenate(best_docs), np.concatenate(best_scores), k)
        if len(idf) > 1:
            d, s, _, _ = _wand_multi(pdf, idf, avgdl, k, quantize)
            return _local_topk(d, s, k)
        qx, dc, tf, dl = _decode_group(pdf, False)
        d, s = _score_arrays(qx, dc, tf, dl, idf, avgdl, quantize)
        return _local_topk(d, s, k)

    return kernel


def _score_kernel_filtered(idf: dict, avgdl: float, k: int, quantize: bool):
    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(columns=["doc_id", "score"])
        allowed = np.unique(right["doc_id"].to_numpy(np.int64))
        # single-term: the block-max walk stays EXACT under a doc filter —
        # a block's bound is an upper bound over ALL its docs, hence over
        # the allowed subset too. Two prunes the unfiltered path can't get:
        # drop blocks whose [first_doc, last_doc] range contains no allowed
        # doc at all (doc-sorted blocks, one searchsorted), then the same
        # chunked bound-descending walk with the kth cutoff.
        if len(idf) == 1 and left["term_id"].nunique() == 1:
            q = next(iter(idf))
            fd = left["first_doc"].to_numpy(np.int64)
            ld = left["last_doc"].to_numpy(np.int64)
            nonempty = np.searchsorted(allowed, ld, side="right") > np.searchsorted(
                allowed, fd, side="left"
            )
            pdf = left[nonempty]
            if len(pdf) == 0:
                return pd.DataFrame(columns=["doc_id", "score"])
            mt = pdf["max_tf"].to_numpy(np.float64)
            ml_i = pdf["min_dl"].to_numpy(np.int64)
            if quantize:
                ml_i = quantize_dl(ml_i)
            ml = ml_i.astype(np.float64)
            bound = idf[q] * (K1 + 1) * mt / (mt + K1 * (1 - B + B * ml / avgdl))
            order = np.argsort(-bound)
            best_docs, best_scores = [], []
            kth = -np.inf
            n_seen = 0
            ci, chunk = 0, 4
            while ci < len(order):
                take = order[ci : ci + chunk]
                ci += chunk
                chunk = 32
                if n_seen >= k:
                    take = take[bound[take] >= kth]  # keep ties (doc_id break)
                    if len(take) == 0:
                        break
                qx, dc, tf, dl = _decode_group(pdf.iloc[take], False)
                m = np.isin(dc, allowed)
                d, s = _score_arrays(qx[m], dc[m], tf[m], dl[m], idf, avgdl, quantize)
                best_docs.append(d)
                best_scores.append(s)
                n_seen += len(d)
                if n_seen >= k:
                    allsc = np.concatenate(best_scores)
                    kth = np.partition(allsc, -k)[-k] if len(allsc) >= k else -np.inf
            if not best_docs:
                return pd.DataFrame(columns=["doc_id", "score"])
            return _local_topk(
                np.concatenate(best_docs), np.concatenate(best_scores), k
            )
        if len(idf) > 1:
            # multi-term + filter: the WAND walk with the allowed set —
            # range-pruned blocks, theta over allowed docs only
            d, s, _, _ = _wand_multi(left, idf, avgdl, k, quantize, allowed=allowed)
            return _local_topk(d, s, k)
        qx, dc, tf, dl = _decode_group(left, False)
        mask = np.isin(dc, allowed)
        d, s = _score_arrays(qx[mask], dc[mask], tf[mask], dl[mask], idf, avgdl, quantize)
        return _local_topk(d, s, k)

    return kernel
