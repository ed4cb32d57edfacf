"""BlackLab Server analog: HTTP search API + search cache.

The reference exposes every search operation over HTTP with a result cache
(server/ + wslib/ modules; request flow SURVEY.md §3.2:
RequestHandlerHits -> WebserviceRequestHandler.opHits,
wslib/.../results/WebserviceRequestHandler.java:105-122; cache:
BlsCache, doc/technical/blacklab-internals.md:163-193 — "dedupe identical
searches, async Futures, memory-based eviction"). This module is the
PySpark-side equivalent, stdlib-only (http.server + threading):

- `SearchCache` — BlsCache analog: identical in-flight searches share ONE
  execution (per-key completion events), finished payloads are kept under
  an LRU + max-age policy, and every entry is a BOUNDED window (never a
  full hit set), so cache memory is O(entries * window), not data-scale.
- `BlackLabServer` — endpoints mirroring the reference's URL surface
  (wslib/.../WebserviceOperation.java names):
    GET /blacklab-server                       server info
    GET /blacklab-server/<corpus>              corpus info
    GET /blacklab-server/<corpus>/hits         patt, first, number, sort,
                                               group, filter, sample,
                                               wordsaroundhit, waitfortotal
    GET /blacklab-server/<corpus>/docs         patt/filter -> per-doc counts,
                                               group= -> docGroups
    GET /blacklab-server/<corpus>/docs/<pid>   docInfo (+ contents=true)
    GET /blacklab-server/<corpus>/docs/<pid>/snippet   hitstart/hitend or
                                               wordstart/wordend context
    GET /blacklab-server/<corpus>/termfreq     annotation, sensitive, number
    GET /blacklab-server/<corpus>/autocomplete/<field>[/<annotation>]?term=
    GET /blacklab-server/<corpus>/fields/<name>  field info + value freqs
    GET /blacklab-server/<corpus>/relations    relation classes/types + spans
    GET /blacklab-server/<corpus>/status       index status
    GET /blacklab-server/input-formats         reader registry
    GET /blacklab-server/parse-pattern?patt=   parse-only (CQL + JSON IR)
    GET /blacklab-server/cache-info            cache stats (debug endpoint)

`/hits?calc=colloc` returns collocations (tokenFrequencies);
`outputformat=csv` on /hits and /docs returns CSV (WriteCsv analog).

Response JSON follows the reference's shapes (summary / hits+docInfos /
hitGroups / docs), so a BLS client maps 1:1 onto this API.

Distribution discipline: every request collects ONLY its requested window
(`number` capped at MAX_WINDOW); totals come from Spark-side count()s. The
heavy lifting (sort, group, filter, KWIC) stays in DataFrame plans —
results.py / query.py operators — so a request over a 100-TB index ships
`number` rows to the driver, nothing else.
"""

from __future__ import annotations

import json
import re
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import functions as F

from . import bcql, results
from .query import Index

MAX_WINDOW = 1000  # BLS `maxretrieve` analog: rows shipped per request
DEFAULT_NUMBER = 20  # BLS default window size


# --------------------------------------------------------------------------
# SearchCache — BlsCache analog (blacklab-internals.md:163-193)
# --------------------------------------------------------------------------


@dataclass
class _CacheEntry:
    done: threading.Event = field(default_factory=threading.Event)
    payload: dict | None = None
    error: Exception | None = None
    created: float = 0.0
    last_access: float = 0.0
    compute_ms: int = 0


class SearchCache:
    """Dedupe + memoize completed searches.

    Identical concurrent requests block on the FIRST request's entry instead
    of re-running the Spark job (the reference's "identical searches share a
    future"). Completed entries evict LRU past `max_entries` or past
    `max_age_s` — the memory-based eviction analog; every payload is a
    bounded window, so entry size is O(MAX_WINDOW)."""

    def __init__(self, max_entries: int = 128, max_age_s: float = 3600.0):
        self.max_entries = max_entries
        self.max_age_s = max_age_s
        self._lock = threading.Lock()
        self._entries: dict[tuple, _CacheEntry] = {}
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key: tuple, compute) -> dict:
        with self._lock:
            ent = self._entries.get(key)
            if ent is not None and ent.done.is_set():
                age = time.time() - ent.created
                if age > self.max_age_s or ent.error is not None:
                    del self._entries[key]
                    ent = None
            if ent is not None:
                self.hits += 1
                ent.last_access = time.time()
                owner = False
            else:
                self.misses += 1
                ent = _CacheEntry(created=time.time(), last_access=time.time())
                self._entries[key] = ent
                owner = True
                self._evict_locked()
        if owner:
            t0 = time.time()
            try:
                ent.payload = compute()
                ent.compute_ms = int((time.time() - t0) * 1000)
            except Exception as e:  # surfaced to every waiter
                ent.error = e
            finally:
                ent.done.set()
        else:
            ent.done.wait()
        if ent.error is not None:
            raise ent.error
        return ent.payload

    def _evict_locked(self) -> None:
        while len(self._entries) > self.max_entries:
            victim = min(
                (k for k, e in self._entries.items() if e.done.is_set()),
                key=lambda k: self._entries[k].last_access,
                default=None,
            )
            if victim is None:  # everything in flight: let it ride
                return
            del self._entries[victim]

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()

    def clear_corpus(self, corpus: str) -> None:
        """Drop every cached search for one corpus — required after an
        add-to-index/delete so stale windows never serve (the reference
        invalidates BlsCache entries when the index version changes)."""
        with self._lock:
            for k in [k for k in self._entries if k and k[0] == corpus]:
                del self._entries[k]

    def discard(self, key: tuple) -> None:
        """Drop one entry (used to avoid caching still-counting payloads)."""
        with self._lock:
            self._entries.pop(key, None)

    def info(self) -> dict:
        with self._lock:
            return {
                "numberOfSearches": len(self._entries),
                "hits": self.hits,
                "misses": self.misses,
                "maxEntries": self.max_entries,
                "maxAgeSec": self.max_age_s,
                "searches": [
                    {
                        "ageSec": round(time.time() - e.created, 1),
                        "computeMs": e.compute_ms,
                        "done": e.done.is_set(),
                    }
                    for e in self._entries.values()
                ],
            }


class AsyncCounts:
    """BLS async-counting analog (waitfortotal=false → summary.stillCounting:
    the reference's hits count keeps running after the window returns,
    SearchCacheEntry future model). One counting thread per distinct search;
    requests observe the running state without blocking. Spark supports
    concurrent jobs from multiple driver threads, so the count runs beside
    window fetches."""

    def __init__(self):
        self._lock = threading.Lock()
        self._futs: dict[tuple, dict] = {}

    def get_or_start(self, key: tuple, compute) -> tuple[int | None, bool]:
        """(value, still_counting). Starts the count on first call."""
        with self._lock:
            ent = self._futs.get(key)
            if ent is None:
                ent = {"done": threading.Event(), "value": None}
                self._futs[key] = ent

                def run():
                    try:
                        ent["value"] = compute()
                    finally:
                        ent["done"].set()

                threading.Thread(target=run, daemon=True).start()
        if ent["done"].is_set():
            return ent["value"], False
        return None, True


# --------------------------------------------------------------------------
# request execution (WebserviceRequestHandler.opHits / opDocs analogs)
# --------------------------------------------------------------------------

_META_EXCLUDE = {
    "shard", "text", "tokens", "tokens_fold", "tokens_lemma", "tokens_pos",
    "sents", "tags", "tok_offs", "mv", "relations",
}


def _meta_cols(ix: Index) -> list[str]:
    return [
        c for c, _t in ix.docs.dtypes
        if c not in _META_EXCLUDE and c != "doc_id"
    ]


def _doc_infos(ix: Index, doc_ids: list[int]) -> dict:
    if not doc_ids:
        return {}
    cols = _meta_cols(ix)
    rows = (
        ix.docs.filter(F.col("doc_id").isin(list(set(doc_ids))))
        .select("doc_id", *cols)
        .collect()
    )
    out = {}
    for r in rows:
        d = {c: r[c] for c in cols}
        pid = d.pop("url", str(r["doc_id"]))
        d["lengthInTokens"] = d.pop("doc_len", None)
        if d.get("warc_ts") is not None:
            d["warc_ts"] = str(d["warc_ts"])
        out[str(r["doc_id"])] = {"pid": pid, **d}
    return out


def _parse_sort(ix: Index, hits, sort: str, context: int):
    """BLS sort values -> results.sort_hits props. Supports the reference's
    common forms: hit/match, left/before, right/after, field:<name>,
    capture:<name>, doc; '-' prefix = descending; comma list = multi-key
    (HitPropertyMultiple)."""
    desc = sort.startswith("-")
    if desc:
        sort = sort[1:]
    prop_map = {
        "hit": "match", "match": "match", "left": "before",
        "before": "before", "right": "after", "after": "after",
        "doc": "doc", "position": "position",
    }
    props = []
    for p in sort.split(","):
        p = p.strip()
        if p.startswith("field:"):
            props.append("metadata:" + p.split(":", 1)[1])
        elif p.startswith("capture:") or p.startswith("metadata:"):
            props.append(p)
        elif p in prop_map:
            props.append(prop_map[p])
        else:
            raise ValueError(f"unknown sort property: {p!r}")
    return results.sort_hits(ix, hits, by=props, context=context, descending=desc)


def _hits_base(ix: Index, params: dict):
    patt = params.get("patt")
    if not patt:
        raise ValueError("missing required parameter: patt")
    hits = bcql.find(ix, patt)
    if params.get("filter"):
        hits = results.filter_hits_by_metadata(ix, hits, params["filter"])
    if params.get("sample"):
        hits = results.sample_hits(
            hits,
            fraction=float(params["sample"]) / 100.0,
            seed=int(params.get("sampleseed", 42)),
        )
    elif params.get("samplenum"):
        hits = results.sample_hits(
            hits, n=int(params["samplenum"]),
            seed=int(params.get("sampleseed", 42)),
        )
    if params.get("hitfiltercrit") and params.get("hitfilterval") is not None:
        # BLS hitfiltercrit/hitfilterval: keep hits whose property value
        # matches (HitFilterSettings; same property grammar as group=)
        hits = _hit_group_key(ix, hits, params["hitfiltercrit"]).filter(
            F.col("_key").cast("string").eqNullSafe(params["hitfilterval"])
        ).drop("_key")
    return hits


def op_hits(ix: Index, params: dict, counts: AsyncCounts | None = None) -> dict:
    """GET /<corpus>/hits (WebserviceRequestHandler.opHits:105-122 —
    grouped? else windowed hit list + docInfos). waitfortotal=false returns
    the window immediately with summary.stillCounting=true while the total
    counts on a background thread (the reference's async count)."""
    t0 = time.time()
    first = max(0, int(params.get("first", 0)))
    number = min(MAX_WINDOW, max(0, int(params.get("number", DEFAULT_NUMBER))))
    context = min(50, max(0, int(params.get("wordsaroundhit", 5))))
    hits = _hits_base(ix, params)

    if params.get("calc") in ("colloc", "collocations"):
        # collocations request rides the hits URL in the reference too
        # (WebserviceRequestHandler.opHits: isCalculateCollocations branch)
        tf = results.collocations(
            ix, hits, context=context,
            fold=params.get("sensitive", "false").lower()
            not in ("true", "1", "yes"),
        )
        rows = tf.orderBy(F.col("n").desc(), "term").limit(number).collect()
        return {
            "summary": _summary(params, 0, number, len(rows), None, None, t0),
            "tokenFrequencies": {r["term"]: r["n"] for r in rows},
        }

    group = params.get("group")
    if group and params.get("viewgroup") is not None:
        # view ONE group's hits (BLS viewgroup param, RequestHandlerHits ->
        # opHits grouped+viewGroup branch): filter by the per-hit group key,
        # then fall through to the normal windowed hit-list response
        hits = _hit_group_key(ix, hits, group).filter(
            F.col("_key").cast("string").eqNullSafe(params["viewgroup"])
        ).drop("_key")
    elif group:
        return _op_hits_grouped(ix, params, hits, group, t0)

    wait = params.get("waitfortotal", "true").lower() not in ("false", "0", "no")
    still = False
    if wait or counts is None:
        total = hits.count()
        n_docs = hits.select("doc_id").distinct().count()
    else:
        ckey = tuple(sorted(
            (k, v) for k, v in params.items()
            if k in ("patt", "filter", "sample", "samplenum", "sampleseed",
                     "hitfiltercrit", "hitfilterval")
        ))
        total, still = counts.get_or_start(ckey, hits.count)
        n_docs = None if still else hits.select("doc_id").distinct().count()
    if params.get("sort"):
        shits = _parse_sort(ix, hits, params["sort"], context)
    else:
        shits = hits.orderBy("doc_id", "start", "end")
    # the window ships to the driver in SORT order (orderBy().limit() =
    # TakeOrderedAndProject — bounded rows, ordered output); KWIC text is
    # fetched for exactly those rows via one tiny (broadcastable) join and
    # merged driver-side so the response order stays the sort order
    rows = shits.limit(first + number).collect()[first:]
    cap_cols = [
        c for c in shits.columns
        if c.endswith("_start") and f"{c[:-6]}_end" in shits.columns
    ]
    keydf = ix.spark.createDataFrame(
        [(r["doc_id"], r["start"], r["end"]) for r in rows],
        "doc_id long, start int, end int",
    )
    # one KWIC slice per annotation layer (the reference's Kwic carries every
    # annotation per token): word from `tokens`, lemma/pos from their
    # forward-index columns when the index has them
    layer_cols = {"word": "tokens"}
    for a in ix.annotations:
        if a != "word":
            layer_cols[a] = f"tokens_{a}"
    kwmaps = {
        a: {
            (k["doc_id"], k["start"], k["end"]): k
            for k in ix.kwic(keydf, context=context, col=c).collect()
        }
        for a, c in layer_cols.items()
    } if rows else {a: {} for a in layer_cols}

    def ctx(part, key):
        out = {}
        for a in layer_cols:
            k = kwmaps[a].get(key)
            out[a] = k[part].split(" ") if k and k[part] else []
        return out

    hit_rows = []
    for r in rows:
        key = (r["doc_id"], r["start"], r["end"])
        h = {
            "docPid": str(r["doc_id"]),
            "start": r["start"],
            "end": r["end"],
            "left": ctx("left", key),
            "match": ctx("match", key),
            "right": ctx("right", key),
        }
        caps = {}
        for c in cap_cols:
            name = c[: -len("_start")]
            if r[c] is not None:
                caps[name] = {"start": r[c], "end": r[f"{name}_end"]}
        if caps:
            h["captureGroups"] = caps
        hit_rows.append(h)
    return {
        "summary": _summary(
            params, first, number, len(hit_rows), total, n_docs, t0, still=still
        ),
        "hits": hit_rows,
        "docInfos": _doc_infos(ix, [r["doc_id"] for r in rows]),
    }


def _hit_group_key(ix: Index, hits, group: str):
    """Per-hit group key column `_key` for a BLS group property — the
    row-level counterpart of the aggregations in _op_hits_grouped, used by
    viewgroup= to select one group's hits."""
    if group in ("hit", "match"):
        return results._hit_text_col(ix, hits, "match", 5, fold=True)
    if group in ("wordleft", "before"):
        return results._hit_text_col(ix, hits, "before", 1, fold=True)
    if group in ("wordright", "after"):
        return results._hit_text_col(ix, hits, "after", 1, fold=True)
    if group.startswith("capture:"):
        name = group.split(":", 1)[1]
        if f"{name}_start" not in hits.columns:
            raise ValueError(f"pattern has no capture group {name!r}")
        j = hits.join(
            ix.docs.select("doc_id", F.col("tokens_fold").alias("_toks")), "doc_id"
        )
        key = F.array_join(
            F.slice(
                F.col("_toks"), F.col(f"{name}_start") + 1,
                F.col(f"{name}_end") - F.col(f"{name}_start"),
            ),
            " ",
        )
        return j.withColumn("_key", key).drop("_toks")
    if group.startswith("field:"):
        fld = group.split(":", 1)[1]
        return hits.join(ix.docs.select("doc_id", fld), "doc_id").withColumn(
            "_key", F.col(fld).cast("string")
        ).drop(fld)
    if group.startswith("decade:"):
        fld = group.split(":", 1)[1]
        return hits.join(ix.docs.select("doc_id", fld), "doc_id").withColumn(
            "_key", (F.floor(F.year(fld) / 10) * 10).cast("long").cast("string")
        ).drop(fld)
    raise ValueError(f"unknown group property: {group!r}")


def _op_hits_grouped(ix: Index, params: dict, hits, group: str, t0: float) -> dict:
    """group= values: hit/match text, wordleft/wordright context,
    capture:<name>, field:<name>, decade:<field> (HitProperty names,
    reference wslib request parsing)."""
    first = max(0, int(params.get("first", 0)))
    number = min(MAX_WINDOW, max(0, int(params.get("number", DEFAULT_NUMBER))))
    if group in ("hit", "match"):
        g = results.group_hits_by_text(ix, hits, part="match").select(
            "group_key", "size"
        )
    elif group in ("wordleft", "before"):
        g = results.group_hits_by_text(ix, hits, part="before", context=1).select(
            "group_key", "size"
        )
    elif group in ("wordright", "after"):
        g = results.group_hits_by_text(ix, hits, part="after", context=1).select(
            "group_key", "size"
        )
    elif group.startswith("capture:"):
        cap = group.split(":", 1)[1]
        if f"{cap}_start" not in hits.columns:
            raise ValueError(f"pattern has no capture group {cap!r}")
        g = results.group_hits_by_capture(ix, hits, cap)
    elif group.startswith("field:"):
        fld = group.split(":", 1)[1]
        g = results.group_hits_by_metadata(ix, hits, fld).select(
            F.col(fld).cast("string").alias("group_key"), "size"
        )
    elif group.startswith("decade:"):
        g = results.group_hits_by_decade(ix, hits, group.split(":", 1)[1]).select(
            F.col("decade").cast("string").alias("group_key"), "size"
        )
    else:
        raise ValueError(f"unknown group property: {group!r}")
    n_groups = g.count()
    gsort = params.get("sort", "size")
    gdesc = not gsort.startswith("-") if gsort.lstrip("-") == "size" else gsort.startswith("-")
    gsort = gsort.lstrip("-")
    if gsort not in ("size", "identity"):
        raise ValueError(f"unknown group sort property: {gsort!r}")
    rows = results.window_groups(
        g, first, number, by=gsort, descending=gdesc
    ).collect()
    return {
        "summary": {
            **_summary(params, first, number, len(rows), None, None, t0),
            "numberOfGroups": n_groups,
        },
        "hitGroups": [
            {"identity": r["group_key"], "size": r["size"]} for r in rows
        ],
    }


def op_docs(ix: Index, params: dict) -> dict:
    """GET /<corpus>/docs — per-document results (DocResults): with patt,
    docs containing hits + counts; with filter only, metadata-matching docs."""
    t0 = time.time()
    first = max(0, int(params.get("first", 0)))
    number = min(MAX_WINDOW, max(0, int(params.get("number", DEFAULT_NUMBER))))
    hits_df = None
    if params.get("patt"):
        hits_df = _hits_base(ix, params)
        d = results.doc_results(hits_df)
    else:
        d = ix.docs.select("doc_id")
        if params.get("filter"):
            d = d.join(
                ix.docs.filter(F.expr(params["filter"])).select("doc_id"),
                "doc_id", "left_semi",
            )
        d = d.withColumn("n_hits", F.lit(None).cast("long"))
    group = params.get("group")
    if group:
        return _op_docs_grouped(ix, params, d, group, t0)
    total = d.count()
    sort = params.get("sort", "")
    desc = sort.startswith("-")
    if desc:
        sort = sort[1:]
    if sort == "bm25":
        # ranked retrieval over the pattern: the whole span pattern scores
        # as one BM25 unit (Index.topk_spans — tf = hits per doc). Beyond
        # the reference's BLS surface (which never ranks); score is
        # returned per doc. Bounded: only the requested window is planned.
        if hits_df is None:
            raise ValueError("sort=bm25 requires patt")
        top = ix.topk_spans(hits_df, k=first + number)
        rows = (
            top.join(d, "doc_id")
            .orderBy("rank")
            .collect()[first:]
        )
        infos = _doc_infos(ix, [r["doc_id"] for r in rows])
        return {
            "summary": _summary(params, first, number, len(rows), total, total, t0),
            "docs": [
                {
                    "docPid": str(r["doc_id"]),
                    "numberOfHits": r["n_hits"],
                    "score": round(r["score"], 6),
                    "docInfo": infos.get(str(r["doc_id"]), {}),
                }
                for r in rows
            ],
        }
    if not sort or sort == "numhits":
        # default: hit count desc (the reference's docs default)
        key = F.col("n_hits").desc_nulls_last() if not desc else F.col("n_hits").asc_nulls_last()
        order = [key, "doc_id"]
    elif sort.startswith("field:"):
        fld = sort.split(":", 1)[1]
        if fld not in _meta_cols(ix):
            raise ValueError(f"unknown sort field: {fld!r}")
        d = d.join(ix.docs.select("doc_id", fld), "doc_id")
        order = [F.col(fld).desc() if desc else F.col(fld).asc(), "doc_id"]
    elif sort in ("doc", "pid"):
        order = [F.col("doc_id").desc() if desc else F.col("doc_id").asc()]
    else:
        raise ValueError(f"unknown docs sort property: {sort!r}")
    rows = (
        d.orderBy(*order)
        .limit(first + number)
        .collect()[first:]
    )
    infos = _doc_infos(ix, [r["doc_id"] for r in rows])
    return {
        "summary": _summary(params, first, number, len(rows), total, total, t0),
        "docs": [
            {
                "docPid": str(r["doc_id"]),
                "numberOfHits": r["n_hits"],
                "docInfo": infos.get(str(r["doc_id"]), {}),
            }
            for r in rows
        ],
    }


def op_doc_info(ix: Index, doc_pid: str, params: dict) -> dict:
    """GET /<corpus>/docs/<pid> — one docInfo, optional stored contents
    (opDocInfo/opDocContents)."""
    sel = ix.docs.filter(
        (F.col("doc_id").cast("string") == doc_pid) | (F.col("url") == doc_pid)
    )
    row = sel.select("doc_id").limit(1).collect()
    if not row:
        raise KeyError(doc_pid)
    doc_id = row[0]["doc_id"]
    info = _doc_infos(ix, [doc_id])[str(doc_id)]
    out = {"docPid": str(doc_id), "docInfo": info}
    if params.get("contents") in ("true", "1", "yes"):
        txt = sel.select("text").limit(1).collect()[0]["text"]
        out["contents"] = txt
    return out


def op_termfreq(ix: Index, params: dict) -> dict:
    """GET /<corpus>/termfreq (opTermFreq). With `filter`, frequencies are
    computed over the matching documents' forward index (the reference
    restricts termfreq to a metadata subset the same way); without it the
    precomputed dictionary stats answer directly."""
    t0 = time.time()
    number = min(MAX_WINDOW, max(1, int(params.get("number", DEFAULT_NUMBER))))
    annot = params.get("annotation", "word")
    fold = params.get("sensitive", "false").lower() not in ("true", "1", "yes")
    if params.get("filter"):
        col = {"word": "tokens_fold" if fold else "tokens"}.get(
            annot, f"tokens_{annot}"
        )
        if annot != "word" and annot not in ix.annotations:
            raise ValueError(f"annotation {annot!r} is not indexed")
        d = ix.docs.filter(F.expr(params["filter"]))
        toks = d.select(F.explode(col).alias("term")).filter(
            F.col("term") != ""  # position-gap sentinels post nothing
        )
        if fold and annot != "word":
            # non-word layers store the sensitive value; map each token to
            # its dictionary fold (word has tokens_fold precomputed)
            fold_map = (
                ix.terms_df.filter(F.col("annot") == annot)
                .select("term", "term_fold")
                .distinct()
            )
            toks = toks.join(fold_map, "term").select(
                F.col("term_fold").alias("term")
            )
        tf = toks.groupBy("term").agg(F.count("*").alias("cf"))
    else:
        tf = ix.term_freqs(fold=fold, annot=annot)
    rows = tf.orderBy(F.col("cf").desc(), "term").limit(number).collect()
    return {
        "summary": _summary(params, 0, number, len(rows), None, None, t0),
        "termFreq": {r["term"]: r["cf"] for r in rows},
    }


def _op_docs_grouped(ix: Index, params: dict, d, group: str, t0: float) -> dict:
    """GET /<corpus>/docs?group= — grouped per-document results
    (RequestHandlerDocsGrouped; DocProperty field/decade groupings)."""
    first = max(0, int(params.get("first", 0)))
    number = min(MAX_WINDOW, max(0, int(params.get("number", DEFAULT_NUMBER))))
    if group.startswith("field:"):
        key = F.col(group.split(":", 1)[1]).cast("string")
    elif group.startswith("decade:"):
        key = (
            (F.year(F.col(group.split(":", 1)[1])) / 10).cast("int") * 10
        ).cast("string")
    else:
        raise ValueError(f"unknown docs group property: {group!r}")
    g = (
        d.join(ix.docs.select("doc_id", *_meta_cols(ix)), "doc_id")
        .groupBy(key.alias("group_key"))
        .agg(F.count("*").alias("size"), F.sum("n_hits").alias("n_hits"))
    )
    n_groups = g.count()
    rows = (
        g.orderBy(F.col("size").desc(), "group_key")
        .limit(first + number)
        .collect()[first:]
    )
    return {
        "summary": {
            **_summary(params, first, number, len(rows), None, None, t0),
            "numberOfGroups": n_groups,
        },
        "docGroups": [
            {
                "identity": r["group_key"],
                "size": r["size"],
                "numberOfHits": r["n_hits"],
            }
            for r in rows
        ],
    }


AUTOCOMPLETE_MAX = 30  # ResultAutocomplete.MAX_VALUES


def op_autocomplete(ix: Index, parts: list[str], params: dict) -> list:
    """GET /<corpus>/autocomplete/<field>?term= — metadata-field values, or
    /<corpus>/autocomplete/<annotatedField>/<annotation>?term= — dictionary
    terms by prefix (RequestHandlerAutocomplete; ResultAutocomplete:
    insensitive variant preferred, MAX_VALUES=30, plain JSON list)."""
    term = params.get("term")
    if not term:
        raise ValueError("Bad URL. Pass a parameter 'term' to autocomplete.")
    if not parts:
        raise ValueError(
            "Bad URL. Specify a field name and optionally an annotation "
            "to autocomplete."
        )
    field = parts[0]
    if field == "contents":
        if len(parts) < 2:
            raise ValueError(
                "Also specify an annotation to autocomplete for annotated "
                f"field: {field}"
            )
        annot = parts[1]
        ix._check_annot(annot)
        # insensitive matching over the dictionary's folded form — the
        # reference prefers the INSENSITIVE sensitivity variant when present
        rows = (
            ix.terms_df.filter(F.col("annot") == annot)
            .filter(F.col("term_fold").startswith(term.lower()))
            .select(F.col("term_fold").alias("v"))
            .distinct()
            .orderBy("v")
            .limit(AUTOCOMPLETE_MAX)
            .collect()
        )
        return [r["v"] for r in rows]
    if field not in _meta_cols(ix):
        raise KeyError(f"field {field!r}")
    rows = (
        ix.docs.select(F.col(field).cast("string").alias("v"))
        .filter(F.col("v").startswith(term))
        .distinct()
        .orderBy("v")
        .limit(AUTOCOMPLETE_MAX)
        .collect()
    )
    return [r["v"] for r in rows]


def op_field_info(ix: Index, name: str, params: dict) -> dict:
    """GET /<corpus>/fields/<name> (RequestHandlerFieldInfo /
    WebserviceRequestHandler.opFieldInfo): annotated field -> annotation
    inventory; metadata field -> type + value frequency list with
    valueListComplete (ResultMetadataField / TruncatableFreqList)."""
    if name == "contents":
        return {
            "fieldName": "contents",
            "isAnnotatedField": True,
            "mainAnnotation": "word",
            "annotations": {
                a: {
                    "hasForwardIndex": True,
                    "sensitivity": "SENSITIVE_AND_INSENSITIVE",
                }
                for a in ix.annotations
            },
            "tokenCount": ix.sum_dl,
            "documentCount": ix.n_docs,
        }
    cols = dict(ix.docs.dtypes)
    if name not in _meta_cols(ix):
        raise KeyError(f"field {name!r}")
    limit = min(MAX_WINDOW, max(1, int(params.get("limitvalues", 200))))
    rows = (
        ix.docs.groupBy(F.col(name).cast("string").alias("v"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "v")
        .limit(limit + 1)
        .collect()
    )
    truncated = len(rows) > limit
    rows = rows[:limit]
    return {
        "fieldName": name,
        "isAnnotatedField": False,
        "type": cols[name],
        "fieldValues": {r["v"]: r["n"] for r in rows},
        "valueListComplete": not truncated,
    }


def op_parse_pattern(params: dict) -> dict:
    """GET /parse-pattern?patt= (RequestHandlerParsePattern /
    WebserviceRequestHandler.opParsePattern:301-331): parse only, return the
    canonical CQL serialization + the JSON TextPattern structure."""
    patt = params.get("patt")
    if not patt:
        raise ValueError("missing required parameter: patt")
    out = {"params": {"patt": patt, "pattlang": "bcql"}, "parsed": {}}
    try:
        tp = bcql.parse(patt)
        out["parsed"]["bcql"] = bcql.to_cql(tp)
        out["parsed"]["json"] = bcql.to_dict(tp)
    except Exception as e:
        out["parsed"]["error"] = str(e)
    return out


def op_relations(ix: Index, params: dict) -> dict:
    """GET /<corpus>/relations (RequestHandlerRelations /
    WebserviceRequestHandler.opRelations:333+): relation classes -> types ->
    counts, plus inline tags as the special spans class with attribute
    value-frequency lists (RelationUtil.CLASS_INLINE_TAG)."""
    limit = min(MAX_WINDOW, max(1, int(params.get("limitvalues", 200))))
    out: dict = {}
    # inline tags = the spans class; attrs -> TruncatableFreqList analog
    tag_rows = (
        ix.docs.select(F.explode("tags").alias("t"))
        .groupBy(F.col("t.name").alias("name"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    if tag_rows:
        attr_rows = (
            ix.docs.select(F.explode("tags").alias("t"))
            .select("t.name", F.explode("t.attrs").alias("attr", "value"))
            .groupBy("name", "attr", "value")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), "value")
            .limit(limit + 1)
            .collect()
        )
        attrs_by_tag: dict = {}
        for r in attr_rows[:limit]:
            attrs_by_tag.setdefault(r["name"], {}).setdefault(
                r["attr"], {"values": {}, "valueListComplete": True}
            )["values"][r["value"]] = r["n"]
        if len(attr_rows) > limit:
            for per_tag in attrs_by_tag.values():
                for a in per_tag.values():
                    a["valueListComplete"] = False
        out["spans"] = {
            r["name"]: {
                "count": r["n"],
                **(
                    {"attributes": attrs_by_tag[r["name"]]}
                    if r["name"] in attrs_by_tag
                    else {}
                ),
            }
            for r in tag_rows
        }
    classes: dict = {}
    try:
        rel_rows = (
            ix.rel_spans(include_alignments=True)
            .groupBy("rclass", "rtype")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    except ValueError:  # no relations indexed
        rel_rows = []
    for r in rel_rows:
        classes.setdefault(r["rclass"], {})[r["rtype"]] = {"count": r["n"]}
    out["relations"] = classes
    return out


def op_doc_snippet(ix: Index, doc_pid: str, params: dict) -> dict:
    """GET /<corpus>/docs/<pid>/snippet?hitstart=&hitend=&wordsaroundhit=
    (RequestHandlerDocSnippet / opDocSnippet): token context around an
    arbitrary hit position in one document."""
    if "hitstart" in params:
        start = int(params["hitstart"])
        end = int(params.get("hitend", start + 1))
        context = min(50, max(0, int(params.get("wordsaroundhit", 5))))
    elif "wordstart" in params:
        # whole-range form: no context words, the range IS the match
        start = int(params["wordstart"])
        end = int(params.get("wordend", start + 1))
        context = 0
    else:
        raise ValueError("specify hitstart/hitend or wordstart/wordend")
    if end <= start or start < 0:
        raise ValueError("invalid snippet range")
    sel = ix.docs.filter(
        (F.col("doc_id").cast("string") == doc_pid) | (F.col("url") == doc_pid)
    )
    row = sel.select("doc_id").limit(1).collect()
    if not row:
        raise KeyError(doc_pid)
    doc_id = row[0]["doc_id"]
    sn = ix.snippet(doc_id, start, end, context=context)
    if not sn:
        raise KeyError(f"snippet range out of document: {doc_pid}")
    return {
        "docPid": doc_pid,
        "start": start,
        "end": end,
        "left": {"word": sn["left"].split(" ") if sn["left"] else []},
        "match": {"word": sn["match"].split(" ") if sn["match"] else []},
        "right": {"word": sn["right"].split(" ") if sn["right"] else []},
    }


def op_list_input_formats(user_formats: dict | None = None) -> dict:
    """GET /input-formats (RequestHandlerListInputFormats /
    ResponseStreamer.listFormatsResponse shape). User formats added over
    HTTP list alongside the built-ins."""
    from .sources import INPUT_FORMATS

    out = {
        name: {
            "displayName": f["displayName"],
            "description": f["description"],
            "helpUrl": "",
            "configurationBased": f["configurationBased"],
            "isVisible": True,
        }
        for name, f in INPUT_FORMATS.items()
    }
    for name, cfg in (user_formats or {}).items():
        out[name] = {
            "displayName": cfg.get("displayName", name),
            "description": cfg.get(
                "description",
                f"user format ({cfg.get('baseFormat', 'xml-config')})",
            ),
            "helpUrl": "",
            "configurationBased": True,
            "isVisible": True,
        }
    return {
        "user": {"loggedIn": False, "canCreateIndex": False},
        "supportedInputFormats": out,
    }


_XML_SINGULAR = {
    "hits": "hit", "docs": "doc", "hitGroups": "hitGroup",
    "docGroups": "docGroup", "word": "w", "lemma": "w", "pos": "w",
    "captureGroups": "captureGroup", "annotations": "annotation",
    "metadataFields": "metadataField", "values": "value",
    "supportedInputFormats": "format", "relations": "relation",
    "classes": "class", "attributes": "attribute", "delta_segments": "segment",
}
_XML_NAME_RE = re.compile(r"[^A-Za-z0-9_.-]")


def _xml_name(k) -> str:
    s = _XML_NAME_RE.sub("_", str(k)) or "_"
    if not (s[0].isalpha() or s[0] == "_"):
        s = "_" + s
    return s


def _xml_esc(v) -> str:
    s = "" if v is None else str(v)
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _xml_node(name: str, val, out: list) -> None:
    name = _xml_name(name)
    if isinstance(val, dict):
        out.append(f"<{name}>")
        for k, v in val.items():
            _xml_node(k, v, out)
        out.append(f"</{name}>")
    elif isinstance(val, (list, tuple)):
        child = _XML_SINGULAR.get(name, "item")
        out.append(f"<{name}>")
        for v in val:
            _xml_node(child, v, out)
        out.append(f"</{name}>")
    elif isinstance(val, bool):
        out.append(f"<{name}>{'true' if val else 'false'}</{name}>")
    else:
        out.append(f"<{name}>{_xml_esc(val)}</{name}>")


def to_xml(payload: dict) -> str:
    """BLS-shaped XML rendering (DataStreamXml analog): the same response
    tree JSON serializes, as elements — list items get singular names
    (hits/hit, docs/doc, hitGroups/hitGroup, context words as <w>), any
    metadata-derived key is sanitized to a valid element name. Applied
    uniformly at the response writer, so EVERY endpoint (and errors)
    honors outputformat=xml."""
    out = ['<?xml version="1.0" encoding="utf-8" ?>', "<blacklabResponse>"]
    for k, v in payload.items():
        _xml_node(k, v, out)
    out.append("</blacklabResponse>")
    return "".join(out)


def _csv_escape(v) -> str:
    s = "" if v is None else str(v)
    if any(ch in s for ch in ',"\n'):
        s = '"' + s.replace('"', '""') + '"'
    return s


def to_csv(payload: dict) -> str:
    """CSV rendering of a hits/docs/groups payload (RequestHandlerHitsCsv /
    RequestHandlerDocsCsv, WriteCsv.hitsResponse shape: context columns +
    doc pid)."""
    lines = []
    if "hits" in payload:
        lines.append("docPid,start,end,left_context,match,right_context")
        for h in payload["hits"]:
            lines.append(",".join(_csv_escape(v) for v in (
                h["docPid"], h["start"], h["end"],
                " ".join(h["left"]["word"]),
                " ".join(h["match"]["word"]),
                " ".join(h["right"]["word"]),
            )))
    elif "hitGroups" in payload:
        lines.append("identity,size")
        for g in payload["hitGroups"]:
            lines.append(f'{_csv_escape(g["identity"])},{g["size"]}')
    elif "docGroups" in payload:
        lines.append("identity,size,numberOfHits")
        for g in payload["docGroups"]:
            lines.append(
                f'{_csv_escape(g["identity"])},{g["size"]},'
                f'{_csv_escape(g["numberOfHits"])}'
            )
    elif "docs" in payload:
        lines.append("docPid,numberOfHits")
        for d in payload["docs"]:
            lines.append(f'{_csv_escape(d["docPid"])},{_csv_escape(d["numberOfHits"])}')
    else:
        raise ValueError("csv output is supported for hits and docs results")
    return "\n".join(lines) + "\n"


def _summary(params, first, number, actual, total, n_docs, t0, still=False) -> dict:
    s = {
        "searchParam": {
            k: v for k, v in params.items() if k not in ("outputformat",)
        },
        "searchTime": int((time.time() - t0) * 1000),
        "windowFirstResult": first,
        "requestedWindowSize": number,
        "actualWindowSize": actual,
        "stillCounting": still,
    }
    if total is not None:
        s["numberOfHits"] = total
        s["windowHasPrevious"] = first > 0
        s["windowHasNext"] = first + actual < total
    if n_docs is not None:
        s["numberOfDocs"] = n_docs
    return s


# --------------------------------------------------------------------------
# HTTP layer
# --------------------------------------------------------------------------


class BlackLabServer:
    """Serve one or more open Index objects over HTTP (stdlib only).

    With `writable_root` set, the index-management surface is enabled
    (user corpora — RequestHandlerCreateIndex / AddToIndex / DeleteIndex):
        POST   /blacklab-server?name=<corpus>        create empty corpus
        POST   /blacklab-server/<corpus>/docs        body = JSONL documents
                                                     ({url?, text, lang?} per
                                                     line) -> one new delta
                                                     segment + tiered compact
        DELETE /blacklab-server/<corpus>             delete a created corpus
    Adds reuse the batch build's add_segment path (segment-per-request, the
    reference's IndexerImpl incremental add) and run the TieredMergePolicy
    analog so segment fan-out stays bounded; only corpora created through
    the API can be deleted."""

    def __init__(
        self,
        corpora: dict[str, Index],
        host: str = "127.0.0.1",
        port: int = 0,
        cache: SearchCache | None = None,
        writable_root: str | None = None,
        spark=None,
    ):
        self.corpora: dict[str, Index | None] = dict(corpora)
        self.cache = cache or SearchCache()
        self.writable_root = writable_root
        self._created: set[str] = set()
        # user-defined input formats (RequestHandlerAddFormat): persisted
        # under <writable_root>/_formats/<name>.blf.yaml, reloaded at start
        self._user_formats: dict[str, dict] = {}
        if writable_root:
            self._load_user_formats()
        self._spark = spark or (
            next(iter(corpora.values())).spark if corpora else None
        )
        self._mgmt_lock = threading.Lock()
        self._async_counts = AsyncCounts()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence default stderr logging
                pass

            def do_GET(self):
                ctype = "application/json"
                try:
                    status, payload = outer._route(self.path)
                except ValueError as e:
                    status, payload = 400, {"error": {"code": "BAD_REQUEST", "message": str(e)}}
                except KeyError as e:
                    status, payload = 404, {"error": {"code": "NOT_FOUND", "message": str(e)}}
                except Exception as e:  # surfaced, never a hung socket
                    status, payload = 500, {"error": {"code": "INTERNAL_ERROR", "message": repr(e)}}
                wants_xml = "outputformat=xml" in urlparse(self.path).query
                if isinstance(payload, str):  # pre-rendered (csv)
                    ctype = "text/csv"
                    body = payload.encode()
                elif wants_xml:
                    ctype = "application/xml"
                    body = to_xml(payload).encode()
                else:
                    body = json.dumps(payload, default=str).encode()
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _mgmt(self, fn):
                try:
                    n = int(self.headers.get("Content-Length") or 0)
                    data = self.rfile.read(n) if n else b""
                    status, payload = fn(self.path, data)
                except ValueError as e:
                    status, payload = 400, {"error": {"code": "BAD_REQUEST", "message": str(e)}}
                except KeyError as e:
                    status, payload = 404, {"error": {"code": "NOT_FOUND", "message": str(e)}}
                except PermissionError as e:
                    status, payload = 403, {"error": {"code": "FORBIDDEN", "message": str(e)}}
                except Exception as e:
                    status, payload = 500, {"error": {"code": "INTERNAL_ERROR", "message": repr(e)}}
                body = json.dumps(payload, default=str).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                self._mgmt(outer._route_post)

            def do_DELETE(self):
                self._mgmt(outer._route_delete)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # ---- routing ----
    def _route(self, path: str) -> tuple[int, dict]:
        u = urlparse(path)
        params = {k: v[0] for k, v in parse_qs(u.query).items()}
        parts = [unquote(p) for p in u.path.strip("/").split("/") if p]
        if parts and parts[0] == "blacklab-server":
            parts = parts[1:]
        if not parts:
            return 200, self._server_info()
        if parts[0] == "cache-info":
            return 200, self.cache.info()
        if parts[0] == "cache-clear":
            self.cache.clear()
            return 200, {"status": "cleared"}
        if parts[0] == "input-formats":
            if len(parts) == 2:  # format detail (ResultInputFormat: config)
                name = parts[1]
                if name in self._user_formats:
                    return 200, {
                        "formatName": name,
                        "configFileType": "yaml",
                        "configFile": self._user_formats[name],
                    }
                from .sources import INPUT_FORMATS

                if name in INPUT_FORMATS:
                    f = INPUT_FORMATS[name]
                    return 200, {
                        "formatName": name,
                        "displayName": f["displayName"],
                        "description": f["description"],
                        "configurationBased": f["configurationBased"],
                    }
                raise KeyError(f"format {name!r}")
            return 200, op_list_input_formats(self._user_formats)
        if parts[0] == "parse-pattern":
            return 200, op_parse_pattern(params)
        corpus = parts[0]
        if corpus not in self.corpora:
            raise KeyError(f"corpus {corpus!r}")
        ix = self.corpora[corpus]
        rest = parts[1:]
        if ix is None:  # created but no documents added yet
            if not rest or rest[0] == "status":
                return 200, {
                    "indexName": corpus,
                    "status": "empty",
                    "documentCount": 0,
                    "tokenCount": 0,
                }
            raise ValueError(f"corpus {corpus!r} is empty; add documents first")
        if not rest:
            return 200, self._corpus_info(corpus, ix)
        op = rest[0]
        csv_out = params.get("outputformat") == "csv"
        if op == "hits":
            key = (corpus, "hits", tuple(sorted(params.items())))
            payload = self.cache.get_or_compute(
                key, lambda: op_hits(ix, params, counts=self._async_counts)
            )
            if payload.get("summary", {}).get("stillCounting"):
                # never serve a stale running-count snapshot from the cache —
                # the next identical request re-checks the count future
                self.cache.discard(key)
            return 200, (to_csv(payload) if csv_out else payload)
        if op == "docs" and len(rest) == 1:
            key = (corpus, "docs", tuple(sorted(params.items())))
            payload = self.cache.get_or_compute(key, lambda: op_docs(ix, params))
            return 200, (to_csv(payload) if csv_out else payload)
        if op == "docs" and len(rest) == 2:
            return 200, op_doc_info(ix, rest[1], params)
        if op == "docs" and len(rest) == 3 and rest[2] == "snippet":
            return 200, op_doc_snippet(ix, rest[1], params)
        if op == "termfreq":
            key = (corpus, "termfreq", tuple(sorted(params.items())))
            return 200, self.cache.get_or_compute(key, lambda: op_termfreq(ix, params))
        if op == "autocomplete":
            return 200, op_autocomplete(ix, rest[1:], params)
        if op == "fields" and len(rest) == 2:
            return 200, op_field_info(ix, rest[1], params)
        if op == "relations":
            key = (corpus, "relations", tuple(sorted(params.items())))
            return 200, self.cache.get_or_compute(key, lambda: op_relations(ix, params))
        if op == "status":
            return 200, {
                "indexName": corpus,
                "status": "available",
                "documentCount": ix.n_docs,
                "tokenCount": ix.sum_dl,
            }
        if op == "parse-pattern":
            return 200, op_parse_pattern(params)
        raise KeyError(f"operation {op!r}")

    def _server_info(self) -> dict:
        return {
            "apiVersion": "4.0-pyspark",
            "indices": {
                name: {
                    "documentCount": ix.n_docs if ix is not None else 0,
                    "status": "available" if ix is not None else "empty",
                }
                for name, ix in self.corpora.items()
            },
            "cacheSizeBytesTarget": None,
        }

    # ---- index management (user corpora) ----
    _NAME_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.-]{0,63}$")

    def _require_writable(self) -> str:
        if not self.writable_root or self._spark is None:
            raise PermissionError(
                "index management is disabled (server started without a "
                "writable_root)"
            )
        return self.writable_root

    # ---- user input formats (RequestHandlerAddFormat / DeleteFormat) ----
    def _formats_dir(self) -> str:
        import os

        d = os.path.join(self._require_writable(), "_formats")
        os.makedirs(d, exist_ok=True)
        return d

    def _load_user_formats(self) -> None:
        import glob
        import os

        import yaml

        for p in glob.glob(os.path.join(self.writable_root, "_formats", "*.blf.yaml")):
            name = os.path.basename(p)[: -len(".blf.yaml")]
            with open(p) as f:
                self._user_formats[name] = yaml.safe_load(f) or {}

    def _add_format(self, name: str, data: bytes) -> tuple[int, dict]:
        """POST /input-formats/<name>, body = *.blf.yaml config (the
        reference uploads the file as a multipart 'data' field and names the
        format after the file; raw-body + path naming is the transport
        simplification). Validated eagerly, persisted, effective
        immediately."""
        import os

        import yaml

        from .sources import INPUT_FORMATS, validate_xml_format

        if not self._NAME_RE.match(name):
            raise ValueError(f"illegal format name: {name!r}")
        if name in INPUT_FORMATS:
            raise ValueError(f"format {name!r} is built in and cannot be replaced")
        try:
            cfg = yaml.safe_load(data.decode("utf-8"))
        except Exception as e:
            raise ValueError(f"format config is not valid YAML: {e}") from None
        if not isinstance(cfg, dict):
            raise ValueError("format config must be a YAML mapping")
        base = cfg.get("baseFormat", "xml-config")
        if base not in ("xml-config", "xml-xpath"):
            raise ValueError(
                f"baseFormat must be 'xml-config' or 'xml-xpath', got {base!r}"
            )
        validate_xml_format(cfg, xpath=(base == "xml-xpath"))
        with self._mgmt_lock:
            with open(
                os.path.join(self._formats_dir(), f"{name}.blf.yaml"), "w"
            ) as f:
                yaml.safe_dump(cfg, f)
            self._user_formats[name] = cfg
        return 201, {"status": "SUCCESS", "message": "Format added."}

    def _delete_format(self, name: str) -> tuple[int, dict]:
        import os

        from .sources import INPUT_FORMATS

        if name in INPUT_FORMATS:
            raise PermissionError(f"format {name!r} is built in")
        if name not in self._user_formats:
            raise KeyError(f"format {name!r}")
        with self._mgmt_lock:
            del self._user_formats[name]
            p = os.path.join(self._formats_dir(), f"{name}.blf.yaml")
            if os.path.exists(p):
                os.remove(p)
        return 200, {"status": "SUCCESS", "message": "Format deleted."}

    def _route_post(self, path: str, data: bytes) -> tuple[int, dict]:
        import os

        u = urlparse(path)
        params = {k: v[0] for k, v in parse_qs(u.query).items()}
        parts = [unquote(p) for p in u.path.strip("/").split("/") if p]
        if parts and parts[0] == "blacklab-server":
            parts = parts[1:]
        root = self._require_writable()
        if len(parts) == 2 and parts[0] == "input-formats":
            return self._add_format(parts[1], data)
        if not parts:  # POST /blacklab-server?name=  -> create corpus
            name = params.get("name")
            if not name:
                raise ValueError("You didn't specify the required name parameter.")
            if not self._NAME_RE.match(name):
                raise ValueError(f"illegal index name: {name!r}")
            with self._mgmt_lock:
                if name in self.corpora:
                    raise ValueError(f"corpus {name!r} already exists")
                os.makedirs(os.path.join(root, name), exist_ok=True)
                self.corpora[name] = None
                self._created.add(name)
            return 201, {"status": "SUCCESS", "message": "Index created succesfully."}
        if len(parts) == 2 and parts[1] == "docs":  # add documents
            corpus = parts[0]
            if corpus not in self.corpora:
                raise KeyError(f"corpus {corpus!r}")
            if corpus not in self._created:
                raise PermissionError(
                    "documents can only be added to corpora created through "
                    "this API"
                )
            n_added = self._add_documents(corpus, data, params)
            return 200, {
                "status": "SUCCESS",
                "message": f"Data added to index: {n_added} documents.",
                "documentsAdded": n_added,
            }
        raise KeyError(f"POST {u.path}")

    def _format_pages(self, corpus: str, data: bytes, fmt_name: str):
        """Parse an add-to-index body through a user-defined input format:
        the body (one or more XML documents) lands in an uploads/ dir and
        goes through the SAME distributed reader a batch ingest uses
        (pages_from_xml_dir / pages_from_xml_xpath), so config'd inline tags
        and metadata behave identically over HTTP and batch. Returns
        (pages_df, build_kwargs)."""
        import os
        import uuid

        from . import sources as S

        cfg = self._user_formats[fmt_name]
        up = os.path.join(
            self._require_writable(), corpus, "uploads", uuid.uuid4().hex[:12]
        )
        os.makedirs(up)
        with open(os.path.join(up, "upload.xml"), "wb") as f:
            f.write(data)
        reader = (
            S.pages_from_xml_xpath
            if cfg.get("baseFormat") == "xml-xpath"
            else S.pages_from_xml_dir
        )
        return reader(self._spark, up, fmt=cfg), S.build_kwargs_from_format(cfg)

    def _add_documents(self, corpus: str, data: bytes, params: dict) -> int:
        """Body = JSONL documents ({text, url?, lang?} per line), or — with
        format=<user format> — XML parsed through that format's config. One
        request -> ONE delta segment via the batch build's add_segment (the
        reference's IndexerImpl incremental add), then a tiered-compaction
        pass so segment count stays O(log adds). The add is bounded by the
        HTTP body; the heavy build work runs as normal Spark jobs."""
        import os

        from pyspark.sql import functions as SF

        from .build import add_segment
        from .streaming import tiered_compact

        fmt_name = params.get("format", "jsonl")
        build_kw = {}
        if fmt_name != "jsonl":
            if fmt_name not in self._user_formats:
                raise ValueError(
                    f"format {fmt_name!r} is not a registered user format "
                    "(POST /input-formats/<name> first; built-in batch "
                    "readers are not add-to-index transports)"
                )
            pages, build_kw = self._format_pages(corpus, data, fmt_name)
            n_docs = pages.count()
            if not n_docs:
                raise ValueError("request body parsed to zero documents")
            out_dir = os.path.join(self._require_writable(), corpus)
            with self._mgmt_lock:
                seg_dir = os.path.join(out_dir, "segments")
                n = 0
                while os.path.exists(os.path.join(seg_dir, f"add-{n}")):
                    n += 1
                add_segment(
                    self._spark, pages, out_dir, f"add-{n}",
                    n_shards=int(params.get("nshards", 4)), **build_kw,
                )
                tiered_compact(self._spark, out_dir, tag=f"add{n}")
                self.corpora[corpus] = Index(self._spark, out_dir)
                self.cache.clear_corpus(corpus)
            return n_docs
        lines = [ln for ln in data.decode("utf-8", "replace").splitlines() if ln.strip()]
        if not lines:
            raise ValueError("empty request body; send JSONL documents")
        rows = []
        for i, ln in enumerate(lines):
            try:
                d = json.loads(ln)
            except json.JSONDecodeError as e:
                raise ValueError(f"bad JSONL at line {i}: {e}") from None
            if not isinstance(d, dict) or not d.get("text"):
                raise ValueError(f"line {i}: each document needs a 'text' field")
            rows.append((
                str(d.get("url") or f"doc://{corpus}/{i}"),
                str(d["text"]),
                str(d.get("lang") or "und"),
            ))
        out_dir = os.path.join(self._require_writable(), corpus)
        with self._mgmt_lock:
            pages = self._spark.createDataFrame(
                rows, "url string, text string, lang string"
            ).select(
                "url",
                SF.lit(None).cast("timestamp").alias("warc_ts"),
                SF.lit(None).cast("binary").alias("html"),
                "text",
                "lang",
            )
            # next free add-N segment name (merges may have consumed earlier ones)
            seg_dir = os.path.join(out_dir, "segments")
            n = 0
            while os.path.exists(os.path.join(seg_dir, f"add-{n}")):
                n += 1
            n_shards = int(params.get("nshards", 4))
            add_segment(self._spark, pages, out_dir, f"add-{n}", n_shards=n_shards)
            tiered_compact(self._spark, out_dir, tag=f"add{n}")
            self.corpora[corpus] = Index(self._spark, out_dir)
            self.cache.clear_corpus(corpus)
        return len(rows)

    def _route_delete(self, path: str, data: bytes) -> tuple[int, dict]:
        import os
        import shutil

        u = urlparse(path)
        parts = [unquote(p) for p in u.path.strip("/").split("/") if p]
        if parts and parts[0] == "blacklab-server":
            parts = parts[1:]
        root = self._require_writable()
        if len(parts) == 2 and parts[0] == "input-formats":
            return self._delete_format(parts[1])
        if len(parts) != 1:
            raise KeyError(f"DELETE {u.path}")
        corpus = parts[0]
        if corpus not in self.corpora:
            raise KeyError(f"corpus {corpus!r}")
        if corpus not in self._created:
            raise PermissionError(
                "only corpora created through this API can be deleted"
            )
        with self._mgmt_lock:
            del self.corpora[corpus]
            self._created.discard(corpus)
            self.cache.clear_corpus(corpus)
            shutil.rmtree(os.path.join(root, corpus), ignore_errors=True)
        return 200, {"status": "SUCCESS", "message": "Index deleted succesfully."}

    def _corpus_info(self, name: str, ix: Index) -> dict:
        return {
            "indexName": name,
            "documentCount": ix.n_docs,
            "tokenCount": ix.sum_dl,
            "annotatedFields": {
                "contents": {"annotations": list(ix.annotations)}
            },
            "metadataFields": _meta_cols(ix),
            "status": "available",
        }

    # ---- lifecycle ----
    def start(self) -> "BlackLabServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def main(argv: list[str] | None = None) -> int:
    """`python -m blacklab_spark.server <index_dir> [--name corpus] [--port N]`"""
    import argparse

    from .session import get_spark

    ap = argparse.ArgumentParser(description="BlackLab-analog search server")
    ap.add_argument("index_dir")
    ap.add_argument("--name", default="corpus")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--master", default="local[*]")
    ap.add_argument(
        "--writable-root", default=None,
        help="enable index management (create/add/delete user corpora "
        "under this directory)",
    )
    args = ap.parse_args(argv)
    spark = get_spark(args.master, app_name="blacklab_server")
    srv = BlackLabServer(
        {args.name: Index(spark, args.index_dir)},
        port=args.port,
        writable_root=args.writable_root,
        spark=spark,
    ).start()
    print(f"serving on http://127.0.0.1:{srv.port}/blacklab-server")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
